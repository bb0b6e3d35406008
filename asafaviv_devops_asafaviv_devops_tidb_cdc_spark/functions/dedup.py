"""Deduplication operators (north-star E1/E2): exact hash-dedup and
MinHash-LSH near-dup detection.

Scale posture:
- Exact dedup is one shuffle on the 256-bit content hash; survivors
  picked with min-id row_number (deterministic, no arbitrary-first).
- MinHash-LSH: signatures are a map-only stage; the candidate join
  shuffles on (band, hash-value) buckets — cardinality ~n_docs*bands,
  never the n² pair space. Exact Jaccard verification runs only on
  bucket-colliding pairs. At 100 TB tune bands/rows for the target
  similarity threshold; skewed buckets (boilerplate docs) fall out of
  AQE skew-join handling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .text import doc_fingerprint, minhash, shingles

N_HASHES = 4  # bands of 1 row each; candidate iff any minhash matches

SIMHASH_BITS = 64
SIMHASH_BANDS = 4  # 16 bits/band; hamming<=3 pairs always share a band


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the lowest-id document per exact content hash."""
    w = Window.partitionBy(F.sha2(F.col(text_col), 256)).orderBy(F.col(id_col))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def minhash_signatures(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n_hashes: int = N_HASHES
) -> DataFrame:
    """(id, shingle-set, k, minhash_k) — one row per salt k."""
    with_sh = df.select(F.col(id_col).alias("doc_id"), shingles(text_col).alias("sh"))
    sigs = None
    for k in range(n_hashes):
        part = with_sh.select(
            "doc_id", "sh", F.lit(k).alias("k"), minhash("sh", k).alias("h")
        )
        sigs = part if sigs is None else sigs.unionByName(part)
    return sigs


def neardup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    jaccard_ppm_threshold: int = 500_000,
) -> DataFrame:
    """Candidate pairs via MinHash band collision, verified with exact
    Jaccard over distinct shingles (integer ppm). Returns
    (doc_a, doc_b, jaccard_ppm) with doc_a < doc_b."""
    sigs = minhash_signatures(df, text_col, id_col)
    a = sigs.select(
        F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"), "k", "h"
    )
    b = sigs.select(
        F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"), "k", "h"
    )
    cand = (
        a.join(b, ["k", "h"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "sh_a", "sh_b")
        .dropDuplicates(["doc_a", "doc_b"])
    )
    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    union = F.size(F.col("sh_a")) + F.size(F.col("sh_b")) - inter
    return (
        cand.withColumn("jaccard_ppm", F.expr(
            f"(size(array_intersect(sh_a, sh_b)) * 1000000) div "
            f"(size(sh_a) + size(sh_b) - size(array_intersect(sh_a, sh_b)))"
        ).cast("long"))
        .filter(F.col("jaccard_ppm") >= jaccard_ppm_threshold)
        .select("doc_a", "doc_b", "jaccard_ppm")
    )


def with_simhash(df: DataFrame, text_col: str = "text") -> DataFrame:
    """64-bit SimHash as a bitstring column.

    Dimension d is hex digit d of sha256(token): a token votes +1 on
    bit d iff that digit's high bit is set (char >= '8'), else -1; the
    sign of the vote sum is the bit. Token hashes are materialized once
    (``_th``) so sha256 runs once per token, not once per (token, bit).
    Map-only, no shuffle, portable to any engine with sha256."""
    df = df.withColumn(
        "_th", F.expr(f"transform(split({text_col}, ' '), t -> sha2(t, 256))")
    )
    sim = F.expr(
        f"concat_ws('', transform(sequence(1, {SIMHASH_BITS}), d -> "
        f"CASE WHEN aggregate(_th, 0, (acc, h) -> "
        f"acc + (CASE WHEN substring(h, d, 1) >= '8' THEN 1 ELSE -1 END)) >= 0 "
        f"THEN '1' ELSE '0' END))"
    )
    return df.withColumn("simhash", sim).drop("_th")


def simhash_neardup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
) -> DataFrame:
    """SimHash near-dup: band the 64-bit signature into 4×16-bit keys;
    candidates are pairs sharing any band (pigeonhole: hamming<=3 can
    dirty at most 3 of 4 bands, so no true pair is missed); verify
    exact hamming distance. The join shuffles on (band, key) buckets —
    ~n_docs*4 rows, never the n² pair space."""
    sh = with_simhash(df.select(F.col(id_col).alias("doc_id"), text_col), text_col)
    band_w = SIMHASH_BITS // SIMHASH_BANDS
    bands = None
    for b in range(SIMHASH_BANDS):
        part = sh.select(
            "doc_id",
            F.lit(b).alias("band"),
            F.expr(f"substring(simhash, {1 + band_w * b}, {band_w})").alias("key"),
            "simhash",
        )
        bands = part if bands is None else bands.unionByName(part)
    a = bands.select(
        F.col("doc_id").alias("doc_a"), "band", "key", F.col("simhash").alias("sim_a")
    )
    b_ = bands.select(
        F.col("doc_id").alias("doc_b"), "band", "key", F.col("simhash").alias("sim_b")
    )
    cand = (
        a.join(b_, ["band", "key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "sim_a", "sim_b")
        .dropDuplicates(["doc_a", "doc_b"])
    )
    ham = F.expr(
        f"size(filter(sequence(1, {SIMHASH_BITS}), "
        f"i -> substring(sim_a, i, 1) <> substring(sim_b, i, 1)))"
    )
    return (
        cand.withColumn("hamming", ham.cast("int"))
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    jaccard_ppm_threshold: int = 500_000,
) -> DataFrame:
    """N-gram Jaccard near-dup via fingerprint blocking: candidates are
    pairs sharing the one-permutation-MinHash fingerprint (a single
    equi-join key — the cheapest blocking scheme, one shuffle on the
    fingerprint), verified with exact Jaccard over distinct 3-gram
    shingles in integer ppm."""
    sh = df.select(
        F.col(id_col).alias("doc_id"),
        shingles(text_col).alias("sh"),
        doc_fingerprint(text_col).alias("fp"),
    )
    a = sh.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"), "fp")
    b = sh.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"), "fp")
    return (
        a.join(b, "fp")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .withColumn(
            "jaccard_ppm",
            F.expr(
                "(size(array_intersect(sh_a, sh_b)) * 1000000) div "
                "(size(sh_a) + size(sh_b) - size(array_intersect(sh_a, sh_b)))"
            ).cast("long"),
        )
        .filter(F.col("jaccard_ppm") >= jaccard_ppm_threshold)
        .select("doc_a", "doc_b", "jaccard_ppm")
    )
