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

from .text import minhash, shingles

N_HASHES = 4  # bands of 1 row each; candidate iff any minhash matches


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
