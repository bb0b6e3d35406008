"""Declarative Bloom filter (E7 scale path): fixed-size set membership
built and probed entirely with DataFrame ops — no UDF, no driver-side
bitmap, no collect.

Why: exact decontamination joins the distinct n-gram sets of train and
eval (queries/corpus_ops.py::q_decontaminate) — a gram-key shuffle
whose width is the full distinct-gram universe. At 100 TB the train
side's gram set is enormous, but the FILTER the eval side needs from it
is fixed-size. The classic answer is a Bloom filter; Spark's built-in
``bloom_filter_agg`` is not SQL-exposed in PySpark, so this module
assembles one from primitives that ARE:

- k bit positions per key from ``xxhash64(seed, key)`` (seeded by a
  literal column — cross-run deterministic, no RNG state);
- the bitmap as (word_idx, word) rows: ``groupBy(pos div 64)`` +
  ``bit_or(shiftleft(1, pos % 64))`` — m/64 rows regardless of input
  size, the broadcastable representation;
- membership as a broadcast join of probe positions against the word
  table: a key is (probably) present iff ALL k probed bits are set
  (a missing word row means bit 0 — left join + null handling).

Guarantees: NO false negatives (every inserted key probes present);
false-positive rate ~ (1 - e^(-k*n/m))^k, tunable via ``n_bits``.
A decontamination pass therefore flags a SUPERSET of the exact result
— safe in the only direction that matters for training data (you drop
a few clean docs, you never keep a contaminated one); the pytest pins
superset-ness and the FP bound.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

DEFAULT_BITS = 1 << 16
DEFAULT_HASHES = 4


def suggested_bits(
    n_keys: int, per_key_fp: float = 1e-4, k: int = DEFAULT_HASHES
) -> int:
    """Bitmap size for a target PER-KEY false-positive rate, rounded up
    to a power of two. Doc-level decontamination is an ANY-gram test,
    so the per-DOC flag rate is ~ grams_per_doc x per_key_fp — size for
    the per-key rate that makes that product small (1e-4 per key keeps
    a 500-gram doc's spurious-flag chance under ~5%). Derivation:
    p = (1 - e^(-k n/m))^k  =>  m = k n / -ln(1 - p^(1/k))."""
    import math

    if n_keys <= 0:
        return 64
    m = k * n_keys / -math.log(1.0 - per_key_fp ** (1.0 / k))
    return max(64, 1 << math.ceil(math.log2(m)))


def _positions(key: Column, n_bits: int, k: int) -> Column:
    """Array of k bit positions for a key. Seed rides as a literal in
    the hash input, so every engine restart derives identical filters.

    The key is folded to ONE 64-bit xxhash first and the k positions
    derive from that long (r9 verdict item 4): the variable-length
    string is hashed once per occurrence instead of k times, and the
    per-seed hashes run over 8 bytes — on the doc-skew corpus (half the
    probe grams are one boilerplate suffix, so probe volume is the
    whole cost) this cuts the probe's string-hash work by ~k. Build and
    probe share this derivation, so no-false-negatives is untouched;
    the k positions stay pairwise-independent enough for the FP bound
    the pytest pins (double-hashing is the textbook Bloom construction)."""
    h = F.xxhash64(key)
    return F.array(
        *[
            F.pmod(F.xxhash64(F.lit(i), h), F.lit(n_bits)).cast("long")
            for i in range(k)
        ]
    )


def build_filter(
    df: DataFrame,
    key_col: str,
    n_bits: int = DEFAULT_BITS,
    k: int = DEFAULT_HASHES,
) -> DataFrame:
    """Fold a column into a Bloom bitmap as (word_idx long, word long)
    rows — ``n_bits/64`` rows total, independent of input size. One
    gram-position shuffle ends the train side's role; the result
    broadcasts anywhere."""
    pos = df.select(
        F.explode(_positions(F.col(key_col), n_bits, k)).alias("pos")
    )
    return (
        pos.groupBy(F.expr("pos div 64").cast("long").alias("word_idx"))
        .agg(
            F.expr("bit_or(shiftleft(1L, CAST(pos % 64 AS INT)))").alias("word")
        )
    )


def might_contain(
    probe: DataFrame,
    bloom: DataFrame,
    key_col: str,
    n_bits: int = DEFAULT_BITS,
    k: int = DEFAULT_HASHES,
) -> DataFrame:
    """Append ``bloom_hit`` (boolean) to ``probe``: true iff every one
    of the key's k bits is set. One broadcast left join per hash
    function (k total) — the word table is n_bits/64 rows by
    construction, so each join is map-side; the probe side never
    shuffles and row multiplicity/order is untouched. Every join key
    is a pure function of the probe's own column, so the result is
    deterministic under task retries (no synthetic row ids)."""
    # fold the key to one 64-bit hash, then derive the k positions from
    # the long — must mirror _positions exactly or false negatives appear
    out = probe.withColumn("_bh", F.xxhash64(F.col(key_col)))
    bit_tests = []
    for i in range(k):
        pos = F.pmod(F.xxhash64(F.lit(i), F.col("_bh")), F.lit(n_bits)).cast(
            "long"
        )
        out = out.withColumn(f"_bp{i}", pos)
        words = F.broadcast(
            bloom.select(
                F.col("word_idx").alias(f"_bwi{i}"),
                F.col("word").alias(f"_bw{i}"),
            )
        )
        out = out.join(
            words, F.expr(f"_bp{i} div 64") == F.col(f"_bwi{i}"), "left"
        )
        bit_tests.append(
            F.expr(
                f"_bw{i} IS NOT NULL AND "
                f"(shiftright(_bw{i}, CAST(_bp{i} % 64 AS INT)) & 1L) = 1L"
            )
        )
    hit = bit_tests[0]
    for t in bit_tests[1:]:
        hit = hit & t
    out = out.withColumn("bloom_hit", hit)
    return out.drop(
        "_bh", *[c for i in range(k) for c in (f"_bp{i}", f"_bwi{i}", f"_bw{i}")]
    )


def contaminated_doc_ids(
    train_grams: DataFrame,
    eval_grams: DataFrame,
    gram_col: str = "gram",
    doc_col: str = "doc_id",
    n_bits: int = DEFAULT_BITS,
    k: int = DEFAULT_HASHES,
) -> DataFrame:
    """E7 at scale: eval doc ids whose any gram (probably) appears in
    train. Train's unbounded gram set collapses to an n_bits/64-row
    broadcast; the eval side never shuffles on the gram key. Output is
    a SUPERSET of the exact overlap join (no false negatives)."""
    bloom = build_filter(train_grams.select(gram_col), gram_col, n_bits, k)
    hits = might_contain(
        eval_grams.select(doc_col, gram_col), bloom, gram_col, n_bits, k
    )
    return hits.filter(F.col("bloom_hit")).select(doc_col).distinct()
