"""Weighted corpus mixture (E9 generalized): downsample sources toward
TARGET WEIGHTS instead of the flat equal-share mix.

Given per-source counts n_s and target shares w_s, the largest feasible
corpus with composition exactly ∝ w is bounded by the BINDING source
(the one that runs out first): T = min_s(n_s / w_s), target_s = T·w_s.
No source upsamples; every non-binding source downsamples by a salted
sha-prefix threshold (retry-stable, partitioning-proof, engine-portable
— the same membership primitive as q_split_assign / q_corpus_mix).

All ratio math runs in integer ppm units so the thresholds are exact
and deterministic; the sampling itself is hash-Bernoulli, so realized
counts are binomial around target_s (the pytest bounds the deviation).

Scale posture: one tiny per-source count aggregation, a few-row
broadcast of thresholds, then a map-only keep filter — one scan at any
corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# 7 hex digits of sha256 = 28 bits of uniform id space
_ID_SPACE = 268_435_456  # 16^7
_PPM = 1_000_000


def weighted_keep_thresholds(
    counts: DataFrame, weights: dict[str, float]
) -> DataFrame:
    """(source, n) + target shares -> (source, n, n_target, thr_hex).

    ``weights`` need not sum to 1 — only ratios matter. Sources absent
    from ``weights`` are dropped (weight 0). Integer derivation:
    w_ppm = round(w * 1e6); T = min(n * 1e6 div w_ppm) (the binding
    constraint — the 1e6 cancels w_ppm's scaling, so T is in whole
    documents of total corpus); n_target = T * w_ppm div 1e6 clamped
    to n."""
    spark = counts.sparkSession
    wdf = spark.createDataFrame(
        [(s, int(round(w * _PPM))) for s, w in weights.items() if w > 0],
        "source string, w_ppm long",
    )
    j = counts.join(F.broadcast(wdf), "source")
    t = j.agg(
        F.min(F.expr(f"n * {_PPM} div w_ppm")).cast("long").alias("t_total")
    )
    return (
        j.crossJoin(F.broadcast(t))
        .withColumn(
            "n_target",
            F.least(
                F.expr(f"t_total * w_ppm div {_PPM}").cast("long"),
                F.col("n").cast("long"),
            ),
        )
        .select(
            "source",
            F.col("n").cast("long").alias("n"),
            "n_target",
            F.lower(
                F.lpad(
                    F.hex(
                        F.least(
                            F.expr(f"n_target * {_ID_SPACE} div n"),
                            F.lit(_ID_SPACE - 1),
                        )
                    ),
                    7,
                    "0",
                )
            ).alias("thr_hex"),
        )
    )


def weighted_mix(
    docs: DataFrame,
    weights: dict[str, float],
    source_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "wmix1_",
    thresholds: DataFrame | None = None,
) -> DataFrame:
    """The kept subset of ``docs`` with composition ~ ``weights``.
    Membership = salted sha256 prefix under the per-source threshold —
    a doc's fate depends only on (salt, id), never on partitioning or
    execution order. The output schema equals the input schema (the
    internal 'source' rename is undone before returning). Raises
    ValueError when a weighted source has no rows: such a source makes
    the binding-constraint T degenerate (its n_s/w_s is 0 only if it
    appears in counts at all — absent it silently vanishes from the
    min, skewing realized composition away from the target), so absence
    is a caller error, not a samplable state.

    ``thresholds``: pass a precomputed ``weighted_keep_thresholds``
    frame to share its (tiny) counts aggregation with other consumers
    — a caller that also reports the thresholds would otherwise scan
    the corpus twice for the same per-source counts."""
    if thresholds is not None:
        thr = thresholds
    else:
        counts = docs.groupBy(source_col).agg(F.count("*").alias("n"))
        present = {
            r["source"]
            for r in counts.withColumnRenamed(source_col, "source")
            .select("source")
            .collect()
        }
        missing = sorted(
            s for s, w in weights.items() if w > 0 and s not in present
        )
        if missing:
            raise ValueError(
                f"weighted_mix: weighted sources with no rows: {missing}"
            )
        thr = weighted_keep_thresholds(
            counts.withColumnRenamed(source_col, "source"), weights
        )
    keyed = docs.withColumnRenamed(source_col, "source") if source_col != "source" else docs
    kept = (
        keyed.join(F.broadcast(thr.select("source", "thr_hex")), "source")
        .filter(
            F.substring(
                F.sha2(F.concat(F.lit(salt), F.col(id_col).cast("string")), 256),
                1,
                7,
            )
            < F.col("thr_hex")
        )
        .drop("thr_hex")
    )
    if source_col != "source":
        kept = kept.withColumnRenamed("source", source_col)
    return kept.select(*docs.columns)
