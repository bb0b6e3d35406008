"""As-of (temporal latest-state) join — an operator Spark lacks as a
built-in, required by the CDC data model: "which was the current row /
latest prior fact for this key at this event's timestamp" (the batch
twin of the old-image pairing and current-state semantics in SURVEY
§2.4 J6; reference node-consumer/index.js:255 pairs old images, and
the ES sink accumulates history the reference can only correlate by
hand).

Implementation: tag both sides, union on the join key, one window scan
per key ordered by (ts, side) carrying the last non-null right payload
forward (``last(..., ignorenulls=True)`` over an unbounded-preceding
running frame). A right row at exactly the left timestamp sorts first,
giving ``left.ts >= right.ts`` inclusive semantics — identical to
DuckDB's ``ASOF JOIN``.

Scale posture: ONE shuffle, on the join key — no range explosion, no
candidate-pair materialization. The broadcast-range-join formulation
dies when the right side is large; a per-key sorted scan is O(n log n)
within partition and streams through Tungsten sort. Skewed keys can be
pre-split upstream (functions/skew.py) because the running frame only
needs right rows at-or-before each left row.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    payload_cols: Sequence[str],
    payload_alias: str = "asof",
) -> DataFrame:
    """For every left row, attach a struct of ``payload_cols`` from the
    right row with the greatest ``right_ts`` <= the row's ``left_ts``
    (sharing the ``on`` key), or NULL when no such row exists.

    Right rows MUST be unique per (``on``, ``right_ts``) — pre-dedup
    with a deterministic survivor rule, otherwise which tie wins is
    plan-dependent.
    """
    lcols = left.columns
    r = (
        right.select(
            *[F.col(c) for c in on],
            F.col(right_ts).alias("_asof_ts"),
            F.struct(*[F.col(c) for c in payload_cols]).alias("_asof_payload"),
        )
        .withColumn("_asof_side", F.lit(0))
    )
    l = left.withColumn("_asof_ts", F.col(left_ts)).withColumn(
        "_asof_side", F.lit(1)
    )
    u = l.unionByName(r, allowMissingColumns=True)
    w = (
        Window.partitionBy(*on)
        .orderBy("_asof_ts", "_asof_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        u.withColumn("_asof_match", F.last("_asof_payload", ignorenulls=True).over(w))
        .filter(F.col("_asof_side") == 1)
        .select(*lcols, F.col("_asof_match").alias(payload_alias))
    )
