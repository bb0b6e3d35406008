"""§2.10 extension-surface queries: the UDAF and UDTF examples from
functions/extensions.py, each oracle-backed — the slow user-extension
path must produce byte-identical answers to the built-in SQL path, or
the extension surface isn't safe to offer.

Determinism notes: the UDAF medians integer CENTS (numpy's even-count
median (a+b)/2 and DuckDB's quantile_cont interpolation a+(b-a)*0.5
are both exact on integers-in-double — no ulp divergence); the UDTF
output is pure parsed integers/doubles recovered from their JSON
string round-trip (bit-identical in both engines, same rule as the
P-chain).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.extensions import envelope_explode_udtf, median_udaf
from ..registry import register
from ..sources import envelopes_from_events, load_table
from .cdc import CDC_ROWS_CTE


@register(
    "q_udaf_median",
    oracle="""
SELECT event_type,
       quantile_cont(CAST(floor(value * 100 + 0.5) AS BIGINT), 0.5)
         AS median_cents
FROM events
GROUP BY 1
""",
)
def q_udaf_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 — user-defined aggregate: exact per-type median via an
    Arrow GROUPED_AGG pandas_udf (numpy kernel), hash-checked against
    DuckDB's quantile_cont. The built-in twin is q_median_value
    (Spark `percentile`) — this query exists to pin the EXTENSION
    path. Plan: one shuffle on event_type, Arrow batch per group;
    at scale a high-cardinality group key keeps batches bounded."""
    events = load_table(spark, sf_dir, "events").select(
        "event_type", F.expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").alias("c")
    )
    return events.groupBy("event_type").agg(
        median_udaf()("c").alias("median_cents")
    )


@register(
    "q_udtf_explode",
    oracle=CDC_ROWS_CTE
    + """
SELECT CAST(rownum AS INTEGER) AS row_index,
       row_id,
       row_value
FROM cdc_rows
""",
)
def q_udtf_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 — user-defined table function: the reference consumer's
    envelope->rows loop (node-consumer/index.js:235-333 is exactly one
    hard-coded UDTF) as a registered Python UDTF, lateral-joined over
    the envelope stream. Hash-checked against the same derivation the
    built-in from_json + posexplode chain is checked against — slow
    path == fast path, proven. Corrupt envelopes and DDL (null data)
    are skipped by the UDTF exactly like the validate stage (P2)."""
    spark.udtf.register("envelope_explode", envelope_explode_udtf())
    envelopes = envelopes_from_events(load_table(spark, sf_dir, "events"))
    envelopes.createOrReplaceTempView("_udtf_envelopes")
    return spark.sql(
        "SELECT f.row_index, f.row_id, f.row_value "
        "FROM _udtf_envelopes e, LATERAL envelope_explode(e.value) f"
    )
