"""Storage-layout queries (round 3): partition-pruned scans over the
re-laid-out lineitem table. See ``sources/layout.py`` for the layout
operators themselves (partitioned writer, compaction)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..registry import register
from ..sources import layout


@register(
    "q_pruned_scan",
    oracle="""
SELECT l_returnflag,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
FROM lineitem
WHERE year(l_shipdate) = 1995
GROUP BY 1
""",
)
def q_pruned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Layout-aware scan: the ship-year filter is a PARTITION filter on
    the re-laid-out table — the scan touches only the 1995 directory
    (``PartitionFilters`` in the plan, pinned by
    tests/test_layout.py), while the oracle proves the result equals a
    full-scan year() predicate on the raw table. At 100 TB this is the
    difference between reading ~1/7th of the table and all of it.
    l_quantity is integral by construction, so the BIGINT cast is exact
    in both engines."""
    li = layout.partitioned_lineitem(spark, sf_dir)
    return (
        li.filter(F.col("ship_year") == 1995)
        .groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("l_quantity").cast("long")).cast("long").alias("sum_qty"),
        )
    )
