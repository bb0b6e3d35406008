"""Bucketized range (interval) join — SURVEY §2.4 J7: pair rows by a
pure time-range predicate (point-in-interval), the shape behind the
alert `for:` window semantics (reference monitoring/alerts.yml:7-8 —
"events inside a breached window") and behind every
"what happened in the N minutes after X" correlation query.

Spark's native plan for a join with no equality condition is a
broadcast nested-loop — O(|L|·|R|) comparisons and a broadcast of one
whole side, which is exactly what dies first at 100 TB. The scalable
formulation: quantize time into fixed buckets, explode each interval
into the buckets it overlaps (bounded fan-out: interval_len/bucket + 1
rows), hash-join point-side and interval-side on the bucket id, then
refine with the exact range predicate. One equi-shuffle, work
proportional to true match density, and AQE can still split skewed
hot buckets.

Bucket sizing: ~the typical interval length. Too small -> interval
fan-out grows; too large -> refine discards more candidates. Both
degrade gracefully (correctness never depends on the bucket: bucket
ids are exact integer division in the micros domain, so a point in
[start, end) always lands in one of the interval's enumerated
buckets).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

MICROS = 1_000_000


def _bucket(ts_col: str, bucket_seconds: int) -> Column:
    # integer division in the micros domain — never "/" on Columns
    # (double division: exact only below 2^53 and rounds at bucket
    # boundaries)
    return F.expr(f"unix_micros({ts_col}) div {bucket_seconds * MICROS}")


def point_in_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_ts: str,
    end_ts: str,
    bucket_seconds: int,
    extra_cond: Column | None = None,
) -> DataFrame:
    """Inner-join every point row to every interval row with
    ``start <= point_ts < end`` (half-open), via bucket-equality
    hash join + exact refine. Column sets must be disjoint and the
    three timestamp column names must be plain identifiers."""
    p = points.withColumn("_rj_bucket", _bucket(point_ts, bucket_seconds))
    i = intervals.withColumn(
        "_rj_bucket",
        F.explode(
            F.sequence(
                _bucket(start_ts, bucket_seconds), _bucket(end_ts, bucket_seconds)
            )
        ),
    )
    cond = (
        (p["_rj_bucket"] == i["_rj_bucket"])
        & (F.col(point_ts) >= F.col(start_ts))
        & (F.col(point_ts) < F.col(end_ts))
    )
    if extra_cond is not None:
        cond = cond & extra_cond
    return p.join(i, cond).drop("_rj_bucket")
