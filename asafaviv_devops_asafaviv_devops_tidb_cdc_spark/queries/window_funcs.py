"""Classic SQL window-function analytics (W10 block, r2).

The reference's Grafana layer implies running/cumulative views of the
counter series (dashboard panels are cumulative counters rendered as
rates of change; `increase()` IS a windowed delta —
`monitoring/recording-rules.yml:6-10`, dashboard json:162), but the
PromQL surface can't express per-entity running state. These queries
close that gap with the standard window-function algebra every
warehouse user expects: running totals, moving averages, lag deltas,
first/last per key, ntile bucketing and top-n per group.

Scale posture: every per-entity window partitions by a high-cardinality
key (custkey/brand/segment) — one hash shuffle, then per-key sorted
scans in parallel; no global sort. The two global-order windows
(moving average, day-over-day delta) run AFTER a daily pre-aggregation,
so the windowed input is bounded by #days regardless of input scale —
the same shape Prometheus recording rules produce.

Cross-engine determinism: money enters integer cents before any SUM
(queries/_money.py); ties in every ORDER BY are broken by a unique key;
window frames are spelled explicitly wherever first/last_value is used.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..registry import register
from ..sources import load_table
from ._money import cents

CENTS = "CAST(floor({x} * 100 + 0.5) AS BIGINT)"


@register(
    "q_running_total",
    oracle=f"""
SELECT o_custkey, o_orderkey,
       CAST(ROW_NUMBER() OVER w AS BIGINT) AS order_seq,
       CAST(SUM({CENTS.format(x='o_totalprice')}) OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS BIGINT) AS cum_spend_cents
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
""",
)
def q_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W10 — per-customer running order sequence + cumulative spend
    (the per-entity analogue of the reference's monotonically-growing
    counters, index.js:131-139). One shuffle on o_custkey; cumulative
    sums accumulate exact integer cents."""
    orders = load_table(spark, sf_dir, "orders")
    key = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    run = key.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.row_number().over(key).cast("long").alias("order_seq"),
        F.sum(cents("o_totalprice")).over(run).cast("long").alias("cum_spend_cents"),
    )


@register(
    "q_moving_avg",
    oracle="""
WITH daily AS (
  SELECT date_trunc('day', o_orderdate) AS day,
         CAST(COUNT(*) AS BIGINT) AS n_orders
  FROM orders GROUP BY 1
)
SELECT day, n_orders,
       CAST(CAST(SUM(n_orders) OVER w AS BIGINT) AS DOUBLE)
         / CAST(COUNT(*) OVER w AS DOUBLE) AS ma7
FROM daily
WINDOW w AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
""",
)
def q_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W10 — 7-day moving average of daily order counts (the smoothed
    rate panel, `rate(...[1h])` with a longer horizon). The global-order
    window runs on the POST-aggregation series — bounded by #days, so
    the single-partition sort is a few-KB problem at any input scale.
    Integer sum / integer count -> one IEEE division, cross-engine
    deterministic."""
    orders = load_table(spark, sf_dir, "orders")
    daily = (
        orders.groupBy(F.date_trunc("day", "o_orderdate").alias("day"))
        .agg(F.count("*").alias("n_orders"))
    )
    w = Window.orderBy("day").rowsBetween(-6, Window.currentRow)
    return daily.select(
        "day",
        "n_orders",
        (
            F.sum("n_orders").over(w).cast("double")
            / F.count("*").over(w).cast("double")
        ).alias("ma7"),
    )


@register(
    "q_lag_delta",
    oracle="""
WITH daily AS (
  SELECT date_trunc('day', ts) AS day, CAST(COUNT(*) AS BIGINT) AS n_events
  FROM events GROUP BY 1
)
SELECT day, n_events,
       n_events - LAG(n_events) OVER (ORDER BY day) AS delta
FROM daily
""",
)
def q_lag_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W10 — day-over-day delta of event volume via LAG (PromQL
    `delta()` over the date-histogram, recording-rules.yml:6-10 shape).
    Same bounded-after-preaggregation posture as q_moving_avg; first
    day's delta is NULL by definition in both engines."""
    events = load_table(spark, sf_dir, "events")
    daily = (
        events.groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(F.count("*").alias("n_events"))
    )
    w = Window.orderBy("day")
    return daily.select(
        "day",
        "n_events",
        (F.col("n_events") - F.lag("n_events").over(w)).alias("delta"),
    )


@register(
    "q_first_last",
    oracle="""
SELECT DISTINCT o_custkey,
       FIRST_VALUE(o_orderpriority) OVER w AS first_priority,
       LAST_VALUE(o_orderstatus) OVER w AS last_status,
       CAST(COUNT(*) OVER (PARTITION BY o_custkey) AS BIGINT) AS n_orders
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
""",
)
def q_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W10 — first/last attributes per key ordered by event time: the
    per-key `lastProcessedMessage` register (index.js:135-139,
    `max_by` in q_totals_last) generalized to both endpoints. Explicit
    unbounded frame so LAST_VALUE means the partition's last row in
    both engines; ties broken by o_orderkey."""
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return orders.select(
        "o_custkey",
        F.first("o_orderpriority").over(w).alias("first_priority"),
        F.last("o_orderstatus").over(w).alias("last_status"),
        F.count("*").over(Window.partitionBy("o_custkey")).alias("n_orders"),
    ).distinct()


@register(
    "q_ntile",
    oracle=f"""
WITH t AS (
  SELECT c_mktsegment, c_custkey, c_acctbal,
         NTILE(4) OVER (PARTITION BY c_mktsegment
                        ORDER BY c_acctbal, c_custkey) AS tile
  FROM customer
)
SELECT c_mktsegment, CAST(tile AS BIGINT) AS tile,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM({CENTS.format(x='c_acctbal')}) AS BIGINT) AS bal_cents,
       MIN(c_acctbal) AS min_bal,
       MAX(c_acctbal) AS max_bal
FROM t
GROUP BY 1, 2
""",
)
def q_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W10 — account-balance quartiles per market segment (NTILE), then
    per-tile stats: the quantile-bucketing idiom behind every histogram
    panel, exact instead of approx. Partitioned by segment so each
    sort is per-segment; at 100 TB swap exact NTILE for
    percentile_approx cutpoints (documented tradeoff), the oracle pins
    the exact semantics."""
    customer = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return (
        customer.withColumn("tile", F.ntile(4).over(w).cast("long"))
        .groupBy("c_mktsegment", "tile")
        .agg(
            F.count("*").alias("n"),
            F.sum(cents("c_acctbal")).cast("long").alias("bal_cents"),
            F.min("c_acctbal").alias("min_bal"),
            F.max("c_acctbal").alias("max_bal"),
        )
    )


@register(
    "q_topn_per_group",
    oracle="""
WITH r AS (
  SELECT p_brand, p_partkey, p_name, p_retailprice,
         ROW_NUMBER() OVER (PARTITION BY p_brand
                            ORDER BY p_retailprice DESC, p_partkey) AS rn
  FROM part
)
SELECT p_brand, CAST(rn AS BIGINT) AS rn, p_partkey, p_name, p_retailprice
FROM r WHERE rn <= 3
""",
)
def q_topn_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W10/W9 — top-3 parts by retail price within each brand: the
    grouped variant of q_topk_recent (W9 is global top-k via
    TakeOrderedAndProject; this is the partitioned form — one shuffle
    on p_brand, per-brand sort, early row_number filter). Raw DOUBLE
    price emitted untouched; rank ties broken by p_partkey."""
    part = load_table(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(
        F.col("p_retailprice").desc(), "p_partkey"
    )
    return (
        part.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 3)
        .select("p_brand", "rn", "p_partkey", "p_name", "p_retailprice")
    )


@register(
    "q_rolling_1h_count",
    oracle="""
WITH e AS (
  SELECT user_id, ts, epoch_ms(ts) // 1000 AS sec FROM events
)
SELECT user_id, ts,
       CAST(COUNT(*) OVER (PARTITION BY user_id ORDER BY sec
            RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) AS BIGINT)
         AS n_trailing_1h
FROM e
""",
)
def q_rolling_1h_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W10 — TRUE trailing-window rate per entity: a RANGE frame over
    event-time seconds (every event sees exactly the 3600 s behind it —
    the exact semantics the W1 bucketed windows approximate at bucket
    granularity). RANGE frames bound peers by VALUE, so ties on ts
    count together in both engines regardless of sort order — the
    reason this uses RANGE and not ROWS. One shuffle on user_id."""
    ev = load_table(spark, sf_dir, "events")
    sec = (F.unix_millis("ts") / F.lit(1000)).cast("long")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("sec"))
        .rangeBetween(-3600, Window.currentRow)
    )
    return (
        ev.withColumn("sec", sec)
        .select(
            "user_id",
            "ts",
            F.count("*").over(w).alias("n_trailing_1h"),
        )
    )


@register(
    "q_rank_stats",
    oracle="""
SELECT c_mktsegment, c_custkey, c_acctbal,
       percent_rank() OVER w AS pct_rank,
       cume_dist() OVER w AS cume
FROM customer
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
""",
)
def q_rank_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W10 — distribution ranks per segment: percent_rank
    ((rank-1)/(n-1)) and cume_dist (peers/n). Both are single IEEE
    divisions of integers — deterministic cross-engine; ties broken by
    custkey so rank is total. Partitioned by segment (parallel)."""
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return c.select(
        "c_mktsegment",
        "c_custkey",
        "c_acctbal",
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )
