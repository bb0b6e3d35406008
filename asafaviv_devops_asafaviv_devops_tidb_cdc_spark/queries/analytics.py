"""Star-schema analytics (SURVEY §2.4c: the north-star analytics
surface over the driver's TPC-H-ish schema) — the classic warehouse
query shapes, each exercising a distinct physical strategy:

- pricing summary: wide aggregation, map-side partial, one shuffle
- shipping priority: selective filters pushed to three scans, then
  join + top-k
- local supplier volume: six-table snowflake join where every dim
  broadcasts and the two fact tables meet in one shuffled join

Money sums accumulate in exact integer cents/1e-4-dollar units and are
emitted as dollars via one exact BIGINT->DOUBLE conversion — identical
in both engines at any row order (see queries/_money.py for why
scaled-decimal output is not hash-portable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..registry import register
from ..sources import load_table
from ._money import cents, revenue_units, rev_units_sql, sum_revenue_sql, units_as_dollars


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@register(
    "q_pricing_summary",
    oracle=f"""
SELECT l_returnflag,
       l_linestatus,
       CAST(SUM(l_quantity) AS BIGINT) AS sum_qty,
       CAST(SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100
         AS sum_base_price,
       {sum_revenue_sql()} AS sum_disc_price,
       CAST(COUNT(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= DATE '1998-09-02'
GROUP BY 1, 2
""",
)
def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape — pricing summary report: one wide aggregation
    over the fact table, fully map-side-combinable, one shuffle on the
    tiny (flag, status) key space. The shipdate predicate pushes to
    the parquet scan."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("date"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").cast("long").alias("sum_qty"),
            (F.sum(cents("l_extendedprice")).cast("double") / 100).alias(
                "sum_base_price"
            ),
            units_as_dollars(F.sum(revenue_units())).alias("sum_disc_price"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "q_ship_priority",
    oracle=f"""
SELECT l.l_orderkey,
       {sum_revenue_sql('l.l_extendedprice', 'l.l_discount')} AS revenue,
       o.o_orderdate
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < DATE '1995-03-15'
  AND l.l_shipdate > DATE '1995-03-15'
GROUP BY 1, 3
ORDER BY revenue DESC, o_orderdate, l_orderkey
LIMIT 10
""",
)
def q_ship_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape — shipping priority: three selective predicates
    each pushed to its own scan, the surviving orders joined to
    lineitem, then a global top-10 by revenue (tie-broken
    deterministically). No explicit broadcast hint on customer — it
    grows linearly with scale factor (~15 B rows at 100 TB), so a
    hard hint would OOM the driver at scale; AQE picks broadcast at
    gate SF on its own and stays free to shuffle at 100x (r12
    broadcast-hint audit)."""
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1995-03-15").cast("date")
    )
    l = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15").cast("date")
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(units_as_dollars(F.sum(revenue_units())).alias("revenue"))
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
        .select("l_orderkey", "revenue", "o_orderdate")
    )


@register(
    "q_local_supplier_volume",
    oracle=f"""
SELECT n.n_name,
       {sum_revenue_sql('l.l_extendedprice', 'l.l_discount')} AS revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
GROUP BY 1
""",
)
def q_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape — local supplier volume: six-table snowflake.
    Only nation/region keep broadcast hints (constant 25/5 rows);
    customer and supplier grow linearly with scale factor, so they
    carry no hint — AQE broadcasts them at gate SF and shuffles them
    at 100x where a hard hint would OOM the driver (r12
    broadcast-hint audit). The region filter still prunes through
    the join chain before any fact rows move."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            s,
            (l.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(units_as_dollars(F.sum(revenue_units())).alias("revenue"))
    )


@register(
    "q_order_priority",
    oracle="""
SELECT o.o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS order_count
FROM orders o
WHERE o.o_orderdate >= DATE '1996-07-01'
  AND o.o_orderdate < DATE '1996-10-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate)
GROUP BY 1
""",
)
def q_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape — order priority checking: EXISTS becomes a
    LEFT SEMI join with a mixed equi + range condition (shipped after
    ordering). The date window pushes into the orders scan; lineitem
    carries only (orderkey, shipdate) into the shuffle. Our lineitem
    has no commit/receipt dates, so the late-line predicate is
    l_shipdate > o_orderdate."""
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("date"))
    )
    l = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        o.join(
            l,
            (o.o_orderkey == l.l_orderkey) & (l.l_shipdate > o.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


@register(
    "q_returned_items",
    oracle=f"""
SELECT c.c_custkey, c.c_name, n.n_name,
       {sum_revenue_sql('l.l_extendedprice', 'l.l_discount')} AS revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE o.o_orderdate >= DATE '1996-10-01'
  AND o.o_orderdate < DATE '1997-01-01'
  AND l.l_returnflag = 'R'
GROUP BY 1, 2, 3
ORDER BY revenue DESC, c_custkey
LIMIT 20
""",
)
def q_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape — returned-item reporting: who returned the
    most revenue last quarter. Returnflag pushes into the lineitem
    scan, the quarter window into orders; only nation keeps a
    broadcast hint (constant 25 rows) — customer grows with scale
    factor, so it carries none and AQE decides (broadcast at gate SF,
    shuffle at 100x; r12 broadcast-hint audit); one fact-fact
    shuffle, then top-20 with a deterministic custkey tiebreak."""
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("date"))
    )
    l = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(units_as_dollars(F.sum(revenue_units())).alias("revenue"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
        .select("c_custkey", "c_name", "n_name", "revenue")
    )


@register(
    "q_promo_share",
    oracle=f"""
SELECT date_trunc('month', l.l_shipdate) AS ship_month,
       CAST(SUM(CASE WHEN p.p_type LIKE 'ECONOMY%'
                     THEN {rev_units_sql('l.l_extendedprice', 'l.l_discount')}
                     ELSE 0 END) * 1000000
            // SUM({rev_units_sql('l.l_extendedprice', 'l.l_discount')})
         AS BIGINT) AS promo_ppm
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= DATE '1995-01-01' AND l.l_shipdate < DATE '1996-01-01'
GROUP BY 1
""",
)
def q_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape — promotion revenue share per ship month
    (our part types have no PROMO class; ECONOMY stands in).
    Conditional aggregation over the part join — no broadcast hint:
    part grows with scale factor (~20 B rows at 100 TB), so AQE
    decides the strategy (r12 broadcast-hint audit). The ratio is
    exact integer ppm over integer revenue units — no float division
    anywhere, so no engine can diverge. (Integer-unit sums bound the
    ppm numerator to ~1e18 at sf10; beyond that, pre-divide units.)"""
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01").cast("date"))
        & (F.col("l_shipdate") < F.lit("1996-01-01").cast("date"))
    )
    promo = F.when(F.col("p_type").like("ECONOMY%"), revenue_units()).otherwise(
        F.lit(0).cast("long")
    )
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .groupBy(F.date_trunc("month", F.col("l_shipdate")).alias("ship_month"))
        .agg(
            F.sum(promo).alias("_promo_u"),
            F.sum(revenue_units()).alias("_total_u"),
        )
        .select(
            "ship_month",
            F.expr("(_promo_u * 1000000) div _total_u").cast("long").alias("promo_ppm"),
        )
    )


@register(
    "q_top_supplier",
    oracle=f"""
WITH rev AS (
  SELECT l_suppkey,
         CAST(SUM({rev_units_sql()}) AS BIGINT) AS units
  FROM lineitem
  WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1996-04-01'
  GROUP BY 1)
SELECT s.s_suppkey, s.s_name,
       CAST(r.units AS DOUBLE) / 10000 AS total_revenue
FROM supplier s JOIN rev r ON s.s_suppkey = r.l_suppkey
WHERE r.units = (SELECT MAX(units) FROM rev)
""",
)
def q_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape — top supplier by quarterly revenue: aggregate,
    then keep the argmax row(s). The scalar subquery becomes a
    broadcast of a 1-row global max joined back into the aggregate —
    no single-partition global window, which would serialize at
    scale. Only the 1-row max keeps a hint; supplier grows with
    scale factor, so its join is unhinted and AQE decides (r12
    broadcast-hint audit)."""
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("date"))
    )
    totals = l.groupBy("l_suppkey").agg(F.sum(revenue_units()).alias("units"))
    mx = totals.agg(F.max("units").alias("_mx"))
    s = _t(spark, sf_dir, "supplier")
    return (
        totals.join(F.broadcast(mx), totals.units == F.col("_mx"))
        .join(s, totals.l_suppkey == s.s_suppkey)
        .select("s_suppkey", "s_name", units_as_dollars(F.col("units")).alias("total_revenue"))
    )


@register(
    "q_nation_volume",
    oracle=f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(EXTRACT(year FROM l.l_shipdate) AS BIGINT) AS l_year,
       {sum_revenue_sql('l.l_extendedprice', 'l.l_discount')} AS revenue
FROM supplier s
JOIN lineitem l ON s.s_suppkey = l.l_suppkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
  AND l.l_shipdate BETWEEN DATE '1995-01-01' AND DATE '1996-12-31'
GROUP BY 1, 2, 3
""",
)
def q_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape — volume shipping between two nations by year:
    the bidirectional nation-pair predicate lands on two BROADCAST
    nation copies (distinct aliases, constant 25 rows each), so the
    pair filter prunes fact rows before the single orders-lineitem
    shuffle; year() is computed post-join on survivors only. Supplier
    and customer carry no hint — both grow with scale factor, so AQE
    decides their strategy (r12 broadcast-hint audit)."""
    s = _t(spark, sf_dir, "supplier")
    c = _t(spark, sf_dir, "customer")
    n1 = _t(spark, sf_dir, "nation").alias("n1")
    n2 = _t(spark, sf_dir, "nation").alias("n2")
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").between("1995-01-01", "1996-12-31")
    )
    pair = (
        (F.col("n1.n_name") == "NATION_1") & (F.col("n2.n_name") == "NATION_2")
    ) | ((F.col("n1.n_name") == "NATION_2") & (F.col("n2.n_name") == "NATION_1"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1.n_nationkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2.n_nationkey"))
        .filter(pair)
        .groupBy(
            F.col("n1.n_name").alias("supp_nation"),
            F.col("n2.n_name").alias("cust_nation"),
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(units_as_dollars(F.sum(revenue_units())).alias("revenue"))
    )


@register(
    "q_market_share",
    oracle=f"""
SELECT o_year,
       CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN units ELSE 0 END)
            * 1000000 // SUM(units) AS BIGINT) AS share_ppm
FROM (
  SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS o_year,
         n2.n_name AS supp_nation,
         {rev_units_sql('l.l_extendedprice', 'l.l_discount')} AS units
  FROM part p
  JOIN lineitem l ON p.p_partkey = l.l_partkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
  JOIN region r ON n1.n_regionkey = r.r_regionkey
  JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
  WHERE r.r_name = 'ASIA' AND p.p_type = 'ECONOMY'
) t
GROUP BY 1
""",
)
def q_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape — market share of one supplier nation within a
    customer region for one part type, per order year. Only the
    constant-size dimensions (nation x2, region) keep broadcast
    hints; part/supplier/customer grow with scale factor, so their
    joins are unhinted and AQE decides (r12 broadcast-hint audit).
    The fact tables meet in one shuffle; the share is exact integer
    ppm (no float division), the same cross-engine-deterministic
    ratio idiom as q_promo_share."""
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    s = _t(spark, sf_dir, "supplier")
    c = _t(spark, sf_dir, "customer")
    n1 = _t(spark, sf_dir, "nation").alias("cn")
    n2 = _t(spark, sf_dir, "nation").alias("sn")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem")
    share_units = F.when(
        F.col("sn.n_name") == "NATION_3", revenue_units()
    ).otherwise(F.lit(0).cast("long"))
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("cn.n_nationkey"))
        .join(F.broadcast(r), F.col("cn.n_regionkey") == r.r_regionkey)
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("sn.n_nationkey"))
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            F.sum(share_units).alias("_share_u"),
            F.sum(revenue_units()).alias("_total_u"),
        )
        .select(
            "o_year",
            F.expr("(_share_u * 1000000) div _total_u").cast("long").alias("share_ppm"),
        )
    )


@register(
    "q_order_count_dist",
    oracle="""
SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
FROM (
  SELECT c.c_custkey, CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
  FROM customer c
  LEFT JOIN orders o ON c.c_custkey = o.o_custkey
                    AND o.o_orderpriority <> '1-URGENT'
  GROUP BY 1
) t
GROUP BY 1
""",
)
def q_order_count_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape — customer distribution by order count, with the
    filter INSIDE the left join so zero-order customers survive (the
    shape an inner join silently gets wrong). Two aggregations: the
    first shuffles on custkey, the second on the tiny count domain."""
    c = _t(spark, sf_dir, "customer").select("c_custkey")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    ).select("o_custkey", "o_orderkey")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@register(
    "q_small_qty_revenue",
    oracle="""
WITH pa AS (
  SELECT l_partkey,
         0.2 * (CAST(SUM(l_quantity) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE))
           AS qty_cut
  FROM lineitem GROUP BY 1
)
SELECT CAST(SUM(CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT))
            AS DOUBLE) / 100 / 7.0 AS avg_yearly
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN pa ON pa.l_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#13' AND l.l_quantity < pa.qty_cut
""",
)
def q_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape — revenue lost to small-quantity orders: the
    correlated per-part average becomes a self-aggregate joined back on
    partkey (co-partitioned: both sides shuffle on l_partkey once).
    Quantities are integral doubles, so SUM is exact at any partition
    order, and the 0.2x cut is one IEEE multiply/divide — identical in
    both engines. The part join is unhinted — part grows with scale
    factor, so AQE decides (r12 broadcast-hint audit)."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#13")
    pa = l.groupBy(F.col("l_partkey").alias("pa_partkey")).agg(
        (
            (F.sum("l_quantity").cast("double") / F.count("*").cast("double"))
            * 0.2
        ).alias("qty_cut")
    )
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .join(pa, l.l_partkey == pa.pa_partkey)
        .filter(F.col("l_quantity") < F.col("qty_cut"))
        .agg(
            (F.sum(cents("l_extendedprice")).cast("double") / 100 / 7.0).alias(
                "avg_yearly"
            )
        )
    )


@register(
    "q_big_orders",
    oracle="""
SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
       CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT) AS total_cents,
       CAST(SUM(l.l_quantity) AS BIGINT) AS sum_qty
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderkey IN (
  SELECT l_orderkey FROM lineitem GROUP BY 1 HAVING SUM(l_quantity) > 150
)
GROUP BY 1, 2, 3, 4, 5
ORDER BY sum_qty DESC, o_orderkey
LIMIT 100
""",
)
def q_big_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape — large-volume customers: the HAVING subquery
    becomes a pre-aggregated key set LEFT SEMI-joined into lineitem
    (both sides partition on orderkey — AQE sees the reused exchange),
    then customer joins the survivors unhinted — customer grows with
    scale factor, so AQE decides its strategy (r12 broadcast-hint
    audit). Top-100 with deterministic orderkey tiebreak."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("_q"))
        .filter(F.col("_q") > 150)
        .select(F.col("l_orderkey").alias("big_orderkey"))
    )
    return (
        l.join(big, l.l_orderkey == F.col("big_orderkey"), "left_semi")
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            cents("o_totalprice").alias("total_cents"),
        )
        .agg(F.sum("l_quantity").cast("long").alias("sum_qty"))
        .orderBy(F.desc("sum_qty"), "o_orderkey")
        .limit(100)
    )


_REGION_REVENUE_SQL = """
SELECT r.r_name AS region_name,
       CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS o_year,
       CAST(SUM(CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT)
                * (100 - CAST(floor(l.l_discount * 100 + 0.5) AS BIGINT)))
            AS DOUBLE) / 10000 AS revenue,
       CAST(COUNT(DISTINCT o.o_orderkey) AS BIGINT) AS n_orders
FROM lineitem l
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
JOIN region r   ON n.n_regionkey = r.r_regionkey
GROUP BY 1, 2
"""


@register("q_sql_region_revenue", oracle=_REGION_REVENUE_SQL)
def q_sql_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4/SQL API — the same engine through the SQL entry point: tables
    registered as views (sources.register_views), the query text passed
    verbatim to spark.sql. The SQL is written once and runs unmodified
    in BOTH engines (ANSI subset: EXTRACT, floor-cents money math), so
    the oracle string IS the Spark query — API-surface parity the
    reference's mysql-client path (docker-compose.yml:116-136) implies.
    Catalyst plans it identically to the DataFrame form: dims
    broadcast, one fact-fact shuffle, partial aggregation."""
    from ..sources import register_views

    register_views(spark, sf_dir)
    return spark.sql(_REGION_REVENUE_SQL)


@register(
    "q_forecast_revenue",
    oracle="""
SELECT CAST(SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
               * CAST(floor(l_discount * 100 + 0.5) AS BIGINT)) AS BIGINT)
         AS revenue_e4
FROM lineitem
WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
""",
)
def q_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape — forecasting revenue change: a pure
    predicate-heavy scan-aggregate. ALL four predicates (date window,
    discount band, quantity cap) push into the parquet scan and the
    row-group statistics prune before decode — the canonical
    full-pushdown query. Revenue accumulates as cents x discount-cents
    (exact 1e-4-dollar integers). Map-side partial agg to a single
    row: zero meaningful shuffle at any scale."""
    l = load_table(spark, sf_dir, "lineitem")
    f = l.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("date"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return f.agg(
        F.sum(cents("l_extendedprice") * cents("l_discount"))
        .cast("long")
        .alias("revenue_e4")
    )


@register(
    "q_idle_rich_customers",
    oracle="""
WITH pos AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS s
  FROM customer WHERE c_acctbal > 0.0
)
SELECT c.c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n_custs,
       CAST(SUM(CAST(floor(c.c_acctbal * 100 + 0.5) AS BIGINT)) AS BIGINT)
         AS total_bal_cents
FROM customer c, pos
WHERE CAST(floor(c.c_acctbal * 100 + 0.5) AS BIGINT) * pos.n > pos.s
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderdate >= DATE '2000-01-01')
GROUP BY 1
""",
)
def q_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape — "rich but idle" customers: above-average
    balance (scalar-aggregate subquery) with no RECENT orders — none
    since 2000-01-01 (anti join on a date-filtered order set: the
    churn-risk variant), grouped by segment. The average threshold compares as
    an integer CROSS-MULTIPLY (cents x count > total-cents) — a float
    average threshold could flip boundary rows between engines; the
    cross-multiply is exact. Plan: the single-row positive-balance agg
    broadcasts; the anti join shuffles on custkey (or broadcasts the
    order-key side after AQE sizes it); one segment agg after."""
    c = load_table(spark, sf_dir, "customer")
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2000-01-01").cast("date"))
        .select("o_custkey")
    )
    pos = c.filter(F.col("c_acctbal") > 0.0).agg(
        F.count("*").alias("n"),
        F.sum(cents("c_acctbal")).cast("long").alias("s"),
    )
    rich = c.crossJoin(F.broadcast(pos)).filter(
        cents("c_acctbal") * F.col("n") > F.col("s")
    )
    idle = rich.join(o, rich.c_custkey == o.o_custkey, "left_anti")
    return idle.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_custs"),
        F.sum(cents("c_acctbal")).cast("long").alias("total_bal_cents"),
    )


@register(
    "q_supplier_parts",
    oracle="""
SELECT p.p_brand, p.p_type, p.p_size,
       CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand <> 'Brand#45'
  AND p.p_type NOT LIKE 'MEDIUM%'
  AND p.p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
  AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY 1, 2, 3
""",
)
def q_supplier_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape — parts/supplier relationship report: distinct
    supplier count per (brand, type, size) with a NOT-IN exclusion
    subquery (suppliers "with complaints" — negative balance stands in
    for the missing comment column). The exclusion LEFT ANTI join and
    the filtered-part join are both unhinted — both sides derive from
    SF-growing tables (supplier, part), so AQE decides (it broadcasts
    them at gate SF; r12 broadcast-hint audit). Null-safe here: keys
    are non-null. The brand/type/size predicates all push to the part
    scan; COUNT(DISTINCT) shuffles once on the group key with the
    suppkey carried for the distinct-aggregate expand."""
    l = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#45")
        & ~F.col("p_type").startswith("MEDIUM")
        & F.col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22)
    )
    bad = (
        _t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select(F.col("s_suppkey").alias("bad_suppkey"))
    )
    return (
        l.join(bad, l.l_suppkey == F.col("bad_suppkey"), "left_anti")
        .join(p, l.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q_disjunctive_revenue",
    oracle=f"""
SELECT {sum_revenue_sql('l.l_extendedprice', 'l.l_discount')} AS revenue
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
       AND l.l_quantity BETWEEN 1 AND 11)
   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
       AND l.l_quantity BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity BETWEEN 20 AND 30)
""",
)
def q_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape — discounted revenue under a DISJUNCTION of
    (brand, size-range, quantity-range) triples: the planner case where
    a naive engine evaluates the OR after the join. Catalyst extracts
    the common-subexpression bounds: the per-side implied predicates
    (p_size >= 1, quantity/size upper bounds from the OR's union) push
    into BOTH scans, the part join is unhinted (part grows with scale
    factor — AQE broadcasts at gate SF, shuffles at 100x; r12
    broadcast-hint audit), and the residual OR evaluates in the
    join's codegen stage. Revenue accumulates in exact integer
    1e-4-dollar units."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    joined = l.join(p, l.l_partkey == p.p_partkey)
    cond = (
        (F.col("p_brand") == "Brand#12")
        & F.col("p_size").between(1, 5)
        & F.col("l_quantity").between(1, 11)
    ) | (
        (F.col("p_brand") == "Brand#23")
        & F.col("p_size").between(1, 10)
        & F.col("l_quantity").between(10, 20)
    ) | (
        (F.col("p_brand") == "Brand#34")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(20, 30)
    )
    return joined.filter(cond).agg(
        units_as_dollars(F.sum(revenue_units())).alias("revenue")
    )


@register(
    "q_value_parts",
    oracle="""
WITH pv AS (
  SELECT l_partkey,
         CAST(SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS value_cents
  FROM lineitem GROUP BY 1
),
tot AS (SELECT COUNT(*) AS np, CAST(SUM(value_cents) AS BIGINT) AS tv FROM pv)
SELECT pv.l_partkey AS partkey, pv.value_cents
FROM pv, tot
WHERE pv.value_cents * tot.np * 2 > tot.tv * 3
""",
)
def q_value_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape — disproportionately valuable parts: per-part
    value vs a SCALAR-subquery threshold over the same aggregate
    (parts holding > 1.5x the mean value share — scale-free, unlike
    Q11's literal fraction, so the shape yields rows at any SF). The
    per-part aggregate is computed ONCE — not via an explicit persist
    (which would pin an unboundedly large cache for the session) but
    by exchange reuse: both consumers sit on the identical groupBy
    shuffle, so Catalyst plans one scan + one exchange and a
    ReusedExchange for the second branch (plan-shape-pinned). The
    single-row (count, total) reduction broadcasts back via cross
    join, and the threshold compares as an integer cross-multiply
    (cents x count x 2 > total x 3) — exact at any partition order,
    where a float mean could flip boundary rows between engines."""
    pv = (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_partkey")
        .agg(F.sum(cents("l_extendedprice")).cast("long").alias("value_cents"))
    )
    tot = pv.agg(
        F.count("*").alias("np"), F.sum("value_cents").cast("long").alias("tv")
    )
    return (
        pv.crossJoin(F.broadcast(tot))
        .filter(F.col("value_cents") * F.col("np") * 2 > F.col("tv") * 3)
        .select(F.col("l_partkey").alias("partkey"), "value_cents")
    )


@register(
    "q_nation_profit",
    oracle=f"""
SELECT n.n_name AS nation,
       CAST(year(l.l_shipdate) AS INTEGER) AS yr,
       CAST(SUM({rev_units_sql('l.l_extendedprice', 'l.l_discount')}
                - CAST(l.l_quantity AS BIGINT)
                  * CAST(floor(p.p_retailprice * 100 + 0.5) AS BIGINT) * 10)
            AS BIGINT) AS profit_units
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE p.p_type = 'PROMO'
GROUP BY 1, 2
""",
)
def q_nation_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape — product-line profit by (supplier nation, ship
    year): the fact table meets THREE dimensions — only nation keeps
    a broadcast hint (constant 25 rows); part and supplier grow with
    scale factor, so their joins are unhinted and AQE decides (r12
    broadcast-hint audit). Part is pre-filtered to the PROMO line
    before the join, so the build side shrinks at the scan, and
    profit accumulates as
    revenue-units minus a unit-cost term (10% of retail per unit,
    i.e. retail_cents x 10 in 1e-4-dollar units) — all exact BIGINT
    arithmetic, so the sum is partition-order-proof. The planner
    property Q9 exercises: join ORDER (dims first, never
    fact x fact) and pushdown of the dim filter below the join."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    profit = revenue_units() - F.col("l_quantity").cast("long") * cents(
        "p_retailprice"
    ) * F.lit(10)
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("l_shipdate").cast("int").alias("yr"),
        )
        .agg(F.sum(profit).cast("long").alias("profit_units"))
    )


@register(
    "q_late_shipments",
    oracle="""
SELECT l.l_linestatus,
       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
WHERE l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
GROUP BY 1
""",
)
def q_late_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape — late-shipment priority audit: one fact-fact
    equi-join with a NON-equi residual (shipped more than 60 days
    after the order date), then the Q12 CASE-sum splitting counts into
    high/low priority classes. The planner properties: the date
    comparison stays a residual on the join (never a BNLJ), and the
    two conditional sums compute in ONE aggregation pass over the
    joined rows — not two queries."""
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 60))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("long").alias("low_line_count"),
        )
    )


@register(
    "q_blocking_suppliers",
    oracle="""
WITH fl AS (
  SELECT l.l_orderkey, l.l_suppkey, l.l_shipdate
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
  WHERE o.o_orderstatus = 'F'
)
SELECT l1.l_suppkey AS suppkey,
       CAST(COUNT(*) AS BIGINT) AS numwait
FROM fl l1
WHERE EXISTS (SELECT 1 FROM fl l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM fl l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > l1.l_shipdate)
GROUP BY 1
ORDER BY numwait DESC, suppkey
LIMIT 20
""",
)
def q_blocking_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape — suppliers who shipped LAST on multi-supplier
    finalized orders (the 'kept everyone waiting' audit): a self-SEMI
    join (another supplier exists on the order) composed with a
    self-ANTI join (no other supplier shipped strictly later). The
    planner properties Q21 exercises: two correlated EXISTS over the
    same fact resolve as semi/anti hash joins on the order key — never
    nested-loop re-scans — and the probe side is scanned once per
    join, with the orders filter pushed below everything. Top-20 is
    TakeOrderedAndProject."""
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    fl = (
        l.join(o, l.l_orderkey == o.o_orderkey, "left_semi")
        .select("l_orderkey", "l_suppkey", "l_shipdate")
    )
    l2 = fl.select(
        F.col("l_orderkey").alias("o2"), F.col("l_suppkey").alias("s2")
    )
    l3 = fl.select(
        F.col("l_orderkey").alias("o3"),
        F.col("l_suppkey").alias("s3"),
        F.col("l_shipdate").alias("d3"),
    )
    waited = fl.join(
        l2,
        (F.col("l_orderkey") == F.col("o2")) & (F.col("l_suppkey") != F.col("s2")),
        "left_semi",
    ).join(
        l3,
        (F.col("l_orderkey") == F.col("o3"))
        & (F.col("l_suppkey") != F.col("s3"))
        & (F.col("d3") > F.col("l_shipdate")),
        "left_anti",
    )
    return (
        waited.groupBy(F.col("l_suppkey").alias("suppkey"))
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), "suppkey")
        .limit(20)
    )


@register(
    "q_min_cost_supplier",
    oracle="""
WITH supply AS (
  SELECT l_partkey, l_suppkey,
         MIN(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS cost_cents
  FROM lineitem
  GROUP BY 1, 2
),
cand AS (
  SELECT p.p_partkey, p.p_name, s.s_suppkey, s.s_name, n.n_name,
         CAST(floor(s.s_acctbal * 100 + 0.5) AS BIGINT) AS acctbal_cents,
         sp.cost_cents
  FROM supply sp
  JOIN part p ON p.p_partkey = sp.l_partkey
  JOIN supplier s ON s.s_suppkey = sp.l_suppkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  JOIN region r ON r.r_regionkey = n.n_regionkey
  WHERE p.p_type = 'PROMO' AND p.p_size <= 10 AND r.r_name = 'EUROPE'
)
SELECT p_partkey AS partkey, p_name AS part_name, s_suppkey AS suppkey,
       s_name AS supp_name, n_name AS nation, acctbal_cents, cost_cents
FROM (SELECT *, row_number() OVER (PARTITION BY p_partkey
                                   ORDER BY cost_cents, s_suppkey) AS rn
      FROM cand)
WHERE rn = 1
""",
)
def q_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape — minimum-cost supplier per part within a region
    (the correlated-MIN subquery classic), adapted to the driver schema
    (no partsupp table): the supply relation derives from lineitem as
    the cheapest observed lot price per (part, supplier) in exact
    cents. Physical strategy: ONE fact shuffle builds the compact
    supply aggregate; only nation/region (constant 25/5 rows) keep
    broadcast hints — part and the supplier-derived ``eur`` frame grow
    with scale factor, so their joins are unhinted and AQE decides
    (r12 broadcast-hint audit); the part filter still prunes the
    build side at its scan; the
    correlated MIN resolves as a single ``min(struct(...))`` per-part
    aggregation over the already-compact candidate frame — no second
    fact scan, no window sort, ties broken by suppkey via lexicographic
    struct order. Reference surface: sql/schema.sql:30-31 declares the
    FK web this navigates."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_type") == "PROMO") & (F.col("p_size") <= 10)
    )
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    supply = l.groupBy("l_partkey", "l_suppkey").agg(
        F.min(cents("l_extendedprice")).alias("cost_cents")
    )
    eur = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select(
            "s_suppkey",
            "s_name",
            "n_name",
            cents("s_acctbal").alias("acctbal_cents"),
        )
    )
    cand = supply.join(
        p, supply.l_partkey == p.p_partkey
    ).join(eur, supply.l_suppkey == F.col("s_suppkey"))
    best = cand.groupBy(F.col("p_partkey").alias("partkey")).agg(
        F.min(
            F.struct(
                "cost_cents",
                F.col("s_suppkey").alias("suppkey"),
                F.col("s_name").alias("supp_name"),
                F.col("n_name").alias("nation"),
                "acctbal_cents",
                F.col("p_name").alias("part_name"),
            )
        ).alias("b")
    )
    return best.select(
        "partkey",
        F.col("b.part_name").alias("part_name"),
        F.col("b.suppkey").alias("suppkey"),
        F.col("b.supp_name").alias("supp_name"),
        F.col("b.nation").alias("nation"),
        F.col("b.acctbal_cents").alias("acctbal_cents"),
        F.col("b.cost_cents").alias("cost_cents"),
    )


@register(
    "q_excess_suppliers",
    oracle="""
WITH qty AS (
  SELECT l.l_partkey, l.l_suppkey,
         CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS qty_sp
  FROM lineitem l
  JOIN part p ON p.p_partkey = l.l_partkey
  WHERE p.p_name LIKE 'red %'
    AND l.l_shipdate >= DATE '1995-01-01'
    AND l.l_shipdate < DATE '1996-01-01'
  GROUP BY 1, 2
),
flagged AS (
  SELECT l_suppkey,
         qty_sp,
         SUM(qty_sp) OVER (PARTITION BY l_partkey) AS qty_total
  FROM qty
)
SELECT s.s_suppkey AS suppkey, s.s_name AS supp_name, n.n_name AS nation,
       CAST(COUNT(*) AS BIGINT) AS n_excess_parts
FROM flagged f
JOIN supplier s ON s.s_suppkey = f.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
JOIN region r ON r.r_regionkey = n.n_regionkey
WHERE f.qty_sp * 5 > f.qty_total AND r.r_name = 'ASIA'
GROUP BY 1, 2, 3
""",
)
def q_excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape — suppliers holding an outsized share of a
    part's flow (the nested IN-subquery chain), adapted to the driver
    schema: for 'red'-named parts shipped in 1995, flag (part,
    supplier) pairs whose shipped quantity exceeds 20 % of the part's
    total, then report flagged ASIA-region suppliers. Physical
    strategy: the part-name filter semi-joins into the fact scan
    (prune before the agg), ONE fact shuffle builds the
    (part, supplier) quantity aggregate, the per-part total is a
    window over that already-compact frame (no second fact pass — the
    Q20 subquery collapses into the window), and the 20 % threshold is
    an exact integer cross-multiply (qty*5 > total) so no division can
    ulp-flip a boundary pair. Only nation/region (constant rows) keep
    broadcast hints; the part semi-join and the supplier-derived
    ``asia`` frame grow with scale factor, so those joins are unhinted
    and AQE decides (r12 broadcast-hint audit)."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").like("red %"))
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    from pyspark.sql import Window

    qty = (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1995-01-01").cast("date"))
            & (F.col("l_shipdate") < F.lit("1996-01-01").cast("date"))
        )
        .join(p, l.l_partkey == p.p_partkey, "left_semi")
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("qty_sp"))
    )
    flagged = qty.withColumn(
        "qty_total", F.sum("qty_sp").over(Window.partitionBy("l_partkey"))
    ).filter(F.col("qty_sp") * 5 > F.col("qty_total"))
    asia = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("s_suppkey", "s_name", "n_name")
    )
    return (
        flagged.join(asia, flagged.l_suppkey == F.col("s_suppkey"))
        .groupBy(
            F.col("s_suppkey").alias("suppkey"),
            F.col("s_name").alias("supp_name"),
            F.col("n_name").alias("nation"),
        )
        .agg(F.count("*").alias("n_excess_parts"))
    )


@register(
    "q_cohort_retention",
    oracle="""
WITH first_order AS (
  SELECT o_custkey,
         strftime(MIN(o_orderdate), '%Y-%m') AS cohort_month,
         CAST(year(MIN(o_orderdate)) * 12 + month(MIN(o_orderdate)) AS BIGINT)
           AS cohort_ym
  FROM orders
  GROUP BY 1
)
SELECT f.cohort_month,
       CAST(year(o.o_orderdate) * 12 + month(o.o_orderdate) - f.cohort_ym
            AS INTEGER) AS months_since,
       CAST(COUNT(DISTINCT o.o_custkey) AS BIGINT) AS active_customers,
       CAST(COUNT(*) AS BIGINT) AS n_orders
FROM orders o
JOIN first_order f ON f.o_custkey = o.o_custkey
GROUP BY 1, 2
""",
)
def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort-retention matrix — the classic warehouse growth report:
    customers cohorted by first-order month, activity counted per
    (cohort, months-since-cohort). Physical strategy: the first-order
    frame is customer-cardinality (one map-side-combinable fact agg);
    it re-meets orders in an equi-join ON THE SAME custkey the agg
    just shuffled on, so AQE co-partitions the two sides without a
    third exchange; month arithmetic is pure integers (year*12+month)
    — no interval/months_between semantics that differ between
    engines. At 100 TB both sides of the join are hash-partitioned by
    custkey and the distinct-count is per-group exact (the cohort key
    space is tiny: months x offsets)."""
    o = _t(spark, sf_dir, "orders")
    first = o.groupBy("o_custkey").agg(
        F.date_format(F.min("o_orderdate"), "yyyy-MM").alias("cohort_month"),
        (
            F.year(F.min("o_orderdate")) * 12 + F.month(F.min("o_orderdate"))
        )
        .cast("long")
        .alias("cohort_ym"),
    )
    oo = o.select(
        F.col("o_custkey").alias("custkey"),
        (F.year("o_orderdate") * 12 + F.month("o_orderdate")).alias("order_ym"),
    )
    return (
        oo.join(first, oo.custkey == first.o_custkey)
        .groupBy(
            "cohort_month",
            (F.col("order_ym") - F.col("cohort_ym")).cast("int").alias(
                "months_since"
            ),
        )
        .agg(
            F.countDistinct("custkey").alias("active_customers"),
            F.count("*").alias("n_orders"),
        )
    )


@register(
    "q_sample_estimate_bound",
    oracle=f"""
WITH t AS (
  SELECT {rev_units_sql()} AS rev,
         CASE WHEN substr(sha256('est1_' || CAST(l_orderkey AS VARCHAR)
                                 || '_' || CAST(l_linenumber AS VARCHAR)),
                          1, 1) < '1'
              THEN 1 ELSE 0 END AS in_sample
  FROM lineitem
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_total,
       CAST(SUM(in_sample) AS BIGINT) AS n_sample,
       CAST(SUM(rev) AS BIGINT) AS exact_units,
       CAST(SUM(CASE WHEN in_sample = 1 THEN rev ELSE 0 END) * 16
            AS BIGINT) AS est_units,
       CAST(abs(SUM(CASE WHEN in_sample = 1 THEN rev ELSE 0 END) * 16
                - SUM(rev)) * 1000000 // SUM(rev) AS BIGINT) AS err_ppm,
       CAST(CASE WHEN abs(SUM(CASE WHEN in_sample = 1 THEN rev ELSE 0 END) * 16
                          - SUM(rev)) * 1000000 // SUM(rev) < 20000
                 THEN 1 ELSE 0 END AS BIGINT) AS within_2pct
FROM t
""",
)
def q_sample_estimate_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sampling-estimator self-validation (the q_hll_error_bound /
    q_ann_recall recipe applied to SAMPLING): estimate total revenue
    from a deterministic 1/16 hash sample (salted-sha prefix of the
    row key — retry-stable, engine-portable, no RNG state) and assert
    IN-ENGINE that the scaled estimate lands within 2 % of the exact
    total. ONE scan computes both sides (conditional sums — the exact
    leg exists to judge the estimator; production runs only the sample
    leg), so the verdict is hash-checkable: every count, the estimate,
    the error in exact integer ppm, and the within-bound flag are
    identical in any engine at any row order. This is the discipline
    gate for the 100 TB move of answering dashboard aggregates from a
    1/16 sample table."""
    l = _t(spark, sf_dir, "lineitem")
    in_sample = (
        F.substring(
            F.sha2(
                F.concat(
                    F.lit("est1_"),
                    F.col("l_orderkey").cast("string"),
                    F.lit("_"),
                    F.col("l_linenumber").cast("string"),
                ),
                256,
            ),
            1,
            1,
        )
        < "1"
    ).cast("int")
    agg = l.select(
        revenue_units().alias("rev"), in_sample.alias("in_sample")
    ).agg(
        F.count("*").alias("n_total"),
        F.sum("in_sample").cast("long").alias("n_sample"),
        F.sum("rev").cast("long").alias("exact_units"),
        (F.sum(F.when(F.col("in_sample") == 1, F.col("rev")).otherwise(0)) * 16)
        .cast("long")
        .alias("est_units"),
    )
    return agg.select(
        "n_total",
        "n_sample",
        "exact_units",
        "est_units",
        F.expr("abs(est_units - exact_units) * 1000000 div exact_units")
        .cast("long")
        .alias("err_ppm"),
        F.expr(
            "cast(abs(est_units - exact_units) * 1000000 div exact_units"
            " < 20000 as bigint)"
        ).alias("within_2pct"),
    )
