"""Relational operator queries (SURVEY §2.3 filters/scalars, §2.4
joins, §2.7 sorts/limits/set-ops) with DuckDB oracles.

Determinism rules (SURVEY §5.2): compared money columns are either the
raw source DOUBLE (bit-identical in both engines) or exact integer
cents — ``CAST(floor(x * 100 + 0.5) AS BIGINT)`` spelled identically
on both sides (pure IEEE ops, so identical results). Sums accumulate
in the integer-cents domain (associative — partition-order-proof) and
are emitted as BIGINT or one final exact BIGINT->DOUBLE conversion.
Never a scaled-decimal cast in compared output: Spark rounds the
decimal string HALF_UP while DuckDB rounds the binary value, and
decimal results don't serialize identically across engines. Ratios
are exact integer parts-per-million via integer division.

Scale posture per query in its docstring; broadcast hints are explicit
where a dimension is guaranteed small.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators import parse as P
from ..operators.replay import current_state
from ..registry import register
from ..sources import envelopes_from_events, load_table
from ._money import revenue_units, rev_units_sql, units_as_dollars
from .cdc import TYPED_CTE


def _typed(spark: SparkSession, sf_dir: str) -> DataFrame:
    # typed view over the materialized sink (sources/event_sink.py):
    # P6 is a pure projection, so it stays live; P1-P5 land once
    from ..sources.event_sink import normalized_sink

    typed = P.typed_rows(normalized_sink(spark, sf_dir))
    return typed.withColumnRenamed("offset", "offset_")


# --- §2.3 filters / scalar functions -------------------------------------


@register(
    "q_filter_cmp",
    oracle="""
SELECT l_orderkey, l_linenumber, l_quantity,
       l_extendedprice AS extendedprice
FROM lineitem
WHERE l_quantity > 45 AND l_linestatus = 'F'
""",
)
def q_filter_cmp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1 — comparison predicates (reference run_test.sh:42,67,74:
    ``WHERE stock > 20`` / ``status='pending'``). Both predicates are
    pushed into the parquet scan (PushedFilters in .explain)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter((F.col("l_quantity") > 45) & (F.col("l_linestatus") == "F")).select(
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        F.col("l_extendedprice").alias("extendedprice"),
    )


@register(
    "q_arith_update",
    oracle="""
SELECT p_partkey,
       p_retailprice AS price,
       CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT) * 110 // 100
         AS new_price_cents
FROM part
""",
)
def q_arith_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2 — arithmetic update expression ``SET price = price * 1.10``
    (reference run_test.sh:42): raw double in, exact integer cents out
    (identical floor/int arithmetic in both engines — no decimal
    rounding-mode divergence)."""
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.col("p_retailprice").alias("price"),
        F.expr("(CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT) * 110) div 100")
        .alias("new_price_cents"),
    )


@register(
    "q_sha2",
    oracle="""
SELECT c_custkey, sha256(c_name || '|' || c_mktsegment) AS name_hash
FROM customer
""",
)
def q_sha2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4 — crypto hash scalar ``SHA2(pass, 256)`` (reference
    run_test.sh:50-51, sql/seed.sql:10)."""
    cust = load_table(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        F.sha2(F.concat_ws("|", F.col("c_name"), F.col("c_mktsegment")), 256).alias("name_hash"),
    )


@register(
    "q_string_ops",
    oracle="""
SELECT p_partkey,
       lower(p_type) AS type_lc,
       upper(p_brand) AS brand_uc,
       'BatchProduct' || CAST(p_partkey AS VARCHAR) AS batch_name,
       substr(p_name, 1, 8) AS name_prefix
FROM part
""",
)
def q_string_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F6 — string ops: lowercase op names (reference index.js:247),
    template concat 'BatchProduct'+i (reference run_test.sh:83)."""
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.lower("p_type").alias("type_lc"),
        F.upper("p_brand").alias("brand_uc"),
        F.concat(F.lit("BatchProduct"), F.col("p_partkey").cast("string")).alias("batch_name"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
    )


@register(
    "q_batch_insert_gen",
    oracle="""
SELECT 'BatchProduct' || CAST(i AS VARCHAR) AS name,
       CAST(20 + ('0x' || substr(sha256('price_' || CAST(i AS VARCHAR)), 1, 12))::BIGINT % 200
            AS DOUBLE) AS price,
       CAST(1 + ('0x' || substr(sha256('stock_' || CAST(i AS VARCHAR)), 1, 12))::BIGINT % 50
            AS INTEGER) AS stock
FROM range(1, 21) t(i)
""",
)
def q_batch_insert_gen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5+F6 — randomized batch-insert generation (reference
    run_test.sh:80-84: 20 inserts named 'BatchProduct{i}' with
    $((RANDOM % 200 + 20)) prices and $((RANDOM % 50 + 1)) stock).
    bash RANDOM is a seeded PRNG; the
    engine-portable equivalent is a counter-mode hash draw —
    ``sha2(salt || i)`` first 48 bits mod the range — which is uniform,
    reproducible on ANY partitioning (rand(seed) streams per-partition,
    so its values shift whenever the split changes), and identical in
    both engines, so the generator itself is hash-verified rather than
    rows-only."""

    def draw(salt: str, lo: int, span: int):
        h = F.conv(
            F.substring(
                F.sha2(F.concat(F.lit(salt), F.col("id").cast("string")), 256), 1, 12
            ),
            16,
            10,
        ).cast("long")
        return h % span + lo

    return spark.range(1, 21, 1, 1).select(
        F.concat(F.lit("BatchProduct"), F.col("id")).alias("name"),
        draw("price_", 20, 200).cast("double").alias("price"),
        draw("stock_", 1, 50).cast("int").alias("stock"),
    )


# --- §2.4 joins ------------------------------------------------------------


@register(
    "q_join_fk",
    oracle="""
SELECT c.c_mktsegment AS mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
         AS total_price_cents
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY 1
""",
)
def q_join_fk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 — hash equi-join over the FK (reference sql/schema.sql:30-31
    declares orders->users/products). customer is the smaller side but
    grows linearly with scale factor, so it carries NO explicit
    broadcast hint — AQE picks broadcast-hash at gate SF on its own
    and stays free to shuffle at 100x, where a hard hint would OOM
    the driver (r12 broadcast-hint audit)."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("mktsegment"))
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long"))
            .cast("long")
            .alias("total_price_cents"),
        )
    )


@register(
    "q_join_star",
    oracle="""
SELECT r.r_name AS region, n.n_name AS nation,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(SUM(CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT)
                * (100 - CAST(floor(l.l_discount * 100 + 0.5) AS BIGINT)))
            AS DOUBLE) / 10000 AS revenue
FROM lineitem l
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
JOIN region r   ON n.n_regionkey = r.r_regionkey
GROUP BY 1, 2
""",
)
def q_join_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 — multi-way star join, revenue by region/nation. Fact table
    shuffles once on l_orderkey (SMJ with orders under AQE); only the
    constant-size dims keep broadcast hints (nation 25 rows, region 5)
    — customer grows with scale factor, so its join is unhinted and
    AQE decides (r12 broadcast-hint audit). revenue accumulates
    in exact integer 1e-4-dollar units (associative — no row-order or
    rounding divergence), emitted as dollars via one exact
    BIGINT->DOUBLE conversion (queries/_money.py)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(
            F.count("*").alias("n_lines"),
            units_as_dollars(F.sum(revenue_units())).alias("revenue"),
        )
    )


@register(
    "q_anti_orphans",
    oracle="""
SELECT c.c_custkey, c.c_name
FROM customer c
ANTI JOIN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F') o
  ON c.c_custkey = o.o_custkey
""",
)
def q_anti_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3 — left anti join: referential-integrity / absence check
    (FK declared at reference sql/schema.sql:30-31). Here: customers
    with no finalized ('F') orders."""
    cust = load_table(spark, sf_dir, "customer")
    f_orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return cust.join(
        f_orders, cust.c_custkey == f_orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


@register(
    "q_semi_active",
    oracle="""
SELECT c.c_custkey, c.c_mktsegment
FROM customer c
SEMI JOIN (SELECT o_custkey FROM orders WHERE o_totalprice > 300000) o
  ON c.c_custkey = o.o_custkey
""",
)
def q_semi_active(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4 — left semi join: existence ("users having orders",
    SURVEY §2.4). Here: customers with at least one order > 300k."""
    cust = load_table(spark, sf_dir, "customer")
    big_orders = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return cust.join(
        big_orders, cust.c_custkey == big_orders.o_custkey, "left_semi"
    ).select("c_custkey", "c_mktsegment")


@register(
    "q_ratio_join",
    oracle="""
WITH totals AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events
  FROM events GROUP BY 1
),
errors AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_errors
  FROM events WHERE event_type = 'error' GROUP BY 1
)
SELECT t.user_id, t.n_events,
       CAST(COALESCE(e.n_errors, 0) AS BIGINT) AS n_errors,
       CAST(COALESCE(e.n_errors, 0) * 1000000 // t.n_events AS BIGINT) AS error_ppm
FROM totals t LEFT JOIN errors e ON t.user_id = e.user_id
""",
)
def q_ratio_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5/W2 — ratio of two separately-keyed aggregates, the
    error-ratio recording rule (reference monitoring/
    recording-rules.yml:16-17: rate(errors)/rate(ops)). Reported as
    exact integer ppm (integer division) — float division is not
    hash-stable across engines."""
    events = load_table(spark, sf_dir, "events")
    totals = events.groupBy("user_id").agg(F.count("*").alias("n_events"))
    errors = (
        events.filter(F.col("event_type") == "error")
        .groupBy("user_id")
        .agg(F.count("*").alias("n_errors"))
    )
    joined = totals.join(errors, "user_id", "left").select(
        "user_id",
        "n_events",
        F.coalesce(F.col("n_errors"), F.lit(0)).cast("long").alias("n_errors"),
    )
    return joined.withColumn(
        "error_ppm", F.expr("(n_errors * 1000000) div n_events").cast("long")
    )


@register(
    "q_cdc_replay",
    oracle=TYPED_CTE
    + """
SELECT table_name, user_id,
       value AS last_value, ts AS last_ts
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY table_name, user_id
    ORDER BY ts DESC, offset_ DESC, rownum DESC) AS rn
  FROM typed
)
WHERE rn = 1 AND operation <> 'delete'
""",
)
def q_cdc_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J6 — CDC current-state materialization: replay the DML log
    (reference run_test.sh:30-84 semantics), last-writer-wins per
    (table, user_id), key absent when latest op is DELETE. One shuffle
    on the state key; streaming equivalent is foreachBatch MERGE."""
    state = current_state(
        _typed(spark, sf_dir),
        keys=["table_name", "user_id"],
        order_by=["ts", "offset_", "rownum"],
    )
    return state.select(
        "table_name",
        "user_id",
        F.col("value").alias("last_value"),
        F.col("ts").alias("last_ts"),
    )


# --- §2.7 set ops ----------------------------------------------------------


@register(
    "q_union_variants",
    oracle="""
SELECT * FROM (
  SELECT p_partkey, p_name, p_brand, CAST(NULL AS DOUBLE) AS retail
  FROM part WHERE p_size < 20
  UNION ALL
  SELECT p_partkey, p_name, CAST(NULL AS VARCHAR) AS p_brand,
         p_retailprice AS retail
  FROM part WHERE p_size >= 20
)
""",
)
def q_union_variants(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O3 — unionByName with missing columns: the reference carries two
    schema variants of the same logical tables (reference sql/schema.sql
    vs init-scripts/init.sql; SURVEY §2.7)."""
    part = load_table(spark, sf_dir, "part")
    a = part.filter(F.col("p_size") < 20).select("p_partkey", "p_name", "p_brand")
    b = part.filter(F.col("p_size") >= 20).select(
        "p_partkey", "p_name", F.col("p_retailprice").alias("retail")
    )
    return a.unionByName(b, allowMissingColumns=True)


@register(
    "q_except_deleted",
    oracle=TYPED_CTE
    + """
SELECT table_name, user_id FROM typed WHERE operation = 'insert'
EXCEPT
SELECT table_name, user_id FROM typed WHERE operation = 'delete'
""",
)
def q_except_deleted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O4 — delete replay as a set op: keys ever inserted minus keys
    ever deleted (reference run_test.sh:73-75 ``DELETE WHERE stock<10``
    semantics; SURVEY §2.7). The typed chain is persisted before
    branching — without it each subtract side re-runs the whole
    envelope-synth + JSON-parse chain (measured 2x the query cost);
    lineage is kept so the cache stays fault-tolerant."""
    from pyspark import StorageLevel

    typed = (
        _typed(spark, sf_dir)
        .select("table_name", "user_id", "operation")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    inserted = typed.filter(F.col("operation") == "insert").select("table_name", "user_id")
    deleted = typed.filter(F.col("operation") == "delete").select("table_name", "user_id")
    return inserted.subtract(deleted)


@register(
    "q_snapshot_diff",
    oracle=TYPED_CTE
    + """,
half AS (SELECT MAX(offset_) // 2 AS h FROM typed),
s1 AS (
  SELECT table_name, user_id, value FROM (
    SELECT t.*, row_number() OVER (
      PARTITION BY table_name, user_id
      ORDER BY ts DESC, offset_ DESC, rownum DESC) AS rn
    FROM typed t, half WHERE t.offset_ <= half.h
  ) WHERE rn = 1 AND operation <> 'delete'
),
s2 AS (
  SELECT table_name, user_id, value FROM (
    SELECT *, row_number() OVER (
      PARTITION BY table_name, user_id
      ORDER BY ts DESC, offset_ DESC, rownum DESC) AS rn
    FROM typed
  ) WHERE rn = 1 AND operation <> 'delete'
)
SELECT COALESCE(s2.table_name, s1.table_name) AS table_name,
       CASE WHEN s1.user_id IS NULL THEN 'added'
            WHEN s2.user_id IS NULL THEN 'removed'
            WHEN s1.value IS DISTINCT FROM s2.value THEN 'changed'
            ELSE 'unchanged' END AS status,
       CAST(COUNT(*) AS BIGINT) AS n
FROM s1 FULL OUTER JOIN s2
  ON s1.table_name = s2.table_name AND s1.user_id = s2.user_id
GROUP BY 1, 2
""",
)
def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J8/S7 — snapshot reconciliation via FULL OUTER join: the CDC
    state at the half-way offset vs the final state, each key tagged
    added / removed / changed / unchanged — the audit every CDC
    consumer runs to prove a backfill or a migration converged
    (reference has no tool for this; users eyeball ES counts). Both
    snapshots derive from ONE pass over the typed chain (persisted),
    then shuffle once on the state key; the diff join co-partitions on
    the same key so AQE plans it shuffle-free on the second side."""
    from pyspark import StorageLevel

    typed = (
        _typed(spark, sf_dir)
        .select("table_name", "user_id", "value", "operation", "ts", "offset_", "rownum")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    half = typed.agg(F.expr("max(offset_) div 2").alias("h"))
    s1 = current_state(
        typed.join(F.broadcast(half), F.col("offset_") <= F.col("h")).drop("h"),
        keys=["table_name", "user_id"],
        order_by=["ts", "offset_", "rownum"],
    ).select("table_name", "user_id", F.col("value").alias("v1"))
    s2 = current_state(
        typed, keys=["table_name", "user_id"], order_by=["ts", "offset_", "rownum"]
    ).select("table_name", "user_id", F.col("value").alias("v2"))
    diff = s1.join(s2, ["table_name", "user_id"], "full_outer")
    status = (
        F.when(F.col("v1").isNull() & F.col("v2").isNotNull(), F.lit("added"))
        .when(F.col("v2").isNull() & F.col("v1").isNotNull(), F.lit("removed"))
        .when(~F.col("v1").eqNullSafe(F.col("v2")), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return diff.groupBy("table_name", status.alias("status")).agg(
        F.count("*").alias("n")
    )


@register(
    "q_unique_check",
    oracle="""
WITH doubled AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 10 = 0
)
SELECT sha256(text) AS text_hash,
       CAST(COUNT(*) AS BIGINT) AS n_copies,
       MIN(doc_id) AS first_doc_id
FROM doubled
GROUP BY 1
HAVING COUNT(*) > 1
""",
)
def q_unique_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8 — UNIQUE-constraint violation detection (reference
    sql/schema.sql:16,18 declares UNIQUE username/email but nothing
    enforces it downstream). Synthetic duplicates: every 10th document
    re-appears under a shifted id."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    doubled = docs.unionByName(
        docs.filter(F.col("doc_id") % 10 == 0).select(
            (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
        )
    )
    return (
        doubled.groupBy(F.sha2(F.col("text"), 256).alias("text_hash"))
        .agg(F.count("*").alias("n_copies"), F.min("doc_id").alias("first_doc_id"))
        .filter(F.col("n_copies") > 1)
    )


@register(
    "q_asof_join",
    oracle="""
WITH ord AS (
  SELECT o_custkey, o_orderdate, o_orderkey, o_orderstatus FROM (
    SELECT o_custkey, o_orderdate, o_orderkey, o_orderstatus,
           row_number() OVER (PARTITION BY o_custkey, o_orderdate
                              ORDER BY o_orderkey DESC) AS rn
    FROM orders) WHERE rn = 1
)
SELECT e.event_type,
       COALESCE(o.o_orderstatus, 'none') AS order_status,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(DISTINCT o.o_orderkey) AS BIGINT) AS n_orders
FROM events e ASOF LEFT JOIN ord o
  ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
GROUP BY 1, 2
""",
)
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J6b — as-of join: each event annotated with the customer's most
    recent order at-or-before the event timestamp (the "what was
    current state when this happened" question every CDC consumer
    eventually asks; the reference can only answer it by hand-scrolling
    Elasticsearch). Oracle uses DuckDB's native ASOF JOIN; our side is
    operators/asof.py's union + single-shuffle window scan. Right side
    pre-deduped to one order per (custkey, orderdate) with a
    deterministic max-orderkey survivor so the tie winner is
    engine-independent."""
    from ..operators.asof import asof_join
    from pyspark.sql import Window

    # prune BEFORE the operator: asof_join unions the left row through
    # the key shuffle and window sort, so every carried column (here
    # the wide props payload) would widen the shuffle
    events = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "ts"
    )
    w = Window.partitionBy("o_custkey", "o_orderdate").orderBy(
        F.col("o_orderkey").desc()
    )
    ord_dedup = (
        load_table(spark, sf_dir, "orders")
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            F.col("o_custkey").alias("user_id"),
            "o_orderdate",
            "o_orderkey",
            "o_orderstatus",
        )
    )
    joined = asof_join(
        events,
        ord_dedup,
        on=["user_id"],
        left_ts="ts",
        right_ts="o_orderdate",
        payload_cols=["o_orderkey", "o_orderstatus"],
    )
    return joined.groupBy(
        "event_type",
        F.coalesce(F.col("asof.o_orderstatus"), F.lit("none")).alias("order_status"),
    ).agg(
        F.count("*").alias("n_events"),
        F.count_distinct(F.col("asof.o_orderkey")).alias("n_orders"),
    )


@register(
    "q_range_join",
    oracle="""
WITH p AS (
  SELECT event_id AS p_event_id, ts AS start_ts,
         ts + INTERVAL 10 MINUTE AS end_ts
  FROM events WHERE event_type = 'purchase'
)
SELECT e.event_type,
       CAST(COUNT(*) AS BIGINT) AS n_follows,
       CAST(COUNT(DISTINCT e.event_id) AS BIGINT) AS n_events
FROM events e JOIN p
  ON e.ts >= p.start_ts AND e.ts < p.end_ts AND e.event_id <> p.p_event_id
GROUP BY 1
""",
)
def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J7 — pure range-predicate join (no equality key): which events
    fall inside the 10 minutes after each purchase. Implemented with
    operators/range_join.py's bucketized formulation — bucket-equality
    hash join + exact refine — instead of the broadcast nested-loop
    Spark would otherwise plan (O(|L|*|R|) at 100 TB). The oracle is
    the plain theta join (DuckDB plans an IEJoin)."""
    from ..operators.range_join import point_in_interval_join

    events = load_table(spark, sf_dir, "events")
    intervals = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("p_event_id"),
            F.col("ts").alias("start_ts"),
            (F.col("ts") + F.expr("INTERVAL 10 MINUTES")).alias("end_ts"),
        )
    )
    points = events.select("event_id", "event_type", "ts")
    joined = point_in_interval_join(
        points,
        intervals,
        point_ts="ts",
        start_ts="start_ts",
        end_ts="end_ts",
        bucket_seconds=600,
        extra_cond=F.col("event_id") != F.col("p_event_id"),
    )
    return joined.groupBy("event_type").agg(
        F.count("*").alias("n_follows"),
        F.count_distinct("event_id").alias("n_events"),
    )


@register(
    "q_skew_salted_join",
    oracle="""
SELECT c.c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(COUNT(DISTINCT o.o_custkey) AS BIGINT) AS n_customers
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY 1
""",
)
def q_skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-mitigated join (SURVEY §4.2, functions/skew.py): the fact
    side is salted by a deterministic row hash and the dim side
    replicated once per salt, so a hot customer key spreads over n
    reducer partitions instead of stalling one task. Semantics are
    identical to the naive equi-join — the oracle IS the naive join.
    The shape to reach for when the dim is too big to broadcast but
    small enough to replicate n x, and AQE's skew split can't help
    (it only splits sort-merge partitions, not hash-agg state)."""
    from ..functions import skew

    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    dim = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    joined = skew.salted_join(orders, dim, ["o_custkey"], n_salts=8)
    return joined.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_orders"),
        F.count_distinct("o_custkey").alias("n_customers"),
    )


@register(
    "q_intersect_active",
    oracle="""
SELECT user_id FROM events WHERE event_type = 'click'
INTERSECT
SELECT user_id FROM events WHERE event_type = 'purchase'
""",
)
def q_intersect_active(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O4 (intersect half) — users present in BOTH behavioral sets via
    native INTERSECT (distinct semantics; the dual of
    q_except_deleted's EXCEPT). Plans as a left-semi join over
    pre-aggregated distinct sides — one shuffle each."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("user_id")
    buys = ev.filter(F.col("event_type") == "purchase").select("user_id")
    return clicks.intersect(buys)
