"""S6 log-shipper queries (reference docker/filebeat.yml:1-14): the
rendered-log round-trip — render deterministic log lines from the
seeded events, parse them back through the one-regex S6 parser, and
aggregate — checked against a DuckDB oracle that derives the same
result straight from the ``events`` table (so a hash match proves the
whole render -> regex -> type-cast chain, the same proof shape as the
canal-json round-trip in queries/cdc.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..registry import register
from ..sources import load_table
from ..sources.logs import LOG_CORRUPT_MOD, LOG_WARN_REM, log_lines_from_events, parse_log_lines


def _parsed(spark: SparkSession, sf_dir: str) -> DataFrame:
    return parse_log_lines(
        log_lines_from_events(load_table(spark, sf_dir, "events"))
    )


_LEVEL_CASE = (
    "CASE WHEN event_type = 'error' THEN 'ERROR' "
    f"WHEN event_id % 7 = {LOG_WARN_REM} THEN 'WARN' ELSE 'INFO' END"
)


@register(
    "q_log_ingest",
    oracle=f"""
WITH gen AS (
  SELECT CASE WHEN event_id % {LOG_CORRUPT_MOD} = 0 THEN 'parse_error'
              ELSE 'ok' END AS status,
         CASE WHEN event_id % {LOG_CORRUPT_MOD} = 0 THEN NULL
              ELSE {_LEVEL_CASE} END AS level,
         CASE WHEN event_id % {LOG_CORRUPT_MOD} = 0 THEN NULL
              ELSE event_type END AS component,
         CASE WHEN event_id % {LOG_CORRUPT_MOD} = 0 THEN NULL
              ELSE user_id END AS user_id,
         CASE WHEN event_id % {LOG_CORRUPT_MOD} = 0 THEN NULL
              ELSE value END AS value
  FROM events
)
SELECT status, level, component,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
         AS value_cents
FROM gen
GROUP BY 1, 2, 3
""",
)
def q_log_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6 — the Filebeat-equivalent log ingest: render -> one-regex
    parse (unparseable lines dead-letter as status='parse_error' with
    NULL fields, never dropped) -> per-(status, level, component)
    counters. Map-only until the tiny final aggregation."""
    return (
        _parsed(spark, sf_dir)
        .groupBy("status", "level", "component")
        .agg(
            F.count("*").alias("n"),
            F.count_distinct("user_id").cast("long").alias("n_users"),
            F.sum(F.floor(F.col("value") * 100 + 0.5).cast("long"))
            .cast("long")
            .alias("value_cents"),
        )
    )


@register(
    "q_log_error_rate",
    oracle=f"""
SELECT epoch_ms(CAST(epoch_ms(ts) // 3600000 * 3600000 AS BIGINT)) AS window_start,
       CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_error,
       CAST(SUM(CASE WHEN event_type <> 'error' AND event_id % 7 = {LOG_WARN_REM}
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_warn,
       CAST(COUNT(*) AS BIGINT) AS n_lines
FROM events
WHERE event_id % {LOG_CORRUPT_MOD} <> 0
GROUP BY 1
""",
)
def q_log_error_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6+W6 — log-level date histogram (the Kibana/Grafana panel the
    reference's Filebeat->ES path feeds): hourly ERROR/WARN counts over
    successfully parsed lines, from the PARSED stream (timestamps
    recovered from the rendered lines, not the source table)."""
    parsed = _parsed(spark, sf_dir).filter(F.col("status") == "ok")
    return (
        parsed.groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(
            F.sum(F.when(F.col("level") == "ERROR", 1).otherwise(0))
            .cast("long")
            .alias("n_error"),
            F.sum(F.when(F.col("level") == "WARN", 1).otherwise(0))
            .cast("long")
            .alias("n_warn"),
            F.count("*").alias("n_lines"),
        )
        .select(F.col("w.start").alias("window_start"), "n_error", "n_warn", "n_lines")
    )
