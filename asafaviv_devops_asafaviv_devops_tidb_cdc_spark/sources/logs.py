"""Log-shipper source (operator S6): the reference ships container
logs with Filebeat into Elasticsearch (reference docker/filebeat.yml:
1-14 — container input, json decode, es output). Engine-native
equivalent: a text-line source (file stream standing in for the
Filebeat tail; Kafka in production) parsed into structured records
with a dead-letter branch, mirroring the P1/P2 contract of the CDC
chain.

Deterministic fixture: ``log_lines_from_events`` renders one log line
per seeded event (same trick as ``cdc_gen`` — both Spark and a DuckDB
oracle can derive every downstream result from the ``events`` table
without wall-clock or randomness):

    ts=<unix_millis> level=<LEVEL> [<component>] user=<id> \
        value=<double> msg=<type>#<event_id>

  level   : ERROR for error events, WARN for event_id % 7 == 3,
            else INFO
  corrupt : event_id % 97 == 0 -> the line is truncated garbage
            ("!corrupt <id>") exercising the parse dead-letter branch

Everything is built-in column expressions — whole-stage codegen,
map-only; at 100 TB the shipper is a pure scan + filter with
parallelism = input files/partitions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

LOG_CORRUPT_MOD = 97
LOG_WARN_REM = 3

# one regex parses the whole line; any non-match null-propagates into
# the dead-letter branch (the Filebeat-equivalent of a json decode
# failure)
LOG_PATTERN = (
    r"^ts=(\d+) level=(ERROR|WARN|INFO) \[([a-z_]+)\] "
    r"user=(\d+) value=([0-9.\-eE]+) msg=([a-z_]+)#(\d+)$"
)


def level_col() -> Column:
    return (
        F.when(F.col("event_type") == "error", F.lit("ERROR"))
        .when(F.col("event_id") % 7 == LOG_WARN_REM, F.lit("WARN"))
        .otherwise(F.lit("INFO"))
    )


def log_lines_from_events(events: DataFrame) -> DataFrame:
    """events -> (line: string) log-file stand-in."""
    from .tables import rebalance

    line = F.concat(
        F.lit("ts="),
        F.unix_millis(F.col("ts")).cast("string"),
        F.lit(" level="),
        level_col(),
        F.lit(" ["),
        F.col("event_type"),
        F.lit("] user="),
        F.col("user_id").cast("string"),
        F.lit(" value="),
        F.col("value").cast("string"),
        F.lit(" msg="),
        F.col("event_type"),
        F.lit("#"),
        F.col("event_id").cast("string"),
    )
    corrupt = F.concat(F.lit("!corrupt "), F.col("event_id").cast("string"))
    return rebalance(events).select(
        F.when(F.col("event_id") % LOG_CORRUPT_MOD == 0, corrupt)
        .otherwise(line)
        .alias("line")
    )


def parse_log_lines(lines: DataFrame, line_col: str = "line") -> DataFrame:
    """One regex pass -> structured record + dead-letter status.
    Unparseable lines keep status='parse_error' with every typed field
    NULL (never dropped silently — the S6 twin of P2's contract)."""
    g = lambda i: F.regexp_extract(F.col(line_col), LOG_PATTERN, i)  # noqa: E731
    parsed = lines.select(
        F.col(line_col),
        F.when(g(1) == "", None).otherwise(g(1)).cast("long").alias("ts_ms"),
        F.when(g(2) == "", None).otherwise(g(2)).alias("level"),
        F.when(g(3) == "", None).otherwise(g(3)).alias("component"),
        F.when(g(4) == "", None).otherwise(g(4)).cast("long").alias("user_id"),
        F.when(g(5) == "", None).otherwise(g(5)).cast("double").alias("value"),
        F.when(g(7) == "", None).otherwise(g(7)).cast("long").alias("event_id"),
    )
    return parsed.select(
        F.timestamp_millis(F.col("ts_ms")).alias("ts"),
        "level",
        "component",
        "user_id",
        "value",
        "event_id",
        F.when(F.col("level").isNull(), F.lit("parse_error"))
        .otherwise(F.lit("ok"))
        .alias("status"),
    )


def read_log_stream(spark: SparkSession, source_dir: str) -> DataFrame:
    """The Filebeat tail as a Structured Streaming text source: each
    appended file is a micro-batch; swap for the Kafka reader
    (``ingest.kafka_stream``) when logs route through a broker."""
    return (
        spark.readStream.option("maxFilesPerTrigger", 8)
        .text(source_dir)
        .withColumnRenamed("value", "line")
    )
