"""Parse / validate / explode / normalize chain (operators P1-P6).

The reference consumer does all of this row-at-a-time in a single JS
event loop (reference node-consumer/index.js:235-333). Here it is one
declarative DataFrame chain — Catalyst fuses P1-P5 into a single
whole-stage-codegen'd map stage with no shuffle, which is exactly the
shape that scales linearly to 100 TB / 1000 executors: parallelism is
input partitions, not consumer instances.

Status taxonomy (reference index.js:309-332):
  success        — valid envelope with a ``data`` array
  invalid_format — parsed JSON but ``data`` missing / not an array
                   (covers DDL events, reference README.MD:14)
  error          — unparseable bytes (the catch branch)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F, types as T

# Canal-json envelope (fields read by reference index.js:244-258).
# data/old rows are string->string maps: canal-json emits all values as
# strings; typed views are applied per-table afterwards (P6).
ENVELOPE_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("database", T.StringType()),
        T.StructField("table", T.StringType()),
        T.StructField("type", T.StringType()),
        T.StructField("es", T.LongType()),
        T.StructField("ts", T.LongType()),
        T.StructField("sql", T.StringType()),
        T.StructField("data", T.ArrayType(T.MapType(T.StringType(), T.StringType()))),
        T.StructField("old", T.ArrayType(T.MapType(T.StringType(), T.StringType()))),
    ]
)

STATUS_SUCCESS = "success"
STATUS_INVALID = "invalid_format"
STATUS_ERROR = "error"


def parse_envelopes(raw: DataFrame, value_col: str = "value") -> DataFrame:
    """P1 — JSON deserialize (reference index.js:241).

    ``from_json`` runs JVM-side (Jackson) per input partition; a parse
    failure yields a null struct rather than an exception, matching the
    consumer's never-crash policy (reference index.js:331).
    """
    return raw.withColumn("env", F.from_json(F.col(value_col).cast("string"), ENVELOPE_SCHEMA))


def _status_col() -> Column:
    # from_json returns a null struct (or an all-null struct depending on
    # Spark version) for malformed input; treat both as the error branch.
    parse_failed = F.col("env").isNull() | (
        F.col("env.es").isNull()
        & F.col("env.type").isNull()
        & F.col("env.data").isNull()
        & F.col("env.table").isNull()
    )
    return (
        F.when(parse_failed, F.lit(STATUS_ERROR))
        .when(F.col("env.data").isNull(), F.lit(STATUS_INVALID))
        .otherwise(F.lit(STATUS_SUCCESS))
    )


def validate_envelopes(parsed: DataFrame) -> DataFrame:
    """P2 — format validation + dead-letter classification
    (reference index.js:244,311-314,316-332)."""
    return parsed.withColumn("status", _status_col())


def explode_rows(validated: DataFrame) -> DataFrame:
    """P3+P4 — row explosion with positional old-image alignment.

    The consumer loops ``value.data`` (reference index.js:245) and pairs
    old rows by ``indexOf`` (reference index.js:255) — which picks the
    first match for duplicate rows; ``posexplode`` + ``element_at`` is
    the correct positional semantics (divergence noted in SURVEY §7).
    """
    return (
        validated.filter(F.col("status") == STATUS_SUCCESS)
        .select(
            "partition",
            "offset",
            F.col("env"),
            F.posexplode(F.col("env.data")).alias("pos", "row"),
        )
        .withColumn("old_row", F.element_at(F.col("env.old"), F.col("pos") + 1))
    )


def normalize(exploded: DataFrame) -> DataFrame:
    """P5 — project the normalized event doc (reference index.js:246-259):
    lowercase op, default table 'unknown', default database 'testdb',
    event time from ``es`` epoch-millis, Kafka lineage carried through.
    """
    return exploded.select(
        F.timestamp_millis(F.col("env.es")).alias("ts"),
        F.coalesce(F.col("env.database"), F.lit("testdb")).alias("database"),
        F.coalesce(F.col("env.table"), F.lit("unknown")).alias("table_name"),
        F.lower(F.col("env.type")).alias("operation"),
        F.col("row").alias("data"),
        F.col("old_row").alias("old_data"),
        F.col("env.sql").alias("sql"),
        F.col("partition"),
        F.col("offset").cast("long").alias("offset"),
        F.col("pos").alias("rownum"),
    )


def normalized_events(raw: DataFrame) -> DataFrame:
    """Full P1→P5 chain: raw canal-json -> normalized event rows."""
    return normalize(explode_rows(validate_envelopes(parse_envelopes(raw))))


def typed_rows(normalized: DataFrame) -> DataFrame:
    """P6 — per-table typed view: canal-json string values -> typed
    columns (schema truth: reference sql/schema.sql:4-32; ES dynamic
    mapping at reference index.js:206-207). Money values come back as
    DOUBLE: the canal-json string is the shortest round-trip repr of
    the source double, so string->double recovers the exact source
    bits — hash-stable against any oracle reading the same parquet.
    (A scaled-decimal cast here diverges cross-engine: Spark rounds
    the decimal string HALF_UP, DuckDB rounds the binary value, and
    decimal values don't survive result serialization identically.)
    """
    return normalized.select(
        "ts",
        "table_name",
        "operation",
        F.element_at(F.col("data"), "id").cast("long").alias("row_id"),
        F.element_at(F.col("data"), "user_id").cast("long").alias("user_id"),
        F.element_at(F.col("data"), "value").cast("double").alias("value"),
        F.element_at(F.col("old_data"), "value").cast("double").alias("old_value"),
        "partition",
        "offset",
        "rownum",
    )
