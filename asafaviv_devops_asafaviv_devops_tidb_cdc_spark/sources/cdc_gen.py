"""Deterministic canal-json envelope generator.

The reference's native input is a Kafka topic of canal-json change
envelopes (changefeed sink config: reference docker-compose.yml:99-102;
consumer parse: reference node-consumer/index.js:241-259). Tests and
batch oracles need the same byte-shaped input derived *deterministically*
from the driver's seeded ``events`` parquet (FIXTURES.md §C), so both
Spark and a DuckDB oracle can reproduce every downstream result without
wall-clock or randomness.

Derivation spec (shared by every oracle SQL — keep in sync!):
  e  = event_id % OP_MOD (10)
    e <= 6 -> INSERT ; e == 7 -> UPDATE ; e == 8 -> DELETE ; e == 9 -> DDL
  corrupt  : event_id % CORRUPT_MOD (101) == 0 -> literal '{"corrupt'
             (malformed JSON; exercises the consumer's catch branch,
              reference index.js:316-332)
  no table : event_id % NULL_TABLE_MOD (53) == 0 -> `table` omitted
             (consumer defaults to 'unknown', reference index.js:246)
  batch row: e == MULTI_ROW_REM (5) -> `data` holds 2 rows (row-explosion
             path, reference index.js:245); DDL -> `data` null
             (invalid_format branch, reference index.js:244,311-314)
  old image: UPDATE carries positional `old` = [{'value': value + 1}]
             (reference index.js:255). Addition (not division) so the
             string round-trip is float-exact in both Spark and DuckDB.
  es       : unix epoch millis of events.ts (reference index.js:250)
  lineage  : partition = event_id % 4, offset = event_id
             (reference index.js:257-258)

Everything is a built-in column expression -> whole-stage codegen,
no Python in the hot path; at 100 TB this is a pure map stage with
zero shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .tables import rebalance

OP_MOD = 10
CORRUPT_MOD = 101
NULL_TABLE_MOD = 53
MULTI_ROW_REM = 5
SECOND_ROW_ID_OFFSET = 1_000_000
DDL_SQL = "ALTER TABLE t ADD COLUMN c VARCHAR(32)"

_ARR_MAP = "array<map<string,string>>"


def envelopes_from_events(events: DataFrame) -> DataFrame:
    """events(event_id, ts, user_id, event_type, value, props) ->
    (value: canal-json string, partition: int, offset: long)."""
    e = F.col("event_id") % OP_MOD
    es = F.unix_millis(F.col("ts"))

    # No round(): Spark rounds doubles via decimal-string (HALF_UP) while
    # DuckDB rounds the binary value — a divergence trap. Raw casts of
    # the same double are identical in both engines; compared outputs
    # re-cast to DECIMAL(18,2) downstream.
    row1 = F.create_map(
        F.lit("id"), F.col("event_id").cast("string"),
        F.lit("user_id"), F.col("user_id").cast("string"),
        F.lit("value"), F.col("value").cast("string"),
    )
    row2 = F.create_map(
        F.lit("id"), (F.col("event_id") + SECOND_ROW_ID_OFFSET).cast("string"),
        F.lit("user_id"), F.col("user_id").cast("string"),
        F.lit("value"), (F.col("value") * 2).cast("string"),
    )
    data = (
        F.when(e == 9, F.lit(None).cast(_ARR_MAP))
        .when(e == MULTI_ROW_REM, F.array(row1, row2))
        .otherwise(F.array(row1))
    )
    old = F.when(
        e == 7,
        F.array(F.create_map(F.lit("value"), (F.col("value") + 1).cast("string"))),
    ).otherwise(F.lit(None).cast(_ARR_MAP))
    op = (
        F.when(e == 7, F.lit("UPDATE"))
        .when(e == 8, F.lit("DELETE"))
        .when(e == 9, F.lit("DDL"))
        .otherwise(F.lit("INSERT"))
    )
    table = F.when(
        F.col("event_id") % NULL_TABLE_MOD == 0, F.lit(None).cast("string")
    ).otherwise(F.col("event_type"))

    envelope = F.struct(
        F.col("event_id").alias("id"),
        F.lit("testdb").alias("database"),
        table.alias("table"),
        op.alias("type"),
        es.alias("es"),
        (es + 100).alias("ts"),
        F.when(e == 9, F.lit(DDL_SQL)).otherwise(F.lit(None).cast("string")).alias("sql"),
        data.alias("data"),
        old.alias("old"),
    )
    value = F.when(
        F.col("event_id") % CORRUPT_MOD == 0, F.lit('{"corrupt')
    ).otherwise(F.to_json(envelope))

    # rebalance BEFORE the to_json map stage: the events table arrives
    # as one split, and everything downstream (json round-trip, explode,
    # normalize) inherits this partitioning until the first shuffle
    return rebalance(events).select(
        value.alias("value"),
        (F.col("event_id") % 4).cast("int").alias("partition"),
        F.col("event_id").alias("offset"),
    )
