"""CDC replay: materialize current state from a change-event stream
(operator J6, SURVEY §2.4).

The reference *transports* DML (INSERT/UPDATE/DELETE envelopes) but
never materializes state — Elasticsearch just accumulates one doc per
event (reference node-consumer/index.js:278-281). Replaying the log
into current rows is the relational semantics those events encode
(DML workload: reference run_test.sh:30-84).

Scale posture: last-writer-wins is a single shuffle on the state key
(window ``row_number``) — at 100 TB this becomes incremental
``foreachBatch`` MERGE into a keyed table (see streaming/ingest.py),
but the batch semantics below are the ground truth both share.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window, functions as F


def current_state(
    events: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[str],
    op_col: str = "operation",
    delete_op: str = "delete",
) -> DataFrame:
    """Latest event per key wins; a key whose latest event is a DELETE
    has no current row. ``order_by`` must be a deterministic total
    order within key (e.g. ts, offset, rownum)."""
    w = Window.partitionBy(*keys).orderBy(*[F.col(c).desc() for c in order_by])
    return (
        events.withColumn("_rn", F.row_number().over(w))
        .filter((F.col("_rn") == 1) & (F.col(op_col) != delete_op))
        .drop("_rn")
    )


def retraction_totals(
    typed: DataFrame,
    group_col: str = "table_name",
    value_col: str = "value",
    old_value_col: str = "old_value",
    op_col: str = "operation",
) -> DataFrame:
    """Incremental aggregate maintenance (A10): fold each change event's
    retraction delta (+new for insert, -old for delete, new-old for
    update) into per-group SUM/COUNT — the materialized-view semantics
    Flink calls retraction. For a CONSISTENT changefeed (each update's
    old image equals the previous version) the folded totals equal the
    recomputed aggregate over ``current_state`` — the invariant
    tests/test_corpus_ops.py property-checks. Values enter integer
    micros before summing (float addition is not associative)."""
    micro = "CAST(floor({x} * 1000000 + 0.5) AS BIGINT)"
    new_m = F.expr(micro.format(x=value_col))
    old_m = F.expr(micro.format(x=old_value_col))
    op = F.col(op_col)
    delta = (
        F.when(op == "delete", -new_m)
        .when(op == "update", new_m - old_m)
        .otherwise(new_m)
    )
    rows_w = (
        F.when(op == "delete", -1).when(op == "update", 0).otherwise(1)
    )
    return typed.groupBy(group_col).agg(
        F.sum(rows_w).cast("long").alias("net_rows"),
        F.sum(delta).cast("long").alias("net_sum_micro"),
    )


def scd2_versions(
    typed: DataFrame,
    keys: Sequence[str] = ("table_name", "row_id"),
    order_by: Sequence[str] = ("offset", "rownum"),
    ts_col: str = "ts",
    op_col: str = "operation",
    delete_op: str = "delete",
    drop_deletes: bool = True,
) -> DataFrame:
    """SCD2 (J9): each non-delete change event becomes a version row
    with [valid_from_ms, valid_to_ms) bounds; the LEAD runs over ALL
    events of the key (deletes included) so a delete closes the last
    version without opening a new one. One shuffle on the key, then a
    per-key sorted LEAD — version counts per key are bounded by that
    key's change rate, not corpus size.

    ``drop_deletes=False`` keeps the delete rows (with their interval
    columns) — the form a streaming maintainer must PERSIST, because a
    late event can only splice correctly if the closing tombstone is
    still there (streaming/scd2.py); serving views filter them."""
    w = Window.partitionBy(*keys).orderBy(*order_by)
    ms = F.unix_millis(ts_col)
    versions = (
        typed.withColumn("valid_from_ms", ms)
        .withColumn("valid_to_ms", F.lead(ms).over(w))
        .withColumn(
            "is_current",
            F.when(
                F.col("valid_to_ms").isNull() & (F.col(op_col) != delete_op), 1
            )
            .otherwise(0)
            .cast("int"),
        )
    )
    if drop_deletes:
        versions = versions.filter(F.col(op_col) != delete_op)
    return versions
