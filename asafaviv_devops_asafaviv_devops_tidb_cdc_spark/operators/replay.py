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
