"""Incremental CDC current-state materialization (operator J6, stream
form): a ``foreachBatch`` MERGE that upserts each micro-batch of typed
row events into a keyed state table — the streaming twin of
``operators/replay.py::current_state`` (reference transports DML but
never materializes it; ES just accumulates one doc per event,
reference node-consumer/index.js:278-281).

Unlike watermarked dedupe, the merge is order-robust: every row carries
its full event-time order key (ts, offset, rownum) and the merge
recomputes last-writer-wins over (existing state ∪ batch), so late or
out-of-order batches converge to the same state.

Scale posture: the local parquet overwrite below is the test stand-in
for ``MERGE INTO`` on a transactional table format (Delta/Iceberg),
where it becomes a key-partitioned upsert touching only changed
partitions. The semantics — last writer wins, DELETE tombstones remove
the key — are identical and are what the batch oracle checks.
"""

from __future__ import annotations

import shutil
from collections.abc import Sequence
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..operators import parse as P

STATE_KEYS = ["table_name", "user_id"]
STATE_ORDER = ["ts", "offset", "rownum"]


def latest_events(
    events: DataFrame, keys: Sequence[str], order_by: Sequence[str]
) -> DataFrame:
    """Latest event per key — DELETEs retained (they are tombstones the
    merge still needs; ``current_state`` drops them, this keeps them)."""
    w = Window.partitionBy(*keys).orderBy(*[F.col(c).desc() for c in order_by])
    return (
        events.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def merge_state(
    existing: DataFrame | None,
    batch: DataFrame,
    keys: Sequence[str] = STATE_KEYS,
    order_by: Sequence[str] = STATE_ORDER,
) -> DataFrame:
    """(state ∪ batch) -> new state. State rows keep their op + order
    columns so the comparison against late events stays total, and
    DELETE rows are persisted as TOMBSTONES — discarding them would let
    an out-of-order older event in a later batch resurrect a deleted
    key. Readers drop tombstones via ``live_state``."""
    # Tombstone retention: kept indefinitely here (test scale). In
    # production, expire tombstones older than the source's maximum
    # replay horizon (checkpoint retention / Kafka topic retention) —
    # an event older than that can never arrive to be wrongly revived.
    combined = batch if existing is None else existing.unionByName(batch)
    return latest_events(combined, keys, order_by)


def live_state(
    state: DataFrame, op_col: str = "operation", delete_op: str = "delete"
) -> DataFrame:
    """The queryable view of the state table: tombstones removed."""
    return state.filter(F.col(op_col) != delete_op)


def _versions(state_dir: str) -> list[Path]:
    base = Path(state_dir)
    if not base.is_dir():
        return []
    return sorted(p for p in base.iterdir() if p.name.startswith("v"))


def latest_state_path(state_dir: str, before_epoch: int | None = None) -> str | None:
    """Newest committed state version (copy-on-write dir layout).

    ``before_epoch``: a foreachBatch maintainer MUST pass its own epoch
    id here — on a micro-batch RETRY (crash between the state write and
    the checkpoint commit) the retried epoch's own ``v<epoch>`` dir
    already exists, and reading it would fold this batch's events in
    twice. Restricting to versions strictly older than the current
    epoch makes every maintainer retry-idempotent regardless of whether
    its fold tolerates duplicates."""
    vs = _versions(state_dir)
    if before_epoch is not None:
        cut = f"v{before_epoch:09d}"
        vs = [p for p in vs if p.name < cut]
    return str(vs[-1]) if vs else None


def _prune_versions(state_dir: str, keep: int = 2) -> None:
    # keep >= 2: the previous version stays until the new one is fully
    # written and read at least once — crash-safe without a manifest
    for old in _versions(state_dir)[:-keep]:
        shutil.rmtree(old, ignore_errors=True)


def read_state(spark: SparkSession, state_dir: str) -> DataFrame:
    """Read the newest state version (tombstones included — wrap with
    ``live_state`` for the queryable view)."""
    latest = latest_state_path(state_dir)
    if latest is None:
        raise FileNotFoundError(f"no state versions under {state_dir}")
    return spark.read.parquet(latest)


def run_replay_stream(
    spark: SparkSession,
    source_dir: str,
    state_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 2,
) -> None:
    """Drain a canal-json envelope backlog through P1->P6 and MERGE each
    micro-batch into the state table at ``state_dir``."""
    for d in (state_dir, checkpoint_dir):
        p = Path(d)
        if p.exists():
            shutil.rmtree(p)

    from .ingest import SOURCE_SCHEMA

    stream = (
        spark.readStream.schema(SOURCE_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .json(source_dir)
    )
    stream = stream.repartition(spark.sparkContext.defaultParallelism)
    typed = P.typed_rows(P.normalized_events(stream))

    def apply(batch_df: DataFrame, epoch_id: int) -> None:
        # copy-on-write versioned state: read version N, write version
        # N+1 to a NEW directory (named by epoch — a micro-batch retry
        # overwrites its own version, idempotent), then prune old
        # versions. No checkpoint needed: the write job reads the old
        # parquet + batch directly (different paths, no overwrite-while-
        # read hazard), and on a cluster an executor loss just
        # recomputes from those durable inputs — the failure mode
        # localCheckpoint had (executor-only blocks, no recompute path)
        # is gone. This is exactly the table-format recipe Delta/Iceberg
        # productionize: immutable data files + a version pointer.
        latest = latest_state_path(state_dir, before_epoch=epoch_id)
        existing = spark.read.parquet(latest) if latest else None
        new_state = merge_state(existing, batch_df)
        new_state.write.mode("overwrite").parquet(
            f"{state_dir}/v{epoch_id:09d}"
        )
        _prune_versions(state_dir, keep=2)

    from .ingest import STREAM_SHUFFLE_PARTITIONS, scoped_shuffle_partitions

    with scoped_shuffle_partitions(spark, STREAM_SHUFFLE_PARTITIONS):
        q = (
            typed.writeStream.foreachBatch(apply)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
