"""Streaming incremental aggregate maintenance (A10 stream form).

Each micro-batch folds its change events into per-group retraction
deltas (operators/replay.py::retraction_totals) and writes ONE tiny
partial row per group; the serving read sums the partials. Because
retraction deltas are commutative and associative, the folded total is
independent of batch boundaries and arrival order — which is why the
driver can hash-compare the streamed result against the BATCH oracle
(q_delta_agg's SQL) exactly.

Idempotence: partials land in an ``epoch=<id>`` directory written with
mode=overwrite, so a micro-batch retry after a crash rewrites its own
partial instead of double-counting — the foreachBatch exactly-once
recipe. At 100 TB the partials are O(groups x batches) rows; compact
them with the same fold whenever the serving read slows.
"""

from __future__ import annotations

import shutil
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators import parse as P
from ..operators.replay import retraction_totals
from . import ingest


def run_delta_stream(
    spark: SparkSession,
    source_dir: str,
    partials_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 2,
) -> None:
    """Drain the envelope backlog, folding each micro-batch into
    retraction partials. Order-robust (unlike the watermarked dedupe
    path): the fold never inspects event order, so multi-file sources
    replaying in any interleaving converge to the same totals."""
    for d in (partials_dir, checkpoint_dir):
        shutil.rmtree(Path(d), ignore_errors=True)
    stream = (
        spark.readStream.schema(ingest.SOURCE_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .json(source_dir)
    )
    stream = stream.repartition(spark.sparkContext.defaultParallelism)
    normalized = P.normalized_events(stream)

    def fold(batch_df: DataFrame, epoch_id: int) -> None:
        part = retraction_totals(P.typed_rows(batch_df))
        part.write.mode("overwrite").parquet(f"{partials_dir}/epoch={epoch_id}")

    with ingest.scoped_shuffle_partitions(spark, ingest.STREAM_SHUFFLE_PARTITIONS):
        q = (
            normalized.writeStream.foreachBatch(fold)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()


def folded_totals(spark: SparkSession, partials_dir: str) -> DataFrame:
    """Serving view: sum the per-batch partials into current totals."""
    parts = spark.read.parquet(partials_dir)
    return parts.groupBy("table_name").agg(
        F.sum("net_rows").cast("long").alias("net_rows"),
        F.sum("net_sum_micro").cast("long").alias("net_sum_micro"),
    )
