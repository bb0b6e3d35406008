"""Materialized normalized-event sink — the batch twin of the
reference's architecture.

The reference parses each Kafka message ONCE and lands the normalized
doc in Elasticsearch (reference node-consumer/index.js:277-299); every
dashboard/analytics query then reads the SINK, never re-parses the
topic (reference grafana dashboard ES/PromQL panels). Our streaming
path does the same (streaming/ingest.py writes a (table,date)
partitioned parquet sink). This module is the batch-mode equivalent:
the P1-P5 chain over the deterministic canal-json envelopes is
materialized to parquet once per (events.parquet fingerprint), and all
downstream analytics queries read the materialized table.

Why this is the 100 TB-correct shape: without it, every one of the
~15 analytics queries re-executes the full json-generate + from_json +
explode chain over the raw input — at cluster scale that is re-reading
and re-parsing the 100 TB topic per dashboard panel. Landing the parsed
event table once (and letting every query scan the columnar sink with
pushdown/pruning) is precisely what the reference does with ES and what
any warehouse does with its bronze->silver hop.

The cache key is (resolved path, size, mtime) of the source parquet, so
regenerated testdata invalidates automatically; the build is atomic
(write to a temp dir, rename into place) so concurrent sessions race
safely.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import tempfile
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

from ..operators import parse as P
from .cdc_gen import envelopes_from_events
from .tables import load_table

SINK_ROOT_ENV = "SPARK_GRAFT_SINK_DIR"
_SCHEMA_VERSION = "v1"  # bump when the normalized schema changes


def _sink_root() -> Path:
    return Path(
        os.environ.get(
            SINK_ROOT_ENV,
            os.path.join(tempfile.gettempdir(), "tidb_cdc_spark_event_sink"),
        )
    )


def _fingerprint(sf_dir: str) -> str:
    src = Path(sf_dir) / "events.parquet"
    st = src.stat()
    key = f"{src.resolve()}|{st.st_size}|{st.st_mtime_ns}|{_SCHEMA_VERSION}"
    return hashlib.sha256(key.encode()).hexdigest()[:16]


def build_normalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The live P1→P5 chain (no materialization) — parse-semantics
    queries and the streaming path use this directly."""
    return P.normalized_events(
        envelopes_from_events(load_table(spark, sf_dir, "events"))
    )


def normalized_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalized event table, materialized once per source fingerprint.

    First caller executes the real chain and lands it as parquet (the
    bronze->silver hop); everyone after scans the columnar sink with
    full pushdown/pruning. Falls back to the live chain if the sink
    directory is unwritable.
    """
    dest = _sink_root() / _fingerprint(sf_dir)
    if not (dest / "_SUCCESS").exists():
        try:
            _materialize(spark, sf_dir, dest)
        except OSError:
            return build_normalized(spark, sf_dir)
    return spark.read.parquet(str(dest))


def _materialize(spark: SparkSession, sf_dir: str, dest: Path) -> None:
    root = dest.parent
    root.mkdir(parents=True, exist_ok=True)
    # re-check the marker before clearing: a sibling session may have
    # FINISHED its build between our caller's check and now — deleting
    # a completed sink would break that session's already-returned
    # DataFrames mid-query (TOCTOU)
    if (dest / "_SUCCESS").exists():
        return
    # a directory without _SUCCESS is a dead partial build — clear it
    if dest.exists():
        shutil.rmtree(dest, ignore_errors=True)
    tmp = Path(tempfile.mkdtemp(dir=root, prefix="._build_"))
    try:
        build = tmp / "normalized"
        build_normalized(spark, sf_dir).write.mode("overwrite").parquet(
            str(build)
        )
        try:
            os.rename(build, dest)
        except OSError:
            # lost the race to a concurrent builder — theirs is as good
            if not (dest / "_SUCCESS").exists():
                raise
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
