"""Parquet table loaders for the driver's synthetic star schema.

Scans stay declarative (``spark.read.parquet``) so Catalyst performs
predicate pushdown + column pruning into the parquet reader; at 100 TB
the same call reads a partitioned table and prunes partitions too.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


# rebalance() only fires below this total input size: a bigger input
# has (or will get, via spark.sql.files.maxPartitionBytes) enough
# natural splits, and AQE owns partition sizing from there.
_SMALL_INPUT_BYTES = 256 * 1024 * 1024


def rebalance(df: DataFrame) -> DataFrame:
    """Spread a SMALL, under-split input across all cores before a
    heavy map stage — a test-fixture shim, deliberately inert on
    production-sized inputs.

    The sandbox parquet tables arrive as ONE input split (single row
    group), so every downstream map stage runs on one thread no matter
    how many cores exist — measured 4-10x slowdowns on the CDC parse
    chain and signature computations. Gate on the scan's file list
    (plan metadata only — probing ``df.rdd.getNumPartitions()`` forces
    an RDD conversion and reports pre-AQE counts, silently defeating
    AQE coalescing): few local files AND small total size -> spread;
    anything else (many files, big files, non-local storage) -> no-op,
    ``spark.sql.files.maxPartitionBytes`` + AQE own the parallelism."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    files = df.inputFiles()
    if not files or len(files) >= target:
        return df
    total = 0
    for uri in files:
        if not uri.startswith("file:"):
            return df  # remote storage: trust split planning + AQE
        path = "/" + uri.split(":", 1)[1].lstrip("/")  # file:///x and file:/x
        try:
            total += os.path.getsize(path)
        except OSError:
            return df
    if total > _SMALL_INPUT_BYTES:
        return df
    return df.repartition(target)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and isinstance(df.schema["ts"].dataType, T.LongType):
        # TIMESTAMP(NANOS) read as long (see session.py); truncate to
        # micros with integer division ("/" would go through double and
        # lose precision above 2^53) — same truncation parquet readers
        # with native micros support apply.
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    # Parquet timestamps written with isAdjustedToUTC=false arrive as
    # TIMESTAMP_NTZ, which unix_millis()/window() reject. Interpret the
    # wall clock as UTC explicitly (to_utc_timestamp, NOT a bare cast,
    # which would go through the session timezone) so epochs are
    # identical in any session and match DuckDB's naive-as-UTC reading.
    ntz = [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, T.TimestampNTZType)
    ]
    if ntz:
        df = df.withColumns(
            {c: F.to_utc_timestamp(F.col(c), "UTC") for c in ntz}
        )
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for the SQL API."""
    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
