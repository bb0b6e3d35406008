"""Parquet table loaders for the driver's synthetic star schema.

Scans stay declarative (``spark.read.parquet``) so Catalyst performs
predicate pushdown + column pruning into the parquet reader; at 100 TB
the same call reads a partitioned table and prunes partitions too.
"""

from __future__ import annotations

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


def rebalance(df: DataFrame) -> DataFrame:
    """Spread an under-partitioned DataFrame across all cores before a
    heavy map stage.

    Small parquet tables arrive as ONE input split (single row group),
    so every downstream map stage runs on a single thread no matter how
    many cores exist — measured 4-10x slowdowns on the CDC parse chain
    and signature computations. The shuffle this adds is tiny (the
    input is small by definition); on a 100 TB input with thousands of
    splits the condition is false and this is a no-op."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and isinstance(df.schema["ts"].dataType, T.LongType):
        # TIMESTAMP(NANOS) read as long (see session.py); truncate to
        # micros with integer division ("/" would go through double and
        # lose precision above 2^53) — same truncation parquet readers
        # with native micros support apply.
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for the SQL API."""
    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
