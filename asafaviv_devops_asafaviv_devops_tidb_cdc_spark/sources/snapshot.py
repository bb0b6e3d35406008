"""Backup / restore (operator S7): the reference snapshots TiDB with
dumpling and re-imports with lightning (reference scripts/backup.sh:9-19,
scripts/restore.sh:18-24). Engine-side equivalent: an immutable parquet
snapshot with a row-count manifest, restored by re-reading and verified
against the manifest.

Scale posture: the snapshot is a parallel columnar write (one file per
partition, no driver collect); restore is a plain parquet scan, so all
pushdown/pruning applies to reads of the backup itself.
"""

from __future__ import annotations

import json
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

MANIFEST = "_snapshot_manifest.json"


def snapshot(df: DataFrame, path: str) -> dict:
    """Write an immutable snapshot + manifest; returns the manifest."""
    df.write.mode("overwrite").parquet(path)
    spark = df.sparkSession
    n = spark.read.parquet(path).count()  # count what landed, not the input
    manifest = {"rows": n, "schema": df.schema.jsonValue()}
    (Path(path) / MANIFEST).write_text(json.dumps(manifest))
    return manifest


def restore(spark: SparkSession, path: str) -> DataFrame:
    """Re-read a snapshot, verifying the manifest row count (the
    reference's restore has no verification at all)."""
    manifest = json.loads((Path(path) / MANIFEST).read_text())
    df = spark.read.parquet(path)
    n = df.count()
    if n != manifest["rows"]:
        raise ValueError(f"snapshot {path}: manifest={manifest['rows']} rows, found {n}")
    return df
