"""Storage-layout operators: partition pruning, one-file-per-partition
writes, and small-file compaction (sources/layout.py)."""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import functions as F

from asafaviv_devops_asafaviv_devops_tidb_cdc_spark import registry
from asafaviv_devops_asafaviv_devops_tidb_cdc_spark.plans import checks
from asafaviv_devops_asafaviv_devops_tidb_cdc_spark.sources import layout

from tests.conftest import SF_SMOKE

registry.load_all()


def test_pruned_scan_has_partition_filter(spark):
    """The ship-year predicate must reach the scan as a PARTITION
    filter (directory pruning), not a post-scan row filter."""
    df = registry.QUERIES["q_pruned_scan"](spark, SF_SMOKE)
    plan = checks.plan_string(df)
    assert "PartitionFilters" in plan, plan
    assert "ship_year" in plan, plan


def test_partitioned_layout_one_file_per_partition(spark):
    t = layout.partitioned_lineitem(spark, SF_SMOKE)
    years = [r[0] for r in t.select("ship_year").distinct().collect()]
    first = t.inputFiles()[0]
    local = "/" + first.split(":", 1)[1].lstrip("/")  # file:///x and file:/x
    root = Path(local).parent.parent
    for y in years:
        files = list((root / f"ship_year={y}").glob("*.parquet"))
        assert len(files) == 1, f"ship_year={y}: {len(files)} files"


def test_compact_reduces_files_preserves_rows(spark, tmp_path):
    path = str(tmp_path / "frag")
    spark.range(10_000).repartition(16).write.parquet(path)
    before_rows = spark.read.parquet(path).count()
    n_before, n_after = layout.compact(spark, path, target_mb=128)
    assert n_before == 16
    assert n_after == 1
    after = spark.read.parquet(path)
    assert after.count() == before_rows
    assert after.agg(F.sum("id")).first()[0] == sum(range(10_000))


def test_compact_preserves_hive_partitions(spark, tmp_path):
    """Compacting a hive-partitioned sink must keep the partition
    directory layout (and thus pruning), not flatten it."""
    path = str(tmp_path / "ptab")
    df = spark.range(1000).select(
        F.col("id"), (F.col("id") % 3).alias("k")
    )
    df.repartition(8).write.partitionBy("k").parquet(path)
    before, after = layout.compact(spark, path, target_mb=1)
    assert after <= before
    part_dirs = {p.name for p in Path(path).iterdir() if p.is_dir()}
    assert {"k=0", "k=1", "k=2"} <= part_dirs, part_dirs
    back = spark.read.parquet(path)
    assert back.count() == 1000
    assert set(back.columns) == {"id", "k"}


def test_compact_recovers_from_stale_old_dir(spark, tmp_path):
    """A leftover '<path>.old' from a crashed compaction must not break
    (or double) the next one."""
    import os

    path = str(tmp_path / "tab")
    spark.range(100).write.parquet(path)
    # simulate a crash between the two renames: data only at .old
    os.rename(path, path + ".old")
    layout.compact(spark, path, target_mb=1)
    assert spark.read.parquet(path).count() == 100
    assert not Path(path + ".old").exists()
