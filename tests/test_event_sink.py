"""Materialized event sink (sources/event_sink.py): build-once
semantics, fingerprint invalidation, and parity with the live chain."""

from __future__ import annotations

import os
import shutil

import pytest

from asafaviv_devops_asafaviv_devops_tidb_cdc_spark.sources import event_sink

from tests.conftest import SF_SMOKE


@pytest.fixture()
def sink_root(tmp_path, monkeypatch):
    root = tmp_path / "sink"
    monkeypatch.setenv(event_sink.SINK_ROOT_ENV, str(root))
    yield root


def test_sink_matches_live_chain(spark, sink_root):
    live = event_sink.build_normalized(spark, SF_SMOKE)
    sunk = event_sink.normalized_sink(spark, SF_SMOKE)
    assert sorted(sunk.columns) == sorted(live.columns)
    assert sunk.count() == live.count()
    # exact row-level parity on the scalar columns
    cols = ["ts", "table_name", "operation", "partition", "offset", "rownum"]
    assert live.select(cols).exceptAll(sunk.select(cols)).count() == 0


def test_sink_builds_once_and_reuses(spark, sink_root):
    first = event_sink.normalized_sink(spark, SF_SMOKE)
    dirs = {p.name for p in sink_root.iterdir() if p.is_dir()}
    assert len(dirs) == 1
    again = event_sink.normalized_sink(spark, SF_SMOKE)
    assert {p.name for p in sink_root.iterdir() if p.is_dir()} == dirs
    assert again.count() == first.count()


def test_sink_invalidates_on_source_change(spark, sink_root, tmp_path):
    # copy the sf dir so we can bump the source mtime without touching
    # the shared testdata
    sf_copy = tmp_path / "sf"
    sf_copy.mkdir()
    for name in ["events"]:
        shutil.copy(f"{SF_SMOKE}/{name}.parquet", sf_copy / f"{name}.parquet")
    event_sink.normalized_sink(spark, str(sf_copy))
    n_before = len(list(sink_root.iterdir()))
    os.utime(sf_copy / "events.parquet")  # new mtime -> new fingerprint
    event_sink.normalized_sink(spark, str(sf_copy))
    assert len(list(sink_root.iterdir())) == n_before + 1


def test_partial_build_is_repaired(spark, sink_root):
    # a dest dir without _SUCCESS is a dead partial build
    n = event_sink.normalized_sink(spark, SF_SMOKE).count()
    dest = next(p for p in sink_root.iterdir() if p.is_dir())
    (dest / "_SUCCESS").unlink()
    repaired = event_sink.normalized_sink(spark, SF_SMOKE)
    assert (dest / "_SUCCESS").exists()
    assert repaired.count() == n
