"""Streaming semantics: stream-equals-batch, exactly-once dedupe, and
the stateful sustained-alert operator's stream/batch agreement."""

from __future__ import annotations

from pyspark.sql import functions as F

from asafaviv_devops_asafaviv_devops_tidb_cdc_spark import registry
from asafaviv_devops_asafaviv_devops_tidb_cdc_spark.sources import load_table
from asafaviv_devops_asafaviv_devops_tidb_cdc_spark.streaming import alerts

from tests.conftest import SF_SMOKE

registry.load_all()


def _counts(df):
    return {
        (r["table_name"], r["operation"]): r["n"]
        for r in df.collect()
    }


def test_stream_matches_batch(spark):
    batch = registry.QUERIES["q_ops_by_table_op"](spark, SF_SMOKE)
    stream = registry.QUERIES["q_stream_ingest_counts"](spark, SF_SMOKE)
    assert _counts(stream) == _counts(batch)


def test_stream_dedupe_is_exactly_once(spark):
    batch = registry.QUERIES["q_ops_by_table_op"](spark, SF_SMOKE)
    deduped = registry.QUERIES["q_stream_dedupe"](spark, SF_SMOKE)
    assert _counts(deduped) == _counts(batch)


def test_stream_merge_equals_batch_replay(spark):
    """Final MERGEd state after out-of-order multi-batch replay must
    equal the batch last-writer-wins replay row-for-row."""
    import tempfile
    from pathlib import Path

    from asafaviv_devops_asafaviv_devops_tidb_cdc_spark.operators import parse as P
    from asafaviv_devops_asafaviv_devops_tidb_cdc_spark.operators.replay import (
        current_state,
    )
    from asafaviv_devops_asafaviv_devops_tidb_cdc_spark.sources import (
        envelopes_from_events,
    )
    from asafaviv_devops_asafaviv_devops_tidb_cdc_spark.streaming import ingest, merge

    base = Path(tempfile.gettempdir()) / "tidb_cdc_spark_stream" / "merge_check"
    src = ingest.write_envelope_files(spark, SF_SMOKE, str(base / "src"), None, n_files=8)
    merge.run_replay_stream(
        spark, src, str(base / "state"), str(base / "ckpt"), max_files_per_trigger=2
    )
    streamed = merge.live_state(merge.read_state(spark, str(base / "state")))

    typed = P.typed_rows(
        P.normalized_events(envelopes_from_events(load_table(spark, SF_SMOKE, "events")))
    )
    batch = current_state(
        typed, keys=merge.STATE_KEYS, order_by=merge.STATE_ORDER
    )

    def rows(df):
        return sorted(
            (r["table_name"], r["user_id"], str(r["value"]), str(r["ts"]))
            for r in df.select("table_name", "user_id", "value", "ts").collect()
        )

    assert rows(streamed) == rows(batch)


def test_windowed_agg_stream_matches_batch(spark):
    """W-operators as real streaming: tumbling-window counts computed
    by Structured Streaming over a replayed event log must equal the
    batch windowed aggregation (complete output mode — every window)."""
    import shutil
    import tempfile
    from pathlib import Path

    events = load_table(spark, SF_SMOKE, "events")
    work = Path(tempfile.gettempdir()) / "tidb_cdc_spark_stream" / "winagg_check"
    if work.exists():
        shutil.rmtree(work)
    events.write.mode("overwrite").parquet(str(work / "src"))

    stream = spark.readStream.schema(events.schema).parquet(str(work / "src"))
    q = (
        stream.groupBy(F.window("ts", "1 minute").alias("w"), "event_type")
        .count()
        .writeStream.format("memory")
        .queryName("winagg_stream")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    streamed = {
        (r["w"]["start"], r["event_type"]): r["count"]
        for r in spark.sql("SELECT * FROM winagg_stream").collect()
    }
    batch = {
        (r["w"]["start"], r["event_type"]): r["count"]
        for r in events.groupBy(F.window("ts", "1 minute").alias("w"), "event_type")
        .count()
        .collect()
    }
    assert streamed == batch


def test_sustained_alert_stream_matches_batch(spark):
    events = load_table(spark, SF_SMOKE, "events")
    batch = {
        (r["window_start"], r["streak"])
        for r in alerts.sustained_alerts(events, threshold_ppm=1).collect()
    }

    # replay events through the stateful streaming operator
    import shutil
    import tempfile
    from pathlib import Path

    work = Path(tempfile.gettempdir()) / "tidb_cdc_spark_stream" / "alert_check"
    if work.exists():
        shutil.rmtree(work)
    events.write.mode("overwrite").parquet(str(work / "src"))
    stream_src = spark.readStream.schema(events.schema).parquet(str(work / "src"))
    out = alerts.sustained_alerts_stream(stream_src, threshold_ppm=1)
    q = (
        out.writeStream.format("parquet")
        .option("path", str(work / "sink"))
        .option("checkpointLocation", str(work / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.read.parquet(str(work / "sink"))
    stream = {
        (r["ws"], r["streak"])
        for r in got.select(
            F.timestamp_millis(F.col("window_ms")).alias("ws"), "streak"
        ).collect()
    }
    assert stream == batch


def test_state_maintainers_are_retry_idempotent(spark):
    """A retried micro-batch must not fold its events twice: with the
    epoch's own version dir already on disk, latest_state_path(...,
    before_epoch=epoch) must return the PREVIOUS version."""
    import tempfile
    from pathlib import Path

    from asafaviv_devops_asafaviv_devops_tidb_cdc_spark.streaming.merge import (
        latest_state_path,
    )

    base = Path(tempfile.mkdtemp()) / "state"
    for e in (0, 1, 2):
        (base / f"v{e:09d}").mkdir(parents=True)
    # normal flow: epoch 3 reads newest
    assert latest_state_path(str(base)).endswith("v000000002")
    # retry of epoch 2: its own dir exists but must be skipped
    assert latest_state_path(str(base), before_epoch=2).endswith("v000000001")
    # retry of epoch 0: nothing older -> fresh start
    assert latest_state_path(str(base), before_epoch=0) is None
