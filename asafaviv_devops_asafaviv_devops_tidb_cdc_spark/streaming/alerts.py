"""Sustained-condition alerting (operator W7): PromQL alert rules with
a ``for:`` duration (reference monitoring/alerts.yml:6-14 — error rate
above threshold *sustained 5 minutes* — and four siblings).

Semantics: bucket events into tumbling windows; a window "breaches"
when its condition holds; the alert FIRES for every window that ends a
run of >= N consecutive breached windows (missing windows break the
run, matching Prometheus pendings resetting when the expr stops
returning).

Batch implementation: gaps-and-islands — breached windows, island id =
window_start - rank * width (consecutive windows share it), alert rows
where the running streak inside the island reaches N. One shuffle on
the island sort; SQL-expressible, so it gets a DuckDB oracle.

Streaming implementation: ``applyInPandasWithState`` keeps (streak,
last window) per key and emits fire/clear transitions — the only
operator in this engine needing custom state (SURVEY §4.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

WINDOW_MS = 300_000  # 5-minute buckets
DEFAULT_THRESHOLD_PPM = 200_000  # fire when >20% of a window's events are errors
DEFAULT_FOR_WINDOWS = 3  # "for: 15m" at 5-minute resolution


def breached_windows(
    events: DataFrame, threshold_ppm: int = DEFAULT_THRESHOLD_PPM
) -> DataFrame:
    """Tumbling 5-min error-ratio windows that breach the threshold."""
    return (
        events.groupBy(F.window("ts", "5 minutes").alias("w"))
        .agg(
            F.count("*").alias("n_total"),
            F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
            .cast("long")
            .alias("n_errors"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "n_total",
            "n_errors",
            F.expr("(n_errors * 1000000) div n_total").cast("long").alias("error_ppm"),
        )
        .filter(F.col("error_ppm") >= threshold_ppm)
    )


def sustained_alerts(
    events: DataFrame,
    threshold_ppm: int = DEFAULT_THRESHOLD_PPM,
    for_windows: int = DEFAULT_FOR_WINDOWS,
) -> DataFrame:
    """Batch W7: windows where the breach has been sustained for >=
    ``for_windows`` consecutive windows."""
    b = breached_windows(events, threshold_ppm)
    w_rank = Window.orderBy("window_start")
    islanded = b.withColumn(
        "island",
        (F.unix_millis("window_start") - F.row_number().over(w_rank) * WINDOW_MS).cast(
            "long"
        ),
    )
    w_streak = (
        Window.partitionBy("island")
        .orderBy("window_start")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        islanded.withColumn("streak", F.count("*").over(w_streak).cast("long"))
        .filter(F.col("streak") >= for_windows)
        .select("window_start", "error_ppm", "streak")
    )


def sustained_alerts_stream(
    events: DataFrame,
    threshold_ppm: int = DEFAULT_THRESHOLD_PPM,
    for_windows: int = DEFAULT_FOR_WINDOWS,
) -> DataFrame:
    """Streaming W7 via applyInPandasWithState: per alert-rule key the
    operator buckets its events into 5-min windows itself (Spark
    forbids stateful ops after a streaming aggregation), carrying
    (last_window_ms, streak) across micro-batches. Assumes per-key
    event-time order across batches (true for a replayed log / a
    single Kafka partition per rule — the reference's exact setup,
    docker-compose.yml:102 partition-num=1).

    Scale note: the key is the alert RULE (tiny cardinality — 5 rules
    in reference monitoring/alerts.yml), not the event key; the
    production shape is a windowed pre-aggregation stream feeding this
    operator one row per window."""

    def update(key, pdfs, state):
        import pandas as pd

        (last_ms, streak) = state.get if state.exists else (-1, 0)
        batches = list(pdfs)
        out = []
        if batches:
            pdf = pd.concat(batches)
            ms = (pdf["ts"] - pd.Timestamp(0)) // pd.Timedelta(milliseconds=1)
            pdf = pdf.assign(window_ms=(ms // WINDOW_MS) * WINDOW_MS)
            grouped = (
                pdf.groupby("window_ms")
                .agg(
                    n_total=("event_type", "size"),
                    n_errors=("event_type", lambda s: int((s == "error").sum())),
                )
                .sort_index()
            )
            for window_ms, row in grouped.iterrows():
                ppm = int(row["n_errors"]) * 1_000_000 // int(row["n_total"])
                if ppm >= threshold_ppm:
                    streak = streak + 1 if window_ms == last_ms + WINDOW_MS else 1
                    last_ms = int(window_ms)
                    if streak >= for_windows:
                        out.append((int(window_ms), int(ppm), int(streak)))
                else:
                    streak = 0
                    last_ms = int(window_ms)
        state.update((int(last_ms), int(streak)))
        import pandas as pd

        yield pd.DataFrame(out, columns=["window_ms", "error_ppm", "streak"])

    keyed = events.select(
        F.lit("error_rate").alias("rule"), F.col("ts"), F.col("event_type")
    )
    return keyed.groupBy("rule").applyInPandasWithState(
        update,
        outputStructType="window_ms long, error_ppm long, streak long",
        stateStructType="last_ms long, streak long",
        outputMode="append",
        timeoutConf="NoTimeout",
    )
