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
        F.unix_millis("window_start")
        - F.row_number().over(w_rank).cast("long") * F.lit(WINDOW_MS).cast("long"),
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


def evaluate_rules(
    events: DataFrame,
    rules: list[dict],
    window_ms: int = WINDOW_MS,
) -> DataFrame:
    """W7 generalized — alert RULES AS DATA, the declarative equivalent
    of the reference's whole alerts.yml (monitoring/alerts.yml:6-45):
    each rule is {name, metric, op ('>=' | '<='), threshold (integer
    units), for_windows}, where ``metric`` is a SQL expression over the
    per-window basis columns (n_total, n_errors, error_ppm,
    p95_value_cents). Returns every (rule, window) where the condition
    held for >= for_windows CONSECUTIVE windows.

    Shape: ONE windowed aggregation computes the basis for all rules; a
    full window GRID (sequence over [min, max]) gives absence rules
    ('no events for 10m' = n_total <= 0) real zero-windows to fire on;
    rules fan out as selects over the same frame (no re-aggregation);
    gaps-and-islands streaks partition BY RULE, so N rules cost one
    extra tiny shuffle, not N jobs. The hardcoded
    ``sustained_alerts`` is this evaluator specialized to one rule
    (equivalence is test-pinned)."""
    if not rules:  # rules are config/data: an empty file means "no
        # alerts configured", not a crash
        return events.sparkSession.createDataFrame(
            [], "rule string, window_start timestamp, value long, streak long"
        )
    sec = window_ms // 1000
    base = (
        events.groupBy(F.window("ts", f"{sec} seconds").alias("w"))
        .agg(
            F.count("*").alias("n_total"),
            F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
            .cast("long")
            .alias("n_errors"),
            F.expr("CAST(floor(percentile(value, 0.95) * 100 + 0.5) AS BIGINT)")
            .alias("p95_value_cents"),
        )
        .select(F.col("w.start").alias("window_start"), "n_total", "n_errors", "p95_value_cents")
    )
    span = base.agg(
        F.min("window_start").alias("lo"), F.max("window_start").alias("hi")
    )
    grid = span.select(
        F.explode(
            F.expr(f"sequence(lo, hi, interval {sec} seconds)")
        ).alias("window_start")
    )
    frame = (
        grid.join(base, "window_start", "left")
        .withColumn("n_total", F.coalesce("n_total", F.lit(0)).cast("long"))
        .withColumn("n_errors", F.coalesce("n_errors", F.lit(0)).cast("long"))
        .withColumn(
            "error_ppm",
            F.when(
                F.col("n_total") > 0,
                F.expr("(n_errors * 1000000) div n_total"),
            )
            .otherwise(0)
            .cast("long"),
        )
        .withColumn(
            "p95_value_cents", F.coalesce("p95_value_cents", F.lit(0)).cast("long")
        )
    )
    per_rule = []
    for r in rules:
        value = F.expr(r["metric"]).cast("long")
        cond = (
            value >= F.lit(int(r["threshold"]))
            if r.get("op", ">=") == ">="
            else value <= F.lit(int(r["threshold"]))
        )
        per_rule.append(
            frame.select(
                F.lit(r["name"]).alias("rule"),
                "window_start",
                value.alias("value"),
                F.lit(int(r["for_windows"])).alias("for_windows"),
            ).filter(cond)
        )
    breached = per_rule[0]
    for f in per_rule[1:]:
        breached = breached.unionByName(f)
    w_rank = Window.partitionBy("rule").orderBy("window_start")
    islanded = breached.withColumn(
        "island",
        F.unix_millis("window_start")
        - F.row_number().over(w_rank).cast("long") * F.lit(window_ms).cast("long"),
    )
    w_streak = (
        Window.partitionBy("rule", "island")
        .orderBy("window_start")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        islanded.withColumn("streak", F.count("*").over(w_streak).cast("long"))
        .filter(F.col("streak") >= F.col("for_windows"))
        .select("rule", "window_start", "value", "streak")
    )


def make_sustained_update(
    threshold_ppm: int = DEFAULT_THRESHOLD_PPM,
    for_windows: int = DEFAULT_FOR_WINDOWS,
):
    """The applyInPandasWithState update function, factored out so the
    batch-boundary (window-straddle) semantics are unit-testable
    without driving a real stream."""

    def update(key, pdfs, state):
        import pandas as pd

        # State carries the OPEN (= newest-seen) window's accumulated
        # counts, the streak BEFORE it, and whether it already fired.
        # A window whose events straddle two micro-batches (file/offset
        # boundaries don't align to windows under maxFilesPerTrigger)
        # arrives again with window_ms == open_ms: merge its counts and
        # re-evaluate instead of resetting the streak / double-firing
        # (the round-1 `else 1` bug).
        if state.exists:
            (open_ms, streak_prev, open_total, open_errors, open_fired) = state.get
        else:
            open_ms, streak_prev, open_total, open_errors, open_fired = -1, 0, 0, 0, False
        out = []

        def evaluate():
            """(Re-)evaluate the open window; fire at most once."""
            nonlocal open_fired
            if open_total <= 0:
                return
            ppm = open_errors * 1_000_000 // open_total
            if ppm >= threshold_ppm:
                streak = streak_prev + 1
                if streak >= for_windows and not open_fired:
                    out.append((int(open_ms), int(ppm), int(streak)))
                    open_fired = True

        batches = list(pdfs)
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
                window_ms = int(window_ms)
                if window_ms == open_ms:
                    open_total += int(row["n_total"])
                    open_errors += int(row["n_errors"])
                else:
                    # close the open window: fold its final breach
                    # status into the streak for the next window
                    if open_ms >= 0:
                        breached = (
                            open_total > 0
                            and open_errors * 1_000_000 // open_total >= threshold_ppm
                        )
                        consecutive = window_ms == open_ms + WINDOW_MS
                        streak_prev = (
                            streak_prev + 1 if (breached and consecutive) else 0
                        )
                    open_ms = window_ms
                    open_total = int(row["n_total"])
                    open_errors = int(row["n_errors"])
                    open_fired = False
                evaluate()
        state.update(
            (int(open_ms), int(streak_prev), int(open_total), int(open_errors), bool(open_fired))
        )
        yield pd.DataFrame(out, columns=["window_ms", "error_ppm", "streak"])

    return update


def sustained_alerts_stream(
    events: DataFrame,
    threshold_ppm: int = DEFAULT_THRESHOLD_PPM,
    for_windows: int = DEFAULT_FOR_WINDOWS,
) -> DataFrame:
    """Streaming W7 via applyInPandasWithState: per alert-rule key the
    operator buckets its events into 5-min windows itself (Spark
    forbids stateful ops after a streaming aggregation), carrying the
    open window's counts + the streak before it across micro-batches.
    A window that STRADDLES a batch boundary is merged into the open
    state and re-evaluated (at-most-once fire per window) rather than
    resetting the streak. Windows are assumed non-decreasing across
    batches (true for a replayed log / a single Kafka partition per
    rule — the reference's exact setup, docker-compose.yml:102
    partition-num=1); a late out-of-order window degrades to a streak
    reset, never a crash. One irreducible append-mode caveat: a fired
    window cannot be retracted if a late straddle drops its ratio back
    under the threshold.

    Scale note: the key is the alert RULE (tiny cardinality — 5 rules
    in reference monitoring/alerts.yml), not the event key; the
    production shape is a windowed pre-aggregation stream feeding this
    operator one row per window."""
    update = make_sustained_update(threshold_ppm, for_windows)
    keyed = events.select(
        F.lit("error_rate").alias("rule"), F.col("ts"), F.col("event_type")
    )
    return keyed.groupBy("rule").applyInPandasWithState(
        update,
        outputStructType="window_ms long, error_ppm long, streak long",
        stateStructType=(
            "open_ms long, streak_prev long, open_total long, "
            "open_errors long, open_fired boolean"
        ),
        outputMode="append",
        timeoutConf="NoTimeout",
    )
