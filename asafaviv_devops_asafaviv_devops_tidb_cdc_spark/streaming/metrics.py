"""Operational metrics surface (operator S5 + A6): the reference
exports prom-client counters over an Express /metrics endpoint scraped
every 15 s (reference node-consumer/index.js:387-398;
prometheus/prometheus.yml:1-28). The Spark-native equivalents:

- ``df.observe`` — accumulator-style metrics computed inside the job
  on the data actually flowing through, with zero extra passes or
  shuffles; surfaced per micro-batch via ``StreamingQueryListener``
  (streaming) or ``Observation`` (batch).
- ``query.lastProgress`` — rows/sec, batch durations, state size: the
  consumer-lag / throughput counters the reference tracks by hand
  (index.js:131-139) come free from the engine.

At 100 TB this is the right shape: metrics ride the existing stages;
a scrape never touches data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation, functions as F

# Metric names mirror the reference's prom-client registry
# (reference node-consumer/index.js:90-125).
PROCESSED_TOTAL = "tidb_cdc_operations_total"
INSERTS_TOTAL = "tidb_cdc_inserts_total"
UPDATES_TOTAL = "tidb_cdc_updates_total"
DELETES_TOTAL = "tidb_cdc_deletes_total"
LAST_EVENT_MS = "tidb_cdc_last_event_ms"


def _metric_exprs() -> list:
    def op_count(op: str):
        return F.sum(F.when(F.col("operation") == op, 1).otherwise(0)).cast("long")

    return [
        F.count(F.lit(1)).alias(PROCESSED_TOTAL),
        op_count("insert").alias(INSERTS_TOTAL),
        op_count("update").alias(UPDATES_TOTAL),
        op_count("delete").alias(DELETES_TOTAL),
        F.max(F.unix_millis("ts")).alias(LAST_EVENT_MS),
    ]


def observe_normalized(df: DataFrame, name: str = "cdc_metrics") -> tuple[DataFrame, Observation | str]:
    """Attach the counter set to a (batch or streaming) normalized-event
    DataFrame.

    Batch: returns (df, Observation) — read ``observation.get`` after an
    action. Streaming: ``Observation`` isn't supported, so the metrics
    are attached under ``name`` and arrive on every micro-batch in
    ``StreamingQueryListener.onQueryProgress`` /
    ``query.lastProgress["observedMetrics"][name]``.
    """
    if df.isStreaming:
        return df.observe(name, *_metric_exprs()), name
    obs = Observation(name)
    return df.observe(obs, *_metric_exprs()), obs


# metric -> (type, help) for the exposition renderer; mirrors the
# prom-client registrations at reference node-consumer/index.js:90-125
_METRIC_META = {
    PROCESSED_TOTAL: ("counter", "Total CDC row events processed"),
    INSERTS_TOTAL: ("counter", "Total INSERT row events"),
    UPDATES_TOTAL: ("counter", "Total UPDATE row events"),
    DELETES_TOTAL: ("counter", "Total DELETE row events"),
    LAST_EVENT_MS: ("gauge", "Event-time of the newest processed event (ms)"),
}


def _escape_label(v: str) -> str:
    return v.replace("\\", "\\\\").replace('"', '\\"').replace("\n", "\\n")


def to_prometheus_text(
    metrics: dict[str, int | float | None],
    labels: dict[str, str] | None = None,
) -> str:
    """Render an observed-metrics dict in the Prometheus text exposition
    format (version 0.0.4) — byte-compatible with what prom-client
    serves on the reference's /metrics endpoint (reference
    node-consumer/index.js:387-398), so the same scrape config works.
    Transport is out of scope on an engine (any HTTP server or
    pushgateway can serve the string); this pins the FORMAT, which is
    the part a scraper contract actually depends on."""
    label_str = ""
    if labels:
        inner = ",".join(
            f'{k}="{_escape_label(str(v))}"' for k, v in sorted(labels.items())
        )
        label_str = "{" + inner + "}"
    lines: list[str] = []
    for name in sorted(metrics):
        value = metrics[name]
        if value is None:
            continue
        mtype, mhelp = _METRIC_META.get(name, ("untyped", name))
        lines.append(f"# HELP {name} {mhelp}")
        lines.append(f"# TYPE {name} {mtype}")
        # integers render without exponent/decimal; floats via repr —
        # both accepted by the exposition grammar
        sval = str(int(value)) if float(value).is_integer() else repr(float(value))
        lines.append(f"{name}{label_str} {sval}")
    return "\n".join(lines) + "\n"
