"""Query registry: maps Qid -> (Spark callable, DuckDB oracle SQL).

Every operator from SURVEY.md §2 registers here; ``__spark_entry__.py``
re-exports. Oracle-less entries (stream-only / non-SQL-expressible)
get a rows-only check from the driver.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}

_QUERY_MODULES = [
    "asafaviv_devops_asafaviv_devops_tidb_cdc_spark.queries.cdc",
    "asafaviv_devops_asafaviv_devops_tidb_cdc_spark.queries.relational",
    "asafaviv_devops_asafaviv_devops_tidb_cdc_spark.queries.metrics",
    "asafaviv_devops_asafaviv_devops_tidb_cdc_spark.queries.analytics",
    "asafaviv_devops_asafaviv_devops_tidb_cdc_spark.queries.llm_pipeline",
    "asafaviv_devops_asafaviv_devops_tidb_cdc_spark.queries.streaming_checks",
    "asafaviv_devops_asafaviv_devops_tidb_cdc_spark.queries.logs",
    "asafaviv_devops_asafaviv_devops_tidb_cdc_spark.queries.window_funcs",
    "asafaviv_devops_asafaviv_devops_tidb_cdc_spark.queries.profiling",
    "asafaviv_devops_asafaviv_devops_tidb_cdc_spark.queries.storage",
    "asafaviv_devops_asafaviv_devops_tidb_cdc_spark.queries.corpus_ops",
    "asafaviv_devops_asafaviv_devops_tidb_cdc_spark.queries.extensions",
    "asafaviv_devops_asafaviv_devops_tidb_cdc_spark.queries.training_io",
    "asafaviv_devops_asafaviv_devops_tidb_cdc_spark.queries.advanced_ops",
    "asafaviv_devops_asafaviv_devops_tidb_cdc_spark.queries.web_frontier",
]

# Registration (= iteration) order for the exported query dict. The
# driver's correctness gate checks a prefix of the registered queries
# (round 1 stopped at 50 of 74), so ordering IS coverage policy: put
# the queries whose verdicts matter most this round first —
# (a) queries whose output changed (the decimal->double/cents sweep),
# (b) the whole LLM-pipeline + streaming block, which registered after
#     the cutoff in round 1 and therefore has no oracle verdict yet.
# Queries not listed here keep registration order after the listed ones;
# all of them still run in bench and pytest regardless.
_CHECK_FIRST = [
    # Round-14 window (50 slots), composed mechanically per
    # tests/test_freshness.py (scripts/freshness.py is the source of
    # truth; this list just pins its output):
    # (a) 3 never-checked new registrations (cap 3, fully used):
    #     q_sitemap_census (E44 sitemap.xml discovery census),
    #     q_crawl_frontier (E43 frontier composition: E39 URLs +
    #     E44 sitemap x E42 robots broadcast x E41 rank),
    #     q_stream_host_graph (E45 epoch-partial host-graph census);
    # (b) 4 changed-path entries: the three JPEG queries (bulk
    #     _BitWriter, sparse-support scan_ops/decoder sweeps, cached
    #     unit lists, over-subscribed-DHT guard — byte-identical
    #     streams, re-proof due anyway) and q_host_graph (webgraph.py
    #     extraction + MEMORY_AND_DISK persist);
    # (c) rotation = the r14 STALE-DRAIN (r13 verdict order #1): all
    #     4 r7 + the 39 oldest r8 verdicts in registration order. The
    #     4 r8 entries left outside (q_stream_doc_dedup,
    #     q_compact_partials, q_stream_sample, q_stream_manifest) tie
    #     the newest r8 inside (window capacity, allowed by the
    #     oldest-first invariant) and were self-proven at HEAD via
    #     scripts/check_parity.py — see BASELINE.md r14 notes.
    "q_sitemap_census",
    "q_crawl_frontier",
    "q_stream_host_graph",
    "q_jpeg_coeff_stats",
    "q_jpeg_color_stats",
    "q_jpeg_progressive_stats",
    "q_host_graph",
    "q_stream_changepoint",
    "q_join_order_choice",
    "q_hierarchy_depth",
    "q_subtree_rollup",
    "q_intersect_active",
    "q_median_value",
    "q_grouping_sets",
    "q_ops_unpivot",
    "q_value_parts",
    "q_cluster_sizes",
    "q_ann_recall",
    "q_ivf_incremental",
    "q_stream_ingest_counts",
    "q_stream_cdc_replay",
    "q_stream_window_counts",
    "q_stream_dedupe",
    "q_stream_sessions",
    "q_stream_stream_join",
    "q_stream_alerts",
    "q_stream_join_view",
    "q_stream_funnel",
    "q_stream_topk",
    "q_stream_late_drops",
    "q_moving_avg",
    "q_lag_delta",
    "q_first_last",
    "q_ntile",
    "q_topn_per_group",
    "q_rolling_1h_count",
    "q_rank_stats",
    "q_stream_dq",
    "q_stream_event_drift",
    "q_compaction_parity",
    "q_decontaminate",
    "q_pack_sequences",
    "q_corpus_mix",
    "q_kmeans_iter",
    "q_scd2_history",
    "q_stream_scd2",
    "q_scd2_asof",
    "q_stream_delta_agg",
    "q_boilerplate_grams",
    "q_canonical_pick",
]


_loaded = False


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_all() -> None:
    global _loaded
    if _loaded:
        return
    for mod in _QUERY_MODULES:
        try:
            importlib.import_module(mod)
        except ModuleNotFoundError as exc:
            # allow partially-built query subpackages during development
            if mod.rsplit(".", 1)[-1] not in str(exc):
                raise
    _reorder()
    _loaded = True


def _reorder() -> None:
    """Rebuild the registries in _CHECK_FIRST-priority order (dicts
    iterate in insertion order, which is what the driver consumes)."""
    rank = {name: i for i, name in enumerate(_CHECK_FIRST)}
    reg_order = {name: i for i, name in enumerate(QUERIES)}
    ordered = sorted(QUERIES, key=lambda n: (rank.get(n, len(rank)), reg_order[n]))
    for registry in (QUERIES, ORACLES):
        items = {n: registry[n] for n in ordered if n in registry}
        registry.clear()
        registry.update(items)
