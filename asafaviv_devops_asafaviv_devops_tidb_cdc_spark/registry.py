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
    # Round-8 window: the driver oracle-checks a 50-query prefix of the
    # registered order. Priority policy (r7 verdict items 1-2-4):
    # positions 1-26 are every query whose code path changed AFTER its
    # latest green verdict, as detected MECHANICALLY by
    # scripts/freshness.py (function-granular reference-closure diff
    # against each query's verdict-round commit) — the hand-maintained
    # r8 queue of 16 missed ten of these (q_stream_alerts,
    # q_stream_cdc_replay, q_stream_scd2, q_stream_delta_agg,
    # q_stream_doc_dedup, q_dedup_yield_by_source, q_canonical_pick,
    # q_value_parts + two already queued), which is exactly why the
    # detector now exists and tests/test_freshness.py enforces it.
    # Positions 27-50 rotate the oldest latest-verdict entries (the r3
    # cohort): first the queries the r7 verdict called out by name
    # (SCD2 pair, the W10 window battery, E7/E8/E9
    # decontaminate/pack/mix, kmeans, boilerplate), then registration
    # order; the r3 entries that don't fit lead the r9 window — the
    # freshness test's oldest-first invariant makes that mechanical.
    # --- (a) changed-path since latest verdict (26, freshness.py) ---
    "q_stream_ingest_counts",
    "q_stream_dedupe",
    "q_stream_window_counts",
    "q_stream_sessions",
    "q_stream_topk",
    "q_stream_late_drops",
    "q_compact_partials",
    "q_compaction_parity",
    "q_ivf_incremental",
    "q_stream_funnel",
    "q_stream_join_view",
    "q_stream_stream_join",
    "q_stream_sample",
    "q_stream_dq",
    "q_stream_manifest",
    "q_stream_event_drift",
    "q_stream_alerts",
    "q_stream_cdc_replay",
    "q_stream_scd2",
    "q_stream_delta_agg",
    "q_stream_doc_dedup",
    "q_dedup_yield_by_source",
    "q_canonical_pick",
    "q_value_parts",
    "q_cluster_sizes",
    "q_ann_recall",
    # --- (a2) new in r8, never driver-checked ---
    "q_bmp_pixel_stats",
    "q_bmp_resize",
    "q_wav_sample_stats",
    "q_avi_frame_sample",
    # --- (a3) changed in r8: MinHash r=2 banding + bucket cap (the
    # scale-stress harness measured quadratic candidate growth from the
    # planted-mutant shingle under 1-row bands; fix changed both
    # engines' pipelines, so both queries re-prove at the gate) ---
    "q_minhash_neardup",
    "q_neardup_recall",
    # --- (b) r3-stale cohort, judge-named first (14) ---
    "q_scd2_history",
    "q_scd2_asof",
    "q_moving_avg",
    "q_lag_delta",
    "q_first_last",
    "q_ntile",
    "q_topn_per_group",
    "q_rolling_1h_count",
    "q_rank_stats",
    "q_decontaminate",
    "q_pack_sequences",
    "q_corpus_mix",
    "q_kmeans_iter",
    "q_boilerplate_grams",
    # --- (c) r3-stale cohort, registration order (10) ---
    "q_intersect_active",
    "q_median_value",
    "q_grouping_sets",
    "q_ops_unpivot",
    # r3 leftovers lead the r9 window head (oldest-first invariant in
    # tests/test_freshness.py): q_nation_volume,
    # q_market_share, q_order_count_dist,
    # q_small_qty_revenue, q_big_orders,
    # q_sql_region_revenue, q_forecast_revenue,
    # q_idle_rich_customers, q_pii_scan, q_term_stats,
    # q_embedding_stats, q_multimodal_decode, q_ann_batch,
    # q_doc_search, q_bigram_counts, q_doc_len_histogram,
    # q_null_profile, q_key_skew, q_schema_drift, q_pruned_scan,
    # q_vec_quantize, q_delta_agg.
    # Everything below kept its round-4+ verdict on an unchanged path;
    # fresh entries keep registration order after these.
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
