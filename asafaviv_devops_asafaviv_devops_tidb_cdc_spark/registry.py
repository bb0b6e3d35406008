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
    # Round-9 window: drain the verdict-staleness backlog (r8 verdict
    # item 1). scripts/freshness.py reports 0 changed-path and 0
    # never-checked at round start, so all 50 slots are rotation, taken
    # oldest-first as tests/test_freshness.py requires:
    # (a) the entire r3-latest cohort (22), (b) the 28 oldest r4-latest
    # entries in registration order. Queries edited later this round
    # (flagged by freshness.py) displace the NEWEST rotation entries —
    # an outside-the-window r4 entry ties the newest r4 inside, which
    # the oldest-first invariant allows.
    # --- changed-path this round (freshness.py, 6) + new (1):
    # oversized-bucket star reps rewrote both minhash pipelines;
    # spec-clean whole-frame WAV synth + n_frames readout;
    # q_hll_distinct gained its oracle (bound-predicate readout);
    # q_kmv_distinct + q_bmp_pixel_stats docstring cross-refs;
    # q_png_pixel_stats is the round's one new registration (the
    # stored-deflate PNG decode, r8 verdict item 7) ---
    "q_minhash_neardup",
    "q_neardup_recall",
    "q_wav_sample_stats",
    "q_hll_distinct",
    "q_kmv_distinct",
    "q_bmp_pixel_stats",
    "q_png_pixel_stats",
    # --- (a) r3-latest cohort, all 22 ---
    "q_nation_volume",
    "q_market_share",
    "q_order_count_dist",
    "q_small_qty_revenue",
    "q_big_orders",
    "q_sql_region_revenue",
    "q_forecast_revenue",
    "q_idle_rich_customers",
    "q_pii_scan",
    "q_term_stats",
    "q_embedding_stats",
    "q_multimodal_decode",
    "q_ann_batch",
    "q_doc_search",
    "q_bigram_counts",
    "q_doc_len_histogram",
    "q_null_profile",
    "q_key_skew",
    "q_schema_drift",
    "q_pruned_scan",
    "q_vec_quantize",
    "q_delta_agg",
    # --- (b) oldest r4-latest entries (21 of 43) ---
    "q_ops_by_table_op",
    "q_status_counts",
    "q_validate_events",
    "q_parse_envelope",
    "q_explode_rows",
    "q_normalize",
    "q_string_ops",
    "q_batch_insert_gen",
    "q_anti_orphans",
    "q_semi_active",
    "q_ratio_join",
    "q_unique_check",
    "q_asof_join",
    "q_range_join",
    "q_skew_salted_join",
    "q_latency_histogram",
    "q_totals_last",
    "q_sums_filtered",
    "q_rollup_ops",
    "q_cube_ops",
    "q_windowed_distinct",
    # The 22 r4-latest leftovers (q_rate_5m, q_error_ratio,
    # q_quantiles, q_hll_error_bound,
    # q_alert_liveness, q_prom_quantile, q_rate_per_op, q_increase_1h, q_date_histogram,
    # q_topk_recent, q_order_priority, q_supplier_parts,
    # q_disjunctive_revenue, q_embedding_neardup, q_frame_sample,
    # q_multimodal_features, q_cosine_pairs, q_vocab_growth,
    # q_zorder_layout, q_embedding_norm_hist, q_udaf_median,
    # q_udtf_explode) lead the r10 window. Everything below kept its
    # round-5+ verdict on an unchanged path; fresh entries keep
    # registration order after these.
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
