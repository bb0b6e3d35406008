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
    # Round-10 window (50 slots), composed mechanically per
    # tests/test_freshness.py:
    # (a) 4 changed-path entries (scripts/freshness.py vs the r9/r5
    #     verdict markers): q_bloom_decontaminate (64-bit gram prehash,
    #     functions/bloom.py), q_minhash_neardup + q_neardup_recall
    #     (star-gate constants now interpolated into the shared
    #     _LSH_CAND_CTES oracle template — r9 advice), and
    #     q_png_pixel_stats (fixed-Huffman BTYPE=1 inflate + Z_FIXED
    #     synth for odd ids, r9 verdict item 7);
    # (b) the entire remaining r4-latest cohort (22) — after this
    #     window drains, no verdict is older than r5 and rotation is
    #     pure steady-state;
    # (c) 23 rotation slots from the oldest (r5-latest) verdicts in
    #     registration order; the 14 r5 entries left outside tie the
    #     newest r5 inside, which the oldest-first invariant allows.
    # ONE new registration this round (cap 3): q_jpeg_coeff_stats —
    # the baseline-JPEG entropy decoder (E5g), the round's
    # boundary-narrowing capability; never-checked, so it must hold a
    # slot and displaces the newest r5 rotation entry (q_stream_resume,
    # which ties the r5 entries left outside — allowed).
    # --- (a) changed-path (4) + new (1) ---
    "q_jpeg_coeff_stats",
    "q_bloom_decontaminate",
    "q_minhash_neardup",
    "q_neardup_recall",
    "q_png_pixel_stats",
    # --- (b) r4-latest cohort, all 22 ---
    "q_rate_5m",
    "q_error_ratio",
    "q_quantiles",
    "q_hll_error_bound",
    "q_alert_liveness",
    "q_prom_quantile",
    "q_rate_per_op",
    "q_increase_1h",
    "q_date_histogram",
    "q_topk_recent",
    "q_order_priority",
    "q_supplier_parts",
    "q_disjunctive_revenue",
    "q_embedding_neardup",
    "q_frame_sample",
    "q_multimodal_features",
    "q_cosine_pairs",
    "q_vocab_growth",
    "q_zorder_layout",
    "q_embedding_norm_hist",
    "q_udaf_median",
    "q_udtf_explode",
    # --- (c) oldest r5-latest entries (23 of 37) ---
    "q_approx_quantile_bound",
    "q_funnel_stages",
    "q_time_weighted_avg",
    "q_anomaly_mad",
    "q_metrics_exposition",
    "q_nation_profit",
    "q_late_shipments",
    "q_blocking_suppliers",
    "q_min_cost_supplier",
    "q_excess_suppliers",
    "q_cohort_retention",
    "q_sample_estimate_bound",
    "q_ivf_topk_trained",
    "q_ann_batch_ivf",
    "q_doc_chunks",
    "q_vocab_coverage",
    "q_embedding_gram",
    "q_semantic_dedup",
    "q_bpe_merges",
    "q_bpe_tokenize",
    "q_neardup_source_matrix",
    "q_pq_encode",
    "q_alert_rules_eval",
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
