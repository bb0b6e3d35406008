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
    # Round-16 window (50 slots), composed mechanically per
    # tests/test_freshness.py (scripts/freshness.py is the source of
    # truth; this list just pins its output). At round start the
    # changed-path and never-checked sets are both EMPTY (the r15
    # driver verdict re-proved all 50 r15-window entries, including
    # every r15-touched path), so all 50 slots are rotation slots =
    # the 50 oldest verdicts: the 11 r9 window-capacity leftovers the
    # r15 recomposition documented, then 39 of the 40-query r10
    # cohort in prior iteration order (q_decay_engagement ties the
    # r10 round inside — window capacity, the invariant's only
    # allowed reason to stay out — and leads the r17 rotation).
    # NOTE: if an optimization this round changes a query's reference
    # closure, that query must displace rotation slots here (the
    # freshness tests enforce it) — recompose before round close.
    "q_embedding_stats",
    "q_ann_batch",
    "q_bigram_counts",
    "q_doc_len_histogram",
    "q_null_profile",
    "q_key_skew",
    "q_schema_drift",
    "q_pruned_scan",
    "q_vec_quantize",
    "q_delta_agg",
    "q_kmv_distinct",
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
    "q_approx_quantile_bound",
    "q_funnel_stages",
    "q_time_weighted_avg",
    "q_anomaly_mad",
    "q_metrics_exposition",
    "q_order_priority",
    "q_late_shipments",
    "q_blocking_suppliers",
    "q_cohort_retention",
    "q_sample_estimate_bound",
    "q_minhash_neardup",
    "q_embedding_neardup",
    "q_frame_sample",
    "q_multimodal_features",
    "q_cosine_pairs",
    "q_ivf_topk_trained",
    "q_ann_batch_ivf",
    "q_neardup_recall",
    "q_doc_chunks",
    "q_vocab_coverage",
    "q_embedding_gram",
    "q_semantic_dedup",
    "q_bpe_merges",
    "q_bpe_tokenize",
    "q_alert_rules_eval",
    "q_vocab_growth",
    "q_zorder_layout",
    "q_embedding_norm_hist",
    "q_bloom_decontaminate",
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
