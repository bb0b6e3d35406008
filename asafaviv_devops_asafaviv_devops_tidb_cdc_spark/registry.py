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
    # Round-15 window (50 slots), composed mechanically per
    # tests/test_freshness.py (scripts/freshness.py is the source of
    # truth; this list just pins its output):
    # (a) 2 never-checked new registrations (cap 3, 2 used):
    #     q_web_corpus_e2e (E46 web->corpus bridge: WET main content
    #     through the E6 quality/dedup pipeline),
    #     q_takedown_propagation (E47 compliance purge propagated
    #     through cluster/IVF/shard artifacts);
    # (b) 16 changed-path entries: q_url_dedup + q_crawl_frontier
    #     (canonical_url_col now the single shared canonicalization
    #     definition — r14 advice #2), q_jpeg_progressive_stats
    #     (duplicate-support-position corrupt guard — r14 advice #4),
    #     and the 13 queries whose derivations the r15 OPTIMIZATION
    #     round touched (all output-identical by interleaved A/B +
    #     sf0.01 parity, but a changed path must be driver-re-proven
    #     by invariant): the CC-artifact consumers (neardup_clusters
    #     init+domain fix), the scoped-domain graph compositions, the
    #     closure-seed tree queries, and the novelty/basket
    #     restructures — see OPTIMIZATION_r15.md;
    # (c) rotation = the r15 STALE DRAIN (r14 verdict order #1): the
    #     4 r8 window-capacity holdovers lead, then the first 28 of
    #     the 39-query r9 cohort in registration order — the last 11
    #     r9 entries tie the oldest-round-inside (window capacity)
    #     and lead the r16 rotation.
    "q_web_corpus_e2e",
    "q_takedown_propagation",
    "q_crawl_frontier",
    "q_jpeg_progressive_stats",
    "q_url_dedup",
    "q_basket_pairs",
    "q_canonical_pick",
    "q_cluster_leakage",
    "q_cluster_sizes",
    "q_dedup_yield_by_source",
    "q_hierarchy_depth",
    "q_host_graph",
    "q_label_prop",
    "q_link_rank",
    "q_neardup_clusters",
    "q_ngram_novelty",
    "q_pipeline_e2e",
    "q_subtree_rollup",
    "q_stream_doc_dedup",
    "q_compact_partials",
    "q_stream_sample",
    "q_stream_manifest",
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
    "q_hll_distinct",
    "q_order_count_dist",
    "q_sql_region_revenue",
    "q_forecast_revenue",
    "q_idle_rich_customers",
    "q_pii_scan",
    "q_term_stats",
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
