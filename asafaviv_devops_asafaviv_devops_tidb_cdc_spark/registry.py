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
    # Round-12 window (50 slots), composed mechanically per
    # tests/test_freshness.py (scripts/freshness.py is the source of
    # truth; this list just pins its output):
    # (a) 3 never-checked new registrations (cap 3, fully used):
    #     q_warc_html_text (E37), q_warc_links (E38 link
    #     extraction + RFC 3986 resolution,
    #     urljoin-cross-validated), q_url_dedup (E39 URL
    #     canonicalization + census) —
    #     WARC -> visible-text extraction (the CC-WET stage; HTTP
    #     parse + quote-aware tag strip + entity decode, oracle
    #     re-hashes the SQL-reconstructed text);
    # (b) 28 changed-path entries: the r12 broadcast-hint audit
    #     (16 TPC-H-shape queries de-hinted + q_neardup_source_matrix
    #     + the six bounded-broadcast pragma sites), the shared
    #     inflate rewrite (fast-table Huffman decode: q_png_pixel_stats
    #     + q_warc_extract), the T.81 AC-SSSS bound
    #     (q_jpeg_coeff_stats/q_jpeg_color_stats), and the
    #     WARC-Concurrent-To repeatable-field fix (q_warc_extract);
    # (c) rotation = the ENTIRE remaining r6-latest cohort (10, which
    #     retires r6 completely) + the 11 oldest r7-latest entries in
    #     registration order; the r7 entries left outside tie the
    #     newest r7 inside, which the oldest-first invariant allows.
    "q_warc_html_text",
    "q_warc_links",
    "q_url_dedup",
    "q_ann_filtered",
    "q_big_orders",
    "q_curriculum",
    "q_disjunctive_revenue",
    "q_doc_search",
    "q_excess_suppliers",
    "q_heavy_hitters",
    "q_join_fk",
    "q_join_star",
    "q_jpeg_coeff_stats",
    "q_jpeg_color_stats",
    "q_knn_classify",
    "q_local_supplier_volume",
    "q_market_share",
    "q_min_cost_supplier",
    "q_nation_profit",
    "q_nation_volume",
    "q_neardup_source_matrix",
    "q_png_pixel_stats",
    "q_pq_encode",
    "q_pq_topk",
    "q_promo_share",
    "q_returned_items",
    "q_ship_priority",
    "q_small_qty_revenue",
    "q_supplier_parts",
    "q_top_supplier",
    "q_warc_extract",
    "q_pipeline_e2e",
    "q_alert_sustained",
    "q_log_ingest",
    "q_log_error_rate",
    "q_running_total",
    "q_shard_manifest",
    "q_sample_fixed",
    "q_sample_per_group",
    "q_text_embedding_stats",
    "q_source_gini",
    "q_sha2",
    "q_lsh_buckets",
    "q_fingerprint",
    "q_scrub_text",
    "q_props_json",
    "q_multimodal_meta",
    "q_media_chunks",
    "q_split_assign",
    "q_stratified_sample",
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
