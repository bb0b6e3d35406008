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
    # Round-11 window (50 slots), composed mechanically per
    # tests/test_freshness.py:
    # (a) 3 never-checked new registrations (cap 3, fully used):
    #     q_jpeg_color_stats — multi-component YCbCr baseline-JPEG
    #     entropy decode (E5g color, r10 verdict item 2);
    #     q_jpeg_progressive_stats — progressive (SOF2) multi-scan
    #     entropy decode (E5i, the encoding most real-world web
    #     JPEGs use; narrows the codec boundary to arithmetic/
    #     hierarchical/12-bit JPEG + MP3/video); and
    #     q_warc_extract — WARC/Common-Crawl .warc.gz ingest (E36:
    #     per-record gzip members split + inflated in-engine over
    #     the shared _inflate_raw core, ISO 28500 record walk — the
    #     first stage of a real 100 TB web-corpus pipeline);
    # (b) 4 changed-path entries (scripts/freshness.py vs the
    #     verdict-round markers): q_jpeg_coeff_stats +
    #     q_png_pixel_stats (shared decoder/inflate edits: color
    #     routing, RFC 1951/1950 strictness — r10 advice) and
    #     q_basket_pairs + q_dedup_yield_by_source (broadcast-hint
    #     audit, r10 verdict item 4: hints dropped on frames whose
    #     bound grows with scale factor);
    # (c) rotation = the ENTIRE r5-latest cohort (13) + the 30
    #     oldest r6-latest entries in registration order — this
    #     window retires the r5 cohort completely; the 13 r6
    #     entries left outside tie the newest r6 inside, which the
    #     oldest-first invariant allows.
    # --- (a) new (3) + (b) changed-path (4) ---
    "q_jpeg_color_stats",
    "q_jpeg_progressive_stats",
    "q_warc_extract",
    "q_jpeg_coeff_stats",
    "q_png_pixel_stats",
    "q_basket_pairs",
    "q_dedup_yield_by_source",
    # --- (c) rotation: the r5-latest cohort (13) + the 30 oldest
    # r6-latest entries (the second and third new registrations
    # displaced q_pq_topk and q_pipeline_e2e, r6 ties with the r6
    # entries already outside) ---
    "q_stream_resume",
    "q_dq_checks",
    "q_event_drift",
    "q_events_format_parity",
    "q_snapshot_roundtrip",
    "q_retention_sweep",
    "q_bucketed_join",
    "q_weighted_mix",
    "q_delta_join",
    "q_curriculum",
    "q_containment",
    "q_mix_epochs",
    "q_link_rank",
    # --- oldest r6-latest entries (30 of 43) ---
    "q_old_image",
    "q_typed_cast",
    "q_filter_cmp",
    "q_arith_update",
    "q_join_fk",
    "q_join_star",
    "q_cdc_replay",
    "q_union_variants",
    "q_except_deleted",
    "q_snapshot_diff",
    "q_ops_pivot",
    "q_session_windows",
    "q_pricing_summary",
    "q_ship_priority",
    "q_local_supplier_volume",
    "q_returned_items",
    "q_promo_share",
    "q_top_supplier",
    "q_dedup_exact",
    "q_simhash",
    "q_simhash_neardup",
    "q_ngram_jaccard",
    "q_neardup_clusters",
    "q_cosine_topk",
    "q_ivf_topk",
    "q_text_stats",
    "q_token_count",
    "q_lang_id",
    "q_quality_score",
    "q_repetition_ratio",
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
