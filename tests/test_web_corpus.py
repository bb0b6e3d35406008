"""E46/E47 — the web->corpus bridge and takedown propagation:
extraction differential (text vs stats md5), stage-funnel
load-bearing checks, single-walk plan shape, and the
rebuild-not-filter purge semantics."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from asafaviv_devops_asafaviv_devops_tidb_cdc_spark import registry
from asafaviv_devops_asafaviv_devops_tidb_cdc_spark.functions import (
    html_text as HT,
)
from asafaviv_devops_asafaviv_devops_tidb_cdc_spark.sources import (
    takedown as TD,
)

from tests.conftest import SF_SMOKE

registry.load_all()


def _payloads(spark):
    from asafaviv_devops_asafaviv_devops_tidb_cdc_spark.sources import (
        load_table,
    )

    ids = load_table(spark, SF_SMOKE, "documents").select(
        F.col("doc_id").alias("media_id")
    )
    return HT.synth_warc_html_payloads(ids)


def test_main_content_text_matches_stats_md5(spark):
    """main_content_text (the corpus-bridge variant) must emit exactly
    the text main_content_stats hashed: same pages, same keep rule,
    md5-for-md5 — the two walks can never drift."""
    media = _payloads(spark)
    stats = {
        (r["media_id"], r["r"]): r["main_md5"]
        for r in HT.main_content_stats(media).collect()
    }
    texts = HT.main_content_text(media).collect()
    assert len(texts) == len(stats)
    import hashlib

    for row in texts:
        want = stats[(row["media_id"], row["r"])]
        assert hashlib.md5(row["text"].encode("utf-8")).hexdigest() == want


def test_web_corpus_funnel_every_stage_drops(spark):
    """Each pipeline stage must actually remove its planted class:
    post-gate < staged corpus (truncated fetches die), post-exact <
    post-gate (verbatim re-crawls die), final < post-exact (mutants
    die at the canonical filter)."""
    rows = registry.QUERIES["q_web_corpus_e2e"](spark, SF_SMOKE).collect()
    assert len(rows) == 10  # every host bucket populated
    n_pages = sum(r["n_pages"] for r in rows)
    n_exact = sum(r["n_exact"] for r in rows)
    n_docs = sum(r["n_docs"] for r in rows)
    from asafaviv_devops_asafaviv_devops_tidb_cdc_spark.sources.cluster_store import (
        web_staged_corpus,
    )

    staged = web_staged_corpus(spark, SF_SMOKE).count()
    assert staged > n_pages > n_exact > n_docs > 0


def test_web_corpus_plan_walks_archive_once(spark):
    """Every Arrow archive walk (MapInPandas) in the executed plan
    must sit inside a cached subtree: the staged corpus persists once
    and the gate/dedup/census consumers all read the cache — an
    uncached MapInPandas means some consumer re-walks the corpus
    (the q_crawl_frontier r14 plan-audit failure mode). The artifact
    parquet scan (web_clusters) is legitimately uncached."""
    df = registry.QUERIES["q_web_corpus_e2e"](spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    in_mem_depth = None
    uncached_walks = 0
    for ln in plan.splitlines():
        m = re.search(r"\+- (\w[\w ]*?\w) ?\(", ln)
        if not m:
            continue
        indent = len(ln) - len(ln.lstrip(" :+-"))
        op = m.group(1)
        if in_mem_depth is not None and indent <= in_mem_depth:
            in_mem_depth = None
        if op == "InMemoryRelation" and in_mem_depth is None:
            in_mem_depth = indent
        if op == "MapInPandas" and in_mem_depth is None:
            uncached_walks += 1
    assert uncached_walks == 0, plan[:3000]


def test_takedown_artifacts_free_of_purged_docs(spark):
    """Every certification row must report zero purged references and
    cover all three artifacts."""
    rows = {
        r["artifact"]: r
        for r in registry.QUERIES["q_takedown_propagation"](
            spark, SF_SMOKE
        ).collect()
    }
    assert set(rows) == {"clusters", "ivf_cells", "shards"}
    for name, r in rows.items():
        assert r["n_purged"] == 0, name
        assert r["n_rows"] > 0, name


def test_takedown_is_rebuild_not_filter(spark):
    """Filtering the OLD cluster table by raw doc_id would keep
    planted derivatives of purged docs (doc 1000000 is the verbatim
    copy of purged doc 0, and 1000000 % 37 != 0) and rows whose
    cluster_id names a purged canonical — the rebuilt table has
    neither. This pins WHY takedown.py rebuilds from the purged
    source instead of filtering the committed artifact."""
    from asafaviv_devops_asafaviv_devops_tidb_cdc_spark.sources.cluster_store import (
        neardup_cluster_table,
    )

    naive = (
        neardup_cluster_table(spark, SF_SMOKE)
        .filter(F.col("doc_id") % TD.PURGE_MOD != 0)
        .filter(
            (F.col("doc_id") % 1_000_000 % TD.PURGE_MOD == 0)
            | (F.col("cluster_id") % 1_000_000 % TD.PURGE_MOD == 0)
        )
        .count()
    )
    assert naive > 0  # the naive filter leaks purged-derived rows
    rebuilt = (
        TD.takedown_cluster_table(spark, SF_SMOKE)
        .filter(
            (F.col("doc_id") % 1_000_000 % TD.PURGE_MOD == 0)
            | (F.col("cluster_id") % 1_000_000 % TD.PURGE_MOD == 0)
        )
        .count()
    )
    assert rebuilt == 0


def test_takedown_ivf_reseeds_centroids(spark):
    """vec 0 is both a purge victim and a mod50 centroid: the rebuilt
    assignment must not contain cid 0, and must cover exactly the
    surviving vectors."""
    from asafaviv_devops_asafaviv_devops_tidb_cdc_spark.sources import (
        load_table,
    )

    cells = TD.takedown_ivf_cells(spark, SF_SMOKE)
    assert cells.filter(F.col("cid") == 0).count() == 0
    survivors = (
        load_table(spark, SF_SMOKE, "embeddings")
        .filter(F.col("vec_id") % TD.PURGE_MOD != 0)
        .count()
    )
    assert cells.count() == survivors
