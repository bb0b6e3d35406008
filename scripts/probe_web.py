"""Decompose the q_web_corpus_e2e cold path stage by stage (r16 item 3).
Fresh artifact roots assumed. Diagnostic only.
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from asafaviv_devops_asafaviv_devops_tidb_cdc_spark import registry  # noqa: E402
from asafaviv_devops_asafaviv_devops_tidb_cdc_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def t(label, fn):
    t0 = time.perf_counter()
    r = fn()
    print(f"# {label}: {time.perf_counter() - t0:.3f}s", flush=True)
    return r


def main() -> None:
    registry.load_all()
    spark = get_spark("probe_web")
    registry.QUERIES["q_ops_by_table_op"](spark, SF_DIR).count()
    spark.range(spark.sparkContext.defaultParallelism).repartition(
        spark.sparkContext.defaultParallelism
    ).mapInPandas(lambda it: it, "id long").count()
    spark.catalog.clearCache()

    from asafaviv_devops_asafaviv_devops_tidb_cdc_spark.functions import (
        html_text as HT,
        text as TX,
    )
    from asafaviv_devops_asafaviv_devops_tidb_cdc_spark.functions.dedup import (
        exact_dedup,
        neardup_clusters,
        ngram_jaccard_pairs,
    )
    from asafaviv_devops_asafaviv_devops_tidb_cdc_spark.sources.cluster_store import (
        web_staged_corpus,
    )
    from asafaviv_devops_asafaviv_devops_tidb_cdc_spark.sources.tables import load_table

    ids = load_table(spark, SF_DIR, "documents").select(
        F.col("doc_id").alias("media_id")
    )
    t("walk_single_leg (synth+extract)", lambda: HT.main_content_text(
        HT.synth_warc_html_payloads(ids)
    ).count())
    t("staged_corpus (4-leg union)", lambda: web_staged_corpus(spark, SF_DIR).count())
    qual = (
        TX.with_quality_metrics(web_staged_corpus(spark, SF_DIR))
        .filter("keep")
        .select("doc_id", "text")
    )
    t("quality_gate over staged", lambda: qual.count())
    ded = exact_dedup(qual)
    t("exact_dedup over gate", lambda: ded.count())
    pairs = ngram_jaccard_pairs(ded)
    t("ngram_jaccard_pairs", lambda: pairs.count())
    t("neardup_clusters (CC)", lambda: neardup_clusters(pairs).count())
    spark.catalog.clearCache()
    t("q_web_corpus_e2e cold (artifact build incl.)",
      lambda: registry.QUERIES["q_web_corpus_e2e"](spark, SF_DIR).count())
    spark.catalog.clearCache()
    t("q_web_corpus_e2e warm",
      lambda: registry.QUERIES["q_web_corpus_e2e"](spark, SF_DIR).count())


if __name__ == "__main__":
    main()
