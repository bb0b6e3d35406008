"""Scale-stress harness (r7 verdict item 5): measure how the hottest
query families actually scale, instead of arguing from plan shape.

Synthesizes mult-x copies of the three driver-generated tables the
flagship families read — ``documents``, ``embeddings``, ``events`` —
by replicating sf0.1 with per-replica perturbations chosen so the
WORK scales linearly by construction:

* documents: per-replica alphabet rotation (``translate``) — an
  injective char map, so intra-replica shingle/near-dup structure is
  preserved exactly while nothing matches across replicas;
* embeddings: per-replica deterministic sign-flip of dimensions — an
  orthogonal transform, so intra-replica cosine geometry is exact and
  cross-replica vectors scatter;
* events: id/user shift — same time range, mult-x keys, so stream
  state and shuffle width grow mult-x.

Every replica dir is FRESH (new files, new artifact fingerprint), so
each measurement is a cold run including index/artifact builds — the
cost a first-time 100 TB run would pay. Runs each stress query at
mult 1/3/10, fits the scaling exponent alpha from t ~ c * n^alpha
(least squares over log-log), and writes STRESS_r08.json; BASELINE.md
cites the numbers.

Usage: python scripts/scale_stress.py [--mults 1,3,10] [--out FILE]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import shutil
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SRC_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
STRESS_ROOT = REPO / "spark-warehouse" / "scale_stress"
ID_STRIDE = 10**9  # far above any driver-generated id

# Flagship queries per family — each is blocking/banded/bucketed by
# design, so the MEASURED exponent should sit near 1.0 (near-dup pair
# emission is linear in pairs, which this perturbation keeps linear
# in replicas by construction).
STRESS_QUERIES = {
    "neardup": [
        "q_dedup_exact",
        "q_minhash_neardup",
        "q_simhash_neardup",
        "q_neardup_clusters",
        "q_cluster_sizes",
        "q_edit_neardup",
    ],
    "ann": [
        "q_ann_batch",
        "q_ivf_topk",
        "q_pq_topk",
        "q_ann_batch_ivf",
    ],
    "stream_state": [
        "q_stream_window_counts",
        "q_stream_join_view",
        "q_stream_dedupe",
    ],
    # the composed flagship + the inverted-index and broadcast-probe
    # families — the end-to-end numbers a pipeline operator sizes by
    "pipeline": [
        "q_pipeline_e2e",
    ],
    "search": [
        "q_bm25_search",
        "q_phrase_search",
    ],
    "decontam": [
        "q_decontaminate",
        "q_bloom_decontaminate",
    ],
    # per-row Python decoders inside Arrow mapInPandas stages — the one
    # family whose cost is CPU-bound Python per media item, so the
    # exponent must be ~1.0 in media count and the per-image ms is the
    # number a 100 TB media pipeline sizes its executor fleet by
    # (r10 verdict item 6)
    # the crawl-to-corpus web family (r14): archive walk + host-graph
    # PageRank + sitemap discovery + robots gating composed — the
    # exponent must stay ~linear in page count because the host-side
    # state (rank, robots, sitemaps) is bounded by the mod-1000 host
    # namespace while pages multiply: a super-linear alpha here means
    # a host-keyed artifact accidentally scales with pages
    "web": [
        "q_url_dedup",
        "q_host_graph",
        "q_sitemap_census",
        "q_robots_policy",
        "q_main_content",
        "q_crawl_frontier",
        "q_web_corpus_e2e",
    ],
    "codec": [
        "q_bmp_pixel_stats",
        "q_png_pixel_stats",
        "q_jpeg_coeff_stats",
        "q_jpeg_color_stats",
        "q_jpeg_progressive_stats",
        "q_warc_extract",
        "q_warc_html_text",
    ],
}

ALPHABET = "abcdefghijklmnopqrstuvwxyz"

# --skew mode: the queries whose state/shuffle is keyed by events'
# user_id — the surfaces a hot key actually stresses
SKEW_QUERIES = {
    "stream_state_skew": [
        "q_stream_window_counts",
        "q_stream_join_view",
        "q_stream_dedupe",
    ],
    "profiling_skew": [
        "q_key_skew",
    ],
    # batch joins over the skew-scaled orders fact (hot o_custkey):
    # the salted form vs the plain broadcast-FK form
    "join_skew": [
        "q_skew_salted_join",
        "q_join_fk",
    ],
}

# --doc-skew mode (r8 verdict item 5): the SAME un-rotated boilerplate
# suffix lands on half of every replica's documents, so a handful of
# word 3-grams appear in 50% of the WHOLE scaled corpus — the realistic
# corpus skew (site chrome, license footers). This is the adversarial
# input for every shingle/gram-keyed shuffle: the MinHash bucket cap +
# star reps, the boilerplate prevalence agg, and the Bloom gram build
# must all stay ~linear when one gram key owns half the rows.
DOC_SKEW_BOILERPLATE = (
    " subscribe to our newsletter terms of service all rights reserved"
)
DOC_SKEW_QUERIES = {
    "neardup_doc_skew": [
        "q_minhash_neardup",
    ],
    "grams_doc_skew": [
        "q_boilerplate_grams",
    ],
    "decontam_doc_skew": [
        "q_bloom_decontaminate",
    ],
}

# --host-skew mode (r14 verdict item 4): real crawls have hub hosts —
# a few domains own half the pages. Every EVEN doc_id is remapped to
# doc_id * 1000 (unique, and ≡ 0 mod 1000), so the synth host formula
# (media_id * 7 + r) % 1000 collapses half of ALL pages onto hosts
# site0/site1/site2.example (one per record index r), and the
# external-link targets of those pages collapse onto a handful of ext
# hosts too. This is the adversarial input for the (host, url) dedup
# shuffle (one host key owns half the rows), the per-host candidate
# census, and the politeness broadcast (which must stay O(hosts) —
# now FEWER distinct hosts — while the per-host row fan-in explodes).
HOST_SKEW_QUERIES = {
    "web_host_skew": [
        "q_url_dedup",
        "q_host_graph",
        "q_crawl_frontier",
        "q_web_corpus_e2e",
    ],
}


def build_scaled_dir(
    spark,
    mult: int,
    skew: bool = False,
    doc_skew: bool = False,
    host_skew: bool = False,
) -> str:
    """Materialize a mult-x dir next to spark-warehouse; symlink the
    seven unscaled TPC-H tables, replicate the three scaled ones.
    With ``skew=True`` a deterministic HALF of every replica's events
    (even event_id) collapse onto ONE global hot user, so at m10 a
    single key owns ~500 k rows — the adversarial distribution the
    co-bucketed maintainers and AQE skew handling must absorb.
    With ``doc_skew=True`` half of every replica's documents (even
    doc_id) get the SAME un-rotated boilerplate suffix, so its grams
    and shingles are shared by 50% of the whole scaled corpus.
    With ``host_skew=True`` every even doc_id maps to doc_id * 1000
    after the replica shift (unique: odd ids are never multiples of
    1000, and 1e3-scaled ids dwarf later replica ranges), so the web
    synth's mod-1000 host derivation lands HALF of all crawl pages on
    hosts site{0,1,2}.example — the hub-host distribution."""
    from pyspark.sql import functions as F

    # ALWAYS rebuild: reusing a previous run's dir would reuse its
    # parquet files, hence its artifact fingerprints, hence the
    # indexes/pair tables committed by that run — and the "cold"
    # column would silently measure the warm artifact-serve path.
    # Fresh files per run keep cold genuinely cold.
    suffix = (
        "_skew"
        if skew
        else "_docskew" if doc_skew else "_hostskew" if host_skew else ""
    )
    out = STRESS_ROOT / f"m{mult}{suffix}"
    shutil.rmtree(out, ignore_errors=True)
    out.mkdir(parents=True)
    tables = ["region", "nation", "customer", "supplier", "part", "lineitem"]
    if not skew:
        tables.append("orders")
    for t in tables:
        (out / f"{t}.parquet").symlink_to(f"{SRC_DIR}/{t}.parquet")

    if skew:
        # scale the orders FACT with a hot customer: half of every
        # replica's orders (even o_orderkey) point at customer 1, the
        # other half keep their ORIGINAL key — all keys stay inside
        # the unscaled dim's domain, so join semantics are unchanged
        # while one dim key fans out to ~half the fact
        ords = spark.read.parquet(f"{SRC_DIR}/orders.parquet")
        o_parts = []
        for k in range(mult):
            o_parts.append(
                ords.withColumn(
                    "o_orderkey", F.col("o_orderkey") + k * ID_STRIDE
                ).withColumn(
                    "o_custkey",
                    F.when(F.col("o_orderkey") % 2 == 0, F.lit(1)).otherwise(
                        F.col("o_custkey")
                    ),
                )
            )
        odf = o_parts[0]
        for p in o_parts[1:]:
            odf = odf.unionByName(p)
        odf.repartition(max(8, 4 * mult)).write.mode("overwrite").parquet(
            str(out / "orders.parquet")
        )

    docs = spark.read.parquet(f"{SRC_DIR}/documents.parquet")
    emb = spark.read.parquet(f"{SRC_DIR}/embeddings.parquet")
    ev = spark.read.parquet(f"{SRC_DIR}/events.parquet")
    dim = len(emb.select("embedding").first()[0])

    doc_parts = []
    emb_parts = []
    ev_parts = []
    for k in range(mult):
        rot = ALPHABET[k % 26:] + ALPHABET[: k % 26]
        rotated = F.translate(
            "text", ALPHABET + ALPHABET.upper(), rot + rot.upper()
        )
        shifted_doc = F.col("doc_id") + k * ID_STRIDE
        doc_parts.append(
            docs.select(
                (
                    # hub hosts: even ids land on media_id ≡ 0 mod 1000,
                    # collapsing their synth pages onto site{0,1,2}
                    F.when(
                        F.col("doc_id") % 2 == 0, shifted_doc * 1000
                    ).otherwise(shifted_doc)
                    if host_skew
                    else shifted_doc
                ).alias("doc_id"),
                (
                    # the boilerplate is appended AFTER rotation, so the
                    # identical grams recur across all replicas — one
                    # gram key owning half the whole corpus
                    F.when(
                        F.col("doc_id") % 2 == 0,
                        F.concat(rotated, F.lit(DOC_SKEW_BOILERPLATE)),
                    ).otherwise(rotated)
                    if doc_skew
                    else rotated
                ).alias("text"),
                "lang",
                "source",
                "n_chars",
            )
        )
        signs = [
            1.0 if ((k * 2654435761 + d * 40503) >> 3) % 2 == 0 else -1.0
            for d in range(dim)
        ]
        emb_parts.append(
            emb.select(
                (F.col("vec_id") + k * ID_STRIDE).alias("vec_id"),
                F.zip_with(
                    "embedding",
                    F.array(*[F.lit(s) for s in signs]),
                    lambda x, s: (x * s).cast("float"),
                ).alias("embedding"),
                "label",
            )
        )
        shifted_user = F.col("user_id") + k * ID_STRIDE
        ev_parts.append(
            ev.select(
                (F.col("event_id") + k * ID_STRIDE).alias("event_id"),
                "ts",
                (
                    # hot key -1: a sentinel OUTSIDE the id domain, so
                    # a legitimate user 0 in replica 0 (whose user_ids
                    # are unshifted) can never merge with the synthetic
                    # hot key and dilute the measured skew
                    F.when(F.col("event_id") % 2 == 0, F.lit(-1)).otherwise(
                        shifted_user
                    )
                    if skew
                    else shifted_user
                ).alias("user_id"),
                "event_type",
                "value",
                "props",
            )
        )

    def _union_all(parts):
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
        return df

    _union_all(doc_parts).repartition(max(4, 2 * mult)).write.mode(
        "overwrite"
    ).parquet(str(out / "documents.parquet"))
    _union_all(emb_parts).repartition(max(4, 2 * mult)).write.mode(
        "overwrite"
    ).parquet(str(out / "embeddings.parquet"))
    _union_all(ev_parts).repartition(max(8, 4 * mult)).write.mode(
        "overwrite"
    ).parquet(str(out / "events.parquet"))
    return str(out)


def fit_alpha(points: list[tuple[int, float]]) -> float | None:
    """Least-squares slope of log(t) vs log(n) — the scaling exponent."""
    pts = [(m, t) for m, t in points if t and t > 0]
    if len(pts) < 2:
        return None
    xs = [math.log(m) for m, _ in pts]
    ys = [math.log(t) for _, t in pts]
    n = len(pts)
    mx, my = sum(xs) / n, sum(ys) / n
    denom = sum((x - mx) ** 2 for x in xs)
    if denom == 0:
        return None
    return round(sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / denom, 3)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mults", default="1,3,10")
    ap.add_argument("--out", default=str(REPO / "STRESS_r08.json"))
    # --skew and --doc-skew each perturb the built corpus AND select a
    # query family; combining them would apply both perturbations while
    # running only SKEW_QUERIES and recording a conflated measurement
    # (r9 advice) — argparse rejects the combination outright
    mode = ap.add_mutually_exclusive_group()
    mode.add_argument(
        "--skew",
        action="store_true",
        help="collapse half of all events onto one hot user and run "
        "only the user_id-keyed queries",
    )
    mode.add_argument(
        "--doc-skew",
        action="store_true",
        help="append one un-rotated boilerplate suffix to half of all "
        "documents and run only the shingle/gram-keyed queries",
    )
    mode.add_argument(
        "--host-skew",
        action="store_true",
        help="remap even doc_ids so half of all crawl pages land on "
        "three hub hosts and run only the host-keyed web queries",
    )
    ap.add_argument(
        "--families",
        default=None,
        help="comma-separated family names to run (default: all in the "
        "selected mode) — re-measure one family after a targeted change "
        "without paying the full suite",
    )
    args = ap.parse_args()
    mults = [int(m) for m in args.mults.split(",")]
    queries_by_family = (
        SKEW_QUERIES
        if args.skew
        else (
            DOC_SKEW_QUERIES
            if args.doc_skew
            else HOST_SKEW_QUERIES if args.host_skew else STRESS_QUERIES
        )
    )
    if args.families:
        wanted = {f.strip() for f in args.families.split(",")}
        unknown = wanted - set(queries_by_family)
        if unknown:
            raise SystemExit(f"unknown families: {sorted(unknown)}")
        queries_by_family = {
            f: qs for f, qs in queries_by_family.items() if f in wanted
        }

    from asafaviv_devops_asafaviv_devops_tidb_cdc_spark import registry
    from asafaviv_devops_asafaviv_devops_tidb_cdc_spark.session import get_spark

    spark = get_spark("scale_stress")
    registry.load_all()

    dirs: dict[int, str] = {}
    build_secs: dict[int, float] = {}
    for m in mults:
        t0 = time.perf_counter()
        dirs[m] = build_scaled_dir(
            spark,
            m,
            skew=args.skew,
            doc_skew=args.doc_skew,
            host_skew=args.host_skew,
        )
        build_secs[m] = round(time.perf_counter() - t0, 2)
        print(f"built m{m} in {build_secs[m]}s -> {dirs[m]}", flush=True)

    # one warm-up pass so worker-pool fork / JIT costs don't land on
    # the first measured query (same rationale as bench.py)
    spark.range(spark.sparkContext.defaultParallelism).repartition(
        spark.sparkContext.defaultParallelism
    ).mapInPandas(lambda it: it, "id long").count()

    # Two runs per (query, mult): the COLD run pays one-time costs
    # (artifact/index build for this fingerprint, JIT of new code
    # paths) — the first-run cost a fresh corpus pays; the WARM run
    # reuses committed artifacts and measures the steady-state query
    # work, which is what must scale ~linearly for the 100 TB
    # argument. Resumable streams are the exception: their warm rerun
    # short-circuits on the checkpoint (measuring the no-new-data
    # path), so their exponent is read from the cold column.
    results: dict[str, dict] = {}
    for family, qnames in queries_by_family.items():
        for qname in qnames:
            fn = registry.QUERIES[qname]
            cold: dict[str, float] = {}
            warm: dict[str, float] = {}
            rows: dict[str, int] = {}
            for m in mults:
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                n = fn(spark, dirs[m]).count()
                cold[f"m{m}"] = round(time.perf_counter() - t0, 2)
                t0 = time.perf_counter()
                fn(spark, dirs[m]).count()
                warm[f"m{m}"] = round(time.perf_counter() - t0, 2)
                rows[f"m{m}"] = n
                print(
                    f"{qname} m{m}: cold {cold[f'm{m}']}s / warm "
                    f"{warm[f'm{m}']}s ({n} rows)",
                    flush=True,
                )
            results[qname] = {
                "family": family,
                "cold_secs": cold,
                "warm_secs": warm,
                "rows": rows,
                "alpha_cold": fit_alpha([(m, cold[f"m{m}"]) for m in mults]),
                "alpha_warm": fit_alpha([(m, warm[f"m{m}"]) for m in mults]),
            }

    payload = {
        "src": SRC_DIR,
        "skew": args.skew,
        "doc_skew": args.doc_skew,
        "host_skew": args.host_skew,
        "mults": mults,
        "build_secs": build_secs,
        "cpus": os.environ.get("SPARK_GRAFT_CPUS", "32"),
        "queries": results,
    }
    Path(args.out).write_text(json.dumps(payload, indent=2) + "\n")
    print(json.dumps(
        {q: (r["alpha_warm"], r["alpha_cold"]) for q, r in results.items()}
    ))


if __name__ == "__main__":
    main()
