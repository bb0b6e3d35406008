"""Similarity search over embedding columns (north-star E3):
brute-force cosine top-k as the exactness baseline, plus an
LSH-bucketed variant as the 100 TB scale path.

All vector math is built-in higher-order SQL (zip_with + sequential
aggregate fold — deterministic summation order), no UDFs.

Scale posture: brute force broadcasts the query vector(s) and is one
map + top-k reduce — fine for one query over any corpus size.
For query-batch × corpus workloads, ``lsh_buckets`` pre-partitions by
random-hyperplane sign bits so candidate generation is a bucket
equi-join instead of a cross join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from ..sources.tables import rebalance


def _topk_ranked(scored: DataFrame, id_col: str, k: int) -> DataFrame:
    """Global top-k of ``scored(cos_raw, id)`` WITHOUT a global sort:
    ``orderBy().limit(k)`` plans as TakeOrderedAndProject — each task
    keeps its local top-k and the driver merges k rows per partition —
    instead of a single-partition Window sort of the whole corpus
    (the scale-killer flagged in round 1). rank is derived afterwards
    with a row_number over the surviving k rows only.

    cosine is emitted as exact integer 1e-4 units
    (``floor(cos * 10000 + 0.5)`` — pure IEEE ops, identical in any
    engine given identical cos) rather than ``round(x, 4)``, whose
    tie-breaking algorithm differs between engines."""
    top = scored.orderBy(F.col("cos_raw").desc(), F.col(id_col)).limit(k)
    w = Window.orderBy(F.col("cos_raw").desc(), F.col(id_col))
    return top.withColumn("rank", F.row_number().over(w)).select(
        id_col,
        F.floor(F.col("cos_raw") * 10000 + 0.5).cast("long").alias("cosine_x10k"),
        "rank",
    )


def _fold_sum(expr: str) -> str:
    # aggregate() folds left-to-right — a fixed summation order, which
    # cross-engine comparisons need (groupBy(sum) would be partition-
    # order-dependent)
    return f"aggregate({expr}, CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"


def dot(a: str, b: str) -> Column:
    return F.expr(_fold_sum(f"zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE))"))


def sq_norm(a: str) -> Column:
    return F.expr(_fold_sum(f"transform({a}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))"))


def cosine(a: str, b: str) -> Column:
    return dot(a, b) / F.sqrt(sq_norm(a) * sq_norm(b))


def brute_force_topk(
    corpus: DataFrame,
    query_vec_id: int,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k of one corpus vector against the rest.
    The 1-row query side is broadcast; the global top-k is
    TakeOrderedAndProject (per-partition top-k + driver merge of
    k x partitions rows — see ``_topk_ranked``), never a
    single-partition Window sort."""
    q = corpus.filter(F.col(id_col) == query_vec_id).select(
        F.col(vec_col).alias("qv")
    )
    scored = (
        rebalance(corpus.filter(F.col(id_col) != query_vec_id))
        .crossJoin(F.broadcast(q))
        .select(
            id_col,
            cosine(vec_col, "qv").alias("cos_raw"),
        )
    )
    return _topk_ranked(scored, id_col, k)


def lsh_buckets(
    df: DataFrame,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """Random-hyperplane LSH bucket id per vector. Hyperplanes are
    derived deterministically from sha2 of (plane, component) — no
    RNG state, reproducible across runs/engines. Vectors in the same
    bucket are cosine-similar with high probability; ANN search joins
    query buckets to corpus buckets instead of cross-joining."""
    bits = []
    for p in range(n_planes):
        # pseudo-random ±1 plane component from a stable hash
        plane = (
            f"transform(sequence(0, {dim - 1}), "
            f"j -> CASE WHEN substring(sha2(concat('{p}_', CAST(j AS STRING)), 256), 1, 1) < '8' "
            f"THEN 1.0D ELSE -1.0D END)"
        )
        proj = _fold_sum(
            f"zip_with({vec_col}, {plane}, (x, y) -> CAST(x AS DOUBLE) * y)"
        )
        bits.append(f"CASE WHEN {proj} >= 0 THEN '1' ELSE '0' END")
    bucket = F.expr("concat(" + ", ".join(bits) + ")")
    return rebalance(df).select(F.col(id_col), F.col(vec_col), bucket.alias("bucket"))


def ivf_topk(
    corpus: DataFrame,
    query_vec_id: int,
    k: int = 10,
    centroid_mod: int = 50,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: partition the corpus into
    cells around deterministic centroids (every ``centroid_mod``-th
    vector — RNG-free stand-in for k-means; ``ivf_topk_trained`` takes
    real trained centroids), then search only the query's ``nprobe``
    nearest cells.

    Scale posture: centroids are a tiny broadcast side; assignment is a
    map stage (corpus × broadcast-centroids, rank-1 filter). The probed
    search touches ~nprobe/n_cells of the corpus instead of all of it —
    the standard ANN scale path when brute force stops fitting the
    latency budget. Cell id is a natural partition/bucket key for a
    100 TB vector table, so repeated queries prune at the scan."""
    cents = corpus.filter(F.col(id_col) % centroid_mod == 0).select(
        F.col(id_col).alias("cid"), F.col(vec_col).alias("cv")
    )
    return _ivf_probe(corpus, cents, query_vec_id, k, nprobe, id_col, vec_col)


def ivf_topk_trained(
    corpus: DataFrame,
    centroids: DataFrame,
    query_vec_id: int,
    k: int = 10,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF top-k over EXTERNALLY TRAINED centroids — ``centroids`` is a
    (cid long, cv array<double>) frame, e.g. the recentered means of
    k-means Lloyd steps (queries/corpus_ops.py::q_kmeans_iter produces
    exactly the (cluster, dim, mean) cells to assemble it). The probe
    plan is identical to ``ivf_topk``; only the cell geometry improves:
    trained cells follow the data distribution, so the same nprobe
    budget recovers more of the true neighborhood."""
    return _ivf_probe(
        corpus,
        centroids.select("cid", "cv"),
        query_vec_id,
        k,
        nprobe,
        id_col,
        vec_col,
    )


def ivf_assignment(
    corpus: DataFrame,
    cents: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The IVF INDEX BUILD: assign every corpus vector to its nearest
    centroid by cosine (ties to the smaller cid) -> (id, vec, cid).
    One map pass over the corpus against broadcast centroids. At scale
    this output is a materialized, cid-partitioned artifact
    (sources/ann_store.py) — built once per corpus version, probed by
    every query after — not something a serving query recomputes."""
    scored_cells = rebalance(corpus).crossJoin(F.broadcast(cents)).select(
        id_col,
        vec_col,
        "cid",
        cosine(vec_col, "cv").alias("ccos"),
    )
    w_assign = Window.partitionBy(id_col).orderBy(
        F.col("ccos").desc(), F.col("cid")
    )
    return (
        scored_cells.withColumn("_rn", F.row_number().over(w_assign))
        .filter(F.col("_rn") == 1)
        .select(id_col, vec_col, "cid")
    )


def probe_cell_ids(
    cents: DataFrame, qv_df: DataFrame, nprobe: int
) -> list:
    """The query's ``nprobe`` nearest cells, as a plain list of cell
    ids. Deliberately a driver-side scalar action (nprobe ints from a
    centroid-count-sized frame): a LITERAL cid filter is what lets the
    cell-partitioned index prune at the scan (static PartitionFilters)
    instead of reading every cell and filtering after — the serving
    property the IVF layout exists for."""
    rows = (
        qv_df.crossJoin(cents)
        .select("cid", cosine("qv", "cv").alias("qcos"))
        .orderBy(F.col("qcos").desc(), F.col("cid"))
        .limit(nprobe)
        .select("cid")
        .collect()
    )
    return [r["cid"] for r in rows]


def ivf_probe_assigned(
    assigned: DataFrame,
    cents: DataFrame,
    qv_df: DataFrame,
    query_vec_id: int,
    k: int = 10,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The IVF PROBE over a (possibly materialized) assignment: score
    only the vectors in the query's ``nprobe`` nearest cells. The cid
    filter is a literal IN-list, so a cid-partitioned index scan
    prunes to the probed cells; the query vector rides a 1-row
    broadcast."""
    cids = probe_cell_ids(cents, qv_df, nprobe)
    scored = (
        assigned.filter(F.col("cid").isin(cids))
        .filter(F.col(id_col) != query_vec_id)
        .crossJoin(F.broadcast(qv_df))
        .select(id_col, cosine(vec_col, "qv").alias("cos_raw"))
    )
    return _topk_ranked(scored, id_col, k)


def _ivf_probe(
    corpus: DataFrame,
    cents: DataFrame,
    query_vec_id: int,
    k: int,
    nprobe: int,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """One-shot build + probe (no materialization) — the shape for an
    ad-hoc query; serving paths go through sources/ann_store.py."""
    assigned = ivf_assignment(corpus, cents, id_col, vec_col)
    qv_df = (
        corpus.filter(F.col(id_col) == query_vec_id)
        .select(F.col(vec_col).alias("qv"))
    )
    return ivf_probe_assigned(
        assigned, cents, qv_df, query_vec_id, k, nprobe, id_col, vec_col
    )


def cosine_pairs_pd(a_col: str, b_col: str):
    """Arrow-batched cosine over two dense-vector columns: one numpy
    einsum per batch instead of an interpreted lambda per element.
    Same formula as ``cosine`` (raw dot / sqrt(nsq_a * nsq_b))."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _cos(va, vb):
        import numpy as np
        import pandas as pd

        if not len(va):
            return pd.Series([], dtype="float64")
        A = np.stack([np.asarray(v, dtype=np.float64) for v in va])
        B = np.stack([np.asarray(v, dtype=np.float64) for v in vb])
        num = np.einsum("ij,ij->i", A, B)
        den = np.sqrt(
            np.einsum("ij,ij->i", A, A) * np.einsum("ij,ij->i", B, B)
        )
        return pd.Series(num / den)

    return _cos(a_col, b_col)


def allpairs_cosine_x10k(
    corpus: DataFrame,
    threshold_x10k: int = 3000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_blocks: int = 8,
) -> DataFrame:
    """Exact all-pairs cosine >= threshold, Arrow-vectorized and fully
    distributed: BOTH sides are blocked by a hash of the id and every
    block PAIR is scored independently by an ``applyInPandas`` group.

    Dense vector math is the one place where built-in higher-order
    functions lose by orders of magnitude: ``aggregate(zip_with(...))``
    evaluates an interpreted lambda per element (measured 74 s for
    2 000 x 2 000 x 64-dim at sf0.1), while a numpy matmul over the same
    data is milliseconds. Earlier rounds broadcast one whole side from
    the driver; that caps the corpus at driver memory. This form never
    materializes anything on the driver:

    - each row lands in block ``b = xxhash64(id) mod n_blocks``;
    - each row is replicated to the ``n_blocks`` unordered block pairs
      it participates in (pair key = (min(b, j), max(b, j)));
    - ``groupBy(pair).applyInPandas`` scores each pair with one int64
      ``A @ B.T`` per group. n_blocks*(n_blocks+1)/2 independent tasks;
      per-task memory is 2/n_blocks of the corpus, so n_blocks scales
      the shape to any corpus the CLUSTER holds (pick
      n_blocks ~ corpus_bytes / executor_budget).

    Total work is O(n^2) either way — this is the exhaustive ground
    truth; near-linear corpus-scale near-dup goes through the LSH
    bucket path instead. Components are quantized to exact integer
    micro-units before any summation (int64 matmul accumulation is
    exact, so dot/norm values cannot depend on BLAS blocking/FMA order;
    the remaining float ops — one divide, one sqrt, one multiply, one
    floor — are single IEEE operations, bit-identical in any engine).
    """
    blocked = corpus.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).alias("_vec"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_blocks)).cast("int").alias("_blk"),
    )
    # replicate each row to every block pair it joins: row in block b
    # meets block j in the unordered pair (min(b,j), max(b,j)); j == b
    # contributes the diagonal pair exactly once
    pairs = blocked.select(
        "_id",
        "_vec",
        "_blk",
        F.explode(F.sequence(F.lit(0), F.lit(n_blocks - 1))).alias("_other"),
    ).select(
        "_id",
        "_vec",
        "_blk",
        F.least("_blk", "_other").alias("_pi"),
        F.greatest("_blk", "_other").alias("_pj"),
    )

    def score_pair(key, pdf):
        import numpy as np
        import pandas as pd

        empty = pd.DataFrame(
            {
                "id_a": pd.Series([], dtype="int64"),
                "id_b": pd.Series([], dtype="int64"),
                "cosine_x10k": pd.Series([], dtype="int64"),
            }
        )
        if not len(pdf):
            return empty
        pi, pj = int(key[0]), int(key[1])
        ids = pdf["_id"].to_numpy(dtype=np.int64)
        blks = pdf["_blk"].to_numpy()
        # components -> exact integer micro-units BEFORE any summation
        mat = np.floor(
            np.stack([np.asarray(v, dtype=np.float64) for v in pdf["_vec"]])
            * 1_000_000
            + 0.5
        ).astype(np.int64)
        if pi == pj:
            a_ids, b_ids, A, B = ids, ids, mat, mat
        else:
            am, bm = blks == pi, blks == pj
            a_ids, b_ids, A, B = ids[am], ids[bm], mat[am], mat[bm]
        if not len(a_ids) or not len(b_ids):
            return empty
        nsq_a = np.einsum("ij,ij->i", A, A)  # int64, exact
        nsq_b = np.einsum("ij,ij->i", B, B)
        dot_ab = (A @ B.T).astype(np.float64)  # exact ints < 2^53
        cos = dot_ab / np.sqrt(
            np.outer(nsq_a.astype(np.float64), nsq_b.astype(np.float64))
        )
        x10k = np.floor(cos * 10000 + 0.5)
        if pi == pj:
            # upper triangle of the self-pair block
            keep = (x10k >= threshold_x10k) & (b_ids[None, :] > a_ids[:, None])
            ii, jj = np.nonzero(keep)
            ida, idb = a_ids[ii], b_ids[jj]
        else:
            # cross-block: each unordered id pair appears exactly once
            # in this group; normalize to id_a < id_b (cosine symmetric)
            ii, jj = np.nonzero(x10k >= threshold_x10k)
            ida = np.minimum(a_ids[ii], b_ids[jj])
            idb = np.maximum(a_ids[ii], b_ids[jj])
        return pd.DataFrame(
            {
                "id_a": ida,
                "id_b": idb,
                "cosine_x10k": x10k[ii, jj].astype(np.int64),
            }
        )

    return pairs.groupBy("_pi", "_pj").applyInPandas(
        score_pair, "id_a long, id_b long, cosine_x10k long"
    )


def planted_neardup_pairs(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.99,
) -> DataFrame:
    """Embedding near-dup detection: pairs with cosine above threshold.
    Bucketed pre-filter (LSH) then exact verify — here corpus already
    includes whatever duplicates exist; at test scale the driver data
    is random, so callers plant scaled copies to exercise the path."""
    lhs = lsh_buckets(corpus, id_col=id_col, vec_col=vec_col)
    a = lhs.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"), "bucket"
    )
    b = lhs.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"), "bucket"
    )
    cand = a.join(b, "bucket").filter(F.col("id_a") < F.col("id_b"))
    # verify with the Arrow-vectorized cosine: candidate pairs carry
    # both dense vectors, and a batched numpy einsum beats the
    # interpreted per-element fold by ~10-100x on the exact-verify
    # stage (the LSH pre-filter keeps the pair count near-linear, so
    # this stage is small — but it sat at 15 s at sf0.1 interpreted)
    return (
        cand.withColumn("cos_raw", cosine_pairs_pd("va", "vb"))
        .filter(F.col("cos_raw") > threshold)
        .select("id_a", "id_b", F.round("cos_raw", 4).alias("cosine"))
    )


def batch_topk(
    corpus: DataFrame,
    query_ids: list[int],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Query-BATCH exact top-k: N query vectors against the corpus in
    one pass. The query side (N rows + precomputed norms) broadcasts;
    every corpus partition scores all N queries locally; ranking is a
    row_number over a window PARTITIONED BY query id — each query's
    top-k sorts independently in parallel (contrast q_cosine_topk's
    single-query global top-k, which must be TakeOrderedAndProject).
    This is the production ANN shape: queries arrive in batches, and
    per-query parallelism comes from the partitioned window."""
    q = corpus.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        sq_norm(vec_col).alias("nq"),
    )
    scored = (
        rebalance(corpus)
        .select(id_col, vec_col, sq_norm(vec_col).alias("nv"))
        .crossJoin(F.broadcast(q))
        .filter(F.col(id_col) != F.col("query_id"))
        .select(
            "query_id",
            id_col,
            (dot(vec_col, "qv") / F.sqrt(F.col("nv") * F.col("nq"))).alias("cos_raw"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_raw").desc(), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            id_col,
            F.floor(F.col("cos_raw") * 10000 + 0.5).cast("long").alias("cosine_x10k"),
            "rank",
        )
    )


def batch_ivf_probe(
    assigned: DataFrame,
    cents: DataFrame,
    queries_df: DataFrame,
    k: int = 5,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Query-BATCH probe of a materialized IVF index: N query vectors
    resolve their probe cells in one tiny broadcast pass, the UNION of
    probed cells (<= N x nprobe literal ids, one scalar collect) prunes
    the cid-partitioned index scan, and candidates score + rank with a
    per-query partitioned window. ONE index scan serves the whole
    batch — the production ANN serving shape at any corpus size."""
    qcells = queries_df.crossJoin(F.broadcast(cents)).select(
        "query_id", "qv", "cid", cosine("qv", "cv").alias("qcos")
    )
    wq = Window.partitionBy("query_id").orderBy(
        F.col("qcos").desc(), F.col("cid")
    )
    probe = (
        qcells.withColumn("_prn", F.row_number().over(wq))
        .filter(F.col("_prn") <= nprobe)
        .select("query_id", "qv", "cid")
    )
    cids = sorted(
        r["cid"] for r in probe.select("cid").distinct().collect()
    )
    scored = (
        assigned.filter(F.col("cid").isin(cids))
        .join(F.broadcast(probe), "cid")
        .filter(F.col(id_col) != F.col("query_id"))
        .select("query_id", id_col, cosine(vec_col, "qv").alias("cos_raw"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_raw").desc(), F.col(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            id_col,
            F.floor(F.col("cos_raw") * 10000 + 0.5)
            .cast("long")
            .alias("cosine_x10k"),
            "rank",
        )
    )
