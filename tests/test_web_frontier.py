"""E43/E44/E45 — sitemap ingestion, crawl-frontier composition and the
streaming host-graph twin: parser differentials (stdlib
xml.etree as the reference), formula roundtrips, URL-canonicalizer
properties (idempotence + urllib differential — r13 advice item 6),
the JVM longest-match verdict vs the Python matcher, and the frontier
plan shape (broadcast politeness join)."""

from __future__ import annotations

import gzip
import re
import xml.etree.ElementTree as ET

import pytest
from hypothesis import given, settings, strategies as st

from asafaviv_devops_asafaviv_devops_tidb_cdc_spark import registry
from asafaviv_devops_asafaviv_devops_tidb_cdc_spark.functions import (
    robots as RB,
    sitemap as SM,
)

from tests.conftest import SF_SMOKE

registry.load_all()


# ---------------------------------------------------------------------------
# sitemap: formula roundtrip + ElementTree differential
# ---------------------------------------------------------------------------

HAZARD_IDS = list(range(0, 64)) + [105, 210, 420, 999, 1234, 45000]


def _fmt_priority(t):
    return None if t is None else ("1.0" if t == 10 else f"0.{t}")


def test_walk_matches_formula_entries():
    """The parsed tree must reproduce the formula entries exactly for
    every hazard combination (index/gzip/prefix/CDATA/padding rotate
    on different moduli, so 64 consecutive ids cover the cross
    product)."""
    for h in HAZARD_IDS:
        files = SM.build_sitemap_files(h)
        n_files, entries = SM.walk_sitemap(files["/sitemap.xml"], files.get)
        assert n_files == (3 if h % 5 == 0 else 1), h
        want = {
            (loc, lm, _fmt_priority(t))
            for loc, lm, t in SM.sitemap_entries(h)
        }
        assert {tuple(e) for e in entries} == want, h


def _et_entries(data: bytes):
    """Reference parse via stdlib ElementTree: local-name matching,
    whitespace trim — the independent implementation the hand scanner
    is differenced against."""
    if data[:2] == b"\x1f\x8b":
        data = gzip.decompress(data)
    root = ET.fromstring(data.decode("utf-8"))

    def local(tag):
        return tag.rsplit("}", 1)[-1].rsplit(":", 1)[-1].lower()

    kind = local(root.tag)
    out = []
    for entry in root:
        if local(entry.tag) not in ("url", "sitemap"):
            continue
        fields = {}
        for child in entry:
            name = local(child.tag)
            if name in ("loc", "lastmod", "priority"):
                fields[name] = (child.text or "").strip()
        out.append(
            (fields.get("loc"), fields.get("lastmod"), fields.get("priority"))
        )
    return kind, out


def test_parser_differential_vs_elementtree():
    for h in HAZARD_IDS:
        for path, data in SM.build_sitemap_files(h).items():
            kind, got = SM.parse_sitemap(data)
            ref_kind, ref = _et_entries(data)
            if kind == "index":
                assert ref_kind == "sitemapindex", (h, path)
                assert got == [loc for loc, _, _ in ref], (h, path)
            else:
                assert kind == "urlset" and ref_kind == "urlset", (h, path)
                assert [tuple(e) for e in got] == ref, (h, path)


def test_parser_degrades_on_garbage():
    assert SM.parse_sitemap(b"\x1f\x8bnot really gzip") == (None, [])
    assert SM.parse_sitemap(b"\xff\xfe binary junk") == (None, [])
    assert SM.parse_sitemap(b"<html><body>404</body></html>") == (None, [])
    # index pointing at a missing child: the child contributes nothing
    idx = (
        b'<?xml version="1.0"?><sitemapindex><sitemap>'
        b"<loc>http://h.example/gone.xml</loc></sitemap></sitemapindex>"
    )
    n_files, entries = SM.walk_sitemap(idx, lambda p: None)
    assert n_files == 1 and entries == []


def test_parser_ignores_extension_tags_and_nested_unknowns():
    xml = (
        b'<?xml version="1.0"?>\n'
        b'<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9" '
        b'xmlns:image="http://www.google.com/schemas/sitemap-image/1.1">\n'
        b"<url><loc>http://a.example/x?a=1&amp;b=2</loc>"
        b"<image:image><image:loc>http://a.example/i.png</image:loc>"
        b"</image:image>"
        b"<lastmod>2024-03-04</lastmod></url></urlset>"
    )
    kind, entries = SM.parse_sitemap(xml)
    assert kind == "urlset"
    # the image:loc must NOT leak into (or overwrite) the url's loc
    assert entries == [("http://a.example/x?a=1&b=2", "2024-03-04", None)]


# ---------------------------------------------------------------------------
# robots: pattern_regex agrees with the matcher (both engines run it)
# ---------------------------------------------------------------------------


@settings(max_examples=400, deadline=None)
@given(
    pattern=st.text(alphabet="abc/0.$*", min_size=1, max_size=12),
    path=st.text(alphabet="abc/0.", min_size=0, max_size=16),
)
def test_pattern_regex_differential(pattern, path):
    """pattern_regex (the JVM-side translation the frontier ships to
    ``rlike``) must agree with the hand matcher on every input —
    same grammar, third implementation, same verdicts."""
    if "$" in pattern[:-1]:  # mid-pattern '$' is literal; keep only a tail $
        pattern = (
            pattern.replace("$", "", pattern.count("$") - 1)
            if pattern.endswith("$")
            else pattern.replace("$", "")
        )
    got = re.search(RB.pattern_regex(pattern), path) is not None
    assert got == RB._pattern_matches(pattern, path), (pattern, path)


# Curated pattern corpus for the JVM-side differential: every escape
# class Python re.escape emits over hostile path characters (regex
# metachars, punctuation, space, backslash), wildcards, terminal and
# de-anchored '$', mid-pattern '$' (literal per RFC 9309), empty runs.
_JVM_RX_PATTERNS = [
    "/", "/a/b", "/a/*/c", "*.php$", "/x$", "/*$", "$", "*",
    "/a*b*c", "/a**b", "/star*star$", "*$", "/q?x=1", "/p(1)",
    "/p[2]", "/b{3}", "/v|w", "/c^d", "/d-e", "/t~u", "/m+n",
    "/s s", "/pct%7E", "/dot.", "/comma,;:", "/quote'\"",
    "/bs\\", "/lt<gt>", "/amp&eq=", "/at@hash#", "/bang!",
    "/mid$dollar", "/a.c$", "/+?.", "/[a-z]+", "/(|)",
]
_JVM_RX_PATHS = [
    "", "/", "/a/b", "/a/b/c", "/a/x/c", "/a/bc", "/index.php",
    "/x", "/x/", "/axbyc", "/ab", "/starXstar", "/q?x=1",
    "/q!x=1", "/p(1)", "/p[2]", "/b{3}", "/v|w", "/c^d", "/d-e",
    "/t~u", "/m+n", "/s s", "/pct%7E", "/dot.", "/dotX",
    "/comma,;:", "/quote'\"", "/bs\\", "/lt<gt>", "/amp&eq=",
    "/at@hash#", "/bang!", "/mid$dollar", "/abc", "/a.c", "/aXc",
]


def test_pattern_regex_spark_rlike_differential(spark):
    """r14 advice #3: the claim that pattern_regex's output compiles
    and matches IDENTICALLY under java.util.regex was only ever
    exercised through Python ``re`` — a Java-side divergence (an
    escape Java rejects, an anchor it reads differently) would have
    surfaced only as a runtime frontier failure. Run the full
    pattern x path corpus through Spark ``rlike`` (the same RLike
    expression node q_crawl_frontier's higher-order filter evaluates
    per rules-array element) and demand bit-identical verdicts with
    the hand matcher. A pattern whose translation Java cannot compile
    fails the action loudly here, not in production."""
    rows = [
        (pat, RB.pattern_regex(pat), path)
        for pat in _JVM_RX_PATTERNS
        for path in _JVM_RX_PATHS
    ]
    df = spark.createDataFrame(rows, "pattern string, rx string, path string")
    from pyspark.sql import functions as F

    got = {
        (r["pattern"], r["path"]): r["jvm"]
        for r in df.withColumn("jvm", F.expr("path rlike rx")).collect()
    }
    for pat in _JVM_RX_PATTERNS:
        for path in _JVM_RX_PATHS:
            want = RB._pattern_matches(pat, path)
            assert got[(pat, path)] == want, (pat, path, want)


# ---------------------------------------------------------------------------
# URL canonicalizer: idempotence + urllib differential (advice #6)
# ---------------------------------------------------------------------------

_ADVERSARIAL_URLS = [
    "HTTP://Site7.EXAMPLE:80/a/b?z=1&a=2",
    "https://X.example:443/",
    "https://x.example:8443/p",
    "http://a.example",
    "http://a.example?k=v",
    "http://a.example/p/q/r",
    "http://a.example/a%7Eb",        # percent-encoding preserved as-is
    "http://a.example/a/?b&a=1&A=2",  # trailing slash kept, params sorted
    "http://a.example:80",
    "http://a.example/x?sole",
]


def _canonical(spark, urls):
    from pyspark.sql import functions as F

    from asafaviv_devops_asafaviv_devops_tidb_cdc_spark.functions import (
        html_text as HT,
    )

    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [
        r[0] for r in df.select(HT.canonical_url_col("url")).collect()
    ]


def test_canonicalizer_idempotent_and_matches_urllib(spark):
    """normalize(normalize(u)) == normalize(u), and each step agrees
    with an independent urllib-based reconstruction of the same safe
    policy (RFC 3986 6.2.2-6.2.3 core + query-param sort)."""
    from urllib.parse import urlsplit

    once = _canonical(spark, _ADVERSARIAL_URLS)
    twice = _canonical(spark, once)
    assert once == twice  # idempotence
    for raw, got in zip(_ADVERSARIAL_URLS, once):
        s = urlsplit(raw)
        scheme = s.scheme.lower()
        host = (s.hostname or "").lower()
        port = (
            ""
            if s.port is None
            or (scheme, s.port) in (("http", 80), ("https", 443))
            else f":{s.port}"
        )
        path = s.path or "/"
        query = "&".join(sorted(s.query.split("&"))) if s.query else ""
        want = f"{scheme}://{host}{port}{path}" + (
            f"?{query}" if query else ""
        )
        assert got == want, raw


# ---------------------------------------------------------------------------
# frontier: plan shape + spot semantics
# ---------------------------------------------------------------------------


def test_frontier_plan_broadcasts_politeness_and_walks_once(spark):
    """The robots rules join must be a broadcast (the politeness table
    is O(hosts)); the plan must stay free of row-at-a-time Python
    (the registry-wide guard also asserts the latter); and EVERY
    archive scan must sit inside a cached subtree — the 100 TB
    archive walk materializes exactly once (the r14 plan-audit fix:
    an uncached link_cand or a rules branch rooted in cand re-walks
    the corpus per consumer). The registered query materializes this
    frame inside webgraph.scoped_graph_result (r15), so the pinned
    plan is the INNER composition's."""
    from asafaviv_devops_asafaviv_devops_tidb_cdc_spark.queries.web_frontier import (
        _frontier_frame,
    )

    df, _n = _frontier_frame(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan[:2000]
    assert "BatchEvalPython" not in plan
    in_mem_depth = None
    uncached_scans = 0
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
        if op.startswith("Scan parquet") and in_mem_depth is None:
            uncached_scans += 1
    assert uncached_scans == 0, plan[:3000]


def test_frontier_politeness_is_load_bearing(spark):
    """Per-host verdicts must reflect the robots branch structure:
    specific-group hosts (hid%3==0) deny only the /p{b}/ sitemap
    shape; wildcard hosts deny the /private/ and *.tmp shapes."""
    rows = {
        r["host"]: r
        for r in registry.QUERIES["q_crawl_frontier"](
            spark, SF_SMOKE
        ).collect()
    }
    assert rows
    checked = 0
    for host, r in rows.items():
        m = re.match(r"^site(\d+)\.example$", host)
        if not m:
            continue
        hid = int(m.group(1))
        n = hid % 6 + 2  # sitemap URL count
        denied = sum(
            1
            for k in range(n)
            if (
                (k % 4 == 3)
                if hid % 3 == 0
                else (k % 4 in (0, 2))
            )
        )
        assert r["n_allowed"] == r["n_candidates"] - denied, (host, dict(r.asDict()))
        assert r["agent_group"] == (
            "specific" if hid % 3 == 0 else "wildcard"
        )
        checked += 1
    assert checked > 20


def test_stream_host_graph_matches_batch_census(spark):
    """The folded stream census must equal the batch derivation from
    the same edge frame (the monoid identity, end to end)."""
    from pyspark.sql import functions as F

    from asafaviv_devops_asafaviv_devops_tidb_cdc_spark.functions import (
        html_text as HT,
        webgraph as WG,
    )

    got = {
        r["host"]: (r["n_out"], r["n_in"])
        for r in registry.QUERIES["q_stream_host_graph"](
            spark, SF_SMOKE
        ).collect()
    }
    from asafaviv_devops_asafaviv_devops_tidb_cdc_spark.sources import (
        load_table,
    )

    docs = load_table(spark, SF_SMOKE, "documents").select(
        F.col("doc_id").alias("media_id")
    )
    hosts = WG.host_pairs(HT.warc_edges(HT.synth_warc_html_payloads(docs)))
    n_out, n_in = WG.neighbor_census(hosts)
    want = {
        r["host"]: (r["n_out"], r["n_in"])
        for r in n_out.withColumnRenamed("src", "host")
        .join(
            n_in.withColumnRenamed("dst", "host"), "host", "full_outer"
        )
        .fillna(0, ["n_out", "n_in"])
        .collect()
    }
    assert got == want


def test_arrow_byte_cap_configured(spark):
    """Both session builders must carry the byte-capped Arrow slicing
    (r14 scaffold fix): KB-scale binary payload rows at the 10k-row
    default slice stall chained Python stage pairs; the 1 MB cap
    restores pipelining while leaving ordinary numeric frames with
    thousands of rows per slice (A/B in BASELINE.md r14)."""
    assert (
        spark.conf.get("spark.sql.execution.arrow.maxBytesPerBatch") == "1m"
    )
    import __spark_entry__ as E

    E._configure(spark)  # the driver-session path sets it too
    assert (
        spark.conf.get("spark.sql.execution.arrow.maxBytesPerBatch") == "1m"
    )
