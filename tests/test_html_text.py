"""WARC -> visible-text extraction (E37, the CC-WET stage): formula
roundtrip, stdlib html.parser cross-validation (the in-container
reference implementation), extraction-hazard pins, and corruption
rejection."""

from __future__ import annotations

from html.parser import HTMLParser

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from asafaviv_devops_asafaviv_devops_tidb_cdc_spark.functions import html_text as H


# ---------------------------------------------------------------------------
# reference extractor: stdlib html.parser
# ---------------------------------------------------------------------------


class _RefExtractor(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self._skip = 0
        self._parts: list[str] = []

    def handle_starttag(self, tag, attrs):
        if tag in ("script", "style"):
            self._skip += 1

    def handle_endtag(self, tag):
        if tag in ("script", "style") and self._skip:
            self._skip -= 1

    def handle_data(self, data):
        if not self._skip:
            self._parts.append(data)


def ref_extract(html: str) -> str:
    p = _RefExtractor()
    p.feed(html)
    p.close()
    # html.parser yields U+00A0 for &nbsp;; our contract folds it into
    # ordinary whitespace like every WET pipeline does
    return " ".join("".join(p._parts).replace("\xa0", " ").split())


# ---------------------------------------------------------------------------
# roundtrip + cross-validation
# ---------------------------------------------------------------------------


def test_formula_roundtrip_and_stdlib_cross_validation():
    n_pages = 0
    for mid in list(range(80)) + [12345, 999983]:
        pages = H.extract_html_pages(H.synth_warc_html_gz_bytes(mid))
        assert pages is not None, mid
        expect = [
            r
            for r in range(H.html_record_count(mid))
            if H.html_record_type(mid, r) == "response"
            and H.html_is_html(mid, r)
            and H.html_is_ok(mid, r)
        ]
        assert [r for r, _ in pages] == expect, mid
        for r, text in pages:
            assert text == H.expected_visible_text(mid, r), (mid, r)
            # the stdlib parser agrees on the raw page
            assert ref_extract(H.build_page_html(mid, r)) == text, (mid, r)
            n_pages += 1
    assert n_pages > 20


def test_extraction_hazards():
    ex = H.extract_visible_text
    # script content with markup inside a string literal + bare <
    assert ex('<script>if (a < 3) { x("<p>no</p>"); }</script>yes') == "yes"
    # style with braces; uppercase raw-text tag
    assert ex("<STYLE>body { color: red; }</STYLE>ok") == "ok"
    # comments wrapping markup vanish without injecting whitespace
    # (matches html.parser: data 'a' + data 'b' with no boundary)
    assert ex("a<!-- <p>hidden</p> -->b") == "ab"
    assert ex("a <!-- <p>hidden</p> --> b") == "a b"
    # quote-aware tag scan: > inside attribute values
    assert ex('<a title="t>u" href=\'x>y\'>link</a>') == "link"
    # entity decode AFTER strip: literal markup survives as text
    assert ex("&lt;script&gt;alert(1)&lt;/script&gt;") == (
        "<script>alert(1)</script>"
    )
    # numeric + hex + unknown refs
    assert ex("&#64;&#x40; &unknown; &amp;amp;") == "@@ &unknown; &amp;"
    # whitespace collapse across block boundaries
    assert ex("<p>a</p>\n\t <div> b\n c</div>") == "a b c"
    # unterminated constructs: nothing visible past them, never a hang
    assert ex("a<!-- no close") == "a"
    assert ex("a<script>no close") == "a"
    assert ex("a<b attr='unterminated") == "a"


_WORD = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyz0123456789", min_size=1, max_size=8
)


@settings(max_examples=60, deadline=None)
@given(
    words=st.lists(_WORD, min_size=0, max_size=12),
    tags=st.lists(st.sampled_from(["p", "div", "span", "b", "h1"]),
                  min_size=0, max_size=6),
    script_body=_WORD,
    comment_body=_WORD,
    seed=st.integers(0, 9),
)
def test_property_matches_stdlib_parser(
    words, tags, script_body, comment_body, seed
):
    """Well-formed HTML assembled from random words/structure: our
    linear scanner and stdlib html.parser must extract identical
    visible text."""
    parts = [f"<!-- {comment_body} -->", f"<script>var x = '{script_body}';</script>"]
    for i, w in enumerate(words):
        if tags and seed != 0:
            t = tags[i % len(tags)]
            parts.append(f"<{t} id=\"a{i}\" title='q>{i}'>{w}</{t}>")
        else:
            parts.append(w)
    html = "<html><body>" + "\n".join(parts) + "</body></html>"
    assert H.extract_visible_text(html) == ref_extract(html)


# ---------------------------------------------------------------------------
# HTTP grammar + corruption
# ---------------------------------------------------------------------------


def test_http_parse_grammar():
    ok = b"HTTP/1.1 200 OK\r\ncontent-type: text/html\r\nContent-Length: 2\r\n\r\nhi"
    status, hdrs, body = H.parse_http_response(ok)
    assert (status, body) == (200, b"hi")
    assert hdrs["content-type"] == "text/html"  # names fold to lower
    assert H.parse_http_response(b"") is None
    assert H.parse_http_response(b"ICY 200 OK\r\n\r\n") is None
    assert H.parse_http_response(b"HTTP/1.1 2x0 OK\r\n\r\n") is None
    # content-length mismatch is structural corruption
    bad = ok.replace(b"Length: 2", b"Length: 9")
    assert H.parse_http_response(bad) is None
    # header line without a colon
    assert H.parse_http_response(b"HTTP/1.1 200 OK\r\nnocolon\r\n\r\n") is None


def test_archive_corruption_yields_none_pages_skip_rules_dont():
    good = H.synth_warc_html_gz_bytes(21)
    assert H.extract_html_pages(b"") is None
    assert H.extract_html_pages(good[:-4]) is None  # truncated member
    flipped = bytearray(good)
    flipped[len(flipped) // 2] ^= 0xFF
    assert H.extract_html_pages(bytes(flipped)) is None
    # a response whose HTTP layer is corrupt poisons the archive ...
    from asafaviv_devops_asafaviv_devops_tidb_cdc_spark.functions import warc as W

    bad_http = W.build_warc_record(
        [("WARC-Type", "response")], b"NOT-HTTP body"
    )
    assert H.extract_html_pages(W.gzip_member(bad_http, 0, 0)) is None
    # ... but non-response / non-200 / non-html records merely skip
    req = W.build_warc_record([("WARC-Type", "request")], b"GET / HTTP/1.1")
    assert H.extract_html_pages(W.gzip_member(req, 0, 0)) == []
    pdf = W.build_warc_record(
        [("WARC-Type", "response")],
        b"HTTP/1.1 200 OK\r\nContent-Type: application/pdf\r\n\r\n%PDF",
    )
    assert H.extract_html_pages(W.gzip_member(pdf, 0, 0)) == []
    gone = W.build_warc_record(
        [("WARC-Type", "response")],
        b"HTTP/1.1 404 Not Found\r\nContent-Type: text/html\r\n\r\n<p>x</p>",
    )
    assert H.extract_html_pages(W.gzip_member(gone, 0, 0)) == []


def test_charset_resolution():
    from asafaviv_devops_asafaviv_devops_tidb_cdc_spark.functions import warc as W

    def page(body, ctype):
        rec = W.build_warc_record(
            [("WARC-Type", "response")],
            f"HTTP/1.1 200 OK\r\nContent-Type: {ctype}\r\n\r\n".encode()
            + body,
        )
        return W.gzip_member(rec, 0, 0)

    # latin-1 byte 0xE9 under a case/quote-varied charset parameter
    got = H.extract_html_pages(page(b"<p>caf\xe9</p>", 'text/html; CHARSET="ISO-8859-1"'))
    assert got == [(0, "café")]
    # cp1252 curly quotes
    got = H.extract_html_pages(page(b"<p>\x93q\x94</p>", "text/html; charset=windows-1252"))
    assert got == [(0, "“q”")]
    # no header charset: HTML5 meta prescan finds utf-8
    body = '<meta charset="utf-8"><p>grü</p>'.encode("utf-8")
    assert H.extract_html_pages(page(body, "text/html")) == [(0, "grü")]
    # unknown charset: page skipped (keep-rule), not corruption
    assert H.extract_html_pages(page(b"<p>x</p>", "text/html; charset=shift_jis")) == []
    # invalid bytes under a DECLARED utf-8: corruption
    assert H.extract_html_pages(page(b"<p>\xff\xfe</p>", "text/html; charset=utf-8")) is None
    # the synth rotation reaches every mode among kept pages
    modes = set()
    for mid in range(200):
        for r, _ in H.extract_html_pages(H.synth_warc_html_gz_bytes(mid)):
            modes.add(H.html_charset_mode(mid, r))
    assert modes == {0, 1, 2, 3, 4, 5}


# ---------------------------------------------------------------------------
# link extraction (E38)
# ---------------------------------------------------------------------------


def test_link_formula_roundtrip_and_urljoin_cross_validation():
    from urllib.parse import urljoin

    n_pages = 0
    for mid in list(range(80)) + [4242, 999999]:
        pages = H.extract_page_links(H.synth_warc_html_gz_bytes(mid))
        assert pages is not None, mid
        for r, links in pages:
            assert links == H.expected_resolved_links(mid, r), (mid, r)
            # every synth resolution agrees with stdlib urljoin
            base = H.html_page_url(mid, r)
            raw = ["/u?a=1&b"] + [
                H.html_link_href(mid, r, k).replace("&amp;", "&")
                for k in range(H.html_link_count(mid, r))
            ]
            assert links == [urljoin(base, h) for h in raw], (mid, r)
            n_pages += 1
    assert n_pages > 20


def test_rfc3986_resolution_matches_urljoin():
    from urllib.parse import urljoin

    base = "http://h.example/a/b/c?q=1"
    for ref in [
        "g", "./g", "../g", "../../g", "../../../g", "/g",
        "//o.example/x", "?y=2", "g?y=2#s", "g/", ".", "..",
        "g/../h", "g/./h", "HTTP://UP.example/P", "http://x.example",
        "x:y/z", "x:y/../z", "mailto:a@b", "/a/./b/../c",
    ]:
        assert H.resolve_url(base, ref) == (
            urljoin(base, ref).split("#", 1)[0] or None
        ), ref
    # empty / fragment-only refs are not document links
    assert H.resolve_url(base, "") is None
    assert H.resolve_url(base, "#top") is None
    # documented stdlib DEVIATION: urljoin collapses empty path
    # segments ('a//b' -> 'a/b'); RFC 3986 5.2.4 and the WHATWG URL
    # standard (what browsers resolve) both keep them — we pin the
    # standard behavior, not the stdlib quirk
    assert H.resolve_url(base, "a//b") == "http://h.example/a/b/a//b"


def test_link_extraction_rules():
    base = "http://h.example/dir/page"
    ex = lambda html: H.extract_links(html, base)  # noqa: E731
    # attribute forms: double/single/unquoted; entity decode in values
    assert ex('<a href="x">1</a><a href=\'y\'>2</a><a href=z>3</a>') == [
        "http://h.example/dir/x",
        "http://h.example/dir/y",
        "http://h.example/dir/z",
    ]
    assert ex('<a href="u?a=1&amp;b=2">e</a>') == [
        "http://h.example/dir/u?a=1&b=2"
    ]
    # skipped refs: fragment-only, javascript:, mailto:, empty
    assert ex('<a href="#s">f</a><a href="javascript:x()">j</a>'
              '<a href="mailto:a@b">m</a><a href="">e</a>') == []
    # commented-out and script-embedded anchors are never edges
    assert ex('<!-- <a href="no">c</a> -->'
              '<script>var s = \'<a href="no">s</a>\';</script>'
              '<a href="yes">y</a>') == ["http://h.example/dir/yes"]
    # <a> without href; closing tags; case-insensitive tag/attr names
    assert ex('<a name="anchor">n</a><A HREF="up">u</A>') == [
        "http://h.example/dir/up"
    ]
    # document order is the contract (the md5 hashes the join order)
    assert ex('<a href="/b">1</a><a href="/a">2</a>') == [
        "http://h.example/b",
        "http://h.example/a",
    ]


class _AttrGrab(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=False)
        self.attrs = None

    def handle_starttag(self, tag, attrs):
        if self.attrs is None:
            self.attrs = attrs


_ATTR_NAME = st.sampled_from(["href", "id", "class", "data-x", "TITLE"])
_ATTR_VAL = st.sampled_from(["x", "a b", "x>y", "1&amp;2", "", "q'q", 'd"d'])


@settings(max_examples=120, deadline=None)
@given(
    pairs=st.lists(st.tuples(_ATTR_NAME, _ATTR_VAL, st.integers(0, 3)),
                   min_size=0, max_size=5),
)
def test_attr_parsing_matches_stdlib_parser(pairs):
    """_parse_attrs differential vs html.parser across quoting styles,
    boolean attributes and DUPLICATES (HTML5 keeps the first
    occurrence — the r12 bug this test caught)."""
    parts = []
    for a, v, style in pairs:
        if style == 0 and '"' not in v:
            parts.append(f'{a}="{v}"')
        elif style == 1 and "'" not in v:
            parts.append(f"{a}='{v}'")
        elif style == 2 and v and all(c not in v for c in " >'\""):
            parts.append(f"{a}={v}")
        else:
            parts.append(a)  # bare boolean attribute
    tag_body = "a " + " ".join(parts)
    g = _AttrGrab()
    g.feed(f"<{tag_body}>t</a>")
    g.close()
    ref = {}
    for k, v in (g.attrs or []):
        if k not in ref:
            ref[k] = v if v is not None else ""
    mine = {
        k: H._decode_charrefs(v) for k, v in H._parse_attrs(tag_body).items()
    }
    assert mine == ref, tag_body


def test_url_canonicalization_in_spark(spark):
    """The q_url_dedup canonicalization is a Spark codegen expression;
    drive it through the registered query's own normalize logic on
    crafted messy URLs."""
    from asafaviv_devops_asafaviv_devops_tidb_cdc_spark import registry

    registry.load_all()
    # reuse the query's expression by running the full query at smoke
    # SF and checking the messy forms collapsed: every odd-v absolute
    # link (EXT…:80) must appear only in canonical lowercase no-port
    # form, and every query string must be param-sorted
    rows = registry.QUERIES["q_url_dedup"](spark, "/root/testdata/sf0.001").collect()
    assert rows, "census empty"
    for row in rows:
        u = row["url"]
        assert "EXT" not in u and ":80" not in u, u
        if "?" in u:
            params = u.split("?", 1)[1].split("&")
            assert params == sorted(params), u
        assert row["n_refs"] >= row["n_pages"] >= 1
    # cross-check one expected canonical target is present with the
    # right counts derived from the pure-Python layer
    import collections

    expect = collections.Counter()
    pages = collections.defaultdict(set)
    # sf0.001 documents: enumerate ids via the synth keep-rule over
    # the actual doc ids the query used — recover them from the edges
    # stage instead of reading parquet schemas here
    from asafaviv_devops_asafaviv_devops_tidb_cdc_spark.functions import html_text as HT

    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    for (doc_id,) in df.select("doc_id").collect():
        mid = int(doc_id)
        pl = HT.extract_page_links(HT.synth_warc_html_gz_bytes(mid))
        for r, _links in pl:
            for cu in HT.expected_canonical_links(mid, r):
                expect[cu] += 1
                pages[cu].add((mid, r))
    top = sorted(expect.items(), key=lambda kv: (-kv[1], kv[0]))[:100]
    got = [(row["url"], row["n_refs"], row["n_pages"]) for row in rows]
    want = [(u, n, len(pages[u])) for u, n in top]
    assert got == want


def test_stage_emits_rows_in_spark(spark):
    from asafaviv_devops_asafaviv_devops_tidb_cdc_spark import registry

    registry.load_all()
    df = registry.QUERIES["q_warc_html_text"](spark, "/root/testdata/sf0.001")
    rows = df.collect()
    assert len(rows) > 0
    one = {r["media_id"]: r for r in rows}
    mid = next(iter(one))
    r = one[mid]
    import hashlib

    # cross-check one row against the pure-Python layer
    want = H.expected_visible_text(mid, r["r"])
    assert r["n_chars"] == len(want)
    assert r["text_md5"] == hashlib.md5(want.encode()).hexdigest()


# ---------------------------------------------------------------------------
# main-content extraction (block segmentation + classification)
# ---------------------------------------------------------------------------


def test_main_content_formula_roundtrip():
    n_pages = 0
    for mid in list(range(80)) + [12345, 999983]:
        pages = H._walk_html_pages(H.synth_warc_html_gz_bytes(mid))
        assert pages is not None, mid
        for r, _url, doc in pages:
            n_blocks, n_content, text = H.extract_main_content(doc)
            assert text == H.expected_main_text(mid, r), (mid, r)
            assert (n_blocks, n_content) == H.expected_block_counts(mid, r)
            n_pages += 1
    assert n_pages > 20


def test_block_join_equals_wet_text_on_synth_pages():
    """Segmentation must LOSE nothing: the space-join of all blocks
    equals the WET text (synth pages separate block tags with
    whitespace, so the inter-block joins are exact)."""
    for mid in range(40):
        for r in range(H.html_record_count(mid)):
            if H.html_record_type(mid, r) != "response" or not H.html_is_html(
                mid, r
            ):
                continue
            page = H.build_page_html(mid, r)
            joined = " ".join(t for t, _, _ in H.segment_blocks(page))
            assert joined == H.extract_visible_text(page), (mid, r)


def test_block_classification_rules():
    # role rule: chrome elements are boilerplate regardless of content
    html = (
        "<html><head><title>T</title></head><body>"
        "<nav>home about</nav><header>masthead</header>"
        "<p>the article body text here</p>"
        "<aside>related stuff</aside><footer>copyright</footer>"
        "</body></html>"
    )
    got = H.classify_blocks(H.segment_blocks(html))
    assert got == [
        ("T", False), ("home about", False), ("masthead", False),
        ("the article body text here", True),
        ("related stuff", False), ("copyright", False),
    ]
    # density rule: a link-farm block drops, prose with one short link
    # survives, and inline <a> does NOT split the block
    html2 = (
        "<body><ul><li><a href='/a'>one</a></li>"
        "<li><a href='/b'>two</a></li></ul>"
        "<p>read the <a href='/c'>spec</a> for all the details</p></body>"
    )
    got2 = H.classify_blocks(H.segment_blocks(html2))
    assert got2 == [
        ("one", False), ("two", False),
        ("read the spec for all the details", True),
    ]
    # nested chrome: closing the inner element keeps the outer role
    html3 = "<footer>a<div>b</div>c</footer><p>d</p>"
    got3 = H.classify_blocks(H.segment_blocks(html3))
    assert got3 == [("a", False), ("b", False), ("c", False), ("d", True)]
    # comments and script/style never contribute to any block
    html4 = "<p>keep<!-- <footer>x</footer> --><script>y</script></p>"
    assert H.classify_blocks(H.segment_blocks(html4)) == [("keep", True)]
    # entity decode happens per block, after segmentation
    assert H.segment_blocks("<p>&lt;b&gt;</p>")[0][0] == "<b>"


def test_main_content_density_boundary():
    # exactly at MAX_LINK_DENSITY stays content; just above drops
    html = "<p><a href='/x'>ab</a>cde</p>"  # density 0.4 among 5 chars
    assert H.classify_blocks(H.segment_blocks(html)) == [("abcde", True)]
    html = "<p><a href='/x'>abc</a>de</p>"  # density 0.6
    assert H.classify_blocks(H.segment_blocks(html)) == [("abcde", False)]


def test_main_content_stage_in_spark(spark):
    from asafaviv_devops_asafaviv_devops_tidb_cdc_spark import registry

    registry.load_all()
    df = registry.QUERIES["q_main_content"](spark, "/root/testdata/sf0.001")
    rows = df.collect()
    assert len(rows) > 0
    import hashlib

    for row in rows[:10]:
        want = H.expected_main_text(row["media_id"], row["r"])
        nb, nc = H.expected_block_counts(row["media_id"], row["r"])
        assert row["main_chars"] == len(want)
        assert row["main_tokens"] == len(want.split())
        assert (row["n_blocks"], row["n_content"]) == (nb, nc)
        assert row["main_md5"] == hashlib.md5(want.encode()).hexdigest()


@settings(max_examples=80, deadline=None)
@given(
    words=st.lists(_WORD, min_size=0, max_size=12),
    tags=st.lists(
        st.sampled_from(["p", "div", "li", "h2", "span", "b", "footer"]),
        min_size=1, max_size=6,
    ),
    link_every=st.integers(2, 4),
    seed=st.integers(0, 9),
)
def test_block_join_equals_wet_text_on_generated_html(
    words, tags, link_every, seed
):
    """Property form of the lose-nothing invariant: on generated
    whitespace-separated HTML (mixed block/inline tags, anchors,
    comments, script), the space-join of all segmented blocks equals
    the WET text, and every anchor-only block carries density 1.0."""
    parts = ["<script>var x = 'hidden';</script>", "<!-- <p>gone</p> -->"]
    for i, w in enumerate(words):
        t = tags[i % len(tags)]
        if i % link_every == 0:
            parts.append(f'<{t}><a href="/l{i}">{w}</a></{t}>')
        else:
            parts.append(f"<{t} id='a{i}'>{w} t{seed}</{t}>")
    html = "<html><body>\n" + "\n".join(parts) + "\n</body></html>"
    blocks = H.segment_blocks(html)
    assert " ".join(t for t, _, _ in blocks) == H.extract_visible_text(html)
    for text, density, _role in blocks:
        assert 0.0 <= density <= 1.0
        assert text == " ".join(text.split())


@settings(max_examples=120, deadline=None)
@given(
    words=st.lists(_WORD, min_size=1, max_size=8),
    trap=st.sampled_from([
        '<div title="</p><p>fake</p>">{w}</div>',      # block tag in attr value
        "<p data-x='<nav>not a nav</nav>'>{w}</p>",    # boiler tag in attr
        "<!-- <footer>ghost</footer> --><p>{w}</p>",   # boiler tag in comment
        "<script>if (a<b) {{ x = '</p><p>'; }}</script><p>{w}</p>",
        "<nav><ul><li><a href='/x'>{w}</a></li></ul></nav>",  # nested boiler
        "<footer><div><span>{w}</span></div></footer>",       # block in boiler
        "<p>{w}",                                      # unclosed block
        "<br/><hr/><p>{w}</p>",                        # void/self-closing
        "<aside/><p>{w}</p>",                          # self-closed boiler: no depth leak
        "<P CLASS=x>{w}</P>",                          # case-insensitive names
    ]),
    seed=st.integers(0, 99),
)
def test_segmenter_survives_adversarial_nesting(words, trap, seed):
    """r13 advice item 6: block/boiler tags hidden inside comments,
    attribute values and rawtext must neither split blocks nor flip
    roles; self-closed boiler tags must not leak role depth; the
    lose-nothing invariant (block join == WET text) holds throughout,
    and trailing text after a self-closed/aside trap is NOT marked
    boilerplate."""
    body = " ".join(trap.format(w=w) for w in words) + f" tail{seed}"
    html = f"<html><body>{body}</body></html>"
    blocks = H.segment_blocks(html)
    assert " ".join(t for t, _, _ in blocks) == H.extract_visible_text(html)
    for text, density, _role in blocks:
        assert 0.0 <= density <= 1.0
        assert text == " ".join(text.split())
    if trap.startswith("<aside/>"):
        # a self-closed boiler element must not poison what follows
        assert all(not role for _, _, role in blocks)
    if trap.startswith("<!--"):
        assert all(not role for _, _, role in blocks)
        assert "ghost" not in " ".join(t for t, _, _ in blocks)
