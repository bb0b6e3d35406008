"""WARC -> visible-text extraction (the Common Crawl WET stage).

The stage every web-corpus pipeline runs right after raw-archive
ingest (functions/warc.py, E36): walk a ``.warc.gz``, keep the
``response`` records, parse the HTTP/1.1 message inside each, keep
``200 text/html`` pages, and reduce the HTML to the visible text a
training corpus actually wants — script/style elements dropped whole,
comments dropped, tags stripped (quote-aware, so a ``>`` inside an
attribute value doesn't truncate the tag), character references
decoded AFTER tag stripping (so ``&lt;b&gt;`` in text yields a literal
``<b>`` instead of being re-parsed as markup — the classic
double-decode bug), and whitespace collapsed to single spaces.

Everything here is pure-Python over bytes the engine synthesized from
id formulas, so the DuckDB oracle re-derives the exact extracted text
(and its md5) from the same formulas — the gate only passes if HTTP
framing, element skipping, entity decoding and whitespace rules are
all byte-exact. The extractor is cross-validated against stdlib
``html.parser`` in tests/test_html_text.py.

Reference surface: none — the reference engine stops at raw CDC rows;
this extends the LLM-pipeline mandate (north-star BASELINE.json).
100 TB posture: identical to E36 — archives are opaque binary columns,
the extraction is an Arrow-batched map stage with no shuffle, and the
one-record-per-gzip-member layout splits at member boundaries.
"""

from __future__ import annotations

import hashlib
import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from .warc import build_warc_record, gunzip_members, gzip_member, parse_warc_record

# ---------------------------------------------------------------------------
# id formulas (mirrored verbatim by the oracle SQL in llm_pipeline.py)
# ---------------------------------------------------------------------------


def html_record_count(media_id: int) -> int:
    return media_id % 3 + 1


def html_record_type(media_id: int, r: int) -> str:
    return ("response", "request", "metadata")[(media_id + r) % 3]


def html_is_html(media_id: int, r: int) -> bool:
    return (media_id + r) % 4 != 1


def html_is_ok(media_id: int, r: int) -> bool:
    return (media_id + r) % 5 != 2


def html_token_count(media_id: int) -> int:
    return media_id % 40 + 10


def html_charset_mode(media_id: int, r: int) -> int:
    """0: UTF-8 declared only by <meta charset> (header has no
    charset param — the sniffing path); 2: windows-1252 with curly
    quotes; 4: iso-8859-1 with an 0xE9 byte; else: UTF-8 declared in
    the Content-Type header. Real crawls mix all four. (media_id//3
    keeps the rotation independent of the (media_id + r) % 3
    keep-rule, which would otherwise pin kept pages to modes 0/3.)"""
    return (media_id // 3 + r) % 6


def html_extra_token(media_id: int, r: int):
    """The page's one non-ASCII token (None for plain-ASCII modes) —
    present in the visible text only if the right codec decoded the
    right bytes."""
    mode = html_charset_mode(media_id, r)
    v8 = (media_id + r) % 97
    if mode == 0:
        return f"grü{v8}"  # ü: 2 UTF-8 bytes, meta-sniffed
    if mode == 2:
        return f"“q{v8}”"  # curly quotes: cp1252 0x93/0x94
    if mode == 4:
        return f"café{v8}"  # é: latin-1 0xE9
    return None


def html_token(media_id: int, r: int, k: int) -> str:
    v = (media_id * 7 + r * 13 + k * 3) % 1000
    # every 5th token arrives entity-encoded in the HTML and must
    # decode to a literal <tokV> in the extracted text
    return f"<tok{v}>" if k % 5 == 0 else f"tok{v}"


def html_link_count(media_id: int, r: int) -> int:
    """Formula links in the page's <ul> block (the fixed 'link {id}'
    anchor is separate and always present)."""
    return (media_id + r) % 4 + 1


def html_page_host(media_id: int, r: int) -> str:
    return f"http://site{(media_id * 7 + r) % 1000}.example"


def html_footer_text(media_id: int, r: int) -> str:
    """The page's planted boilerplate footer (visible text in the WET
    stage, dropped by main-content extraction's element-role rule)."""
    return (
        f"Copyright {2000 + (media_id + r) % 27} "
        f"site{(media_id * 7 + r) % 1000} all rights reserved"
    )


def html_page_url(media_id: int, r: int) -> str:
    return f"{html_page_host(media_id, r)}/page/{media_id}/{r}"


def html_link_href(media_id: int, r: int, k: int) -> str:
    """The raw href AS WRITTEN in the page (entities included),
    rotating through the reference classes RFC 3986 5.2 resolves
    differently: absolute, root-relative, document-relative,
    parent-relative with a query whose & arrives entity-encoded.
    Odd-v absolute links arrive MESSY — uppercase host, explicit
    default :80 port — and the parent-relative query is written in
    unsorted param order, so URL-level dedup (q_url_dedup) only
    collapses them if canonicalization is real; q_warc_links'
    document-order hashes pin the messy forms verbatim."""
    v = (media_id * 11 + r * 7 + k * 5) % 1000
    absolute = (
        f"http://EXT{v}.example:80/d/{v}"
        if v % 2 == 1
        else f"http://ext{v}.example/d/{v}"
    )
    return (
        absolute,
        f"/p/{v}",
        f"d/{v}",
        f"../x?b=2&amp;a={v}",
    )[k % 4]


def expected_resolved_links(media_id: int, r: int) -> list[str]:
    """Document-order absolute link targets of the page (mirrored by
    the q_warc_links oracle SQL)."""
    host = html_page_host(media_id, r)
    links = [f"{host}/u?a=1&b"]  # the fixed 'link {id}' anchor
    for k in range(html_link_count(media_id, r)):
        v = (media_id * 11 + r * 7 + k * 5) % 1000
        kind = k % 4
        if kind == 0:
            # resolution PRESERVES the messy authority (RFC 3986
            # lowercases nothing but the scheme); canonicalization
            # is a separate, later stage (q_url_dedup)
            links.append(
                f"http://EXT{v}.example:80/d/{v}"
                if v % 2 == 1
                else f"http://ext{v}.example/d/{v}"
            )
        elif kind == 1:
            links.append(f"{host}/p/{v}")
        elif kind == 2:
            # base /page/{id}/{r} -> dir /page/{id}/ -> d/{v}
            links.append(f"{host}/page/{media_id}/d/{v}")
        else:
            # ../x from /page/{id}/ -> /page/x; &amp; decodes to &;
            # param order as written (unsorted)
            links.append(f"{host}/page/x?b=2&a={v}")
    return links


def expected_canonical_links(media_id: int, r: int) -> list[str]:
    """expected_resolved_links after canonicalization: lowercase
    scheme+host, default port stripped, empty path -> '/', query
    params sorted (mirrored by the q_url_dedup oracle SQL)."""
    host = html_page_host(media_id, r)
    links = [f"{host}/u?a=1&b"]
    for k in range(html_link_count(media_id, r)):
        v = (media_id * 11 + r * 7 + k * 5) % 1000
        kind = k % 4
        if kind == 0:
            links.append(f"http://ext{v}.example/d/{v}")
        elif kind == 1:
            links.append(f"{host}/p/{v}")
        elif kind == 2:
            links.append(f"{host}/page/{media_id}/d/{v}")
        else:
            links.append(f"{host}/page/x?a={v}&b=2")
    return links


def expected_main_text(media_id: int, r: int) -> str:
    """Content-block text of the page (mirrored by the q_main_content
    oracle SQL): the h1, token paragraph, optional charset-proof
    paragraph and end marker — WITHOUT the title, the standalone
    anchor, the link list or the footer the WET text keeps."""
    toks = " ".join(
        html_token(media_id, r, k) for k in range(html_token_count(media_id))
    )
    extra = html_extra_token(media_id, r)
    extra = f"{extra} " if extra else ""
    return f'Doc & {media_id} {toks} {extra}@end "q"'


def expected_block_counts(media_id: int, r: int) -> tuple[int, int]:
    """(n_blocks, n_content_blocks) of the page: title + h1 + token
    paragraph + standalone-anchor block + one block per <li> + the
    optional charset paragraph + end marker + footer; content = h1,
    token paragraph, optional charset paragraph, end marker."""
    has_extra = html_extra_token(media_id, r) is not None
    return (
        6 + html_link_count(media_id, r) + has_extra,
        3 + has_extra,
    )


def expected_visible_text(media_id: int, r: int) -> str:
    toks = " ".join(
        html_token(media_id, r, k) for k in range(html_token_count(media_id))
    )
    anchors = " ".join(
        f"a{k}" for k in range(html_link_count(media_id, r))
    )
    extra = html_extra_token(media_id, r)
    extra = f"{extra} " if extra else ""
    return (
        f"Doc {media_id} {r} Doc & {media_id} {toks} "
        f'link {media_id} {anchors} {extra}@end "q" '
        f"{html_footer_text(media_id, r)}"
    )


# ---------------------------------------------------------------------------
# synth: formula HTML inside HTTP/1.1 inside WARC inside gzip
# ---------------------------------------------------------------------------


def build_page_html(media_id: int, r: int) -> str:
    """The page whose visible text is expected_visible_text(). Every
    hazard a naive extractor trips on is present: a <style> block with
    braces, a <script> whose body contains markup inside a string
    literal AND a bare ``<`` comparison, an HTML comment wrapping
    markup, entity-encoded tokens, an attribute value containing ``>``
    (quote-aware tag scanning required), and an uppercase tag pair."""
    toks = " ".join(
        (
            f"&lt;tok{(media_id * 7 + r * 13 + k * 3) % 1000}&gt;"
            if k % 5 == 0
            else f"tok{(media_id * 7 + r * 13 + k * 3) % 1000}"
        )
        for k in range(html_token_count(media_id))
    )
    mode = html_charset_mode(media_id, r)
    meta = '<meta charset="utf-8">\n' if mode == 0 else ""
    extra = html_extra_token(media_id, r)
    extra_p = f"<p>{extra}</p>\n" if extra else ""
    return (
        "<!DOCTYPE html>\n"
        f"<html><head>{meta}<title>Doc {media_id} {r}</title>\n"
        f"<style type=\"text/css\">body {{ color: #fff; }} /* s{media_id} */</style>\n"
        f"<script>if ({media_id} < 3) {{ document.write(\"<p>hidden</p>\"); }}</script>\n"
        "</head>\n<body>\n"
        f"<!-- hidden {media_id} <p>not text</p> -->\n"
        f"<H1>Doc &amp; {media_id}</H1>\n"
        f"<p id=\"c{r}\">{toks}</p>\n"
        f"<a href=\"/u?a=1&amp;b\" title=\"t>u\">link {media_id}</a>\n"
        "<ul>\n"
        + "".join(
            f'<li><a class="l{k}" href="{html_link_href(media_id, r, k)}">'
            f"a{k}</a></li>\n"
            for k in range(html_link_count(media_id, r))
        )
        + "</ul>\n"
        + extra_p
        + "<p>&#64;end &quot;q&quot;</p>\n"
        f"<footer>{html_footer_text(media_id, r)}</footer>\n"
        "</body></html>\n"
    )


def build_http_response(media_id: int, r: int) -> bytes:
    """One HTTP/1.1 response message: formula status (404 rotates in),
    formula content type (application/pdf rotates in), header-name
    case rotating lower on odd records (header names are
    case-insensitive per RFC 9110 and real crawls mix them), and the
    charset declared the way real crawls declare it — a Content-Type
    parameter (utf-8 / ISO-8859-1 / Windows-1252, parameter case and
    quoting varying) or only a <meta charset> inside the body (the
    sniffing path, html_charset_mode 0)."""
    if html_is_html(media_id, r):
        mode = html_charset_mode(media_id, r)
        page = build_page_html(media_id, r)
        if mode == 0:
            body = page.encode("utf-8")
            ctype = "text/html"  # charset only in <meta>
        elif mode == 2:
            body = page.encode("cp1252")
            ctype = 'text/html; charset="Windows-1252"'
        elif mode == 4:
            body = page.encode("latin-1")
            ctype = "text/html; CHARSET=ISO-8859-1"
        else:
            body = page.encode("utf-8")
            ctype = "text/html; charset=utf-8"
    else:
        body = b"%PDF-1.4 " + bytes(
            (media_id + r * 13 + j * 7) % 256 for j in range(32)
        )
        ctype = "application/pdf"
    # non-OK records split between a 404 and a 301 redirect (with a
    # Location header), so the WET keep-rule's 200-only filter is
    # load-bearing against BOTH of the non-2xx shapes a real crawl
    # contains in volume — a naive "is_html" extractor would keep the
    # redirect's HTML stub body
    if html_is_ok(media_id, r):
        status, location = "200 OK", ""
    elif (media_id + r) % 2 == 1:
        status = "301 Moved Permanently"
        location = (
            f"Location: {html_page_host(media_id, r)}/page/"
            f"{media_id}/{r + 1}\r\n"
        )
    else:
        status, location = "404 Not Found", ""
    ct_name = "content-type" if r % 2 == 1 else "Content-Type"
    cl_name = "content-length" if r % 2 == 1 else "Content-Length"
    head = (
        f"HTTP/1.1 {status}\r\n"
        f"{ct_name}: {ctype}\r\n"
        f"{location}"
        f"X-Crawl: {media_id}-{r}\r\n"
        f"{cl_name}: {len(body)}\r\n\r\n"
    )
    return head.encode("ascii") + body


def synth_warc_html_gz_bytes(media_id: int) -> bytes:
    """One complete ``.warc.gz`` crawl slice from the id formula:
    1..3 records, one gzip member each (the splittable Common Crawl
    layout), response records carrying full HTTP/1.1 messages with
    formula HTML, request/metadata records carrying formula bytes."""
    out = bytearray()
    for r in range(html_record_count(media_id)):
        rtype = html_record_type(media_id, r)
        if rtype == "response":
            body = build_http_response(media_id, r)
        else:
            body = bytes((media_id * 3 + r * 11 + j) % 256 for j in range(24))
        rec = build_warc_record(
            [
                ("WARC-Type", rtype),
                ("WARC-Record-ID", f"<urn:uuid:{media_id:016x}-h{r:04x}>"),
                ("WARC-Date", "2026-01-01T00:00:00Z"),
                ("WARC-Target-URI",
                 f"http://site{(media_id * 7 + r) % 1000}.example/page/"
                 f"{media_id}/{r}"),
            ],
            body,
        )
        out += gzip_member(rec, mtime=(media_id * 137 + r) & 0xFFFFFFFF,
                           mode=(media_id + r) % 3)
    return bytes(out)


# ---------------------------------------------------------------------------
# HTTP/1.1 response parsing
# ---------------------------------------------------------------------------


def parse_http_response(data: bytes):
    """(status: int, headers: dict[str(lower), str], body: bytes) or
    None. Grammar: status line ``HTTP/1.x NNN reason``, CRLF header
    lines to an empty line, names folded to lowercase (RFC 9110
    case-insensitivity), body = the rest, checked against
    content-length when present."""
    head_end = data.find(b"\r\n\r\n")
    if head_end < 0:
        return None
    lines = data[:head_end].split(b"\r\n")
    try:
        parts = lines[0].decode("ascii").split(" ", 2)
    except UnicodeDecodeError:
        return None
    if len(parts) < 2 or not parts[0].startswith("HTTP/1."):
        return None
    if not (len(parts[1]) == 3 and parts[1].isdigit()):
        return None
    status = int(parts[1])
    headers: dict[str, str] = {}
    for raw in lines[1:]:
        sep = raw.find(b":")
        if sep <= 0:
            return None
        try:
            name = raw[:sep].decode("ascii").strip().lower()
            value = raw[sep + 1 :].decode("latin-1").strip()
        except UnicodeDecodeError:
            return None
        headers[name] = value
    body = data[head_end + 4 :]
    cl = headers.get("content-length")
    if cl is not None:
        if not cl.isdigit() or int(cl) != len(body):
            return None
    return status, headers, body


# ---------------------------------------------------------------------------
# charset resolution (real crawls are not all UTF-8)
# ---------------------------------------------------------------------------

# IANA names (and common aliases) of the codecs a 100 TB crawl
# actually contains in volume; anything else skips the page rather
# than guessing (the WET keep-rule, not corruption).
_CODECS = {
    "utf-8": "utf-8", "utf8": "utf-8", "us-ascii": "utf-8",
    "iso-8859-1": "latin-1", "latin-1": "latin-1", "latin1": "latin-1",
    "windows-1252": "cp1252", "cp1252": "cp1252",
}

_META_CHARSET_RE = re.compile(rb"charset\s*=\s*[\"']?([A-Za-z0-9_\-]+)", re.I)


def _charset_param(ctype: str):
    """The charset parameter of a Content-Type value, lowercased and
    unquoted (parameter names are case-insensitive per RFC 9110), or
    None when the header doesn't declare one."""
    for part in ctype.split(";")[1:]:
        if "=" in part:
            k, v = part.split("=", 1)
            if k.strip().lower() == "charset":
                return v.strip().strip("\"'").lower()
    return None


def _sniff_meta_charset(body: bytes):
    """HTML5-style prescan of the first 1024 bytes for a
    ``<meta charset=...>`` declaration (the path pages take when the
    HTTP header omits the charset). ASCII-compatible byte scan, so it
    works before the codec is known."""
    m = _META_CHARSET_RE.search(body[:1024])
    return m.group(1).decode("ascii").lower() if m else None


# ---------------------------------------------------------------------------
# visible-text extraction
# ---------------------------------------------------------------------------

_NAMED_REFS = {
    "amp": "&", "lt": "<", "gt": ">", "quot": '"', "apos": "'",
    "nbsp": " ",
}

# elements whose CONTENT is never visible text
_RAWTEXT_SKIP = ("script", "style")


def _decode_charrefs(text: str) -> str:
    """One non-recursive pass over &name; / &#NN; / &#xHH; references.
    Unknown or malformed references pass through literally (browser
    behavior for text content)."""
    out: list[str] = []
    i, n = 0, len(text)
    while i < n:
        c = text[i]
        if c != "&":
            out.append(c)
            i += 1
            continue
        end = text.find(";", i + 1)
        if end < 0 or end - i > 10:
            out.append(c)
            i += 1
            continue
        ref = text[i + 1 : end]
        if ref.startswith("#"):
            digits = ref[1:]
            try:
                cp = (
                    int(digits[1:], 16)
                    if digits[:1] in ("x", "X")
                    else int(digits)
                )
                if 0 < cp <= 0x10FFFF:
                    out.append(chr(cp))
                    i = end + 1
                    continue
            except ValueError:
                pass
            out.append(c)
            i += 1
        elif ref in _NAMED_REFS:
            out.append(_NAMED_REFS[ref])
            i = end + 1
        else:
            out.append(c)
            i += 1
    return "".join(out)


def _tag_end(html: str, i: int) -> int:
    """Index just past the ``>`` closing the tag whose ``<`` is at
    ``i``, honoring single/double-quoted attribute values (a ``>``
    inside quotes does not end the tag). -1 if unterminated."""
    n = len(html)
    j = i + 1
    quote = ""
    while j < n:
        c = html[j]
        if quote:
            if c == quote:
                quote = ""
        elif c in ("'", '"'):
            quote = c
        elif c == ">":
            return j + 1
        j += 1
    return -1


def extract_visible_text(html: str) -> str:
    """Visible text of an HTML document: comments and script/style
    elements dropped whole, all other tags stripped (quote-aware),
    character references decoded AFTER stripping, whitespace collapsed
    to single spaces and trimmed. Linear one-pass scan — no regex
    backtracking, so adversarial inputs stay O(n)."""
    out: list[str] = []
    i, n = 0, len(html)
    lower = html.lower()
    while i < n:
        lt = html.find("<", i)
        if lt < 0:
            out.append(html[i:])
            break
        out.append(html[i:lt])
        if html.startswith("<!--", lt):
            close = html.find("-->", lt + 4)
            i = n if close < 0 else close + 3
            continue
        end = _tag_end(html, lt)
        if end < 0:
            break  # unterminated tag: nothing visible past it
        # identify the element name
        j = lt + 1
        if j < n and html[j] == "/":
            j += 1
        k = j
        while k < n and (html[k].isalnum() or html[k] in "-_"):
            k += 1
        name = lower[j:k]
        if name in _RAWTEXT_SKIP and html[lt + 1] != "/":
            close = lower.find("</" + name, end)
            if close < 0:
                break  # unterminated raw-text element
            end2 = _tag_end(html, close)
            i = n if end2 < 0 else end2
            continue
        i = end
    return " ".join(_decode_charrefs("".join(out)).split())


# ---------------------------------------------------------------------------
# main-content extraction (the jusText/Trafilatura stage): block
# segmentation + text-vs-link-density classification
# ---------------------------------------------------------------------------

# Elements whose start OR end tag terminates the current text block —
# the HTML block-level set plus table/list internals. Inline elements
# (<a>, <b>, <span>, ...) do NOT break blocks; that is what makes
# link-density per block meaningful.
_BLOCK_TAGS = frozenset(
    """html head body title h1 h2 h3 h4 h5 h6 p div section article
    main aside nav header footer ul ol li dl dt dd table thead tbody
    tfoot tr td th blockquote pre form fieldset figure figcaption hr
    br address""".split()
)

# Elements whose CONTENT is boilerplate by ROLE, regardless of what it
# says: page chrome (nav/header/footer/aside) and document metadata
# (title). The density rule below catches un-semantic chrome (bare
# <ul> link farms, standalone anchors) — real pages contain both.
_BOILER_ROLE_TAGS = frozenset("title nav header footer aside".split())

# A block is content only if anchor text makes up at most this share
# of its characters (jusText's curve-linked threshold, flattened: our
# planted chrome is ~1.0, article blocks ~0.0, so any mid threshold
# is stable; 0.4 matches the published "mostly links = boilerplate"
# rule of thumb).
MAX_LINK_DENSITY = 0.4


def segment_blocks(html: str) -> list[tuple[str, float, bool]]:
    """Segment an HTML document into visible-text BLOCKS:
    [(text, link_density, role_boiler)] in document order, empty
    blocks dropped. Same lexical rules as extract_visible_text
    (comments and script/style dropped whole, quote-aware tag scan,
    character references decoded after tag stripping, whitespace
    collapsed) — the concatenation of all block texts equals the WET
    text modulo inter-block whitespace. Block boundaries are the
    block-level element set (_BLOCK_TAGS, start and end tags both);
    link_density is the share of the block's characters contributed
    inside <a> elements; role_boiler marks text that accumulated
    inside title/nav/header/footer/aside."""
    blocks: list[tuple[str, float, bool]] = []
    parts: list[str] = []          # raw text runs of the open block
    anchor_parts: list[str] = []   # the subset inside <a>
    role_hit = False               # any run arrived under a boiler role
    a_depth = 0
    role_depth = 0

    def _close() -> None:
        nonlocal parts, anchor_parts, role_hit
        text = " ".join(_decode_charrefs("".join(parts)).split())
        if text:
            atext = " ".join(_decode_charrefs("".join(anchor_parts)).split())
            density = len(atext) / len(text)
            blocks.append((text, density, role_hit))
        parts, anchor_parts, role_hit = [], [], False

    i, n = 0, len(html)
    lower = html.lower()
    while i < n:
        lt = html.find("<", i)
        if lt < 0:
            parts.append(html[i:])
            if a_depth:
                anchor_parts.append(html[i:])
            if role_depth and html[i:].strip():
                role_hit = True
            break
        seg = html[i:lt]
        if seg:
            parts.append(seg)
            if a_depth:
                anchor_parts.append(seg)
            if role_depth and seg.strip():
                role_hit = True
        if html.startswith("<!--", lt):
            close = html.find("-->", lt + 4)
            i = n if close < 0 else close + 3
            continue
        end = _tag_end(html, lt)
        if end < 0:
            break
        j = lt + 1
        closing = j < n and html[j] == "/"
        if closing:
            j += 1
        k = j
        while k < n and (html[k].isalnum() or html[k] in "-_"):
            k += 1
        name = lower[j:k]
        if name in _RAWTEXT_SKIP and not closing:
            close = lower.find("</" + name, end)
            if close < 0:
                break
            end2 = _tag_end(html, close)
            i = n if end2 < 0 else end2
            continue
        if name in _BLOCK_TAGS:
            _close()
            if name in _BOILER_ROLE_TAGS:
                # name-counted depth (not a full tree) — deterministic
                # and right for any non-pathological nesting
                if closing:
                    role_depth = max(0, role_depth - 1)
                elif not html[lt:end].rstrip(">").endswith("/"):
                    role_depth += 1
        elif name == "a":
            if closing:
                a_depth = max(0, a_depth - 1)
            else:
                a_depth += 1
        i = end
    _close()
    return blocks


def classify_blocks(
    blocks: list[tuple[str, float, bool]],
) -> list[tuple[str, bool]]:
    """[(text, is_content)] — a block is CONTENT unless its element
    role is page chrome or its link density exceeds MAX_LINK_DENSITY
    (the two planted boilerplate classes; see q_main_content)."""
    return [
        (text, (not role) and density <= MAX_LINK_DENSITY)
        for text, density, role in blocks
    ]


def extract_main_content(html: str) -> tuple[int, int, str]:
    """(n_blocks, n_content_blocks, main_text) of one document: block
    segmentation + classification, content blocks joined with single
    spaces in document order — the article text a training corpus
    keeps AFTER the WET stage drops markup and BEFORE quality
    filtering scores it."""
    classified = classify_blocks(segment_blocks(html))
    kept = [text for text, is_content in classified if is_content]
    return len(classified), len(kept), " ".join(kept)


# ---------------------------------------------------------------------------
# link extraction (the web-graph stage): attribute parsing + RFC 3986
# relative resolution
# ---------------------------------------------------------------------------

_SCHEME_RE_CHARS = "abcdefghijklmnopqrstuvwxyz0123456789+-."


def _has_scheme(ref: str) -> bool:
    colon = ref.find(":")
    if colon <= 0:
        return False
    head = ref[:colon].lower()
    return head[0].isalpha() and all(c in _SCHEME_RE_CHARS for c in head)


def _remove_dot_segments(path: str) -> str:
    """RFC 3986 5.2.4."""
    out: list[str] = []
    for seg in path.split("/"):
        if seg == ".":
            continue
        if seg == "..":
            if len(out) > 1:
                out.pop()
            continue
        out.append(seg)
    # a trailing '.' / '..' segment keeps the directory slash
    if path.endswith(("/.", "/..")) and (not out or out[-1] != ""):
        out.append("")
    return "/".join(out)


def _split_url(url: str):
    """(scheme, authority | None, path, query) — fragment already
    stripped, userinfo/ports carried inside authority verbatim; None
    authority marks an opaque/path-only reference (``mailto:x``,
    ``x:y/z``), which must round-trip without gaining ``//``."""
    scheme, rest = url.split(":", 1)
    authority: str | None = None
    path, query = "", ""
    if rest.startswith("//"):
        rest = rest[2:]
        cut = len(rest)
        for ch in ("/", "?"):
            p = rest.find(ch)
            if p >= 0:
                cut = min(cut, p)
        authority, rest = rest[:cut], rest[cut:]
    if "?" in rest:
        path, query = rest.split("?", 1)
    else:
        path = rest
    return scheme.lower(), authority, path, query


def _join_url(scheme: str, authority: str | None, path: str, query: str) -> str:
    out = f"{scheme}:{path}" if authority is None else f"{scheme}://{authority}{path}"
    if query:
        out += f"?{query}"
    return out


def resolve_url(base: str, ref: str):
    """RFC 3986 5.2 reference resolution (strict, no fragment in the
    output — WET link extraction targets documents, not anchors).
    Returns the absolute target, or None for refs that aren't
    document links (empty / fragment-only). Cross-validated against
    stdlib urllib.parse.urljoin in tests."""
    ref = ref.split("#", 1)[0]
    if not ref:
        return None
    if _has_scheme(ref):
        s, a, p, q = _split_url(ref)
        # dot-segment removal applies to hierarchical URLs only —
        # an opaque ref (mailto:x, x:y/../z) round-trips verbatim
        return _join_url(s, a, _remove_dot_segments(p) if a is not None else p, q)
    b_scheme, b_auth, b_path, b_query = _split_url(base)
    if ref.startswith("//"):
        s, a, p, q = _split_url(f"{b_scheme}:{ref}")
        return _join_url(b_scheme, a, _remove_dot_segments(p), q)
    if ref.startswith("?"):
        return _join_url(b_scheme, b_auth, b_path, ref[1:])
    if "?" in ref:
        path, query = ref.split("?", 1)
    else:
        path, query = ref, ""
    if path.startswith("/"):
        merged = path
    else:
        # merge with the base directory (RFC 3986 5.3 "merge")
        base_dir = b_path[: b_path.rfind("/") + 1] if "/" in b_path else "/"
        merged = (base_dir or "/") + path
    return _join_url(b_scheme, b_auth, _remove_dot_segments(merged), query)


def _parse_attrs(tag_body: str) -> dict[str, str]:
    """Attribute name -> RAW value (entities not yet decoded) of one
    start tag's interior (name and attrs, no angle brackets). Handles
    double-quoted, single-quoted and unquoted values and bare boolean
    attributes; names fold to lowercase; a DUPLICATED attribute keeps
    its FIRST occurrence (the HTML5 tree-construction rule, matching
    stdlib html.parser — differential-tested)."""
    attrs: dict[str, str] = {}
    i, n = 0, len(tag_body)
    # skip the element name
    while i < n and not tag_body[i].isspace():
        i += 1
    while i < n:
        while i < n and tag_body[i].isspace():
            i += 1
        if i >= n or tag_body[i] == "/":
            break
        j = i
        while j < n and tag_body[j] not in "=/ \t\r\n":
            j += 1
        name = tag_body[i:j].lower()
        i = j
        while i < n and tag_body[i].isspace():
            i += 1
        if i < n and tag_body[i] == "=":
            i += 1
            while i < n and tag_body[i].isspace():
                i += 1
            if i < n and tag_body[i] in "\"'":
                quote = tag_body[i]
                end = tag_body.find(quote, i + 1)
                if end < 0:
                    attrs.setdefault(name, tag_body[i + 1 :])
                    break
                attrs.setdefault(name, tag_body[i + 1 : end])
                i = end + 1
            else:
                j = i
                while j < n and not tag_body[j].isspace():
                    j += 1
                attrs.setdefault(name, tag_body[i:j])
                i = j
        elif name:
            attrs.setdefault(name, "")
    return attrs


_NON_DOCUMENT_SCHEMES = ("javascript:", "mailto:", "tel:", "data:")


def extract_links(html: str, base_url: str) -> list[str]:
    """Absolute link targets of every <a href=...> in document order:
    the web-graph stage (feeds URL-level dedup and link-rank). The
    href value is entity-decoded (attribute values carry &amp; in
    valid HTML) before RFC 3986 resolution against the page URL;
    fragment-only, empty and non-document-scheme (javascript:,
    mailto:, ...) refs are skipped. Comments and script/style bodies
    are skipped with the same rules as extract_visible_text, so a
    commented-out <a> is never an edge."""
    links: list[str] = []
    i, n = 0, len(html)
    lower = html.lower()
    while i < n:
        lt = html.find("<", i)
        if lt < 0:
            break
        if html.startswith("<!--", lt):
            close = html.find("-->", lt + 4)
            i = n if close < 0 else close + 3
            continue
        end = _tag_end(html, lt)
        if end < 0:
            break
        j = lt + 1
        closing = j < n and html[j] == "/"
        if closing:
            j += 1
        k = j
        while k < n and (html[k].isalnum() or html[k] in "-_"):
            k += 1
        name = lower[j:k]
        if name in _RAWTEXT_SKIP and not closing:
            close = lower.find("</" + name, end)
            if close < 0:
                break
            end2 = _tag_end(html, close)
            i = n if end2 < 0 else end2
            continue
        if name == "a" and not closing:
            attrs = _parse_attrs(html[lt + 1 : end - 1])
            href = attrs.get("href")
            if href is not None:
                href = _decode_charrefs(href).strip()
                if href and not href.lower().startswith(
                    _NON_DOCUMENT_SCHEMES
                ):
                    resolved = resolve_url(base_url, href)
                    if resolved is not None:
                        links.append(resolved)
        i = end
    return links


# ---------------------------------------------------------------------------
# archive walk
# ---------------------------------------------------------------------------


def _walk_html_pages(payload: bytes):
    """The shared WET keep-rule walk: all ``200 text/html`` pages of
    one archive as [(record_index, page_url, html)], or None if any
    gzip member, WARC record or HTTP message is structurally corrupt.
    Non-response records, non-200 statuses and non-HTML content types
    are skipped, not errors — that's the keep-rule, not corruption."""
    members = gunzip_members(payload or b"")
    if members is None:
        return None
    pages: list[tuple[int, str, str]] = []
    for r, member in enumerate(members):
        rec = parse_warc_record(member)
        if rec is None:
            return None
        headers, body = rec
        if headers.get("WARC-Type") != "response":
            continue
        http = parse_http_response(body)
        if http is None:
            return None
        status, hhdrs, payload_bytes = http
        if status != 200:
            continue
        ctype = hhdrs.get("content-type", "")
        if not ctype.lower().startswith("text/html"):
            continue
        # charset: Content-Type parameter, else HTML5 meta prescan,
        # else the UTF-8 default; unknown charsets skip the page
        # (keep-rule), a decode ERROR under a declared charset is
        # corruption
        charset = (
            _charset_param(ctype)
            or _sniff_meta_charset(payload_bytes)
            or "utf-8"
        )
        codec = _CODECS.get(charset)
        if codec is None:
            continue
        try:
            doc = payload_bytes.decode(codec)
        except UnicodeDecodeError:
            return None
        pages.append((r, headers.get("WARC-Target-URI", ""), doc))
    return pages


def extract_html_pages(payload: bytes):
    """[(record_index, visible_text)] per kept page, or None on
    structural corruption (see _walk_html_pages)."""
    pages = _walk_html_pages(payload)
    if pages is None:
        return None
    return [(r, extract_visible_text(doc)) for r, _, doc in pages]


def extract_page_links(payload: bytes):
    """[(record_index, [absolute link targets])] per kept page, or
    None on structural corruption. Links resolve against the record's
    WARC-Target-URI (the crawl's statement of where the page lives)."""
    pages = _walk_html_pages(payload)
    if pages is None:
        return None
    return [(r, extract_links(doc, url)) for r, url, doc in pages]


# ---------------------------------------------------------------------------
# Spark stages
# ---------------------------------------------------------------------------

HTML_TEXT_SCHEMA = (
    "media_id long, r int, n_chars long, n_tokens long, text_md5 string"
)
LINKS_SCHEMA = "media_id long, r int, n_links long, links_md5 string"


def synth_warc_html_payloads(media_ids: DataFrame) -> DataFrame:
    """Arrow-batched synth: one crawl-slice .warc.gz per id (shared
    stage scaffold: multimodal.synth_payload_stage)."""
    from .multimodal import synth_payload_stage

    return synth_payload_stage(media_ids, synth_warc_html_gz_bytes)


def warc_html_text_stats(media: DataFrame) -> DataFrame:
    """Arrow-batched WET extraction: one output row per kept page —
    (media_id, record index, visible-text length, whitespace token
    count, md5 of the text). Corrupt archives contribute no rows
    (distinguishable upstream via q_warc_extract's NULL-stats census;
    here the oracle enumerates exactly the keep-rule pages)."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["media_id", "r", "n_chars", "n_tokens", "text_md5"]
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                pages = extract_html_pages(bytes(payload or b""))
                if pages is None:
                    continue
                for r, text in pages:
                    rows.append(
                        (
                            int(mid),
                            int(r),
                            len(text),
                            len(text.split()),
                            hashlib.md5(text.encode("utf-8")).hexdigest(),
                        )
                    )
            yield pd.DataFrame(rows, columns=cols)

    return media.mapInPandas(_extract, HTML_TEXT_SCHEMA)


MAIN_CONTENT_SCHEMA = (
    "media_id long, r int, n_blocks int, n_content int, "
    "main_chars long, main_tokens long, main_md5 string"
)


def main_content_stats(media: DataFrame) -> DataFrame:
    """Arrow-batched main-content extraction: one output row per kept
    page — (media_id, record index, total/content block counts, kept
    text length, whitespace token count, md5 of the kept text).
    Corrupt archives contribute no rows (same contract as
    warc_html_text_stats); the oracle re-derives the kept-block text
    byte-exactly from the id formulas."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [
            "media_id", "r", "n_blocks", "n_content",
            "main_chars", "main_tokens", "main_md5",
        ]
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                pages = _walk_html_pages(bytes(payload or b""))
                if pages is None:
                    continue
                for r, _url, doc in pages:
                    n_blocks, n_content, text = extract_main_content(doc)
                    rows.append(
                        (
                            int(mid),
                            int(r),
                            n_blocks,
                            n_content,
                            len(text),
                            len(text.split()),
                            hashlib.md5(text.encode("utf-8")).hexdigest(),
                        )
                    )
            yield pd.DataFrame(rows, columns=cols)

    return media.mapInPandas(_extract, MAIN_CONTENT_SCHEMA)


MAIN_TEXT_SCHEMA = "media_id long, r int, page_url string, text string"


def main_content_text(media: DataFrame) -> DataFrame:
    """Arrow-batched main-content TEXT extraction — the corpus-bridge
    variant of :func:`main_content_stats` (r14 verdict order #2): one
    row per kept page carrying the page URL and the KEPT text itself,
    (media_id, r, page_url, text), so the crawl chain's output can be
    STAGED as a documents-shaped corpus and fed through the E6
    quality/dedup pipeline. Identical walk, keep rule and extraction
    as main_content_stats (tests difference the two md5-for-md5);
    corrupt archives contribute no rows. 100 TB posture: one map-only
    Arrow pass over opaque binary archives, no shuffle — the text
    column is wider than the stats row, but this pass runs once per
    crawl snapshot and everything downstream is text-keyed anyway."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["media_id", "r", "page_url", "text"]
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                pages = _walk_html_pages(bytes(payload or b""))
                if pages is None:
                    continue
                for r, url, doc in pages:
                    _nb, _nc, text = extract_main_content(doc)
                    rows.append((int(mid), int(r), url, text))
            yield pd.DataFrame(rows, columns=cols)

    return media.mapInPandas(_extract, MAIN_TEXT_SCHEMA)


EDGES_SCHEMA = "media_id long, r int, page_url string, url string"


def warc_edges(media: DataFrame) -> DataFrame:
    """Arrow-batched edge emission: one row per (page, outlink) with
    the page's own URL (the WARC-Target-URI) and the RAW resolved
    target — canonicalization and host extraction are deliberately
    NOT done here but downstream in Spark codegen (q_url_dedup,
    q_host_graph), so the normalize-then-shuffle pattern a 100 TB web
    graph needs stays in the engine, not in Python."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["media_id", "r", "page_url", "url"]
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                pages = _walk_html_pages(bytes(payload or b""))
                if pages is None:
                    continue
                for r, page_url, doc in pages:
                    rows.extend(
                        (int(mid), int(r), page_url, u)
                        for u in extract_links(doc, page_url)
                    )
            yield pd.DataFrame(rows, columns=cols)

    return media.mapInPandas(_extract, EDGES_SCHEMA)


def warc_links_stats(media: DataFrame) -> DataFrame:
    """Arrow-batched web-graph edge extraction: one output row per
    kept page — (media_id, record index, outlink count, md5 of the
    newline-joined absolute targets in document order). Corrupt
    archives contribute no rows; the oracle enumerates the keep-rule
    pages and reconstructs every resolved URL from the id formula."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["media_id", "r", "n_links", "links_md5"]
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                pages = extract_page_links(bytes(payload or b""))
                if pages is None:
                    continue
                for r, links in pages:
                    joined = "\n".join(links)
                    rows.append(
                        (
                            int(mid),
                            int(r),
                            len(links),
                            hashlib.md5(joined.encode("utf-8")).hexdigest(),
                        )
                    )
            yield pd.DataFrame(rows, columns=cols)

    return media.mapInPandas(_extract, LINKS_SCHEMA)


def canonical_url_col(url_col: str = "url"):
    """The E39 safe-core canonical form as a JVM codegen Column —
    the ONE definition of the canonicalization policy, shared by
    q_url_dedup (which documents the RFC 3986 rationale) and the
    q_crawl_frontier normalize path (r14 advice: the two inline
    copies could drift, so the expression now lives only here):
    scheme/host lowercased, default :80/:443 ports stripped, empty
    path -> '/', query params sorted. tests/test_web_frontier.py
    property-tests idempotence and a urllib differential over the
    safe subset."""
    from pyspark.sql import functions as F

    port = f"regexp_extract(parse_url({url_col}, 'AUTHORITY'), ':([0-9]+)$', 1)"
    scheme = f"lower(parse_url({url_col}, 'PROTOCOL'))"
    return F.expr(
        f"{scheme} || '://' || lower(parse_url({url_col}, 'HOST')) || "
        f"CASE WHEN {port} = '' THEN '' "
        f"     WHEN {scheme} = 'http' AND {port} = '80' THEN '' "
        f"     WHEN {scheme} = 'https' AND {port} = '443' THEN '' "
        f"     ELSE ':' || {port} END || "
        f"CASE WHEN parse_url({url_col}, 'PATH') IS NULL "
        f"          OR parse_url({url_col}, 'PATH') = '' THEN '/' "
        f"     ELSE parse_url({url_col}, 'PATH') END || "
        f"CASE WHEN parse_url({url_col}, 'QUERY') IS NULL "
        f"          OR parse_url({url_col}, 'QUERY') = '' THEN '' "
        f"     ELSE '?' || array_join(array_sort(split("
        f"parse_url({url_col}, 'QUERY'), '&')), '&') END"
    )
