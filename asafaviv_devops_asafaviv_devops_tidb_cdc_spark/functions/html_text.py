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


def html_token(media_id: int, r: int, k: int) -> str:
    v = (media_id * 7 + r * 13 + k * 3) % 1000
    # every 5th token arrives entity-encoded in the HTML and must
    # decode to a literal <tokV> in the extracted text
    return f"<tok{v}>" if k % 5 == 0 else f"tok{v}"


def expected_visible_text(media_id: int, r: int) -> str:
    toks = " ".join(
        html_token(media_id, r, k) for k in range(html_token_count(media_id))
    )
    return (
        f"Doc {media_id} {r} Doc & {media_id} {toks} "
        f'link {media_id} @end "q"'
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
    return (
        "<!DOCTYPE html>\n"
        f"<html><head><title>Doc {media_id} {r}</title>\n"
        f"<style type=\"text/css\">body {{ color: #fff; }} /* s{media_id} */</style>\n"
        f"<script>if ({media_id} < 3) {{ document.write(\"<p>hidden</p>\"); }}</script>\n"
        "</head>\n<body>\n"
        f"<!-- hidden {media_id} <p>not text</p> -->\n"
        f"<H1>Doc &amp; {media_id}</H1>\n"
        f"<p id=\"c{r}\">{toks}</p>\n"
        f"<a href=\"/u?a=1&amp;b\" title=\"t>u\">link {media_id}</a>\n"
        "<p>&#64;end &quot;q&quot;</p>\n"
        "</body></html>\n"
    )


def build_http_response(media_id: int, r: int) -> bytes:
    """One HTTP/1.1 response message: formula status (404 rotates in),
    formula content type (application/pdf rotates in), header-name
    case rotating lower on odd records (header names are
    case-insensitive per RFC 9110 and real crawls mix them)."""
    if html_is_html(media_id, r):
        body = build_page_html(media_id, r).encode("utf-8")
        ctype = "text/html; charset=utf-8"
    else:
        body = b"%PDF-1.4 " + bytes(
            (media_id + r * 13 + j * 7) % 256 for j in range(32)
        )
        ctype = "application/pdf"
    status = "200 OK" if html_is_ok(media_id, r) else "404 Not Found"
    ct_name = "content-type" if r % 2 == 1 else "Content-Type"
    cl_name = "content-length" if r % 2 == 1 else "Content-Length"
    head = (
        f"HTTP/1.1 {status}\r\n"
        f"{ct_name}: {ctype}\r\n"
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
# archive walk
# ---------------------------------------------------------------------------


def extract_html_pages(payload: bytes):
    """All ``200 text/html`` pages of one archive as
    [(record_index, visible_text)], or None if any gzip member, WARC
    record or HTTP message is structurally corrupt. Non-response
    records, non-200 statuses and non-HTML content types are skipped,
    not errors — that's the WET keep-rule, not corruption."""
    members = gunzip_members(payload or b"")
    if members is None:
        return None
    pages: list[tuple[int, str]] = []
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
        try:
            doc = payload_bytes.decode("utf-8")
        except UnicodeDecodeError:
            return None
        pages.append((r, extract_visible_text(doc)))
    return pages


# ---------------------------------------------------------------------------
# Spark stages
# ---------------------------------------------------------------------------

HTML_TEXT_SCHEMA = (
    "media_id long, r int, n_chars long, n_tokens long, text_md5 string"
)


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
