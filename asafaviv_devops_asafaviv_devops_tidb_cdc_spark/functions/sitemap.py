"""sitemap.xml ingestion (E44) — the discovery-side twin of robots.txt.

A crawl frontier has two URL inflows: links extracted from fetched
pages (E38/E39) and the URLs hosts PUBLISH about themselves —
sitemaps (sitemaps.org protocol: ``<urlset>`` of ``<url>`` entries
with ``<loc>``/``<lastmod>``/``<priority>``, or a ``<sitemapindex>``
of child sitemaps, either possibly gzipped). This module synthesizes
one sitemap tree per host id from pure id formulas (mirrored verbatim
by the DuckDB oracles in queries/web_frontier.py) and parses it back
ENTIRELY in-engine with a generic, namespace-agnostic XML scanner —
CDATA sections, entity references, XML comments/declarations, prefixed
tags and gzip all handled, because real sitemaps carry every one of
those hazards.

Reference surface: none — the reference engine stops at raw CDC rows;
this extends the LLM-pipeline mandate (north-star BASELINE.json).
100 TB posture: sitemaps are O(hosts) not O(pages) — the whole stage
is one Arrow map pass over a bounded host frame, no shuffle; the
output is exactly the discovery feed a frontier unions with its
link-extracted URL stream (q_crawl_frontier).
"""

from __future__ import annotations

import gzip
import hashlib
from collections.abc import Callable, Iterator
from datetime import date, timedelta

import pandas as pd
from pyspark.sql import DataFrame

# ---------------------------------------------------------------------------
# id formulas (mirrored verbatim by the oracle SQL in web_frontier.py)
# ---------------------------------------------------------------------------


def sitemap_url_count(h: int) -> int:
    return h % 6 + 2


def sitemap_is_index(h: int) -> bool:
    return h % 5 == 0


def sitemap_is_gzip(h: int) -> bool:
    return h % 4 == 2


def sitemap_path(h: int, k: int) -> str:
    """Paths chosen to EXERCISE the robots.txt rule set of the same
    host id (functions/robots.py::build_robots_txt): k%4 rotates
    through prefix-disallowed, allow-overridden, wildcard-suffix-hit
    and specific-group-disallowed shapes, so politeness filtering in
    the frontier is load-bearing, branch by branch."""
    v = (h * 13 + k * 11) % 100
    m = k % 4
    if m == 0:
        p = f"/private/doc{v}"          # '*' group: /private/ prefix deny
    elif m == 1:
        p = f"/private/pub{h % 7}/doc{v}"  # longer Allow overrides
    elif m == 2:
        p = f"/w{h % 9}/f{v}.tmp"       # wildcard-suffix deny ('*' group)
    else:
        p = f"/p{h % 5}/doc{v}"         # specific-group deny (h%3==0 only)
    if k % 5 == 0:
        p += f"?y=2&x={v}"              # written XML-escaped (&amp;)
    return p


def sitemap_loc(h: int, k: int) -> str:
    return f"http://site{h}.example" + sitemap_path(h, k)


def sitemap_lastmod(h: int, k: int) -> str | None:
    if (h + k) % 3 == 1:
        return None
    return (date(2024, 1, 1) + timedelta(days=(h * 31 + k * 7) % 365)).isoformat()


def sitemap_priority_tenths(h: int, k: int) -> int | None:
    return k % 10 + 1 if (h + k) % 2 == 0 else None


def sitemap_entries(h: int) -> list[tuple[str, str | None, int | None]]:
    """(loc, lastmod, priority-tenths) per formula entry."""
    return [
        (sitemap_loc(h, k), sitemap_lastmod(h, k), sitemap_priority_tenths(h, k))
        for k in range(sitemap_url_count(h))
    ]


# ---------------------------------------------------------------------------
# synth: formula entries -> sitemap XML tree (with rotating hazards)
# ---------------------------------------------------------------------------


def _xml_escape(s: str) -> str:
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def _loc_value(h: int, raw: str) -> str:
    """CDATA on every 7th-mod-3 host, XML-escaped text otherwise; odd
    hosts pad with whitespace the parser must trim."""
    body = f"<![CDATA[{raw}]]>" if h % 7 == 3 else _xml_escape(raw)
    return f"\n      {body}\n    " if h % 2 == 1 else body


def _urlset_xml(h: int, ks: list[int]) -> str:
    """One <urlset> for the given entry indices; h%3==1 hosts use a
    namespace prefix (parsers must match LOCAL names)."""
    p = "sm:" if h % 3 == 1 else ""
    ns = (
        f'xmlns:{p[:-1]}="http://www.sitemaps.org/schemas/sitemap/0.9"'
        if p
        else 'xmlns="http://www.sitemaps.org/schemas/sitemap/0.9"'
    )
    parts = [
        '<?xml version="1.0" encoding="UTF-8"?>',
        f"<!-- sitemap for site{h}.example -->",
        f"<{p}urlset {ns}>",
    ]
    for k in ks:
        parts.append(f"  <{p}url>")
        parts.append(f"    <{p}loc>{_loc_value(h, sitemap_loc(h, k))}</{p}loc>")
        lm = sitemap_lastmod(h, k)
        if lm is not None:
            parts.append(f"    <{p}lastmod>{lm}</{p}lastmod>")
        pr = sitemap_priority_tenths(h, k)
        if pr is not None:
            txt = "1.0" if pr == 10 else f"0.{pr}"
            parts.append(f"    <{p}priority>{txt}</{p}priority>")
        parts.append(f"  </{p}url>")
    parts.append(f"</{p}urlset>")
    return "\n".join(parts)


def _index_xml(h: int, children: list[str]) -> str:
    p = "sm:" if h % 3 == 1 else ""
    ns = (
        f'xmlns:{p[:-1]}="http://www.sitemaps.org/schemas/sitemap/0.9"'
        if p
        else 'xmlns="http://www.sitemaps.org/schemas/sitemap/0.9"'
    )
    parts = ['<?xml version="1.0" encoding="UTF-8"?>', f"<{p}sitemapindex {ns}>"]
    for child in children:
        parts.append(
            f"  <{p}sitemap><{p}loc>{_xml_escape(child)}</{p}loc></{p}sitemap>"
        )
    parts.append(f"</{p}sitemapindex>")
    return "\n".join(parts)


def _encode(h: int, xml: str) -> bytes:
    data = xml.encode("utf-8")
    if sitemap_is_gzip(h):
        data = gzip.compress(data, compresslevel=1, mtime=0)
    return data


def build_sitemap_files(h: int) -> dict[str, bytes]:
    """path -> file bytes for the host's sitemap tree. Root is always
    '/sitemap.xml'; every 5th host publishes an INDEX whose two
    children split the entries by parity (document order preserved
    within each child)."""
    ks = list(range(sitemap_url_count(h)))
    if sitemap_is_index(h):
        files = {
            "/sitemap.xml": _encode(
                h,
                _index_xml(
                    h,
                    [
                        f"http://site{h}.example/sitemap-0.xml",
                        f"http://site{h}.example/sitemap-1.xml",
                    ],
                ),
            )
        }
        for j in (0, 1):
            files[f"/sitemap-{j}.xml"] = _encode(
                h, _urlset_xml(h, [k for k in ks if k % 2 == j])
            )
        return files
    return {"/sitemap.xml": _encode(h, _urlset_xml(h, ks))}


# ---------------------------------------------------------------------------
# generic parser: bytes -> entries (namespace/CDATA/entity/gzip-proof)
# ---------------------------------------------------------------------------

_ENTITIES = {"amp": "&", "lt": "<", "gt": ">", "quot": '"', "apos": "'"}


def _unescape(s: str) -> str:
    if "&" not in s:
        return s
    out: list[str] = []
    i = 0
    while i < len(s):
        ch = s[i]
        if ch == "&":
            semi = s.find(";", i + 1, i + 12)
            if semi > 0:
                name = s[i + 1 : semi]
                if name in _ENTITIES:
                    out.append(_ENTITIES[name])
                    i = semi + 1
                    continue
                if name.startswith("#"):
                    try:
                        cp = (
                            int(name[2:], 16)
                            if name[1:2] in ("x", "X")
                            else int(name[1:])
                        )
                        out.append(chr(cp))
                        i = semi + 1
                        continue
                    except ValueError:
                        pass
        out.append(ch)
        i += 1
    return "".join(out)


def _local_name(tag: str) -> str:
    return tag.rsplit(":", 1)[-1].lower()


def parse_sitemap(data: bytes):
    """-> ('index', [loc, ...]) | ('urlset', [(loc, lastmod|None,
    priority|None), ...]) | (None, []) for unparseable input.

    A deliberately small streaming scanner instead of a DOM: skips
    the XML declaration, comments and CDATA-aware text capture, keys
    every decision off tag LOCAL names (prefix-agnostic), and ignores
    unknown elements (the must-ignore posture a 100 TB crawl needs —
    real sitemaps carry arbitrary extension tags)."""
    if data[:2] == b"\x1f\x8b":
        try:
            data = gzip.decompress(data)
        except OSError:
            return None, []
    try:
        s = data.decode("utf-8")
    except UnicodeDecodeError:
        return None, []
    kind: str | None = None
    entries: list = []
    locs: list[str] = []
    cur: dict[str, str] = {}
    stack: list[str] = []  # open-element local names (nesting context)
    capture: str | None = None
    buf: list[str] = []
    i = 0
    n = len(s)
    while i < n:
        lt = s.find("<", i)
        if lt < 0:
            break
        if capture is not None and lt > i:
            buf.append(s[i:lt])
        if s.startswith("<!--", lt):
            end = s.find("-->", lt + 4)
            i = n if end < 0 else end + 3
            continue
        if s.startswith("<![CDATA[", lt):
            end = s.find("]]>", lt + 9)
            if end < 0:
                break
            if capture is not None:
                # CDATA content is literal — bypass entity decoding
                cur[capture] = cur.get(capture, "") + s[lt + 9 : end]
            i = end + 3
            continue
        gt = s.find(">", lt + 1)
        if gt < 0:
            break
        tag = s[lt + 1 : gt].strip()
        i = gt + 1
        if not tag or tag[0] in "?!":
            continue
        closing = tag.startswith("/")
        self_closing = tag.endswith("/") and not closing
        name = _local_name(
            tag.lstrip("/").split()[0].rstrip("/") if tag.lstrip("/") else ""
        )
        if not closing:
            parent = stack[-1] if stack else ""
            if not self_closing:
                stack.append(name)
            if name in ("urlset", "sitemapindex") and kind is None:
                kind = "urlset" if name == "urlset" else "index"
            elif name in ("url", "sitemap"):
                cur = {}
            elif (
                name in ("loc", "lastmod", "priority")
                and parent in ("url", "sitemap")
                and not self_closing
            ):
                # only DIRECT children of an entry: extension payloads
                # (image:/video: sitemap extensions nest their own
                # <loc>) must not leak into the entry's fields
                capture = name
                buf = []
            continue
        # closing tag
        if stack and stack[-1] == name:
            stack.pop()
        if name == capture:
            text = _unescape("".join(buf)).strip()
            cur[name] = cur.get(name, "") + text if name in cur else text
            capture = None
            buf = []
        elif name in ("url", "sitemap"):
            if "loc" in cur:
                if name == "sitemap":
                    locs.append(cur["loc"].strip())
                else:
                    entries.append(
                        (
                            cur["loc"].strip(),
                            cur.get("lastmod"),
                            cur.get("priority"),
                        )
                    )
            cur = {}
    if kind == "index":
        return kind, locs
    if kind == "urlset":
        return kind, entries
    return None, []


def walk_sitemap(
    root: bytes, fetch: Callable[[str], bytes | None]
) -> tuple[int, list]:
    """Resolve a sitemap tree: parse the root; for an index, fetch
    each child by its loc PATH and collect its entries (one level —
    the protocol forbids nested indexes). Returns (n_files, entries).
    Unfetchable or unparseable children contribute no entries (the
    crawl must degrade, not die)."""
    kind, payload = parse_sitemap(root)
    if kind == "urlset":
        return 1, payload
    if kind != "index":
        return 1, []
    n_files = 1
    entries: list = []
    for loc in payload:
        slash = loc.find("/", loc.find("://") + 3) if "://" in loc else 0
        path = loc[slash:] if slash > 0 else loc
        child = fetch(path)
        if child is None:
            continue
        n_files += 1
        ckind, centries = parse_sitemap(child)
        if ckind == "urlset":
            entries.extend(centries)
    return n_files, entries


# ---------------------------------------------------------------------------
# Spark stages
# ---------------------------------------------------------------------------

SITEMAP_SCHEMA = (
    "media_id long, n_files int, n_urls int, n_lastmod int, "
    "max_lastmod string, prio_tenths int, urls_md5 string"
)


def _priority_tenths(text: str | None) -> int:
    if not text:
        return 0
    try:
        return int(round(float(text) * 10))
    except ValueError:
        return 0


def sitemap_census_stats(media_ids: DataFrame) -> DataFrame:
    """Arrow-batched discovery census: synth + walk + reduce in one
    map pass — per host the file count, URL count, lastmod coverage
    and max, total priority tenths, and the md5 of the sorted raw URL
    set (proves exact parse: escaping, CDATA, gzip, index recursion
    and trimming must all be right or the hash drifts)."""

    def _census(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [
            "media_id", "n_files", "n_urls", "n_lastmod",
            "max_lastmod", "prio_tenths", "urls_md5",
        ]
        for pdf in batches:
            rows = []
            for mid in pdf["media_id"]:
                h = int(mid)
                files = build_sitemap_files(h)
                n_files, entries = walk_sitemap(
                    files["/sitemap.xml"], files.get
                )
                urls = sorted(e[0] for e in entries)
                lastmods = [e[1] for e in entries if e[1]]
                rows.append(
                    (
                        h,
                        n_files,
                        len(entries),
                        len(lastmods),
                        max(lastmods) if lastmods else None,
                        sum(_priority_tenths(e[2]) for e in entries),
                        hashlib.md5("\n".join(urls).encode()).hexdigest(),
                    )
                )
            yield pd.DataFrame(rows, columns=cols)

    from .multimodal import _synth_parts

    sc = media_ids.sparkSession.sparkContext
    return media_ids.select("media_id").repartition(_synth_parts(sc)).mapInPandas(
        _census, SITEMAP_SCHEMA
    )


def sitemap_candidates_stage(hosts: DataFrame) -> DataFrame:
    """(host_id long) -> (host_id, url) discovered URLs, one Arrow map
    pass over the O(hosts) frame. In this synth world building the
    tree IS the fetch; a real frontier swaps build_sitemap_files for
    an HTTP fetch cache and keeps the identical walk."""

    def _expand(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for hid in pdf["host_id"]:
                h = int(hid)
                files = build_sitemap_files(h)
                _, entries = walk_sitemap(files["/sitemap.xml"], files.get)
                rows.extend((h, e[0]) for e in entries)
            yield pd.DataFrame(rows, columns=["host_id", "url"])

    return hosts.select("host_id").mapInPandas(
        _expand, "host_id long, url string"
    )
