"""robots.txt parsing + RFC 9309 allow/disallow evaluation (the
crawl-politeness layer of a web-corpus pipeline).

Every crawl that feeds a 100 TB corpus decides per (host, path)
whether fetching is permitted BEFORE any byte moves: parse the host's
robots.txt into user-agent groups, select the most specific group for
the crawler's product token (exact token match beats ``*``), then per
path apply the longest-prefix-match rule — the rule whose pattern
matches with the most octets wins, an Allow beats a Disallow of equal
length, ``*`` matches any character run, ``$`` anchors the pattern
end, no match means allowed. Crawl-delay (non-standard but ubiquitous)
rides on the selected group.

The synth builds one robots.txt per id from formulas — group presence,
rule paths, delays, header case, line endings, comments and multi-UA
group headers all rotate — and the oracle re-derives every verdict
from the same formulas in SQL, so group selection, longest-match,
allow-tie-break and wildcard matching must all be real for the gate to
pass. Reference surface: none (the reference engine stops at CDC
rows); this extends the LLM-pipeline/web-corpus mandate like E36-E40.
100 TB posture: robots bodies are small per-host strings; the whole
stage is one Arrow map pass with no shuffle — at scale the output is
exactly the per-host politeness table a crawl frontier broadcasts.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

# the crawler's product token (RFC 9309 calls this the user-agent
# product token; matching is case-insensitive)
AGENT = "trainbot"

# ---------------------------------------------------------------------------
# id formulas (mirrored verbatim by the oracle SQL in llm_pipeline.py)
# ---------------------------------------------------------------------------


def robots_allow_id(media_id: int) -> int:
    return media_id % 7


def robots_specific_path_id(media_id: int) -> int:
    return media_id % 5


def robots_wildcard_id(media_id: int) -> int:
    return media_id % 9


def robots_star_delay(media_id: int) -> int | None:
    d = media_id % 4
    return d if d > 0 else None


def robots_has_specific(media_id: int) -> bool:
    return media_id % 3 == 0


def robots_specific_delay(media_id: int) -> int | None:
    return media_id % 6 if media_id % 2 == 0 else None


def build_robots_txt(media_id: int) -> str:
    """One synthetic robots.txt: a ``*`` group with prefix, nested
    allow-override and wildcard-suffix rules (plus a rotating
    crawl-delay), and on every third id a specific group for AGENT
    (whose presence must make the ``*`` group irrelevant). Header
    case, comments, blank lines, stray spaces, a multi-user-agent
    group header and CRLF-vs-LF all rotate — the grammar hazards real
    robots files carry."""
    a = robots_allow_id(media_id)
    b = robots_specific_path_id(media_id)
    c = robots_wildcard_id(media_id)
    ua = "User-Agent" if media_id % 2 == 0 else "user-agent"
    lines = [
        f"# robots for host site{media_id}",
        f"{ua}: *",
        "Disallow: /private/",
        f"Allow: /private/pub{a}/",
        f"disallow: /w{c}/*.tmp",
    ]
    d = robots_star_delay(media_id)
    if d is not None:
        lines.append(f"Crawl-delay: {d}")
    if robots_has_specific(media_id):
        lines += ["", "# group for our crawler", f"{ua}: TrainBot"]
        if media_id % 9 == 0:
            lines.append(f"{ua}: otherbot")  # multi-UA group header
        lines += [f"Disallow: /p{b}/", f"Allow:  /p{b}/ok/"]
        sd = robots_specific_delay(media_id)
        if sd is not None:
            lines.append(f"crawl-delay: {sd}")
    eol = "\r\n" if media_id % 2 == 1 else "\n"
    return eol.join(lines) + eol


def probe_paths(media_id: int) -> list[str]:
    """The five formula probe paths; each exercises one decision
    branch (see q_robots_policy)."""
    a = robots_allow_id(media_id)
    b = robots_specific_path_id(media_id)
    c = robots_wildcard_id(media_id)
    return [
        f"/private/x{media_id % 10}",                       # prefix disallow
        f"/private/pub{a}/f",                               # allow overrides
        (f"/p{b}/ok/f" if media_id % 4 < 2 else f"/p{b}/z"),  # specific group
        f"/w{c}/a.tmp",                                     # wildcard suffix
        f"/w{c}/a.txt",                                     # wildcard miss
    ]


# ---------------------------------------------------------------------------
# RFC 9309 parser + matcher
# ---------------------------------------------------------------------------


def parse_robots_txt(text: str) -> dict[str, dict]:
    """user-agent token (lowercased) -> {'rules': [(allow: bool,
    pattern: str)], 'crawl_delay': int | None}. Grammar per RFC 9309
    2.2: lines are ``key: value`` with ``#`` comments stripped, keys
    case-insensitive; consecutive user-agent lines open ONE group
    whose rules apply to every named token; a user-agent line after
    rules starts a new group. Unknown keys and malformed lines are
    skipped (the spec's must-ignore rule). Crawl-delay attaches to
    every token of the current group."""
    groups: dict[str, dict] = {}
    current: list[str] = []
    in_header = False
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line:
            continue
        key, sep, value = line.partition(":")
        if not sep:
            continue
        key = key.strip().lower()
        value = value.strip()
        if key == "user-agent":
            token = value.lower()
            if in_header:
                current.append(token)
            else:
                current = [token]
                in_header = True
            groups.setdefault(token, {"rules": [], "crawl_delay": None})
            continue
        in_header = False
        if key in ("allow", "disallow"):
            if value:  # an empty pattern matches nothing (RFC 2.2.2)
                for token in current:
                    groups[token]["rules"].append((key == "allow", value))
        elif key == "crawl-delay":
            try:
                delay = int(value)
            except ValueError:
                continue
            for token in current:
                groups[token]["crawl_delay"] = delay
    return groups


def _pattern_matches(pattern: str, path: str) -> bool:
    """RFC 9309 2.2.3 matching: the pattern anchors at the path start,
    ``*`` matches any run of characters, ``$`` (only meaningful at the
    pattern end) anchors the path end. Leftmost-greedy segment scan —
    optimal without backtracking because matching each literal segment
    as early as possible leaves maximal room for the rest; for an
    anchored pattern the LAST segment pins to the path end and the
    middle segments scan under that bound. Linear in practice
    (patterns are short and real robots rarely nest many stars).
    Differentially tested against a regex translation of the same
    grammar."""
    anchored = pattern.endswith("$")
    if anchored:
        pattern = pattern[:-1]
        if pattern.endswith("*"):
            anchored = False  # a '*$' tail matches anything to the end
    segs = pattern.split("*")
    head = segs[0]
    if not path.startswith(head):
        return False
    pos = len(head)
    middles = [s for s in segs[1:] if s]  # '' from '**' matches nothing
    if anchored:
        if len(segs) == 1:
            return pos == len(path)  # no '*': exact match required
        if middles:
            last = middles.pop()
        else:  # pattern like 'a*$' already de-anchored; 'a*' + '' tail
            return True
        end_limit = len(path) - len(last)
        if end_limit < pos or not path.endswith(last):
            return False
        for seg in middles:
            hit = path.find(seg, pos, end_limit)
            if hit < 0:
                return False
            pos = hit + len(seg)
        return pos <= end_limit
    for seg in middles:
        hit = path.find(seg, pos)
        if hit < 0:
            return False
        pos = hit + len(seg)
    return True


def select_group(groups: dict[str, dict], agent: str = AGENT) -> tuple[str, dict]:
    """('specific' | 'wildcard', group). Exact product-token match
    wins over '*'; a host with neither yields an implicit empty group
    (everything allowed, no delay)."""
    agent = agent.lower()
    if agent in groups:
        return "specific", groups[agent]
    if "*" in groups:
        return "wildcard", groups["*"]
    return "wildcard", {"rules": [], "crawl_delay": None}


def is_allowed(group: dict, path: str) -> bool:
    """Longest-match evaluation: among matching rules the one with the
    most pattern octets wins; equal lengths -> Allow; no match ->
    allowed."""
    best_len = -1
    best_allow = True
    for allow, pattern in group["rules"]:
        if _pattern_matches(pattern, path):
            plen = len(pattern)
            if plen > best_len or (plen == best_len and allow):
                best_len = plen
                best_allow = allow
    return best_allow


# ---------------------------------------------------------------------------
# Spark stage
# ---------------------------------------------------------------------------

ROBOTS_SCHEMA = (
    "media_id long, agent_group string, n_rules int, crawl_delay int, "
    "allow_mask int, n_allowed int"
)


def robots_policy_stats(media_ids: DataFrame) -> DataFrame:
    """Arrow-batched politeness census: synth + parse + evaluate in
    one map pass — per host the selected group kind, its rule count
    and crawl-delay, and the five formula probes' verdicts as a bitmap
    (bit i = probe i allowed) with their popcount."""

    def _eval(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [
            "media_id", "agent_group", "n_rules", "crawl_delay",
            "allow_mask", "n_allowed",
        ]
        for pdf in batches:
            rows = []
            for mid in pdf["media_id"]:
                mid = int(mid)
                groups = parse_robots_txt(build_robots_txt(mid))
                kind, group = select_group(groups)
                mask = 0
                for i, path in enumerate(probe_paths(mid)):
                    if is_allowed(group, path):
                        mask |= 1 << i
                rows.append(
                    (
                        mid,
                        kind,
                        len(group["rules"]),
                        group["crawl_delay"],
                        mask,
                        bin(mask).count("1"),
                    )
                )
            yield pd.DataFrame(rows, columns=cols).astype(
                {"crawl_delay": "object"}
            )

    from .multimodal import _synth_parts

    n_parts = _synth_parts(media_ids.sparkSession.sparkContext)
    return media_ids.select("media_id").repartition(n_parts).mapInPandas(
        _eval, ROBOTS_SCHEMA
    )


# ---------------------------------------------------------------------------
# frontier surface (E43): the selected group as DATA, so politeness
# evaluation can run JVM-side against an arbitrary URL stream
# ---------------------------------------------------------------------------


def pattern_regex(pattern: str) -> str:
    """Translate an RFC 9309 rule pattern to an anchored regex with
    IDENTICAL match semantics to _pattern_matches: '*' -> '.*', a
    terminal '$' anchors, everything else is literal. Emitted with
    per-character escaping so the same string compiles under both
    java.util.regex (Spark ``rlike``) and Python ``re`` — the
    property-test differential in tests/test_robots.py holds the two
    matchers and this translation together."""
    import re as _re

    anchored = pattern.endswith("$")
    if anchored:
        pattern = pattern[:-1]
        if pattern.endswith("*"):
            anchored = False
    body = ".*".join(_re.escape(seg) for seg in pattern.split("*"))
    return "^" + body + ("$" if anchored else "")


RULES_SCHEMA = (
    "host_id long, agent_group string, crawl_delay int, "
    "rules array<struct<allow: boolean, plen: int, rx: string>>"
)


def robots_rules_stage(hosts: DataFrame) -> DataFrame:
    """(host_id long) -> per-host politeness row: the group selected
    for AGENT flattened to (allow, pattern-octets, regex) triples plus
    its crawl-delay. One Arrow map pass over the O(hosts) frame — the
    output is the small table a frontier BROADCASTS against its URL
    stream, with longest-match evaluation left to JVM codegen
    (aggregate/filter over the rules array; see q_crawl_frontier)."""

    def _rules(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["host_id", "agent_group", "crawl_delay", "rules"]
        for pdf in batches:
            rows = []
            for hid in pdf["host_id"]:
                h = int(hid)
                kind, group = select_group(parse_robots_txt(build_robots_txt(h)))
                rows.append(
                    (
                        h,
                        kind,
                        group["crawl_delay"],
                        [
                            (allow, len(pat), pattern_regex(pat))
                            for allow, pat in group["rules"]
                        ],
                    )
                )
            yield pd.DataFrame(rows, columns=cols).astype(
                {"crawl_delay": "object"}
            )

    return hosts.select("host_id").mapInPandas(_rules, RULES_SCHEMA)
