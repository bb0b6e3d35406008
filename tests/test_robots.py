"""robots.txt parsing + RFC 9309 evaluation (functions/robots.py):
grammar hazards, longest-match/wildcard/anchor matching semantics
(including the RFC's own examples), group selection, and the synth
formula roundtrip that the q_robots_policy oracle mirrors."""

from __future__ import annotations

from asafaviv_devops_asafaviv_devops_tidb_cdc_spark.functions import robots as R


def _verdict(body: str, path: str, agent: str = "trainbot") -> bool:
    _, group = R.select_group(R.parse_robots_txt(body), agent)
    return R.is_allowed(group, path)


def test_parser_grammar_hazards():
    body = (
        "# leading comment\r\n"
        "USER-AGENT: *   # trailing comment\r\n"
        "\r\n"
        "Disallow: /a/\r\n"
        "allow:/a/b/\r\n"
        "Crawl-Delay: 7\r\n"
        "bogus-key: ignored\r\n"
        "not a directive line\r\n"
        "Disallow:\r\n"  # empty pattern: matches nothing
    )
    groups = R.parse_robots_txt(body)
    assert set(groups) == {"*"}
    assert groups["*"]["rules"] == [(False, "/a/"), (True, "/a/b/")]
    assert groups["*"]["crawl_delay"] == 7


def test_multi_user_agent_group_header():
    body = (
        "User-agent: alpha\n"
        "User-agent: beta\n"
        "Disallow: /x/\n"
        "\n"
        "User-agent: *\n"
        "Disallow: /\n"
    )
    groups = R.parse_robots_txt(body)
    # both tokens of the shared header get the group's rules
    assert groups["alpha"]["rules"] == [(False, "/x/")]
    assert groups["beta"]["rules"] == [(False, "/x/")]
    assert groups["*"]["rules"] == [(False, "/")]
    # a user-agent line AFTER rules starts a NEW group
    assert not _verdict(body, "/x/f", "beta")
    assert _verdict(body, "/y", "beta")


def test_group_selection_specific_beats_star():
    body = "User-agent: *\nDisallow: /\n\nUser-agent: TrainBot\nAllow: /\n"
    kind, group = R.select_group(R.parse_robots_txt(body))
    assert kind == "specific"
    assert R.is_allowed(group, "/anything")
    # absent both: implicit empty group allows everything
    kind, group = R.select_group({}, "nobody")
    assert kind == "wildcard" and R.is_allowed(group, "/x")


def test_longest_match_and_allow_tiebreak():
    group = {
        "rules": [(False, "/p/"), (True, "/p/ok/")],
        "crawl_delay": None,
    }
    assert not R.is_allowed(group, "/p/z")
    assert R.is_allowed(group, "/p/ok/z")  # longer Allow wins
    # equal length: Allow wins regardless of order
    tie = {"rules": [(False, "/page"), (True, "/page")], "crawl_delay": None}
    assert R.is_allowed(tie, "/page/1")
    tie["rules"].reverse()
    assert R.is_allowed(tie, "/page/1")
    # no matching rule: allowed
    assert R.is_allowed(group, "/elsewhere")


def test_rfc9309_wildcard_and_anchor_examples():
    m = R._pattern_matches
    # RFC 9309 2.2.3 example set for /foo/bar?baz=quz-ish patterns
    assert m("/foo/bar", "/foo/bar/baz")
    assert m("/foo/*/bar", "/foo/a/b/bar")
    assert not m("/foo/*/bar", "/foo/bar")
    assert m("/*.php", "/index.php")
    assert m("/*.php", "/folder/any.php.html")
    assert not m("/*.php$", "/any.php.html")
    assert m("/*.php$", "/folder/page.php")
    assert m("/fish*.php", "/fishheads/catfish.php?p=1")
    assert not m("/fish*.php", "/fish.html")
    # trailing * makes the $ vacuous; bare * matches everything
    assert m("/a*$", "/a/very/long")
    assert m("*", "/")
    # anchor must bind at the end
    assert m("/exact$", "/exact")
    assert not m("/exact$", "/exactly")
    # consecutive stars collapse
    assert m("/a**b", "/aXXb")


def test_formula_roundtrip_matches_oracle_constants():
    for mid in list(range(120)) + [9999, 54322]:
        groups = R.parse_robots_txt(R.build_robots_txt(mid))
        kind, group = R.select_group(groups)
        mask = 0
        for i, path in enumerate(R.probe_paths(mid)):
            if R.is_allowed(group, path):
                mask |= 1 << i
        if mid % 3 == 0:
            assert kind == "specific"
            assert len(group["rules"]) == 2
            assert group["crawl_delay"] == (mid % 6 if mid % 2 == 0 else None)
            assert mask == 27 + (4 if mid % 4 < 2 else 0)
        else:
            assert kind == "wildcard"
            assert len(group["rules"]) == 3
            assert group["crawl_delay"] == (mid % 4 if mid % 4 > 0 else None)
            assert mask == 22


def test_stage_in_spark(spark):
    from asafaviv_devops_asafaviv_devops_tidb_cdc_spark import registry

    registry.load_all()
    df = registry.QUERIES["q_robots_policy"](spark, "/root/testdata/sf0.001")
    rows = df.collect()
    assert len(rows) > 50
    for row in rows[:20]:
        mid = row["media_id"]
        if mid % 3 == 0:
            assert row["agent_group"] == "specific"
            assert row["n_allowed"] == 4 + (1 if mid % 4 < 2 else 0)
        else:
            assert row["agent_group"] == "wildcard"
            assert row["allow_mask"] == 22
        if mid % 3 != 0 and mid % 4 == 0:
            assert row["crawl_delay"] is None


import re as _re

from hypothesis import given, settings, strategies as st

_PATH_CHARS = "abc/0.$*"


def _ref_match(pattern: str, path: str) -> bool:
    """Reference matcher: translate the RFC 9309 pattern to a regex
    (* -> .*, trailing $ -> end anchor, everything else literal) and
    test for a match at the path start."""
    anchored = pattern.endswith("$")
    body = pattern[:-1] if anchored else pattern
    rx = "".join(".*" if c == "*" else _re.escape(c) for c in body)
    rx = rx + r"\Z" if anchored else rx
    return _re.match(rx, path) is not None


@settings(max_examples=400, deadline=None)
@given(
    pattern=st.text(alphabet=_PATH_CHARS, min_size=1, max_size=12),
    path=st.text(alphabet="abc/0.", min_size=0, max_size=16),
)
def test_pattern_matches_regex_differential(pattern, path):
    """The hand-rolled wildcard matcher must agree with a regex
    translation of the same RFC 9309 pattern grammar on every input
    (a mid-pattern $ is a literal in both — only the final char
    anchors)."""
    # mid-pattern '$' is literal per RFC; our matcher treats only the
    # trailing one specially, and so does the reference
    if "$" in pattern[:-1]:
        pattern = pattern.replace("$", "", pattern.count("$") - 1) \
            if pattern.endswith("$") else pattern.replace("$", "")
    assert R._pattern_matches(pattern, path) == _ref_match(pattern, path), (
        pattern, path,
    )
