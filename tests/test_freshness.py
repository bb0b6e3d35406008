"""Gate-window freshness invariants (r7 verdict item 4).

The driver re-proves a 50-query prefix of the registry per round. These
tests make the window compose itself — a repeat of the round-6
32-query never-checked backlog, or the round-7/8 discovery that
hand-tracking missed rewritten paths, becomes a red test instead of a
judge finding:

1. every never-driver-checked query must hold a window slot;
2. every query whose function-granular reference closure changed since
   its verdict-round commit (scripts/freshness.py) must hold one;
3. the remaining rotation slots must take the OLDEST verdicts — a
   query may be left outside only if it ties the oldest round inside
   (window capacity), never skipped past.

The analysis shells out to git and parses every package module at HEAD
plus one tree per verdict round, so it is session-scoped and shared.
"""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "scripts"))

import freshness  # noqa: E402

from asafaviv_devops_asafaviv_devops_tidb_cdc_spark import registry  # noqa: E402

WINDOW_SIZE = 50


@pytest.fixture(scope="session")
def ledger():
    registry.load_all()
    names = list(registry.QUERIES)
    verdicts = freshness.latest_verdicts()
    changed = freshness.changed_queries(verdicts=verdicts)
    return names, verdicts, changed


def test_registry_window_is_full_and_unique(ledger):
    names, _, _ = ledger
    window = names[:WINDOW_SIZE]
    assert len(window) == WINDOW_SIZE
    assert len(set(window)) == WINDOW_SIZE


def test_never_checked_queries_hold_window_slots(ledger):
    names, verdicts, _ = ledger
    window = set(names[:WINDOW_SIZE])
    never = [n for n in names if n not in verdicts]
    missing = [n for n in never if n not in window]
    assert not missing, (
        f"{len(missing)} never-driver-checked queries are outside the "
        f"gate window — move them into registry._CHECK_FIRST: {missing}"
    )


def test_changed_paths_hold_window_slots(ledger):
    """A query rewritten after its latest verdict must be re-proven in
    the very next window (the r6/r7 stale-path failure mode)."""
    names, _, changed = ledger
    window = set(names[:WINDOW_SIZE])
    missing = sorted(n for n in changed if n not in window)
    assert not missing, (
        f"{len(missing)} queries changed since their latest driver "
        f"verdict but are outside the gate window — "
        f"run `python scripts/freshness.py` and move them into "
        f"registry._CHECK_FIRST: {missing}"
    )


def test_window_fits_all_must_haves(ledger):
    names, verdicts, changed = ledger
    must = {n for n in names if n not in verdicts} | set(changed)
    assert len(must) <= WINDOW_SIZE, (
        f"{len(must)} must-have queries (never-checked + changed-path) "
        f"exceed the {WINDOW_SIZE}-slot window; split the re-proof "
        f"across rounds explicitly instead of silently dropping"
    )


def test_rotation_slots_take_oldest_verdicts(ledger):
    """Non-must-have window slots rotate the stalest verdicts: no query
    outside the window may be strictly older than a rotation slot
    inside it (ties — window capacity — are the only allowed reason to
    stay out). With ~240 queries and 50 slots this bounds verdict age at
    ~5 rounds in steady state and makes the next window composition
    mechanical."""
    names, verdicts, changed = ledger
    window = names[:WINDOW_SIZE]
    must = {n for n in names if n not in verdicts} | set(changed)
    rotation_rounds = [verdicts[n][0] for n in window if n not in must]
    if not rotation_rounds:
        return  # window fully consumed by must-haves
    newest_inside = max(rotation_rounds)
    outside = [n for n in names[WINDOW_SIZE:] if n not in must]
    skipped = sorted(
        n for n in outside if verdicts[n][0] < newest_inside
    )
    assert not skipped, (
        f"rotation skipped older verdicts: {skipped} are older than a "
        f"rotation slot inside the window (r{newest_inside}); reorder "
        f"registry._CHECK_FIRST oldest-first"
    )
