"""Mechanical broadcast-hint audit guard (r12, VERDICT r11 item 7).

An explicit ``F.broadcast`` hint cannot be overridden by AQE, so a hint
on a frame whose row count grows with data volume is a guaranteed
driver OOM at the 100 TB design point — the exact regression class the
r10-r12 broadcast-hint audits removed (customer/part/supplier and
derived frames in 16 TPC-H-shape queries, the documents->source lookup
in q_neardup_source_matrix).

This test makes the audit self-enforcing: it AST-walks every package
module, resolves each ``F.broadcast(<frame>)`` argument transitively
through the enclosing function's assignments, and fails if the frame
derives from an SF-growing table without a visible constant bound.

A frame counts as BOUNDED when its defining chain shows one of:
  * a literal frame (``spark.createDataFrame`` / ``spark.range``);
  * ``.limit(k)``;
  * a GLOBAL ``.agg(...)`` (no groupBy -> exactly one row);
  * ``.groupBy(...)`` whose keys all come from constant-cardinality
    domains (event_type, source, op, ... — fixed enumerations in the
    data model, independent of scale factor);
  * an explicit ``# broadcast-bounded: <reason>`` pragma on the
    ``F.broadcast`` line, for bounds the static rules can't see
    (e.g. an equality filter on a unique key). The pragma doubles as
    the audit-doctrine documentation of the constant bound.

Anything else rooted in customer/part/supplier/orders/lineitem/
events/documents/embeddings is flagged. Frames the resolver can't see
through (function parameters, imports) are out of scope — the loads
happen in the query modules this walks.
"""

from __future__ import annotations

import ast
import re
from pathlib import Path

PKG_DIR = (
    Path(__file__).resolve().parent.parent
    / "asafaviv_devops_asafaviv_devops_tidb_cdc_spark"
)

# Tables whose row count scales with SF (TESTDATA.md data model).
GROWING_TABLES = {
    "customer",
    "part",
    "supplier",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
}

# Load idioms that root a frame in a named table.
_LOAD_RE = re.compile(
    r"(?:load_table|_t)\(\s*spark\s*,\s*sf_dir\s*,\s*[\"'](\w+)[\"']"
)
# Package helper loaders that imply a growing table.
_HELPER_LOADS = {
    "_docs(": "documents",
    "_events(": "events",
    "_emb(": "embeddings",
    "_typed(": "events",
    "normalized_sink(": "events",
    "ngram_pair_table(": None,  # materialized pair artifact: grows
}

# Columns drawn from fixed enumerations in the synthetic data model —
# a groupBy on ONLY these keys is constant-cardinality at any SF.
CONSTANT_DOMAIN_COLS = {
    "event_type",
    "source",
    "op",
    "operation",
    "table_name",
    "status",
    "from_type",
    "to_type",
    "label",
    "member_set",
    "bucket",
    "r_name",
    "n_name",
    "cid",  # k-means / IVF centroid id: bounded by the fixed k
    "s",  # PQ sub-space index: bounded by the fixed M
}

_BOUND_LITERALS = ("spark.createDataFrame", "spark.range", "createDataFrame(")
_GROUPBY_RE = re.compile(r"\.groupBy\(([^)]*)\)")
_STR_RE = re.compile(r"[\"'](\w+)[\"']")


def _groupby_keys_constant(segment: str) -> bool:
    """True if every .groupBy in the segment groups only on
    constant-domain string-literal keys."""
    for m in _GROUPBY_RE.finditer(segment):
        args = m.group(1)
        lits = _STR_RE.findall(args)
        # non-literal keys (expressions) or any non-constant literal
        # keep the frame "growing"
        stripped = _STR_RE.sub("", args).replace(",", "").strip()
        if stripped or not lits:
            return False
        if not set(lits) <= CONSTANT_DOMAIN_COLS:
            return False
    return True


class _FnAudit:
    def __init__(self, src: str, fn: ast.AST, relpath: str) -> None:
        self.src = src
        self.relpath = relpath
        self.assigns: dict[str, str] = {}
        for node in ast.walk(fn):
            if isinstance(node, ast.Assign) and len(node.targets) == 1:
                t = node.targets[0]
                if isinstance(t, ast.Name):
                    seg = ast.get_source_segment(src, node.value) or ""
                    self.assigns[t.id] = seg
        self._memo: dict[str, str] = {}

    def classify(self, segment: str, depth: int = 0) -> str:
        """'bounded' | 'growing' | 'unknown' for the frame a source
        segment defines."""
        if depth > 8:
            return "unknown"
        if ".limit(" in segment or any(b in segment for b in _BOUND_LITERALS):
            return "bounded"
        if ".agg(" in segment:
            if ".groupBy(" not in segment:
                return "bounded"  # global aggregate: exactly one row
            if _groupby_keys_constant(segment):
                return "bounded"
        # roots in this segment
        rooted = bool(set(_LOAD_RE.findall(segment)) & GROWING_TABLES) or any(
            h in segment for h in _HELPER_LOADS
        )
        if rooted:
            return "growing"
        # expand referenced names one level
        status = "unknown"
        for name in re.findall(r"\b([A-Za-z_]\w*)\b", segment):
            if name in self.assigns and self.assigns[name] != segment:
                sub = self._memo.get(name)
                if sub is None:
                    self._memo[name] = "unknown"  # cycle guard
                    sub = self.classify(self.assigns[name], depth + 1)
                    self._memo[name] = sub
                if sub == "growing":
                    return "growing"
        return status


def _audit_file(path: Path) -> list[str]:
    src = path.read_text()
    lines = src.splitlines()
    try:
        tree = ast.parse(src)
    except SyntaxError:
        return []
    flags: list[str] = []
    for fn in ast.walk(tree):
        if not isinstance(fn, (ast.FunctionDef, ast.AsyncFunctionDef)):
            continue
        audit = _FnAudit(src, fn, str(path))
        for node in ast.walk(fn):
            if not (
                isinstance(node, ast.Call)
                and isinstance(node.func, ast.Attribute)
                and node.func.attr == "broadcast"
                and node.args
            ):
                continue
            # pragma on the call line or any of the 3 lines above it
            ctx = "\n".join(
                lines[max(0, node.lineno - 4) : node.lineno + 1]
            )
            if "# broadcast-bounded:" in ctx:
                continue
            arg_seg = ast.get_source_segment(src, node.args[0]) or ""
            # resolve a bare name through the function's assignments
            seg = audit.assigns.get(arg_seg, arg_seg)
            if audit.classify(seg) == "growing":
                rel = path.relative_to(PKG_DIR.parent)
                flags.append(f"{rel}:{node.lineno}: F.broadcast({arg_seg})")
    return flags


def test_no_broadcast_hint_on_sf_growing_frames():
    flags: list[str] = []
    for path in sorted(PKG_DIR.rglob("*.py")):
        flags.extend(_audit_file(path))
    assert not flags, (
        "F.broadcast hints on frames derived from SF-growing tables "
        "(driver-OOM scale-killers at 100 TB; drop the hint and let AQE "
        "decide, or document the constant bound with a "
        "'# broadcast-bounded: <reason>' pragma):\n" + "\n".join(flags)
    )
