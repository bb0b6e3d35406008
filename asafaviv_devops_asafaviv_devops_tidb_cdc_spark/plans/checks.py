"""Physical-plan introspection: assert the plan SHAPE we designed for,
not just the result. A correct answer computed through a cartesian
product or a full-column scan is a 100 TB regression that row-hash
correctness checks can't see; tests/test_plan_shape.py pins these.
"""

from __future__ import annotations

import contextlib
import io
import re

from pyspark.sql import DataFrame


def plan_string(df: DataFrame, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def uses_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in plan_string(df)


def has_cartesian(df: DataFrame) -> bool:
    return "CartesianProduct" in plan_string(df)


def is_adaptive(df: DataFrame) -> bool:
    return "AdaptiveSparkPlan" in plan_string(df)


def count_nodes(df: DataFrame, op: str) -> int:
    """Distinct physical nodes whose name starts with ``op`` (formatted
    mode prints each node in the tree AND in a detail block — counting
    raw substrings double-counts)."""
    plan = plan_string(df)
    return len(set(re.findall(rf"\((\d+)\) {re.escape(op)}", plan)))


def pushed_filters(df: DataFrame) -> list[str]:
    """All non-empty PushedFilters entries across the plan's scans."""
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan_string(df)):
        if m.group(1).strip():
            out.append(m.group(1).strip())
    return out


def _struct_body(text: str) -> str:
    """The bracket-balanced body of the leading ``struct<...>``."""
    assert text.startswith("struct<")
    depth = 0
    for i, ch in enumerate(text[6:], start=6):
        if ch == "<":
            depth += 1
        elif ch == ">":
            depth -= 1
            if depth == 0:
                return text[7:i]
    return text[7:]


def _top_level_fields(body: str) -> list[str]:
    """Split ``a:string,b:struct<c:int,d:int>`` on TOP-LEVEL commas only
    — naive split would invent fields from inside nested types."""
    fields, depth, start = [], 0, 0
    for i, ch in enumerate(body):
        if ch == "<":
            depth += 1
        elif ch == ">":
            depth -= 1
        elif ch == "," and depth == 0:
            fields.append(body[start:i])
            start = i + 1
    if body[start:].strip():
        fields.append(body[start:])
    return fields


def scan_columns(df: DataFrame, path_fragment: str) -> set[str]:
    """Columns actually read (ReadSchema) by the parquet scan whose
    Location contains ``path_fragment`` — the column-pruning witness."""
    plan = plan_string(df)
    cols: set[str] = set()
    # formatted mode prints one "(N) Scan parquet" block per source with
    # Location and ReadSchema lines
    for block in re.split(r"\n\(\d+\) ", plan):
        if "Scan parquet" not in block or path_fragment not in block:
            continue
        m = re.search(r"ReadSchema: (struct<.*)", block)
        if m:
            for field in _top_level_fields(_struct_body(m.group(1))):
                name = field.split(":")[0].strip()
                if name:
                    cols.add(name)
    return cols
