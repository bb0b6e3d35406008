"""Declarative data-quality checks (rules-as-data, Deequ-style).

A constraint suite is a LIST OF ROWS, not code: each check is
{id, table, kind, ...params}, and the evaluator compiles the whole
suite into the minimum number of passes — every row-predicate check
(not_null / accepted_values / range) on the same table folds into ONE
conditional-sum aggregation over ONE scan; uniqueness is one keyed
aggregation per key set; referential integrity is one anti-join per
(child, parent) edge. At 100 TB that compilation is the whole game: a
naive one-query-per-check suite re-scans the fact table once per rule,
the folded form scans it once per FAMILY.

Kinds:
- ``not_null``:        {column}
- ``accepted_values``: {column, values: [..]}
- ``range``:           {column, lo, hi}  (inclusive; violations = outside OR null)
- ``unique``:          {columns: [..]}   (violations = rows beyond the first per key)
- ``foreign_key``:     {column, parent_table, parent_column}
                       (violations = child rows with no parent; null keys violate)

Output: (check_id, table_name, violations) — integer counts, exact in
any engine, so the whole suite is hash-checkable against per-rule SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_ROW_KINDS = ("not_null", "accepted_values", "range")


def _row_predicate(check: dict) -> F.Column:
    """Violation predicate for a row-level check (true = violating)."""
    kind = check["kind"]
    c = F.col(check["column"])
    if kind == "not_null":
        return c.isNull()
    if kind == "accepted_values":
        return ~c.isin(list(check["values"])) | c.isNull()
    if kind == "range":
        return (c < check["lo"]) | (c > check["hi"]) | c.isNull()
    raise ValueError(f"not a row-level check kind: {kind}")


def evaluate_checks(
    tables: dict[str, DataFrame], checks: list[dict]
) -> DataFrame:
    """Compile + run a constraint suite; returns one row per check.

    Pass shape: row-level checks GROUP BY TABLE into one
    conditional-sum aggregation (one scan per table regardless of rule
    count); each unique check is one keyed agg; each foreign_key is
    one anti-join with the parent side reduced to distinct keys
    (broadcastable when the parent is a dimension)."""
    if not checks:
        raise ValueError("evaluate_checks: empty check suite")
    some_df = next(iter(tables.values()))
    spark = some_df.sparkSession
    outs: list[DataFrame] = []

    by_table: dict[str, list[dict]] = {}
    for ch in checks:
        if ch["kind"] in _ROW_KINDS:
            by_table.setdefault(ch["table"], []).append(ch)
    for tname, tchecks in by_table.items():
        aggs = [
            F.sum(F.when(_row_predicate(ch), 1).otherwise(0))
            .cast("long")
            .alias(ch["id"])
            for ch in tchecks
        ]
        wide = tables[tname].agg(*aggs)
        stack = ", ".join(f"'{ch['id']}', {ch['id']}" for ch in tchecks)
        outs.append(
            wide.selectExpr(
                f"stack({len(tchecks)}, {stack}) AS (check_id, violations)"
            ).select(
                "check_id",
                F.lit(tname).alias("table_name"),
                F.col("violations").cast("long"),
            )
        )

    for ch in checks:
        if ch["kind"] == "unique":
            keys = list(ch["columns"])
            dup = (
                tables[ch["table"]]
                .groupBy(*keys)
                .agg(F.count("*").alias("_n"))
                .agg(
                    F.coalesce(F.sum(F.col("_n") - 1), F.lit(0))
                    .cast("long")
                    .alias("violations")
                )
            )
            outs.append(
                dup.select(
                    F.lit(ch["id"]).alias("check_id"),
                    F.lit(ch["table"]).alias("table_name"),
                    "violations",
                )
            )
        elif ch["kind"] == "foreign_key":
            child = tables[ch["table"]]
            parent_keys = (
                tables[ch["parent_table"]]
                .select(F.col(ch["parent_column"]).alias("_pk"))
                .distinct()
            )
            orphans = child.join(
                parent_keys, child[ch["column"]] == F.col("_pk"), "left_anti"
            ).agg(F.count("*").cast("long").alias("violations"))
            outs.append(
                orphans.select(
                    F.lit(ch["id"]).alias("check_id"),
                    F.lit(ch["table"]).alias("table_name"),
                    "violations",
                )
            )
        elif ch["kind"] not in _ROW_KINDS:
            raise ValueError(f"unknown check kind: {ch['kind']}")

    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out
