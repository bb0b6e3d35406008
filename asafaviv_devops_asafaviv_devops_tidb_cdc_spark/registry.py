"""Query registry: maps Qid -> (Spark callable, DuckDB oracle SQL).

Every operator from SURVEY.md §2 registers here; ``__spark_entry__.py``
re-exports. Oracle-less entries (stream-only / non-SQL-expressible)
get a rows-only check from the driver.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}

_QUERY_MODULES = [
    "asafaviv_devops_asafaviv_devops_tidb_cdc_spark.queries.cdc",
    "asafaviv_devops_asafaviv_devops_tidb_cdc_spark.queries.relational",
    "asafaviv_devops_asafaviv_devops_tidb_cdc_spark.queries.metrics",
    "asafaviv_devops_asafaviv_devops_tidb_cdc_spark.queries.analytics",
    "asafaviv_devops_asafaviv_devops_tidb_cdc_spark.queries.llm_pipeline",
    "asafaviv_devops_asafaviv_devops_tidb_cdc_spark.queries.streaming_checks",
]

_loaded = False


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_all() -> None:
    global _loaded
    if _loaded:
        return
    for mod in _QUERY_MODULES:
        try:
            importlib.import_module(mod)
        except ModuleNotFoundError as exc:
            # allow partially-built query subpackages during development
            if mod.rsplit(".", 1)[-1] not in str(exc):
                raise
    _loaded = True
