"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001;
``queries()`` / ``oracle_sql()`` expose every implemented operator from
SURVEY.md §2 with its DuckDB oracle (see
``asafaviv_devops_asafaviv_devops_tidb_cdc_spark.registry``).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from asafaviv_devops_asafaviv_devops_tidb_cdc_spark import registry  # noqa: E402


def _configure(spark: SparkSession) -> None:
    """Session settings the engine relies on regardless of who built
    the session (the driver may pass its own)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # Timestamp robustness across testdata generations: TIMESTAMP(NANOS)
    # parquet reads as long (converted in sources.tables.load_table);
    # TIMESTAMP_NTZ (micros, isAdjustedToUTC=false) is normalized to a
    # UTC instant there too via to_utc_timestamp — session-tz-proof.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    # byte-capped Arrow slices: media stages move KB-scale binary
    # payloads per row, and the 10k-row default slice stalls chained
    # Python stage pairs (see session.py for the measured A/B)
    spark.conf.set("spark.sql.execution.arrow.maxBytesPerBatch", "1m")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Flagship = A1 ops-by-(table,op) over the full canal-json ingest
    chain P1->P5 — the reference's single most load-bearing path
    (node-consumer/index.js:235-333).
    """
    _configure(spark)
    registry.load_all()
    return registry.QUERIES["q_ops_by_table_op"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    registry.load_all()

    def _wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            _configure(spark)
            return fn(spark, sf_dir)

        run.__doc__ = fn.__doc__
        return run

    return {name: _wrap(fn) for name, fn in registry.QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (omitted for
    non-SQL-expressible ops -> rows-only check)."""
    registry.load_all()
    return dict(registry.ORACLES)
