"""The /verify skill's step-1 harness as a script: simulate the
driver's t1 smoke + t2 correctness gate through __spark_entry__ with a
bare SparkSession (exactly what the driver builds), at sf0.01.

Usage: python scripts/verify_driver_contract.py
Exit 0 iff every oracle-backed query matches.
"""

from __future__ import annotations

import math
import sys
from decimal import Decimal
from pathlib import Path

import duckdb
from pyspark.sql import SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def norm(df, cols):
    out = []
    for r in df[cols].itertuples(index=False, name=None):
        out.append(
            tuple(
                None
                if v is None or (isinstance(v, float) and math.isnan(v))
                else (f"{v:.6f}" if isinstance(v, (float, Decimal)) else str(v))
                for v in r
            )
        )
    return sorted(out, key=lambda r: tuple((v is not None, v) for v in r))


def main() -> None:
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    import __spark_entry__ as E

    assert len(E.entry(spark).collect()) > 0, "t1 smoke returned 0 rows"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    qs, oracles = E.queries(), E.oracle_sql()
    bad = []
    for name in sorted(qs):
        sdf = qs[name](spark, SF).toPandas()
        if name not in oracles:
            print(name, "rows-only", len(sdf))
            continue
        ddf = con.execute(oracles[name]).fetchdf()
        cols = sorted(sdf.columns)
        ok = (
            cols == sorted(ddf.columns)
            and len(sdf) == len(ddf)
            and norm(sdf, cols) == norm(ddf, cols)
        )
        if not ok:
            bad.append(name)
        print(name, "OK" if ok else "MISMATCH", len(sdf))
    print("TOTAL", len(qs), "MISMATCH", len(bad), bad)
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
