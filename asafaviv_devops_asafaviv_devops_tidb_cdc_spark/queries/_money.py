"""Cross-engine-deterministic money arithmetic for compared outputs.

The TPC-H-ish money columns are DOUBLEs. Rules (SURVEY §5.2, updated
after the round-1 correctness gate):

- A compared per-row money value is the raw DOUBLE — bit-identical in
  every engine reading the same parquet.
- A compared money SUM accumulates in exact integer units:
  cents = ``CAST(floor(x * 100 + 0.5) AS BIGINT)`` (pure IEEE multiply
  /add/floor — identical in Spark and DuckDB), and the discount factor
  as integer percent, so ``revenue`` sums in 1e-4-dollar units. Integer
  sums are associative, hence partition-order-proof.
- The final value is emitted as BIGINT units or via one exact
  BIGINT->DOUBLE conversion (deterministic IEEE rounding, same in both
  engines) — never as a scaled DECIMAL, whose rounding mode and result
  serialization both diverge cross-engine.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# dollars -> integer cents, identical IEEE ops in Spark and DuckDB
CENTS_SQL = "CAST(floor({x} * 100 + 0.5) AS BIGINT)"

# (price, discount) -> integer revenue in 1e-4-dollar units
REV_UNITS_SQL = (
    "CAST(floor({price} * 100 + 0.5) AS BIGINT)"
    " * (100 - CAST(floor({disc} * 100 + 0.5) AS BIGINT))"
)


def cents(col: str) -> Column:
    return F.floor(F.col(col) * 100 + 0.5).cast("long")


def revenue_units(price: str = "l_extendedprice", disc: str = "l_discount") -> Column:
    """price*(1-disc) in exact integer 1e-4-dollar units."""
    return cents(price) * (F.lit(100) - cents(disc))


def units_as_dollars(col: Column) -> Column:
    """Exact BIGINT units -> DOUBLE dollars (one deterministic IEEE
    conversion + division; < 2^53 units stays exact)."""
    return col.cast("double") / F.lit(10000.0)


def rev_units_sql(price: str = "l_extendedprice", disc: str = "l_discount") -> str:
    return REV_UNITS_SQL.format(price=price, disc=disc)


def sum_revenue_sql(price: str = "l_extendedprice", disc: str = "l_discount") -> str:
    """DuckDB fragment: SUM of revenue units emitted as DOUBLE dollars."""
    return f"CAST(SUM({rev_units_sql(price, disc)}) AS DOUBLE) / 10000"
