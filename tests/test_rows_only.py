"""Queries without a DuckDB oracle still must run and return rows
(the driver's weaker rows-only check)."""

from __future__ import annotations

import pytest

from asafaviv_devops_asafaviv_devops_tidb_cdc_spark import registry

registry.load_all()

ROWS_ONLY = sorted(set(registry.QUERIES) - set(registry.ORACLES))


@pytest.mark.parametrize("name", ROWS_ONLY or ["<all-oracle-backed>"])
def test_rows_only_query_runs(name, spark):
    if name == "<all-oracle-backed>":
        pytest.skip("every registered query carries a DuckDB oracle (r9)")
    from tests.conftest import SF_SMOKE

    df = registry.QUERIES[name](spark, SF_SMOKE)
    assert df.count() > 0, f"{name} returned no rows"
