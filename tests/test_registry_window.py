"""The driver-check window (the first 50 registered queries) IS
coverage policy: the r7 allocation points every slot at a query that
has either never had a driver verdict or holds an r1/r2-stale one.
Pin its composition so a registry edit cannot silently push a
never-checked query back out of the gate."""

from __future__ import annotations

from asafaviv_devops_asafaviv_devops_tidb_cdc_spark import registry
from asafaviv_devops_asafaviv_devops_tidb_cdc_spark.registry import _CHECK_FIRST

registry.load_all()


def test_window_is_exactly_the_check_first_list():
    assert len(_CHECK_FIRST) == 50
    assert list(registry.QUERIES)[:50] == _CHECK_FIRST


def test_every_window_name_is_registered():
    missing = [n for n in _CHECK_FIRST if n not in registry.QUERIES]
    assert not missing, missing


def test_window_is_oracle_backed_except_hll():
    # q_hll_distinct is rows-only BY CONSTRUCTION (its error bound is
    # hash-checked by q_hll_error_bound); everything else in the gate
    # window must carry a DuckDB oracle so the driver records a full
    # rows+schema+hash verdict, not the weaker rows-only check
    unbacked = [n for n in _CHECK_FIRST if n not in registry.ORACLES]
    assert unbacked == ["q_hll_distinct"], unbacked
