"""Registry-wide Python-stage plan guard (the r12 verdict's order #6).

The broadcast AST guard (tests/test_broadcast_guard.py) closed the
broadcast-hint regression class mechanically; this closes the next
one: a row-at-a-time Python UDF (BatchEvalPython) sneaking into a hot
path. The per-query plan pins in test_plan_shape.py assert this for
individual queries — this test generalizes the walker over EVERY
registered query's physical plan, so a new or edited query cannot ship
an interpreted Python stage unnoticed. Python is allowed ONLY behind
Arrow batch transfer: ArrowEvalPython (vectorized pandas_udf),
MapInPandas / FlatMapGroupsInPandas / FlatMapCoGroupsInPandas
(mapInPandas / applyInPandas) — the 10-100x-faster stages the 100 TB
posture permits.
"""

from __future__ import annotations

import pytest

from asafaviv_devops_asafaviv_devops_tidb_cdc_spark import registry
from asafaviv_devops_asafaviv_devops_tidb_cdc_spark.plans import checks

from tests.conftest import SF_SMOKE

registry.load_all()

# Queries allowed to carry a BatchEvalPython node. Empty, and the
# point is that it stays empty: add an entry ONLY with a comment
# explaining why an interpreted per-row stage is genuinely forced,
# which (as of r13) is never.
ALLOWED_BATCH_EVAL: dict[str, str] = {}


@pytest.mark.parametrize("name", sorted(registry.QUERIES))
def test_no_row_at_a_time_python_stage(name, spark):
    if name in ALLOWED_BATCH_EVAL:
        pytest.skip(ALLOWED_BATCH_EVAL[name])
    df = registry.QUERIES[name](spark, SF_SMOKE)
    plan = checks.plan_string(df)
    assert "BatchEvalPython" not in plan, (
        f"{name} plans a row-at-a-time Python stage (BatchEvalPython); "
        "use a pandas_udf / mapInPandas Arrow stage instead:\n"
        + plan[:2000]
    )
