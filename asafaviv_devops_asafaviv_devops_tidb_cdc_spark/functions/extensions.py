"""User-extension surface (SURVEY §2.10): one tested example of each
extension point Spark offers — an Arrow-vectorized UDAF (grouped
aggregate) and a Python UDTF (table function).

The engine's own operators never need these (everything in §2.1-§2.9
is built-in Catalyst expressions — the fast path); these exist because
a REAL engine must let users extend it, and an untested extension
surface is a claim, not a feature. Both examples are deterministic, so
their queries are ORACLE-BACKED like every other operator:

- ``median_udaf`` — pandas GROUPED_AGG over Arrow batches; numpy's
  even-count median (mean of the two middle values) is exactly
  DuckDB's ``quantile_cont(0.5)`` interpolation, and IEEE (a+b)/2 is
  bit-deterministic, so the UDAF path hash-matches SQL.
- ``EnvelopeExplode`` — a Python UDTF doing the reference consumer's
  own job (envelope -> N rows, reference node-consumer/index.js:235-333
  is exactly one hard-coded UDTF); checked against the built-in P-chain
  derivation.

Scale note: both are the SLOW path by design — per-group pandas
transfer for the UDAF, Python eval per input row for the UDTF — but
both ride ARROW batch transfer (ArrowEvalPythonUDTF /
AggregateInPandas), never the interpreted row-pickling BatchEvalPython
stage (tests/test_python_stage_guard.py pins this registry-wide). The
docstrings of the fast-path twins (queries/cdc.py, queries/metrics.py)
show the built-in forms; the tests pin that slow path == fast path,
which is what makes the extension surface safe to offer.
"""

import functools
import json

import pandas as pd


@functools.cache
def median_udaf():
    """Exact median as an Arrow GROUPED_AGG (numpy kernel per group).
    Built lazily: the pandas_udf decorator needs an active
    SparkSession, and query modules must import session-free."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _median(v: pd.Series) -> float:
        import numpy as np

        return float(np.median(v.to_numpy()))

    return _median


class EnvelopeExplode:
    """Canal-json envelope -> one output row per data element: the
    reference consumer's core loop as a user table function. eval()
    runs per input row (the UDTF contract) but rows move over ARROW
    batches (useArrow) — the engine's own chain does this with
    from_json + posexplode (operators/parse.py, codegen); this exists
    to prove the extension point. Wrapped with @udtf lazily via
    ``envelope_explode_udtf()``."""

    def eval(self, envelope: str):
        try:
            doc = json.loads(envelope)
        except (TypeError, ValueError):
            return
        data = doc.get("data")
        if not isinstance(data, list):
            return
        for i, row in enumerate(data):
            if not isinstance(row, dict):
                continue
            try:
                rid = int(row.get("id"))
                val = float(row.get("value"))
            except (TypeError, ValueError):
                continue
            yield (i, rid, val)


@functools.cache
def envelope_explode_udtf():
    from pyspark.sql.functions import udtf

    return udtf(
        EnvelopeExplode,
        returnType="row_index int, row_id long, row_value double",
        useArrow=True,
    )
