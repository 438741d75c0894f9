"""Every registered query must at least analyze + execute at sf0.001.

The declared q01..q28 set is hash-checked against DuckDB in
test_declared_queries; the rest of the registry is hash-checked only
by tests/run_oracle_sweep.py (out-of-band, per-round driver gate).
This smoke keeps pytest able to catch analysis-time regressions —
e.g. a testdata schema migration changing events.ts from long-nanos
to TIMESTAMP — across the WHOLE surface, not just the declared set.
"""

from __future__ import annotations

import pytest

from reair_spark.queries import DECLARED_QUERIES
from reair_spark.registry import all_queries

_UNDECLARED = sorted(set(all_queries()) - set(DECLARED_QUERIES))


@pytest.mark.parametrize("name", _UNDECLARED)
def test_registered_query_executes(name, spark, sf_dir):
    df = all_queries()[name](spark, sf_dir)
    assert df.columns, f"{name}: no output columns"
    assert df.count() >= 0
