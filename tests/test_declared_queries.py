"""t1/t2 gate: every declared query (SURVEY §2.3) hash-matches DuckDB."""

from __future__ import annotations

import pytest

from reair_spark.queries import DECLARED_ORACLES, DECLARED_QUERIES
from tests.oracle_check import compare


@pytest.mark.parametrize("name", sorted(DECLARED_QUERIES))
def test_declared_query_matches_oracle(name, spark, duck, sf_dir):
    result = compare(DECLARED_QUERIES[name](spark, sf_dir), duck, DECLARED_ORACLES[name])
    assert result["rows_match"], f"{name}: row counts differ {result}"
    assert result["cols_match"], f"{name}: column names differ {result}"
    assert result["hash_match"], f"{name}: value hash differs {result}"
