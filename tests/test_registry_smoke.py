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


def test_driver_history_rotation_semantics(tmp_path):
    """Rotation contract (ADVICE r4 + VERDICT r4 ask #8): the latest
    verdict per query wins (a regression re-enters the red set even if
    an earlier round was green), and greens carry their most recent
    green round for least-recently-verified-first ordering."""
    import json

    from reair_spark.registry import _driver_history

    g = {"rows_match": True, "schema_match": True, "hash_match": True,
         "spark_rows": 1, "oracle_rows": 1, "err": None}
    r = dict(g, hash_match=False)
    (tmp_path / "CORRECTNESS_r01.json").write_text(json.dumps(
        {"a": g, "b": g, "c": r}))
    (tmp_path / "CORRECTNESS_r02.json").write_text(json.dumps(
        {"a": r, "c": g, "d": g}))

    latest_red, last_green = _driver_history(str(tmp_path))
    # 'a' regressed in r02: must be red despite the r01 green
    assert "a" in latest_red
    # 'c' was red in r01 but green in r02: not red, green round = 2
    assert "c" not in latest_red and last_green["c"] == 2
    # 'b' last verified green in r01; 'd' in r02
    assert last_green["b"] == 1 and last_green["d"] == 2
    # 'a' keeps its old green round but red takes precedence in
    # all_queries ordering (red set checked first)
    assert last_green["a"] == 1
