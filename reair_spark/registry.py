"""Central registry: every implemented query/operator + its oracle."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from reair_spark.queries import DECLARED_ORACLES, DECLARED_QUERIES

QueryFn = Callable[[SparkSession, str], DataFrame]


def _driver_history(root: str | None = None) -> tuple[frozenset, dict[str, int]]:
    """(latest_red, last_green_round) from the driver's own
    ``CORRECTNESS_r*.json`` artifacts at the repo root.

    The driver samples the registry in insertion order (~50 rows per
    round), so ``all_queries`` front-loads (a) rows whose LATEST
    driver verdict is red (a regression or a fix that must re-check
    — the latest verdict wins, so a query green in r02 but red in
    r04 re-enters the front), (b) rows that have never had a driver
    verdict, then (c) green rows ordered oldest-verified-round first
    so long-green rows (e.g. q01–q28, last checked r01) rotate back
    through the sample before recently-verified ones instead of
    going permanently stale. With no artifacts present (fresh clone)
    everything counts as never-checked, which is the right
    cold-start order.
    """
    import glob
    import json
    import os
    import re

    if root is None:
        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    files = sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json")))
    # latest verdict per query wins; remember the round of the last
    # GREEN verdict for staleness ordering.
    latest_verdict: dict[str, bool] = {}
    last_green_round: dict[str, int] = {}
    for path in files:
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        rnd = int(m.group(1)) if m else 0
        try:
            with open(path) as fh:
                data = json.load(fh)
        except (OSError, ValueError):
            continue
        for name, row in data.items():
            if not isinstance(row, dict):
                continue
            ok = bool(row.get("hash_match")) and not row.get("err")
            latest_verdict[name] = ok
            if ok:
                last_green_round[name] = max(last_green_round.get(name, 0), rnd)
    latest_red = {n for n, ok in latest_verdict.items() if not ok}
    return frozenset(latest_red), last_green_round


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

    latest_red, last_green_round = _driver_history()
    out: dict[str, QueryFn] = {}
    for name, fn in merged.items():  # latest-verdict-red rows re-check first
        if name in latest_red:
            out[name] = fn
    for name, fn in merged.items():  # never driver-checked: sample next
        if name not in out and name not in last_green_round:
            out[name] = fn
    # green rows: least-recently-verified first, registry order as
    # tie-break within a round, so every green row cycles through the
    # driver's 50-row window across rounds.
    order = list(merged)
    for name in sorted(
        (n for n in merged if n not in out),
        key=lambda n: (last_green_round.get(n, 0), order.index(n)),
    ):
        out[name] = merged[name]
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
