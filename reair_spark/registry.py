"""Central registry: every implemented query/operator + its oracle."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from reair_spark.queries import DECLARED_ORACLES, DECLARED_QUERIES

QueryFn = Callable[[SparkSession, str], DataFrame]


def all_queries() -> dict[str, QueryFn]:
    out: dict[str, QueryFn] = {}
    out.update(DECLARED_QUERIES)
    from reair_spark.datapipe.registry import DATAPIPE_QUERIES
    from reair_spark.engine_queries import ENGINE_QUERIES
    from reair_spark.extra_queries import EXTRA_QUERIES

    out.update(DATAPIPE_QUERIES)
    out.update(ENGINE_QUERIES)
    out.update(EXTRA_QUERIES)
    return out


def all_oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    out.update(DECLARED_ORACLES)
    from reair_spark.datapipe.registry import DATAPIPE_ORACLES
    from reair_spark.engine_queries import ENGINE_ORACLES
    from reair_spark.extra_queries import EXTRA_ORACLES

    out.update(DATAPIPE_ORACLES)
    out.update(ENGINE_ORACLES)
    out.update(EXTRA_ORACLES)
    return out
