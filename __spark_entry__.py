"""Driver contract for the reair_spark engine.

``entry(spark)`` — flagship query smoke check at sf0.001.
``queries()`` — every implemented operator (SURVEY.md §2) as
(spark, sf_dir) -> DataFrame callables.
``oracle_sql()`` — DuckDB-equivalent SQL per query (omitted only for
genuinely non-SQL-expressible ops → driver does a rows-only check).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 shape, SURVEY Q14) on sf0.001."""
    from reair_spark.queries import q14_tpch_q1

    return q14_tpch_q1(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from reair_spark.registry import all_queries

    return all_queries()


def oracle_sql() -> dict[str, str]:
    from reair_spark.registry import all_oracles

    return all_oracles()
