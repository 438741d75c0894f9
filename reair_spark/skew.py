"""Skew-handling utilities: salting patterns for hot keys.

AQE's skew-join splitting (on in the session factory) covers most
cases at runtime; these explicit forms are for the two places AQE
can't help: hot-key AGGREGATIONS (a single group too big for one
task's hash map) and joins where the skewed side must replicate a
small-but-not-broadcastable build side.

Reference context: the reference hit the same problem shape — "tables
can have millions of partitions" (TableCompareWorker.java:43-48) — and
solved it with a fixed 150-way re-shuffle; salting is the targeted
version that only pays for the hot keys.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_count(df: DataFrame, key: str, salts: int = 16) -> DataFrame:
    """Two-stage count for hot keys: count per (key, salt) — spreading
    one giant group over ``salts`` tasks — then sum per key. Identical
    result to groupBy(key).count() with the hot group parallelized."""
    salted = df.withColumn("__salt", F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salts)))
    partial = salted.groupBy(key, "__salt").agg(F.count("*").alias("__c"))
    return partial.groupBy(key).agg(F.sum("__c").alias("cnt"))


def salted_agg(
    df: DataFrame, key: str, agg_col: str, salts: int = 16
) -> DataFrame:
    """Two-stage sum/count/min/max for a hot-key aggregation; the
    partial stage carries every re-aggregatable statistic so the final
    stage is a cheap merge (the manual form of Spark's partial
    aggregation, forced through an extra shuffle stage for groups too
    large for one task)."""
    salted = df.withColumn("__salt", F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salts)))
    partial = salted.groupBy(key, "__salt").agg(
        F.sum(agg_col).alias("__s"),
        F.count("*").alias("__c"),
        F.min(agg_col).alias("__mn"),
        F.max(agg_col).alias("__mx"),
    )
    return partial.groupBy(key).agg(
        F.sum("__s").alias("sum_val"),
        F.sum("__c").alias("cnt"),
        F.min("__mn").alias("min_val"),
        F.max("__mx").alias("max_val"),
    )


def salted_join(
    skewed: DataFrame, other: DataFrame, key: str, salts: int = 8
) -> DataFrame:
    """Equi-join where ``skewed`` has hot keys and ``other`` is too big
    to broadcast: salt the skewed side randomly, replicate ``other``
    across all salts (explode of a salt array — rows × salts), join on
    (key, salt). Each hot key's rows spread over ``salts`` tasks."""
    s = skewed.withColumn(
        "__salt", F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salts))
    )
    o = other.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salts)]))
    )
    return s.join(o, [key, "__salt"]).drop("__salt")
