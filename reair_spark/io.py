"""Table loading helpers for the TESTDATA star schema."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one star-schema table; parquet scan gets pushdown + pruning.

    events.parquet stores TIMESTAMP(NANOS), which Spark's vectorized
    parquet reader rejects; read nanos as long (session conf, safe to
    set at runtime) and floor-convert to microsecond timestamps —
    matching DuckDB's own ns→us truncation.
    """
    if name == "events":
        try:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        except Exception:
            pass
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and isinstance(df.schema["ts"].dataType, T.LongType):
        # integer DIV: float division loses precision at ns-epoch magnitude
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    return df


def register_views(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> None:
    """Register temp views so SQL-form operators can reference them."""
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
