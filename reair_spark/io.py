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


def rows_df(
    spark: SparkSession,
    rows,
    schema,
    rows_per_slice: int = 4096,
) -> DataFrame:
    """DataFrame over driver-known rows with the partition count sized
    by the data instead of the cluster: ``createDataFrame`` carves ANY
    local list into ``defaultParallelism`` slices, so a metadata-scale
    frame (a 25-table snapshot, a 20-row digest) schedules 32
    near-empty tasks per evaluation — and every re-evaluation of the
    subtree (diff joins, payload unions, AQE stage jobs) pays the same
    scheduling floor again (measured: ~0.25 s per warm collect of a
    1-row 32-slice frame vs ~0.05 s task time at 1 slice).

    Slices grow with the row count (one per ``rows_per_slice`` rows,
    capped at defaultParallelism), so a genuinely large driver list
    still spreads across the cluster — the sizing is scale-adaptive,
    never a local-mode constant.
    """
    if not isinstance(rows, (list, tuple)):
        rows = list(rows)
    if not rows:
        # empty local relations also default to defaultParallelism
        # empty slices; one empty slice carries the schema just as well
        return spark.createDataFrame(
            spark.sparkContext.parallelize([], 1), schema
        )
    slices = max(
        1,
        min(
            spark.sparkContext.defaultParallelism,
            (len(rows) + rows_per_slice - 1) // rows_per_slice,
        ),
    )
    return spark.createDataFrame(
        spark.sparkContext.parallelize(rows, slices), schema
    )
