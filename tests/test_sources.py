"""Format-agnostic sources/sinks (reair_spark.sources)."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from reair_spark.sources import (
    atomic_overwrite,
    convert_location,
    read_catalog_table,
    read_location,
    write_partitioned,
)


def _df(spark, n=100):
    return spark.range(n).select(
        "id",
        (F.col("id") % 3).cast("string").alias("ds"),
        (F.col("id") * 2).alias("v"),
    )


def test_read_location_formats(spark, tmp_path):
    df = _df(spark)
    for serde in ("parquet", "orc", "json", "csv"):
        loc = str(tmp_path / serde)
        w = df.write.format(serde)
        if serde == "csv":
            w = w.option("header", "true")
        w.save(loc)
        back = read_location(spark, loc, serde)
        assert back.count() == 100
        assert sorted(back.columns) == ["ds", "id", "v"]


def test_dynamic_partition_overwrite(spark, tmp_path):
    loc = str(tmp_path / "t")
    df = _df(spark)
    write_partitioned(df, loc, ["ds"])
    assert spark.read.parquet(loc).count() == 100

    # re-publish ONLY ds=1 with new values; ds=0/ds=2 must survive
    patch = df.where(F.col("ds") == "1").withColumn("v", F.col("v") + 1000)
    write_partitioned(patch, loc, ["ds"])
    out = spark.read.parquet(loc)
    assert out.count() == 100
    assert out.where("ds = '1'").agg(F.min("v")).first()[0] >= 1000
    assert out.where("ds = '0'").agg(F.max("v")).first()[0] < 1000

    # static mode truncates to just the written partitions
    write_partitioned(patch, loc, ["ds"], dynamic=False)
    # (partition discovery type-infers ds back to int)
    assert {str(r.ds) for r in
            spark.read.parquet(loc).select("ds").distinct().collect()} == {"1"}


def test_catalog_serde_roundtrip(spark, tmp_path):
    from reair_spark.catalog import DirectoryCatalog

    cat = DirectoryCatalog(str(tmp_path / "wh"))
    loc = cat.table_location("db1", "t_csv")
    _df(spark, 10).write.option("header", "true").csv(loc)
    cat.create_table(
        {"db": "db1", "table": "t_csv", "table_type": "MANAGED_TABLE",
         "cols": [], "partition_keys": [], "location": loc, "serde": "csv",
         "parameters": {}},
    )
    assert read_catalog_table(spark, cat, "db1", "t_csv").count() == 10


def test_convert_location_csv_to_parquet(spark, tmp_path):
    src, dest = str(tmp_path / "src"), str(tmp_path / "dest")
    _df(spark).write.option("header", "true").csv(src)
    convert_location(spark, src, dest, "csv", "parquet", partition_by=["ds"])
    out = spark.read.parquet(dest)
    assert out.count() == 100
    assert len(glob.glob(f"{dest}/ds=*")) == 3


def test_atomic_overwrite_swaps(spark, tmp_path):
    loc = str(tmp_path / "t")
    atomic_overwrite(_df(spark, 10), loc)
    assert spark.read.parquet(loc).count() == 10
    atomic_overwrite(_df(spark, 20), loc)
    assert spark.read.parquet(loc).count() == 20
    # no tmp/old debris left behind
    assert [p for p in os.listdir(str(tmp_path)) if "_.tmp_" in p or "_.old_" in p] == []
