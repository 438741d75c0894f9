"""Structured Streaming surface: bounded streams over the events
parquet, checkpointed foreachBatch compile, session windows."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from reair_spark.io import load_table
from reair_spark.streaming import (
    stream_compile_jobs_foreachbatch,
    stream_hourly_counts,
    stream_sessionize,
)


def test_stream_hourly_counts_matches_batch(spark, sf_dir):
    streamed = {
        (r.window_start, r.cnt) for r in stream_hourly_counts(spark, sf_dir).collect()
    }
    batch = {
        (r.window_start, r.cnt)
        for r in load_table(spark, sf_dir, "events")
        .select(F.window("ts", "1 hour").alias("w"))
        .groupBy(F.col("w.start").alias("window_start"))
        .agg(F.count("*").alias("cnt"))
        .collect()
    }
    assert streamed == batch


def test_stream_sessionize_produces_sessions(spark, sf_dir):
    rows = stream_sessionize(spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows[:20]:
        assert r.session_end > r.session_start
        assert r.n_events >= 1


def test_foreachbatch_compile_is_checkpointed(spark, tmp_path):
    events = spark.createDataFrame(
        [
            (1, None, "CREATETABLE", "", [("OUTPUT", "TABLE", "db1.t1", "{}")]),
            (2, None, "DROPTABLE", "", [("OUTPUT", "TABLE", "db1.t2", "{}")]),
        ],
        "id long, create_time timestamp, command_type string, command string, "
        "objects array<struct<category:string, obj_type:string, name:string, payload:string>>",
    )
    src = str(tmp_path / "events_src")
    events.repartition(1).write.parquet(src)
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out, ckpt = str(tmp_path / "jobs_out"), str(tmp_path / "ckpt")
    stream_compile_jobs_foreachbatch(spark, stream, out, ckpt)
    jobs = spark.read.option("basePath", out).parquet(out)
    ops = {r.operation for r in jobs.collect()}
    assert ops == {"COPY_UNPARTITIONED_TABLE", "DROP_TABLE"}

    # re-run with the same checkpoint: no batches re-fire, output stable
    before = jobs.count()
    stream2 = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    stream_compile_jobs_foreachbatch(spark, stream2, out, ckpt)
    assert spark.read.option("basePath", out).parquet(out).count() == before
    assert os.path.isdir(ckpt)
