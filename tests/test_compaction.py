"""Small-file compaction: plan (window-binning) + non-destructive
directory rewrite (plans.compact_plan / execute_compaction)."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from reair_spark.plans import compact_plan, execute_compaction


def test_compact_plan_bins_small_files(spark):
    files = spark.createDataFrame(
        [("d1", f"f{i:03d}", 10) for i in range(10)]      # 10 tiny files
        + [("d1", "big", 1000)]                            # over threshold
        + [("d2", "g1", 25), ("d2", "g2", 25)],
        "dir string, rel_path string, size long",
    )
    plan = compact_plan(files, small_bytes=100, target_bytes=50)
    rows = plan.collect()
    assert all(r.rel_path != "big" for r in rows)          # big file untouched
    d1 = sorted((r.rel_path, r.task) for r in rows if r.dir == "d1")
    # 10×10 bytes into 50-byte tasks → tasks 0,0,0,0,0,1,1,1,1,1
    assert [t for _, t in d1] == [0] * 5 + [1] * 5
    d2 = {r.rel_path: r.task for r in rows if r.dir == "d2"}
    assert d2 == {"g1": 0, "g2": 0}


def test_execute_compaction_roundtrip(spark, tmp_path):
    src, dest = str(tmp_path / "src"), str(tmp_path / "dest")
    df = spark.range(1000).select("id", (F.col("id") % 7).alias("k"))
    # 16 small files in a nested dir + 8 in the root
    df.repartition(16).write.parquet(f"{src}/sub/t1")
    df.repartition(8).write.parquet(f"{src}/t2")

    summary = {r.dir: r for r in
               execute_compaction(spark, src, dest, target_bytes=1 << 30).collect()}
    t1 = next(v for k, v in summary.items() if k.endswith("t1"))
    assert t1.n_files_out == 1
    # all data survives, one output data file per dir
    out = spark.read.parquet(f"{dest}/sub/t1")
    assert out.count() == 1000
    assert out.agg(F.sum("id")).first()[0] == df.agg(F.sum("id")).first()[0]
    data_files = [p for p in glob.glob(f"{dest}/sub/t1/*.parquet")]
    assert len(data_files) == 1


def test_execute_compaction_single_job_many_dirs(spark, tmp_path):
    """One action over N dirs produces exactly the planned per-dir file
    counts (ceil(records / records_per_file)) — the distributed
    executor's contract; no per-directory driver jobs."""
    import math

    src, dest = str(tmp_path / "src"), str(tmp_path / "dest")
    sizes = {"a": 300, "b/nested": 500, "c": 40}
    for d, n in sizes.items():
        spark.range(n).repartition(4).write.parquet(f"{src}/{d}")

    # derive the same records_per_file the executor will pick: global
    # avg bytes/record from the source inventory
    from reair_spark.inventory import list_files

    total_bytes = list_files(spark, [src]).agg({"size": "sum"}).first()[0]
    total_rec = sum(sizes.values())
    target = int(2.5 * total_bytes / total_rec)  # ~2.5 records per file
    max_records = max(1, int(target / max(1.0, total_bytes / total_rec)))

    summary = {r.dir: r for r in
               execute_compaction(spark, src, dest, target_bytes=target).collect()}
    assert set(summary) == set(sizes)
    for d, n in sizes.items():
        planned = math.ceil(n / max_records)
        assert summary[d].n_files_out == planned, (d, summary[d])
        files = glob.glob(f"{dest}/{d}/*.parquet")
        assert len(files) == planned
        got = spark.read.parquet(f"{dest}/{d}")
        assert got.count() == n and got.agg({"id": "sum"}).first()[0] == n * (n - 1) // 2
