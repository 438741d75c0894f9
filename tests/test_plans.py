"""Plan-rewrite rules: common-dir aggregate, optimistic copy
coalescing (CopyPartitionsTask semantics), A8 task sizing."""

from __future__ import annotations

from pyspark.sql import functions as F

from reair_spark.plans import (
    coalesce_copy_plan,
    common_directory,
    size_copy_parallelism,
)


def _plan(spark, rows):
    return spark.createDataFrame(
        rows,
        "action string, update_metadata boolean, update_data boolean, "
        "src_path string, dest_path string, db string, table string, "
        "partition_name string",
    )


def _sizes(spark, pairs):
    return spark.createDataFrame(
        [(k, 1, v, 0) for k, v in pairs.items()],
        "root string, n_files long, total_size long, digest long",
    )


def test_common_directory_min_max_trick(spark):
    df = spark.createDataFrame(
        [("t", "/wh/db/t/ds=1/hr=1"), ("t", "/wh/db/t/ds=1/hr=2"),
         ("t", "/wh/db/t/ds=2/hr=1"), ("u", "/wh/db/u/ds=1")],
        "table string, src_path string",
    )
    out = {r.table: r.common_dir for r in common_directory(df, ["table"]).collect()}
    assert out == {"t": "/wh/db/t", "u": "/wh/db/u/ds=1"}


def test_coalesce_when_common_dir_is_cheap(spark):
    plan = _plan(spark, [
        ("COPY_PARTITION", True, True, "/src/t/ds=1", "/dst/t/ds=1", "db", "t", "ds=1"),
        ("COPY_PARTITION", True, True, "/src/t/ds=2", "/dst/t/ds=2", "db", "t", "ds=2"),
        ("COPY_PARTITION", True, True, "/src/t/ds=3", "/dst/t/ds=3", "db", "t", "ds=3"),
    ])
    sizes = _sizes(spark, {
        "/src/t/ds=1": 100, "/src/t/ds=2": 100, "/src/t/ds=3": 100,
        "/src/t": 350,  # ≤ 2× wanted(300) → coalesce
    })
    out = coalesce_copy_plan(plan, sizes).collect()
    assert len(out) == 1
    r = out[0]
    assert r.action == "COPY_PARTITIONS_DIR"
    assert r.src_path == "/src/t" and r.dest_path == "/dst/t"


def test_no_coalesce_when_common_dir_too_big(spark):
    plan = _plan(spark, [
        ("COPY_PARTITION", True, True, "/src/t/ds=1", "/dst/t/ds=1", "db", "t", "ds=1"),
        ("COPY_PARTITION", True, True, "/src/t/ds=2", "/dst/t/ds=2", "db", "t", "ds=2"),
    ])
    sizes = _sizes(spark, {
        "/src/t/ds=1": 100, "/src/t/ds=2": 100,
        "/src/t": 1000,  # > 2× wanted(200): other partitions dominate
    })
    out = coalesce_copy_plan(plan, sizes).collect()
    assert sorted(r.action for r in out) == ["COPY_PARTITION", "COPY_PARTITION"]


def test_single_partition_and_non_partition_rows_pass_through(spark):
    plan = _plan(spark, [
        ("COPY_PARTITION", True, True, "/src/t/ds=1", "/dst/t/ds=1", "db", "t", "ds=1"),
        ("COPY_UNPARTITIONED_TABLE", True, True, "/src/u", "/dst/u", "db", "u", None),
        ("DROP_TABLE", False, False, None, None, "db", "v", None),
    ])
    sizes = _sizes(spark, {"/src/t/ds=1": 100, "/src/t": 100})
    out = {r.action for r in coalesce_copy_plan(plan, sizes).collect()}
    assert out == {"COPY_PARTITION", "COPY_UNPARTITIONED_TABLE", "DROP_TABLE"}


def test_size_copy_parallelism(spark):
    small = spark.createDataFrame([("a", 10, 0)] * 5, "src_file string, size long, mtime long")
    assert size_copy_parallelism(small) == 1
    many_files = spark.createDataFrame(
        [(f"f{i}", 10, 0) for i in range(550)], "src_file string, size long, mtime long"
    )
    assert size_copy_parallelism(many_files) == 6  # ceil(550/100)
    big = spark.createDataFrame(
        [("a", 300 * 1024 * 1024, 0), ("b", 300 * 1024 * 1024, 0)],
        "src_file string, size long, mtime long",
    )
    assert size_copy_parallelism(big) == 3  # ceil(600MB/256MB)


def test_orphan_gc_plan_interval_boundaries(spark):
    """Snapshot-retention verdicts at the exact watermark boundaries:
    retention keeps snapshots {4, 5} (keep_after=3, latest=5)."""
    from reair_spark.plans import orphan_gc_plan

    referenced = spark.createDataFrame(
        [
            ("live_forever", 0, None),     # NULL deleted → RETAINED
            ("dies_at_4", 0, 4),           # [0,4): max snap 3 → EXPIRABLE
            ("dies_at_5", 0, 5),           # [0,5): covers 4 → RETAINED
            ("born_retained", 4, None),    # [4,∞) → RETAINED
            ("short_old", 1, 2),           # [1,2) → EXPIRABLE
            # multi-interval paths: verdicts are per FILE, any-retained
            # wins, and a re-added file must be counted exactly ONCE
            ("readded_live", 0, 2),        # expired interval ...
            ("readded_live", 4, None),     # ... re-added into retention
            ("readded_dead", 0, 2),        # two intervals, both expired
            ("readded_dead", 2, 3),
        ],
        "path string, added_snap int, deleted_snap int",
    )
    disk = spark.createDataFrame(
        [("live_forever", 10), ("dies_at_4", 20), ("dies_at_5", 30),
         ("born_retained", 40), ("short_old", 50), ("never_seen.tmp", 60),
         ("readded_live", 70), ("readded_dead", 80)],
        "path string, size long",
    )
    out = {
        r.verdict: r
        for r in orphan_gc_plan(
            disk, referenced, keep_snapshots_after=3, latest_snapshot=5
        ).collect()
    }
    assert out["RETAINED"].n_files == 4
    assert out["RETAINED"].total_bytes == 10 + 30 + 40 + 70
    assert out["EXPIRABLE"].n_files == 3
    assert out["EXPIRABLE"].total_bytes == 20 + 50 + 80
    assert out["ORPHAN"].n_files == 1
    assert out["ORPHAN"].first_path == "never_seen.tmp"
    # totals across verdicts == |disk| exactly: no double counting
    assert sum(r.n_files for r in out.values()) == 8
