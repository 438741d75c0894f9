"""Round-7 ADVICE regression tests.

Each test pins one of the round-6 advisor findings so the fix cannot
regress:
  1. rewrite_locations sibling-prefix paths (src_root=/data/wh must
     NOT claim /data/wh_archive/...) route through the derived branch.
  2. rewrite_locations with a dest_root containing Java-regex
     replacement metacharacters ($, \\) is copied literally.
  3. inventory listing tolerates ONLY unregistered schemes; a
     ValueError raised inside an FS's scandir propagates.
  4. dirsync compare_mtime=True rejects a destination FS that cannot
     persist mtimes (ArrowFs).
"""

from __future__ import annotations

import pytest

from reair_spark.commit import rewrite_locations


def _plan_df(spark, rows):
    return spark.createDataFrame(
        rows, "db string, table string, partition_name string, "
              "src_path string, dest_path string"
    )


def test_rewrite_sibling_prefix_goes_to_derived(spark, tmp_path):
    """/data/wh_archive is NOT inside src_root /data/wh: it must land
    at dest_root/db/table, not dest_root + '_archive/db/t'."""
    plan = _plan_df(spark, [
        ("db1", "t1", None, "/data/wh/db1/t1", None),           # true child
        ("db1", "t2", None, "/data/wh_archive/db1/t2", None),   # sibling prefix
        ("db1", "t3", "ds=1", "/elsewhere/db1/t3/ds=1", None),  # cross-warehouse
    ])
    out = {r.table: r.dest_path for r in
           rewrite_locations(plan, "/data/wh", "/dest/wh").collect()}
    assert out["t1"] == "/dest/wh/db1/t1"
    assert out["t2"] == "/dest/wh/db1/t2"          # derived, NOT mangled
    assert out["t3"] == "/dest/wh/db1/t3/ds=1"


def test_rewrite_root_trailing_slash_and_exact_root(spark):
    plan = _plan_df(spark, [
        ("db1", "t1", None, "/data/wh/db1/t1", None),
        ("db1", "t2", None, "/data/wh", None),  # exactly the root
    ])
    out = {r.table: r.dest_path for r in
           rewrite_locations(plan, "/data/wh/", "/dest/wh").collect()}
    assert out["t1"] == "/dest/wh/db1/t1"
    assert out["t2"] == "/dest/wh"


def test_rewrite_dest_root_with_regex_replacement_metachars(spark):
    """dest_root containing $ and \\ must be copied literally — the old
    regexp_replace interpreted them as group references."""
    dest = "/dest/$1\\weird$wh"
    plan = _plan_df(spark, [
        ("db1", "t1", None, "/data/wh/db1/t1", None),
    ])
    (row,) = rewrite_locations(plan, "/data/wh", dest).collect()
    assert row.dest_path == dest + "/db1/t1"


def test_inventory_skips_only_unregistered_schemes(spark, tmp_path):
    """An unregistered scheme is skipped per-root; a ValueError raised
    from INSIDE a registered FS's scandir is a bug and propagates."""
    import os

    from reair_spark.fs import LocalFs
    from reair_spark.inventory import list_files

    good = str(tmp_path / "good")
    os.makedirs(good)
    open(f"{good}/a.txt", "w").write("x")

    # unregistered scheme root → silently dropped, listing succeeds
    rows = list_files(spark, [good, "nosuchscheme://bucket/x"]).collect()
    assert {r.rel_path for r in rows} == {"a.txt"}

    class BuggyFs(LocalFs):
        scheme = "buggy"

        def scandir(self, path):
            raise ValueError("internal FS bug")

    from reair_spark.fs import register_fs, unregister_fs

    register_fs(BuggyFs())
    try:
        with pytest.raises(Exception, match="internal FS bug"):
            list_files(spark, [f"buggy://{good}"]).collect()
    finally:
        unregister_fs("buggy")


def test_dirsync_rejects_compare_mtime_on_arrowfs_dest(spark, tmp_path):
    import os

    import pyarrow.fs as pa_fs

    from reair_spark.dirsync import sync_directories
    from reair_spark.fs import ArrowFs, register_fs, unregister_fs

    src = str(tmp_path / "src")
    os.makedirs(src)
    open(f"{src}/a.txt", "w").write("x")
    register_fs(ArrowFs("pafs7", pa_fs.LocalFileSystem(),
                        str(tmp_path / "paroot")))
    try:
        with pytest.raises(ValueError, match="compare_mtime"):
            sync_directories(spark, [src], "pafs7://dest",
                             compare_mtime=True)
        # size-keyed default still works on the same dest
        r = sync_directories(spark, [src], "pafs7://dest")
        assert {x.action for x in r["plan"].collect()} == {"ADD"}
    finally:
        unregister_fs("pafs7")
