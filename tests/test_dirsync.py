"""Directory-sync tool — port of BatchReplicationTest.testHdfsCopy
(FIXTURES.md B.7; reference ReplicationJob.java:61-103)."""

from __future__ import annotations

import os

from reair_spark.dirsync import sync_directories
from reair_spark.inventory import dirs_equal
from tests.test_batch_replication import _write_files


def test_sync_add_update_delete(spark, tmp_path):
    src, dest = str(tmp_path / "src"), str(tmp_path / "dest")
    _write_files(src, {"a.txt": "alpha", "sub/b.txt": "beta", "c.txt": "gamma"})
    _write_files(dest, {"c.txt": "stale-needs-update!", "gone.txt": "dest-only"})

    r = sync_directories(spark, [src], dest, delete_extraneous=True)
    actions = {x.rel_path: x.action for x in r["plan"].collect()}
    assert actions == {
        "a.txt": "ADD",
        "sub/b.txt": "ADD",
        "c.txt": "UPDATE",
        "gone.txt": "DELETE",
    }
    assert dirs_equal(spark, src, dest)
    assert not os.path.exists(f"{dest}/gone.txt")


def test_sync_trash_mode(spark, tmp_path):
    """--trash-dir: extras are moved aside (rel_path preserved), not
    unlinked — recoverable mass-delete."""
    src, dest = str(tmp_path / "src"), str(tmp_path / "dest")
    trash = str(tmp_path / "trash")
    _write_files(src, {"a.txt": "alpha"})
    _write_files(dest, {"a.txt": "alpha", "sub/gone.txt": "dest-only"})

    r = sync_directories(
        spark, [src], dest, delete_extraneous=True, trash_dir=trash
    )
    statuses = {x.src_file: x.status for x in r["results"].collect()}
    assert statuses == {f"{dest}/sub/gone.txt": "TRASHED"}
    assert not os.path.exists(f"{dest}/sub/gone.txt")
    assert open(f"{trash}/sub/gone.txt").read() == "dest-only"
    assert dirs_equal(spark, src, dest)


def test_sync_dry_run_copies_nothing(spark, tmp_path):
    src, dest = str(tmp_path / "src"), str(tmp_path / "dest")
    _write_files(src, {"a.txt": "alpha"})
    r = sync_directories(spark, [src], dest, dry_run=True)
    assert r["results"] is None
    assert not os.path.exists(f"{dest}/a.txt")


def test_multi_source_latest_mtime_wins(spark, tmp_path):
    s1, s2, dest = str(tmp_path / "s1"), str(tmp_path / "s2"), str(tmp_path / "dest")
    _write_files(s1, {"f.txt": "old-version"})
    _write_files(s2, {"f.txt": "new"})
    os.utime(f"{s1}/f.txt", (1000, 1000))
    os.utime(f"{s2}/f.txt", (2000, 2000))

    sync_directories(spark, [s1, s2], dest)
    assert open(f"{dest}/f.txt").read() == "new"


def test_sync_idempotent(spark, tmp_path):
    src, dest = str(tmp_path / "src"), str(tmp_path / "dest")
    _write_files(src, {"a.txt": "alpha", "b/c.txt": "beta"})
    sync_directories(spark, [src], dest)
    r2 = sync_directories(spark, [src], dest)
    assert {x.action for x in r2["plan"].collect()} == {"NO_OP"}
    assert r2["results"].count() == 0
