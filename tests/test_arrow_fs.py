"""ArrowFs: the generic pyarrow.fs backend for the FS seam (VERDICT
r5 ask #3). pyarrow's LocalFileSystem proves the adapter against a
third-party FS implementation — the same e2e surface the mock scheme
covers (distributed listing, cross-scheme copies, dirsync with trash,
replication with scheme-rooted table locations), so any hdfs://s3
deployment is `register_fs(ArrowFs(...))` and zero engine code."""

from __future__ import annotations

import os

import pytest

from reair_spark.copy import execute_copies, plan_copy_tasks
from reair_spark.fs import ArrowFs, register_fs, unregister_fs
from reair_spark.inventory import dir_digest, list_files


@pytest.fixture
def pafs(tmp_path):
    import pyarrow.fs as pa_fs

    fs = ArrowFs("pafs", pa_fs.LocalFileSystem(), str(tmp_path / "paroot"))
    os.makedirs(fs.root, exist_ok=True)
    register_fs(fs)
    yield fs
    unregister_fs("pafs")


def _seed(root, rel, data):
    p = os.path.join(root, rel)
    os.makedirs(os.path.dirname(p), exist_ok=True)
    with open(p, "wb") as fh:
        fh.write(data)


def test_adapter_primitive_contract(pafs, tmp_path):
    """The 9 primitives honor the seam's error contract (missing →
    FileNotFoundError, file-as-dir → NotADirectoryError) so retry/
    FAILED handling and the listing scan behave exactly as over
    LocalFs."""
    _seed(pafs.root, "d/a.bin", b"abc")
    assert pafs.stat("pafs://d/a.bin").size == 3
    assert pafs.isdir("pafs://d") and not pafs.isdir("pafs://d/a.bin")
    assert [e.name for e in pafs.scandir("pafs://d")] == ["a.bin"]
    with pytest.raises(FileNotFoundError):
        pafs.stat("pafs://nope")
    with pytest.raises(FileNotFoundError):
        pafs.scandir("pafs://nope")
    with pytest.raises(NotADirectoryError):
        pafs.scandir("pafs://d/a.bin")
    with pytest.raises(FileNotFoundError):
        pafs.open_read("pafs://nope")
    with pytest.raises(FileNotFoundError):
        pafs.rename("pafs://nope", "pafs://also_nope")
    with pytest.raises(FileNotFoundError):
        pafs.unlink("pafs://nope")
    with pytest.raises(FileNotFoundError):
        pafs.set_mtime("pafs://nope", 1000)
    # write path: create makes parents, rename publishes atomically
    with pafs.create("pafs://new/sub/f.bin") as fh:
        fh.write(b"payload")
        pafs.flush_and_sync(fh)
    pafs.rename("pafs://new/sub/f.bin", "pafs://new/sub/g.bin")
    with pafs.open_read("pafs://new/sub/g.bin") as fh:
        assert fh.read() == b"payload"
    pafs.unlink("pafs://new/sub/g.bin")
    assert not os.path.exists(os.path.join(pafs.root, "new/sub/g.bin"))


def test_list_files_over_pyarrow_scheme(spark, pafs):
    _seed(pafs.root, "wh/t1/p=1/f1", b"x" * 5)
    _seed(pafs.root, "wh/t1/p=2/f2", b"y" * 7)
    _seed(pafs.root, "wh/t1/_hidden", b"z")
    inv = list_files(spark, ["pafs://wh/t1"]).orderBy("rel_path").collect()
    assert [(r.rel_path, r.size) for r in inv] == [("p=1/f1", 5), ("p=2/f2", 7)]
    dg = dir_digest(list_files(spark, ["pafs://wh/t1"])).collect()[0]
    assert (dg.n_files, dg.total_size) == (2, 12)


def test_execute_copies_cross_scheme_pyarrow(spark, pafs, tmp_path):
    """pafs:// → local and local → pafs:// through Spark executors:
    the pickled pyarrow FileSystem crosses the worker boundary and the
    whole copy protocol (tmp, publish, skip) runs over the adapter."""
    _seed(pafs.root, "wh/t1/a", b"alpha")
    _seed(pafs.root, "wh/t1/d/b", b"beta!!")
    dest_root = str(tmp_path / "localwh" / "t1")
    plan = spark.createDataFrame(
        [("COPY_TABLE", True, "pafs://wh/t1", dest_root)],
        "action string, update_data boolean, src_path string, dest_path string",
    )
    tasks = plan_copy_tasks(plan, list_files(spark, ["pafs://wh/t1"]))
    assert sorted(r.status for r in execute_copies(spark, tasks).collect()) \
        == ["COPIED", "COPIED"]
    with open(os.path.join(dest_root, "a"), "rb") as fh:
        assert fh.read() == b"alpha"
    with open(os.path.join(dest_root, "d", "b"), "rb") as fh:
        assert fh.read() == b"beta!!"
    # reverse direction + idempotent re-run skips
    back = spark.createDataFrame(
        [("COPY_TABLE", True, dest_root, "pafs://wh2/t1")],
        "action string, update_data boolean, src_path string, dest_path string",
    )
    tasks2 = plan_copy_tasks(back, list_files(spark, [dest_root]))
    assert sorted(r.status for r in execute_copies(spark, tasks2).collect()) \
        == ["COPIED", "COPIED"]
    tasks3 = plan_copy_tasks(back, list_files(spark, [dest_root]))
    assert sorted(r.status for r in execute_copies(spark, tasks3).collect()) \
        == ["SKIPPED", "SKIPPED"]
    with open(os.path.join(pafs.root, "wh2/t1/a"), "rb") as fh:
        assert fh.read() == b"alpha"


def test_dirsync_over_pyarrow_scheme(spark, pafs, tmp_path):
    """Full sync (ADD/UPDATE/DELETE with trash) with the DEST on the
    pyarrow-backed scheme — listing, copy, and the delete/trash loop
    all through the adapter."""
    from reair_spark.dirsync import sync_directories

    src = str(tmp_path / "src")
    _seed(src, "a.txt", b"alpha")
    _seed(src, "sub/b.txt", b"beta")
    _seed(pafs.root, "dst/a.txt", b"OLD")  # size differs → UPDATE
    _seed(pafs.root, "dst/stale.txt", b"gone")
    out = sync_directories(
        spark, [src], "pafs://dst",
        delete_extraneous=True, trash_dir="pafs://trash",
    )
    got = {(r.status, r.src_file.split("/")[-1]) for r in out["results"].collect()}
    assert ("COPIED", "a.txt") in got and ("COPIED", "b.txt") in got
    assert any(s == "TRASHED" for s, _ in got)
    with open(os.path.join(pafs.root, "dst/a.txt"), "rb") as fh:
        assert fh.read() == b"alpha"
    with open(os.path.join(pafs.root, "dst/sub/b.txt"), "rb") as fh:
        assert fh.read() == b"beta"
    assert not os.path.exists(os.path.join(pafs.root, "dst/stale.txt"))
    with open(os.path.join(pafs.root, "trash/stale.txt"), "rb") as fh:
        assert fh.read() == b"gone"


def test_replication_with_pyarrow_rooted_locations(spark, pafs, tmp_path):
    """Batch replication where the SOURCE tables' data lives on the
    pyarrow scheme (catalog locations are pafs:// URIs): digesting,
    diffing, and copying all route through the adapter, and the dest
    warehouse converges locally."""
    from reair_spark.catalog import DirectoryCatalog
    from reair_spark.replicate import replicate_warehouse

    src_root, dest_root = str(tmp_path / "src_wh"), str(tmp_path / "dest_wh")
    src_cat = DirectoryCatalog(src_root)
    for t, payload in (("t1", b"alpha"), ("t2", b"beta-beta")):
        _seed(pafs.root, f"srcdata/{t}/part-0", payload)
        src_cat.create_table({
            "db": "db1", "table": t, "table_type": "MANAGED_TABLE",
            "cols": [{"name": "c1", "type": "string", "comment": None}],
            "partition_keys": [], "location": f"pafs://srcdata/{t}",
            "serde": "text",
            "parameters": {"transient_lastDdlTime": "100"},
        })
    out = replicate_warehouse(spark, src_root, dest_root)
    assert sorted(r.status for r in out["copy_results"].collect()) \
        == ["COPIED", "COPIED"]
    dest_cat = DirectoryCatalog(dest_root)
    for t, payload in (("t1", b"alpha"), ("t2", b"beta-beta")):
        rec = dest_cat.get_table("db1", t)
        # scheme-rooted src can't prefix-rewrite: dest lands at the
        # derived db/table layout, never pointing back at source data
        assert rec["location"] == f"{dest_root}/db1/{t}"
        with open(os.path.join(dest_root, "db1", t, "part-0"), "rb") as fh:
            assert fh.read() == payload


def test_conditional_put_subclass_closes_cas_window(spark, tmp_path):
    """The ask-#7 seam proof: an ArrowFs SUBCLASS whose
    create_exclusive_with_content is a genuine conditional write (the
    S3 If-None-Match / GCS generation-match-0 shape, modeled here with
    an in-process reservation that makes probe+publish one step)
    drives the descriptor CAS with NO visible-but-empty claim state —
    two racing descriptor updates both survive, and no steal ever
    fires. The engine code path is unchanged: the backend capability
    plugs in at the seam."""
    import json
    import threading

    import pyarrow.fs as pa_fs

    import reair_spark.sources as S
    from reair_spark.fs import ArrowFs, register_fs, unregister_fs

    lock = threading.Lock()

    class CondPutFs(ArrowFs):
        """LocalFileSystem + an atomic reserve: existence check and
        content publish under one mutex — the semantics a conditional
        PUT gives on a real object store."""

        def create_exclusive_with_content(self, path, data):
            from pyarrow.fs import FileType

            with lock:
                if self.arrow.get_file_info(
                    self._resolve(path)
                ).type != FileType.NotFound:
                    raise FileExistsError(path)
                fh = self.create(path)
                fh.write(data)
                fh.close()

    root = str(tmp_path / "condroot")
    os.makedirs(root, exist_ok=True)
    fs = CondPutFs("condput", pa_fs.LocalFileSystem(), root)
    register_fs(fs)
    try:
        loc = "condput://lay"
        # seed a descriptor through the normal first-write CAS
        out = S._meta_cas_update(loc, lambda m: {"seeded": True})
        assert out["seeded"] is True and out["meta_version"] == 1

        # two interleaved updates: the loser adopts and retries — both
        # survive, versions are strictly sequential, no empty claim
        # ever existed for a steal to race
        state = {"fired": False}

        def mutate_a(m):
            if not state["fired"]:
                state["fired"] = True
                S._meta_cas_update(loc, lambda mm: {**mm, "b": True})
            return {**m, "a": True}

        out = S._meta_cas_update(loc, mutate_a)
        assert out["a"] is True and out["b"] is True
        assert int(out["meta_version"]) == 3
        # every published version file carries content (never empty)
        vdir = os.path.join(root, "lay/_staging/meta")
        for v in os.listdir(vdir):
            with open(os.path.join(vdir, v)) as fh:
                assert json.load(fh).get("meta_version") is not None
    finally:
        unregister_fs("condput")
