"""Fault-injection property tests for the copy/commit protocol
(VERDICT r5 ask #2): a FailingFs over the r5 FS seam fails the Nth
open/create/fsync/set_mtime/rename deterministically, and the suite
asserts the reference's recovery semantics hold as PROPERTIES —
bounded in-task retry absorbs transients (BatchUtils.java:50-53), a
persistent fault yields a per-file FAILED row (never a task crash), a
re-run converges idempotently (skip via size, DistCpWrapper.java:
94-98's tmp + atomic publish means no partial file is ever visible at
the published destination name), and a crash between the copy and
commit phases is healed by the next full replication
(DistCpWrapper.java:203-213)."""

from __future__ import annotations

import os

import pytest

from reair_spark.copy import execute_copies, plan_copy_tasks
from reair_spark.fs import FailingFs, register_fs, unregister_fs
from reair_spark.inventory import list_files


@pytest.fixture
def failfs(tmp_path):
    fs = FailingFs(
        "failfs", str(tmp_path / "failroot"), str(tmp_path / "board")
    )
    register_fs(fs)
    yield fs
    unregister_fs("failfs")


def _seed(root, rel, data):
    p = os.path.join(root, rel)
    os.makedirs(os.path.dirname(p), exist_ok=True)
    with open(p, "wb") as fh:
        fh.write(data)


def _copy_round(spark, src_path, dest_path):
    plan = spark.createDataFrame(
        [("COPY_TABLE", True, src_path, dest_path)],
        "action string, update_data boolean, src_path string, dest_path string",
    )
    tasks = plan_copy_tasks(plan, list_files(spark, [src_path]))
    return sorted(
        execute_copies(spark, tasks).collect(),
        key=lambda r: r.src_file,
    )


def _published_ok(fs, src_root_dir, dest_rel_dir):
    """Property: every file visible at the published destination name
    equals its source bytes — a partially-written file must never be
    observable (tmp + atomic rename)."""
    dest_dir = os.path.join(fs.root, dest_rel_dir)
    if not os.path.isdir(dest_dir):
        return
    for name in os.listdir(dest_dir):
        if name.startswith(".__copying_") or ".__copying_" in name:
            continue  # staging debris is not a published name
        with open(os.path.join(dest_dir, name), "rb") as fh:
            got = fh.read()
        with open(os.path.join(src_root_dir, name), "rb") as fh:
            want = fh.read()
        assert got == want, f"partial published file {name}"


@pytest.mark.parametrize("op", ["create", "flush_and_sync", "set_mtime", "rename"])
def test_transient_fault_absorbed_by_in_task_retry(spark, failfs, tmp_path, op):
    """Schedules 1-4: one injected failure per op — the bounded 3-
    attempt retry inside _copy_one converges without surfacing any
    FAILED row, and the published bytes are exact."""
    src_dir = str(tmp_path / "src" / "t1")
    _seed(src_dir, "a.bin", b"alpha-payload")
    _seed(src_dir, "b.bin", b"b" * 4096)
    FailingFs.schedule(failfs.board, op, "a.bin", 1)

    res = _copy_round(spark, src_dir, "failfs://wh/t1")
    assert [r.status for r in res] == ["COPIED", "COPIED"]
    _published_ok(failfs, src_dir, "wh/t1")
    with open(os.path.join(failfs.root, "wh/t1/a.bin"), "rb") as fh:
        assert fh.read() == b"alpha-payload"


@pytest.mark.parametrize("op", ["rename", "create", "flush_and_sync"])
def test_persistent_fault_fails_row_then_rerun_converges(
    spark, failfs, tmp_path, op
):
    """Schedules 5-7: a fault outlasting all 3 attempts produces a
    per-file FAILED row (not a task crash), never publishes a partial
    file, and a plain re-run — the operator's recovery action —
    converges: the failed file copies, the good file SKIPs
    (idempotent size check)."""
    src_dir = str(tmp_path / "src" / "t2")
    _seed(src_dir, "bad.bin", b"x" * 1000)
    _seed(src_dir, "good.bin", b"y" * 10)
    FailingFs.schedule(failfs.board, op, "bad.bin", 3)

    res = _copy_round(spark, src_dir, "failfs://wh/t2")
    by_name = {os.path.basename(r.src_file): r for r in res}
    assert by_name["bad.bin"].status == "FAILED"
    assert "injected" in by_name["bad.bin"].error
    assert by_name["good.bin"].status == "COPIED"
    # the published name must not exist (atomic publish never happened)
    assert not os.path.exists(os.path.join(failfs.root, "wh/t2/bad.bin"))
    _published_ok(failfs, src_dir, "wh/t2")

    res2 = _copy_round(spark, src_dir, "failfs://wh/t2")
    by_name2 = {os.path.basename(r.src_file): r for r in res2}
    assert by_name2["bad.bin"].status == "COPIED"
    assert by_name2["good.bin"].status == "SKIPPED"
    _published_ok(failfs, src_dir, "wh/t2")


def test_src_read_fault_fails_row_then_rerun_converges(spark, failfs, tmp_path):
    """Schedule 8: the SOURCE side faults (open_read) — same contract:
    FAILED row, nothing published, re-run converges."""
    _seed(failfs.root, "wh/src_t/a.bin", b"payload-a")
    FailingFs.schedule(failfs.board, "open_read", "a.bin", 3)
    dest_dir = str(tmp_path / "dest" / "src_t")

    res = _copy_round(spark, "failfs://wh/src_t", dest_dir)
    # open_read faults hit both the listing-side? no — listing uses
    # scandir; only the copy read faults
    assert [r.status for r in res] == ["FAILED"]
    assert not os.path.exists(os.path.join(dest_dir, "a.bin"))

    res2 = _copy_round(spark, "failfs://wh/src_t", dest_dir)
    assert [r.status for r in res2] == ["COPIED"]
    with open(os.path.join(dest_dir, "a.bin"), "rb") as fh:
        assert fh.read() == b"payload-a"


def test_crash_between_copy_and_commit_heals_on_rerun(spark, tmp_path):
    """Schedule 9: the driver dies AFTER the data stage lands but
    BEFORE any metadata commits (the window ST6's ordering creates).
    The next full replication must converge: copies all SKIP
    (idempotent size check — no byte moves twice), commits land, and
    the dest catalog matches src."""
    from reair_spark.catalog import DirectoryCatalog
    from reair_spark.commit import rewrite_locations
    from reair_spark.diff import warehouse_plan
    from reair_spark.replicate import _digests, replicate_warehouse
    from reair_spark.catalog import snapshot_partitions, snapshot_tables

    src_root, dest_root = str(tmp_path / "src_wh"), str(tmp_path / "dest_wh")
    src_cat = DirectoryCatalog(src_root)
    for t, payload in (("t1", b"alpha"), ("t2", b"beta-beta")):
        loc = src_cat.table_location("db1", t)
        _seed(loc, "part-0", payload)
        src_cat.create_table({
            "db": "db1", "table": t, "table_type": "MANAGED_TABLE",
            "cols": [{"name": "c1", "type": "string", "comment": None}],
            "partition_keys": [], "location": loc, "serde": "text",
            "parameters": {"transient_lastDdlTime": "100"},
        })

    # ---- run ONLY stages 1+2 (plan + copy), then "crash" ----
    src_t = snapshot_tables(spark, src_cat)
    dest_t = snapshot_tables(spark, DirectoryCatalog(dest_root))
    src_p = snapshot_partitions(spark, src_cat)
    dest_p = snapshot_partitions(spark, DirectoryCatalog(dest_root))
    inv, dg = _digests(spark, src_t, src_p, dest_t, dest_p)
    plan = rewrite_locations(
        warehouse_plan(src_t, dest_t, src_p, dest_p, dg, dg, True),
        src_root, dest_root,
    )
    tasks = plan_copy_tasks(plan, inv)
    pre = execute_copies(spark, tasks).collect()
    assert sorted(r.status for r in pre) == ["COPIED", "COPIED"]
    # crash: no commit stage — data on disk, catalog empty
    assert DirectoryCatalog(dest_root).get_table("db1", "t1") is None

    # ---- operator recovery: plain full replication ----
    out = replicate_warehouse(spark, src_root, dest_root)
    statuses = [r.status for r in out["copy_results"].collect()]
    assert sorted(statuses) == ["SKIPPED", "SKIPPED"]  # no byte moves twice
    commits = {
        (r["action"], r["status"])
        for r in out["commit_results"].collect()
    }
    assert all(s == "SUCCESSFUL" for _, s in commits)
    dest_cat = DirectoryCatalog(dest_root)
    for t, payload in (("t1", b"alpha"), ("t2", b"beta-beta")):
        assert dest_cat.get_table("db1", t) is not None
        with open(os.path.join(dest_root, "db1", t, "part-0"), "rb") as fh:
            assert fh.read() == payload


def test_trash_move_fault_yields_failed_row_then_rerun_trashes(
    spark, failfs, tmp_path
):
    """Schedule 10: the DELETE-to-trash path faults on the trash
    rename — the row comes back FAILED (never a task crash), the stale
    file survives at the dest (nothing half-deleted), and the next
    sync completes the trash move."""
    from reair_spark.dirsync import sync_directories

    src = str(tmp_path / "src")
    _seed(src, "keep.txt", b"keep")
    _seed(failfs.root, "dst/keep.txt", b"keep")
    _seed(failfs.root, "dst/stale.txt", b"gone")
    FailingFs.schedule(failfs.board, "rename", "stale.txt", 1)

    out = sync_directories(
        spark, [src], "failfs://dst",
        delete_extraneous=True, trash_dir="failfs://trash",
    )
    rows = {r.src_file.split("/")[-1]: r.status for r in out["results"].collect()}
    assert rows["stale.txt"] == "FAILED"
    # nothing half-deleted: the stale file is still at the dest
    assert os.path.exists(os.path.join(failfs.root, "dst/stale.txt"))

    out2 = sync_directories(
        spark, [src], "failfs://dst",
        delete_extraneous=True, trash_dir="failfs://trash",
    )
    rows2 = {r.src_file.split("/")[-1]: r.status for r in out2["results"].collect()}
    assert rows2["stale.txt"] == "TRASHED"
    assert not os.path.exists(os.path.join(failfs.root, "dst/stale.txt"))
    with open(os.path.join(failfs.root, "trash/stale.txt"), "rb") as fh:
        assert fh.read() == b"gone"


# ---------- streaming replication loop under injected faults ---------
# (VERDICT r6 ask #2; reference analog: requeue of persisted-but-
# unfinished jobs on server restart, ReplicationServer.java:384-390 /
# PersistedJobInfoStore.java:107-135)


def _stream_warehouse(spark, tmp_path, failfs):
    """Three tables created across three audit-log flushes (one parquet
    file each, so maxFilesPerTrigger=1 yields one micro-batch per
    table). Source DATA lives on the FailingFs scheme (catalog metadata
    stays local); every src read crosses the injectable seam."""
    import datetime as _dt

    from reair_spark.catalog import DirectoryCatalog
    from reair_spark.hook import AuditLogHook

    src_root = str(tmp_path / "src_wh")
    dest_root = str(tmp_path / "dest_wh")
    src_cat = DirectoryCatalog(src_root)
    hook = AuditLogHook(
        spark, str(tmp_path / "audit"),
        clock=lambda: _dt.datetime(2020, 1, 1),
    )
    for i, t in enumerate(["t1", "t2", "t3"]):
        _seed(failfs.root, f"wh-src/{t}/{t}.bin", bytes([65 + i]) * (10 + i))
        src_cat.create_table({
            "db": "wh", "table": t, "table_type": "MANAGED_TABLE",
            "cols": [{"name": "c1", "type": "string", "comment": None}],
            "partition_keys": [], "location": f"failfs://wh-src/{t}",
            "serde": "text", "parameters": {"transient_lastDdlTime": "100"},
        })
        hook.record(f"CREATE TABLE wh.{t} (c1 string)")
        hook.flush()  # one parquet file per event → one micro-batch each
    return hook, src_root, dest_root, str(tmp_path / "state")


def _run_stream(spark, hook, src_root, dest_root, state_dir):
    from reair_spark.streaming import stream_replicate

    schema = spark.read.parquet(hook.log_path).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(hook.log_path)
    )
    stream_replicate(
        spark, stream, src_root, dest_root,
        state_dir, f"{state_dir}/_checkpoint",
    )


def _dest_files(dest_root):
    out = {}
    for dirpath, _dirs, files in os.walk(dest_root):
        for f in files:
            if "_catalog" in dirpath or f.startswith("."):
                continue
            p = os.path.join(dirpath, f)
            with open(p, "rb") as fh:
                out[f] = fh.read()
    return out


def _assert_converged(spark, failfs, dest_root, state_dir):
    from reair_spark.state import JobStore

    got = _dest_files(dest_root)
    assert got == {
        "t1.bin": b"A" * 10, "t2.bin": b"B" * 11, "t3.bin": b"C" * 12,
    }
    store = JobStore(spark, f"{state_dir}/replication_jobs")
    cur = store.current().collect()
    # one latest row per job, all terminal SUCCESSFUL, no duplicates
    assert len(cur) == len({r.job_id for r in cur}) == 3
    assert {r.status for r in cur} == {"SUCCESSFUL"}


def test_stream_crash_mid_batch_recovers_from_checkpoint(
    spark, failfs, tmp_path
):
    """Schedule S1 (crash-in-batch): the SECOND micro-batch dies
    mid-copy on an InjectedCrash (not an OSError — nothing absorbs
    it). Restarting the stream from its checkpoint replays exactly the
    dead batch and converges; the batch that had already COMMITTED is
    never re-read (zero re-copied bytes: its src open_read count stays
    at 1 across crash + recovery)."""
    import pyspark.errors

    hook, src_root, dest_root, state_dir = _stream_warehouse(
        spark, tmp_path, failfs
    )
    FailingFs.schedule(failfs.board, "open_read", "t2.bin", 1, kind="crash")

    with pytest.raises(pyspark.errors.exceptions.base.PySparkException,
                       match="injected open_read crash"):
        _run_stream(spark, hook, src_root, dest_root, state_dir)
    # batch 0 (t1) committed before the crash; t2 never published
    assert _dest_files(dest_root).get("t1.bin") == b"A" * 10
    assert "t2.bin" not in _dest_files(dest_root)
    reads_t1_after_crash = FailingFs.op_count(
        failfs.board, "open_read", "t1.bin"
    )

    _run_stream(spark, hook, src_root, dest_root, state_dir)  # recovery
    _assert_converged(spark, failfs, dest_root, state_dir)
    # committed batch was not replayed: t1 bytes moved exactly once
    assert FailingFs.op_count(failfs.board, "open_read", "t1.bin") \
        == reads_t1_after_crash == 1


def test_stream_crash_between_batches_replays_only_tail(
    spark, failfs, tmp_path
):
    """Schedule S2 (crash-between-batches): batches 0 and 1 commit,
    the LAST batch dies. Restart replays only the tail batch — both
    earlier tables keep open_read count 1 (no re-copied bytes, no
    duplicate job rows)."""
    import pyspark.errors

    hook, src_root, dest_root, state_dir = _stream_warehouse(
        spark, tmp_path, failfs
    )
    FailingFs.schedule(failfs.board, "open_read", "t3.bin", 1, kind="crash")

    with pytest.raises(pyspark.errors.exceptions.base.PySparkException,
                       match="injected open_read crash"):
        _run_stream(spark, hook, src_root, dest_root, state_dir)
    assert set(_dest_files(dest_root)) == {"t1.bin", "t2.bin"}

    _run_stream(spark, hook, src_root, dest_root, state_dir)
    _assert_converged(spark, failfs, dest_root, state_dir)
    for name in ("t1.bin", "t2.bin"):
        assert FailingFs.op_count(failfs.board, "open_read", name) == 1


def test_stream_transient_fault_absorbed_without_restart(
    spark, failfs, tmp_path
):
    """Schedule S3 (transient inside a micro-batch): a one-shot OSError
    on a src read is absorbed by the copy layer's bounded in-task
    retry — the streaming query completes on the FIRST run, converged,
    with the retried file read exactly twice (failed attempt +
    success) and no FAILED job row."""
    hook, src_root, dest_root, state_dir = _stream_warehouse(
        spark, tmp_path, failfs
    )
    FailingFs.schedule(failfs.board, "open_read", "t2.bin", 1)  # oserror

    _run_stream(spark, hook, src_root, dest_root, state_dir)
    _assert_converged(spark, failfs, dest_root, state_dir)
    assert FailingFs.op_count(failfs.board, "open_read", "t2.bin") == 2


# ---------- RetryingFs: bounded retry at the seam (VERDICT r6 #7) ----


def test_retrying_fs_absorbs_two_failure_transient_schedule(
    spark, tmp_path
):
    """A 2-failure transient schedule on the destination create is
    absorbed entirely INSIDE the seam by RetryingFs — the copy round
    reports COPIED with no FAILED row, and the inner FS saw exactly
    3 create calls (2 faulted + 1 success)."""
    from reair_spark.fs import RetryingFs

    inner = FailingFs(
        "retryfs", str(tmp_path / "root"), str(tmp_path / "board")
    )
    register_fs(RetryingFs(inner, attempts=3))
    try:
        src_dir = str(tmp_path / "src" / "t1")
        _seed(src_dir, "a.bin", b"payload")
        FailingFs.schedule(inner.board, "create", "a.bin", 2)

        res = _copy_round(spark, src_dir, "retryfs://wh/t1")
        assert [r.status for r in res] == ["COPIED"]
        assert FailingFs.op_count(inner.board, "create", "a.bin") == 3
        with open(os.path.join(inner.root, "wh/t1/a.bin"), "rb") as fh:
            assert fh.read() == b"payload"
    finally:
        unregister_fs("retryfs")


def test_retrying_fs_extends_copy_retry_depth(spark, tmp_path):
    """A 4-failure schedule exhausts the copy layer's own 3 attempts
    (unwrapped → FAILED row) but is absorbed when the seam retries
    inside each attempt (wrapped → COPIED) — the two retry layers
    compose multiplicatively, the property a throttling object store
    needs."""
    from reair_spark.fs import RetryingFs

    inner = FailingFs(
        "deepfs", str(tmp_path / "root"), str(tmp_path / "board")
    )

    register_fs(inner)  # unwrapped first
    try:
        src_dir = str(tmp_path / "src" / "t2")
        _seed(src_dir, "b.bin", b"x" * 64)
        FailingFs.schedule(inner.board, "create", "b.bin", 4)
        res = _copy_round(spark, src_dir, "deepfs://wh/t2")
        assert [r.status for r in res] == ["FAILED"]
    finally:
        unregister_fs("deepfs")

    register_fs(RetryingFs(inner, attempts=3))  # 1 fault left; absorbed
    try:
        res = _copy_round(spark, src_dir, "deepfs://wh/t2")
        assert [r.status for r in res] == ["COPIED"]
    finally:
        unregister_fs("deepfs")


def test_retrying_fs_does_not_retry_contract_errors(tmp_path):
    """FileNotFoundError must surface on the FIRST call (the copy
    layer's skip-if-exists probe depends on it): no sleeps, no
    attempts burned."""
    import time as _time

    from reair_spark.fs import LocalFs, RetryingFs

    fs = RetryingFs(LocalFs(), attempts=5, backoff_s=10.0)
    t0 = _time.time()
    with pytest.raises(FileNotFoundError):
        fs.stat(str(tmp_path / "nope.bin"))
    assert _time.time() - t0 < 1.0  # would be ≥150s if retried


def test_retrying_fs_over_arrowfs_scheme_end_to_end(spark, tmp_path):
    """The wrapper is transparent over an ArrowFs-backed scheme: a
    full dirsync onto retry-wrapped pyarrow LocalFileSystem converges
    byte-identically (reference parity: RetryingTaskRunner wrapping
    every FsUtils action)."""
    import pyarrow.fs as pa_fs

    from reair_spark.dirsync import sync_directories
    from reair_spark.fs import ArrowFs, RetryingFs

    register_fs(RetryingFs(
        ArrowFs("rarrow", pa_fs.LocalFileSystem(), str(tmp_path / "paroot"))
    ))
    try:
        src = str(tmp_path / "src")
        _seed(src, "a.txt", b"alpha")
        _seed(src, "sub/b.txt", b"beta")
        r = sync_directories(spark, [src], "rarrow://dest")
        assert sorted(x.status for x in r["results"].collect()) \
            == ["COPIED", "COPIED"]
        with open(tmp_path / "paroot" / "dest" / "sub" / "b.txt", "rb") as fh:
            assert fh.read() == b"beta"
    finally:
        unregister_fs("rarrow")


# ---------- dirsync delete/trash path under injected faults ----------


def test_sync_trash_rename_fault_fails_row_then_rerun_trashes(
    spark, failfs, tmp_path
):
    """Schedule D1: the trash MOVE (rename) faults — the row reports
    FAILED (not a task crash), the extra file stays where it was
    (nothing half-moved), and the next sync retries and trashes it."""
    from reair_spark.dirsync import sync_directories

    src = str(tmp_path / "src")
    _seed(src, "keep.txt", b"keep")
    _seed(failfs.root, "dest/keep.txt", b"keep")
    _seed(failfs.root, "dest/stale.txt", b"old")
    FailingFs.schedule(failfs.board, "rename", "stale.txt", 1)

    r = sync_directories(
        spark, [src], "failfs://dest",
        delete_extraneous=True, trash_dir="failfs://trash",
    )
    by_status = {x.status for x in r["results"].collect()}
    assert "FAILED" in by_status
    assert os.path.exists(os.path.join(failfs.root, "dest/stale.txt"))
    assert not os.path.exists(os.path.join(failfs.root, "trash/stale.txt"))

    r2 = sync_directories(
        spark, [src], "failfs://dest",
        delete_extraneous=True, trash_dir="failfs://trash",
    )
    assert {x.status for x in r2["results"].collect()} == {"TRASHED"}
    assert not os.path.exists(os.path.join(failfs.root, "dest/stale.txt"))
    with open(os.path.join(failfs.root, "trash/stale.txt"), "rb") as fh:
        assert fh.read() == b"old"


def test_sync_unlink_fault_fails_row_then_rerun_deletes(
    spark, failfs, tmp_path
):
    """Schedule D2: plain delete mode, unlink faults once — FAILED
    row, file survives, rerun deletes it."""
    from reair_spark.dirsync import sync_directories

    src = str(tmp_path / "src")
    _seed(src, "keep.txt", b"keep")
    _seed(failfs.root, "dest/keep.txt", b"keep")
    _seed(failfs.root, "dest/gone.txt", b"x")
    FailingFs.schedule(failfs.board, "unlink", "gone.txt", 1)

    r = sync_directories(spark, [src], "failfs://dest",
                         delete_extraneous=True)
    assert {x.status for x in r["results"].collect()} == {"FAILED"}
    assert os.path.exists(os.path.join(failfs.root, "dest/gone.txt"))

    r2 = sync_directories(spark, [src], "failfs://dest",
                          delete_extraneous=True)
    assert {x.status for x in r2["results"].collect()} == {"DELETED"}
    assert not os.path.exists(os.path.join(failfs.root, "dest/gone.txt"))


# ---------------------------------------------------------------------------
# zone-mapped layout lifecycle under injected crashes (VERDICT r9 ask
# #2): the streaming-replication treatment applied to the table-format
# layer — the lifecycle routes all metadata ops through the fs seam,
# so FailingFs can kill the exact rename that publishes a delta or
# swaps a compacted layout, and recovery must converge.
# ---------------------------------------------------------------------------


def _zm_frame(spark, n=400):
    from pyspark.sql import functions as F

    return spark.range(n).select(
        "id",
        (F.col("id") % 2).cast("string").alias("b"),
        F.col("id").alias("v"),
    )


def test_zonemap_delta_publish_crash_then_replay_heals(spark, failfs):
    """Crash ON the delta-publish rename: the batch's data lands but
    its manifest delta does not — the ingest is invisible to every
    scan (readers build paths FROM the manifest), listed as an orphan,
    and a replay of the same batch id completes the append exactly
    (idempotent dynamic overwrite + same delta dir)."""
    from reair_spark.fs import InjectedCrash
    from reair_spark.sources import (
        append_zonemapped,
        zonemap_orphan_ingests,
        zonemap_scan,
    )

    loc = "failfs://wh/zm"
    df = _zm_frame(spark)
    append_zonemapped(df.filter("id < 200"), loc, "b", ["v"], ingest_id=0)
    _, before = zonemap_scan(spark, loc)
    assert before["n_rows_scanned"] == 200

    FailingFs.schedule(failfs.board, "rename", "ingest=1", 1, kind="crash")
    with pytest.raises(InjectedCrash):
        append_zonemapped(
            df.filter("id >= 200"), loc, "b", ["v"], ingest_id=1
        )
    # unpublished ⇒ invisible (and the staged debris is swept)
    assert zonemap_scan(spark, loc)[1] == before
    assert not os.listdir(
        os.path.join(failfs.root, "wh/zm/_staging")
    )
    assert zonemap_orphan_ingests(loc) == [1]

    append_zonemapped(df.filter("id >= 200"), loc, "b", ["v"], ingest_id=1)
    _, after = zonemap_scan(spark, loc)
    assert after["n_rows_scanned"] == 400
    assert zonemap_orphan_ingests(loc) == []


def test_zonemap_compact_swap_crash_leaves_layout_intact(spark, failfs):
    """Crash ON the compact swap's first rename (the park): the
    canonical layout is untouched, the fully-built compact tmp is
    debris the next reader sweeps, and a re-run of compaction
    completes to one delta with identical answers."""
    from reair_spark.fs import InjectedCrash
    from reair_spark.sources import (
        append_zonemapped,
        zonemap_compact,
        zonemap_scan,
    )

    loc = "failfs://wh/zc"
    df = _zm_frame(spark)
    for i in range(2):
        append_zonemapped(
            df.filter(f"id % 2 = {i}"), loc, "b", ["v"], ingest_id=i
        )
    _, before = zonemap_scan(spark, loc)
    assert before["n_rows_scanned"] == 400

    FailingFs.schedule(failfs.board, "rename", "zc", 1, kind="crash")
    with pytest.raises(InjectedCrash):
        zonemap_compact(spark, loc)
    # canonical layout untouched; tmp debris present, then swept
    root = os.path.join(failfs.root, "wh")
    assert any(n.startswith("zc_.compact_") for n in os.listdir(root))
    assert zonemap_scan(spark, loc)[1] == before
    assert [n for n in os.listdir(root) if n.startswith("zc_.")] == []

    stats = zonemap_compact(spark, loc)
    assert stats == {"deltas_before": 2, "deltas_after": 1}
    assert zonemap_scan(spark, loc)[1]["n_rows_scanned"] == 400


# ---- DirectoryCatalog record publish through the seam (VERDICT r10
# ask #7: the catalog store was the last writer off fs.py) -----------


def test_directory_catalog_on_mock_scheme(failfs):
    """The whole record lifecycle works against a registered scheme
    root — proof the catalog I/O runs on the seam, not raw os.*."""
    from reair_spark.catalog import DirectoryCatalog

    cat = DirectoryCatalog("failfs://wh")
    cat.create_table({
        "db": "d1", "table": "t1", "table_type": "MANAGED_TABLE",
        "cols": [], "partition_keys": [],
        "location": cat.table_location("d1", "t1"), "serde": "text",
        "parameters": {"transient_lastDdlTime": "7"},
    })
    assert cat.databases() == ["d1"]
    assert cat.tables("d1") == ["t1"]
    assert cat.get_table("d1", "t1")["parameters"][
        "transient_lastDdlTime"] == "7"
    cat.add_partition("d1", "t1", {
        "partition_name": "ds=1", "values": ["1"],
        "location": cat.table_location("d1", "t1") + "/ds=1",
        "parameters": {},
    })
    assert [p["partition_name"] for p in cat.get_partitions("d1", "t1")] \
        == ["ds=1"]
    cat.drop_table("d1", "t1")
    assert cat.get_table("d1", "t1") is None


def test_directory_catalog_publish_crash_never_tears_record(failfs):
    """A crash on the tmp→final rename leaves the OLD record intact
    (atomic replace discipline); the retried write then lands the new
    one. A torn/half-written record is never observable."""
    from reair_spark.catalog import DirectoryCatalog

    cat = DirectoryCatalog("failfs://wh")
    rec = {
        "db": "d1", "table": "t1", "table_type": "MANAGED_TABLE",
        "cols": [], "partition_keys": [],
        "location": cat.table_location("d1", "t1"), "serde": "text",
        "parameters": {"transient_lastDdlTime": "1"},
    }
    cat.create_table(rec)
    FailingFs.schedule(failfs.board, "rename", "t1.json", 1)
    new = dict(rec, parameters={"transient_lastDdlTime": "2"})
    with pytest.raises(OSError):
        cat.alter_table(new)
    # old record still whole and parseable
    assert cat.get_table("d1", "t1")["parameters"][
        "transient_lastDdlTime"] == "1"
    cat.alter_table(new)  # retry converges
    assert cat.get_table("d1", "t1")["parameters"][
        "transient_lastDdlTime"] == "2"
