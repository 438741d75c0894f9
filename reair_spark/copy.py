"""Executor-side file copy with an atomic commit protocol.

Spark mapping of the reference's stage 2 (batch/hive/
Stage2DirectoryCopyMapper/Reducer) and BatchUtils.doCopyFileAction
(batch/BatchUtils.java:39-132):

- plan → per-file copy tasks: the COPY rows join the src file
  inventory, producing one row per file (the reference's mapper emit).
- load-balance shuffle: repartition by a hash of (path, size, mtime) —
  the murmur3 re-key of Stage2DirectoryCopyMapper.java:116-125 — so
  one huge directory spreads over the cluster.
- per-file semantics preserved: skip if dest exists with same size
  (BatchUtils.java:64-72), copy to tmp file, fsync, atomic rename,
  preserve mtime, 3 attempts with backoff (BatchUtils.java:50-53).
- results come back as a DataFrame (status per file: COPIED/SKIPPED/
  FAILED + bytes) via mapPartitions — the engine's A6 counters are a
  groupBy away. No collect of file contents, ever.

Speculative execution must stay off for this stage (side-effecting
tasks; the reference insists too — MetastoreReplicationJob.java:251-258);
the session factory pins spark.speculation=false.

At 100 TB: tasks stream bytes file-by-file with O(buffer) memory;
task count scales with files; AQE coalesces small outputs.

Deliberate non-port (SURVEY.md §2.2): the reference's optimistic
common-dir copy coalescing (CopyPartitionsTask.java:163-235 — copy a
partitioned table's common ancestor once when its size ≤ 2× the
wanted partitions, then move partitions into place) exists to
amortize per-partition DistCp JOB LAUNCHES. Here the whole copy set
is per-file rows in ONE Spark job, so there is no launch to
amortize; coalescing would only add its own cost (copying up to 2×
the wanted bytes). plan_copy_tasks therefore stays a pure F6
projection + per-file expansion.
"""

from __future__ import annotations

import os
import time
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

COPY_RESULT_SCHEMA = T.StructType(
    [
        T.StructField("src_file", T.StringType()),
        T.StructField("dest_file", T.StringType()),
        T.StructField("status", T.StringType()),  # COPIED | SKIPPED | FAILED
        T.StructField("bytes_copied", T.LongType()),
        T.StructField("error", T.StringType()),
    ]
)

COPY_ATTEMPTS = 3


def plan_copy_tasks(plan: DataFrame, src_files: DataFrame) -> DataFrame:
    """COPY plan rows × src inventory → one row per file to move.

    F6 action projection (Stage2DirectoryCopyMapper.java:55-66): only
    COPY_* rows with update_data ever reach the data path. The join is
    src_path(prefix)-to-root equality — file inventories are listed per
    plan root so the key is exact, no prefix scans.
    """
    copies = plan.filter(
        F.col("action").startswith("COPY") & F.col("update_data")
    ).select("src_path", "dest_path")
    return (
        copies.join(src_files, copies.src_path == src_files.root)
        .select(
            F.concat_ws("/", "src_path", "rel_path").alias("src_file"),
            F.concat_ws("/", "dest_path", "rel_path").alias("dest_file"),
            "size",
            "mtime",
        )
    )


def _md5_of(fs, path: str) -> str:
    import hashlib

    h = hashlib.md5()
    with fs.open_read(path) as fh:
        while True:
            chunk = fh.read(1 << 20)
            if not chunk:
                break
            h.update(chunk)
    return h.hexdigest()


def _copy_one(
    src_file: str,
    dest_file: str,
    size: int,
    mtime: int,
    verify_checksum: bool = False,
    fs_registry: dict | None = None,
) -> tuple:
    """BatchUtils.doCopyFileAction semantics: skip same-size, tmp +
    fsync + atomic rename, preserve mtime, bounded retries.

    All file touches go through the pluggable FS seam
    (reair_spark.fs) resolved per-path, so cross-scheme copies
    (e.g. a registered remote scheme → local warehouse) are the same
    code path — the interface-level parity with FsUtils.java/
    DistCpWrapper.java the reference gets from Hadoop FileSystem.

    ``verify_checksum`` is the reference's config-gated checksum check
    (BatchUtils.java:105-117 / FsUtils.checksumsMatch:530-544): the
    skip-if-exists test additionally requires matching content digests
    (a same-size corrupted dest is re-copied, not skipped), and each
    copy attempt verifies the staged bytes against the source digest
    before the atomic publish — a mismatch burns the attempt and
    retries. Default off: it reads every byte of src and dest once
    more, the same cost trade the reference gates behind config."""
    import hashlib

    from reair_spark.fs import fs_for

    try:
        src_fs = fs_for(src_file, fs_registry)
        dst_fs = fs_for(dest_file, fs_registry)
    except ValueError as exc:
        # unregistered scheme in the plan: a per-file FAILED record the
        # summary surfaces, not a task crash that kills the whole stage
        return (src_file, dest_file, "FAILED", 0, f"ValueError: {exc}")
    try:
        st = dst_fs.stat(dest_file)
        if st.size == size and (
            not verify_checksum
            or _md5_of(dst_fs, dest_file) == _md5_of(src_fs, src_file)
        ):
            return (src_file, dest_file, "SKIPPED", 0, None)
    except FileNotFoundError:
        pass
    err = None
    for attempt in range(COPY_ATTEMPTS):
        try:
            tmp = f"{dest_file}.__copying_{os.getpid()}"
            n = 0
            src_md5 = hashlib.md5()
            with src_fs.open_read(src_file) as src, dst_fs.create(tmp) as dst:
                while True:
                    chunk = src.read(1 << 20)
                    if not chunk:
                        break
                    if verify_checksum:
                        src_md5.update(chunk)
                    dst.write(chunk)
                    n += len(chunk)
                dst_fs.flush_and_sync(dst)
            if verify_checksum and _md5_of(dst_fs, tmp) != src_md5.hexdigest():
                dst_fs.unlink(tmp)
                raise OSError("checksum mismatch after copy")
            dst_fs.set_mtime(tmp, mtime)
            dst_fs.rename(tmp, dest_file)  # atomic publish
            return (src_file, dest_file, "COPIED", n, None)
        except OSError as exc:  # pragma: no cover - exercised via FAILED test
            err = f"{type(exc).__name__}: {exc}"
            time.sleep(0.05 * (2**attempt))
    return (src_file, dest_file, "FAILED", 0, err)


def rebalance_tasks(tasks: DataFrame, parallelism: int | None = None) -> DataFrame:
    """The skew-busting second shuffle (X8): re-key copy tasks by a
    hash of (path, size, mtime) — the murmur3 re-key of
    Stage2DirectoryCopyMapper.java:116-125 — with task count sized by
    data volume (A8) unless given. Exposed as its own seam so the
    file-inventory scale gate drives the SAME rebalance
    execute_copies runs, with the byte-moving tail trimmed."""
    from reair_spark.plans import size_copy_parallelism

    parallelism = parallelism or size_copy_parallelism(tasks)
    return tasks.repartition(
        parallelism, F.xxhash64("src_file", "size", "mtime")
    )


def execute_copies(
    spark: SparkSession,
    tasks: DataFrame,
    parallelism: int | None = None,
    verify_checksum: bool = False,
) -> DataFrame:
    """Run the copy tasks executor-side; returns the per-file result
    DataFrame. Tasks are re-keyed by a hash of (path, size, mtime) —
    the reference's skew-busting second shuffle (X8) — with task count
    sized by data volume (A8: one task per 256 MB or 100 files,
    DistCpWrapperOptions.java:34-37) instead of a flat cluster constant.
    ``verify_checksum`` gates the per-file digest verification
    (BatchUtils.java:105-117)."""
    from reair_spark.fs import fs_registry
    from reair_spark.shipping import ensure_shipped

    ensure_shipped(spark)
    balanced = rebalance_tasks(tasks, parallelism)
    fses = fs_registry()  # driver registry snapshot rides the closure

    def run(rows: Iterator) -> Iterator[tuple]:
        for r in rows:
            yield _copy_one(
                r.src_file, r.dest_file, r.size, r.mtime,
                verify_checksum=verify_checksum, fs_registry=fses,
            )

    return spark.createDataFrame(balanced.rdd.mapPartitions(run), COPY_RESULT_SCHEMA)


def copy_summary(results: DataFrame) -> DataFrame:
    """A6 counters: counts + bytes by outcome
    (incremental/ReplicationCounters.java)."""
    return results.groupBy("status").agg(
        F.count("*").alias("n_files"), F.sum("bytes_copied").alias("bytes")
    )
