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
