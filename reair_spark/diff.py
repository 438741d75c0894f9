"""Diff planner: catalog snapshots → action plan DataFrame.

The heart of the reference — TaskEstimator's per-object RPC decision
procedure (incremental/primitives/TaskEstimator.java:74-212) re-
expressed as ONE full-outer join per object level plus a CASE ladder.
The reference spends ~100 ms of metastore RPC per partition
(TableCompareWorker.java:45-47) and needed a 150-way MR shuffle to
hide it; here the whole warehouse diff is a declarative plan over two
snapshot DataFrames — at 100 TB the inputs are metadata-sized (rows ∝
objects, not bytes), the join keys are (db, table[, partition_name]),
and AQE picks broadcast vs sort-merge per side.

Decision table (TaskEstimatorTest.java:37-322 is the spec):
- src only                       → COPY_* (metadata + data)
- dest only                      → DROP_*
- both, stripped-metadata equal
  and data digests equal         → NO_OP
- both, metadata drift only      → COPY_* (update_metadata only)
- both, data drift               → COPY_* (update_data, + metadata if drifted)
- dest newer (TLDT) and
  overwrite_newer=False          → NO_OP (DEST_IS_NEWER guard,
  ReplicationUtils.isSrcOlder:557-572, TaskEstimator.java:101-111)
- views / s3-rooted locations    → data never copied
  (DestinationObjectFactory.java:49-77,160-166)

Plan row shape = FIXTURES.md B.5 (the stage-1 TSV of
MetastoreReplicationJob.java:124-133, minus the TSV).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from reair_spark.catalog import strip_non_comparables

# actions (TaskEstimate.TaskType, incremental/primitives/TaskEstimate.java:12-49)
COPY_UNPARTITIONED_TABLE = "COPY_UNPARTITIONED_TABLE"
COPY_PARTITIONED_TABLE = "COPY_PARTITIONED_TABLE"
COPY_PARTITION = "COPY_PARTITION"
DROP_TABLE = "DROP_TABLE"
DROP_PARTITION = "DROP_PARTITION"
NO_OP = "NO_OP"

PLAN_COLUMNS = [
    "action",
    "update_metadata",
    "update_data",
    "src_path",
    "dest_path",
    "db",
    "table",
    "partition_name",
]


def _with_digest(snapshot: DataFrame, digests: DataFrame | None) -> DataFrame:
    """Attach per-location data digests (inventory.dir_digest output,
    keyed by root) — null digest means location unknown/empty."""
    if digests is None:
        return snapshot.withColumn("data_digest", F.lit(None).cast("string"))
    d = digests.select(
        F.col("root").alias("location"),
        F.concat_ws(
            ":",
            F.col("n_files").cast("string"),
            F.col("total_size").cast("string"),
            F.col("digest").cast("string"),
        ).alias("data_digest"),
    )
    return snapshot.join(d, "location", "left")


def _meta_cmp_col(side: str, kind: str) -> F.Column:
    """Canonical comparable rendering of one side's metadata
    (stripNonComparables + schemasMatch in one string)."""
    params = strip_non_comparables(F.col(f"{side}.parameters"))
    canon_params = F.map_entries(params)
    canon_params = F.array_sort(canon_params)
    if kind == "table":
        return F.to_json(
            F.struct(
                F.col(f"{side}.table_type"),
                F.col(f"{side}.cols"),
                F.col(f"{side}.partition_keys"),
                F.col(f"{side}.serde"),
                canon_params.alias("params"),
            )
        )
    return F.to_json(
        F.struct(F.col(f"{side}.values"), canon_params.alias("params"))
    )


def _tldt(side: str) -> F.Column:
    return F.coalesce(
        F.element_at(F.col(f"{side}.parameters"), "transient_lastDdlTime").cast("long"),
        F.lit(0),
    )


def _diff(
    src: DataFrame,
    dest: DataFrame,
    keys: list[str],
    kind: str,
    copy_action,
    drop_action: str,
    overwrite_newer: bool,
) -> DataFrame:
    s = src.withColumn("present", F.lit(True)).alias("s")
    d = dest.withColumn("present", F.lit(True)).alias("d")
    joined = s.join(d, keys, "full_outer")

    src_exists = F.coalesce(F.col("s.present"), F.lit(False))
    dest_exists = F.coalesce(F.col("d.present"), F.lit(False))

    meta_equal = _meta_cmp_col("s", kind) == _meta_cmp_col("d", kind)
    data_equal = (
        F.col("s.data_digest").isNotNull()
        & (F.col("s.data_digest") == F.col("d.data_digest"))
    ) | (F.col("s.data_digest").isNull() & F.col("d.data_digest").isNull())

    # views and s3-rooted locations: metadata-only replication (F7)
    copies_data = F.lit(True)
    if kind == "table":
        copies_data = (F.col("s.table_type") != "VIRTUAL_VIEW") & ~F.coalesce(
            F.col("s.location").startswith("s3"), F.lit(False)
        )

    dest_is_newer = _tldt("d") > _tldt("s")
    newer_guard = F.lit(overwrite_newer) | ~dest_is_newer

    action = (
        F.when(src_exists & ~dest_exists, copy_action)
        .when(~src_exists & dest_exists, F.lit(drop_action))
        .when(meta_equal & (data_equal | ~copies_data), F.lit(NO_OP))
        .when(~newer_guard, F.lit(NO_OP))  # DEST_IS_NEWER
        .otherwise(copy_action)
    )
    is_copy = action.startswith("COPY")
    update_metadata = F.when(is_copy & (~dest_exists | ~meta_equal), True).otherwise(False)
    update_data = F.when(
        is_copy & copies_data & (~dest_exists | ~data_equal), True
    ).otherwise(False)

    part_col = (
        F.col("partition_name") if kind == "partition" else F.lit(None).cast("string")
    )
    return joined.select(
        action.alias("action"),
        update_metadata.alias("update_metadata"),
        update_data.alias("update_data"),
        F.col("s.location").alias("src_path"),
        F.col("d.location").alias("dest_path"),
        *[F.col(k) for k in keys if k != "partition_name"],
        part_col.alias("partition_name"),
    )


def table_diff(
    src_tables: DataFrame,
    dest_tables: DataFrame,
    src_digests: DataFrame | None = None,
    dest_digests: DataFrame | None = None,
    overwrite_newer: bool = True,
) -> DataFrame:
    """Table-level plan (J1: TaskEstimator.analyzeTableSpec:74-144).
    Partitioned tables get COPY_PARTITIONED_TABLE (metadata-only at
    table level; their data moves per-partition, same as the
    reference's eager dest-table create at TableCompareWorker:146-156)."""
    copy_action = F.when(
        F.size(F.coalesce(F.col("s.partition_keys"), F.array())) > 0,
        COPY_PARTITIONED_TABLE,
    ).otherwise(COPY_UNPARTITIONED_TABLE)
    src = _with_digest(src_tables, src_digests)
    dest = _with_digest(dest_tables, dest_digests)
    plan = _diff(
        src, dest, ["db", "table"], "table", copy_action, DROP_TABLE, overwrite_newer
    )
    # partitioned tables never copy table-level data
    return plan.withColumn(
        "update_data",
        F.when(F.col("action") == COPY_PARTITIONED_TABLE, False).otherwise(
            F.col("update_data")
        ),
    )


def schema_diff(src_tables: DataFrame, dest_tables: DataFrame) -> DataFrame:
    """Field-level schema drift between two catalog snapshots — the
    column-granular view underneath `schemasMatch` (ReplicationUtils
    .java:139-142 compares sd.cols/partitionKeys wholesale; this
    operator says WHICH fields moved): one row per (db, table, column)
    whose presence or type differs, classified ADDED (src-only),
    REMOVED (dest-only), RETYPED.

    Plan shape: posexplode both sides' cols arrays → one full-outer
    join on (db, table, col_name). Field rows ≈ tables × avg-width, so
    the shuffle is metadata-scale even for a 100k-table warehouse."""

    def fields(side: DataFrame, prefix: str) -> DataFrame:
        return side.select(
            "db", "table", F.posexplode("cols").alias("pos", "f")
        ).select(
            "db",
            "table",
            F.col("f.name").alias("col_name"),
            F.col("f.type").alias(f"{prefix}_type"),
        )

    s, d = fields(src_tables, "src"), fields(dest_tables, "dest")
    j = s.join(d, ["db", "table", "col_name"], "full_outer")
    change = (
        F.when(F.col("dest_type").isNull(), "ADDED")
        .when(F.col("src_type").isNull(), "REMOVED")
        .when(F.col("src_type") != F.col("dest_type"), "RETYPED")
        .otherwise("UNCHANGED")
    )
    return j.select(
        "db", "table", "col_name", "src_type", "dest_type",
        change.alias("change"),
    ).where(F.col("change") != "UNCHANGED")


def partition_diff(
    src_parts: DataFrame,
    dest_parts: DataFrame,
    src_digests: DataFrame | None = None,
    dest_digests: DataFrame | None = None,
    overwrite_newer: bool = True,
) -> DataFrame:
    """Partition-level plan (J2/SO1 collapsed: the reference's
    union(src,dest)→CHECK_PARTITION→re-analyze two-step
    (TableCompareWorker.java:158-172 + Stage1PartitionCompareReducer)
    collapses into one full-outer join)."""
    src = _with_digest(src_parts, src_digests)
    dest = _with_digest(dest_parts, dest_digests)
    return _diff(
        src,
        dest,
        ["db", "table", "partition_name"],
        "partition",
        F.lit(COPY_PARTITION),
        DROP_PARTITION,
        overwrite_newer,
    )


def warehouse_plan(
    src_tables: DataFrame,
    dest_tables: DataFrame,
    src_parts: DataFrame,
    dest_parts: DataFrame,
    src_digests: DataFrame | None = None,
    dest_digests: DataFrame | None = None,
    overwrite_newer: bool = True,
) -> DataFrame:
    """Full warehouse diff = table plan ∪ partition plan, the Spark
    equivalent of the reference's whole stage 1."""
    t = table_diff(src_tables, dest_tables, src_digests, dest_digests, overwrite_newer)
    p = partition_diff(src_parts, dest_parts, src_digests, dest_digests, overwrite_newer)
    return t.select(PLAN_COLUMNS).union(p.select(PLAN_COLUMNS))
