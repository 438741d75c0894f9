"""Partition discovery — the MSCK REPAIR TABLE workflow.

A replicated warehouse drifts when writers land partition directories
without registering them (Hive's classic failure mode; the reference
inherits it because its copies move DIRECTORIES and its commits
register what the PLAN knew, not what arrived). Hive answers with
``MSCK REPAIR TABLE`` / the metastore's partition-discovery thread;
this module is that workflow on the engine's own primitives:

  1. list the table location through the FS seam
     (inventory.list_files — executor-side, any registered scheme),
  2. derive on-disk partition names from the ``k=v[/k2=v2]`` path
     prefixes (depth = |partition_keys|),
  3. full-outer diff against the catalog's partition list:
       ADD     on disk, not in catalog  (register it)
       ORPHAN  in catalog, no directory (drop candidate — Hive's
               `MSCK ... SYNC PARTITIONS` semantics, gated here
               behind ``drop_orphans`` exactly like dirsync's
               delete_extraneous)
       OK      both sides agree
  4. ``msck_repair`` applies the ADDs (and optionally the drops)
     through the MetastoreCatalog protocol.

Scale: the listing is the audited executor-side scan; the name
derivation and diff are one distinct + one full-outer join on
partition_name — metadata-sized, same class as partition_diff. The
`partition_discovery` gate drives the diff logic with derived inputs;
the pytest drives the full loop against a real DirectoryCatalog tree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from reair_spark.catalog import MetastoreCatalog, partition_name_to_values
from reair_spark.inventory import list_files
from reair_spark.io import rows_df

PART_SEG_RE = r"^[^=/]+=[^/]+$"


def disk_partitions(files: DataFrame, depth: int = 1) -> DataFrame:
    """File listing → DISTINCT on-disk partition names: the first
    ``depth`` path segments of each rel_path that look like ``k=v``.
    Files not under a full k=v prefix (stray files at the table root)
    are ignored, as Hive's discovery does."""
    segs = F.slice(F.split("rel_path", "/"), 1, depth)
    ok = F.size(F.filter(segs, lambda s: s.rlike(PART_SEG_RE))) == depth
    return (
        files.where(ok)
        .select(F.concat_ws("/", segs).alias("partition_name"))
        .distinct()
    )


def partition_discovery_plan(
    on_disk: DataFrame, in_catalog: DataFrame
) -> DataFrame:
    """Full-outer diff of distinct partition-name sets →
    (partition_name, state ∈ ADD | ORPHAN | OK)."""
    d = on_disk.select("partition_name").withColumn("on_disk", F.lit(True))
    c = in_catalog.select("partition_name").withColumn(
        "in_catalog", F.lit(True)
    )
    j = d.join(c, "partition_name", "full_outer")
    return j.select(
        "partition_name",
        F.when(F.col("in_catalog").isNull(), "ADD")
        .when(F.col("on_disk").isNull(), "ORPHAN")
        .otherwise("OK")
        .alias("state"),
    )


def msck_repair(
    spark: SparkSession,
    catalog: MetastoreCatalog,
    db: str,
    table: str,
    drop_orphans: bool = False,
) -> DataFrame:
    """The full repair loop for one table; returns the plan with an
    ``applied`` column. Registration payloads carry the derived
    values + the on-disk location, parameters empty — what Hive's
    MSCK writes."""
    rec = catalog.get_table(db, table)
    if rec is None:
        raise KeyError(f"{db}.{table} does not exist")
    keys = rec.get("partition_keys") or []
    if not keys:
        # Hive's MSCK is a no-op on unpartitioned tables; defaulting to
        # depth-1 discovery would register any k=v-named subdirectory
        # as a phantom partition
        return rows_df(
            spark, [], "partition_name string, state string, applied boolean"
        )
    depth = len(keys)
    loc = rec["location"]
    listing = list_files(spark, [loc])
    parts = [(p["partition_name"],) for p in catalog.get_partitions(db, table)]
    cat_df = rows_df(spark, parts, "partition_name string")
    plan = partition_discovery_plan(disk_partitions(listing, depth), cat_df)
    rows = plan.collect()  # metadata-scale: |partitions| of ONE table
    applied = []
    for r in rows:
        if r.state == "ADD":
            catalog.add_partition(db, table, {
                "partition_name": r.partition_name,
                "values": partition_name_to_values(r.partition_name),
                "location": f"{loc.rstrip('/')}/{r.partition_name}",
                "parameters": {},
            })
            applied.append((r.partition_name, r.state, True))
        elif r.state == "ORPHAN" and drop_orphans:
            catalog.drop_partition(db, table, r.partition_name)
            applied.append((r.partition_name, r.state, True))
        else:
            applied.append((r.partition_name, r.state, False))
    return rows_df(
        spark, applied, "partition_name string, state string, applied boolean"
    )


def partition_discovery_q(spark: SparkSession, sf: str) -> DataFrame:
    """Gate: the discovery diff + name derivation over derived inputs.
    Disk side: nation → one file per k under ``ds=<k>/part-0`` plus a
    stray root file (must be ignored) and a doubly-listed partition
    (distinct must collapse); catalog side: k % 3 != 0 (→ ADD for the
    rest) plus one ``ds=x<r>`` per region never written to disk
    (→ ORPHAN)."""
    from reair_spark.io import load_table as _t

    n = _t(spark, sf, "nation")
    files = n.select(
        F.concat(F.lit("ds="), F.col("n_nationkey").cast("string"),
                 F.lit("/part-0")).alias("rel_path")
    ).unionAll(
        n.select(F.concat(
            F.lit("ds="), F.col("n_nationkey").cast("string"),
            F.lit("/part-1"),
        ).alias("rel_path"))
    ).unionAll(
        n.select(F.lit("_stray_root_file").alias("rel_path")).limit(1)
    )
    cat = n.filter(F.col("n_nationkey") % 3 != 0).select(
        F.concat(F.lit("ds="), F.col("n_nationkey").cast("string"))
        .alias("partition_name")
    ).unionAll(
        n.select(
            F.concat(F.lit("ds=x"), F.col("n_regionkey").cast("string"))
            .alias("partition_name")
        ).distinct()
    )
    return partition_discovery_plan(disk_partitions(files), cat)


PARTITION_DISCOVERY_SQL = """
WITH disk AS (
  SELECT DISTINCT 'ds=' || CAST(n_nationkey AS VARCHAR) AS partition_name
  FROM nation),
cat AS (
  SELECT 'ds=' || CAST(n_nationkey AS VARCHAR) AS partition_name
  FROM nation WHERE n_nationkey % 3 <> 0
  UNION
  SELECT 'ds=x' || CAST(n_regionkey AS VARCHAR) FROM nation)
SELECT coalesce(disk.partition_name, cat.partition_name)
         AS partition_name,
       CASE WHEN cat.partition_name IS NULL THEN 'ADD'
            WHEN disk.partition_name IS NULL THEN 'ORPHAN'
            ELSE 'OK' END AS state
FROM disk FULL OUTER JOIN cat USING (partition_name)
"""
