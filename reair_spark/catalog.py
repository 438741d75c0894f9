"""Catalog model + snapshot scans.

The reference replicates Hive metastore objects between two warehouses
(utils/.../common/HiveObjectSpec.java:9-77 for identity; Thrift Table/
Partition for payloads). This container has no Hive metastore, so the
engine ships a `DirectoryCatalog` — one JSON file per table under a
warehouse root, atomically replaced on write — behind the same client
surface a ThriftHiveMetastoreClient port would expose
(utils/.../ThriftHiveMetastoreClient.java:97-438). On a real cluster
the client class is swapped; every DataFrame program here only sees the
snapshot schemas (FIXTURES.md B.1/B.2).

Snapshot scans are the Spark mapping of the reference's parallel
metastore scan (batch/hive/MetastoreScanInputFormat.java:50-147): the
driver lists (db, table) identities — cheap, metadata-only — and the
per-table fetches fan out executor-side via mapPartitions, replacing
the reference's 16-thread scan + random split packing with a
repartitioned distributed fetch.
"""

from __future__ import annotations

import json
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TLDT = "transient_lastDdlTime"  # version CAS key (HiveParameterKeys.TLDT)

_FIELD_SCHEMA = T.ArrayType(
    T.StructType(
        [
            T.StructField("name", T.StringType()),
            T.StructField("type", T.StringType()),
            T.StructField("comment", T.StringType()),
        ]
    )
)

TABLE_SCHEMA = T.StructType(
    [
        T.StructField("db", T.StringType(), False),
        T.StructField("table", T.StringType(), False),
        T.StructField("table_type", T.StringType()),
        T.StructField("cols", _FIELD_SCHEMA),
        T.StructField("partition_keys", _FIELD_SCHEMA),
        T.StructField("location", T.StringType()),
        T.StructField("serde", T.StringType()),
        T.StructField("parameters", T.MapType(T.StringType(), T.StringType())),
    ]
)

PARTITION_SCHEMA = T.StructType(
    [
        T.StructField("db", T.StringType(), False),
        T.StructField("table", T.StringType(), False),
        T.StructField("partition_name", T.StringType(), False),
        T.StructField("values", T.ArrayType(T.StringType())),
        T.StructField("location", T.StringType()),
        T.StructField("parameters", T.MapType(T.StringType(), T.StringType())),
    ]
)


def partition_name_to_values(name: str) -> list[str]:
    """'ds=1/hr=2' → ['1','2'] (HiveUtils.partitionNameToValues port)."""
    return [kv.split("=", 1)[1] for kv in name.split("/") if kv]


def partition_name_to_map(name: str) -> dict[str, str]:
    """'ds=1/hr=2' → {'ds':'1','hr':'2'}
    (ThriftHiveMetastoreClient.partitionNameToMap:312-321 port)."""
    return dict(kv.split("=", 1) for kv in name.split("/") if kv)


class DirectoryCatalog:
    """Metastore stand-in: ``<root>/_catalog/<db>/<table>.json`` holds
    the B.1 table record plus its B.2 partition records. Writes are
    tmp-file + atomic rename, so concurrent executor-side committers
    (one per table after a (db, table) repartition) never publish a
    torn record — the same publish discipline the reference applies to
    data directories (DistCpWrapper.java:94-98)."""

    def __init__(self, root: str):
        self.root = root
        self.meta_root = os.path.join(root, "_catalog")
        os.makedirs(self.meta_root, exist_ok=True)

    # -- paths ---------------------------------------------------------
    def _table_file(self, db: str, table: str) -> str:
        return os.path.join(self.meta_root, db, f"{table}.json")

    def table_location(self, db: str, table: str) -> str:
        return os.path.join(self.root, db, table)

    # -- reads ---------------------------------------------------------
    def databases(self) -> list[str]:
        return sorted(
            d for d in os.listdir(self.meta_root)
            if os.path.isdir(os.path.join(self.meta_root, d))
        )

    def tables(self, db: str) -> list[str]:
        dbdir = os.path.join(self.meta_root, db)
        if not os.path.isdir(dbdir):
            return []
        return sorted(f[:-5] for f in os.listdir(dbdir) if f.endswith(".json"))

    def get_table(self, db: str, table: str) -> dict | None:
        path = self._table_file(db, table)
        if not os.path.exists(path):
            return None
        with open(path) as fh:
            return json.load(fh)

    def get_partitions(self, db: str, table: str) -> list[dict]:
        rec = self.get_table(db, table)
        return rec.get("partitions", []) if rec else []

    # -- writes (atomic replace) ----------------------------------------
    def _write(self, db: str, table: str, rec: dict) -> None:
        path = self._table_file(db, table)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path), prefix=f".{table}.")
        with os.fdopen(fd, "w") as fh:
            json.dump(rec, fh, sort_keys=True)
        os.replace(tmp, path)

    def create_table(self, rec: dict) -> None:
        rec = dict(rec)
        rec.setdefault("partitions", [])
        self._write(rec["db"], rec["table"], rec)

    def alter_table(self, rec: dict) -> None:
        existing = self.get_table(rec["db"], rec["table"]) or {}
        merged = {**existing, **rec}
        merged.setdefault("partitions", existing.get("partitions", []))
        self._write(rec["db"], rec["table"], merged)

    def drop_table(self, db: str, table: str) -> None:
        path = self._table_file(db, table)
        if os.path.exists(path):
            os.remove(path)

    def add_partition(self, db: str, table: str, part: dict) -> None:
        rec = self.get_table(db, table)
        if rec is None:
            raise KeyError(f"{db}.{table} does not exist")
        parts = [p for p in rec.get("partitions", [])
                 if p["partition_name"] != part["partition_name"]]
        parts.append(dict(part))
        rec["partitions"] = sorted(parts, key=lambda p: p["partition_name"])
        self._write(db, table, rec)

    def drop_partition(self, db: str, table: str, partition_name: str) -> None:
        rec = self.get_table(db, table)
        if rec is None:
            return
        rec["partitions"] = [
            p for p in rec.get("partitions", []) if p["partition_name"] != partition_name
        ]
        self._write(db, table, rec)

    def rename_table(self, db: str, table: str, new_db: str, new_table: str) -> None:
        rec = self.get_table(db, table)
        if rec is None:
            raise KeyError(f"{db}.{table} does not exist")
        rec["db"], rec["table"] = new_db, new_table
        self.drop_table(db, table)
        self._write(new_db, new_table, rec)


# ---------------------------------------------------------------------------
# snapshot scans → DataFrames
# ---------------------------------------------------------------------------


def _table_row(rec: dict) -> tuple:
    return (
        rec["db"],
        rec["table"],
        rec.get("table_type", "MANAGED_TABLE"),
        [tuple(c) if isinstance(c, (list, tuple)) else (c["name"], c["type"], c.get("comment"))
         for c in rec.get("cols", [])],
        [tuple(c) if isinstance(c, (list, tuple)) else (c["name"], c["type"], c.get("comment"))
         for c in rec.get("partition_keys", [])],
        rec.get("location"),
        rec.get("serde", "parquet"),
        rec.get("parameters", {}),
    )


def snapshot_tables(spark: SparkSession, catalog: DirectoryCatalog) -> DataFrame:
    """One row per table (B.1 schema). Identity listing is driver-side
    (metadata-scale); payloads come along because the directory catalog
    is cheap — a metastore-backed client would fetch payloads in
    mapPartitions over a repartitioned identity DataFrame instead."""
    rows = []
    for db in catalog.databases():
        for table in catalog.tables(db):
            rec = catalog.get_table(db, table)
            if rec is not None:
                rows.append(_table_row(rec))
    return spark.createDataFrame(rows, TABLE_SCHEMA) if rows else spark.createDataFrame([], TABLE_SCHEMA)


def snapshot_partitions(spark: SparkSession, catalog: DirectoryCatalog) -> DataFrame:
    """One row per partition (B.2 schema)."""
    rows = []
    for db in catalog.databases():
        for table in catalog.tables(db):
            for p in catalog.get_partitions(db, table):
                rows.append(
                    (
                        db,
                        table,
                        p["partition_name"],
                        p.get("values") or partition_name_to_values(p["partition_name"]),
                        p.get("location"),
                        p.get("parameters", {}),
                    )
                )
    return (
        spark.createDataFrame(rows, PARTITION_SCHEMA)
        if rows
        else spark.createDataFrame([], PARTITION_SCHEMA)
    )


def strip_non_comparables(params_col):
    """Comparison semantics (incremental/ReplicationUtils.java:48-66):
    objects match iff equal after zeroing createTime/lastAccessTime.
    Parameters keep TLDT (it IS compared — it's the version)."""
    return F.map_filter(
        params_col, lambda k, _v: ~k.isin("createTime", "lastAccessTime")
    )
