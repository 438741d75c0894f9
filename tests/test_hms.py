"""ThriftMetastoreCatalog: the HMS Thrift client seat
(ThriftHiveMetastoreClient.java:97-438 parity surface). No thrift
runtime in this container, so a FakeHmsClient exercises the exact HMS
method surface the real generated client exposes; the record<->struct
mapping and retry discipline are pure and tested directly."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from reair_spark.catalog import (
    DirectoryCatalog,
    MetastoreCatalog,
    snapshot_partitions,
    snapshot_tables,
)
from reair_spark.hms import (
    PlainThriftTypes,
    ThriftMetastoreCatalog,
    partition_to_record,
    record_to_partition,
    record_to_table,
    table_to_record,
)


class NoSuchObjectException(Exception):
    """Name-matched by hms._is_missing, like the real ttypes class."""


class FakeHmsClient:
    """In-memory HMS speaking the generated client's method surface:
    structs in, structs out, NoSuchObjectException on misses,
    add_partition rejecting duplicates — the behaviors the catalog
    adapter must absorb."""

    def __init__(self):
        self.dbs: dict[str, object] = {}
        self.tables: dict[tuple[str, str], object] = {}
        self.parts: dict[tuple[str, str], list] = {}

    def get_all_databases(self):
        return list(self.dbs)

    def create_database(self, db):
        self.dbs[db.name] = db

    def get_all_tables(self, db):
        if db not in self.dbs:
            raise NoSuchObjectException(db)
        return [t for (d, t) in self.tables if d == db]

    def get_table(self, db, table):
        if (db, table) not in self.tables:
            raise NoSuchObjectException(f"{db}.{table}")
        return self.tables[(db, table)]

    def create_table(self, t):
        self.tables[(t.dbName, t.tableName)] = t
        self.parts.setdefault((t.dbName, t.tableName), [])

    def alter_table(self, db, table, new_t):
        if (db, table) not in self.tables:
            raise NoSuchObjectException(f"{db}.{table}")
        existing_parts = self.parts.pop((db, table), [])
        del self.tables[(db, table)]
        self.tables[(new_t.dbName, new_t.tableName)] = new_t
        for p in existing_parts:
            p.dbName, p.tableName = new_t.dbName, new_t.tableName
        self.parts[(new_t.dbName, new_t.tableName)] = existing_parts

    def drop_table(self, db, table, delete_data):
        if (db, table) not in self.tables:
            raise NoSuchObjectException(f"{db}.{table}")
        del self.tables[(db, table)]
        self.parts.pop((db, table), None)

    def get_partitions(self, db, table, max_parts):
        if (db, table) not in self.tables:
            raise NoSuchObjectException(f"{db}.{table}")
        return list(self.parts.get((db, table), []))

    def add_partition(self, p):
        key = (p.dbName, p.tableName)
        if key not in self.tables:
            raise NoSuchObjectException(f"{key}")
        if any(q.values == p.values for q in self.parts[key]):
            raise ValueError(f"AlreadyExists: {p.values}")
        self.parts[key].append(p)

    def alter_partition(self, db, table, p):
        key = (db, table)
        self.parts[key] = [q for q in self.parts[key] if q.values != p.values]
        self.parts[key].append(p)

    def drop_partition_by_name(self, db, table, name, delete_data):
        key = (db, table)
        if key not in self.tables:
            raise NoSuchObjectException(f"{key}")
        values = [kv.split("=", 1)[1] for kv in name.split("/")]
        self.parts[key] = [q for q in self.parts[key] if q.values != values]


def _rec(db, table, loc, partition_keys=(), params=None):
    return {
        "db": db,
        "table": table,
        "table_type": "EXTERNAL_TABLE",
        "cols": [{"name": "c1", "type": "string", "comment": None}],
        "partition_keys": [
            {"name": k, "type": "string", "comment": None}
            for k in partition_keys
        ],
        "location": loc,
        "serde": "parquet",
        "parameters": params or {"transient_lastDdlTime": "100"},
    }


def test_protocol_conformance():
    assert isinstance(
        ThriftMetastoreCatalog(FakeHmsClient()), MetastoreCatalog
    )


def test_struct_mapping_roundtrip():
    """record → Thrift struct → record is identity for the B.1/B.2
    fields the engine compares; serde shorthand maps to the real
    SerDe class and back."""
    rec = _rec("d", "t", "/w/d/t", partition_keys=["ds", "hr"])
    t = record_to_table(rec)
    assert t.sd.serdeInfo.serializationLib.endswith("ParquetHiveSerDe")
    assert t.sd.inputFormat.endswith("MapredParquetInputFormat")
    back = table_to_record(t)
    assert back == rec

    part = {
        "partition_name": "ds=2026-01-01/hr=07",
        "values": ["2026-01-01", "07"],
        "location": "/w/d/t/ds=2026-01-01/hr=07",
        "parameters": {"transient_lastDdlTime": "9"},
    }
    p = record_to_partition("d", "t", part, PlainThriftTypes)
    assert (p.dbName, p.tableName) == ("d", "t")
    assert partition_to_record(p, ["ds", "hr"]) == part
    # name rebuilt from values when the record omits it
    p2 = record_to_partition(
        "d", "t", {"partition_name": "ds=5/hr=6"}, PlainThriftTypes
    )
    assert p2.values == ["5", "6"]


def test_crud_roundtrip():
    """Same CRUD contract DirectoryCatalog/SparkSqlCatalog honor:
    upserting add_partition, partition-preserving alter, rename
    carrying partitions, missing-object tolerance."""
    cat = ThriftMetastoreCatalog(FakeHmsClient(), root="/w")
    assert cat.databases() == []
    assert cat.tables("nope") == []
    assert cat.get_table("nope", "t") is None
    assert cat.get_partitions("nope", "t") == []
    assert cat.table_location("hms", "t1") == "/w/hms/t1"

    cat.create_table(_rec("hms", "t1", "/w/hms/t1", partition_keys=["ds"]))
    assert cat.databases() == ["hms"]
    assert cat.tables("hms") == ["t1"]
    rec = cat.get_table("hms", "t1")
    assert rec["table_type"] == "EXTERNAL_TABLE"
    assert [c["name"] for c in rec["cols"]] == ["c1"]
    assert [k["name"] for k in rec["partition_keys"]] == ["ds"]
    assert cat.table_location("hms", "t1") == "/w/hms/t1"

    part = {
        "partition_name": "ds=1",
        "values": ["1"],
        "location": "/w/hms/t1/ds=1",
        "parameters": {"transient_lastDdlTime": "5"},
    }
    cat.add_partition("hms", "t1", part)
    assert cat.get_partitions("hms", "t1") == [part]
    # re-add with newer params = upsert (HMS itself would reject)
    part2 = dict(part, parameters={"transient_lastDdlTime": "6"})
    cat.add_partition("hms", "t1", part2)
    got = cat.get_partitions("hms", "t1")
    assert got == [part2]

    rec["parameters"]["transient_lastDdlTime"] = "200"
    cat.alter_table(rec)
    assert (
        cat.get_table("hms", "t1")["parameters"]["transient_lastDdlTime"]
        == "200"
    )
    assert len(cat.get_partitions("hms", "t1")) == 1

    cat.rename_table("hms", "t1", "hms2", "t2")
    assert cat.tables("hms") == []
    assert cat.tables("hms2") == ["t2"]
    assert len(cat.get_partitions("hms2", "t2")) == 1
    with pytest.raises(KeyError):
        cat.rename_table("hms", "missing", "hms", "x")

    cat.drop_partition("hms2", "t2", "ds=1")
    assert cat.get_partitions("hms2", "t2") == []
    cat.drop_partition("hms2", "t2", "ds=1")  # idempotent
    cat.drop_table("hms2", "t2")
    assert cat.get_table("hms2", "t2") is None
    cat.drop_table("hms2", "t2")  # idempotent


def test_transport_retry_once():
    """The reference client reconnects and retries once on transport
    errors; non-transport errors pass through."""

    class FlakyOnce:
        def __init__(self, inner):
            self.inner = inner
            self.failed = False

        def __getattr__(self, name):
            inner_m = getattr(self.inner, name)

            def call(*args):
                if not self.failed:
                    self.failed = True
                    raise ConnectionError("broken pipe")
                return inner_m(*args)

            return call

    inner = FakeHmsClient()
    flaky = FlakyOnce(inner)
    reconnects = []

    def reconnect():
        reconnects.append(1)
        return inner

    cat = ThriftMetastoreCatalog(flaky, reconnect=reconnect)
    assert cat.databases() == []  # survived the one failure
    assert reconnects == [1]

    # without a reconnect hook the error propagates
    cat2 = ThriftMetastoreCatalog(FlakyOnce(FakeHmsClient()))
    with pytest.raises(ConnectionError):
        cat2.databases()


def test_snapshot_scans_over_hms(spark):
    cat = ThriftMetastoreCatalog(FakeHmsClient(), root="/w")
    cat.create_table(_rec("hms", "t1", "/w/hms/t1", partition_keys=["ds"]))
    cat.add_partition(
        "hms",
        "t1",
        {"partition_name": "ds=1", "values": ["1"],
         "location": "/w/hms/t1/ds=1", "parameters": {}},
    )
    t = snapshot_tables(spark, cat)
    row = t.first()
    assert (row.db, row.table, row.serde) == ("hms", "t1", "parquet")
    p = snapshot_partitions(spark, cat)
    assert [r.partition_name for r in p.collect()] == ["ds=1"]


def test_replicate_into_hms_catalog(spark, tmp_path):
    """End-to-end: DirectoryCatalog src warehouse → Thrift-surface dest
    (driver-side commits, like any single-endpoint metastore client)."""
    from reair_spark.replicate import replicate_warehouse

    src, dest = str(tmp_path / "src"), str(tmp_path / "dest")
    src_cat = DirectoryCatalog(src)

    loc1 = src_cat.table_location("hmsrep", "plain")
    spark.range(5).select(F.col("id").cast("string").alias("c1")) \
        .write.mode("overwrite").parquet(loc1)
    src_cat.create_table(_rec("hmsrep", "plain", loc1))

    loc2 = src_cat.table_location("hmsrep", "parted")
    spark.range(3).select(F.col("id").cast("string").alias("c1")) \
        .write.mode("overwrite").parquet(f"{loc2}/ds=1")
    src_cat.create_table(
        _rec("hmsrep", "parted", loc2, partition_keys=["ds"])
    )
    src_cat.add_partition(
        "hmsrep", "parted",
        {"partition_name": "ds=1", "values": ["1"],
         "location": f"{loc2}/ds=1",
         "parameters": {"transient_lastDdlTime": "100"}},
    )

    dest_cat = ThriftMetastoreCatalog(FakeHmsClient(), root=dest)
    out = replicate_warehouse(spark, src, dest, dest_catalog=dest_cat)
    statuses = {r.status for r in out["commit_results"].collect()}
    assert statuses == {"SUCCESSFUL"}

    rec = dest_cat.get_table("hmsrep", "plain")
    assert rec is not None and rec["location"].startswith(dest)
    parts = dest_cat.get_partitions("hmsrep", "parted")
    assert [p["partition_name"] for p in parts] == ["ds=1"]
    assert parts[0]["location"].startswith(dest)
    # the replicated data files are where the dest catalog says
    assert spark.read.parquet(
        dest_cat.get_table("hmsrep", "plain")["location"]).count() == 5
