"""Hive Metastore Thrift client behind the ``MetastoreCatalog`` protocol.

The reference talks to a real HMS through a hand-rolled, retry-wrapped
Thrift client (utils/.../ThriftHiveMetastoreClient.java:97-438). This
module is that client's seat in the Spark engine: the same twelve-method
``MetastoreCatalog`` surface (catalog.py) expressed over the standard
HMS Thrift API (``get_all_databases`` / ``get_table`` /
``add_partition`` / ``alter_table`` / ``drop_partition_by_name`` / ...),
so a deployment with a live metastore swaps this class in and every
snapshot/diff/commit path is unchanged.

This container ships neither the ``thrift`` runtime nor the generated
``hive_metastore`` bindings, so the RPC boundary is INJECTED:

- ``ThriftMetastoreCatalog(client)`` accepts any object exposing the
  HMS Thrift method surface — a generated ``ThriftHiveMetastore.Client``
  on a cluster, a fake in tests.
- ``ThriftMetastoreCatalog.connect(host, port)`` builds the real
  socket-backed client when the bindings are importable (gated
  import-try per environment constraints) and raises a clear
  ImportError otherwise.

Everything above the RPC boundary is pure and fully tested: the
mapping between the engine's B.1/B.2 dict records and Thrift
``Table``/``StorageDescriptor``/``FieldSchema``/``Partition`` structs
(attribute bags with kwarg constructors — ``PlainThriftTypes`` supplies
stand-ins with the exact same shape), plus the reference's
reconnect-and-retry-once discipline on transport errors
(ThriftHiveMetastoreClient.java connectIfNeeded/retry wrappers).
"""

from __future__ import annotations

import os
from types import SimpleNamespace
from typing import Callable

from reair_spark.catalog import partition_name_to_values

_PARQUET_SERDE = "org.apache.hadoop.hive.ql.io.parquet.serde.ParquetHiveSerDe"
_PARQUET_INPUT = "org.apache.hadoop.hive.ql.io.parquet.MapredParquetInputFormat"
_PARQUET_OUTPUT = "org.apache.hadoop.hive.ql.io.parquet.MapredParquetOutputFormat"

# engine-record "serde" shorthand <-> Hive storage descriptor triple
_SERDE_SHORTHAND = {
    _PARQUET_SERDE: "parquet",
    "org.apache.hadoop.hive.serde2.lazy.LazySimpleSerDe": "text",
    "org.apache.hadoop.hive.serde2.OpenCSVSerde": "csv",
    "org.apache.hive.hcatalog.data.JsonSerDe": "json",
    "org.apache.hadoop.hive.ql.io.orc.OrcSerde": "orc",
}
_SHORTHAND_SERDE = {v: k for k, v in _SERDE_SHORTHAND.items()}


class PlainThriftTypes:
    """Kwarg-constructed attribute bags shaped exactly like the
    thrift-generated ``hive_metastore.ttypes`` classes (which are also
    plain kwarg-constructed attribute bags). Default when no real
    bindings are injected; also what test fakes store."""

    Table = SimpleNamespace
    StorageDescriptor = SimpleNamespace
    SerDeInfo = SimpleNamespace
    FieldSchema = SimpleNamespace
    Partition = SimpleNamespace
    Database = SimpleNamespace


# -- record <-> struct mapping (pure) ----------------------------------


def _fields_to_records(fields) -> list[dict]:
    return [
        {
            "name": f.name,
            "type": getattr(f, "type", None),
            "comment": getattr(f, "comment", None),
        }
        for f in (fields or [])
    ]


def _records_to_fields(cols, types) -> list:
    return [
        types.FieldSchema(
            name=c["name"], type=c.get("type"), comment=c.get("comment")
        )
        for c in (cols or [])
    ]


def table_to_record(t) -> dict:
    """Thrift ``Table`` → engine B.1 record (the shape every snapshot /
    diff / commit program consumes; see catalog.TABLE_SCHEMA)."""
    sd = getattr(t, "sd", None)
    serde_lib = None
    if sd is not None and getattr(sd, "serdeInfo", None) is not None:
        serde_lib = getattr(sd.serdeInfo, "serializationLib", None)
    return {
        "db": t.dbName,
        "table": t.tableName,
        "table_type": getattr(t, "tableType", None) or "MANAGED_TABLE",
        "cols": _fields_to_records(getattr(sd, "cols", None)),
        "partition_keys": _fields_to_records(getattr(t, "partitionKeys", None)),
        "location": getattr(sd, "location", None),
        "serde": _SERDE_SHORTHAND.get(serde_lib, serde_lib or "parquet"),
        "parameters": dict(getattr(t, "parameters", None) or {}),
    }


def record_to_table(rec: dict, types=PlainThriftTypes):
    """Engine B.1 record → Thrift ``Table`` (kwargs only — works with
    generated ttypes classes and the plain stand-ins alike)."""
    serde = rec.get("serde", "parquet")
    sd = types.StorageDescriptor(
        cols=_records_to_fields(rec.get("cols"), types),
        location=rec.get("location"),
        inputFormat=_PARQUET_INPUT if serde == "parquet" else None,
        outputFormat=_PARQUET_OUTPUT if serde == "parquet" else None,
        compressed=False,
        numBuckets=-1,
        serdeInfo=types.SerDeInfo(
            name=None,
            serializationLib=_SHORTHAND_SERDE.get(serde, serde),
            parameters={},
        ),
        bucketCols=[],
        sortCols=[],
        parameters={},
    )
    return types.Table(
        tableName=rec["table"],
        dbName=rec["db"],
        owner=None,
        createTime=0,
        lastAccessTime=0,
        retention=0,
        sd=sd,
        partitionKeys=_records_to_fields(rec.get("partition_keys"), types),
        parameters=dict(rec.get("parameters") or {}),
        viewOriginalText=None,
        viewExpandedText=None,
        tableType=rec.get("table_type", "MANAGED_TABLE"),
    )


def partition_to_record(p, pkey_names: list[str]) -> dict:
    """Thrift ``Partition`` → engine B.2 record; the partition name is
    rebuilt from the table's partition-key names + the value list
    (HMS stores values only — names live on the table)."""
    values = [str(v) for v in (getattr(p, "values", None) or [])]
    name = "/".join(f"{k}={v}" for k, v in zip(pkey_names, values))
    sd = getattr(p, "sd", None)
    return {
        "partition_name": name,
        "values": values,
        "location": getattr(sd, "location", None),
        "parameters": dict(getattr(p, "parameters", None) or {}),
    }


def record_to_partition(
    db: str, table: str, part: dict, types=PlainThriftTypes
):
    """Engine B.2 record → Thrift ``Partition``."""
    values = part.get("values") or partition_name_to_values(
        part["partition_name"]
    )
    return types.Partition(
        values=[str(v) for v in values],
        dbName=db,
        tableName=table,
        createTime=0,
        lastAccessTime=0,
        sd=types.StorageDescriptor(
            cols=[],
            location=part.get("location"),
            inputFormat=_PARQUET_INPUT,
            outputFormat=_PARQUET_OUTPUT,
            compressed=False,
            numBuckets=-1,
            serdeInfo=types.SerDeInfo(
                name=None, serializationLib=_PARQUET_SERDE, parameters={}
            ),
            bucketCols=[],
            sortCols=[],
            parameters={},
        ),
        parameters=dict(part.get("parameters") or {}),
    )


def _is_missing(exc: Exception) -> bool:
    """NoSuchObjectException from real bindings, KeyError from fakes."""
    return isinstance(exc, KeyError) or "NoSuchObject" in type(exc).__name__


def _is_transport(exc: Exception) -> bool:
    return isinstance(exc, (ConnectionError, BrokenPipeError)) or (
        "TTransport" in type(exc).__name__
    )


class ThriftMetastoreCatalog:
    """``MetastoreCatalog`` over an HMS Thrift client.

    - ``client``: anything with the HMS Thrift method surface.
    - ``types``: struct constructors (real ``ttypes`` module or
      ``PlainThriftTypes``).
    - ``root``: location root for ``table_location`` when the table
      doesn't exist yet (mirrors DirectoryCatalog/SparkSqlCatalog).
    - ``reconnect``: optional zero-arg callable returning a fresh
      client; on a transport error the call is retried ONCE against the
      fresh client — the reference client's reconnect discipline
      (ThriftHiveMetastoreClient.java:97-438).

    Drops are metadata-only (``deleteData=False``): data files are
    owned by the copy stage, same ST6 ordering as every other client.
    Per-task construction (``commit.execute_commits`` catalog_factory)
    works when the factory builds the connection inside the task;
    driver-side application (``commit.apply_commits_driver``) works
    always.
    """

    def __init__(
        self,
        client,
        types=PlainThriftTypes,
        root: str | None = None,
        reconnect: Callable[[], object] | None = None,
    ):
        self._client = client
        self._types = types
        self.root = root
        self._reconnect = reconnect

    @classmethod
    def connect(
        cls,
        host: str,
        port: int = 9083,
        timeout_ms: int = 20_000,
        root: str | None = None,
    ) -> "ThriftMetastoreCatalog":
        """Real socket-backed client; requires the ``thrift`` runtime +
        generated ``hive_metastore`` bindings (not in this container —
        gated import)."""
        try:
            from hive_metastore import ThriftHiveMetastore, ttypes
            from thrift.protocol import TBinaryProtocol
            from thrift.transport import TSocket, TTransport
        except ImportError as exc:  # pragma: no cover - environment gate
            raise ImportError(
                "ThriftMetastoreCatalog.connect needs the 'thrift' runtime "
                "and hive_metastore generated bindings; install them or "
                "inject a client via ThriftMetastoreCatalog(client=...)"
            ) from exc

        def fresh():  # pragma: no cover - needs a live metastore
            sock = TSocket.TSocket(host, port)
            sock.setTimeout(timeout_ms)
            transport = TTransport.TBufferedTransport(sock)
            transport.open()
            return ThriftHiveMetastore.Client(
                TBinaryProtocol.TBinaryProtocol(transport)
            )

        return cls(fresh(), types=ttypes, root=root, reconnect=fresh)

    # -- RPC with the reference's retry-once-on-transport-error ---------
    def _call(self, method: str, *args):
        try:
            return getattr(self._client, method)(*args)
        except Exception as exc:
            if self._reconnect is not None and _is_transport(exc):
                self._client = self._reconnect()
                return getattr(self._client, method)(*args)
            raise

    # -- paths ---------------------------------------------------------
    def table_location(self, db: str, table: str) -> str:
        rec = self.get_table(db, table)
        if rec is not None and rec.get("location"):
            return rec["location"]
        if self.root is None:
            raise ValueError(
                f"{db}.{table} has no location and no root was configured"
            )
        return os.path.join(self.root, db, table)

    # -- reads ---------------------------------------------------------
    def databases(self) -> list[str]:
        return sorted(self._call("get_all_databases"))

    def tables(self, db: str) -> list[str]:
        try:
            return sorted(self._call("get_all_tables", db))
        except Exception as exc:
            if _is_missing(exc):
                return []
            raise

    def _raw_table(self, db: str, table: str):
        try:
            return self._call("get_table", db, table)
        except Exception as exc:
            if _is_missing(exc):
                return None
            raise

    def get_table(self, db: str, table: str) -> dict | None:
        t = self._raw_table(db, table)
        return None if t is None else table_to_record(t)

    def get_partitions(self, db: str, table: str) -> list[dict]:
        rec = self.get_table(db, table)
        if rec is None or not rec["partition_keys"]:
            return []
        pkey_names = [k["name"] for k in rec["partition_keys"]]
        try:
            parts = self._call("get_partitions", db, table, -1)
        except Exception as exc:
            if _is_missing(exc):
                return []
            raise
        return sorted(
            (partition_to_record(p, pkey_names) for p in parts or []),
            key=lambda p: p["partition_name"],
        )

    # -- writes --------------------------------------------------------
    def _ensure_db(self, db: str) -> None:
        if db not in self._call("get_all_databases"):
            self._call(
                "create_database",
                self._types.Database(
                    name=db, description=None, locationUri=None, parameters={}
                ),
            )

    def create_table(self, rec: dict) -> None:
        self._ensure_db(rec["db"])
        self._call("create_table", record_to_table(rec, self._types))

    def alter_table(self, rec: dict) -> None:
        self._call(
            "alter_table",
            rec["db"],
            rec["table"],
            record_to_table(rec, self._types),
        )

    def drop_table(self, db: str, table: str) -> None:
        try:
            self._call("drop_table", db, table, False)
        except Exception as exc:
            if not _is_missing(exc):
                raise

    def add_partition(self, db: str, table: str, part: dict) -> None:
        """Upsert (DirectoryCatalog semantics): HMS add_partition
        rejects an existing partition, so re-adds route to
        alter_partition — what the reference's commit mapper does on
        re-replication."""
        pobj = record_to_partition(db, table, part, self._types)
        existing = {p["partition_name"] for p in self.get_partitions(db, table)}
        if part["partition_name"] in existing:
            self._call("alter_partition", db, table, pobj)
        else:
            self._call("add_partition", pobj)

    def drop_partition(self, db: str, table: str, partition_name: str) -> None:
        try:
            self._call(
                "drop_partition_by_name", db, table, partition_name, False
            )
        except Exception as exc:
            if not _is_missing(exc):
                raise

    def rename_table(
        self, db: str, table: str, new_db: str, new_table: str
    ) -> None:
        t = self._raw_table(db, table)
        if t is None:
            raise KeyError(f"{db}.{table} does not exist")
        self._ensure_db(new_db)
        t.dbName, t.tableName = new_db, new_table
        self._call("alter_table", db, table, t)
