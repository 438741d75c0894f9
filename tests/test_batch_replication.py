"""End-to-end batch replication between two temp-dir warehouses —
pytest port of the reference's BatchReplicationTest (FIXTURES.md B.7
#1-3): copy new unpartitioned + partitioned tables, verify metadata
and data equality, then propagate drops on re-run."""

from __future__ import annotations

import os

import pytest

from reair_spark.catalog import DirectoryCatalog
from reair_spark.inventory import dirs_equal
from reair_spark.replicate import replicate_warehouse


def _write_files(loc: str, files: dict[str, str]) -> None:
    for name, content in files.items():
        path = os.path.join(loc, name)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "w") as fh:
            fh.write(content)


def _make_unpartitioned(cat: DirectoryCatalog, db: str, table: str, tldt="100"):
    loc = cat.table_location(db, table)
    _write_files(loc, {"file1.txt": "foobar", "file2.txt": "123"})
    cat.create_table(
        {
            "db": db,
            "table": table,
            "table_type": "MANAGED_TABLE",
            "cols": [{"name": "c1", "type": "string", "comment": None}],
            "partition_keys": [],
            "location": loc,
            "serde": "text",
            "parameters": {"transient_lastDdlTime": tldt},
        }
    )


def _make_partitioned(cat: DirectoryCatalog, db: str, table: str, parts, tldt="100"):
    loc = cat.table_location(db, table)
    cat.create_table(
        {
            "db": db,
            "table": table,
            "table_type": "MANAGED_TABLE",
            "cols": [{"name": "c1", "type": "string", "comment": None}],
            "partition_keys": [
                {"name": "ds", "type": "string", "comment": None},
                {"name": "hr", "type": "string", "comment": None},
            ],
            "location": loc,
            "serde": "text",
            "parameters": {"transient_lastDdlTime": tldt},
        }
    )
    for pname in parts:
        ploc = os.path.join(loc, pname)
        _write_files(ploc, {"file1.txt": f"data-{pname}", "file2.txt": "123"})
        cat.add_partition(
            db,
            table,
            {
                "partition_name": pname,
                "values": [kv.split("=")[1] for kv in pname.split("/")],
                "location": ploc,
                "parameters": {"transient_lastDdlTime": tldt},
            },
        )


@pytest.fixture()
def warehouses(tmp_path):
    src = str(tmp_path / "src_wh")
    dest = str(tmp_path / "dest_wh")
    return DirectoryCatalog(src), DirectoryCatalog(dest), src, dest


def test_copy_new_tables_then_propagate_drops(spark, warehouses):
    src_cat, dest_cat, src_root, dest_root = warehouses
    _make_unpartitioned(src_cat, "test_db", "plain")
    _make_partitioned(
        src_cat, "test_db", "parted", ["ds=1/hr=1", "ds=1/hr=2", "ds=1/hr=3"]
    )

    res = replicate_warehouse(spark, src_root, dest_root)
    statuses = {(r.db, r.table, r.partition_name): r.status
                for r in res["commit_results"].collect()}
    assert all(s == "SUCCESSFUL" for s in statuses.values()), statuses

    # metadata replicated
    plain = dest_cat.get_table("test_db", "plain")
    assert plain is not None
    assert plain["location"] == dest_cat.table_location("test_db", "plain")
    parted = dest_cat.get_table("test_db", "parted")
    assert parted is not None
    assert [p["partition_name"] for p in parted["partitions"]] == [
        "ds=1/hr=1", "ds=1/hr=2", "ds=1/hr=3"
    ]

    # data replicated byte-for-byte (equalDirs assertion)
    assert dirs_equal(
        spark,
        src_cat.table_location("test_db", "plain"),
        dest_cat.table_location("test_db", "plain"),
    )
    assert dirs_equal(
        spark,
        src_cat.table_location("test_db", "parted"),
        dest_cat.table_location("test_db", "parted"),
    )

    # re-run is a NO_OP (idempotence)
    res2 = replicate_warehouse(spark, src_root, dest_root)
    actions2 = {r.action for r in res2["plan"].collect()}
    assert actions2 == {"NO_OP"}, actions2

    # drop a table and a partition at source; re-run propagates
    src_cat.drop_table("test_db", "plain")
    src_cat.drop_partition("test_db", "parted", "ds=1/hr=3")
    res3 = replicate_warehouse(spark, src_root, dest_root)
    by_action = {(r.action): r for r in res3["commit_results"].collect()
                 if r.status == "SUCCESSFUL" and r.action != "NO_OP"}
    assert "DROP_TABLE" in by_action and "DROP_PARTITION" in by_action
    assert dest_cat.get_table("test_db", "plain") is None
    assert [p["partition_name"] for p in dest_cat.get_partitions("test_db", "parted")] == [
        "ds=1/hr=1", "ds=1/hr=2"
    ]


def test_incremental_update_copies_changed_data_only(spark, warehouses):
    src_cat, _dest_cat, src_root, dest_root = warehouses
    _make_unpartitioned(src_cat, "db1", "t1")
    replicate_warehouse(spark, src_root, dest_root)

    # change one file at source + bump the version
    loc = src_cat.table_location("db1", "t1")
    _write_files(loc, {"file1.txt": "changed-content"})
    rec = src_cat.get_table("db1", "t1")
    rec["parameters"]["transient_lastDdlTime"] = "200"
    src_cat.alter_table(rec)

    res = replicate_warehouse(spark, src_root, dest_root)
    copies = {r.status: r for r in res["copy_results"].collect()}
    # file2 unchanged → SKIPPED (same-size fast path); file1 → COPIED
    assert "COPIED" in copies and "SKIPPED" in copies
    assert dirs_equal(spark, loc, _dest_cat.table_location("db1", "t1"))


def test_blacklist_filters_tables(spark, warehouses):
    src_cat, dest_cat, src_root, dest_root = warehouses
    _make_unpartitioned(src_cat, "db1", "keep_me")
    _make_unpartitioned(src_cat, "db1", "tmp_scratch")
    replicate_warehouse(spark, src_root, dest_root, blacklist=[("db1", "tmp_.*")])
    assert dest_cat.get_table("db1", "keep_me") is not None
    assert dest_cat.get_table("db1", "tmp_scratch") is None


def test_dest_newer_guard_blocks_overwrite(spark, warehouses):
    src_cat, dest_cat, src_root, dest_root = warehouses
    _make_unpartitioned(src_cat, "db1", "t1", tldt="100")
    replicate_warehouse(spark, src_root, dest_root)

    # dest advances beyond src (e.g. replicated from elsewhere)
    rec = dest_cat.get_table("db1", "t1")
    rec["parameters"]["transient_lastDdlTime"] = "999"
    dest_cat.alter_table(rec)
    src_rec = src_cat.get_table("db1", "t1")
    src_rec["parameters"]["transient_lastDdlTime"] = "150"
    src_cat.alter_table(src_rec)

    res = replicate_warehouse(spark, src_root, dest_root, overwrite_newer=False)
    plan = {r.action for r in res["plan"].collect()}
    assert plan == {"NO_OP"}
    assert dest_cat.get_table("db1", "t1")["parameters"]["transient_lastDdlTime"] == "999"
