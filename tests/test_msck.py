"""MSCK REPAIR workflow: disk-partition discovery + catalog repair
over a real DirectoryCatalog tree (reference-adjacent: replicated
warehouses drift when writers land partition dirs without
registering them)."""

from __future__ import annotations

import os

from reair_spark.catalog import DirectoryCatalog
from reair_spark.msck import msck_repair


def _mk_table(cat, db, table, part_keys):
    loc = cat.table_location(db, table)
    os.makedirs(loc, exist_ok=True)
    cat.create_table({
        "db": db, "table": table, "table_type": "MANAGED_TABLE",
        "cols": [{"name": "c1", "type": "string", "comment": None}],
        "partition_keys": [
            {"name": k, "type": "string", "comment": None} for k in part_keys
        ],
        "location": loc, "serde": "text",
        "parameters": {"transient_lastDdlTime": "1"},
    })
    return loc


def _seed(loc, rel, data=b"x"):
    p = os.path.join(loc, rel)
    os.makedirs(os.path.dirname(p), exist_ok=True)
    with open(p, "wb") as fh:
        fh.write(data)


def test_msck_registers_unregistered_dirs_and_reports_orphans(
    spark, tmp_path
):
    cat = DirectoryCatalog(str(tmp_path / "wh"))
    loc = _mk_table(cat, "db1", "t1", ["ds"])
    # on disk: ds=1 (registered), ds=2 + ds=3 (unregistered), stray file
    for d in ("ds=1", "ds=2", "ds=3"):
        _seed(loc, f"{d}/part-0")
    _seed(loc, "stray.txt")
    cat.add_partition("db1", "t1", {
        "partition_name": "ds=1", "values": ["1"],
        "location": f"{loc}/ds=1", "parameters": {},
    })
    # in catalog only: ds=9 (orphan)
    cat.add_partition("db1", "t1", {
        "partition_name": "ds=9", "values": ["9"],
        "location": f"{loc}/ds=9", "parameters": {},
    })

    out = {r.partition_name: (r.state, r.applied)
           for r in msck_repair(spark, cat, "db1", "t1").collect()}
    assert out == {
        "ds=1": ("OK", False),
        "ds=2": ("ADD", True),
        "ds=3": ("ADD", True),
        "ds=9": ("ORPHAN", False),  # not dropped by default
    }
    reg = {p["partition_name"]: p for p in cat.get_partitions("db1", "t1")}
    assert set(reg) == {"ds=1", "ds=2", "ds=3", "ds=9"}
    assert reg["ds=2"]["values"] == ["2"]
    assert reg["ds=2"]["location"] == f"{loc}/ds=2"

    # second pass: idempotent, everything OK except the orphan
    out2 = {r.partition_name: r.state
            for r in msck_repair(spark, cat, "db1", "t1").collect()}
    assert out2 == {"ds=1": "OK", "ds=2": "OK", "ds=3": "OK",
                    "ds=9": "ORPHAN"}


def test_msck_sync_drops_orphans_and_multikey_depth(spark, tmp_path):
    cat = DirectoryCatalog(str(tmp_path / "wh"))
    loc = _mk_table(cat, "db1", "t2", ["ds", "hr"])
    _seed(loc, "ds=1/hr=0/part-0")
    _seed(loc, "ds=1/hr=1/part-0")
    cat.add_partition("db1", "t2", {
        "partition_name": "ds=0/hr=0", "values": ["0", "0"],
        "location": f"{loc}/ds=0/hr=0", "parameters": {},
    })

    out = {r.partition_name: (r.state, r.applied)
           for r in msck_repair(spark, cat, "db1", "t2",
                                drop_orphans=True).collect()}
    assert out == {
        "ds=1/hr=0": ("ADD", True),
        "ds=1/hr=1": ("ADD", True),
        "ds=0/hr=0": ("ORPHAN", True),  # SYNC semantics: dropped
    }
    reg = {p["partition_name"] for p in cat.get_partitions("db1", "t2")}
    assert reg == {"ds=1/hr=0", "ds=1/hr=1"}
