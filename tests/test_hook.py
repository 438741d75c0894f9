"""S6 producer → ST5 consumer loop: the audit rows the hook writes
must compile into the same jobs the reference's factory derives
(CliAuditLogHook.java:95-117 produce side,
ReplicationJobFactory.java consume side)."""

from __future__ import annotations

import datetime

import pytest

from reair_spark.events import compile_jobs
from reair_spark.hook import AuditLogHook


@pytest.fixture()
def hook(spark, tmp_path):
    tick = {"n": 0}

    def clock():
        tick["n"] += 1
        return datetime.datetime(2024, 1, 1) + datetime.timedelta(seconds=tick["n"])

    return AuditLogHook(spark, str(tmp_path / "audit_log"), clock=clock)


def test_classify_grammar(hook):
    c = hook.classify
    assert c("CREATE TABLE db1.t1 (a INT)") == (
        "CREATETABLE",
        [("OUTPUT", "TABLE", "db1.t1", "{}")],
    )
    ctype, objs = c("CREATE TABLE db1.t2 (a INT) PARTITIONED BY (ds STRING, hr INT)")
    assert ctype == "CREATETABLE"
    assert '"partition_keys"' in objs[0][3] and '"ds"' in objs[0][3]
    assert c("DROP TABLE IF EXISTS db1.t1")[0] == "DROPTABLE"
    assert c("ALTER TABLE db1.t1 RENAME TO db2.t9") == (
        "ALTERTABLE_RENAME",
        [
            ("RENAME_FROM", "TABLE", "db1.t1", "{}"),
            ("OUTPUT", "TABLE", "db2.t9", "{}"),
        ],
    )
    assert c("ALTER TABLE db1.t1 ADD PARTITION (ds='2024-01-01', hr=3)") == (
        "ALTERTABLE_ADDPARTS",
        [("OUTPUT", "PARTITION", "db1.t1/ds=2024-01-01/hr=3", "{}")],
    )
    assert c("ALTER TABLE db1.t1 DROP PARTITION (ds='1')")[0] == "DROPPARTITION"
    assert c("INSERT OVERWRITE TABLE db1.t1 PARTITION (ds='1') SELECT 1") == (
        "QUERY",
        [("OUTPUT", "PARTITION", "db1.t1/ds=1", "{}")],
    )
    assert c("SHOW TABLES") == ("SHOWTABLES", [])
    assert c("USE db1") == ("SWITCHDATABASE", [])
    ctype, objs = c(
        "ALTER TABLE db1.s EXCHANGE PARTITION (ds='1') WITH TABLE db1.d"
    )
    assert ctype == "EXCHANGEPARTITION" and objs[0][0] == "INPUT"


def test_produced_log_compiles_to_jobs(hook):
    """End-to-end: record a DDL session, flush, read back, compile."""
    for cmd in [
        "CREATE TABLE db1.plain (a INT)",
        "CREATE TABLE db1.parted (a INT) PARTITIONED BY (ds STRING)",
        "INSERT OVERWRITE TABLE db1.parted PARTITION (ds='2024-01-01') SELECT 1",
        "ALTER TABLE db1.plain RENAME TO db1.renamed",
        "DROP TABLE db1.parted",
        "SHOW TABLES",
        "ALTER TABLE db1.s EXCHANGE PARTITION (ds='7') WITH TABLE db1.d",
    ]:
        hook.record(cmd)
    assert hook.flush() == 7
    assert hook.flush() == 0  # buffer drained

    ev = hook.events_df()
    assert ev.count() == 7
    # monotonically increasing ids seeded at 1
    ids = [r.id for r in ev.orderBy("id").collect()]
    assert ids == list(range(1, 8))

    jobs = {
        (r.operation, r.db, r.table): r
        for r in compile_jobs(ev).collect()
    }
    assert ("COPY_UNPARTITIONED_TABLE", "db1", "plain") in jobs
    assert ("COPY_PARTITIONED_TABLE", "db1", "parted") in jobs
    part_copy = jobs[("COPY_PARTITION", "db1", "parted")]
    assert part_copy.partition_names == ["ds=2024-01-01"]
    ren = jobs[("RENAME_TABLE", "db1", "plain")]
    assert (ren.rename_to_db, ren.rename_to_table) == ("db1", "renamed")
    assert ("DROP_TABLE", "db1", "parted") in jobs
    exch = jobs[("COPY_PARTITION", "db1", "d")]
    assert exch.partition_names == ["ds=7"]
    # SHOW TABLES must not produce a job
    assert not any(op == "QUERY" for op, _, _ in jobs)


def test_id_seeding_across_hook_restarts(hook, spark):
    hook.record("CREATE TABLE db1.a (x INT)")
    hook.flush()
    h2 = AuditLogHook(spark, hook.log_path, clock=hook.clock)
    nid = h2.record("CREATE TABLE db1.b (x INT)")
    assert nid == 2  # continues after the persisted max


def test_sql_executes_and_records(hook, spark):
    df = hook.sql("SELECT 1 AS one")
    assert df.collect()[0].one == 1
    hook.flush()
    row = hook.events_df().collect()[0]
    assert row.command_type == "QUERY" and row.objects == []


def test_dynamic_partition_insert_records_table_level(hook):
    """ADVICE r3 #1 repro: dynamic and mixed dynamic-partition INSERTs
    must classify (previously ValueError AFTER execution — write
    applied, event dropped) and degrade to a TABLE-level OUTPUT whose
    whole-table copy covers whatever partitions the insert created."""
    for cmd in (
        "INSERT OVERWRITE TABLE db1.t PARTITION (ds) SELECT * FROM s",
        "INSERT OVERWRITE TABLE db1.t PARTITION (ds='1', hr) SELECT * FROM s",
        "INSERT INTO db1.t PARTITION (ds, hr) SELECT * FROM s",
    ):
        ctype, objs = hook.classify(cmd)
        assert ctype == "QUERY"
        assert objs == [("OUTPUT", "TABLE", "db1.t", "{}")], cmd
    # fully static spec still records the exact partition
    ctype, objs = hook.classify(
        "INSERT OVERWRITE TABLE db1.t PARTITION (ds='1', hr=2) SELECT * FROM s"
    )
    assert objs == [("OUTPUT", "PARTITION", "db1.t/ds=1/hr=2", "{}")]


def test_seed_id_propagates_read_errors_on_existing_log(hook, spark, tmp_path):
    """ADVICE r3 #3: a corrupt/unreadable EXISTING log must raise, not
    silently restart ids at 1 (id reuse would make the consume side
    skip new events as already-consumed)."""
    import pytest

    from reair_spark.hook import AuditLogHook

    bad = tmp_path / "badlog"
    bad.mkdir()
    (bad / "part-00000.parquet").write_bytes(b"not a parquet file")
    h = AuditLogHook(spark, str(bad))
    with pytest.raises(Exception) as ei:
        h.record("CREATE TABLE db1.x (x INT)")
    from pyspark.errors import AnalysisException

    assert not isinstance(ei.value, AnalysisException) or "PATH_NOT_FOUND" not in str(ei.value)
    # missing path still seeds at 1
    h2 = AuditLogHook(spark, str(tmp_path / "nolog"))
    assert h2.record("CREATE TABLE db1.y (x INT)") == 1


def test_auditing_catalog_direct_mutations_compile(hook, spark, tmp_path):
    """Metastore-listener parity (VERDICT r4 missing #1): mutations
    made straight through the catalog API — no SQL anywhere — must
    appear in the audit log and compile into the right jobs."""
    from reair_spark.catalog import DirectoryCatalog
    from reair_spark.hook import AuditingCatalog

    cat = AuditingCatalog(DirectoryCatalog(str(tmp_path / "wh")), hook)
    loc = cat.table_location("db1", "plain")
    cat.create_table({
        "db": "db1", "table": "plain", "table_type": "MANAGED_TABLE",
        "cols": [{"name": "a", "type": "int", "comment": None}],
        "partition_keys": [], "location": loc, "serde": "text",
        "parameters": {},
    })
    ploc = cat.table_location("db1", "parted")
    cat.create_table({
        "db": "db1", "table": "parted", "table_type": "MANAGED_TABLE",
        "cols": [{"name": "a", "type": "int", "comment": None}],
        "partition_keys": [{"name": "ds", "type": "string", "comment": None}],
        "location": ploc, "serde": "text", "parameters": {},
    })
    cat.add_partition("db1", "parted", {
        "partition_name": "ds=2024-01-01", "values": ["2024-01-01"],
        "location": f"{ploc}/ds=2024-01-01", "parameters": {},
    })
    cat.alter_table({
        "db": "db1", "table": "plain", "table_type": "MANAGED_TABLE",
        "cols": [{"name": "a", "type": "bigint", "comment": None}],
        "partition_keys": [], "location": loc, "serde": "text",
        "parameters": {},
    })
    cat.rename_table("db1", "plain", "db1", "renamed")
    cat.drop_partition("db1", "parted", "ds=2024-01-01")
    cat.drop_table("db1", "parted")
    assert hook.flush() == 7

    # the inner catalog actually mutated
    assert cat.tables("db1") == ["renamed"]
    assert cat.get_table("db1", "renamed")["cols"][0]["type"] == "bigint"

    jobs = {(r.operation, r.db, r.table): r
            for r in compile_jobs(hook.events_df()).collect()}
    assert ("COPY_UNPARTITIONED_TABLE", "db1", "plain") in jobs
    assert ("COPY_PARTITIONED_TABLE", "db1", "parted") in jobs
    assert jobs[("COPY_PARTITION", "db1", "parted")].partition_names \
        == ["ds=2024-01-01"]
    ren = jobs[("RENAME_TABLE", "db1", "plain")]
    assert (ren.rename_to_db, ren.rename_to_table) == ("db1", "renamed")
    assert ("DROP_PARTITION", "db1", "parted") in jobs
    assert ("DROP_TABLE", "db1", "parted") in jobs


def test_auditing_catalog_failed_mutation_not_logged(hook, tmp_path):
    """Listener-after-commit semantics: a mutation that raises must not
    produce an audit row (nothing happened to replicate)."""
    from reair_spark.catalog import DirectoryCatalog
    from reair_spark.hook import AuditingCatalog

    cat = AuditingCatalog(DirectoryCatalog(str(tmp_path / "wh")), hook)
    with pytest.raises(Exception):
        cat.add_partition("db1", "never_created", {
            "partition_name": "ds=1", "values": ["1"],
            "location": "/nope", "parameters": {},
        })
    assert hook.flush() == 0
