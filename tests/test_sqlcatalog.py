"""SparkSqlCatalog: the MetastoreCatalog client backed by the live
Spark SQL session catalog (ThriftHiveMetastoreClient.java:97-438 parity
surface; with Hive support this is a real metastore)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from reair_spark.catalog import (
    DirectoryCatalog,
    MetastoreCatalog,
    SparkSqlCatalog,
    snapshot_partitions,
    snapshot_tables,
)


def _rec(db, table, loc, partition_keys=(), params=None):
    return {
        "db": db,
        "table": table,
        "table_type": "EXTERNAL_TABLE",
        "cols": [{"name": "c1", "type": "string", "comment": None}],
        "partition_keys": [
            {"name": k, "type": "string", "comment": None} for k in partition_keys
        ],
        "location": loc,
        "serde": "parquet",
        "parameters": params or {"transient_lastDdlTime": "100"},
    }


def test_protocol_conformance(spark, tmp_path):
    assert isinstance(DirectoryCatalog(str(tmp_path / "d")), MetastoreCatalog)
    assert isinstance(SparkSqlCatalog(spark, str(tmp_path / "s")), MetastoreCatalog)


def test_sqlcatalog_crud_roundtrip(spark, tmp_path):
    cat = SparkSqlCatalog(spark, str(tmp_path), dbs=["sqlcat_crud"])
    loc = cat.table_location("sqlcat_crud", "t1")
    cat.create_table(_rec("sqlcat_crud", "t1", loc, partition_keys=["ds"],
                          params={"transient_lastDdlTime": "100", "it's": "quoted"}))

    assert cat.databases() == ["sqlcat_crud"]
    assert cat.tables("sqlcat_crud") == ["t1"]
    rec = cat.get_table("sqlcat_crud", "t1")
    assert rec["table_type"] == "EXTERNAL_TABLE"
    assert rec["serde"] == "parquet"
    assert rec["location"] == loc
    assert [c["name"] for c in rec["cols"]] == ["c1"]
    assert [c["name"] for c in rec["partition_keys"]] == ["ds"]
    assert rec["parameters"]["transient_lastDdlTime"] == "100"
    assert rec["parameters"]["it's"] == "quoted"

    cat.add_partition("sqlcat_crud", "t1",
                      {"partition_name": "ds=2026-01-01", "parameters": {}})
    parts = cat.get_partitions("sqlcat_crud", "t1")
    assert [p["partition_name"] for p in parts] == ["ds=2026-01-01"]
    assert parts[0]["values"] == ["2026-01-01"]

    # alter preserves registered partitions
    rec["parameters"]["transient_lastDdlTime"] = "200"
    cat.alter_table(rec)
    assert cat.get_table("sqlcat_crud", "t1")["parameters"][
        "transient_lastDdlTime"] == "200"
    assert len(cat.get_partitions("sqlcat_crud", "t1")) == 1

    cat.drop_partition("sqlcat_crud", "t1", "ds=2026-01-01")
    assert cat.get_partitions("sqlcat_crud", "t1") == []

    # same-db rename, then cross-db recreate-rename
    cat.rename_table("sqlcat_crud", "t1", "sqlcat_crud", "t2")
    assert cat.tables("sqlcat_crud") == ["t2"]
    cat2 = SparkSqlCatalog(spark, str(tmp_path), dbs=["sqlcat_crud", "sqlcat_crud2"])
    cat2.rename_table("sqlcat_crud", "t2", "sqlcat_crud2", "t3")
    assert cat2.tables("sqlcat_crud") == []
    assert cat2.tables("sqlcat_crud2") == ["t3"]
    assert cat2.get_table("sqlcat_crud2", "t3")["parameters"][
        "transient_lastDdlTime"] == "200"

    cat2.drop_table("sqlcat_crud2", "t3")
    assert cat2.get_table("sqlcat_crud2", "t3") is None


def test_partition_params_roundtrip_and_cas(spark, tmp_path):
    """Partition parameters (the TLDT CAS guard) must survive the
    session catalog — they ride namespaced table properties since
    SHOW PARTITIONS can't carry them — and must not leak into the
    table-level parameter map the diff planner compares."""
    from reair_spark.commit import apply_commits_driver

    cat = SparkSqlCatalog(spark, str(tmp_path), dbs=["sqlcat_pp"])
    loc = cat.table_location("sqlcat_pp", "t")
    cat.create_table(_rec("sqlcat_pp", "t", loc, partition_keys=["ds"]))
    cat.add_partition(
        "sqlcat_pp", "t",
        {"partition_name": "ds=1",
         "parameters": {"transient_lastDdlTime": "111", "rows": "42"}},
    )
    parts = cat.get_partitions("sqlcat_pp", "t")
    assert parts[0]["parameters"] == {
        "transient_lastDdlTime": "111", "rows": "42"}
    # table params stay clean of the namespaced keys
    assert not any(k.startswith("reair.part.")
                   for k in cat.get_table("sqlcat_pp", "t")["parameters"])

    # TLDT mismatch → DROP_PARTITION refuses (NOT_COMPLETABLE)
    plan = spark.createDataFrame(
        [("sqlcat_pp", "t", "ds=1", "DROP_PARTITION", None, None,
          True, False, None, "999")],
        "db string, table string, partition_name string, action string, "
        "src_path string, dest_path string, update_metadata boolean, "
        "update_data boolean, payload string, expected_tldt string",
    )
    res = apply_commits_driver(spark, plan, cat).first()
    assert res.status == "NOT_COMPLETABLE"
    assert len(cat.get_partitions("sqlcat_pp", "t")) == 1

    # matching TLDT → drop succeeds and the namespaced props vanish
    plan_ok = spark.createDataFrame(
        [("sqlcat_pp", "t", "ds=1", "DROP_PARTITION", None, None,
          True, False, None, "111")],
        plan.schema,
    )
    res2 = apply_commits_driver(spark, plan_ok, cat).first()
    assert res2.status == "SUCCESSFUL"
    assert cat.get_partitions("sqlcat_pp", "t") == []
    assert not any(k.startswith("reair.part.")
                   for k in cat.get_table("sqlcat_pp", "t")["parameters"])
    cat.drop_table("sqlcat_pp", "t")


def test_snapshot_scans_over_sqlcatalog(spark, tmp_path):
    cat = SparkSqlCatalog(spark, str(tmp_path), dbs=["sqlcat_snap"])
    loc = cat.table_location("sqlcat_snap", "t1")
    cat.create_table(_rec("sqlcat_snap", "t1", loc, partition_keys=["ds"]))
    cat.add_partition("sqlcat_snap", "t1", {"partition_name": "ds=1"})

    t = snapshot_tables(spark, cat)
    assert t.count() == 1
    row = t.first()
    assert (row.db, row.table, row.serde) == ("sqlcat_snap", "t1", "parquet")
    p = snapshot_partitions(spark, cat)
    assert [r.partition_name for r in p.collect()] == ["ds=1"]
    cat.drop_table("sqlcat_snap", "t1")


def test_replicate_into_sql_catalog(spark, tmp_path):
    """End-to-end: DirectoryCatalog src warehouse → live session
    catalog dest; replicated tables are directly queryable with
    spark.sql afterwards."""
    from reair_spark.replicate import replicate_warehouse

    src, dest = str(tmp_path / "src"), str(tmp_path / "dest")
    src_cat = DirectoryCatalog(src)

    # unpartitioned parquet table
    loc1 = src_cat.table_location("sqlrep", "plain")
    spark.range(5).select(F.col("id").cast("string").alias("c1")) \
        .write.mode("overwrite").parquet(loc1)
    src_cat.create_table(_rec("sqlrep", "plain", loc1))

    # partitioned parquet table with one partition
    loc2 = src_cat.table_location("sqlrep", "parted")
    spark.range(3).select(F.col("id").cast("string").alias("c1")) \
        .write.mode("overwrite").parquet(f"{loc2}/ds=1")
    src_cat.create_table(_rec("sqlrep", "parted", loc2, partition_keys=["ds"]))
    src_cat.add_partition(
        "sqlrep", "parted",
        {"partition_name": "ds=1", "values": ["1"], "location": f"{loc2}/ds=1",
         "parameters": {"transient_lastDdlTime": "100"}},
    )

    dest_cat = SparkSqlCatalog(spark, dest, dbs=["sqlrep"])
    out = replicate_warehouse(spark, src, dest, dest_catalog=dest_cat)
    statuses = {r.status for r in out["commit_results"].collect()}
    assert statuses == {"SUCCESSFUL"}

    assert spark.sql("SELECT count(*) FROM sqlrep.plain").first()[0] == 5
    assert spark.sql(
        "SELECT count(*) FROM sqlrep.parted WHERE ds='1'").first()[0] == 3
    # locations rewritten under dest root
    assert dest_cat.get_table("sqlrep", "plain")["location"].startswith(dest)

    spark.sql("DROP TABLE IF EXISTS sqlrep.plain")
    spark.sql("DROP TABLE IF EXISTS sqlrep.parted")


def test_analyze_statistics_roundtrip_sqlcatalog(spark, tmp_path):
    """The ANALYZE-published spark.sql.statistics.* properties survive
    the SparkSqlCatalog round-trip (they are the one spark.sql.*
    namespace _raw_props must NOT hide — the public HMS discipline),
    so broadcast_aware_join's cost decision works against a real
    Spark-SQL catalog, not just the directory one."""
    from reair_spark.catalog import SparkSqlCatalog
    from reair_spark.sources import (
        analyze_catalog_table,
        broadcast_aware_join,
        write_zonemapped,
    )
    from pyspark.sql import functions as F

    cat = SparkSqlCatalog(spark, str(tmp_path / "wh"))
    loc = str(tmp_path / "wh" / "ref")
    df = spark.range(60).select(
        F.col("id").alias("k"), (F.col("id") % 3).alias("b"),
        F.col("id").alias("v"),
    )
    write_zonemapped(df, loc, "b", stat_cols=["v"], ndv_cols=["v"])
    cat.create_table(_rec(
        "db1", "ref", loc,
        params={"layout": "zonemapped"},
    ))

    res = analyze_catalog_table(spark, cat, "db1", "ref")
    assert res["n_rows"] == 60
    back = cat.get_table("db1", "ref")["parameters"]
    assert back["spark.sql.statistics.numRows"] == "60"
    assert back["spark.sql.statistics.colStats.v.nullCount"] == "0"
    assert back["layout"] == "zonemapped"

    fact = spark.range(500).select((F.col("id") % 60).alias("k"))
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined, dec = broadcast_aware_join(
            spark, cat, "db1", "ref", fact, on=["k"]
        )
        assert dec == {"broadcast": True, "num_rows_stat": 60,
                       "stats_stale": False}
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan
        assert joined.count() == 500
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
