"""Composite partition specs (VERDICT r12 ask #5 — the Iceberg
LIST-of-transforms shape): write_zonemapped(spec=[t0, t1]) keys the
manifest by the transform TUPLE (composed as a '|'-joined derived
clustering value), zonemap_plan prunes on either level independently
(spec_predicates), and the incremental publish under
[partition-transform, bucket(k, key)] rewrites only a changed
partition's own (partition × bucket) cells — no co-reading of
siblings that would share a coarse single-level bucket."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

import reair_spark.sources as S


def _rows(spark):
    # two months × keys 0..19; cell = (month, k % 2)
    return spark.range(40).select(
        F.col("id").alias("k"),
        F.when(F.col("id") < 20, "2024-01").otherwise("2024-02")
        .alias("om"),
        (F.col("id") * 10).alias("v"),
    )


SPEC = ["substring(om, 1, 7)", "pmod(k, 2)"]


def test_spec_writes_cells_and_records_descriptor(spark, tmp_path):
    loc = str(tmp_path / "cells")
    S.write_zonemapped(_rows(spark), loc, "cell", ["v"], spec=SPEC)

    meta = S._read_layout_meta(loc)
    assert meta["spec"] == SPEC
    assert meta["bucket_expr"] == (
        "concat_ws('|', cast((substring(om, 1, 7)) as string), "
        "cast((pmod(k, 2)) as string))"
    )
    # the tuple IS the manifest key and the directory value
    assert sorted(os.listdir(f"{loc}/data/ingest=0")) == [
        "cell=2024-01|0", "cell=2024-01|1",
        "cell=2024-02|0", "cell=2024-02|1",
    ]

    # spec drift / conflicts are refused like every layout parameter
    with pytest.raises(ValueError, match="spec"):
        S.append_zonemapped(
            _rows(spark), loc, "cell", ["v"], ingest_id=1,
            spec=["substring(om, 1, 4)", "pmod(k, 2)"],
        )
    with pytest.raises(ValueError, match="conflicting"):
        S.append_zonemapped(
            _rows(spark), loc, "cell", ["v"], ingest_id=1,
            spec=SPEC, bucket_expr="pmod(k, 2)",
        )
    with pytest.raises(ValueError, match=">= 2 transforms"):
        S.write_zonemapped(
            _rows(spark), str(tmp_path / "one"), "cell", ["v"],
            spec=["pmod(k, 2)"],
        )


def test_spec_predicates_prune_either_dimension(spark, tmp_path):
    loc = str(tmp_path / "prune")
    S.write_zonemapped(_rows(spark), loc, "cell", ["v"], spec=SPEC)

    # level 0 (time): one month's cells only
    df, stats = S.zonemap_scan(
        spark, loc, spec_predicates=[(0, "2024-01")]
    )
    assert stats["n_buckets_total"] == 4
    assert stats["n_buckets_read"] == 2
    assert sorted(r.k for r in df.collect()) == list(range(20))

    # level 1 (hash bucket): one bucket per month
    df, stats = S.zonemap_scan(spark, loc, spec_predicates=[(1, 1)])
    assert stats["n_buckets_read"] == 2
    assert sorted(r.k for r in df.collect()) == list(range(1, 40, 2))

    # both levels: exactly one cell
    df, stats = S.zonemap_scan(
        spark, loc, spec_predicates=[(0, "2024-02"), (1, 0)]
    )
    assert stats["n_buckets_read"] == 1
    assert sorted(r.k for r in df.collect()) == list(range(20, 40, 2))

    # composes with zone predicates (v ranges) on the same plan
    df, stats = S.zonemap_scan(
        spark, loc, predicates=[("v", 0, 95)],
        spec_predicates=[(1, 0)],
    )
    assert stats["n_buckets_read"] == 1  # month 1, bucket 0 only
    # the scan returns the whole kept cell; residual is the caller's
    assert sorted(
        r.k for r in df.where("v between 0 and 95").collect()
    ) == list(range(0, 10, 2))

    # refusals: out-of-range level; spec-less layout
    with pytest.raises(ValueError, match="out of range"):
        S.zonemap_plan(spark, loc, spec_predicates=[(2, "x")])
    plain = str(tmp_path / "plain")
    S.write_zonemapped(
        _rows(spark).withColumn("b", F.pmod("k", 2)), plain, "b", ["v"]
    )
    with pytest.raises(ValueError, match="no composite spec"):
        S.zonemap_plan(spark, plain, spec_predicates=[(0, "x")])


def test_spec_survives_append_merge_fold_compact(spark, tmp_path):
    loc = str(tmp_path / "life")
    S.write_zonemapped(_rows(spark), loc, "cell", ["v"], spec=SPEC)
    S.append_zonemapped(
        spark.range(100, 110).select(
            F.col("id").alias("k"), F.lit("2024-03").alias("om"),
            (F.col("id") * 10).alias("v"),
        ),
        loc, "cell", ["v"], ingest_id=1,
    )
    S.zonemap_merge(
        spark, loc,
        spark.range(1).select(
            F.lit(4).cast("long").alias("k"),
            F.lit("2024-01").alias("om"),
            F.lit(9999).cast("long").alias("v"),
        ),
        key_cols=["k"],
    )
    df, stats = S.zonemap_scan(
        spark, loc, spec_predicates=[(0, "2024-01"), (1, 0)]
    )
    assert df.where("k = 4").first().v == 9999
    assert stats["n_buckets_read"] == 1

    before = sorted(
        (r.k, r.cell, r.v) for r in S.zonemap_scan(spark, loc)[0].collect()
    )
    S.zonemap_rewrite_manifests(spark, loc)
    S.zonemap_compact(spark, loc)
    meta = S._read_layout_meta(loc)
    assert meta["spec"] == SPEC  # the spec is a layout INVARIANT
    assert sorted(
        (r.k, r.cell, r.v) for r in S.zonemap_scan(spark, loc)[0].collect()
    ) == before
    df, stats = S.zonemap_scan(spark, loc, spec_predicates=[(0, "2024-03")])
    assert stats["n_buckets_read"] == 2
    assert df.count() == 10


def test_spec_incremental_publish_rewrites_only_own_cells(spark, tmp_path):
    """The verdict's done-criterion: under [partition-transform,
    bucket(k,2)], a one-partition change rewrites ONLY its own
    (partition × bucket) cells — sibling partitions are NOT co-read
    (with a single coarse bucket they would be)."""
    from reair_spark.catalog import DirectoryCatalog
    from reair_spark.replicate import replicate_warehouse

    src_root, dest_root = str(tmp_path / "src"), str(tmp_path / "dest")
    src_cat = DirectoryCatalog(src_root)
    floc = src_cat.table_location("wh", "pfact")
    df = spark.createDataFrame(
        [(m * 100 + i, float(m * 100 + i), om)
         for m, om in enumerate(["1996-01", "1996-02", "1997-01"])
         for i in range(4)],
        "k int, v double, om string",
    )
    df.write.partitionBy("om").mode("overwrite").parquet(floc)
    src_cat.create_table({
        "db": "wh", "table": "pfact", "table_type": "MANAGED_TABLE",
        "cols": [{"name": "k", "type": "int", "comment": None},
                 {"name": "v", "type": "double", "comment": None}],
        "partition_keys": [{"name": "om", "type": "string",
                            "comment": None}],
        "location": floc, "serde": "parquet",
        "parameters": {"transient_lastDdlTime": "100"},
    })
    for om in ("1996-01", "1996-02", "1997-01"):
        src_cat.add_partition("wh", "pfact", {
            "partition_name": f"om={om}", "values": [om],
            "location": os.path.join(floc, f"om={om}"),
            "parameters": {"transient_lastDdlTime": "100"},
        })

    dest_cat = DirectoryCatalog(dest_root)
    dest_cat.create_table({
        "db": "wh", "table": "pfact", "table_type": "EXTERNAL_TABLE",
        "cols": [], "partition_keys": [],
        "location": dest_cat.table_location("wh", "pfact"),
        "serde": "parquet",
        "parameters": {
            "layout": "zonemapped",
            "zonemap.publish_mode": "incremental",
            "zonemap.bucket_col": "cell",
            "zonemap.spec": json.dumps(["om", "pmod(k, 2)"]),
            "zonemap.stat_cols": "v",
        },
    })
    loc = dest_cat.get_table("wh", "pfact")["location"]

    out1 = replicate_warehouse(spark, src_root, dest_root)
    assert out1["zonemap_results"].first().status == "PUBLISHED"
    meta = S._read_layout_meta(loc)
    assert meta["spec"] == ["om", "pmod(k, 2)"]
    assert S.zonemap_scan(spark, loc)[1]["n_buckets_total"] == 6

    # change ONE partition
    spark.createDataFrame(
        [(999, 999.0), (998, 998.0)], "k int, v double"
    ).write.mode("overwrite").parquet(os.path.join(floc, "om=1996-02"))
    src_cat.add_partition("wh", "pfact", {
        "partition_name": "om=1996-02", "values": ["1996-02"],
        "location": os.path.join(floc, "om=1996-02"),
        "parameters": {"transient_lastDdlTime": "200"},
    })
    out2 = replicate_warehouse(spark, src_root, dest_root)
    zm = out2["zonemap_results"].first()
    assert zm.status == "PUBLISHED_INCREMENTAL"
    # only ITS OWN cells rewritten: 2 cells, 2 rows — no co-read of
    # om=1996-01 (a year-level single bucket would have co-read it)
    assert zm.n_buckets == 2
    assert zm.n_rows == 2

    # every OTHER partition's cells still read from the seed ingest
    _, kept, _ = S.zonemap_plan(spark, loc)
    by_cell = {r["cell"]: r["__ingests"] for r in kept}
    for cell, ingests in by_cell.items():
        if cell.startswith("1996-02|"):
            assert ingests != [0]
        else:
            assert ingests == [0]
    got = sorted(r.k for r in S.zonemap_scan(spark, loc)[0].collect())
    assert got == [0, 1, 2, 3, 200, 201, 202, 203, 998, 999]

    # level pruning on the published layout: one partition, one bucket
    df2, stats = S.zonemap_scan(
        spark, loc, spec_predicates=[(0, "1996-02"), (1, 0)]
    )
    assert stats["n_buckets_read"] == 1
    assert sorted(r.k for r in df2.collect()) == [998]


def test_spec_predicates_count_pushdown(spark, tmp_path):
    """zonemap_count composes spec-level pruning with the metadata
    count: a spec predicate is EXACT on the cell key, so a fully
    zone-covered cell still counts from the manifest alone."""
    loc = str(tmp_path / "cnt")
    S.write_zonemapped(_rows(spark), loc, "cell", ["v"], spec=SPEC)

    # no zone predicate: pure metadata count of one month's cells
    n, stats = S.zonemap_count(
        spark, loc, spec_predicates=[(0, "2024-01")]
    )
    assert n == 20
    assert stats["n_buckets_full"] == 2   # counted from the manifest
    assert stats["n_buckets_partial"] == 0

    # zone predicate covering every row of the kept cell: still
    # metadata-only; a partial range demotes to a residual scan
    n, stats = S.zonemap_count(
        spark, loc, predicates=[("v", 0, 400)],
        spec_predicates=[(0, "2024-01"), (1, 1)],
    )
    assert n == 10
    assert stats["n_buckets_full"] == 1
    n, stats = S.zonemap_count(
        spark, loc, predicates=[("v", 0, 95)],
        spec_predicates=[(0, "2024-01"), (1, 1)],
    )
    assert n == 5                          # v in {10,30,50,70,90}
    assert stats["n_buckets_partial"] == 1


def test_three_level_spec(spark, tmp_path):
    """The spec is a LIST, not a pair: a 3-transform spec keys cells
    by (month, parity, magnitude) and prunes on any level."""
    loc = str(tmp_path / "three")
    spec3 = ["substring(om, 1, 7)", "pmod(k, 2)",
             "case when v >= 200 then 'hi' else 'lo' end"]
    S.write_zonemapped(_rows(spark), loc, "cell", ["v"], spec=spec3)
    meta = S._read_layout_meta(loc)
    assert meta["spec"] == spec3

    # middle level alone
    df, stats = S.zonemap_scan(spark, loc, spec_predicates=[(1, 0)])
    assert sorted(r.k for r in df.collect()) == list(range(0, 40, 2))
    # outer + inner levels, skipping the middle (v = k*10, so month 2
    # is all 'hi' and month 1 all 'lo' — a month-1 'hi' cell does not
    # even exist and prunes to nothing)
    df, stats = S.zonemap_scan(
        spark, loc, spec_predicates=[(0, "2024-02"), (2, "hi")]
    )
    assert stats["n_buckets_read"] == 2     # both parities of month 2
    assert sorted(r.k for r in df.collect()) == list(range(20, 40))
    _, stats = S.zonemap_scan(
        spark, loc, spec_predicates=[(0, "2024-01"), (2, "hi")]
    )
    assert stats["n_buckets_read"] == 0
    # all three levels: one cell
    df, stats = S.zonemap_scan(
        spark, loc,
        spec_predicates=[(0, "2024-02"), (1, 1), (2, "hi")],
    )
    assert stats["n_buckets_read"] == 1
    assert sorted(r.k for r in df.collect()) == [
        k for k in range(20, 40) if k % 2 == 1 and k * 10 >= 200
    ]
