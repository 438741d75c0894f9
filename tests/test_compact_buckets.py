"""Targeted bucket-scoped compaction (zonemap_compact_buckets) — the
Iceberg rewrite_data_files-with-filter / Delta OPTIMIZE WHERE shape:
rewrite only the named (or predicate-kept) buckets, leave the cold
ones untouched, clear exactly those buckets' merge-on-read debt, and
keep history/tags/staged commits intact."""
from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from reair_spark.sources import (
    append_zonemapped,
    write_zonemapped,
    zonemap_compact_buckets,
    zonemap_count,
    zonemap_delete_by_key,
    zonemap_scan,
    zonemap_tag,
    zonemap_vacuum,
)


def _seed(spark, tmp_path, gens=3):
    loc = str(tmp_path / "layout")
    df = spark.range(0, 80).select(
        F.col("id").alias("k"),
        (F.col("id") % 8).alias("b"),
        (F.col("id") % 9).alias("v"),
    )
    write_zonemapped(df, loc, "b", stat_cols=["v"])
    for g in range(1, gens):
        append_zonemapped(
            df.withColumn("k", F.col("k") + 100 * g), loc, "b", ["v"],
            ingest_id=g,
        )
    return loc, df


def _rows(spark, loc, **kw):
    cur, _ = zonemap_scan(spark, loc, **kw)
    return {(r.k, r.v) for r in cur.select("k", "v").collect()}


def test_targeted_compaction_basic(spark, tmp_path):
    loc, df = _seed(spark, tmp_path)
    before = _rows(spark, loc)
    st = zonemap_compact_buckets(spark, loc, buckets=["2", "5"])
    assert st["n_buckets_compacted"] == 2
    assert _rows(spark, loc) == before
    # the hot buckets now read from ONE fresh layer; cold buckets
    # keep all three original layers untouched
    iid = st["ingest_id"]
    assert os.path.isdir(f"{loc}/data/ingest={iid}/b=2")
    for g in range(3):
        assert os.path.isdir(f"{loc}/data/ingest={g}/b=0")
    plan_scan, stats = zonemap_scan(spark, loc, buckets=["2"])
    assert plan_scan.select("ingest").distinct().collect()[0][0] == iid
    # time travel below the rewrite still sees the old layers
    assert _rows(spark, loc, max_ingest=2) == before


def test_predicate_selects_buckets(spark, tmp_path):
    loc, df = _seed(spark, tmp_path, gens=2)
    before = _rows(spark, loc)
    # v-zones overlap every bucket here, so target via the clustering
    # column's own zone: every bucket's min_v..max_v spans, use k
    st = zonemap_compact_buckets(
        spark, loc, predicates=[("v", 0, 100)]
    )
    assert st["n_buckets_compacted"] == 8
    assert _rows(spark, loc) == before
    with pytest.raises(ValueError, match="exactly one"):
        zonemap_compact_buckets(spark, loc)
    with pytest.raises(ValueError, match="exactly one"):
        zonemap_compact_buckets(spark, loc, buckets=["1"],
                                predicates=[("v", 0, 1)])
    assert zonemap_compact_buckets(
        spark, loc, buckets=[]
    )["n_buckets_compacted"] == 0


def test_clears_mor_debt_of_target_buckets_only(spark, tmp_path):
    loc, df = _seed(spark, tmp_path, gens=2)
    zonemap_delete_by_key(
        spark, loc,
        spark.createDataFrame([(2, 2), (102, 2), (3, 3)],
                              "k long, b long"),
        key_cols=["k"],
    )
    before = _rows(spark, loc)
    n_before = len(before)
    # bucket 2 compacted: its masks go inert; bucket 3's mask stays
    # live (still demotes its count to a residual read — exact)
    zonemap_compact_buckets(spark, loc, buckets=["2"])
    assert _rows(spark, loc) == before
    cnt, cstats = zonemap_count(spark, loc)
    assert cnt == n_before
    assert cstats["n_buckets_partial"] == 1
    zonemap_compact_buckets(spark, loc, buckets=["3"])
    cnt, cstats = zonemap_count(spark, loc)
    assert cnt == n_before and cstats["n_buckets_partial"] == 0


def test_safe_under_tags_and_vacuumable(spark, tmp_path):
    loc, df = _seed(spark, tmp_path, gens=2)
    zonemap_tag(loc, "pre")
    before = _rows(spark, loc)
    st = zonemap_compact_buckets(spark, loc, buckets=["1", "4"])
    assert _rows(spark, loc, tag="pre") == before
    # drop the tag: the superseded layers of the compacted buckets
    # become vacuumable, the cold buckets' layers stay
    from reair_spark.sources import zonemap_drop_tag

    zonemap_drop_tag(loc, "pre")
    out = zonemap_vacuum(spark, loc, retention_ingests=0)
    assert out["n_dirs_removed"] == 4  # 2 buckets x 2 old layers
    assert _rows(spark, loc) == before
