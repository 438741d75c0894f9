"""Key-only merge-on-read deletion (zonemap_delete_by_key) — the
GDPR-erasure shape: an equality-delete commit with no data rows.
Lifecycle: mask semantics, exact counts on masked buckets, time
travel, change feed, rebirth via later upsert, physical purge at
compaction, replay idempotence, and the contract refusals."""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from reair_spark.sources import (
    write_zonemapped,
    zonemap_changes,
    zonemap_compact,
    zonemap_count,
    zonemap_delete_by_key,
    zonemap_history,
    zonemap_scan,
    zonemap_upsert_mor,
)


def _seed(spark, tmp_path, n=60, buckets=6):
    loc = str(tmp_path / "layout")
    df = spark.range(0, n).select(
        F.col("id").alias("k"),
        (F.col("id") % buckets).alias("b"),
        (F.col("id") % 7).alias("v"),
    )
    write_zonemapped(df, loc, "b", stat_cols=["v"])
    return loc, df


def _keys(spark, loc, **kw):
    cur, _ = zonemap_scan(spark, loc, **kw)
    return {r.k for r in cur.select("k").collect()}


def test_lifecycle(spark, tmp_path):
    loc, df = _seed(spark, tmp_path)
    doomed = spark.createDataFrame(
        [(3, 3), (17, 5), (44, 2)], "k long, b long"
    )
    st = zonemap_delete_by_key(spark, loc, doomed, key_cols=["k"])
    assert st["n_keys_deleted"] == 3
    assert st["n_buckets_affected"] == 3
    assert _keys(spark, loc) == set(range(60)) - {3, 17, 44}
    # counts stay exact (masked buckets demote to residual scans)
    assert zonemap_count(spark, loc)[0] == 57
    # time travel still sees the erased rows; the feed reports them
    assert _keys(spark, loc, max_ingest=0) == set(range(60))
    ch, _ = zonemap_changes(spark, loc, 0)
    assert sorted((r.k, r._change_type) for r in ch.collect()) \
        == [(3, "delete"), (17, "delete"), (44, "delete")]
    hist = {r["ingest"]: r["operation"]
            for r in zonemap_history(spark, loc).collect()}
    assert hist[1] == "delete"
    # a later upsert of an erased key wins over the older mask
    zonemap_upsert_mor(
        spark, loc,
        spark.createDataFrame([(3, 3, 100)], "k long, b long, v long"),
        key_cols=["k"],
    )
    cur, _ = zonemap_scan(spark, loc)
    assert [(r.k, r.v) for r in cur.where("k = 3").collect()] \
        == [(3, 100)]
    # compaction purges physically: 57 survivors + the reborn key
    zonemap_compact(spark, loc)
    assert len(_keys(spark, loc)) == 58
    assert _keys(spark, loc) == (set(range(60)) - {17, 44})


def test_replay_is_idempotent(spark, tmp_path):
    loc, df = _seed(spark, tmp_path)
    doomed = spark.createDataFrame([(5, 5), (11, 5)], "k long, b long")
    st1 = zonemap_delete_by_key(spark, loc, doomed, key_cols=["k"],
                                ingest_id=1)
    st2 = zonemap_delete_by_key(spark, loc, doomed, key_cols=["k"],
                                ingest_id=1)
    assert st1 == st2
    assert _keys(spark, loc) == set(range(60)) - {5, 11}
    assert zonemap_count(spark, loc)[0] == 58


def test_contract_refusals(spark, tmp_path):
    loc, df = _seed(spark, tmp_path)
    with pytest.raises(ValueError, match="not columns"):
        zonemap_delete_by_key(
            spark, loc,
            spark.createDataFrame([(1, 1)], "x long, b long"),
            key_cols=["k"],
        )
    with pytest.raises(ValueError, match="clustering column"):
        zonemap_delete_by_key(
            spark, loc,
            spark.createDataFrame([(1,)], "k long"),
            key_cols=["k"],
        )
    # key-set drift vs the layout's recorded equality keys
    zonemap_upsert_mor(
        spark, loc,
        spark.createDataFrame([(1, 1, 9)], "k long, b long, v long"),
        key_cols=["k"],
    )
    with pytest.raises(ValueError, match="recorded"):
        zonemap_delete_by_key(
            spark, loc,
            spark.createDataFrame([(1, 1)], "v long, b long"),
            key_cols=["v"],
        )


def test_hidden_partition_derivation(spark, tmp_path):
    """A layout clustered on a DERIVED column accepts bare key
    frames — the erasure request need not know the layout's spec."""
    loc = str(tmp_path / "layout")
    df = spark.range(0, 40).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("v")
    )
    write_zonemapped(df, loc, "hb", stat_cols=["v"],
                     bucket_expr="pmod(k, 5)")
    st = zonemap_delete_by_key(
        spark, loc,
        spark.createDataFrame([(12,), (23,)], "k long"),
        key_cols=["k"],
    )
    assert st["n_keys_deleted"] == 2
    assert _keys(spark, loc) == set(range(40)) - {12, 23}
