"""Streaming change-feed consumption (stream_zonemap_changes) and the
shared range-apply primitive (zonemap_cdf_apply): offset checkpoint,
initial-batch modes, replay idempotence, and staged-commit
invisibility."""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from reair_spark.sources import (
    _claim_ingest_id,
    append_zonemapped,
    write_zonemapped,
    zonemap_delete,
    zonemap_publish_staged,
    zonemap_scan,
    zonemap_upsert_mor,
)
from reair_spark.streaming import (
    _cdf_offset_read,
    stream_zonemap_changes,
    zonemap_cdf_apply,
)


def _seed(spark, tmp_path, n=48, buckets=6):
    src = str(tmp_path / "src")
    df = spark.range(0, n).select(
        F.col("id").alias("k"),
        (F.col("id") % buckets).alias("b"),
        (F.col("id") % 13).alias("v"),
    )
    write_zonemapped(df, src, "b", stat_cols=["v"])
    return src, df


def _rows(spark, loc):
    cur, _ = zonemap_scan(spark, loc)
    return {(r.k, r.v) for r in cur.select("k", "v").collect()}


def _sync_fn(spark, src, dest):
    def apply_fn(batch, from_i, to_i):
        if from_i == -1:
            write_zonemapped(
                batch.drop("_change_type", "_commit_ingest"),
                dest, "b", stat_cols=["v"],
            )
        else:
            zonemap_cdf_apply(spark, src, dest, from_i, to_i)

    return apply_fn


def test_pump_snapshot_then_increments(spark, tmp_path):
    src, df = _seed(spark, tmp_path)
    dest = str(tmp_path / "dest")
    cp = str(tmp_path / "cp")
    pump = lambda: stream_zonemap_changes(  # noqa: E731
        spark, src, cp, _sync_fn(spark, src, dest)
    )
    st = pump()
    assert st["from_ingest"] == -1 and st["to_ingest"] == 0
    assert _rows(spark, dest) == _rows(spark, src)
    # caught up: no-op
    assert pump()["n_commits"] == 0
    # three heterogeneous commits, one pump call syncs them all
    append_zonemapped(
        df.withColumn("k", F.col("k") + 100), src, "b", ["v"],
        ingest_id=_claim_ingest_id(src),
    )
    zonemap_delete(spark, src, predicates=[("v", 0, 3)], mode="mor")
    zonemap_upsert_mor(
        spark, src,
        spark.createDataFrame([(1, 1, 99)], "k long, b long, v long"),
        key_cols=["k"],
    )
    st = pump()
    assert st["n_commits"] == 3
    assert _rows(spark, dest) == _rows(spark, src)
    assert _cdf_offset_read(cp) == st["to_ingest"]
    assert pump()["n_commits"] == 0


def test_range_apply_is_idempotent(spark, tmp_path):
    src, df = _seed(spark, tmp_path)
    dest = str(tmp_path / "dest")
    seed, _ = zonemap_scan(spark, src)
    write_zonemapped(seed.drop("ingest"), dest, "b", stat_cols=["v"])
    zonemap_delete(spark, src, predicates=[("v", 2, 6)], mode="cow")
    st1 = zonemap_cdf_apply(spark, src, dest, 0)
    assert st1["n_commits"] == 1
    assert _rows(spark, dest) == _rows(spark, src)
    # replaying the SAME range (the crash-between-apply-and-offset
    # window) converges to the same state
    st2 = zonemap_cdf_apply(spark, src, dest, 0)
    assert st2["n_buckets_synced"] == st1["n_buckets_synced"]
    assert _rows(spark, dest) == _rows(spark, src)


def test_range_apply_replay_never_duplicates_inserts(spark, tmp_path):
    """The replay window with an INSERT-bearing range: a delta-based
    apply would add the appended rows a second time; the state-based
    apply rewrites the touched buckets to the source's as-of state,
    so the replay is a byte-level no-op."""
    src, df = _seed(spark, tmp_path)
    dest = str(tmp_path / "dest")
    seed, _ = zonemap_scan(spark, src)
    write_zonemapped(seed.drop("ingest"), dest, "b", stat_cols=["v"])
    append_zonemapped(
        df.withColumn("k", F.col("k") + 100), src, "b", ["v"],
        ingest_id=_claim_ingest_id(src),
    )
    zonemap_delete(spark, src, predicates=[("v", 0, 2)], mode="mor")
    zonemap_cdf_apply(spark, src, dest, 0)
    assert _rows(spark, dest) == _rows(spark, src)
    n = len(_rows(spark, dest))
    zonemap_cdf_apply(spark, src, dest, 0)  # crash-window replay
    assert len(_rows(spark, dest)) == n
    assert _rows(spark, dest) == _rows(spark, src)


def test_publish_after_later_commits_reaches_downstream(spark, tmp_path):
    """The WAP-vs-pump ordering hazard: stage a commit, let an
    ordinary commit land and be pumped (offset advances past the
    staged id), THEN publish — the cherry-pick re-ids the commit
    above the offset, so the pump delivers it instead of silently
    skipping it forever."""
    src, df = _seed(spark, tmp_path)
    dest = str(tmp_path / "dest")
    cp = str(tmp_path / "cp")
    pump = lambda: stream_zonemap_changes(  # noqa: E731
        spark, src, cp, _sync_fn(spark, src, dest)
    )
    pump()
    append_zonemapped(
        df.withColumn("k", F.col("k") + 100), src, "b", ["v"],
        ingest_id=1, staged=True,
    )
    append_zonemapped(
        df.withColumn("k", F.col("k") + 200), src, "b", ["v"],
        ingest_id=2,
    )
    assert pump()["n_commits"] == 1  # offset now ABOVE the staged id
    new_id = zonemap_publish_staged(src, 1)
    assert new_id > 2
    st = pump()
    assert st["n_commits"] == 1
    assert _rows(spark, dest) == _rows(spark, src)
    assert len(_rows(spark, dest)) == 144


def test_pump_fails_loudly_after_source_rollback(spark, tmp_path):
    from reair_spark.sources import zonemap_rollback

    src, df = _seed(spark, tmp_path)
    dest = str(tmp_path / "dest")
    cp = str(tmp_path / "cp")
    pump = lambda: stream_zonemap_changes(  # noqa: E731
        spark, src, cp, _sync_fn(spark, src, dest)
    )
    pump()
    append_zonemapped(
        df.withColumn("k", F.col("k") + 100), src, "b", ["v"],
        ingest_id=1,
    )
    pump()
    zonemap_rollback(spark, src, 0)
    with pytest.raises(ValueError, match="rolled back"):
        pump()


def test_pump_initial_latest_and_explicit(spark, tmp_path):
    src, df = _seed(spark, tmp_path)
    dest = str(tmp_path / "dest")
    # 'latest': skips the existing snapshot entirely
    cp2 = str(tmp_path / "cp2")
    seen = []
    st = stream_zonemap_changes(
        spark, src, cp2, lambda b, f, t: seen.append(b.count()),
        initial="latest",
    )
    assert st["n_commits"] == 0 and seen == []
    append_zonemapped(
        df.withColumn("k", F.col("k") + 100), src, "b", ["v"],
        ingest_id=_claim_ingest_id(src),
    )
    st = stream_zonemap_changes(
        spark, src, cp2, lambda b, f, t: seen.append(b.count()),
        initial="latest",
    )
    assert st["n_commits"] == 1 and seen == [48]
    # explicit int offset: consume from right after ingest 0
    cp3 = str(tmp_path / "cp3")
    st = stream_zonemap_changes(
        spark, src, cp3, lambda b, f, t: seen.append(b.count()),
        initial=0,
    )
    assert st["from_ingest"] == 0 and seen[-1] == 48


def test_pump_ignores_staged_until_published(spark, tmp_path):
    src, df = _seed(spark, tmp_path)
    cp = str(tmp_path / "cp")
    got = []
    pump = lambda: stream_zonemap_changes(  # noqa: E731
        spark, src, cp, lambda b, f, t: got.append(b.count()),
        initial="latest",
    )
    pump()
    append_zonemapped(
        df.withColumn("k", F.col("k") + 100), src, "b", ["v"],
        ingest_id=1, staged=True,
    )
    # staged commit: not part of any snapshot, the head does not move
    assert pump()["n_commits"] == 0 and got == []
    zonemap_publish_staged(src, 1)
    st = pump()
    assert st["n_commits"] == 1 and got == [48]
