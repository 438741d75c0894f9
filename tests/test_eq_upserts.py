"""Merge-on-read UPSERTs via equality deletes (``zonemap_upsert_mor``
+ ``stream_zonemap_upsert`` — the Iceberg equality-delete / Flink
upsert-sink shape): a batch of key updates lands as one atomic commit
(append + per-bucket key masks), write cost O(batch) instead of
copy-on-write bucket rewrites; reads mask older versions of upserted
keys; compaction folds the masks into the data and drops them."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

import reair_spark.sources as S


def _mk(spark, lo, hi, v=None):
    return spark.range(lo, hi).select(
        F.col("id"), F.pmod("id", F.lit(4)).cast("long").alias("b"),
        (F.lit(v).cast("long") if v is not None
         else F.col("id") * 2).alias("v"),
    )


def test_upsert_is_append_plus_masks(spark, tmp_path):
    loc = str(tmp_path / "t")
    S.write_zonemapped(_mk(spark, 0, 100), loc, "b", ["id", "v"])
    u = _mk(spark, 10, 20, v=-1).unionByName(_mk(spark, 100, 105, v=-1))
    r = S.zonemap_upsert_mor(spark, loc, u, key_cols=["id"])
    assert r == {"n_rows_upserted": 15, "n_keys_masked": 15,
                 "ingest_id": 1}
    # nothing rewritten: ingest 0's dirs untouched, batch in ingest 1
    assert sorted(os.listdir(f"{loc}/data")) == ["ingest=0", "ingest=1"]
    assert os.path.isdir(f"{loc}/edeletes/ingest=1")

    cur, _ = S.zonemap_scan(spark, loc)
    assert cur.count() == 105
    assert cur.where("v = -1").count() == 15
    assert cur.where("id between 10 and 19 and v != -1").count() == 0
    # counts demote masked buckets to residual scans and stay exact
    n, cs = S.zonemap_count(spark, loc)
    assert n == 105 and cs["n_buckets_full"] == 0


def test_upsert_latest_version_wins_and_time_travel(spark, tmp_path):
    loc = str(tmp_path / "t")
    S.write_zonemapped(_mk(spark, 0, 40), loc, "b", ["id", "v"])
    r1 = S.zonemap_upsert_mor(spark, loc, _mk(spark, 0, 10, v=-1),
                              key_cols=["id"])
    r2 = S.zonemap_upsert_mor(spark, loc, _mk(spark, 5, 15, v=-2),
                              key_cols=["id"])
    cur, _ = S.zonemap_scan(spark, loc)
    assert cur.count() == 40
    assert cur.where("v = -2").count() == 10
    assert cur.where("v = -1").count() == 5  # ids 0..4 keep version 1
    mid, _ = S.zonemap_scan(spark, loc, max_ingest=r1["ingest_id"])
    assert mid.count() == 40 and mid.where("v = -2").count() == 0
    orig, _ = S.zonemap_scan(spark, loc, max_ingest=0)
    assert orig.where("v < 0").count() == 0
    # within-batch duplicate keys all survive (the key group is
    # replaced wholesale, MERGE's contract)
    dup = _mk(spark, 20, 21, v=-7).unionByName(_mk(spark, 20, 21, v=-8))
    S.zonemap_upsert_mor(spark, loc, dup, key_cols=["id"])
    assert S.zonemap_scan(spark, loc)[0].where("id = 20").count() == 2


def test_upsert_key_drift_refused(spark, tmp_path):
    loc = str(tmp_path / "t")
    S.write_zonemapped(_mk(spark, 0, 20), loc, "b", ["id", "v"])
    S.zonemap_upsert_mor(spark, loc, _mk(spark, 0, 2, v=-1),
                         key_cols=["id"])
    with pytest.raises(ValueError, match="equality-delete keys"):
        S.zonemap_upsert_mor(spark, loc, _mk(spark, 0, 2, v=-1),
                             key_cols=["v"])
    with pytest.raises(ValueError, match="not columns"):
        S.zonemap_upsert_mor(spark, loc, _mk(spark, 0, 2, v=-1),
                             key_cols=["nope"])


def test_cow_rewrite_rebaselines_masks(spark, tmp_path):
    """A copy-on-write pass (merge) reads post-mask rows and its
    replacing delta lifts every data dir of the bucket above the
    masks — they become inert, never double-applied."""
    loc = str(tmp_path / "t")
    S.write_zonemapped(_mk(spark, 0, 40), loc, "b", ["id", "v"])
    S.zonemap_upsert_mor(spark, loc, _mk(spark, 0, 8, v=-1),
                         key_cols=["id"])
    S.zonemap_merge(spark, loc, _mk(spark, 0, 1, v=-9), key_cols=["id"])
    cur, _ = S.zonemap_scan(spark, loc)
    assert cur.count() == 40
    assert cur.where("v = -9").count() == 1
    assert cur.where("v = -1").count() == 7
    # the merge rewrote ONLY bucket 0 — its masks are inert (metadata
    # count again), the other 3 buckets keep live masks (residual)
    n, cs = S.zonemap_count(spark, loc)
    assert n == 40 and cs["n_buckets_partial"] == 3
    _, kept, _ = S.zonemap_plan(spark, loc)
    by_b = {r["b"]: r for r in kept}
    assert by_b["0"].get("__eq_ingests") == []
    assert all(by_b[b].get("__eq_ingests") for b in ("1", "2", "3"))
    # a full-width rewrite (overwrite) rebaselines every bucket
    S.zonemap_overwrite(spark, loc, cur.drop("ingest"))
    n2, cs2 = S.zonemap_count(spark, loc)
    assert n2 == 40 and cs2["n_buckets_partial"] == 0


def test_fold_preserves_live_masks(spark, tmp_path):
    loc = str(tmp_path / "t")
    S.write_zonemapped(_mk(spark, 0, 40), loc, "b", ["id", "v"])
    S.zonemap_upsert_mor(spark, loc, _mk(spark, 0, 8, v=-1),
                         key_cols=["id"])
    S.append_zonemapped(_mk(spark, 100, 110), loc, "b", ["id", "v"],
                        ingest_id=S._next_ingest_id(loc))
    r = S.zonemap_rewrite_manifests(spark, loc)
    assert r["deltas_after"] == 1
    cur, _ = S.zonemap_scan(spark, loc)
    assert cur.count() == 50
    assert cur.where("v = -1").count() == 8
    assert cur.where("id < 8 and v != -1").count() == 0
    n, _ = S.zonemap_count(spark, loc)
    assert n == 50
    # and a post-fold upsert composes with the folded masks
    S.zonemap_upsert_mor(spark, loc, _mk(spark, 4, 6, v=-3),
                         key_cols=["id"])
    cur2, _ = S.zonemap_scan(spark, loc)
    assert cur2.count() == 50
    assert cur2.where("v = -3").count() == 2
    assert cur2.where("v = -1").count() == 6


def test_compact_folds_masks_into_data(spark, tmp_path):
    loc = str(tmp_path / "t")
    S.write_zonemapped(_mk(spark, 0, 40), loc, "b", ["id", "v"])
    S.zonemap_upsert_mor(spark, loc, _mk(spark, 0, 8, v=-1),
                         key_cols=["id"])
    S.zonemap_compact(spark, loc)
    assert not os.path.isdir(f"{loc}/edeletes")
    assert not (S._read_layout_meta(loc) or {}).get("eq_deletes")
    cur, stats = S.zonemap_scan(spark, loc)
    assert cur.count() == 40 and stats["n_rows_scanned"] == 40
    assert cur.where("v = -1").count() == 8
    n, cs = S.zonemap_count(spark, loc)
    assert n == 40 and cs["n_buckets_partial"] == 0


def test_upsert_composes_with_positional_deletes(spark, tmp_path):
    loc = str(tmp_path / "t")
    S.write_zonemapped(_mk(spark, 0, 40), loc, "b", ["id", "v"])
    S.zonemap_upsert_mor(spark, loc, _mk(spark, 0, 8, v=-1),
                         key_cols=["id"])
    r = S.zonemap_delete(spark, loc, predicates=[("v", -1, -1)],
                         mode="mor")
    assert r["n_rows_deleted"] == 8  # post-mask rows only
    cur, _ = S.zonemap_scan(spark, loc)
    assert cur.count() == 32
    assert cur.where("id < 8").count() == 0
    n, _ = S.zonemap_count(spark, loc)
    assert n == 32


def test_upsert_change_feed_attribution(spark, tmp_path):
    loc = str(tmp_path / "t")
    S.write_zonemapped(_mk(spark, 0, 40), loc, "b", ["id", "v"])
    S.zonemap_upsert_mor(spark, loc,
                         _mk(spark, 0, 5, v=-1)
                         .unionByName(_mk(spark, 100, 102, v=-1)),
                         key_cols=["id"])
    ch, st = S.zonemap_changes(spark, loc, from_ingest=0)
    assert st["commit_ingests"] == [1]
    got = {r["_change_type"]: r["count"]
           for r in ch.groupBy("_change_type").count().collect()}
    # 7 inserted versions; 5 superseded old versions (keys 100/101
    # had no prior row — nothing deleted for them)
    assert got == {"insert": 7, "delete": 5}
    # reconstruction invariant across the upsert
    base, _ = S.zonemap_scan(spark, loc, max_ingest=0)
    base = base.drop("ingest")
    cols = base.columns
    ins = ch.where("_change_type='insert'").select(*cols)
    dels = ch.where("_change_type='delete'").select(*cols)
    rebuilt = base.unionByName(ins).exceptAll(dels)
    cur, _ = S.zonemap_scan(spark, loc)
    cur = cur.drop("ingest").select(*cols)
    assert rebuilt.exceptAll(cur).count() == 0
    assert cur.exceptAll(rebuilt).count() == 0


def test_upsert_refused_on_text_manifest(spark, tmp_path):
    loc = str(tmp_path / "t")
    df = _mk(spark, 0, 20)
    S.write_zonemapped(df, loc, "b", ["v"], serde="csv")
    with pytest.raises(ValueError, match="parquet/orc"):
        S.zonemap_upsert_mor(spark, loc, _mk(spark, 0, 2, v=-1),
                             key_cols=["id"])


def test_stream_upsert_exactly_once_and_latest_state(spark, tmp_path):
    """The streaming CDC upsert sink: an initial snapshot + a stream
    of key updates in several micro-batches; the layout converges to
    latest-version-per-key, a replayed batch is a no-op, and the
    recorded stream base survives so replay after 'restart' maps the
    same batch to the same ingest."""
    from reair_spark.streaming import stream_zonemap_upsert

    loc = str(tmp_path / "t")
    S.write_zonemapped(_mk(spark, 0, 100), loc, "b", ["id", "v"])

    updates = spark.range(3 * 30).select(
        (F.col("id") % 30).alias("id"),
        (F.pmod(F.col("id") % 30, F.lit(4))).cast("long").alias("b"),
        (-(F.floor(F.col("id") / 30) + 1)).cast("long").alias("v"),
        F.floor(F.col("id") / 30).alias("wave"),
    )
    src = str(tmp_path / "chunks")
    updates.repartitionByRange(3, "wave").write.parquet(src)
    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(src)
    ).drop("wave")
    stream_zonemap_upsert(
        spark, stream.select("id", "b", "v"), loc, ["id"],
        str(tmp_path / "ckpt"),
    )
    cur, _ = S.zonemap_scan(spark, loc)
    assert cur.count() == 100
    # every id < 30 carries exactly one of the three wave versions
    assert cur.where("id < 30 and v >= 0").count() == 0
    assert cur.where("id < 30").count() == 30
    assert cur.where("id >= 30 and v < 0").count() == 0

    # replay one batch under its recorded ingest id: idempotent.
    # (pin the pre-replay rows eagerly — the replay's dynamic
    # overwrite replaces ingest 1's files, so the lazy plan's paths
    # go stale; the LAYOUT is unchanged, the DataFrame isn't)
    before = sorted(map(tuple, cur.drop("ingest").collect()))
    meta = S._read_layout_meta(loc)
    base = int(meta["upsert_stream_base"])
    wave0 = updates.where("wave = 0").drop("wave")
    S.zonemap_upsert_mor(spark, loc, wave0, key_cols=["id"],
                         ingest_id=base)
    cur2, _ = S.zonemap_scan(spark, loc)
    after = sorted(map(tuple, cur2.drop("ingest").collect()))
    assert after == before


def test_vacuum_sweeps_dead_eq_masks(spark, tmp_path):
    loc = str(tmp_path / "t")
    S.write_zonemapped(_mk(spark, 0, 40), loc, "b", ["id", "v"])
    r1 = S.zonemap_upsert_mor(spark, loc, _mk(spark, 0, 8, v=-1),
                              key_cols=["id"])
    # rewrite every bucket => masks of r1 unreachable at retention 0
    cur, _ = S.zonemap_scan(spark, loc)
    S.zonemap_overwrite(spark, loc, cur.drop("ingest"))
    r2 = S.zonemap_upsert_mor(spark, loc, _mk(spark, 8, 12, v=-2),
                              key_cols=["id"])
    S.zonemap_vacuum(spark, loc, retention_ingests=0)
    assert not os.path.isdir(f"{loc}/edeletes/ingest={r1['ingest_id']}")
    assert os.path.isdir(f"{loc}/edeletes/ingest={r2['ingest_id']}")
    cur2, _ = S.zonemap_scan(spark, loc)
    assert cur2.count() == 40  # ids 8..11 are updates, not inserts
    assert cur2.where("v = -1").count() == 8   # folded in by the rewrite
    assert cur2.where("v = -2").count() == 4
    assert cur2.where("id between 8 and 11 and v != -2").count() == 0
    n, _ = S.zonemap_count(spark, loc)
    assert n == 40


def test_upsert_crash_before_delta_publish_replay_converges(
        spark, tmp_path):
    """FailingFs schedule on the upsert's manifest-delta publish: the
    batch's data dir and key files are on disk but the commit never
    lands — both are INVISIBLE (paths come from published deltas) —
    and a streaming-style replay under the SAME ingest id overwrites
    and publishes, exactly-once."""
    from reair_spark.fs import FailingFs, register_fs, unregister_fs

    board = str(tmp_path / "board")
    register_fs(FailingFs("mockeq", str(tmp_path / "remote"), board))
    try:
        loc = "mockeq://wh/layout"
        S.write_zonemapped(_mk(spark, 0, 40), loc, "b", ["id", "v"])
        FailingFs.schedule(board, "rename", "ingest=1", 1)
        upd = _mk(spark, 0, 8, v=-1)
        with pytest.raises(OSError, match="injected"):
            S.zonemap_upsert_mor(spark, loc, upd, key_cols=["id"],
                                 ingest_id=1)
        cur, _ = S.zonemap_scan(spark, loc)
        assert cur.count() == 40
        assert cur.where("v = -1").count() == 0  # commit invisible
        r = S.zonemap_upsert_mor(spark, loc, upd, key_cols=["id"],
                                 ingest_id=1)  # the replay
        assert r == {"n_rows_upserted": 8, "n_keys_masked": 8,
                     "ingest_id": 1}
        cur2, _ = S.zonemap_scan(spark, loc)
        assert cur2.count() == 40
        assert cur2.where("v = -1").count() == 8
        assert cur2.where("id < 8 and v != -1").count() == 0
    finally:
        unregister_fs("mockeq")
