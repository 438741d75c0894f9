"""Snapshot history, timestamp/tag time travel, and rollback — the
Iceberg snapshot-log / tag-reference / rollback_to_snapshot parity
layer over the zonemap layout (reference analog: the audit/time-travel
property ReplicationJob registries keep via append-only ids;
airbnb/reair has no snapshot refs — this is engine-quality surface).

Contracts pinned here:
- every commit logs a wall-clock entry (``_log/<id>.json``) exactly
  once — replays keep the FIRST timestamp;
- ``zonemap_history`` classifies append / rewrite / upsert / fold /
  delete commits from the deltas' own shape;
- ``as_of_ts`` / ``tag`` resolve to the same ingest-id cut
  ``max_ingest`` reads speak;
- tags are retention promises: vacuum clamps its horizon, fold /
  compact / recluster refuse, rollback refuses to drop a tagged
  commit;
- rollback removes commits above the cut in descending order
  (crash-safe), resurrects MOR-deleted rows, and later appends land
  above the cut as ordinary commits.
"""
from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from reair_spark.sources import (
    append_zonemapped,
    write_zonemapped,
    zonemap_compact,
    zonemap_count,
    zonemap_delete,
    zonemap_drop_tag,
    zonemap_history,
    zonemap_recluster,
    zonemap_resolve_snapshot,
    zonemap_rewrite_manifests,
    zonemap_rollback,
    zonemap_scan,
    zonemap_tag,
    zonemap_upsert_mor,
    zonemap_vacuum,
)


def _seed(spark, tmp_path, n=60, buckets=6):
    loc = str(tmp_path / "layout")
    df = spark.range(0, n).select(
        F.col("id").alias("k"),
        (F.col("id") % buckets).alias("b"),
        (F.col("id") * 7 % 40).alias("v"),
    )
    write_zonemapped(df, loc, "b", stat_cols=["v"])
    return loc, df


def _rows(spark, loc, **kw):
    cur, _ = zonemap_scan(spark, loc, **kw)
    return {(r.k, r.v) for r in cur.select("k", "v").collect()}


def test_history_classifies_operations(spark, tmp_path):
    loc, df = _seed(spark, tmp_path)
    append_zonemapped(
        df.withColumn("k", F.col("k") + 100), loc, "b", ["v"],
        ingest_id=1,
    )
    zonemap_delete(spark, loc, predicates=[("v", 0, 5)], mode="mor")
    up = spark.createDataFrame([(1, 1, 999)], "k long, b long, v long")
    zonemap_upsert_mor(spark, loc, up, key_cols=["k"])
    zonemap_delete(spark, loc, predicates=[("v", 35, 39)], mode="cow")
    hist = {r["ingest"]: r.asDict()
            for r in zonemap_history(spark, loc).collect()}
    assert hist[0]["operation"] == "append"
    assert hist[1]["operation"] == "append"
    assert hist[2]["operation"] == "delete"
    assert hist[3]["operation"] == "upsert"
    assert hist[4]["operation"] == "rewrite"
    assert all(r["committed_at"] is not None for r in hist.values())
    assert not any(r["expired"] for r in hist.values())
    # commit times are monotone in ingest order
    ts = [hist[i]["committed_at"] for i in sorted(hist)]
    assert ts == sorted(ts)
    # the MOR delete row counts the deleted positions: both appended
    # generations matched the v-range
    n_match = df.where(F.col("v").between(0, 5)).count()
    assert hist[2]["n_rows"] == 2 * n_match
    assert hist[0]["n_rows"] == 60 and hist[1]["n_rows"] == 60


def test_fold_history_and_original_timestamp(spark, tmp_path):
    loc, df = _seed(spark, tmp_path)
    append_zonemapped(
        df.withColumn("k", F.col("k") + 100), loc, "b", ["v"],
        ingest_id=1,
    )
    before = {r["ingest"]: r["committed_at"]
              for r in zonemap_history(spark, loc).collect()}
    st = zonemap_rewrite_manifests(spark, loc)
    assert st["fold_ingest"] == 1
    hist = {r["ingest"]: r.asDict()
            for r in zonemap_history(spark, loc).collect()}
    # folded delta republishes AT max(folded ids): first-writer-wins
    # keeps that id's original commit time
    assert hist[1]["operation"] == "fold"
    assert hist[1]["committed_at"] == before[1]
    assert hist[1]["n_rows"] == 120
    # ingest 0's delta was folded away: listable as nothing (no delta
    # remains), so only the fold row survives
    assert sorted(hist) == [1]


def test_replay_keeps_first_timestamp(spark, tmp_path):
    loc, df = _seed(spark, tmp_path)
    t0 = {r["ingest"]: r["committed_at"]
          for r in zonemap_history(spark, loc).collect()}[0]
    time.sleep(0.05)
    # exact replay of ingest 0 (crash-recovery path): delta dirs are
    # overwritten, the commit-log entry is NOT redated
    append_zonemapped(df, loc, "b", ["v"], ingest_id=0)
    t0b = {r["ingest"]: r["committed_at"]
           for r in zonemap_history(spark, loc).collect()}[0]
    assert t0b == t0


def test_as_of_ts_resolves_each_commit(spark, tmp_path):
    loc, df = _seed(spark, tmp_path)
    cuts = [int(time.time() * 1000)]
    for g in (1, 2):
        time.sleep(0.03)
        append_zonemapped(
            df.withColumn("k", F.col("k") + 1000 * g), loc, "b",
            ["v"], ingest_id=g,
        )
        cuts.append(int(time.time() * 1000))
    for i, ts in enumerate(cuts):
        assert zonemap_resolve_snapshot(loc, ts=ts) == i
        assert _rows(spark, loc, as_of_ts=ts) \
            == _rows(spark, loc, max_ingest=i)
    # datetime input works too
    import datetime as dt

    when = dt.datetime.fromtimestamp(cuts[1] / 1000)
    assert zonemap_resolve_snapshot(loc, ts=when) == 1
    # before the first commit: no snapshot
    with pytest.raises(ValueError, match="no committed snapshot"):
        zonemap_resolve_snapshot(loc, ts=cuts[0] - 10_000)
    # at most one of the three as-of forms
    with pytest.raises(ValueError, match="at most one"):
        zonemap_scan(spark, loc, max_ingest=0, as_of_ts=cuts[0])


def test_tags_roundtrip_and_guards(spark, tmp_path):
    loc, df = _seed(spark, tmp_path)
    assert zonemap_tag(loc, "seed") == 0
    append_zonemapped(
        df.withColumn("k", F.col("k") + 100), loc, "b", ["v"],
        ingest_id=1,
    )
    assert zonemap_tag(loc, "v2") == 1
    assert _rows(spark, loc, tag="seed") == _rows(spark, loc,
                                                  max_ingest=0)
    assert zonemap_count(spark, loc, tag="seed")[0] == 60
    with pytest.raises(ValueError, match="no tag"):
        zonemap_scan(spark, loc, tag="nope")
    with pytest.raises(ValueError, match="cannot tag ingest 9"):
        zonemap_tag(loc, "future", ingest=9)
    # compact / recluster / fold refuse while tags would expire
    with pytest.raises(ValueError, match="strand tags"):
        zonemap_compact(spark, loc)
    with pytest.raises(ValueError, match="strand tags"):
        zonemap_recluster(spark, loc, "b2", ["v"],
                          bucket_expr="pmod(k, 4)")
    with pytest.raises(ValueError, match="expire tagged"):
        zonemap_rewrite_manifests(spark, loc)
    # fold at the newest id is fine once only the newest tag remains
    zonemap_drop_tag(loc, "seed")
    zonemap_drop_tag(loc, "seed")  # idempotent
    st = zonemap_rewrite_manifests(spark, loc)
    assert st["fold_ingest"] == 1
    assert _rows(spark, loc, tag="v2") == _rows(spark, loc)
    # everything dropped: compact proceeds
    zonemap_drop_tag(loc, "v2")
    zonemap_compact(spark, loc)


def test_vacuum_clamps_horizon_below_tags(spark, tmp_path):
    loc, df = _seed(spark, tmp_path)
    zonemap_tag(loc, "seed")
    # two full-bucket rewrites supersede the seed's dirs twice over
    for g in (1, 2):
        from reair_spark.sources import zonemap_overwrite

        zonemap_overwrite(
            spark, loc,
            df.withColumn("v", F.col("v") + g),
        )
    seed_rows = _rows(spark, loc, tag="seed")
    st = zonemap_vacuum(spark, loc, retention_ingests=0)
    # horizon clamped to the tag: the tagged snapshot's dirs survive
    assert st["vacuumed_through"] <= 0
    assert _rows(spark, loc, tag="seed") == seed_rows
    # drop the tag: the next vacuum may expire it
    zonemap_drop_tag(loc, "seed")
    zonemap_vacuum(spark, loc, retention_ingests=0)
    with pytest.raises(ValueError, match="expired"):
        zonemap_scan(spark, loc, max_ingest=0)


def test_rollback_restores_and_resurrects(spark, tmp_path):
    loc, df = _seed(spark, tmp_path)
    base = _rows(spark, loc)
    append_zonemapped(
        df.withColumn("k", F.col("k") + 100), loc, "b", ["v"],
        ingest_id=1,
    )
    after_append = _rows(spark, loc)
    zonemap_delete(spark, loc, predicates=[("v", 0, 10)], mode="mor")
    up = spark.createDataFrame([(2, 2, 777)], "k long, b long, v long")
    zonemap_upsert_mor(spark, loc, up, key_cols=["k"])
    assert _rows(spark, loc) != after_append
    st = zonemap_rollback(spark, loc, 1)
    assert st["n_commits_removed"] == 2
    assert st["removed_ingests"] == [2, 3]
    # MOR delete + upsert undone: deleted rows resurrect, new version
    # gone; count agrees (no stale DV/mask accounting)
    assert _rows(spark, loc) == after_append
    assert zonemap_count(spark, loc)[0] == len(after_append)
    # idempotent re-run
    assert zonemap_rollback(spark, loc, 1)["n_commits_removed"] == 0
    # removed commits no longer resolve by timestamp
    newest = max(
        r["ingest"] for r in zonemap_history(spark, loc).collect()
    )
    assert newest == 1
    assert zonemap_resolve_snapshot(
        loc, ts=int(time.time() * 1000) + 1000
    ) == 1
    # deeper rollback to the seed
    zonemap_rollback(spark, loc, 0)
    assert _rows(spark, loc) == base
    # later appends land above the cut as ordinary commits
    append_zonemapped(
        df.withColumn("k", F.col("k") + 500), loc, "b", ["v"],
        ingest_id=1,
    )
    assert len(_rows(spark, loc)) == 120


def test_rollback_guards(spark, tmp_path):
    loc, df = _seed(spark, tmp_path)
    append_zonemapped(
        df.withColumn("k", F.col("k") + 100), loc, "b", ["v"],
        ingest_id=1,
    )
    zonemap_tag(loc, "v2", ingest=1)
    with pytest.raises(ValueError, match="tags point above"):
        zonemap_rollback(spark, loc, 0)
    zonemap_drop_tag(loc, "v2")
    with pytest.raises(ValueError, match="oldest committed"):
        zonemap_rollback(spark, loc, -1)
    zonemap_rewrite_manifests(spark, loc)
    with pytest.raises(ValueError, match="expired"):
        zonemap_rollback(spark, loc, 0)


def test_rollback_crash_midwalk_converges(spark, tmp_path):
    """A crash between per-id removals leaves a VALID intermediate
    snapshot (descending order); re-running converges to the cut."""
    from reair_spark.fs import fs_for

    loc, df = _seed(spark, tmp_path)
    for g in (1, 2, 3):
        append_zonemapped(
            df.withColumn("k", F.col("k") + 100 * g), loc, "b", ["v"],
            ingest_id=g,
        )
    # simulate the crash by hand: remove ONLY ingest 3 (what a walk
    # that died after its first id leaves behind)
    fs = fs_for(loc)
    from reair_spark.fs import fs_rmtree

    fs_rmtree(fs, f"{loc}/manifest/ingest=3")
    fs_rmtree(fs, f"{loc}/data/ingest=3")
    fs.unlink(f"{loc}/_log/3.json")
    # intermediate state is snapshot 2 — readable and consistent
    assert len(_rows(spark, loc)) == 180
    st = zonemap_rollback(spark, loc, 1)
    assert st["removed_ingests"] == [2]
    assert len(_rows(spark, loc)) == 120


def test_history_expired_flag_after_fold(spark, tmp_path):
    loc, df = _seed(spark, tmp_path)
    zonemap_delete(spark, loc, predicates=[("v", 0, 3)], mode="mor")
    append_zonemapped(
        df.withColumn("k", F.col("k") + 100), loc, "b", ["v"],
        ingest_id=2,
    )
    zonemap_rewrite_manifests(spark, loc)
    hist = {r["ingest"]: r.asDict()
            for r in zonemap_history(spark, loc).collect()}
    # the dmanifest delta (ingest 1) survives the metadata fold and
    # now sits below the fold horizon: listable, marked expired
    assert hist[1]["operation"] == "delete"
    assert hist[1]["expired"] is True
    assert hist[2]["expired"] is False
