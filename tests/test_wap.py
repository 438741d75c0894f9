"""Write-audit-publish (staged commits) — the Iceberg WAP / branch-
commit shape on the zonemap layout: an ingest lands fully but stays
invisible until a metadata-only descriptor CAS publishes it.

Contracts pinned here:
- a staged commit is invisible to scan / count / change feed / fold,
  while the audit read (zonemap_scan_staged) sees exactly its rows;
- publish is one descriptor flip — afterwards every reader sees the
  rows, and replays/folds treat the commit as ordinary;
- abort removes the commit's residue and is idempotent; the crash
  window (descriptor record without delta) stays invisible and is
  abort-recoverable;
- fold refuses while a staged id sits below the fold cut (the folded
  replaces=true delta would supersede it on publish); compact and
  recluster refuse outright; vacuum neither advances its horizon on
  staged ids nor sweeps staged dirs; rollback prunes staged records
  above the cut.
"""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from reair_spark.sources import (
    _read_layout_meta,
    append_zonemapped,
    write_zonemapped,
    zonemap_abort_staged,
    zonemap_changes,
    zonemap_compact,
    zonemap_count,
    zonemap_history,
    zonemap_publish_staged,
    zonemap_rewrite_manifests,
    zonemap_rollback,
    zonemap_scan,
    zonemap_scan_staged,
    zonemap_vacuum,
)


def _seed(spark, tmp_path, n=40, buckets=4):
    loc = str(tmp_path / "layout")
    df = spark.range(0, n).select(
        F.col("id").alias("k"),
        (F.col("id") % buckets).alias("b"),
        (F.col("id") % 11).alias("v"),
    )
    write_zonemapped(df, loc, "b", stat_cols=["v"])
    return loc, df


def _keys(spark, loc, **kw):
    cur, _ = zonemap_scan(spark, loc, **kw)
    return {r.k for r in cur.select("k").collect()}


def test_staged_invisible_until_published(spark, tmp_path):
    loc, df = _seed(spark, tmp_path)
    append_zonemapped(df.withColumn("k", F.col("k") + 100), loc, "b",
                      ["v"], ingest_id=1, staged=True)
    assert _keys(spark, loc) == set(range(40))
    assert zonemap_count(spark, loc)[0] == 40
    ch, st = zonemap_changes(spark, loc, 0)
    assert ch.count() == 0 and st["n_commits"] == 0
    # the audit read sees exactly the staged rows
    audit = zonemap_scan_staged(spark, loc, 1)
    assert {r.k for r in audit.select("k").collect()} \
        == {k + 100 for k in range(40)}
    hist = {r["ingest"]: r.asDict()
            for r in zonemap_history(spark, loc).collect()}
    assert hist[1]["staged"] is True and hist[0]["staged"] is False
    new_id = zonemap_publish_staged(loc, 1)
    assert new_id > 1  # cherry-picked to a fresh head id
    assert _keys(spark, loc) == set(range(40)) | {
        k + 100 for k in range(40)
    }
    assert zonemap_count(spark, loc)[0] == 80
    # the change feed now reports the published commit's inserts
    ch, st = zonemap_changes(spark, loc, 0)
    assert ch.count() == 40 and st["n_commits"] == 1
    assert st["commit_ingests"] == [new_id]
    # audit read refuses once live
    with pytest.raises(ValueError, match="not staged"):
        zonemap_scan_staged(spark, loc, 1)
    with pytest.raises(ValueError, match="not staged"):
        zonemap_publish_staged(loc, 1)


def test_abort_removes_residue_idempotently(spark, tmp_path):
    from reair_spark.fs import fs_for

    loc, df = _seed(spark, tmp_path)
    append_zonemapped(df.withColumn("k", F.col("k") + 100), loc, "b",
                      ["v"], ingest_id=1, staged=True)
    zonemap_abort_staged(loc, 1)
    zonemap_abort_staged(loc, 1)
    fs = fs_for(loc)
    assert not fs.isdir(f"{loc}/manifest/ingest=1")
    assert not fs.isdir(f"{loc}/data/ingest=1")
    assert _read_layout_meta(loc).get("staged_ingests") == []
    assert _keys(spark, loc) == set(range(40))
    # the freed id is mintable again
    append_zonemapped(df.withColumn("k", F.col("k") + 500), loc, "b",
                      ["v"], ingest_id=1)
    assert len(_keys(spark, loc)) == 80


def test_staged_crash_window_stays_invisible(spark, tmp_path):
    """The descriptor records the id BEFORE the delta lands: simulate
    the crash between the two (record, no delta) — readers are
    unaffected, publish refuses, abort sweeps."""
    from reair_spark.sources import _meta_cas_update

    loc, df = _seed(spark, tmp_path)
    _meta_cas_update(loc, lambda m: dict(m or {}, staged_ingests=[7]))
    assert _keys(spark, loc) == set(range(40))
    with pytest.raises(ValueError, match="no delta"):
        zonemap_publish_staged(loc, 7)
    zonemap_abort_staged(loc, 7)
    assert _read_layout_meta(loc).get("staged_ingests") == []


def test_maintenance_guards_and_vacuum(spark, tmp_path):
    loc, df = _seed(spark, tmp_path)
    append_zonemapped(df.withColumn("k", F.col("k") + 100), loc, "b",
                      ["v"], ingest_id=1)
    append_zonemapped(df.withColumn("k", F.col("k") + 200), loc, "b",
                      ["v"], ingest_id=2, staged=True)
    # compact refuses outright; fold at the head (fold_id=1 < staged
    # 2) proceeds and leaves the staged delta alone
    with pytest.raises(ValueError, match="staged"):
        zonemap_compact(spark, loc)
    st = zonemap_rewrite_manifests(spark, loc)
    assert st["fold_ingest"] == 1
    assert _keys(spark, loc) == set(range(40)) | {
        k + 100 for k in range(40)
    }
    # vacuum: horizon never advances onto the staged id, staged dirs
    # survive
    out = zonemap_vacuum(spark, loc, retention_ingests=0)
    assert out["vacuumed_through"] <= 1
    from reair_spark.fs import fs_for

    assert fs_for(loc).isdir(f"{loc}/data/ingest=2")
    zonemap_publish_staged(loc, 2)
    assert len(_keys(spark, loc)) == 120


def test_fold_then_publish_cherry_picks_above(spark, tmp_path):
    """A staged commit below the fold cut is NOT lost: publish is a
    cherry-pick that re-ids the commit to a freshly claimed id above
    the folded replaces=true delta, so visibility order stays id
    order and the folded base can never supersede it."""
    loc, df = _seed(spark, tmp_path)
    append_zonemapped(df.withColumn("k", F.col("k") + 100), loc, "b",
                      ["v"], ingest_id=1, staged=True)
    append_zonemapped(df.withColumn("k", F.col("k") + 200), loc, "b",
                      ["v"], ingest_id=2)
    st = zonemap_rewrite_manifests(spark, loc)
    assert st["fold_ingest"] == 2  # staged id 1 neither absorbed...
    from reair_spark.fs import fs_for

    assert fs_for(loc).isdir(f"{loc}/manifest/ingest=1")  # ...nor swept
    assert len(_keys(spark, loc)) == 80
    new_id = zonemap_publish_staged(loc, 1)
    assert new_id > 2
    assert not fs_for(loc).isdir(f"{loc}/manifest/ingest=1")
    assert len(_keys(spark, loc)) == 120
    hist = {r["ingest"]: r.asDict()
            for r in zonemap_history(spark, loc).collect()}
    assert hist[new_id]["operation"] == "append"
    assert hist[new_id]["committed_at"] is not None
    # re-publishing / auditing the old id refuses
    with pytest.raises(ValueError, match="not staged"):
        zonemap_publish_staged(loc, 1)


def test_abort_crash_midwalk_converges(spark, tmp_path):
    """Abort removes delta → data → log/claim → descriptor record, in
    that order: simulate the crash after the FIRST step (delta gone,
    everything else in place) — the commit stays invisible (the
    descriptor still lists it as staged), publish refuses loudly, and
    re-running the abort sweeps the rest."""
    from reair_spark.fs import fs_for, fs_rmtree

    loc, df = _seed(spark, tmp_path)
    append_zonemapped(df.withColumn("k", F.col("k") + 100), loc, "b",
                      ["v"], ingest_id=1, staged=True)
    fs = fs_for(loc)
    fs_rmtree(fs, f"{loc}/manifest/ingest=1")
    assert _keys(spark, loc) == set(range(40))
    assert _read_layout_meta(loc).get("staged_ingests") == [1]
    with pytest.raises(ValueError, match="no delta"):
        zonemap_publish_staged(loc, 1)
    zonemap_abort_staged(loc, 1)
    assert not fs.isdir(f"{loc}/data/ingest=1")
    assert _read_layout_meta(loc).get("staged_ingests") == []
    assert _keys(spark, loc) == set(range(40))


def test_publish_crash_resumes_at_recorded_id(spark, tmp_path):
    """Publish records the (old -> new) mapping BEFORE any rename and
    moves data before manifest: simulate the crash between the two
    renames — the commit is still invisible (old id staged-filtered,
    new id has no delta) — then re-calling publish converges at the
    RECORDED id, and an abort from the same state sweeps both ids."""
    from reair_spark.fs import fs_for
    from reair_spark.sources import _claim_ingest_id, _meta_cas_update

    loc, df = _seed(spark, tmp_path)
    append_zonemapped(df.withColumn("k", F.col("k") + 100), loc, "b",
                      ["v"], ingest_id=1, staged=True)
    fs = fs_for(loc)
    nid = _claim_ingest_id(loc)
    _meta_cas_update(
        loc, lambda m: dict(m or {}, staged_publishing={"1": nid})
    )
    fs.rename(f"{loc}/data/ingest=1", f"{loc}/data/ingest={nid}")
    assert _keys(spark, loc) == set(range(40))  # still invisible
    got = zonemap_publish_staged(loc, 1)
    assert got == nid
    assert len(_keys(spark, loc)) == 80
    assert _read_layout_meta(loc).get("staged_publishing") == {}

    # same window, resolved by ABORT instead
    append_zonemapped(df.withColumn("k", F.col("k") + 500), loc, "b",
                      ["v"], ingest_id=nid + 1, staged=True)
    nid2 = _claim_ingest_id(loc)
    _meta_cas_update(
        loc,
        lambda m: dict(m or {},
                       staged_publishing={str(nid + 1): nid2}),
    )
    fs.rename(f"{loc}/data/ingest={nid + 1}",
              f"{loc}/data/ingest={nid2}")
    zonemap_abort_staged(loc, nid + 1)
    assert not fs.isdir(f"{loc}/data/ingest={nid2}")
    assert not fs.isdir(f"{loc}/manifest/ingest={nid + 1}")
    assert _read_layout_meta(loc).get("staged_ingests") == []
    assert len(_keys(spark, loc)) == 80


def test_rollback_prunes_staged_records(spark, tmp_path):
    loc, df = _seed(spark, tmp_path)
    append_zonemapped(df.withColumn("k", F.col("k") + 100), loc, "b",
                      ["v"], ingest_id=1)
    append_zonemapped(df.withColumn("k", F.col("k") + 200), loc, "b",
                      ["v"], ingest_id=2, staged=True)
    st = zonemap_rollback(spark, loc, 0)
    assert st["removed_ingests"] == [1, 2]
    assert _read_layout_meta(loc).get("staged_ingests") == []
    assert _keys(spark, loc) == set(range(40))
