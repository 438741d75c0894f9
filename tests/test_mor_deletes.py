"""Merge-on-read positional deletes (the Iceberg v2 position-delete /
Delta deletion-vector shape): ``zonemap_delete(mode="mor")`` writes the
matching rows' (file, row-position) addresses instead of rewriting the
touched buckets — write cost scales with ROWS DELETED, not bucket
bytes — and every read path (scan, COUNT pushdown, stats, merge's
pre-read, compaction's fold-in) nets the live delete files out.

Reference parity note: the reference has no row-level deletes at all
(it replicates whole partitions/files); this is an engine-quality
feature graded against the 100 TB north star, mirroring Iceberg
``format-version=2`` position deletes."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

import reair_spark.sources as S


def _layout(spark, loc, rows=400, buckets=8, serde="parquet", **kw):
    df = spark.range(rows).select(
        F.col("id"),
        F.pmod("id", F.lit(buckets)).cast("long").alias("b"),
        (F.col("id") * 2).alias("v"),
    )
    S.write_zonemapped(df, loc, "b", ["id", "v"], serde=serde, **kw)
    return df


# ---------------------------------------------------------------------
# core semantics
# ---------------------------------------------------------------------

def test_mor_delete_scan_count_stats_agree(spark, tmp_path):
    loc = str(tmp_path / "t")
    _layout(spark, loc)
    res = S.zonemap_delete(spark, loc, predicates=[("v", 100, 199)],
                           mode="mor")
    # v in [100,199] <=> id in [50,99]: 50 rows, no data rewritten
    assert res["n_rows_deleted"] == 50
    assert res["ingest_id"] is not None
    assert os.path.isdir(f"{loc}/deletes")
    assert os.path.isdir(f"{loc}/dmanifest")
    # exactly one data ingest dir remains — nothing was rewritten
    assert sorted(os.listdir(f"{loc}/data")) == ["ingest=0"]

    df, stats = S.zonemap_scan(spark, loc)
    assert df.count() == 350
    assert stats["n_rows_scanned"] == 350  # net of deletes
    assert df.where("v >= 100 and v <= 199").count() == 0

    # pure metadata count: zero buckets scanned, net answer
    n, cs = S.zonemap_count(spark, loc)
    assert (n, cs["n_buckets_partial"]) == (350, 0)
    # predicate count crossing the deleted range: residual-exact
    n2, _ = S.zonemap_count(spark, loc, predicates=[("v", 0, 299)])
    assert n2 == 100  # ids 0..149 minus deleted 50..99

    st = {r["column"]: r for r in S.zonemap_stats(spark, loc).collect()}
    assert int(st["v"]["n_rows"]) == 350


def test_mor_delete_prunes_before_writing(spark, tmp_path):
    """The DV write is bucket-pruned like any scan: a delete whose
    predicate zones to one bucket reads/addresses only that bucket."""
    loc = str(tmp_path / "t")
    df = spark.range(400).select(
        F.col("id"), (F.col("id") / F.lit(100)).cast("long").alias("b"),
        (F.col("id") * 2).alias("v"),
    )
    S.write_zonemapped(df, loc, "b", ["id", "v"])
    res = S.zonemap_delete(spark, loc, predicates=[("id", 110, 119)],
                           mode="mor")
    assert res == {"n_buckets_affected": 1, "n_rows_deleted": 10,
                   "ingest_id": res["ingest_id"]}
    dv_root = f"{loc}/deletes/ingest={res['ingest_id']}"
    assert sorted(os.listdir(dv_root)) == ["b=1"]
    n, cs = S.zonemap_count(spark, loc)
    assert n == 390
    # untouched buckets still metadata-count; only zone-overlap rules
    # decide full vs partial, deletes never demote a covered bucket
    assert cs["n_buckets_full"] == 4


def test_mor_null_rows_survive(spark, tmp_path):
    loc = str(tmp_path / "t")
    df = spark.range(20).select(
        F.col("id"), (F.col("id") % 2).alias("b"),
        F.when(F.col("id") < 5, None).otherwise(F.col("id")).alias("v"),
    )
    S.write_zonemapped(df, loc, "b", ["v"])
    res = S.zonemap_delete(spark, loc, predicates=[("v", 0, 100)],
                           mode="mor")
    # NULL never satisfies the predicate: ids 0..4 survive
    assert res["n_rows_deleted"] == 15
    df2, _ = S.zonemap_scan(spark, loc)
    assert df2.count() == 5
    assert df2.where(F.col("v").isNull()).count() == 5


def test_mor_point_predicate_via_bloom(spark, tmp_path):
    loc = str(tmp_path / "t")
    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 4).alias("b"),
        F.concat(F.lit("k"), F.col("id")).alias("name"),
    )
    S.write_zonemapped(df, loc, "b", ["id"], bloom_cols=["name"])
    res = S.zonemap_delete(
        spark, loc, point_predicates=[("name", "k42")], mode="mor")
    assert res["n_rows_deleted"] == 1
    df2, _ = S.zonemap_scan(spark, loc)
    assert df2.count() == 99
    assert df2.where("name = 'k42'").count() == 0


def test_mor_overlapping_deletes_never_double_count(spark, tmp_path):
    loc = str(tmp_path / "t")
    _layout(spark, loc)
    S.zonemap_delete(spark, loc, predicates=[("v", 100, 199)], mode="mor")
    res2 = S.zonemap_delete(spark, loc, predicates=[("v", 150, 399)],
                            mode="mor")
    # second delete's range overlaps rows already deleted: only the
    # still-live matches are addressed (ids 100..199)
    assert res2["n_rows_deleted"] == 100
    n, _ = S.zonemap_count(spark, loc)
    assert n == 250
    df, stats = S.zonemap_scan(spark, loc)
    assert df.count() == 250 and stats["n_rows_scanned"] == 250


def test_mor_delete_emptying_buckets_drops_them_from_plans(
        spark, tmp_path):
    loc = str(tmp_path / "t")
    df = spark.range(40).select(
        F.col("id"), (F.col("id") / F.lit(10)).cast("long").alias("b"),
        F.col("id").alias("v"),
    )
    S.write_zonemapped(df, loc, "b", ["v"])
    res = S.zonemap_delete(spark, loc, predicates=[("v", 10, 19)],
                           mode="mor")
    assert res["n_rows_deleted"] == 10
    _, kept, stats = S.zonemap_plan(spark, loc)
    assert stats["n_buckets_read"] == 3  # the emptied bucket is gone
    df2, _ = S.zonemap_scan(spark, loc)
    assert df2.count() == 30


def test_mor_nothing_matched_is_a_noop(spark, tmp_path):
    loc = str(tmp_path / "t")
    _layout(spark, loc, rows=40)
    res = S.zonemap_delete(spark, loc, predicates=[("v", 10_000, 20_000)],
                           mode="mor")
    assert res == {"n_buckets_affected": 0, "n_rows_deleted": 0,
                   "ingest_id": None}
    assert not os.path.isdir(f"{loc}/dmanifest")
    meta = S._read_layout_meta(loc)
    assert not meta.get("mor_deletes")


def test_mor_refused_on_orc_layout(spark, tmp_path):
    loc = str(tmp_path / "t")
    _layout(spark, loc, rows=40, serde="orc")
    with pytest.raises(ValueError, match="parquet"):
        S.zonemap_delete(spark, loc, predicates=[("v", 0, 10)],
                         mode="mor")
    # cow still works on orc
    res = S.zonemap_delete(spark, loc, predicates=[("v", 0, 9)],
                           mode="cow")
    assert res["n_rows_deleted"] == 5


# ---------------------------------------------------------------------
# time travel + history
# ---------------------------------------------------------------------

def test_mor_as_of_reads_skip_later_deletes(spark, tmp_path):
    loc = str(tmp_path / "t")
    _layout(spark, loc, rows=100)
    S.append_zonemapped(
        spark.range(100, 200).select(
            F.col("id"), F.pmod("id", F.lit(8)).cast("long").alias("b"),
            (F.col("id") * 2).alias("v")),
        loc, "b", ["id", "v"], ingest_id=1)
    S.zonemap_delete(spark, loc, predicates=[("v", 0, 99)], mode="mor")
    old, ostats = S.zonemap_scan(spark, loc, max_ingest=1)
    assert old.count() == 200 and ostats["n_rows_scanned"] == 200
    pre, pstats = S.zonemap_scan(spark, loc, max_ingest=0)
    assert pre.count() == 100 and pstats["n_rows_scanned"] == 100
    cur, cstats = S.zonemap_scan(spark, loc)
    assert cur.count() == 150 and cstats["n_rows_scanned"] == 150
    n_old, _ = S.zonemap_count(spark, loc, max_ingest=1)
    assert n_old == 200


def test_cow_rewrite_kills_superseded_dvs(spark, tmp_path):
    """A copy-on-write rewrite of a bucket reads post-DV rows and its
    replacing delta drops the old data dirs from the view — the DVs
    targeting them must die with them (no double subtraction)."""
    loc = str(tmp_path / "t")
    _layout(spark, loc, rows=160, buckets=4)
    S.zonemap_delete(spark, loc, predicates=[("v", 0, 79)], mode="mor")
    # merge touches every bucket => rewrites all, folding DVs in
    upd = spark.range(4).select(
        F.col("id"), F.col("id").alias("b"),
        F.lit(-5).cast("long").alias("v"))
    S.zonemap_merge(spark, loc, upd, key_cols=["id"])
    df, stats = S.zonemap_scan(spark, loc)
    # 160 - 40 deleted (ids 0..39); ids 0..3 were deleted then
    # re-inserted by the merge
    assert df.count() == 124 and stats["n_rows_scanned"] == 124
    n, cs = S.zonemap_count(spark, loc)
    assert n == 124
    assert df.where("v = -5").count() == 4
    # deleted, non-merged rows stay dead
    assert df.where("v >= 0 and v <= 79").count() == 0


def test_fold_preserves_dv_accounting(spark, tmp_path):
    loc = str(tmp_path / "t")
    _layout(spark, loc, rows=100)
    for i in (1, 2):
        S.append_zonemapped(
            spark.range(100 * i, 100 * (i + 1)).select(
                F.col("id"),
                F.pmod("id", F.lit(8)).cast("long").alias("b"),
                (F.col("id") * 2).alias("v")),
            loc, "b", ["id", "v"], ingest_id=i)
    S.zonemap_delete(spark, loc, predicates=[("v", 100, 299)],
                     mode="mor")  # ids 50..149: 100 rows
    before, bs = S.zonemap_scan(spark, loc)
    b_rows = before.count()
    assert b_rows == 200 and bs["n_rows_scanned"] == 200
    r = S.zonemap_rewrite_manifests(spark, loc)
    assert r["deltas_after"] == 1
    after, as_ = S.zonemap_scan(spark, loc)
    assert after.count() == 200 and as_["n_rows_scanned"] == 200
    n, _ = S.zonemap_count(spark, loc)
    assert n == 200
    # the DV trees survived the metadata-only fold
    assert os.path.isdir(f"{loc}/deletes")


def test_compact_folds_dvs_into_data_and_drops_them(spark, tmp_path):
    loc = str(tmp_path / "t")
    _layout(spark, loc, rows=200)
    S.zonemap_delete(spark, loc, predicates=[("v", 100, 199)],
                     mode="mor")
    S.zonemap_compact(spark, loc)
    assert not os.path.isdir(f"{loc}/deletes")
    assert not os.path.isdir(f"{loc}/dmanifest")
    meta = S._read_layout_meta(loc)
    assert not meta.get("mor_deletes")
    df, stats = S.zonemap_scan(spark, loc)
    assert df.count() == 150 and stats["n_rows_scanned"] == 150
    # a fresh MOR delete on the compacted generation works
    res = S.zonemap_delete(spark, loc, predicates=[("v", 0, 19)],
                           mode="mor")
    assert res["n_rows_deleted"] == 10
    n, _ = S.zonemap_count(spark, loc)
    assert n == 140


# ---------------------------------------------------------------------
# concurrency + crash windows
# ---------------------------------------------------------------------

def test_interleaved_mor_delete_recomputes_on_append(
        spark, tmp_path, monkeypatch):
    """An append lands mid-plan: the MOR delete recomputes so the
    appended rows are judged by the predicate too."""
    loc = str(tmp_path / "t")
    _layout(spark, loc, rows=40, buckets=4)
    state = {"fired": False}
    real_claim = S._claim_ingest_id

    def claim_with_concurrent_append(location):
        if not state["fired"]:
            state["fired"] = True
            bid = real_claim(location)
            S.append_zonemapped(
                spark.range(1000, 1002).select(
                    F.col("id"),
                    F.lit(1).cast("long").alias("b"),
                    F.lit(10).cast("long").alias("v"),  # matches
                ),
                loc, "b", ["id", "v"], ingest_id=bid)
        return real_claim(location)

    monkeypatch.setattr(S, "_claim_ingest_id",
                        claim_with_concurrent_append)
    res = S.zonemap_delete(spark, loc, predicates=[("v", 10, 10)],
                           mode="mor")
    monkeypatch.setattr(S, "_claim_ingest_id", real_claim)
    # original id=5 (v=10) + the two appended rows
    assert res["n_rows_deleted"] == 3
    df, _ = S.zonemap_scan(spark, loc)
    assert df.where("v = 10").count() == 0
    assert df.count() == 39


def test_interleaved_merge_recomputes_on_mor_delete(
        spark, tmp_path, monkeypatch):
    """The reverse race (the reason _commit_snapshot covers BOTH delta
    trees): a MOR delete lands between a merge's read and its publish;
    without dmanifest in the validation snapshot the merge's rewrite
    would silently resurrect the deleted rows."""
    loc = str(tmp_path / "t")
    _layout(spark, loc, rows=40, buckets=4)
    state = {"fired": False}
    real_claim = S._claim_ingest_id

    def claim_with_concurrent_mor(location):
        if not state["fired"]:
            state["fired"] = True
            S.zonemap_delete(spark, location,
                             predicates=[("v", 20, 29)], mode="mor")
        return real_claim(location)

    monkeypatch.setattr(S, "_claim_ingest_id", claim_with_concurrent_mor)
    upd = spark.range(1).select(
        F.col("id"), F.lit(0).cast("long").alias("b"),
        F.lit(-1).cast("long").alias("v"))
    S.zonemap_merge(spark, loc, upd, key_cols=["id"])
    monkeypatch.setattr(S, "_claim_ingest_id", real_claim)
    df, _ = S.zonemap_scan(spark, loc)
    # 40 - 5 deleted (v in 20..29 <=> ids 10..14); id=0 updated
    assert df.count() == 35
    assert df.where("v >= 20 and v <= 29").count() == 0
    assert df.where("v = -1").count() == 1


def test_recovery_restores_parked_dmanifest_delta(spark, tmp_path):
    loc = str(tmp_path / "t")
    _layout(spark, loc, rows=40, buckets=4)
    res = S.zonemap_delete(spark, loc, predicates=[("v", 0, 19)],
                           mode="mor")
    dvid = res["ingest_id"]
    # simulate a crash mid-republish: delta parked, canonical missing
    os.makedirs(f"{loc}/_staging", exist_ok=True)
    os.rename(f"{loc}/dmanifest/ingest={dvid}",
              f"{loc}/_staging/dmanifest-ingest={dvid}_.old_deadbeef")
    S._recover_layout(loc)
    assert os.path.isdir(f"{loc}/dmanifest/ingest={dvid}")
    df, _ = S.zonemap_scan(spark, loc)
    assert df.count() == 30


def test_claim_swept_when_dmanifest_published(spark, tmp_path):
    loc = str(tmp_path / "t")
    _layout(spark, loc, rows=40, buckets=4)
    res = S.zonemap_delete(spark, loc, predicates=[("v", 0, 3)],
                           mode="mor")
    claim = f"{loc}/_staging/claims/ingest-{res['ingest_id']}"
    assert os.path.exists(claim)
    S._recover_layout(loc)
    assert not os.path.exists(claim)
    # and the id is never re-minted while the dmanifest delta lives
    assert S._next_ingest_id(loc) > res["ingest_id"]


# ---------------------------------------------------------------------
# composition with the wider engine
# ---------------------------------------------------------------------

def test_catalog_scan_applies_dvs(spark, tmp_path):
    from reair_spark.catalog import DirectoryCatalog
    from reair_spark.sources import scan_catalog_table

    loc = str(tmp_path / "t")
    _layout(spark, loc, rows=100)
    S.zonemap_delete(spark, loc, predicates=[("v", 0, 99)], mode="mor")
    cat = DirectoryCatalog(str(tmp_path / "wh"))
    cat.create_table({
        "db": "db", "table": "t", "location": loc, "serde": "parquet",
        "table_type": "EXTERNAL_TABLE", "cols": [], "partition_keys": [],
        "parameters": {"layout": "zonemapped"},
    })
    df, stats = scan_catalog_table(spark, cat, "db", "t")
    assert df.count() == 50 and stats["n_rows_scanned"] == 50


def test_mor_with_hidden_partitioning_and_escaped_values(
        spark, tmp_path):
    """DV paths go through the same Hive escaping as data paths: a
    clustering value containing ':' must round-trip."""
    loc = str(tmp_path / "t")
    df = spark.range(40).select(
        F.col("id"),
        F.concat(F.lit("g:"), F.pmod("id", F.lit(4))).alias("b"),
        F.col("id").alias("v"),
    )
    S.write_zonemapped(df, loc, "b", ["v"])
    res = S.zonemap_delete(spark, loc, predicates=[("v", 0, 19)],
                           mode="mor")
    assert res["n_rows_deleted"] == 20
    out, stats = S.zonemap_scan(spark, loc)
    assert out.count() == 20 and stats["n_rows_scanned"] == 20


def test_vacuum_sweeps_dead_dv_deltas(spark, tmp_path):
    """A DV delta every one of whose buckets was later rewritten by a
    replacing ingest at-or-below the horizon is unreachable by any
    admissible read — vacuum removes its delete files; a DV still
    live for ANY bucket (or only superseded above the horizon)
    stays."""
    loc = str(tmp_path / "t")
    _layout(spark, loc, rows=80, buckets=4)
    r1 = S.zonemap_delete(spark, loc, predicates=[("v", 0, 39)],
                          mode="mor")  # DV over all 4 buckets
    # rewrite ALL buckets (overwrite) => DV r1 fully superseded
    cur, _ = S.zonemap_scan(spark, loc)
    S.zonemap_overwrite(spark, loc, cur.drop("ingest"))
    r2 = S.zonemap_delete(spark, loc, predicates=[("v", 40, 49)],
                          mode="mor")  # live DV above the rewrite
    out = S.zonemap_vacuum(spark, loc, retention_ingests=0)
    assert not os.path.isdir(f"{loc}/dmanifest/ingest={r1['ingest_id']}")
    assert not os.path.isdir(f"{loc}/deletes/ingest={r1['ingest_id']}")
    assert os.path.isdir(f"{loc}/dmanifest/ingest={r2['ingest_id']}")
    df, stats = S.zonemap_scan(spark, loc)
    assert df.count() == 55 and stats["n_rows_scanned"] == 55
    n, _ = S.zonemap_count(spark, loc)
    assert n == 55


def test_vacuum_retention_keeps_dv_deltas_in_window(spark, tmp_path):
    loc = str(tmp_path / "t")
    _layout(spark, loc, rows=80, buckets=4)
    r1 = S.zonemap_delete(spark, loc, predicates=[("v", 0, 39)],
                          mode="mor")
    cur, _ = S.zonemap_scan(spark, loc)
    S.zonemap_overwrite(spark, loc, cur.drop("ingest"))
    # generous retention: the superseding rewrite is above the
    # horizon, so as-of reads between the DV and the rewrite remain
    # admissible — the DV must survive
    S.zonemap_vacuum(spark, loc, retention_ingests=1000)
    assert os.path.isdir(f"{loc}/dmanifest/ingest={r1['ingest_id']}")
    old, _ = S.zonemap_scan(spark, loc, max_ingest=r1["ingest_id"])
    assert old.count() == 60  # post-DV, pre-rewrite snapshot


def test_mor_delete_crash_before_accounting_publish(spark, tmp_path):
    """FailingFs schedule on the accounting-delta publish rename: the
    DV files are written but the dmanifest delta never lands — the
    delete is INVISIBLE (readers consult only published accounting),
    and re-running it converges with no double-delete (the retry
    recomputes from live rows)."""
    from reair_spark.fs import FailingFs, register_fs, unregister_fs

    board = str(tmp_path / "board")
    register_fs(FailingFs("mockmor", str(tmp_path / "remote"), board))
    try:
        loc = "mockmor://wh/layout"
        df = spark.range(40).select(
            F.col("id"), (F.col("id") % 4).cast("long").alias("b"),
            F.col("id").alias("v"))
        S.write_zonemapped(df, loc, "b", ["v"])
        # the delete claims id 1; its dmanifest publish rename targets
        # .../dmanifest/ingest=1 — fail it once
        FailingFs.schedule(board, "rename", "ingest=1", 1)
        with pytest.raises(OSError, match="injected"):
            S.zonemap_delete(spark, loc, predicates=[("v", 0, 9)],
                             mode="mor")
        cur, _ = S.zonemap_scan(spark, loc)
        assert cur.count() == 40  # invisible: nothing published
        res = S.zonemap_delete(spark, loc, predicates=[("v", 0, 9)],
                               mode="mor")
        assert res["n_rows_deleted"] == 10  # recomputed, not doubled
        cur2, _ = S.zonemap_scan(spark, loc)
        assert cur2.count() == 30
        n, _ = S.zonemap_count(spark, loc)
        assert n == 30
    finally:
        unregister_fs("mockmor")
