"""Manifest-only compaction — ``zonemap_rewrite_manifests`` (VERDICT
r11 ask #1, the Iceberg ``rewrite_manifests`` shape): fold every
per-ingest manifest delta into ONE snapshot-resolved delta WITHOUT
touching ``data/``, so plan-time merge cost stops growing with ingest
count while every scan/count/stats answer stays bit-identical."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from reair_spark.sources import (
    _read_layout_meta,
    append_zonemapped,
    write_zonemapped,
    zonemap_count,
    zonemap_merge,
    zonemap_orphan_ingests,
    zonemap_rewrite_manifests,
    zonemap_scan,
    zonemap_stats,
    zonemap_vacuum,
)


def _batch(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"),
        (F.col("id") % 6).alias("b"),
        F.when(F.col("id") % 11 != 0, F.col("id")).alias("v"),
    )


def _build(spark, loc, n_ingests=3, per=60):
    for i in range(n_ingests):
        append_zonemapped(
            _batch(spark, i * per, (i + 1) * per), loc, "b", ["v"],
            bloom_cols=["k"], ndv_cols=["v"], ingest_id=i,
        )


def _data_snapshot(loc):
    out = {}
    for root, _dirs, files in os.walk(f"{loc}/data"):
        for f in files:
            p = os.path.join(root, f)
            with open(p, "rb") as fh:
                out[os.path.relpath(p, loc)] = fh.read()
    return out


def _answers(spark, loc):
    df, stats = zonemap_scan(spark, loc, predicates=[("v", 40, 130)])
    rows = sorted(
        (r.k, r.b, r.v)
        for r in df.where("v between 40 and 130").collect()
    )
    cnt, cstats = zonemap_count(spark, loc, predicates=[("v", 40, 130)])
    st = sorted(
        (r.column, r.n_rows, r.n_nulls, r.min_value, r.max_value, r.ndv)
        for r in zonemap_stats(spark, loc).collect()
    )
    _, pstats = zonemap_scan(spark, loc, point_predicates=[("k", 7)])
    return {
        "rows": rows,
        "plan": (stats["n_buckets_total"], stats["n_buckets_read"],
                 stats["n_rows_scanned"]),
        "count": cnt,
        "count_full": cstats["n_buckets_full"],
        "stats": st,
        "bloom_kept": pstats["n_buckets_read"],
    }


def test_fold_leaves_data_identical_and_answers_unchanged(spark, tmp_path):
    loc = str(tmp_path / "fold")
    _build(spark, loc)
    before_data = _data_snapshot(loc)
    before = _answers(spark, loc)

    res = zonemap_rewrite_manifests(spark, loc)
    assert res["deltas_before"] == 3
    assert res["deltas_after"] == 1
    # the fold publishes AT the highest folded id — never a fresh one,
    # which could collide with the next streaming batch id
    assert res["fold_ingest"] == 2

    # data/ byte-identical — the whole point of a manifest-only fold
    assert _data_snapshot(loc) == before_data
    # exactly one manifest delta remains
    deltas = sorted(
        p for p in os.listdir(f"{loc}/manifest") if p.startswith("ingest=")
    )
    assert deltas == ["ingest=2"]
    # every answer — pruned scan, count pushdown (incl. full-coverage
    # accounting), ANALYZE stats with NDV, bloom point pruning — is
    # unchanged
    assert _answers(spark, loc) == before
    # fold is a no-op on an already-folded layout
    res2 = zonemap_rewrite_manifests(spark, loc)
    assert res2 == {"deltas_before": 1, "deltas_after": 1,
                    "fold_ingest": None}


def test_fold_then_append_then_refold(spark, tmp_path):
    """Post-fold appends publish plain deltas (no data_ingests column);
    the mixed-schema manifest reads through mergeSchema, and a second
    fold absorbs both shapes."""
    loc = str(tmp_path / "refold")
    _build(spark, loc)
    zonemap_rewrite_manifests(spark, loc)

    append_zonemapped(_batch(spark, 180, 240), loc, "b", ["v"],
                      bloom_cols=["k"], ndv_cols=["v"], ingest_id=4)
    df, stats = zonemap_scan(spark, loc)
    assert df.count() == 240
    assert stats["n_rows_scanned"] == 240
    before = _answers(spark, loc)

    res = zonemap_rewrite_manifests(spark, loc)
    assert res["deltas_before"] == 2
    assert res["deltas_after"] == 1
    assert _answers(spark, loc) == before
    assert zonemap_scan(spark, loc)[0].count() == 240


def test_fold_replay_noops_and_asof_refused(spark, tmp_path):
    loc = str(tmp_path / "replay")
    _build(spark, loc)
    # pre-fold as-of works
    assert zonemap_scan(spark, loc, max_ingest=1)[0].count() == 120
    zonemap_rewrite_manifests(spark, loc)

    # a replay of a folded batch is a no-op (compacted_through)
    append_zonemapped(_batch(spark, 60, 120), loc, "b", ["v"],
                      bloom_cols=["k"], ndv_cols=["v"], ingest_id=1)
    assert zonemap_scan(spark, loc)[0].count() == 180

    # as-of below the fold horizon is expired (its per-ingest deltas
    # are gone); at or above it still reads
    with pytest.raises(ValueError, match="folded"):
        zonemap_scan(spark, loc, max_ingest=1)
    assert zonemap_scan(spark, loc, max_ingest=2)[0].count() == 180


def test_fold_commutes_with_orphan_replay(spark, tmp_path):
    """A crashed append (data landed, delta never published) stays
    replayable ACROSS a fold: the fold publishes at the highest
    FOLDED id, so the orphan's later delta lands ABOVE the folded
    base and its rows appear — fold and replay commute in both
    directions."""
    loc = str(tmp_path / "orph")
    _build(spark, loc, n_ingests=2)
    os.makedirs(f"{loc}/data/ingest=7/b=0", exist_ok=True)
    with open(f"{loc}/data/ingest=7/b=0/part-0.parquet", "wb") as fh:
        fh.write(b"x")  # crashed write debris: replay rewrites it
    assert zonemap_orphan_ingests(loc) == [7]

    res = zonemap_rewrite_manifests(spark, loc)
    assert res["fold_ingest"] == 1
    assert zonemap_scan(spark, loc)[0].count() == 120
    assert zonemap_orphan_ingests(loc) == [7]  # still awaiting replay

    append_zonemapped(_batch(spark, 500, 520), loc, "b", ["v"],
                      bloom_cols=["k"], ndv_cols=["v"], ingest_id=7)
    assert zonemap_orphan_ingests(loc) == []
    df, _ = zonemap_scan(spark, loc)
    assert df.count() == 140
    assert df.where("k >= 500").count() == 20


def test_fold_refusals(spark, tmp_path):
    # text-family manifest serde cannot union the folded schema
    loc2 = str(tmp_path / "csv")
    df = spark.range(20).select(
        (F.col("id") % 2).cast("string").alias("b"),
        F.col("id").alias("v"),
    )
    write_zonemapped(df, loc2, "b", ["v"], serde="json")
    append_zonemapped(
        df, loc2, "b", ["v"], serde="json", ingest_id=1,
    )
    with pytest.raises(ValueError, match="not\\s+supported"):
        zonemap_rewrite_manifests(spark, loc2)

    # descriptor-less layouts are refused
    with pytest.raises(ValueError, match="descriptor"):
        zonemap_rewrite_manifests(spark, str(tmp_path / "missing"))


def test_fold_crash_windows_converge(spark, tmp_path, monkeypatch):
    """Crash after the horizon write but before the folded delta
    publishes: reads stay correct (old deltas intact, refuse-only
    horizons), and re-running the fold converges at the SAME fold
    id. Crash mid old-delta removal: remaining deltas are already
    superseded; re-running sweeps them."""
    import reair_spark.sources as S

    loc = str(tmp_path / "crash")
    _build(spark, loc)
    before = _answers(spark, loc)

    # window 1: meta written, publish dies
    real_publish = S._publish_delta

    def boom(*a, **k):
        raise OSError("injected publish crash")

    monkeypatch.setattr(S, "_publish_delta", boom)
    with pytest.raises(OSError):
        zonemap_rewrite_manifests(spark, loc)
    monkeypatch.setattr(S, "_publish_delta", real_publish)

    meta = _read_layout_meta(loc)
    assert meta["folded_through"] == 2        # horizon stranded
    assert meta["compacted_through"] == 2
    assert _answers(spark, loc) == before     # reads unaffected

    # re-run converges at the same fold id
    res = zonemap_rewrite_manifests(spark, loc)
    assert res == {"deltas_before": 3, "deltas_after": 1,
                   "fold_ingest": 2}
    assert _answers(spark, loc) == before

    # window 2: new appends, then a fold whose old-delta removal dies
    # halfway — the surviving old delta is superseded, reads correct,
    # re-run sweeps it
    append_zonemapped(_batch(spark, 180, 240), loc, "b", ["v"],
                      bloom_cols=["k"], ndv_cols=["v"], ingest_id=4)
    expect = _answers(spark, loc)

    import reair_spark.fs as FS

    real_rmtree = FS.fs_rmtree
    calls = {"n": 0}

    def flaky_rmtree(fs, path):
        if "/manifest/ingest=" in path:
            calls["n"] += 1
            if calls["n"] == 1:
                raise OSError("injected rmtree crash")
        return real_rmtree(fs, path)

    monkeypatch.setattr(FS, "fs_rmtree", flaky_rmtree)
    with pytest.raises(OSError):
        zonemap_rewrite_manifests(spark, loc)
    monkeypatch.setattr(FS, "fs_rmtree", real_rmtree)

    assert _answers(spark, loc) == expect     # superseded, not read
    res = zonemap_rewrite_manifests(spark, loc)
    assert res["deltas_after"] == 1
    assert _answers(spark, loc) == expect


def test_mutations_compose_after_fold(spark, tmp_path):
    loc = str(tmp_path / "mut")
    _build(spark, loc)
    zonemap_rewrite_manifests(spark, loc)

    zonemap_merge(
        spark, loc,
        spark.range(1).select(
            F.lit(7).cast("long").alias("k"),
            F.lit(1).cast("long").alias("b"),
            F.lit(9999).cast("long").alias("v"),
        ),
        key_cols=["k"],
    )
    df, _ = zonemap_scan(spark, loc)
    assert df.count() == 180
    assert df.where("k = 7").first().v == 9999

    from reair_spark.sources import zonemap_compact

    stats = zonemap_compact(spark, loc)
    assert stats["deltas_after"] == 1
    assert zonemap_scan(spark, loc)[0].count() == 180


def test_vacuum_sweeps_dirs_stranded_below_fold(spark, tmp_path):
    """VERDICT r11 ask #8 composed with the fold: superseded dirs left
    on disk when the fold runs appear in NO delta afterwards — vacuum
    finds them via the live-reference diff below folded_through, and
    the plan-time delta ROW count drops to live buckets only."""
    loc = str(tmp_path / "strays")
    _build(spark, loc)
    # supersede bucket 1 with a merge rewrite (new replacing ingest)
    zonemap_merge(
        spark, loc,
        spark.range(1).select(
            F.lit(7).cast("long").alias("k"),
            F.lit(1).cast("long").alias("b"),
            F.lit(5555).cast("long").alias("v"),
        ),
        key_cols=["k"],
    )
    # bucket 1's three pre-merge dirs are now dead but still on disk
    dead_dirs = [f"{loc}/data/ingest={i}/b=1" for i in range(3)]
    assert all(os.path.isdir(p) for p in dead_dirs)

    res = zonemap_rewrite_manifests(spark, loc)
    assert res["deltas_after"] == 1
    before = _answers(spark, loc)

    # plan-time manifest rows = live buckets only (6), down from the
    # pre-fold 4 deltas' 6+6+6+1(+tombstone-free) rows
    man = spark.read.option("mergeSchema", "true").parquet(
        f"{loc}/manifest"
    )
    assert man.count() == 6

    out = zonemap_vacuum(spark, loc)
    assert out["n_dirs_removed"] >= 3
    assert not any(os.path.isdir(p) for p in dead_dirs)
    # live data untouched, answers unchanged
    assert _answers(spark, loc) == before
    # idempotent
    out2 = zonemap_vacuum(spark, loc)
    assert out2["n_dirs_removed"] == 0


def test_vacuum_retention_protects_prefold_dirs(spark, tmp_path):
    """ADVICE r12 #1 (high): fold FIRST, replace a bucket AFTER — the
    pre-fold dirs the folded delta references stay readable for as-of
    snapshots in [fold, replacement), so a vacuum whose retention
    window still admits those snapshots must NOT sweep them. Shrinking
    the window to zero expires the fold snapshot and the same dirs
    become dead."""
    loc = str(tmp_path / "retain")
    _build(spark, loc)                               # ingests 0, 1, 2
    res = zonemap_rewrite_manifests(spark, loc)
    fold_id = res["fold_ingest"]
    assert fold_id == 2
    prefold = [f"{loc}/data/ingest={i}/b=1" for i in range(3)]
    assert all(os.path.isdir(p) for p in prefold)

    def asof_bucket1():
        df, _ = zonemap_scan(spark, loc, max_ingest=fold_id)
        return sorted((r.k, r.b, r.v) for r in df.where("b = 1").collect())

    asof_before = asof_bucket1()
    assert len(asof_before) == 30                    # 3 ingests × 10 rows

    # post-fold merge REPLACES bucket 1 at ingest 3
    zonemap_merge(
        spark, loc,
        spark.range(1).select(
            F.lit(7).cast("long").alias("k"),
            F.lit(1).cast("long").alias("b"),
            F.lit(5555).cast("long").alias("v"),
        ),
        key_cols=["k"],
    )

    # wide retention: the fold snapshot is still admissible — every
    # dir it references survives the sweep and the as-of read is
    # byte-identical before and after
    zonemap_vacuum(spark, loc, retention_ingests=1000)
    assert all(os.path.isdir(p) for p in prefold)
    assert asof_bucket1() == asof_before

    cur = sorted(
        (r.k, r.b, r.v)
        for r in zonemap_scan(spark, loc)[0].where("b = 1").collect()
    )

    # retention 0: the fold snapshot expires, the replacing ingest is
    # now inside the horizon, and the stranded dirs become dead —
    # including ingest=2/b=1 (referenced only via data_ingests)
    zonemap_vacuum(spark, loc, retention_ingests=0)
    assert not any(os.path.isdir(p) for p in prefold)
    with pytest.raises(ValueError, match="expired"):
        zonemap_scan(spark, loc, max_ingest=fold_id)
    got = sorted(
        (r.k, r.b, r.v)
        for r in zonemap_scan(spark, loc)[0].where("b = 1").collect()
    )
    assert got == cur
    # idempotent
    assert zonemap_vacuum(spark, loc, retention_ingests=0)[
        "n_dirs_removed"] == 0


def test_vacuum_and_scan_handle_escaped_bucket_values(spark, tmp_path):
    """ADVICE r12 #5 (low): Spark percent-escapes partition directory
    names (':' → '%3A') while manifest rows keep the RAW value. Path
    construction (scan, vacuum dead-walk) must escape, and the
    stranded sweep's live-set compare must unescape — otherwise a
    live escaped dir never matches the live set and is DELETED."""
    loc = str(tmp_path / "esc")
    df = spark.range(40).select(
        F.concat(F.lit("k:"), (F.col("id") % 4).cast("string"))
        .alias("b"),
        F.col("id").alias("v"),
    )
    write_zonemapped(df, loc, "b", ["v"])
    append_zonemapped(
        spark.range(40, 60).select(
            F.concat(F.lit("k:"), (F.col("id") % 4).cast("string"))
            .alias("b"),
            F.col("id").alias("v"),
        ),
        loc, "b", ["v"], ingest_id=1,
    )
    # escaped dirs actually landed
    assert os.path.isdir(f"{loc}/data/ingest=0/b=k%3A0")

    # pruned scan resolves escaped paths (bucket list prunes to one)
    df2, stats = zonemap_scan(spark, loc, buckets=["k:1"])
    assert stats["n_buckets_read"] == 1
    assert df2.count() == 15
    assert set(r.b for r in df2.collect()) == {"k:1"}

    zonemap_rewrite_manifests(spark, loc)
    before = sorted((r.b, r.v) for r in zonemap_scan(spark, loc)[0].collect())

    # the stranded sweep must not eat LIVE escaped dirs
    out = zonemap_vacuum(spark, loc)
    assert out["n_dirs_removed"] == 0
    assert sorted(
        (r.b, r.v) for r in zonemap_scan(spark, loc)[0].collect()
    ) == before

    # supersede one escaped bucket; its dead dirs ARE swept (escaped
    # path construction in the dead-walk + unescaped live compare)
    zonemap_merge(
        spark, loc,
        spark.range(1).select(
            F.lit("k:2").alias("b"),
            F.lit(9999).cast("long").alias("v"),
        ),
        key_cols=["v"],
    )
    out = zonemap_vacuum(spark, loc)
    assert out["n_dirs_removed"] >= 2
    assert not os.path.isdir(f"{loc}/data/ingest=0/b=k%3A2")
    assert not os.path.isdir(f"{loc}/data/ingest=1/b=k%3A2")
    # other buckets intact
    assert os.path.isdir(f"{loc}/data/ingest=0/b=k%3A0")
    df3, _ = zonemap_scan(spark, loc)
    assert df3.where("b = 'k:2'").count() == 16  # 15 kept + 1 upsert
    assert df3.where("b = 'k:2' and v = 9999").count() == 1
    assert df3.count() == 61


def test_append_auto_fold_keeps_delta_count_bounded(spark, tmp_path):
    """VERDICT r12 ask #8: batch appends with auto_fold_at=N leave at
    most N deltas at any point (and <=2 right after a fold + append),
    with answers identical to the never-folded layout."""
    import reair_spark.sources as S

    loc = str(tmp_path / "afold")
    plain = str(tmp_path / "plain")
    for i in range(7):
        for where, fold in ((loc, 3), (plain, None)):
            append_zonemapped(
                _batch(spark, i * 60, (i + 1) * 60), where, "b", ["v"],
                bloom_cols=["k"], ndv_cols=["v"], ingest_id=i,
                auto_fold_at=fold,
            )
        deltas = [p for p in os.listdir(f"{loc}/manifest")
                  if p.startswith("ingest=")]
        assert len(deltas) <= 3
    # 7 appends with auto_fold_at=3: folds fired at 3, 5(?), ... —
    # what matters is the bound and the answer
    assert len([p for p in os.listdir(f"{loc}/manifest")
                if p.startswith("ingest=")]) <= 3
    assert _answers(spark, loc) == _answers(spark, plain)
    # data dirs untouched by folds: still one per ingest
    assert sorted(
        p for p in os.listdir(f"{loc}/data") if p.startswith("ingest=")
    ) == [f"ingest={i}" for i in range(7)]
    meta = _read_layout_meta(loc)
    assert int(meta["folded_through"]) >= 4


def test_zonemap_maintain_policy_dispatch(spark, tmp_path):
    """zonemap_maintain picks the cheapest sufficient action: fold on
    manifest delta growth, compact on data-layer growth (a metric
    folds never reset), vacuum piggybacked when asked."""
    import reair_spark.sources as S

    loc = str(tmp_path / "maint")
    _build(spark, loc)                      # 3 deltas, 3 data layers

    # below every threshold: no action
    out = S.zonemap_maintain(spark, loc, fold_at=10, compact_at=10)
    assert out["action"] == "none"

    # fold threshold reached (compact's data threshold not): fold
    out = S.zonemap_maintain(spark, loc, fold_at=3, compact_at=10)
    assert out["action"] == "fold"
    assert out["deltas_after"] == 1
    assert sorted(
        p for p in os.listdir(f"{loc}/data") if p.startswith("ingest=")
    ) == ["ingest=0", "ingest=1", "ingest=2"]  # data untouched

    # more appends: the fold reset the DELTA count but not the DATA
    # layer count — compaction still fires on its own metric
    append_zonemapped(_batch(spark, 180, 240), loc, "b", ["v"],
                      bloom_cols=["k"], ndv_cols=["v"], ingest_id=4)
    before = _answers(spark, loc)
    out = S.zonemap_maintain(spark, loc, fold_at=8, compact_at=4)
    assert out["action"] == "compact"
    assert len([p for p in os.listdir(f"{loc}/data")
                if p.startswith("ingest=")]) == 1
    assert _answers(spark, loc) == before

    # vacuum piggyback: supersede a bucket, maintain with retention 0
    zonemap_merge(
        spark, loc,
        spark.range(1).select(
            F.lit(7).cast("long").alias("k"),
            F.lit(1).cast("long").alias("b"),
            F.lit(5555).cast("long").alias("v"),
        ),
        key_cols=["k"],
    )
    out = S.zonemap_maintain(
        spark, loc, fold_at=2, vacuum_retention_ingests=0,
    )
    assert out["action"] == "fold"
    assert out["vacuum"]["n_dirs_removed"] >= 1
