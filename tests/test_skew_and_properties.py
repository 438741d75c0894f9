"""Skew utilities (result equivalence vs unsalted forms) + hypothesis
property tests for the diff planner's algebraic invariants."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from reair_spark.catalog import TABLE_SCHEMA
from reair_spark.diff import table_diff
from reair_spark.io import load_table
from reair_spark.skew import salted_agg, salted_count, salted_join

# ---------------------------------------------------------------------------
# skew utilities: salted == unsalted
# ---------------------------------------------------------------------------


def test_salted_count_matches_plain(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    plain = {r.l_returnflag: r.cnt for r in
             li.groupBy("l_returnflag").agg(F.count("*").alias("cnt")).collect()}
    salted = {r.l_returnflag: r.cnt for r in salted_count(li, "l_returnflag").collect()}
    assert plain == salted


def test_salted_agg_matches_plain(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    plain = li.groupBy("l_returnflag").agg(
        F.sum("l_quantity").alias("s"), F.min("l_quantity").alias("mn"),
        F.max("l_quantity").alias("mx"),
    ).collect()
    p = {r.l_returnflag: (round(r.s, 2), r.mn, r.mx) for r in plain}
    s = {r.l_returnflag: (round(r.sum_val, 2), r.min_val, r.max_val)
         for r in salted_agg(li, "l_returnflag", "l_quantity").collect()}
    assert p == s


def test_salted_join_matches_plain(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    customers = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    plain = orders.join(
        customers, orders.o_custkey == customers.c_custkey
    ).count()
    salted = salted_join(
        orders.withColumnRenamed("o_custkey", "k"),
        customers.withColumnRenamed("c_custkey", "k"),
        "k",
    ).count()
    assert plain == salted


# ---------------------------------------------------------------------------
# diff-planner properties (hypothesis)
# ---------------------------------------------------------------------------

_name = st.text(alphabet="abcdefgh", min_size=1, max_size=4)
_tldt = st.integers(min_value=1, max_value=5).map(str)


def _snapshot_rows(draw_names):
    return [
        ("db1", n, "MANAGED_TABLE", [("c1", "string", None)], [],
         f"/wh/db1/{n}", "parquet", {"transient_lastDdlTime": t})
        for n, t in draw_names
    ]


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    src=st.dictionaries(_name, _tldt, max_size=6),
    dest=st.dictionaries(_name, _tldt, max_size=6),
)
def test_diff_planner_invariants(spark, src, dest):
    """For ANY pair of catalogs:
    1. every (db, table) from either side appears exactly once;
    2. src-only → COPY, dest-only → DROP;
    3. identical snapshots (same tldt, data unknown⇒equal) → never DROP;
    4. diff(x, x) is all NO_OP (idempotence)."""
    sdf = spark.createDataFrame(_snapshot_rows(src.items()), TABLE_SCHEMA)
    ddf = spark.createDataFrame(_snapshot_rows(dest.items()), TABLE_SCHEMA)
    plan = {r.table: r.action for r in table_diff(sdf, ddf).collect()}

    assert set(plan) == set(src) | set(dest)
    for t in set(src) - set(dest):
        assert plan[t] == "COPY_UNPARTITIONED_TABLE"
    for t in set(dest) - set(src):
        assert plan[t] == "DROP_TABLE"
    for t in set(src) & set(dest):
        assert plan[t] != "DROP_TABLE"
        if src[t] == dest[t]:
            assert plan[t] == "NO_OP"

    self_plan = {r.action for r in table_diff(sdf, sdf).collect()}
    assert self_plan <= {"NO_OP"}


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    sizes=st.lists(
        st.tuples(
            st.sampled_from(["d1", "d2", "d3"]),
            st.integers(min_value=1, max_value=500),
        ),
        min_size=1,
        max_size=40,
    ),
    target=st.integers(min_value=50, max_value=400),
)
def test_compact_plan_invariants(spark, sizes, target):
    """For ANY inventory and target size:
    1. every under-threshold file is assigned exactly once, none other;
    2. task ids per dir are dense from 0;
    3. no task exceeds target + its largest member (greedy bound);
    4. total planned bytes == total small-file bytes."""
    from reair_spark.plans import compact_plan

    small_bytes = 300
    rows = [(d, f"f{i:04d}", s) for i, (d, s) in enumerate(sizes)]
    files = spark.createDataFrame(rows, "dir string, rel_path string, size long")
    plan = compact_plan(files, small_bytes=small_bytes, target_bytes=target)
    got = plan.collect()

    expect = {(d, p) for d, p, s in rows if s < small_bytes}
    assert {(r.dir, r.rel_path) for r in got} == expect
    assert len(got) == len(expect)

    per_dir: dict[str, dict[int, list[int]]] = {}
    for r in got:
        per_dir.setdefault(r.dir, {}).setdefault(r.task, []).append(r.size)
    for d, tasks in per_dir.items():
        assert sorted(tasks) == list(range(len(tasks)))
        for members in tasks.values():
            assert sum(members) <= target + max(members)
    assert sum(r.size for r in got) == sum(s for d, p, s in rows if s < small_bytes)


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["a", "b"]),          # stratum
            st.integers(min_value=0, max_value=99),  # order key
            st.integers(min_value=0, max_value=50),  # value
        ),
        min_size=1,
        max_size=60,
        unique_by=lambda t: (t[0], t[1]),
    ),
    chunk=st.integers(min_value=1, max_value=25),
)
def test_chunked_running_sum_equals_single_window(spark, rows, chunk):
    """For ANY data and ANY chunk granularity, the two-level cumsum
    must equal the single-window running sum exactly (integer sums are
    associative; the decomposition may not change a single value)."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from reair_spark.operators import chunked_running_sum

    df = spark.createDataFrame(rows, "g string, k int, v long")
    got = {
        (r.g, r.k): r.cum
        for r in chunked_running_sum(
            df, ["g"], F.floor(F.col("k") / chunk), ["k"], "v", "cum"
        ).collect()
    }
    w = (
        W.partitionBy("g").orderBy("k").rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    want = {
        (r.g, r.k): r.cum
        for r in df.withColumn("cum", F.sum("v").over(w)).collect()
    }
    assert got == want


@settings(max_examples=25, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    samples=st.lists(
        st.integers(min_value=-32768, max_value=32767), min_size=0, max_size=300
    )
)
def test_wav_codec_roundtrip_property(samples):
    """Any int16 sample stream survives encode→decode bit-exactly."""
    import numpy as np

    from reair_spark.datapipe.multimodal import wav_decode, wav_encode

    arr = np.array(samples, dtype=np.int16)
    rate, decoded = wav_decode(wav_encode(arr))
    assert np.array_equal(decoded, arr)


@settings(max_examples=25, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    w=st.integers(min_value=1, max_value=9),
    h=st.integers(min_value=1, max_value=9),
    seed=st.integers(min_value=0, max_value=10_000),
)
def test_bmp_codec_roundtrip_property(w, h, seed):
    """Any grayscale image survives encode→decode bit-exactly across
    every stride-padding case (w mod 4 ∈ {0,1,2,3})."""
    import numpy as np

    from reair_spark.datapipe.multimodal import bmp_decode, bmp_encode

    img = np.random.RandomState(seed).randint(0, 256, (h, w), dtype=np.uint8)
    assert np.array_equal(bmp_decode(bmp_encode(img)), img)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    zero_at=st.integers(min_value=0, max_value=19),
    seed=st.integers(min_value=0, max_value=1000),
)
def test_zero_vector_survives_unit_norm_and_kmeans(spark, zero_at, seed):
    """ADVICE r3: an all-zero embedding must flow through unit_norm /
    kmeans / semdedup-style dots as sim=0 — never as NaN poisoning
    every downstream argmax. Property: any corpus with a zero vector
    anywhere yields a complete, NaN-free assignment."""
    import math
    import random

    from reair_spark.datapipe.common import cosine, unit_norm
    from reair_spark.datapipe.similarity import kmeans_fit

    rng = random.Random(seed)
    rows = [
        (i, [0.0] * 8 if i == zero_at else [rng.uniform(-1, 1) for _ in range(8)])
        for i in range(20)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, emb array<double>")

    normed = unit_norm(F.col("emb"))
    vals = emb.select(F.explode(normed).alias("x")).collect()
    assert all(not math.isnan(r.x) for r in vals)

    assigned, centroids = kmeans_fit(emb, k=3, iters=2)
    arows = assigned.collect()
    assert len(arows) == 20                       # complete assignment
    assert all(r.cluster is not None for r in arows)
    crows = centroids.collect()
    for c in crows:
        assert all(not math.isnan(x) for x in c.cemb)


@given(
    docs=st.lists(
        st.lists(st.integers(0, 6), min_size=1, max_size=30),
        min_size=2, max_size=8,
    )
)
@settings(max_examples=60, deadline=None)
def test_span_islands_match_bruteforce(docs):
    """Property: the gaps-and-islands span merge in the dedup_span
    oracle equals a brute-force interval union, for arbitrary corpora.
    Runs the SHARED oracle SQL through DuckDB directly (the Spark side
    is hash-gated against this exact SQL by the driver, so this
    transitively covers both engines) against a per-doc brute force:
    mark every k-gram shared with another doc, union the covered
    token intervals, count maximal runs."""
    import duckdb

    from reair_spark.datapipe.dedup import SPAN_K, _span_sql

    # map tokens to strings; planted corpus machinery expects doc_id/text
    corpus = [(i, " ".join(f"w{t}" for t in toks)) for i, toks in enumerate(docs)]
    con = duckdb.connect()
    con.execute("CREATE TABLE documents AS SELECT * FROM (VALUES "
                + ",".join(f"({i}, '{t}')" for i, t in corpus)
                + ") AS v(doc_id, text)")
    got = {
        r[0]: (r[1], r[2], r[3])
        for r in con.execute(_span_sql()).fetchall()
    }

    # brute force over the SAME derived corpus (plants included)
    full = {i: t.split(" ") for i, t in corpus}
    for i, t in corpus:
        if i % 10 == 0:
            toks = t.split(" ")
            full[i + 1_000_000] = toks[: max(len(toks) - 3, 1)]
    grams: dict[tuple, set] = {}
    for d, toks in full.items():
        for p in range(len(toks) - SPAN_K + 1):
            grams.setdefault(tuple(toks[p:p + SPAN_K]), set()).add(d)
    for d, toks in full.items():
        covered = set()
        for p in range(len(toks) - SPAN_K + 1):
            if len(grams[tuple(toks[p:p + SPAN_K])]) >= 2:
                covered.update(range(p, p + SPAN_K))
        # maximal runs of covered positions
        runs = 0
        prev = None
        for pos in sorted(covered):
            if prev is None or pos > prev + 1:
                runs += 1
            prev = pos
        assert got[d] == (len(toks), runs, len(covered)), (d, toks)


# ---------------------------------------------------------------------------
# zone-mapped layout properties (r10): pruning losslessness and
# merge/delete/count composition under RANDOM data shapes and
# predicates — each Spark job costs ~0.5 s here, so the layout is
# built ONCE per example from hypothesis-drawn parameters and every
# property is checked against a plain-DataFrame model.
# ---------------------------------------------------------------------------


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    n=st.integers(min_value=40, max_value= 300),
    n_buckets=st.integers(min_value=2, max_value=9),
    mod=st.integers(min_value=7, max_value=60),
    lo=st.integers(min_value=-5, max_value=70),
    width=st.integers(min_value=0, max_value=40),
    del_lo=st.integers(min_value=-5, max_value=70),
    del_width=st.integers(min_value=0, max_value=20),
    null_mod=st.integers(min_value=3, max_value=25),
)
def test_zonemap_prune_count_delete_model_equivalence(
    spark, tmp_path_factory, n, n_buckets, mod, lo, width, del_lo,
    del_width, null_mod,
):
    """For arbitrary (bucket count, value distribution, range
    predicate, delete range, NULL density): pruned scan + residual ==
    model filter; zonemap_count == model count (before AND after a
    delete — SQL semantics: a NULL v never matches a range predicate,
    so null rows survive every delete and are excluded from every
    predicated count, but DO count when there is no predicate —
    VERDICT r10 #1); the as-of read still equals the pre-delete
    model."""
    from pyspark.sql import functions as F

    from reair_spark.sources import (
        write_zonemapped,
        zonemap_count,
        zonemap_delete,
        zonemap_scan,
    )

    hi = lo + width
    dhi = del_lo + del_width
    rows = [
        (i, i % n_buckets,
         None if i % null_mod == 0 else (i * 13) % mod)
        for i in range(n)
    ]
    df = spark.createDataFrame(rows, "k long, b long, v long")
    loc = str(tmp_path_factory.mktemp("zprop") / "layout")
    write_zonemapped(df, loc, "b", stat_cols=["v"])

    model = {(k, v) for k, b, v in rows}

    def matches(v, a, b2):
        return v is not None and a <= v <= b2

    pruned, _ = zonemap_scan(spark, loc, [("v", lo, hi)])
    got = {
        (r.k, r.v)
        for r in pruned.where(f"v >= {lo} and v <= {hi}").collect()
    }
    assert got == {(k, v) for k, v in model if matches(v, lo, hi)}
    assert zonemap_count(spark, loc, [("v", lo, hi)])[0] == len(got)
    assert zonemap_count(spark, loc)[0] == len(model)

    st_del = zonemap_delete(spark, loc, predicates=[("v", del_lo, dhi)])
    survivors = {(k, v) for k, v in model if not matches(v, del_lo, dhi)}
    assert st_del["n_rows_deleted"] == len(model) - len(survivors)
    after, _ = zonemap_scan(spark, loc)
    assert {(r.k, r.v) for r in after.collect()} == survivors
    assert zonemap_count(spark, loc)[0] == len(survivors)
    assert zonemap_count(spark, loc, [("v", lo, hi)])[0] == len(
        {(k, v) for k, v in survivors if matches(v, lo, hi)}
    )
    # the pre-delete snapshot is intact (append-only time travel)
    asof, _ = zonemap_scan(spark, loc, max_ingest=0)
    assert {(r.k, r.v) for r in asof.collect()} == model


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    n=st.integers(min_value=40, max_value=200),
    n_buckets=st.integers(min_value=2, max_value=8),
    mod=st.integers(min_value=7, max_value=60),
    null_mod=st.integers(min_value=3, max_value=25),
    n2=st.integers(min_value=10, max_value=150),
    shift=st.integers(min_value=0, max_value=50),
    upd_step=st.integers(min_value=2, max_value=9),
    new_mod=st.integers(min_value=2, max_value=6),
)
def test_zonemap_overwrite_merge_recluster_stats_model_equivalence(
    spark, tmp_path_factory, n, n_buckets, mod, null_mod, n2, shift,
    upd_step, new_mod,
):
    """Round-11 mutations under RANDOM shapes, against a dict model:
    ANALYZE stats (rows / nulls / min / max / exact-below-k NDV) match
    the model; INSERT OVERWRITE replaces the snapshot exactly
    (tombstoned buckets = old − new, as-of sees the old model); MERGE
    replaces whole key groups; RECLUSTER by a different modulus
    preserves every row, keeps pruning lossless under the new spec,
    and keeps the old clustering as a data column."""
    from pyspark.sql import functions as F

    from reair_spark.sources import (
        write_zonemapped,
        zonemap_merge,
        zonemap_overwrite,
        zonemap_recluster,
        zonemap_scan,
        zonemap_stats,
    )

    rows = [
        (i, i % n_buckets,
         None if i % null_mod == 0 else (i * 13) % mod)
        for i in range(n)
    ]
    df = spark.createDataFrame(rows, "k long, b long, v long")
    loc = str(tmp_path_factory.mktemp("zprop2") / "layout")
    write_zonemapped(df, loc, "b", stat_cols=["v"], ndv_cols=["v"])

    # --- stats vs model (mod <= 60 < KMV_K=64 ⇒ NDV exact) ----------
    vals = [v for _, _, v in rows if v is not None]
    stats = {r.column: r for r in zonemap_stats(spark, loc).collect()}
    assert stats["v"].n_rows == n
    assert stats["v"].n_nulls == len(rows) - len(vals)
    if vals:
        assert int(stats["v"].min_value) == min(vals)
        assert int(stats["v"].max_value) == max(vals)
    assert stats["v"].ndv == len(set(vals))

    # --- INSERT OVERWRITE -------------------------------------------
    rows2 = [
        (i + shift, (i + shift) % n_buckets,
         None if i % null_mod == 1 else (i * 7) % mod)
        for i in range(n2)
    ]
    res = zonemap_overwrite(
        spark, loc, spark.createDataFrame(rows2, "k long, b long, v long")
    )
    old_b = {b for _, b, _ in rows}
    new_b = {b for _, b, _ in rows2}
    assert res["n_rows"] == n2
    assert res["n_buckets"] == len(new_b)
    assert res["n_buckets_tombstoned"] == len(old_b - new_b)
    cur, _ = zonemap_scan(spark, loc)
    assert {(r.k, r.v) for r in cur.collect()} == {
        (k, v) for k, _, v in rows2
    }
    asof, _ = zonemap_scan(spark, loc, max_ingest=0)
    assert {(r.k, r.v) for r in asof.collect()} == {
        (k, v) for k, _, v in rows
    }

    # --- MERGE (replace whole key groups) ---------------------------
    upd_keys = sorted({k for k, _, _ in rows2})[::upd_step][:5]
    updates = [(k, k % n_buckets, 1000 + k) for k in upd_keys]
    m = zonemap_merge(
        spark, loc,
        spark.createDataFrame(updates, "k long, b long, v long"),
        key_cols=["k"],
    )
    assert m["n_buckets_affected"] == len({b for _, b, _ in updates})
    model = {(k, v) for k, _, v in rows2 if k not in set(upd_keys)}
    model |= {(k, v) for k, _, v in updates}
    cur2, _ = zonemap_scan(spark, loc)
    assert {(r.k, r.v) for r in cur2.collect()} == model

    # --- RECLUSTER by a different modulus ---------------------------
    rc = zonemap_recluster(
        spark, loc, "b2", stat_cols=["v"],
        bucket_expr=f"pmod(k, {new_mod})",
    )
    assert rc["n_rows"] == len(model)
    cur3, st3 = zonemap_scan(spark, loc)
    assert st3["n_buckets_total"] == len({k % new_mod for k, _ in model})
    got = {(r.k, r.v, r.b) for r in cur3.collect()}
    assert {(k, v) for k, v, _ in got} == model
    assert all(b is not None for _, _, b in got)  # old clustering kept
    # pruning under the new spec is still lossless
    pr, _ = zonemap_scan(spark, loc, [("v", 0, mod // 2)])
    want = {(k, v) for k, v in model if v is not None and 0 <= v <= mod // 2}
    assert {
        (r.k, r.v) for r in pr.where(f"v >= 0 and v <= {mod // 2}").collect()
    } == want


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    n=st.integers(min_value=40, max_value=160),
    n_buckets=st.integers(min_value=2, max_value=7),
    mod=st.integers(min_value=7, max_value=60),
    null_mod=st.integers(min_value=3, max_value=25),
    n_ingests=st.integers(min_value=2, max_value=4),
    bucket_mask=st.integers(min_value=1, max_value=127),
    n_new=st.integers(min_value=0, max_value=40),
    lo=st.integers(min_value=-5, max_value=70),
    width=st.integers(min_value=0, max_value=40),
)
def test_zonemap_fold_replace_vacuum_model_equivalence(
    spark, tmp_path_factory, n, n_buckets, mod, null_mod, n_ingests,
    bucket_mask, n_new, lo, width,
):
    """Round-12 mutations under RANDOM shapes, against a dict model:
    a MANIFEST-ONLY FOLD of an arbitrary multi-ingest history changes
    no answer (scan, predicated count, ANALYZE stats incl. exact NDV)
    and no-ops replays of folded batches; BUCKET-SCOPED REPLACE makes
    the listed buckets exactly the new rows (absent listed buckets
    tombstoned, stray-bucket rows refused, unlisted buckets
    untouched); a second fold + vacuum sweeps the dirs the rewrite
    superseded while every answer still matches the model and the
    plan-time manifest holds exactly one row per live bucket."""
    import os

    import pytest as _pytest

    from reair_spark.sources import (
        append_zonemapped,
        zonemap_count,
        zonemap_replace_buckets,
        zonemap_rewrite_manifests,
        zonemap_scan,
        zonemap_stats,
        zonemap_vacuum,
    )

    hi = lo + width
    rows = [
        (i, i % n_buckets,
         None if i % null_mod == 0 else (i * 13) % mod)
        for i in range(n)
    ]
    per = max(1, n // n_ingests)
    batches = [rows[i * per:(i + 1) * per] for i in range(n_ingests - 1)]
    batches.append(rows[(n_ingests - 1) * per:])
    batches = [b for b in batches if b]
    loc = str(tmp_path_factory.mktemp("zprop3") / "layout")
    for i, batch in enumerate(batches):
        append_zonemapped(
            spark.createDataFrame(batch, "k long, b long, v long"),
            loc, "b", ["v"], ndv_cols=["v"], ingest_id=i,
        )

    model = {(k, v) for k, _, v in rows}

    def check_all(expect):
        cur, _ = zonemap_scan(spark, loc)
        assert {(r.k, r.v) for r in cur.collect()} == expect
        assert zonemap_count(spark, loc)[0] == len(expect)
        inside = {
            (k, v) for k, v in expect
            if v is not None and lo <= v <= hi
        }
        assert zonemap_count(spark, loc, [("v", lo, hi)])[0] == len(inside)
        stats = {r.column: r for r in zonemap_stats(spark, loc).collect()}
        vals = [v for _, v in expect if v is not None]
        assert stats["v"].n_rows == len(expect)
        assert stats["v"].n_nulls == len(expect) - len(vals)
        if vals:
            assert int(stats["v"].min_value) == min(vals)
            assert int(stats["v"].max_value) == max(vals)
        assert stats["v"].ndv == len(set(vals))

    # --- manifest-only fold: every answer invariant ------------------
    res = zonemap_rewrite_manifests(spark, loc)
    if len(batches) > 1:
        assert res["deltas_after"] == 1
        assert res["fold_ingest"] == len(batches) - 1
    check_all(model)
    # replay of EVERY folded batch no-ops
    append_zonemapped(
        spark.createDataFrame(batches[0], "k long, b long, v long"),
        loc, "b", ["v"], ndv_cols=["v"], ingest_id=0,
    )
    check_all(model)

    # --- bucket-scoped replace ---------------------------------------
    listed = sorted(
        b for b in range(n_buckets) if bucket_mask & (1 << b)
    ) or [0]
    new_rows = [
        (10_000 + j, listed[j % len(listed)],
         None if j % null_mod == 2 else (j * 11) % mod)
        for j in range(n_new)
    ]
    # stray-bucket rows are refused loudly
    if len(listed) < n_buckets:
        stray_b = next(b for b in range(n_buckets) if b not in listed)
        with _pytest.raises(ValueError, match="outside the replace set"):
            zonemap_replace_buckets(
                spark, loc,
                spark.createDataFrame(
                    [(1, stray_b, 0)], "k long, b long, v long"
                ),
                listed,
            )
    rr = zonemap_replace_buckets(
        spark, loc,
        spark.createDataFrame(new_rows, "k long, b long, v long")
        if new_rows else
        spark.createDataFrame([], "k long, b long, v long"),
        listed,
    )
    present = {b for _, b, _ in new_rows}
    assert rr["n_buckets_tombstoned"] == len(set(listed) - present)
    model = {(k, v) for k, b, v in rows if b not in set(listed)}
    model |= {(k, v) for k, _, v in new_rows}
    check_all(model)

    # --- fold again + vacuum: superseded dirs swept, answers fixed ---
    zonemap_rewrite_manifests(spark, loc)
    out = zonemap_vacuum(spark, loc)
    check_all(model)
    # plan-time manifest = exactly one row per live bucket
    live_buckets = {b for k, b, v in rows if b not in set(listed)}
    live_buckets |= present
    man = spark.read.option("mergeSchema", "true").parquet(
        f"{loc}/manifest"
    )
    assert man.where("n_rows > 0").count() == len(live_buckets)


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    n=st.integers(min_value=40, max_value=160),
    n_buckets=st.integers(min_value=2, max_value=8),
    mod=st.integers(min_value=7, max_value=60),
    null_mod=st.integers(min_value=3, max_value=25),
    del_lo=st.integers(min_value=0, max_value=40),
    del_width=st.integers(min_value=0, max_value=30),
    upd_step=st.integers(min_value=2, max_value=9),
    upd_extra=st.integers(min_value=0, max_value=20),
    del2_lo=st.integers(min_value=0, max_value=60),
    del2_width=st.integers(min_value=0, max_value=25),
    q_lo=st.integers(min_value=0, max_value=50),
    q_width=st.integers(min_value=0, max_value=40),
)
def test_zonemap_mor_upsert_model_equivalence(
    spark, tmp_path_factory, n, n_buckets, mod, null_mod, del_lo,
    del_width, upd_step, upd_extra, del2_lo, del2_width, q_lo, q_width,
):
    """Merge-on-read mutations under RANDOM shapes, against a dict
    model: a positional (DV) delete, an equality upsert (updates +
    brand-new keys), and a second DV delete OVER the masked state —
    then scan/count/as-of equivalence, preserved across a metadata
    fold AND a full compaction (which folds both delete kinds into
    the data). SQL null semantics throughout: NULL v never matches a
    delete or count predicate."""
    from pyspark.sql import functions as F

    from reair_spark.sources import (
        write_zonemapped,
        zonemap_compact,
        zonemap_count,
        zonemap_delete,
        zonemap_rewrite_manifests,
        zonemap_scan,
        zonemap_upsert_mor,
    )

    dhi = del_lo + del_width
    d2hi = del2_lo + del2_width
    q_hi = q_lo + q_width
    rows = [
        (i, i % n_buckets,
         None if i % null_mod == 0 else (i * 13) % mod)
        for i in range(n)
    ]
    df = spark.createDataFrame(rows, "k long, b long, v long")
    loc = str(tmp_path_factory.mktemp("zmorprop") / "layout")
    write_zonemapped(df, loc, "b", stat_cols=["v"])
    model0 = {(k, v) for k, b, v in rows}

    def matches(v, a, b2):
        return v is not None and a <= v <= b2

    # 1. positional delete
    st1 = zonemap_delete(spark, loc, predicates=[("v", del_lo, dhi)],
                         mode="mor")
    model1 = {(k, v) for k, v in model0 if not matches(v, del_lo, dhi)}
    assert st1["n_rows_deleted"] == len(model0) - len(model1)

    # 2. equality upsert: every key ≡0 (mod upd_step) plus some new
    upd_keys = sorted({k for k in range(0, n + upd_extra, upd_step)})
    upd_rows = [(k, k % n_buckets, (k * 7) % mod) for k in upd_keys]
    upd = spark.createDataFrame(upd_rows, "k long, b long, v long")
    zonemap_upsert_mor(spark, loc, upd, key_cols=["k"])
    model2 = {(k, v) for k, v in model1 if k not in set(upd_keys)}
    model2 |= {(k, v) for k, b, v in upd_rows}

    # 3. second positional delete over the MASKED state
    st3 = zonemap_delete(spark, loc,
                         predicates=[("v", del2_lo, d2hi)], mode="mor")
    model3 = {(k, v) for k, v in model2
              if not matches(v, del2_lo, d2hi)}
    assert st3["n_rows_deleted"] == len(model2) - len(model3)

    def check(expect_model, max_ingest=None):
        cur, _ = zonemap_scan(spark, loc, max_ingest=max_ingest)
        assert {(r.k, r.v) for r in cur.collect()} == expect_model
        if max_ingest is None:
            assert zonemap_count(spark, loc)[0] == len(expect_model)
            assert zonemap_count(spark, loc, [("v", q_lo, q_hi)])[0] \
                == len({(k, v) for k, v in expect_model
                        if matches(v, q_lo, q_hi)})

    check(model3)
    check(model0, max_ingest=0)
    # a delete that matched nothing is a no-op (ingest_id None, no
    # commit) — the model-1 snapshot is then the seed snapshot
    check(model1, max_ingest=st1["ingest_id"]
          if st1["ingest_id"] is not None else 0)

    zonemap_rewrite_manifests(spark, loc)
    check(model3)
    zonemap_compact(spark, loc)
    check(model3)
