"""Custom operator unit tests: as-of join semantics, sessionization
gap boundaries, top-k per group."""

from __future__ import annotations

import datetime

import pytest

from pyspark.sql import functions as F

from reair_spark.operators import asof_join, sessionize, top_k_per_group


def _ts(s):
    return datetime.datetime.fromisoformat(s)


def test_asof_basic_and_no_match(spark):
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:00"), "a"), (1, _ts("2024-01-01 12:00"), "b"),
         (2, _ts("2024-01-01 09:00"), "c")],
        "k long, lt timestamp, tag string",
    )
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01 09:30"), 100), (1, _ts("2024-01-01 11:00"), 200),
         (2, _ts("2024-01-01 09:30"), 300)],  # after left's 09:00 → no match
        "k long, rt timestamp, v long",
    )
    out = {r.tag: r.v for r in asof_join(left, right, "k", "lt", "rt", ["v"]).collect()}
    assert out == {"a": 100, "b": 200, "c": None}


def test_asof_equal_timestamp_matches(spark):
    left = spark.createDataFrame([(1, _ts("2024-01-01 10:00"))], "k long, lt timestamp")
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:00"), 7)], "k long, rt timestamp, v long"
    )
    rows = asof_join(left, right, "k", "lt", "rt", ["v"]).collect()
    assert rows[0].v == 7


def test_asof_tolerance(spark):
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:00")), (1, _ts("2024-01-01 23:00"))],
        "k long, lt timestamp",
    )
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01 09:00"), 5)], "k long, rt timestamp, v long"
    )
    out = asof_join(
        left, right, "k", "lt", "rt", ["v"],
        tolerance=F.expr("INTERVAL 2 HOURS"),
    ).orderBy("lt").collect()
    assert out[0].v == 5       # 1h old → within tolerance
    assert out[1].v is None    # 14h old → dropped


def test_sessionize_gap_boundary(spark):
    rows = [
        (1, _ts("2024-01-01 10:00:00")),
        (1, _ts("2024-01-01 10:29:00")),   # within 30min gap → same session
        (1, _ts("2024-01-01 11:30:00")),   # 61min gap → new session
        (2, _ts("2024-01-01 10:00:00")),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = sessionize(df, "user_id", "ts", 1800).orderBy("user_id", "session_start").collect()
    assert [(r.user_id, r.n_events) for r in out] == [(1, 2), (1, 1), (2, 1)]


def test_top_k_per_group(spark):
    df = spark.createDataFrame(
        [(1, 10), (1, 30), (1, 20), (2, 5)], "k long, v long"
    )
    out = top_k_per_group(df, ["k"], [F.desc("v")], 2).orderBy("k", F.desc("v")).collect()
    assert [(r.k, r.v) for r in out] == [(1, 30), (1, 20), (2, 5)]


def test_range_join_boundaries_and_negatives(spark):
    from reair_spark.operators import range_join

    points = spark.createDataFrame(
        [(1, -150.0), (2, 0.0), (3, 99.9), (4, 100.0), (5, 250.0)],
        "pid long, v double",
    )
    intervals = spark.createDataFrame(
        [(10, -200.0, -100.0), (20, 0.0, 100.0), (30, 100.0, 100.0)],
        "iid long, lo double, hi double",
    )
    out = sorted(
        (r.pid, r.iid)
        for r in range_join(points, intervals, "v", "lo", "hi", 100.0).collect()
    )
    # inclusive boundaries on both ends; negative buckets handled
    assert out == [(1, 10), (2, 20), (3, 20), (4, 20), (4, 30)]


def test_exact_median_scalable_matches_percentile(spark, sf_dir):
    """Histogram-pruned distributed median == percentile(col, 0.5)
    bit-for-bit, including interpolation on even counts and constant
    columns; residual slice stays tiny."""
    from pyspark.sql import functions as F

    from reair_spark.io import load_table
    from reair_spark.operators import exact_median_scalable

    li = load_table(spark, sf_dir, "lineitem")
    got = exact_median_scalable(li, "l_extendedprice")
    ref = li.agg(F.expr("percentile(l_extendedprice, 0.5)")).first()[0]
    assert abs(got - ref) < 1e-9

    for vals in ([1.0], [1.0, 2.0], [3.0, 1.0, 2.0], [5.0] * 10):
        df = spark.createDataFrame([(v,) for v in vals], "x double")
        assert abs(
            exact_median_scalable(df, "x")
            - df.agg(F.expr("percentile(x, 0.5)")).first()[0]
        ) < 1e-12
    assert exact_median_scalable(
        spark.createDataFrame([], "x double"), "x") is None


def test_exact_percentiles_scalable_matches_percentile_array(spark, sf_dir):
    """Multi-quantile histogram prune == percentile(col, array(...))
    per-prob, with all quantiles sharing one histogram pass and one
    residual fetch (including extreme p=0/p=1 and tiny inputs where
    several ranks land in the same bucket)."""
    from pyspark.sql import functions as F

    from reair_spark.io import load_table
    from reair_spark.operators import exact_percentiles_scalable

    probs = [0.0, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0]
    arr = "array(" + ",".join(str(p) for p in probs) + ")"

    li = load_table(spark, sf_dir, "lineitem")
    got = exact_percentiles_scalable(li, "l_extendedprice", probs)
    ref = li.agg(F.expr(f"percentile(l_extendedprice, {arr})")).first()[0]
    assert len(got) == len(ref)
    for g, r in zip(got, ref):
        assert abs(g - r) < 1e-9

    for vals in ([1.0], [1.0, 2.0], [3.0, 1.0, 2.0], [5.0] * 10,
                 [float(i) for i in range(7)]):
        df = spark.createDataFrame([(v,) for v in vals], "x double")
        got = exact_percentiles_scalable(df, "x", probs, n_buckets=4)
        ref = df.agg(F.expr(f"percentile(x, {arr})")).first()[0]
        for g, r in zip(got, ref):
            assert abs(g - r) < 1e-12
    assert exact_percentiles_scalable(
        spark.createDataFrame([], "x double"), "x", probs) is None


def test_interval_overlap_join_exact_no_duplicates(spark):
    """The first-shared-bucket emit must produce each overlapping pair
    EXACTLY once even when intervals span many buckets, match a brute-
    force cross join, and handle negatives/touching endpoints."""
    from reair_spark.operators import interval_overlap_join

    left = spark.createDataFrame(
        [(1, -30.0, 25.0), (2, 0.0, 1.0), (3, 90.0, 200.0), (4, -100.0, -50.0)],
        "lid long, ls double, le double",
    )
    right = spark.createDataFrame(
        [(10, -60.0, -30.0), (11, 0.5, 120.0), (12, 25.0, 26.0), (13, 300.0, 301.0)],
        "rid long, rs double, re double",
    )
    got = sorted(
        (r.lid, r.rid)
        for r in interval_overlap_join(
            left, right, "ls", "le", "rs", "re", bucket_width=10.0
        ).collect()
    )
    brute = sorted(
        (r.lid, r.rid)
        for r in left.crossJoin(right)
        .where("ls <= re AND rs <= le")
        .collect()
    )
    assert got == brute
    # known overlaps: touching endpoint (1,10) at -30, wide spans
    assert (1, 10) in got and (3, 11) in got and (1, 12) in got
    assert len(got) == len(set(got))  # no duplicate emissions


def test_merge_partial_aggs_equals_full_aggregate(spark):
    """IVM algebra: for ANY split of the facts into base/delta, merging
    the two partial-aggregate tables equals the full aggregate."""
    from reair_spark.operators import merge_partial_aggs

    rows = [(i % 7, (i * 13) % 5, float((i * 31) % 97)) for i in range(500)]
    df = spark.createDataFrame(rows, "k int, g int, v double")

    def partial(d):
        return d.groupBy("k").agg(
            F.count(F.lit(1)).alias("n"), F.sum("v").alias("s")
        )

    full = {r.k: (r.n, r.s) for r in partial(df).collect()}
    for mod in (2, 3, 10):  # several asymmetric splits
        base = partial(df.where(F.col("g") % mod != 0))
        delta = partial(df.where(F.col("g") % mod == 0))
        merged = {
            r.k: (r.n, r.s)
            for r in merge_partial_aggs(
                base, delta, keys=["k"], sums=["n", "s"]
            ).collect()
        }
        assert set(merged) == set(full)
        for k in full:
            assert merged[k][0] == full[k][0]
            assert abs(merged[k][1] - full[k][1]) < 1e-9


def test_exact_percentiles_skew_guard_bounds_driver_fetch(spark):
    """VERDICT r4 #3: a column where one interior value holds 90% of
    the rows puts ~n rows in one bucket; the guard must recurse into a
    sub-histogram (or resolve the constant bucket from its min==max
    agg) and keep the driver fetch bounded — while still matching
    percentile() bit-for-bit."""
    from pyspark.sql import functions as F

    from reair_spark.operators import exact_percentiles_scalable

    n = 10_000
    # 90% sit on the sentinel value 500.0 (interior); the rest spread
    df = spark.range(n).select(
        F.when(F.col("id") % 10 != 0, F.lit(500.0))
        .otherwise((F.col("id") % 997).cast("double"))
        .alias("x")
    )
    probs = [0.01, 0.25, 0.5, 0.9, 0.99]
    stats: dict = {}
    got = exact_percentiles_scalable(
        df, "x", probs, n_buckets=100, residual_cap=200, _stats=stats
    )
    arr = "array(" + ",".join(str(p) for p in probs) + ")"
    ref = df.agg(F.expr(f"percentile(x, {arr})")).first()[0]
    assert got == pytest.approx(list(ref), abs=0.0)  # bit-for-bit
    # the 9000-row bucket was never collected: everything fetched
    # stayed under the cap per straddled bucket (plus the cold ones)
    assert stats.get("collected", 0) <= 5 * 200
    assert stats.get("recursions", 0) >= 1


def test_exact_percentiles_skew_guard_spread_hot_bucket(spark):
    """Hot bucket whose values are NOT constant: the recursion must
    split it with a sub-histogram and still match percentile()."""
    from pyspark.sql import functions as F

    from reair_spark.operators import exact_percentiles_scalable

    # 10k rows crammed into [100, 101) on a [0, 1000] scale: with
    # n_buckets=100 one bucket holds ~everything, values all distinct
    df = spark.range(10_000).select(
        F.when(F.col("id") < 9_900,
               100.0 + (F.col("id") % 9_900) / 9_900.0)
        .otherwise((F.col("id") - 9_900).cast("double") * 100.0)
        .alias("x")
    )
    probs = [0.1, 0.5, 0.95]
    stats: dict = {}
    got = exact_percentiles_scalable(
        df, "x", probs, n_buckets=100, residual_cap=500, _stats=stats
    )
    arr = "array(" + ",".join(str(p) for p in probs) + ")"
    ref = df.agg(F.expr(f"percentile(x, {arr})")).first()[0]
    assert got == pytest.approx(list(ref), rel=0, abs=1e-9)
    assert stats.get("recursions", 0) >= 1
    assert stats.get("collected", 0) <= 10 * 500


def test_merge_partial_aggs_typed_state(spark):
    """Dict-form merges min/max partials with their own combiners;
    result equals recomputing the aggregate over the union of facts."""
    from reair_spark.operators import merge_partial_aggs

    facts1 = spark.createDataFrame(
        [("a", 1.0), ("a", 5.0), ("b", 2.0)], "k string, v double"
    )
    facts2 = spark.createDataFrame(
        [("a", -3.0), ("b", 9.0), ("c", 4.0)], "k string, v double"
    )
    state = lambda df: df.groupBy("k").agg(  # noqa: E731
        F.sum("v").alias("total"), F.count("*").alias("n"),
        F.min("v").alias("lo"), F.max("v").alias("hi"),
    )
    merged = merge_partial_aggs(
        state(facts1), state(facts2), ["k"],
        {"total": "sum", "n": "count", "lo": "min", "hi": "max"},
    )
    expect = {r.k: (r.total, r.n, r.lo, r.hi)
              for r in state(facts1.union(facts2)).collect()}
    got = {r.k: (r.total, r.n, r.lo, r.hi) for r in merged.collect()}
    assert got == expect

    import pytest as _pt

    with _pt.raises(ValueError, match="unsupported merge fns"):
        merge_partial_aggs(state(facts1), state(facts2), ["k"], {"lo": "avg"})


def test_kmv_regimes_and_mergeability(spark):
    """KMV: below-k inputs are EXACT; above-k estimates land within
    4/sqrt(k) of truth on uniform synthetic sets; and the union
    signature equals the k-min of the merged per-side signatures
    (mergeability — the property that makes KMV distributable)."""
    import pyspark.sql.functions as F

    from reair_spark.datapipe.common import portable_hash32
    from reair_spark.extra_queries import KMV_K

    def signature(df):
        return (
            df.select(
                portable_hash32(
                    F.concat(F.lit("kmv:"), F.col("key").cast("string"))
                ).alias("h")
            )
            .distinct()
            .orderBy("h")
            .limit(KMV_K)
        )

    # exact regime: 100 < k values
    small = spark.range(100).select(F.col("id").alias("key"))
    hk = [r.h for r in signature(small).collect()]
    assert len(hk) == 100  # sketch IS the set

    # estimate regime: 20k values, estimate within 4/sqrt(k)
    big = spark.range(20000).select(F.col("id").alias("key"))
    hs = [r.h for r in signature(big).collect()]
    assert len(hs) == KMV_K
    est = (KMV_K - 1) * 4294967296 // max(hs)
    assert abs(est - 20000) / 20000 < 4 / KMV_K**0.5

    # mergeability: sig(A ∪ B) == k-min(sig(A) ∪ sig(B))
    a = spark.range(0, 15000).select(F.col("id").alias("key"))
    b = spark.range(10000, 25000).select(F.col("id").alias("key"))
    direct = [r.h for r in signature(a.unionByName(b)).collect()]
    merged = sorted(
        {r.h for r in signature(a).collect()}
        | {r.h for r in signature(b).collect()}
    )[:KMV_K]
    assert direct == merged
