"""Partition-scale study (VERDICT r6 ask #1): the replication metadata
path at the reference's "millions of partitions" design point
(TableCompareWorker.java:43-48, MetastoreReplicationJob.java 150-way
parallelism knobs).

Three properties are enforced, not just measured:
  1. correctness at scale — the digest of diff actions + copy tasks
     over a 50k-partition synthetic warehouse equals the closed-form
     derivation (the DuckDB gate re-checks this every round);
  2. zero driver-side rows — the whole pipeline compiles to a plan fed
     by Range (spark.range), with no LocalTableScan/ExistingRDD (a
     driver-materialized snapshot would show up as one) and no Python;
  3. driver work flat in partition count — the Spark JOB count at 10×
     the partitions is the same (jobs are driver actions; a per-
     partition driver loop would multiply them).
"""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from reair_spark.scalebench import (
    partition_scale_oracle_sql,
    scale_pipeline,
    synthetic_partition_snapshots,
)


def _canon(rows):
    return sorted(tuple(r) for r in rows)


def test_digest_matches_closed_form_small(spark):
    got = _canon(
        (r.stage, r.action, r.update_metadata, r.update_data, r.n, r.bytes)
        for r in scale_pipeline(spark, 2000).collect()
    )
    want = _canon(duckdb.connect().execute(
        partition_scale_oracle_sql(2000)).fetchall())
    assert got == want


def test_scenario_composition(spark):
    """The synthetic snapshots have the advertised shape: skewed table
    sizes (t0 holds ~half), dest missing/drifted/newer thirds."""
    src, dest = synthetic_partition_snapshots(spark, 2000)
    by_tbl = {r.table: r.n for r in
              src.groupBy("table").agg(F.count("*").alias("n")).collect()}
    # mega-table skew: t0 holds half the corpus, ~20× the tail tables
    assert by_tbl["t0"] == 1000
    assert max(v for t, v in by_tbl.items() if t != "t0") <= 60
    assert src.count() == 2000
    assert dest.count() == 2000 - 200 + 100  # minus missing, plus extras


def test_pipeline_is_range_fed_no_driver_rows_no_python(spark):
    """Plan shape: every leaf is Range; nothing was parallelized from
    driver memory and no Python executes anywhere in the path."""
    plan = scale_pipeline(spark, 50_000)._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted")
    )
    assert "Range" in plan
    assert "LocalTableScan" not in plan
    assert "Scan ExistingRDD" not in plan
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_driver_job_count_flat_at_10x(spark):
    """Driver actions must not scale with partition count: same job
    count at 5k and 50k partitions (AQE may add sub-jobs; allow +2
    jitter, never proportional growth)."""
    sc = spark.sparkContext

    def jobs_at(n: int) -> int:
        group = f"pscale-test-{n}"
        sc.setJobGroup(group, "scale study")
        scale_pipeline(spark, n).collect()
        sc.setJobGroup("", "")
        return len(sc.statusTracker().getJobIdsForGroup(group))

    j1, j10 = jobs_at(5_000), jobs_at(50_000)
    assert j10 <= j1 + 2, f"jobs scaled with partitions: {j1} -> {j10}"


def test_no_createDataFrame_in_pipeline(spark, monkeypatch):
    """Belt-and-braces for property 2: SparkSession.createDataFrame
    (the driver-rows entry point) is never called while building and
    running the pipeline."""
    calls = []
    orig = type(spark).createDataFrame

    def counting(self, *a, **kw):
        calls.append(1)
        return orig(self, *a, **kw)

    monkeypatch.setattr(type(spark), "createDataFrame", counting)
    scale_pipeline(spark, 20_000).collect()
    assert calls == []


# ---- audit-event compile path at scale (same discipline) -----------


def test_compile_digest_matches_closed_form_small(spark):
    import duckdb

    from reair_spark.scalebench import (
        compile_scale_oracle_sql,
        compile_scale_pipeline,
    )

    got = _canon(
        (r.operation, r.n, r.n_partitions)
        for r in compile_scale_pipeline(spark, 5000).collect()
    )
    want = _canon(duckdb.connect().execute(
        compile_scale_oracle_sql(5000)).fetchall())
    assert got == want


def test_compile_pipeline_range_fed_no_python(spark):
    from reair_spark.scalebench import compile_scale_pipeline

    plan = compile_scale_pipeline(spark, 50_000)._jdf.queryExecution() \
        .explainString(spark._jvm.org.apache.spark.sql.execution
                       .ExplainMode.fromString("formatted"))
    assert "Range" in plan
    assert "LocalTableScan" not in plan
    assert "Scan ExistingRDD" not in plan
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_compile_job_count_flat_at_10x(spark):
    from reair_spark.scalebench import compile_scale_pipeline

    sc = spark.sparkContext

    def jobs_at(n: int) -> int:
        group = f"cscale-test-{n}"
        sc.setJobGroup(group, "compile scale study")
        compile_scale_pipeline(spark, n).collect()
        sc.setJobGroup("", "")
        return len(sc.statusTracker().getJobIdsForGroup(group))

    j1, j10 = jobs_at(10_000), jobs_at(100_000)
    assert j10 <= j1 + 2, f"jobs scaled with events: {j1} -> {j10}"


def test_compile_stream_batch_boundary_invariance(spark):
    """Micro-batch boundaries must not change the compiled jobs: the
    4-batch streaming run digests identically to the single-batch
    gate form AND to the batch-mode pipeline (three-way path
    equivalence at 20k events)."""
    from reair_spark.scalebench import (
        compile_scale_pipeline,
        compile_scale_stream,
    )

    def canon(df):
        return _canon(
            (r.operation, r.n, r.n_partitions) for r in df.collect()
        )

    one = canon(compile_scale_stream(spark, 20_000))
    multi = canon(compile_scale_stream(spark, 20_000, files_per_trigger=1))
    batch = canon(compile_scale_pipeline(spark, 20_000))
    assert one == multi == batch


# ---- file-inventory path at scale (stage-2 twin, same discipline) --


def test_file_digest_matches_closed_form_small(spark):
    from reair_spark.scalebench import (
        file_scale_oracle_sql,
        file_scale_pipeline,
    )

    got = _canon(
        (r.stage, r.action, r.n, r.bytes)
        for r in file_scale_pipeline(spark, 3000).collect()
    )
    want = _canon(duckdb.connect().execute(
        file_scale_oracle_sql(3000)).fetchall())
    assert got == want


def test_file_scenario_latest_root_wins(spark):
    """The id%10==3 class exists under BOTH src roots; the dest copy
    matches the NEWER root's (size, mtime), so those rel_paths are
    NO_OP iff the W1 latest-mtime window picked /src-b — a wrong
    winner would surface them as UPDATE."""
    from reair_spark.dirsync import sync_plan_from_listings
    from reair_spark.scalebench import synthetic_file_listings

    src, dest = synthetic_file_listings(spark, 1000)
    plan = sync_plan_from_listings(src, dest, compare_mtime=True)
    fid = F.expr("CAST(regexp_extract(rel_path, 'f(\\\\d+)$', 1) AS BIGINT)")
    # fid < 1000 excludes the dest-only DELETE extras (ids 1000..1049)
    rows = plan.filter((fid % 10 == 3) & (fid < 1000)).collect()
    assert len(rows) == 100
    assert all(r.action == "NO_OP" for r in rows)
    assert all(r.src_root == "/src-b" for r in rows)


def test_file_pipeline_is_range_fed_no_driver_rows_no_python(spark):
    from reair_spark.scalebench import file_scale_pipeline

    plan = file_scale_pipeline(
        spark, 50_000
    )._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted")
    )
    assert "Range" in plan
    assert "LocalTableScan" not in plan
    assert "Scan ExistingRDD" not in plan
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_file_driver_job_count_flat_at_100x(spark):
    """Driver actions must not scale with FILE count: same job count
    at 20k and 2M files (100×). Jobs are driver-side loops in
    disguise; a per-file or per-dir driver iteration would multiply
    them."""
    from reair_spark.scalebench import file_scale_pipeline

    sc = spark.sparkContext

    def jobs_at(n: int) -> int:
        group = f"fscale-test-{n}"
        sc.setJobGroup(group, "file scale study")
        file_scale_pipeline(spark, n).collect()
        sc.setJobGroup("", "")
        return len(sc.statusTracker().getJobIdsForGroup(group))

    j1, j100 = jobs_at(20_000), jobs_at(2_000_000)
    assert j100 <= j1 + 2, f"jobs scaled with files: {j1} -> {j100}"


def test_file_no_createDataFrame_in_pipeline(spark, monkeypatch):
    from reair_spark.scalebench import file_scale_pipeline

    calls = []
    orig = type(spark).createDataFrame

    def counting(self, *a, **kw):
        calls.append(1)
        return orig(self, *a, **kw)

    monkeypatch.setattr(type(spark), "createDataFrame", counting)
    file_scale_pipeline(spark, 20_000).collect()
    assert calls == []


# ---- zone-map manifest planning at scale (same discipline) ---------


def test_zonemap_plan_matches_closed_form_small(spark):
    import duckdb

    from reair_spark.scalebench import (
        zonemap_plan_scale,
        zonemap_scale_oracle_sql,
    )

    stats = zonemap_plan_scale(spark, 5_000)
    want = duckdb.connect().execute(zonemap_scale_oracle_sql(5_000)).fetchone()
    assert (
        stats["n_buckets_total"],
        stats["n_buckets_read"],
        stats["n_rows_scanned"],
    ) == want


def test_zonemap_plan_job_count_flat_at_10x(spark):
    """Planning jobs must not scale with manifest size (the merge agg
    and the kept-rows collect are the same TWO jobs at any size)."""
    sc = spark.sparkContext
    from reair_spark.scalebench import (
        synthetic_zonemap_manifest,
        zonemap_plan_scale,
    )

    def jobs_at(n: int) -> int:
        synthetic_zonemap_manifest(spark, n)  # build outside the count
        group = f"zmscale-test-{n}"
        sc.setJobGroup(group, "zm scale study")
        zonemap_plan_scale(spark, n)
        sc.setJobGroup("", "")
        return len(sc.statusTracker().getJobIdsForGroup(group))

    j1, j10 = jobs_at(10_000), jobs_at(100_000)
    assert j10 <= j1 + 2, f"jobs scaled with manifest: {j1} -> {j10}"


def test_zonemap_plan_no_createDataFrame(spark, monkeypatch):
    calls = []
    orig = type(spark).createDataFrame

    def counting(self, *a, **kw):
        calls.append(1)
        return orig(self, *a, **kw)

    monkeypatch.setattr(type(spark), "createDataFrame", counting)
    from reair_spark.scalebench import zonemap_plan_scale

    zonemap_plan_scale(spark, 20_000)
    assert calls == []


# ---- MERGE/DELETE at metadata scale (VERDICT r10 ask #5) -----------


def test_merge_scale_matches_closed_form_small(spark):
    from reair_spark.scalebench import merge_scale_scenario

    r = merge_scale_scenario(spark, 2_000)
    assert r == {
        "n_buckets_total": 2_000,
        "n_buckets_affected_merge": 5,
        "n_buckets_affected_delete": 1,
        "n_rows_deleted": 3,
        "n_rows": 197,
        # sum(0..199) - (3+13+23+33+43) + sum(9000..9004) - (153+154+155)
        "sum_v": 64333,
    }


def test_merge_scale_job_count_flat_at_10x(spark):
    """A merge+delete touching the same k buckets must launch the same
    Spark jobs whether the manifest claims 20k or 200k buckets — the
    bucket-scoped copy-on-write claim, measured."""
    sc = spark.sparkContext
    from reair_spark.scalebench import (
        merge_scale_scenario,
        synthetic_merge_layout,
    )

    def jobs_at(n: int) -> int:
        synthetic_merge_layout(spark, n)  # template outside the count
        group = f"mergescale-test-{n}"
        sc.setJobGroup(group, "merge scale study")
        merge_scale_scenario(spark, n)
        sc.setJobGroup("", "")
        return len(sc.statusTracker().getJobIdsForGroup(group))

    j1, j10 = jobs_at(20_000), jobs_at(200_000)
    assert j10 <= j1 + 2, f"jobs scaled with manifest: {j1} -> {j10}"


def test_merge_scale_no_createDataFrame(spark, monkeypatch):
    calls = []
    orig = type(spark).createDataFrame

    def counting(self, *a, **kw):
        calls.append(1)
        return orig(self, *a, **kw)

    monkeypatch.setattr(type(spark), "createDataFrame", counting)
    from reair_spark.scalebench import merge_scale_scenario

    merge_scale_scenario(spark, 20_000)
    assert calls == []


# ---- publish-watermark side table at scale (VERDICT r12 ask #1) ----


def test_pubmap_digest_matches_closed_form_small(spark):
    import duckdb

    from reair_spark.scalebench import (
        pubmap_diff_scale,
        pubmap_scale_oracle_sql,
    )

    got = pubmap_diff_scale(spark, 5_000)
    exp = duckdb.sql(pubmap_scale_oracle_sql(5_000)).fetchone()
    assert (got["n_recorded"], got["n_changed"], got["n_dropped"],
            got["n_affected_buckets"], got["n_co_read"]) == exp


def test_pubmap_driver_rows_flat_and_descriptor_o1(spark, monkeypatch):
    """The verdict's done-criterion: against 10× the partitions, the
    watermark diff collects the SAME change-sized row count, runs the
    same job count, never calls createDataFrame, and no descriptor
    grows with the partition count (the side table replaced the
    published_partitions map)."""
    import os

    from reair_spark.scalebench import (
        _PUBMAP_SCALE_STATE,
        pubmap_measure_scale,
        synthetic_pubmap_state,
    )

    # build the states BEFORE arming the createDataFrame counter
    synthetic_pubmap_state(spark, 5_000)
    synthetic_pubmap_state(spark, 50_000)

    calls = []
    orig = type(spark).createDataFrame

    def counting(self, *a, **kw):
        calls.append(1)
        return orig(self, *a, **kw)

    monkeypatch.setattr(type(spark), "createDataFrame", counting)
    rows = pubmap_measure_scale(spark, (5_000, 50_000))
    assert calls == []

    r1, r10 = rows
    assert r10["driver_rows_collected"] <= r1["driver_rows_collected"] + 4
    assert r10["spark_jobs"] <= r1["spark_jobs"] + 2
    assert r1["n_changed"] == r10["n_changed"] == 1
    assert r1["n_dropped"] == r10["n_dropped"] == 1

    # descriptor O(1): the watermark home carries NO _meta.json at all
    # here, and the side-table layout keeps state in parquet deltas
    for n in (5_000, 50_000):
        base = _PUBMAP_SCALE_STATE[(spark.sparkContext.applicationId, n)]
        assert not os.path.exists(f"{base}/_meta.json")
        assert os.path.isdir(f"{base}/_pubmap/ingest=0")


def test_pubmap_fold_bounds_deltas_and_preserves_state(spark, tmp_path):
    """Watermark deltas fold like manifest deltas: PUBMAP_FOLD_AT
    appends collapse to one delta at the highest id, the merged view
    is unchanged, and tombstones collapse to absence."""
    from pyspark.sql import functions as F

    from reair_spark.replicate import (
        PUBMAP_SCHEMA,
        _pubmap_delta_ids,
        _pubmap_read,
    )
    from reair_spark.replicate import _pubmap_append as pa

    loc = str(tmp_path / "pm")
    pa(spark, loc, spark.createDataFrame(
        [("om=a", "100", ["0"], False), ("om=b", "100", ["1"], False)],
        PUBMAP_SCHEMA,
    ))
    for i in range(6):
        pa(spark, loc, spark.createDataFrame(
            [("om=a", str(200 + i), ["0", str(i)], False)],
            PUBMAP_SCHEMA,
        ))
    pa(spark, loc, spark.createDataFrame(
        [("om=b", None, None, True)], PUBMAP_SCHEMA,   # drop om=b
    ))
    # 8 appends hit PUBMAP_FOLD_AT → folded to ONE delta at the top id
    assert _pubmap_delta_ids(loc) == [7]
    state = {r["pname"]: (r["tldt"], sorted(r["buckets"] or []))
             for r in _pubmap_read(spark, loc).collect()}
    assert state == {"om=a": ("205", ["0", "5"])}

    # appends after the fold keep layering
    pa(spark, loc, spark.createDataFrame(
        [("om=b", "300", ["9"], False)], PUBMAP_SCHEMA,
    ))
    assert _pubmap_delta_ids(loc) == [7, 8]
    state = {r["pname"]: r["tldt"]
             for r in _pubmap_read(spark, loc).collect()}
    assert state == {"om=a": "205", "om=b": "300"}


def test_pubmap_model_equivalence_property(spark, tmp_path):
    """Hypothesis model check: an arbitrary interleaving of watermark
    upserts, drops, and folds over the _pubmap side table reads back
    exactly as a dict model — latest write per pname wins, tombstones
    erase, folds never change the merged view."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from reair_spark.replicate import (
        PUBMAP_SCHEMA,
        _pubmap_append,
        _pubmap_fold,
        _pubmap_read,
    )

    pnames = ["om=a", "om=b", "om=c"]
    op = st.one_of(
        st.tuples(st.just("up"), st.sampled_from(pnames),
                  st.text("xy", min_size=1, max_size=3),
                  st.lists(st.sampled_from(["0", "1", "2"]),
                           max_size=2, unique=True)),
        st.tuples(st.just("drop"), st.sampled_from(pnames)),
        st.tuples(st.just("fold"),),
    )

    counter = [0]

    @settings(max_examples=12, deadline=None,
              suppress_health_check=list(HealthCheck))
    @given(ops=st.lists(op, min_size=1, max_size=8))
    def run(ops):
        counter[0] += 1
        loc = str(tmp_path / f"pm{counter[0]}")
        model: dict = {}
        batch = []
        for o in ops:
            if o[0] == "up":
                _, p, t, bks = o
                batch.append((p, t, sorted(bks), False))
                model[p] = {"tldt": t, "buckets": sorted(bks)}
            elif o[0] == "drop":
                _, p = o
                batch.append((p, None, None, True))
                model.pop(p, None)
            else:
                if batch:
                    _pubmap_append(
                        spark, loc,
                        spark.createDataFrame(batch, PUBMAP_SCHEMA),
                        fold_at=10**9,
                    )
                    batch = []
                _pubmap_fold(spark, loc)
            # within one delta, later rows for the same pname are
            # ambiguous — flush per op to keep ordering exact
            if batch:
                _pubmap_append(
                    spark, loc,
                    spark.createDataFrame(batch, PUBMAP_SCHEMA),
                    fold_at=10**9,
                )
                batch = []
        df = _pubmap_read(spark, loc)
        got = {} if df is None else {
            r["pname"]: {"tldt": r["tldt"],
                         "buckets": sorted(r["buckets"] or [])}
            for r in df.collect()
        }
        assert got == model

    run()
