"""The metadata session (sources._meta_spark) must carry the narrow
manifest-evaluation conf WITHOUT ever mutating the shared session —
r13 set/restored AQE + shuffle width on the caller's session around
each metadata action, which a query planned concurrently on another
thread (a foreachBatch micro-batch, a background maintenance call)
could observe (VERDICT r13 #5 / ADVICE r13)."""

from __future__ import annotations

import threading
import time

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def layout(spark, tmp_path_factory):
    from reair_spark.io import load_table
    from reair_spark.sources import write_zonemapped

    loc = str(tmp_path_factory.mktemp("meta_session") / "orders16")
    o = (
        load_table(spark, SF_SMOKE, "orders")
        .select("o_orderkey", "o_totalprice")
        .withColumn("bucket", F.pmod("o_orderkey", F.lit(16)))
    )
    write_zonemapped(o, loc, "bucket",
                     stat_cols=["o_orderkey", "o_totalprice"])
    return loc


def test_meta_session_is_isolated(spark):
    from reair_spark.sources import _META_CONF, _meta_spark

    ms = _meta_spark(spark)
    assert ms is not spark
    assert ms is _meta_spark(spark)  # cached per application
    # same context, session-local conf
    assert ms.sparkContext is spark.sparkContext
    for k, v in _META_CONF:
        assert ms.conf.get(k) == v
    # semantics-bearing confs agree with the engine session
    assert ms.conf.get("spark.sql.session.timeZone") == spark.conf.get(
        "spark.sql.session.timeZone"
    )


def test_plan_results_unchanged_and_conf_untouched(spark, layout):
    from reair_spark.sources import zonemap_plan

    aqe_before = spark.conf.get("spark.sql.adaptive.enabled")
    parts_before = spark.conf.get("spark.sql.shuffle.partitions")
    bucket_col, kept, stats = zonemap_plan(
        spark, layout, predicates=[("o_totalprice", 900.0, 5000.0)]
    )
    assert bucket_col == "bucket"
    assert 0 < stats["n_buckets_read"] <= stats["n_buckets_total"] == 16
    assert spark.conf.get("spark.sql.adaptive.enabled") == aqe_before
    assert (
        spark.conf.get("spark.sql.shuffle.partitions") == parts_before
    )


def test_concurrent_plans_never_flip_main_session_conf(spark, layout):
    """Hammer zonemap_plan + zonemap_stats + a vacuum horizon read on
    a worker thread while the main thread polls the shared session's
    conf: under the r13 conf-window implementation the poll observed
    adaptive.enabled=false / partitions=4 within a few iterations."""
    from reair_spark.sources import zonemap_count, zonemap_plan, zonemap_stats

    aqe0 = spark.conf.get("spark.sql.adaptive.enabled")
    parts0 = spark.conf.get("spark.sql.shuffle.partitions")
    stop = threading.Event()
    errors: list[Exception] = []

    def hammer():
        try:
            for _ in range(6):
                zonemap_plan(spark, layout)
                zonemap_stats(spark, layout).collect()
                zonemap_count(spark, layout,
                              predicates=[("o_totalprice", 0.0, 1e12)])
        except Exception as e:  # pragma: no cover - surfaced below
            errors.append(e)
        finally:
            stop.set()

    t = threading.Thread(target=hammer, daemon=True)
    t.start()
    flips = 0
    while not stop.is_set():
        if (
            spark.conf.get("spark.sql.adaptive.enabled") != aqe0
            or spark.conf.get("spark.sql.shuffle.partitions") != parts0
        ):
            flips += 1
        time.sleep(0.002)
    t.join(timeout=120)
    assert not errors, errors
    assert flips == 0
    assert spark.conf.get("spark.sql.adaptive.enabled") == aqe0
    assert spark.conf.get("spark.sql.shuffle.partitions") == parts0
