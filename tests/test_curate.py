"""Dataset-curation operators (sampling, decontamination, packing,
PII masking) — SURVEY §8.3 training-data pipeline extensions."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from reair_spark.datapipe.curate import (
    PACK_CTX,
    SAMPLE_RATES,
    curate_decontaminate,
    curate_pack_sequences,
    curate_pii_mask,
    curate_pipeline,
    curate_sample_stratified,
)

SF = "/root/testdata/sf0.01"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF), reason="driver testdata not present"
)


def test_stratified_sample_rates(spark):
    out = curate_sample_stratified(spark, SF).cache()
    total = spark.read.parquet(f"{SF}/documents.parquet")
    by_lang = {r.lang: r.n for r in total.groupBy("lang").agg(
        F.count("*").alias("n")).collect()}
    kept = {r.lang: r.n for r in out.groupBy("lang").agg(
        F.count("*").alias("n")).collect()}
    # en downsampled hard; others kept near their 80% rate
    for lang, rate in SAMPLE_RATES.items():
        frac = kept.get(lang, 0) / by_lang[lang]
        assert abs(frac - rate / 100) < 0.2, (lang, frac, rate)
    # deterministic: same rows on re-run
    again = curate_sample_stratified(spark, SF)
    assert sorted(r.doc_id for r in out.collect()) == sorted(
        r.doc_id for r in again.collect())


def test_decontaminate_flags_overlap(spark):
    out = curate_decontaminate(spark, SF).collect()
    assert len(out) > 0
    assert all(r.n_shared >= 3 for r in out)
    # no eval doc may appear in the contaminated train list
    assert all(r.doc_id % 97 != 0 for r in out)


def test_pack_sequences_invariants(spark):
    bins = curate_pack_sequences(spark, SF).collect()
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    n_docs = docs.count()
    assert sum(r.n_docs for r in bins) == n_docs
    # a doc never exceeds the window by construction of the cumsum cut:
    # every bin's token load is < CTX + max single doc length
    max_doc = docs.select(F.max(F.size(F.split("text", " ")))).first()[0]
    assert all(r.bin_tokens < PACK_CTX + max_doc for r in bins)
    # bins within a lang are dense from 0
    for lang in {r.lang for r in bins}:
        seq = sorted(r.bin for r in bins if r.lang == lang)
        assert seq == list(range(len(seq)))


def test_pii_mask_shape(spark):
    out = curate_pii_mask(spark, SF)
    row = out.orderBy("custkey").first()
    assert row.masked_name.startswith("Customer#")
    digits_left = [c for c in row.masked_name.split("#")[1][:-4] if c.isdigit()]
    assert digits_left == []           # all but last 4 digits masked
    assert row.masked_name[-4:].isdigit()
    assert len(row.pseudonym) == 32    # md5 hex
    # pseudonym is stable and collision-free across the table
    n = out.count()
    assert out.select("pseudonym").distinct().count() == n


def test_pipeline_yield_and_plan(spark):
    """The composed curation DAG yields a plausible fraction of the
    corpus per language, and the map-only stages (quality, dedup hash,
    sample predicate) fuse — only two exchanges in the whole plan
    (dedup groupBy + pack window), not one per stage."""
    out = curate_pipeline(spark, SF).collect()
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    by_lang = {r.lang: r.n for r in docs.groupBy("lang").agg(
        F.count("*").alias("n")).collect()}
    for r in out:
        assert 0 < r.n_docs <= by_lang[r.lang]
        assert 0 < r.n_bins <= r.n_docs
        assert r.total_tokens >= r.n_docs * 10  # quality floor is 10 words

    plan = curate_pipeline(spark, SF)._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"))
    # window(fp) + window(lang pack) + final agg = 3 shuffles max
    assert plan.count("Exchange") <= 4, plan


def test_pipeline_work_dir_same_result_chunked_plan(spark, tmp_path):
    """work_dir= is the production path: stage 3 materializes to
    parquet and stage 4 packs via chunked_running_sum. Same rows as
    the default plan; the pack window partitions on (lang, __chunk),
    whose cardinality scales with the corpus instead of |languages|."""
    base = sorted(map(tuple, curate_pipeline(spark, SF).collect()))
    # pack_chunk=64: sf0.01's doc_id range must actually split into
    # several chunks so the cardinality assertion below is meaningful
    prod_df = curate_pipeline(spark, SF, work_dir=str(tmp_path), pack_chunk=64)
    prod = sorted(map(tuple, prod_df.collect()))
    assert base == prod
    # the stage-3 survivor set was materialized
    assert os.path.isdir(f"{tmp_path}/curate_stage3_survivors")
    # plan check: the pack window keys on the chunk column, and the
    # (lang, chunk) key cardinality strictly exceeds the language count
    plan = prod_df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"))
    assert "__chunk" in plan, plan
    surv = spark.read.parquet(f"{tmp_path}/curate_stage3_survivors")
    n_langs = surv.select("lang").distinct().count()
    n_keys = (
        surv.select("lang", F.floor(F.col("doc_id") / 64).alias("c"))
        .distinct()
        .count()
    )
    assert n_keys > n_langs


def test_chunked_running_sum_equals_single_window(spark):
    """Two-level cumsum == the single stratum-wide window, while its
    level-1 window partitions on (stratum, chunk) — cardinality that
    scales with rows instead of stratum count."""
    from pyspark.sql import Window as W

    from reair_spark.datapipe.curate import chunked_running_sum

    rows = [(i % 3, i, (i * 7919) % 101) for i in range(500)]
    df = spark.createDataFrame(rows, "s int, k long, v long")

    got = chunked_running_sum(
        df, ["s"], F.floor(F.col("k") / 32), ["k"], "v", "cum"
    )
    w = W.partitionBy("s").orderBy("k").rowsBetween(W.unboundedPreceding, W.currentRow)
    want = df.withColumn("cum", F.sum("v").over(w))
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))

    # level-1 key cardinality: 3 strata x ~16 chunks >> 3 strata
    plan = got._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert "__chunk" in plan  # the window key includes the chunk column
