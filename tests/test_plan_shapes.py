"""Physical-plan regression guards: the shapes that make these
operators scale (pushdown, pruning, broadcast sides, no cartesian
blowups) — properties row-level correctness tests can't see."""

from __future__ import annotations

from pyspark.sql import functions as F


def _formatted(df) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def test_partition_pruning_reaches_scan(spark, tmp_path):
    """A filter on a partition column must prune at the source: the
    scan's partition filters carry the predicate and non-matching
    partitions are never read."""
    loc = str(tmp_path / "t")
    (
        spark.range(300)
        .select("id", (F.col("id") % 3).alias("ds"))
        .write.partitionBy("ds")
        .parquet(loc)
    )
    df = spark.read.parquet(loc).where("ds = 1").select("id")
    plan = _formatted(df)
    assert "PartitionFilters" in plan
    assert "dynamicpruning" in plan or "(ds" in plan  # predicate bound to ds
    assert df.count() == 100  # only the matching third


def test_filter_and_projection_pushdown_lineitem(spark, sf_dir):
    """q02-style scan: predicates in PushedFilters, projection narrows
    ReadSchema to the referenced columns only."""
    from reair_spark.io import load_table

    li = load_table(spark, sf_dir, "lineitem")
    df = li.where("l_quantity < 5.0").select("l_orderkey", "l_quantity")
    plan = _formatted(df)
    assert "PushedFilters" in plan and "LessThan(l_quantity,5.0)" in plan
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln][0]
    assert "l_orderkey" in read_schema and "l_quantity" in read_schema
    assert "l_comment" not in read_schema and "l_extendedprice" not in read_schema


def test_decontaminate_broadcasts_eval_side(spark, sf_dir):
    """The train corpus must reach the join as the streamed side; only
    the (tiny) eval shingle set may build a broadcast."""
    from reair_spark.datapipe.curate import curate_decontaminate

    plan = _formatted(curate_decontaminate(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan  # train side would pay a full shuffle


def test_ann_broadcasts_query_side(spark, sf_dir):
    """Brute-force ANN: the 5-query side broadcasts; the corpus scan
    must not shuffle before similarity is computed."""
    from reair_spark.datapipe.similarity import ann_cosine_topk

    plan = _formatted(ann_cosine_topk(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_sample_stratified_is_scan_only(spark, sf_dir):
    """Deterministic sampling is a map-only predicate: no exchange
    anywhere in the plan."""
    from reair_spark.datapipe.curate import curate_sample_stratified

    plan = _formatted(curate_sample_stratified(spark, sf_dir))
    assert "Exchange" not in plan


def test_commit_plan_partitions_by_table(spark):
    """Commit ordering rides repartition(db, table) +
    sortWithinPartitions — the plan must show a hash exchange on those
    keys, not a global sort."""
    from reair_spark.commit import _enrich
    from reair_spark.diff import PLAN_COLUMNS

    plan_df = spark.createDataFrame(
        [("db1", "t1", None, "NO_OP", None, None, True, False, None, None)],
        "db string, table string, partition_name string, action string, "
        "src_path string, dest_path string, update_metadata boolean, "
        "update_data boolean, src_tldt string, dest_tldt string",
    )
    ordered = (
        _enrich(plan_df)
        .repartition(4, "db", "table")
        .sortWithinPartitions("db", "table", "partition_name")
    )
    plan = _formatted(ordered)
    assert "hashpartitioning(db" in plan          # exchange keyed on (db, table)
    assert "rangepartitioning" not in plan.lower()  # no global-sort barrier


def test_bucketed_join_is_shuffle_free(spark, tmp_path):
    """Two tables bucketed on the join key: the sort-merge join must
    read bucket-aligned scans with NO exchange on either side — the
    write paid the shuffle once; every later join skips it."""
    from reair_spark.sources import write_bucketed

    a = spark.range(1000).select("id", (F.col("id") * 2).alias("va"))
    b = spark.range(1000).select("id", (F.col("id") * 3).alias("vb"))
    write_bucketed(a, "bkt_a", ["id"], 8, path=str(tmp_path / "a"),
                   sort_cols=["id"])
    write_bucketed(b, "bkt_b", ["id"], 8, path=str(tmp_path / "b"),
                   sort_cols=["id"])
    try:
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = spark.table("bkt_a").join(spark.table("bkt_b"), "id")
            plan = _formatted(joined)
            assert "SortMergeJoin" in plan
            assert "Exchange" not in plan
            assert "SelectedBucketsCount: 8 out of 8" in plan
            assert joined.count() == 1000
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    finally:
        spark.sql("DROP TABLE IF EXISTS bkt_a")
        spark.sql("DROP TABLE IF EXISTS bkt_b")


def test_q4_semi_join_no_row_multiplication(spark, sf_dir):
    """EXISTS compiles to a SEMI hash join (probe-only match flag),
    never an inner join + distinct — at scale a returned-flag lineitem
    side would multiply order rows before the dedup."""
    from reair_spark.extra_queries import tpch_q4_priority_semi

    plan = _formatted(tpch_q4_priority_semi(spark, sf_dir))
    assert "LeftSemi" in plan
    assert "CartesianProduct" not in plan


def test_q22_anti_join_and_scalar_broadcast(spark, sf_dir):
    """The no-orders test compiles to a LEFT ANTI join; the global avg
    enters as a one-row side, never a shuffle of customer."""
    from reair_spark.extra_queries import tpch_q22_dormant_customers

    plan = _formatted(tpch_q22_dormant_customers(spark, sf_dir))
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan or "BroadcastNestedLoopJoin" in plan


def test_fuzzy_join_candidates_at_distinct_value_level(spark, sf_dir):
    """The deletion-neighborhood join must aggregate to distinct
    values BEFORE the variant explode+join: with 64 distinct names
    across 20k parts, a row-level candidate join would multiply every
    name-pair match ~312x312 through the shuffle."""
    from reair_spark.extra_queries import fuzzy_match_parts

    plan = _formatted(fuzzy_match_parts(spark, sf_dir))
    # every explode(variant-keys) Generate must sit directly above a
    # distinct/min-key aggregate, not above the raw scan
    lines = plan.splitlines()
    gen_lines = [i for i, ln in enumerate(lines) if "Generate (" in ln]
    assert gen_lines, plan
    for i in gen_lines:
        assert "HashAggregate" in lines[i + 1], "\n".join(lines[i : i + 2])
    assert "CartesianProduct" not in plan


def test_runtime_bloom_filter_injects_at_scale_thresholds(spark, sf_dir):
    """Spark's runtime bloom-filter join pruning (on by default in the
    session) only injects when the probe side is big enough to be
    worth it — ~50 MB local scans sit under the 10 GB
    application-side threshold, so local plans stay clean. Lowering
    the thresholds to local scale proves the mechanism is armed: the
    probe side gains a BloomFilterMightContain predicate fed by the
    filtered build side, which at 100 TB prunes shuffle input before
    the join."""
    from reair_spark.io import load_table

    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "1kb",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100mb",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    prev = {k: spark.conf.get(k) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        li = load_table(spark, sf_dir, "lineitem")
        o = load_table(spark, sf_dir, "orders").where("o_totalprice > 500000")
        j = (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("o_orderpriority")
            .count()
        )
        plan = _formatted(j)
        assert "might_contain" in plan.lower(), plan[:2000]
    finally:
        for k, v in prev.items():
            spark.conf.set(k, v)


def test_zorder_layout_bounds_both_dimensions(spark, sf_dir, tmp_path):
    """Write lineitem twice: lexicographically sorted by (partkey,
    orderkey) and z-ordered. Per output file, the lex layout leaves
    the SECOND (independent) dimension unbounded — every file spans
    ~the full orderkey-residue domain — while the z layout bounds
    both: the min/max row-group stats a scan with a predicate on
    EITHER column can actually prune on. (suppkey is generator-
    correlated with partkey here, so orderkey is the honest
    independent second dimension.)"""
    from reair_spark.io import load_table
    from reair_spark.operators import zorder_key

    li = load_table(spark, sf_dir, "lineitem").select(
        F.pmod("l_partkey", F.lit(1024)).alias("pa"),
        F.pmod("l_orderkey", F.lit(1024)).alias("pb"),
    )
    z = zorder_key([F.col("pa"), F.col("pb")], bits=10)

    lex_loc = str(tmp_path / "lex")
    z_loc = str(tmp_path / "zord")
    (
        li.repartitionByRange(4, "pa", "pb")
        .sortWithinPartitions("pa", "pb")
        .write.parquet(lex_loc)
    )
    (
        li.withColumn("zk", z)
        .repartitionByRange(4, "zk")
        .sortWithinPartitions("zk")
        .drop("zk")
        .write.parquet(z_loc)
    )

    def max_file_extent(loc, col):
        per_file = (
            spark.read.parquet(loc)
            .groupBy(F.input_file_name())
            .agg((F.max(col) - F.min(col)).alias("ext"))
        )
        return per_file.agg(F.max("ext")).first()[0]

    lex_ord = max_file_extent(lex_loc, "pb")
    z_ord = max_file_extent(z_loc, "pb")
    z_part = max_file_extent(z_loc, "pa")
    # lex: orderkey unbounded per file (~full domain); z: both bounded
    assert lex_ord > 900, lex_ord
    assert z_ord <= 0.75 * lex_ord, (z_ord, lex_ord)
    assert z_part <= 600, z_part


def test_tpch_q6_is_pure_pushdown(spark, sf_dir):
    """Q6's entire predicate set must reach the parquet scan, and the
    read schema must be the 4 referenced columns — at 100 TB this
    query IS pushdown + pruning."""
    from reair_spark.tpch_more import tpch_q6_forecast_revenue

    plan = _formatted(tpch_q6_forecast_revenue(spark, sf_dir))
    assert "GreaterThanOrEqual(l_shipdate" in plan
    assert "GreaterThanOrEqual(l_discount,0.05)" in plan
    assert "LessThan(l_quantity,24.0)" in plan
    read = next(ln for ln in plan.splitlines() if "ReadSchema" in ln)
    assert read.count(":") - 1 == 4  # 4 columns in the struct


def test_tpch_q19_disjunction_splits_to_both_scans(spark, sf_dir):
    """Catalyst must split the OR-of-ANDs: quantity bands push to the
    lineitem scan, brand+size conjuncts push to the part scan."""
    from reair_spark.tpch_more import tpch_q19_disjunctive

    plan = _formatted(tpch_q19_disjunctive(spark, sf_dir))
    assert "Or(Or(And(GreaterThanOrEqual(l_quantity" in plan
    assert "EqualTo(p_brand,Brand#1)" in plan
    assert "CartesianProduct" not in plan


def test_round3_tpch_all_broadcast_no_python(spark, sf_dir):
    """None of the nine round-3 TPC-H shapes may fall back to a
    sort-merge join, cartesian product, or Python evaluation."""
    from reair_spark.tpch_more import TPCH_MORE_QUERIES

    for name, fn in TPCH_MORE_QUERIES.items():
        plan = _formatted(fn(spark, sf_dir))
        assert "SortMergeJoin" not in plan, name
        assert "CartesianProduct" not in plan, name
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, name


def test_lsh_signatures_stay_jvm_side(spark, sf_dir):
    """ann_lsh_topk's 16 signature dots must compile to JVM folds —
    zero Python nodes — and candidates must come from a broadcast
    equi-join, never a cartesian."""
    from reair_spark.datapipe.similarity import ann_lsh_topk

    plan = _formatted(ann_lsh_topk(spark, sf_dir))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def test_compact_plan_parallelism_exceeds_dir_count(spark, sf_dir):
    """The compaction cumsum must NOT hang the whole inventory off a
    dir-partitioned window: the level-1 window key includes the
    rel_path-prefix chunk, so distinct window partitions >> dirs."""
    from reair_spark.engine_queries import replication_compact_plan

    plan = _formatted(replication_compact_plan(spark, sf_dir))
    # the level-1 sort must include the chunk column
    assert "__chunk" in plan


def test_round4_ops_no_python_no_cartesian(spark, sf_dir):
    """Round-4 additions must stay JVM-side and blocked: no Python
    eval nodes anywhere; no cartesian products; the pair generators
    (market basket, prefix dedup) must join/aggregate on their block
    keys, not cross-join."""
    from reair_spark.datapipe.curate import curate_weighted_sample
    from reair_spark.datapipe.dedup import dedup_prefix
    from reair_spark.datapipe.multimodal import multimodal_scene_cuts
    from reair_spark.datapipe.text import text_quality_linear
    from reair_spark.extra_queries import (
        lineitem_market_basket,
        orders_scd2_history,
    )

    for fn in (
        dedup_prefix,
        multimodal_scene_cuts,
        curate_weighted_sample,
        text_quality_linear,
        orders_scd2_history,
        lineitem_market_basket,
    ):
        plan = _formatted(fn(spark, sf_dir))
        assert "BatchEvalPython" not in plan, fn.__name__
        assert "ArrowEvalPython" not in plan, fn.__name__
        assert "CartesianProduct" not in plan, fn.__name__


def test_weighted_sample_is_top_k_not_full_sort(spark, sf_dir):
    """curate_weighted_sample's global pick must compile to
    TakeOrderedAndProject (per-partition partial top-K), never a full
    global Sort+Exchange of the corpus."""
    from reair_spark.datapipe.curate import curate_weighted_sample

    plan = _formatted(curate_weighted_sample(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan


def test_scene_cuts_is_map_only(spark, sf_dir):
    """multimodal_scene_cuts must be a single map over the scan —
    zero exchanges (no per-frame explode through a shuffle)."""
    from reair_spark.datapipe.multimodal import multimodal_scene_cuts

    plan = _formatted(multimodal_scene_cuts(spark, sf_dir))
    assert "Exchange" not in plan


def test_round5_ops_no_python_no_cartesian(spark, sf_dir):
    """Round-5 additions stay JVM-side and blocked: no Python eval
    nodes, no cartesian products; the gram generators aggregate on
    hash keys, never doc-pair cross joins."""
    from reair_spark.datapipe.dedup import (
        dedup_decontaminate,
        dedup_span_kgram,
    )
    from reair_spark.datapipe.text import text_bpe_pair_counts

    for fn in (dedup_span_kgram, dedup_decontaminate, text_bpe_pair_counts):
        plan = _formatted(fn(spark, sf_dir))
        assert "BatchEvalPython" not in plan, fn.__name__
        assert "ArrowEvalPython" not in plan, fn.__name__
        assert "CartesianProduct" not in plan, fn.__name__


def test_bpe_pairs_vocab_collapse_before_explode(spark, sf_dir):
    """text_bpe_pair_counts must aggregate tokens to (word, freq)
    BEFORE the char-pair explode — the explode operates on the
    post-aggregation (vocabulary-sized) side of the first exchange,
    so corpus bytes cross one map-side-combined shuffle only."""
    from reair_spark.datapipe.text import text_bpe_pair_counts

    import re

    df = text_bpe_pair_counts(spark, sf_dir)
    plan = _formatted(df)
    # at most three exchanges: widen's repartition of the tiny test
    # scan, the (word) count, and the (pair) sum — count NODE headers,
    # not every mention in the detail sections
    n_exchanges = len(re.findall(r"^\(\d+\) Exchange", plan, re.M))
    assert n_exchanges <= 3, plan
    # the pair explode (LAST Generate) consumes the word-aggregate's
    # output (vocab-sized), not the raw scan: in leaf-to-root detail
    # order the first HashAggregate precedes it (the FIRST Generate is
    # the token explode and legitimately comes before the agg)
    nodes = re.findall(r"^\(\d+\) (\w+)", plan, re.M)
    first_agg = nodes.index("HashAggregate")
    last_gen = len(nodes) - 1 - nodes[::-1].index("Generate")
    assert first_agg < last_gen, nodes


def test_registry_wide_no_row_python_no_cartesian(spark, sf_dir):
    """Mechanical enforcement of the engine-wide claims: NO query in
    the registry plans a row-at-a-time Python eval (BatchEvalPython)
    or a CartesianProduct. Arrow-batched Python (ArrowEvalPython /
    MapInPandas / FlatMapGroupsInPandas) is the sanctioned slow path
    and is allowed. Queries with driver-side precompute (k-means fits,
    streaming drains, the replication e2e) execute that part while
    building their DataFrame — the audit still covers the full final
    plan of all of them."""
    from reair_spark.registry import all_queries

    failures = []
    for name, fn in sorted(all_queries().items()):
        try:
            plan = fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        except Exception as exc:  # noqa: BLE001 — surface as audit failure
            failures.append(f"{name}: plan build failed: {exc}")
            continue
        if "BatchEvalPython" in plan:
            failures.append(f"{name}: row-at-a-time Python in plan")
        if "CartesianProduct" in plan:
            failures.append(f"{name}: cartesian product in plan")
    assert not failures, "\n".join(failures)


def test_bpe_apply_stays_jvm_side_with_broadcast_scalars(spark, sf_dir):
    """The whole BPE train+apply plan is JVM built-ins: no Python
    eval anywhere, each round's argmax merge attaches as a broadcast
    (1-row nested-loop is the scalar-attach pattern), and the final
    vocab map joins broadcast — the corpus side never shuffles for
    the apply."""
    from reair_spark.datapipe.text import text_bpe_apply

    plan = _formatted(text_bpe_apply(spark, sf_dir))
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan  # 1-row merge scalars
    assert "BroadcastHashJoin" in plan        # vocab-map apply join


def test_containment_blocks_without_cartesian(spark, sf_dir):
    """Rare-shingle containment: the df≤cap table broadcasts into the
    eligibility join and no stage degenerates to a cartesian pair
    explosion."""
    from reair_spark.datapipe.dedup import dedup_containment

    plan = _formatted(dedup_containment(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    assert "BroadcastHashJoin" in plan


def test_temperature_mix_is_one_aggregate_plus_scalar(spark, sf_dir):
    """Temperature mixing touches the corpus once: a single per-source
    aggregate, then only the broadcast 1-row Σq — no second corpus
    scan, no Python."""
    from reair_spark.datapipe.curate import curate_temperature_mix

    plan = _formatted(curate_temperature_mix(spark, sf_dir))
    assert "BatchEvalPython" not in plan
    # formatted output lists each node once in the tree and once in the
    # numbered details — one scan NODE means exactly one "(n) Scan" header
    import re

    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1


def test_span_trim_no_python_no_pairs(spark, sf_dir):
    """span_trim: gram windowing, span merge, and text reconstruction
    are all JVM (window + higher-order functions) — no Python eval,
    no doc-pair join shape."""
    from reair_spark.datapipe.dedup import span_trim, _corpus

    plan = _formatted(span_trim(_corpus(spark, sf_dir, exact=False)))
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_repetition_signals_is_scan_only(spark, sf_dir):
    """Gopher repetition signals are row-local higher-order-function
    arithmetic: one scan, NO exchange (widen's repartition aside), no
    Python — the whole operator pipelines at scan speed."""
    import re

    from reair_spark.datapipe.text import text_repetition_signals

    plan = _formatted(text_repetition_signals(spark, sf_dir))
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1
    # no shuffle beyond widen's round-robin repartition
    import re as _re

    exchanges = _re.findall(r"\(\d+\) Exchange", plan)
    assert len(exchanges) <= 1


def test_bm25_single_corpus_shuffle_broadcast_sides(spark, sf_dir):
    """BM25: the corpus shuffles once on (doc_id, token); df/idf,
    query terms, and the avgdl scalar all join as broadcasts; the
    query-term filter lands before the aggregation so only matching
    tokens shuffle."""
    from reair_spark.datapipe.text import text_bm25_topk

    plan = _formatted(text_bm25_topk(spark, sf_dir))
    assert "BatchEvalPython" not in plan
    assert plan.count("BroadcastExchange") >= 3
    assert "CartesianProduct" not in plan


def test_salted_join_replicates_build_and_spreads_hot_key(spark, sf_dir):
    """skew_join_salted: the build side carries an explode (salt
    replication), the join key is (key, salt) so each hot key's rows
    spread across salt tasks, and no Python/cartesian appears."""
    from reair_spark.extra_queries import skew_join_salted

    plan = _formatted(skew_join_salted(spark, sf_dir))
    assert "Generate" in plan and "explode(" in plan
    assert "__salt" in plan
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_orphan_gc_shape(spark, sf_dir):
    """replication_orphan_gc: everything JVM-side (no Python eval),
    the path join is a real equi-join (no cartesian), and the scans
    read only the referenced lineitem columns."""
    from reair_spark.engine_queries import ENGINE_QUERIES

    plan = _formatted(ENGINE_QUERIES["replication_orphan_gc"](spark, sf_dir))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "l_comment" not in plan  # projection pruned to the used columns


def test_importance_resample_shape(spark, sf_dir):
    """curate_importance_resample: JVM-only, score table joins as the
    BROADCAST side, no cartesian beyond the 1-row scalar attach
    (BroadcastNestedLoopJoin), and — the no-global-sort discipline —
    no unpartitioned ntile/row_number window over the whole pool
    (the rank comes from chunked_running_sum)."""
    from reair_spark.datapipe.curate import curate_importance_resample

    plan = _formatted(curate_importance_resample(spark, sf_dir))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastExchange" in plan  # vocabulary-sized score table
    assert "ntile" not in plan.lower()


def test_quality_percentile_shape(spark, sf_dir):
    """curate_quality_percentile: the per-source percentile cut must
    NOT sort each source in one task — no percent_rank (or any
    unpartitioned-within-source rank) over the full corpus; the rank
    comes from chunked_running_sum, so every corpus-sized window spec
    partitions by (source, __chunk). JVM-only, per-source counts join
    as the broadcast side."""
    from reair_spark.datapipe.curate import curate_quality_percentile

    plan = _formatted(curate_quality_percentile(spark, sf_dir))
    assert "percent_rank" not in plan
    assert "ntile" not in plan.lower()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "__chunk" in plan  # the chunked-rank path, not a window sort
    assert "BroadcastExchange" in plan  # per-source counts + offsets


def test_bm25_persisted_serving_shape(spark, sf_dir):
    """The persisted-index serving path must be scan-bounded: the term
    filter is PUSHED to the postings parquet scan (sorted on token, so
    row groups prune), df/stats/queries ride as broadcasts, no Python,
    no corpus-sized exchange beyond the (doc_id, query) score agg, and
    NO tokenize of the documents table (the build paid that once)."""
    from reair_spark.datapipe.text import text_bm25_persisted_topk

    plan = _formatted(text_bm25_persisted_topk(spark, sf_dir))
    assert "PushedFilters" in plan and "token" in plan
    # the isin() reaches the scan: In(token, …) in the pushed list
    assert "In(token" in plan or "token IN" in plan
    assert "documents.parquet" not in plan  # serves the INDEX, not the corpus
    assert "explode" not in plan.lower()    # no serve-time tokenize
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "BroadcastExchange" in plan


def test_bloom_prefilter_shape(spark, sf_dir):
    """dedup_bloom_prefilter: the bit table and the reference digest
    set ride as BROADCASTS (candidates never shuffle for the negative
    majority), JVM-only, no cartesian."""
    from reair_spark.datapipe.dedup import dedup_bloom_prefilter

    plan = _formatted(dedup_bloom_prefilter(spark, sf_dir))
    assert "BroadcastExchange" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_minhash_persisted_serving_shape(spark, sf_dir):
    """dedup_minhash_persisted serving path: reads the PERSISTED index
    parquet (bands + sets), query-side bands/sets broadcast into the
    probe joins, no corpus re-shingle of the documents table beyond
    the batch-sized query side, JVM-only."""
    from reair_spark.datapipe.dedup import dedup_minhash_persisted

    plan = _formatted(dedup_minhash_persisted(spark, sf_dir))
    assert "bands.parquet" in plan and "sets.parquet" in plan
    assert "BroadcastExchange" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_zonemap_residual_filter_is_pushed(spark, tmp_path):
    """The manifest prunes ACROSS files; the residual predicate must
    still reach the parquet scan of the kept directories (PushedFilters)
    so row-group stats prune WITHIN them — the two layers compose."""
    from reair_spark.sources import write_zonemapped, zonemap_scan

    df = spark.range(10000).select(
        "id",
        (F.col("id") % 10).cast("string").alias("b"),
        (F.col("id") % 1000).alias("v"),
    )
    loc = str(tmp_path / "zmp")
    write_zonemapped(df, loc, "b", stat_cols=["v"])
    pruned, stats = zonemap_scan(spark, loc, [("v", 100, 200)])
    residual = pruned.filter((F.col("v") >= 100) & (F.col("v") <= 200))
    plan = _formatted(residual)
    assert "PushedFilters" in plan
    assert "GreaterThanOrEqual(v,100)" in plan
    assert "LessThanOrEqual(v,200)" in plan
    # and the scan relation reads only the kept dirs (no full listing)
    assert stats["n_buckets_read"] == 10  # v spans all buckets here
    # column pruning: a projection must shrink ReadSchema to v alone
    narrow = residual.select("v")
    nplan = _formatted(narrow)
    schema_lines = [ln for ln in nplan.splitlines() if "ReadSchema" in ln]
    assert schema_lines and all(
        "struct<v:bigint>" in ln for ln in schema_lines
    )


def test_aqe_splits_skewed_join_at_runtime(spark):
    """The session config claims AQE handles skew at runtime — prove
    it: a 90%-hot-key join, thresholds scaled to test size, must
    execute as SortMergeJoin(skew=true) in the FINAL adaptive plan
    (the join DataFrame itself must run: count() plans a different
    query and never finalizes this one)."""
    import contextlib
    import io

    confs = {
        # BOTH thresholds: AQE re-plans with the adaptive one, and a
        # runtime demotion to broadcast would make skew-split moot
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes":
            "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        # pin everything the skew rule reads: this probe must be
        # independent of whatever session state 700 earlier tests left
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.shuffle.partitions": "8",
    }
    # isolated SQLConf over the shared SparkContext — immune to conf
    # leakage from other tests, no second JVM, nothing to restore
    spark = spark.newSession()
    for k, v in confs.items():
        spark.conf.set(k, v)
    big = spark.range(400000).select(
        F.when(F.col("id") % 10 < 9, 7).otherwise(F.col("id")).alias("k"),
        F.concat(F.lit("x" * 64), F.col("id").cast("string")).alias("pad"),
    )
    dim = spark.range(400000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    j = big.join(dim, "k").select("k", "v")
    assert len(j.collect()) == 400000
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        j.explain("formatted")
    plan = buf.getvalue()
    assert "isFinalPlan=true" in plan
    live = {k: spark.conf.get(k, None) for k in confs}
    assert "SortMergeJoin(skew=true)" in plan, (live, plan)
