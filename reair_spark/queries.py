"""Declared query surface Q01–Q28 (SURVEY.md §2.3).

Each query exercises the Spark primitive that one of the reference's
dataflow operators maps to (reference file:line cited per function).
Implementation is the DataFrame API so Catalyst gets a declarative
plan — pushdown/pruning/join selection are free.

Every computed column is aliased identically in the Spark code and in
the DuckDB oracle SQL (ORACLE dict below) because the correctness
driver sorts columns by name before value-hashing.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from reair_spark.io import load_table as _t

# ---------------------------------------------------------------------------
# Scans / sources (S1-S8)
# ---------------------------------------------------------------------------


def q01_scan_project(spark: SparkSession, sf: str) -> DataFrame:
    """Catalog-scan shape: project two columns from a tiny dim table.

    Reference: MetastoreScanInputFormat.java:50-147 (S1), table-list
    source MetastoreReplicationJob.java:435-462 (S2).
    """
    return _t(spark, sf, "nation").select("n_name", "n_regionkey")


def q02_listing_filter(spark: SparkSession, sf: str) -> DataFrame:
    """Listing + predicate + limit (S3-S5, hidden-file filter F5).

    Both predicates reach the parquet scan as PushedFilters.
    """
    li = _t(spark, sf, "lineitem")
    return (
        li.filter((F.col("l_returnflag") != "A") & (F.col("l_quantity") < 5))
        .select("l_orderkey", "l_linenumber")
        .orderBy("l_orderkey", "l_linenumber")
        .limit(100)
    )


def q03_grouped_events(spark: SparkSession, sf: str) -> DataFrame:
    """Audit-log grouping shape (S5: AuditLogReader.java:228-412)."""
    ev = _t(spark, sf, "events")
    return (
        ev.groupBy("user_id")
        .agg(F.count("*").alias("c"))
        .orderBy(F.desc("c"), "user_id")
        .limit(20)
    )


def q04_plan_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    """Plan sink/re-source shape (S7/S8: stage-1 TSV roundtrip,
    MetastoreReplicationJob.java:124-157)."""
    o = _t(spark, sf, "orders")
    return (
        o.groupBy("o_orderpriority").agg(F.count("*").alias("cnt")).orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# Filters / projections (F1-F9)
# ---------------------------------------------------------------------------


def q05_regex_blacklist(spark: SparkSession, sf: str) -> DataFrame:
    """Whitelist-and-not-blacklist predicate (F1/F2:
    RegexReplicationFilter.java:40-64, TableCompareWorker.java:122-131)."""
    p = _t(spark, sf, "part")
    return (
        p.filter(F.col("p_name").like("%green%") & ~F.col("p_name").like("%mint%"))
        .agg(F.count("*").alias("cnt"))
    )


def q06_inlist_filter(spark: SparkSession, sf: str) -> DataFrame:
    """Command-type IN-list filter (F4/F6: AuditLogReader.java:202-204)."""
    o = _t(spark, sf, "orders")
    return o.filter(F.col("o_orderstatus").isin("F", "P")).agg(F.count("*").alias("cnt"))


def q07_conditional_projection(spark: SparkSession, sf: str) -> DataFrame:
    """CASE projection (F7/F8: DestinationObjectFactory.java:49-77
    S3-location predicate + location rewrite)."""
    s = _t(spark, sf, "supplier")
    return (
        s.withColumn("b", F.when(F.col("s_acctbal") < 0, "neg").otherwise("pos"))
        .groupBy("b")
        .agg(F.count("*").alias("cnt"))
        .orderBy("b")
    )


def q08_normalization(spark: SparkSession, sf: str) -> DataFrame:
    """Name normalization (F9: ReplicationUtils.normalizeNames:481-499)."""
    c = _t(spark, sf, "customer")
    return (
        c.select(F.lower("c_mktsegment").alias("seg"))
        .groupBy("seg")
        .agg(F.count("*").alias("cnt"))
        .orderBy("seg")
    )


# ---------------------------------------------------------------------------
# Joins (J1-J6) / set ops (SO1-SO3)
# ---------------------------------------------------------------------------


def q09_full_outer_diff(spark: SparkSession, sf: str) -> DataFrame:
    """Table-diff shape: full-outer join of two catalogs on identity key
    (J1: TaskEstimator.analyzeTableSpec:74-144)."""
    o = _t(spark, sf, "orders")
    a = o.filter(F.col("o_orderstatus") == "F").groupBy(F.col("o_custkey").alias("k")).agg(
        F.count("*").alias("cnt_a")
    )
    b = o.filter(F.col("o_orderstatus") == "O").groupBy(F.col("o_custkey").alias("k")).agg(
        F.count("*").alias("cnt_b")
    )
    return (
        a.join(b, "k", "full_outer")
        .select("k", "cnt_a", "cnt_b")
        .orderBy("k")
        .limit(100)
    )


def q10_union_distinct(spark: SparkSession, sf: str) -> DataFrame:
    """Partition-name union (J2/SO1: TableCompareWorker.java:158-172)."""
    li = _t(spark, sf, "lineitem").select(F.col("l_suppkey").alias("k")).distinct()
    s = _t(spark, sf, "supplier").select(F.col("s_suppkey").alias("k")).distinct()
    return li.union(s).distinct().orderBy("k").limit(100)


def q11_latest_per_key(spark: SparkSession, sf: str) -> DataFrame:
    """Latest-version-per-key (J3/W1: ReplicationJob.findSrcFileStatus:
    222-230 — max-mtime conflict resolution)."""
    ev = _t(spark, sf, "events")
    w = W.partitionBy("user_id").orderBy(F.desc("ts"), "event_id")
    return (
        ev.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") == 1)
        .select("event_id", "user_id", "ts", "rn")
        .orderBy("user_id")
        .limit(50)
    )


def q12_anti_join(spark: SparkSession, sf: str) -> DataFrame:
    """Existence anti-join (J4/SO2: FsUtils.filesExistOnDestButNotSrc:
    246-268)."""
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti").agg(F.count("*").alias("cnt"))
    )


def q13_join_collect(spark: SparkSession, sf: str) -> DataFrame:
    """Entry↔objects join + group (J5/J6: AuditLogReader.java:239-254).

    Pre-aggregates the fact side before the join (count per l_orderkey)
    so the join shuffles one row per key instead of one per lineitem —
    at 100 TB this is the difference between shuffling the fact table
    and shuffling its distinct-key projection. orderBy+limit compiles
    to TakeOrderedAndProject (no global sort).
    """
    o = _t(spark, sf, "orders")
    li_counts = (
        _t(spark, sf, "lineitem")
        .groupBy(F.col("l_orderkey").alias("o_orderkey"))
        .agg(F.count("l_linenumber").alias("li_cnt"))
    )
    return (
        o.select("o_orderkey")
        .join(li_counts, "o_orderkey", "left_outer")
        .select("o_orderkey", F.coalesce("li_cnt", F.lit(0)).alias("n_items"))
        .orderBy(F.desc("n_items"), "o_orderkey")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Aggregations (A1-A8)
# ---------------------------------------------------------------------------


def q14_tpch_q1(spark: SparkSession, sf: str) -> DataFrame:
    """Directory-size-sum shape at TPC-H Q1 scale (A1/A2:
    FsUtils.getSize:47-75)."""
    li = _t(spark, sf, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.to_timestamp(F.lit("1998-09-02")))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.sum("l_extendedprice").alias("sum_price"),
            F.avg("l_discount").alias("avg_disc"),
            F.count("*").alias("cnt"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q15_digest_equality(spark: SparkSession, sf: str) -> DataFrame:
    """Directory-equality aggregate (A3: FsUtils.equalDirs:305-381)."""
    li = _t(spark, sf, "lineitem")
    return li.agg(
        F.count("*").alias("cnt"),
        F.sum("l_quantity").alias("sum_qty"),
        F.sum("l_extendedprice").alias("sum_price"),
    )


def q16_minmax_limit(spark: SparkSession, sf: str) -> DataFrame:
    """Checkpoint id-range scan (A4/A5/W2: AuditLogReader.java:199-225,
    getMaxId:434-443)."""
    o = _t(spark, sf, "orders")
    first200 = o.select("o_orderkey").orderBy("o_orderkey").limit(200)
    return first200.agg(
        F.min("o_orderkey").alias("min_id"), F.max("o_orderkey").alias("max_id")
    )


def q17_status_counts(spark: SparkSession, sf: str) -> DataFrame:
    """Outcome counters (A6: ReplicationCounters.java)."""
    o = _t(spark, sf, "orders")
    return (
        o.groupBy("o_orderstatus").agg(F.count("*").alias("cnt")).orderBy("o_orderstatus")
    )


def q18_sizing_heuristic(spark: SparkSession, sf: str) -> DataFrame:
    """LPT task-sizing bound (A8: DistCpWrapperOptions.computeLongestMapper:
    203-220 — ceil(total/concurrency))."""
    li = _t(spark, sf, "lineitem")
    return li.agg(F.ceil(F.sum("l_extendedprice") / 16).alias("mapper_bound"))


def q19_rollup(spark: SparkSession, sf: str) -> DataFrame:
    """Grouping-sets surface the reference lacks; Spark-native rollup."""
    li = _t(spark, sf, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.col("l_returnflag").asc_nulls_first(), F.col("l_linestatus").asc_nulls_first())
    )


def q20_newer_guard(spark: SparkSession, sf: str) -> DataFrame:
    """Newer-than version guard (W3: ReplicationUtils.getLastModifiedTime:
    519-552 — greatest(TLMT, TLDT) compare)."""
    o = _t(spark, sf, "orders")
    guard = F.greatest(
        F.col("o_orderdate"), F.col("o_orderdate") + F.expr("INTERVAL 1 DAY")
    )
    return o.filter(guard > F.to_timestamp(F.lit("1998-08-01"))).agg(
        F.count("*").alias("cnt")
    )


def q21_ordered_per_key(spark: SparkSession, sf: str) -> DataFrame:
    """Per-key ordered execution (W4: ParallelJobExecutor.java:61-75 —
    FIFO under per-object locks → rank within partition)."""
    o = _t(spark, sf, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        o.select(
            "o_custkey", "o_orderkey", F.rank().over(w).cast("long").alias("rnk")
        )
        .orderBy("o_custkey", "rnk")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Scalar functions (X1-X9), streaming-shape (ST8), UDF surface
# ---------------------------------------------------------------------------


def q22_tsv_encode(spark: SparkSession, sf: str) -> DataFrame:
    """TSV row encode (X1: ReplicationUtils.genValue:471-473)."""
    n = _t(spark, sf, "nation")
    return n.select(
        F.concat_ws("\t", F.col("n_nationkey").cast("string"), F.col("n_name")).alias(
            "row_str"
        )
    ).orderBy("row_str")


def q23_date_trunc(spark: SparkSession, sf: str) -> DataFrame:
    """Timestamp formatting (X9: MetastoreReplicationJob.java:281-283)."""
    o = _t(spark, sf, "orders")
    return (
        o.select(F.date_trunc("month", "o_orderdate").alias("m"))
        .groupBy("m")
        .agg(F.count("*").alias("cnt"))
        .orderBy("m")
    )


def q24_path_prefix(spark: SparkSession, sf: str) -> DataFrame:
    """Path-component split (X5/X6: FsUtils.getRelativePath:211-218,
    ReplicationUtils.getCommonDirectory:361-403)."""
    p = _t(spark, sf, "part")
    return (
        p.select(F.split_part(F.col("p_type"), F.lit(" "), F.lit(1)).alias("prefix"))
        .groupBy("prefix")
        .agg(F.count("*").alias("cnt"))
        .orderBy("prefix")
    )


def q25_regexp_extract(spark: SparkSession, sf: str) -> DataFrame:
    """Exchange-partition SQL regex (X7: ExchangePartitionParser.java:19-52)."""
    p = _t(spark, sf, "part")
    return (
        p.select(F.regexp_extract("p_name", r"^([a-z]+)", 1).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), "w")
        .limit(10)
    )


def q26_hash_distribution(spark: SparkSession, sf: str) -> DataFrame:
    """Shuffle-key hashing (X8: Stage2DirectoryCopyMapper.java:116-118 —
    murmur3(size,mtime) rebalance). Uses a portable modular hash so the
    DuckDB oracle agrees (SURVEY §2.3 Q26 note)."""
    li = _t(spark, sf, "lineitem")
    bucket = F.pmod(F.col("l_orderkey") * 31 + F.col("l_linenumber"), F.lit(16))
    return (
        li.select(bucket.alias("hash_bucket"))
        .groupBy("hash_bucket")
        .agg(F.count("*").alias("cnt"))
        .orderBy("hash_bucket")
    )


def q27_time_windows(spark: SparkSession, sf: str) -> DataFrame:
    """Tumbling-window shape (ST8 — reference stream is id-ordered; we
    expose real event-time windows)."""
    ev = _t(spark, sf, "events")
    return (
        ev.select(F.date_trunc("hour", "ts").alias("window_start"))
        .groupBy("window_start")
        .agg(F.count("*").alias("cnt"))
        .orderBy("window_start")
    )


def q28_udf_surface(spark: SparkSession, sf: str) -> DataFrame:
    """UDF extension surface (reference: ReplicationFilter plugin chain,
    ReplicationLauncher.java:145-169). Vectorized pandas_udf — Arrow
    batches, not row-at-a-time Python."""

    @F.pandas_udf("double")
    def tax(price: pd.Series, disc: pd.Series, tx: pd.Series) -> pd.Series:
        return price * (1 - disc) * (1 + tx)

    spark.udf.register("tax", tax)
    li = _t(spark, sf, "lineitem")
    return li.agg(
        F.round(F.sum(tax("l_extendedprice", "l_discount", "l_tax")), 2).alias("rev")
    )


# ---------------------------------------------------------------------------
# Oracle SQL (DuckDB) — same aliases, same value semantics
# ---------------------------------------------------------------------------

DECLARED_QUERIES = {
    "q01_scan_project": q01_scan_project,
    "q02_listing_filter": q02_listing_filter,
    "q03_grouped_events": q03_grouped_events,
    "q04_plan_roundtrip": q04_plan_roundtrip,
    "q05_regex_blacklist": q05_regex_blacklist,
    "q06_inlist_filter": q06_inlist_filter,
    "q07_conditional_projection": q07_conditional_projection,
    "q08_normalization": q08_normalization,
    "q09_full_outer_diff": q09_full_outer_diff,
    "q10_union_distinct": q10_union_distinct,
    "q11_latest_per_key": q11_latest_per_key,
    "q12_anti_join": q12_anti_join,
    "q13_join_collect": q13_join_collect,
    "q14_tpch_q1": q14_tpch_q1,
    "q15_digest_equality": q15_digest_equality,
    "q16_minmax_limit": q16_minmax_limit,
    "q17_status_counts": q17_status_counts,
    "q18_sizing_heuristic": q18_sizing_heuristic,
    "q19_rollup": q19_rollup,
    "q20_newer_guard": q20_newer_guard,
    "q21_ordered_per_key": q21_ordered_per_key,
    "q22_tsv_encode": q22_tsv_encode,
    "q23_date_trunc": q23_date_trunc,
    "q24_path_prefix": q24_path_prefix,
    "q25_regexp_extract": q25_regexp_extract,
    "q26_hash_distribution": q26_hash_distribution,
    "q27_time_windows": q27_time_windows,
    "q28_udf_surface": q28_udf_surface,
}

DECLARED_ORACLES = {
    "q01_scan_project": "SELECT n_name, n_regionkey FROM nation",
    "q02_listing_filter": (
        "SELECT l_orderkey, l_linenumber FROM lineitem "
        "WHERE l_returnflag <> 'A' AND l_quantity < 5 "
        "ORDER BY l_orderkey, l_linenumber LIMIT 100"
    ),
    "q03_grouped_events": (
        "SELECT user_id, count(*) AS c FROM events GROUP BY user_id "
        "ORDER BY c DESC, user_id LIMIT 20"
    ),
    "q04_plan_roundtrip": (
        "SELECT o_orderpriority, count(*) AS cnt FROM orders GROUP BY 1 ORDER BY 1"
    ),
    "q05_regex_blacklist": (
        "SELECT count(*) AS cnt FROM part "
        "WHERE p_name LIKE '%green%' AND p_name NOT LIKE '%mint%'"
    ),
    "q06_inlist_filter": (
        "SELECT count(*) AS cnt FROM orders WHERE o_orderstatus IN ('F','P')"
    ),
    "q07_conditional_projection": (
        "SELECT CASE WHEN s_acctbal < 0 THEN 'neg' ELSE 'pos' END AS b, "
        "count(*) AS cnt FROM supplier GROUP BY 1 ORDER BY 1"
    ),
    "q08_normalization": (
        "SELECT lower(c_mktsegment) AS seg, count(*) AS cnt FROM customer "
        "GROUP BY 1 ORDER BY 1"
    ),
    "q09_full_outer_diff": (
        "SELECT coalesce(a.k, b.k) AS k, a.cnt_a, b.cnt_b FROM "
        "(SELECT o_custkey AS k, count(*) AS cnt_a FROM orders "
        " WHERE o_orderstatus = 'F' GROUP BY 1) a "
        "FULL OUTER JOIN "
        "(SELECT o_custkey AS k, count(*) AS cnt_b FROM orders "
        " WHERE o_orderstatus = 'O' GROUP BY 1) b ON a.k = b.k "
        "ORDER BY k LIMIT 100"
    ),
    "q10_union_distinct": (
        "SELECT k FROM (SELECT DISTINCT l_suppkey AS k FROM lineitem "
        "UNION SELECT DISTINCT s_suppkey FROM supplier) t ORDER BY k LIMIT 100"
    ),
    # ts cast to plain (microsecond) TIMESTAMP so ordering matches Spark's
    # ns→us truncated reads
    "q11_latest_per_key": (
        "SELECT event_id, user_id, ts, rn FROM ("
        "SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, row_number() OVER "
        "(PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id) AS rn "
        "FROM events) t WHERE rn = 1 ORDER BY user_id LIMIT 50"
    ),
    "q12_anti_join": (
        "SELECT count(*) AS cnt FROM customer c WHERE NOT EXISTS "
        "(SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)"
    ),
    "q13_join_collect": (
        "SELECT o.o_orderkey, count(l.l_linenumber) AS n_items FROM orders o "
        "LEFT JOIN lineitem l ON o.o_orderkey = l.l_orderkey "
        "GROUP BY 1 ORDER BY n_items DESC, o_orderkey LIMIT 20"
    ),
    "q14_tpch_q1": (
        "SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty, "
        "sum(l_extendedprice) AS sum_price, avg(l_discount) AS avg_disc, "
        "count(*) AS cnt FROM lineitem "
        "WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00' "
        "GROUP BY 1, 2 ORDER BY 1, 2"
    ),
    "q15_digest_equality": (
        "SELECT count(*) AS cnt, sum(l_quantity) AS sum_qty, "
        "sum(l_extendedprice) AS sum_price FROM lineitem"
    ),
    "q16_minmax_limit": (
        "SELECT min(o_orderkey) AS min_id, max(o_orderkey) AS max_id FROM "
        "(SELECT o_orderkey FROM orders ORDER BY o_orderkey LIMIT 200) t"
    ),
    "q17_status_counts": (
        "SELECT o_orderstatus, count(*) AS cnt FROM orders GROUP BY 1 ORDER BY 1"
    ),
    "q18_sizing_heuristic": (
        "SELECT CAST(ceil(sum(l_extendedprice) / 16) AS BIGINT) AS mapper_bound "
        "FROM lineitem"
    ),
    "q19_rollup": (
        "SELECT l_returnflag, l_linestatus, count(*) AS cnt FROM lineitem "
        "GROUP BY ROLLUP(l_returnflag, l_linestatus)"
    ),
    "q20_newer_guard": (
        "SELECT count(*) AS cnt FROM orders WHERE "
        "greatest(o_orderdate, o_orderdate + INTERVAL 1 DAY) > "
        "TIMESTAMP '1998-08-01 00:00:00'"
    ),
    "q21_ordered_per_key": (
        "SELECT o_custkey, o_orderkey, rank() OVER "
        "(PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rnk "
        "FROM orders ORDER BY o_custkey, rnk LIMIT 100"
    ),
    "q22_tsv_encode": (
        "SELECT concat_ws(chr(9), CAST(n_nationkey AS VARCHAR), n_name) AS row_str "
        "FROM nation ORDER BY row_str"
    ),
    # DuckDB date_trunc('month') yields DATE; cast to TIMESTAMP to match Spark
    "q23_date_trunc": (
        "SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS m, "
        "count(*) AS cnt FROM orders GROUP BY 1 ORDER BY 1"
    ),
    "q24_path_prefix": (
        "SELECT split_part(p_type, ' ', 1) AS prefix, count(*) AS cnt FROM part "
        "GROUP BY 1 ORDER BY 1"
    ),
    "q25_regexp_extract": (
        "SELECT regexp_extract(p_name, '^([a-z]+)', 1) AS w, count(*) AS cnt "
        "FROM part GROUP BY 1 ORDER BY cnt DESC, w LIMIT 10"
    ),
    "q26_hash_distribution": (
        "SELECT (l_orderkey * 31 + l_linenumber) % 16 AS hash_bucket, "
        "count(*) AS cnt FROM lineitem GROUP BY 1 ORDER BY 1"
    ),
    "q27_time_windows": (
        "SELECT date_trunc('hour', ts) AS window_start, count(*) AS cnt FROM events "
        "GROUP BY 1 ORDER BY 1"
    ),
    "q28_udf_surface": (
        "SELECT round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) "
        "AS rev FROM lineitem"
    ),
}
