"""Extended query surface: custom operators (as-of join,
sessionization) and Spark-native analytics the reference lacks
entirely (cube, pivot, exact percentile/distinct) — each oracle-
checked. DuckDB's native ASOF JOIN verifies our union-marker+window
as-of implementation independently.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from reair_spark.datapipe.common import round_like_duckdb
from reair_spark.io import load_table as _t
from reair_spark.io import rows_df
from reair_spark.operators import (
    asof_join,
    deletion_neighborhood_join,
    range_join,
    sessionize,
    top_k_per_group,
)


def _event_days(spark: SparkSession, sf: str) -> DataFrame:
    """events → (user_id, event_day, event_id) with event days mapped
    into the orders date range; deduped per (user_id, day) so as-of
    tie-breaks are well-defined on both engines."""
    ev = _t(spark, sf, "events")
    day = F.timestamp_seconds(
        F.unix_timestamp(F.lit("1992-01-01 00:00:00"))
        + (F.col("event_id") % 2400) * 86400
    )
    return (
        ev.select("user_id", day.alias("event_day"), "event_id")
        .groupBy("user_id", "event_day")
        .agg(F.max("event_id").alias("event_id"))
    )


def asof_orders_events(spark: SparkSession, sf: str) -> DataFrame:
    """For each order: the latest event of that customer at or before
    the order date (classic as-of enrichment)."""
    o = _t(spark, sf, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    ev = _event_days(spark, sf).select(
        F.col("user_id"), F.col("event_day"), F.col("event_id")
    )
    joined = asof_join(
        o,
        ev.withColumnRenamed("user_id", "o_custkey"),
        on="o_custkey",
        left_time="o_orderdate",
        right_time="event_day",
        right_values=["event_id", "event_day"],
    )
    return joined.select("o_orderkey", "o_custkey", "event_id", "event_day")


def sessionize_events(spark: SparkSession, sf: str) -> DataFrame:
    """Gap-based sessions (30 min) per user over the event stream."""
    ev = _t(spark, sf, "events")
    return sessionize(ev.select("user_id", "ts"), "user_id", "ts", 1800)


def cube_counts(spark: SparkSession, sf: str) -> DataFrame:
    """CUBE over (returnflag, linestatus) — grouping-set surface."""
    li = _t(spark, sf, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(F.count("*").alias("cnt"))


def pivot_status_priority(spark: SparkSession, sf: str) -> DataFrame:
    """Pivot orders: one row per priority, one count column per status."""
    o = _t(spark, sf, "orders")
    p = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .count()
    )
    return p.select(
        "o_orderpriority",
        F.coalesce("F", F.lit(0)).alias("cnt_f"),
        F.coalesce("O", F.lit(0)).alias("cnt_o"),
        F.coalesce("P", F.lit(0)).alias("cnt_p"),
    )


def range_join_prices(spark: SparkSession, sf: str) -> DataFrame:
    """For each supplier balance, count parts whose retail price lies
    within ±50 — a point-in-interval join via bucketing (no cross
    product; intervals explode into ~2 buckets at width 100)."""
    s = _t(spark, sf, "supplier").select("s_suppkey", "s_acctbal")
    p = _t(spark, sf, "part").select(
        "p_partkey",
        (F.col("p_retailprice") - 50).alias("lo"),
        (F.col("p_retailprice") + 50).alias("hi"),
    )
    joined = range_join(s, p, "s_acctbal", "lo", "hi", bucket_width=100.0)
    return (
        joined.groupBy("s_suppkey")
        .agg(F.count("*").alias("n_parts_in_range"))
        .orderBy("s_suppkey")
    )


def interval_overlap_balances(spark: SparkSession, sf: str) -> DataFrame:
    """`operators.interval_overlap_join` through the gate: supplier
    balance windows (±25) × part price windows (±25), overlapping
    pairs counted per supplier — an interval×interval join with NO
    equi-key, where the bucket explode + first-shared-bucket emit
    keeps shuffle at rows×O(1) and needs no dedup pass."""
    from reair_spark.operators import interval_overlap_join

    s = _t(spark, sf, "supplier").select(
        "s_suppkey",
        (F.col("s_acctbal") - 25).alias("ls"),
        (F.col("s_acctbal") + 25).alias("le"),
    )
    p = _t(spark, sf, "part").select(
        (F.col("p_retailprice") - 25).alias("rs"),
        (F.col("p_retailprice") + 25).alias("re"),
    )
    joined = interval_overlap_join(s, p, "ls", "le", "rs", "re", 50.0)
    return (
        joined.groupBy("s_suppkey")
        .agg(F.count(F.lit(1)).cast("long").alias("n_overlaps"))
        .orderBy("s_suppkey")
    )


def exact_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Exact median + distinct counts (the reference had no aggregate
    layer at all; Spark also has approx_count_distinct/percentile_approx
    as the sketch path — not oracle-comparable, so the gate uses the
    exact forms). The median takes the SCALE path
    (`operators.exact_median_scalable`: histogram prune + tiny
    residual — no aggregator ever buffers the column, and the value
    matches `percentile(col, 0.5)` bit-for-bit), not the
    buffer-everything `percentile()` builtin."""
    from reair_spark.operators import exact_median_scalable

    li = _t(spark, sf, "lineitem")
    # single-purpose branches + 1-row cross joins: multiple
    # count_distinct in ONE agg makes Catalyst plan an Expand (2x the
    # scan rows through the shuffle); split branches each scan ONE
    # pruned column and shuffle only partial-agg state
    med = exact_median_scalable(li, "l_extendedprice")
    med_df = rows_df(spark, [(med,)], "median_price double")
    n_parts = li.agg(F.count_distinct("l_partkey").alias("n_parts"))
    n_supps = li.agg(F.count_distinct("l_suppkey").alias("n_supps"))
    return med_df.crossJoin(n_parts).crossJoin(n_supps)


def exact_percentiles(spark: SparkSession, sf: str) -> DataFrame:
    """Multi-quantile EXACT percentiles via the scale path
    (`operators.exact_percentiles_scalable`): two map-side-combined
    aggregation passes + one tiny residual fetch shared by ALL five
    quantiles — no single aggregator ever buffers the column, unlike
    `percentile(col, array(...))`, so the same plan survives a 100 TB
    lineitem. Gate-checked against DuckDB quantile_cont."""
    from reair_spark.operators import exact_percentiles_scalable

    li = _t(spark, sf, "lineitem")
    probs = [0.25, 0.5, 0.75, 0.9, 0.99]
    vals = exact_percentiles_scalable(li, "l_extendedprice", probs)
    return rows_df(
        spark,
        [tuple(vals)],
        "p25 double, p50 double, p75 double, p90 double, p99 double",
    )


def json_props_stats(spark: SparkSession, sf: str) -> DataFrame:
    """JSON extraction in the hot path (X2/X3 over real data): pull a
    typed field out of the events' JSON props column and aggregate per
    event type. get_json_object is JVM-side (Jackson) — no Python in
    the loop — and the extraction runs inside the scan's codegen
    stage, so a 100 TB events table pays one pass."""
    e = _t(spark, sf, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return e.groupBy("event_type").agg(
        F.count(k).cast("long").alias("n_k"),
        F.sum(k).cast("long").alias("sum_k"),
        F.min(k).cast("long").alias("min_k"),
        F.max(k).cast("long").alias("max_k"),
    )


def rollup_status_priority(spark: SparkSession, sf: str) -> DataFrame:
    """ROLLUP grouping-set hierarchy with grouping_id — the subtotal
    ladder (status×priority → status → grand total) in ONE pass; the
    Expand operator replays each row per grouping set map-side, so the
    shuffle carries partial aggregates for all levels at once."""
    o = _t(spark, sf, "orders")
    return o.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.grouping_id().cast("long").alias("gid"),
    )


def skew_salted_stats(spark: SparkSession, sf: str) -> DataFrame:
    """The skew.salted_agg two-stage aggregation through the gate:
    per-event-type stats where one hot key would otherwise pin a whole
    group on one task. Values floor to integers first so the sums are
    exact and engine-order-independent."""
    from reair_spark.skew import salted_agg

    e = _t(spark, sf, "events").select(
        "event_type", F.floor("value").cast("long").alias("v")
    )
    return salted_agg(e, "event_type", "v", salts=16)


def skew_join_salted(spark: SparkSession, sf: str) -> DataFrame:
    """The skew.salted_join replicated-build equi-join through the
    gate: events with a MANUFACTURED hot key (two-thirds of all rows
    collapse onto user 1 — the one-customer-dominates shape AQE's
    skew split handles at runtime and salting handles by
    construction) joined to the customer dimension. The salted side
    spreads each hot key over 8 tasks; the build side replicates via
    an explode — and because the salt only re-partitions work, the
    JOIN RESULT is salt-invariant, which is exactly what the oracle's
    plain join checks. Digest keeps to integers (counts, distinct
    users, id extrema) so no float crosses the boundary."""
    from reair_spark.skew import salted_join

    e = _t(spark, sf, "events").select(
        F.when(F.col("user_id") % 3 != 0, F.lit(1))
        .otherwise(F.col("user_id"))
        .cast("long")
        .alias("c_custkey"),
        "event_id",
    )
    c = _t(spark, sf, "customer").select("c_custkey", "c_mktsegment")
    joined = salted_join(e, c, "c_custkey", salts=8)
    return joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.countDistinct("c_custkey").cast("long").alias("n_users"),
        F.min("event_id").cast("long").alias("min_event"),
        F.max("event_id").cast("long").alias("max_event"),
    )


def events_moving_average(spark: SparkSession, sf: str) -> DataFrame:
    """7-row moving average over the daily event rollup — window-FRAME
    coverage (ROWS BETWEEN), which the rest of the surface's windows
    (row_number/lag/last) don't exercise. The unpartitioned window runs
    AFTER the day-level aggregation, so its input is |days| rows —
    metadata scale — regardless of corpus size; the heavy lifting is
    the map-side-combined daily count."""
    from pyspark.sql import Window as W

    e = _t(spark, sf, "events")
    daily = e.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.count(F.lit(1)).alias("n")
    )
    w = W.orderBy("day").rowsBetween(-6, 0)
    return daily.select(
        "day",
        F.col("n").cast("long").alias("n"),
        F.round(F.avg("n").over(w), 2).alias("ma7"),
    )


def _revenue():
    """Exact decimal revenue: float sums of this magnitude can flip
    the 2nd decimal between engines (summation order); decimal
    arithmetic is exact on both, so the rounded result is identical."""
    price = F.col("l_extendedprice").cast("decimal(18,4)")
    disc = F.col("l_discount").cast("decimal(18,4)")
    return F.sum(price * (F.lit(1).cast("decimal(18,4)") - disc))


_REV_SQL = (
    "sum(CAST(l_extendedprice AS DECIMAL(18,4)) * "
    "(CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4))))"
)


def tpch_q3_shipping_priority(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q3 shape: 3-way join with a selective dim side. Customer
    (filtered) broadcasts; orders⋈lineitem is the only real shuffle;
    top-10 compiles to TakeOrderedAndProject (per-partition top-k)."""
    c = _t(spark, sf, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf, "orders").where(F.col("o_orderdate") < "1998-01-01")
    li = _t(spark, sf, "lineitem").where(F.col("l_shipdate") > "1998-01-01")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(_revenue().cast("double"), 2).alias("revenue"))
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


def tpch_q5_local_supplier(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way join; all dims (region→nation→customer/
    supplier) broadcast, the fact side shuffles once for the final
    per-nation agg. The c_nationkey = s_nationkey local-supplier
    constraint rides the join."""
    r = _t(spark, sf, "region").where(F.col("r_name") == "ASIA")
    n = _t(spark, sf, "nation").join(
        F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey")
    )
    c = _t(spark, sf, "customer")
    s = _t(spark, sf, "supplier")
    o = _t(spark, sf, "orders").where(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    li = _t(spark, sf, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(
            F.broadcast(c),
            (o.o_custkey == c.c_custkey)
            & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(F.round(_revenue().cast("double"), 2).alias("revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


def tpch_q18_large_orders(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q18 shape (large-volume customers): HAVING-filtered
    aggregate used as a semi-join filter on the fact table.

    The plan exploits the HAVING's selectivity: the per-order quantity
    rollup (map-side combined, one shuffle on l_orderkey) survives
    only for orders over the threshold — a tiny set — which is then
    BROADCAST into orders, and the handful of surviving orders is in
    turn broadcast into customer. Neither orders nor customer ever
    shuffles; at 100 TB the only exchange in the whole query is the
    lineitem rollup. Deterministic top-100 via the o_orderkey
    tie-break (ties at the price cutoff would otherwise make LIMIT
    engine-dependent)."""
    li = _t(spark, sf, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .where(F.col("sum_qty") > 300)
    )
    o = _t(spark, sf, "orders")
    c = _t(spark, sf, "customer")
    big_orders = o.join(F.broadcast(big), o.o_orderkey == big.l_orderkey)
    return (
        c.join(F.broadcast(big_orders), big_orders.o_custkey == c.c_custkey)
        .select(
            "c_name",
            F.col("c_custkey").cast("long").alias("c_custkey"),
            F.col("o_orderkey").cast("long").alias("o_orderkey"),
            "o_orderdate",
            F.round(F.col("o_totalprice").cast("double"), 2).alias("o_totalprice"),
            F.col("sum_qty").cast("double").alias("sum_qty"),
        )
        .orderBy(F.desc("o_totalprice"), "o_orderdate", "o_orderkey")
        .limit(100)
    )


def fuzzy_match_parts(spark: SparkSession, sf: str) -> DataFrame:
    """Blocked fuzzy entity resolution over part names: a 'dirty' side
    (every p_name with its 3rd character deleted — a deterministic
    stand-in for typo'd vendor feeds) is matched back to the clean
    catalog within edit distance 1, then resolved to the single best
    match per dirty record (lowest distance, then lowest part key).

    Exercises `operators.deletion_neighborhood_join` (SymSpell-style
    candidate generation: candidate volume tracks |true matches|, not
    Σ_b|L_b|·|R_b| — part names share ~90 first words, so prefix
    blocking degenerated to ~10^8 levenshtein calls here) +
    `top_k_per_group` for the best-match pick. One equi-join shuffle
    on hashed variant keys, one shuffle on the dirty key for the
    window; no cross product, no populous blocks.

    The clean side pre-aggregates to (name, min key) BEFORE the join:
    the best match per dirty record orders by (dist, match_key), and
    dist is a pure function of the name pair, so only the lowest key
    per clean name can ever win — all other rows of a duplicated name
    are dead weight the window would re-discard per dirty row. This
    collapses the join-back fan-out from |rows with the name| to 1 and
    shrinks the window input from ~6M to |dirty| rows at sf0.1."""
    p = _t(spark, sf, "part")
    dirty = p.select(
        F.col("p_partkey").cast("long").alias("d_key"),
        F.concat(
            F.substring("p_name", 1, 2), F.expr("substring(p_name, 4)")
        ).alias("d_name"),
    )
    clean = p.groupBy(F.col("p_name").alias("match_name")).agg(
        F.min("p_partkey").cast("long").alias("match_key")
    )
    matched = deletion_neighborhood_join(dirty, clean, "d_name", "match_name")
    best = top_k_per_group(
        matched, ["d_key"], [F.col("dist"), F.col("match_key")], 1
    )
    return best.select(
        "d_key", "d_name", "match_key", "match_name",
        F.col("dist").cast("long").alias("dist"),
    )


def tpch_q4_priority_semi(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS-decorrelated LEFT SEMI join + count per
    priority. The semi join needs only l_orderkey from the matching
    side, so the lineitem scan prunes to one column + its pushed
    filter, and the semi-join build side deduplicates before the probe
    (Catalyst plans it as a semi hash join — no row multiplication,
    which is the whole point of EXISTS vs JOIN+DISTINCT at scale).
    Slim-schema note: the reference predicate (commitdate < receiptdate)
    maps to the available returned-flag lateness stand-in."""
    o = _t(spark, sf, "orders").where(
        (F.col("o_orderdate") >= "1996-07-01") & (F.col("o_orderdate") < "1996-10-01")
    )
    li = _t(spark, sf, "lineitem").where(F.col("l_returnflag") == "R")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).cast("long").alias("order_count"))
        .orderBy("o_orderpriority")
    )


def tpch_q10_returned_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q10 shape: fact⋈orders filtered quarter, returned items
    only, revenue per customer, nation broadcast, deterministic top 20.
    orders (date-filtered) and customer both broadcast into the
    lineitem scan at this SF; at 100 TB orders⋈lineitem shuffles on
    orderkey and the agg is map-side combined on custkey."""
    c = _t(spark, sf, "customer")
    n = _t(spark, sf, "nation")
    o = _t(spark, sf, "orders").where(
        (F.col("o_orderdate") >= "1996-10-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    li = _t(spark, sf, "lineitem").where(F.col("l_returnflag") == "R")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.round(_revenue().cast("double"), 2).alias("revenue"))
        .select(
            F.col("c_custkey").cast("long").alias("c_custkey"),
            "c_name",
            F.round(F.col("c_acctbal").cast("double"), 2).alias("c_acctbal"),
            "n_name",
            "revenue",
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


def tpch_q12_priority_buckets(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q12 shape: join + conditional two-bucket aggregation
    (high/low priority counts per line status). The CASE folds into
    the join's codegen stage, so the only exchange is the final tiny
    group-by — sum-of-CASE is the scalable form of pivot for a fixed
    bucket set."""
    o = _t(spark, sf, "orders")
    li = _t(spark, sf, "lineitem").where(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH").cast("long")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(high).alias("high_line_count"),
            F.sum(1 - high).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


def tpch_q13_order_histogram(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q13 shape: filtered LEFT OUTER join + two-level
    aggregation — per-customer order count, then the distribution of
    those counts (customers with zero orders survive the outer join
    and land in the c_count=0 bucket). The filter rides the join (not
    a WHERE after it — that would turn the outer join inner), exactly
    the reference's comment-exclusion semantics on the slim schema."""
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders").where(F.col("o_orderpriority") != "4-NOT SPECIFIED")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("long").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).cast("long").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


def tpch_q22_dormant_customers(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q22 shape: scalar subquery (global avg over a filtered
    set) + anti join (customers with NO orders) + per-group agg.
    The avg collapses to one row and enters the filter as a broadcast
    (Catalyst's scalar-subquery plan); the anti join probes orders'
    custkey set. Country code → nationkey decile on the slim schema."""
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders")
    avg_bal = (
        c.where(F.col("c_acctbal") > 0.0)
        .agg(F.avg("c_acctbal").alias("a"))
        .select(F.col("a"))
    )
    eligible = (
        c.withColumn("code", (F.col("c_nationkey") % 10).cast("long"))
        .join(avg_bal)
        .where(F.col("c_acctbal") > F.col("a"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
    )
    return (
        eligible.groupBy("code")
        .agg(
            F.count(F.lit(1)).cast("long").alias("numcust"),
            F.round(F.sum(F.col("c_acctbal").cast("decimal(18,4)")).cast("double"), 2)
            .alias("totacctbal"),
        )
        .orderBy("code")
    )


def _zorder_sql(cols: list[str], bits: int) -> str:
    """DuckDB rendering of operators.zorder_key — same shift/mask/or
    chain, bit for bit."""
    n = len(cols)
    terms = [
        f"((({c} >> {j}) & 1) << {j * n + k})"
        for j in range(bits)
        for k, c in enumerate(cols)
    ]
    return "(" + " | ".join(terms) + ")"


def lineitem_zorder_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Z-order layout key over (partkey, suppkey) deciles-of-1024 with
    per-zbucket extent stats: each 1024-key z-range covers a BOUNDED
    rectangle in both dimensions simultaneously — the property that
    makes a z-sorted write skippable on either column's predicate.
    The key is `operators.zorder_key` (pure codegen bit interleave);
    the layout itself is repartitionByRange(z)+sortWithinPartitions(z)
    at write time (asserted in test_plan_shapes)."""
    from reair_spark.operators import zorder_key

    li = _t(spark, sf, "lineitem")
    a = F.pmod(F.col("l_partkey"), F.lit(1024))
    b = F.pmod(F.col("l_suppkey"), F.lit(1024))
    z = zorder_key([a, b], bits=10)
    return (
        li.select(
            F.shiftright(z, 10).alias("zbucket"),
            a.alias("pa"),
            b.alias("pb"),
        )
        .groupBy("zbucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.min("pa").cast("long").alias("min_part"),
            F.max("pa").cast("long").alias("max_part"),
            F.min("pb").cast("long").alias("min_supp"),
            F.max("pb").cast("long").alias("max_supp"),
        )
        .orderBy("zbucket")
    )


def events_median_by_type(spark: SparkSession, sf: str) -> DataFrame:
    """Grouped-map Pandas UDF surface (applyInPandas): per-group exact
    median + count, each group's rows delivered to Python as ONE Arrow
    batch. Medians are selection (not summation), so numpy and DuckDB
    agree bit-for-bit — the right statistic to push through the
    Python path when the gate hash-compares engines.

    This is the escape hatch for per-group logic Spark's aggregates
    can't express (model fits, custom sketches); the plan is one
    shuffle on the grouping key and the Python cost is per-batch, not
    per-row (Arrow columnar transfer). The UDF body stays a nested
    closure so executors never need the package shipped."""
    e = _t(spark, sf, "events")

    def median_fn(pdf):
        import pandas as pd

        return pd.DataFrame(
            {
                "event_type": [pdf["event_type"].iloc[0]],
                "n": [len(pdf)],
                "median_value": [round(float(pdf["value"].median()), 6)],
            }
        )

    return (
        e.select("event_type", "value")
        .groupBy("event_type")
        .applyInPandas(
            median_fn, "event_type string, n long, median_value double"
        )
    )


def events_geomean_udaf(spark: SparkSession, sf: str) -> DataFrame:
    """Grouped-AGGREGATE Pandas UDF surface (the Series→scalar form,
    completing the UDF matrix: scalar q28, grouped-map median,
    map-iter multimodal, stateful funnel): per-type geometric mean of
    1+|value| computed as a vectorized numpy reduction per Arrow
    batch group, with the exp/round lifted OUTSIDE the UDF so the
    Python side returns only the log-mean scalar per group. Rounded
    at 4 decimals — numpy's pairwise sum and DuckDB's sequential avg
    agree far beyond that."""
    # built in a helper module without `from __future__ import
    # annotations` so the supported Series->float hint dispatch applies
    # (this module's stringified hints would force the deprecated
    # PandasUDFType functionType argument)
    from reair_spark.udaf_helpers import make_log1p_mean

    log1p_mean = make_log1p_mean()
    e = _t(spark, sf, "events")
    return (
        e.groupBy("event_type")
        .agg(F.round(F.exp(log1p_mean(F.col("value"))), 4).alias("geomean1p"))
        .orderBy("event_type")
    )


def grouped_percentiles(spark: SparkSession, sf: str) -> DataFrame:
    """Per-group exact quantiles (p25/p50/p75 of extendedprice per
    return flag) via the percentile(col, array(...)) aggregate — the
    grouped complement of the global `exact_percentiles`. Per-GROUP
    percentile buffers only that group's values in its aggregator, so
    unlike the global form this stays feasible whenever groups are
    bounded; unbounded groups take the histogram-prune path per key."""
    li = _t(spark, sf, "lineitem")
    pct = F.expr("percentile(l_extendedprice, array(0.25, 0.5, 0.75))")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(pct[0], 4).alias("p25"),
            F.round(pct[1], 4).alias("p50"),
            F.round(pct[2], 4).alias("p75"),
        )
        .orderBy("l_returnflag")
    )


HLL_M = 256  # 2^8 buckets; 24 bits of rank per entry


def sketch_hll_cardinality(spark: SparkSession, sf: str) -> DataFrame:
    """Portable HyperLogLog distinct-count sketch, flat in DataFrame
    algebra: bucket = h mod m over the md5-derived 32-bit hash, rank =
    leading-zero count of the remaining 24 bits + 1, one
    map-side-combined max per bucket (the ENTIRE shuffle is m rows of
    partial maxima regardless of input size — the reason HLL is the
    canonical distributed-cardinality sketch), then the standard
    bias-corrected harmonic estimate with the small-range linear
    counting correction. Production would use
    `approx_count_distinct` (Spark's native HLL++, same shape,
    engine-tuned); this portable construction is deterministic md5
    arithmetic, so DuckDB computes the IDENTICAL sketch and the gate
    hash-checks estimate AND error against the exact count.
    Measured here: |distinct l_partkey| over lineitem."""
    from reair_spark.datapipe.common import portable_hash32

    li = _t(spark, sf, "lineitem")
    h = portable_hash32(F.col("l_partkey").cast("string"))
    v = F.floor(h / HLL_M)
    rho = F.when(v > 0, 25 - F.length(F.bin(v))).otherwise(F.lit(25))
    buckets = (
        li.select((h % HLL_M).alias("bucket"), rho.alias("rho"))
        .groupBy("bucket")
        .agg(F.max("rho").alias("mj"))
    )
    alpha = 0.7213 / (1.0 + 1.079 / HLL_M)
    agg = buckets.agg(
        F.count(F.lit(1)).alias("seen"),
        F.sum(F.pow(F.lit(2.0), -F.col("mj"))).alias("zsum"),
    ).select(
        F.col("seen").cast("long").alias("n_buckets_seen"),
        (
            F.lit(alpha * HLL_M * HLL_M)
            / (F.col("zsum") + (HLL_M - F.col("seen")))
        ).alias("e_raw"),
        (HLL_M - F.col("seen")).cast("double").alias("v0"),
    )
    est = F.when(
        (F.col("e_raw") <= 2.5 * HLL_M) & (F.col("v0") > 0),
        F.round(HLL_M * F.log(F.lit(HLL_M) / F.col("v0"))),
    ).otherwise(F.round(F.col("e_raw")))
    exact = li.agg(F.count_distinct("l_partkey").alias("exact"))
    return (
        agg.crossJoin(exact)
        .select(
            "n_buckets_seen",
            est.cast("long").alias("est"),
            F.col("exact").cast("long").alias("exact"),
            F.round(F.abs(est - F.col("exact")) / F.col("exact"), 3).alias(
                "rel_err"
            ),
        )
    )


def events_gap_fill(spark: SparkSession, sf: str) -> DataFrame:
    """Sparse→dense time-series gap fill: hourly rollup per event
    type, then each type's [min, max] hour range densified via an
    exploded sequence and left-joined back — absent hours surface as
    zero-count rows. The dense spine is |types|×|hours| rows built
    from a per-type 2-row aggregate, so the explode is metadata-sized
    next to the event scan; the rollup itself is one
    map-side-combined shuffle."""
    e = _t(spark, sf, "events")
    hourly = e.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hr")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("value").alias("sum_value"),
    )
    spine = (
        hourly.groupBy("event_type")
        .agg(F.min("hr").alias("lo"), F.max("hr").alias("hi"))
        .select(
            "event_type",
            F.explode(
                F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))
            ).alias("hr"),
        )
    )
    return spine.join(hourly, ["event_type", "hr"], "left_outer").select(
        "event_type",
        "hr",
        F.coalesce("n", F.lit(0)).alias("n"),
        F.round(F.coalesce("sum_value", F.lit(0.0)), 2).alias("sum_value"),
    )


def orders_metrics_unpivot(spark: SparkSession, sf: str) -> DataFrame:
    """Unpivot (melt) — the wide→long inverse of pivot: per-priority
    metric columns rotate into (metric, value) rows via the native
    `unpivot` operator (an Expand node — each input row replays once
    per metric, map-side, no shuffle beyond the feeding aggregate).
    The long form is what metric stores and plotting layers ingest."""
    o = _t(spark, sf, "orders")
    wide = o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("double").alias("n_orders"),
        F.round(F.sum(F.col("o_totalprice").cast("decimal(18,4)")).cast("double"), 2)
        .alias("sum_price"),
        F.round(F.avg("o_totalprice"), 2).alias("avg_price"),
    )
    return (
        wide.unpivot(
            ["o_orderpriority"],
            ["n_orders", "sum_price", "avg_price"],
            "metric",
            "value",
        )
        .orderBy("o_orderpriority", "metric")
    )


def orders_price_deciles(spark: SparkSession, sf: str) -> DataFrame:
    """Ranking-window breadth: ntile/percent_rank/cume_dist over order
    price within each priority — the window-function family the rest
    of the surface (row_number/lag/last) doesn't exercise. One shuffle
    on the partition key; the fully-specified ORDER BY (price, key)
    makes every rank deterministic and engine-portable."""
    o = _t(spark, sf, "orders")
    from pyspark.sql import Window as W

    w = W.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        F.col("o_orderkey").cast("long").alias("o_orderkey"),
        "o_orderpriority",
        F.ntile(10).over(w).cast("long").alias("decile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


def orders_retention_cohorts(spark: SparkSession, sf: str) -> DataFrame:
    """Cohort retention: customers grouped by first-order month, then
    counted by months-since-cohort for each later order month — the
    classic retention triangle every warehouse ships.

    Plan shape: the cohort table is one map-side-combined min() per
    customer — |customers| rows — and joins BACK to orders broadcast
    (at 100 TB, customers ≪ orders; the fact table shuffles once for
    the final (cohort, age) count). months_between on truncated dates
    is exact integer arithmetic, so both engines agree bit-for-bit."""
    o = _t(spark, sf, "orders").select(
        "o_custkey", F.date_trunc("month", "o_orderdate").alias("om")
    )
    cohort = o.groupBy("o_custkey").agg(F.min("om").alias("cm"))
    return (
        o.join(F.broadcast(cohort), "o_custkey")
        .select(
            F.col("cm").alias("cohort_month"),
            F.months_between("om", "cm").cast("long").alias("months_since"),
            "o_custkey",
        )
        .groupBy("cohort_month", "months_since")
        .agg(F.count_distinct("o_custkey").cast("long").alias("n_customers"))
        .orderBy("cohort_month", "months_since")
    )


ZSCORE_CUT = 3.0


def events_anomaly_zscore(spark: SparkSession, sf: str) -> DataFrame:
    """Per-type anomaly flags: events whose value sits more than 3
    population standard deviations from their event_type's mean — the
    cheap statistical outlier pass a monitoring pipeline runs before
    alerting.

    Plan shape: per-type (mean, stddev_pop) is one map-side-combined
    aggregate — |types| rows — broadcast back over the stream; the
    fact side never shuffles, so the pass costs one scan at any
    volume. z rounds to 4 decimals so the flag threshold compares
    identically across engines. Degenerate constant-valued types
    (sigma = 0) are excluded in BOTH engines (ADVICE r3 #4: Spark's
    0/0 double gives NULL → row filtered, DuckDB can give inf → row
    kept — the guard makes the edge case engine-identical)."""
    e = _t(spark, sf, "events")
    stats = e.groupBy("event_type").agg(
        F.avg("value").alias("mu"),
        F.stddev_pop("value").alias("sigma"),
    )
    z = F.round((F.col("value") - F.col("mu")) / F.col("sigma"), 4)
    return (
        e.join(F.broadcast(stats), "event_type")
        .where(F.col("sigma") > 0)
        .select("event_id", "event_type", "value", z.alias("z"))
        .where(F.abs(F.col("z")) > ZSCORE_CUT)
        .orderBy("event_id")
    )


def parts_abc_pareto(spark: SparkSession, sf: str) -> DataFrame:
    """ABC/Pareto classification: parts ranked by revenue, classified
    A/B/C at 70%/90% cumulative revenue share — the classic inventory
    80/20 analysis.

    Scale shape: the per-part revenue rollup is the only fact-side
    shuffle (map-side combined, |parts| rows out); the cumulative
    share runs on that METADATA-SCALE aggregate, so the unpartitioned
    window is |parts| rows regardless of corpus size — same rationale
    as the moving-average op. Decimal revenue end-to-end; the share
    rounds before classification so the A/B/C boundary is
    engine-identical."""
    from pyspark.sql import Window as W

    li = _t(spark, sf, "lineitem")
    rev = li.groupBy("l_partkey").agg(_revenue().alias("rev_dec"))
    total = rev.agg(F.sum("rev_dec").alias("tot"))
    w = W.orderBy(F.desc("rev_dec"), "l_partkey").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    shared = (
        rev.crossJoin(F.broadcast(total))
        .withColumn(
            # divide as double AFTER the exact decimal cumsum: decimal
            # division scale/truncation rules differ across engines,
            # IEEE double division does not
            "cum_share",
            F.round(
                F.sum("rev_dec").over(w).cast("double") / F.col("tot").cast("double"),
                6,
            ),
        )
    )
    cls = (
        F.when(F.col("cum_share") <= 0.70, "A")
        .when(F.col("cum_share") <= 0.90, "B")
        .otherwise("C")
    )
    return shared.select(
        F.col("l_partkey").cast("long").alias("l_partkey"),
        # round the EXACT decimal, then cast: rounding the double
        # instead hits half-cent ties differently per engine
        F.round(F.col("rev_dec"), 2).cast("double").alias("revenue"),
        "cum_share",
        cls.alias("abc_class"),
    )


def orders_gap_histogram(spark: SparkSession, sf: str) -> DataFrame:
    """Inter-order gap distribution: per-customer day gaps between
    consecutive orders, bucketed into a week-width histogram — the
    purchase-cadence profile behind retention/LTV work.

    Plan shape: one shuffle on o_custkey for the lag window
    (parallelism = customer count, corpus-wide), then a
    map-side-combined histogram over the gap rows. Integer day
    arithmetic on date-level timestamps is exact on both engines."""
    from pyspark.sql import Window as W

    o = _t(spark, sf, "orders").select("o_custkey", "o_orderdate")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate")
    gaps = o.select(
        F.datediff("o_orderdate", F.lag("o_orderdate").over(w)).alias("gap_days")
    ).where(F.col("gap_days").isNotNull())
    return (
        gaps.select((F.floor(F.col("gap_days") / 7)).alias("gap_weeks"))
        .groupBy("gap_weeks")
        .agg(F.count(F.lit(1)).alias("n_gaps"))
        .orderBy("gap_weeks")
    )


def orders_scd2_history(spark: SparkSession, sf: str) -> DataFrame:
    """Slowly-changing-dimension (type 2) history build: collapse each
    customer's order-status sequence into validity intervals — the
    standard gaps-and-islands CDC shape every warehouse runs to turn an
    event/change stream into a dimension table with
    (valid_from, valid_to, is_current) rows.

    Scale shape: one shuffle on custkey drives both the change-flag
    window and the island rollup (same partitioning — Spark chains the
    windows without a second exchange); parallelism scales with
    customer count, and the interval close (lead over islands) runs on
    the rolled-up |islands| rows, not the fact stream."""
    from pyspark.sql import Window as W

    o = _t(spark, sf, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    chg = (
        F.when(
            F.lag("o_orderstatus").over(w).isNull()
            | (F.lag("o_orderstatus").over(w) != F.col("o_orderstatus")),
            1,
        ).otherwise(0)
    )
    islands = (
        o.select(
            "o_custkey", "o_orderstatus", "o_orderdate", "o_orderkey"
        )
        .withColumn("sid", F.sum(chg).over(w))
        .groupBy("o_custkey", "sid", "o_orderstatus")
        .agg(
            F.min("o_orderdate").alias("valid_from"),
            F.count(F.lit(1)).cast("long").alias("n_orders"),
        )
    )
    wl = W.partitionBy("o_custkey").orderBy("sid")
    return islands.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderstatus").alias("status"),
        "valid_from",
        F.lead("valid_from").over(wl).alias("valid_to"),
        F.lead("valid_from").over(wl).isNull().alias("is_current"),
        "n_orders",
    )


TIME_TRAVEL_AS_OF = "1995-06-30"


def orders_time_travel(spark: SparkSession, sf: str) -> DataFrame:
    """Time travel over the SCD2 dimension: reconstruct every
    customer's status AS OF a fixed date from the validity intervals —
    the read side of slowly-changing dimensions (the query a
    Delta/Iceberg `VERSION AS OF` serves from snapshots, answered here
    from interval algebra: the row with valid_from <= T < valid_to,
    open intervals current). One predicate over the history build —
    no extra shuffle beyond orders_scd2_history's own."""
    h = orders_scd2_history(spark, sf)
    t = F.lit(TIME_TRAVEL_AS_OF).cast("date")
    return h.where(
        (F.col("valid_from") <= t)
        & (F.col("valid_to").isNull() | (F.col("valid_to") > t))
    ).select("custkey", "status", "valid_from", "n_orders")


BASKET_MIN_SUPPORT = 3


def lineitem_market_basket(spark: SparkSession, sf: str) -> DataFrame:
    """Market-basket pair mining: part pairs co-occurring within an
    order, with support and lift — the co-occurrence analysis behind
    recommendations ("bought together").

    Scale shape: the pair generator is a self-join blocked on
    l_orderkey — basket size is bounded (≤7 lineitems/order in TPC-H),
    so candidate pairs are ≤ C(7,2) per order at ANY corpus size; the
    per-part support table is a broadcast-sized aggregate joined back
    twice for the lift denominator. No all-pairs stage anywhere."""
    from pyspark import StorageLevel

    # the distinct basket table feeds the support agg and BOTH sides
    # of the pair self-join — materialize the (orderkey, partkey)
    # pairs once instead of re-running the distinct per consumer
    li = (
        _t(spark, sf, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    li.count()
    n_orders = li.select("l_orderkey").distinct().count()
    part_n = li.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("pn"))
    a = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pa"))
    b = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pb"))
    pairs = (
        a.join(b, "ok")
        .where(F.col("pa") < F.col("pb"))
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).cast("long").alias("support"))
        .where(F.col("support") >= BASKET_MIN_SUPPORT)
    )
    lift = (
        F.col("support").cast("double")
        * F.lit(float(n_orders))
        / (F.col("na").cast("double") * F.col("nb").cast("double"))
    )
    return (
        pairs.join(
            F.broadcast(part_n.select(F.col("l_partkey").alias("pa"), F.col("pn").alias("na"))),
            "pa",
        )
        .join(
            F.broadcast(part_n.select(F.col("l_partkey").alias("pb"), F.col("pn").alias("nb"))),
            "pb",
        )
        .select(
            F.col("pa").alias("part_a"),
            F.col("pb").alias("part_b"),
            "support",
            # lift is a small-denominator rational — decimal-tie-prone,
            # so round with DuckDB's exact float-multiply convention
            round_like_duckdb(lift, 4).alias("lift"),
        )
    )


def events_incremental_rollup(spark: SparkSession, sf: str) -> DataFrame:
    """Incremental view maintenance through the correctness gate:
    yesterday's stored hourly rollup (the 90% "base" slice, standing
    in for a persisted aggregate table) merges with today's delta
    batch via `operators.merge_partial_aggs` — re-aggregating two
    partial-state tables, never rescanning base facts. The oracle
    computes the full-table rollup directly, so the gate proves the
    merge algebra (Σ of partials == total) exactly.

    Scale shape: in production the base side is a metadata-sized
    aggregate table read from storage; the only fact-scan cost is the
    delta. Mean is derived AFTER the merge from the exact (n, Σv)
    state — never averaged across partials."""
    from reair_spark.operators import merge_partial_aggs

    e = _t(spark, sf, "events").select(
        "event_id",
        "event_type",
        F.date_trunc("hour", "ts").alias("hour"),
        "value",
    )

    def partial(df):
        return df.groupBy("event_type", "hour").agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("value").alias("total"),
        )

    base = partial(e.where(F.col("event_id") % 10 != 0))
    delta = partial(e.where(F.col("event_id") % 10 == 0))
    merged = merge_partial_aggs(
        base, delta, keys=["event_type", "hour"], sums=["n", "total"]
    )
    # rounding precisions chosen OFF the decimal-tie classes: total is
    # a sum of 2-decimal values (exact at 2 decimals — no 3rd-decimal
    # 5 to tie on); mean = (2-decimal total)/n terminates in < 7
    # decimals for small 2^a5^b group sizes and never terminates for
    # other n, so 6-decimal rounding cannot land on an exact half.
    # (Rounding mean at 4 DID tie: 415.25/8 = 51.90625 exactly, and
    # cross-engine sum order broke the hash — measured at sf0.01.)
    return merged.select(
        "event_type",
        "hour",
        F.col("n").cast("long").alias("n"),
        F.round(F.col("total"), 2).alias("total"),
        F.round(F.col("total") / F.col("n"), 6).alias("mean"),
    )


PR_ITERS = 2
PR_DAMP = 0.85


def nations_trade_pagerank(spark: SparkSession, sf: str) -> DataFrame:
    """Bounded-iteration PageRank over the nation trade graph — the
    iterative-algorithm family's graph member (alongside k-means, label
    propagation, and PCA power iteration): who sits central in the
    buyer→supplier flow.

    Scale shape — the one that matters: the FACTS collapse to the
    nation-granularity edge list FIRST (one fact shuffle; ≤ N² = 625
    weighted edges), and every iteration runs on that metadata-sized
    graph via broadcast joins — the same "aggregate, then iterate on
    the small state" discipline kmeans_fit uses. Iterating on the raw
    order/lineitem edges would shuffle the corpus once per hop.
    Fixed iterations + deterministic arithmetic = the DuckDB oracle
    unrolls the identical straight-line dataflow."""
    li = _t(spark, sf, "lineitem").select("l_orderkey", "l_suppkey")
    o = _t(spark, sf, "orders").select("o_orderkey", "o_custkey")
    c = _t(spark, sf, "customer").select("c_custkey", "c_nationkey")
    s = _t(spark, sf, "supplier").select("s_suppkey", "s_nationkey")
    edges = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .groupBy(
            F.col("c_nationkey").alias("src"), F.col("s_nationkey").alias("dst")
        )
        .agg(F.count(F.lit(1)).alias("w"))
    )
    from pyspark import StorageLevel

    # ≤ N² rows after the single fact shuffle; every hop reads this
    edges = edges.persist(StorageLevel.MEMORY_AND_DISK)
    edges.count()
    outw = edges.groupBy("src").agg(F.sum("w").alias("ow"))
    e = edges.join(F.broadcast(outw), "src").select(
        "src", "dst", (F.col("w") / F.col("ow").cast("double")).alias("p")
    )
    nodes = _t(spark, sf, "nation").select(
        F.col("n_nationkey").alias("node"), "n_name"
    )
    n_nodes = nodes.count()
    rank = nodes.select("node", F.lit(1.0 / n_nodes).alias("r"))
    for _ in range(PR_ITERS):
        contrib = (
            e.join(F.broadcast(rank), e.src == rank.node)
            .groupBy("dst")
            .agg(F.sum(F.col("r") * F.col("p")).alias("cin"))
        )
        rank = nodes.join(
            F.broadcast(contrib), nodes.node == contrib.dst, "left"
        ).select(
            "node",
            (
                F.lit((1.0 - PR_DAMP) / n_nodes)
                + F.lit(PR_DAMP) * F.coalesce("cin", F.lit(0.0))
            ).alias("r"),
        )
    return (
        nodes.join(F.broadcast(rank), "node")
        .select(F.col("n_name").alias("nation"), F.round("r", 6).alias("rank"))
        .orderBy(F.desc("rank"), "nation")
    )


def _pagerank_sql() -> str:
    iters = []
    prev = "r0"
    for i in range(1, PR_ITERS + 1):
        iters.append(f"""
r{i} AS (
  SELECT n.node,
         0.15 / (SELECT cnt FROM nn)
           + 0.85 * coalesce(sum({prev}.r * e.p), 0) AS r
  FROM n
  LEFT JOIN e ON e.dst = n.node
  LEFT JOIN {prev} ON {prev}.node = e.src
  GROUP BY n.node
)""")
        prev = f"r{i}"
    chain = ",".join(iters)
    return f"""
WITH edges AS (
  SELECT c_nationkey AS src, s_nationkey AS dst, count(*) AS w
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN supplier ON l_suppkey = s_suppkey
  GROUP BY 1, 2
),
outw AS (SELECT src, sum(w) AS ow FROM edges GROUP BY 1),
e AS (SELECT src, dst, w / CAST(ow AS DOUBLE) AS p
      FROM edges JOIN outw USING (src)),
n AS (SELECT n_nationkey AS node, n_name FROM nation),
nn AS (SELECT count(*) AS cnt FROM n),
r0 AS (SELECT node, 1.0 / (SELECT cnt FROM nn) AS r FROM n),
{chain}
SELECT n_name AS nation, round({prev}.r, 6) AS rank
FROM n JOIN {prev} ON n.node = {prev}.node
ORDER BY rank DESC, nation
"""


def customer_cdc_merge(spark: SparkSession, sf: str) -> DataFrame:
    """MERGE INTO / CDC-apply semantics as one declarative plan: the
    events table is treated as a changelog against the customer base
    table (key = user_id/c_custkey; 'purchase' = DELETE, every other
    event = UPSERT carrying its value), the LATEST change per key wins
    (max_by over the (ts, event_id) total order — the same
    deterministic tiebreak stream_latest_state uses), and a full-outer
    join applies it: delete drops the row, upsert overwrites or
    inserts, untouched base rows pass through. The outcome column
    makes the merge auditable (MATCHED_UPDATE / MATCHED_DELETE /
    NOT_MATCHED_INSERT / UNTOUCHED).

    Scale shape: the changelog collapses to one row per key BEFORE
    the merge join (map-side-combined max_by — changelog volume never
    reaches the join), and the join itself is the one shuffle, exactly
    the physical plan Delta/Iceberg MERGE INTO executes."""
    base = _t(spark, sf, "customer").select(
        F.col("c_custkey").alias("key"),
        F.col("c_acctbal").cast("double").alias("base_val"),
    )
    ev = _t(spark, sf, "events")
    latest = (
        ev.groupBy(F.col("user_id").alias("key"))
        .agg(
            F.max_by(
                F.struct(
                    "event_type", F.col("value").cast("double").alias("value")
                ),
                F.struct("ts", "event_id"),
            ).alias("ch")
        )
        .select(
            "key",
            F.when(F.col("ch.event_type") == "purchase", "D")
            .otherwise("U")
            .alias("op"),
            F.col("ch.value").alias("new_val"),
        )
    )
    merged = base.join(latest, "key", "full_outer")
    outcome = (
        F.when(F.col("op").isNull(), "UNTOUCHED")
        .when(F.col("op") == "D", "MATCHED_DELETE")
        .when(F.col("base_val").isNull(), "NOT_MATCHED_INSERT")
        .otherwise("MATCHED_UPDATE")
    )
    return (
        merged.select(
            "key",
            outcome.alias("outcome"),
            F.round(
                F.when(F.col("op") == "U", F.col("new_val")).otherwise(
                    F.col("base_val")
                ),
                4,
            ).alias("val"),
        )
        .where(F.col("outcome") != "MATCHED_DELETE")
    )


_CDC_MERGE_SQL = """
WITH base AS (
  SELECT c_custkey AS key, CAST(c_acctbal AS DOUBLE) AS base_val
  FROM customer
),
latest AS (
  SELECT key,
         CASE WHEN event_type = 'purchase' THEN 'D' ELSE 'U' END AS op,
         new_val
  FROM (
    SELECT user_id AS key, event_type, CAST(value AS DOUBLE) AS new_val,
           row_number() OVER (PARTITION BY user_id
                              ORDER BY ts DESC, event_id DESC) AS rn
    FROM events) r
  WHERE rn = 1
),
merged AS (
  SELECT coalesce(b.key, l.key) AS key, b.base_val, l.op, l.new_val
  FROM base b FULL OUTER JOIN latest l ON b.key = l.key
)
SELECT key,
       CASE WHEN op IS NULL THEN 'UNTOUCHED'
            WHEN op = 'D' THEN 'MATCHED_DELETE'
            WHEN base_val IS NULL THEN 'NOT_MATCHED_INSERT'
            ELSE 'MATCHED_UPDATE' END AS outcome,
       round(CASE WHEN op = 'U' THEN new_val ELSE base_val END, 4) AS val
FROM merged
WHERE (CASE WHEN op IS NULL THEN 'UNTOUCHED'
            WHEN op = 'D' THEN 'MATCHED_DELETE'
            WHEN base_val IS NULL THEN 'NOT_MATCHED_INSERT'
            ELSE 'MATCHED_UPDATE' END) <> 'MATCHED_DELETE'
"""


EXTRA_QUERIES = {
    "customer_cdc_merge": customer_cdc_merge,
    "orders_time_travel": orders_time_travel,
    "nations_trade_pagerank": nations_trade_pagerank,
    "events_incremental_rollup": events_incremental_rollup,
    "orders_scd2_history": orders_scd2_history,
    "lineitem_market_basket": lineitem_market_basket,
    "orders_retention_cohorts": orders_retention_cohorts,
    "events_anomaly_zscore": events_anomaly_zscore,
    "parts_abc_pareto": parts_abc_pareto,
    "orders_gap_histogram": orders_gap_histogram,
    "sketch_hll_cardinality": sketch_hll_cardinality,
    "events_gap_fill": events_gap_fill,
    "events_median_by_type": events_median_by_type,
    "events_geomean_udaf": events_geomean_udaf,
    "grouped_percentiles": grouped_percentiles,
    "lineitem_zorder_stats": lineitem_zorder_stats,
    "orders_metrics_unpivot": orders_metrics_unpivot,
    "interval_overlap_balances": interval_overlap_balances,
    "tpch_q4_priority_semi": tpch_q4_priority_semi,
    "tpch_q10_returned_revenue": tpch_q10_returned_revenue,
    "tpch_q12_priority_buckets": tpch_q12_priority_buckets,
    "tpch_q13_order_histogram": tpch_q13_order_histogram,
    "tpch_q22_dormant_customers": tpch_q22_dormant_customers,
    "orders_price_deciles": orders_price_deciles,
    "json_props_stats": json_props_stats,
    "tpch_q18_large_orders": tpch_q18_large_orders,
    "fuzzy_match_parts": fuzzy_match_parts,
    "rollup_status_priority": rollup_status_priority,
    "skew_salted_stats": skew_salted_stats,
    "skew_join_salted": skew_join_salted,
    "events_moving_average": events_moving_average,
    "tpch_q3_shipping_priority": tpch_q3_shipping_priority,
    "tpch_q5_local_supplier": tpch_q5_local_supplier,
    "asof_orders_events": asof_orders_events,
    "sessionize_events": sessionize_events,
    "cube_counts": cube_counts,
    "pivot_status_priority": pivot_status_priority,
    "range_join_prices": range_join_prices,
    "exact_stats": exact_stats,
    "exact_percentiles": exact_percentiles,
}

_EV_DAYS_SQL = """
SELECT user_id,
       TIMESTAMP '1992-01-01 00:00:00' + INTERVAL ((event_id % 2400) * 86400) SECOND
         AS event_day,
       max(event_id) AS event_id
FROM events GROUP BY 1, 2
"""

EXTRA_ORACLES = {
    "customer_cdc_merge": _CDC_MERGE_SQL,
    "nations_trade_pagerank": _pagerank_sql(),
    # full-table recompute: proves the partial-merge algebra exactly
    "events_incremental_rollup": """
SELECT event_type,
       CAST(date_trunc('hour', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS hour,
       CAST(count(*) AS BIGINT) AS n,
       round(sum(value), 2) AS total,
       round(sum(value) / count(*), 6) AS mean
FROM events GROUP BY 1, 2
""",
    "orders_time_travel": """
WITH c AS (
  SELECT o_custkey, o_orderstatus, o_orderdate, o_orderkey,
         CASE WHEN lag(o_orderstatus) OVER w IS NULL
                OR lag(o_orderstatus) OVER w <> o_orderstatus
              THEN 1 ELSE 0 END AS chg
  FROM orders WINDOW w AS (PARTITION BY o_custkey
                           ORDER BY o_orderdate, o_orderkey)
),
s AS (
  SELECT o_custkey, o_orderstatus, o_orderdate,
         sum(chg) OVER (PARTITION BY o_custkey
                        ORDER BY o_orderdate, o_orderkey
                        ROWS UNBOUNDED PRECEDING) AS sid
  FROM c
),
i AS (
  SELECT o_custkey, sid, o_orderstatus,
         min(o_orderdate) AS valid_from,
         CAST(count(*) AS BIGINT) AS n_orders
  FROM s GROUP BY 1, 2, 3
),
h AS (
  SELECT o_custkey AS custkey, o_orderstatus AS status, valid_from,
         lead(valid_from) OVER w2 AS valid_to, n_orders
  FROM i WINDOW w2 AS (PARTITION BY o_custkey ORDER BY sid)
)
SELECT custkey, status, valid_from, n_orders
FROM h
WHERE valid_from <= DATE '1995-06-30'
  AND (valid_to IS NULL OR valid_to > DATE '1995-06-30')
""",
    "orders_scd2_history": """
WITH c AS (
  SELECT o_custkey, o_orderstatus, o_orderdate, o_orderkey,
         CASE WHEN lag(o_orderstatus) OVER w IS NULL
                OR lag(o_orderstatus) OVER w <> o_orderstatus
              THEN 1 ELSE 0 END AS chg
  FROM orders WINDOW w AS (PARTITION BY o_custkey
                           ORDER BY o_orderdate, o_orderkey)
),
s AS (
  SELECT o_custkey, o_orderstatus, o_orderdate,
         sum(chg) OVER (PARTITION BY o_custkey
                        ORDER BY o_orderdate, o_orderkey
                        ROWS UNBOUNDED PRECEDING) AS sid
  FROM c
),
i AS (
  SELECT o_custkey, sid, o_orderstatus,
         min(o_orderdate) AS valid_from,
         CAST(count(*) AS BIGINT) AS n_orders
  FROM s GROUP BY 1, 2, 3
)
SELECT o_custkey AS custkey, o_orderstatus AS status, valid_from,
       lead(valid_from) OVER w2 AS valid_to,
       lead(valid_from) OVER w2 IS NULL AS is_current,
       n_orders
FROM i WINDOW w2 AS (PARTITION BY o_custkey ORDER BY sid)
""",
    "lineitem_market_basket": f"""
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
n AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM lineitem),
pn AS (SELECT l_partkey, count(*) AS pn FROM li GROUP BY 1),
pairs AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
         CAST(count(*) AS BIGINT) AS support
  FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
                      AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2 HAVING count(*) >= {BASKET_MIN_SUPPORT}
)
SELECT part_a, part_b, support,
       round(support * (SELECT n_orders FROM n)
             / (na.pn * CAST(nb.pn AS DOUBLE)), 4) AS lift
FROM pairs
JOIN pn na ON na.l_partkey = part_a
JOIN pn nb ON nb.l_partkey = part_b
""",
    "parts_abc_pareto": f"""
WITH rev AS (
  SELECT l_partkey, {_REV_SQL} AS rev_dec FROM lineitem GROUP BY 1
),
tot AS (SELECT sum(rev_dec) AS tot FROM rev),
shared AS (
  SELECT l_partkey, rev_dec,
         round(CAST(sum(rev_dec) OVER (ORDER BY rev_dec DESC, l_partkey
                                       ROWS UNBOUNDED PRECEDING) AS DOUBLE)
               / CAST((SELECT tot FROM tot) AS DOUBLE), 6) AS cum_share
  FROM rev
)
SELECT CAST(l_partkey AS BIGINT) AS l_partkey,
       CAST(round(rev_dec, 2) AS DOUBLE) AS revenue,
       cum_share,
       CASE WHEN cum_share <= 0.70 THEN 'A'
            WHEN cum_share <= 0.90 THEN 'B'
            ELSE 'C' END AS abc_class
FROM shared
""",
    "orders_gap_histogram": """
WITH gaps AS (
  SELECT datediff('day',
                  lag(o_orderdate) OVER (PARTITION BY o_custkey
                                         ORDER BY o_orderdate),
                  o_orderdate) AS gap_days
  FROM orders
)
SELECT CAST(floor(gap_days / 7) AS BIGINT) AS gap_weeks,
       CAST(count(*) AS BIGINT) AS n_gaps
FROM gaps WHERE gap_days IS NOT NULL
GROUP BY 1 ORDER BY 1
""",
    "events_anomaly_zscore": f"""
WITH stats AS (
  SELECT event_type, avg(value) AS mu, stddev_pop(value) AS sigma
  FROM events GROUP BY 1
)
SELECT event_id, e.event_type, value,
       round((value - mu) / sigma, 4) AS z
FROM events e JOIN stats ON e.event_type = stats.event_type
WHERE sigma > 0 AND abs(round((value - mu) / sigma, 4)) > {ZSCORE_CUT}
ORDER BY event_id
""",
    "orders_retention_cohorts": """
WITH o AS (
  SELECT o_custkey, date_trunc('month', o_orderdate) AS om FROM orders
),
cohort AS (SELECT o_custkey, min(om) AS cm FROM o GROUP BY 1)
SELECT CAST(cm AS TIMESTAMP) AS cohort_month,
       CAST(datediff('month', cm, om) AS BIGINT) AS months_since,
       CAST(count(DISTINCT o.o_custkey) AS BIGINT) AS n_customers
FROM o JOIN cohort ON o.o_custkey = cohort.o_custkey
GROUP BY 1, 2 ORDER BY 1, 2
""",
    "interval_overlap_balances": """
SELECT s_suppkey, CAST(count(*) AS BIGINT) AS n_overlaps
FROM supplier s JOIN part p
  ON s.s_acctbal - 25 <= p.p_retailprice + 25
 AND p.p_retailprice - 25 <= s.s_acctbal + 25
GROUP BY 1 ORDER BY s_suppkey
""",
    "orders_metrics_unpivot": """
WITH wide AS (
  SELECT o_orderpriority,
         CAST(count(*) AS DOUBLE) AS n_orders,
         round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE), 2)
           AS sum_price,
         round(avg(o_totalprice), 2) AS avg_price
  FROM orders GROUP BY 1
)
SELECT o_orderpriority, 'n_orders' AS metric, n_orders AS value FROM wide
UNION ALL
SELECT o_orderpriority, 'sum_price', sum_price FROM wide
UNION ALL
SELECT o_orderpriority, 'avg_price', avg_price FROM wide
ORDER BY o_orderpriority, metric
""",
    "lineitem_zorder_stats": f"""
WITH z AS (
  SELECT {_zorder_sql(['(l_partkey % 1024)', '(l_suppkey % 1024)'], 10)} AS zk,
         l_partkey % 1024 AS pa, l_suppkey % 1024 AS pb
  FROM lineitem
)
SELECT zk >> 10 AS zbucket, CAST(count(*) AS BIGINT) AS n,
       CAST(min(pa) AS BIGINT) AS min_part, CAST(max(pa) AS BIGINT) AS max_part,
       CAST(min(pb) AS BIGINT) AS min_supp, CAST(max(pb) AS BIGINT) AS max_supp
FROM z GROUP BY 1 ORDER BY zbucket
""",
    "events_median_by_type": """
SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       round(median(value), 6) AS median_value
FROM events GROUP BY event_type
""",
    "events_geomean_udaf": """
SELECT event_type, round(exp(avg(ln(1 + abs(value)))), 4) AS geomean1p
FROM events GROUP BY event_type ORDER BY event_type
""",
    "grouped_percentiles": """
SELECT l_returnflag,
       round(quantile_cont(l_extendedprice, 0.25), 4) AS p25,
       round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
       round(quantile_cont(l_extendedprice, 0.75), 4) AS p75
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
""",
    "sketch_hll_cardinality": """
WITH h AS (
  SELECT CAST(concat('0x', substr(md5(CAST(l_partkey AS VARCHAR)), 1, 8))
              AS BIGINT) AS hv
  FROM lineitem
),
rk AS (
  SELECT hv % 256 AS bucket,
         CASE WHEN hv // 256 > 0
              THEN 25 - length(bin(hv // 256))
              ELSE 25 END AS rho
  FROM h
),
b AS (SELECT bucket, max(rho) AS mj FROM rk GROUP BY 1),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n_buckets_seen,
         (0.7213 / (1.0 + 1.079/256)) * 256 * 256
           / (sum(power(2.0, -mj)) + (256 - count(*))) AS e_raw,
         CAST(256 - count(*) AS DOUBLE) AS v0
  FROM b
),
est AS (
  SELECT n_buckets_seen,
         CASE WHEN e_raw <= 2.5 * 256 AND v0 > 0
              THEN round(256 * ln(256 / v0))
              ELSE round(e_raw) END AS est_d
  FROM agg
)
SELECT n_buckets_seen, CAST(est_d AS BIGINT) AS est,
       CAST(x.exact AS BIGINT) AS exact,
       round(abs(est_d - x.exact) / x.exact, 3) AS rel_err
FROM est CROSS JOIN (SELECT count(DISTINCT l_partkey) AS exact
                     FROM lineitem) x
""",
    "events_gap_fill": """
WITH hourly AS (
  SELECT event_type,
         CAST(date_trunc('hour', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS hr,
         CAST(count(*) AS BIGINT) AS n, sum(value) AS sum_value
  FROM events GROUP BY 1, 2
),
spine AS (
  SELECT event_type, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hr
  FROM (SELECT event_type, min(hr) AS lo, max(hr) AS hi
        FROM hourly GROUP BY 1) b
)
SELECT s.event_type, s.hr,
       coalesce(h.n, 0) AS n,
       round(coalesce(h.sum_value, 0.0), 2) AS sum_value
FROM spine s LEFT OUTER JOIN hourly h
  ON s.event_type = h.event_type AND s.hr = h.hr
""",
    "tpch_q4_priority_semi": """
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1996-07-01'
  AND o_orderdate < TIMESTAMP '1996-10-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
GROUP BY o_orderpriority ORDER BY o_orderpriority
""",
    "tpch_q10_returned_revenue": f"""
SELECT CAST(c.c_custkey AS BIGINT) AS c_custkey, c.c_name,
       round(CAST(c.c_acctbal AS DOUBLE), 2) AS c_acctbal, n.n_name,
       round(CAST({_REV_SQL} AS DOUBLE), 2) AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE o.o_orderdate >= TIMESTAMP '1996-10-01'
  AND o.o_orderdate < TIMESTAMP '1997-01-01'
  AND l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
ORDER BY revenue DESC, c_custkey LIMIT 20
""",
    "tpch_q12_priority_buckets": """
SELECT l_linestatus,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
GROUP BY l_linestatus ORDER BY l_linestatus
""",
    "tpch_q13_order_histogram": """
WITH per_cust AS (
  SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) AS c_count
  FROM customer c
  LEFT OUTER JOIN orders o
    ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '4-NOT SPECIFIED'
  GROUP BY c.c_custkey
)
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM per_cust GROUP BY c_count ORDER BY custdist DESC, c_count DESC
""",
    "tpch_q22_dormant_customers": """
SELECT CAST(c_nationkey % 10 AS BIGINT) AS code,
       CAST(count(*) AS BIGINT) AS numcust,
       round(CAST(sum(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE), 2)
         AS totacctbal
FROM customer c
WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0.0)
  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
GROUP BY 1 ORDER BY code
""",
    "orders_price_deciles": """
SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey, o_orderpriority,
       CAST(ntile(10) OVER w AS BIGINT) AS decile,
       round(percent_rank() OVER w, 6) AS pct_rank,
       round(cume_dist() OVER w, 6) AS cume
FROM orders
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
""",
    "tpch_q18_large_orders": """
WITH big AS (
  SELECT l_orderkey, sum(l_quantity) AS sum_qty FROM lineitem
  GROUP BY 1 HAVING sum(l_quantity) > 300
)
SELECT c.c_name, CAST(c.c_custkey AS BIGINT) AS c_custkey,
       CAST(o.o_orderkey AS BIGINT) AS o_orderkey, o.o_orderdate,
       ROUND(CAST(o.o_totalprice AS DOUBLE), 2) AS o_totalprice,
       CAST(b.sum_qty AS DOUBLE) AS sum_qty
FROM orders o
JOIN big b ON o.o_orderkey = b.l_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
ORDER BY o_totalprice DESC, o_orderdate, o_orderkey LIMIT 100
""",
    "fuzzy_match_parts": """
WITH dirty AS (
  SELECT CAST(p_partkey AS BIGINT) AS d_key,
         concat(substr(p_name, 1, 2), substr(p_name, 4)) AS d_name
  FROM part
),
m AS (
  SELECT d.d_key, d.d_name,
         CAST(c.p_partkey AS BIGINT) AS match_key, c.p_name AS match_name,
         levenshtein(d.d_name, c.p_name) AS dist
  FROM dirty d
  JOIN part c ON substr(d.d_name, 1, 2) = substr(c.p_name, 1, 2)
            AND abs(len(d.d_name) - len(c.p_name)) <= 1
  WHERE levenshtein(d.d_name, c.p_name) <= 1
),
r AS (
  SELECT *, row_number() OVER (PARTITION BY d_key
                               ORDER BY dist, match_key) AS rn
  FROM m
)
SELECT d_key, d_name, match_key, match_name, CAST(dist AS BIGINT) AS dist
FROM r WHERE rn = 1
""",
    "json_props_stats": """
WITH k AS (SELECT event_type,
                  CAST(json_extract_string(props, '$.k') AS BIGINT) AS kv
           FROM events)
SELECT event_type, CAST(count(kv) AS BIGINT) AS n_k,
       CAST(sum(kv) AS BIGINT) AS sum_k,
       CAST(min(kv) AS BIGINT) AS min_k, CAST(max(kv) AS BIGINT) AS max_k
FROM k GROUP BY event_type
""",
    "rollup_status_priority": (
        "SELECT o_orderstatus, o_orderpriority, "
        "CAST(count(*) AS BIGINT) AS n, "
        "CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid "
        "FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)"
    ),
    "skew_join_salted": """
WITH e AS (
  SELECT CASE WHEN user_id % 3 <> 0 THEN 1 ELSE user_id END AS c_custkey,
         event_id
  FROM events)
SELECT c_mktsegment,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(count(DISTINCT e.c_custkey) AS BIGINT) AS n_users,
       CAST(min(event_id) AS BIGINT) AS min_event,
       CAST(max(event_id) AS BIGINT) AS max_event
FROM e JOIN customer c ON c.c_custkey = e.c_custkey
GROUP BY c_mktsegment
""",
    "skew_salted_stats": """
WITH v AS (SELECT event_type, CAST(floor(value) AS BIGINT) AS v FROM events)
SELECT event_type, CAST(sum(v) AS BIGINT) AS sum_val,
       CAST(count(*) AS BIGINT) AS cnt,
       CAST(min(v) AS BIGINT) AS min_val, CAST(max(v) AS BIGINT) AS max_val
FROM v GROUP BY event_type
""",
    "events_moving_average": """
WITH daily AS (
  SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS day,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1
)
SELECT day, n,
       round(avg(n) OVER (ORDER BY day ROWS BETWEEN 6 PRECEDING
                          AND CURRENT ROW), 2) AS ma7
FROM daily
""",
    "tpch_q3_shipping_priority": f"""
SELECT l_orderkey, o_orderdate, o_orderpriority,
       round(CAST({_REV_SQL} AS DOUBLE), 2) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01'
  AND l_shipdate > TIMESTAMP '1998-01-01'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderdate, l_orderkey
LIMIT 10
""",
    "tpch_q5_local_supplier": f"""
SELECT n_name, round(CAST({_REV_SQL} AS DOUBLE), 2) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n_name
ORDER BY revenue DESC, n_name
""",
    # DuckDB's native ASOF JOIN checks the union+window implementation
    "asof_orders_events": f"""
WITH ev AS ({_EV_DAYS_SQL})
SELECT o.o_orderkey, o.o_custkey, e.event_id, e.event_day
FROM orders o ASOF LEFT JOIN ev e
  ON o.o_custkey = e.user_id AND e.event_day <= o.o_orderdate
""",
    "sessionize_events": """
WITH marked AS (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch(CAST(ts AS TIMESTAMP)) - epoch(lag(CAST(ts AS TIMESTAMP)) OVER w) > 1800
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP))
),
sessions AS (
  SELECT user_id, ts,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS session_id
  FROM marked
)
SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
       count(*) AS n_events
FROM sessions GROUP BY user_id, session_id
""",
    "cube_counts": (
        "SELECT l_returnflag, l_linestatus, count(*) AS cnt FROM lineitem "
        "GROUP BY CUBE(l_returnflag, l_linestatus)"
    ),
    "pivot_status_priority": """
SELECT o_orderpriority,
       count(*) FILTER (o_orderstatus = 'F') AS cnt_f,
       count(*) FILTER (o_orderstatus = 'O') AS cnt_o,
       count(*) FILTER (o_orderstatus = 'P') AS cnt_p
FROM orders GROUP BY 1
""",
    "range_join_prices": (
        "SELECT s_suppkey, count(*) AS n_parts_in_range FROM supplier s "
        "JOIN part p ON s.s_acctbal BETWEEN p.p_retailprice - 50 AND p.p_retailprice + 50 "
        "GROUP BY 1 ORDER BY 1"
    ),
    "exact_stats": (
        "SELECT quantile_cont(l_extendedprice, 0.5) AS median_price, "
        "count(DISTINCT l_partkey) AS n_parts, "
        "count(DISTINCT l_suppkey) AS n_supps FROM lineitem"
    ),
    "exact_percentiles": (
        "SELECT quantile_cont(l_extendedprice, 0.25) AS p25, "
        "quantile_cont(l_extendedprice, 0.5) AS p50, "
        "quantile_cont(l_extendedprice, 0.75) AS p75, "
        "quantile_cont(l_extendedprice, 0.9) AS p90, "
        "quantile_cont(l_extendedprice, 0.99) AS p99 FROM lineitem"
    ),
}


KMV_K = 256
_KMV_SCALE = (KMV_K - 1) * 4294967296  # (k-1) * 2^32, exact in int64


def sketch_kmv_intersection(spark: SparkSession, sf: str) -> DataFrame:
    """K-minimum-values sketch with SET-OPERATION estimates — the
    sketch family member HLL can't provide: two sets (urgent-order
    customers; positive-balance customers) are summarized by their k
    smallest portable-hash values, the union sketch is the k smallest
    of the merged signatures, |A∪B| ≈ (k-1)·2³²/h_(k), and the
    intersection estimate is the shared fraction of the union
    signature scaled by the union estimate (Beyer et al., SIGMOD'07).

    Distributed shape: each side collapses to ≤k rows via per-
    partition top-k + driver merge (TakeOrderedAndProject — the ONLY
    cross-partition traffic is k rows per side regardless of input
    size, which is why KMV signatures are the canonical mergeable
    distinct sketch); everything after is arithmetic on ≤2k rows.

    Determinism: the estimator is kept in INTEGER arithmetic
    ((k-1)·2³² div h_k — no float rounding seam), and the md5-derived
    hash makes DuckDB compute the IDENTICAL sketch, so the gate
    hash-checks estimates AND signature internals against the exact
    counts. Below k distinct values the sketch IS the set (exact
    regime — exercised at sf0.001, estimate regime at sf0.01+)."""
    from reair_spark.datapipe.common import portable_hash32

    o = (
        _t(spark, sf, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("key"))
        .distinct()
    )
    c = (
        _t(spark, sf, "customer")
        .filter(F.col("c_acctbal") > 1000)
        .select(F.col("c_custkey").alias("key"))
        .distinct()
    )

    def sig(df: DataFrame, side: str) -> DataFrame:
        h = portable_hash32(
            F.concat(F.lit("kmv:"), F.col("key").cast("string"))
        )
        return (
            df.select(h.alias("h"))
            .distinct()
            .orderBy("h")
            .limit(KMV_K)
            .select("h", F.lit(side).alias("side"))
        )

    union_sig = (
        sig(o, "a")
        .union(sig(c, "b"))
        .groupBy("h")
        .agg(F.count_distinct("side").alias("nsides"))
        .orderBy("h")
        .limit(KMV_K)
    )
    agg = union_sig.agg(
        F.count(F.lit(1)).cast("long").alias("n_sig"),
        F.max("h").alias("hk"),
        F.sum(F.when(F.col("nsides") == 2, 1).otherwise(0))
        .cast("long")
        .alias("n_shared"),
    )
    est_u = F.when(F.col("n_sig") < KMV_K, F.col("n_sig")).otherwise(
        F.expr(f"{_KMV_SCALE}L div hk")
    )
    with_u = agg.select(
        "n_sig", "n_shared", est_u.cast("long").alias("union_est")
    )
    est_i = F.when(F.col("n_sig") < KMV_K, F.col("n_shared")).otherwise(
        F.expr(f"(n_shared * union_est) div {KMV_K}L")
    )
    exact_u = (
        o.unionByName(c)
        .agg(F.count_distinct("key").cast("long").alias("exact_union"))
    )
    exact_i = o.join(c, "key").agg(
        F.count(F.lit(1)).cast("long").alias("exact_inter")
    )
    return (
        with_u.crossJoin(exact_u)  # 1-row scalar attaches
        .crossJoin(exact_i)
        .select(
            F.lit(KMV_K).cast("long").alias("k"),
            "n_sig",
            "n_shared",
            "union_est",
            est_i.cast("long").alias("inter_est"),
            "exact_union",
            "exact_inter",
        )
    )


EXTRA_QUERIES["sketch_kmv_intersection"] = sketch_kmv_intersection
EXTRA_ORACLES["sketch_kmv_intersection"] = f"""
WITH a AS (SELECT DISTINCT o_custkey AS key FROM orders
           WHERE o_orderpriority = '1-URGENT'),
b AS (SELECT DISTINCT c_custkey AS key FROM customer
      WHERE c_acctbal > 1000),
ha AS (SELECT DISTINCT CAST(concat('0x',
         substr(md5(concat('kmv:', CAST(key AS VARCHAR))), 1, 8))
         AS BIGINT) AS h
       FROM a ORDER BY h LIMIT {KMV_K}),
hb AS (SELECT DISTINCT CAST(concat('0x',
         substr(md5(concat('kmv:', CAST(key AS VARCHAR))), 1, 8))
         AS BIGINT) AS h
       FROM b ORDER BY h LIMIT {KMV_K}),
sig AS (SELECT h, count(DISTINCT side) AS nsides
        FROM (SELECT h, 'a' AS side FROM ha
              UNION ALL SELECT h, 'b' FROM hb)
        GROUP BY h ORDER BY h LIMIT {KMV_K}),
agg AS (SELECT CAST(count(*) AS BIGINT) AS n_sig, max(h) AS hk,
               CAST(coalesce(sum(CASE WHEN nsides = 2 THEN 1 ELSE 0 END),
                             0) AS BIGINT) AS n_shared
        FROM sig),
u AS (SELECT n_sig, n_shared,
             CAST(CASE WHEN n_sig < {KMV_K} THEN n_sig
                  ELSE {_KMV_SCALE} // hk END AS BIGINT) AS union_est
      FROM agg),
ex AS (SELECT CAST(count(DISTINCT key) AS BIGINT) AS exact_union
       FROM (SELECT key FROM a UNION ALL SELECT key FROM b)),
ei AS (SELECT CAST(count(*) AS BIGINT) AS exact_inter
       FROM a JOIN b USING (key))
SELECT CAST({KMV_K} AS BIGINT) AS k, n_sig, n_shared, union_est,
       CAST(CASE WHEN n_sig < {KMV_K} THEN n_shared
            ELSE (n_shared * union_est) // {KMV_K} END AS BIGINT)
         AS inter_est,
       exact_union, exact_inter
FROM u, ex, ei
"""


def sketch_hll_merge(spark: SparkSession, sf: str) -> DataFrame:
    """HLL MERGEABILITY through the gate — the property that makes HLL
    the canonical distributed cardinality sketch: sketch two disjoint
    halves of the key stream independently (odd/even orderkeys),
    merge by per-bucket register MAX, and the merged estimate must
    equal the whole-stream sketch's estimate EXACTLY (register merge
    is lossless — max of maxes — not approximately compatible). The
    oracle recomputes both sketches and the merge with the same md5
    arithmetic, so the gate hash-checks exact register-level equality
    plus both estimates against the true distinct count. This is the
    map-side-combine argument in miniature: partial sketches from any
    partitioning of the data merge to the same final state."""
    from reair_spark.datapipe.common import portable_hash32

    li = _t(spark, sf, "lineitem")
    h = portable_hash32(F.col("l_partkey").cast("string"))
    v = F.floor(h / HLL_M)
    rho = F.when(v > 0, 25 - F.length(F.bin(v))).otherwise(F.lit(25))

    def registers(df: DataFrame) -> DataFrame:
        return (
            df.select((h % HLL_M).alias("bucket"), rho.alias("rho"))
            .groupBy("bucket")
            .agg(F.max("rho").alias("mj"))
        )

    halves = (
        registers(li.filter(F.col("l_orderkey") % 2 == 0))
        .unionByName(registers(li.filter(F.col("l_orderkey") % 2 == 1)))
        .groupBy("bucket")
        .agg(F.max("mj").alias("mj"))  # register merge = max of maxes
    )
    whole = registers(li)

    def estimate(regs: DataFrame, tag: str) -> DataFrame:
        alpha = 0.7213 / (1.0 + 1.079 / HLL_M)
        agg = regs.agg(
            F.count(F.lit(1)).alias("seen"),
            F.sum(F.pow(F.lit(2.0), -F.col("mj"))).alias("zsum"),
            F.sum(F.col("mj")).cast("long").alias("reg_sum"),
        ).select(
            F.col("seen").cast("long").alias(f"seen_{tag}"),
            F.col("reg_sum").alias(f"regsum_{tag}"),
            (
                F.lit(alpha * HLL_M * HLL_M)
                / (F.col("zsum") + (HLL_M - F.col("seen")))
            ).alias("e_raw"),
            (HLL_M - F.col("seen")).cast("double").alias("v0"),
        )
        est = F.when(
            (F.col("e_raw") <= 2.5 * HLL_M) & (F.col("v0") > 0),
            F.round(HLL_M * F.log(F.lit(HLL_M) / F.col("v0"))),
        ).otherwise(F.round(F.col("e_raw")))
        return agg.select(
            f"seen_{tag}", f"regsum_{tag}",
            est.cast("long").alias(f"est_{tag}"),
        )

    exact = li.agg(F.count_distinct("l_partkey").cast("long").alias("exact"))
    return (
        estimate(halves, "merged")
        .crossJoin(estimate(whole, "whole"))  # 1-row scalar attaches
        .crossJoin(exact)
        .select(
            "seen_merged", "regsum_merged", "est_merged",
            "seen_whole", "regsum_whole", "est_whole",
            (F.col("est_merged") == F.col("est_whole")).alias("lossless"),
            "exact",
        )
    )


EXTRA_QUERIES["sketch_hll_merge"] = sketch_hll_merge
_HLL_REG_SQL = """
  SELECT CAST(concat('0x', substr(md5(CAST({key} AS VARCHAR)), 1, 8))
              AS BIGINT) % {m} AS bucket,
         CASE WHEN CAST(concat('0x', substr(md5(CAST({key} AS VARCHAR)),
                                1, 8)) AS BIGINT) // {m} > 0
              THEN 25 - length(bin(CAST(concat('0x',
                     substr(md5(CAST({key} AS VARCHAR)), 1, 8))
                     AS BIGINT) // {m}))
              ELSE 25 END AS rho
  FROM {src}
"""
EXTRA_ORACLES["sketch_hll_merge"] = f"""
WITH rh AS ({_HLL_REG_SQL.format(key="l_partkey", m=256,
                                 src="lineitem WHERE l_orderkey % 2 = 0")}),
rt AS ({_HLL_REG_SQL.format(key="l_partkey", m=256,
                            src="lineitem WHERE l_orderkey % 2 = 1")}),
rw AS ({_HLL_REG_SQL.format(key="l_partkey", m=256, src="lineitem")}),
merged AS (
  SELECT bucket, max(mj) AS mj FROM (
    SELECT bucket, max(rho) AS mj FROM rh GROUP BY bucket
    UNION ALL
    SELECT bucket, max(rho) AS mj FROM rt GROUP BY bucket)
  GROUP BY bucket),
whole AS (SELECT bucket, max(rho) AS mj FROM rw GROUP BY bucket),
em AS (
  SELECT CAST(count(*) AS BIGINT) AS seen_merged,
         CAST(sum(mj) AS BIGINT) AS regsum_merged,
         0.7213 / (1.0 + 1.079 / 256) * 256 * 256
           / (sum(power(2.0, -mj)) + (256 - count(*))) AS e_raw,
         CAST(256 - count(*) AS DOUBLE) AS v0
  FROM merged),
ew AS (
  SELECT CAST(count(*) AS BIGINT) AS seen_whole,
         CAST(sum(mj) AS BIGINT) AS regsum_whole,
         0.7213 / (1.0 + 1.079 / 256) * 256 * 256
           / (sum(power(2.0, -mj)) + (256 - count(*))) AS e_raw,
         CAST(256 - count(*) AS DOUBLE) AS v0
  FROM whole),
fm AS (
  SELECT seen_merged, regsum_merged,
         CAST(CASE WHEN e_raw <= 2.5 * 256 AND v0 > 0
              THEN round(256 * ln(256 / v0))
              ELSE round(e_raw) END AS BIGINT) AS est_merged
  FROM em),
fw AS (
  SELECT seen_whole, regsum_whole,
         CAST(CASE WHEN e_raw <= 2.5 * 256 AND v0 > 0
              THEN round(256 * ln(256 / v0))
              ELSE round(e_raw) END AS BIGINT) AS est_whole
  FROM ew),
ex AS (SELECT CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact
       FROM lineitem)
SELECT seen_merged, regsum_merged, est_merged,
       seen_whole, regsum_whole, est_whole,
       est_merged = est_whole AS lossless, exact
FROM fm, fw, ex
"""
