"""The remaining TPC-H query shapes over the test star schema. No
``partsupp`` table exists, so Q2/Q11/Q16/Q20 substitute the DISTINCT
(l_partkey, l_suppkey) relation lineitem witnessed (with unit price /
shipped quantity standing in for supplycost / availqty) — the join and
subquery *shapes* are preserved exactly; Q9 and Q21 are likewise
adapted to the available columns. With these, all 22 TPC-H query
shapes are registered and oracle-gated.

Why these matter for the engine: each one is a canonical plan shape a
100 TB deployment will hit — scalar-subquery-as-broadcast (Q15, Q17),
disjunctive predicate pushdown into a join (Q19), nation-pair
self-classified joins (Q7), conditional-aggregate market share (Q8),
and window-based EXISTS/NOT-EXISTS elimination (Q21). All money math
is decimal end-to-end (summation-order-proof) and only rounded to
double at the output edge, the same discipline as
``extra_queries._revenue``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from reair_spark.extra_queries import _REV_SQL, _revenue
from reair_spark.io import load_table as _t


def tpch_q6_forecast_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q6 shape: pure scan-filter-aggregate. The whole query is
    one map-side-combined scan — every predicate (date range, discount
    band, quantity cap) must appear in PushedFilters; at 100 TB this is
    the query where pushdown+pruning IS the plan."""
    li = _t(spark, sf, "lineitem")
    price = F.col("l_extendedprice").cast("decimal(18,4)")
    disc = F.col("l_discount").cast("decimal(18,4)")
    return (
        li.where(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(F.round(F.sum(price * disc).cast("double"), 2).alias("revenue"))
    )


def tpch_q7_volume_shipping(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q7 shape: nation-pair trade volume. Both nation dims
    broadcast; the OR-of-pairs predicate rides the join instead of
    filtering after it, so non-qualifying rows never reach the agg.
    One fact shuffle (lineitem⋈orders); everything else is broadcast."""
    n1, n2 = "NATION_1", "NATION_2"
    li = _t(spark, sf, "lineitem").where(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    o = _t(spark, sf, "orders").select("o_orderkey", "o_custkey")
    s = _t(spark, sf, "supplier").select("s_suppkey", "s_nationkey")
    c = _t(spark, sf, "customer").select("c_custkey", "c_nationkey")
    nat = _t(spark, sf, "nation").select("n_nationkey", "n_name")
    supp_n = nat.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    cust_n = nat.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (F.col("supp_nation") == n1) & (F.col("cust_nation") == n2) | (
        F.col("supp_nation") == n2
    ) & (F.col("cust_nation") == n1)
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(supp_n), s.s_nationkey == F.col("sn_key"))
        .join(F.broadcast(cust_n), c.c_nationkey == F.col("cn_key"))
        .where(pair)
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(F.round(_revenue().cast("double"), 2).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


def tpch_q8_market_share(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q8 shape: a target nation's share of regional trade in one
    part type, by year — the conditional-aggregate-over-join pattern
    (sum(CASE)/sum). Region→nation→customer restricts the fact side
    via broadcasts before the single shuffle on the year agg."""
    target = "NATION_3"
    r = _t(spark, sf, "region").where(F.col("r_name") == "ASIA")
    nat = _t(spark, sf, "nation")
    # customers in the ASIA region (the "market")
    c_nat = nat.join(F.broadcast(r), nat.n_regionkey == r.r_regionkey).select(
        F.col("n_nationkey").alias("cn_key")
    )
    c = _t(spark, sf, "customer").join(
        F.broadcast(c_nat), F.col("c_nationkey") == F.col("cn_key")
    )
    supp_n = nat.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    p = _t(spark, sf, "part").where(F.col("p_type") == "PROMO")
    li = _t(spark, sf, "lineitem")
    o = _t(spark, sf, "orders").where(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    s = _t(spark, sf, "supplier")
    vol = F.col("l_extendedprice").cast("decimal(18,4)") * (
        F.lit(1).cast("decimal(18,4)") - F.col("l_discount").cast("decimal(18,4)")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(supp_n), s.s_nationkey == F.col("sn_key"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                (
                    F.sum(
                        F.when(F.col("supp_nation") == target, vol).otherwise(
                            F.lit(0).cast("decimal(18,4)")
                        )
                    )
                    / F.sum(vol)
                ).cast("double"),
                6,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


def tpch_q9_product_profit(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q9 shape (adapted: no partsupp, so supply cost is proxied
    as 10% of the part's retail price per unit — the join topology and
    the profit = revenue − cost·qty arithmetic are the Q9 shape).
    Profit per supplier nation per year over a name-filtered part set;
    part + supplier + nation broadcast, one fact shuffle for the agg."""
    p = _t(spark, sf, "part").where(F.col("p_type") == "STANDARD")
    li = _t(spark, sf, "lineitem")
    o = _t(spark, sf, "orders").select("o_orderkey", "o_orderdate")
    s = _t(spark, sf, "supplier").select("s_suppkey", "s_nationkey")
    nat = _t(spark, sf, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("nation")
    )
    dec = lambda c: F.col(c).cast("decimal(18,4)")  # noqa: E731
    profit = dec("l_extendedprice") * (
        F.lit(1).cast("decimal(18,4)") - dec("l_discount")
    ) - dec("p_retailprice") * F.lit(0.1).cast("decimal(18,4)") * dec("l_quantity")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(nat), s.s_nationkey == F.col("sn_key"))
        .groupBy("nation", F.year("o_orderdate").alias("o_year"))
        .agg(F.round(F.sum(profit).cast("double"), 2).alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


def tpch_q14_promo_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q14 shape: promo-revenue percentage for one ship month —
    conditional aggregate over a fact⋈dim broadcast join, single row
    out. The date filter must reach the lineitem scan."""
    li = _t(spark, sf, "lineitem").where(
        (F.col("l_shipdate") >= "1997-03-01") & (F.col("l_shipdate") < "1997-04-01")
    )
    p = _t(spark, sf, "part").select("p_partkey", "p_type")
    vol = F.col("l_extendedprice").cast("decimal(18,4)") * (
        F.lit(1).cast("decimal(18,4)") - F.col("l_discount").cast("decimal(18,4)")
    )
    return li.join(F.broadcast(p), li.l_partkey == p.p_partkey).agg(
        F.round(
            (
                F.lit(100).cast("decimal(18,4)")
                * F.sum(
                    F.when(F.col("p_type") == "PROMO", vol).otherwise(
                        F.lit(0).cast("decimal(18,4)")
                    )
                )
                / F.sum(vol)
            ).cast("double"),
            6,
        ).alias("promo_revenue")
    )


def tpch_q15_top_supplier(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q15 shape: revenue view + scalar-max subquery. The
    per-supplier revenue agg is one shuffle; the max is a 1-row
    broadcast joined back — suppliers never re-shuffle. (A window
    max would force a single-partition sort; the broadcast shape is
    the one that survives scale.)"""
    li = _t(spark, sf, "lineitem").where(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1997-04-01")
    )
    rev = (
        li.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(_revenue().alias("total_revenue_dec"))
    )
    mx = rev.agg(F.max("total_revenue_dec").alias("mx"))
    s = _t(spark, sf, "supplier").select("s_suppkey", "s_name")
    return (
        rev.join(F.broadcast(mx), rev.total_revenue_dec == F.col("mx"))
        .join(s, F.col("supplier_no") == s.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            F.round(F.col("total_revenue_dec").cast("double"), 2).alias(
                "total_revenue"
            ),
        )
        .orderBy("s_suppkey")
    )


def tpch_q17_small_quantity(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q17 shape: correlated per-part average subquery. The
    classic rewrite — pre-aggregate avg(l_quantity) per part (one
    map-side-combined shuffle), broadcast it, and filter the fact scan
    against 0.2·avg — replaces a per-row correlated subquery with one
    extra broadcast; the fact table is scanned twice but shuffled
    never."""
    p = _t(spark, sf, "part").where(
        (F.col("p_brand") == "Brand#3") & (F.col("p_type") == "SMALL")
    )
    li = _t(spark, sf, "lineitem")
    li_p = li.join(F.broadcast(p.select("p_partkey")), li.l_partkey == F.col("p_partkey"))
    avg_q = (
        li_p.groupBy(F.col("l_partkey").alias("ap_key"))
        .agg((F.avg("l_quantity") * 0.2).alias("qty_cut"))
    )
    return (
        li_p.join(F.broadcast(avg_q), li_p.l_partkey == F.col("ap_key"))
        .where(F.col("l_quantity") < F.col("qty_cut"))
        .agg(
            F.round(
                (
                    F.sum(F.col("l_extendedprice").cast("decimal(18,4)"))
                    / F.lit(7).cast("decimal(18,4)")
                ).cast("double"),
                4,
            ).alias("avg_yearly")
        )
    )


def tpch_q19_disjunctive(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-ANDs predicate spanning both join sides.
    Catalyst splits the disjunction: the part-only conjuncts
    (brand+size) and lineitem-only conjuncts (quantity bands) each
    push to their scan as an OR filter, and the mixed residual
    evaluates on the broadcast join — no row that fails every branch
    survives a scan."""
    li = _t(spark, sf, "lineitem")
    p = _t(spark, sf, "part").select("p_partkey", "p_brand", "p_size")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    b1 = (
        (F.col("p_brand") == "Brand#1")
        & (F.col("p_size").between(1, 5))
        & (F.col("l_quantity").between(1, 11))
    )
    b2 = (
        (F.col("p_brand") == "Brand#2")
        & (F.col("p_size").between(1, 10))
        & (F.col("l_quantity").between(10, 20))
    )
    b3 = (
        (F.col("p_brand") == "Brand#3")
        & (F.col("p_size").between(1, 15))
        & (F.col("l_quantity").between(20, 30))
    )
    return j.where(b1 | b2 | b3).agg(
        F.round(_revenue().cast("double"), 2).alias("revenue")
    )


def tpch_q21_waiting_supplier(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q21 shape (adapted: no commit/receipt dates, so "kept the
    order waiting" = was the UNIQUE latest shipper on a multi-supplier
    finished order). The reference formulation is EXISTS(other
    supplier) AND NOT EXISTS(other late supplier); both correlated
    quantifiers collapse into ONE window pass over the order —
    count(distinct supp), max(shipdate), and whether the max is
    unique — so the fact table shuffles once on l_orderkey instead of
    self-joining twice."""
    o = _t(spark, sf, "orders").where(F.col("o_orderstatus") == "F")
    li = _t(spark, sf, "lineitem").join(
        o.select("o_orderkey"), F.col("l_orderkey") == F.col("o_orderkey")
    )
    w = Window.partitionBy("l_orderkey")
    marked = li.select(
        "l_orderkey",
        "l_suppkey",
        "l_shipdate",
        F.size(F.collect_set("l_suppkey").over(w)).alias("n_supps"),
        F.max("l_shipdate").over(w).alias("max_ship"),
    ).withColumn(
        "n_at_max",
        F.size(
            F.collect_set(
                F.when(F.col("l_shipdate") == F.col("max_ship"), F.col("l_suppkey"))
            ).over(w)
        ),
    )
    waiting = (
        marked.where(
            (F.col("n_supps") > 1)
            & (F.col("n_at_max") == 1)
            & (F.col("l_shipdate") == F.col("max_ship"))
        )
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    s = _t(spark, sf, "supplier").select("s_suppkey", "s_name")
    return (
        waiting.join(F.broadcast(s), waiting.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )


def tpch_q16_supplier_variety(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q16 shape (adapted: no partsupp table, so the
    part↔supplier relation is the DISTINCT (l_partkey, l_suppkey)
    pairs lineitem witnessed; the complaint-supplier NOT-IN subquery is
    proxied by negative-balance suppliers). Shape preserved: filtered
    part dims broadcast onto the derived relation, an anti-join
    eliminates excluded suppliers, count(DISTINCT supplier) per
    (brand, type, size), ordered by variety.

    Scale: NO pre-distinct on the fact pairs — count_distinct in the
    final agg dedups suppliers per group with map-side partials, so
    the only fact shuffle is the (brand, type, size, suppkey) agg
    exchange after the broadcast joins prune rows (VERDICT r5 ask #8:
    the former ps.distinct() was a redundant full-fact shuffle)."""
    li = _t(spark, sf, "lineitem")
    ps = li.select("l_partkey", "l_suppkey")
    p = _t(spark, sf, "part").where(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "STANDARD")
        & F.col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    bad = _t(spark, sf, "supplier").where(F.col("s_acctbal") < 0).select(
        F.col("s_suppkey").alias("l_suppkey")
    )
    return (
        ps.join(F.broadcast(p), ps.l_partkey == p.p_partkey)
        .join(F.broadcast(bad), "l_suppkey", "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").cast("long").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


Q11_FRACTION = 0.001


def tpch_q11_part_value_share(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q11 shape (adapted: stock value per part is proxied as
    Σ quantity·retailprice over one nation's suppliers' lineitems).
    The HAVING threshold — a fraction of the GLOBAL total — is the
    scalar-subquery-as-broadcast shape: the total computes once
    (1 row) and re-enters the per-part filter as a literal-like
    broadcast, never a second fact scan per group."""
    li = _t(spark, sf, "lineitem")
    s = _t(spark, sf, "supplier").select("s_suppkey", "s_nationkey")
    nat = _t(spark, sf, "nation").where(F.col("n_name") == "NATION_1")
    p = _t(spark, sf, "part").select("p_partkey", "p_retailprice")
    dec = lambda c: F.col(c).cast("decimal(18,4)")  # noqa: E731
    val = dec("l_quantity") * dec("p_retailprice")
    per_part = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(nat), s.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("l_partkey")
        .agg(F.sum(val).alias("value_dec"))
    )
    total = per_part.agg(F.sum("value_dec")).collect()[0][0]
    # empty slice (tiny SF / missing nation): SQL's `> NULL` keeps no
    # rows — mirror that instead of crashing on float(None)
    cut = F.lit(float(total) * Q11_FRACTION) if total is not None else F.lit(None)
    return (
        per_part.where(F.col("value_dec").cast("double") > cut)
        .select(
            F.col("l_partkey").alias("partkey"),
            F.round(F.col("value_dec").cast("double"), 2).alias("value"),
        )
        .orderBy(F.desc("value"), "partkey")
    )


Q20_QTY_CAP = 50


def tpch_q20_excess_suppliers(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q20 shape (adapted: availqty is proxied by the shipped
    1996 quantity per (supplier, part) — a supplier is 'excess' if it
    moved more than Q20_QTY_CAP units of some name-filtered part).
    Shape preserved: nested IN subqueries compile to chained LEFT SEMI
    joins — part filter semi-joins the per-(supp, part) rollup, which
    semi-joins supplier — no row multiplication anywhere."""
    li = _t(spark, sf, "lineitem").where(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
    )
    p = _t(spark, sf, "part").where(F.col("p_name").startswith("part_1")).select(
        "p_partkey"
    )
    sp = (
        li.groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .where(F.col("qty") > Q20_QTY_CAP)
        .join(F.broadcast(p), F.col("l_partkey") == p.p_partkey, "left_semi")
        .select("l_suppkey")
        .distinct()
    )
    s = _t(spark, sf, "supplier")
    nat = _t(spark, sf, "nation").where(F.col("n_name") == "NATION_2")
    return (
        s.join(F.broadcast(nat), s.s_nationkey == nat.n_nationkey, "left_semi")
        .join(sp, s.s_suppkey == sp.l_suppkey, "left_semi")
        .select(F.col("s_suppkey").alias("suppkey"), F.col("s_name").alias("s_name"))
        .orderBy("s_name")
    )


def tpch_q2_min_cost_supplier(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q2 shape (adapted: ps_supplycost is proxied by the
    minimum unit price lineitem witnessed per (supplier, part) —
    min(extendedprice/quantity)). The correlated-min subquery is the
    Q2 skeleton: per filtered part, the EUROPE-region minimum cost
    computes as a metadata-sized aggregate and joins back by equality
    to pick the achieving supplier(s); dims broadcast, the unit-cost
    rollup is the only fact shuffle.

    The join-back equality compares doubles BOTH computed by this
    engine from the same rows — engine-internal, so exact; the oracle
    runs its own internally-consistent min. Output cost rounds with
    the DuckDB convention (price/qty is a small-denominator rational —
    decimal-tie-prone)."""
    from reair_spark.datapipe.common import round_like_duckdb

    li = _t(spark, sf, "lineitem")
    cost = (
        li.groupBy("l_partkey", "l_suppkey")
        .agg(
            F.min(
                F.col("l_extendedprice").cast("double")
                / F.col("l_quantity").cast("double")
            ).alias("unit_cost")
        )
    )
    s = _t(spark, sf, "supplier")
    nat = _t(spark, sf, "nation").select("n_nationkey", "n_name", "n_regionkey")
    reg = _t(spark, sf, "region").where(F.col("r_name") == "EUROPE")
    eu_supp = (
        s.join(F.broadcast(nat), s.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    p = _t(spark, sf, "part").where(
        (F.col("p_size") == 15) & (F.col("p_type") == "LARGE")
    ).select("p_partkey", "p_brand")
    eu_cost = (
        cost.join(F.broadcast(p), cost.l_partkey == p.p_partkey)
        .join(
            F.broadcast(eu_supp.select("s_suppkey")),
            cost.l_suppkey == F.col("s_suppkey"),
            "left_semi",
        )
    )
    min_cost = eu_cost.groupBy(F.col("l_partkey").alias("mk")).agg(
        F.min("unit_cost").alias("mc")
    )
    return (
        eu_cost.join(
            F.broadcast(min_cost),
            (eu_cost.l_partkey == F.col("mk"))
            & (eu_cost.unit_cost == F.col("mc")),
        )
        .join(F.broadcast(eu_supp), eu_cost.l_suppkey == eu_supp.s_suppkey)
        .select(
            F.col("s_acctbal").alias("s_acctbal"),
            "s_name",
            F.col("n_name").alias("nation"),
            F.col("l_partkey").alias("partkey"),
            "p_brand",
            round_like_duckdb(F.col("unit_cost"), 4).alias("unit_cost"),
        )
        .orderBy(F.desc("s_acctbal"), "s_name", "partkey")
        .limit(100)
    )


TPCH_MORE_QUERIES = {
    "tpch_q2_min_cost_supplier": tpch_q2_min_cost_supplier,
    "tpch_q16_supplier_variety": tpch_q16_supplier_variety,
    "tpch_q11_part_value_share": tpch_q11_part_value_share,
    "tpch_q20_excess_suppliers": tpch_q20_excess_suppliers,
    "tpch_q6_forecast_revenue": tpch_q6_forecast_revenue,
    "tpch_q7_volume_shipping": tpch_q7_volume_shipping,
    "tpch_q8_market_share": tpch_q8_market_share,
    "tpch_q9_product_profit": tpch_q9_product_profit,
    "tpch_q14_promo_revenue": tpch_q14_promo_revenue,
    "tpch_q15_top_supplier": tpch_q15_top_supplier,
    "tpch_q17_small_quantity": tpch_q17_small_quantity,
    "tpch_q19_disjunctive": tpch_q19_disjunctive,
    "tpch_q21_waiting_supplier": tpch_q21_waiting_supplier,
}

_VOL_SQL = (
    "CAST(l_extendedprice AS DECIMAL(18,4)) * "
    "(CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))"
)

TPCH_MORE_ORACLES = {
    "tpch_q2_min_cost_supplier": """
WITH cost AS (
  SELECT l_partkey, l_suppkey,
         min(l_extendedprice / l_quantity) AS unit_cost
  FROM lineitem GROUP BY 1, 2
),
eu AS (
  SELECT s_suppkey, s_name, s_acctbal, n_name
  FROM supplier
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey AND r_name = 'EUROPE'
),
pc AS (
  SELECT c.l_partkey, c.l_suppkey, c.unit_cost, p.p_brand
  FROM cost c
  JOIN part p ON c.l_partkey = p.p_partkey
             AND p.p_size = 15 AND p.p_type = 'LARGE'
  WHERE c.l_suppkey IN (SELECT s_suppkey FROM eu)
),
mc AS (
  SELECT l_partkey, min(unit_cost) AS mc FROM pc GROUP BY 1
)
SELECT eu.s_acctbal, eu.s_name, eu.n_name AS nation,
       pc.l_partkey AS partkey, pc.p_brand,
       round(pc.unit_cost, 4) AS unit_cost
FROM pc
JOIN mc ON pc.l_partkey = mc.l_partkey AND pc.unit_cost = mc.mc
JOIN eu ON pc.l_suppkey = eu.s_suppkey
ORDER BY eu.s_acctbal DESC, eu.s_name, partkey
LIMIT 100
""",
    "tpch_q16_supplier_variety": """
WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
bad AS (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
SELECT p_brand, p_type, p_size,
       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM ps
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#1' AND p_type <> 'STANDARD'
  AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM bad)
GROUP BY 1, 2, 3
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
""",
    "tpch_q11_part_value_share": f"""
WITH pp AS (
  SELECT l_partkey,
         sum(CAST(l_quantity AS DECIMAL(18,4))
             * CAST(p_retailprice AS DECIMAL(18,4))) AS value_dec
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey AND n_name = 'NATION_1'
  JOIN part ON l_partkey = p_partkey
  GROUP BY 1
)
SELECT l_partkey AS partkey,
       round(CAST(value_dec AS DOUBLE), 2) AS value
FROM pp
WHERE CAST(value_dec AS DOUBLE)
      > (SELECT CAST(sum(value_dec) AS DOUBLE) * {Q11_FRACTION} FROM pp)
ORDER BY value DESC, partkey
""",
    "tpch_q20_excess_suppliers": f"""
WITH sp AS (
  SELECT l_suppkey, l_partkey, sum(l_quantity) AS qty
  FROM lineitem
  WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1997-01-01'
  GROUP BY 1, 2
)
SELECT s_suppkey AS suppkey, s_name
FROM supplier
JOIN nation ON s_nationkey = n_nationkey AND n_name = 'NATION_2'
WHERE s_suppkey IN (
  SELECT l_suppkey FROM sp
  WHERE qty > {Q20_QTY_CAP}
    AND l_partkey IN (SELECT p_partkey FROM part WHERE starts_with(p_name, 'part_1'))
)
ORDER BY s_name
""",
    "tpch_q6_forecast_revenue": """
SELECT round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))
                   * CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE), 2) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24
""",
    "tpch_q7_volume_shipping": f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS INTEGER) AS l_year,
       round(CAST({_REV_SQL} AS DOUBLE), 2) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
  AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
""",
    "tpch_q8_market_share": f"""
SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
       round(CAST(sum(CASE WHEN n1.n_name = 'NATION_3'
                           THEN {_VOL_SQL}
                           ELSE CAST(0 AS DECIMAL(18,4)) END)
                  / sum({_VOL_SQL}) AS DOUBLE), 6) AS mkt_share
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
JOIN region   ON n2.n_regionkey = r_regionkey
WHERE r_name = 'ASIA' AND p_type = 'PROMO'
  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY 1 ORDER BY 1
""",
    "tpch_q9_product_profit": """
SELECT n_name AS nation, CAST(year(o_orderdate) AS INTEGER) AS o_year,
       round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))
                      * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))
                      - CAST(p_retailprice AS DECIMAL(18,4))
                        * CAST(0.1 AS DECIMAL(18,4))
                        * CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE), 2)
         AS sum_profit
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE p_type = 'STANDARD'
GROUP BY 1, 2 ORDER BY nation, o_year DESC
""",
    "tpch_q14_promo_revenue": f"""
SELECT round(CAST(CAST(100 AS DECIMAL(18,4))
                  * sum(CASE WHEN p_type = 'PROMO' THEN {_VOL_SQL}
                             ELSE CAST(0 AS DECIMAL(18,4)) END)
                  / sum({_VOL_SQL}) AS DOUBLE), 6) AS promo_revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-03-01' AND l_shipdate < TIMESTAMP '1997-04-01'
""",
    "tpch_q15_top_supplier": f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no, {_REV_SQL} AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01'
  GROUP BY 1
)
SELECT s_suppkey, s_name, round(CAST(total_revenue AS DOUBLE), 2) AS total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
ORDER BY s_suppkey
""",
    "tpch_q17_small_quantity": """
SELECT round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)))
                  / CAST(7 AS DECIMAL(18,4)) AS DOUBLE), 4) AS avg_yearly
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE p_brand = 'Brand#3' AND p_type = 'SMALL'
  AND l_quantity < (
    SELECT 0.2 * avg(l2.l_quantity) FROM lineitem l2
    JOIN part p2 ON l2.l_partkey = p2.p_partkey
    WHERE l2.l_partkey = lineitem.l_partkey
      AND p2.p_brand = 'Brand#3' AND p2.p_type = 'SMALL')
""",
    "tpch_q19_disjunctive": f"""
SELECT round(CAST({_REV_SQL} AS DOUBLE), 2) AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 20 AND 30)
""",
    "tpch_q21_waiting_supplier": """
WITH fli AS (
  SELECT l_orderkey, l_suppkey, l_shipdate
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
),
per_order AS (
  SELECT l_orderkey,
         count(DISTINCT l_suppkey) AS n_supps,
         max(l_shipdate) AS max_ship
  FROM fli GROUP BY 1
),
waiting AS (
  SELECT DISTINCT f.l_orderkey, f.l_suppkey
  FROM fli f JOIN per_order p ON f.l_orderkey = p.l_orderkey
  WHERE p.n_supps > 1 AND f.l_shipdate = p.max_ship
    AND 1 = (SELECT count(DISTINCT f2.l_suppkey) FROM fli f2
             WHERE f2.l_orderkey = f.l_orderkey
               AND f2.l_shipdate = p.max_ship)
)
SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
FROM waiting JOIN supplier ON l_suppkey = s_suppkey
GROUP BY 1 ORDER BY numwait DESC, s_name LIMIT 20
""",
}
