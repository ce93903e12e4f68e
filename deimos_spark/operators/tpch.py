"""TPC-H-derived analytic suite, adapted to the driver's slimmed star schema.

The testdata tables are TPC-H-shaped but omit `partsupp` and several columns
(l_commitdate/l_receiptdate/l_shipmode, o_clerk/o_shippriority, c_address/
c_phone). Queries are therefore *adapted*: same plan shapes and operator mix
as the published TPC-H queries (multi-way joins, correlated subqueries,
exists/anti patterns, group-by-aggregate-sort pipelines) with predicates
rewritten onto available columns. h02/h11 (partsupp-bound) are omitted.

Every builder is deterministic (total ORDER BY, rounded floats) and has a
DuckDB oracle in queries.py.

Scale notes (100 TB):
- Dimension tables (region/nation/supplier/part/customer) broadcast — the
  session's 32 MB autoBroadcastJoinThreshold covers them at any realistic
  dimension scale; lineitem/orders never broadcast.
- All aggregates are hash aggregates with map-side partial combine; the
  only full shuffles are on group keys (returnflag/linestatus: 6 groups —
  AQE coalesces to 1 task; custkey/orderkey: uniform by construction).
- Top-k = TakeOrderedAndProject (no global sort materialization).
- Correlated subqueries are written as joins/window functions directly, the
  shape Catalyst's decorrelation would produce anyway.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from deimos_spark.catalog import load_table
from deimos_spark.session import apply_runtime_confs, sort_small


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    apply_runtime_confs(spark)
    return load_table(spark, sf_dir, name)


def h01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q1: pricing summary report — full aggregate battery over lineitem.
    One scan, one partial+final hash agg on a 6-value key; the canonical
    map-side-combine showcase."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2001-06-30").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(
                F.sum(
                    F.col("l_extendedprice")
                    * (1 - F.col("l_discount"))
                    * (1 + F.col("l_tax"))
                ),
                2,
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        # flag×status is a bounded dimension: local single-partition
        # sort, no rangepartitioning sampling job (session.sort_small)
        .transform(sort_small, "l_returnflag", "l_linestatus")
    )


def h03_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3: unshipped-order revenue for one market segment; top 10."""
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
        .select(
            "l_orderkey",
            F.col("o_orderdate").cast("date").cast("string").alias("o_orderdate"),
            "revenue",
        )
    )


def h04_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 (adapted): orders per priority with a late shipment — EXISTS
    becomes a left-semi join on l_orderkey (no commitdate/receiptdate in
    this schema; 'late' = shipped >90 days after order date)."""
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    late = li.join(
        o.select("o_orderkey", "o_orderdate"), li.l_orderkey == o.o_orderkey
    ).filter(F.datediff(F.col("l_shipdate"), F.col("o_orderdate")) > 90)
    return (
        o.join(late.select("l_orderkey").distinct(), o.o_orderkey == F.col("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


def h05_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5: revenue where customer and supplier share a nation, per nation
    in one region. Six-way join: two fact tables, four broadcast dims."""
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = _t(spark, sf_dir, "nation")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .transform(sort_small, F.desc("revenue"), "n_name")
    )


def h06_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6: revenue delta from discount band — pure scan+filter+agg; all
    three predicates push to the parquet scan."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
                "revenue"
            )
        )
    )


def h07_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7: bilateral trade volume between two nations by ship year."""
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sk"), F.col("n_name").alias("supp_nation")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("ck"), F.col("n_name").alias("cust_nation")
    )
    s = _t(spark, sf_dir, "supplier")
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1999-01-01").cast("timestamp"))
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), s.s_nationkey == F.col("sk"))
        .join(F.broadcast(n2), c.c_nationkey == F.col("ck"))
        .filter(pair)
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


def h08_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 (adapted): NATION_3's share of ECONOMY-part revenue sold into
    ASIA, by order year. Conditional-aggregate ratio over a 6-way join."""
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    s = _t(spark, sf_dir, "supplier")
    n_s = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("snk"), F.col("n_name").alias("supp_nation")
    )
    c = _t(spark, sf_dir, "customer")
    n_c = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cnk"), F.col("n_regionkey").alias("crk")
    )
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n_s), s.s_nationkey == F.col("snk"))
        .join(F.broadcast(n_c), c.c_nationkey == F.col("cnk"))
        .join(F.broadcast(r), F.col("crk") == r.r_regionkey)
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(0.0))
                / F.sum(vol),
                4,
            ).alias("mkt_share")
        )
        .transform(sort_small, "o_year")
    )


def h09_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 (adapted, no partsupp → revenue not profit): per supplier-nation
    and order year, revenue on parts whose brand ends in '1'."""
    p = _t(spark, sf_dir, "part").filter(F.col("p_brand").like("%1"))
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_profit")
        )
        .orderBy("nation", F.desc("o_year"))
    )


def h10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10: revenue lost to returns per customer, one quarter; top 20."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-10-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = _t(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
        .select(
            "c_custkey",
            "c_name",
            "revenue",
            F.round("c_acctbal", 2).alias("c_acctbal"),
            "n_name",
        )
    )


def h12_late_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 (adapted): urgent vs non-urgent order counts among lineitems
    shipped >60 days after order date, by ship year."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    urgent = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.datediff(F.col("l_shipdate"), F.col("o_orderdate")) > 60)
        .groupBy(F.year("l_shipdate").alias("l_year"))
        .agg(
            F.sum(F.when(urgent, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(urgent, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("l_year")
    )


def h13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13: histogram of customers by order count (left join keeps
    zero-order customers)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        ~F.col("o_orderpriority").like("4%")
    )
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        # orders-per-customer histogram: bounded-size dimension
        .transform(sort_small, F.desc("custdist"), F.desc("c_count"))
    )


def h14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14 (adapted): ECONOMY-type revenue share in one month."""
    p = _t(spark, sf_dir, "part")
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.join(F.broadcast(p), li.l_partkey == p.p_partkey).agg(
        F.round(
            F.lit(100.0)
            * F.sum(F.when(F.col("p_type") == "ECONOMY", vol).otherwise(0.0))
            / F.sum(vol),
            4,
        ).alias("promo_revenue")
    )


def h15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15: supplier(s) with max quarterly revenue — aggregate-then-max
    via a window over the aggregated (tiny) relation, not a re-scan."""
    s = _t(spark, sf_dir, "supplier")
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    rev = (
        li.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("total_revenue")
        )
    )
    # scalar max via broadcast 1-row aggregate, NOT a global window — a
    # window with no partitionBy moves every supplier row to one partition,
    # which dies at scale; this shape keeps rev fully parallel.
    mx = rev.agg(F.max("total_revenue").alias("_mx"))
    top = (
        rev.join(F.broadcast(mx), rev["total_revenue"] == mx["_mx"])
        .drop("_mx")
    )
    return (
        top.join(F.broadcast(s), F.col("supplier_no") == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


def h16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 (adapted via lineitem, no partsupp): distinct suppliers per
    (brand, type, size) excluding one brand; top 20 groups."""
    p = _t(spark, sf_dir, "part").filter(F.col("p_brand") != "Brand#1")
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
        .limit(20)
    )


def h17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17: revenue from orders of less than 20% of a part's average
    quantity, one brand. The correlated avg-subquery is a per-part
    aggregate joined back — the decorrelated plan, written directly."""
    p = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#3")
    li = _t(spark, sf_dir, "lineitem")
    branded = li.join(F.broadcast(p), li.l_partkey == p.p_partkey).select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    avg_qty = branded.groupBy(F.col("l_partkey").alias("_pk")).agg(
        (F.avg("l_quantity") * 0.2).alias("_thresh")
    )
    return (
        branded.join(avg_qty, branded.l_partkey == F.col("_pk"))
        .filter(F.col("l_quantity") < F.col("_thresh"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


def h18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18: customers with any order totaling >300 units; top 20."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > 300)
    )
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.col("o_orderdate").cast("date").cast("string").alias("o_orderdate"),
            F.round("o_totalprice", 2).alias("o_totalprice"),
            F.round("sum_qty", 2).alias("sum_qty"),
        )
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(20)
    )


def h19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19 (adapted): disjunctive brand+quantity-band predicates — the OR
    of AND-groups Catalyst turns into a single join + residual filter."""
    p = _t(spark, sf_dir, "part")
    li = _t(spark, sf_dir, "lineitem")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    cond = (
        ((F.col("p_brand") == "Brand#12") & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#3") & F.col("l_quantity").between(20, 30))
    )
    return j.filter(cond).agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("revenue")
    )


def h20_potential_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 (adapted): suppliers who moved >50 units of one SMALL part in a
    year — chained semi-join reductions, never a fact×fact join output."""
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == "SMALL")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    moved = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 50)
        .select("l_suppkey")
        .distinct()
    )
    return (
        s.join(moved, s.s_suppkey == moved.l_suppkey, "left_semi")
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .select("s_name", "n_name")
        .orderBy("s_name")
    )


def h21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 (adapted): suppliers who were the *sole* late shipper on a
    multi-supplier order ('late' = shipped >100 days after order date).
    The exists/not-exists pair becomes per-order supplier/late-supplier
    counts — two hash aggregates instead of two correlated scans."""
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    li = _t(spark, sf_dir, "lineitem")
    j = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "l_orderkey",
        "l_suppkey",
        (F.datediff(F.col("l_shipdate"), F.col("o_orderdate")) > 100).alias("_late"),
    )
    per_supp = j.groupBy("l_orderkey", "l_suppkey").agg(
        F.max(F.col("_late").cast("int")).alias("_supp_late")
    )
    # one more aggregate instead of a per_supp ⋈ per_order self-join:
    # when exactly one supplier on the order was late (_nlate == 1), the
    # max over late suppliers' keys IS the culprit — so the second
    # aggregation can carry the culprit's identity and the join (plus
    # the duplicated join+agg subtree it forced) disappears. At 100 TB
    # that's one lineitem pass and three shuffles total.
    culprit = (
        per_supp.groupBy("l_orderkey")
        .agg(
            F.count(F.lit(1)).alias("_nsupp"),
            F.sum("_supp_late").alias("_nlate"),
            F.max(
                F.when(F.col("_supp_late") == 1, F.col("l_suppkey"))
            ).alias("l_suppkey"),
        )
        .filter((F.col("_nsupp") >= 2) & (F.col("_nlate") == 1))
        .select("l_orderkey", "l_suppkey")
    )
    return (
        culprit.join(F.broadcast(s), culprit.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(10)
    )


def h22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 (adapted): wealthy customers with no recent orders per synthetic
    'country code' (custkey mod 7) — scalar subquery + anti join."""
    c = _t(spark, sf_dir, "customer").withColumn(
        "cntrycode", (F.col("c_custkey") % 7).cast("int")
    )
    o = _t(spark, sf_dir, "orders")
    eligible = c.filter(F.col("cntrycode").isin(1, 2, 4))
    avg_bal = eligible.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("_ab")
    )
    rich = eligible.join(F.broadcast(avg_bal)).filter(
        F.col("c_acctbal") > F.col("_ab")
    )
    recent = o.filter(F.col("o_orderdate") >= F.lit("2000-07-01").cast("timestamp"))
    never = rich.join(recent, rich.c_custkey == recent.o_custkey, "left_anti")
    return (
        never.groupBy("cntrycode")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )


# --------------------------------------------------- derived partsupp (round 3)

def derived_partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The testdata omits `partsupp`, so h02/h11 derive it DETERMINISTICALLY
    from part × supplier-count with pure integer arithmetic — the same
    formula is written in the DuckDB oracle SQL, so both engines compute
    the identical table (dbgen's own partsupp is generated the same way:
    4 suppliers per part via modular arithmetic, TPC-H spec 4.2.3).

        for i in 0..3:
          ps_partkey         = p_partkey
          ps_suppkey         = ((p_partkey + i) % S) + 1      (S = |supplier|)
          ps_availqty        = (p_partkey * 4 + i) % 9999 + 1
          ps_supplycost_cents= (p_partkey * 31 + i * 7) % 10000 + 100

    Cost is integer CENTS, not a rounded double: round() tie-breaking
    differs between engines on non-representable doubles, and integer
    arithmetic is exact everywhere. Scale: 4 rows per part, built by a
    broadcast of the 1-row supplier count — no shuffle."""
    part = _t(spark, sf_dir, "part")
    s_count = _t(spark, sf_dir, "supplier").agg(F.count(F.lit(1)).alias("_S"))
    return (
        part.crossJoin(F.broadcast(s_count))
        .select(
            F.col("p_partkey"),
            F.col("_S"),
            F.explode(F.sequence(F.lit(0), F.lit(3))).alias("_i"),
        )
        .select(
            F.col("p_partkey").alias("ps_partkey"),
            ((F.col("p_partkey") + F.col("_i")) % F.col("_S") + 1).alias("ps_suppkey"),
            ((F.col("p_partkey") * 4 + F.col("_i")) % 9999 + 1).alias("ps_availqty"),
            ((F.col("p_partkey") * 31 + F.col("_i") * 7) % 10000 + 100).alias(
                "ps_supplycost_cents"
            ),
        )
    )


PARTSUPP_SQL = (
    # ANSI-portable inline table (r12): VALUES instead of DuckDB's
    # unnest([...]), so h02/h11 run VERBATIM through Engine.sql too
    "(SELECT p_partkey AS ps_partkey, "
    "((p_partkey + i) % (SELECT count(*) FROM supplier)) + 1 AS ps_suppkey, "
    "(p_partkey * 4 + i) % 9999 + 1 AS ps_availqty, "
    "(p_partkey * 31 + i * 7) % 10000 + 100 AS ps_supplycost_cents "
    "FROM part, (SELECT i FROM (VALUES (0), (1), (2), (3)) AS t(i)))"
)


def h02_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2: minimum-cost supplier per part in EUROPE (p_size=15, ECONOMY).
    Decorrelated form: the per-part min over the region-filtered partsupp
    is a hash aggregate joined back — the plan Catalyst's subquery
    decorrelation produces. Dims broadcast; partsupp (4·|part| rows)
    shuffles once on ps_partkey. Top-100 via TakeOrderedAndProject."""
    ps = derived_partsupp(spark, sf_dir)
    supplier = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    part = _t(spark, sf_dir, "part").filter(
        (F.col("p_size") == 15) & (F.col("p_type") == "ECONOMY")
    )
    eu_ps = (
        ps.join(F.broadcast(supplier), ps.ps_suppkey == supplier.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .join(F.broadcast(region), F.col("n_regionkey") == region.r_regionkey)
    )
    min_cost = eu_ps.groupBy("ps_partkey").agg(
        F.min("ps_supplycost_cents").alias("_min_cost")
    )
    return (
        eu_ps.join(F.broadcast(part), eu_ps.ps_partkey == part.p_partkey)
        .join(min_cost, "ps_partkey")
        .filter(F.col("ps_supplycost_cents") == F.col("_min_cost"))
        .select(
            "s_acctbal", "s_name", "n_name",
            F.col("ps_partkey").alias("p_partkey"),
            "p_brand", "ps_supplycost_cents",
        )
        .orderBy(
            F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey"
        )
        .limit(100)
    )


def h11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11: parts whose stock value in NATION_7 exceeds 1/10000 of the
    national total. Integer value arithmetic; the threshold is a 1-row
    broadcast scalar; one shuffle on ps_partkey."""
    ps = derived_partsupp(spark, sf_dir)
    supplier = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_7")
    ps_n = (
        ps.join(F.broadcast(supplier), ps.ps_suppkey == supplier.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .select(
            "ps_partkey",
            (F.col("ps_supplycost_cents") * F.col("ps_availqty")).alias("_val"),
        )
    )
    total = ps_n.agg((F.sum("_val") / F.lit(10000.0)).alias("_threshold"))
    return (
        ps_n.groupBy("ps_partkey")
        .agg(F.sum("_val").alias("stock_value"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("stock_value") > F.col("_threshold"))
        .select("ps_partkey", "stock_value")
        .orderBy(F.col("stock_value").desc(), "ps_partkey")
    )
