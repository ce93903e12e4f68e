"""Relational operator surface (SURVEY.md §2B) as DataFrame-API builders.

Each function takes (spark, sf_dir) and returns a DataFrame whose column
names/aliases exactly match the DuckDB oracle SQL declared in
``deimos_spark.queries`` — the driver hash-compares values after sorting
columns by name.

Scale notes (these run against ~100 TB in production):
- All scans go through ``spark.read.parquet`` → Catalyst pushes filters and
  prunes columns at the source (verify with .explain: PushedFilters/ReadSchema).
- Dimension joins (nation/region) are broadcast — no shuffle of the fact side.
- Aggregations use hash partial aggregation (map-side combine) automatically.
- AQE handles skew-join splitting and shuffle-partition coalescing at runtime.

Reference parity: deimos itself has no analytic operators (SURVEY §2A note:
it delegates querying to the RDBMS it writes into, cf.
/root/reference/lib/deimos/active_record_consume/batch_consumption.rb) — this
module is the first-class analytic layer our engine adds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from deimos_spark.catalog import load_table
from deimos_spark.session import apply_runtime_confs, sort_small


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    apply_runtime_confs(spark)  # UTC TZ + AQE even on driver-owned sessions
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------- B1-B3: scan/project/filter

def scan_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B1: bare parquet scan + count. Count is computed from footer stats +
    columnar scan; no shuffle beyond the final single-row agg."""
    return _t(spark, sf_dir, "lineitem").agg(F.count(F.lit(1)).alias("cnt"))


def projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B2: column pruning — ReadSchema must contain only 3 columns."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.select("l_orderkey", "l_quantity", "l_linenumber")
        .orderBy("l_orderkey", "l_linenumber")
        .limit(100)
        .select("l_orderkey", "l_quantity")
    )


def filter_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B3: comparison/IN/BETWEEN/LIKE predicates — all pushed to the scan."""
    o = _t(spark, sf_dir, "orders")
    return o.filter(
        F.col("o_orderstatus").isin("F", "O")
        & F.col("o_totalprice").between(1000, 200000)
        & F.col("o_orderpriority").like("1%")
    ).agg(F.count(F.lit(1)).alias("cnt"))


# ---------------------------------------------------------------- B4-B10: joins

def join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B4: inner equi-join customer⋈nation; nation is tiny → broadcast."""
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey, "inner")
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def join_multiway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B5: 3-way join; both dims broadcast — single pass over customer."""
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), F.col("n_regionkey") == r.r_regionkey)
        .groupBy("r_name")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B6: left outer join + null filter = customers without orders."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .filter(F.col("o_orderkey").isNull())
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B7: left-semi join — customers with ≥1 order; no row duplication."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B8: left-anti join — NOT IN rewrite (null-safe form of B6)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_custkey").isNotNull())
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def join_broadcast_hint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B9: explicit broadcast hints; result must equal B5 (plan-level op)."""
    return join_multiway(spark, sf_dir)


def join_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B10: equi + range conjunct. The equi conjunct keeps this a hash join
    (SortMergeJoin on l_orderkey) with the range as a post-join filter —
    never a cartesian product."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    return li.join(
        o,
        (li.l_orderkey == o.o_orderkey) & (li.l_shipdate > o.o_orderdate),
        "inner",
    ).agg(F.count(F.lit(1)).alias("cnt"))


# ---------------------------------------------------------------- B11-B15: aggregation

def agg_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B11 (TPC-H Q1 shape): hash aggregate with partial (map-side) agg."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def distinct_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B12: exact count distinct (expand + two-phase agg under the hood)."""
    o = _t(spark, sf_dir, "orders")
    return o.agg(F.countDistinct("o_custkey").alias("cnt"))


def approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B13: HyperLogLog++ approx count distinct — scale path for B12.
    No oracle hash-check (approximate by construction); driver records
    rows-only. rsd=0.01 keeps it within ±5% of exact."""
    o = _t(spark, sf_dir, "orders")
    return o.agg(F.approx_count_distinct("o_custkey", rsd=0.01).alias("approx_cnt"))


def rollup_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B14: ROLLUP grouping sets."""
    o = _t(spark, sf_dir, "orders")
    return o.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("c")
    )


def having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B15: post-aggregation filter + top-k."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") > 5)
        .orderBy(F.col("c").desc(), F.col("o_custkey"))
        .limit(20)
    )


# ---------------------------------------------------------------- B16-B17: sort/limit

def sort_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B16: ORDER BY ... LIMIT — Spark plans TakeOrderedAndProject, a
    per-partition top-k + driver merge: no global sort at any scale."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(50)
        .select("o_orderkey")
    )


def limit_simple(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B17: deterministic limit (total order on unique key)."""
    o = _t(spark, sf_dir, "orders")
    return o.orderBy("o_orderkey").limit(10).select("o_orderkey")


# ---------------------------------------------------------------- B18-B20: windows

def window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B18: ranking window, top-3 per group."""
    c = _t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return (
        c.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        # ≤3 rows per segment, segments are a dimension: local sort
        .transform(sort_small, "c_mktsegment", "c_custkey")
        .select("c_mktsegment", "c_custkey")
    )


def window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B19: running sum with explicit ROWS frame.

    Spark can't push a LIMIT through a window, so the naive plan shuffles
    and sorts EVERY row before discarding all but 100. Since the output is
    the 100 smallest (custkey, orderkey) and window partitions are per
    custkey, a cheap top-k over the keys yields a custkey bound that
    pre-prunes the fact table BEFORE the window shuffle — partitions that
    survive are complete, so results are bit-identical. At 100 TB this is
    the difference between windowing the whole table and windowing ~100
    rows; the bound scan itself is a TakeOrderedAndProject over two
    columns."""
    o = _t(spark, sf_dir, "orders")
    bound = (
        o.select("o_custkey", "o_orderkey")
        .orderBy("o_custkey", "o_orderkey")
        .limit(100)
        .agg(F.max("o_custkey").alias("_b"))
    )
    pre = o.join(F.broadcast(bound)).filter(F.col("o_custkey") <= F.col("_b")).drop("_b")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        pre.withColumn("run_total", F.round(F.sum("o_totalprice").over(w), 2))
        .orderBy("o_custkey", "o_orderkey")
        .limit(100)
        .select("o_custkey", "o_orderkey", "run_total")
    )


def keep_last_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B20: keep-last-per-key — the analytic form of deimos per-batch
    compaction (reference: batch.reverse.uniq(&:key).reverse!,
    active_record_consume/batch_consumption.rb:121-125). Implemented with
    max_by-over-struct, a single hash aggregate with map-side combine —
    cheaper at scale than row_number (no per-partition sort)."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy("user_id")
        .agg(
            F.max_by(
                F.col("event_type"), F.struct(F.col("ts"), F.col("event_id"))
            ).alias("event_type")
        )
        .select("user_id", "event_type")
    )


# ---------------------------------------------------------------- B21-B23: set ops / subqueries

def union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B21: UNION (distinct) across two key sets."""
    o = _t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("k"))
    c = _t(spark, sf_dir, "customer").select(F.col("c_custkey").alias("k"))
    return o.union(c).distinct().agg(F.count(F.lit(1)).alias("cnt"))


def intersect_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B22a: INTERSECT."""
    c = _t(spark, sf_dir, "customer").select(F.col("c_custkey").alias("k"))
    o = _t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("k"))
    return c.intersect(o).agg(F.count(F.lit(1)).alias("cnt"))


def except_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B22b: EXCEPT (distinct)."""
    c = _t(spark, sf_dir, "customer").select(F.col("c_custkey").alias("k"))
    o = _t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("k"))
    return c.exceptAll(o.distinct()).distinct().agg(F.count(F.lit(1)).alias("cnt"))


def exists_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B23b: correlated EXISTS — Catalyst decorrelates to a semi join."""
    c = _t(spark, sf_dir, "customer")
    c.createOrReplaceTempView("_c_exists")
    o = _t(spark, sf_dir, "orders")
    o.createOrReplaceTempView("_o_exists")
    return spark.sql(
        """
        SELECT CAST(count(*) AS BIGINT) AS cnt FROM _c_exists c
        WHERE EXISTS (
          SELECT 1 FROM _o_exists o
          WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 100000
        )
        """
    )


def string_gauntlet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B25b: wider string-function coverage in one deterministic query:
    concat/concat_ws, replace, trim/pad, split, position, reverse."""
    c = _t(spark, sf_dir, "customer")
    return (
        c.orderBy("c_custkey")
        .limit(10)
        .select(
            F.concat_ws("-", F.col("c_mktsegment"), F.col("c_name")).alias("cw"),
            F.regexp_replace("c_name", "[aeiou]", "_").alias("rr"),
            F.lpad(F.col("c_custkey").cast("string"), 8, "0").alias("lp"),
            F.reverse(F.col("c_mktsegment")).alias("rev"),
            F.instr(F.col("c_name"), "e").cast("int").alias("pos"),
        )
    )


def date_gauntlet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B26b: date arithmetic — datediff, date_add, last_day, quarter, dow."""
    o = _t(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    return (
        o.orderBy("o_orderkey")
        .limit(20)
        .select(
            F.col("o_orderkey"),
            F.datediff(F.lit("2026-01-01").cast("date"), d).cast("int").alias("dd"),
            F.date_add(d, 30).cast("string").alias("plus30"),
            F.last_day(d).cast("string").alias("eom"),
            F.quarter(d).cast("int").alias("q"),
            F.dayofweek(d).cast("int").alias("dow"),
        )
    )


def approx_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch op: approximate percentile (no oracle — approximate by
    construction; rows-only check)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.agg(
        F.round(
            F.expr("approx_percentile(l_extendedprice, 0.5, 1000)"), 0
        ).alias("p50_approx")
    )


def grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B14b: explicit GROUPING SETS — three aggregation granularities in
    one pass (Catalyst expands to a single Expand + hash aggregate, not
    three scans)."""
    o = _t(spark, sf_dir, "orders")
    o.createOrReplaceTempView("_o_gsets")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, CAST(count(*) AS BIGINT) AS c
        FROM _o_gsets
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        ORDER BY o_orderstatus ASC NULLS FIRST,
                 o_orderpriority ASC NULLS FIRST, c
        """
    )


def cube_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B14c: CUBE over two keys = all 4 granularities, one Expand pass."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
            F.col("c"),
        )
    )


def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B19b: value-based RANGE frame (sum of orders within 1000 of the
    current price, per customer) — deterministic under ties by
    construction, unlike ROWS frames."""
    o = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_totalprice")
        .rangeBetween(-1000, Window.currentRow)
    )
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            F.round(F.sum("o_totalprice").over(w), 2).alias("near_total"),
        )
        .orderBy("o_custkey", "o_orderkey")
        .limit(100)
    )


def window_analytics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B18b: analytic-window battery — lag/lead/first_value/ntile over a
    totally-ordered partition."""
    c = _t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return (
        c.select(
            "c_mktsegment",
            "c_custkey",
            F.lag("c_custkey", 1).over(w).alias("prev_k"),
            F.lead("c_custkey", 1).over(w).alias("next_k"),
            F.first_value(F.col("c_custkey")).over(w).alias("richest_k"),
            F.ntile(4).over(w).alias("quartile"),
        )
        .orderBy("c_mktsegment", "c_custkey")
        .limit(100)
    )


def scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B23: scalar subquery — broadcast the 1-row aggregate, never collect."""
    o = _t(spark, sf_dir, "orders")
    avg_df = o.agg(F.avg("o_totalprice").alias("avg_price"))
    return (
        o.crossJoin(F.broadcast(avg_df))
        .filter(F.col("o_totalprice") > F.col("avg_price"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


# ---------------------------------------------------------------- B24-B29: expressions

def case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B24: conditional aggregation."""
    o = _t(spark, sf_dir, "orders")
    return o.agg(
        F.sum(
            F.when(F.col("o_orderpriority").like("1%"), 1).otherwise(0)
        ).alias("n_urgent")
    )


def string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B25: string functions, whole-stage-codegen'd JVM-side."""
    c = _t(spark, sf_dir, "customer")
    return (
        c.orderBy("c_custkey")
        .limit(20)
        .select(
            F.upper(F.substring("c_name", 1, 8)).alias("u"),
            F.length("c_name").alias("l"),
        )
    )


def date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B26: calendar extraction (UTC session TZ — see session.py)."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.year("o_orderdate").alias("y"), F.month("o_orderdate").alias("m")
        )
        .agg(F.count(F.lit(1)).alias("c"))
    )


def math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B27 (TPC-H Q6 shape): arithmetic + rounding."""
    li = _t(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_discount").between(0.05, 0.07)).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "revenue"
        )
    )


def json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B28: JSON path extraction over events.props (a JSON string)."""
    e = _t(spark, sf_dir, "events")
    return e.filter(
        F.get_json_object("props", "$.k").cast("int") > 50
    ).agg(F.count(F.lit(1)).alias("cnt"))


def array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B29: array size/aggregate over the embedding column (dim=64)."""
    emb = _t(spark, sf_dir, "embeddings")
    return emb.filter(F.size("embedding") == 64).agg(F.count(F.lit(1)).alias("cnt"))


def time_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling time-bucket aggregate over events — the batch-analytic form
    of a streaming windowed agg (SURVEY §2C C4).

    events.ts arrives as long nanos (see session.RUNTIME_CONFS); integer
    `div` keeps full precision (a double division would lose bits at 1e18).
    """
    e = _t(spark, sf_dir, "events")
    ts = F.timestamp_micros(F.expr("ts div 1000"))
    return (
        e.groupBy(F.date_trunc("hour", ts).alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("c"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(F.col("bucket").cast("string").alias("bucket_s"), "c", "sum_value")
    )


def batch_slicer_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A15 (batch slicing) analytic form: slice i holds each key's i-th
    occurrence in per-key order (reference algorithm:
    active_record_consume/batch_slicer.rb:16-26). The slice id IS
    row_number over (key, arrival order)."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        e.withColumn("slice", F.row_number().over(w))
        .groupBy("slice")
        .agg(F.count(F.lit(1)).alias("c"))
    )
