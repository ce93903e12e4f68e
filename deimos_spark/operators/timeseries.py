"""Time-series regularization: per-key resampling onto a fixed grid with
gap-filling — the "hypertable rollup / time_bucket_gapfill" family that
metric stores expose and Spark lacks as a built-in.

Design for scale: everything happens AFTER a per-(key, bucket) aggregation,
so shuffle volume is keys × buckets, never raw events. The grid is built
with `sequence()` + `explode` per key (bounded by each key's own observed
range — no global cross join against a calendar dimension), and the
forward-fill is one ordered window per key. All built-in expressions;
whole-stage codegen end to end.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    gap: int,
    order_cols: tuple[str, ...] = (),
    out_col: str = "session_seq",
) -> DataFrame:
    """Gap-based BATCH sessionization: rows whose `ts_col` (numeric, e.g.
    epoch nanos) is more than `gap` after the key's previous row start a
    new session; `out_col` numbers sessions 1..n per key. The batch twin
    of the streaming `applyInPandasWithState` sessionizer
    (streaming/stateful.py) — same semantics, expressed as two ordered
    window functions (lag → boundary flag → running sum), fully
    codegen'd. Scale: one shuffle on the key, window state is one row —
    the standard sessionization plan at any corpus size."""
    w = Window.partitionBy(key_col).orderBy(ts_col, *order_cols)
    prev = F.lag(ts_col).over(w)
    boundary = prev.isNull() | (F.col(ts_col) - prev > F.lit(gap))
    return df.withColumn(
        out_col,
        F.sum(boundary.cast("int")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )


def state_history(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    state_col: str,
    order_cols: tuple[str, ...] = (),
) -> DataFrame:
    """SCD2-style state-history materialization (gaps-and-islands):
    collapse each key's ordered `state_col` stream into maximal runs of
    one unchanged value and emit one interval row per run —
    (key, run_id, state, valid_from, last_seen, valid_to, n_events,
    is_current), `valid_to` = the next run's start (NULL on the key's
    current run). The changelog→dimension-history op warehouses call
    SCD type 2; Spark has no built-in for it.

    Change detection is null-safe (`eqNullSafe`): a NULL state is a
    value — consecutive NULLs merge into one run, and NULL→x / x→NULL
    are boundaries. `lag` and the running sum share ONE window spec
    (partition key, order ts + tiebreak), so both evaluate in a single
    Window node over one exchange + one sort; the interval `lead` runs
    over the run-level relation (keys × runs rows, already far smaller
    than the input). Scale: exactly the sessionize(!) shuffle shape —
    one hash partition on the key, O(1) window state per row."""
    w = Window.partitionBy(key_col).orderBy(ts_col, *order_cols)
    prev = F.lag(state_col).over(w)
    # a key's first row is always a boundary — without the row_number
    # term a NULL first state (lag NULL eqNullSafe NULL = true) would
    # number its first run 0 while every other key starts at 1. Same
    # window spec, so all three functions share one Window pass.
    boundary = (F.row_number().over(w) == 1) | ~prev.eqNullSafe(
        F.col(state_col)
    )
    runs = (
        df.withColumn(
            "_run",
            F.sum(boundary.cast("int")).over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .groupBy(F.col(key_col), F.col("_run").alias("run_id"))
        .agg(
            F.first(state_col).alias(state_col),
            F.min(ts_col).alias("valid_from"),
            F.max(ts_col).alias("last_seen"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
    iv = Window.partitionBy(key_col).orderBy("run_id")
    return runs.withColumn(
        "valid_to", F.lead("valid_from").over(iv)
    ).withColumn("is_current", F.col("valid_to").isNull())


def resample_ffill(
    df: DataFrame,
    key_col: str,
    ts_col: Column | str,
    value_col: str,
    interval: str = "1 day",
    order_col: str | None = None,
    sorted_output: bool = False,
) -> DataFrame:
    """Resample `value_col` onto a per-key `interval` grid, carrying the
    last observation forward across empty buckets.

    Bucket value = last observation in the bucket (by ts, tie-broken by
    `order_col` for determinism). Grid spans each key's own [first, last]
    bucket — keys contribute grid rows only where they have history.

    Returns (key, bucket TIMESTAMP, value_ff) — value_ff is never NULL
    because every key's grid starts at a bucket with an observation.

    A bucket whose aggregated value is NULL counts as MISSING, not as an
    observation: the previous non-null observation fills across it (the
    `last(_v, ignorenulls=True)` semantics of the classic grid-join
    formulation). A key's leading all-NULL buckets contribute no grid
    rows — the grid starts at the first non-null observation.

    `sorted_output=True` returns the rows globally ordered by
    (key, bucket) WITHOUT an order-by over the exploded relation. A
    top-level `.orderBy` on the output would range-partition the
    exploded grid (keys × buckets rows — the LARGEST relation in the
    plan) and, worse, range partitioning's boundary-sampling pass
    re-executes the whole upstream subtree (agg + window + explode) a
    second time (guide §2.4: an orderBy "only to make output
    deterministic" is an accidental exchange). Instead the SMALL
    pre-explode relation (one row per observed bucket) is
    range-partitioned on the key alone — RangePartitioning(_k)
    satisfies the lead() window's ClusteredDistribution(_k), so ONE
    exchange serves both the window and the output order — and the
    window's own (_k, _b) intra-partition sort plus sequence()'s
    ascending emission make the exploded output globally
    (key, bucket)-ordered: explode is a narrow per-partition
    transformation (order-preserving), equal keys never split across
    range partitions, and each observed bucket's gap range precedes
    the next observation's. Plan effect (r15): 3 Exchanges → 2, the
    Generate moves to the final stage, and the exploded grid is never
    shuffled or sample-executed; at the WEAK_AB K=30 scale the residual
    gap vs DuckDB is the 1.34M-row driver fetch, not the plan (noop
    sink 4.2–5.2s vs 8–17s with collect) — see OPTIMIZATION_r15.md.
    """
    ts = F.col(ts_col) if isinstance(ts_col, str) else ts_col
    bucket = F.date_trunc("day" if interval == "1 day" else "hour", ts)
    tie = (
        F.struct(ts.alias("_t"), F.col(order_col).alias("_o"))
        if order_col
        else ts
    )
    per_bucket = (
        df.select(
            F.col(key_col).alias("_k"),
            bucket.alias("_b"),
            F.col(value_col).alias("_v"),
            tie.alias("_tie"),
        )
        .groupBy("_k", "_b")
        .agg(F.max_by("_v", "_tie").alias("_v"))
        # NULL bucket values are missing observations, not fill sources:
        # dropping them BEFORE the lead() extends the previous non-null
        # observation's range across the gap they'd otherwise truncate
        .where(F.col("_v").isNotNull())
    )
    # each observed bucket OWNS the gap up to the next observation: one
    # lead() window + a sequence explode emits its forward-filled range
    # directly. Same result as the former grid ⋈ per_bucket + running
    # last() formulation, with one fewer aggregate, no join, and 2
    # shuffles instead of 3-4 — at 100 TB the join's grid side (every
    # key × every bucket) never materializes as shuffle input, only as
    # codegen'd explode output.
    if sorted_output:
        # one exchange for window + output order (see docstring); the
        # sampling pass only re-executes the cheap pre-explode agg
        per_bucket = per_bucket.repartitionByRange(F.col("_k").asc())
    w = Window.partitionBy("_k").orderBy("_b")
    step = F.expr(f"interval {interval}")
    return per_bucket.withColumn(
        "_nb", F.lead("_b").over(w)
    ).select(
        F.col("_k").alias(key_col),
        F.explode(
            F.sequence(
                F.col("_b"),
                # greatest() clamp: when `interval` exceeds the distance
                # to the next observed bucket (e.g. '2 hours' buckets on
                # an hour-truncated grid), _nb - step precedes _b and an
                # unclamped sequence() would raise; the clamp emits just
                # the observed bucket instead
                F.greatest(
                    F.col("_b"),
                    F.coalesce(F.col("_nb") - step, F.col("_b")),
                ),
                step,
            )
        ).alias("bucket"),
        F.col("_v").alias("value_ff"),
    )


def bucket_agg(
    df: DataFrame,
    key_col: str,
    ts_col: Column | str,
    value_col: str,
    interval: str = "1 day",
) -> DataFrame:
    """Plain per-(key, bucket) OHLC-style aggregate: first/last/min/max/avg
    — the rollup a downsampling job materializes before gap-fill."""
    ts = F.col(ts_col) if isinstance(ts_col, str) else ts_col
    bucket = F.date_trunc("day" if interval == "1 day" else "hour", ts)
    return (
        df.select(
            F.col(key_col).alias(key_col),
            bucket.alias("bucket"),
            F.col(value_col).alias("_v"),
            ts.alias("_t"),
        )
        .groupBy(key_col, "bucket")
        .agg(
            F.min_by("_v", "_t").alias("open"),
            F.max_by("_v", "_t").alias("close"),
            F.min("_v").alias("low"),
            F.max("_v").alias("high"),
            F.sum("_v").alias("vsum"),
            F.avg("_v").alias("mean"),
            F.count("*").alias("n"),
        )
    )
