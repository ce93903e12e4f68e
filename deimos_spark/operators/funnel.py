"""Event-funnel analysis: ordered step conversion over an event stream.

Semantics (classic product-analytics funnel): a user reaches step i when
they have an event of type steps[i] strictly AFTER their first-reach time
of step i-1; reach time = the earliest such event. Output = users reaching
each step, monotonically non-increasing down the funnel.

Scale notes (100 TB event logs):
- every stage is a hash aggregate + equi-join on user_id — the SAME key
  every time, so after the first shuffle the stages are co-partitioned and
  AQE/exchange-reuse keeps data in place; nothing is ever sorted globally.
- per-stage state is one row per surviving user (first-reach time), shrinkg
  monotonically down the funnel — the joins get cheaper at every step.
- the step filter pushes to the scan (event_type is a low-cardinality
  column, ideal for dictionary-encoded parquet + row-group skipping).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def funnel_reach(
    events: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: Column | str = "ts",
) -> DataFrame:
    """Per-step funnel reach counts: (step_idx INT, step STRING, users BIGINT).

    ts_col may be a Column expression (e.g. a nanos→timestamp conversion).
    """
    ts = F.col(ts_col) if isinstance(ts_col, str) else ts_col
    u = F.col(user_col)

    reached = (
        events.filter(F.col(type_col) == steps[0])
        .groupBy(u.alias("_u"))
        .agg(F.min(ts).alias("_t"))
    )
    stages = [reached]
    for step in steps[1:]:
        nxt = (
            events.filter(F.col(type_col) == step)
            .select(u.alias("_u"), ts.alias("_ts"))
            .join(stages[-1], "_u")
            .filter(F.col("_ts") > F.col("_t"))
            .groupBy("_u")
            .agg(F.min("_ts").alias("_t"))
        )
        stages.append(nxt)

    counts = None
    for i, (step, stage) in enumerate(zip(steps, stages)):
        c = stage.agg(
            F.lit(i).cast("int").alias("step_idx"),
            F.lit(step).alias("step"),
            F.count(F.lit(1)).alias("users"),
        )
        counts = c if counts is None else counts.unionAll(c)
    return counts.orderBy("step_idx")


def funnel_conversion(
    events: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: Column | str = "ts",
) -> DataFrame:
    """funnel_reach + conversion rate vs the previous step."""
    reach = funnel_reach(events, steps, user_col, type_col, ts_col)
    # prev-step lookup as a broadcast self-join on step_idx-1, NOT an
    # unpartitioned lag window: the relation is only len(steps) rows,
    # but an empty window partition spec survives into the plan even
    # when partitionBy(lit(...)) is used (Catalyst constant-folds the
    # key away) and Spark logs the single-partition scale warning on
    # every execution — the join is warning-free and equally bounded
    prev = reach.select(
        (F.col("step_idx") + 1).alias("step_idx"),
        F.col("users").alias("_prev_users"),
    )
    joined = reach.join(F.broadcast(prev), "step_idx", "left")
    return joined.select(
        "step_idx",
        "step",
        "users",
        F.round(
            F.when(F.col("_prev_users").isNull(), 1.0).otherwise(
                F.col("users") / F.col("_prev_users")
            ),
            4,
        ).alias("conv_rate"),
    ).orderBy("step_idx")
