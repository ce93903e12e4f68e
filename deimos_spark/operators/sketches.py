"""Mergeable sketches: HyperLogLog distinct-count pre-aggregation.

The pattern that matters at 100 TB: compute per-partition/per-day sketches
ONCE (a normal shuffle-aggregated job), store the binary sketches (a few
KB per group), and answer any coarser-granularity distinct-count question
by MERGING sketches — never re-reading the raw data. Spark 4 ships Apache
DataSketches HLL natively (hll_sketch_agg / hll_union_agg /
hll_sketch_estimate), so the whole pipeline is JVM-side and mergeable
across jobs, days, and clusters.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hll_sketch_by(
    df: DataFrame,
    group_cols: Sequence[Column | str],
    value_col: str,
    lg_k: int = 12,
) -> DataFrame:
    """Per-group HLL sketch of value_col: (group..., hll BINARY). Store
    this — it is the re-aggregable form of `count distinct`."""
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(value_col, F.lit(lg_k)).alias("hll")
    )


def hll_rollup_estimate(
    sketches: DataFrame,
    rollup_cols: Sequence[Column | str],
    hll_col: str = "hll",
) -> DataFrame:
    """Merge stored sketches up to a coarser grain and estimate: the
    distinct-count rollup WITHOUT touching raw data."""
    return (
        sketches.groupBy(*rollup_cols)
        .agg(F.hll_union_agg(hll_col).alias("_merged"))
        .select(
            *rollup_cols,
            F.hll_sketch_estimate("_merged").alias("approx_distinct"),
        )
    )


def hll_total_estimate(sketches: DataFrame, hll_col: str = "hll") -> Column:
    """Grand-total estimate from per-group sketches (returns a 1-row df)."""
    return sketches.agg(
        F.hll_sketch_estimate(F.hll_union_agg(hll_col)).alias("approx_distinct")
    )
