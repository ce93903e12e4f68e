"""Skew-handling utilities: salted aggregation and salted joins.

AQE's skew-join splitting handles most cases automatically
(spark.sql.adaptive.skewJoin.enabled, on in our session defaults); these
helpers cover the aggregation-skew and broadcast-infeasible cases AQE
doesn't: a handful of hot keys holding a large fraction of all rows
(classic in LLM corpora: empty string, boilerplate dedup keys, null-ish
tokens).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    key_cols: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase aggregation with salting for skewed group keys.

    aggs: output_name -> (input_col, fn) where fn ∈ {sum,count,min,max}.
    Phase 1 groups by (key, salt) spreading each hot key over salt_buckets
    reducers; phase 2 re-combines per key. Only algebraic aggregates (the
    re-combinable ones) are supported — exactly the constraint that makes
    the rewrite correct.

    Note Spark's partial aggregation already handles *moderate* skew; use
    this when a single key's partial states overwhelm one reducer (e.g.
    count distinct pre-aggregation over billions of rows for one key).
    """
    _COMBINE = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    _PHASE1 = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}
    for name, (col, fn) in aggs.items():
        if fn not in _COMBINE:
            raise ValueError(f"{fn!r} is not an algebraic aggregate")

    salted = df.withColumn(
        "_salt", (F.rand(seed=42) * salt_buckets).cast("int")
    )
    phase1 = salted.groupBy(*key_cols, "_salt").agg(
        *[
            _PHASE1[fn](F.col(col)).alias(f"_p_{name}")
            for name, (col, fn) in aggs.items()
        ]
    )
    return phase1.groupBy(*key_cols).agg(
        *[
            _COMBINE[fn](F.col(f"_p_{name}")).alias(name)
            for name, (col, fn) in aggs.items()
        ]
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key_cols: Sequence[str],
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skewed equi-join without broadcast: salt the big side, replicate the
    small side across all salt buckets, join on (key, salt). Use when the
    small side is too big to broadcast AND the big side has hot keys.
    Replication factor = salt_buckets on the small side only."""
    big_s = big.withColumn("_salt", (F.rand(seed=42) * salt_buckets).cast("int"))
    small_s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    out = big_s.join(small_s, [*key_cols, "_salt"], how)
    return out.drop("_salt")
