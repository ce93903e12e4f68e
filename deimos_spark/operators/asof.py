"""As-of and interval (range) joins — time-series operators Spark lacks
natively, composed from existing primitives so they scale.

As-of join (backward): for each left row, the latest right row with
right.ts <= left.ts (optionally strict <) per key.

Implementation: the union-window technique — tag both sides, union, and
take `last(right_value, ignorenulls=True)` over a (key, ts, tag) window.
ONE shuffle + per-partition sort, O(n log n) — versus the naive
join-then-rank which shuffles the full n×m candidate pairs. This is the
same plan shape a native ASOF JOIN (DuckDB/QuestDB) executes.

Interval join: equi-join on the key (hash shuffle co-location) + range
filter — never a cartesian product. For keyless range joins, bucketize
the time axis and equi-join on (bucket) the same way.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    right_value_cols: Sequence[str],
    strict: bool = False,
    suffix: str = "_right",
) -> DataFrame:
    """Backward as-of join; right_value_cols are carried onto each left row
    from the matched right row (NULL when no prior right row exists).

    strict=False → right.ts <= left.ts (ties match); strict=True → <.
    """
    # tag ordering at equal ts: inclusive → right sorts before left,
    # strict → right sorts after left (so it isn't visible to that left row)
    right_tag, left_tag = (0, 1) if not strict else (2, 1)

    rv = [F.col(c).alias(f"{c}{suffix}") for c in right_value_cols]
    r2 = right.select(
        *[F.col(k) for k in key_cols],
        F.col(ts_col),
        *rv,
        F.lit(right_tag).alias("_tag"),
    )
    l2 = left.withColumn("_tag", F.lit(left_tag))
    for c in right_value_cols:
        l2 = l2.withColumn(f"{c}{suffix}", F.lit(None).cast(right.schema[c].dataType))
    u = l2.unionByName(r2, allowMissingColumns=True)

    w = (
        Window.partitionBy(*key_cols)
        .orderBy(F.col(ts_col), F.col("_tag"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = u.select(
        *[c for c in u.columns if not c.endswith(suffix)],
        *[
            F.last(f"{c}{suffix}", ignorenulls=True).over(w).alias(f"{c}{suffix}")
            for c in right_value_cols
        ],
    )
    return matched.filter(F.col("_tag") == left_tag).drop("_tag")


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: Sequence[str],
    left_ts: str,
    right_ts: str,
    lower,
    upper,
) -> DataFrame:
    """Pairs where right.ts - left.ts ∈ (lower, upper], co-keyed.

    The equi conjunct on key_cols makes this a hash join with the range as
    a post-join filter (verified non-cartesian by plan tests). lower/upper
    are in the ts column's own units.
    """
    l2 = left.select(
        *[F.col(k) for k in key_cols], F.col(left_ts).alias("_lts"),
        *[F.col(c).alias(f"l_{c}") for c in left.columns if c not in key_cols],
    )
    r2 = right.select(
        *[F.col(k) for k in key_cols], F.col(right_ts).alias("_rts"),
        *[F.col(c).alias(f"r_{c}") for c in right.columns if c not in key_cols],
    )
    delta = F.col("_rts") - F.col("_lts")
    return l2.join(r2, list(key_cols)).filter((delta > lower) & (delta <= upper))
