"""Deterministic sampling and dataset splitting for training-data pipelines.

At 100 TB, `rand()`-based sampling is a liability: re-runs disagree, retried
tasks disagree with themselves, and train/test membership silently shifts
between pipeline versions. The standard fix (used across large-scale corpus
tooling) is content-hash bucketing — a row's split/sample membership is a
pure function of its id, so it is stable across runs, engines, partitionings,
and retries, and it needs no shuffle: one map-side expression.

All bucket math here is md5-based, JVM-side (whole-stage codegen'd in
Spark), and reproducible bit-for-bit in any engine with md5 — which is what
makes these operators DuckDB-oracle-checkable, unlike `sample()`.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BUCKETS = 10_000  # 0.01% granularity


def hash_bucket(col: Column | str, buckets: int = BUCKETS, salt: str = "") -> Column:
    """Deterministic bucket in [0, buckets) from md5(salt || value).

    Uses the first 8 hex chars (32 bits) — uniform and engine-portable.
    `salt` decorrelates independent sampling decisions over the same ids
    (e.g. a split and a downstream subsample must not reuse one hash).
    """
    c = F.col(col) if isinstance(col, str) else col
    hexpart = F.substring(F.md5(F.concat(F.lit(salt), c.cast("string"))), 1, 8)
    return (F.conv(hexpart, 16, 10).cast("bigint") % buckets).cast("int")


def hash_split(
    df: DataFrame,
    id_col: str,
    weights: dict[str, float],
    salt: str = "split",
) -> DataFrame:
    """Assign every row a stable split label ('train'/'val'/'test'/...).

    Weights are cumulative bucket thresholds; a row's label never changes
    when the data around it changes — the property random splits lack.
    Adds a `split` column; no shuffle, no state.
    """
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1, got {total}")
    bucket = hash_bucket(id_col, salt=salt)
    expr = None
    acc = 0.0
    for name, w in weights.items():
        acc += w
        hi = int(round(acc * BUCKETS))
        cond = bucket < F.lit(hi)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    # float rounding guard: anything at the very top edge joins the last split
    last = list(weights)[-1]
    return df.withColumn("split", expr.otherwise(F.lit(last)))


def dedup_safe_split(
    df: DataFrame,
    content_col: str,
    weights: dict[str, float],
    salt: str = "split",
) -> DataFrame:
    """Leakage-safe split: bucket on the CONTENT hash, not the row id,
    so byte-identical duplicates always land in the same split.

    Splitting a deduplicated-in-name-only corpus by row id leaks
    training text into eval: every duplicate pair straddling the
    boundary is a memorization freebie. Keying the split on
    md5(content) makes co-location structural — no join against a
    dup-pair table, no shuffle, just a different hash input. (Near-dup
    clusters need the t20 cluster id as the key instead; same
    mechanism.)
    """
    keyed = df.withColumn("__content_key", F.md5(F.col(content_col)))
    return hash_split(keyed, "__content_key", weights, salt=salt).drop(
        "__content_key"
    )


def hash_sample(
    df: DataFrame, id_col: str, rate: float, salt: str = "sample"
) -> DataFrame:
    """Deterministic ~`rate` sample: keep rows whose bucket falls below
    rate·BUCKETS. Pushdown-friendly (a plain filter) and stable across
    runs/engines — suitable for carving reproducible eval subsets."""
    return df.filter(hash_bucket(id_col, salt=salt) < int(round(rate * BUCKETS)))


def stratified_hash_sample(
    df: DataFrame,
    strata_col: str,
    id_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    salt: str = "strata",
) -> DataFrame:
    """Per-stratum deterministic sampling (sampleBy's reproducible cousin).

    `rates` maps stratum value → keep fraction. Implemented as one
    codegen'd when-chain over the strata column — no join, no shuffle; at
    100 TB this is a pure map over the scan with the filter pushed to
    each file split.
    """
    bucket = hash_bucket(id_col, salt=salt)
    threshold = None
    for value, rate in rates.items():
        hi = F.lit(int(round(rate * BUCKETS)))
        cond = F.col(strata_col) == value
        threshold = (
            F.when(cond, hi) if threshold is None else threshold.when(cond, hi)
        )
    threshold = threshold.otherwise(F.lit(int(round(default_rate * BUCKETS))))
    return df.filter(bucket < threshold)


# ---------------------------------------------------------------- SQL twins
# DuckDB expressions computing the identical bucket, used by oracle queries.


def duckdb_bucket_sql(col: str, buckets: int = BUCKETS, salt: str = "") -> str:
    return (
        f"(('0x' || substr(md5('{salt}' || CAST({col} AS VARCHAR)), 1, 8))::BIGINT"
        f" % {buckets})"
    )


def mixture_sample(
    df: DataFrame,
    strata_col: str,
    targets: dict[str, float],
    id_col: str,
    salt: str = "mix",
) -> DataFrame:
    """Deterministic dataset-mixture sampling: downsample strata so the
    OUTPUT matches the target proportions, keeping the largest feasible
    corpus (the binding stratum is kept whole; every other stratum is
    hash-sampled down to its share).

    The standard mixture-weights step of corpus assembly: with observed
    counts n_s and target shares p_s, the max feasible total is
    T = min_s(n_s / p_s) and each stratum keeps T·p_s rows. Thresholds
    are computed as bucket integers with one fixed expression shape
    (floor(BUCKETS·minratio·p/n), clamped to exactly BUCKETS for the
    binding stratum so "kept whole" survives float wobble) so any
    md5-capable engine reproduces membership bit-for-bit — same
    portability contract as hash_split. The counts frame is one row per
    stratum; its min is taken with a scalar aggregate + cross join (not
    an unpartitioned window, which would emit the single-partition
    WindowExec warning for a frame where it's harmless — noise that
    trains operators to ignore the one warning that matters), then
    broadcast back onto the corpus: no corpus shuffle at all."""
    tgt = None
    for name, share in targets.items():
        cond = F.lit(float(share))
        tgt = (
            F.when(F.col(strata_col) == name, cond)
            if tgt is None
            else tgt.when(F.col(strata_col) == name, cond)
        )
    tgt = tgt.otherwise(F.lit(None).cast("double"))

    counts = (
        df.groupBy(strata_col)
        .agg(F.count(F.lit(1)).cast("double").alias("_n"))
        .withColumn("_p", tgt)
        .filter(F.col("_p").isNotNull())
    )
    mins = counts.agg(F.min(F.col("_n") / F.col("_p")).alias("_mr"))
    thr = counts.crossJoin(F.broadcast(mins)).select(
        strata_col,
        F.when(
            # min() returns one of the actual n/p values, so this equality
            # is exact — the binding stratum is kept whole by construction
            F.col("_n") / F.col("_p") == F.col("_mr"),
            F.lit(BUCKETS).cast("bigint"),
        )
        .otherwise(
            F.floor(
                F.lit(float(BUCKETS)) * F.col("_mr") * F.col("_p") / F.col("_n")
            ).cast("bigint")
        )
        .alias("_thr"),
    )
    bucket = hash_bucket(id_col, salt=salt)
    return (
        df.join(F.broadcast(thr), strata_col)
        .filter(bucket < F.col("_thr"))
        .drop("_thr")
    )
