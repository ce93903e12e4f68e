"""Physical data layout: clustered writes for data skipping, small-file
compaction — the table-maintenance half of a 100 TB lakehouse.

Why this matters at scale:
- Parquet stores per-row-group min/max statistics. A table RANGE-clustered
  on its hot filter columns turns those stats into an index: a reader's
  predicate eliminates whole files/row-groups (data skipping) instead of
  scanning them. Unclustered data has overlapping min/max everywhere and
  skips nothing.
- Streaming sinks and incremental merges accrete small files; at scale the
  scan becomes task-scheduling-bound (one task per tiny file) and the
  NameNode/listing cost explodes. Periodic bin-packing rewrites restore
  target file sizes.
"""

from __future__ import annotations

import math
import os
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_clustered(
    df: DataFrame,
    path: str,
    cluster_cols: Sequence[str],
    partition_by: Sequence[str] = (),
    target_rows_per_file: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Write parquet range-clustered on `cluster_cols`.

    repartitionByRange gives disjoint value ranges per output file (tight,
    non-overlapping min/max stats → maximal row-group skipping for range
    and point predicates on those columns); sortWithinPartitions tightens
    per-row-group bounds inside each file. `partition_by` adds directory
    partitioning on top for coarse partition pruning (e.g. by day), with
    clustering handling the fine grain (e.g. by user within day).
    """
    out = df
    if target_rows_per_file is not None:
        n = max(1, math.ceil(df.count() / target_rows_per_file))
        out = out.repartitionByRange(n, *cluster_cols)
    else:
        out = out.repartitionByRange(*cluster_cols)
    out = out.sortWithinPartitions(*cluster_cols)
    writer = out.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def zorder_key(
    df: DataFrame, cols: Sequence[str], bits: int = 12
) -> "tuple[DataFrame, str]":
    """Add a Morton (Z-order) key column interleaving `cols`' bucketed
    values → (df, key_col_name).

    Each column is bucketed to [0, 2^bits) with `width_bucket` over its
    min/max (one scalar agg per column — a bounded driver read of 2
    numbers, the same shape Delta's OPTIMIZE ZORDER uses for range ids),
    then the bucket bits interleave into one long. Everything after the
    min/max probe is a single codegen'd expression — no window, no
    shuffle beyond the caller's eventual range partition.

    Equal-width bucketing keeps the key expression O(bits) instead of a
    2^bits-way CASE; heavily skewed columns trade some balance for that
    (the docstring's honest caveat — quantile boundaries would fix skew
    at the cost of an approxQuantile pass)."""
    if not cols or len(cols) * bits > 63:
        raise ValueError(
            f"zorder needs 1..{63 // bits} columns at {bits} bits"
        )
    bounds = df.agg(
        F.count(F.lit(1)).alias("__n"),
        *[F.min(c).alias(f"mn_{c}") for c in cols],
        *[F.max(c).alias(f"mx_{c}") for c in cols],
    ).head()
    if bounds is None or bounds["__n"] == 0:
        raise ValueError("zorder_key: empty DataFrame — nothing to cluster")
    n_buckets = 1 << bits
    z = F.lit(0).cast("long")
    for j, c in enumerate(cols):
        if bounds[f"mn_{c}"] is None:
            raise ValueError(
                f"zorder_key: column {c!r} is all NULL — no value range "
                "to bucket; drop it from the z-order columns"
            )
        mn = float(bounds[f"mn_{c}"])
        mx = float(bounds[f"mx_{c}"])
        if mx <= mn:
            mx = mn + 1.0
        # per-row NULLs land in bucket 0 (width_bucket yields NULL, which
        # would otherwise null the whole interleaved key for the row)
        b = (
            F.width_bucket(
                F.coalesce(F.col(c).cast("double"), F.lit(mn)),
                F.lit(mn), F.lit(mx),
                F.lit(n_buckets),
            )
            - F.lit(1)
        )
        b = F.least(F.greatest(b, F.lit(0)), F.lit(n_buckets - 1)).cast(
            "long"
        )
        for i in range(bits):
            bit = F.shiftright(b, i).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, i * len(cols) + j))
    key = "__zorder"
    return df.withColumn(key, z), key


def write_zordered(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    n_files: int,
    bits: int = 12,
    mode: str = "overwrite",
) -> None:
    """Write parquet Z-ORDER clustered on `cols` — multi-dimensional
    data skipping (Delta OPTIMIZE ZORDER's shape): each output file
    covers a small hyper-rectangle of the key space, so min/max stats
    prune files for predicates on ANY of the columns, where a linear
    sort only skips on its leading column. Range-partition + sort on
    the Morton key, then drop it (layout-only — schema unchanged)."""
    keyed, key = zorder_key(df, cols, bits)
    (
        keyed.repartitionByRange(n_files, key)
        .sortWithinPartitions(key)
        .drop(key)
        .write.mode(mode)
        .parquet(path)
    )


def compact_files(
    spark: SparkSession,
    path: str,
    target_rows_per_file: int,
    cluster_cols: Sequence[str] = (),
) -> int:
    """Bin-pack a small-file parquet directory into ~target-sized files;
    returns the new file count. Rewrites via a temp dir + atomic-ish swap
    (same-volume rename) so readers never see a partial table. Re-clusters
    while rewriting when `cluster_cols` given — compaction is the natural
    moment to restore sort order degraded by incremental appends."""
    df = spark.read.parquet(path)
    n = max(1, math.ceil(df.count() / target_rows_per_file))
    tmp = path.rstrip("/") + "._compact_tmp"
    out = (
        df.repartitionByRange(n, *cluster_cols).sortWithinPartitions(*cluster_cols)
        if cluster_cols
        else df.repartition(n)
    )
    out.write.mode("overwrite").parquet(tmp)
    import shutil

    old = path.rstrip("/") + "._compact_old"
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    return n


def file_stats(spark: SparkSession, path: str) -> DataFrame:
    """Per-file row counts + byte sizes for layout health monitoring
    (input_file_name is the standard lineage column)."""
    df = spark.read.parquet(path)
    counts = df.groupBy(
        F.regexp_replace(F.input_file_name(), "^file:/*", "/").alias("file")
    ).agg(F.count(F.lit(1)).alias("rows"))
    sizes = [
        (os.path.join(dp, f), os.path.getsize(os.path.join(dp, f)))
        for dp, _, fs in os.walk(path)
        for f in fs
        if f.endswith(".parquet")
    ]
    sizes_df = spark.createDataFrame(sizes, "file string, bytes long")
    return counts.join(sizes_df, "file", "left").select("file", "rows", "bytes")
