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
