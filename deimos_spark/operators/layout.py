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
    curve: str = "linear",
) -> None:
    """Write parquet clustered on `cluster_cols`.

    curve="linear" (default): repartitionByRange gives disjoint value
    ranges per output file (tight, non-overlapping min/max stats →
    maximal row-group skipping for range and point predicates on the
    LEADING column); sortWithinPartitions tightens per-row-group bounds
    inside each file. curve="z" / "hilbert": interleaved clustering —
    every file covers a small hyper-rectangle, so stats prune on ANY of
    the columns (see zorder_key/hilbert_key; pick these whenever 2+
    columns are filtered independently). `partition_by` adds directory
    partitioning on top for coarse partition pruning (e.g. by day),
    with clustering handling the fine grain (e.g. by user within day).
    """
    n = (
        max(1, math.ceil(df.count() / target_rows_per_file))
        if target_rows_per_file is not None
        else None
    )
    if curve != "linear":
        out = cluster_arrange(df, cluster_cols, n_files=n, curve=curve)
    else:
        out = (
            df.repartitionByRange(n, *cluster_cols)
            if n is not None
            else df.repartitionByRange(*cluster_cols)
        )
        out = out.sortWithinPartitions(*cluster_cols)
    writer = out.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def _bucket_exprs(df: DataFrame, cols: Sequence[str], bits: int) -> list:
    """Per-column equal-width bucket expressions to [0, 2^bits) via
    `width_bucket` over each column's min/max (one scalar agg total —
    a bounded driver read of 2 numbers per column, the same shape
    Delta's OPTIMIZE ZORDER uses for range ids). Shared by the Z-order
    and Hilbert keys — the curves differ only in how the buckets
    combine into one key.

    Equal-width bucketing keeps the key expression O(bits) instead of a
    2^bits-way CASE; heavily skewed columns trade some balance for that
    (the docstring's honest caveat — quantile boundaries would fix skew
    at the cost of an approxQuantile pass)."""
    bounds = df.agg(
        F.count(F.lit(1)).alias("__n"),
        *[F.min(c).alias(f"mn_{c}") for c in cols],
        *[F.max(c).alias(f"mx_{c}") for c in cols],
    ).head()
    if bounds is None or bounds["__n"] == 0:
        raise ValueError("cluster key: empty DataFrame — nothing to cluster")
    n_buckets = 1 << bits
    out = []
    for c in cols:
        if bounds[f"mn_{c}"] is None:
            raise ValueError(
                f"cluster key: column {c!r} is all NULL — no value range "
                "to bucket; drop it from the clustering columns"
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
        out.append(
            F.least(F.greatest(b, F.lit(0)), F.lit(n_buckets - 1)).cast(
                "long"
            )
        )
    return out


def zorder_key(
    df: DataFrame, cols: Sequence[str], bits: int = 12
) -> "tuple[DataFrame, str]":
    """Add a Morton (Z-order) key column interleaving `cols`' bucketed
    values → (df, key_col_name).

    Everything after the min/max probe is a single codegen'd expression
    — no window, no Python, no shuffle beyond the caller's eventual
    range partition. See _bucket_exprs for the bucketing contract."""
    if not cols or len(cols) * bits > 63:
        raise ValueError(
            f"zorder needs 1..{63 // bits} columns at {bits} bits"
        )
    z = F.lit(0).cast("long")
    for j, b in enumerate(_bucket_exprs(df, cols, bits)):
        for i in range(bits):
            bit = F.shiftright(b, i).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, i * len(cols) + j))
    key = "__zorder"
    return df.withColumn(key, z), key


def hilbert_key(
    df: DataFrame, cols: Sequence[str], bits: int = 12
) -> "tuple[DataFrame, str]":
    """Add a Hilbert-curve key column over `cols`' bucketed values →
    (df, key_col_name).

    Why offer Hilbert next to Z-order: Morton order has long "jumps"
    (the curve teleports across the key space at power-of-two
    boundaries), so a file covering a contiguous Morton range can span
    two far-apart hyper-rectangles and its min/max stats widen; the
    Hilbert curve is jump-free (every consecutive pair of cells is
    axis-adjacent), which keeps per-file bounding boxes tighter on
    average — the reason Databricks' liquid clustering and Iceberg's
    `hilbert` sort-order transform use it at 100-TB scale.

    Implementation: bucketing is the same codegen'd expression as
    Z-order (see _bucket_exprs); the bucket→index mapping is Skilling's
    transpose algorithm ("Programming the Hilbert curve", AIP 2004 —
    public domain), vectorized over rows in an Arrow-batched pandas_udf.
    Python in the path is a deliberate, write-time-only trade: the key
    is computed once per clustering rewrite, never at query time, and
    the kernel is pure numpy bit math (no per-row Python)."""
    if not cols or len(cols) * bits > 63:
        raise ValueError(
            f"hilbert needs 1..{63 // bits} columns at {bits} bits"
        )
    n = len(cols)
    if n == 1:
        # 1-D Hilbert is the identity — same key as Z-order, no UDF
        return zorder_key(df, cols, bits)

    import pandas as pd  # noqa: F401 (kernel type context)

    @F.pandas_udf("long")
    def _hilbert(*bcols):
        import numpy as np
        import pandas as pd

        X = np.stack(
            [c.to_numpy(dtype=np.int64) for c in bcols], axis=1
        ).astype(np.uint64)
        # Skilling AxestoTranspose: in-place Gray-code untwisting
        M = np.uint64(1) << np.uint64(bits - 1)
        Q = M
        one = np.uint64(1)
        while Q > one:
            P = Q - one
            for i in range(n):
                upper = (X[:, i] & Q) != 0
                X[upper, 0] ^= P
                lower = ~upper
                t = (X[lower, 0] ^ X[lower, i]) & P
                X[lower, 0] ^= t
                X[lower, i] ^= t
            Q >>= one
        for i in range(1, n):
            X[:, i] ^= X[:, i - 1]
        t = np.zeros(len(X), dtype=np.uint64)
        Q = M
        while Q > one:
            mask = (X[:, n - 1] & Q) != 0
            t[mask] ^= Q - one
            Q >>= one
        for i in range(n):
            X[:, i] ^= t
        # interleave the transpose MSB-first into one integer
        h = np.zeros(len(X), dtype=np.uint64)
        for b in range(bits - 1, -1, -1):
            for i in range(n):
                h = (h << one) | ((X[:, i] >> np.uint64(b)) & one)
        return pd.Series(h.astype(np.int64))

    bexprs = _bucket_exprs(df, cols, bits)
    key = "__hilbert"
    return df.withColumn(key, _hilbert(*bexprs)), key


def cluster_key(
    df: DataFrame, cols: Sequence[str], bits: int = 12, curve: str = "z"
) -> "tuple[DataFrame, str]":
    """Dispatch: space-filling-curve key for `curve` in {"z",
    "hilbert"} — the one entry point the plain-parquet and Delta/
    Iceberg clustering writers share."""
    if curve == "z":
        return zorder_key(df, cols, bits)
    if curve == "hilbert":
        return hilbert_key(df, cols, bits)
    raise ValueError(f"unknown clustering curve {curve!r} (z | hilbert)")


def cluster_arrange(
    df: DataFrame,
    cols: Sequence[str],
    n_files: int | None = None,
    bits: int = 12,
    curve: str = "z",
) -> DataFrame:
    """Arrange rows for an interleaved-clustered write: range-partition
    + sort on the curve key, then drop it (layout-only — schema
    unchanged). Factored out so lakehouse writers (Delta/Iceberg
    OPTIMIZE ZORDER) can reuse the exact arrangement their add-action
    stats are then computed over."""
    keyed, key = cluster_key(df, cols, bits, curve)
    ranged = (
        keyed.repartitionByRange(n_files, key)
        if n_files
        else keyed.repartitionByRange(key)
    )
    return ranged.sortWithinPartitions(key).drop(key)


def cluster_arrange_or_linear(
    df: DataFrame,
    cols: Sequence[str],
    n_files: int | None = None,
    bits: int = 12,
    curve: str = "z",
) -> DataFrame:
    """cluster_arrange, degrading to the plain linear arrangement when
    the curve key is undefined — an empty live row set (files present
    but every row DV-deleted) or an all-NULL cluster column (ADVICE
    r13). Maintenance verbs (OPTIMIZE/compaction) route through this:
    failing the rewrite exactly when compaction is most needed is the
    wrong trade, and the linear sort is well-defined on both degenerate
    inputs (NULLs order first; empty sorts are no-ops)."""
    try:
        return cluster_arrange(df, cols, n_files, bits, curve)
    except ValueError:
        ranged = (
            df.repartitionByRange(n_files, *cols)
            if n_files
            else df.repartitionByRange(*cols)
        )
        return ranged.sortWithinPartitions(*cols)


def write_zordered(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    n_files: int,
    bits: int = 12,
    mode: str = "overwrite",
    curve: str = "z",
) -> None:
    """Write parquet clustered on a space-filling curve over `cols` —
    multi-dimensional data skipping (Delta OPTIMIZE ZORDER's shape):
    each output file covers a small hyper-rectangle of the key space,
    so min/max stats prune files for predicates on ANY of the columns,
    where a linear sort only skips on its leading column. `curve` picks
    Morton ("z", pure codegen'd expressions) or Hilbert ("hilbert",
    tighter boxes, one vectorized write-time kernel — see
    hilbert_key)."""
    cluster_arrange(df, cols, n_files, bits, curve).write.mode(mode).parquet(
        path
    )


def compact_files(
    spark: SparkSession,
    path: str,
    target_rows_per_file: int,
    cluster_cols: Sequence[str] = (),
    curve: str = "linear",
) -> int:
    """Bin-pack a small-file parquet directory into ~target-sized files;
    returns the new file count. Rewrites via a temp dir + atomic-ish swap
    (same-volume rename) so readers never see a partial table. Re-clusters
    while rewriting when `cluster_cols` given — compaction is the natural
    moment to restore sort order degraded by incremental appends;
    curve="z"/"hilbert" restores INTERLEAVED clustering instead (see
    write_clustered)."""
    df = spark.read.parquet(path)
    n = max(1, math.ceil(df.count() / target_rows_per_file))
    tmp = path.rstrip("/") + "._compact_tmp"
    if cluster_cols and curve != "linear":
        out = cluster_arrange_or_linear(
            df, cluster_cols, n_files=n, curve=curve
        )
    elif cluster_cols:
        out = df.repartitionByRange(n, *cluster_cols).sortWithinPartitions(
            *cluster_cols
        )
    else:
        out = df.repartition(n)
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
