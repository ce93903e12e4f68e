"""Catalog helpers: load the driver-generated parquet tables as DataFrames
and/or register them as temp views.

Tables (TESTDATA.md): region nation customer supplier part orders lineitem
events documents embeddings — one parquet file/dir per table under a
scale-factor directory.

Scale note: `spark.read.parquet` gives Catalyst full pushdown (PushedFilters,
ReadSchema pruning, partition pruning if the layout is partitioned). Never
wrap these in RDDs or collect-side caches.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


# (session, dir, table) → DataFrame plan cache: skips re-reading parquet
# footers for schema inference on every builder call. Plans are immutable;
# the underlying files are read fresh at each execution.
_df_cache: dict[tuple[int, str, str], DataFrame] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one table. Path layout per TESTDATA.md."""
    key = (id(spark), sf_dir, name)
    df = _df_cache.get(key)
    if df is None:
        df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
        _df_cache[key] = df
    return df


def register_views(spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = TABLES) -> None:
    """Register each table as a temp view for spark.sql() use."""
    for name in tables:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
