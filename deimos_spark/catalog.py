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


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one table. Path layout per TESTDATA.md."""
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def register_views(spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = TABLES) -> None:
    """Register each table as a temp view for spark.sql() use."""
    for name in tables:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
