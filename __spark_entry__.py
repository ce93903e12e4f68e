"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship query (TPC-H Q1 shape, SURVEY §2B B11) at sf0.001.
queries()      — one builder per implemented operator (SURVEY.md §2).
oracle_sql()   — matching DuckDB SQL per query (omitted for approximate /
                 non-SQL-expressible ops → driver records rows-only checks).

Implementation lives in deimos_spark/ (see deimos_spark.queries registry).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from deimos_spark.queries import all_queries  # noqa: E402
from deimos_spark.operators.relational import agg_hash  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return agg_hash(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.builder for name, spec in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle
        for name, spec in all_queries().items()
        if spec.oracle is not None
    }
