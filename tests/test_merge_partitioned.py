"""Partition-pruned MERGE: only affected partitions are read/rewritten;
delete-emptied partitions are removed; untouched partition files stay
physically identical (the 100 TB property)."""

import os

import pytest
from pyspark.sql import Row
from pyspark.sql import types as T

from deimos_spark.operators.merge import KeyedParquetTable

SCHEMA = T.StructType(
    [
        T.StructField("day", T.StringType(), False),
        T.StructField("test_id", T.StringType(), False),
        T.StructField("v", T.LongType(), True),
    ]
)


@pytest.fixture
def table(spark, tmp_path):
    t = KeyedParquetTable(
        spark,
        str(tmp_path / "tbl"),
        key_cols=["day", "test_id"],
        schema=SCHEMA,
        partition_by=["day"],
    )
    t.merge(
        upserts=spark.createDataFrame(
            [("d1", "a", 1), ("d1", "b", 2), ("d2", "c", 3), ("d3", "x", 9)], SCHEMA
        )
    )
    return t


def _state(t):
    return {(r["day"], r["test_id"]): r["v"] for r in t.read().collect()}


def _mtimes(t, day):
    d = os.path.join(t.path, f"day={day}")
    return {
        f: os.path.getmtime(os.path.join(d, f))
        for f in os.listdir(d)
        if f.startswith("part-")
    }


def test_pruned_merge_only_touches_affected_partitions(spark, table):
    before_d2 = _mtimes(table, "d2")
    before_d3 = _mtimes(table, "d3")
    table.merge(upserts=spark.createDataFrame([("d1", "a", 100)], SCHEMA))
    assert _state(table) == {
        ("d1", "a"): 100, ("d1", "b"): 2, ("d2", "c"): 3, ("d3", "x"): 9,
    }
    # untouched partitions: same files, same mtimes (not rewritten)
    assert _mtimes(table, "d2") == before_d2
    assert _mtimes(table, "d3") == before_d3


def test_pruned_delete_within_partition(spark, table):
    table.merge(
        delete_keys=spark.createDataFrame(
            [Row(day="d1", test_id="b", v=None)], SCHEMA
        ).select("day", "test_id")
    )
    assert _state(table) == {("d1", "a"): 1, ("d2", "c"): 3, ("d3", "x"): 9}


def test_delete_empties_whole_partition(spark, table):
    table.merge(
        delete_keys=spark.createDataFrame(
            [Row(day="d2", test_id="c", v=None)], SCHEMA
        ).select("day", "test_id")
    )
    assert _state(table) == {("d1", "a"): 1, ("d1", "b"): 2, ("d3", "x"): 9}
    assert not os.path.exists(os.path.join(table.path, "day=d2"))


def test_mixed_upsert_delete_across_partitions(spark, table):
    table.merge(
        upserts=spark.createDataFrame([("d2", "new", 7), ("d4", "z", 4)], SCHEMA),
        delete_keys=spark.createDataFrame(
            [Row(day="d3", test_id="x", v=None)], SCHEMA
        ).select("day", "test_id"),
    )
    assert _state(table) == {
        ("d1", "a"): 1, ("d1", "b"): 2, ("d2", "c"): 3, ("d2", "new"): 7,
        ("d4", "z"): 4,
    }
    assert not os.path.exists(os.path.join(table.path, "day=d3"))
