"""Transaction-logged keyed table: the full KeyedParquetTable merge
matrix (upserts, tombstones, compound keys, idempotency, compaction,
partition pruning) PLUS the properties only a commit log can give —
snapshot isolation, atomic commits, optimistic concurrency, time travel.
"""

import pytest
from pyspark.sql import Row
from pyspark.sql import types as T

from deimos_spark.operators.txlog import (
    CommitConflict,
    TransactionLogTable,
)

SCHEMA = T.StructType(
    [
        T.StructField("test_id", T.StringType(), False),
        T.StructField("some_int", T.LongType(), True),
    ]
)

PSCHEMA = T.StructType(
    [
        T.StructField("day", T.StringType(), False),
        T.StructField("test_id", T.StringType(), False),
        T.StructField("v", T.LongType(), True),
    ]
)


@pytest.fixture
def table(spark, tmp_path):
    return TransactionLogTable(
        spark, str(tmp_path / "widgets"), ["test_id"], schema=SCHEMA
    )


@pytest.fixture
def ptable(spark, tmp_path):
    t = TransactionLogTable(
        spark,
        str(tmp_path / "ptbl"),
        key_cols=["day", "test_id"],
        schema=PSCHEMA,
        partition_by=["day"],
    )
    t.merge(
        upserts=spark.createDataFrame(
            [("d1", "a", 1), ("d1", "b", 2), ("d2", "c", 3), ("d3", "x", 9)], PSCHEMA
        )
    )
    return t


def _rows(table):
    return {r["test_id"]: r["some_int"] for r in table.read().collect()}


def _pstate(t, version=None):
    return {(r["day"], r["test_id"]): r["v"] for r in t.read(version).collect()}


# ------------------------------------------------- KeyedParquetTable parity

def test_insert_then_update(spark, table):
    table.merge(upserts=spark.createDataFrame([("a", 1), ("b", 2)], SCHEMA))
    assert _rows(table) == {"a": 1, "b": 2}
    table.merge(upserts=spark.createDataFrame([("b", 20), ("c", 3)], SCHEMA))
    assert _rows(table) == {"a": 1, "b": 20, "c": 3}


def test_tombstone_delete(spark, table):
    table.merge(upserts=spark.createDataFrame([("a", 1), ("b", 2)], SCHEMA))
    table.merge(delete_keys=spark.createDataFrame([Row(test_id="a")]))
    assert _rows(table) == {"b": 2}


def test_mixed_upsert_and_delete(spark, table):
    table.merge(upserts=spark.createDataFrame([("a", 1), ("b", 2)], SCHEMA))
    table.merge(
        upserts=spark.createDataFrame([("c", 3)], SCHEMA),
        delete_keys=spark.createDataFrame([Row(test_id="b")]),
    )
    assert _rows(table) == {"a": 1, "c": 3}


def test_merge_is_idempotent(spark, table):
    batch = spark.createDataFrame([("a", 5)], SCHEMA)
    table.merge(upserts=batch)
    table.merge(upserts=batch)
    assert _rows(table) == {"a": 5}
    assert table.read().count() == 1


def test_compound_keys(spark, tmp_path):
    schema = T.StructType(
        [
            T.StructField("part_one", T.StringType(), False),
            T.StructField("part_two", T.StringType(), False),
            T.StructField("v", T.LongType(), True),
        ]
    )
    t = TransactionLogTable(
        spark, str(tmp_path / "compound"), ["part_one", "part_two"], schema=schema
    )
    t.merge(upserts=spark.createDataFrame([("x", "1", 1), ("x", "2", 2)], schema))
    t.merge(upserts=spark.createDataFrame([("x", "2", 22)], schema))
    got = {(r["part_one"], r["part_two"]): r["v"] for r in t.read().collect()}
    assert got == {("x", "1"): 1, ("x", "2"): 22}


def test_upsert_compacts_batch(spark, table):
    batch = spark.createDataFrame(
        [
            Row(test_id="a", some_int=1, partition=0, offset=0),
            Row(test_id="a", some_int=9, partition=0, offset=1),
        ]
    )
    table.upsert(
        batch.select("test_id", "some_int", "partition", "offset"),
        order_cols=["partition", "offset"],
    )
    got = table.read().select("test_id", "some_int").collect()
    assert len(got) == 1 and got[0]["some_int"] == 9


def test_delete_everything_leaves_empty_readable_table(spark, table):
    table.merge(upserts=spark.createDataFrame([("a", 1)], SCHEMA))
    table.delete(spark.createDataFrame([Row(test_id="a")]))
    assert table.read().count() == 0
    # schema survives via the log even though no data files remain
    assert set(table.read().columns) == {"test_id", "some_int"}


# ------------------------------------------------------- partition pruning

def test_pruned_merge_carries_forward_untouched_units(spark, ptable):
    """A merge into d1 must not read or rewrite d2/d3 units: their unit
    paths in the snapshot are IDENTICAL before and after (file-level
    carry-forward, the 100-TB property)."""
    before = {
        p: v for p, v in ptable.snapshot().units.items() if v.get("day") != "d1"
    }
    ptable.merge(
        upserts=spark.createDataFrame([("d1", "a", 100), ("d1", "n", 5)], PSCHEMA)
    )
    after = {
        p: v for p, v in ptable.snapshot().units.items() if v.get("day") != "d1"
    }
    assert before == after  # same physical units, not rewritten copies
    assert _pstate(ptable) == {
        ("d1", "a"): 100,
        ("d1", "b"): 2,
        ("d1", "n"): 5,
        ("d2", "c"): 3,
        ("d3", "x"): 9,
    }


def test_pruned_delete_empties_whole_partition(spark, ptable):
    ptable.merge(
        delete_keys=spark.createDataFrame([("d2", "c")], "day string, test_id string")
    )
    assert _pstate(ptable) == {("d1", "a"): 1, ("d1", "b"): 2, ("d3", "x"): 9}
    assert not any(
        v.get("day") == "d2" for v in ptable.snapshot().units.values()
    )


# --------------------------------------------------- log-native properties

def test_versions_increment_and_time_travel(spark, table):
    table.merge(upserts=spark.createDataFrame([("a", 1)], SCHEMA))
    table.merge(upserts=spark.createDataFrame([("a", 2)], SCHEMA))
    table.merge(delete_keys=spark.createDataFrame([Row(test_id="a")]))
    assert table.snapshot().version == 2
    assert {r["some_int"] for r in table.read(version=0).collect()} == {1}
    assert {r["some_int"] for r in table.read(version=1).collect()} == {2}
    assert table.read(version=2).count() == 0


def test_snapshot_isolation_reader_unaffected_by_commit(spark, table):
    """A DataFrame planned over version N still collects correctly after
    version N+1 commits (old files are immutable until vacuum)."""
    table.merge(upserts=spark.createDataFrame([("a", 1), ("b", 2)], SCHEMA))
    reader = table.read()  # plans over v0's files
    table.merge(
        upserts=spark.createDataFrame([("a", 99)], SCHEMA),
        delete_keys=spark.createDataFrame([Row(test_id="b")]),
    )
    assert {r["test_id"]: r["some_int"] for r in reader.collect()} == {"a": 1, "b": 2}
    assert _rows(table) == {"a": 99}


def test_commit_conflict_detected(spark, table, tmp_path):
    """Two writers, same version: exactly one commit wins."""
    other = TransactionLogTable(spark, table.path, ["test_id"], schema=SCHEMA)
    table.merge(upserts=spark.createDataFrame([("a", 1)], SCHEMA))
    snap = other.snapshot()
    table.merge(upserts=spark.createDataFrame([("b", 2)], SCHEMA))  # claims v1
    with pytest.raises(CommitConflict):
        other._commit(snap.version + 1, [], [], None)


def test_merge_retries_through_conflict(spark, table):
    """A merge that loses the commit race re-derives against the winner's
    snapshot: both writers' changes land."""
    table.merge(upserts=spark.createDataFrame([("a", 1)], SCHEMA))

    other = TransactionLogTable(spark, table.path, ["test_id"], schema=SCHEMA)
    real_plan = other._plan_merge
    raced = {"done": False}

    def racing_plan(snap, upserts, delete_keys, affected, pruned):
        result = real_plan(snap, upserts, delete_keys, affected, pruned)
        if not raced["done"]:
            raced["done"] = True
            # competitor lands a commit between plan and commit
            table.merge(upserts=spark.createDataFrame([("c", 3)], SCHEMA))
        return result

    other._plan_merge = racing_plan
    other.merge(upserts=spark.createDataFrame([("b", 2)], SCHEMA))
    assert raced["done"]
    assert _rows(table) == {"a": 1, "b": 2, "c": 3}


def test_vacuum_removes_only_unreferenced_units(spark, table):
    table.merge(upserts=spark.createDataFrame([("a", 1)], SCHEMA))
    table.merge(upserts=spark.createDataFrame([("a", 2)], SCHEMA))
    n = table.vacuum()
    assert n >= 1  # v0's unit is unreferenced by the latest snapshot
    assert _rows(table) == {"a": 2}  # latest version intact


def test_overwrite_is_one_commit(spark, table):
    table.merge(upserts=spark.createDataFrame([("a", 1), ("b", 2)], SCHEMA))
    v = table.snapshot().version
    table.overwrite(spark.createDataFrame([("z", 9)], SCHEMA))
    assert table.snapshot().version == v + 1
    assert _rows(table) == {"z": 9}
