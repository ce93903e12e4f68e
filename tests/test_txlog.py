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
    n = table.vacuum(retention_seconds=0.0)
    assert n >= 1  # v0's unit is unreferenced by the latest snapshot
    assert _rows(table) == {"a": 2}  # latest version intact


def test_vacuum_retention_protects_inflight_writer_units(spark, table):
    """An in-flight writer renames units into data/ BEFORE committing;
    default-retention vacuum must not delete those young files (else the
    writer's commit lands pointing at missing data)."""
    import os

    table.merge(upserts=spark.createDataFrame([("a", 1)], SCHEMA))
    # simulate an uncommitted writer's freshly-renamed unit
    orphan = os.path.join(table.path, "data", "u_inflight_orphan")
    os.makedirs(orphan)
    with open(os.path.join(orphan, "part-0.parquet"), "wb") as fh:
        fh.write(b"x")
    assert table.vacuum() == 0  # young + unreferenced -> kept
    assert os.path.isdir(orphan)
    assert table.vacuum(retention_seconds=0.0) == 1  # expired -> gone
    assert not os.path.isdir(orphan)


def test_overwrite_is_one_commit(spark, table):
    table.merge(upserts=spark.createDataFrame([("a", 1), ("b", 2)], SCHEMA))
    v = table.snapshot().version
    table.overwrite(spark.createDataFrame([("z", 9)], SCHEMA))
    assert table.snapshot().version == v + 1
    assert _rows(table) == {"z": 9}


# ------------------------------------------- round-3 hardening: defects

def test_commit_file_appears_atomically_and_complete(spark, table):
    """The temp-file + link protocol means a commit file, once visible,
    is always complete JSON — snapshot() can never read a partial one."""
    import json
    import os

    table.merge(upserts=spark.createDataFrame([("a", 1)], SCHEMA))
    for name in os.listdir(table._log_dir):
        if name.endswith(".json") and not name.startswith("."):
            with open(os.path.join(table._log_dir, name)) as fh:
                json.load(fh)  # parses cleanly
    # and no temp droppings remain
    assert not [n for n in os.listdir(table._log_dir) if n.startswith(".tmp_")]


def test_zero_length_highest_commit_is_healed(spark, table):
    """A crashed LEGACY writer's empty claim on the highest version is
    treated as a no-op commit: readable table, version counted, next
    writer moves past it."""
    table.merge(upserts=spark.createDataFrame([("a", 1)], SCHEMA))
    open(table._commit_path(1), "w").close()  # legacy crash artifact
    snap = table.snapshot()
    assert snap.version == 1  # claimed but empty -> no-op
    assert _rows(table) == {"a": 1}
    table.merge(upserts=spark.createDataFrame([("b", 2)], SCHEMA))  # claims v2
    assert table.snapshot().version == 2
    assert _rows(table) == {"a": 1, "b": 2}


def test_unreadable_mid_log_commit_raises(spark, table):
    from deimos_spark.operators.txlog import LogCorruption

    table.merge(upserts=spark.createDataFrame([("a", 1)], SCHEMA))
    table.merge(upserts=spark.createDataFrame([("b", 2)], SCHEMA))
    # truncate a NON-latest commit mid-payload: real changes were lost
    with open(table._commit_path(0), "w") as fh:
        fh.write('{"version": 0, "adds": [{"pa')
    with pytest.raises(LogCorruption):
        table.snapshot()


def test_pruning_disabled_when_partition_not_in_key(spark, tmp_path):
    """partition_by ⊄ key_cols: an upsert may MOVE a key to a new
    partition value. The merge must rewrite globally (no pruning) so the
    old partition's copy is removed — no silent duplicate keys."""
    schema = T.StructType(
        [
            T.StructField("day", T.StringType(), False),
            T.StructField("test_id", T.StringType(), False),
            T.StructField("v", T.LongType(), True),
        ]
    )
    t = TransactionLogTable(
        spark,
        str(tmp_path / "movable"),
        key_cols=["test_id"],  # day NOT part of the key
        schema=schema,
        partition_by=["day"],
    )
    t.merge(upserts=spark.createDataFrame([("d1", "a", 1), ("d2", "b", 2)], schema))
    # key "a" moves from day=d1 to day=d9
    t.merge(upserts=spark.createDataFrame([("d9", "a", 100)], schema))
    got = {(r["day"], r["test_id"]): r["v"] for r in t.read().collect()}
    assert got == {("d9", "a"): 100, ("d2", "b"): 2}  # no stale ("d1","a")


def test_pruned_merge_with_hive_escaped_partition_values(spark, tmp_path):
    """Partition values with chars Hive percent-escapes in dir names
    (':', '=', spaces) must still match during pruned merges — the log
    records RAW values."""
    schema = T.StructType(
        [
            T.StructField("day", T.StringType(), False),
            T.StructField("test_id", T.StringType(), False),
            T.StructField("v", T.LongType(), True),
        ]
    )
    t = TransactionLogTable(
        spark,
        str(tmp_path / "escaped"),
        key_cols=["day", "test_id"],
        schema=schema,
        partition_by=["day"],
    )
    weird = "2024-01-01 10:30=x"
    t.merge(
        upserts=spark.createDataFrame(
            [(weird, "a", 1), ("plain", "b", 2)], schema
        )
    )
    # raw values recorded in the log, not %-escaped dir segments
    recorded = {v["day"] for v in t.snapshot().units.values()}
    assert recorded == {weird, "plain"}
    # pruned update of the weird partition: plain's unit carried forward
    before = {
        p for p, v in t.snapshot().units.items() if v["day"] == "plain"
    }
    t.merge(upserts=spark.createDataFrame([(weird, "a", 100)], schema))
    after = {p for p, v in t.snapshot().units.items() if v["day"] == "plain"}
    assert before == after
    got = {(r["day"], r["test_id"]): r["v"] for r in t.read().collect()}
    assert got == {(weird, "a"): 100, ("plain", "b"): 2}


def test_delete_only_merge_matching_no_partition_is_noop(spark, ptable):
    """Pruned delete whose keys hit no existing partition: commits a
    no-op instead of crashing, schema carried forward."""
    before = _pstate(ptable)
    ptable.delete(
        spark.createDataFrame([("d99", "zz")], "day string, test_id string")
    )
    assert _pstate(ptable) == before
    assert set(ptable.read().columns) == {"day", "test_id", "v"}


def test_delete_on_empty_table_is_noop(spark, table):
    table.delete(spark.createDataFrame([Row(test_id="ghost")]))
    assert table.read().count() == 0


# --------------------------------------------- round-3: log checkpoints

def test_checkpoint_bounds_snapshot_replay_cost(spark, tmp_path):
    """After many commits, snapshot() replays only the commits since the
    newest checkpoint — O(interval), not O(n_commits)."""
    t = TransactionLogTable(
        spark,
        str(tmp_path / "ckpt"),
        ["test_id"],
        schema=SCHEMA,
        checkpoint_interval=5,
    )
    for i in range(12):
        t.merge(upserts=spark.createDataFrame([(f"k{i}", i)], SCHEMA))
    snap = t.snapshot()
    assert snap.version == 11
    # checkpoint at v10 -> replay reads only commits 11 (1 file), never 12
    assert t.last_snapshot_commit_reads <= t.checkpoint_interval
    assert t.last_snapshot_commit_reads < 12
    assert _rows(t) == {f"k{i}": i for i in range(12)}


def test_checkpoint_preserves_time_travel(spark, tmp_path):
    t = TransactionLogTable(
        spark,
        str(tmp_path / "ckpt_tt"),
        ["test_id"],
        schema=SCHEMA,
        checkpoint_interval=3,
    )
    for i in range(8):
        t.merge(upserts=spark.createDataFrame([("a", i)], SCHEMA))
    # versions before, at, and after checkpoint boundaries
    for v in (0, 2, 3, 5, 7):
        assert {r["some_int"] for r in t.read(version=v).collect()} == {v}


def test_checkpoint_survives_fresh_handle(spark, tmp_path):
    """A new table handle (new process) picks up _last_checkpoint state."""
    path = str(tmp_path / "ckpt_reopen")
    t = TransactionLogTable(
        spark, path, ["test_id"], schema=SCHEMA, checkpoint_interval=4
    )
    for i in range(9):
        t.merge(upserts=spark.createDataFrame([(f"k{i}", i)], SCHEMA))
    t2 = TransactionLogTable(
        spark, path, ["test_id"], schema=SCHEMA, checkpoint_interval=4
    )
    assert {r["test_id"] for r in t2.read().collect()} == {f"k{i}" for i in range(9)}
    assert t2.last_snapshot_commit_reads <= 4


def test_corrupt_checkpoint_falls_back_to_older_or_full_replay(spark, tmp_path):
    import os

    t = TransactionLogTable(
        spark,
        str(tmp_path / "ckpt_bad"),
        ["test_id"],
        schema=SCHEMA,
        checkpoint_interval=3,
    )
    for i in range(7):
        t.merge(upserts=spark.createDataFrame([(f"k{i}", i)], SCHEMA))
    # corrupt the newest checkpoint (v6)
    with open(t._checkpoint_path(6), "w") as fh:
        fh.write("{not json")
    assert _rows(t) == {f"k{i}": i for i in range(7)}


# ------------------------------------------- round-4 hardening: defects

def test_orphan_temp_files_do_not_break_snapshot(spark, table):
    """In-flight writers stage .tmp_/.ckpt_/.lc_ temp files inside
    _txlog (hard-link claims need same-filesystem); a concurrent or
    crashed writer's orphan must never parse as a version or break
    reads (round-3 ADVICE: high)."""
    import os

    table.merge(upserts=spark.createDataFrame([("a", 1)], SCHEMA))
    for name in (".tmp_deadbeef.json", ".ckpt_deadbeef.json", ".lc_deadbeef.json"):
        with open(os.path.join(table._log_dir, name), "w") as fh:
            fh.write('{"version": 999')  # partial payload, mid-crash
    snap = table.snapshot()
    assert snap.version == 0
    assert _rows(table) == {"a": 1}
    # and writes keep working past the orphans
    table.merge(upserts=spark.createDataFrame([("b", 2)], SCHEMA))
    assert _rows(table) == {"a": 1, "b": 2}


def test_corrupt_newest_commit_heal_is_persisted(spark, table):
    """Healing the newest unparseable commit must survive the NEXT
    commit making it mid-log: the heal truncates the file to a
    zero-length no-op on disk (round-3 ADVICE: medium)."""
    import os

    table.merge(upserts=spark.createDataFrame([("a", 1)], SCHEMA))
    table.merge(upserts=spark.createDataFrame([("b", 2)], SCHEMA))
    with open(table._commit_path(1), "w") as fh:
        fh.write('{"version": 1, "adds": [{"pa')  # torn payload
    snap = table.snapshot()  # newest is corrupt -> healed as no-op
    assert snap.version == 1
    assert _rows(table) == {"a": 1}
    assert os.path.getsize(table._commit_path(1)) == 0  # heal persisted
    # next writer claims v2; the healed v1 is now MID-LOG and must stay
    # a no-op instead of raising LogCorruption forever
    table.merge(upserts=spark.createDataFrame([("c", 3)], SCHEMA))
    assert table.snapshot().version == 2
    assert _rows(table) == {"a": 1, "c": 3}
    # a fresh handle (new process) agrees
    reopened = TransactionLogTable(spark, table.path, ["test_id"], schema=SCHEMA)
    assert {r["test_id"] for r in reopened.read().collect()} == {"a", "c"}


def test_fresh_last_checkpoint_pointer_avoids_log_listing(spark, tmp_path):
    """When _last_checkpoint is fresh, snapshot() must follow the
    pointer and probe commits by exact name — never LIST the log dir
    (the expensive primitive on object stores)."""
    t = TransactionLogTable(
        spark,
        str(tmp_path / "lc_fast"),
        ["test_id"],
        schema=SCHEMA,
        checkpoint_interval=5,
    )
    for i in range(12):
        t.merge(upserts=spark.createDataFrame([(f"k{i}", i)], SCHEMA))
    snap = t.snapshot()  # ckpt at v10, pointer fresh
    assert snap.version == 11
    assert t.last_snapshot_listed_log is False
    assert t.last_snapshot_commit_reads <= 2  # v11 + one missing-probe stop
    # a fresh handle takes the fast path too
    t2 = TransactionLogTable(
        spark, t.path, ["test_id"], schema=SCHEMA, checkpoint_interval=5
    )
    assert _rows(t2) == {f"k{i}": i for i in range(12)}
    assert t2.last_snapshot_listed_log is False
    # no pointer yet (young table) -> listing is the correct fallback
    young = TransactionLogTable(
        spark, str(tmp_path / "lc_young"), ["test_id"], schema=SCHEMA
    )
    young.merge(upserts=spark.createDataFrame([("a", 1)], SCHEMA))
    young.snapshot()
    assert young.last_snapshot_listed_log is True
    # time travel to BEFORE the pointer falls back to listing, correctly
    assert {r["test_id"] for r in t.read(version=3).collect()} == {
        f"k{i}" for i in range(4)
    }
    assert t.last_snapshot_listed_log is True


# ---------------------------------------- round-3: concurrent writers

def test_concurrent_merges_one_conflict_correct_final_state(spark, table):
    """Two threads race the same version: exactly one CommitConflict
    retry, both changes land."""
    import threading

    table.merge(upserts=spark.createDataFrame([("seed", 0)], SCHEMA))

    barrier = threading.Barrier(2, timeout=60)
    conflicts = []
    orig_commit = TransactionLogTable._commit

    def synced_commit(self, version, adds, removes, schema_json):
        # both writers plan against v0's snapshot, then race the claim
        if version == 1:
            barrier.wait()
        try:
            orig_commit(self, version, adds, removes, schema_json)
        except CommitConflict:
            conflicts.append(version)
            raise

    errors = []

    def worker(key, val):
        t = TransactionLogTable(spark, table.path, ["test_id"], schema=SCHEMA)
        t._commit = synced_commit.__get__(t)
        try:
            t.merge(upserts=spark.createDataFrame([(key, val)], SCHEMA))
        except Exception as e:  # pragma: no cover
            errors.append(e)

    th1 = threading.Thread(target=worker, args=("w1", 1))
    th2 = threading.Thread(target=worker, args=("w2", 2))
    th1.start(); th2.start()
    th1.join(120); th2.join(120)

    assert not errors
    assert conflicts == [1]  # exactly one loser at the raced version
    assert _rows(table) == {"seed": 0, "w1": 1, "w2": 2}
    assert table.snapshot().version == 2


def test_checkpoint_preserves_partition_values_for_pruning(spark, tmp_path):
    """Partition values in the checkpointed file-set must survive the
    round-trip: a pruned merge planned from a checkpoint-based snapshot
    still carries forward untouched partitions."""
    t = TransactionLogTable(
        spark,
        str(tmp_path / "ckpt_part"),
        key_cols=["day", "test_id"],
        schema=PSCHEMA,
        partition_by=["day"],
        checkpoint_interval=3,
    )
    for i in range(5):  # 5 commits -> checkpoint at v3 exists
        t.merge(
            upserts=spark.createDataFrame([(f"d{i}", "a", i)], PSCHEMA)
        )
    snap = t.snapshot()
    assert t.last_snapshot_commit_reads <= 3  # served from the checkpoint
    assert {v["day"] for v in snap.units.values()} == {f"d{i}" for i in range(5)}
    # pruned merge into d1: every other partition's unit carried forward
    before = {p for p, v in snap.units.items() if v["day"] != "d1"}
    t.merge(upserts=spark.createDataFrame([("d1", "a", 99)], PSCHEMA))
    after = {p for p, v in t.snapshot().units.items() if v["day"] != "d1"}
    assert before == after
    assert _pstate(t) == {("d%d" % i, "a"): i for i in range(5) if i != 1} | {
        ("d1", "a"): 99
    }
