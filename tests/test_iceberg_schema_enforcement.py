"""Iceberg schema enforcement on write + additive evolution.

The load-bearing property: FIELD IDS ARE FOREVER. Before this gate the
writer re-derived ids 1..n from each batch's column order, so a
narrower or reordered batch silently reassigned ids and corrupted
every prior manifest's column-bounds / equality-ids semantics. Now the
table schema is the identity source: batches must match it by name and
type, missing optional columns are fine, new columns require
merge_schema=True and get fresh ids past last-column-id under a new
schema-id (prior snapshots keep referencing theirs, per spec).
"""

import pytest

from deimos_spark.operators.iceberg_interop import (
    IcebergProtocolError,
    IcebergTableReader,
    IcebergTableWriter,
)

SCHEMA = "id bigint, v string"


def _w(spark, path):
    w = IcebergTableWriter(spark, path)
    w.append(spark.createDataFrame([(1, "a")], SCHEMA))
    return w


def test_type_conflict_refuses(spark, tmp_path):
    w = _w(spark, str(tmp_path / "t"))
    with pytest.raises(IcebergProtocolError, match="incompatible"):
        w.append(spark.createDataFrame([(2, 7)], "id bigint, v int"))


def test_new_column_needs_merge_schema(spark, tmp_path):
    w = _w(spark, str(tmp_path / "t"))
    wide = spark.createDataFrame(
        [(2, "b", 1.5)], "id bigint, v string, score double"
    )
    with pytest.raises(IcebergProtocolError, match="merge_schema"):
        w.append(wide)


def test_evolution_preserves_ids_and_reads(spark, tmp_path):
    path = str(tmp_path / "t")
    w = _w(spark, path)
    w.append(
        spark.createDataFrame(
            [(2, "b", 1.5)], "id bigint, v string, score double"
        ),
        merge_schema=True,
    )
    r = IcebergTableReader(spark, path)
    md = r.metadata
    cur = next(
        s for s in md["schemas"]
        if s["schema-id"] == md["current-schema-id"]
    )
    assert [(f["name"], f["id"]) for f in cur["fields"]] == [
        ("id", 1), ("v", 2), ("score", 3),
    ]
    assert md["last-column-id"] == 3
    assert md["current-schema-id"] == 1
    # prior schema retained for the earlier snapshot
    assert {s["schema-id"] for s in md["schemas"]} == {0, 1}
    got = {x.id: (x.v, x.score) for x in r.read().collect()}
    assert got == {1: ("a", None), 2: ("b", 1.5)}


def test_narrow_batch_keeps_table_schema_and_ids(spark, tmp_path):
    """The original bug shape: a batch with FEWER columns must not
    shrink the table schema or reassign ids."""
    path = str(tmp_path / "t")
    w = _w(spark, path)
    w.append(spark.createDataFrame([(9,)], "id bigint"))
    r = IcebergTableReader(spark, path)
    md = r.metadata
    cur = next(
        s for s in md["schemas"]
        if s["schema-id"] == md["current-schema-id"]
    )
    assert [(f["name"], f["id"]) for f in cur["fields"]] == [
        ("id", 1), ("v", 2),
    ]
    got = {x.id: x.v for x in r.read().collect()}
    assert got == {1: "a", 9: None}


def test_reordered_batch_is_fine(spark, tmp_path):
    path = str(tmp_path / "t")
    w = _w(spark, path)
    w.append(spark.createDataFrame([("z", 5)], "v string, id bigint"))
    r = IcebergTableReader(spark, path)
    got = {x.id: x.v for x in r.read().collect()}
    assert got == {1: "a", 5: "z"}
    md = r.metadata
    assert md["last-column-id"] == 2  # ids untouched


def test_keyed_merge_enforced_through_writer(spark, tmp_path):
    from deimos_spark.operators.iceberg_interop import IcebergKeyedTable

    t = IcebergKeyedTable(spark, str(tmp_path / "t"), ["id"])
    t.upsert(spark.createDataFrame([(1, "a")], SCHEMA))
    with pytest.raises(IcebergProtocolError, match="incompatible"):
        t.upsert(spark.createDataFrame([(1, 2)], "id bigint, v bigint"))


# --------------------------------------------- idempotent merge (txn)

def test_iceberg_merge_txn_idempotent(spark, tmp_path):
    """Replayed (app, version) merges are no-ops in every delete mode —
    the snapshot-summary watermark (Flink-Iceberg pattern)."""
    from deimos_spark.operators.iceberg_interop import (
        IcebergKeyedTable,
        IcebergTableReader,
    )

    for mode in ("position", "equality", "dv"):
        path = str(tmp_path / f"t_{mode}")
        t = IcebergKeyedTable(spark, path, ["id"], delete_mode=mode)
        b0 = spark.createDataFrame([(1, "a"), (2, "b")], SCHEMA)
        t.merge(upserts=b0, txn=("job", 0))
        t.merge(upserts=b0, txn=("job", 0))  # replay
        t.merge(
            upserts=spark.createDataFrame([(1, "POISON")], SCHEMA),
            txn=("job", 0),
        )  # different payload, same version: still skipped
        r = IcebergTableReader(spark, path)
        assert len(r.metadata["snapshots"]) == 1, mode
        t.merge(
            upserts=spark.createDataFrame([(2, "b2")], SCHEMA),
            txn=("job", 1),
        )
        t.merge(
            upserts=spark.createDataFrame([(2, "XX")], SCHEMA),
            txn=("job", 1),
        )  # replay of batch 1
        got = {
            x.id: x.v
            for x in IcebergTableReader(spark, path).read().collect()
        }
        assert got == {1: "a", 2: "b2"}, mode
        # apps are independent
        t.merge(
            upserts=spark.createDataFrame([(3, "c")], SCHEMA),
            txn=("other", 0),
        )
        got = {
            x.id: x.v
            for x in IcebergTableReader(spark, path).read().collect()
        }
        assert got == {1: "a", 2: "b2", 3: "c"}, mode
