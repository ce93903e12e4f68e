"""Delta schema enforcement on write + opt-in evolution: the protocol's
write contract — a batch whose schema drifts from the table's
schemaString must refuse (silently-divergent files are how two engines
end up disagreeing about a table), unless merge_schema=True evolves
the table (new nullable fields appended, committed as an updated
metaData action every reader sees).
"""

import pytest

from deimos_spark.operators.delta_interop import (
    DeltaKeyedTable,
    DeltaProtocolError,
    DeltaTableReader,
    DeltaTableWriter,
)


def _w(spark, path):
    w = DeltaTableWriter(spark, path, schema="id bigint, v string")
    w.append(spark.createDataFrame([(1, "a")], "id bigint, v string"))
    return w


def test_type_conflict_refuses(spark, tmp_path):
    w = _w(spark, str(tmp_path / "t"))
    bad = spark.createDataFrame([(2, 7)], "id bigint, v int")
    with pytest.raises(DeltaProtocolError, match="incompatible"):
        w.append(bad)
    with pytest.raises(DeltaProtocolError, match="incompatible"):
        w.overwrite(bad)


def test_new_column_refuses_without_merge_schema(spark, tmp_path):
    w = _w(spark, str(tmp_path / "t"))
    wide = spark.createDataFrame(
        [(2, "b", 1.5)], "id bigint, v string, score double"
    )
    with pytest.raises(DeltaProtocolError, match="merge_schema"):
        w.append(wide)


def test_merge_schema_evolves(spark, tmp_path):
    path = str(tmp_path / "t")
    w = _w(spark, path)
    wide = spark.createDataFrame(
        [(2, "b", 1.5)], "id bigint, v string, score double"
    )
    w.append(wide, merge_schema=True)
    r = DeltaTableReader(spark, path)
    assert [f.name for f in r.snapshot().schema.fields] == [
        "id", "v", "score",
    ]
    got = {x.id: (x.v, x.score) for x in r.read().collect()}
    # old rows read null for the evolved column
    assert got == {1: ("a", None), 2: ("b", 1.5)}
    # and the narrow shape keeps appending fine post-evolution
    w.append(spark.createDataFrame([(3, "c")], "id bigint, v string"))
    assert DeltaTableReader(spark, path).read().count() == 3


def test_missing_nullable_column_allowed(spark, tmp_path):
    path = str(tmp_path / "t")
    w = _w(spark, path)
    w.append(spark.createDataFrame([(9,)], "id bigint"))
    got = {x.id: x.v for x in DeltaTableReader(spark, path).read().collect()}
    assert got == {1: "a", 9: None}


def test_overwrite_schema_replaces(spark, tmp_path):
    path = str(tmp_path / "t")
    w = _w(spark, path)
    new = spark.createDataFrame([("k1", 2)], "key string, n int")
    with pytest.raises(DeltaProtocolError, match="incompatible|merge_schema"):
        w.overwrite(new)
    w.overwrite(new, overwrite_schema=True)
    r = DeltaTableReader(spark, path)
    assert [f.name for f in r.snapshot().schema.fields] == ["key", "n"]
    assert [(x.key, x.n) for x in r.read().collect()] == [("k1", 2)]


@pytest.mark.parametrize("use_dvs", [False, True], ids=["rewrite", "dv"])
def test_keyed_merge_enforces(spark, tmp_path, use_dvs):
    path = str(tmp_path / "t")
    t = DeltaKeyedTable(
        spark, path, ["id"], schema="id bigint, v string", use_dvs=use_dvs
    )
    t.merge(upserts=spark.createDataFrame([(1, "a")], "id bigint, v string"))
    with pytest.raises(DeltaProtocolError, match="incompatible"):
        t.merge(
            upserts=spark.createDataFrame([(1, 5)], "id bigint, v int")
        )
    with pytest.raises(DeltaProtocolError, match="merge_schema"):
        t.merge(
            upserts=spark.createDataFrame(
                [(1, "a", 0.2)], "id bigint, v string, extra double"
            )
        )
    # table unchanged by the refusals
    got = {
        x.id: x.v
        for x in DeltaTableReader(spark, path).read().collect()
    }
    assert got == {1: "a"}


def test_evolution_interplay_with_change_feed_and_time_travel(
    spark, tmp_path
):
    """After merge_schema evolution: read_changes spans the evolution
    commit (old versions surface null for the new column under the
    latest schema), while time travel to a pre-evolution version reads
    the OLD schema — the metaData action is versioned state like any
    other."""
    path = str(tmp_path / "t")
    w = _w(spark, path)  # v0: (1, "a")
    w.append(
        spark.createDataFrame(
            [(2, "b", 1.5)], "id bigint, v string, score double"
        ),
        merge_schema=True,
    )  # v1 evolves

    r = DeltaTableReader(spark, path)
    feed = r.read_changes(0).collect()
    by_ver = {}
    for row in feed:
        by_ver.setdefault(row._commit_version, []).append(
            (row._change_type, row.id, row.v, row.score)
        )
    assert by_ver[0] == [("insert", 1, "a", None)]
    assert by_ver[1] == [("insert", 2, "b", 1.5)]

    # pre-evolution time travel: old schema, no score column
    old = r.read(0)
    assert old.columns == ["id", "v"]
    assert [(x.id, x.v) for x in old.collect()] == [(1, "a")]
