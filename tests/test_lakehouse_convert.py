"""In-place lakehouse migration (r11): Delta `CONVERT TO DELTA`
(`delta_interop.convert_parquet_dir`) and Iceberg `add_files`
(`IcebergTableWriter.add_files`) — both register EXISTING parquet
files in new table metadata without rewriting a byte of data, and the
result must be a first-class table: readable, appendable, stats-
prunable, and safely refusing the layouts they cannot represent.

(The reference has no lakehouse layer — this extends the interop
surface like delta_interop/iceberg_interop themselves.)
"""

import os

import pytest

from deimos_spark.operators.delta_interop import (
    DeltaProtocolError,
    DeltaTableReader,
    DeltaTableWriter,
    convert_parquet_dir,
)
from deimos_spark.operators.iceberg_interop import (
    IcebergProtocolError,
    IcebergTableReader,
    IcebergTableWriter,
)


# ------------------------------------------------------------------ Delta

def test_convert_flat_dir_then_read_and_append(spark, tmp_path):
    p = str(tmp_path / "flat")
    spark.range(10).selectExpr("id", "cast(id*2 as string) v").write.parquet(p)
    n = convert_parquet_dir(spark, p)
    assert n >= 1
    r = DeltaTableReader(spark, p)
    assert sorted(x["id"] for x in r.read().collect()) == list(range(10))
    # the converted table is ordinary: version-1 append lands on top
    DeltaTableWriter(spark, p).append(
        spark.range(10, 12).selectExpr("id", "cast(id*2 as string) v")
    )
    assert DeltaTableReader(spark, p).read().count() == 12


def test_convert_records_footer_stats(spark, tmp_path):
    p = str(tmp_path / "stats")
    spark.range(100).selectExpr("id").coalesce(1).write.parquet(p)
    convert_parquet_dir(spark, p)
    import json

    snap = DeltaTableReader(spark, p).snapshot()
    adds = list(snap.adds_raw.values())
    stats = [json.loads(a["stats"]) for a in adds if a.get("stats")]
    assert stats and sum(s["numRecords"] for s in stats) == 100
    assert any("id" in (s.get("minValues") or {}) for s in stats)


def test_convert_hive_partitioned(spark, tmp_path):
    p = str(tmp_path / "part")
    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "a"), (4, None)], "id long, k string"
    )
    df.write.partitionBy("k").parquet(p)
    convert_parquet_dir(spark, p, partition_by=("k",))
    got = sorted(
        (x["id"], x["k"])
        for x in DeltaTableReader(spark, p).read().collect()
    )
    assert got == [(1, "a"), (2, "b"), (3, "a"), (4, None)]


def test_convert_refusals(spark, tmp_path):
    p = str(tmp_path / "t")
    spark.range(3).write.parquet(p)
    convert_parquet_dir(spark, p)
    with pytest.raises(DeltaProtocolError, match="already has a Delta log"):
        convert_parquet_dir(spark, p)
    # partitioned layout without partition_by
    p2 = str(tmp_path / "t2")
    spark.createDataFrame(
        [(1, "a")], "id long, k string"
    ).write.partitionBy("k").parquet(p2)
    with pytest.raises(DeltaProtocolError, match="partition_by"):
        convert_parquet_dir(spark, p2)
    # empty dir
    p3 = str(tmp_path / "t3")
    os.makedirs(p3)
    with pytest.raises(DeltaProtocolError, match="no parquet"):
        convert_parquet_dir(spark, p3)


# ---------------------------------------------------------------- Iceberg

def test_add_files_then_read_append_prune(spark, tmp_path):
    src = str(tmp_path / "src")
    tbl = str(tmp_path / "tbl")
    spark.range(8).selectExpr(
        "id", "cast(id % 3 as string) v"
    ).write.parquet(src)
    w = IcebergTableWriter(spark, tbl)
    assert w.add_files(src) >= 1
    r = IcebergTableReader(spark, tbl)
    assert sorted(x["id"] for x in r.read().collect()) == list(range(8))
    # ordinary table: append a second snapshot
    w.append(spark.range(8, 10).selectExpr("id", "cast(id % 3 as string) v"))
    assert IcebergTableReader(spark, tbl).read().count() == 10
    # footer-derived bounds prune migrated files
    assert r.read(stats_filter={"id": (100, 200)}).count() == 0
    assert r.read(stats_filter={"id": (0, 3)}).count() >= 4


def test_add_files_refusals(spark, tmp_path):
    src = str(tmp_path / "src")
    tbl = str(tmp_path / "tbl")
    spark.range(4).selectExpr("id", "cast(id as string) v").write.parquet(src)
    w = IcebergTableWriter(spark, tbl)
    w.add_files(src)
    # schema drift refuses like append
    bad = str(tmp_path / "bad")
    spark.range(3).selectExpr("id", "id * 1.0 as v").write.parquet(bad)
    with pytest.raises(IcebergProtocolError, match="schema"):
        w.add_files(bad)
    # hive layout refuses
    hive = str(tmp_path / "hive")
    spark.createDataFrame(
        [(1, "a")], "id long, k string"
    ).write.partitionBy("k").parquet(hive)
    with pytest.raises(IcebergProtocolError, match="flat parquet"):
        w.add_files(hive)
    # empty refuses
    empty = str(tmp_path / "empty")
    os.makedirs(empty)
    with pytest.raises(IcebergProtocolError, match="no parquet"):
        w.add_files(empty)


def test_convert_multi_key_and_typed_partitions(spark, tmp_path):
    """Nested key=value dirs (two partition keys, one an int) convert;
    Spark's scan infers the partition column types and the Delta
    reader re-attaches the values from partitionValues."""
    p = str(tmp_path / "mk")
    df = spark.createDataFrame(
        [(1, 2020, "a"), (2, 2020, "b"), (3, 2021, "a")],
        "id long, y int, k string",
    )
    df.write.partitionBy("y", "k").parquet(p)
    n = convert_parquet_dir(spark, p, partition_by=("y", "k"))
    assert n >= 3
    got = sorted(
        (x["id"], x["y"], x["k"])
        for x in DeltaTableReader(spark, p).read().collect()
    )
    assert got == [(1, 2020, "a"), (2, 2020, "b"), (3, 2021, "a")]
    # and a partitioned append lands on top as version 1
    DeltaTableWriter(spark, p, partition_by=("y", "k")).append(
        spark.createDataFrame([(4, 2021, "b")], "id long, y int, k string")
    )
    assert DeltaTableReader(spark, p).read().count() == 4


def test_convert_hive_escaped_values_roundtrip(spark, tmp_path):
    """Hive-escaped partition values (%20, %3D, unicode, slashes)
    unescape back to the original strings. Pinned inherent loss: an
    EMPTY-STRING value converts to null — Spark's hive layout wrote
    "" and null to the same __HIVE_DEFAULT_PARTITION__ directory, so
    the source dir itself conflated them before conversion."""
    p = str(tmp_path / "esc")
    vals = ["a b", "x=y", "ünïcode", "slash/like", ""]
    spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "id long, k string"
    ).write.partitionBy("k").parquet(p)
    convert_parquet_dir(spark, p, partition_by=("k",))
    got = dict(
        (x["id"], x["k"])
        for x in DeltaTableReader(spark, p).read().collect()
    )
    assert got == {0: "a b", 1: "x=y", 2: "ünïcode", 3: "slash/like", 4: None}
