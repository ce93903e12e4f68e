"""Iceberg inspect tables (`t.snapshots` / `t.files` / `t.refs` /
`t.manifests` parity): small driver-assembled DataFrames over the
metadata chain, composable with sql()/joins."""

from deimos_spark.operators.iceberg_interop import (
    IcebergTableReader,
    IcebergTableWriter,
)

SCHEMA = "id bigint, v string"


def _seed(spark, path, sort=False):
    w = IcebergTableWriter(
        spark,
        path,
        **(
            {"sort_by": ("id",), "sort_partitions": 2}
            if sort
            else {}
        ),
    )
    w.append(spark.createDataFrame([(1, "a"), (2, "b")], SCHEMA))
    w.append(spark.createDataFrame([(3, "c")], SCHEMA))
    return w


def test_snapshots_df(spark, tmp_path):
    t = str(tmp_path / "t")
    _seed(spark, t)
    r = IcebergTableReader(spark, t)
    rows = r.snapshots_df().orderBy("sequence_number").collect()
    assert len(rows) == 2
    assert rows[0]["operation"] == "append"
    assert rows[1]["parent_id"] == rows[0]["snapshot_id"]
    assert rows[1]["snapshot_id"] == r.metadata["current-snapshot-id"]


def test_files_df_counts_and_sort_order(spark, tmp_path):
    t = str(tmp_path / "t")
    _seed(spark, t, sort=True)
    r = IcebergTableReader(spark, t)
    df = r.files_df()
    rows = df.collect()
    assert sum(x["record_count"] for x in rows) == 3
    assert all(x["file_format"] == "PARQUET" for x in rows)
    assert all(x["sort_order_id"] == 1 for x in rows)
    # composes with SQL
    df.createOrReplaceTempView("_ice_files")
    assert (
        spark.sql(
            "SELECT CAST(sum(record_count) AS INT) c FROM _ice_files"
        ).collect()[0]["c"]
        == 3
    )


def test_refs_and_manifests_df(spark, tmp_path):
    t = str(tmp_path / "t")
    w = _seed(spark, t)
    first = (
        IcebergTableReader(spark, t)
        .snapshots_df()
        .orderBy("sequence_number")
        .collect()[0]["snapshot_id"]
    )
    w.set_ref("audit", snapshot_id=first, ref_type="tag")
    r = IcebergTableReader(spark, t)
    refs = {x["name"]: x for x in r.refs_df().collect()}
    assert refs["main"]["type"] == "branch"
    assert refs["audit"]["snapshot_id"] == first
    mans = r.manifests_df().collect()
    assert mans and all(m["content"] == 0 for m in mans)
    assert sum(m["added_files_count"] for m in mans) >= 2


def test_inspect_empty_table(spark, tmp_path):
    t = str(tmp_path / "t")
    w = IcebergTableWriter(spark, t)
    w.append(spark.createDataFrame([], SCHEMA))
    r = IcebergTableReader(spark, t)
    assert r.snapshots_df().count() == 1
    # an empty append may still land a zero-row data file
    rows = r.files_df().collect()
    assert sum(x["record_count"] for x in rows) == 0


def test_delta_history_df(spark, tmp_path):
    from deimos_spark.operators.delta_interop import (
        DeltaTableReader,
        DeltaTableWriter,
    )

    t = str(tmp_path / "d")
    w = DeltaTableWriter(spark, t)
    w.append(spark.createDataFrame([(1, "a")], SCHEMA))
    w.append(spark.createDataFrame([(2, "b")], SCHEMA))
    rows = (
        DeltaTableReader(spark, t)
        .history_df()
        .orderBy("version")
        .collect()
    )
    assert [r["version"] for r in rows] == [0, 1]
    assert all(r["operation"] == "WRITE" for r in rows)
    assert all(r["engine_info"] == "deimos-spark" for r in rows)


def test_delta_files_df(spark, tmp_path):
    from deimos_spark.operators.delta_interop import (
        DeltaKeyedTable,
        DeltaTableReader,
    )

    t = str(tmp_path / "d2")
    kt = DeltaKeyedTable(
        spark, t, ["id"], schema=SCHEMA, use_dvs=True
    )
    kt.upsert(spark.createDataFrame([(1, "a"), (2, "b")], SCHEMA))
    kt.delete(spark.createDataFrame([(1,)], "id bigint"))
    df = DeltaTableReader(spark, t).files_df()
    rows = df.collect()
    assert rows and sum(r["num_records"] or 0 for r in rows) == 2
    assert any((r["dv_cardinality"] or 0) == 1 for r in rows)
    df.createOrReplaceTempView("_delta_files")
    assert (
        spark.sql(
            "SELECT CAST(count(*) AS INT) c FROM _delta_files"
        ).collect()[0]["c"]
        == len(rows)
    )
