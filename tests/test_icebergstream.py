"""Streaming source over the Iceberg snapshot log: append snapshots
become micro-batches, offsets checkpoint/resume, replace (compaction)
snapshots emit nothing, row-level-change snapshots refuse (or are
tolerated with ignoreChanges)."""

import pytest

from deimos_spark.operators.iceberg_interop import IcebergTableWriter
from deimos_spark.sources.icebergstream import IcebergStreamDataSource


@pytest.fixture(autouse=True)
def _register(spark):
    spark.dataSource.register(IcebergStreamDataSource)


def _drain(spark, path, ckpt, **opts):
    reader = spark.readStream.format("icebergstream").option("path", path)
    for k, v in opts.items():
        reader = reader.option(k, v)
    batches = []

    def sink(df, _bid):
        rows = df.collect()
        if rows:
            batches.append(rows)

    q = (
        reader.load()
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return batches


def test_snapshots_become_batches_and_restart_resumes(spark, tmp_path):
    t = str(tmp_path / "it")
    w = IcebergTableWriter(spark, t)
    w.append(spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string"))
    w.append(spark.createDataFrame([(3, "c")], "id long, v string"))

    ckpt = str(tmp_path / "ckpt")
    batches = _drain(spark, t, ckpt)
    got = {(r["id"], r["v"]) for rows in batches for r in rows}
    assert got == {(1, "a"), (2, "b"), (3, "c")}

    # nothing new -> no batches; then one more snapshot -> only its rows
    assert _drain(spark, t, ckpt) == []
    w.append(spark.createDataFrame([(4, "d")], "id long, v string"))
    batches = _drain(spark, t, ckpt)
    got = {(r["id"], r["v"]) for rows in batches for r in rows}
    assert got == {(4, "d")}


def test_overwrite_refuses_unless_ignore_changes(spark, tmp_path):
    t = str(tmp_path / "it_ow")
    w = IcebergTableWriter(spark, t)
    w.append(spark.createDataFrame([(1, "a")], "id long, v string"))
    w.overwrite(spark.createDataFrame([(2, "b")], "id long, v string"))

    from py4j.protocol import Py4JJavaError
    from pyspark.errors import StreamingQueryException

    with pytest.raises((StreamingQueryException, Py4JJavaError)):
        _drain(spark, t, str(tmp_path / "c1"))

    # ignoreChanges: only the overwrite's ADDED files are emitted,
    # re-delivery accepted
    batches = _drain(spark, t, str(tmp_path / "c2"), ignoreChanges="true")
    got = {(r["id"], r["v"]) for rows in batches for r in rows}
    assert got == {(1, "a"), (2, "b")}


def test_starting_latest_skips_history(spark, tmp_path):
    t = str(tmp_path / "it_latest")
    w = IcebergTableWriter(spark, t)
    w.append(spark.createDataFrame([(1, "a")], "id long, v string"))

    ckpt = str(tmp_path / "ckpt")
    assert _drain(spark, t, ckpt, startingSnapshot="latest") == []
    w.append(spark.createDataFrame([(2, "b")], "id long, v string"))
    batches = _drain(spark, t, ckpt, startingSnapshot="latest")
    got = {(r["id"], r["v"]) for rows in batches for r in rows}
    assert got == {(2, "b")}


def test_partitioned_table_rows_complete(spark, tmp_path):
    """Iceberg data files physically contain identity partition
    columns — rows arrive complete without literal re-attachment."""
    t = str(tmp_path / "it_part")
    w = IcebergTableWriter(spark, t, partition_by=("p",))
    w.append(
        spark.createDataFrame(
            [("x", 1), ("y", 2)], "p string, id long"
        )
    )
    batches = _drain(spark, t, str(tmp_path / "ckpt"))
    got = {(r["p"], r["id"]) for rows in batches for r in rows}
    assert got == {("x", 1), ("y", 2)}
