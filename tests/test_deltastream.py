"""Streaming source over the Delta log: commits become micro-batches,
offsets checkpoint/resume, non-append commits refused (or tolerated
with ignoreChanges), partition values re-attached from the log."""

import os

import pytest

from deimos_spark.operators.delta_interop import (
    DeltaKeyedTable,
    DeltaTableWriter,
)
from deimos_spark.sources.deltastream import DeltaStreamDataSource


@pytest.fixture(autouse=True)
def _register(spark):
    spark.dataSource.register(DeltaStreamDataSource)


def _drain(spark, path, ckpt, **opts):
    reader = spark.readStream.format("deltastream").option("path", path)
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


def test_commits_become_batches_and_restart_resumes(spark, tmp_path):
    t = str(tmp_path / "dt")
    w = DeltaTableWriter(spark, t)
    w.append(spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string"))
    w.append(spark.createDataFrame([(3, "c")], "id long, v string"))

    ckpt = str(tmp_path / "ckpt")
    batches = _drain(spark, t, ckpt)
    got = {(r["id"], r["v"]) for rows in batches for r in rows}
    assert got == {(1, "a"), (2, "b"), (3, "c")}

    # nothing new -> no batches; then one more commit -> only its rows
    assert _drain(spark, t, ckpt) == []
    w.append(spark.createDataFrame([(4, "d")], "id long, v string"))
    batches = _drain(spark, t, ckpt)
    got = {(r["id"], r["v"]) for rows in batches for r in rows}
    assert got == {(4, "d")}


def test_starting_version_latest_skips_backlog(spark, tmp_path):
    t = str(tmp_path / "dtl")
    w = DeltaTableWriter(spark, t)
    w.append(spark.createDataFrame([(1, "old")], "id long, v string"))

    ckpt = str(tmp_path / "ckpt")
    assert _drain(spark, t, ckpt, startingVersion="latest") == []
    w.append(spark.createDataFrame([(2, "new")], "id long, v string"))
    batches = _drain(spark, t, ckpt, startingVersion="latest")
    got = {(r["id"], r["v"]) for rows in batches for r in rows}
    assert got == {(2, "new")}


def test_non_append_commit_refused_unless_ignore_changes(spark, tmp_path):
    t = str(tmp_path / "dtm")
    kt = DeltaKeyedTable(spark, t, ["id"], schema="id long, v string")
    kt.upsert(spark.createDataFrame([(1, "a")], "id long, v string"))
    kt.upsert(spark.createDataFrame([(1, "b")], "id long, v string"))  # rewrite

    with pytest.raises(Exception, match="append-only|remove"):
        _drain(spark, t, str(tmp_path / "c1"))

    batches = _drain(spark, t, str(tmp_path / "c2"), ignoreChanges="true")
    got = [(r["id"], r["v"]) for rows in batches for r in rows]
    # both versions' adds emitted (re-delivery accepted by the option)
    assert ("1", "b") not in got  # typed long, not string
    assert (1, "b") in got and (1, "a") in got


def test_partition_values_reattached_from_log(spark, tmp_path):
    t = str(tmp_path / "dtp")
    w = DeltaTableWriter(spark, t, partition_by=("k",))
    w.append(
        spark.createDataFrame(
            [("x", 1), ("y", 2), (None, 3)], "k string, id long"
        )
    )
    batches = _drain(spark, t, str(tmp_path / "ckpt"))
    got = {(r["k"], r["id"]) for rows in batches for r in rows}
    assert got == {("x", 1), ("y", 2), (None, 3)}
