"""Exactly-once consumer sink: BatchConsumer over a DeltaKeyedTable
with txn identifiers (the C1/C2 completion — Spark's foreachBatch
replays a micro-batch after a crash between the sink commit and the
streaming checkpoint; with txn=(app, batch_id) the replay is a no-op).

Reference semantics: the reference gets this from the DB transaction
wrapping each slice (batch_consumption.rb — behavior only); on a
lakehouse sink the protocol's transaction identifier is the native
equivalent.
"""

import pytest
from pyspark.sql import Row

from deimos_spark.operators.delta_interop import DeltaKeyedTable
from deimos_spark.schemas.avro import parse_avsc
from deimos_spark.streaming.consumer import BatchConsumer, ConsumerConfig
from tests.test_producer_consumer import MY_SCHEMA, _kafka_shaped
from deimos_spark.streaming.producer import Producer, TopicConfig


@pytest.fixture
def producer():
    return Producer(
        TopicConfig(topic="my-topic", schema=MY_SCHEMA, key_field="test_id")
    )


def _consumer(spark, path, use_dvs=False, compacted=True):
    table = DeltaKeyedTable(
        spark, path, ["test_id"], schema=MY_SCHEMA.struct, use_dvs=use_dvs
    )
    cfg = ConsumerConfig(
        schema=MY_SCHEMA, key_cols=["test_id"], compacted=compacted
    )
    return BatchConsumer(cfg, table)


@pytest.mark.parametrize("use_dvs", [False, True], ids=["rewrite", "dv"])
def test_replayed_micro_batch_is_noop(spark, tmp_path, producer, use_dvs):
    c = _consumer(spark, str(tmp_path / "t"), use_dvs=use_dvs)
    b0 = _kafka_shaped(
        spark, producer,
        [Row(test_id="a", some_int=1), Row(test_id="b", some_int=2)],
    )
    c.consume_batch(b0, txn=("job", 0))
    # crash-replay of batch 0 (same id, Spark's foreachBatch contract)
    c.consume_batch(b0, txn=("job", 0))
    got = {r["test_id"]: r["some_int"] for r in c.table.read().collect()}
    assert got == {"a": 1, "b": 2}

    b1 = _kafka_shaped(
        spark, producer, [Row(test_id="a", some_int=9)], start_offset=2
    )
    c.consume_batch(b1, txn=("job", 1))
    c.consume_batch(b1, txn=("job", 1))  # replay again
    got = {r["test_id"]: r["some_int"] for r in c.table.read().collect()}
    assert got == {"a": 9, "b": 2}
    # exactly two data commits + nothing from the replays
    assert c.table.writer._latest_version() == 1


def test_tombstone_batch_replay(spark, tmp_path, producer):
    c = _consumer(spark, str(tmp_path / "t"))
    c.consume_batch(
        _kafka_shaped(
            spark, producer,
            [Row(test_id="a", some_int=1), Row(test_id="b", some_int=2)],
        ),
        txn=("job", 0),
    )
    tomb = _kafka_shaped(
        spark, producer, [Row(test_id="a", some_int=0)], start_offset=2
    )
    from pyspark.sql import functions as F

    tomb = tomb.withColumn("value", F.lit(None).cast("binary"))
    c.consume_batch(tomb, txn=("job", 1))
    c.consume_batch(tomb, txn=("job", 1))
    got = {r["test_id"]: r["some_int"] for r in c.table.read().collect()}
    assert got == {"b": 2}


def test_txn_requires_compacted(spark, tmp_path, producer):
    c = _consumer(spark, str(tmp_path / "t"), compacted=False)
    batch = _kafka_shaped(spark, producer, [Row(test_id="a", some_int=1)])
    with pytest.raises(ValueError, match="compacted"):
        c.consume_batch(batch, txn=("job", 0))


def test_attach_passes_batch_id(spark, tmp_path, producer):
    """attach(txn_app_id=...) wires (app, batch_id) through foreachBatch."""
    c = _consumer(spark, str(tmp_path / "t"))
    seen = []
    orig = c.consume_batch
    c.consume_batch = lambda b, txn=None: (seen.append(txn), orig(b, txn))[1]

    src = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", "5")
        .load()
        .selectExpr(
            "cast(null as binary) as key",
            "cast(null as binary) as value",
            "0 as partition",
            "value as offset",
        )
        .limit(0)
    )
    # drive one empty micro-batch through the real writeStream wiring
    q = c.attach(
        src, str(tmp_path / "ckpt"), txn_app_id="stream-app"
    ).trigger(availableNow=True).start()
    q.awaitTermination(60)
    assert seen and all(
        t is not None and t[0] == "stream-app" and isinstance(t[1], int)
        for t in seen
    )
