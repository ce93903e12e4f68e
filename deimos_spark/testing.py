"""Test helpers — the reference ships its test harness as a product feature
(lib/deimos/test_helpers.rb: have_sent matchers, test_consume_batch);
this module is the engine's analogue for pytest.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Row, SparkSession
from pyspark.sql import functions as F

from deimos_spark.streaming.consumer import BatchConsumer
from deimos_spark.streaming.producer import Producer


@dataclass
class MemorySink:
    """Collects published messages for assertions (reference:
    backends/test.rb — an in-memory array)."""

    messages: list[Row] = field(default_factory=list)

    def publish(self, producer: Producer, df: DataFrame) -> None:
        self.messages.extend(producer.build_messages(df).collect())

    def clear(self) -> None:
        self.messages.clear()

    # -------------------------------------------------- have_sent analogue

    def decoded(self) -> list[dict]:
        out = []
        for m in self.messages:
            payload = json.loads(bytes(m["value"])) if m["value"] is not None else None
            key = json.loads(bytes(m["key"])) if m["key"] is not None else None
            out.append({"topic": m["topic"], "key": key, "payload": payload})
        return out

    def assert_sent(self, topic: str, payload_subset: dict | None) -> None:
        """have_sent(payload, topic): passes if some message on `topic`
        matches the payload subset (None = tombstone)."""
        for m in self.decoded():
            if m["topic"] != topic:
                continue
            if payload_subset is None and m["payload"] is None:
                return
            if m["payload"] is not None and all(
                m["payload"].get(k) == v for k, v in (payload_subset or {}).items()
            ):
                return
        raise AssertionError(
            f"no message on {topic!r} matching {payload_subset!r}; "
            f"sent: {self.decoded()}"
        )


def test_consume_batch(
    spark: SparkSession,
    producer: Producer,
    consumer: BatchConsumer,
    rows: list[Row],
    start_offset: int = 0,
) -> None:
    """Drive a consumer with payload rows as if they arrived from Kafka
    (reference: test_consume_batch) — encodes through the real produce
    pipeline, stamps (partition, offset), runs the real consume pipeline."""
    from pyspark.sql import Window

    msgs = producer.build_messages(spark.createDataFrame(rows))
    w = Window.orderBy(F.monotonically_increasing_id())
    batch = (
        msgs.withColumn("offset", F.row_number().over(w) + F.lit(start_offset - 1))
        .withColumn("partition", F.lit(0))
        .select("key", "value", "partition", "offset")
    )
    consumer.consume_batch(batch)
