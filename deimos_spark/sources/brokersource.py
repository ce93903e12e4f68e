"""Spark-native source over the fake broker: PySpark 4's Python
DataSource API (public `pyspark.sql.datasource`) exposing the
fakebroker's partitioned logs as BOTH a batch relation and a Structured
Streaming source.

Why this exists: the consume path has two execution modes — the
poll-loop (`FakeConsumer`, reference parity with the Karafka loop) and
Structured Streaming (`BatchConsumer.attach` over a readStream). The
file-stream substitute used for the latter loses Kafka's
partition/offset structure; this source preserves it, so streaming
tests exercise the same per-partition ordering + offset-resume
semantics the protocol guarantees:

    spark.dataSource.register(FakeBrokerDataSource)
    df = (spark.readStream.format("fakebroker")
          .option("path", broker_dir).option("topic", "widgets").load())

Rows are exactly KAFKA_SHAPE (key/value BINARY, topic, partition,
offset, timestamp) — drop-in for the consumer pipeline. Offsets are
`{partition: next_offset}` dicts, checkpointed by Spark like any
streaming source; one Spark input partition per broker partition per
micro-batch, read INSIDE executors (the broker dir is plain files).

Scale note: this is the test-fixture twin of the real `format("kafka")`
source — same shape, same offset semantics — so pipelines are written
once and switch source by config.
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

from deimos_spark.streaming.streams import KAFKA_SHAPE


class _BrokerPartition(InputPartition):
    def __init__(self, path: str, topic: str, partition: int, start: int, end: int):
        self.path = path
        self.topic = topic
        self.partition = partition
        self.start = start
        self.end = end


def _read_span(p: _BrokerPartition):
    """Executor-side: replay one partition's [start, end) offset span in
    offset order."""
    from deimos_spark.streaming.fakebroker import FakeBroker

    broker = FakeBroker(p.path)
    for rec in broker.read_partition(p.topic, p.partition, from_offset=p.start):
        if rec.offset >= p.end:
            break
        yield (
            rec.key,
            rec.value,
            rec.topic,
            rec.partition,
            rec.offset,
            _dt.datetime.fromtimestamp(rec.timestamp),
        )


class _BrokerBatchReader(DataSourceReader):
    def __init__(self, path: str, topic: str):
        from deimos_spark.streaming.fakebroker import FakeBroker

        self.path = path
        self.topic = topic
        self.n = FakeBroker(path).num_partitions(topic)
        self.ends = [
            FakeBroker(path).end_offset(topic, p) for p in range(self.n)
        ]

    def partitions(self):
        return [
            _BrokerPartition(self.path, self.topic, p, 0, self.ends[p])
            for p in range(self.n)
        ]

    def read(self, partition):
        return _read_span(partition)


class _BrokerStreamReader(DataSourceStreamReader):
    """Micro-batch reader: each batch covers (committed, latest] per
    broker partition; Spark checkpoints the returned offset dicts, so a
    restarted query resumes exactly where it stopped (the same
    offset-resume contract the poll-loop tests assert)."""

    def __init__(self, path: str, topic: str):
        from deimos_spark.streaming.fakebroker import FakeBroker

        self.path = path
        self.topic = topic
        self.n = FakeBroker(path).num_partitions(topic)

    def initialOffset(self) -> dict:
        return {str(p): 0 for p in range(self.n)}

    def latestOffset(self) -> dict:
        from deimos_spark.streaming.fakebroker import FakeBroker

        broker = FakeBroker(self.path)
        return {
            str(p): broker.end_offset(self.topic, p) for p in range(self.n)
        }

    def partitions(self, start: dict, end: dict):
        out = []
        for p in range(self.n):
            s, e = int(start.get(str(p), 0)), int(end.get(str(p), 0))
            if e > s:
                out.append(_BrokerPartition(self.path, self.topic, p, s, e))
        return out

    def read(self, partition):
        return _read_span(partition)

    def commit(self, end: dict) -> None:
        pass  # Spark's checkpoint is the source of truth for progress


class FakeBrokerDataSource(DataSource):
    """`format("fakebroker")` — options: path (broker dir), topic."""

    @classmethod
    def name(cls) -> str:
        return "fakebroker"

    def schema(self):
        return KAFKA_SHAPE

    def _args(self) -> tuple[str, str]:
        path = self.options.get("path")
        topic = self.options.get("topic")
        if not path or not topic:
            raise ValueError("fakebroker needs 'path' and 'topic' options")
        return path, topic

    def reader(self, schema) -> DataSourceReader:
        return _BrokerBatchReader(*self._args())

    def streamReader(self, schema) -> DataSourceStreamReader:
        return _BrokerStreamReader(*self._args())

    def writer(self, schema, overwrite: bool):
        return _BrokerWriter(*self._args())

    def streamWriter(self, schema, overwrite: bool):
        return _BrokerWriter(*self._args())


# ----------------------------------------------------------------- writer

from dataclasses import dataclass  # noqa: E402

from pyspark.sql.datasource import (  # noqa: E402
    DataSourceStreamWriter,
    DataSourceWriter,
    WriterCommitMessage,
)


@dataclass
class _ProducedMsg(WriterCommitMessage):
    n: int = 0


class _BrokerWriter(DataSourceWriter, DataSourceStreamWriter):
    """Executor-side produce: each task appends its rows through the
    broker's sticky key-partitioner (flock-serialized appends). Expects
    (key BINARY, value BINARY) columns — the produce pipeline's message
    shape; extra columns are ignored. At-least-once: a failed batch is
    retried by Spark and the idempotent MERGE consumer absorbs the
    duplicates, exactly like the real `format("kafka")` sink."""

    def __init__(self, path: str, topic: str):
        self.path = path
        self.topic = topic

    def write(self, iterator) -> _ProducedMsg:
        from deimos_spark.streaming.fakebroker import FakeBroker

        broker = FakeBroker(self.path)
        n = 0
        for row in iterator:
            key = bytes(row["key"]) if row["key"] is not None else None
            value = bytes(row["value"]) if row["value"] is not None else None
            broker.produce(self.topic, key, value)
            n += 1
        return _ProducedMsg(n)

    def commit(self, messages, batchId: int | None = None) -> None:
        pass  # appends are already durable; nothing to finalize

    def abort(self, messages, batchId: int | None = None) -> None:
        pass  # duplicates possible on retry — at-least-once by design
