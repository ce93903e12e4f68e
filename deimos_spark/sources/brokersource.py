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
            # UTC-pinned: broker timestamps are epoch seconds; naive
            # local-time conversion would shift on a TZ!=UTC cluster
            # (the session pins spark.sql.session.timeZone=UTC).
            _dt.datetime.fromtimestamp(rec.timestamp, tz=_dt.timezone.utc),
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
    offset-resume contract the poll-loop tests assert).

    Backpressure: the `maxRecordsPerBatch` option caps how far each
    micro-batch may advance PER PARTITION — the reference caps every
    poll the same way (db_poller/base.rb:16 BATCH_SIZE=1000,
    outbox_producer.rb:11), and it is this source's analogue of the
    Kafka source's maxOffsetsPerTrigger. The simple
    DataSourceStreamReader API never passes the committed start to
    latestOffset(), so the cap is reader-tracked (the same idiom
    Spark's own self-clocked Python stream sources use): `_planned` is
    the high-water mark this reader has offered, `_floor` is true
    progress learned from every partitions(start, end) call. After a
    restart the committed position is unknown until the first
    partitions() call, so the reader offers "no progress" once, learns
    the checkpointed start from that (empty) batch's span, and then
    drains the backlog in capped batches — never in one unbounded
    replay. Worst case across a crash inside that learning window is
    re-reading records, which is the source's documented at-least-once
    contract (the idempotent MERGE consumer absorbs duplicates)."""

    def __init__(
        self,
        path: str,
        topic: str,
        max_records_per_batch: int | None,
        starting_offsets: str = "earliest",
        group_id: str | None = None,
    ):
        from deimos_spark.streaming.fakebroker import FakeBroker

        self.path = path
        self.topic = topic
        self.n = FakeBroker(path).num_partitions(topic)
        self.max_records_per_batch = max_records_per_batch
        if starting_offsets not in ("earliest", "latest"):
            raise ValueError(
                "startingOffsets must be 'earliest' or 'latest', got "
                f"{starting_offsets!r}"
            )
        self.starting_offsets = starting_offsets
        self.group_id = group_id
        self._planned: dict | None = None  # offered end, this reader
        self._floor: dict = {}  # max(start/end) seen from the engine
        # Broker-side group commits (Kafka group semantics): commit()
        # persists progress under groupId, so a restarted reader knows
        # its floor IMMEDIATELY — no zero-progress learning batch, and
        # the offset WAL stays monotone. Kept separate from the
        # engine-learned _floor: the checkpoint remains the source of
        # truth, so a (misconfigured) shared group that is AHEAD of this
        # query's checkpoint can never make partitions() skip records.
        self._group_floor: dict = {}
        if group_id:
            committed = FakeBroker(path).committed(group_id, topic)
            self._group_floor = {str(p): o for p, o in committed.items()}

    def initialOffset(self) -> dict:
        """Fresh-query start position (restarts use the checkpoint
        instead, exactly like the Kafka source's startingOffsets)."""
        if self.starting_offsets == "latest":
            from deimos_spark.streaming.fakebroker import FakeBroker

            broker = FakeBroker(self.path)
            off = {
                str(p): broker.end_offset(self.topic, p)
                for p in range(self.n)
            }
        else:
            off = {str(p): 0 for p in range(self.n)}
        self._planned = dict(off)
        return off

    def latestOffset(self) -> dict:
        from deimos_spark.streaming.fakebroker import FakeBroker

        broker = FakeBroker(self.path)
        ends = {
            str(p): broker.end_offset(self.topic, p) for p in range(self.n)
        }
        cap = self.max_records_per_batch
        if cap is None:
            return ends
        if self._planned is None:
            # Restarted query: committed progress is unknown until the
            # engine hands us a (start, end) span. Best floor available:
            # a WAL-replay batch's span, else the broker-side group
            # commit (groupId set). With neither, offer zero progress
            # once — the resulting empty batch's partitions() call
            # teaches us the real start.
            self._planned = {
                str(p): max(
                    self._floor.get(str(p), 0),
                    self._group_floor.get(str(p), 0),
                )
                for p in range(self.n)
            }
            if not self._floor and not self._group_floor:
                return dict(self._planned)
        out = {}
        for p in range(self.n):
            k = str(p)
            base = max(self._planned.get(k, 0), self._floor.get(k, 0))
            out[k] = max(base, min(ends.get(k, 0), base + cap))
        self._planned = dict(out)
        return out

    def partitions(self, start: dict, end: dict):
        out = []
        for p in range(self.n):
            k = str(p)
            s, e = int(start.get(k, 0)), int(end.get(k, 0))
            # learn true progress; never plan a re-read below it (a
            # transiently-backward checkpoint can only occur in the
            # post-restart learning batch above)
            s = max(s, self._floor.get(k, 0))
            self._floor[k] = max(self._floor.get(k, 0), s, e)
            if self._planned is not None:
                self._planned[k] = max(self._planned.get(k, 0), e)
            if e > s:
                out.append(_BrokerPartition(self.path, self.topic, p, s, e))
        return out

    def read(self, partition):
        return _read_span(partition)

    def commit(self, end: dict) -> None:
        # Spark's checkpoint is the source of truth for progress; with a
        # groupId we ALSO mirror it to the broker's group store (Kafka's
        # group-offset idiom) so the next incarnation of this reader
        # starts with a known floor. Called after the WAL entry commits,
        # so the group store trails the checkpoint by at most one
        # in-flight batch — and a stale group floor only costs a capped
        # re-offer, never a skip.
        if self.group_id:
            from deimos_spark.streaming.fakebroker import FakeBroker

            FakeBroker(self.path).commit(
                self.group_id,
                self.topic,
                {int(k): int(v) for k, v in end.items()},
            )


class FakeBrokerDataSource(DataSource):
    """`format("fakebroker")` — options: path (broker dir), topic,
    maxRecordsPerBatch (streaming read: per-partition micro-batch cap),
    startingOffsets ('earliest' default | 'latest' — fresh queries only,
    restarts resume from the checkpoint, Kafka-source semantics),
    groupId (streaming read: mirror committed progress to the broker's
    group store so restarts start from a known floor — keeps the offset
    WAL monotone when maxRecordsPerBatch is set; the checkpoint stays
    the source of truth, like Kafka's group.id under Spark)."""

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
        raw = self.options.get("maxRecordsPerBatch")
        cap = int(raw) if raw is not None else None
        if cap is not None and cap <= 0:
            raise ValueError("maxRecordsPerBatch must be a positive integer")
        return _BrokerStreamReader(
            *self._args(),
            max_records_per_batch=cap,
            starting_offsets=self.options.get("startingOffsets", "earliest"),
            group_id=self.options.get("groupId"),
        )

    def writer(self, schema, overwrite: bool):
        if overwrite:
            # the broker log is append-only, exactly like the real Kafka
            # sink — fail loudly instead of silently appending
            raise ValueError(
                "fakebroker is append-only: mode('overwrite') is not "
                "supported; use mode('append')"
            )
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
