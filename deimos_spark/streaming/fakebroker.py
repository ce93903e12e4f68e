"""Protocol-faithful in-process Kafka stand-in for consume-path tests.

No broker exists in the sandbox, so Kafka semantics were previously
exercised only through a single file-stream. This fixture models the
parts of the Kafka contract the consume path actually depends on
(studied from the public Kafka protocol docs; behavior parity targets
the reference's Karafka consumer loop, lib/deimos/consumer.rb:17-23 and
active_record_consume/batch_consumption.rb:27-50):

- **Partitioned append-logs.** A topic = N partitions; each partition is
  an append-only log with dense offsets 0,1,2,... Appends to one
  partition are totally ordered; ordering across partitions is
  undefined — exactly Kafka's guarantee.
- **Key → partition stickiness.** Records with the same non-null key
  land in the same partition (hash(key) % N), so per-key order is
  preserved — the assumption batch_consumption.rb's keep-last compaction
  relies on.
- **Consumer groups + committed offsets.** poll() returns records AFTER
  the group's committed offset per partition; commit() advances it.
  Poll-then-commit gives at-least-once: a crash between the two
  redelivers the batch (the idempotent MERGE sink absorbs duplicates).
- **Range-assignment rebalance.** Group members get disjoint partition
  ranges covering the topic; members joining/leaving trigger
  reassignment, like Kafka's range assignor.

Durability is a directory: per-partition JSONL segment files + per-group
offset files (written atomically via temp+rename). "Kill" a consumer by
dropping the object; a fresh FakeBroker over the same directory resumes
from committed state — which is what lets tests exercise crash/rebalance
paths with real process-restart semantics.

Driver-side by design: this is a test fixture bounded by test data
sizes, not a data-path operator.
"""

from __future__ import annotations

import base64
import hashlib
import json
import os
import time
import uuid
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from deimos_spark.streaming.streams import KAFKA_SHAPE


@dataclass
class FakeRecord:
    topic: str
    partition: int
    offset: int
    key: bytes | None
    value: bytes | None
    timestamp: float


def _b64(b: bytes | None) -> str | None:
    return None if b is None else base64.b64encode(b).decode()


def _unb64(s: str | None) -> bytes | None:
    return None if s is None else base64.b64decode(s)


class FakeBroker:
    """File-backed partitioned log with consumer-group offset tracking."""

    def __init__(self, path: str):
        self.path = path
        os.makedirs(path, exist_ok=True)

    # ------------------------------------------------------------- layout

    def _topic_dir(self, topic: str) -> str:
        return os.path.join(self.path, "topics", topic)

    def _log_path(self, topic: str, partition: int) -> str:
        return os.path.join(self._topic_dir(topic), f"p{partition:04d}.jsonl")

    def _group_path(self, group: str, topic: str) -> str:
        return os.path.join(self.path, "groups", f"{group}__{topic}.json")

    # -------------------------------------------------------------- admin

    def create_topic(self, topic: str, partitions: int = 4) -> None:
        d = self._topic_dir(topic)
        os.makedirs(d, exist_ok=True)
        meta = os.path.join(d, "_meta.json")
        if not os.path.exists(meta):
            tmp = meta + f".tmp{uuid.uuid4().hex[:8]}"
            with open(tmp, "w") as fh:
                json.dump({"partitions": partitions}, fh)
            os.replace(tmp, meta)
            for p in range(partitions):
                open(self._log_path(topic, p), "a").close()

    def num_partitions(self, topic: str) -> int:
        with open(os.path.join(self._topic_dir(topic), "_meta.json")) as fh:
            return json.load(fh)["partitions"]

    # ------------------------------------------------------------ produce

    def partition_for_key(self, topic: str, key: bytes | None) -> int:
        """Sticky partitioner: same key → same partition (Kafka contract;
        Kafka uses murmur2 — any stable hash preserves the property)."""
        n = self.num_partitions(topic)
        if key is None:
            return int.from_bytes(os.urandom(2), "big") % n
        return int.from_bytes(hashlib.md5(key).digest()[:4], "big") % n

    def produce(
        self,
        topic: str,
        key: bytes | None,
        value: bytes | None,
        partition: int | None = None,
    ) -> FakeRecord:
        import fcntl

        if partition is None:
            partition = self.partition_for_key(topic, key)
        log = self._log_path(topic, partition)
        # flock serializes concurrent producers (Spark python workers are
        # separate processes in executor-side produce) — the fake analogue
        # of the broker serializing appends to a partition
        with open(log + ".lock", "w") as lock:
            fcntl.flock(lock, fcntl.LOCK_EX)
            offset = self.end_offset(topic, partition)
            rec = FakeRecord(topic, partition, offset, key, value, time.time())
            with open(log, "a") as fh:
                fh.write(
                    json.dumps(
                        {
                            "offset": offset,
                            "key": _b64(key),
                            "value": _b64(value),
                            "ts": rec.timestamp,
                        }
                    )
                    + "\n"
                )
        return rec

    def produce_many(self, topic: str, records) -> None:
        for key, value in records:
            self.produce(topic, key, value)

    def end_offset(self, topic: str, partition: int) -> int:
        try:
            with open(self._log_path(topic, partition)) as fh:
                return sum(1 for _ in fh)
        except OSError:
            return 0

    # ------------------------------------------------------------ consume

    def read_partition(
        self, topic: str, partition: int, from_offset: int = 0, max_records=None
    ) -> list[FakeRecord]:
        out: list[FakeRecord] = []
        with open(self._log_path(topic, partition)) as fh:
            for line in fh:
                d = json.loads(line)
                if d["offset"] < from_offset:
                    continue
                out.append(
                    FakeRecord(
                        topic, partition, d["offset"], _unb64(d["key"]),
                        _unb64(d["value"]), d["ts"],
                    )
                )
                if max_records is not None and len(out) >= max_records:
                    break
        return out

    def committed(self, group: str, topic: str) -> dict[int, int]:
        """partition → next offset to read (Kafka commit convention)."""
        try:
            with open(self._group_path(group, topic)) as fh:
                return {int(k): v for k, v in json.load(fh).items()}
        except OSError:
            return {}

    def commit(self, group: str, topic: str, offsets: dict[int, int]) -> None:
        """Atomically advance the group's committed offsets (merge with
        existing — a member commits only its assigned partitions)."""
        os.makedirs(os.path.join(self.path, "groups"), exist_ok=True)
        cur = self.committed(group, topic)
        cur.update(offsets)
        target = self._group_path(group, topic)
        tmp = target + f".tmp{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as fh:
            json.dump({str(k): v for k, v in cur.items()}, fh)
        os.replace(tmp, target)

    def poll(
        self,
        group: str,
        topic: str,
        max_records_per_partition: int | None = None,
        partitions: list[int] | None = None,
    ) -> list[FakeRecord]:
        """Records after the committed offsets, per partition, in offset
        order within each partition. Does NOT commit — the caller commits
        after processing (at-least-once)."""
        committed = self.committed(group, topic)
        if partitions is None:
            partitions = list(range(self.num_partitions(topic)))
        out: list[FakeRecord] = []
        for p in sorted(partitions):
            out.extend(
                self.read_partition(
                    topic, p, committed.get(p, 0), max_records_per_partition
                )
            )
        return out

    @staticmethod
    def assign(partitions: int, members: list[str]) -> dict[str, list[int]]:
        """Range assignment (Kafka's default assignor): contiguous chunks
        to members in sorted order; first members absorb the remainder."""
        members = sorted(members)
        n, m = partitions, len(members)
        if m == 0:
            return {}
        base, rem = divmod(n, m)
        out: dict[str, list[int]] = {}
        start = 0
        for i, member in enumerate(members):
            count = base + (1 if i < rem else 0)
            out[member] = list(range(start, start + count))
            start += count
        return out

    # -------------------------------------------------------- Spark bridge

    def to_dataframe(self, spark: SparkSession, records: list[FakeRecord]) -> DataFrame:
        """Kafka-shaped DataFrame (key/value BINARY, topic, partition,
        offset, timestamp) — drop-in for the consume pipeline."""
        import datetime as dt

        rows = [
            (
                bytearray(r.key) if r.key is not None else None,
                bytearray(r.value) if r.value is not None else None,
                r.topic,
                r.partition,
                r.offset,
                dt.datetime.fromtimestamp(r.timestamp),
            )
            for r in records
        ]
        return spark.createDataFrame(rows, KAFKA_SHAPE)


class FakeConsumer:
    """A group member: polls its assigned partitions, feeds the batch
    consumer, commits AFTER the merge lands (at-least-once; the keyed
    MERGE sink is idempotent, so redelivery after a crash converges)."""

    def __init__(
        self,
        broker: FakeBroker,
        group: str,
        topic: str,
        member_id: str | None = None,
    ):
        self.broker = broker
        self.group = group
        self.topic = topic
        self.member_id = member_id or f"member-{uuid.uuid4().hex[:6]}"
        self.assigned: list[int] | None = None  # None = all partitions

    def rebalance(self, members: list[str]) -> None:
        assignment = FakeBroker.assign(
            self.broker.num_partitions(self.topic), members
        )
        self.assigned = assignment.get(self.member_id, [])

    def consume_once(
        self, spark: SparkSession, batch_consumer, max_per_partition=None
    ) -> int:
        """One poll→process→commit cycle; returns records processed."""
        records = self.broker.poll(
            self.group, self.topic, max_per_partition, self.assigned
        )
        if not records:
            return 0
        batch_consumer.consume_batch(self.broker.to_dataframe(spark, records))
        new_offsets: dict[int, int] = {}
        for r in records:
            new_offsets[r.partition] = max(
                new_offsets.get(r.partition, 0), r.offset + 1
            )
        self.broker.commit(self.group, self.topic, new_offsets)
        return len(records)

    def run_until_drained(
        self, spark: SparkSession, batch_consumer, max_per_partition=None,
        max_cycles: int = 100,
    ) -> int:
        total = 0
        for _ in range(max_cycles):
            n = self.consume_once(spark, batch_consumer, max_per_partition)
            if n == 0:
                return total
            total += n
        return total


def broker_producer(broker_path: str):
    """Picklable produce callback for OutboxRelay(mode='executor'):
    reconnects to the file-backed broker inside each executor task and
    appends the batch's (key, message) pairs. flock in produce() makes
    concurrent tasks safe, like a real broker serializing appends."""

    def produce(topic: str, pdf) -> None:
        broker = FakeBroker(broker_path)
        for key, msg in zip(pdf["key"], pdf["message"]):
            broker.produce(
                topic,
                bytes(key) if key is not None else None,
                bytes(msg) if msg is not None else None,
            )

    return produce
