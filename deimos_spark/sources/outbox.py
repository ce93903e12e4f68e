"""Transactional-outbox table + relay.

Reference behavior (studied from /root/reference/lib/deimos/utils/
outbox_producer.rb, lib/deimos/kafka_message.rb and
docs/DATABASE_BACKEND.md — behavior only):

- producers INSERT encoded messages into an outbox table inside their own
  transaction (id, topic, message BINARY, key BINARY, partition_key,
  created_at);
- a relay repeatedly: picks a topic, reads up to 1000 rows ordered by id,
  optionally compacts keep-last-per-key, produces synchronously, deletes
  the published rows, repeats until drained → at-least-once.

Spark-first: the outbox is an append-only parquet/Delta table with a
monotonic id; the relay is driver-orchestrated (the Spark driver IS the
single writer, so the reference's per-topic DB lock table is unnecessary).
Metrics hook mirrors the reference's pending-count/lag gauges.
"""

from __future__ import annotations

import os
import threading
import time
from typing import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from deimos_spark.operators.compaction import compact_keep_last

OUTBOX_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("topic", T.StringType(), False),
        T.StructField("key", T.BinaryType(), True),
        T.StructField("message", T.BinaryType(), True),
        T.StructField("partition_key", T.BinaryType(), True),
        T.StructField("created_at", T.TimestampType(), False),
    ]
)


class OutboxTable:
    """Append-only keyed message log over parquet (reference:
    kafka_messages table). Single-writer; ids are assigned monotonically
    from the current max at append time."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        self._lock = threading.Lock()

    def read(self) -> DataFrame:
        if not os.path.exists(self.path):
            return self.spark.createDataFrame([], OUTBOX_SCHEMA)
        return self.spark.read.parquet(self.path)

    def append(self, messages: DataFrame) -> None:
        """messages: (key, value, topic[, partition_key]) from the produce
        pipeline → outbox rows with assigned ids."""
        with self._lock:
            base = self.read().agg(F.coalesce(F.max("id"), F.lit(0))).head()[0]
            cols = messages.columns
            pk = F.col("partition_key") if "partition_key" in cols else F.col("key")
            rows = (
                messages.select(
                    F.col("key"),
                    F.col("value").alias("message"),
                    F.col("topic"),
                    pk.alias("partition_key"),
                )
                .withColumn(
                    "id",
                    # single ordered partition: outbox appends are small
                    # per-transaction batches (≤500 in the reference)
                    base
                    + F.row_number().over(
                        Window.orderBy(F.monotonically_increasing_id())
                    ),
                )
                .withColumn("created_at", F.current_timestamp())
                .select([f.name for f in OUTBOX_SCHEMA.fields])
            )
            rows.write.mode("append").parquet(self.path)

    def delete_ids(self, ids: list[int]) -> None:
        """Remove delivered rows via rename-aside swap: write the remainder
        to a tmp dir, move the live table aside, move tmp in, THEN delete
        the old copy. A crash at any point leaves either the old table or
        the new one at self.path — never a window with no table — so
        pending messages can't be stranded (at-least-once preserved).

        Small id lists delete via an InSet predicate (pushable to the
        scan); large drains switch to a broadcast anti-join — a 100k-term
        IN list is a 100k-node expression tree that Catalyst chokes on
        long before the data is the problem."""
        import shutil
        import uuid as _uuid

        if len(ids) <= 1000:
            df = self.read().filter(~F.col("id").isin(ids))
        else:
            id_df = self.spark.createDataFrame(
                [(int(i),) for i in ids], "id long"
            )
            df = self.read().join(F.broadcast(id_df), "id", "left_anti")
        tmp = f"{self.path}.__tmp_{_uuid.uuid4().hex[:8]}"
        df.write.mode("overwrite").parquet(tmp)
        old = f"{self.path}.__old_{_uuid.uuid4().hex[:8]}"
        os.rename(self.path, old)
        os.rename(tmp, self.path)
        shutil.rmtree(old)

    def pending_count(self) -> int:
        return self.read().count()

    def decode_messages(self, codec) -> DataFrame:
        """A33 decode-for-inspection: view pending messages with payloads
        decoded back to structs (reference: kafka_message.rb#decoded)."""
        return self.read().select(
            "id",
            "topic",
            F.col("key").cast("string").alias("key_str"),
            codec.decode(F.col("message")).alias("payload"),
            "created_at",
        )

    def lag_seconds(self) -> float:
        """max age of pending messages (reference metric: outbox lag =
        now - min(created_at) per topic)."""
        row = self.read().agg(F.min("created_at")).head()
        if row[0] is None:
            return 0.0
        return time.time() - row[0].timestamp()


class OutboxRelay:
    """Drain the outbox to a sink in id order, per topic, with optional
    per-key compaction (reference: outbox_producer.rb).

    Two produce modes:
    - mode="driver" (default, the no-broker fallback): `produce(topic,
      rows)` is called driver-side with collected Rows — semantically
      faithful to the single-process reference, but relay throughput is
      bounded by the driver.
    - mode="executor" (the 100-TB path): the batch is hash-partitioned
      by `partition_key` and sorted by id within partitions, and
      `produce(topic, pandas_df)` runs INSIDE the executors via
      mapInPandas — same-key messages stay in one task in id order
      (Kafka producer semantics), payload bytes never visit the driver,
      and only the delivered id list is collected for the delete step.
    """

    def __init__(
        self,
        outbox: OutboxTable,
        produce: Callable[[str, list], None],
        batch_size: int = 1000,
        compact_topics: set[str] | str = frozenset(),
        mode: str = "driver",
        executor_parallelism: int = 8,
    ):
        if mode not in ("driver", "executor"):
            raise ValueError(f"unknown relay mode {mode!r}")
        self.outbox = outbox
        self.produce = produce
        self.batch_size = batch_size
        self.compact_topics = compact_topics  # set of names, or "all"
        self.mode = mode
        self.executor_parallelism = executor_parallelism

    def _should_compact(self, topic: str) -> bool:
        return self.compact_topics == "all" or topic in self.compact_topics

    def run_once(self) -> int:
        """One full drain pass over all topics with pending messages.
        At-least-once: produce happens before delete; a crash in between
        re-sends."""
        total = 0
        while True:
            pending = self.outbox.read()
            topics = [r[0] for r in pending.select("topic").distinct().collect()]
            if not topics:
                return total
            drained_everything = True
            for topic in sorted(topics):
                # fresh read each topic: delete_ids rewrites the table files,
                # invalidating DataFrames planned over the previous listing
                batch_df = (
                    self.outbox.read()
                    .filter(F.col("topic") == topic)
                    .orderBy("id")
                    .limit(self.batch_size)
                )
                if self._should_compact(topic):
                    keyed = batch_df.filter(F.col("key").isNotNull())
                    out_df = compact_keep_last(keyed, ["key"], ["id"]).unionByName(
                        batch_df.filter(F.col("key").isNull())
                    )
                else:
                    out_df = batch_df
                if self.mode == "executor":
                    sent = self._produce_executor(topic, out_df)
                else:
                    rows = out_df.orderBy("id").collect()
                    sent = len(rows)
                    if rows:
                        self.produce(topic, rows)
                if not sent:
                    continue
                # delete ALL batch ids (compacted-away rows included):
                # they are superseded, not pending
                ids = [r["id"] for r in batch_df.select("id").collect()]
                self.outbox.delete_ids(ids)
                total += sent
                if len(ids) >= self.batch_size:
                    drained_everything = False
            if drained_everything:
                return total

    def _produce_executor(self, topic: str, out_df: DataFrame) -> int:
        """Run the produce callback inside the executors. Partitioning
        contract: same partition_key → same task, ascending id within a
        task (null keys hash together; ordering across keys is undefined,
        matching Kafka). Returns the number of delivered messages; only
        their ids cross back to the driver."""
        produce = self.produce  # must be picklable (closure over config)

        def kernel(batches):
            for pdf in batches:
                if len(pdf):
                    produce(topic, pdf)
                yield pdf[["id"]]

        shuffled = (
            out_df.repartition(
                self.executor_parallelism,
                F.coalesce(F.col("partition_key"), F.lit(b"")),
            )
            .sortWithinPartitions("id")
        )
        delivered = shuffled.mapInPandas(
            kernel, schema=T.StructType([T.StructField("id", T.LongType())])
        )
        return delivered.count()
