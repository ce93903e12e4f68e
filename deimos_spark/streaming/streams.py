"""Structured Streaming wrappers: sources, sinks, windowed aggregations,
cross-batch dedup — the streaming surface of the engine (SURVEY §2C).

Reference parity (behavior only):
- C1 at-least-once + checkpointing: Kafka/file source with checkpoint dir;
  the keyed MERGE sink is idempotent → effectively exactly-once.
- C2 batch atomicity: foreachBatch applies a whole micro-batch in one merge.
- C3 ordering: merges sort by (partition, offset) via keep-last compaction.
- C4 (extension): event-time tumbling/sliding/session windows + watermark —
  absent in the reference, first-class here.
- C5 (extension): cross-batch dedup with dropDuplicatesWithinWatermark.
- C6/C7: trigger cadence + maxOffsetsPerTrigger / maxFilesPerTrigger caps.

Everything works against file-stream sources in tests (no broker in the
sandbox); the Kafka builders produce identical-shaped DataFrames
(key BINARY, value BINARY, topic, partition, offset, timestamp).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

KAFKA_SHAPE = T.StructType(
    [
        T.StructField("key", T.BinaryType(), True),
        T.StructField("value", T.BinaryType(), True),
        T.StructField("topic", T.StringType(), True),
        T.StructField("partition", T.IntegerType(), True),
        T.StructField("offset", T.LongType(), True),
        T.StructField("timestamp", T.TimestampType(), True),
    ]
)


# ------------------------------------------------------------------ sources

def kafka_source(
    spark: SparkSession,
    bootstrap_servers: str,
    subscribe: str,
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = None,
    **options,
) -> DataFrame:
    """Kafka readStream (needs spark-sql-kafka on the classpath). The
    max_offsets_per_trigger cap is the reference's poll batch bound (C7)."""
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", subscribe)
        .option("startingOffsets", starting_offsets)
    )
    if max_offsets_per_trigger is not None:
        reader = reader.option("maxOffsetsPerTrigger", str(max_offsets_per_trigger))
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()


def file_stream_source(
    spark: SparkSession,
    path: str,
    schema: T.StructType = KAFKA_SHAPE,
    max_files_per_trigger: int | None = 1,
) -> DataFrame:
    """Kafka-shaped stream over a directory of parquet files — the test/
    sandbox substitute for a broker. Each dropped file ≈ one micro-batch."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.parquet(path)


# -------------------------------------------------------------------- sinks

def memory_sink(df: DataFrame, name: str, checkpoint: str | None = None):
    """In-memory queryable sink (reference: backends/test.rb — the assert
    sink). Query results with spark.sql(f'select * from {name}')."""
    w = df.writeStream.format("memory").queryName(name).outputMode("append")
    if checkpoint:
        w = w.option("checkpointLocation", checkpoint)
    return w


def kafka_sink(
    df: DataFrame, bootstrap_servers: str, checkpoint: str, sync: bool = True
):
    """writeStream to Kafka: expects (key, value, topic) columns. acks=all
    for the sync backend (A1), acks=1 for async (A2)."""
    return (
        df.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("kafka.acks", "all" if sync else "1")
        .option("checkpointLocation", checkpoint)
    )


# ------------------------------------------------- event-time aggregations

def windowed_agg(
    df: DataFrame,
    time_col: str,
    window_duration: str,
    aggs: Sequence,
    group_cols: Sequence[str] = (),
    slide_duration: str | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Tumbling/sliding event-time window aggregation with late-data
    watermark (C4). aggs are ready-made agg Columns."""
    wm = df.withWatermark(time_col, watermark)
    win = (
        F.window(F.col(time_col), window_duration, slide_duration)
        if slide_duration
        else F.window(F.col(time_col), window_duration)
    )
    agged = wm.groupBy(win.alias("window"), *[F.col(c) for c in group_cols]).agg(*aggs)
    return _flatten_window(agged, group_cols)


def _flatten_window(agged: DataFrame, group_cols: Sequence[str]) -> DataFrame:
    value_cols = [c for c in agged.columns if c != "window" and c not in group_cols]
    return agged.select(
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        *group_cols,
        *value_cols,
    )


def session_windowed_agg(
    df: DataFrame,
    time_col: str,
    gap: str,
    aggs: Sequence,
    group_cols: Sequence[str],
    watermark: str = "10 minutes",
) -> DataFrame:
    """Session windows (gap-based) — works in batch and streaming."""
    wm = df.withWatermark(time_col, watermark)
    agged = wm.groupBy(
        F.session_window(F.col(time_col), gap).alias("window"),
        *[F.col(c) for c in group_cols],
    ).agg(*aggs)
    return _flatten_window(agged, group_cols)


def dedup_within_watermark(
    df: DataFrame, keys: Sequence[str], time_col: str, watermark: str
) -> DataFrame:
    """Cross-batch stateful dedup bounded by a watermark (C5 extension —
    the reference only compacts within a batch). Batch DataFrames fall back
    to plain dropDuplicates (watermark state is a streaming concept)."""
    if not df.isStreaming:
        return df.dropDuplicates(list(keys))
    return df.withWatermark(time_col, watermark).dropDuplicatesWithinWatermark(
        list(keys)
    )


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    max_delay: str = "10 minutes",
    watermark: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream equi-join with a bounded time-range condition
    (impression⋈click shape). Watermarks on BOTH sides plus the event-time
    range are what let Spark evict join state — without them state grows
    unboundedly; with them each side buffers only `watermark + max_delay`
    of data per key partition. Outer variants emit unmatched rows once the
    watermark passes the range bound."""
    l = left.withWatermark(left_ts, watermark)
    r = right.withWatermark(right_ts, watermark)
    # disambiguate the time columns; keys stay join-merged
    r = r.withColumnRenamed(right_ts, f"_r_{right_ts}")
    cond = None
    for k in on:
        c = l[k] == r[k]
        cond = c if cond is None else cond & c
    rng = (F.col(f"_r_{right_ts}") >= F.col(left_ts)) & (
        F.col(f"_r_{right_ts}")
        <= F.col(left_ts) + F.expr(f"INTERVAL {max_delay}")
    )
    return l.join(r, cond & rng, how)


def run_available_now(writer, timeout_sec: float = 120.0):
    """Start a streaming query with availableNow semantics and block until
    it drains — the batch-like test/backfill trigger."""
    q = writer.trigger(availableNow=True).start()
    q.awaitTermination(timeout_sec)
    return q
