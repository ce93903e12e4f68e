"""Custom stateful streaming operators (applyInPandasWithState):
sessionization with event-time timeout, cross-batch first-seen dedup.

File-stream micro-batches (one file ≈ one batch) drive multi-batch state;
sessions/dedup state must survive across batches and close via watermark.
"""

import datetime as dt

from pyspark.sql import Row
from pyspark.sql import types as T

from deimos_spark.streaming import stateful, streams

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
    ]
)


def _ts(minute, second=0):
    return dt.datetime(2026, 1, 1, 10, minute, second)


def _write(spark, path, rows):
    spark.createDataFrame(
        [Row(user_id=u, ts=t) for u, t in rows], EVENTS_SCHEMA
    ).coalesce(1).write.mode("append").parquet(path)


def test_sessionize_across_batches(spark, tmp_path):
    src = str(tmp_path / "in")
    # batch 1: user 1 has two events 1 min apart; user 2 one event
    _write(spark, src, [(1, _ts(0)), (1, _ts(1)), (2, _ts(2))])
    # batch 2: user 1 continues the same session (within gap); then a very
    # late watermark-advancing event far in the future closes everything
    _write(spark, src, [(1, _ts(3))])
    _write(spark, src, [(9, dt.datetime(2026, 1, 1, 23, 0))])

    sessions = stateful.sessionize(
        streams.file_stream_source(spark, src, EVENTS_SCHEMA),
        gap_seconds=300,
        watermark="10 minutes",
    )
    streams.run_available_now(
        streams.memory_sink(sessions, "sess", str(tmp_path / "ck"))
    )
    got = {
        r["user_id"]: (r["session_start"], r["session_end"], r["n_events"])
        for r in spark.sql("SELECT * FROM sess").collect()
    }
    # user 1: one session spanning both batches (state crossed the batch
    # boundary), 3 events; user 2: singleton session
    assert got[1] == (_ts(0), _ts(3), 3)
    assert got[2] == (_ts(2), _ts(2), 1)


def test_sessionize_gap_splits_sessions(spark, tmp_path):
    src = str(tmp_path / "in")
    _write(spark, src, [(1, _ts(0)), (1, _ts(1))])
    _write(spark, src, [(1, _ts(30))])  # > gap → new session
    _write(spark, src, [(9, dt.datetime(2026, 1, 1, 23, 0))])

    sessions = stateful.sessionize(
        streams.file_stream_source(spark, src, EVENTS_SCHEMA),
        gap_seconds=300,
        watermark="10 minutes",
    )
    streams.run_available_now(
        streams.memory_sink(sessions, "sess2", str(tmp_path / "ck"))
    )
    user1 = sorted(
        (r["session_start"], r["session_end"], r["n_events"])
        for r in spark.sql("SELECT * FROM sess2 WHERE user_id = 1").collect()
    )
    assert user1 == [(_ts(0), _ts(1), 2), (_ts(30), _ts(30), 1)]


def test_first_seen_dedup_across_batches(spark, tmp_path):
    src = str(tmp_path / "in")
    _write(spark, src, [(1, _ts(5)), (2, _ts(6))])
    _write(spark, src, [(1, _ts(7)), (3, _ts(8))])  # user 1 is a dup

    deduped = stateful.first_seen_dedup(
        streams.file_stream_source(spark, src, EVENTS_SCHEMA),
        key_cols=["user_id"],
        watermark="10 minutes",
    )
    streams.run_available_now(
        streams.memory_sink(deduped, "dd", str(tmp_path / "ck"))
    )
    got = {r["user_id"]: r["ts"] for r in spark.sql("SELECT * FROM dd").collect()}
    assert got == {1: _ts(5), 2: _ts(6), 3: _ts(8)}


def test_first_seen_dedup_state_evicted_after_timeout(spark, tmp_path):
    """Keyed state must be bounded: once the watermark passes a key's
    last-seen + horizon, its state is evicted — a much-later event for the
    same key is treated as first-seen again (and the state store does not
    grow forever)."""
    src = str(tmp_path / "in")
    _write(spark, src, [(1, _ts(5))])
    # watermark-advancing batches: push event time far past key 1's timeout
    # (the timeout invocation fires in a batch where the key has no data,
    # against the watermark computed from the PREVIOUS batch — so two
    # advancing batches are needed before the state is actually removed)
    _write(spark, src, [(9, dt.datetime(2026, 1, 1, 23, 0))])
    _write(spark, src, [(9, dt.datetime(2026, 1, 1, 23, 10))])
    # key 1 reappears hours later: its old state must be gone
    _write(spark, src, [(1, dt.datetime(2026, 1, 1, 23, 30))])

    deduped = stateful.first_seen_dedup(
        streams.file_stream_source(spark, src, EVENTS_SCHEMA),
        key_cols=["user_id"],
        watermark="10 minutes",
    )
    streams.run_available_now(
        streams.memory_sink(deduped, "dd_evict", str(tmp_path / "ck"))
    )
    user1 = sorted(
        r["ts"] for r in spark.sql("SELECT * FROM dd_evict WHERE user_id = 1").collect()
    )
    assert user1 == [_ts(5), dt.datetime(2026, 1, 1, 23, 30)]
