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


STATEFUL_EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("state", T.StringType()),
    ]
)


def _write_st(spark, path, rows):
    spark.createDataFrame(
        [Row(user_id=u, ts=t, state=s) for u, t, s in rows],
        STATEFUL_EVENTS_SCHEMA,
    ).coalesce(1).write.mode("append").parquet(path)


def test_state_history_across_batches(spark, tmp_path):
    """x14's streaming twin: a run OPEN at a batch boundary must close
    with the change arriving in a LATER batch; the open (current) run
    is never emitted — it lives in the state store."""
    src = str(tmp_path / "in")
    # batch 1: u1 enters 'a' (2 events); u2 enters 'x'
    _write_st(spark, src, [(1, _ts(0), "a"), (1, _ts(1), "a"),
                           (2, _ts(0), "x")])
    # batch 2: u1 flips to 'b' → closes the 'a' run at the flip ts
    _write_st(spark, src, [(1, _ts(5), "b")])
    # batch 3: u1 flips back to 'a' → closes 'b' (re-appearing state =
    # NEW run, the SCD2 rule)
    _write_st(spark, src, [(1, _ts(7), "a")])

    hist = stateful.state_history(
        streams.file_stream_source(spark, src, STATEFUL_EVENTS_SCHEMA)
    )
    streams.run_available_now(
        streams.memory_sink(hist, "scd2", str(tmp_path / "ck"))
    )
    got = sorted(
        (r["user_id"], r["state"], r["valid_from"], r["valid_to"],
         r["n_events"])
        for r in spark.sql("SELECT * FROM scd2").collect()
    )
    assert got == [
        (1, "a", _ts(0), _ts(5), 2),
        (1, "b", _ts(5), _ts(7), 1),
    ]
    # u2 and u1's final 'a' run are open — correctly absent


def test_state_history_matches_batch_operator(spark, tmp_path):
    """Twin parity: closed streaming intervals == the batch operator's
    non-current rows on the same ordered input."""
    from deimos_spark.operators.timeseries import state_history as batch_sh

    rows = [
        (1, _ts(0), "a"), (1, _ts(2), "b"), (1, _ts(4), "b"),
        (1, _ts(6), "a"), (2, _ts(1), "x"), (2, _ts(3), "y"),
    ]
    src = str(tmp_path / "in")
    for r in rows:  # one event per micro-batch: maximal state crossing
        _write_st(spark, src, [r])
    hist = stateful.state_history(
        streams.file_stream_source(spark, src, STATEFUL_EVENTS_SCHEMA)
    )
    streams.run_available_now(
        streams.memory_sink(hist, "scd2p", str(tmp_path / "ck"))
    )
    stream_got = sorted(
        (r["user_id"], r["state"], r["valid_from"], r["valid_to"],
         r["n_events"])
        for r in spark.sql("SELECT * FROM scd2p").collect()
    )
    bdf = spark.createDataFrame(
        [Row(user_id=u, ts=t, state=s) for u, t, s in rows],
        STATEFUL_EVENTS_SCHEMA,
    )
    batch_got = sorted(
        (r["user_id"], r["state"], r["valid_from"], r["valid_to"],
         r["n_events"])
        for r in batch_sh(bdf, "user_id", "ts", "state").collect()
        if not r["is_current"]
    )
    assert stream_got == batch_got


def test_state_history_microsecond_precision(spark, tmp_path):
    """Interval boundaries keep full microsecond precision — two events
    500 µs apart with different states must yield a non-degenerate
    closed interval with the exact event times."""
    t0 = _ts(0)
    t1 = t0 + dt.timedelta(microseconds=500)
    src = str(tmp_path / "in")
    _write_st(spark, src, [(1, t0, "a"), (1, t1, "b")])
    hist = stateful.state_history(
        streams.file_stream_source(spark, src, STATEFUL_EVENTS_SCHEMA)
    )
    streams.run_available_now(
        streams.memory_sink(hist, "scd2us", str(tmp_path / "ck"))
    )
    rows = spark.sql("SELECT * FROM scd2us").collect()
    assert [(r["state"], r["valid_from"], r["valid_to"]) for r in rows] == [
        ("a", t0, t1)
    ]


def test_state_history_generic_key_and_names(spark, tmp_path):
    """Output schema derives from the input: a STRING key under a
    different column name flows through with its name and type."""
    schema = T.StructType(
        [
            T.StructField("k", T.StringType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("st", T.StringType()),
        ]
    )
    src = str(tmp_path / "in")
    spark.createDataFrame(
        [Row(k="alpha", ts=_ts(0), st="x"), Row(k="alpha", ts=_ts(1), st="y")],
        schema,
    ).coalesce(1).write.mode("append").parquet(src)
    hist = stateful.state_history(
        streams.file_stream_source(spark, src, schema),
        user_col="k", state_col="st",
    )
    streams.run_available_now(
        streams.memory_sink(hist, "scd2g", str(tmp_path / "ck"))
    )
    rows = spark.sql("SELECT * FROM scd2g").collect()
    assert [(r["k"], r["st"], r["n_events"]) for r in rows] == [
        ("alpha", "x", 1)
    ]


def test_state_history_random_batch_boundaries(spark, tmp_path):
    """VERDICT r12 #7, property form: the SAME ordered event sequence
    segmented into micro-batches at RANDOM boundaries must emit
    IDENTICAL closed history — batch boundaries are an infrastructure
    accident (trigger timing, file arrival), never semantics. Seeded
    segmentations plus the two extremes (one-event-per-batch, one
    giant batch), all checked against the batch operator's answer."""
    import random

    from deimos_spark.operators.timeseries import state_history as batch_sh

    rng = random.Random(20260816)
    events = []
    minute = 0
    for i in range(36):
        minute += 1
        u = rng.choice([1, 2, 3])
        s = rng.choice(["a", "b", "c", None])
        events.append((u, _ts(minute // 6, (minute % 6) * 10), s))

    bdf = spark.createDataFrame(
        [Row(user_id=u, ts=t, state=s) for u, t, s in events],
        STATEFUL_EVENTS_SCHEMA,
    )
    key = lambda t: (t[0], t[2])  # (user, valid_from): unique per run
    expected = sorted(
        (
            (r["user_id"], r["state"], r["valid_from"], r["valid_to"],
             r["n_events"])
            for r in batch_sh(bdf, "user_id", "ts", "state").collect()
            if not r["is_current"]
        ),
        key=key,
    )
    assert expected  # a vacuous property proves nothing

    def segmentations():
        yield [[e] for e in events]          # maximal state crossing
        yield [events]                        # no crossing at all
        for trial in range(3):               # random boundaries
            cuts = sorted(
                rng.sample(range(1, len(events)), rng.randint(3, 9))
            )
            yield [
                events[a:b]
                for a, b in zip([0] + cuts, cuts + [len(events)])
            ]

    for i, seg in enumerate(segmentations()):
        src = str(tmp_path / f"in_{i}")
        for chunk in seg:
            _write_st(spark, src, chunk)
        hist = stateful.state_history(
            streams.file_stream_source(
                spark, src, STATEFUL_EVENTS_SCHEMA
            )
        )
        streams.run_available_now(
            streams.memory_sink(hist, f"scd2rb{i}", str(tmp_path / f"ck{i}"))
        )
        got = sorted(
            (
                (r["user_id"], r["state"], r["valid_from"], r["valid_to"],
                 r["n_events"])
                for r in spark.sql(f"SELECT * FROM scd2rb{i}").collect()
            ),
            key=key,
        )
        assert got == expected, f"segmentation {i} changed the history"
