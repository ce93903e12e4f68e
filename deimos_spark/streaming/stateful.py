"""Custom stateful streaming operators (applyInPandasWithState).

The reference has no cross-batch state at all — its compaction is per-batch
(SURVEY C5, batch_consumption.rb:42-46) — so these are engine extensions:
the operators a streaming training-data pipeline needs that Spark's
built-ins (window/session_window/dropDuplicatesWithinWatermark) can't
express directly.

Scale notes (100 TB / high-cardinality keys):
- State lives in the HDFS/RocksDB state store, partitioned by the group
  key — the same hash partitioning as any shuffle, so state size scales
  horizontally with executors.
- Every operator takes an event-time watermark + timeout so state is
  bounded: idle keys are evicted, not accumulated forever.
- The pandas kernels see one key-group per call with Arrow batching; no
  per-row Python overhead.
"""

from __future__ import annotations

from collections.abc import Iterable, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

def _duration_ms(spec: str) -> int:
    """Parse a Spark-style duration string ('1 hour', '30 seconds') to ms."""
    qty, unit = spec.strip().split()
    unit = unit.rstrip("s")
    factor = {
        "millisecond": 1,
        "second": 1000,
        "minute": 60_000,
        "hour": 3_600_000,
        "day": 86_400_000,
    }[unit]
    return int(qty) * factor


SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
    ]
)

_SESSION_STATE = T.StructType(
    [
        T.StructField("start_ms", T.LongType()),
        T.StructField("end_ms", T.LongType()),
        T.StructField("n", T.LongType()),
    ]
)


def sessionize(
    events: DataFrame,
    gap_seconds: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Per-user sessionization with an inactivity gap — the custom-stateful
    flagship: session state persists across micro-batches and a session is
    emitted only when the event-time watermark passes its gap timeout.

    Differs from the built-in `session_window` aggregation in that it is a
    template for arbitrary per-session state (counters here; replace the
    kernel body to carry feature vectors, HLL sketches, …).
    """
    gap_ms = gap_seconds * 1000

    def kernel(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        (uid,) = key
        if state.hasTimedOut:
            start_ms, end_ms, n = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [uid],
                    "session_start": [pd.Timestamp(start_ms, unit="ms")],
                    "session_end": [pd.Timestamp(end_ms, unit="ms")],
                    "n_events": [n],
                }
            )
            return
        out = []
        if state.exists:
            start_ms, end_ms, n = state.get
        else:
            start_ms, end_ms, n = None, None, 0
        ts_all = pd.concat([p[ts_col] for p in pdfs]).sort_values()
        for t in ts_all:
            t_ms = int(t.value // 1_000_000)
            if start_ms is None:
                start_ms, end_ms, n = t_ms, t_ms, 1
            elif t_ms - end_ms <= gap_ms:
                end_ms, n = max(end_ms, t_ms), n + 1
            else:
                out.append((start_ms, end_ms, n))
                start_ms, end_ms, n = t_ms, t_ms, 1
        state.update((start_ms, end_ms, n))
        state.setTimeoutTimestamp(end_ms + gap_ms)
        if out:
            yield pd.DataFrame(
                {
                    "user_id": [uid] * len(out),
                    "session_start": [pd.Timestamp(s, unit="ms") for s, _, _ in out],
                    "session_end": [pd.Timestamp(e, unit="ms") for _, e, _ in out],
                    "n_events": [c for _, _, c in out],
                }
            )

    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.col(user_col))
        .applyInPandasWithState(
            kernel,
            SESSION_SCHEMA,
            _SESSION_STATE,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )


def first_seen_dedup(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str = "ts",
    watermark: str = "1 hour",
    out_schema: T.StructType | None = None,
) -> DataFrame:
    """Cross-batch keep-FIRST-per-key dedup with explicit keyed state.

    dropDuplicatesWithinWatermark keeps an arbitrary row per key; this
    keeps the earliest-event-time row and is a template for richer
    first-touch state (attribution, earliest-crawl dedup). State = one
    timestamp per key, evicted by the watermark timeout.
    """
    fields = [df.schema[c] for c in key_cols] + [
        T.StructField(ts_col, T.TimestampType())
    ]
    out = out_schema or T.StructType(fields)
    state_schema = T.StructType([T.StructField("first_ms", T.LongType())])
    horizon_ms = _duration_ms(watermark)

    def kernel(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        ts_all = pd.concat([p[ts_col] for p in pdfs])
        if ts_all.empty:
            return
        t_min = int(ts_all.min().value // 1_000_000)
        t_max = int(ts_all.max().value // 1_000_000)
        if state.exists:
            (seen_ms,) = state.get
            if t_min >= seen_ms:
                state.update((seen_ms,))
                # keep state alive while the key is active, then let the
                # watermark evict it once it goes idle
                state.setTimeoutTimestamp(t_max + horizon_ms)
                return  # already emitted an earlier row for this key
            state.update((t_min,))
        else:
            state.update((t_min,))
        # bound keyed state: once event time passes max_seen + horizon the
        # key times out and its state is removed (any later duplicate would
        # be behind the watermark and dropped before reaching the kernel)
        state.setTimeoutTimestamp(t_max + horizon_ms)
        yield pd.DataFrame(
            {
                **{c: [k] for c, k in zip(key_cols, key)},
                ts_col: [pd.Timestamp(t_min, unit="ms")],
            }
        )

    return (
        df.withWatermark(ts_col, watermark)
        .groupBy(*[F.col(c) for c in key_cols])
        .applyInPandasWithState(
            kernel,
            out,
            state_schema,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )


def state_history(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    state_col: str = "state",
    order_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Streaming twin of operators/timeseries.state_history (x14): per
    key, maintain the CURRENT run (state value, valid_from, last_seen,
    n_events) across micro-batches and emit a CLOSED interval row the
    moment the key's state changes — `valid_to` = the new run's start,
    exactly the batch operator's lead() semantics. Open runs stay in
    the state store (they ARE the SCD2 "current" rows — one tuple per
    key, the same bound as the dimension itself), so NoTimeout is the
    honest retention policy; a changelog consumer materializes current
    rows by unioning the store's view with emitted history downstream.

    Ordering: rows are processed in event-time order WITHIN each batch
    (sorted on ts, then `order_cols` as a deterministic tiebreak for
    equal timestamps — same contract as the batch twin's order_cols);
    ACROSS batches correctness relies on per-key ordered
    delivery (SURVEY C3 — the consumer contract) or a watermarked
    source: an event older than the key's last_seen cannot rewrite
    already-emitted history and is folded into the current run with a
    monotonicity clamp, the same last-writer-wins rule the MERGE path
    applies. NULL state values are VALUES (consecutive NULLs merge) —
    matching the batch operator's null-safe change detection.

    Output schema derives from the INPUT (key and state fields keep
    their names and types; timestamps keep full microsecond precision
    end-to-end), so any key type the grouping supports works — the
    same genericity as the batch twin."""
    key_field = events.schema[user_col]
    state_field = events.schema[state_col]
    out_schema = T.StructType(
        [
            T.StructField(key_field.name, key_field.dataType),
            T.StructField(state_field.name, state_field.dataType),
            T.StructField("valid_from", T.TimestampType()),
            T.StructField("valid_to", T.TimestampType()),
            T.StructField("n_events", T.LongType()),
        ]
    )
    run_state = T.StructType(
        [
            T.StructField("state", state_field.dataType),
            T.StructField("from_us", T.LongType()),
            T.StructField("last_us", T.LongType()),
            T.StructField("n", T.LongType()),
        ]
    )

    def kernel(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        (uid,) = key
        cur = list(state.get) if state.exists else None
        # ts alone is not a total order: equal-timestamp events within a
        # batch would sort by pandas' (shuffle-dependent) input order and
        # make run boundaries retry-nondeterministic — order_cols is the
        # tiebreak, mirroring timeseries.state_history (ADVICE r12)
        rows = pd.concat(list(pdfs)).sort_values(
            [ts_col, *order_cols], kind="mergesort"
        )
        closed = []
        for t, sv in zip(rows[ts_col], rows[state_col]):
            t_us = int(t.value // 1_000)  # pandas ns → µs, Spark's unit
            sv = None if pd.isna(sv) else sv
            if cur is None:
                cur = [sv, t_us, t_us, 1]
            elif sv == cur[0]:
                cur[2] = max(cur[2], t_us)
                cur[3] += 1
            else:
                # change boundary: close the run at the new run's start;
                # a late cross-batch event (t < last_seen) clamps to the
                # run's end so emitted history stays monotone
                t_eff = max(t_us, cur[2])
                closed.append((cur[0], cur[1], t_eff, cur[3]))
                cur = [sv, t_eff, t_eff, 1]
        if cur is None:  # all-empty batches for this key: nothing to do
            return
        state.update(tuple(cur))
        if closed:
            yield pd.DataFrame(
                {
                    key_field.name: [uid] * len(closed),
                    state_field.name: [s for s, _, _, _ in closed],
                    "valid_from": [
                        pd.Timestamp(f, unit="us") for _, f, _, _ in closed
                    ],
                    "valid_to": [
                        pd.Timestamp(v, unit="us") for _, _, v, _ in closed
                    ],
                    "n_events": [n for _, _, _, n in closed],
                }
            )

    return (
        events.groupBy(F.col(user_col))
        .applyInPandasWithState(
            kernel,
            out_schema,
            run_state,
            "append",
            GroupStateTimeout.NoTimeout,
        )
    )
