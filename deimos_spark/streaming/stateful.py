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
