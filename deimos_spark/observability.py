"""Observability: metrics, payload logging, error policy / DLQ routing.

Reference parity (behavior only):
- A34 metrics: publish counts, consume lag, outbox pending/lag gauges
  (ext/producer_metrics_listener.rb, outbox_producer.rb send_pending_metrics)
  → a MetricsRegistry fed by a StreamingQueryListener and direct calls.
- A36 payload logging modes: full payloads / keys only / counts / headers
  (lib/deimos/logging.rb).
- A40/A22 error policy: fatal-error classifier + dead-letter routing for
  invalid records (consumer.rb fatal_error?, batch_record_list rejections).
- A30 retry: bounded retry with jittered sleep for transient sink errors
  (utils/deadlock_retry.rb — 2 retries, randomized backoff).
"""

from __future__ import annotations

import logging
import random
import time
from collections import defaultdict
from contextlib import contextmanager
from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

logger = logging.getLogger("deimos_spark")


# ------------------------------------------------------------------ metrics

class MetricsRegistry:
    """Counters + gauges + timers; provider-pluggable like the reference's
    metrics backends (mock/datadog...) — here: in-memory + log lines."""

    def __init__(self):
        self.counters: dict[str, int] = defaultdict(int)
        self.gauges: dict[str, float] = {}
        self.timers: dict[str, list[float]] = defaultdict(list)

    def increment(self, name: str, by: int = 1, **tags) -> None:
        self.counters[_k(name, tags)] += by

    def gauge(self, name: str, value: float, **tags) -> None:
        self.gauges[_k(name, tags)] = value

    def time(self, name: str, seconds: float, **tags) -> None:
        self.timers[_k(name, tags)].append(seconds)


def _k(name: str, tags: dict) -> str:
    if not tags:
        return name
    return name + "{" + ",".join(f"{k}={v}" for k, v in sorted(tags.items())) + "}"


METRICS = MetricsRegistry()


def make_query_listener(registry: MetricsRegistry = METRICS):
    """StreamingQueryListener → registry bridge: rows/sec, batch duration,
    input backlog — the consume-lag analogue."""
    from pyspark.sql.streaming import StreamingQueryListener

    class _Listener(StreamingQueryListener):
        def onQueryStarted(self, event):
            registry.increment("stream.started")

        def onQueryProgress(self, event):
            p = event.progress
            registry.gauge("stream.input_rows_per_sec", p.inputRowsPerSecond or 0.0)
            registry.gauge("stream.processed_rows_per_sec", p.processedRowsPerSecond or 0.0)
            registry.increment("stream.batches")
            registry.increment("stream.rows", p.numInputRows)

        def onQueryTerminated(self, event):
            registry.increment("stream.terminated")

        def onQueryIdle(self, event):
            pass

    return _Listener()


# ----------------------------------------------------------- payload logging

def log_batch(
    df: DataFrame,
    mode: str = "counts",
    key_cols: tuple[str, ...] = (),
    log: Callable[[str], None] = logger.info,
    sample: int = 20,
) -> None:
    """The reference's 4 payload-log modes: 'payloads' (full rows), 'keys'
    (key columns only), 'counts' (row count), 'headers' (schema)."""
    if mode == "counts":
        log(f"batch rows={df.count()}")
    elif mode == "keys":
        rows = df.select(*key_cols).limit(sample).collect()
        log(f"batch keys={[tuple(r) for r in rows]}")
    elif mode == "payloads":
        rows = df.limit(sample).collect()
        log(f"batch payloads={[r.asDict() for r in rows]}")
    elif mode == "headers":
        log(f"batch schema={df.schema.simpleString()}")
    else:
        raise ValueError(f"unknown log mode {mode!r}")


# -------------------------------------------------------------- error policy

@dataclass
class ErrorPolicy:
    """Swallow-vs-reraise with a fatal classifier (reference: consumer.rb
    fatal_error?, config reraise_errors)."""

    reraise: bool = False
    fatal: Callable[[Exception], bool] = lambda e: False
    on_error: Callable[[Exception], None] = lambda e: None

    def handle(self, e: Exception) -> None:
        self.on_error(e)
        if self.reraise or self.fatal(e):
            raise e
        logger.warning("swallowed consumer error: %s", e)


def route_invalid(
    df: DataFrame,
    valid_predicate,
    dlq_path: str | None = None,
) -> DataFrame:
    """Partition a batch into valid rows (returned) and invalid rows
    (appended to a dead-letter parquet table when dlq_path given) —
    the reference's should_consume?/invalid-record instrumentation."""
    invalid = df.filter(~F.coalesce(valid_predicate, F.lit(False)))
    if dlq_path is not None:
        invalid.withColumn("_dlq_at", F.current_timestamp()).write.mode(
            "append"
        ).parquet(dlq_path)
    return df.filter(F.coalesce(valid_predicate, F.lit(False)))


# ------------------------------------------------------------------ tracing

class Span:
    """One trace span: name, resource, wall-clock bounds, tags, error.
    (Reference contract: tracing/provider.rb start/finish/set_error/
    set_tag/get_tag — behavior parity, A35.)"""

    __slots__ = ("name", "resource", "started_at", "ended_at", "tags", "error")

    def __init__(self, name: str, resource: str | None = None, **tags):
        self.name = name
        self.resource = resource
        self.started_at = time.time()
        self.ended_at: float | None = None
        self.tags: dict = dict(tags)
        self.error: BaseException | None = None

    def set_tag(self, tag: str, value) -> None:
        self.tags[tag] = value

    def get_tag(self, tag: str):
        return self.tags.get(tag)

    @property
    def duration_s(self) -> float | None:
        return None if self.ended_at is None else self.ended_at - self.started_at


class MockTracer:
    """In-memory tracing provider — the reference ships exactly this
    shape as its default (tracing/mock.rb; the Datadog adapter is the
    same 6-method contract over a real client, tracing/datadog.rb).
    Spans nest via a stack, so `active_span` inside a consume batch is
    the batch's span (batch_consumption.rb:39 tags 'topic' on it and
    deadlock retry reads it back, :242). Driver-side only by design:
    spans wrap CONTROL operations (a consume batch, a poll cycle, a
    relay drain) — per-row spans would be a scale anti-pattern."""

    def __init__(self):
        self.finished: list[Span] = []
        self._stack: list[Span] = []

    # -- provider contract (reference tracing/provider.rb)
    def start(self, span_name: str, resource: str | None = None, **tags) -> Span:
        span = Span(span_name, resource, **tags)
        self._stack.append(span)
        return span

    def finish(self, span: Span) -> None:
        span.ended_at = time.time()
        if span in self._stack:
            self._stack.remove(span)
        self.finished.append(span)

    def set_error(self, span: Span, exc: BaseException) -> None:
        span.error = exc

    def active_span(self) -> Span | None:
        return self._stack[-1] if self._stack else None

    def set_tag(self, tag: str, value, span: Span | None = None) -> None:
        target = span or self.active_span()
        if target is not None:
            target.set_tag(tag, value)

    def get_tag(self, tag: str):
        span = self.active_span()
        return None if span is None else span.get_tag(tag)

    # -- ergonomic wrapper for the reference's _with_span shape
    @contextmanager
    def span(self, name: str, resource: str | None = None, **tags):
        s = self.start(name, resource, **tags)
        try:
            yield s
        except BaseException as e:
            self.set_error(s, e)
            raise
        finally:
            self.finish(s)


# -------------------------------------------------------------------- retry

def with_retry(
    fn: Callable[[], None],
    retries: int = 2,
    is_retryable: Callable[[Exception], bool] = lambda e: True,
    base_sleep: float = 0.5,
    max_jitter: float = 5.0,
    sleep: Callable[[float], None] = time.sleep,
) -> None:
    """Bounded retry with jittered backoff (reference: deadlock_retry.rb —
    2 retries, 0.5–5.5s randomized sleep)."""
    attempt = 0
    while True:
        try:
            fn()
            return
        except Exception as e:
            if attempt >= retries or not is_retryable(e):
                raise
            attempt += 1
            sleep(base_sleep + random.random() * max_jitter)
