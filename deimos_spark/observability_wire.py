"""Wire adapters for the metrics/tracing provider contracts — the
concrete-backend analogue of the reference's Datadog metrics/tracing
providers (lib/deimos/metrics/datadog.rb, lib/deimos/tracing/
datadog.rb; behavior parity only). Both speak PUBLIC protocols over
the stdlib, so they work in any environment without extra packages:

- `DogStatsdSink`: the DogStatsD datagram format over UDP
  (`name:value|TYPE|#tag:val,...` — counters `c`, gauges `g`, timers
  `ms`), the transport the reference's Datadog metrics provider uses
  under its client library.
- `OTLPHTTPSpanExporter`: OTLP/HTTP + JSON (`/v1/traces`,
  opentelemetry-proto JSON mapping: hex trace/span ids, stringified
  unix-nano timestamps) — the vendor-neutral successor to the
  reference's tracer adapters.

Design rules, both adapters:
- NEVER raise into the pipeline: telemetry failure must not take down
  a consume batch (the reference's providers swallow client errors
  the same way). Failures count on `dropped` so they stay observable.
- Driver-side only: these attach to MetricsRegistry / the tracer,
  which wrap CONTROL operations (a batch, a poll cycle) — per-row
  telemetry would be a scale anti-pattern.
- Transports are injectable (a socket-like / a callable) so tests pin
  the exact wire bytes with no network.
"""

from __future__ import annotations

import json
import secrets
import socket
from typing import Callable

from deimos_spark.observability import MetricsRegistry, MockTracer, Span

__all__ = [
    "DogStatsdSink",
    "OTLPHTTPSpanExporter",
    "ExportingTracer",
    "format_dogstatsd",
]


def _dg_clean(s: str, *, is_value: bool = False) -> str:
    """Defang datagram metacharacters. '|' splits sections, ',' splits
    tags, '\\n' would let one poisoned tag value inject a SECOND
    fabricated metric into the same UDP packet; ':' additionally
    splits name-from-value and tag-key-from-tag-value (tag VALUES may
    keep colons — DogStatsD parses only the first one per tag)."""
    s = (
        str(s)
        .replace("\n", "_")
        .replace("\r", "_")
        .replace("|", "_")
        .replace(",", "_")
    )
    if not is_value:
        s = s.replace(":", "_")
    return s


def format_dogstatsd(
    name: str,
    value,
    mtype: str,
    tags: dict | None = None,
    namespace: str | None = None,
) -> bytes:
    """One DogStatsD datagram. Public format:
    `[namespace.]name:value|type[|#tag1:v1,tag2:v2]` — tags sorted for
    deterministic wire bytes (test- and dedup-friendly; the protocol
    does not care about order). Names / tag keys / tag values are
    sanitized (`_dg_clean`) so hostile content cannot corrupt the
    datagram or smuggle a second metric."""
    full = f"{namespace}.{name}" if namespace else name
    full = _dg_clean(full)
    if isinstance(value, float) and value == int(value):
        value = int(value)  # 1.0 -> "1", the compact canonical form
    out = f"{full}:{value}|{mtype}"
    if tags:
        out += "|#" + ",".join(
            f"{_dg_clean(k)}:{_dg_clean(v, is_value=True)}"
            for k, v in sorted(tags.items())
        )
    return out.encode("utf-8")


class DogStatsdSink(MetricsRegistry):
    """MetricsRegistry drop-in that ALSO emits each update as a
    DogStatsD datagram. Keeps the in-memory registry behavior (tests
    and log-based inspection keep working) and fires UDP on top —
    fire-and-forget, one datagram per update, never raises.

    `sock` is injectable; the default is an unconnected UDP socket.
    `constant_tags` ride on every datagram (host/env/service — what
    the reference configures on its Datadog client once)."""

    def __init__(
        self,
        host: str = "127.0.0.1",
        port: int = 8125,
        namespace: str | None = None,
        constant_tags: dict | None = None,
        sock=None,
    ):
        super().__init__()
        self.addr = (host, port)
        self.namespace = namespace
        self.constant_tags = dict(constant_tags or {})
        self.sock = sock or socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        self.dropped = 0

    def _send(self, name, value, mtype, tags):
        merged = {**self.constant_tags, **tags}
        try:
            self.sock.sendto(
                format_dogstatsd(
                    name, value, mtype, merged, self.namespace
                ),
                self.addr,
            )
        except Exception:
            # broader than OSError: a str()-raising tag value must not
            # violate the never-raise-into-the-pipeline contract either
            self.dropped += 1  # observable, never fatal

    def _registry(self, fn, *args, **tags) -> bool:
        # the in-memory registry str()-formats tag values for its key;
        # a str()-raising value must not escape the sink's never-raise
        # contract either (it would have, via super().increment)
        try:
            fn(*args, **tags)
            return True
        except Exception:
            self.dropped += 1
            return False

    def increment(self, name: str, by: int = 1, **tags) -> None:
        if self._registry(super().increment, name, by, **tags):
            self._send(name, by, "c", tags)

    def gauge(self, name: str, value: float, **tags) -> None:
        if self._registry(super().gauge, name, value, **tags):
            self._send(name, value, "g", tags)

    def time(self, name: str, seconds: float, **tags) -> None:
        if self._registry(super().time, name, seconds, **tags):
            # DogStatsD timers are milliseconds
            self._send(name, round(seconds * 1000.0, 3), "ms", tags)


def _default_transport(url: str, body: bytes, headers: dict) -> int:
    import urllib.request

    req = urllib.request.Request(
        url, data=body, headers=headers, method="POST"
    )
    with urllib.request.urlopen(req, timeout=5) as resp:
        return resp.status


class OTLPHTTPSpanExporter:
    """Finished `Span`s → one OTLP/HTTP JSON POST to `/v1/traces`.

    The JSON follows the proto3 JSON mapping of opentelemetry-proto:
    resourceSpans → scopeSpans → spans, ids as lowercase hex
    (16-byte traceId / 8-byte spanId), timestamps as STRINGIFIED unix
    nanos (fixed64 in JSON), attributes as {key, value:{stringValue}}.
    Error spans carry status {code: STATUS_CODE_ERROR, message}.

    All spans of one export() share a generated traceId (they come
    from one driver-side control flow); span ids are random. Returns
    True on 2xx, False otherwise (and counts `dropped`) — never
    raises into the pipeline."""

    def __init__(
        self,
        endpoint: str = "http://127.0.0.1:4318",
        service_name: str = "deimos_spark",
        transport: Callable[[str, bytes, dict], int] | None = None,
        extra_headers: dict | None = None,
    ):
        self.url = endpoint.rstrip("/") + "/v1/traces"
        self.service_name = service_name
        self.transport = transport or _default_transport
        self.extra_headers = dict(extra_headers or {})
        self.dropped = 0

    @staticmethod
    def _attr(key, value):
        if isinstance(value, bool):
            return {"key": key, "value": {"boolValue": value}}
        if isinstance(value, int):
            return {"key": key, "value": {"intValue": str(value)}}
        if isinstance(value, float):
            return {"key": key, "value": {"doubleValue": value}}
        return {"key": key, "value": {"stringValue": str(value)}}

    def payload(self, spans: list[Span], trace_id: str | None = None) -> dict:
        trace_id = trace_id or secrets.token_hex(16)
        out = []
        for s in spans:
            end = s.ended_at if s.ended_at is not None else s.started_at
            j = {
                "traceId": trace_id,
                "spanId": secrets.token_hex(8),
                "name": s.name,
                "kind": "SPAN_KIND_INTERNAL",
                "startTimeUnixNano": str(int(s.started_at * 1e9)),
                "endTimeUnixNano": str(int(end * 1e9)),
                "attributes": [
                    self._attr(k, v) for k, v in sorted(s.tags.items())
                ]
                + (
                    [self._attr("resource.name", s.resource)]
                    if s.resource
                    else []
                ),
            }
            if s.error is not None:
                j["status"] = {
                    "code": "STATUS_CODE_ERROR",
                    "message": f"{type(s.error).__name__}: {s.error}",
                }
            out.append(j)
        return {
            "resourceSpans": [
                {
                    "resource": {
                        "attributes": [
                            self._attr("service.name", self.service_name)
                        ]
                    },
                    "scopeSpans": [
                        {
                            "scope": {"name": "deimos_spark.observability"},
                            "spans": out,
                        }
                    ],
                }
            ]
        }

    def export(self, spans: list[Span]) -> bool:
        if not spans:
            return True
        body = json.dumps(self.payload(spans)).encode("utf-8")
        headers = {
            "Content-Type": "application/json",
            **self.extra_headers,
        }
        try:
            status = self.transport(self.url, body, headers)
        except Exception:
            self.dropped += len(spans)
            return False
        if not (200 <= int(status) < 300):
            self.dropped += len(spans)
            return False
        return True


class ExportingTracer(MockTracer):
    """MockTracer (the full 6-method provider contract) that flushes
    finished spans through an OTLPHTTPSpanExporter every
    `batch_size` finishes — the wire-backed provider the reference
    ships for Datadog, on the OTLP contract instead. `flush()` drains
    the remainder (call it from shutdown hooks)."""

    def __init__(self, exporter: OTLPHTTPSpanExporter, batch_size: int = 64):
        super().__init__()
        self.exporter = exporter
        self.batch_size = max(1, int(batch_size))
        self._pending: list[Span] = []

    def finish(self, span: Span) -> None:
        super().finish(span)
        self._pending.append(span)
        if len(self._pending) >= self.batch_size:
            self.flush()

    def flush(self) -> bool:
        pending, self._pending = self._pending, []
        return self.exporter.export(pending)
