"""Wire adapters (A34/A35 concrete backends — the reference ships
Datadog providers, lib/deimos/metrics/datadog.rb + tracing/datadog.rb;
here the public-protocol equivalents): DogStatsD datagrams pinned
byte-for-byte against a real loopback UDP socket, OTLP/HTTP JSON
pinned against a captured transport. Both must NEVER raise into the
pipeline on telemetry failure."""

import json
import socket

from deimos_spark.observability_wire import (
    DogStatsdSink,
    ExportingTracer,
    OTLPHTTPSpanExporter,
    format_dogstatsd,
)


def test_dogstatsd_wire_format():
    assert format_dogstatsd("batch.size", 3, "c") == b"batch.size:3|c"
    assert (
        format_dogstatsd("lag", 1.5, "g", {"topic": "t", "env": "dev"})
        == b"lag:1.5|g|#env:dev,topic:t"  # tags sorted
    )
    assert (
        format_dogstatsd("t", 12.0, "ms", None, namespace="deimos")
        == b"deimos.t:12|ms"  # integral float canonicalized
    )


def _udp_pair():
    rx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    rx.bind(("127.0.0.1", 0))
    rx.settimeout(2)
    return rx, rx.getsockname()[1]


def test_dogstatsd_sink_sends_and_keeps_registry():
    rx, port = _udp_pair()
    try:
        sink = DogStatsdSink(
            "127.0.0.1", port, namespace="deimos",
            constant_tags={"env": "test"},
        )
        sink.increment("messages", 2, topic="orders")
        sink.gauge("lag", 7.0, topic="orders")
        sink.time("batch", 0.2501, topic="orders")
        got = sorted(rx.recv(512) for _ in range(3))
        assert got == sorted(
            [
                b"deimos.messages:2|c|#env:test,topic:orders",
                b"deimos.lag:7|g|#env:test,topic:orders",
                b"deimos.batch:250.1|ms|#env:test,topic:orders",
            ]
        )
        # in-memory registry behavior preserved (drop-in for METRICS)
        assert sink.counters["messages{topic=orders}"] == 2
        assert sink.gauges["lag{topic=orders}"] == 7.0
    finally:
        rx.close()


def test_dogstatsd_sanitizes_metacharacters():
    # r12 regression (ADVICE): '|' splits datagram sections, ',' splits
    # tags, and a newline would let one poisoned tag value inject a
    # SECOND fabricated metric into the same packet. ':' splits
    # name-from-value (and tag-key-from-value), so it is defanged in
    # names and tag keys; tag VALUES may keep colons (DogStatsD parses
    # only the first colon per tag).
    assert (
        format_dogstatsd("a:b|c", 1, "c", {"k,1": "v|x\ny:z"})
        == b"a_b_c:1|c|#k_1:v_x_y:z"
    )
    # injected-metric attempt: newline in a value must not survive, and
    # no EXTRA '|' beyond the two legitimate separators (value|type|#tags)
    out = format_dogstatsd("m", 1, "c", {"t": "0|c\nevil:999|c"})
    assert out == b"m:1|c|#t:0_c_evil:999_c"


def test_dogstatsd_str_raising_tag_never_raises():
    class Cursed:
        def __str__(self):
            raise RuntimeError("no repr for you")

        def __lt__(self, other):  # sortable so sorted(tags) passes
            return True

    rx, port = _udp_pair()
    try:
        sink = DogStatsdSink("127.0.0.1", port)
        sink.increment("x", tag=Cursed())  # must not raise
        assert sink.dropped == 1
    finally:
        rx.close()


def test_dogstatsd_send_failure_never_raises():
    class Boom:
        def sendto(self, *a):
            raise OSError("network down")

    sink = DogStatsdSink(sock=Boom())
    sink.increment("x")  # must not raise
    sink.gauge("y", 1.0)
    assert sink.dropped == 2
    assert sink.counters["x"] == 1  # registry still updated


def test_otlp_payload_shape_and_status():
    calls = []

    def transport(url, body, headers):
        calls.append((url, json.loads(body), headers))
        return 200

    exp = OTLPHTTPSpanExporter(
        "http://collector:4318", service_name="svc", transport=transport
    )
    tracer = ExportingTracer(exp, batch_size=10)
    with tracer.span("deimos.consume", resource="orders", topic="orders"):
        pass
    try:
        with tracer.span("deimos.produce"):
            raise ValueError("kaboom")
    except ValueError:
        pass
    assert tracer.flush() is True
    url, payload, headers = calls[0]
    assert url == "http://collector:4318/v1/traces"
    assert headers["Content-Type"] == "application/json"
    scope = payload["resourceSpans"][0]["scopeSpans"][0]
    spans = scope["spans"]
    assert [s["name"] for s in spans] == ["deimos.consume", "deimos.produce"]
    ok, bad = spans
    assert len(ok["traceId"]) == 32 and len(ok["spanId"]) == 16
    assert int(ok["endTimeUnixNano"]) >= int(ok["startTimeUnixNano"])
    assert {"key": "topic", "value": {"stringValue": "orders"}} in ok[
        "attributes"
    ]
    assert {
        "key": "resource.name", "value": {"stringValue": "orders"}
    } in ok["attributes"]
    assert bad["status"]["code"] == "STATUS_CODE_ERROR"
    assert "kaboom" in bad["status"]["message"]
    res_attrs = payload["resourceSpans"][0]["resource"]["attributes"]
    assert {"key": "service.name", "value": {"stringValue": "svc"}} in res_attrs


def test_otlp_export_failure_counts_dropped_never_raises():
    def bad_transport(url, body, headers):
        raise ConnectionError("collector down")

    exp = OTLPHTTPSpanExporter(transport=bad_transport)
    tracer = ExportingTracer(exp, batch_size=1)  # flush on every finish
    with tracer.span("a"):
        pass
    assert exp.dropped == 1
    exp2 = OTLPHTTPSpanExporter(transport=lambda *a: 503)
    assert exp2.export(tracer.finished) is False
    assert exp2.dropped == 1


def test_exporting_tracer_batches():
    sent = []
    exp = OTLPHTTPSpanExporter(
        transport=lambda u, b, h: (sent.append(json.loads(b)), 200)[1]
    )
    tracer = ExportingTracer(exp, batch_size=2)
    for i in range(5):
        with tracer.span(f"s{i}"):
            pass
    assert len(sent) == 2  # two full batches auto-flushed
    tracer.flush()
    assert len(sent) == 3
    names = [
        s["name"]
        for p in sent
        for s in p["resourceSpans"][0]["scopeSpans"][0]["spans"]
    ]
    assert names == ["s0", "s1", "s2", "s3", "s4"]
