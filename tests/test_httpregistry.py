"""HTTP schema-registry client against the in-process dev server: real
REST round-trips (no mocks), plus transient-failure retry/backoff
(round-2 ADVICE hardening: _request previously raised on first failure).
"""

import itertools

import pytest

from deimos_spark.schemas.avro import parse_avsc
from deimos_spark.schemas.httpregistry import (
    HttpSchemaRegistry,
    RegistryHttpError,
    serve_registry,
)
from deimos_spark.schemas.registry import InMemorySchemaRegistry

V1 = parse_avsc(
    {
        "type": "record",
        "name": "Acct",
        "fields": [{"name": "acct_id", "type": "string"}],
    }
)

V2 = parse_avsc(
    {
        "type": "record",
        "name": "Acct",
        "fields": [
            {"name": "acct_id", "type": "string"},
            {"name": "tier", "type": "string", "default": "basic"},
        ],
    }
)

INCOMPAT = parse_avsc(
    {
        "type": "record",
        "name": "Acct",
        "fields": [
            {"name": "acct_id", "type": "string"},
            {"name": "required_new", "type": "string"},  # no default
        ],
    }
)


@pytest.fixture
def server():
    srv, url = serve_registry(InMemorySchemaRegistry())
    yield url
    srv.shutdown()


def test_register_latest_get_by_id_versions(server):
    client = HttpSchemaRegistry(server)
    id1 = client.register("acct-value", V1)
    id2 = client.register("acct-value", V2)
    assert id1 != id2
    sid, latest = client.latest("acct-value")
    assert sid == id2
    assert latest.raw == V2.raw
    assert client.get_by_id(id1).raw == V1.raw
    assert client.versions("acct-value") == [id1, id2]
    assert set(client.writer_schemas("acct-value")) == {id1, id2}


PROTO_SRC = """
syntax = "proto3";
message Acct {
  string acct_id = 1;
  int64 balance = 2;
}
"""


def test_protobuf_subject_roundtrip(server):
    """PROTOBUF subjects ship the .proto text with schemaType over the
    REST surface; get_by_id/latest parse back to a ProtoSchema; an
    incompatible proto change 409s; writer_schemas refuses (Avro-only,
    proto decode needs no writer map)."""
    from deimos_spark.schemas.protowire import ProtoSchema
    from deimos_spark.schemas.registry import IncompatibleSchemaError

    client = HttpSchemaRegistry(server)
    pid = client.register("p-value", PROTO_SRC, schema_type="PROTOBUF")
    assert client.schema_type_of(pid) == "PROTOBUF"
    sid, latest = client.latest("p-value")
    assert sid == pid and isinstance(latest, ProtoSchema)
    assert latest.root == "Acct"
    assert latest.struct.fieldNames() == ["acct_id", "balance"]
    assert client.versions("p-value") == [pid]
    # byte-identical re-registration dedups to the same id
    assert client.register("p-value", PROTO_SRC, schema_type="PROTOBUF") == pid
    bad = PROTO_SRC.replace("int64 balance", "string balance")
    with pytest.raises(IncompatibleSchemaError):
        client.register("p-value", bad, schema_type="PROTOBUF")
    assert client.check("p-value", bad, schema_type="PROTOBUF")
    with pytest.raises(ValueError, match="Avro-only"):
        client.writer_schemas("p-value")


def test_incompatible_register_raises(server):
    from deimos_spark.schemas.registry import IncompatibleSchemaError

    client = HttpSchemaRegistry(server)
    client.register("acct-value", V1)
    assert client.check("acct-value", V2) == []
    assert client.check("acct-value", INCOMPAT) != []
    with pytest.raises(IncompatibleSchemaError):
        client.register("acct-value", INCOMPAT)


def test_compatibility_config_roundtrip(server):
    client = HttpSchemaRegistry(server)
    assert client.compatibility("nope") == "BACKWARD"  # global default
    client.set_compatibility("acct-value", "FULL")
    assert client.compatibility("acct-value") == "FULL"


# ------------------------------------------------------ retry behavior

def test_retries_through_transient_503(server):
    """First two responses are injected 503s; the client retries with
    backoff and the third attempt succeeds."""
    reg = InMemorySchemaRegistry()
    fails = itertools.count()
    srv, url = serve_registry(
        reg, chaos=lambda: 503 if next(fails) < 2 else None
    )
    try:
        client = HttpSchemaRegistry(url, max_retries=3, backoff=0.01)
        sid = client.register("s-value", V1)
        assert client.get_by_id(sid).raw == V1.raw
    finally:
        srv.shutdown()


def test_retry_exhaustion_raises_last_5xx(server):
    srv, url = serve_registry(InMemorySchemaRegistry(), chaos=lambda: 503)
    try:
        client = HttpSchemaRegistry(url, max_retries=2, backoff=0.01)
        with pytest.raises(RegistryHttpError) as ei:
            client.register("s-value", V1)
        assert ei.value.status == 503
    finally:
        srv.shutdown()


def test_4xx_is_not_retried(server):
    """404 (semantic not-found) must surface immediately, not retry."""
    calls = []

    def chaos():
        calls.append(1)
        return None

    srv, url = serve_registry(InMemorySchemaRegistry(), chaos=chaos)
    try:
        client = HttpSchemaRegistry(url, max_retries=3, backoff=0.01)
        with pytest.raises(RegistryHttpError) as ei:
            client.latest("missing-subject")
        assert ei.value.status == 404
        assert len(calls) == 1  # exactly one attempt
    finally:
        srv.shutdown()


def test_connection_refused_retries_then_raises():
    import urllib.error

    client = HttpSchemaRegistry(
        "http://127.0.0.1:1", timeout=0.2, max_retries=1, backoff=0.01
    )
    with pytest.raises((urllib.error.URLError, OSError)):
        client.latest("s-value")
