"""HTTP schema-registry client (Confluent REST API) + a local dev server.

The reference talks to a live Confluent Schema Registry over HTTP
(/root/reference/lib/deimos/schema_backends/avro_schema_registry.rb:10-17,
behavior only); `InMemorySchemaRegistry` implements the semantics but not
the transport. `HttpSchemaRegistry` closes that gap: the same interface
(register / check / latest / get_by_id / versions / writer_schemas /
compatibility), speaking the public Confluent REST API
(docs.confluent.io Schema Registry API reference):

    POST /subjects/{subject}/versions              register → {"id": N}
    GET  /subjects/{subject}/versions              version numbers
    GET  /subjects/{subject}/versions/{v|latest}   {"id","version","schema"}
    GET  /schemas/ids/{id}                         {"schema"}
    POST /compatibility/subjects/{s}/versions/latest?verbose=true
    GET/PUT /config/{subject}                      compatibility mode

Schemas are immutable by id, so the client caches id→schema lookups; the
`writer_schemas` closure used by decode kernels is materialized client-side
once per attach, never from executors (same discipline as the in-memory
registry).

`serve_registry` runs the in-memory registry behind the same REST surface
on localhost — a dev/test stand-in, and what the integration tests drive
the client against (real HTTP round-trips, no mocks).
"""

from __future__ import annotations

import json
import threading
import time
import urllib.error
import urllib.request
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from deimos_spark.schemas.avro import AvroSchema, parse_avsc
from deimos_spark.schemas.registry import (
    COMPAT_MODES,
    IncompatibleSchemaError,
    InMemorySchemaRegistry,
)

CONTENT_TYPE = "application/vnd.schemaregistry.v1+json"


class RegistryHttpError(RuntimeError):
    def __init__(self, status: int, body: dict):
        self.status = status
        self.body = body
        super().__init__(f"registry HTTP {status}: {body}")


class HttpSchemaRegistry:
    """Confluent-REST-API-backed registry with the InMemorySchemaRegistry
    interface — drop-in for RegistryAvroCodec and the producer/consumer
    topic configs."""

    def __init__(
        self,
        base_url: str,
        timeout: float = 10.0,
        max_retries: int = 3,
        backoff: float = 0.2,
    ):
        self.base_url = base_url.rstrip("/")
        self.timeout = timeout
        self.max_retries = max_retries
        self.backoff = backoff
        self._schema_cache: dict[int, AvroSchema] = {}
        # schemaType ("AVRO"/"PROTOBUF") per id, filled by the same
        # responses that fill _schema_cache — schema_type_of answers from
        # here instead of re-fetching /schemas/ids/{id} a second time
        self._schema_type_cache: dict[int, str] = {}

    # ------------------------------------------------------------- trans
    def _request(self, method: str, path: str, payload: dict | None = None) -> dict | list:
        """One REST call with retry + exponential backoff on TRANSIENT
        failures (connection errors, timeouts, 5xx). 4xx responses are
        semantic (not-found / incompatible / bad input) and surface
        immediately. All routes are idempotent or retry-safe: register
        re-POSTs the same schema, which Confluent's API dedupes by
        content."""
        req = urllib.request.Request(
            self.base_url + path,
            method=method,
            data=json.dumps(payload).encode() if payload is not None else None,
            headers={"Content-Type": CONTENT_TYPE, "Accept": CONTENT_TYPE},
        )
        last_err: Exception | None = None
        for attempt in range(self.max_retries + 1):
            if attempt:
                time.sleep(self.backoff * (2 ** (attempt - 1)))
            try:
                with urllib.request.urlopen(req, timeout=self.timeout) as resp:
                    return json.loads(resp.read() or b"{}")
            except urllib.error.HTTPError as e:
                try:
                    body = json.loads(e.read() or b"{}")
                except json.JSONDecodeError:
                    body = {}
                err = RegistryHttpError(e.code, body)
                if e.code < 500:
                    raise err from e
                last_err = err  # 5xx: transient, retry
            except (urllib.error.URLError, TimeoutError, OSError) as e:
                last_err = e  # connection refused / reset / timeout
        raise last_err  # type: ignore[misc]

    # ----------------------------------------------------------- registry
    @staticmethod
    def _schema_payload(schema, schema_type: str) -> dict:
        if schema_type == "AVRO":
            parsed = (
                schema
                if isinstance(schema, AvroSchema)
                else parse_avsc(schema)
            )
            return {"schema": json.dumps(parsed.raw)}
        if schema_type == "PROTOBUF":
            text = schema if isinstance(schema, str) else schema.source
            if not text:
                raise ValueError(
                    "PROTOBUF registration needs .proto source text"
                )
            return {"schema": text, "schemaType": "PROTOBUF"}
        raise ValueError(f"unknown schemaType {schema_type!r}")

    @staticmethod
    def _parse_response_schema(out: dict):
        if out.get("schemaType") == "PROTOBUF":
            from deimos_spark.schemas.protowire import parse_proto

            return parse_proto(out["schema"])
        return parse_avsc(out["schema"])

    def register(
        self,
        subject: str,
        schema: str | dict | AvroSchema,
        schema_type: str = "AVRO",
    ) -> int:
        try:
            out = self._request(
                "POST",
                f"/subjects/{subject}/versions",
                self._schema_payload(schema, schema_type),
            )
        except RegistryHttpError as e:
            if e.status == 409:
                raise IncompatibleSchemaError(
                    subject,
                    self.compatibility(subject),
                    [e.body.get("message", "incompatible")],
                ) from e
            raise
        return int(out["id"])

    def check(
        self,
        subject: str,
        schema: str | dict | AvroSchema,
        schema_type: str = "AVRO",
    ) -> list[str]:
        try:
            out = self._request(
                "POST",
                f"/compatibility/subjects/{subject}/versions/latest?verbose=true",
                self._schema_payload(schema, schema_type),
            )
        except RegistryHttpError as e:
            if e.status == 404:  # no versions yet → anything registers
                return []
            raise
        if out.get("is_compatible"):
            return []
        return list(out.get("messages", ["incompatible"]))

    # ------------------------------------------------------------- config
    def set_compatibility(self, subject: str, mode: str) -> None:
        if mode not in COMPAT_MODES:
            raise ValueError(f"unknown compatibility mode {mode!r}")
        self._request("PUT", f"/config/{subject}", {"compatibility": mode})

    def compatibility(self, subject: str) -> str:
        try:
            out = self._request("GET", f"/config/{subject}")
        except RegistryHttpError as e:
            if e.status == 404:
                out = self._request("GET", "/config")
            else:
                raise
        return out.get("compatibilityLevel", "BACKWARD")

    # ------------------------------------------------------------ lookups
    def get_by_id(self, schema_id: int):
        cached = self._schema_cache.get(schema_id)
        if cached is not None:
            return cached
        out = self._request("GET", f"/schemas/ids/{schema_id}")
        parsed = self._parse_response_schema(out)
        self._schema_cache[schema_id] = parsed
        self._schema_type_cache[schema_id] = out.get("schemaType", "AVRO")
        return parsed

    def latest(self, subject: str):
        out = self._request("GET", f"/subjects/{subject}/versions/latest")
        sid = int(out["id"])
        parsed = self._parse_response_schema(out)
        self._schema_cache[sid] = parsed
        self._schema_type_cache[sid] = out.get("schemaType", "AVRO")
        return sid, parsed

    def schema_type_of(self, schema_id: int) -> str:
        cached = self._schema_type_cache.get(schema_id)
        if cached is not None:
            return cached
        out = self._request("GET", f"/schemas/ids/{schema_id}")
        st = out.get("schemaType", "AVRO")
        self._schema_type_cache[schema_id] = st
        self._schema_cache.setdefault(
            schema_id, self._parse_response_schema(out)
        )
        return st

    def versions(self, subject: str) -> list[int]:
        """Schema ids in version order (the in-memory registry's
        convention; Confluent's per-subject version numbers are translated
        via one lookup each, cached thereafter)."""
        vnums = self._request("GET", f"/subjects/{subject}/versions")
        ids = []
        for v in vnums:
            out = self._request("GET", f"/subjects/{subject}/versions/{v}")
            sid = int(out["id"])
            self._schema_cache.setdefault(
                sid, self._parse_response_schema(out)
            )
            self._schema_type_cache.setdefault(
                sid, out.get("schemaType", "AVRO")
            )
            ids.append(sid)
        return ids

    def writer_schemas(self, subject: str) -> dict[int, dict]:
        out = {}
        for sid in self.versions(subject):
            s = self.get_by_id(sid)
            if not hasattr(s, "raw"):
                raise ValueError(
                    f"subject {subject!r} holds non-Avro schemas; "
                    "writer_schemas is Avro-only"
                )
            out[sid] = s.raw
        return out


# --------------------------------------------------------------- dev server


def serve_registry(
    registry: InMemorySchemaRegistry | None = None,
    host: str = "127.0.0.1",
    port: int = 0,
    chaos=None,
):
    """Serve an InMemorySchemaRegistry behind the Confluent REST surface.
    Returns (server, base_url); call server.shutdown() when done. Dev/test
    utility — single-process durability only.

    `chaos`: optional callable invoked before each request; return an int
    HTTP status to fail the request with it (e.g. 503), or None to serve
    normally — lets tests exercise the client's transient-failure retry."""
    reg = registry if registry is not None else InMemorySchemaRegistry()

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _chaos(self) -> bool:
            if chaos is not None:
                status = chaos()
                if status is not None:
                    self._send(status, {"error_code": status, "message": "injected"})
                    return True
            return False

        def _send(self, status: int, payload) -> None:
            body = json.dumps(payload).encode()
            self.send_response(status)
            self.send_header("Content-Type", CONTENT_TYPE)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _body(self) -> dict:
            n = int(self.headers.get("Content-Length") or 0)
            return json.loads(self.rfile.read(n) or b"{}")

        def _schema_fields(self, sid: int) -> dict:
            s = reg.get_by_id(sid)
            st = reg.schema_type_of(sid)
            if st == "PROTOBUF":
                return {"schema": s.source or "", "schemaType": "PROTOBUF"}
            return {"schema": json.dumps(s.raw)}

        def _subject_version(self, subject: str, v: str):
            ids = reg.versions(subject)
            if not ids:
                return None
            idx = len(ids) - 1 if v == "latest" else int(v) - 1
            if idx < 0 or idx >= len(ids):
                return None
            sid = ids[idx]
            return {
                "subject": subject,
                "version": idx + 1,
                "id": sid,
                **self._schema_fields(sid),
            }

        def do_GET(self):
            if self._chaos():
                return
            parts = self.path.strip("/").split("/")
            if parts[0] == "schemas" and parts[1] == "ids":
                try:
                    sid = int(parts[2])
                    reg.get_by_id(sid)
                except KeyError:
                    return self._send(404, {"error_code": 40403, "message": "not found"})
                return self._send(200, self._schema_fields(sid))
            if parts[0] == "subjects" and len(parts) == 3 and parts[2] == "versions":
                ids = reg.versions(parts[1])
                if not ids:
                    return self._send(404, {"error_code": 40401, "message": "subject not found"})
                return self._send(200, list(range(1, len(ids) + 1)))
            if parts[0] == "subjects" and len(parts) == 4 and parts[2] == "versions":
                out = self._subject_version(parts[1], parts[3])
                if out is None:
                    return self._send(404, {"error_code": 40402, "message": "version not found"})
                return self._send(200, out)
            if parts[0] == "config":
                if len(parts) == 1:
                    return self._send(200, {"compatibilityLevel": reg.default_compatibility})
                mode = reg._subject_modes.get(parts[1])
                if mode is None:
                    return self._send(404, {"error_code": 40408, "message": "no subject config"})
                return self._send(200, {"compatibilityLevel": mode})
            self._send(404, {"error_code": 404, "message": "unknown route"})

        def do_POST(self):
            if self._chaos():
                return
            parts = self.path.split("?")[0].strip("/").split("/")
            if parts[0] == "subjects" and len(parts) == 3 and parts[2] == "versions":
                body = self._body()
                try:
                    sid = reg.register(
                        parts[1],
                        body["schema"],
                        body.get("schemaType", "AVRO"),
                    )
                except IncompatibleSchemaError as e:
                    return self._send(409, {"error_code": 409, "message": str(e)})
                except (ValueError, KeyError) as e:
                    return self._send(422, {"error_code": 42201, "message": str(e)})
                return self._send(200, {"id": sid})
            if parts[0] == "compatibility" and parts[-1] in ("latest",) or (
                parts[0] == "compatibility" and len(parts) == 5
            ):
                subject = parts[2]
                if not reg.versions(subject):
                    return self._send(404, {"error_code": 40401, "message": "subject not found"})
                body = self._body()
                errs = reg.check(
                    subject, body["schema"], body.get("schemaType", "AVRO")
                )
                return self._send(
                    200, {"is_compatible": not errs, "messages": errs}
                )
            self._send(404, {"error_code": 404, "message": "unknown route"})

        def do_PUT(self):
            if self._chaos():
                return
            parts = self.path.strip("/").split("/")
            if parts[0] == "config" and len(parts) == 2:
                mode = self._body().get("compatibility")
                try:
                    reg.set_compatibility(parts[1], mode)
                except ValueError as e:
                    return self._send(422, {"error_code": 42203, "message": str(e)})
                return self._send(200, {"compatibility": mode})
            self._send(404, {"error_code": 404, "message": "unknown route"})

    server = ThreadingHTTPServer((host, port), Handler)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    return server, f"http://{host}:{server.server_address[1]}"
