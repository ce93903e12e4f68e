"""In-memory schema registry: subject/version management, id assignment,
compatibility-mode gating, and schema-id-dispatched decode.

This is the piece the reference delegates to the Confluent Schema Registry
(behavior per /root/reference/lib/deimos/schema_backends/avro_schema_registry.rb
and the public Confluent compatibility semantics): producers register a
subject's schema and get back a globally unique id that is embedded in the
wire frame (magic byte 0 + 4-byte big-endian id); consumers look the writer
schema up *by the id found in each message* and resolve it against their
reader schema. Registration is gated by the subject's compatibility mode.

Compatibility modes (public Confluent semantics, built on Avro schema
resolution — see schemas/compat.py):

    NONE                 no check
    BACKWARD             new schema can read data written by the previous one
    FORWARD              previous schema can read data written by the new one
    FULL                 both directions vs the previous version
    BACKWARD_TRANSITIVE  backward vs *all* prior versions
    FORWARD_TRANSITIVE   forward vs all prior versions
    FULL_TRANSITIVE      both vs all prior versions

The registry itself is a plain dict-backed object — on a real deployment
the same interface fronts an HTTP client; nothing in the engine depends on
where ids come from.
"""

from __future__ import annotations

import json

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from deimos_spark.schemas.avro import AvroSchema, parse_avsc
from deimos_spark.schemas.compat import can_read, compat_errors

COMPAT_MODES = {
    "NONE",
    "BACKWARD",
    "FORWARD",
    "FULL",
    "BACKWARD_TRANSITIVE",
    "FORWARD_TRANSITIVE",
    "FULL_TRANSITIVE",
}


class IncompatibleSchemaError(ValueError):
    def __init__(self, subject: str, mode: str, errors: list[str]):
        self.errors = errors
        super().__init__(
            f"schema for subject {subject!r} violates {mode} compatibility: "
            + "; ".join(errors)
        )


def _canonical(raw: dict) -> str:
    return json.dumps(raw, sort_keys=True, separators=(",", ":"))


class InMemorySchemaRegistry:
    """Subject → ordered versions; global id space shared across subjects
    (identical schemas deduplicate to one id, like the real registry)."""

    def __init__(self, default_compatibility: str = "BACKWARD"):
        if default_compatibility not in COMPAT_MODES:
            raise ValueError(f"unknown compatibility mode {default_compatibility!r}")
        self.default_compatibility = default_compatibility
        self._by_id: dict[int, object] = {}  # AvroSchema | ProtoSchema
        self._types: dict[int, str] = {}     # id → "AVRO" | "PROTOBUF"
        self._id_by_canonical: dict[str, int] = {}
        self._subjects: dict[str, list[int]] = {}
        self._subject_modes: dict[str, str] = {}
        self._next_id = 1

    # ------------------------------------------------------------- config
    def set_compatibility(self, subject: str, mode: str) -> None:
        if mode not in COMPAT_MODES:
            raise ValueError(f"unknown compatibility mode {mode!r}")
        self._subject_modes[subject] = mode

    def compatibility(self, subject: str) -> str:
        return self._subject_modes.get(subject, self.default_compatibility)

    # ----------------------------------------------------------- registry
    @staticmethod
    def _parse(schema, schema_type: str):
        if schema_type == "AVRO":
            return (
                schema
                if isinstance(schema, AvroSchema)
                else parse_avsc(schema)
            )
        if schema_type == "PROTOBUF":
            from deimos_spark.schemas.protowire import ProtoSchema, parse_proto

            return (
                schema
                if isinstance(schema, ProtoSchema)
                else parse_proto(schema)
            )
        raise ValueError(f"unknown schemaType {schema_type!r}")

    @staticmethod
    def _canonical_of(parsed, schema_type: str) -> str:
        if schema_type == "AVRO":
            return "A\x00" + _canonical(parsed.raw)
        # whitespace-normalized source: byte-identical registrations dedup,
        # formatting-only edits register a new version (Confluent parses
        # deeper; this is the honest subset). A hand-built ProtoSchema
        # without source text never dedups against a different object —
        # colliding two distinct schemas onto one id would be worse.
        if parsed.source:
            return "P\x00" + " ".join(parsed.source.split())
        return f"P\x00<object {id(parsed)}>"

    def register(
        self,
        subject: str,
        schema: str | dict | "AvroSchema",
        schema_type: str = "AVRO",
    ) -> int:
        """Register a schema version under `subject`, enforcing the
        subject's compatibility mode. Returns the schema id. Re-registering
        a byte-identical schema returns the existing id without a new
        version. `schema_type`: "AVRO" (default) or "PROTOBUF" (.proto
        source text / parsed ProtoSchema — the reference's
        proto_schema_registry.rb backend shape)."""
        parsed = self._parse(schema, schema_type)
        key = self._canonical_of(parsed, schema_type)
        existing = self._id_by_canonical.get(key)
        versions = self._subjects.setdefault(subject, [])
        if existing is not None and existing in versions:
            return existing

        errs = self.check(subject, parsed, schema_type)
        if errs:
            raise IncompatibleSchemaError(subject, self.compatibility(subject), errs)

        if existing is None:
            sid = self._next_id
            self._next_id += 1
            self._by_id[sid] = parsed
            self._types[sid] = schema_type
            self._id_by_canonical[key] = sid
        else:
            sid = existing
        versions.append(sid)
        return sid

    def check(
        self,
        subject: str,
        schema: str | dict | "AvroSchema",
        schema_type: str = "AVRO",
    ) -> list[str]:
        """Compatibility errors that registering `schema` would raise
        (empty = would be accepted)."""
        parsed = self._parse(schema, schema_type)
        mode = self.compatibility(subject)
        versions = self._subjects.get(subject, [])
        if mode == "NONE" or not versions:
            return []
        prior = versions if mode.endswith("_TRANSITIVE") else versions[-1:]
        errs: list[str] = []
        for vid in prior:
            if self._types.get(vid, "AVRO") != schema_type:
                errs.append(
                    f"v{vid}: schemaType changed "
                    f"({self._types.get(vid, 'AVRO')} → {schema_type})"
                )
                continue
            if schema_type == "PROTOBUF":
                errs += [
                    f"v{vid} {e}"
                    for e in _proto_compat_errors(self._by_id[vid], parsed)
                ]
                continue
            old = self._by_id[vid].raw
            new = parsed.raw
            if mode.startswith(("BACKWARD", "FULL")) and not can_read(old, new):
                errs += [f"v{vid}(backward) {e}" for e in compat_errors(old, new)]
            if mode.startswith(("FORWARD", "FULL")) and not can_read(new, old):
                errs += [f"v{vid}(forward) {e}" for e in compat_errors(new, old)]
        return errs

    def schema_type_of(self, schema_id: int) -> str:
        return self._types.get(schema_id, "AVRO")

    # ------------------------------------------------------------ lookups
    def get_by_id(self, schema_id: int) -> AvroSchema:
        return self._by_id[schema_id]

    def latest(self, subject: str) -> tuple[int, AvroSchema]:
        versions = self._subjects.get(subject)
        if not versions:
            raise KeyError(f"subject {subject!r} has no registered schema")
        return versions[-1], self._by_id[versions[-1]]

    def versions(self, subject: str) -> list[int]:
        return list(self._subjects.get(subject, []))

    def writer_schemas(self, subject: str) -> dict[int, dict]:
        """id → raw writer schema for every version of `subject` — the
        closure a decode kernel ships to executors (plain dicts, picklable,
        no registry round-trips from workers). Avro subjects only: proto
        decoding needs no writer schema (field numbers self-describe
        against the reader; see RegistryProtoCodec)."""
        out = {}
        for vid in self._subjects.get(subject, []):
            if self._types.get(vid, "AVRO") != "AVRO":
                raise ValueError(
                    f"subject {subject!r} holds {self._types[vid]} schemas; "
                    "writer_schemas is Avro-only"
                )
            out[vid] = self._by_id[vid].raw
        return out


def _proto_compat_errors(old, new) -> list[str]:
    """Minimal structural proto compatibility (Confluent's core rules for
    both directions, proto3 being number-addressed): a field NUMBER that
    exists in both versions must keep its type shape (scalar kind /
    message-ness / repeated / map) — recursively through NESTED message
    fields, since a nested type change corrupts the wire just as surely.
    Adding or removing numbered fields is always wire-compatible in
    proto3 (unknown fields skip, missing fields default). Renames are
    legal (numbers, not names, address the wire). Number REUSE with a
    different type is caught transitively: the registry checks a new
    version against EVERY prior version, which is what proto's
    `reserved` bookkeeping exists to prevent (the reference documents
    deimos's proto evolution the same way — numbers are the contract)."""
    errs = []
    if old.root != new.root:
        # root message renames break consumers bound to the type name
        errs.append(f"root message renamed {old.root!r} → {new.root!r}")
    errs += _proto_msg_compat_errors(old.message, new.message, "")
    return errs


def _proto_msg_compat_errors(oldm, newm, path: str) -> list[str]:
    errs = []
    old_by_n = oldm.field_by_number()
    new_by_n = newm.field_by_number()
    for num in sorted(set(old_by_n) & set(new_by_n)):
        a, b = old_by_n[num], new_by_n[num]
        label = f"field {path}#{num}"
        if a.type != b.type or a.repeated != b.repeated:
            errs.append(
                f"{label} changed "
                f"{a.type}{'[]' if a.repeated else ''} → "
                f"{b.type}{'[]' if b.repeated else ''}"
            )
        elif a.type == "map":
            if (a.map_key, a.map_value) != (b.map_key, b.map_value):
                errs.append(f"map {label} changed key/value types")
            elif (
                a.map_value == "message"
                and a.map_value_message is not None
                and b.map_value_message is not None
            ):
                errs += _proto_msg_compat_errors(
                    a.map_value_message, b.map_value_message,
                    f"{path}#{num}.",
                )
        elif (
            a.type == "message"
            and a.message is not None
            and b.message is not None
        ):
            errs += _proto_msg_compat_errors(
                a.message, b.message, f"{path}#{num}."
            )
    return errs


class RegistryAvroCodec:
    """Confluent-style codec: encode frames payloads with the subject's
    latest schema id; decode reads the id *per message* and resolves that
    writer schema against the reader (Avro schema resolution — writer-only
    fields skipped, reader defaults filled, primitive promotions applied).

    This is what makes a topic with mixed schema versions consumable: a
    batch may interleave v1- and v2-framed messages and every row decodes
    to the reader's shape. Pure-Python Avro (schemas/pyavro.py) in an
    Arrow-batched pandas kernel; the writer-schema map is captured at plan
    time so executors never call back into the registry.
    """

    def __init__(
        self,
        registry: InMemorySchemaRegistry,
        subject: str,
        reader_schema: AvroSchema | None = None,
    ):
        self.registry = registry
        self.subject = subject
        self.schema_id, latest = registry.latest(subject)
        self.reader = reader_schema or latest
        self.struct = self.reader.struct

    def encode(self, struct_col: Column) -> Column:
        from deimos_spark.schemas.codecs import PyAvroCodec, add_registry_frame

        inner = PyAvroCodec(self.registry.get_by_id(self.schema_id))
        return add_registry_frame(inner.encode(struct_col), self.schema_id)

    def decode(self, binary_col: Column) -> Column:
        from deimos_spark.schemas.kernels import registry_decode_udf

        dec_udf = registry_decode_udf(
            self.registry.writer_schemas(self.subject),
            self.reader.raw,
            self.struct.fieldNames(),
            _all_nullable(self.struct),
        )
        return F.when(binary_col.isNotNull(), dec_udf(binary_col))


class RegistryProtoCodec:
    """Confluent-style codec for PROTOBUF subjects — closes the §2D gap
    vs the reference's proto_schema_registry.rb backend (behavior only:
    encode via the registry with schema-id framing, decode via the
    registry client; proto_schema_registry.rb:16-26). encode frames the
    proto3 wire bytes with the Confluent Protobuf header (magic 0 +
    4-byte big-endian schema id + message-indexes, [0] encoding as the
    single byte 0x00 per the public wire-format spec); decode validates
    the frame and decodes with the READER schema — proto3 needs no
    writer schema per message (unknown field numbers skip, missing
    fields default), which is exactly why real proto consumers decode
    with their compiled class while the id serves governance."""

    def __init__(
        self,
        registry: InMemorySchemaRegistry,
        subject: str,
        reader_schema=None,
    ):
        self.registry = registry
        self.subject = subject
        self.schema_id, latest = registry.latest(subject)
        if registry.schema_type_of(self.schema_id) != "PROTOBUF":
            raise ValueError(
                f"subject {subject!r} latest schema is not PROTOBUF"
            )
        self.schema = reader_schema or latest
        self.struct = self.schema.struct

    def encode(self, struct_col: Column) -> Column:
        from deimos_spark.schemas.codecs import (
            ProtoCodec,
            add_proto_registry_frame,
        )

        inner = ProtoCodec(self.registry.get_by_id(self.schema_id))
        return add_proto_registry_frame(
            inner.encode(struct_col), self.schema_id
        )

    def decode(self, binary_col: Column) -> Column:
        from deimos_spark.schemas.kernels import proto_registry_decode_udf

        dec = proto_registry_decode_udf(
            self.schema.message,
            self.struct.fieldNames(),
            _all_nullable(self.struct),
            known_ids=self.registry.versions(self.subject),
        )
        return F.when(binary_col.isNotNull(), dec(binary_col))


def _all_nullable(dt: T.DataType) -> T.DataType:
    if isinstance(dt, T.StructType):
        return T.StructType(
            [T.StructField(f.name, _all_nullable(f.dataType), True) for f in dt.fields]
        )
    if isinstance(dt, T.ArrayType):
        return T.ArrayType(_all_nullable(dt.elementType), True)
    if isinstance(dt, T.MapType):
        return T.MapType(dt.keyType, _all_nullable(dt.valueType), True)
    return dt
