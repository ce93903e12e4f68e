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
        self._by_id: dict[int, AvroSchema] = {}
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
    def register(self, subject: str, schema: str | dict | AvroSchema) -> int:
        """Register a schema version under `subject`, enforcing the
        subject's compatibility mode. Returns the schema id. Re-registering
        a byte-identical schema returns the existing id without a new
        version."""
        parsed = schema if isinstance(schema, AvroSchema) else parse_avsc(schema)
        key = _canonical(parsed.raw)
        existing = self._id_by_canonical.get(key)
        versions = self._subjects.setdefault(subject, [])
        if existing is not None and existing in versions:
            return existing

        errs = self.check(subject, parsed)
        if errs:
            raise IncompatibleSchemaError(subject, self.compatibility(subject), errs)

        if existing is None:
            sid = self._next_id
            self._next_id += 1
            self._by_id[sid] = parsed
            self._id_by_canonical[key] = sid
        else:
            sid = existing
        versions.append(sid)
        return sid

    def check(self, subject: str, schema: str | dict | AvroSchema) -> list[str]:
        """Compatibility errors that registering `schema` would raise
        (empty = would be accepted)."""
        parsed = schema if isinstance(schema, AvroSchema) else parse_avsc(schema)
        mode = self.compatibility(subject)
        versions = self._subjects.get(subject, [])
        if mode == "NONE" or not versions:
            return []
        prior = versions if mode.endswith("_TRANSITIVE") else versions[-1:]
        errs: list[str] = []
        for vid in prior:
            old = self._by_id[vid].raw
            new = parsed.raw
            if mode.startswith(("BACKWARD", "FULL")) and not can_read(old, new):
                errs += [f"v{vid}(backward) {e}" for e in compat_errors(old, new)]
            if mode.startswith(("FORWARD", "FULL")) and not can_read(new, old):
                errs += [f"v{vid}(forward) {e}" for e in compat_errors(new, old)]
        return errs

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
        no registry round-trips from workers)."""
        return {vid: self._by_id[vid].raw for vid in self._subjects.get(subject, [])}


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
