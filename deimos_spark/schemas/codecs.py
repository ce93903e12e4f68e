"""Codec backends: schema-aware encode/decode between struct columns and
wire bytes, mirroring the reference's pluggable schema backends
(behavior per /root/reference/lib/deimos/schema_backends/*: avro_local,
avro_schema_registry, avro_validation≈json, plain, mock — studied for
behavior only).

All codecs share one Column-level contract:
    encode(struct_col) -> BinaryType column
    decode(binary_col) -> struct column (nullable; NULL in = NULL out,
                          preserving tombstones)

The JSON codec is the functional default in this sandbox (spark-avro jar is
not present); the Avro codec self-gates on availability so the same pipeline
code runs unchanged where the jar exists. Confluent registry framing
(magic byte 0 + 4-byte schema id, big-endian) is codec-independent byte
plumbing implemented with concat/substring over BinaryType.
"""

from __future__ import annotations

import json
from typing import Protocol

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from deimos_spark.schemas.avro import AvroSchema


class Codec(Protocol):
    def encode(self, struct_col: Column) -> Column: ...
    def decode(self, binary_col: Column) -> Column: ...


class JsonCodec:
    """JSON-on-the-wire codec (reference analogue: avro_validation backend —
    validates against the schema, serializes as plain structures)."""

    def __init__(self, schema: AvroSchema | T.StructType):
        # duck-typed: AvroSchema and ProtoSchema both expose .struct
        self.struct = getattr(schema, "struct", schema)

    def encode(self, struct_col: Column) -> Column:
        return F.when(
            struct_col.isNotNull(), F.to_json(struct_col).cast("binary")
        )

    def decode(self, binary_col: Column) -> Column:
        return F.from_json(binary_col.cast("string"), self.struct)


class PlainCodec:
    """Pass-through string codec (reference: plain.rb — payload.to_s)."""

    def __init__(self, schema: object = None):
        pass

    def encode(self, struct_col: Column) -> Column:
        return F.when(
            struct_col.isNotNull(), F.to_json(struct_col).cast("binary")
        )

    def decode(self, binary_col: Column) -> Column:
        return binary_col.cast("string")


class MockCodec(JsonCodec):
    """Test codec: JSON wire format, no validation (reference: mock.rb)."""


class AvroCodec:
    """Binary Avro codec via spark-avro's to_avro/from_avro. Self-gates:
    raises a clear error at construction if the Avro data source jar is not
    loaded (org.apache.spark:spark-avro must be on the classpath)."""

    def __init__(self, schema: AvroSchema):
        self.schema = schema
        self.json_schema = json.dumps(schema.raw)
        try:
            from pyspark.sql.avro.functions import from_avro, to_avro  # noqa: F401

            self._to_avro, self._from_avro = to_avro, from_avro
        except ImportError as e:  # pragma: no cover
            raise NotImplementedError(
                "spark-avro python bindings unavailable"
            ) from e

    def encode(self, struct_col: Column) -> Column:
        return F.when(
            struct_col.isNotNull(), self._to_avro(struct_col, self.json_schema)
        )

    def decode(self, binary_col: Column) -> Column:
        return self._from_avro(binary_col, self.json_schema)


class SortedJsonCodec(JsonCodec):
    """Canonical-JSON codec: struct fields are reordered alphabetically
    before serialization, so byte-equal keys ⇔ equal logical keys — the
    property the reference enforces for Protobuf message keys (proto binary
    encoding is unstable for partitioning, so keys are encoded as sorted
    JSON; proto_base.rb:58-60 behavior). Use for key encoding whenever the
    key bytes feed a partitioner or equality join."""

    def encode(self, struct_col: Column) -> Column:
        ordered = F.struct(
            *[
                struct_col.getField(f.name).alias(f.name)
                for f in sorted(self.struct.fields, key=lambda f: f.name)
            ]
        )
        return F.when(
            struct_col.isNotNull(), F.to_json(ordered).cast("binary")
        )


class PyAvroCodec:
    """Binary Avro codec in pure Python (schemas/pyavro.py) via
    Arrow-batched pandas UDFs — the wire format the reference actually
    speaks (binary Avro), usable where the spark-avro jar isn't loadable.

    Encode: struct → JSON (JVM-side) → Avro bytes in a pandas kernel; the
    JSON hop avoids the struct-as-DataFrame ambiguity for null rows and
    keeps the UDF input a flat string series. Decode: bytes → Avro-parsed
    dicts → struct rows. For JVM deployments prefer AvroCodec (spark-avro)
    — the two are wire-compatible for this schema subset.
    """

    def __init__(self, schema: AvroSchema):
        if not isinstance(schema, AvroSchema):
            raise ValueError("PyAvroCodec needs a parsed AvroSchema (raw .avsc)")
        self.schema = schema
        self.struct = schema.struct
        self.raw = schema.raw

    def encode(self, struct_col: Column) -> Column:
        from deimos_spark.schemas.kernels import pyavro_encode_udf

        enc_udf = pyavro_encode_udf(self.raw)
        return F.when(
            struct_col.isNotNull(), enc_udf(F.to_json(struct_col))
        )

    def decode(self, binary_col: Column) -> Column:
        from deimos_spark.schemas.kernels import pyavro_decode_udf

        # the kernel emits all-None rows for NULL input (the outer when()
        # restores the NULL struct) — so every field must be declared
        # nullable or the Arrow→unsafe-row writer NPEs
        out_struct = _all_nullable(self.struct)
        dec_udf = pyavro_decode_udf(self.raw, self.struct.fieldNames(), out_struct)
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


class ProtoCodec:
    """proto3 wire-format codec in pure Python (schemas/protowire.py) via
    Arrow-batched pandas UDFs — the reference's proto_local backend
    analogue (proto_local.rb:12-22 encode/decode; scalar map and
    repeated→array per proto_base.rb:9-86).

    Same JSON-hop shape as PyAvroCodec: struct → to_json (JVM) → wire
    bytes in the kernel; decode: bytes → dicts → struct rows. Keys for
    proto topics must use the sorted-JSON codec, never this one
    (proto binary is unstable for partitioning — proto_base.rb:58-60);
    Producer enforces that default.
    """

    def __init__(self, schema):
        from deimos_spark.schemas.protowire import ProtoSchema

        if not isinstance(schema, ProtoSchema):
            raise ValueError("ProtoCodec needs a parsed ProtoSchema (.proto src)")
        self.schema = schema
        self.struct = schema.struct

    def encode(self, struct_col: Column) -> Column:
        from deimos_spark.schemas.kernels import proto_encode_udf

        enc_udf = proto_encode_udf(self.schema.message)
        return F.when(
            struct_col.isNotNull(), enc_udf(F.to_json(struct_col))
        )

    def decode(self, binary_col: Column) -> Column:
        from deimos_spark.schemas.kernels import proto_decode_udf

        out_struct = _all_nullable(self.struct)
        dec_udf = proto_decode_udf(
            self.schema.message, self.struct.fieldNames(), out_struct
        )
        return F.when(binary_col.isNotNull(), dec_udf(binary_col))


class RegistryFramedCodec:
    """Wrap any codec with Confluent wire framing: encode prepends the
    5-byte header, decode strips it. Schema-id is fixed per topic config
    (the registry client's id assignment is out of scope here)."""

    def __init__(self, inner: "Codec", schema_id: int):
        self.inner = inner
        self.schema_id = schema_id

    def encode(self, struct_col: Column) -> Column:
        return add_registry_frame(self.inner.encode(struct_col), self.schema_id)

    def decode(self, binary_col: Column) -> Column:
        return self.inner.decode(strip_registry_frame(binary_col))


CODECS: dict[str, type] = {
    "sorted_json": SortedJsonCodec,
    "json": JsonCodec,
    "plain": PlainCodec,
    "mock": MockCodec,
    "avro": AvroCodec,
    "avro_py": PyAvroCodec,
    "proto": ProtoCodec,
}


def avro_jvm_available(spark) -> bool:
    """Probe whether spark-avro's SQL functions actually work in this
    session (the Python bindings import fine even when the jar is absent —
    failure only surfaces at analysis). Use to pick 'avro' vs 'avro_py'."""
    try:
        from pyspark.sql.avro.functions import to_avro

        spark.range(1).select(
            to_avro(F.struct(F.lit(1).alias("a")))
        ).collect()
        return True
    except Exception:
        return False


def get_codec(name: str, schema: AvroSchema | T.StructType | None = None):
    try:
        cls = CODECS[name]
    except KeyError:
        raise ValueError(f"unknown codec {name!r}; available: {sorted(CODECS)}")
    return cls(schema)


# ---------------------------------------------------------- registry framing

MAGIC_BYTE = b"\x00"


def add_registry_frame(binary_col: Column, schema_id: int) -> Column:
    """Prefix Confluent wire-format framing: 1 magic byte (0) + 4-byte
    big-endian schema id (reference behavior: avro_schema_registry.rb wire
    format). NULL payloads (tombstones) stay NULL."""
    frame = MAGIC_BYTE + schema_id.to_bytes(4, "big")
    return F.when(
        binary_col.isNotNull(), F.concat(F.lit(frame), binary_col)
    )


def strip_registry_frame(binary_col: Column) -> Column:
    """Drop the 5-byte Confluent header before codec decode."""
    return F.when(
        binary_col.isNotNull(), F.substring(binary_col, 6, 2147483647)
    )


def add_proto_registry_frame(
    binary_col: Column, schema_id: int, message_indexes: tuple[int, ...] = (0,)
) -> Column:
    """Confluent wire framing for Protobuf values: magic byte 0 + 4-byte
    big-endian schema id + zigzag-varint message-indexes array (the path to
    the message within the .proto file; the common single-first-message
    case [0] is specified to encode as the single byte 0x00). Public
    Confluent wire-format spec; the reference delegates this to its
    registry client (proto_schema_registry.rb)."""

    def _zz_varint(n: int) -> bytes:
        z = (n << 1) ^ (n >> 63)
        out = bytearray()
        while True:
            b = z & 0x7F
            z >>= 7
            if z:
                out.append(b | 0x80)
            else:
                out.append(b)
                return bytes(out)

    if tuple(message_indexes) == (0,):
        idx = b"\x00"
    else:
        idx = _zz_varint(len(message_indexes)) + b"".join(
            _zz_varint(i) for i in message_indexes
        )
    frame = MAGIC_BYTE + schema_id.to_bytes(4, "big") + idx
    return F.when(binary_col.isNotNull(), F.concat(F.lit(frame), binary_col))


def strip_proto_registry_frame(binary_col: Column) -> Column:
    """Drop magic + id + the single-byte [0] message-index (6 bytes). For
    non-trivial index arrays, decode driver-side."""
    return F.when(
        binary_col.isNotNull(), F.substring(binary_col, 7, 2147483647)
    )


def extract_schema_id(binary_col: Column) -> Column:
    """Read the 4-byte big-endian schema id from a framed message
    (conv/hex over the id bytes — pure JVM expression)."""
    return F.conv(F.hex(F.substring(binary_col, 2, 4)), 16, 10).cast("int")
