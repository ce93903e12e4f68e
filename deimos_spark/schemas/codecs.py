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
        self.struct = schema.struct if isinstance(schema, AvroSchema) else schema

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
        import json as _json

        import pandas as pd
        from pyspark.sql.functions import pandas_udf
        from pyspark.sql.pandas.functions import PandasUDFType

        raw_schema = self.raw

        def _enc(js: "pd.Series") -> "pd.Series":
            from deimos_spark.schemas.pyavro import encode_record

            out = []
            for s in js:
                if s is None:
                    out.append(None)
                else:
                    out.append(encode_record(raw_schema, _json.loads(s)))
            return pd.Series(out, dtype=object)

        enc_udf = pandas_udf(_enc, T.BinaryType(), PandasUDFType.SCALAR)
        return F.when(
            struct_col.isNotNull(), enc_udf(F.to_json(struct_col))
        )

    def decode(self, binary_col: Column) -> Column:
        import pandas as pd
        from pyspark.sql.functions import pandas_udf
        from pyspark.sql.pandas.functions import PandasUDFType

        raw_schema = self.raw
        names = self.struct.fieldNames()

        def _nullable(dt: T.DataType) -> T.DataType:
            # the kernel emits all-None rows for NULL input (the outer
            # when() restores the NULL struct) — so every field must be
            # declared nullable or the Arrow→unsafe-row writer NPEs
            if isinstance(dt, T.StructType):
                return T.StructType(
                    [T.StructField(f.name, _nullable(f.dataType), True) for f in dt.fields]
                )
            if isinstance(dt, T.ArrayType):
                return T.ArrayType(_nullable(dt.elementType), True)
            if isinstance(dt, T.MapType):
                return T.MapType(dt.keyType, _nullable(dt.valueType), True)
            return dt

        out_struct = _nullable(self.struct)

        def _dec(bs: "pd.Series") -> "pd.DataFrame":
            from deimos_spark.schemas.pyavro import decode_record

            rows = []
            for b in bs:
                if b is None:
                    rows.append({n: None for n in names})
                else:
                    rows.append(decode_record(raw_schema, bytes(b)))
            return pd.DataFrame(rows, columns=list(names))

        dec_udf = pandas_udf(_dec, out_struct, PandasUDFType.SCALAR)
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


def extract_schema_id(binary_col: Column) -> Column:
    """Read the 4-byte big-endian schema id from a framed message
    (conv/hex over the id bytes — pure JVM expression)."""
    return F.conv(F.hex(F.substring(binary_col, 2, 4)), 16, 10).cast("int")
