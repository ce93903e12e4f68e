"""Avro .avsc → Spark StructType mapping, key-schema slicing, DDL emission.

Behavior parity (types per SURVEY §1.2, studied from
/root/reference/lib/deimos/schema_backends/avro_base.rb — behavior only):

- int→IntegerType, long→LongType, float→FloatType, double→DoubleType,
  boolean→BooleanType, string→StringType, bytes→BinaryType (DDL still
  flattens it to STRING, matching the reference's :string sql_type),
  enum→StringType (+ symbols kept for membership checks),
  record→StructType, array→ArrayType, map→MapType(String, V),
  union [null, T]→nullable T, multi-branch unions→StringType (JSON),
  logical timestamp-millis/micros→TimestampType.
- Key-schema autogeneration: slice one field out of the value schema into a
  `<Name>_key` record (reference: avro_base.rb:160-177).
- DDL: complex types flatten to string columns, mirroring the reference's
  migration generator (active_record_generator.rb:60-78).

Parsing needs no avro library — .avsc is plain JSON.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import types as T

_PRIMITIVES: dict[str, T.DataType] = {
    "int": T.IntegerType(),
    "long": T.LongType(),
    "float": T.FloatType(),
    "double": T.DoubleType(),
    "boolean": T.BooleanType(),
    "string": T.StringType(),
    "bytes": T.BinaryType(),
    "null": T.NullType(),
}

_LOGICAL_TS = {"timestamp-millis", "timestamp-micros"}


@dataclass
class AvroSchema:
    """Parsed Avro record schema with Spark equivalents."""

    name: str
    namespace: str | None
    struct: T.StructType
    raw: dict[str, Any]
    enums: dict[str, list[str]] = field(default_factory=dict)

    @property
    def full_name(self) -> str:
        return f"{self.namespace}.{self.name}" if self.namespace else self.name


def parse_avsc(src: str | dict[str, Any]) -> AvroSchema:
    """Parse an .avsc document (JSON string or dict) into an AvroSchema."""
    raw = json.loads(src) if isinstance(src, str) else src
    if raw.get("type") != "record":
        raise ValueError(f"top-level schema must be a record, got {raw.get('type')}")
    enums: dict[str, list[str]] = {}
    struct = _record_to_struct(raw, enums)
    return AvroSchema(
        name=raw["name"], namespace=raw.get("namespace"), struct=struct,
        raw=raw, enums=enums,
    )


def _record_to_struct(rec: dict[str, Any], enums: dict[str, list[str]]) -> T.StructType:
    fields = []
    for f in rec["fields"]:
        dt, nullable = _avro_type_to_spark(f["type"], enums, f["name"])
        fields.append(T.StructField(f["name"], dt, nullable))
    return T.StructType(fields)


def _avro_type_to_spark(
    t: Any, enums: dict[str, list[str]], path: str
) -> tuple[T.DataType, bool]:
    """Returns (spark_type, nullable)."""
    if isinstance(t, str):
        if t in _PRIMITIVES:
            return _PRIMITIVES[t], False
        # named-type reference (e.g. recursive record) → string/JSON column
        return T.StringType(), False
    if isinstance(t, list):  # union
        branches = [b for b in t if b != "null"]
        nullable = "null" in t
        if len(branches) == 1:
            dt, _ = _avro_type_to_spark(branches[0], enums, path)
            return dt, nullable
        # multi-type union → JSON string (Spark has no union type)
        return T.StringType(), True
    if isinstance(t, dict):
        typ = t["type"]
        if t.get("logicalType") in _LOGICAL_TS:
            return T.TimestampType(), False
        if typ == "record":
            return _record_to_struct(t, enums), False
        if typ == "enum":
            enums[f"{path}:{t['name']}"] = list(t["symbols"])
            return T.StringType(), False
        if typ == "array":
            dt, item_nullable = _avro_type_to_spark(t["items"], enums, path)
            return T.ArrayType(dt, containsNull=item_nullable), False
        if typ == "map":
            dt, val_nullable = _avro_type_to_spark(t["values"], enums, path)
            return T.MapType(T.StringType(), dt, valueContainsNull=val_nullable), False
        if typ == "fixed":
            return T.StringType(), False
        return _avro_type_to_spark(typ, enums, path)
    raise ValueError(f"unsupported avro type at {path}: {t!r}")


def generate_key_schema(value_schema: AvroSchema, key_field: str) -> AvroSchema:
    """Build a 1-field key schema from the value schema (reference behavior:
    avro_base.rb:160-177 — record named '<Name>_key', same namespace)."""
    src_field = next(
        (f for f in value_schema.raw["fields"] if f["name"] == key_field), None
    )
    if src_field is None:
        raise KeyError(f"field {key_field!r} not in schema {value_schema.name}")
    raw = {
        "type": "record",
        "name": f"{value_schema.name}_key",
        "namespace": value_schema.namespace,
        "doc": f"Key for {value_schema.full_name}",
        "fields": [{"name": src_field["name"], "type": src_field["type"]}],
    }
    return parse_avsc(raw)


# ------------------------------------------------------------------ DDL

_DDL_TYPES: dict[type, str] = {
    T.IntegerType: "INT",
    T.LongType: "BIGINT",
    T.FloatType: "FLOAT",
    T.DoubleType: "DOUBLE",
    T.BooleanType: "BOOLEAN",
    T.StringType: "STRING",
    T.TimestampType: "TIMESTAMP",
}


def struct_to_ddl(
    schema: T.StructType,
    table: str,
    flatten_complex: bool = True,
    extra_cols: tuple[str, ...] = (),
) -> str:
    """Emit CREATE TABLE DDL. Complex types become STRING (JSON) columns when
    flatten_complex (the reference's migration behavior for record/array/map:
    active_record/templates/migration.rb.tt) — otherwise native nested DDL."""
    cols = []
    for f in schema.fields:
        t = _DDL_TYPES.get(type(f.dataType))
        if t is None:
            t = "STRING" if flatten_complex else f.dataType.simpleString().upper()
        cols.append(f"  {f.name} {t}")
    cols.extend(f"  {c}" for c in extra_cols)
    body = ",\n".join(cols)
    return f"CREATE TABLE IF NOT EXISTS {table} (\n{body}\n) USING parquet"
