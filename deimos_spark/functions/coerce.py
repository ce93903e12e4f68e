"""Schema coercion expressions — reproduces the reference's permissive
payload→schema coercion semantics (SURVEY §1.2, behavior studied from
/root/reference/lib/deimos/schema_backends/avro_schema_coercer.rb):

- int/long: Integer, integer-string ("1" / "+1" / "-1"), or timestamp →
  integer (timestamps become epoch seconds); junk → NULL (non-ANSI cast).
- float/double: any numeric or numeric-string → double.
- string: scalars stringified.
- boolean: TRUTHINESS, not parsing — NULL/false → false, everything else
  (including "false"!) → true.
- timestamp-millis/micros logical types: integer values pass through.
- record: recursive per-field coercion.

Input is a DataFrame whose columns may be wrongly-typed (strings for ints,
ints for booleans...); output matches the target StructType. All pure
Column expressions — coercion of a 100 TB produce stream stays in codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_INT_RE = r"^[+-]?\d+$"
_NUM_RE = r"^[+-]?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?$"


def coerce_column(col: Column, src_type: T.DataType, dst: T.DataType) -> Column:
    """Coerce one column from its current type to the schema target type."""
    if isinstance(dst, (T.IntegerType, T.LongType)):
        return _to_integral(col, src_type).cast(dst)
    if isinstance(dst, (T.FloatType, T.DoubleType)):
        return _to_floating(col, src_type).cast(dst)
    if isinstance(dst, T.BooleanType):
        return _to_truthy_bool(col, src_type)
    if isinstance(dst, T.StringType):
        return col.cast("string")
    if isinstance(dst, T.TimestampType):
        # timestamp-millis/micros logical types: ints pass through
        # (coercer passes raw ints; Spark's native type is timestamp)
        if isinstance(src_type, (T.IntegerType, T.LongType)):
            return F.timestamp_millis(col.cast("long"))
        return col.cast("timestamp")
    if isinstance(dst, T.StructType) and isinstance(src_type, T.StructType):
        return _coerce_struct(col, src_type, dst)
    if isinstance(dst, T.ArrayType) and isinstance(src_type, T.ArrayType):
        return F.transform(
            col, lambda x: coerce_column(x, src_type.elementType, dst.elementType)
        )
    if isinstance(dst, T.MapType) and isinstance(src_type, T.MapType):
        return F.map_from_arrays(
            F.map_keys(col),
            F.transform(
                F.map_values(col),
                lambda v: coerce_column(v, src_type.valueType, dst.valueType),
            ),
        )
    return col.cast(dst)


def _to_integral(col: Column, src: T.DataType) -> Column:
    if isinstance(src, T.StringType):
        # integer-strings coerce; junk → NULL; also accept float-strings
        # by truncation of the numeric cast
        return (
            F.when(col.rlike(_INT_RE), col.cast("long"))
            .when(col.rlike(_NUM_RE), col.cast("double").cast("long"))
            .otherwise(F.lit(None).cast("long"))
        )
    if isinstance(src, T.TimestampType):
        # Time objects → epoch seconds (coercer calls to_i)
        return F.unix_timestamp(col)
    if isinstance(src, T.BooleanType):
        return F.when(col, 1).otherwise(0).cast("long")
    return col.cast("long")


def _to_floating(col: Column, src: T.DataType) -> Column:
    if isinstance(src, T.StringType):
        return F.when(col.rlike(_NUM_RE), col.cast("double")).otherwise(
            F.lit(None).cast("double")
        )
    if isinstance(src, T.TimestampType):
        return F.unix_timestamp(col).cast("double")
    return col.cast("double")


def _to_truthy_bool(col: Column, src: T.DataType) -> Column:
    """Reference semantics: val.present? style truthiness — ONLY nil and
    false are false; any other value (0, "", "false") is true... with the
    Ruby caveat that blank strings are falsy under ActiveSupport presence.
    We reproduce: NULL → false, boolean passes through, empty string →
    false, everything else → true."""
    if isinstance(src, T.BooleanType):
        return F.coalesce(col, F.lit(False))
    if isinstance(src, T.StringType):
        return F.when(col.isNull() | (col == ""), F.lit(False)).otherwise(
            F.lit(True)
        )
    return F.when(col.isNull(), F.lit(False)).otherwise(F.lit(True))


def _coerce_struct(col: Column, src: T.StructType, dst: T.StructType) -> Column:
    src_fields = {f.name: f for f in src.fields}
    parts = []
    for f in dst.fields:
        if f.name in src_fields:
            inner = coerce_column(
                col.getField(f.name), src_fields[f.name].dataType, f.dataType
            )
        else:
            inner = F.lit(None).cast(f.dataType)
        parts.append(inner.alias(f.name))
    return F.when(col.isNotNull(), F.struct(*parts))


def coercion_exprs(df: DataFrame, schema: T.StructType) -> list[Column]:
    """The coercion projection as a list of aliased Column expressions —
    compose with passthrough columns when the pipeline must carry
    non-schema metadata (headers, partition-key sources) alongside."""
    src_types = {f.name: f.dataType for f in df.schema.fields}
    cols = []
    for f in schema.fields:
        if f.name in src_types:
            cols.append(
                coerce_column(F.col(f.name), src_types[f.name], f.dataType)
                .alias(f.name)
            )
        else:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
    return cols


def coerce_to_schema(df: DataFrame, schema: T.StructType) -> DataFrame:
    """Project + coerce a DataFrame onto a target schema:
    - columns not in the schema are DROPPED (strict-on-write projection,
      reference: fail_on_extra_fields validates, producer projects first);
    - schema fields missing from the df become NULL columns;
    - present columns are coerced per the table above.
    """
    return df.select(*coercion_exprs(df, schema))


def default_exprs(schema) -> dict[str, Column]:
    """Avro field defaults as typed Column literals, keyed by field name.

    Reference behavior (SURVEY §1.1, schema_class/record.rb): fields absent
    from the payload take the schema's declared default. Scalars become
    lit().cast(); complex defaults (arrays/maps/records) are materialized
    via from_json against the field's Spark type so nested shapes match.
    `schema` is an AvroSchema (needs .raw for the default values).
    """
    import json as _json

    out: dict[str, Column] = {}
    raw = getattr(schema, "raw", None)
    if not raw or "fields" not in raw:
        return out  # proto schemas: no declared defaults (proto3 zeros only)
    for raw_f, spark_f in zip(raw["fields"], schema.struct.fields):
        if "default" not in raw_f or raw_f["default"] is None:
            continue
        d = raw_f["default"]
        dt = spark_f.dataType
        if isinstance(dt, (T.ArrayType, T.MapType, T.StructType)):
            col = F.from_json(F.lit(_json.dumps(d)), dt)
        else:
            col = F.lit(d).cast(dt)
        out[spark_f.name] = col
    return out


def apply_defaults(df: DataFrame, schema, unless: Column | None = None) -> DataFrame:
    """Fill NULL schema fields with their declared Avro defaults.

    `unless`: optional boolean Column (resolved against `df`) that suppresses
    default-filling for matching rows — the produce path passes its
    materialized tombstone flag so delete markers keep an all-NULL payload.
    """
    for name, col in default_exprs(schema).items():
        filled = F.coalesce(F.col(name), col)
        if unless is not None:
            filled = F.when(unless, F.col(name)).otherwise(filled)
        df = df.withColumn(name, filled)
    return df


def validate_no_extra_fields(df: DataFrame, schema: T.StructType) -> None:
    """Strict-on-write check (reference: validate with fail_on_extra_fields,
    avro_base.rb:85-89): raise if the DataFrame carries fields the schema
    doesn't declare."""
    declared = {f.name for f in schema.fields}
    extra = [c for c in df.columns if c not in declared]
    if extra:
        raise ValueError(f"payload has fields not in schema: {extra}")
