"""Schema layer: .avsc parsing, key-schema slicing, DDL emission.

Fixture schemas mirror FIXTURES.md §A (the reference's spec corpus shapes,
re-declared here — no files copied).
"""

import json

import pytest
from pyspark.sql import types as T

from deimos_spark.schemas.avro import generate_key_schema, parse_avsc, struct_to_ddl

MY_SCHEMA = {
    "type": "record",
    "name": "MySchema",
    "namespace": "com.my-namespace",
    "fields": [
        {"name": "test_id", "type": "string"},
        {"name": "some_int", "type": "int"},
    ],
}

COMPLEX = {
    "type": "record",
    "name": "MySchemaWithComplexTypes",
    "namespace": "com.my-namespace",
    "fields": [
        {"name": "test_id", "type": "string"},
        {"name": "union_string", "type": ["string", "null"], "default": ""},
        {"name": "test_float", "type": "float"},
        {"name": "test_string_array", "type": {"type": "array", "items": "string"}},
        {"name": "test_optional_int", "type": ["null", "int"], "default": None},
        {
            "name": "some_integer_map",
            "type": {"type": "map", "values": "int"},
        },
        {
            "name": "some_record",
            "type": {
                "type": "record",
                "name": "ARecord",
                "fields": [{"name": "a_record_field", "type": "string"}],
            },
        },
        {
            "name": "some_enum_array",
            "type": {
                "type": "array",
                "items": {"type": "enum", "name": "AnEnum", "symbols": ["sym1", "sym2"]},
            },
        },
        {
            "name": "multi_union",
            "type": ["null", "string", "int"],
        },
        {
            "name": "created_millis",
            "type": {"type": "long", "logicalType": "timestamp-millis"},
        },
    ],
}


def test_simple_schema():
    s = parse_avsc(json.dumps(MY_SCHEMA))
    assert s.full_name == "com.my-namespace.MySchema"
    assert s.struct == T.StructType(
        [
            T.StructField("test_id", T.StringType(), False),
            T.StructField("some_int", T.IntegerType(), False),
        ]
    )


def test_complex_types():
    s = parse_avsc(COMPLEX)
    f = {x.name: x for x in s.struct.fields}
    assert isinstance(f["union_string"].dataType, T.StringType)
    assert f["union_string"].nullable
    assert isinstance(f["test_float"].dataType, T.FloatType)
    assert f["test_string_array"].dataType == T.ArrayType(T.StringType(), False)
    assert f["test_optional_int"].dataType == T.IntegerType()
    assert f["test_optional_int"].nullable
    assert f["some_integer_map"].dataType == T.MapType(T.StringType(), T.IntegerType(), False)
    assert isinstance(f["some_record"].dataType, T.StructType)
    assert f["some_record"].dataType["a_record_field"].dataType == T.StringType()
    # enum → string with symbols retained
    assert f["some_enum_array"].dataType == T.ArrayType(T.StringType(), False)
    assert any("AnEnum" in k for k in s.enums)
    assert s.enums["some_enum_array:AnEnum"] == ["sym1", "sym2"]
    # multi-type union → JSON string, nullable
    assert f["multi_union"].dataType == T.StringType()
    assert f["multi_union"].nullable
    # logical timestamp
    assert f["created_millis"].dataType == T.TimestampType()


def test_key_schema_autogeneration():
    s = parse_avsc(MY_SCHEMA)
    k = generate_key_schema(s, "test_id")
    assert k.name == "MySchema_key"
    assert k.namespace == "com.my-namespace"
    assert k.struct == T.StructType([T.StructField("test_id", T.StringType(), False)])
    with pytest.raises(KeyError):
        generate_key_schema(s, "nope")


def test_ddl_emission():
    s = parse_avsc(COMPLEX)
    ddl = struct_to_ddl(s.struct, "widgets", extra_cols=("created_at TIMESTAMP",))
    assert ddl.startswith("CREATE TABLE IF NOT EXISTS widgets")
    assert "test_id STRING" in ddl
    assert "test_float FLOAT" in ddl
    # complex types flatten to STRING (reference migration behavior)
    assert "test_string_array STRING" in ddl
    assert "some_record STRING" in ddl
    assert "created_at TIMESTAMP" in ddl
    assert "created_millis TIMESTAMP" in ddl
