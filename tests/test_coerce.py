"""Coercion matrix (SURVEY §1.2 / FIXTURES.md §A9) — table-driven, mirroring
the reference's avro_base shared examples: int-strings → int, float-strings
→ float, Time → epoch, truthy booleans, nil-through-union, missing fields.
"""

import datetime

import pytest
from pyspark.sql import Row
from pyspark.sql import types as T

from deimos_spark.functions.coerce import coerce_to_schema, validate_no_extra_fields

TARGET = T.StructType(
    [
        T.StructField("an_int", T.LongType(), True),
        T.StructField("a_float", T.DoubleType(), True),
        T.StructField("a_string", T.StringType(), True),
        T.StructField("a_bool", T.BooleanType(), True),
    ]
)


def _coerce_one(spark, value, field, src_type):
    df = spark.createDataFrame(
        [Row(x=value)], T.StructType([T.StructField("x", src_type, True)])
    ).withColumnRenamed("x", field)
    out = coerce_to_schema(df, TARGET)
    return out.head()[field]


@pytest.mark.parametrize(
    "value,src,expected",
    [
        ("123", T.StringType(), 123),
        ("+1", T.StringType(), 1),
        ("-42", T.StringType(), -42),
        ("1.5", T.StringType(), 1),       # numeric-string truncates
        ("junk", T.StringType(), None),   # non-numeric → NULL (permissive)
        (7, T.IntegerType(), 7),
        (True, T.BooleanType(), 1),
    ],
)
def test_integral_coercions(spark, value, src, expected):
    assert _coerce_one(spark, value, "an_int", src) == expected


def test_time_to_epoch(spark):
    t = datetime.datetime(2024, 1, 1, 0, 0, 0, tzinfo=datetime.timezone.utc)
    got = _coerce_one(spark, t, "an_int", T.TimestampType())
    assert got == 1704067200


@pytest.mark.parametrize(
    "value,src,expected",
    [
        ("1.5", T.StringType(), 1.5),
        ("2", T.StringType(), 2.0),
        ("-.5", T.StringType(), -0.5),
        ("1e3", T.StringType(), 1000.0),
        ("nope", T.StringType(), None),
        (3, T.IntegerType(), 3.0),
    ],
)
def test_float_coercions(spark, value, src, expected):
    assert _coerce_one(spark, value, "a_float", src) == expected


@pytest.mark.parametrize(
    "value,src,expected",
    [
        (123, T.IntegerType(), "123"),
        (1.5, T.DoubleType(), "1.5"),
        ("s", T.StringType(), "s"),
    ],
)
def test_string_coercions(spark, value, src, expected):
    assert _coerce_one(spark, value, "a_string", src) == expected


@pytest.mark.parametrize(
    "value,src,expected",
    [
        (None, T.BooleanType(), False),
        (False, T.BooleanType(), False),
        (True, T.BooleanType(), True),
        (0, T.IntegerType(), True),       # truthiness: 0 is true!
        ("false", T.StringType(), True),  # "false" string is truthy
        ("", T.StringType(), False),      # blank → false
        (None, T.StringType(), False),
    ],
)
def test_truthy_booleans(spark, value, src, expected):
    assert _coerce_one(spark, value, "a_bool", src) is expected


def test_nested_record_coercion(spark):
    target = T.StructType(
        [
            T.StructField(
                "rec",
                T.StructType(
                    [
                        T.StructField("n", T.LongType(), True),
                        T.StructField("missing", T.StringType(), True),
                    ]
                ),
                True,
            )
        ]
    )
    src = T.StructType(
        [
            T.StructField(
                "rec",
                T.StructType([T.StructField("n", T.StringType(), True)]),
                True,
            )
        ]
    )
    df = spark.createDataFrame([Row(rec=Row(n="5")), Row(rec=None)], src)
    rows = coerce_to_schema(df, target).collect()
    assert rows[0]["rec"]["n"] == 5
    assert rows[0]["rec"]["missing"] is None
    assert rows[1]["rec"] is None  # nil-through-union


def test_missing_and_extra_fields(spark):
    df = spark.createDataFrame([Row(an_int=1, extra="x")])
    out = coerce_to_schema(df, TARGET)
    assert out.columns == [f.name for f in TARGET.fields]  # extra dropped
    assert out.head()["a_string"] is None  # missing → NULL
    with pytest.raises(ValueError, match="extra"):
        validate_no_extra_fields(df, TARGET)


def test_array_element_coercion(spark):
    target = T.StructType(
        [T.StructField("xs", T.ArrayType(T.LongType(), True), True)]
    )
    df = spark.createDataFrame(
        [Row(xs=["1", "2", "junk"])],
        T.StructType([T.StructField("xs", T.ArrayType(T.StringType(), True), True)]),
    )
    assert coerce_to_schema(df, target).head()["xs"] == [1, 2, None]


def test_apply_defaults_scalar_and_complex(spark):
    """Schema-declared defaults fill NULL fields (FIXTURES A3 shapes):
    scalar, array, map, nested record, enum-with-default."""
    from pyspark.sql import Row

    from deimos_spark.functions.coerce import apply_defaults
    from deimos_spark.schemas.avro import parse_avsc

    avsc = parse_avsc(
        {
            "type": "record",
            "name": "Defaults",
            "fields": [
                {"name": "test_id", "type": "string"},
                {"name": "opt_int", "type": ["null", "int"], "default": None},
                {"name": "n", "type": ["int", "null"], "default": 123},
                {"name": "arr", "type": {"type": "array", "items": "string"},
                 "default": ["test"]},
                {"name": "m", "type": {"type": "map", "values": "int"},
                 "default": {"abc": 123}},
                {"name": "rec",
                 "type": {"type": "record", "name": "R",
                          "fields": [{"name": "a", "type": "string"}]},
                 "default": {"a": "Test String"}},
                {"name": "e",
                 "type": {"type": "enum", "name": "E",
                          "symbols": ["sym5", "sym6"]},
                 "default": "sym6"},
            ],
        }
    )
    import pyspark.sql.types as T

    nullable = T.StructType(
        [T.StructField(f.name, f.dataType, True) for f in avsc.struct.fields]
    )
    df = spark.createDataFrame(
        [Row(test_id="x", opt_int=None, n=None, arr=None, m=None, rec=None, e=None)],
        nullable,
    )
    r = apply_defaults(df, avsc).head()
    assert r["opt_int"] is None          # null default stays null
    assert r["n"] == 123
    assert r["arr"] == ["test"]
    assert r["m"] == {"abc": 123}
    assert r["rec"]["a"] == "Test String"
    assert r["e"] == "sym6"


def test_producer_applies_defaults_not_to_tombstones(spark):
    from pyspark.sql import Row, types as T
    import json

    from deimos_spark.schemas.avro import parse_avsc
    from deimos_spark.streaming.producer import Producer, TopicConfig

    avsc = parse_avsc(
        {
            "type": "record",
            "name": "D",
            "fields": [
                {"name": "test_id", "type": "string"},
                {"name": "x", "type": ["null", "string"]},
                {"name": "n", "type": ["int", "null"], "default": 7},
            ],
        }
    )
    prod = Producer(TopicConfig(topic="t", schema=avsc, key_field="test_id"))
    df = spark.createDataFrame(
        [Row(test_id="a", x="live", n=None)],
        T.StructType([
            T.StructField("test_id", T.StringType()),
            T.StructField("x", T.StringType()),
            T.StructField("n", T.IntegerType()),
        ]),
    )
    msgs = {json.loads(bytes(m["key"]))["test_id"]: m
            for m in prod.build_messages(df).collect()}
    # a non-tombstone row's NULL field takes the schema default
    assert json.loads(bytes(msgs["a"]["value"]))["n"] == 7


def test_tombstone_survives_schema_defaults(spark):
    """A tombstone (all non-key fields NULL) must encode as a NULL value
    even when the schema declares field defaults — defaults must not
    resurrect a delete marker into an upsert of default values."""
    from pyspark.sql import Row, types as T
    import json

    from deimos_spark.schemas.avro import parse_avsc
    from deimos_spark.streaming.producer import Producer, TopicConfig

    avsc = parse_avsc(
        {
            "type": "record",
            "name": "D",
            "fields": [
                {"name": "test_id", "type": "string"},
                {"name": "status", "type": ["string", "null"], "default": "active"},
            ],
        }
    )
    prod = Producer(TopicConfig(topic="t", schema=avsc, key_field="test_id"))
    df = spark.createDataFrame(
        [Row(test_id="gone", status=None), Row(test_id="kept", status=None)],
        T.StructType([
            T.StructField("test_id", T.StringType()),
            T.StructField("status", T.StringType()),
        ]),
    )
    # row "gone" is keyed all-NULL → tombstone; "kept" too (same shape) —
    # split the frame so one row carries a real payload
    live = spark.createDataFrame(
        [Row(test_id="kept", status="x")], df.schema
    )
    msgs = {json.loads(bytes(m["key"]))["test_id"]: m
            for m in prod.build_messages(df.limit(1).union(live)).collect()}
    assert msgs["gone"]["value"] is None          # tombstone stays NULL
    assert json.loads(bytes(msgs["kept"]["value"]))["status"] == "x"
