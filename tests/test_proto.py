"""Protobuf backend: proto3 parser, Spark type mapping (proto_base.rb
SQL_MAP parity), wire-format vectors + round-trips, Spark codec path,
producer pipeline with sorted-JSON keys, Confluent proto framing.

Fixture mirrors the reference's spec corpus
(/root/reference/spec/protos/sample/v1/sample.proto — FIXTURES.md §A8).
Byte vectors are hand-derived from the public protobuf encoding spec.
"""

import datetime as dt

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from deimos_spark.schemas.protowire import (
    ProtoSchema,
    decode_message,
    encode_message,
    parse_proto,
)

SAMPLE_PROTO = """
syntax = "proto3";

package sample.v1;

import "google/protobuf/timestamp.proto";

message NestedMessage {
  string nested_str = 1;
  int32 nested_num = 2;
}

message SampleMessage {
  string str = 1;
  int32 num = 2;
  repeated string str_arr = 3;
  bool flag = 4;
  google.protobuf.Timestamp timestamp = 5;
  oneof union {
    NestedMessage nested = 6;
    string union_str = 7;
  }
  NestedMessage non_union_nested = 8;
  map<string, string> str_map = 9;
  string message_id = 10;
}
"""

SCALARS_PROTO = """
syntax = "proto3";
message Scalars {
  int32 a = 1;
  int64 b = 2;
  uint32 c = 3;
  uint64 d = 4;
  sint32 e = 5;
  sint64 f = 6;
  fixed32 g = 7;
  fixed64 h = 8;
  sfixed32 i = 9;
  sfixed64 j = 10;
  float k = 11;
  double l = 12;
  bool m = 13;
  bytes n = 14;
  string o = 15;
  repeated int32 p = 16;
}
"""


@pytest.fixture(scope="module")
def sample() -> ProtoSchema:
    return parse_proto(SAMPLE_PROTO, root="SampleMessage")


def test_parse_and_spark_type_mapping(sample):
    """Scalar map parity with proto_base.rb:9-25 SQL_MAP: int32 family →
    integer, int64 family → bigint, bool → boolean, float → float,
    repeated → array, message → record, map → map."""
    s = parse_proto(SCALARS_PROTO).struct
    assert isinstance(s["a"].dataType, T.IntegerType)
    assert isinstance(s["b"].dataType, T.LongType)
    assert isinstance(s["c"].dataType, T.IntegerType)
    assert isinstance(s["d"].dataType, T.LongType)
    assert isinstance(s["e"].dataType, T.IntegerType)
    assert isinstance(s["f"].dataType, T.LongType)
    assert isinstance(s["g"].dataType, T.IntegerType)
    assert isinstance(s["h"].dataType, T.LongType)
    assert isinstance(s["i"].dataType, T.IntegerType)
    assert isinstance(s["j"].dataType, T.LongType)
    assert isinstance(s["k"].dataType, T.FloatType)
    assert isinstance(s["l"].dataType, T.DoubleType)
    assert isinstance(s["m"].dataType, T.BooleanType)
    assert isinstance(s["n"].dataType, T.BinaryType)
    assert isinstance(s["o"].dataType, T.StringType)
    assert s["p"].dataType == T.ArrayType(T.IntegerType(), True)

    st = sample.struct
    assert isinstance(st["timestamp"].dataType, T.TimestampType)
    assert isinstance(st["nested"].dataType, T.StructType)
    assert st["str_map"].dataType == T.MapType(T.StringType(), T.StringType(), True)
    assert sample.full_name == "sample.v1.SampleMessage"


def test_wire_vectors(sample):
    msg = parse_proto(SCALARS_PROTO).message
    # int32 a=1 → tag (1<<3)|0 = 0x08, varint 1
    assert encode_message(msg, {"a": 1}) == b"\x08\x01"
    # negative int32 → 10-byte two's-complement varint
    assert encode_message(msg, {"a": -1}) == b"\x08" + b"\xff" * 9 + b"\x01"
    # sint32 e=-1 → zigzag 1
    assert encode_message(msg, {"e": -1}) == b"\x28\x01"
    # sint64 f=1 → zigzag 2
    assert encode_message(msg, {"f": 1}) == b"\x30\x02"
    # fixed32 g=1 → tag (7<<3)|5 = 0x3d + 4-byte LE
    assert encode_message(msg, {"g": 1}) == b"\x3d\x01\x00\x00\x00"
    # string o="foo" → tag (15<<3)|2 = 0x7a, len 3
    assert encode_message(msg, {"o": "foo"}) == b"\x7a\x03foo"
    # packed repeated p=[1,2,3] → tag (16<<3)|2 = 0x82 0x01, len 3
    assert encode_message(msg, {"p": [1, 2, 3]}) == b"\x82\x01\x03\x01\x02\x03"
    # proto3 default omission: zero/empty values produce empty bytes
    assert encode_message(
        msg, {"a": 0, "m": False, "o": "", "n": b"", "p": []}
    ) == b""
    # sample.proto: str="string"(field 1), num=123(field 2)
    assert (
        encode_message(sample.message, {"str": "string", "num": 123})
        == b"\x0a\x06string\x10\x7b"
    )


def test_wire_roundtrip_full(sample):
    value = {
        "str": "string",
        "num": 123,
        "str_arr": ["one", "two"],
        "flag": True,
        "timestamp": dt.datetime(2017, 1, 1),
        "nested": {"nested_str": "string", "nested_num": 0},
        "non_union_nested": {"nested_str": "", "nested_num": 456},
        "str_map": {"foo": "bar", "baz": "qux"},
        "message_id": "id-1",
    }
    back = decode_message(sample.message, encode_message(sample.message, value))
    assert back["str"] == "string" and back["num"] == 123
    assert back["str_arr"] == ["one", "two"] and back["flag"] is True
    assert back["timestamp"] == dt.datetime(2017, 1, 1)
    assert back["nested"] == {"nested_str": "string", "nested_num": 0}
    assert back["non_union_nested"] == {"nested_str": "", "nested_num": 456}
    assert back["str_map"] == {"foo": "bar", "baz": "qux"}
    assert back["message_id"] == "id-1"
    assert back["union_str"] is None  # unset oneof branch


def test_oneof_branch_presence(sample):
    # a oneof scalar encodes even at its default value (presence semantics)
    enc = encode_message(sample.message, {"union_str": ""})
    assert enc == b"\x3a\x00"  # tag (7<<3)|2, len 0
    back = decode_message(sample.message, enc)
    assert back["union_str"] == "" and back["nested"] is None


def test_scalar_roundtrip_extremes():
    msg = parse_proto(SCALARS_PROTO).message
    value = {
        "a": -(2**31), "b": -(2**63), "c": 2**32 - 1, "d": 2**64 - 1,
        "e": -(2**31), "f": 2**62, "g": 2**32 - 1, "h": 2**64 - 1,
        "i": -(2**31), "j": -(2**63), "k": 1.5, "l": -2.5e300,
        "m": True, "n": b"\x00\xff", "o": "é中", "p": [-1, 0, 1],
    }
    assert decode_message(msg, encode_message(msg, value)) == value


def test_unknown_fields_skipped(sample):
    # encode with the full schema, decode with a reduced one (forward compat)
    reduced = parse_proto(
        "syntax = \"proto3\"; message SampleMessage { string str = 1; }"
    )
    enc = encode_message(sample.message, {"str": "keep", "num": 99,
                                          "str_arr": ["drop"]})
    assert decode_message(reduced.message, enc) == {"str": "keep"}


def test_spark_codec_roundtrip(spark, sample):
    from deimos_spark.schemas.codecs import get_codec

    codec = get_codec("proto", sample)
    df = spark.createDataFrame(
        [
            Row(
                str="a", num=1, str_arr=["x"], flag=True,
                timestamp=dt.datetime(2017, 1, 1), nested=None,
                union_str="u", non_union_nested=Row(nested_str="n", nested_num=2),
                str_map={"k": "v"}, message_id="m1",
            )
        ],
        sample.struct,
    ).withColumn("v", F.struct(*sample.struct.fieldNames()))
    enc = df.select(codec.encode(F.col("v")).alias("bytes"))
    wire = bytes(enc.head()["bytes"])
    # wire bytes match the direct encoder exactly
    assert wire == encode_message(
        sample.message,
        {
            "str": "a", "num": 1, "str_arr": ["x"], "flag": True,
            "timestamp": dt.datetime(2017, 1, 1), "union_str": "u",
            "non_union_nested": {"nested_str": "n", "nested_num": 2},
            "str_map": {"k": "v"}, "message_id": "m1",
        },
    )
    back = enc.select(codec.decode(F.col("bytes")).alias("v")).head()["v"]
    assert back["str"] == "a" and back["num"] == 1
    assert back["timestamp"] == dt.datetime(2017, 1, 1)
    assert back["non_union_nested"]["nested_num"] == 2
    assert back["str_map"] == {"k": "v"}
    assert back["nested"] is None

    # tombstone: NULL bytes → NULL struct
    tomb = spark.createDataFrame([Row(bytes=None)], "bytes binary").select(
        codec.decode(F.col("bytes")).alias("v")
    )
    assert tomb.head()["v"] is None


def test_producer_proto_topic_sorted_json_keys(spark, sample):
    """End-to-end produce with codec='proto': value is proto wire bytes,
    key is SORTED JSON (proto_base.rb:58-60 — proto binary is unstable
    for partitioning), tombstones stay NULL."""
    import json

    from deimos_spark.streaming.producer import Producer, TopicConfig

    prod = Producer(
        TopicConfig(topic="sample", schema=sample, key_field="str", codec="proto")
    )
    df = spark.createDataFrame(
        [
            Row(
                str="k1", num=5, str_arr=[], flag=False, timestamp=None,
                nested=None, union_str=None, non_union_nested=None,
                str_map={}, message_id="m",
            ),
            Row(
                str="k2", num=None, str_arr=None, flag=None, timestamp=None,
                nested=None, union_str=None, non_union_nested=None,
                str_map=None, message_id=None,
            ),
        ],
        sample.struct,
    )
    msgs = {json.loads(bytes(m["key"]))["str"]: m
            for m in prod.build_messages(df).collect()}
    assert bytes(msgs["k1"]["key"]) == b'{"str":"k1"}'  # sorted JSON key
    live = decode_message(sample.message, bytes(msgs["k1"]["value"]))
    assert live["num"] == 5 and live["message_id"] == "m"
    assert msgs["k2"]["value"] is None  # all-NULL payload → tombstone


def test_proto_registry_framing(spark, sample):
    from deimos_spark.schemas.codecs import (
        add_proto_registry_frame,
        extract_schema_id,
        strip_proto_registry_frame,
    )

    df = spark.createDataFrame([Row(b=b"\x0a\x01x")], "b binary")
    framed = df.select(add_proto_registry_frame(F.col("b"), 7).alias("f"))
    raw = bytes(framed.head()["f"])
    assert raw == b"\x00" + (7).to_bytes(4, "big") + b"\x00" + b"\x0a\x01x"
    back = framed.select(
        strip_proto_registry_frame(F.col("f")).alias("b"),
        extract_schema_id(F.col("f")).alias("sid"),
    ).head()
    assert bytes(back["b"]) == b"\x0a\x01x" and back["sid"] == 7


def test_key_schema_slicing(sample):
    key = sample.key_schema("str")
    assert key.name == "SampleMessageKey"
    assert key.struct.fieldNames() == ["str"]
    assert isinstance(key.struct["str"].dataType, T.StringType)


# ----------------------------------------- round-3: map value types

MAPS_PROTO = """
syntax = "proto3";
import "google/protobuf/timestamp.proto";
enum Level {
  LEVEL_UNSPECIFIED = 0;
  LEVEL_HIGH = 1;
}
message MapHolder {
  map<string, bytes> blob_map = 1;
  map<string, google.protobuf.Timestamp> ts_map = 2;
  map<string, Level> level_map = 3;
  map<string, int64> num_map = 4;
}
"""


@pytest.fixture(scope="module")
def maps_schema():
    return parse_proto(MAPS_PROTO, root="MapHolder")


def test_map_value_types_parse_and_spark_mapping(maps_schema):
    root = maps_schema.message
    by_name = {f.name: f for f in root.fields}
    assert by_name["blob_map"].map_value == "bytes"
    assert by_name["ts_map"].map_value == "timestamp"
    assert by_name["level_map"].map_value == "enum"
    assert by_name["level_map"].map_value_symbols == [
        "LEVEL_UNSPECIFIED", "LEVEL_HIGH",
    ]
    struct = maps_schema.struct
    vt = {f.name: f.dataType for f in struct.fields}
    assert vt["blob_map"] == T.MapType(T.StringType(), T.BinaryType(), True)
    assert vt["ts_map"] == T.MapType(T.StringType(), T.TimestampType(), True)
    assert vt["level_map"] == T.MapType(T.StringType(), T.StringType(), True)


def test_map_scalar_bytes_and_timestamp_wire_roundtrip(maps_schema):
    ts = dt.datetime(2024, 3, 1, 12, 30, 0, 250000, tzinfo=dt.timezone.utc)
    value = {
        "blob_map": {"k1": b"\x00\xffraw", "k2": b""},
        "ts_map": {"t": ts},
        "level_map": {"x": "LEVEL_HIGH"},
        "num_map": {"n": 42},
    }
    buf = encode_message(maps_schema.message, value)
    out = decode_message(maps_schema.message, buf)
    assert out["blob_map"] == {"k1": b"\x00\xffraw", "k2": b""}
    # decode yields naive-UTC datetimes (Spark TimestampType convention)
    assert out["ts_map"] == {"t": ts.replace(tzinfo=None)}
    assert out["level_map"] == {"x": "LEVEL_HIGH"}
    assert out["num_map"] == {"n": 42}


def test_json_hop_converts_scalar_map_values(maps_schema):
    """Spark to_json emits bytes as base64 and timestamps as ISO strings;
    the JSON-hop normalizer must convert them in MAP VALUE position too
    (round-2 ADVICE defect)."""
    import base64

    from deimos_spark.schemas.protowire import json_to_proto_dict

    payload = {
        "blob_map": {"k": base64.b64encode(b"\x01\x02binary").decode()},
        "ts_map": {"t": "2024-03-01T12:30:00.250Z"},
        "num_map": {"n": 7},
    }
    norm = json_to_proto_dict(maps_schema.message, payload)
    assert norm["blob_map"] == {"k": b"\x01\x02binary"}
    assert norm["ts_map"]["t"] == dt.datetime(
        2024, 3, 1, 12, 30, 0, 250000, tzinfo=dt.timezone.utc
    )
    # and the normalized dict encodes + decodes losslessly
    buf = encode_message(maps_schema.message, norm)
    out = decode_message(maps_schema.message, buf)
    assert out["blob_map"] == {"k": b"\x01\x02binary"}


def test_unknown_map_value_message_raises():
    bad = """
    syntax = "proto3";
    message Holder { map<string, NoSuchType> m = 1; }
    """
    with pytest.raises(ValueError, match="unknown map value type"):
        parse_proto(bad, root="Holder")


@pytest.mark.parametrize("seed", range(1))
def test_map_fuzz_roundtrip(maps_schema, seed):
    from hypothesis import given, settings
    from hypothesis import strategies as st

    keys = st.text(min_size=0, max_size=8)

    @settings(max_examples=60, deadline=None)
    @given(
        blob=st.dictionaries(keys, st.binary(max_size=32), max_size=5),
        nums=st.dictionaries(
            keys, st.integers(-(2**63), 2**63 - 1), max_size=5
        ),
        levels=st.dictionaries(
            keys, st.sampled_from(["LEVEL_UNSPECIFIED", "LEVEL_HIGH"]), max_size=4
        ),
    )
    def run(blob, nums, levels):
        value = {"blob_map": blob, "num_map": nums, "level_map": levels}
        out = decode_message(
            maps_schema.message, encode_message(maps_schema.message, value)
        )
        assert out["blob_map"] == blob
        assert out["num_map"] == nums
        assert out["level_map"] == levels

    run()


# ------------------------------- round-6: corrupt-wire containment


@settings(max_examples=200, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.binary(min_size=0, max_size=200))
def test_decode_fuzz_contained(sample, blob):
    """Arbitrary bytes must decode or raise typed ProtoWireError — never
    a raw IndexError/struct.error that would kill a Spark task (the
    executor-poisoning class; same discipline as the media/DV/OCF
    codecs)."""
    from deimos_spark.schemas.protowire import ProtoWireError

    try:
        decode_message(sample.message, blob)
    except ProtoWireError:
        pass


@settings(max_examples=100, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.integers(0, 500), st.integers(0, 255))
def test_decode_byteflip_fuzz_contained(sample, pos, val):
    from deimos_spark.schemas.protowire import ProtoWireError

    base = encode_message(
        sample.message,
        {"str": "abc", "num": 7, "str_arr": ["x", "y"], "flag": True,
         "message_id": "m1"},
    )
    data = bytearray(base)
    data[pos % len(data)] = val
    try:
        decode_message(sample.message, bytes(data))
    except ProtoWireError:
        pass
