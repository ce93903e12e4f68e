"""Producer extras: sorted-JSON keys, headers passthrough, partition-key
override, registry-framed codec."""

import json

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from deimos_spark.schemas.avro import parse_avsc
from deimos_spark.schemas.codecs import RegistryFramedCodec, get_codec
from deimos_spark.streaming.producer import Producer, TopicConfig

COMPOUND = parse_avsc(
    {
        "type": "record",
        "name": "Compound",
        "fields": [
            {"name": "part_two", "type": "string"},
            {"name": "part_one", "type": "string"},
            {"name": "v", "type": "int"},
        ],
    }
)

COMPOUND_KEY = parse_avsc(
    {
        "type": "record",
        "name": "Compound_key",
        "fields": [
            {"name": "part_two", "type": "string"},
            {"name": "part_one", "type": "string"},
        ],
    }
)


def test_sorted_json_keys_are_canonical(spark):
    p = Producer(
        TopicConfig(
            topic="t", schema=COMPOUND, key_schema=COMPOUND_KEY,
            sorted_json_keys=True,
        )
    )
    m = p.build_messages(
        spark.createDataFrame([Row(part_two="b", part_one="a", v=1)])
    ).head()
    # declared field order is (part_two, part_one); canonical bytes sort keys
    assert bytes(m["key"]).decode() == '{"part_one":"a","part_two":"b"}'


def test_multifield_key_schema_encoding(spark):
    p = Producer(TopicConfig(topic="t", schema=COMPOUND, key_schema=COMPOUND_KEY))
    m = p.build_messages(
        spark.createDataFrame([Row(part_two="b", part_one="a", v=1)])
    ).head()
    assert json.loads(bytes(m["key"])) == {"part_two": "b", "part_one": "a"}


def test_headers_passthrough(spark):
    schema = parse_avsc(
        {"type": "record", "name": "S",
         "fields": [{"name": "test_id", "type": "string"}]}
    )
    p = Producer(TopicConfig(topic="t", schema=schema, key_field="test_id"))
    df = spark.createDataFrame([Row(test_id="a", headers={"trace": "xyz"})])
    m = p.build_messages(df).head()
    assert json.loads(bytes(m["headers"])) == {"trace": "xyz"}
    # absent headers → NULL column, still present in the shape
    m2 = p.build_messages(spark.createDataFrame([Row(test_id="b")])).head()
    assert m2["headers"] is None


def test_partition_key_override_schema_field(spark):
    p = Producer(
        TopicConfig(topic="t", schema=COMPOUND, key_schema=COMPOUND_KEY,
                    partition_key_col="part_one")
    )
    m = p.build_messages(
        spark.createDataFrame([Row(part_two="b", part_one="a", v=1)])
    ).head()
    assert bytes(m["partition_key"]).decode() == "a"


def test_partition_key_override_non_schema_col(spark):
    schema = parse_avsc(
        {"type": "record", "name": "S",
         "fields": [{"name": "test_id", "type": "string"}]}
    )
    p = Producer(
        TopicConfig(topic="t", schema=schema, key_field="test_id",
                    partition_key_col="route")
    )
    m = p.build_messages(
        spark.createDataFrame([Row(test_id="a", route="shard7")])
    ).head()
    assert bytes(m["partition_key"]).decode() == "shard7"
    with pytest.raises(ValueError, match="not in payload"):
        p.build_messages(spark.createDataFrame([Row(test_id="a")]))


def test_registry_framed_codec_roundtrip(spark):
    schema = parse_avsc(
        {"type": "record", "name": "S",
         "fields": [{"name": "test_id", "type": "string"}]}
    )
    framed = RegistryFramedCodec(get_codec("json", schema), schema_id=7)
    df = spark.createDataFrame([Row(test_id="a")])
    out = df.select(
        framed.decode(framed.encode(F.struct("test_id"))).alias("p")
    ).head()
    assert out["p"]["test_id"] == "a"
    raw = df.select(framed.encode(F.struct("test_id")).alias("b")).head()["b"]
    assert bytes(raw)[:5] == b"\x00\x00\x00\x00\x07"  # magic + id 7
