"""Schema-evolution: compatibility checking + reader-schema resolution
(public Avro spec 'Schema Resolution' rules)."""

import pytest

from deimos_spark.schemas.compat import can_read, compat_errors
from deimos_spark.schemas.pyavro import decode_record, encode_record

V1 = {
    "type": "record",
    "name": "Widget",
    "fields": [
        {"name": "id", "type": "int"},
        {"name": "name", "type": "string"},
        {"name": "legacy", "type": "string"},
    ],
}

V2 = {  # id widened, legacy dropped, added-with-default, added optional
    "type": "record",
    "name": "Widget",
    "fields": [
        {"name": "id", "type": "long"},
        {"name": "name", "type": "string"},
        {"name": "score", "type": "double", "default": 0.5},
        {"name": "tag", "type": ["null", "string"], "default": None},
    ],
}

V_BAD = {  # new required field without default
    "type": "record",
    "name": "Widget",
    "fields": [
        {"name": "id", "type": "int"},
        {"name": "required_new", "type": "string"},
    ],
}


def test_can_read_matrix():
    assert can_read(V1, V2)             # widen + drop + defaults: OK
    assert not can_read(V1, V_BAD)      # new field without default: NOT OK
    assert not can_read(V2, V1)         # long → int narrowing: NOT OK
    assert can_read("int", "double")    # promotion chain
    assert can_read("string", "bytes") and can_read("bytes", "string")
    assert not can_read("double", "float")
    assert can_read(["null", "int"], ["null", "long", "string"])
    assert not can_read(["null", "string"], "string")  # null branch unreadable


def test_compat_errors_name_the_field():
    errs = compat_errors(V1, V_BAD)
    assert len(errs) == 1 and "required_new" in errs[0]
    assert compat_errors(V1, V2) == []


def test_resolved_decode_v1_data_with_v2_reader():
    data = encode_record(V1, {"id": 7, "name": "x", "legacy": "old"})
    out = decode_record(V1, data, reader_schema=V2)
    # id promoted int→long (no change), legacy skipped, defaults filled
    assert out == {"id": 7, "name": "x", "score": 0.5, "tag": None}


def test_resolved_decode_promotions_and_union():
    w = {
        "type": "record",
        "name": "P",
        "fields": [
            {"name": "a", "type": "int"},
            {"name": "b", "type": "string"},
        ],
    }
    r = {
        "type": "record",
        "name": "P",
        "fields": [
            {"name": "a", "type": "double"},
            {"name": "b", "type": ["null", "bytes"]},
        ],
    }
    out = decode_record(w, encode_record(w, {"a": 3, "b": "hi"}), reader_schema=r)
    assert out == {"a": 3.0, "b": b"hi"} and isinstance(out["a"], float)


def test_resolved_decode_enum_fallback():
    w = {"type": "record", "name": "E", "fields": [
        {"name": "e", "type": {"type": "enum", "name": "S",
                               "symbols": ["a", "b", "c"]}}]}
    r = {"type": "record", "name": "E", "fields": [
        {"name": "e", "type": {"type": "enum", "name": "S",
                               "symbols": ["a", "b"], "default": "a"}}]}
    out = decode_record(w, encode_record(w, {"e": "c"}), reader_schema=r)
    assert out == {"e": "a"}  # unknown symbol falls back to reader default


def test_resolved_decode_nested_containers():
    w = {"type": "record", "name": "N", "fields": [
        {"name": "xs", "type": {"type": "array", "items": "int"}},
        {"name": "m", "type": {"type": "map", "values": "int"}}]}
    r = {"type": "record", "name": "N", "fields": [
        {"name": "xs", "type": {"type": "array", "items": "double"}},
        {"name": "m", "type": {"type": "map", "values": "long"}},
        {"name": "extra", "type": "string", "default": "d"}]}
    out = decode_record(w, encode_record(w, {"xs": [1, 2], "m": {"k": 3}}),
                        reader_schema=r)
    assert out == {"xs": [1.0, 2.0], "m": {"k": 3}, "extra": "d"}
