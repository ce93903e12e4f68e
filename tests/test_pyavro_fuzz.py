"""Property-based round-trip fuzzing of the pure-Python Avro binary codec.

Driver-side only (no Spark session needed) — hammers the varint/zigzag
arithmetic, unicode length prefixes, union branch selection, and nested
container encoding with randomized values.
"""

from hypothesis import given, settings
from hypothesis import strategies as st

from deimos_spark.schemas.pyavro import decode_record, encode_record

LONG_MIN, LONG_MAX = -(1 << 63), (1 << 63) - 1
INT_MIN, INT_MAX = -(1 << 31), (1 << 31) - 1

SCHEMA = {
    "type": "record",
    "name": "Fuzz",
    "fields": [
        {"name": "i", "type": "int"},
        {"name": "l", "type": "long"},
        {"name": "d", "type": "double"},
        {"name": "s", "type": "string"},
        {"name": "b", "type": "boolean"},
        {"name": "opt", "type": ["null", "long"]},
        {"name": "arr", "type": {"type": "array", "items": "long"}},
        {"name": "m", "type": {"type": "map", "values": "string"}},
        {
            "name": "rec",
            "type": {
                "type": "record",
                "name": "Inner",
                "fields": [{"name": "x", "type": ["null", "string"]}],
            },
        },
    ],
}

values = st.fixed_dictionaries(
    {
        "i": st.integers(INT_MIN, INT_MAX),
        "l": st.integers(LONG_MIN, LONG_MAX),
        "d": st.floats(allow_nan=False),  # NaN breaks == comparison only
        "s": st.text(max_size=64),
        "b": st.booleans(),
        "opt": st.one_of(st.none(), st.integers(LONG_MIN, LONG_MAX)),
        "arr": st.lists(st.integers(LONG_MIN, LONG_MAX), max_size=8),
        "m": st.dictionaries(st.text(max_size=8), st.text(max_size=8), max_size=4),
        "rec": st.fixed_dictionaries({"x": st.one_of(st.none(), st.text(max_size=16))}),
    }
)


@settings(max_examples=300, deadline=None)
@given(values)
def test_roundtrip(value):
    assert decode_record(SCHEMA, encode_record(SCHEMA, value)) == value


@settings(max_examples=200, deadline=None)
@given(st.integers(LONG_MIN, LONG_MAX))
def test_varint_extremes(n):
    schema = {"type": "record", "name": "L", "fields": [{"name": "v", "type": "long"}]}
    assert decode_record(schema, encode_record(schema, {"v": n})) == {"v": n}


@settings(max_examples=100, deadline=None)
@given(st.floats(width=32, allow_nan=False))
def test_float32_roundtrip(f):
    schema = {"type": "record", "name": "F", "fields": [{"name": "v", "type": "float"}]}
    assert decode_record(schema, encode_record(schema, {"v": f})) == {"v": f}
