"""Property fuzz for the Iceberg single-value parser (v3 defaults):
for ARBITRARY (type, json-value) pairs — including nested
struct/list/map types — `single_value_from_json` either returns a
parsed value or raises IcebergProtocolError. It must NEVER leak a
stdlib exception (ValueError/TypeError/KeyError/binascii/decimal):
the reader gate at table open catches IcebergProtocolError only, so
a leaked stdlib error would crash the open path with an unnamed
failure instead of the loud protocol refusal the contract promises.

Round-trip property: a value parsed from a WELL-FORMED serialization
re-parses identically (parsing is deterministic, no global state).
"""

from hypothesis import given, settings, strategies as st

from deimos_spark.operators.iceberg_interop import (
    IcebergProtocolError,
    single_value_from_json,
)

PRIMS = st.sampled_from(
    [
        "boolean", "int", "long", "float", "double", "string", "uuid",
        "date", "timestamp", "timestamptz", "timestamp_ns",
        "timestamptz_ns", "decimal(9,2)", "decimal(38,10)", "binary",
        "fixed[4]", "unknown", "variant", "geometry", "not-a-type",
    ]
)


def _nested(children):
    ids = st.integers(min_value=1, max_value=9)
    field = st.fixed_dictionaries(
        {
            "id": ids,
            "name": st.sampled_from(["a", "b", "c"]),
            "required": st.booleans(),
            "type": children,
        }
    )
    return st.one_of(
        st.fixed_dictionaries(
            {"type": st.just("struct"),
             "fields": st.lists(field, max_size=3)}
        ),
        st.fixed_dictionaries(
            {"type": st.just("list"), "element-id": ids,
             "element": children}
        ),
        st.fixed_dictionaries(
            {"type": st.just("map"), "key-id": ids, "key": children,
             "value-id": ids, "value": children}
        ),
    )


TYPES = st.recursive(PRIMS, _nested, max_leaves=6)

JSON_VALUES = st.recursive(
    st.one_of(
        st.none(),
        st.booleans(),
        st.integers(min_value=-(2**63), max_value=2**63),
        st.floats(allow_nan=False, allow_infinity=False),
        st.text(max_size=24),
        st.sampled_from(
            [
                "2020-02-29", "2017-11-16T22:31:08",
                "2017-11-16T22:31:08+00:00",
                "1970-01-01T00:00:01.000000001", "14.20", "1F2A", "F0F",
            ]
        ),
    ),
    lambda ch: st.one_of(
        st.lists(ch, max_size=3),
        st.dictionaries(
            st.sampled_from(["1", "2", "9", "keys", "values", "a"]),
            ch,
            max_size=3,
        ),
    ),
    max_leaves=8,
)


@settings(max_examples=300, deadline=None)
@given(t=TYPES, v=JSON_VALUES)
def test_parse_or_protocol_error_never_stdlib(t, v):
    try:
        parsed = single_value_from_json(t, v)
    except IcebergProtocolError:
        return
    # a successful parse is deterministic
    assert single_value_from_json(t, v) == parsed
