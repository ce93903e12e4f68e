"""Property-based schema evolution: random writer schemas + random
*compatible* evolutions must (a) pass can_read, (b) decode every writer
payload to the reader shape with defaults/promotions applied; random
*incompatible* evolutions must be rejected.

Pure-Python (no Spark session) — exercises pyavro + compat directly.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from deimos_spark.schemas.compat import can_read
from deimos_spark.schemas.pyavro import decode_record, encode_record

PRIMS = ["int", "long", "float", "double", "string", "boolean", "bytes"]
PROMOTIONS = {
    "int": ["long", "float", "double"],
    "long": ["float", "double"],
    "float": ["double"],
    "string": ["bytes"],
    "bytes": ["string"],
}
DEFAULTS = {
    "int": 1, "long": 2, "float": 0.5, "double": 1.5,
    "string": "d", "boolean": True, "bytes": "db",  # Avro JSON default for bytes is a string
}


def _value_for(t: str, draw) -> object:
    return draw(
        {
            "int": st.integers(-(2**31), 2**31 - 1),
            "long": st.integers(-(2**62), 2**62 - 1),
            # floats must survive a float32 roundtrip for == checks: use
            # small integers-as-floats
            "float": st.integers(-1000, 1000).map(float),
            "double": st.integers(-(10**6), 10**6).map(float),
            "string": st.text(max_size=20),
            "boolean": st.booleans(),
            "bytes": st.binary(max_size=16),
        }[t]
    )


@st.composite
def writer_and_payload(draw):
    n = draw(st.integers(min_value=1, max_value=6))
    fields, payload = [], {}
    for i in range(n):
        t = draw(st.sampled_from(PRIMS))
        fields.append({"name": f"f{i}", "type": t})
        payload[f"f{i}"] = _value_for(t, draw)
    schema = {"type": "record", "name": "R", "fields": fields}
    return schema, payload


@st.composite
def compatible_evolution(draw):
    """(writer, payload, reader): reader drops a suffix of writer fields,
    promotes some kept types, and appends defaulted new fields."""
    writer, payload = draw(writer_and_payload())
    rfields = []
    for f in writer["fields"]:
        if draw(st.booleans()) or not rfields:  # keep (always keep ≥1)
            t = f["type"]
            promos = PROMOTIONS.get(t, [])
            if promos and draw(st.booleans()):
                t = draw(st.sampled_from(promos))
            rfields.append({"name": f["name"], "type": t})
    n_new = draw(st.integers(min_value=0, max_value=2))
    for j in range(n_new):
        t = draw(st.sampled_from(PRIMS))
        rfields.append({"name": f"new{j}", "type": t, "default": DEFAULTS[t]})
    reader = {"type": "record", "name": "R", "fields": rfields}
    return writer, payload, reader


def _expected(wtype: str, rtype: str, v):
    if wtype in ("int", "long") and rtype in ("float", "double"):
        return float(v)
    if wtype == "string" and rtype == "bytes":
        return v.encode("utf-8")
    if wtype == "bytes" and rtype == "string":
        return v.decode("utf-8", errors="replace")
    return v


@settings(max_examples=200, deadline=None)
@given(compatible_evolution())
def test_compatible_evolution_decodes(case):
    writer, payload, reader = case
    assert can_read(writer, reader), (writer, reader)
    data = encode_record(writer, payload)
    out = decode_record(writer, data, reader_schema=reader)
    wtypes = {f["name"]: f["type"] for f in writer["fields"]}
    for rf in reader["fields"]:
        name, rt = rf["name"], rf["type"]
        if name in wtypes:
            wt = wtypes[name]
            exp = _expected(wt, rt, payload[name])
            assert out[name] == exp, (name, wt, rt, payload[name], out[name])
        else:
            assert out[name] == rf["default"]
    assert set(out) == {f["name"] for f in reader["fields"]}


@settings(max_examples=100, deadline=None)
@given(writer_and_payload(), st.sampled_from(PRIMS))
def test_added_required_field_is_incompatible(wp, t):
    writer, _ = wp
    reader = {
        "type": "record",
        "name": "R",
        "fields": writer["fields"] + [{"name": "zz_required", "type": t}],
    }
    assert not can_read(writer, reader)


@settings(max_examples=100, deadline=None)
@given(writer_and_payload())
def test_roundtrip_identity(wp):
    schema, payload = wp
    out = decode_record(schema, encode_record(schema, payload))
    # bytes fields decode to bytes; everything else comes back ==
    assert out == payload
