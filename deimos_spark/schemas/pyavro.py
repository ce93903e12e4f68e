"""Pure-Python Avro *binary* serializer/deserializer.

The reference's wire format is binary Avro (schema_backends/avro_local.rb
behavior); the spark-avro jar is not loadable in every deployment (and not
in this sandbox), so this module implements the Avro 1.x binary encoding —
a public, stable spec — for the schema subset the engine supports:

  record / int / long / float / double / boolean / string / bytes /
  enum / array / map / union (any branches; [null, T] is the common case)

Encoding rules (Avro spec "Binary encoding"):
- int/long: zigzag-mapped base-128 varint, little-endian groups
- float/double: IEEE-754 little-endian 4/8 bytes
- boolean: 1 byte (0/1)
- string/bytes: long(length) + utf8/raw bytes
- enum: int(symbol index)
- array/map: long(count) + items, terminated by count 0 (single block)
- union: long(branch index) + encoded branch
- record: fields in declared order, no framing

Used by PyAvroCodec (schemas/codecs.py) through Arrow-batched pandas UDFs.
Per-row Python costs ~1-2 µs/field — fine for the produce/consume paths it
serves; where the spark-avro jar is present, AvroCodec's JVM path wins and
the two are wire-compatible (round-trip tested).
"""

from __future__ import annotations

import struct as _struct
from typing import Any


# ---------------------------------------------------------------- encoding

def _zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _unzigzag(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def _write_varint(out: bytearray, n: int) -> None:
    n = _zigzag(n) & 0xFFFFFFFFFFFFFFFF
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    shift, acc = 0, 0
    while True:
        b = buf[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    # interpret as 64-bit two's complement before unzigzag
    if acc >= 1 << 64:
        raise ValueError("varint overflow")
    return _unzigzag(acc), pos


def _union_branch(schema: list, value: Any) -> int:
    """Pick the first branch matching the runtime value (reference
    behavior: avro_schema_coercer.rb union selection — null branch for
    None, else first type-compatible branch; records matched by dict)."""
    for i, b in enumerate(schema):
        t = b["type"] if isinstance(b, dict) else b
        if value is None and t == "null":
            return i
        if value is None:
            continue
        if t in ("int", "long") and isinstance(value, int) and not isinstance(value, bool):
            return i
        if t in ("float", "double") and isinstance(value, (int, float)) and not isinstance(value, bool):
            return i
        if t == "boolean" and isinstance(value, bool):
            return i
        if t in ("string", "enum") and isinstance(value, str):
            return i
        if t == "bytes" and isinstance(value, (bytes, bytearray, str)):
            # str accepted (utf-8-encoded by the bytes branch) — matches
            # the string-branch-first ordering above, so a [string, bytes]
            # union still picks string for str values
            return i
        if t == "record" and isinstance(value, dict):
            return i
        if t == "array" and isinstance(value, (list, tuple)):
            return i
        if t == "map" and isinstance(value, dict):
            return i
    raise ValueError(f"no union branch in {schema!r} matches {value!r}")


def encode_value(schema: Any, value: Any, out: bytearray) -> None:
    if isinstance(schema, list):  # union
        idx = _union_branch(schema, value)
        _write_varint(out, idx)
        encode_value(schema[idx], value, out)
        return
    t = schema["type"] if isinstance(schema, dict) else schema
    if t == "null":
        return
    if value is None:
        raise ValueError(f"null value for non-nullable type {t}")
    if t == "boolean":
        out.append(1 if value else 0)
    elif t in ("int", "long"):
        _write_varint(out, int(value))
    elif t == "float":
        out += _struct.pack("<f", float(value))
    elif t == "double":
        out += _struct.pack("<d", float(value))
    elif t == "string":
        raw = str(value).encode("utf-8")
        _write_varint(out, len(raw))
        out += raw
    elif t == "bytes":
        # str accepted for direct-dict callers (Ruby Avro treats bytes as
        # String); the JSON-hop codec path converts base64 → bytes before
        # reaching here (json_to_avro_dict)
        raw = value.encode("utf-8") if isinstance(value, str) else bytes(value)
        _write_varint(out, len(raw))
        out += raw
    elif t == "enum":
        syms = schema["symbols"]
        try:
            _write_varint(out, syms.index(value))
        except ValueError:
            raise ValueError(f"{value!r} not in enum {schema.get('name')}") from None
    elif t == "array":
        items = list(value)
        if items:
            _write_varint(out, len(items))
            for v in items:
                encode_value(schema["items"], v, out)
        _write_varint(out, 0)
    elif t == "map":
        entries = dict(value)
        if entries:
            _write_varint(out, len(entries))
            for k, v in entries.items():
                raw = str(k).encode("utf-8")
                _write_varint(out, len(raw))
                out += raw
                encode_value(schema["values"], v, out)
        _write_varint(out, 0)
    elif t == "record":
        for f in schema["fields"]:
            try:
                encode_value(f["type"], value.get(f["name"]), out)
            except ValueError as e:
                raise ValueError(f"field {f['name']!r}: {e}") from None
    else:
        raise ValueError(f"unsupported Avro type: {t!r}")


def encode_record(schema: dict, value: dict) -> bytes:
    out = bytearray()
    encode_value(schema, value, out)
    return bytes(out)


def json_to_avro_dict(schema: Any, value: Any) -> Any:
    """Normalize a JSON-decoded payload for binary-Avro encoding: Spark's
    to_json renders BinaryType columns as base64 strings, so every
    bytes-typed position converts base64-str → bytes. Other positions pass
    through (unions recurse into the branch matching the value)."""
    import base64

    if value is None:
        return None
    if isinstance(schema, list):  # union: convert per the value-matched branch
        for b in schema:
            t = b["type"] if isinstance(b, dict) else b
            if t == "bytes" and isinstance(value, str):
                return base64.b64decode(value)
            if t in ("record", "map") and isinstance(value, dict):
                return json_to_avro_dict(b, value)
            if t == "array" and isinstance(value, (list, tuple)):
                return json_to_avro_dict(b, value)
        return value
    t = schema["type"] if isinstance(schema, dict) else schema
    if t == "bytes" and isinstance(value, str):
        return base64.b64decode(value)
    if t == "record":
        return {
            f["name"]: json_to_avro_dict(f["type"], value.get(f["name"]))
            for f in schema["fields"]
        }
    if t == "array":
        return [json_to_avro_dict(schema["items"], v) for v in value]
    if t == "map":
        return {k: json_to_avro_dict(schema["values"], v) for k, v in value.items()}
    return value


# ---------------------------------------------------------------- decoding

def decode_value(schema: Any, buf: bytes, pos: int) -> tuple[Any, int]:
    if isinstance(schema, list):  # union
        idx, pos = _read_varint(buf, pos)
        return decode_value(schema[idx], buf, pos)
    t = schema["type"] if isinstance(schema, dict) else schema
    if t == "null":
        return None, pos
    if t == "boolean":
        return buf[pos] != 0, pos + 1
    if t in ("int", "long"):
        return _read_varint(buf, pos)
    if t == "float":
        return _struct.unpack_from("<f", buf, pos)[0], pos + 4
    if t == "double":
        return _struct.unpack_from("<d", buf, pos)[0], pos + 8
    if t in ("string", "bytes"):
        n, pos = _read_varint(buf, pos)
        raw = buf[pos : pos + n]
        return (raw.decode("utf-8") if t == "string" else bytes(raw)), pos + n
    if t == "enum":
        i, pos = _read_varint(buf, pos)
        return schema["symbols"][i], pos
    if t == "array":
        items = []
        while True:
            n, pos = _read_varint(buf, pos)
            if n == 0:
                break
            if n < 0:  # block with byte-size prefix (spec-permitted)
                _, pos = _read_varint(buf, pos)
                n = -n
            for _ in range(n):
                v, pos = decode_value(schema["items"], buf, pos)
                items.append(v)
        return items, pos
    if t == "map":
        entries: dict[str, Any] = {}
        while True:
            n, pos = _read_varint(buf, pos)
            if n == 0:
                break
            if n < 0:
                _, pos = _read_varint(buf, pos)
                n = -n
            for _ in range(n):
                klen, pos = _read_varint(buf, pos)
                k = buf[pos : pos + klen].decode("utf-8")
                pos += klen
                v, pos = decode_value(schema["values"], buf, pos)
                entries[k] = v
        return entries, pos
    if t == "record":
        rec = {}
        for f in schema["fields"]:
            rec[f["name"]], pos = decode_value(f["type"], buf, pos)
        return rec, pos
    raise ValueError(f"unsupported Avro type: {t!r}")


def decode_record(schema: dict, data: bytes, reader_schema: dict | None = None) -> dict:
    """Decode; with `reader_schema`, apply Avro schema resolution (public
    spec): writer-only fields are decoded-and-skipped, reader-only fields
    take their default, primitive promotions apply (int→long/float/double,
    long→float/double, float→double, string↔bytes)."""
    if reader_schema is None or reader_schema == schema:
        value, pos = decode_value(schema, data, 0)
    else:
        value, pos = _decode_resolved(schema, reader_schema, data, 0)
    if pos != len(data):
        raise ValueError(f"trailing bytes after record: {len(data) - pos}")
    return value


def _promote(value: Any, wt: str, rt: str) -> Any:
    if wt == rt:
        return value
    if wt in ("int", "long") and rt in ("float", "double"):
        return float(value)
    if wt == "float" and rt == "double":
        return value
    if wt == "string" and rt == "bytes":
        return value.encode("utf-8")
    if wt == "bytes" and rt == "string":
        # non-UTF8 writer bytes must not fail the whole batch: promote with
        # replacement chars (matches Java Avro's lenient Utf8 rendering)
        return value.decode("utf-8", errors="replace")
    return value  # int→long needs no change


def _decode_resolved(writer: Any, reader: Any, buf: bytes, pos: int) -> tuple[Any, int]:
    if isinstance(writer, list):  # writer union: branch tag then resolve branch
        idx, pos = _read_varint(buf, pos)
        return _decode_resolved(writer[idx], reader, buf, pos)
    if isinstance(reader, list):  # non-union writer into reader union
        from deimos_spark.schemas.compat import can_read

        branch = next((b for b in reader if can_read(writer, b)), None)
        if branch is None:
            raise ValueError(f"no reader union branch accepts writer {writer!r}")
        return _decode_resolved(writer, branch, buf, pos)

    wt = writer["type"] if isinstance(writer, dict) else writer
    rt = reader["type"] if isinstance(reader, dict) else reader

    if wt == "record" and rt == "record":
        rfields = {f["name"]: f for f in reader["fields"]}
        rec: dict[str, Any] = {}
        for wf in writer["fields"]:
            if wf["name"] in rfields:
                rec[wf["name"]], pos = _decode_resolved(
                    wf["type"], rfields[wf["name"]]["type"], buf, pos
                )
            else:  # writer-only: decode to advance the cursor, then discard
                _, pos = decode_value(wf["type"], buf, pos)
        wnames = {f["name"] for f in writer["fields"]}
        for rf in reader["fields"]:
            if rf["name"] not in wnames:
                rec[rf["name"]] = rf.get("default")
        return rec, pos
    if wt == "enum" and rt == "enum":
        i, pos = _read_varint(buf, pos)
        sym = writer["symbols"][i]
        if sym not in reader["symbols"]:
            sym = reader.get("default", sym)
        return sym, pos
    if wt == "array" and rt == "array":
        # decode with writer item schema resolved against reader's
        items = []
        while True:
            n, pos = _read_varint(buf, pos)
            if n == 0:
                break
            if n < 0:
                _, pos = _read_varint(buf, pos)
                n = -n
            for _ in range(n):
                v, pos = _decode_resolved(writer["items"], reader["items"], buf, pos)
                items.append(v)
        return items, pos
    if wt == "map" and rt == "map":
        entries: dict[str, Any] = {}
        while True:
            n, pos = _read_varint(buf, pos)
            if n == 0:
                break
            if n < 0:
                _, pos = _read_varint(buf, pos)
                n = -n
            for _ in range(n):
                klen, pos = _read_varint(buf, pos)
                k = buf[pos : pos + klen].decode("utf-8")
                pos += klen
                entries[k], pos = _decode_resolved(
                    writer["values"], reader["values"], buf, pos
                )
        return entries, pos
    value, pos = decode_value(writer, buf, pos)
    return _promote(value, wt, rt), pos
