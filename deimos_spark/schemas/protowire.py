"""Protobuf schema backend: minimal proto3 parser + pure-Python wire codec
+ Spark type mapping.

Behavior parity (studied from /root/reference/lib/deimos/schema_backends/
proto_base.rb, proto_local.rb, proto_schema_registry.rb — behavior only):

- Scalar → SQL map (proto_base.rb:9-25 SQL_MAP): int32/uint32/sint32/
  fixed32/sfixed32 → integer, int64 family → bigint, bool → boolean,
  bytes → string (our Spark struct keeps BinaryType; DDL flattens to
  STRING, same as the Avro backend), float → float, double → float with a
  warning (we keep DoubleType natively), message → record,
  repeated → array (proto_base.rb:75-86).
- Keys are NEVER proto-binary: proto binary encoding is unstable for
  partitioning, so keys are sorted JSON (proto_base.rb:58-60,
  README.md:284-289) — the engine's SortedJsonCodec.
- encode accepts dict payloads (proto_local.rb:18-22 builds the message
  class from a hash); decode returns a dict.
- coerce/validate are pass-through no-ops (proto_base.rb coerce/validate).

No protobuf library exists in this sandbox, so the wire format is
implemented from the public Protocol Buffers encoding spec:

  tag = (field_number << 3) | wire_type
  wire types: 0 = varint (int32/64, uint, sint(zigzag), bool, enum)
              1 = 64-bit LE (fixed64, sfixed64, double)
              2 = length-delimited (string, bytes, message, packed
                  repeated scalars, map entries)
              5 = 32-bit LE (fixed32, sfixed32, float)
  proto3: singular scalars at their default value (0 / "" / false / empty
  bytes) are omitted on the wire; oneof members are encoded when set even
  at default; repeated numeric scalars are packed; map<K,V> is a repeated
  embedded message {1: key, 2: value}; google.protobuf.Timestamp is a
  message {1: seconds varint, 2: nanos varint}.

The parser covers the proto3 subset the reference's fixture corpus uses
(spec/protos/sample/v1/sample.proto): messages (nested), enums, repeated,
map, oneof, imports of well-known Timestamp, comments.
"""

from __future__ import annotations

import datetime as _dt
import re
import struct as _struct
from dataclasses import dataclass, field as _field

from pyspark.sql import types as T

# wire types
_VARINT, _I64, _LEN, _I32 = 0, 1, 2, 5

_SCALAR_WIRE = {
    "int32": _VARINT, "int64": _VARINT, "uint32": _VARINT, "uint64": _VARINT,
    "sint32": _VARINT, "sint64": _VARINT, "bool": _VARINT, "enum": _VARINT,
    "fixed64": _I64, "sfixed64": _I64, "double": _I64,
    "fixed32": _I32, "sfixed32": _I32, "float": _I32,
    "string": _LEN, "bytes": _LEN,
}

# proto_base.rb SQL_MAP, expressed as Spark types
_SPARK_TYPES: dict[str, T.DataType] = {
    "int32": T.IntegerType(), "uint32": T.IntegerType(),
    "sint32": T.IntegerType(), "fixed32": T.IntegerType(),
    "sfixed32": T.IntegerType(),
    "int64": T.LongType(), "uint64": T.LongType(), "sint64": T.LongType(),
    "fixed64": T.LongType(), "sfixed64": T.LongType(),
    "bool": T.BooleanType(),
    "bytes": T.BinaryType(),
    "float": T.FloatType(),
    "double": T.DoubleType(),
    "string": T.StringType(),
    "timestamp": T.TimestampType(),
}


@dataclass
class ProtoField:
    name: str
    number: int
    type: str                     # scalar name | 'message' | 'enum' | 'map' | 'timestamp'
    repeated: bool = False
    message: "ProtoMessage | None" = None       # for type == 'message'
    enum_symbols: list[str] | None = None       # for type == 'enum'
    map_key: str | None = None                  # for type == 'map'
    map_value: str | None = None                # scalar | 'enum' | 'timestamp' | 'message'
    map_value_message: "ProtoMessage | None" = None
    map_value_symbols: list[str] | None = None  # for map_value == 'enum'
    oneof: str | None = None                    # owning oneof group name


@dataclass
class ProtoMessage:
    name: str
    fields: list[ProtoField] = _field(default_factory=list)

    def field_by_number(self) -> dict[int, ProtoField]:
        return {f.number: f for f in self.fields}


@dataclass
class ProtoSchema:
    """Parsed .proto file: top-level message registry + the Spark-facing
    surface the engine's TopicConfig expects (.name / .struct)."""

    package: str | None
    messages: dict[str, ProtoMessage]
    enums: dict[str, list[str]]
    root: str                       # name of the message this schema encodes
    source: str | None = None       # original .proto text (registry transport)

    @property
    def message(self) -> ProtoMessage:
        return self.messages[self.root]

    @property
    def name(self) -> str:
        return self.root

    @property
    def full_name(self) -> str:
        return f"{self.package}.{self.root}" if self.package else self.root

    @property
    def struct(self) -> T.StructType:
        return message_to_struct(self.message)

    def key_schema(self, key_field: str) -> "ProtoSchema":
        """1-field key schema sliced from the value message — the analogue
        of the Avro backend's key-schema autogen; the wire form of proto
        keys is sorted JSON regardless (proto_base.rb:58-60)."""
        src = next((f for f in self.message.fields if f.name == key_field), None)
        if src is None:
            raise KeyError(f"field {key_field!r} not in message {self.root}")
        key_msg = ProtoMessage(name=f"{self.root}Key", fields=[src])
        return ProtoSchema(
            package=self.package,
            messages={**self.messages, key_msg.name: key_msg},
            enums=self.enums,
            root=key_msg.name,
        )


def message_to_struct(msg: ProtoMessage) -> T.StructType:
    """proto3 message → StructType. All fields nullable (proto3 has no
    required); repeated → ArrayType, map → MapType, nested message →
    StructType, enum → StringType (symbol name), oneof members → one
    nullable column per branch (at most one non-NULL per row)."""
    out = []
    for f in msg.fields:
        if f.type == "map":
            if f.map_value_message is not None:
                vt: T.DataType = message_to_struct(f.map_value_message)
            elif f.map_value == "enum":
                vt = T.StringType()
            else:
                vt = _SPARK_TYPES[f.map_value]
            dt: T.DataType = T.MapType(T.StringType(), vt, True)
        elif f.type == "message":
            dt = message_to_struct(f.message)
        elif f.type == "enum":
            dt = T.StringType()
        else:
            dt = _SPARK_TYPES[f.type]
        if f.repeated:
            dt = T.ArrayType(dt, True)
        out.append(T.StructField(f.name, dt, True))
    return T.StructType(out)


# ------------------------------------------------------------------ parser

_TOKEN_RE = re.compile(
    r"""//[^\n]*|/\*.*?\*/        # comments
      |"(?:[^"\\]|\\.)*"          # string literal
      |[A-Za-z_][\w.]*            # identifier (dotted ok)
      |\d+                        # number
      |[{}<>=;,]                  # punctuation
    """,
    re.VERBOSE | re.DOTALL,
)

_WELL_KNOWN = {"google.protobuf.Timestamp": "timestamp"}


def parse_proto(src: str, root: str | None = None) -> ProtoSchema:
    """Parse a proto3 document. `root`: name of the message the schema
    encodes; defaults to the last top-level message (the fixture corpus
    convention: helper messages precede the payload message)."""
    toks = [
        t for t in _TOKEN_RE.findall(src)
        if not t.startswith("//") and not t.startswith("/*")
    ]
    pos = 0
    package: str | None = None
    messages: dict[str, ProtoMessage] = {}
    enums: dict[str, list[str]] = {}
    order: list[str] = []

    def peek() -> str | None:
        return toks[pos] if pos < len(toks) else None

    def advance() -> str:
        nonlocal pos
        t = toks[pos]
        pos += 1
        return t

    def expect(t: str) -> None:
        got = advance()
        if got != t:
            raise ValueError(f"expected {t!r}, got {got!r}")

    def skip_statement() -> None:
        while peek() not in (";", None):
            advance()
        if peek() == ";":
            advance()

    def parse_enum() -> tuple[str, list[str]]:
        name = advance()
        expect("{")
        syms: list[tuple[int, str]] = []
        while peek() != "}":
            sym = advance()
            expect("=")
            num = int(advance())
            if peek() == ";":
                advance()
            syms.append((num, sym))
        advance()  # }
        return name, [s for _, s in sorted(syms)]

    def resolve_type(tname: str, f: ProtoField) -> None:
        if tname in _WELL_KNOWN:
            f.type = _WELL_KNOWN[tname]
        elif tname in _SCALAR_WIRE:
            f.type = tname
        elif tname in enums:
            f.type = "enum"
            f.enum_symbols = enums[tname]
        else:
            f.type = "message"
            f.message = messages.get(tname.split(".")[-1])
            if f.message is None:
                raise ValueError(f"unknown message type {tname!r}")

    def parse_field(oneof: str | None = None) -> ProtoField:
        repeated = False
        tname = advance()
        if tname == "repeated":
            repeated = True
            tname = advance()
        f = ProtoField(name="", number=0, type="", repeated=repeated, oneof=oneof)
        if tname == "map":
            expect("<")
            f.map_key = advance()
            expect(",")
            vtype = advance()
            expect(">")
            f.type = "map"
            if vtype in _WELL_KNOWN:
                f.map_value = _WELL_KNOWN[vtype]
            elif vtype in _SCALAR_WIRE:
                f.map_value = vtype
            elif vtype in enums:
                f.map_value = "enum"
                f.map_value_symbols = enums[vtype]
            else:
                f.map_value = "message"
                f.map_value_message = messages.get(vtype.split(".")[-1])
                if f.map_value_message is None:
                    raise ValueError(f"unknown map value type {vtype!r}")
        else:
            resolve_type(tname, f)
        f.name = advance()
        expect("=")
        f.number = int(advance())
        if peek() == ";":
            advance()
        return f

    def parse_message() -> ProtoMessage:
        name = advance()
        expect("{")
        msg = ProtoMessage(name=name)
        while peek() != "}":
            t = peek()
            if t == "message":
                advance()
                inner = parse_message()
                messages[inner.name] = inner
            elif t == "enum":
                advance()
                ename, syms = parse_enum()
                enums[ename] = syms
            elif t == "oneof":
                advance()
                oname = advance()
                expect("{")
                while peek() != "}":
                    msg.fields.append(parse_field(oneof=oname))
                advance()
            elif t == "reserved" or t == "option":
                advance()
                skip_statement()
            else:
                msg.fields.append(parse_field())
        advance()  # }
        return msg

    while peek() is not None:
        t = advance()
        if t == "syntax" or t == "import" or t == "option":
            skip_statement()
        elif t == "package":
            package = advance()
            if peek() == ";":
                advance()
        elif t == "enum":
            name, syms = parse_enum()
            enums[name] = syms
        elif t == "message":
            msg = parse_message()
            messages[msg.name] = msg
            order.append(msg.name)
        elif t == ";":
            continue
        else:
            raise ValueError(f"unexpected top-level token {t!r}")

    if not order:
        raise ValueError("no message definitions found")
    return ProtoSchema(
        package=package, messages=messages, enums=enums,
        root=root or order[-1], source=src,
    )


# ------------------------------------------------------------------ encode

def _write_uvarint(out: bytearray, n: int) -> None:
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def _write_tag(out: bytearray, number: int, wire: int) -> None:
    _write_uvarint(out, (number << 3) | wire)


def _zigzag32(n: int) -> int:
    return ((n << 1) ^ (n >> 31)) & 0xFFFFFFFF


def _zigzag64(n: int) -> int:
    return ((n << 1) ^ (n >> 63)) & 0xFFFFFFFFFFFFFFFF


def _scalar_bytes(t: str, v, enum_symbols=None) -> bytes:
    out = bytearray()
    if t in ("int32", "int64"):
        _write_uvarint(out, int(v) & 0xFFFFFFFFFFFFFFFF)  # two's complement
    elif t in ("uint32", "uint64"):
        _write_uvarint(out, int(v))
    elif t == "sint32":
        _write_uvarint(out, _zigzag32(int(v)))
    elif t == "sint64":
        _write_uvarint(out, _zigzag64(int(v)))
    elif t == "bool":
        out.append(1 if v else 0)
    elif t == "enum":
        _write_uvarint(out, enum_symbols.index(v) if isinstance(v, str) else int(v))
    elif t == "fixed64":
        out += _struct.pack("<Q", int(v))
    elif t == "sfixed64":
        out += _struct.pack("<q", int(v))
    elif t == "double":
        out += _struct.pack("<d", float(v))
    elif t == "fixed32":
        out += _struct.pack("<I", int(v))
    elif t == "sfixed32":
        out += _struct.pack("<i", int(v))
    elif t == "float":
        out += _struct.pack("<f", float(v))
    elif t == "string":
        raw = str(v).encode("utf-8")
        _write_uvarint(out, len(raw))
        out += raw
    elif t == "bytes":
        raw = v.encode("utf-8") if isinstance(v, str) else bytes(v)
        _write_uvarint(out, len(raw))
        out += raw
    else:
        raise ValueError(f"not a scalar type: {t}")
    return bytes(out)


def _is_default(f: ProtoField, v) -> bool:
    """proto3 singular-scalar default omission (enum default = the symbol
    numbered 0, which the parser stores first)."""
    t = f.type
    if t in ("string", "bytes"):
        return len(v) == 0
    if t == "bool":
        return v is False
    if t == "enum":
        if isinstance(v, str):
            return bool(f.enum_symbols) and v == f.enum_symbols[0]
        return v == 0
    return v == 0


def _ts_to_sec_nanos(v) -> tuple[int, int]:
    if isinstance(v, _dt.datetime):
        if v.tzinfo is None:
            v = v.replace(tzinfo=_dt.timezone.utc)
        sec = int(
            (v - _dt.datetime(1970, 1, 1, tzinfo=_dt.timezone.utc)).total_seconds()
            // 1
        )
        return sec, v.microsecond * 1000
    if isinstance(v, (tuple, list)) and len(v) == 2:
        return int(v[0]), int(v[1])
    raise ValueError(f"cannot encode timestamp from {v!r}")


def _encode_timestamp(v) -> bytes:
    sec, nanos = _ts_to_sec_nanos(v)
    out = bytearray()
    if sec:
        _write_tag(out, 1, _VARINT)
        _write_uvarint(out, sec & 0xFFFFFFFFFFFFFFFF)
    if nanos:
        _write_tag(out, 2, _VARINT)
        _write_uvarint(out, nanos)
    return bytes(out)


_PACKABLE = {
    "int32", "int64", "uint32", "uint64", "sint32", "sint64", "bool", "enum",
    "fixed64", "sfixed64", "double", "fixed32", "sfixed32", "float",
}


def encode_message(msg: ProtoMessage, value: dict) -> bytes:
    out = bytearray()
    for f in msg.fields:
        v = value.get(f.name)
        if v is None:
            continue
        if f.type == "map":
            for k, mv in v.items():
                entry = bytearray()
                _write_tag(entry, 1, _LEN)
                kraw = str(k).encode("utf-8")
                _write_uvarint(entry, len(kraw))
                entry += kraw
                if f.map_value == "message":
                    body = encode_message(f.map_value_message, mv)
                    _write_tag(entry, 2, _LEN)
                    _write_uvarint(entry, len(body))
                    entry += body
                elif f.map_value == "timestamp":
                    body = _encode_timestamp(mv)
                    _write_tag(entry, 2, _LEN)
                    _write_uvarint(entry, len(body))
                    entry += body
                else:
                    _write_tag(entry, 2, _SCALAR_WIRE[f.map_value])
                    entry += _scalar_bytes(f.map_value, mv, f.map_value_symbols)
                _write_tag(out, f.number, _LEN)
                _write_uvarint(out, len(entry))
                out += entry
        elif f.repeated:
            if not v:
                continue
            if f.type in _PACKABLE:
                packed = bytearray()
                for item in v:
                    packed += _scalar_bytes(f.type, item, f.enum_symbols)
                _write_tag(out, f.number, _LEN)
                _write_uvarint(out, len(packed))
                out += packed
            else:
                for item in v:
                    if f.type == "message":
                        body = encode_message(f.message, item)
                    elif f.type == "timestamp":
                        body = _encode_timestamp(item)
                    else:
                        _write_tag(out, f.number, _SCALAR_WIRE[f.type])
                        out += _scalar_bytes(f.type, item, f.enum_symbols)
                        continue
                    _write_tag(out, f.number, _LEN)
                    _write_uvarint(out, len(body))
                    out += body
        elif f.type == "message":
            body = encode_message(f.message, v)
            _write_tag(out, f.number, _LEN)
            _write_uvarint(out, len(body))
            out += body
        elif f.type == "timestamp":
            body = _encode_timestamp(v)
            _write_tag(out, f.number, _LEN)
            _write_uvarint(out, len(body))
            out += body
        else:
            # oneof members encode even at default value (presence = which
            # branch is set); plain singular scalars omit defaults
            if f.oneof is None and _is_default(f, v):
                continue
            _write_tag(out, f.number, _SCALAR_WIRE[f.type])
            out += _scalar_bytes(f.type, v, f.enum_symbols)
    return bytes(out)


# ------------------------------------------------------------------ decode

class ProtoWireError(ValueError):
    """Malformed proto3 wire payload (truncation, runaway varint, bad
    wire type) — the typed containment boundary for untrusted broker
    bytes, same discipline as the media/DV/OCF codecs: a corrupt
    message must never kill a Spark task with a raw IndexError."""


def _read_uvarint(buf: bytes, pos: int) -> tuple[int, int]:
    shift, acc = 0, 0
    while True:
        if pos >= len(buf):
            raise ProtoWireError("truncated varint")
        b = buf[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            return acc, pos
        shift += 7
        if shift > 63:
            raise ProtoWireError("varint longer than 10 bytes")


def _to_signed64(n: int) -> int:
    return n - (1 << 64) if n >= 1 << 63 else n


def _to_signed32(n: int) -> int:
    n &= 0xFFFFFFFFFFFFFFFF
    n &= 0xFFFFFFFF
    return n - (1 << 32) if n >= 1 << 31 else n


def _decode_scalar(t: str, wire: int, buf: bytes, pos: int, enum_symbols=None):
    if wire == _VARINT:
        n, pos = _read_uvarint(buf, pos)
        if t == "int32":
            return _to_signed32(n), pos
        if t == "int64":
            return _to_signed64(n), pos
        if t == "sint32":
            n &= 0xFFFFFFFF
            return (n >> 1) ^ -(n & 1), pos
        if t == "sint64":
            return ((n >> 1) ^ -(n & 1)), pos
        if t == "bool":
            return n != 0, pos
        if t == "enum":
            if enum_symbols and 0 <= n < len(enum_symbols):
                return enum_symbols[n], pos
            return n, pos
        return n, pos  # uint32/uint64
    if wire == _I64:
        raw = buf[pos : pos + 8]
        pos += 8
        if t == "double":
            return _struct.unpack("<d", raw)[0], pos
        if t == "sfixed64":
            return _struct.unpack("<q", raw)[0], pos
        return _struct.unpack("<Q", raw)[0], pos
    if wire == _I32:
        raw = buf[pos : pos + 4]
        pos += 4
        if t == "float":
            return _struct.unpack("<f", raw)[0], pos
        if t == "sfixed32":
            return _struct.unpack("<i", raw)[0], pos
        return _struct.unpack("<I", raw)[0], pos
    if wire == _LEN:
        n, pos = _read_uvarint(buf, pos)
        raw = buf[pos : pos + n]
        pos += n
        if t == "string":
            return raw.decode("utf-8"), pos
        return bytes(raw), pos
    raise ValueError(f"unsupported wire type {wire}")


def _skip_field(wire: int, buf: bytes, pos: int) -> int:
    if wire == _VARINT:
        _, pos = _read_uvarint(buf, pos)
        return pos
    if wire == _I64:
        pos += 8
    elif wire == _I32:
        pos += 4
    elif wire == _LEN:
        n, pos0 = _read_uvarint(buf, pos)
        pos = pos0 + n
    else:
        raise ProtoWireError(f"unsupported wire type {wire}")
    if pos > len(buf):
        raise ProtoWireError("field extends past end of message")
    return pos


def _decode_timestamp(buf: bytes) -> _dt.datetime:
    pos, sec, nanos = 0, 0, 0
    while pos < len(buf):
        tag, pos = _read_uvarint(buf, pos)
        number, wire = tag >> 3, tag & 7
        if number == 1:
            sec, pos = _read_uvarint(buf, pos)
            sec = _to_signed64(sec)
        elif number == 2:
            nanos, pos = _read_uvarint(buf, pos)
        else:
            pos = _skip_field(wire, buf, pos)
    return _dt.datetime.fromtimestamp(sec, tz=_dt.timezone.utc).replace(
        tzinfo=None
    ) + _dt.timedelta(microseconds=nanos // 1000)


def _proto3_defaults(msg: ProtoMessage) -> dict:
    out: dict = {}
    for f in msg.fields:
        if f.repeated:
            out[f.name] = []
        elif f.type == "map":
            out[f.name] = {}
        elif f.type in ("message", "timestamp") or f.oneof is not None:
            out[f.name] = None
        elif f.type in ("string",):
            out[f.name] = ""
        elif f.type == "bytes":
            out[f.name] = b""
        elif f.type == "bool":
            out[f.name] = False
        elif f.type == "enum":
            out[f.name] = f.enum_symbols[0] if f.enum_symbols else 0
        elif f.type in ("float", "double"):
            out[f.name] = 0.0
        else:
            out[f.name] = 0
    return out


def decode_message(msg: ProtoMessage, buf: bytes) -> dict:
    """Decode one message; corrupt payloads raise ProtoWireError."""
    try:
        return _decode_message_inner(msg, buf)
    except ProtoWireError:
        raise
    except (IndexError, ValueError, KeyError, OverflowError,
            _struct.error, MemoryError, UnicodeDecodeError) as e:
        raise ProtoWireError(f"malformed proto payload: {e!r}") from None


def _decode_message_inner(msg: ProtoMessage, buf: bytes) -> dict:
    out = _proto3_defaults(msg)
    by_num = msg.field_by_number()
    pos = 0
    while pos < len(buf):
        tag, pos = _read_uvarint(buf, pos)
        number, wire = tag >> 3, tag & 7
        f = by_num.get(number)
        if f is None:
            pos = _skip_field(wire, buf, pos)  # unknown field: tolerated
            continue
        if f.type == "map":
            n, pos = _read_uvarint(buf, pos)
            entry = buf[pos : pos + n]
            pos += n
            k, v = "", None
            epos = 0
            while epos < len(entry):
                etag, epos = _read_uvarint(entry, epos)
                enum_, ewire = etag >> 3, etag & 7
                if enum_ == 1:
                    k, epos = _decode_scalar("string", ewire, entry, epos)
                elif enum_ == 2:
                    if f.map_value == "message":
                        ln, epos = _read_uvarint(entry, epos)
                        v = decode_message(
                            f.map_value_message, entry[epos : epos + ln]
                        )
                        epos += ln
                    elif f.map_value == "timestamp":
                        ln, epos = _read_uvarint(entry, epos)
                        v = _decode_timestamp(entry[epos : epos + ln])
                        epos += ln
                    else:
                        v, epos = _decode_scalar(
                            f.map_value, ewire, entry, epos, f.map_value_symbols
                        )
                else:
                    epos = _skip_field(ewire, entry, epos)
            out[f.name][k] = v
        elif f.repeated:
            if f.type in _PACKABLE and wire == _LEN:
                n, pos = _read_uvarint(buf, pos)
                end = pos + n
                swire = _SCALAR_WIRE[f.type]
                while pos < end:
                    v, pos = _decode_scalar(f.type, swire, buf, pos, f.enum_symbols)
                    out[f.name].append(v)
            elif f.type == "message":
                n, pos = _read_uvarint(buf, pos)
                out[f.name].append(decode_message(f.message, buf[pos : pos + n]))
                pos += n
            elif f.type == "timestamp":
                n, pos = _read_uvarint(buf, pos)
                out[f.name].append(_decode_timestamp(buf[pos : pos + n]))
                pos += n
            else:
                v, pos = _decode_scalar(f.type, wire, buf, pos, f.enum_symbols)
                out[f.name].append(v)
        elif f.type == "message":
            n, pos = _read_uvarint(buf, pos)
            out[f.name] = decode_message(f.message, buf[pos : pos + n])
            pos += n
        elif f.type == "timestamp":
            n, pos = _read_uvarint(buf, pos)
            out[f.name] = _decode_timestamp(buf[pos : pos + n])
            pos += n
        else:
            v, pos = _decode_scalar(f.type, wire, buf, pos, f.enum_symbols)
            out[f.name] = v
    return out


# ------------------------------------------------------- JSON-hop conversion

def json_to_proto_dict(msg: ProtoMessage, value: dict | None) -> dict | None:
    """Normalize a JSON-decoded payload (Spark to_json output) for wire
    encoding: base64 → bytes for bytes fields, ISO-8601 strings → datetime
    for timestamp fields; recurses into nested messages / arrays / maps."""
    import base64

    if value is None:
        return None
    out = dict(value)
    for f in msg.fields:
        v = out.get(f.name)
        if v is None:
            continue

        def conv(item, f=f):
            if f.type == "bytes" and isinstance(item, str):
                return base64.b64decode(item)
            if f.type == "timestamp" and isinstance(item, str):
                return _dt.datetime.fromisoformat(item.replace("Z", "+00:00"))
            if f.type == "message" and isinstance(item, dict):
                return json_to_proto_dict(f.message, item)
            return item

        if f.type == "map":
            # scalar map values need the same conversions as scalar
            # fields: Spark's to_json emits bytes as base64 and
            # timestamps as ISO-8601 strings
            if f.map_value == "message":
                out[f.name] = {
                    k: json_to_proto_dict(f.map_value_message, mv)
                    for k, mv in v.items()
                }
            elif f.map_value == "bytes":
                out[f.name] = {
                    k: base64.b64decode(mv) if isinstance(mv, str) else mv
                    for k, mv in v.items()
                }
            elif f.map_value == "timestamp":
                out[f.name] = {
                    k: _dt.datetime.fromisoformat(mv.replace("Z", "+00:00"))
                    if isinstance(mv, str)
                    else mv
                    for k, mv in v.items()
                }
        elif f.repeated:
            out[f.name] = [conv(item) for item in v]
        else:
            out[f.name] = conv(v)
    return out
