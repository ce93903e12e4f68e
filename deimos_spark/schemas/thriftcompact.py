"""Minimal Thrift compact-protocol reader for parquet FOOTERS.

Why this exists: the sandbox's pyarrow predates the parquet VARIANT
logical type and refuses to parse ANY footer that mentions it
("Metadata contains Thrift LogicalType that is not recognized"), so
every pyarrow-based probe (num_rows, schema) breaks the moment a data
file carries a variant column. Iceberg v3 variant support needs two
footer facts pyarrow can no longer give us:

- `num_rows` (FileMetaData field 3) for manifest record counts,
- the schema-element tree (field 2) to tell UNSHREDDED variant
  columns (group of `metadata`,`value`) from SHREDDED ones (a
  `typed_value` subfield) — the latter must refuse loudly at table
  open rather than fail deep inside a Spark scan.

Scope is exactly that: parse the footer's FileMetaData far enough to
extract num_rows and the (name, num_children, field_id) tree, skipping
every other field generically (row groups, key-value metadata, column
orders, logical types — INCLUDING the unrecognized VARIANT one, which
is just an unknown struct field to a compliant compact-protocol
skipper). This is a from-scratch implementation of the PUBLIC Thrift
compact protocol spec (thrift.apache.org) + parquet-format
FileMetaData/SchemaElement field ids (parquet.apache.org); no code
derived from any thrift library.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

__all__ = ["SchemaNode", "read_footer", "ThriftParseError"]


class ThriftParseError(ValueError):
    pass


# compact-protocol wire types
_STOP = 0
_BOOL_TRUE = 1
_BOOL_FALSE = 2
_BYTE = 3
_I16 = 4
_I32 = 5
_I64 = 6
_DOUBLE = 7
_BINARY = 8
_LIST = 9
_SET = 10
_MAP = 11
_STRUCT = 12


@dataclass
class SchemaNode:
    """One parquet SchemaElement with its children resolved."""

    name: str
    field_id: int | None = None
    children: list["SchemaNode"] = field(default_factory=list)

    def child_names(self) -> set[str]:
        return {c.name for c in self.children}


class _Reader:
    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def byte(self) -> int:
        if self.pos >= len(self.buf):
            raise ThriftParseError("unexpected end of footer")
        b = self.buf[self.pos]
        self.pos += 1
        return b

    def take(self, n: int) -> bytes:
        if self.pos + n > len(self.buf):
            raise ThriftParseError("unexpected end of footer")
        out = self.buf[self.pos : self.pos + n]
        self.pos += n
        return out

    def varint(self) -> int:
        out = 0
        shift = 0
        while True:
            b = self.byte()
            out |= (b & 0x7F) << shift
            if not b & 0x80:
                return out
            shift += 7
            if shift > 70:
                raise ThriftParseError("varint too long")

    def zigzag(self) -> int:
        v = self.varint()
        return (v >> 1) ^ -(v & 1)

    def binary(self) -> bytes:
        return self.take(self.varint())

    # ------------------------------------------------- generic skipping

    def skip(self, wtype: int) -> None:
        if wtype in (_BOOL_TRUE, _BOOL_FALSE):
            return
        if wtype == _BYTE:
            self.byte()
        elif wtype in (_I16, _I32, _I64):
            self.varint()
        elif wtype == _DOUBLE:
            self.take(8)
        elif wtype == _BINARY:
            self.binary()
        elif wtype in (_LIST, _SET):
            size, etype = self.list_header()
            for _ in range(size):
                self.skip(etype)
        elif wtype == _MAP:
            size = self.varint()
            if size:
                kv = self.byte()
                for _ in range(size):
                    self.skip(kv >> 4)
                    self.skip(kv & 0x0F)
        elif wtype == _STRUCT:
            self.skip_struct()
        else:
            raise ThriftParseError(f"unknown compact wire type {wtype}")

    def skip_struct(self) -> None:
        last = 0
        while True:
            fid, wtype, last = self.field_header(last)
            if wtype == _STOP:
                return
            self.skip(wtype)

    # --------------------------------------------------------- headers

    def field_header(self, last_id: int) -> tuple[int, int, int]:
        """-> (field_id, wire_type, new_last_id); wire_type 0 = stop."""
        b = self.byte()
        if b == _STOP:
            return 0, _STOP, last_id
        delta = (b & 0xF0) >> 4
        wtype = b & 0x0F
        fid = last_id + delta if delta else self.zigzag()
        return fid, wtype, fid

    def list_header(self) -> tuple[int, int]:
        b = self.byte()
        size = (b & 0xF0) >> 4
        etype = b & 0x0F
        if size == 15:
            size = self.varint()
        return size, etype


def _schema_element(r: _Reader) -> tuple[str, int, int | None]:
    """SchemaElement -> (name, num_children, field_id)."""
    name = ""
    nchildren = 0
    fid: int | None = None
    last = 0
    while True:
        f, wtype, last = r.field_header(last)
        if wtype == _STOP:
            return name, nchildren, fid
        if f == 4 and wtype == _BINARY:  # name
            name = r.binary().decode("utf-8", "replace")
        elif f == 5 and wtype in (_I16, _I32, _I64):  # num_children
            nchildren = r.zigzag()
        elif f == 9 and wtype in (_I16, _I32, _I64):  # field_id
            fid = r.zigzag()
        else:
            r.skip(wtype)


def _build_tree(flat: list[tuple[str, int, int | None]]) -> SchemaNode:
    """Depth-first flattened SchemaElement list -> root SchemaNode."""
    pos = 0

    def build() -> SchemaNode:
        nonlocal pos
        if pos >= len(flat):
            raise ThriftParseError("schema list shorter than num_children")
        name, n, fid = flat[pos]
        pos += 1
        node = SchemaNode(name, fid)
        for _ in range(n):
            node.children.append(build())
        return node

    root = build()
    if pos != len(flat):
        raise ThriftParseError("schema list longer than the element tree")
    return root


def read_footer(path: str) -> tuple[int, SchemaNode]:
    """Parquet file -> (num_rows, schema root node). Parses ONLY
    FileMetaData fields 2 (schema) and 3 (num_rows); everything else —
    including logical-type structs pyarrow's thrift bindings predate —
    is skipped generically."""
    with open(path, "rb") as fh:
        fh.seek(0, 2)
        size = fh.tell()
        if size < 12:
            raise ThriftParseError(f"{path}: too small to be parquet")
        fh.seek(size - 8)
        tail = fh.read(8)
        if tail[4:] != b"PAR1":
            raise ThriftParseError(f"{path}: missing PAR1 magic")
        flen = struct.unpack("<I", tail[:4])[0]
        if flen > size - 8:
            raise ThriftParseError(f"{path}: footer length {flen} > file")
        fh.seek(size - 8 - flen)
        buf = fh.read(flen)

    r = _Reader(buf)
    num_rows = -1
    flat: list[tuple[str, int, int | None]] | None = None
    last = 0
    while True:
        fid, wtype, last = r.field_header(last)
        if wtype == _STOP:
            break
        if fid == 2 and wtype == _LIST:  # schema
            n, etype = r.list_header()
            if etype != _STRUCT:
                raise ThriftParseError("schema list of non-structs")
            flat = [_schema_element(r) for _ in range(n)]
        elif fid == 3 and wtype in (_I16, _I32, _I64):  # num_rows
            num_rows = r.zigzag()
        else:
            r.skip(wtype)
    if num_rows < 0 or flat is None:
        raise ThriftParseError(f"{path}: footer lacks schema/num_rows")
    return num_rows, _build_tree(flat)
