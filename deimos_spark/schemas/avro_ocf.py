"""Avro Object Container File (OCF) read/write over the pure-Python
codec in pyavro.py — the file format of the PUBLIC Avro 1.x spec
("Object Container Files": magic `Obj\\x01`, file-metadata map carrying
`avro.schema`, 16-byte sync marker, then blocks of
[record-count, byte-size, records..., sync]).

Why: Apache Iceberg's metadata layer (manifest lists and manifest
files) is OCF Avro; this module is what lets the Iceberg interop
adapter read real tables — and hand-author spec-faithful fixtures —
without any Avro jar. Codec support: `null` (uncompressed) and
`deflate` (zlib raw), the two codecs every implementation must or
commonly does support.
"""

from __future__ import annotations

import json
import os
import zlib

from deimos_spark.schemas.pyavro import (
    _read_varint,
    _write_varint,
    decode_value,
    encode_value,
)

MAGIC = b"Obj\x01"

_META_SCHEMA = {"type": "map", "values": "bytes"}


class OcfError(ValueError):
    """Not an OCF file / unsupported codec / corrupt container."""


def ocf_write(
    path: str,
    schema: dict,
    records: list[dict],
    sync: bytes = b"\x00\x01\x02\x03\x04\x05\x06\x07" * 2,
    codec: str = "null",
    records_per_block: int = 1000,
) -> None:
    """Write records as one OCF file (deterministic sync by default so
    fixtures are reproducible)."""
    if len(sync) != 16:
        raise OcfError("sync marker must be 16 bytes")
    if codec not in ("null", "deflate"):
        raise OcfError(f"unsupported codec {codec!r}")
    out = bytearray(MAGIC)
    meta = {
        "avro.schema": json.dumps(schema).encode(),
        "avro.codec": codec.encode(),
    }
    encode_value(_META_SCHEMA, meta, out)
    out += sync
    for i in range(0, len(records), records_per_block):
        block = records[i : i + records_per_block]
        body = bytearray()
        for r in block:
            encode_value(schema, r, body)
        payload = (
            bytes(body)
            if codec == "null"
            # deflate codec = raw zlib stream, no header/checksum (spec)
            else zlib.compress(bytes(body))[2:-4]
        )
        _write_varint(out, len(block))
        _write_varint(out, len(payload))
        out += payload
        out += sync
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as fh:
        fh.write(out)


def ocf_read(path: str) -> tuple[dict, list[dict]]:
    """Read an OCF file → (writer schema, records).

    Containment contract: any corruption — flipped bytes in the header,
    metadata, block framing, or record bodies — surfaces as `OcfError`,
    never a raw Unicode/struct/index/zlib error. Manifest walks over
    untrusted tables depend on this to fail as a typed, per-file error
    instead of an undiagnosable task death.
    """
    try:
        return _ocf_read_inner(path)
    except OcfError:
        raise
    except (
        UnicodeDecodeError,
        ValueError,
        KeyError,
        IndexError,
        TypeError,
        EOFError,
        ArithmeticError,
        MemoryError,
        zlib.error,
    ) as e:
        raise OcfError(f"{path}: corrupt container: {e!r}") from None


def _ocf_read_inner(path: str) -> tuple[dict, list[dict]]:
    with open(path, "rb") as fh:
        buf = fh.read()
    if buf[:4] != MAGIC:
        raise OcfError(f"{path}: not an Avro object container file")
    meta, pos = decode_value(_META_SCHEMA, buf, 4)
    try:
        schema = json.loads(bytes(meta["avro.schema"]).decode())
    except (KeyError, ValueError) as e:
        raise OcfError(f"{path}: bad avro.schema metadata: {e!r}") from None
    codec = bytes(meta.get("avro.codec") or b"null").decode()
    if codec not in ("null", "deflate"):
        raise OcfError(f"{path}: unsupported codec {codec!r}")
    sync = buf[pos : pos + 16]
    pos += 16
    records: list[dict] = []
    n = len(buf)
    while pos < n:
        count, pos = _read_varint(buf, pos)
        size, pos = _read_varint(buf, pos)
        if count < 0 or size < 0 or pos + size > n:
            raise OcfError(f"{path}: block framing out of bounds")
        body = buf[pos : pos + size]
        pos += size
        if codec == "deflate":
            body = zlib.decompress(body, wbits=-15)
        # a corrupt count varint must not drive a near-infinite decode
        # loop. Bound against the DECOMPRESSED body (deflate routinely
        # exceeds 8:1 on repetitive data, so the on-disk size would
        # falsely reject valid blocks of tiny compressible records);
        # a record costs >= 1 byte even when null-heavy
        if count > max(len(body), 1) * 8:
            raise OcfError(f"{path}: absurd block record count {count}")
        bpos = 0
        for _ in range(count):
            rec, bpos = decode_value(schema, body, bpos)
            records.append(rec)
        if buf[pos : pos + 16] != sync:
            raise OcfError(f"{path}: sync marker mismatch mid-file")
        pos += 16
    return schema, records
