"""Puffin file format (public spec: iceberg.apache.org/puffin-spec) —
the container Iceberg v3 uses for deletion vectors.

Layout:  Magic | Blob₁ … Blobₙ | Footer
Footer:  Magic | FooterPayload (UTF-8 JSON) | PayloadSize (4B LE int)
         | Flags (4B) | Magic
Flags byte 0 bit 0 = payload LZ4-compressed (refused loudly here).

Deletion-vector blobs (`deletion-vector-v1`, Iceberg table spec
"Position Delete Vectors"): the blob is framed as

  ┌ 4B big-endian: len(magic + vector)
  ├ 4B magic D1 D3 3D E1
  ├ vector — 64-bit Roaring Bitmap "portable" serialization
  └ 4B big-endian CRC-32 of (magic + vector)

The portable vector body (8B LE bitmap count, then per bitmap a 4B LE
high-32 key + standard 32-bit roaring serialization) is byte-identical
to Delta's RoaringBitmapArray minus Delta's leading magic, so the
roaring codec is shared with operators/deltadv.py rather than
reimplemented.
"""

from __future__ import annotations

import json
import struct
import zlib

import numpy as np

from deimos_spark.operators.deltadv import (
    _deserialize_roaring32,
    _serialize_roaring32,
)

MAGIC = b"PFA1"
DV_MAGIC = b"\xd1\xd3\x3d\xe1"


class PuffinError(Exception):
    pass


# ------------------------------------------------------------- vector

def deserialize_dv_vector(data: bytes) -> np.ndarray:
    """64-bit roaring portable bytes → sorted int64 positions."""
    if len(data) < 8:
        raise PuffinError("DV vector shorter than its bitmap-count header")
    (n,) = struct.unpack_from("<q", data, 0)
    if n < 0 or n > 1 << 32:
        raise PuffinError(f"absurd DV bitmap count {n}")
    pos = 8
    parts: list[np.ndarray] = []
    last_key = -1
    for _ in range(n):
        if pos + 4 > len(data):
            raise PuffinError("DV vector truncated before bitmap key")
        (key,) = struct.unpack_from("<I", data, pos)
        pos += 4
        if key <= last_key:
            raise PuffinError(f"DV bitmap keys not increasing at {key}")
        last_key = key
        vals, pos = _deserialize_roaring32(data, pos)
        parts.append(
            (np.int64(key) << np.int64(32)) | vals.astype(np.int64)
        )
    if pos != len(data):
        raise PuffinError(f"DV vector has {len(data) - pos} trailing bytes")
    return np.concatenate(parts) if parts else np.empty(0, np.int64)


def serialize_dv_vector(indexes: np.ndarray) -> bytes:
    indexes = np.unique(np.asarray(indexes, dtype=np.int64))
    if len(indexes) and indexes[0] < 0:
        raise PuffinError("negative row position")
    highs = indexes >> np.int64(32)
    uniq = np.unique(highs)
    out = bytearray(struct.pack("<q", len(uniq)))
    for high in uniq:
        vals = (indexes[highs == high] & np.int64(0xFFFFFFFF)).astype(
            np.uint32
        )
        out += struct.pack("<I", int(high))
        out += _serialize_roaring32(vals)
    return bytes(out)


# --------------------------------------------------------------- blobs

def frame_dv_blob(vector: bytes) -> bytes:
    """vector bytes → spec-framed blob (length + magic + vector + CRC)."""
    body = DV_MAGIC + vector
    return (
        struct.pack(">I", len(body))
        + body
        + struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF)
    )


def read_dv_blob(path: str, offset: int, length: int) -> np.ndarray:
    """Decode the deletion vector at (offset, length) — the manifest's
    `content_offset`/`content_size_in_bytes` — validating the framing
    magic and CRC. Returns sorted int64 row positions."""
    with open(path, "rb") as fh:
        fh.seek(offset)
        blob = fh.read(length)
    if len(blob) != length:
        raise PuffinError(
            f"{path}: DV blob truncated ({len(blob)} of {length} bytes)"
        )
    if length < 12:
        raise PuffinError(f"{path}: DV blob too short for its framing")
    (blen,) = struct.unpack_from(">I", blob, 0)
    if blen != length - 8:
        raise PuffinError(
            f"{path}: DV length prefix {blen} != blob length {length} - 8"
        )
    body = blob[4:-4]
    if body[:4] != DV_MAGIC:
        raise PuffinError(f"{path}: bad DV magic {body[:4]!r}")
    (crc,) = struct.unpack_from(">I", blob, len(blob) - 4)
    if crc != (zlib.crc32(body) & 0xFFFFFFFF):
        raise PuffinError(f"{path}: DV blob CRC mismatch")
    return deserialize_dv_vector(body[4:])


# -------------------------------------------------------------- footer

def read_footer(path: str) -> dict:
    """Parse and validate the Puffin footer → its JSON payload
    ({"blobs": [...], "properties": {...}})."""
    with open(path, "rb") as fh:
        data = fh.read()
    if len(data) < 20 or data[:4] != MAGIC or data[-4:] != MAGIC:
        raise PuffinError(f"{path}: not a Puffin file")
    flags = data[-8:-4]
    if flags[0] & 0x01:
        raise PuffinError(
            f"{path}: LZ4-compressed footer payload unsupported"
        )
    if flags[0] & ~0x01 or any(flags[1:]):
        raise PuffinError(f"{path}: unknown Puffin footer flags {flags!r}")
    (psize,) = struct.unpack_from("<i", data, len(data) - 12)
    start = len(data) - 12 - psize
    if psize < 0 or start < 8 or data[start - 4 : start] != MAGIC:
        raise PuffinError(f"{path}: corrupt footer framing")
    try:
        payload = json.loads(data[start : start + psize].decode("utf-8"))
    except (ValueError, UnicodeDecodeError) as e:
        raise PuffinError(f"{path}: footer payload unreadable: {e}") from None
    if not isinstance(payload.get("blobs"), list):
        raise PuffinError(f"{path}: footer lacks the blobs list")
    return payload


def write_puffin_dvs(
    path: str,
    dvs: dict[str, np.ndarray],
    snapshot_id: int = 0,
    sequence_number: int = 0,
) -> dict[str, tuple[int, int, int]]:
    """Write one Puffin file holding a `deletion-vector-v1` blob per
    referenced data file. Returns {referenced_data_file: (offset,
    length, cardinality)} — what the caller records in manifest fields
    content_offset / content_size_in_bytes / record_count."""
    return write_puffin_framed(
        path,
        {
            ref: _frame_positions(dvs[ref])
            for ref in dvs
        },
        snapshot_id=snapshot_id,
        sequence_number=sequence_number,
    )


def _frame_positions(positions: np.ndarray) -> tuple[bytes, int]:
    """Sorted-unique positions → (framed deletion-vector-v1 blob,
    cardinality). The compressed-bitmap form a streaming caller keeps
    per file instead of raw position arrays."""
    idx = np.unique(np.asarray(positions, dtype=np.int64))
    return frame_dv_blob(serialize_dv_vector(idx)), int(len(idx))


def write_puffin_framed(
    path: str,
    framed: dict[str, tuple[bytes, int]],
    snapshot_id: int = 0,
    sequence_number: int = 0,
) -> dict[str, tuple[int, int, int]]:
    """write_puffin_dvs taking PRE-FRAMED blobs ({referenced_data_file:
    (framed_blob, cardinality)}) — lets a caller that streams hit
    positions one data file at a time (toLocalIterator) hold only
    compressed roaring bitmaps, never every file's raw positions."""
    out: dict[str, tuple[int, int, int]] = {}
    blobs_meta = []
    body = bytearray(MAGIC)
    for ref in sorted(framed):
        blob, card = framed[ref]
        off = len(body)
        body += blob
        out[ref] = (off, len(blob), card)
        blobs_meta.append(
            {
                "type": "deletion-vector-v1",
                "fields": [],
                "snapshot-id": snapshot_id,
                "sequence-number": sequence_number,
                "offset": off,
                "length": len(blob),
                "properties": {
                    "referenced-data-file": ref,
                    "cardinality": str(card),
                },
            }
        )
    payload = json.dumps(
        {"blobs": blobs_meta, "properties": {"created-by": "deimos-spark"}}
    ).encode("utf-8")
    body += MAGIC + payload + struct.pack("<i", len(payload))
    body += b"\x00\x00\x00\x00" + MAGIC
    with open(path, "wb") as fh:
        fh.write(bytes(body))
    return out
