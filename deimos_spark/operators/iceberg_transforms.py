"""Iceberg partition transforms — the PUBLIC table-spec's "Partition
Transforms" section (iceberg.apache.org/spec), pure Python/Spark:

- `identity`   — value as-is.
- `bucket[N]`  — `(murmur3_x86_32(canonical_bytes(v)) & Int.MAX_VALUE) % N`
  with the spec's Appendix-B canonical byte forms (int/long/date/
  timestamp hash their 8-byte little-endian LONG value; strings hash
  UTF-8 bytes). Appendix B's published vectors (hashLong(34) =
  2017239379, hashString("iceberg") = 1210000089, ...) are pinned in
  tests, so our buckets match every conforming engine's.
- `truncate[W]` — ints floor to a multiple of W (`v - (((v % W) + W) % W)`,
  correct for negatives), strings truncate to W characters.
- `year/month/day/hour` — ordinals since the epoch (1970-01-01 /
  1970-01).

Each transform exists in two forms sharing one definition:
`transform_value` (driver-side, one Python value — what manifest-level
pruning needs: hash the FILTER value, compare to recorded partition
tuples) and `transform_column` (a Spark Column for the distributed
write path; truncate/time transforms are pure codegen'd expressions,
bucket is an Arrow-batched pandas_udf since Spark's builtin `hash` is
a different murmur3 seeding).

The reference has no lakehouse layer (lib/deimos/message.rb:5-32);
this backs iceberg_interop.py's partitioned writer/reader.
"""

from __future__ import annotations

import datetime as _dt
import re
import struct
from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F

_EPOCH = _dt.date(1970, 1, 1)


class TransformError(ValueError):
    """Unsupported transform spec or source type."""


# ------------------------------------------------------- murmur3_x86_32


def murmur3_32(data: bytes, seed: int = 0) -> int:
    """murmur3_x86_32 → SIGNED 32-bit int (what the Iceberg spec's
    Appendix B tables print)."""
    c1, c2 = 0xCC9E2D51, 0x1B873593
    h = seed & 0xFFFFFFFF
    nblocks = len(data) & ~3
    for i in range(0, nblocks, 4):
        k = int.from_bytes(data[i : i + 4], "little")
        k = (k * c1) & 0xFFFFFFFF
        k = ((k << 15) | (k >> 17)) & 0xFFFFFFFF
        k = (k * c2) & 0xFFFFFFFF
        h ^= k
        h = ((h << 13) | (h >> 19)) & 0xFFFFFFFF
        h = (h * 5 + 0xE6546B64) & 0xFFFFFFFF
    tail = data[nblocks:]
    if tail:
        k = 0
        for i in range(len(tail) - 1, -1, -1):
            k = (k << 8) | tail[i]
        k = (k * c1) & 0xFFFFFFFF
        k = ((k << 15) | (k >> 17)) & 0xFFFFFFFF
        k = (k * c2) & 0xFFFFFFFF
        h ^= k
    h ^= len(data)
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & 0xFFFFFFFF
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & 0xFFFFFFFF
    h ^= h >> 16
    return h - (1 << 32) if h >= 1 << 31 else h


def _hash_long(v: int) -> int:
    """Appendix B: int/long/date/time/timestamp hash the 8-byte
    little-endian of the (sign-extended) long value."""
    return murmur3_32(struct.pack("<q", v))


def _to_epoch_micros(v) -> int:
    if isinstance(v, _dt.datetime):
        base = v.replace(tzinfo=None) if v.tzinfo is None else v.astimezone(
            _dt.timezone.utc
        ).replace(tzinfo=None)
        return (base - _dt.datetime(1970, 1, 1)) // _dt.timedelta(
            microseconds=1
        )
    raise TransformError(f"not a timestamp value: {v!r}")


def bucket_value(v, n: int) -> int | None:
    """Spec bucket: (murmur3(canonical(v)) & Integer.MAX_VALUE) % n.
    None buckets to None (null partition)."""
    if v is None:
        return None
    if isinstance(v, bool):
        raise TransformError("bucket over boolean is not in the spec")
    if isinstance(v, int):
        h = _hash_long(v)
    elif isinstance(v, str):
        h = murmur3_32(v.encode("utf-8"))
    elif isinstance(v, (bytes, bytearray)):
        h = murmur3_32(bytes(v))
    elif isinstance(v, _dt.datetime):
        h = _hash_long(_to_epoch_micros(v))
    elif isinstance(v, _dt.date):
        h = _hash_long((v - _EPOCH).days)
    else:
        raise TransformError(f"bucket over {type(v).__name__} unsupported")
    return (h & 0x7FFFFFFF) % n


def truncate_value(v, w: int):
    if v is None:
        return None
    if isinstance(v, bool):
        raise TransformError("truncate over boolean is not in the spec")
    if isinstance(v, int):
        return v - (((v % w) + w) % w)
    if isinstance(v, str):
        return v[:w]
    raise TransformError(f"truncate over {type(v).__name__} unsupported")


def _as_date(v) -> _dt.date:
    if isinstance(v, _dt.datetime):
        return v.date()
    if isinstance(v, _dt.date):
        return v
    if isinstance(v, str):
        return _dt.date.fromisoformat(v[:10])
    raise TransformError(f"not a date/timestamp value: {v!r}")


def time_value(kind: str, v) -> int | None:
    """year/month/day/hour ordinals since the epoch (ints, as stored in
    manifest partition tuples)."""
    if v is None:
        return None
    if kind == "hour":
        if isinstance(v, str):
            v = _dt.datetime.fromisoformat(v)
        return _to_epoch_micros(v) // 3_600_000_000
    d = _as_date(v)
    if kind == "day":
        return (d - _EPOCH).days
    if kind == "month":
        return (d.year - 1970) * 12 + d.month - 1
    if kind == "year":
        return d.year - 1970
    raise TransformError(f"unknown time transform {kind!r}")


# ------------------------------------------------------------ spec parse


@dataclass(frozen=True)
class PartitionField:
    """One parsed partition-spec field."""

    name: str        # partition field name (manifest record key / dir name)
    kind: str        # identity | bucket | truncate | year | month | day | hour
    source: str      # source column name
    param: int | None = None  # N for bucket, W for truncate

    @property
    def spec_transform(self) -> str:
        """The spec's JSON transform string."""
        if self.kind == "bucket":
            return f"bucket[{self.param}]"
        if self.kind == "truncate":
            return f"truncate[{self.param}]"
        return self.kind


_CALL = re.compile(
    r"(?i)\s*(bucket|truncate)\s*\(\s*(\d+)\s*,\s*(\w+)\s*\)\s*"
)
_TIME_CALL = re.compile(
    r"(?i)\s*(years?|months?|days?|hours?)\s*\(\s*(\w+)\s*\)\s*"
)
_SPEC_STYLE = re.compile(r"(?i)\s*(bucket|truncate)\[(\d+)\]\s*\(\s*(\w+)\s*\)\s*")


def parse_partition_field(spec: str) -> PartitionField:
    """Accepts `col` (identity), `bucket(4, col)` / `bucket[4](col)`,
    `truncate(3, col)`, and `days(col)`-style time transforms."""
    m = _CALL.fullmatch(spec) or _SPEC_STYLE.fullmatch(spec)
    if m:
        kind, n, col = m.group(1).lower(), int(m.group(2)), m.group(3)
        if n <= 0:
            raise TransformError(f"{kind} param must be positive: {spec!r}")
        suffix = "bucket" if kind == "bucket" else "trunc"
        return PartitionField(f"{col}_{suffix}", kind, col, n)
    m = _TIME_CALL.fullmatch(spec)
    if m:
        kind = m.group(1).lower().rstrip("s")
        col = m.group(2)
        return PartitionField(f"{col}_{kind}", kind, col)
    if not re.fullmatch(r"\w+", spec.strip()):
        raise TransformError(f"unparseable partition spec {spec!r}")
    c = spec.strip()
    return PartitionField(c, "identity", c)


def parse_spec_transform(transform: str, name: str, source: str) -> PartitionField:
    """Parse a metadata-JSON transform string (reader side)."""
    t = transform.strip().lower()
    m = re.fullmatch(r"(bucket|truncate)\[(\d+)\]", t)
    if m:
        return PartitionField(name, m.group(1), source, int(m.group(2)))
    if t in ("identity", "year", "month", "day", "hour"):
        return PartitionField(name, t, source)
    if t == "void":
        return PartitionField(name, "void", source)
    raise TransformError(f"unsupported partition transform {transform!r}")


# -------------------------------------------------- value / column forms


def transform_value(pf: PartitionField, v):
    if pf.kind == "identity":
        return v
    if pf.kind == "bucket":
        return bucket_value(v, pf.param)
    if pf.kind == "truncate":
        return truncate_value(v, pf.param)
    if pf.kind == "void":
        return None
    return time_value(pf.kind, v)


# source spark simpleString types each transform accepts (writer gate)
WRITABLE_SOURCES: dict[str, tuple[str, ...]] = {
    "identity": ("int", "bigint", "string"),
    "bucket": ("int", "bigint", "string", "date"),
    "truncate": ("int", "bigint", "string"),
    "year": ("date", "timestamp", "timestamp_ntz"),
    "month": ("date", "timestamp", "timestamp_ntz"),
    "day": ("date", "timestamp", "timestamp_ntz"),
    "hour": ("timestamp", "timestamp_ntz"),
}


def result_spark_type(pf: PartitionField, source_type: str) -> str:
    """Spark simpleString of the transform's RESULT (the type partition
    tuples carry in manifests; spec "Partition Transforms" table)."""
    if pf.kind in ("identity", "truncate"):
        return source_type
    if pf.kind == "bucket" or pf.kind in ("year", "month", "day", "hour"):
        return "int"
    raise TransformError(f"no result type for {pf.kind!r}")


def _bucket_udf(n: int, source_type: str):
    """Arrow-batched bucket assignment for the distributed write path.
    int/long sources vectorize through numpy (two 4-byte murmur blocks,
    wrap-around uint32 arithmetic); strings/dates hash per value (write
    path only — queries never pass through here)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _vec_long(vals):
        # Arrow hands a long column WITH nulls to pandas as float64,
        # which silently rounds |v| > 2^53 (2^63-1 became 2^63 → wrong
        # bucket; caught by the spec-hash equivalence property test).
        # transform_column masks nulls JVM-side so this path always
        # sees exact integers; refuse loudly if a float column slips
        # through — its precision is already gone.
        if vals.dtype.kind == "f":
            raise TypeError(
                "bucket over a float-backed long column: nulls must be "
                "masked JVM-side before the UDF (transform_column does "
                "this) — float64 has already rounded values past 2^53"
            )
        mask = vals.notna()
        if vals.dtype.kind in ("i", "u"):
            v = vals[mask].to_numpy().astype(np.int64, copy=False).view(
                np.uint64
            )
        else:  # object dtype: exact Python ints
            v = np.array(
                [int(x) for x in vals[mask]], dtype=np.int64
            ).view(np.uint64)
        k_lo = (v & np.uint64(0xFFFFFFFF)).astype(np.uint32)
        k_hi = (v >> np.uint64(32)).astype(np.uint32)
        c1 = np.uint32(0xCC9E2D51)
        c2 = np.uint32(0x1B873593)
        h = np.zeros(len(v), dtype=np.uint32)
        with np.errstate(over="ignore"):
            for k in (k_lo, k_hi):
                k = k * c1
                k = (k << np.uint32(15)) | (k >> np.uint32(17))
                k = k * c2
                h = h ^ k
                h = (h << np.uint32(13)) | (h >> np.uint32(19))
                h = h * np.uint32(5) + np.uint32(0xE6546B64)
            h = h ^ np.uint32(8)  # len(data) == 8
            h = h ^ (h >> np.uint32(16))
            h = h * np.uint32(0x85EBCA6B)
            h = h ^ (h >> np.uint32(13))
            h = h * np.uint32(0xC2B2AE35)
            h = h ^ (h >> np.uint32(16))
        out = pd.Series(
            [pd.NA] * len(vals), index=vals.index, dtype="Int32"
        )
        out[mask] = ((h & np.uint32(0x7FFFFFFF)) % np.uint32(n)).astype(
            "int32"
        )
        return out

    if source_type in ("int", "bigint"):
        return pandas_udf(_vec_long, "int")

    def _per_value(vals):
        def one(v):
            if v is None or pd.isna(v):
                return None
            # DATE columns may arrive as pandas Timestamps — the spec
            # hashes a date's DAY ordinal, not midnight micros
            if source_type == "date" and isinstance(v, _dt.datetime):
                v = v.date()
            return bucket_value(v, n)

        return pd.Series(
            [one(v) for v in vals], index=vals.index, dtype="Int32"
        )

    return pandas_udf(_per_value, "int")


def transform_column(pf: PartitionField, source_type: str) -> Column:
    """Spark Column computing the transform over `pf.source` — the
    distributed write path. Everything but bucket is a codegen'd
    builtin expression."""
    col = F.col(pf.source)
    if pf.kind == "identity":
        return col
    if pf.kind == "truncate":
        if source_type == "string":
            return F.substring(col, 1, pf.param)
        w = F.lit(pf.param)
        return (col - (((col % w) + w) % w)).cast(source_type)
    if pf.kind == "bucket":
        udf = _bucket_udf(pf.param, source_type)
        if source_type in ("int", "bigint"):
            # mask nulls JVM-side: a long column with nulls crosses
            # Arrow as float64 and silently rounds past 2^53 — feed the
            # UDF a null-free column, restore null buckets with when()
            return F.when(col.isNotNull(), udf(F.coalesce(col, F.lit(0))))
        return udf(col)
    if pf.kind == "year":
        return (F.year(col) - F.lit(1970)).cast("int")
    if pf.kind == "month":
        return (
            (F.year(col) - F.lit(1970)) * F.lit(12) + F.month(col) - F.lit(1)
        ).cast("int")
    if pf.kind == "day":
        return F.datediff(col.cast("date"), F.lit("1970-01-01")).cast("int")
    if pf.kind == "hour":
        # day-ordinal * 24 + hour-of-day: works uniformly for timestamp
        # and timestamp_ntz (no epoch-double cast, which ntz refuses)
        return (
            F.datediff(col.cast("date"), F.lit("1970-01-01")).cast("bigint")
            * F.lit(24)
            + F.hour(col)
        ).cast("int")
    raise TransformError(f"no column form for {pf.kind!r}")


# ------------------------------------------------------ single-value codec

# Iceberg spec "Appendix D: Single-value serialization" (binary) for the
# types partition tuples can carry post-transform in this engine:
# int (4-byte LE), long (8-byte LE), string (UTF-8 bytes). Used for the
# manifest-list `field_summary` lower/upper bounds — the metadata that
# lets a scan skip WHOLE manifests (thousands of files each) before
# opening them.
_SV_PACK = {"int": "<i", "long": "<q"}


def single_value_serialize(avro_type: str, v) -> bytes | None:
    """None for unsupported types/None values — callers omit the bound
    (spec-legal: bounds are optional), which disables skipping but never
    wrongly skips."""
    if v is None:
        return None
    fmt = _SV_PACK.get(avro_type)
    if fmt is not None:
        try:
            return struct.pack(fmt, int(v))
        except (struct.error, ValueError, TypeError):
            return None
    if avro_type == "string":
        return str(v).encode("utf-8")
    return None


def single_value_deserialize(avro_type: str, b) -> object | None:
    if b is None:
        return None
    b = bytes(b)
    fmt = _SV_PACK.get(avro_type)
    if fmt is not None:
        if len(b) != struct.calcsize(fmt):
            return None  # foreign width: treat as no bound (never skip)
        return struct.unpack(fmt, b)[0]
    if avro_type == "string":
        try:
            # UTF-8 byte order == code-point order, so decoded-string
            # comparison matches the spec's unsigned-byte bound order
            return b.decode("utf-8")
        except UnicodeDecodeError:
            return None
    return None
