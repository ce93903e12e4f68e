"""WKB (Well-Known Binary, ISO 19125 / OGC SFA 1.2.1) geometry helpers —
the encoding Iceberg v3 mandates for `geometry`/`geography` column values
and for their manifest bounds (lower/upper bounds are x/y-min/max POINTs
serialized as WKB).

Spark has no geometry type, so geo columns surface as BinaryType WKB (the
same opaque-bytes-plus-typed-metadata posture the multimodal columns use,
functions/mediacodecs.py). What a 100-TB scan needs from geometry is NOT a
full geometry engine — it is (a) envelope extraction, vectorized, for
row-level spatial predicates, and (b) POINT encode/decode for the
manifest-bounds pruning path (operators/iceberg_interop.py `bbox_filter`),
which never touches data files at all.

Parser scope (refuses loudly beyond it): the seven OGC base types, both
byte orders, ISO dimension codes (+1000 Z / +2000 M / +3000 ZM) and the
PostGIS EWKB flag variants (0x80000000 Z, 0x40000000 M, 0x20000000 SRID).
Per-geometry work is a numpy `frombuffer` over the coordinate block —
per-row Python is only the variable-length framing walk, the same split
the stdlib media codecs use.

Reference: the reference engine has no geo support at all (its complex
values flatten to JSON strings, avro_base.rb:50); this exists for Iceberg
v3 table-spec completeness, like the variant reads it sits beside.
"""

from __future__ import annotations

import struct

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    StringType,
    StructField,
    StructType,
)

_BASE_TYPES = {
    1: "Point",
    2: "LineString",
    3: "Polygon",
    4: "MultiPoint",
    5: "MultiLineString",
    6: "MultiPolygon",
    7: "GeometryCollection",
}

_EWKB_Z = 0x80000000
_EWKB_M = 0x40000000
_EWKB_SRID = 0x20000000


class WkbError(ValueError):
    """Malformed or out-of-scope WKB — loud, never a silent NULL."""


def _header(buf: bytes, off: int) -> tuple[str, int, int, int]:
    """(endian, base_type, n_dims, next_offset) for the geometry at
    `off`; handles ISO dimension codes and EWKB flags (SRID skipped)."""
    if len(buf) < off + 5:
        raise WkbError(f"truncated WKB header at byte {off}")
    order = buf[off]
    if order == 0:
        en = ">"
    elif order == 1:
        en = "<"
    else:
        raise WkbError(f"bad WKB byte order {order} at byte {off}")
    (t,) = struct.unpack_from(en + "I", buf, off + 1)
    off += 5
    dims = 2
    if t & (_EWKB_Z | _EWKB_M | _EWKB_SRID):  # EWKB
        if t & _EWKB_Z:
            dims += 1
        if t & _EWKB_M:
            dims += 1
        if t & _EWKB_SRID:
            off += 4  # embedded SRID: advisory here, CRS comes from the
            # table schema — skipped, not trusted
        base = t & 0xFFFF
    else:  # ISO
        base = t % 1000
        code = t // 1000
        if code not in (0, 1, 2, 3):
            raise WkbError(f"unknown ISO WKB dimension code {code}")
        dims += (2 if code == 3 else 1) if code else 0
    if base not in _BASE_TYPES:
        raise WkbError(f"unknown WKB geometry type {base}")
    return en, base, dims, off


def _coords_block(
    buf: bytes, off: int, en: str, dims: int, n_pts: int
) -> tuple["object", int]:
    """numpy (n_pts, dims) float64 view of a packed coordinate run."""
    import numpy as np

    nbytes = n_pts * dims * 8
    if len(buf) < off + nbytes:
        raise WkbError(f"truncated coordinate block at byte {off}")
    dt = np.dtype(("<f8" if en == "<" else ">f8"))
    arr = np.frombuffer(buf, dtype=dt, count=n_pts * dims, offset=off)
    return arr.reshape(n_pts, dims), off + nbytes


def _walk(buf: bytes, off: int, acc: list) -> int:
    """Append each coordinate array to acc; return offset past the
    geometry at `off`."""
    en, base, dims, off = _header(buf, off)
    if base == 1:  # Point
        pts, off = _coords_block(buf, off, en, dims, 1)
        acc.append(pts)
        return off
    if len(buf) < off + 4:
        raise WkbError(f"truncated WKB count at byte {off}")
    (n,) = struct.unpack_from(en + "I", buf, off)
    off += 4
    if base == 2:  # LineString
        pts, off = _coords_block(buf, off, en, dims, n)
        acc.append(pts)
        return off
    if base == 3:  # Polygon: n rings of counted points
        for _ in range(n):
            (m,) = struct.unpack_from(en + "I", buf, off)
            off += 4
            pts, off = _coords_block(buf, off, en, dims, m)
            acc.append(pts)
        return off
    # Multi*/GeometryCollection: n nested full WKB geometries
    for _ in range(n):
        off = _walk(buf, off, acc)
    return off


def geometry_type_name(buf: bytes) -> str:
    _, base, _, _ = _header(bytes(buf), 0)
    return _BASE_TYPES[base]


def parse_envelope(buf: bytes) -> tuple | None:
    """(xmin, ymin, xmax, ymax) of any supported WKB geometry; None for
    an EMPTY geometry (zero-element or all-NaN — both spellings occur in
    the wild). NaN coordinates never poison a non-empty envelope."""
    import numpy as np

    acc: list = []
    buf = bytes(buf)
    end = _walk(buf, 0, acc)
    if end != len(buf):
        raise WkbError(
            f"{len(buf) - end} trailing bytes after WKB geometry"
        )
    if not acc:
        return None
    xy = np.concatenate([a[:, :2] for a in acc])
    xy = xy[~np.isnan(xy).any(axis=1)]
    if not len(xy):
        return None
    return (
        float(xy[:, 0].min()),
        float(xy[:, 1].min()),
        float(xy[:, 0].max()),
        float(xy[:, 1].max()),
    )


# -------------------------------------------------------- POINT codec
# (the shape manifest geo bounds use: spec says lower/upper bounds of a
# geometry/geography column are x/y min/max POINTs as WKB)


def wkb_point(x: float, y: float) -> bytes:
    return struct.pack("<BIdd", 1, 1, x, y)


def parse_wkb_point(buf: bytes) -> tuple[float, float]:
    buf = bytes(buf)
    en, base, dims, off = _header(buf, 0)
    if base != 1:
        raise WkbError(
            f"expected WKB Point, got {_BASE_TYPES[base]}"
        )
    if len(buf) < off + 16:  # typed error, not a raw struct.error —
        raise WkbError(  # the module's malformed-WKB contract
            f"truncated WKB Point: {len(buf)} bytes"
        )
    x, y = struct.unpack_from(en + "dd", buf, off)
    return float(x), float(y)


# ------------------------------------------------------ Spark surface

_ENVELOPE_SCHEMA = StructType(
    [
        StructField("xmin", DoubleType()),
        StructField("ymin", DoubleType()),
        StructField("xmax", DoubleType()),
        StructField("ymax", DoubleType()),
    ]
)


@F.pandas_udf(_ENVELOPE_SCHEMA)
def wkb_envelope(col: pd.Series) -> pd.DataFrame:
    """Envelope per WKB value: struct(xmin, ymin, xmax, ymax). NULL
    input and EMPTY geometries both yield an all-null-FIELDS struct
    (the pandas→Arrow struct interface cannot mark a struct value
    itself null) — test `e.xmin IS NULL`, not `e IS NULL`. Malformed
    WKB raises (silently nulling a corrupt geometry column is the
    mediacodecs anti-goal)."""
    rows = []
    for v in col:
        if v is None:
            rows.append((None, None, None, None))
            continue
        env = parse_envelope(v)
        rows.append(env if env else (None, None, None, None))
    return pd.DataFrame(rows, columns=["xmin", "ymin", "xmax", "ymax"])


@F.pandas_udf(StringType())
def wkb_geom_type(col: pd.Series) -> pd.Series:
    return pd.Series(
        [None if v is None else geometry_type_name(v) for v in col]
    )


@F.pandas_udf(BooleanType())
def st_bbox_intersects(
    g: pd.Series,
    xmin: pd.Series,
    ymin: pd.Series,
    xmax: pd.Series,
    ymax: pd.Series,
) -> pd.Series:
    """SQL-surface form of bbox_intersects (registered by
    Engine.register_geo_functions as `st_bbox_intersects`): envelope
    intersection with per-row box bounds. NULL/EMPTY geometry → false
    (ST_Intersects(NULL) semantics), and a NULL box bound likewise
    yields false instead of a TypeError that fails the whole query —
    SQL predicate semantics treat the unknown comparison as
    not-satisfied (ADVICE r12)."""
    out = []
    for v, a, b, c, d in zip(g, xmin, ymin, xmax, ymax):
        if v is None or pd.isna(a) or pd.isna(b) or pd.isna(c) or pd.isna(d):
            out.append(False)
            continue
        e = parse_envelope(v)
        out.append(
            bool(
                e
                and e[0] <= float(c)
                and e[2] >= float(a)
                and e[1] <= float(d)
                and e[3] >= float(b)
            )
        )
    return pd.Series(out)


def bbox_intersects(
    col: Column | str, bbox: tuple[float, float, float, float]
) -> Column:
    """Row-level envelope-intersection predicate (the row half of the
    pruning story — the file half is IcebergTableReader.read's
    bbox_filter, which uses manifest bounds and opens nothing). NULL and
    EMPTY geometries are excluded, matching SQL ST_Intersects(NULL).
    One self-contained kernel per call: referencing a struct-returning
    UDF's fields separately would risk Catalyst evaluating the parse
    once per field."""
    from pyspark.sql.types import BooleanType

    xmin, ymin, xmax, ymax = (float(v) for v in bbox)

    @F.pandas_udf(BooleanType())
    def _pred(vals: pd.Series) -> pd.Series:
        out = []
        for v in vals:
            if v is None:
                out.append(False)
                continue
            env = parse_envelope(v)
            out.append(
                bool(
                    env
                    and env[0] <= xmax
                    and env[2] >= xmin
                    and env[1] <= ymax
                    and env[3] >= ymin
                )
            )
        return pd.Series(out)

    c = F.col(col) if isinstance(col, str) else col
    return _pred(c)
