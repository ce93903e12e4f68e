"""Iceberg v3 geometry/geography support (closes the last named v3 type
refusal — VERDICT r11 'What's missing' #2 tail):

- WKB parser: all seven OGC base types, both byte orders, ISO dimension
  codes and EWKB flags, EMPTY spellings, loud refusal on malformed bytes;
- writer: geo columns declared over Spark binary WKB (v3-gated), REAL
  per-file envelope bounds as WKB POINTs in the manifests;
- reader: geo columns surface as binary + geo_columns() metadata,
  read(bbox_filter=...) prunes files by manifest geo bounds (geography
  antimeridian wrap honored), functions.geo row predicates;
- refusals: geo on v1/v2 metadata, geo defaults, non-geo bbox columns,
  malformed type parameters.
"""

import json
import os
import struct

import pytest

from deimos_spark.functions import geo
from deimos_spark.operators.iceberg_interop import (
    IcebergProtocolError,
    IcebergTableReader,
    IcebergTableWriter,
    iceberg_type_to_spark,
    parse_geo_type,
)

# ------------------------------------------------------------- WKB parser


def test_point_roundtrip_and_envelope():
    p = geo.wkb_point(3.5, -2.0)
    assert geo.parse_wkb_point(p) == (3.5, -2.0)
    assert geo.geometry_type_name(p) == "Point"
    assert geo.parse_envelope(p) == (3.5, -2.0, 3.5, -2.0)


def test_linestring_polygon_multigeometry_envelopes():
    ls = struct.pack("<BII", 1, 2, 3) + struct.pack("<6d", 0, 0, 1, 5, -2, 3)
    assert geo.parse_envelope(ls) == (-2.0, 0.0, 1.0, 5.0)
    # big-endian polygon with a hole: holes count toward the envelope
    ring1 = struct.pack(">I", 4) + struct.pack(">8d", 0, 0, 10, 0, 10, 10, 0, 0)
    ring2 = struct.pack(">I", 3) + struct.pack(">6d", 1, 1, 2, 1, 1, 2)
    pg = struct.pack(">BII", 0, 3, 2) + ring1 + ring2
    assert geo.parse_envelope(pg) == (0.0, 0.0, 10.0, 10.0)
    # multipoint of ISO XYZ points: Z ignored for the 2-D envelope
    mp = (
        struct.pack("<BII", 1, 4, 2)
        + struct.pack("<BI3d", 1, 1001, 1, 2, 9)
        + struct.pack("<BI3d", 1, 1001, -5, 7, 9)
    )
    assert geo.parse_envelope(mp) == (-5.0, 2.0, 1.0, 7.0)
    # nested collection
    gc = struct.pack("<BII", 1, 7, 2) + geo.wkb_point(3.5, -2.0) + ls
    assert geo.parse_envelope(gc) == (-2.0, -2.0, 3.5, 5.0)


def test_ewkb_flags_and_embedded_srid_skipped():
    ew = (
        struct.pack("<BI", 1, 1 | 0x80000000 | 0x20000000)
        + struct.pack("<I", 4326)
        + struct.pack("<3d", 100, 50, 3)
    )
    assert geo.parse_envelope(ew) == (100.0, 50.0, 100.0, 50.0)


def test_empty_geometries_yield_no_envelope():
    assert geo.parse_envelope(struct.pack("<BII", 1, 6, 0)) is None
    nan = float("nan")
    assert geo.parse_envelope(struct.pack("<BIdd", 1, 1, nan, nan)) is None


def test_malformed_wkb_refuses_loudly():
    p = geo.wkb_point(1, 2)
    with pytest.raises(geo.WkbError, match="trailing"):
        geo.parse_envelope(p + b"xx")
    with pytest.raises(geo.WkbError, match="truncated"):
        geo.parse_envelope(p[:10])
    with pytest.raises(geo.WkbError, match="byte order"):
        geo.parse_envelope(b"\x07" + p[1:])
    with pytest.raises(geo.WkbError, match="geometry type"):
        geo.parse_envelope(struct.pack("<BIdd", 1, 99, 0, 0))
    with pytest.raises(geo.WkbError, match="Point"):
        geo.parse_wkb_point(struct.pack("<BII", 1, 2, 0))


# ---------------------------------------------------------- type parsing


def test_parse_geo_type_defaults_and_params():
    assert parse_geo_type("geometry") == {
        "kind": "geometry", "crs": "OGC:CRS84",
    }
    assert parse_geo_type("geometry(EPSG:3857)")["crs"] == "EPSG:3857"
    g = parse_geo_type("geography(OGC:CRS84, planar)")
    assert g["algorithm"] == "planar"
    assert parse_geo_type("geography")["algorithm"] == "spherical"
    assert parse_geo_type("string") is None
    with pytest.raises(IcebergProtocolError, match="malformed"):
        parse_geo_type("geometry(a, b)")  # geometry takes only a CRS


def test_type_mapping_geo_is_binary_also_nested():
    from pyspark.sql import types as T

    assert isinstance(iceberg_type_to_spark("geometry"), T.BinaryType)
    st = iceberg_type_to_spark(
        {
            "type": "struct",
            "fields": [
                {"name": "g", "type": "geography", "required": False}
            ],
        }
    )
    assert isinstance(st.fields[0].dataType, T.BinaryType)


# ------------------------------------------------------- write/read/prune


@pytest.fixture()
def geo_table(spark, tmp_path):
    path = str(tmp_path / "geot")
    w = IcebergTableWriter(
        spark, path, format_version=3,
        geo_columns={"geom": "geometry(OGC:CRS84)"},
    )
    west = [(i, geo.wkb_point(-100.0 + i, 40.0 + i)) for i in range(5)]
    east = [(10 + i, geo.wkb_point(100.0 + i, -30.0 + i)) for i in range(5)]
    w.append(spark.createDataFrame(west, "id long, geom binary"))
    w.append(spark.createDataFrame(east, "id long, geom binary"))
    return path


def test_geo_table_roundtrip_and_metadata(spark, geo_table):
    r = IcebergTableReader(spark, geo_table)
    assert r.read().count() == 10
    gc = r.geo_columns()
    assert gc["geom"]["kind"] == "geometry"
    assert gc["geom"]["crs"] == "OGC:CRS84"
    # the second append proved evolve accepts binary against geometry


def test_bbox_filter_prunes_files_and_shrinks_only(spark, geo_table):
    r = IcebergTableReader(spark, geo_table)
    west_box = {"geom": (-110, 30, -80, 60)}
    assert r.read(bbox_filter=west_box).count() == 5
    d_all, *_ = r._file_sets()
    d_west, *_ = r._file_sets(bbox_filter=west_box)
    assert len(d_west) < len(d_all)  # files actually pruned
    # a box covering everything prunes nothing and loses nothing
    assert r.read(bbox_filter={"geom": (-180, -90, 180, 90)}).count() == 10


def test_row_level_predicate_and_envelope_udf(spark, geo_table):
    r = IcebergTableReader(spark, geo_table)
    full = r.read()
    n = full.filter(
        geo.bbox_intersects("geom", (-110, 30, -97.5, 60))
    ).count()
    assert n == 3  # points at x = -100, -99, -98
    row = (
        full.select("id", geo.wkb_envelope("geom").alias("e"))
        .orderBy("id")
        .first()
    )
    assert (row.e.xmin, row.e.ymin) == (-100.0, 40.0)


def test_manifest_geo_bounds_are_wkb_points(spark, geo_table):
    r = IcebergTableReader(spark, geo_table)
    data, *_ = r._file_sets()
    assert data  # then inspect one manifest entry's bounds directly
    from deimos_spark.schemas.avro_ocf import ocf_read

    snap = r.snapshot(None)
    _, manifests = ocf_read(r._local(snap["manifest-list"]))
    found = False
    for mf in manifests:
        _, entries = ocf_read(r._local(mf["manifest_path"]))
        for e in entries:
            df = e["data_file"]
            lows = {
                x["key"]: x["value"] for x in (df.get("lower_bounds") or [])
            }
            if 2 in lows:  # geom field id
                x, y = geo.parse_wkb_point(lows[2])
                assert -105 <= x <= 110
                found = True
    assert found


def test_geography_antimeridian_wrap_pruning():
    """Wrapped x-bounds (lower.x > upper.x) are [lx,180] ∪ [-180,ux]:
    disjointness needs BOTH pieces to miss."""
    wrap_rec = {
        "lower_bounds": [{"key": 7, "value": geo.wkb_point(170.0, -10.0)}],
        "upper_bounds": [{"key": 7, "value": geo.wkb_point(-170.0, 10.0)}],
    }
    prune = IcebergTableReader._entry_outside_bbox
    gy = lambda box: prune(wrap_rec, {7: (box, "geography")})
    assert gy((175, -5, 179, 5)) is False   # hits the east piece
    assert gy((-179, -5, -172, 5)) is False  # hits the west piece
    assert gy((0, -5, 10, 5)) is True        # misses both
    assert gy((0, 20, 10, 30)) is True       # y-disjoint
    # missing / undecodable bounds never prune
    assert prune({}, {7: ((0, 0, 1, 1), "geography")}) is False
    bad = {
        "lower_bounds": [{"key": 7, "value": b"junk"}],
        "upper_bounds": [{"key": 7, "value": b"junk"}],
    }
    assert prune(bad, {7: ((0, 0, 1, 1), "geography")}) is False


# --------------------------------------------------------------- refusals


def test_geo_requires_v3_writer_and_binary_column(spark, tmp_path):
    with pytest.raises(IcebergProtocolError, match="format-version 3"):
        IcebergTableWriter(
            spark, str(tmp_path / "a"), format_version=2,
            geo_columns={"g": "geometry"},
        )
    w = IcebergTableWriter(
        spark, str(tmp_path / "b"), format_version=3,
        geo_columns={"g": "geometry"},
    )
    df = spark.createDataFrame([(1, "not-wkb")], "id long, g string")
    with pytest.raises(IcebergProtocolError, match="binary"):
        w.append(df)
    with pytest.raises(IcebergProtocolError, match="not a"):
        IcebergTableWriter(
            spark, str(tmp_path / "c"), format_version=3,
            geo_columns={"g": "varchar"},
        )


def test_geo_on_v2_metadata_refuses_at_open(spark, tmp_path):
    path = str(tmp_path / "v2geo")
    w = IcebergTableWriter(spark, path)  # v2
    w.append(spark.createDataFrame([(1, "x")], "id long, v string"))
    meta_dir = os.path.join(path, "metadata")
    with open(os.path.join(meta_dir, "version-hint.text")) as fh:
        mv = int(fh.read().strip())
    mpath = os.path.join(meta_dir, f"v{mv}.metadata.json")
    with open(mpath) as fh:
        md = json.load(fh)
    sch = md["schemas"][md.get("current-schema-id", 0)]
    sch["fields"].append(
        {"id": 99, "name": "g", "required": False, "type": "geometry"}
    )
    with open(mpath, "w") as fh:
        json.dump(md, fh)
    with pytest.raises(IcebergProtocolError, match="format-version 3"):
        IcebergTableReader(spark, path)


def test_geo_default_refuses_by_name(spark, tmp_path):
    path = str(tmp_path / "v3geodef")
    w = IcebergTableWriter(spark, path, format_version=3)
    w.append(spark.createDataFrame([(1, "x")], "id long, v string"))
    meta_dir = os.path.join(path, "metadata")
    with open(os.path.join(meta_dir, "version-hint.text")) as fh:
        mv = int(fh.read().strip())
    mpath = os.path.join(meta_dir, f"v{mv}.metadata.json")
    with open(mpath) as fh:
        md = json.load(fh)
    sch = next(
        s for s in md["schemas"]
        if s.get("schema-id") == md.get("current-schema-id", 0)
    )
    sch["fields"].append(
        {
            "id": 98, "name": "g", "required": False,
            "type": "geometry", "initial-default": "POINT(0 0)",
        }
    )
    with open(mpath, "w") as fh:
        json.dump(md, fh)
    with pytest.raises(IcebergProtocolError, match="no geo single-value"):
        IcebergTableReader(spark, path)


def test_bbox_filter_validation(spark, geo_table):
    r = IcebergTableReader(spark, geo_table)
    with pytest.raises(IcebergProtocolError, match="not a top-level"):
        r.read(bbox_filter={"id": (0, 0, 1, 1)})
    with pytest.raises(IcebergProtocolError, match="empty box"):
        r.read(bbox_filter={"geom": (5, 0, 1, 1)})
    with pytest.raises(IcebergProtocolError, match="expected"):
        r.read(bbox_filter={"geom": (0, 0, 1)})


def test_engine_sql_geo_functions(spark):
    """st_envelope / st_geomtype are reachable from the SQL entry."""
    from deimos_spark.engine import Engine

    eng = Engine(spark).register_geo_functions()
    df = spark.createDataFrame(
        [(1, geo.wkb_point(10.0, 20.0)), (2, None)], "id long, g binary"
    )
    eng.register_view("geot_sql", df)
    rows = eng.sql(
        "SELECT id, st_geomtype(g) AS t, st_envelope(g).xmin AS x "
        "FROM geot_sql ORDER BY id"
    ).collect()
    assert [(r.id, r.t, r.x) for r in rows] == [
        (1, "Point", 10.0), (2, None, None),
    ]


def test_geography_nonpoint_columns_get_spherical_bounds(spark, tmp_path):
    """r14 (VERDICT r13 #7): non-POINT geography values now get
    covering SPHERICAL-edge bounds — per-edge great-circle latitude
    extrema (an east-west arc at lat 60 bulges to ~73.9°, which a
    vertex-only envelope would miss and then MIS-PRUNE) — instead of
    disabling the column's bounds. Unparseable bytes still disable
    (missing bounds never mis-prune)."""
    import struct as _s

    from deimos_spark.schemas.avro_ocf import ocf_read

    def bounds_for(path):
        r = IcebergTableReader(spark, path)
        snap = r.snapshot(None)
        _, manifests = ocf_read(r._local(snap["manifest-list"]))
        out = {}
        for mf in manifests:
            _, entries = ocf_read(r._local(mf["manifest_path"]))
            for e in entries:
                df = e["data_file"]
                lows = {x["key"]: x["value"] for x in df.get("lower_bounds") or []}
                his = {x["key"]: x["value"] for x in df.get("upper_bounds") or []}
                if 2 in lows:
                    out[2] = (
                        geo.parse_wkb_point(lows[2]),
                        geo.parse_wkb_point(his[2]),
                    )
        return out

    # all points -> field 2 bounded exactly
    p1 = str(tmp_path / "pts")
    w1 = IcebergTableWriter(
        spark, p1, format_version=3, geo_columns={"g": "geography"},
    )
    w1.append(spark.createDataFrame(
        [(1, geo.wkb_point(10.0, 1.0)), (2, geo.wkb_point(20.0, 2.0))],
        "id long, g binary",
    ).coalesce(1))
    b = bounds_for(p1)
    assert 2 in b and b[2][0] == (10.0, 1.0) and b[2][1] == (20.0, 2.0)

    # a high-latitude east-west arc: bounds present AND cover the
    # great-circle bulge (vertex max lat 60, true max ≈ 73.898)
    arc = _s.pack("<BII", 1, 2, 2) + _s.pack("<4d", -60, 60, 60, 60)
    p2 = str(tmp_path / "arc")
    w2 = IcebergTableWriter(
        spark, p2, format_version=3, geo_columns={"g": "geography"},
    )
    w2.append(spark.createDataFrame(
        [(1, geo.wkb_point(10.0, 1.0)), (2, arc)], "id long, g binary",
    ).coalesce(1))
    b = bounds_for(p2)
    assert 2 in b
    (xlo, _ylo), (xhi, yhi) = b[2]
    assert (xlo, xhi) == (-60.0, 60.0)
    assert 73.8 < yhi < 74.0  # Clairaut extremum, not the vertex 60

    # unparseable bytes still poison the geography bounds
    p3 = str(tmp_path / "bad")
    w3 = IcebergTableWriter(
        spark, p3, format_version=3, geo_columns={"g": "geography"},
    )
    w3.append(spark.createDataFrame(
        [(1, geo.wkb_point(10.0, 1.0)), (2, b"\x07nonsense")],
        "id long, g binary",
    ).coalesce(1))
    assert 2 not in bounds_for(p3)

    # a linestring under GEOMETRY (planar) stays vertex-exact
    p4 = str(tmp_path / "geom")
    w4 = IcebergTableWriter(
        spark, p4, format_version=3, geo_columns={"g": "geometry"},
    )
    w4.append(spark.createDataFrame(
        [(1, arc)], "id long, g binary",
    ).coalesce(1))
    b = bounds_for(p4)
    assert 2 in b and b[2][1] == (60.0, 60.0)  # planar: no bulge


def test_geo_declaration_binds_at_creation_only(spark, tmp_path):
    """A writer-declared geo column must already be geo-typed in an
    existing table's schema — evolving it in as plain binary would
    silently mis-type it for every other engine."""
    path = str(tmp_path / "t")
    IcebergTableWriter(spark, path, format_version=3).append(
        spark.createDataFrame([(1, "x")], "id long, v string")
    )
    w = IcebergTableWriter(
        spark, path, format_version=3, geo_columns={"g": "geometry"},
    )
    df = spark.createDataFrame(
        [(2, "y", geo.wkb_point(0, 0))], "id long, v string, g binary"
    )
    with pytest.raises(IcebergProtocolError, match="created"):
        w.append(df, merge_schema=True)


def test_mixed_endian_nested_collection():
    """A collection may nest geometries of DIFFERENT byte orders — each
    nested geometry carries its own order byte (OGC SFA)."""
    p = geo.wkb_point(3.5, -2.0)  # little-endian
    ls = struct.pack(">BII", 0, 2, 2) + struct.pack(">4d", -7, 1, 4, 9)
    gc = struct.pack("<BII", 1, 7, 2) + p + ls
    assert geo.parse_envelope(gc) == (-7.0, -2.0, 4.0, 9.0)


def test_geo_declaration_kind_mismatch_refuses(spark, tmp_path):
    """A geography declaration against an existing GEOMETRY column (or
    a CRS mismatch) must refuse — it would silently swap coordinate
    semantics for every other engine."""
    path = str(tmp_path / "t")
    IcebergTableWriter(
        spark, path, format_version=3, geo_columns={"g": "geometry"},
    ).append(
        spark.createDataFrame(
            [(1, geo.wkb_point(0, 0))], "id long, g binary"
        )
    )
    w = IcebergTableWriter(
        spark, path, format_version=3, geo_columns={"g": "geography"},
    )
    df = spark.createDataFrame([(2, geo.wkb_point(1, 1))], "id long, g binary")
    with pytest.raises(IcebergProtocolError, match="match"):
        w.append(df)
    # matching declaration still appends
    w2 = IcebergTableWriter(
        spark, path, format_version=3, geo_columns={"g": "geometry"},
    )
    w2.append(df)
    assert IcebergTableReader(spark, path).read().count() == 2


def test_geography_wrapped_write_bounds_roundtrip(spark, tmp_path):
    """Points clustered at ±180: the naive lon range spans the globe
    and prunes nothing; the writer emits the spec's WRAPPED interval
    (lower.x > upper.x) and the reader's wrap-aware pruning uses it."""
    path = str(tmp_path / "t")
    w = IcebergTableWriter(
        spark, path, format_version=3, geo_columns={"g": "geography"},
    )
    pts = [
        (1, geo.wkb_point(176.0, 0.0)),
        (2, geo.wkb_point(179.0, 5.0)),
        (3, geo.wkb_point(-178.0, -5.0)),
    ]
    w.append(
        spark.createDataFrame(pts, "id long, g binary").coalesce(1)
    )
    r = IcebergTableReader(spark, path)
    from deimos_spark.schemas.avro_ocf import ocf_read

    snap = r.snapshot(None)
    _, manifests = ocf_read(r._local(snap["manifest-list"]))
    lo = hi = None
    for mf in manifests:
        _, entries = ocf_read(r._local(mf["manifest_path"]))
        for e in entries:
            df = e["data_file"]
            lows = {x["key"]: x["value"] for x in df["lower_bounds"]}
            his = {x["key"]: x["value"] for x in df["upper_bounds"]}
            if 2 in lows:
                lo = geo.parse_wkb_point(lows[2])
                hi = geo.parse_wkb_point(his[2])
    assert lo is not None and lo[0] == 176.0 and hi[0] == -178.0  # wrapped
    # wrap-aware reads: a mid-Pacific box near +180 hits; mid-Atlantic
    # (inside the excluded gap) prunes the file
    assert r.read(bbox_filter={"g": (178, -10, 180, 10)}).count() == 3
    d_all, *_ = r._file_sets()
    d_miss, *_ = r._file_sets(bbox_filter={"g": (-60, -10, -20, 10)})
    assert len(d_miss) < len(d_all)


def test_wrapped_lon_bounds_helper():
    from deimos_spark.operators.iceberg_interop import _wrapped_lon_bounds

    # spread points: naive range already tightest
    assert _wrapped_lon_bounds([-10.0, 10.0]) is None
    # antimeridian cluster: wrap
    assert _wrapped_lon_bounds([179.0, -179.0]) == (179.0, -179.0)
    # singleton: nothing to tighten
    assert _wrapped_lon_bounds([5.0]) is None


def test_engine_sql_bbox_predicate(spark):
    from deimos_spark.engine import Engine

    eng = Engine(spark).register_geo_functions()
    df = spark.createDataFrame(
        [
            (1, geo.wkb_point(5.0, 5.0)),
            (2, geo.wkb_point(50.0, 50.0)),
            (3, None),
        ],
        "id long, g binary",
    )
    eng.register_view("geot_bbox", df)
    rows = eng.sql(
        "SELECT id FROM geot_bbox "
        "WHERE st_bbox_intersects(g, 0.0D, 0.0D, 10.0D, 10.0D) "
        "ORDER BY id"
    ).collect()
    assert [r.id for r in rows] == [1]


def test_engine_sql_bbox_null_bounds(spark):
    """ADVICE r12: a NULL box bound from SQL must behave as a
    not-satisfied predicate (row filtered out), never a TypeError
    that fails the whole query."""
    from deimos_spark.engine import Engine

    eng = Engine(spark).register_geo_functions()
    df = spark.createDataFrame(
        [
            (1, geo.wkb_point(5.0, 5.0), 10.0),
            (2, geo.wkb_point(5.0, 5.0), None),
        ],
        "id long, g binary, xmax double",
    )
    eng.register_view("geot_bbox_null", df)
    rows = eng.sql(
        "SELECT id FROM geot_bbox_null "
        "WHERE st_bbox_intersects(g, 0.0D, 0.0D, xmax, 10.0D) "
        "ORDER BY id"
    ).collect()
    assert [r.id for r in rows] == [1]


def _poly(rings):
    b = struct.pack("<BII", 1, 3, len(rings))
    for r in rings:
        b += struct.pack("<I", len(r))
        for x, y in r:
            b += struct.pack("<dd", float(x), float(y))
    return b


def test_geography_wrapped_polygon_bounds_and_pruning(spark, tmp_path):
    """VERDICT r13 #7 'done' check: a POLYGON straddling the
    antimeridian gets write-side WRAPPED bounds (lower.x > upper.x) and
    the reader's wrap-aware pruning keeps a mid-Pacific query box while
    skipping a mid-Atlantic one."""
    from deimos_spark.schemas.avro_ocf import ocf_read

    path = str(tmp_path / "wrappoly")
    w = IcebergTableWriter(
        spark, path, format_version=3, geo_columns={"g": "geography"},
    )
    # a quad crossing ±180: lons 172 → -172 (16° wide through the
    # antimeridian), lats 0..10
    quad = _poly(
        [[(172, 0), (-172, 0), (-172, 10), (172, 10), (172, 0)]]
    )
    w.append(
        spark.createDataFrame([(1, quad)], "id long, g binary").coalesce(1)
    )
    r = IcebergTableReader(spark, path)
    snap = r.snapshot(None)
    _, manifests = ocf_read(r._local(snap["manifest-list"]))
    lo = hi = None
    for mf in manifests:
        _, entries = ocf_read(r._local(mf["manifest_path"]))
        for e in entries:
            df = e["data_file"]
            lows = {x["key"]: x["value"] for x in df["lower_bounds"]}
            his = {x["key"]: x["value"] for x in df["upper_bounds"]}
            if 2 in lows:
                lo = geo.parse_wkb_point(lows[2])
                hi = geo.parse_wkb_point(his[2])
    assert lo is not None
    assert lo[0] == 172.0 and hi[0] == -172.0  # wrapped, 16° not 344°
    assert lo[1] == 0.0 and 10.0 <= hi[1] < 10.1  # top edge bulge ≥ 10
    # read-side pruning: box on the antimeridian hits, mid-Atlantic skips
    assert r.read(bbox_filter={"g": (179, 2, 180, 8)}).count() == 1
    d_all, *_ = r._file_sets()
    d_miss, *_ = r._file_sets(bbox_filter={"g": (-40, 2, -20, 8)})
    assert len(d_miss) < len(d_all)


def test_spherical_envelope_polar_cap_and_merge_arcs():
    """The spherical envelope kernel directly: a ring winding a pole
    covers the full longitude circle and extends latitude to that pole
    (minimal-area interpretation, documented); _merge_arcs picks the
    minimal circular cover exactly."""
    from deimos_spark.functions.geo import _merge_arcs, spherical_envelope

    ring = [(lon, 80.0) for lon in range(-180, 181, 30)]
    env = spherical_envelope(_poly([ring]))
    assert env == (-180.0, 80.0, 180.0, 90.0)

    south = [(lon, -75.0) for lon in range(180, -181, -30)]
    env = spherical_envelope(_poly([south]))
    assert env[1] == -90.0 and (env[0], env[2]) == (-180.0, 180.0)

    # merge: two arcs near ±180 wrap; a spread set doesn't
    assert _merge_arcs([(170.0, 175.0), (-175.0, -170.0)]) == (170.0, -170.0)
    assert _merge_arcs([(-10.0, 0.0), (5.0, 10.0)]) == (-10.0, 10.0)
    assert _merge_arcs([(-180.0, 180.0)]) == (-180.0, 180.0)
