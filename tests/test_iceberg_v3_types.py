"""Iceberg v3 types + nested defaults (VERDICT r10 #4 — shrink the v3
refusal surface). Spec v3 additions under test:

- nested-typed column defaults: struct (JSON object keyed by field id
  as string), list (array), map ({"keys": [...], "values": [...]})
  single-value forms parse and PATCH into reads for pre-add files;
- `unknown` columns read as null (excluded from the parquet read
  schema, re-added as null literal);
- `timestamp_ns` / `timestamptz_ns` read as epoch-nanos longs (the
  engine-wide convention) and their defaults parse 9-digit fractions;
- `variant` reads natively; `geometry` / `geography` read as WKB
  binary (r12 session 2 — tests/test_iceberg_geo.py);
- a default on a field nested INSIDE a struct refuses loudly (per-file
  subfield presence probing is unimplemented — silent drop would be
  wrong);
- `unknown` nested inside a container refuses loudly.

Fixtures are hand-authored metadata upgrades, as in
test_iceberg_v3_defaults.py — the reader never sees output of its own
defaults path.
"""

import json
import os

import pytest

from deimos_spark.operators.iceberg_interop import (
    IcebergProtocolError,
    IcebergTableReader,
    IcebergTableWriter,
    iceberg_type_to_spark,
    single_value_from_json,
)

SCHEMA = "id bigint, v string"


def _v2_table(spark, path):
    w = IcebergTableWriter(spark, path)
    w.append(
        spark.createDataFrame([(i, f"r{i}") for i in range(4)], SCHEMA)
    )
    return path


def _add_column(path, field_patch):
    """Hand-author the v3 upgrade: format-version 3 + a new schema-id
    appending the given raw field dict (ids inside nested types are
    the caller's responsibility, as an external engine would emit)."""
    meta_dir = os.path.join(path, "metadata")
    with open(os.path.join(meta_dir, "version-hint.text")) as fh:
        mv = int(fh.read().strip())
    with open(os.path.join(meta_dir, f"v{mv}.metadata.json")) as fh:
        md = json.load(fh)
    cur = next(
        s
        for s in md["schemas"]
        if s.get("schema-id") == md.get("current-schema-id", 0)
    )
    nid = md.get("last-column-id", len(cur["fields"])) + 100
    field = {"id": nid, "required": False, **field_patch}
    new_schema = {
        "type": "struct",
        "schema-id": cur["schema-id"] + 1,
        "fields": [dict(f) for f in cur["fields"]] + [field],
    }
    md["format-version"] = 3
    md["schemas"] = md["schemas"] + [new_schema]
    md["current-schema-id"] = new_schema["schema-id"]
    md["last-column-id"] = nid + 50
    with open(os.path.join(meta_dir, f"v{mv + 1}.metadata.json"), "w") as fh:
        json.dump(md, fh)
    with open(os.path.join(meta_dir, "version-hint.text"), "w") as fh:
        fh.write(str(mv + 1))


# -------------------------------------------------- single-value parser

STRUCT_T = {
    "type": "struct",
    "fields": [
        {"id": 1, "name": "a", "required": True, "type": "int"},
        {"id": 2, "name": "b", "required": False, "type": "string"},
    ],
}


def test_struct_single_value_keyed_by_field_id():
    assert single_value_from_json(STRUCT_T, {"1": 7, "2": "x"}) == {
        "a": 7,
        "b": "x",
    }
    # missing optional field -> null
    assert single_value_from_json(STRUCT_T, {"1": 7}) == {
        "a": 7,
        "b": None,
    }
    with pytest.raises(IcebergProtocolError, match="required"):
        single_value_from_json(STRUCT_T, {"2": "x"})
    with pytest.raises(IcebergProtocolError, match="field id"):
        single_value_from_json(STRUCT_T, {"9": 1})


def test_list_and_map_single_values():
    lt = {"type": "list", "element-id": 3, "element": "long"}
    assert single_value_from_json(lt, [1, 2, 3]) == [1, 2, 3]
    with pytest.raises(IcebergProtocolError, match="array"):
        single_value_from_json(lt, {"1": 2})
    mt = {
        "type": "map", "key-id": 4, "key": "string",
        "value-id": 5, "value": "int",
    }
    assert single_value_from_json(
        mt, {"keys": ["a", "b"], "values": [1, 2]}
    ) == [("a", 1), ("b", 2)]
    with pytest.raises(IcebergProtocolError, match="keys"):
        single_value_from_json(mt, {"keys": ["a"], "values": [1, 2]})


def test_timestamp_ns_single_values():
    assert (
        single_value_from_json(
            "timestamp_ns", "1970-01-01T00:00:01.000000001"
        )
        == 1_000_000_001
    )
    assert (
        single_value_from_json(
            "timestamptz_ns", "1970-01-01T00:00:00.5+00:00"
        )
        == 500_000_000
    )
    with pytest.raises(IcebergProtocolError, match="offset"):
        single_value_from_json("timestamptz_ns", "1970-01-01T00:00:00.5")
    with pytest.raises(IcebergProtocolError, match="unknown"):
        single_value_from_json("unknown", "anything")


def test_timestamptz_ns_fractionless_offset():
    # r12 regression (ADVICE): a greedy base regex swallowed the offset
    # whenever there were no fractional digits, so valid fraction-less
    # offset-bearing defaults were spuriously refused with "lacks an
    # offset".
    assert (
        single_value_from_json("timestamptz_ns", "1970-01-01T01:00:00Z")
        == 3_600_000_000_000
    )
    assert (
        single_value_from_json(
            "timestamptz_ns", "1970-01-01T05:30:00+05:30"
        )
        == 0
    )
    # fraction-less timestamp_ns (no offset) keeps parsing
    assert (
        single_value_from_json("timestamp_ns", "1970-01-01T00:00:02")
        == 2_000_000_000
    )
    # and the no-offset refusal still fires on the fraction-less form
    with pytest.raises(IcebergProtocolError, match="offset"):
        single_value_from_json("timestamptz_ns", "1970-01-01T00:00:00")


def test_v3_type_mapping():
    from pyspark.sql import types as T

    assert isinstance(iceberg_type_to_spark("unknown"), T.NullType)
    assert isinstance(iceberg_type_to_spark("timestamp_ns"), T.LongType)
    assert isinstance(iceberg_type_to_spark("timestamptz_ns"), T.LongType)
    # r12: variant maps to Spark's native VariantType (reads both
    # physical layouts — see the variant tests below)
    assert isinstance(iceberg_type_to_spark("variant"), T.VariantType)
    # r12 session 2: geo types read as WKB binary (full battery in
    # tests/test_iceberg_geo.py)
    for t in ("geometry", "geometry(srid:3857)", "geography"):
        assert isinstance(iceberg_type_to_spark(t), T.BinaryType)


# ----------------------------------------------------------------- reads

def test_struct_default_patches_pre_add_files(spark, tmp_path):
    path = _v2_table(spark, str(tmp_path / "t"))
    _add_column(
        path,
        {
            "name": "meta",
            "type": {
                "type": "struct",
                "fields": [
                    {"id": 201, "name": "src", "required": False,
                     "type": "string"},
                    {"id": 202, "name": "gen", "required": False,
                     "type": "int"},
                ],
            },
            "initial-default": {"201": "backfill", "202": 3},
        },
    )
    rows = IcebergTableReader(spark, path).read().collect()
    assert len(rows) == 4
    for r in rows:
        assert r["meta"]["src"] == "backfill" and r["meta"]["gen"] == 3


def test_list_and_map_defaults_patch(spark, tmp_path):
    path = _v2_table(spark, str(tmp_path / "t"))
    _add_column(
        path,
        {
            "name": "tags",
            "type": {"type": "list", "element-id": 210,
                     "element": "string"},
            "initial-default": ["a", "b"],
        },
    )
    _add_column(
        path,
        {
            "name": "attrs",
            "type": {
                "type": "map", "key-id": 220, "key": "string",
                "value-id": 221, "value": "long",
            },
            "initial-default": {"keys": ["k"], "values": [9]},
        },
    )
    rows = IcebergTableReader(spark, path).read().collect()
    for r in rows:
        assert list(r["tags"]) == ["a", "b"]
        assert dict(r["attrs"]) == {"k": 9}


def test_unknown_column_reads_as_null(spark, tmp_path):
    path = _v2_table(spark, str(tmp_path / "t"))
    _add_column(path, {"name": "mystery", "type": "unknown"})
    r = IcebergTableReader(spark, path)
    rows = r.read().collect()
    assert len(rows) == 4
    assert all(x["mystery"] is None for x in rows)
    assert r.read().columns == ["id", "v", "mystery"]


def test_timestamp_ns_default_surfaces_as_long_nanos(spark, tmp_path):
    path = _v2_table(spark, str(tmp_path / "t"))
    _add_column(
        path,
        {
            "name": "ingested_at",
            "type": "timestamp_ns",
            "initial-default": "1970-01-01T00:00:02.000000123",
        },
    )
    rows = IcebergTableReader(spark, path).read().collect()
    assert {x["ingested_at"] for x in rows} == {2_000_000_123}


def test_geo_types_open_at_v3_and_surface_metadata(spark, tmp_path):
    """r12 session 2: geometry/geography no longer refuse — an added
    geo column opens, reads null for pre-add files (WKB binary), and
    reports CRS metadata (full battery: tests/test_iceberg_geo.py)."""
    for t, name in (
        ("geometry(srid:3857)", "geometry"),
        ("geography", "geography"),
    ):
        path = _v2_table(spark, str(tmp_path / f"t_{name}"))
        _add_column(path, {"name": "geo", "type": t})
        r = IcebergTableReader(spark, path)
        assert r.geo_columns()["geo"]["kind"] == name
        rows = r.read().collect()
        assert len(rows) == 4 and all(x.geo is None for x in rows)


def test_nested_subfield_default_refuses_loudly(spark, tmp_path):
    path = _v2_table(spark, str(tmp_path / "t"))
    _add_column(
        path,
        {
            "name": "meta",
            "type": {
                "type": "struct",
                "fields": [
                    {"id": 301, "name": "src", "required": False,
                     "type": "string", "initial-default": "x"},
                ],
            },
        },
    )
    with pytest.raises(IcebergProtocolError, match="NESTED"):
        IcebergTableReader(spark, path)


def test_nested_unknown_refuses_loudly(spark, tmp_path):
    path = _v2_table(spark, str(tmp_path / "t"))
    _add_column(
        path,
        {
            "name": "wrap",
            "type": {
                "type": "struct",
                "fields": [
                    {"id": 310, "name": "inner", "required": False,
                     "type": "unknown"},
                ],
            },
        },
    )
    with pytest.raises(IcebergProtocolError, match="nested"):
        IcebergTableReader(spark, path)


# ------------------------------------------------------------- variant

def _variant_df(spark):
    from pyspark.sql import functions as F

    return spark.range(4).select(
        F.col("id"),
        F.parse_json(
            F.concat(
                F.lit('{"a": '),
                F.col("id").cast("string"),
                F.lit(', "tags": ["x","y"]}'),
            )
        ).alias("payload"),
    )


def _data_layouts(path):
    """Distinct variant physical layouts across the table's non-empty
    data files, via the stdlib footer parser (pyarrow refuses
    VARIANT-annotated footers wholesale)."""
    import glob

    from deimos_spark.schemas.thriftcompact import read_footer

    layouts = set()
    for f in glob.glob(os.path.join(path, "data", "*.parquet")):
        n, tree = read_footer(f)
        p = [c for c in tree.children if c.name == "payload"]
        if p and n:
            layouts.add(tuple(sorted(p[0].child_names())))
    return layouts


@pytest.mark.parametrize("shredded", [False, True])
def test_variant_roundtrip_both_layouts(spark, tmp_path, shredded):
    """r12 (VERDICT #2): Iceberg v3 variant columns read as Spark
    VariantType. Both physical layouts: unshredded (metadata/value
    pair — the spec's baseline) AND shredded (typed_value tree —
    Spark's parquet reader handles it natively,
    spark.sql.variant.allowReadingShredded). The footer parser pins
    which layout each fixture actually exercises."""
    from pyspark.sql import functions as F

    path = str(tmp_path / "t")
    old = spark.conf.get("spark.sql.variant.writeShredding.enabled")
    spark.conf.set(
        "spark.sql.variant.writeShredding.enabled", str(shredded).lower()
    )
    try:
        IcebergTableWriter(spark, path, format_version=3).append(
            _variant_df(spark)
        )
    finally:
        spark.conf.set("spark.sql.variant.writeShredding.enabled", old)
    want = {("metadata", "typed_value", "value")} if shredded else {
        ("metadata", "value")
    }
    assert _data_layouts(path) == want
    r = IcebergTableReader(spark, path)
    import pyspark.sql.types as ST

    assert isinstance(
        r.schema()["payload"].dataType, ST.VariantType
    )
    got = sorted(
        (x["id"], x["a"], x["t0"])
        for x in r.read()
        .select(
            "id",
            F.variant_get("payload", "$.a", "int").alias("a"),
            F.variant_get("payload", "$.tags[0]", "string").alias("t0"),
        )
        .collect()
    )
    assert got == [(i, i, "x") for i in range(4)]


def test_variant_added_column_reads_null(spark, tmp_path):
    path = _v2_table(spark, str(tmp_path / "t"))
    _add_column(path, {"name": "extra", "type": "variant"})
    rows = IcebergTableReader(spark, path).read().collect()
    assert len(rows) == 4 and all(x["extra"] is None for x in rows)


def test_variant_on_v2_metadata_refuses(spark, tmp_path):
    """variant is a v3 type: a table whose metadata still claims
    format-version 2 but declares a variant column is malformed and
    must refuse at open, naming the field and version."""
    path = _v2_table(spark, str(tmp_path / "t"))
    _add_column(path, {"name": "extra", "type": "variant"})
    # _add_column writes format-version 3; forge it back to 2
    meta_dir = os.path.join(path, "metadata")
    with open(os.path.join(meta_dir, "version-hint.text")) as fh:
        mv = int(fh.read().strip())
    mpath = os.path.join(meta_dir, f"v{mv}.metadata.json")
    with open(mpath) as fh:
        md = json.load(fh)
    md["format-version"] = 2
    with open(mpath, "w") as fh:
        json.dump(md, fh)
    with pytest.raises(IcebergProtocolError, match="format-version 2"):
        IcebergTableReader(spark, path)


def test_variant_default_refuses_loudly(spark, tmp_path):
    path = _v2_table(spark, str(tmp_path / "t"))
    _add_column(
        path,
        {"name": "extra", "type": "variant", "initial-default": "{}"},
    )
    with pytest.raises(IcebergProtocolError, match="variant"):
        IcebergTableReader(spark, path)


def test_variant_write_requires_v3_writer(spark, tmp_path):
    with pytest.raises(IcebergProtocolError, match="format_version=3"):
        IcebergTableWriter(
            spark, str(tmp_path / "t"), format_version=2
        ).append(_variant_df(spark))
