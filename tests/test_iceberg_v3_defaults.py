"""Iceberg v3 column defaults (spec: `initial-default` /
`write-default`, JSON single-value serialization).

Semantics under test (table spec "Default values"):
- `initial-default` is the value for rows written BEFORE the field
  was added: data files that do not contain the field surface it;
  files that do contain the column keep their stored values —
  including genuine NULLs (a blanket coalesce would be wrong).
- `write-default` must be materialized by WRITERS into new data
  files when the batch omits the column.
- Defaults we cannot parse (nested types) refuse loudly at open.

Fixtures are hand-authored: a v2 table written by our writer is
upgraded BY THE TEST to format-version 3 with a new schema-id whose
added field carries the default — the reader never sees output of
its own defaults path.
"""

import datetime
import decimal
import json
import os

import pytest

from deimos_spark.operators.iceberg_interop import (
    IcebergProtocolError,
    IcebergTableReader,
    IcebergTableWriter,
    single_value_from_json,
)

SCHEMA = "id bigint, v string"


# ------------------------------------------------- single-value parser

def test_single_value_primitives():
    assert single_value_from_json("boolean", True) is True
    assert single_value_from_json("int", 7) == 7
    assert single_value_from_json("long", 1 << 40) == 1 << 40
    assert single_value_from_json("double", 1.5) == 1.5
    assert single_value_from_json("string", "x") == "x"
    assert single_value_from_json("date", "2017-11-16") == datetime.date(
        2017, 11, 16
    )
    assert single_value_from_json(
        "timestamp", "2017-11-16T22:31:08"
    ) == datetime.datetime(2017, 11, 16, 22, 31, 8)
    tz = single_value_from_json("timestamptz", "2017-11-16T22:31:08+00:00")
    assert tz.tzinfo is not None
    assert single_value_from_json(
        "decimal(9,2)", "14.20"
    ) == decimal.Decimal("14.20")
    assert single_value_from_json("binary", "1F2A") == b"\x1f\x2a"


def test_single_value_refusals():
    with pytest.raises(IcebergProtocolError, match="null"):
        single_value_from_json("int", None)
    with pytest.raises(IcebergProtocolError, match="int default"):
        single_value_from_json("int", "7")
    with pytest.raises(IcebergProtocolError, match="boolean default"):
        single_value_from_json("boolean", 1)
    # struct defaults parse as of r11 (spec JSON form, keyed by field
    # id) — a key that is NOT a field id still refuses
    with pytest.raises(IcebergProtocolError, match="field id"):
        single_value_from_json(
            {"type": "struct", "fields": []}, {"a": 1}
        )
    with pytest.raises(IcebergProtocolError, match="lacks an offset"):
        single_value_from_json("timestamptz", "2017-11-16T22:31:08")


# ------------------------------------------------------------- fixtures

def _v2_table(spark, path, with_null_v=False):
    w = IcebergTableWriter(spark, path)
    rows = [(i, f"r{i}") for i in range(5)]
    if with_null_v:
        rows.append((99, None))
    w.append(spark.createDataFrame(rows, SCHEMA))
    return IcebergTableReader(spark, path)


def _add_default_column(
    path,
    name,
    ice_type,
    initial_default=None,
    write_default=None,
    required=False,
):
    """Hand-author the v3 upgrade: format-version 3 + a NEW schema-id
    appending `name` with the given defaults (what an external
    engine's ALTER TABLE ... ADD COLUMN ... DEFAULT writes)."""
    meta_dir = os.path.join(path, "metadata")
    with open(os.path.join(meta_dir, "version-hint.text")) as fh:
        mv = int(fh.read().strip())
    mpath = os.path.join(meta_dir, f"v{mv}.metadata.json")
    with open(mpath) as fh:
        md = json.load(fh)
    cur = next(
        s
        for s in md["schemas"]
        if s.get("schema-id") == md.get("current-schema-id", 0)
    )
    nid = md.get("last-column-id", len(cur["fields"])) + 1
    field = {"id": nid, "name": name, "required": required, "type": ice_type}
    if initial_default is not None:
        field["initial-default"] = initial_default
    if write_default is not None:
        field["write-default"] = write_default
    new_schema = {
        "type": "struct",
        "schema-id": cur["schema-id"] + 1,
        "fields": [dict(f) for f in cur["fields"]] + [field],
    }
    md["format-version"] = 3
    md["schemas"] = md["schemas"] + [new_schema]
    md["current-schema-id"] = new_schema["schema-id"]
    md["last-column-id"] = nid
    with open(os.path.join(meta_dir, f"v{mv + 1}.metadata.json"), "w") as fh:
        json.dump(md, fh)
    with open(os.path.join(meta_dir, "version-hint.text"), "w") as fh:
        fh.write(str(mv + 1))


# ----------------------------------------------------------------- reads

def test_initial_default_surfaces_for_pre_add_files(spark, tmp_path):
    path = str(tmp_path / "t")
    _v2_table(spark, path)
    _add_default_column(path, "region", "string", initial_default="emea")
    r = IcebergTableReader(spark, path)
    rows = {x["id"]: x["region"] for x in r.read().collect()}
    assert rows == {i: "emea" for i in range(5)}


def test_initial_default_keeps_stored_values_and_nulls(spark, tmp_path):
    """Files that CONTAIN the column keep stored values — including
    genuine NULLs — while pre-add files surface the default."""
    path = str(tmp_path / "t")
    _v2_table(spark, path)
    _add_default_column(path, "score", "int", initial_default=7)
    w = IcebergTableWriter(spark, path, format_version=3)
    w.append(
        spark.createDataFrame(
            [(10, "new", 3), (11, "new2", None)],
            "id bigint, v string, score int",
        )
    )
    r = IcebergTableReader(spark, path)
    rows = {x["id"]: x["score"] for x in r.read().collect()}
    assert rows[10] == 3
    assert rows[11] is None  # stored NULL ≠ missing column
    for i in range(5):
        assert rows[i] == 7


def test_typed_defaults(spark, tmp_path):
    path = str(tmp_path / "t")
    _v2_table(spark, path)
    _add_default_column(
        path, "as_of", "date", initial_default="2020-02-29"
    )
    r = IcebergTableReader(spark, path)
    assert {x["as_of"] for x in r.read().collect()} == {
        datetime.date(2020, 2, 29)
    }


def test_unparseable_default_refuses_at_open(spark, tmp_path):
    path = str(tmp_path / "t")
    _v2_table(spark, path)
    _add_default_column(
        path,
        "pt",
        {"type": "struct", "fields": []},
        initial_default={"x": 1},
    )
    with pytest.raises(IcebergProtocolError, match="initial-default"):
        IcebergTableReader(spark, path)


def test_read_incremental_patches_defaults(spark, tmp_path):
    path = str(tmp_path / "t")
    _v2_table(spark, path)
    _add_default_column(path, "region", "string", initial_default="emea")
    r = IcebergTableReader(spark, path)
    got = r.read_incremental(snapshot_col="_sid").collect()
    assert {x["region"] for x in got} == {"emea"}
    assert all(x["_sid"] is not None for x in got)


def test_changelog_inserts_patch_defaults(spark, tmp_path):
    path = str(tmp_path / "t")
    _v2_table(spark, path)
    _add_default_column(path, "region", "string", initial_default="emea")
    r = IcebergTableReader(spark, path)
    ch = r.read_changelog().collect()
    assert {x["_change_type"] for x in ch} == {"insert"}
    assert {x["region"] for x in ch} == {"emea"}


# ---------------------------------------------------------------- writes

def test_write_default_materialized_for_missing_column(spark, tmp_path):
    path = str(tmp_path / "t")
    _v2_table(spark, path)
    _add_default_column(
        path, "region", "string",
        initial_default="emea", write_default="apac",
    )
    w = IcebergTableWriter(spark, path, format_version=3)
    w.append(
        spark.createDataFrame([(20, "x"), (21, "y")], SCHEMA)
    )
    r = IcebergTableReader(spark, path)
    rows = {x["id"]: x["region"] for x in r.read().collect()}
    # pre-add files: initial-default; new batch without the column:
    # write-default, PHYSICALLY in the file (not a read-time patch)
    assert rows[20] == rows[21] == "apac"
    for i in range(5):
        assert rows[i] == "emea"

    import pyarrow.parquet as pq

    data_dir = os.path.join(path, "data")
    physical = set()
    for n in os.listdir(data_dir):
        if not n.endswith(".parquet"):
            continue
        t = pq.read_table(os.path.join(data_dir, n))
        if "region" in t.schema.names:
            physical.update(t["region"].to_pylist())
    assert physical == {"apac"}


def test_required_column_with_write_default_fillable(spark, tmp_path):
    path = str(tmp_path / "t")
    _v2_table(spark, path)
    _add_default_column(
        path, "src", "string",
        initial_default="legacy", write_default="live", required=True,
    )
    w = IcebergTableWriter(spark, path, format_version=3)
    w.append(spark.createDataFrame([(30, "z")], SCHEMA))  # no refusal
    r = IcebergTableReader(spark, path)
    rows = {x["id"]: x["src"] for x in r.read().collect()}
    assert rows[30] == "live"
    assert rows[0] == "legacy"


def test_batch_with_column_keeps_its_values(spark, tmp_path):
    path = str(tmp_path / "t")
    _v2_table(spark, path)
    _add_default_column(
        path, "region", "string", write_default="apac"
    )
    w = IcebergTableWriter(spark, path, format_version=3)
    w.append(
        spark.createDataFrame(
            [(40, "x", "emea")], "id bigint, v string, region string"
        )
    )
    r = IcebergTableReader(spark, path)
    rows = {x["id"]: x["region"] for x in r.read().collect()}
    assert rows[40] == "emea"


def test_malformed_defaults_refuse_as_protocol_errors(spark, tmp_path):
    """Stdlib parse failures (bad ISO date, decimal garbage, odd-length
    hex, wrong JSON type) must surface as IcebergProtocolError — the
    gate contract — not ValueError/InvalidOperation/binascii.Error."""
    for ice_type, bad in [
        ("date", "2024-13-99"),
        ("date", 42),
        ("decimal(9,2)", "abc"),
        ("binary", "F0F"),  # odd-length hex
        ("timestamp", "not-a-time"),
    ]:
        path = str(tmp_path / f"t_{ice_type.replace('(', '_')}_{bad}")
        _v2_table(spark, path)
        _add_default_column(path, "bad_col", ice_type, initial_default=bad)
        with pytest.raises(IcebergProtocolError):
            IcebergTableReader(spark, path)


def test_unreadable_default_on_superseded_schema_opens(spark, tmp_path):
    """ADVICE r9: reads only ever resolve current-schema-id, so an
    unreadable default on a superseded HISTORICAL schema (e.g. the
    problem column was since dropped) must not refuse the whole
    table."""
    path = str(tmp_path / "t")
    _v2_table(spark, path)
    # historical schema carrying a nested (unparseable) default, then a
    # clean current schema without it — what drop-column leaves behind
    _add_default_column(
        path,
        "bad",
        {"type": "struct", "fields": []},
        initial_default={"a": 1},
    )
    meta_dir = os.path.join(path, "metadata")
    with open(os.path.join(meta_dir, "version-hint.text")) as fh:
        mv = int(fh.read().strip())
    with open(os.path.join(meta_dir, f"v{mv}.metadata.json")) as fh:
        md = json.load(fh)
    bad = next(
        s
        for s in md["schemas"]
        if s["schema-id"] == md["current-schema-id"]
    )
    clean = {
        "type": "struct",
        "schema-id": bad["schema-id"] + 1,
        "fields": [f for f in bad["fields"] if f["name"] != "bad"],
    }
    md["schemas"].append(clean)
    md["current-schema-id"] = clean["schema-id"]
    with open(
        os.path.join(meta_dir, f"v{mv + 1}.metadata.json"), "w"
    ) as fh:
        json.dump(md, fh)
    with open(os.path.join(meta_dir, "version-hint.text"), "w") as fh:
        fh.write(str(mv + 1))

    r = IcebergTableReader(spark, path)  # must not raise
    assert r.read().count() == 5
    # (the same default on the CURRENT schema still refuses — pinned by
    # test_unparseable_default_refuses_at_open)
