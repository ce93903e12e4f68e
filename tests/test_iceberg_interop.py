"""Iceberg interop: the reader walks hand-authored metadata chains
written strictly per the PUBLIC table spec — version-hint →
vN.metadata.json → manifest-list (Avro OCF) → manifests (Avro OCF) →
parquet data files. The OCF layer itself is round-trip tested
(write → read, null + deflate codecs, multi-block).
"""

import json
import os
import re

import pytest
from pyspark.sql import types as T

from deimos_spark.operators.iceberg_interop import (
    IcebergProtocolError,
    IcebergTableReader,
    iceberg_type_to_spark,
)
from deimos_spark.schemas.avro_ocf import OcfError, ocf_read, ocf_write

# ------------------------------------------------------------------- OCF

OCF_SCHEMA = {
    "type": "record",
    "name": "R",
    "fields": [
        {"name": "a", "type": "long"},
        {"name": "b", "type": "string"},
        {"name": "c", "type": ["null", "long"], "default": None},
    ],
}


def test_ocf_roundtrip_multiblock_both_codecs(tmp_path):
    recs = [
        {"a": i, "b": f"s{i}", "c": None if i % 2 else i} for i in range(2500)
    ]
    for codec in ("null", "deflate"):
        p = str(tmp_path / f"t_{codec}.avro")
        ocf_write(p, OCF_SCHEMA, recs, codec=codec)  # 3 blocks @1000
        schema, got = ocf_read(p)
        assert got == recs
        assert schema["name"] == "R"


def test_ocf_highly_compressible_tiny_records(tmp_path):
    """Deflate routinely beats 8:1 on repetitive data, so the absurd-
    count guard must bound the record count against the DECOMPRESSED
    body — a valid block of tiny identical records (count far above
    8 x on-disk block size) must read back, not be rejected."""
    schema = {"type": "record", "name": "T",
              "fields": [{"name": "a", "type": "long"}]}
    recs = [{"a": 0}] * 20000  # 1-byte records, compresses to ~tens of bytes
    p = str(tmp_path / "tiny.avro")
    ocf_write(p, schema, recs, codec="deflate", records_per_block=20000)
    _, got = ocf_read(p)
    assert got == recs


def test_ocf_rejects_garbage(tmp_path):
    p = str(tmp_path / "bad.avro")
    with open(p, "wb") as fh:
        fh.write(b"not an avro container at all")
    with pytest.raises(OcfError, match="not an Avro"):
        ocf_read(p)


# -------------------------------------------------- Iceberg fixture kit

MANIFEST_ENTRY_SCHEMA = {
    "type": "record",
    "name": "manifest_entry",
    "fields": [
        {"name": "status", "type": "int"},
        {"name": "snapshot_id", "type": ["null", "long"], "default": None},
        {
            "name": "data_file",
            "type": {
                "type": "record",
                "name": "data_file",
                "fields": [
                    {"name": "file_path", "type": "string"},
                    {"name": "file_format", "type": "string"},
                    {"name": "record_count", "type": "long"},
                    {"name": "file_size_in_bytes", "type": "long"},
                ],
            },
        },
    ],
}

MANIFEST_FILE_SCHEMA = {
    "type": "record",
    "name": "manifest_file",
    "fields": [
        {"name": "manifest_path", "type": "string"},
        {"name": "manifest_length", "type": "long"},
        {"name": "partition_spec_id", "type": "int"},
        {"name": "added_snapshot_id", "type": ["null", "long"], "default": None},
    ],
}

ICE_SCHEMA_V1 = {
    "type": "struct",
    "schema-id": 0,
    "fields": [
        {"id": 1, "name": "id", "required": True, "type": "long"},
        {"id": 2, "name": "v", "required": False, "type": "string"},
    ],
}


def _data_file(spark, table, rel, rows, schema="id long, v string"):
    tmp = os.path.join(table, "__tmp")
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(tmp)
    part = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
    dest = os.path.join(table, "data", rel)
    os.makedirs(os.path.dirname(dest), exist_ok=True)
    os.rename(os.path.join(tmp, part), dest)
    import shutil

    shutil.rmtree(tmp)
    return dest


def _manifest(table, name, entries):
    p = os.path.join(table, "metadata", name)
    ocf_write(
        p,
        MANIFEST_ENTRY_SCHEMA,
        [
            {
                "status": status,
                "snapshot_id": None,
                "data_file": {
                    "file_path": f"file://{path}",
                    "file_format": "PARQUET",
                    "record_count": 1,
                    "file_size_in_bytes": os.path.getsize(path),
                },
            }
            for status, path in entries
        ],
    )
    return p


def _manifest_list(table, name, manifest_paths):
    p = os.path.join(table, "metadata", name)
    ocf_write(
        p,
        MANIFEST_FILE_SCHEMA,
        [
            {
                "manifest_path": f"file://{mp}",
                "manifest_length": os.path.getsize(mp),
                "partition_spec_id": 0,
                "added_snapshot_id": None,
            }
            for mp in manifest_paths
        ],
    )
    return p


def _metadata(table, version, snapshots, current, fmt_version=1):
    md = {
        "format-version": fmt_version,
        "table-uuid": "00000000-0000-0000-0000-000000000000",
        "location": f"file://{table}",
        "last-updated-ms": 0,
        "last-column-id": 2,
        "schema": ICE_SCHEMA_V1,
        "partition-spec": [],
        "snapshots": snapshots,
        "current-snapshot-id": current,
    }
    if fmt_version == 2:
        md.pop("schema")
        md["schemas"] = [ICE_SCHEMA_V1]
        md["current-schema-id"] = 0
        md["last-sequence-number"] = len(snapshots)
    os.makedirs(os.path.join(table, "metadata"), exist_ok=True)
    with open(
        os.path.join(table, "metadata", f"v{version}.metadata.json"), "w"
    ) as fh:
        json.dump(md, fh)
    with open(os.path.join(table, "metadata", "version-hint.text"), "w") as fh:
        fh.write(str(version))


@pytest.fixture
def ice_table(spark, tmp_path):
    """Two snapshots: snap 1 = {f0}, snap 2 = {f0 existing, f1 added}."""
    t = str(tmp_path / "ice")
    os.makedirs(os.path.join(t, "metadata"))
    f0 = _data_file(spark, t, "f0.parquet", [(1, "a"), (2, "b")])
    f1 = _data_file(spark, t, "f1.parquet", [(3, "c")])
    m1 = _manifest(t, "m1.avro", [(1, f0)])
    ml1 = _manifest_list(t, "snap-1.avro", [m1])
    m2 = _manifest(t, "m2.avro", [(0, f0), (1, f1)])
    ml2 = _manifest_list(t, "snap-2.avro", [m2])
    snaps = [
        {"snapshot-id": 1, "timestamp-ms": 0, "manifest-list": f"file://{ml1}"},
        {"snapshot-id": 2, "timestamp-ms": 1, "manifest-list": f"file://{ml2}"},
    ]
    _metadata(t, 3, snaps, current=2)
    return t


def _rows(df):
    return {(r["id"], r["v"]) for r in df.collect()}


def test_read_current_snapshot(spark, ice_table):
    r = IcebergTableReader(spark, ice_table)
    df = r.read()
    assert df.schema["id"].dataType == T.LongType()
    # required per Iceberg schema — in the converted schema; Spark's file
    # scan itself always relaxes nullability
    assert not r.schema()["id"].nullable
    assert _rows(df) == {(1, "a"), (2, "b"), (3, "c")}


def test_time_travel_by_snapshot_id(spark, ice_table):
    r = IcebergTableReader(spark, ice_table)
    assert _rows(r.read(snapshot_id=1)) == {(1, "a"), (2, "b")}
    with pytest.raises(IcebergProtocolError, match="not found"):
        r.read(snapshot_id=42)


def test_deleted_entries_excluded(spark, tmp_path):
    """status=2 (DELETED) manifest entries drop out of the scan."""
    t = str(tmp_path / "icedel")
    os.makedirs(os.path.join(t, "metadata"))
    f0 = _data_file(spark, t, "f0.parquet", [(1, "a")])
    f1 = _data_file(spark, t, "f1.parquet", [(2, "b")])
    m = _manifest(t, "m.avro", [(2, f0), (1, f1)])
    ml = _manifest_list(t, "snap.avro", [m])
    _metadata(
        t, 1,
        [{"snapshot-id": 7, "timestamp-ms": 0, "manifest-list": f"file://{ml}"}],
        current=7,
    )
    assert _rows(IcebergTableReader(spark, t).read()) == {(2, "b")}


def test_v2_metadata_and_empty_table(spark, tmp_path):
    t = str(tmp_path / "icev2")
    _metadata(t, 1, [], current=None, fmt_version=2)
    r = IcebergTableReader(spark, t)
    df = r.read()
    assert df.count() == 0
    assert set(df.columns) == {"id", "v"}


def test_unsupported_versions_and_types_refused(spark, tmp_path):
    t = str(tmp_path / "icebad")
    # v3 is now supported (DV-only; see test_iceberg_v3_dv.py) — the
    # loud refusal starts at v4
    _metadata(t, 1, [], current=None, fmt_version=4)
    with pytest.raises(IcebergProtocolError, match="format-version"):
        IcebergTableReader(spark, t)
    # r12: variant READS now (tests/test_iceberg_v3_types.py) and geo
    # types read as WKB binary (tests/test_iceberg_geo.py); only
    # made-up types still refuse
    assert isinstance(iceberg_type_to_spark("geometry"), T.BinaryType)
    with pytest.raises(IcebergProtocolError, match="unsupported Iceberg type"):
        iceberg_type_to_spark("no-such-type")


def test_type_mapping_covers_spec_table():
    assert iceberg_type_to_spark("decimal(10, 2)") == T.DecimalType(10, 2)
    assert iceberg_type_to_spark("fixed[16]") == T.BinaryType()
    assert iceberg_type_to_spark("timestamptz") == T.TimestampType()
    assert iceberg_type_to_spark("timestamp") == T.TimestampNTZType()
    lst = iceberg_type_to_spark(
        {"type": "list", "element-id": 3, "element": "int", "element-required": True}
    )
    assert lst == T.ArrayType(T.IntegerType(), containsNull=False)
    mp = iceberg_type_to_spark(
        {"type": "map", "key-id": 4, "key": "string", "value-id": 5,
         "value": "double", "value-required": False}
    )
    assert mp == T.MapType(T.StringType(), T.DoubleType(), valueContainsNull=True)


# ----------------------------------------- round-5: v2 position deletes

MANIFEST_ENTRY_V2_SCHEMA = {
    "type": "record",
    "name": "manifest_entry_v2",
    "fields": [
        {"name": "status", "type": "int"},
        {"name": "snapshot_id", "type": ["null", "long"], "default": None},
        {"name": "sequence_number", "type": ["null", "long"], "default": None},
        {
            "name": "data_file",
            "type": {
                "type": "record",
                "name": "data_file_v2",
                "fields": [
                    {"name": "content", "type": "int"},
                    {"name": "file_path", "type": "string"},
                    {"name": "file_format", "type": "string"},
                    {"name": "record_count", "type": "long"},
                    {"name": "file_size_in_bytes", "type": "long"},
                    {
                        "name": "equality_ids",
                        "type": ["null", {"type": "array", "items": "int"}],
                        "default": None,
                    },
                ],
            },
        },
    ],
}


def _manifest_v2(table, name, entries):
    """entries: (status, path, content[, seq[, equality_ids]]) — content
    0=data, 1=pos-del, 2=eq-del; seq = data sequence number (None →
    inherit)."""
    p = os.path.join(table, "metadata", name)
    recs = []
    for entry in entries:
        status, path, content = entry[0], entry[1], entry[2]
        seq = entry[3] if len(entry) > 3 else None
        eq_ids = entry[4] if len(entry) > 4 else None
        recs.append(
            {
                "status": status,
                "snapshot_id": None,
                "sequence_number": seq,
                "data_file": {
                    "content": content,
                    "file_path": f"file://{path}",
                    "file_format": "PARQUET",
                    "record_count": 1,
                    "file_size_in_bytes": os.path.getsize(path),
                    "equality_ids": list(eq_ids) if eq_ids else None,
                },
            }
        )
    ocf_write(p, MANIFEST_ENTRY_V2_SCHEMA, recs)
    return p


def test_v2_position_deletes_applied(spark, tmp_path):
    """A position-delete snapshot (the output of a real engine's MERGE/
    DELETE) reads correctly: deleted (file, pos) rows are absent."""
    t = str(tmp_path / "icepd")
    os.makedirs(os.path.join(t, "metadata"))
    f0 = _data_file(spark, t, "f0.parquet", [(1, "a"), (2, "b"), (3, "c")])
    f1 = _data_file(spark, t, "f1.parquet", [(4, "d"), (5, "e")])
    # drop f0 row 1 -> (2,"b") and f1 row 0 -> (4,"d")
    pdel = _data_file(
        spark,
        t,
        "pd0.parquet",
        [(f"file://{f0}", 1), (f"file://{f1}", 0)],
        schema="file_path string, pos long",
    )
    m_data = _manifest_v2(t, "md.avro", [(1, f0, 0), (1, f1, 0)])
    m_del = _manifest_v2(t, "mdel.avro", [(1, pdel, 1)])
    ml = _manifest_list(t, "snap.avro", [m_data, m_del])
    _metadata(
        t, 1,
        [{"snapshot-id": 9, "timestamp-ms": 0, "manifest-list": f"file://{ml}"}],
        current=9, fmt_version=2,
    )
    r = IcebergTableReader(spark, t)
    assert _rows(r.read()) == {(1, "a"), (3, "c"), (5, "e")}
    # data_files() still lists only live DATA files
    assert len(r.data_files()) == 2


# ------------------------------------------ round-5: v2 equality deletes


def test_v2_equality_deletes_applied_with_sequence_gate(spark, tmp_path):
    """The Flink/CDC upsert shape: an equality delete at sequence 2
    removes matching rows from sequence-1 data files, but a row
    re-inserted at sequence 3 with the same key survives (strictly-
    smaller-sequence rule)."""
    t = str(tmp_path / "iceeq")
    os.makedirs(os.path.join(t, "metadata"))
    f0 = _data_file(spark, t, "f0.parquet", [(1, "a"), (2, "b"), (3, "c")])
    ed = _data_file(spark, t, "ed.parquet", [(2,)], schema="id long")
    f1 = _data_file(spark, t, "f1.parquet", [(2, "b2")])
    m = _manifest_v2(
        t,
        "m.avro",
        [
            (1, f0, 0, 1),
            (1, ed, 2, 2, [1]),  # equality_ids -> field id 1 = "id"
            (1, f1, 0, 3),
        ],
    )
    ml = _manifest_list(t, "snap.avro", [m])
    _metadata(
        t, 1,
        [{"snapshot-id": 3, "timestamp-ms": 0, "manifest-list": f"file://{ml}"}],
        current=3, fmt_version=2,
    )
    assert _rows(IcebergTableReader(spark, t).read()) == {
        (1, "a"), (3, "c"), (2, "b2"),
    }


def test_v2_equality_delete_multi_column_null_safe(spark, tmp_path):
    """equality_ids over (id, v): null delete values match null data
    values (the spec's null-safe equality), non-matching combos stay."""
    t = str(tmp_path / "iceeqn")
    os.makedirs(os.path.join(t, "metadata"))
    f0 = _data_file(
        spark, t, "f0.parquet", [(1, "a"), (2, None), (2, "b")]
    )
    ed = _data_file(
        spark, t, "ed.parquet", [(2, None)], schema="id long, v string"
    )
    m = _manifest_v2(
        t, "m.avro", [(1, f0, 0, 1), (1, ed, 2, 2, [1, 2])]
    )
    ml = _manifest_list(t, "snap.avro", [m])
    _metadata(
        t, 1,
        [{"snapshot-id": 4, "timestamp-ms": 0, "manifest-list": f"file://{ml}"}],
        current=4, fmt_version=2,
    )
    assert _rows(IcebergTableReader(spark, t).read()) == {(1, "a"), (2, "b")}


def test_v2_position_and_equality_deletes_combined(spark, tmp_path):
    t = str(tmp_path / "iceboth")
    os.makedirs(os.path.join(t, "metadata"))
    f0 = _data_file(spark, t, "f0.parquet", [(1, "a"), (2, "b"), (3, "c")])
    pdel = _data_file(
        spark, t, "pd.parquet", [(f"file://{f0}", 0)],
        schema="file_path string, pos long",
    )
    ed = _data_file(spark, t, "ed.parquet", [(3,)], schema="id long")
    m = _manifest_v2(
        t, "m.avro",
        [(1, f0, 0, 1), (1, pdel, 1, 2), (1, ed, 2, 2, [1])],
    )
    ml = _manifest_list(t, "snap.avro", [m])
    _metadata(
        t, 1,
        [{"snapshot-id": 5, "timestamp-ms": 0, "manifest-list": f"file://{ml}"}],
        current=5, fmt_version=2,
    )
    assert _rows(IcebergTableReader(spark, t).read()) == {(2, "b")}


def test_equality_delete_unknown_field_id_refused(spark, tmp_path):
    t = str(tmp_path / "iceeqbad")
    os.makedirs(os.path.join(t, "metadata"))
    f0 = _data_file(spark, t, "f0.parquet", [(1, "a")])
    ed = _data_file(spark, t, "ed.parquet", [(1,)], schema="id long")
    m = _manifest_v2(
        t, "m.avro", [(1, f0, 0, 1), (1, ed, 2, 2, [99])]
    )
    ml = _manifest_list(t, "snap.avro", [m])
    _metadata(
        t, 1,
        [{"snapshot-id": 6, "timestamp-ms": 0, "manifest-list": f"file://{ml}"}],
        current=6, fmt_version=2,
    )
    with pytest.raises(IcebergProtocolError, match="unknown field id"):
        IcebergTableReader(spark, t).read().collect()


def test_unknown_delete_content_refused(spark, tmp_path):
    t = str(tmp_path / "icec3")
    os.makedirs(os.path.join(t, "metadata"))
    f0 = _data_file(spark, t, "f0.parquet", [(1, "a")])
    ed = _data_file(spark, t, "ed.parquet", [(1,)], schema="id long")
    m = _manifest_v2(t, "m.avro", [(1, f0, 0), (1, ed, 3)])
    ml = _manifest_list(t, "snap.avro", [m])
    _metadata(
        t, 1,
        [{"snapshot-id": 3, "timestamp-ms": 0, "manifest-list": f"file://{ml}"}],
        current=3, fmt_version=2,
    )
    with pytest.raises(IcebergProtocolError, match="content=3"):
        IcebergTableReader(spark, t).read()


# --------------------------------------------- round-5: write interop


def test_writer_append_roundtrip_and_time_travel(spark, tmp_path):
    from deimos_spark.operators.iceberg_interop import IcebergTableWriter

    t = str(tmp_path / "icew")
    w = IcebergTableWriter(spark, t)
    w.append(spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string"))
    w.append(spark.createDataFrame([(3, "c")], "id long, v string"))

    r = IcebergTableReader(spark, t)
    assert _rows(r.read()) == {(1, "a"), (2, "b"), (3, "c")}
    # snapshot 1 = first append only (time travel)
    assert _rows(r.read(snapshot_id=1)) == {(1, "a"), (2, "b")}
    # schema converted through the Iceberg type table
    assert r.schema()["id"].dataType == T.LongType()
    md = r.metadata
    assert md["format-version"] == 2
    assert md["last-sequence-number"] == 2
    assert len(md["snapshots"]) == 2


def test_writer_overwrite_drops_previous_files_from_snapshot(spark, tmp_path):
    from deimos_spark.operators.iceberg_interop import IcebergTableWriter

    t = str(tmp_path / "icew2")
    w = IcebergTableWriter(spark, t)
    w.append(spark.createDataFrame([(1, "a")], "id long, v string"))
    w.overwrite(spark.createDataFrame([(9, "z")], "id long, v string"))

    r = IcebergTableReader(spark, t)
    assert _rows(r.read()) == {(9, "z")}
    # previous snapshot still readable (files retained for time travel)
    assert _rows(r.read(snapshot_id=1)) == {(1, "a")}


def test_writer_commit_conflict_on_same_version(spark, tmp_path):
    """Two writers deriving from the same current state: the loser's
    put-if-absent metadata claim raises instead of clobbering."""
    import json as _json

    from deimos_spark.operators.iceberg_interop import (
        IcebergCommitConflict,
        IcebergTableWriter,
    )

    t = str(tmp_path / "icew3")
    w = IcebergTableWriter(spark, t)
    w.append(spark.createDataFrame([(1, "a")], "id long, v string"))
    # both writers derived from v1; the rival claims v2 first — the
    # second put-if-absent on the SAME version must refuse, not clobber
    with open(os.path.join(t, "metadata", "v1.metadata.json")) as fh:
        md = _json.load(fh)
    w._commit(2, md)  # rival's claim
    with pytest.raises(IcebergCommitConflict):
        w._commit(2, md)  # loser's claim of the same version


def test_writer_refuses_unwritable_types(spark, tmp_path):
    from deimos_spark.operators.iceberg_interop import (
        IcebergTableWriter,
        spark_schema_to_iceberg,
    )

    with pytest.raises(IcebergProtocolError, match="not writable"):
        spark_schema_to_iceberg(
            spark.createDataFrame(
                [([1, 2],)], "xs array<int>"
            ).schema
        )
    # decimal maps through
    fields = spark_schema_to_iceberg(
        spark.createDataFrame([(1,)], "id long").selectExpr(
            "CAST(id AS DECIMAL(10,2)) AS d"
        ).schema
    )
    assert fields[0]["type"] == "decimal(10, 2)"


def test_writer_output_readable_after_third_party_style_append(spark, tmp_path):
    """A manifest carried forward from an earlier snapshot (with nulled
    optional fields, as older fixtures have) survives the append path."""
    from deimos_spark.operators.iceberg_interop import IcebergTableWriter

    t = str(tmp_path / "icew4")
    w = IcebergTableWriter(spark, t)
    w.append(spark.createDataFrame([(1, "a")], "id long, v string"))
    w.append(spark.createDataFrame([(2, "b")], "id long, v string"))
    w.append(spark.createDataFrame([(3, "c")], "id long, v string"))
    r = IcebergTableReader(spark, t)
    assert _rows(r.read()) == {(1, "a"), (2, "b"), (3, "c")}
    assert _rows(r.read(snapshot_id=2)) == {(1, "a"), (2, "b")}


# ------------------------------------- round-5: partitioned writer


def test_writer_partitioned_roundtrip(spark, tmp_path):
    """Identity-partitioned write: files keep the source columns (the
    spec's rule — unlike Delta/Hive), manifests carry the partition
    record, metadata carries the partition spec; reads round-trip."""
    from deimos_spark.operators.iceberg_interop import IcebergTableWriter
    from deimos_spark.schemas.avro_ocf import ocf_read

    t = str(tmp_path / "icewp")
    w = IcebergTableWriter(spark, t, partition_by=("p",))
    w.append(
        spark.createDataFrame(
            [(1, "a", "x"), (2, "b", "x"), (3, "c", "y")],
            "id long, v string, p string",
        )
    )
    r = IcebergTableReader(spark, t)
    assert {(x.id, x.v, x.p) for x in r.read().collect()} == {
        (1, "a", "x"), (2, "b", "x"), (3, "c", "y"),
    }
    # partition spec present with identity transform over p's field id
    spec = r.metadata["partition-specs"][0]
    assert spec["fields"] == [
        {"name": "p", "transform": "identity", "source-id": 3,
         "field-id": 1000}
    ]
    # manifest entries carry typed partition tuples
    snap = r.snapshot()
    _, manifests = ocf_read(snap["manifest-list"][len("file://"):])
    _, entries = ocf_read(manifests[0]["manifest_path"][len("file://"):])
    parts = {e["data_file"]["partition"]["p"] for e in entries}
    assert parts == {"x", "y"}
    # files live under hive-style dirs
    assert any("p=x" in p for p in r.data_files())


def test_writer_partitioned_append_long_and_null(spark, tmp_path):
    from deimos_spark.operators.iceberg_interop import IcebergTableWriter

    t = str(tmp_path / "icewp2")
    w = IcebergTableWriter(spark, t, partition_by=("k",))
    w.append(
        spark.createDataFrame([(1, 10), (2, None)], "id long, k long")
    )
    w.append(spark.createDataFrame([(3, 10)], "id long, k long"))
    r = IcebergTableReader(spark, t)
    assert {(x.id, x.k) for x in r.read().collect()} == {
        (1, 10), (2, None), (3, 10),
    }


def test_writer_partitioned_refuses_bad_partition_types(spark, tmp_path):
    from deimos_spark.operators.iceberg_interop import IcebergTableWriter

    t = str(tmp_path / "icewp3")
    w = IcebergTableWriter(spark, t, partition_by=("d",))
    with pytest.raises(IcebergProtocolError, match="identity over"):
        w.append(spark.createDataFrame([(1, 1.5)], "id long, d double"))


def test_partition_filter_prunes_by_manifest(spark, tmp_path):
    """read(partition_filter=...) plans from the manifest partition
    records — the pruned partition's files are never in the scan."""
    from deimos_spark.operators.iceberg_interop import IcebergTableWriter

    t = str(tmp_path / "icewprune")
    w = IcebergTableWriter(spark, t, partition_by=("p",))
    w.append(
        spark.createDataFrame(
            [(1, "a", "x"), (2, "b", "y"), (3, "c", "y")],
            "id long, v string, p string",
        )
    )
    r = IcebergTableReader(spark, t)
    assert len(r.data_files(partition_filter={"p": "y"})) < len(r.data_files())
    got = {x.id for x in r.read(partition_filter={"p": "y"}).collect()}
    assert got == {2, 3}
    got2 = {x.id for x in r.read(partition_filter={"p": ["x", "y"]}).collect()}
    assert got2 == {1, 2, 3}
    assert r.read(partition_filter={"p": "zzz"}).count() == 0


# --------------------------- round-6: non-identity partition transforms


def test_murmur3_spec_vectors():
    """Appendix B's published 32-bit hash requirement vectors — these
    pin our bucket numbers to every conforming engine's."""
    import datetime as dt
    import struct

    from deimos_spark.operators.iceberg_transforms import (
        bucket_value,
        murmur3_32,
    )

    assert murmur3_32(struct.pack("<q", 34)) == 2017239379  # int AND long
    assert murmur3_32("iceberg".encode()) == 1210000089
    days = (dt.date(2017, 11, 16) - dt.date(1970, 1, 1)).days
    assert murmur3_32(struct.pack("<q", days)) == -653330422
    micros = (
        dt.datetime(2017, 11, 16, 22, 31, 8) - dt.datetime(1970, 1, 1)
    ) // dt.timedelta(microseconds=1)
    assert murmur3_32(struct.pack("<q", micros)) == -2047944441
    # bucket folds the signed hash through & Integer.MAX_VALUE
    assert bucket_value(34, 16) == (2017239379 & 0x7FFFFFFF) % 16
    assert bucket_value(None, 16) is None


def test_bucket_udf_matches_spec_hash_property(spark):
    """The numpy-vectorized bucket assignment (write path) must agree
    with the pure-Python spec hash (prune path) on every value —
    including negatives, extremes, and nulls — else written layouts and
    filter pruning would silently disagree."""
    from hypothesis import strategies as st

    from deimos_spark.operators.iceberg_transforms import (
        PartitionField,
        bucket_value,
        transform_column,
    )

    vals = (
        st.lists(
            st.integers(-(2**63), 2**63 - 1) | st.none(),
            min_size=1, max_size=50,
        )
        .example()
    )
    # one Spark round-trip over a hypothesis-drawn batch plus pinned
    # adversarial values (driver loop per-example would be too slow).
    # 2^63-1 alongside None is the regression this test caught: a long
    # column WITH nulls crosses Arrow as float64 and silently rounds
    # past 2^53 — transform_column masks nulls JVM-side to prevent it.
    pinned = [0, -1, 1, 34, 2**63 - 1, -(2**63), None, 0x7FFFFFFF,
              -0x80000000, 12345678901234]
    rows = [(i, v) for i, v in enumerate(pinned + vals)]
    df = spark.createDataFrame(rows, "i long, v long")
    pf = PartitionField("v_bucket", "bucket", "v", 16)
    out = df.select("i", "v", transform_column(pf, "bigint").alias("b"))
    for r in out.collect():
        want = bucket_value(r.v, 16)
        assert r.b == want, (r.v, r.b, want)

    # string path too
    strs = ["", "iceberg", "ü" * 5, "x" * 100, None, "\x00abc"]
    df2 = spark.createDataFrame(
        [(i, s) for i, s in enumerate(strs)], "i long, v string"
    )
    pf2 = PartitionField("v_bucket", "bucket", "v", 8)
    out2 = df2.select("i", "v", transform_column(pf2, "string").alias("b"))
    for r in out2.collect():
        assert r.b == bucket_value(r.v, 8), r.v


def test_writer_bucket_partitioned_roundtrip_and_pruning(spark, tmp_path):
    """bucket[4] over id: metadata carries the transform, manifests
    carry bucket numbers, pruning by SOURCE value buckets the filter
    value driver-side, and the pandas-UDF bucket assignment agrees with
    the spec hash for every row."""
    from deimos_spark.operators.iceberg_interop import IcebergTableWriter
    from deimos_spark.operators.iceberg_transforms import bucket_value

    t = str(tmp_path / "icebkt")
    w = IcebergTableWriter(spark, t, partition_by=("bucket(4, id)",))
    rows = [(i, f"v{i}") for i in range(50)]
    w.append(spark.createDataFrame(rows, "id long, v string"))
    r = IcebergTableReader(spark, t)
    spec = r.metadata["partition-specs"][0]["fields"]
    assert spec == [
        {"name": "id_bucket", "transform": "bucket[4]", "source-id": 1,
         "field-id": 1000}
    ]
    # full round-trip (source column kept in the files)
    assert {(x.id, x.v) for x in r.read().collect()} == set(rows)
    # dirs named by bucket number; every row in the file matches its
    # dir's bucket per the spec hash
    for p in r.data_files():
        b = int(re.search(r"id_bucket=(\d+)", p).group(1))
        for x in spark.read.parquet(p).collect():
            assert bucket_value(x.id, 4) == b
    # manifest-level pruning by source value
    want = 17
    pruned = r.data_files(partition_filter={"id": want})
    assert pruned and len(pruned) < len(r.data_files())
    assert all(
        f"id_bucket={bucket_value(want, 4)}" in p for p in pruned
    )
    got = {x.id for x in r.read(partition_filter={"id": want}).collect()}
    assert want in got and got < {i for i, _ in rows}
    # pruning by the partition FIELD name takes raw bucket numbers
    got2 = {
        x.id for x in r.read(partition_filter={"id_bucket": 0}).collect()
    }
    assert got2 == {i for i in range(50) if bucket_value(i, 4) == 0}


def test_writer_truncate_and_days_partitions(spark, tmp_path):
    """truncate[10] over a long + days over a date, together: both
    transforms land in the spec, partition tuples hold transformed
    values, and source-value pruning works for each."""
    import datetime as dt

    from deimos_spark.operators.iceberg_interop import IcebergTableWriter
    from deimos_spark.schemas.avro_ocf import ocf_read

    t = str(tmp_path / "icetr")
    w = IcebergTableWriter(
        spark, t, partition_by=("truncate(10, amt)", "days(d)")
    )
    rows = [
        (1, 7, dt.date(2024, 3, 5)),
        (2, 13, dt.date(2024, 3, 5)),
        (3, -3, dt.date(2024, 3, 6)),
    ]
    w.append(spark.createDataFrame(rows, "id long, amt long, d date"))
    r = IcebergTableReader(spark, t)
    transforms = {
        f["name"]: f["transform"]
        for f in r.metadata["partition-specs"][0]["fields"]
    }
    assert transforms == {"amt_trunc": "truncate[10]", "d_day": "day"}
    assert {(x.id, x.amt, x.d) for x in r.read().collect()} == set(rows)
    snap = r.snapshot()
    _, manifests = ocf_read(snap["manifest-list"][len("file://"):])
    _, entries = ocf_read(manifests[0]["manifest_path"][len("file://"):])
    parts = {
        (e["data_file"]["partition"]["amt_trunc"],
         e["data_file"]["partition"]["d_day"])
        for e in entries
    }
    d0 = (dt.date(2024, 3, 5) - dt.date(1970, 1, 1)).days
    assert parts == {(0, d0), (10, d0), (-10, d0 + 1)}  # floor, negatives too
    # prune by source values: amt=13 → trunc 10; d as a date or a string
    assert {
        x.id for x in r.read(partition_filter={"amt": 13}).collect()
    } == {2}
    assert {
        x.id
        for x in r.read(
            partition_filter={"d": dt.date(2024, 3, 6)}
        ).collect()
    } == {3}
    assert {
        x.id for x in r.read(partition_filter={"d": "2024-03-05"}).collect()
    } == {1, 2}


def test_writer_hours_and_months_partitions(spark, tmp_path):
    import datetime as dt

    from deimos_spark.operators.iceberg_interop import IcebergTableWriter

    t = str(tmp_path / "icehr")
    w = IcebergTableWriter(spark, t, partition_by=("hours(ts)",))
    ts1 = dt.datetime(2024, 3, 5, 10, 15)
    ts2 = dt.datetime(2024, 3, 5, 11, 45)
    w.append(
        spark.createDataFrame(
            [(1, ts1), (2, ts2)], "id long, ts timestamp_ntz"
        )
    )
    r = IcebergTableReader(spark, t)
    assert r.metadata["partition-specs"][0]["fields"][0]["transform"] == "hour"
    assert {x.id for x in r.read().collect()} == {1, 2}
    assert {
        x.id for x in r.read(partition_filter={"ts": ts1}).collect()
    } == {1}

    t2 = str(tmp_path / "icemo")
    w2 = IcebergTableWriter(spark, t2, partition_by=("months(d)",))
    w2.append(
        spark.createDataFrame(
            [(1, dt.date(2024, 3, 5)), (2, dt.date(2024, 4, 1))],
            "id long, d date",
        )
    )
    r2 = IcebergTableReader(spark, t2)
    assert {
        x.id
        for x in r2.read(partition_filter={"d": dt.date(2024, 3, 31)}).collect()
    } == {1}


def test_transform_partition_refuses_bad_sources(spark, tmp_path):
    from deimos_spark.operators.iceberg_interop import IcebergTableWriter

    t = str(tmp_path / "icebad")
    w = IcebergTableWriter(spark, t, partition_by=("hours(d)",))
    with pytest.raises(IcebergProtocolError, match="hour over"):
        w.append(
            spark.createDataFrame([(1, "2024-01-01")], "id long, d string")
        )
    w2 = IcebergTableWriter(spark, t + "2", partition_by=("truncate(3, f)",))
    with pytest.raises(IcebergProtocolError, match="truncate"):
        w2.append(spark.createDataFrame([(1, 1.5)], "id long, f double"))


def test_partition_spec_evolution_prunes_per_entry_spec(spark, tmp_path):
    """An evolved table carries several partition specs; each manifest's
    entries must prune against the spec recorded in the manifest list
    (partition_spec_id), not the table default. Here spec 0 = identity
    over v, spec 1 = bucket[4] over id (the default); a filter on id
    buckets against spec-1 entries and refuses on spec-0 entries (their
    spec cannot resolve `id` — loud, never silently wrong)."""
    from deimos_spark.operators.iceberg_transforms import bucket_value

    t = str(tmp_path / "ice_evo")
    os.makedirs(os.path.join(t, "metadata"))
    fa = _data_file(spark, t, "fa.parquet", [(1, "x"), (2, "x")])
    fb = _data_file(spark, t, "fb.parquet", [(7, "y")])
    entry_schema = json.loads(json.dumps(MANIFEST_ENTRY_SCHEMA))
    # spec-0 manifest: partition record {v}; spec-1 manifest: {id_bucket}
    for mname, path, pfield, pval in (
        ("m-old.avro", fa, "v", "x"),
        ("m-new.avro", fb, "id_bucket", bucket_value(7, 4)),
    ):
        es = json.loads(json.dumps(entry_schema))
        es["fields"][-1]["type"]["fields"].insert(
            1,
            {
                "name": "partition",
                "type": {
                    "type": "record",
                    "name": f"r_{pfield}",
                    "fields": [
                        {
                            "name": pfield,
                            "type": ["null", "int" if pfield == "id_bucket" else "string"],
                            "default": None,
                        }
                    ],
                },
            },
        )
        ocf_write(
            os.path.join(t, "metadata", mname), es,
            [{
                "status": 1, "snapshot_id": None,
                "data_file": {
                    "file_path": f"file://{path}",
                    "partition": {pfield: pval},
                    "file_format": "PARQUET",
                    "record_count": 1,
                    "file_size_in_bytes": os.path.getsize(path),
                },
            }],
        )
    mlp = os.path.join(t, "metadata", "snap-1.avro")
    ocf_write(
        mlp, MANIFEST_FILE_SCHEMA,
        [
            {"manifest_path": f"file://{os.path.join(t, 'metadata', 'm-old.avro')}",
             "manifest_length": 1, "partition_spec_id": 0,
             "added_snapshot_id": None},
            {"manifest_path": f"file://{os.path.join(t, 'metadata', 'm-new.avro')}",
             "manifest_length": 1, "partition_spec_id": 1,
             "added_snapshot_id": None},
        ],
    )
    md = {
        "format-version": 2,
        "table-uuid": "00000000-0000-0000-0000-000000000000",
        "location": f"file://{t}",
        "last-updated-ms": 0,
        "last-column-id": 2,
        "schemas": [ICE_SCHEMA_V1],
        "current-schema-id": 0,
        "last-sequence-number": 1,
        "partition-specs": [
            {"spec-id": 0, "fields": [
                {"name": "v", "transform": "identity", "source-id": 2,
                 "field-id": 1000}]},
            {"spec-id": 1, "fields": [
                {"name": "id_bucket", "transform": "bucket[4]",
                 "source-id": 1, "field-id": 1001}]},
        ],
        "default-spec-id": 1,
        "snapshots": [
            {"snapshot-id": 1, "timestamp-ms": 0,
             "manifest-list": f"file://{mlp}"}
        ],
        "current-snapshot-id": 1,
    }
    with open(os.path.join(t, "metadata", "v1.metadata.json"), "w") as fh:
        json.dump(md, fh)
    with open(os.path.join(t, "metadata", "version-hint.text"), "w") as fh:
        fh.write("1")

    r = IcebergTableReader(spark, t)
    # unfiltered read sees both generations
    assert _rows(r.read()) == {(1, "x"), (2, "x"), (7, "y")}
    # filter on v: resolvable by spec 0 (identity) — but spec-1 entries
    # can't resolve it → loud refusal, not silent pruning
    with pytest.raises(IcebergProtocolError, match="cannot be pruned"):
        r.data_files(partition_filter={"v": "x"})
    # filter on id: spec-1 buckets it; spec-0 entries refuse
    with pytest.raises(IcebergProtocolError, match="cannot be pruned"):
        r.data_files(partition_filter={"id": 7})
    # unknown spec id in a manifest refuses loudly
    with pytest.raises(IcebergProtocolError, match="absent from table"):
        r._partition_fields(99)


def test_transform_roundtrip_through_own_writer_reader(spark, tmp_path):
    """VERDICT done-criterion: a transform-partitioned table written by
    our writer round-trips through our reader across APPENDS, with
    pruning asserted at manifest level on the multi-snapshot table."""
    from deimos_spark.operators.iceberg_interop import IcebergTableWriter
    from deimos_spark.operators.iceberg_transforms import bucket_value

    t = str(tmp_path / "icemulti")
    w = IcebergTableWriter(spark, t, partition_by=("bucket(4, k)",))
    w.append(spark.createDataFrame([(i, i) for i in range(20)], "id long, k long"))
    w.append(
        spark.createDataFrame([(i, i) for i in range(20, 40)], "id long, k long")
    )
    r = IcebergTableReader(spark, t)
    assert {x.id for x in r.read().collect()} == set(range(40))
    pruned = r.data_files(partition_filter={"k": 33})
    b = bucket_value(33, 4)
    assert pruned and all(f"k_bucket={b}" in p for p in pruned)
    assert 33 in {
        x.id for x in r.read(partition_filter={"k": 33}).collect()
    }


# --------------------------------- round-5: keyed MERGE via position deletes


def test_iceberg_keyed_merge_soft_deletes_and_optimize(spark, tmp_path):
    """The Iceberg twin of the Delta DV merge: deletes land as
    position-delete files (no survivor rewrite), upserts append;
    OPTIMIZE compacts the history away."""
    from deimos_spark.operators.iceberg_interop import IcebergKeyedTable

    t = str(tmp_path / "icekt")
    kt = IcebergKeyedTable(spark, t, ["id"])
    kt.upsert(
        spark.createDataFrame(
            [(i, f"v{i}") for i in range(10)], "id long, v string"
        )
    )
    files_before = set(IcebergTableReader(spark, t).data_files())

    kt.delete(spark.createDataFrame([(3,), (7,)], "id long"))
    r = IcebergTableReader(spark, t)
    # no data file was rewritten — the delete is metadata + a delete file
    assert set(r.data_files()) == files_before
    _, pos_dels, _, _ = r._file_sets(None)
    assert pos_dels
    assert sorted(x.id for x in r.read().collect()) == [0, 1, 2, 4, 5, 6, 8, 9]

    kt.upsert(
        spark.createDataFrame([(5, "V5"), (42, "new")], "id long, v string")
    )
    r = IcebergTableReader(spark, t)
    got = {(x.id, x.v) for x in r.read().collect()}
    assert (5, "V5") in got and (42, "new") in got and (5, "v5") not in got
    assert sorted(i for i, _ in got) == [0, 1, 2, 4, 5, 6, 8, 9, 42]

    kt.optimize()
    r = IcebergTableReader(spark, t)
    _, pos_dels2, _, _ = r._file_sets(None)
    assert pos_dels2 == []  # compaction: fresh file set, no delete files
    got2 = {(x.id, x.v) for x in r.read().collect()}
    assert got2 == got


def test_iceberg_keyed_merge_delete_only_and_empty(spark, tmp_path):
    from deimos_spark.operators.iceberg_interop import IcebergKeyedTable

    t = str(tmp_path / "icekt2")
    kt = IcebergKeyedTable(spark, t, ["id"])
    # delete against an empty table is a no-op
    kt.delete(spark.createDataFrame([(1,)], "id long"))
    kt.upsert(spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string"))
    kt.delete(spark.createDataFrame([(1,)], "id long"))
    r = IcebergTableReader(spark, t)
    assert {(x.id, x.v) for x in r.read().collect()} == {(2, "b")}
    # deleting a key with no match commits nothing new
    v_before = r.metadata["last-sequence-number"]
    kt.delete(spark.createDataFrame([(999,)], "id long"))
    r2 = IcebergTableReader(spark, t)
    assert r2.metadata["last-sequence-number"] == v_before


def test_ocf_corrupt_bytes_contained(tmp_path):
    """Byte-flip fuzz: corrupt containers surface as OcfError, never a
    raw Unicode/struct/zlib error — manifest walks over untrusted
    tables depend on this typed-failure contract."""
    import random

    schema = {
        "type": "record",
        "name": "R",
        "fields": [
            {"name": "a", "type": "long"},
            {"name": "b", "type": "string"},
        ],
    }
    for codec in ("null", "deflate"):
        p = str(tmp_path / f"f_{codec}.avro")
        ocf_write(
            p, schema, [{"a": i, "b": "x" * 10} for i in range(300)],
            codec=codec,
        )
        blob = bytearray(open(p, "rb").read())
        rng = random.Random(7)
        for _ in range(200):
            b2 = bytearray(blob)
            for _ in range(rng.randint(1, 6)):
                b2[rng.randrange(4, len(b2))] = rng.randrange(256)
            open(p + ".c", "wb").write(bytes(b2))
            try:
                ocf_read(p + ".c")
            except OcfError:
                pass  # the contract


def test_iceberg_keyed_merge_equality_mode(spark, tmp_path):
    """delete_mode='equality' (the Flink CDC upsert shape): merges write
    ONLY the batch's keys as content=2 equality-delete files — no probe
    scan of the table at all — and same-commit upserts survive the
    strictly-smaller sequence rule while prior generations are erased."""
    from deimos_spark.operators.iceberg_interop import IcebergKeyedTable

    t = str(tmp_path / "iceeq")
    kt = IcebergKeyedTable(spark, t, ["id"], delete_mode="equality")
    kt.upsert(
        spark.createDataFrame(
            [(i, f"v{i}") for i in range(8)], "id long, v string"
        )
    )
    files_before = set(IcebergTableReader(spark, t).data_files())

    # upsert that REPLACES id 3 and adds id 42 — one commit, no scan
    kt.upsert(
        spark.createDataFrame([(3, "V3"), (42, "new")], "id long, v string")
    )
    r = IcebergTableReader(spark, t)
    # original data files untouched (no rewrite, no position probe)
    assert files_before <= set(r.data_files())
    _, pos_dels, eq_dels, _ = r._file_sets(None)
    assert pos_dels == [] and eq_dels
    got = {(x.id, x.v) for x in r.read().collect()}
    assert (3, "V3") in got and (42, "new") in got and (3, "v3") not in got
    assert len(got) == 9

    # pure delete
    kt.delete(spark.createDataFrame([(0,), (42,)], "id long"))
    got = {x.id for x in IcebergTableReader(spark, t).read().collect()}
    assert got == {1, 2, 3, 4, 5, 6, 7}

    # re-insert AFTER a delete: later sequence wins (CDC re-insert)
    kt.upsert(spark.createDataFrame([(0, "back")], "id long, v string"))
    got = {(x.id, x.v) for x in IcebergTableReader(spark, t).read().collect()}
    assert (0, "back") in got and len(got) == 8

    # optimize compacts the delete history away
    kt.optimize()
    r = IcebergTableReader(spark, t)
    _, pos2, eq2, _ = r._file_sets(None)
    assert eq2 == [] and pos2 == []
    assert {(x.id, x.v) for x in r.read().collect()} == got


def test_iceberg_keyed_table_rejects_bad_delete_mode(spark, tmp_path):
    from deimos_spark.operators.iceberg_interop import IcebergKeyedTable

    # "dv" became a real mode in round 9 (test_iceberg_v3_dv.py)
    with pytest.raises(ValueError, match="delete_mode"):
        IcebergKeyedTable(
            spark, str(tmp_path / "x"), ["id"], delete_mode="bogus"
        )


def test_iceberg_timestamp_time_travel(spark, ice_table):
    """read(as_of_ms=...) picks the latest snapshot with timestamp-ms
    <= the bound (snap 1 has ts 0, snap 2 has ts 1 in the fixture)."""
    r = IcebergTableReader(spark, ice_table)
    assert r.snapshot_id_at(0) == 1
    assert r.snapshot_id_at(10_000) == 2
    assert _rows(r.read(as_of_ms=0)) == {(1, "a"), (2, "b")}
    assert _rows(r.read(as_of_ms=99)) == {(1, "a"), (2, "b"), (3, "c")}
    with pytest.raises(IcebergProtocolError, match="no snapshot"):
        r.snapshot_id_at(-5)
    with pytest.raises(ValueError, match="at most one"):
        r.read(snapshot_id=1, as_of_ms=0)


def test_iceberg_keyed_merge_partitioned_equality(spark, tmp_path):
    """Partitioned keyed table, equality mode: upserts land under the
    partition layout (manifests carry partition tuples), the key-only
    delete files stay unpartitioned, and merges never rewrite data."""
    from deimos_spark.operators.iceberg_interop import IcebergKeyedTable

    t = str(tmp_path / "icepkt")
    kt = IcebergKeyedTable(
        spark, t, ["id"], delete_mode="equality", partition_by=("p",)
    )
    kt.upsert(
        spark.createDataFrame(
            [(i, f"v{i}", "x" if i % 2 else "y") for i in range(6)],
            "id long, v string, p string",
        )
    )
    r = IcebergTableReader(spark, t)
    assert any("p=x" in f for f in r.data_files())
    files_before = set(r.data_files())

    kt.upsert(
        spark.createDataFrame([(1, "V1", "x"), (9, "new", "y")],
                              "id long, v string, p string")
    )
    kt.delete(spark.createDataFrame([(0,)], "id long"))
    r = IcebergTableReader(spark, t)
    assert files_before <= set(r.data_files())  # nothing rewritten
    got = {(x.id, x.v, x.p) for x in r.read().collect()}
    assert (1, "V1", "x") in got and (9, "new", "y") in got
    assert (1, "v1", "x") not in got and not any(i == 0 for i, _, _ in got)
    assert len(got) == 6
    # partition pruning still works through the merge history
    px = {x.id for x in r.read(partition_filter={"p": "x"}).collect()}
    assert px == {1, 3, 5}


def test_iceberg_keyed_merge_partitioned_position(spark, tmp_path):
    """Position mode works on partitioned layouts too (Iceberg files
    keep source columns, so the probe scan sees them)."""
    from deimos_spark.operators.iceberg_interop import IcebergKeyedTable

    t = str(tmp_path / "icepkt2")
    kt = IcebergKeyedTable(spark, t, ["id"], partition_by=("p",))
    kt.upsert(
        spark.createDataFrame(
            [(1, "a", "x"), (2, "b", "y")], "id long, v string, p string"
        )
    )
    kt.delete(spark.createDataFrame([(1,)], "id long"))
    r = IcebergTableReader(spark, t)
    _, pos_dels, _, _ = r._file_sets(None)
    assert pos_dels
    assert {(x.id, x.p) for x in r.read().collect()} == {(2, "y")}


def test_expire_snapshots_reclaims_unreferenced(spark, tmp_path):
    """expire_snapshots(keep_last=1): old snapshots leave the metadata,
    their exclusive data/manifest files are reclaimed, the current
    snapshot stays fully readable, and YOUNG unreferenced files survive
    the default retention window (in-flight-writer protection, like
    Delta vacuum)."""
    from deimos_spark.operators.iceberg_interop import IcebergTableWriter

    t = str(tmp_path / "iceexp")
    w = IcebergTableWriter(spark, t)
    w.append(spark.createDataFrame([(1, "a")], "id long, v string"))
    w.overwrite(spark.createDataFrame([(2, "b")], "id long, v string"))
    w.append(spark.createDataFrame([(3, "c")], "id long, v string"))
    r = IcebergTableReader(spark, t)
    assert len(r.metadata["snapshots"]) == 3
    files_all = sum(
        1 for dp, _, fs in os.walk(t) for f in fs
        if f.endswith(".parquet") or f.endswith(".avro")
    )

    # default retention keeps everything (files are seconds old)
    assert w.expire_snapshots(keep_last=1) == []
    # metadata already rewrote to 1 snapshot though
    assert len(IcebergTableReader(spark, t).metadata["snapshots"]) == 1

    got = w.expire_snapshots(keep_last=1, retention_seconds=0.0)
    assert got  # v1's overwritten data file + old manifests reclaimed
    files_after = sum(
        1 for dp, _, fs in os.walk(t) for f in fs
        if f.endswith(".parquet") or f.endswith(".avro")
    )
    assert files_after < files_all
    r2 = IcebergTableReader(spark, t)
    assert {(x.id, x.v) for x in r2.read().collect()} == {(2, "b"), (3, "c")}
    # further appends keep working on the expired table
    w.append(spark.createDataFrame([(4, "d")], "id long, v string"))
    assert {x.id for x in IcebergTableReader(spark, t).read().collect()} == {
        2, 3, 4,
    }


def test_expire_retention_protects_inflight_files(spark, tmp_path):
    """VERDICT r6 #6 — crash-window twin of the Delta vacuum test: an
    in-flight writer places data/manifest files BEFORE committing, so
    default-retention expiry must keep young unreferenced files (deleting
    them would let the about-to-succeed commit land pointing at missing
    files); zero retention reclaims them once the writer is known dead."""
    import shutil as _sh

    from deimos_spark.operators.iceberg_interop import (
        IcebergTableReader,
        IcebergTableWriter,
    )

    t = str(tmp_path / "iceinflight")
    w = IcebergTableWriter(spark, t)
    w.append(spark.createDataFrame([(1, "a")], "id long, v string"))
    w.overwrite(spark.createDataFrame([(2, "b")], "id long, v string"))

    # simulate an in-flight append: a data parquet + a manifest avro
    # placed in the table, referenced by no commit yet
    src_parquet = next(
        os.path.join(dp, f)
        for dp, _, fs in os.walk(os.path.join(t, "data"))
        for f in fs
        if f.endswith(".parquet")
    )
    orphan_data = os.path.join(t, "data", "inflight-0.parquet")
    _sh.copyfile(src_parquet, orphan_data)
    src_avro = next(
        os.path.join(dp, f)
        for dp, _, fs in os.walk(os.path.join(t, "metadata"))
        for f in fs
        if f.endswith(".avro")
    )
    orphan_manifest = os.path.join(t, "metadata", "m-inflight.avro")
    _sh.copyfile(src_avro, orphan_manifest)

    got = w.expire_snapshots(keep_last=1)
    assert orphan_data not in got and orphan_manifest not in got
    assert os.path.exists(orphan_data) and os.path.exists(orphan_manifest)
    # the retained snapshot stays readable alongside the orphans
    assert {x.id for x in IcebergTableReader(spark, t).read().collect()} == {2}

    got = w.expire_snapshots(keep_last=1, retention_seconds=0.0)
    assert orphan_data in got and orphan_manifest in got
    assert not os.path.exists(orphan_data)


def test_expire_racing_append_conflicts_cleanly_then_retries(spark, tmp_path):
    """expire_snapshots commits a metadata rewrite like any writer — an
    append that read table state BEFORE that commit must lose the
    version race loudly (IcebergCommitConflict), its already-written
    files must survive default-retention expiry (the crash window), and
    a plain retry must land with nothing lost."""
    from unittest import mock

    import pytest

    from deimos_spark.operators.iceberg_interop import (
        IcebergCommitConflict,
        IcebergTableReader,
        IcebergTableWriter,
    )

    t = str(tmp_path / "icerace")
    w = IcebergTableWriter(spark, t)
    w.append(spark.createDataFrame([(1, "a")], "id long, v string"))
    w.append(spark.createDataFrame([(2, "b")], "id long, v string"))

    stale = w._current()  # the racing appender's view, pre-expiry
    files_before = {
        os.path.join(dp, f)
        for dp, _, fs in os.walk(t)
        for f in fs
        if f.endswith(".parquet")
    }
    assert w.expire_snapshots(keep_last=1) == []  # metadata rewrite lands

    w2 = IcebergTableWriter(spark, t)
    with mock.patch.object(w2, "_current", return_value=stale):
        with pytest.raises(IcebergCommitConflict):
            w2.append(spark.createDataFrame([(3, "c")], "id long, v string"))

    # the loser's data files were placed before its commit attempt —
    # a default-retention expiry in the crash window must not eat them
    loser_files = {
        os.path.join(dp, f)
        for dp, _, fs in os.walk(t)
        for f in fs
        if f.endswith(".parquet")
    } - files_before
    assert loser_files
    assert w.expire_snapshots(keep_last=1) == []
    for p in loser_files:
        assert os.path.exists(p)

    # plain retry (fresh read of current state) lands; nothing lost
    w2.append(spark.createDataFrame([(3, "c")], "id long, v string"))
    got = {x.id for x in IcebergTableReader(spark, t).read().collect()}
    assert got == {1, 2, 3}

    # and once retention expires, the failed attempt's orphans reclaim
    # (the retry wrote fresh files; the loser's originals stay orphaned)
    reclaimed = set(w.expire_snapshots(keep_last=1, retention_seconds=0.0))
    live = {x.id for x in IcebergTableReader(spark, t).read().collect()}
    assert live == {1, 2, 3}
    assert loser_files <= reclaimed
    for p in loser_files:
        assert not os.path.exists(p)


def test_manifest_summary_skips_whole_manifests(spark, tmp_path):
    """Manifest-list field_summary bounds (spec field 507): each append's
    manifest records per-field lower/upper bounds, and a filtered read
    skips manifests whose bounds exclude the filter WITHOUT opening
    them — the Iceberg scan-planning contract at 100 TB (thousands of
    files per manifest)."""
    from deimos_spark.operators.iceberg_interop import (
        IcebergTableReader,
        IcebergTableWriter,
    )

    t = str(tmp_path / "icesumm")
    w = IcebergTableWriter(spark, t, partition_by=("p",))
    w.append(
        spark.createDataFrame([(1, "a"), (2, "b")], "p int, v string")
    )
    w.append(
        spark.createDataFrame([(50, "c"), (60, "d")], "p int, v string")
    )
    w.append(spark.createDataFrame([(100, "e")], "p int, v string"))

    r = IcebergTableReader(spark, t)
    got = {x.v for x in r.read(partition_filter={"p": 60}).collect()}
    assert got == {"d"}
    # the p∈{1,2} and p=100 manifests were excluded by bounds alone
    assert r.last_manifests_skipped == 2

    # unfiltered read opens everything
    assert {x.v for x in r.read().collect()} == {"a", "b", "c", "d", "e"}
    assert r.last_manifests_skipped == 0

    # a filter between bounds of one manifest but matching nothing:
    # bounds can't exclude (55 ∈ [50,60]) — manifest opens, entry-level
    # pruning does the rest
    assert r.read(partition_filter={"p": 55}).count() == 0
    assert r.last_manifests_skipped == 2


def test_manifest_summary_skips_by_source_transform(spark, tmp_path):
    """Filter keys naming a SOURCE column transform before comparing to
    bucket bounds, same as entry-level pruning."""
    from deimos_spark.operators.iceberg_interop import (
        IcebergTableReader,
        IcebergTableWriter,
    )
    from deimos_spark.operators.iceberg_transforms import (
        parse_partition_field,
        transform_value,
    )

    t = str(tmp_path / "icesummb")
    w = IcebergTableWriter(spark, t, partition_by=("bucket(8, id)",))
    w.append(
        spark.createDataFrame([(i, f"v{i}") for i in range(40)],
                              "id long, v string")
    )
    r = IcebergTableReader(spark, t)
    got = {x.id for x in r.read(partition_filter={"id": 7}).collect()}
    # partition pruning is FILE-level: the read returns every row of the
    # surviving bucket's files — 7 present, all rows share 7's bucket
    pf = parse_partition_field("bucket(8, id)")
    want_bucket = transform_value(pf, 7)
    assert 7 in got
    assert all(transform_value(pf, i) == want_bucket for i in got)
    assert got != {i for i in range(40)}  # other buckets pruned

    # string identity bounds skip too
    t2 = str(tmp_path / "icesummc")
    w2 = IcebergTableWriter(spark, t2, partition_by=("lang",))
    w2.append(
        spark.createDataFrame([("de", 1), ("en", 2)], "lang string, id long")
    )
    w2.append(
        spark.createDataFrame([("pt", 3), ("zh", 4)], "lang string, id long")
    )
    r2 = IcebergTableReader(spark, t2)
    assert {x.id for x in r2.read(partition_filter={"lang": "zh"}).collect()} == {4}
    assert r2.last_manifests_skipped == 1


def test_manifest_summary_null_partition_and_foreign_lists(spark, tmp_path):
    """contains_null gates null-valued filters; manifest lists WITHOUT
    the partitions field (older/foreign writers) are never skipped."""
    from deimos_spark.operators.iceberg_interop import (
        IcebergTableReader,
        IcebergTableWriter,
    )
    from deimos_spark.schemas.avro_ocf import ocf_read, ocf_write

    t = str(tmp_path / "icesummn")
    w = IcebergTableWriter(spark, t, partition_by=("p",))
    w.append(
        spark.createDataFrame(
            [(None, "n1"), (5, "x")], "p int, v string"
        )
    )
    w.append(spark.createDataFrame([(9, "y")], "p int, v string"))
    r = IcebergTableReader(spark, t)
    got = {x.v for x in r.read(partition_filter={"p": None}).collect()}
    assert got == {"n1"}
    assert r.last_manifests_skipped == 1  # second manifest: no nulls

    # strip the partitions field from the manifest list -> no skipping,
    # same answers (forward compatibility with foreign lists)
    snap = r.snapshot()
    ml = r._local(snap["manifest-list"])
    schema, rows = ocf_read(ml)
    for row in rows:
        row.pop("partitions", None)
    schema["fields"] = [
        f for f in schema["fields"] if f["name"] != "partitions"
    ]
    ocf_write(ml, schema, rows)
    r2 = IcebergTableReader(spark, t)
    got = {x.v for x in r2.read(partition_filter={"p": None}).collect()}
    assert got == {"n1"}
    assert r2.last_manifests_skipped == 0


def test_entry_column_bounds_write_and_skip(spark, tmp_path):
    """Spec-125/128 per-column bounds: the writer records footer-derived
    single-value bounds per data file; read(stats_filter={col: (lo, hi)})
    skips entries whose bounds provably miss the range. Files without
    bounds always survive; unknown columns refuse loudly."""
    import pytest

    from deimos_spark.operators.iceberg_interop import (
        IcebergProtocolError,
        IcebergTableReader,
        IcebergTableWriter,
    )
    from deimos_spark.schemas.avro_ocf import ocf_read

    t = str(tmp_path / "icebounds")
    w = IcebergTableWriter(spark, t)
    for lo in (0, 100, 200):
        w.append(
            spark.createDataFrame(
                [(lo + i, f"s{lo + i:04d}") for i in range(10)],
                "id long, v string",
            ).coalesce(1)
        )
    r = IcebergTableReader(spark, t)

    # bounds landed in the manifests, keyed by field id
    snap = r.snapshot()
    _, manifests = ocf_read(r._local(snap["manifest-list"]))
    found = 0
    for mf in manifests:
        _, entries = ocf_read(r._local(mf["manifest_path"]))
        for e in entries:
            if e.get("status") == 2:
                continue
            lb = e["data_file"].get("lower_bounds")
            if lb:
                found += 1
                assert {x["key"] for x in lb} == {1, 2}  # id + v
    assert found == 3

    got = {x.id for x in r.read(stats_filter={"id": (150, 205)}).collect()}
    assert got == {i for i in range(200, 210)}  # only [200,209] overlaps

    got = {
        x.id for x in r.read(stats_filter={"v": ("s0100", "s0101")}).collect()
    }
    assert got == {i for i in range(100, 110)}

    with pytest.raises(IcebergProtocolError, match="not in table schema"):
        r.read(stats_filter={"nope": (1, 2)}).collect()

    # composes with a keyed-table history: bounds survive merges
    got = {x.id for x in r.read(stats_filter={"id": (None, 5)}).collect()}
    assert got == {i for i in range(0, 10)}


def test_incremental_append_scan(spark, tmp_path):
    """read_incremental: rows added AFTER `from` (exclusive) up to `to`
    (inclusive) — append snapshots contribute exactly their added files,
    only manifests written by in-range snapshots are opened, and the
    optional snapshot_col attributes each row to the snapshot that
    added it via a broadcast file→snapshot map (one scan, no per-file
    union)."""
    from deimos_spark.operators.iceberg_interop import IcebergTableWriter

    t = str(tmp_path / "ice_incr")
    w = IcebergTableWriter(spark, t)
    w.append(spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string"))
    w.append(spark.createDataFrame([(3, "c")], "id long, v string"))
    w.append(spark.createDataFrame([(4, "d")], "id long, v string"))

    r = IcebergTableReader(spark, t)
    # writer records lineage (spec optional parent-snapshot-id)
    snaps = {s["snapshot-id"]: s for s in r.metadata["snapshots"]}
    assert snaps[2]["parent-snapshot-id"] == 1
    assert snaps[3]["parent-snapshot-id"] == 2
    assert "parent-snapshot-id" not in snaps[1]

    assert _rows(r.read_incremental(from_snapshot_id=1)) == {
        (3, "c"), (4, "d"),
    }
    assert _rows(r.read_incremental()) == {
        (1, "a"), (2, "b"), (3, "c"), (4, "d"),
    }
    assert _rows(r.read_incremental(1, 2)) == {(3, "c")}
    # from == to (fully consumed): empty, schema intact
    empty = r.read_incremental(from_snapshot_id=3)
    assert empty.count() == 0
    assert [f.name for f in empty.schema.fields] == ["id", "v"]
    # snapshot attribution column
    got = {
        (x.id, x.v, x.sid)
        for x in r.read_incremental(1, snapshot_col="sid").collect()
    }
    assert got == {(3, "c", 2), (4, "d", 3)}
    import pytest as _pt

    with _pt.raises(IcebergProtocolError, match="not found"):
        r.read_incremental(from_snapshot_id=99)


def test_incremental_refuses_row_level_changes(spark, tmp_path):
    """An overwrite snapshot inside the range refuses loudly (an append
    stream cannot represent row-level changes); a range strictly after
    the overwrite reads fine."""
    import pytest as _pt

    from deimos_spark.operators.iceberg_interop import IcebergTableWriter

    t = str(tmp_path / "ice_incr_ow")
    w = IcebergTableWriter(spark, t)
    w.append(spark.createDataFrame([(1, "a")], "id long, v string"))
    w.overwrite(spark.createDataFrame([(2, "b")], "id long, v string"))
    w.append(spark.createDataFrame([(3, "c")], "id long, v string"))

    r = IcebergTableReader(spark, t)
    with _pt.raises(IcebergProtocolError, match="overwrite"):
        r.read_incremental(from_snapshot_id=1).collect()
    # consuming from the overwrite forward is pure appends again
    assert _rows(r.read_incremental(from_snapshot_id=2)) == {(3, "c")}


def test_incremental_refuses_unattributable_manifests(spark, ice_table):
    """Foreign v1 fixture whose manifests lack added_snapshot_id (spec
    requires it): attribution is impossible — refuse loudly instead of
    silently reporting 'nothing new'."""
    import pytest as _pt

    r = IcebergTableReader(spark, ice_table)
    with _pt.raises(IcebergProtocolError, match="added_snapshot_id"):
        r.read_incremental(from_snapshot_id=1)


def test_incremental_opens_only_in_range_manifests(spark, tmp_path, monkeypatch):
    """The O(files-added-in-range) contract: consuming the latest
    snapshot of a long table opens its manifest list + ONLY the one
    manifest that snapshot wrote — never the carried-forward manifests
    of prior history. At 100 TB this is what makes checkpoint-resume
    consumption independent of table size."""
    from deimos_spark.operators import iceberg_interop as ii

    t = str(tmp_path / "ice_incr_cost")
    w = ii.IcebergTableWriter(spark, t)
    for i in range(6):
        w.append(spark.createDataFrame([(i, f"v{i}")], "id long, v string"))

    r = IcebergTableReader(spark, t)
    calls = []
    real = ii.ocf_read

    def counting(path):
        calls.append(path)
        return real(path)

    monkeypatch.setattr(ii, "ocf_read", counting)
    assert _rows(r.read_incremental(from_snapshot_id=5)) == {(5, "v5")}
    # 1 manifest list + 1 manifest (snapshot 6's own) — the other 5
    # carried-forward manifests were never opened
    assert len(calls) == 2


def test_iceberg_history(spark, tmp_path):
    """history(): newest-first snapshot list with lineage + operation
    summaries, pure metadata."""
    from deimos_spark.operators.iceberg_interop import IcebergTableWriter

    t = str(tmp_path / "ice_hist")
    w = IcebergTableWriter(spark, t)
    w.append(spark.createDataFrame([(1, "a")], "id long, v string"))
    w.append(spark.createDataFrame([(2, "b")], "id long, v string"))
    w.overwrite(spark.createDataFrame([(3, "c")], "id long, v string"))

    h = IcebergTableReader(spark, t).history()
    assert [x["snapshot_id"] for x in h] == [3, 2, 1]
    assert [x["summary"]["operation"] for x in h] == [
        "overwrite", "append", "append",
    ]
    assert h[0]["parent_snapshot_id"] == 2
    assert h[2]["parent_snapshot_id"] is None
    assert len(IcebergTableReader(spark, t).history(limit=2)) == 2


def test_changelog_scan_appends_and_merge(spark, tmp_path):
    """read_changelog: appends emit inserts; a position-delete MERGE
    emits delete(old)+insert(new) pairs; a wholesale overwrite emits
    deletes for every dropped file's live rows — the row-level superset
    of read_incremental."""
    from deimos_spark.operators.iceberg_interop import IcebergKeyedTable

    t = str(tmp_path / "ice_cl")
    kt = IcebergKeyedTable(spark, t, ["id"])
    kt.upsert(spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string"))
    kt.merge(
        upserts=spark.createDataFrame([(2, "B2")], "id long, v string"),
        delete_keys=spark.createDataFrame([(1,)], "id long"),
    )

    r = IcebergTableReader(spark, t)
    rows = r.read_changelog().collect()
    got = {(x.id, x.v, x._change_type, x._snapshot_id) for x in rows}
    assert got == {
        (1, "a", "insert", 1),
        (2, "b", "insert", 1),
        (1, "a", "delete", 2),
        (2, "b", "delete", 2),
        (2, "B2", "insert", 2),
    }
    # consuming only the merge window
    got2 = {
        (x.id, x.v, x._change_type)
        for x in r.read_changelog(from_snapshot_id=1).collect()
    }
    assert got2 == {
        (1, "a", "delete"), (2, "b", "delete"), (2, "B2", "insert"),
    }

    # wholesale overwrite: drops every previous file
    kt.writer.overwrite(
        spark.createDataFrame([(9, "z")], "id long, v string")
    )
    r2 = IcebergTableReader(spark, t)
    got3 = {
        (x.id, x.v, x._change_type)
        for x in r2.read_changelog(from_snapshot_id=2).collect()
    }
    assert got3 == {(2, "B2", "delete"), (9, "z", "insert")}


def test_changelog_equality_mode_dead_rows_silent(spark, tmp_path):
    """Equality-delete merges changelog correctly, and a delete
    targeting an ALREADY-DEAD key emits nothing — targeted rows are
    fetched from the parent snapshot's LIVE view, not raw files."""
    from deimos_spark.operators.iceberg_interop import IcebergKeyedTable

    t = str(tmp_path / "ice_cl_eq")
    kt = IcebergKeyedTable(spark, t, ["id"], delete_mode="equality")
    kt.upsert(spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string"))
    kt.delete(spark.createDataFrame([(1,)], "id long"))   # snap 2
    kt.delete(spark.createDataFrame([(1,)], "id long"))   # snap 3: dead key

    r = IcebergTableReader(spark, t)
    assert {(x.id, x.v) for x in r.read().collect()} == {(2, "b")}
    rows = r.read_changelog(from_snapshot_id=1).collect()
    got = {(x.id, x.v, x._change_type, x._snapshot_id) for x in rows}
    # exactly ONE delete, at snapshot 2; snapshot 3 contributes nothing
    assert got == {(1, "a", "delete", 2)}


def test_changelog_replace_snapshots_silent(spark, tmp_path):
    """optimize() (a replace-shaped rewrite via overwrite of live rows)
    keeps logical content — but writer.overwrite labels it 'overwrite',
    so the changelog emits symmetric delete+insert of identical rows;
    an explicit replace-labeled snapshot emits nothing."""
    from deimos_spark.operators.iceberg_interop import IcebergTableWriter

    t = str(tmp_path / "ice_cl_rep")
    w = IcebergTableWriter(spark, t)
    w.append(spark.createDataFrame([(1, "a")], "id long, v string"))
    w.append(spark.createDataFrame([(2, "b")], "id long, v string"))

    # hand-flip snapshot 2's operation to 'replace' (the compaction
    # label): the changelog must skip it entirely
    r = IcebergTableReader(spark, t)
    md = r.metadata
    for s in md["snapshots"]:
        if s["snapshot-id"] == 2:
            s["summary"]["operation"] = "replace"
    import json as _json

    vdir = os.path.join(t, "metadata")
    with open(os.path.join(vdir, "version-hint.text")) as fh:
        v = fh.read().strip()
    with open(os.path.join(vdir, f"v{v}.metadata.json"), "w") as fh:
        _json.dump(md, fh)

    got = {
        (x.id, x.v, x._change_type)
        for x in IcebergTableReader(spark, t).read_changelog().collect()
    }
    assert got == {(1, "a", "insert")}


def test_changelog_plan_broadcasts_delete_sets(spark, tmp_path):
    """Plan gate: changelog delete reconstruction joins the batch-sized
    delete sets as BROADCAST semi-joins against the parent scan — no
    shuffle of the parent table, no cartesian product."""
    from deimos_spark.operators.iceberg_interop import IcebergKeyedTable

    t = str(tmp_path / "ice_cl_plan")
    kt = IcebergKeyedTable(spark, t, ["id"])
    kt.upsert(
        spark.createDataFrame(
            [(i, f"v{i}") for i in range(100)], "id long, v string"
        )
    )
    kt.delete(spark.createDataFrame([(7,), (9,)], "id long"))

    plan = (
        IcebergTableReader(spark, t)
        .read_changelog(from_snapshot_id=1)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan


@pytest.mark.parametrize("mode", ["position", "dv"])
def test_keyed_merge_never_collects_hit_pairs(spark, tmp_path, mode):
    """VERDICT r9 #5: the keyed merge must never materialize the
    matched (file, position) pair set driver-side — position mode
    writes delete files distributedly; DV mode streams one file's
    positions at a time via toLocalIterator. Gate: any collect() of a
    relation carrying the probe columns (__fp/__pos/__poss) during
    merge fails the test."""
    from pyspark.sql import DataFrame as _DF

    from deimos_spark.operators.iceberg_interop import IcebergKeyedTable

    t = str(tmp_path / f"ice_nocollect_{mode}")
    kt = IcebergKeyedTable(spark, t, ["id"], delete_mode=mode)
    # two data files so the hit set genuinely spans files
    kt.upsert(
        spark.createDataFrame(
            [(i, f"v{i}") for i in range(8)], "id long, v string"
        )
    )
    kt.upsert(
        spark.createDataFrame(
            [(i, f"v{i}") for i in range(8, 16)], "id long, v string"
        )
    )

    real_collect = _DF.collect
    probed = {"__fp", "__pos", "__poss"}

    def gated_collect(self, *a, **kw):
        hit = probed & set(self.columns)
        assert not hit, (
            f"driver-side collect of hit-pair relation (cols {hit})"
        )
        return real_collect(self, *a, **kw)

    _DF.collect = gated_collect
    try:
        kt.merge(
            upserts=spark.createDataFrame(
                [(2, "V2"), (99, "new")], "id long, v string"
            ),
            delete_keys=spark.createDataFrame([(5,), (13,)], "id long"),
        )
    finally:
        _DF.collect = real_collect

    got = {(x.id, x.v) for x in IcebergTableReader(spark, t).read().collect()}
    assert (2, "V2") in got and (99, "new") in got
    assert not any(i in (5, 13) for i, _ in got)
    assert len(got) == 15  # 16 - 2 deleted - 1 replaced + 2 upserts


def test_iceberg_optimize_zorder_manifest_bound_skipping(spark, tmp_path):
    """VERDICT r12 #1, Iceberg wiring: optimize(zorder_by=...) rewrites
    along a space-filling curve (the shape of Iceberg's own zorder /
    hilbert sort-order transforms) so the manifests' per-file
    lower/upper bounds prune on BOTH filter columns — measured: the
    2-predicate stats_filter plans ≤ 1/3 of the data files the
    sort_by (single-axis) twin plans, results identical."""
    from pyspark.sql import functions as F

    from deimos_spark.operators.iceberg_interop import (
        IcebergKeyedTable,
        IcebergTableWriter,
    )

    n = 64_000
    df = spark.range(n).select(
        (F.col("id") % 253).alias("x"),
        ((F.col("id") * 7919) % 241).alias("y"),
        F.col("id").alias("payload"),
    )
    zt, lt = str(tmp_path / "z"), str(tmp_path / "lin")
    wz = IcebergTableWriter(spark, zt)
    wz.append(df)
    IcebergKeyedTable(spark, zt, ["payload"]).optimize(
        zorder_by=["x", "y"], n_files=32
    )
    # linear twin: sort_by range-clusters at write time already
    wl = IcebergTableWriter(spark, lt, sort_by=["x"], sort_partitions=32)
    wl.append(df)

    sfilt = {"x": (0, 125), "y": (0, 29)}
    rz, rl = IcebergTableReader(spark, zt), IcebergTableReader(spark, lt)
    zn = len(rz._file_sets(None, None, sfilt)[0])
    ln = len(rl._file_sets(None, None, sfilt)[0])
    assert len(rl._file_sets(None, None, None)[0]) == 32 and ln >= 12
    assert zn * 3 <= ln, (zn, ln)

    def rows(r):
        return sorted(
            tuple(t)
            for t in r.read(stats_filter=sfilt)
            .filter((F.col("x") <= 125) & (F.col("y") <= 29))
            .collect()
        )

    base = rows(rl)
    assert base and rows(rz) == base


def test_iceberg_optimize_zorder_on_partitioned_table(spark, tmp_path):
    """Iceberg twin of the Delta partitioned OPTIMIZE ZORDER test:
    manifest-level partition pruning survives the curve rewrite, rows
    survive exactly, stats still prune within partitions."""
    from pyspark.sql import functions as F

    from deimos_spark.operators.iceberg_interop import (
        IcebergKeyedTable,
        IcebergTableReader,
        IcebergTableWriter,
    )

    t = str(tmp_path / "ipz")
    w = IcebergTableWriter(spark, t, partition_by=("day",))
    df = spark.range(8_000).select(
        (F.col("id") % 4).alias("day"),
        (F.col("id") % 127).alias("x"),
        ((F.col("id") * 31) % 113).alias("y"),
        F.col("id").alias("payload"),
    )
    w.append(df)
    IcebergKeyedTable(
        spark, t, ["payload"], partition_by=("day",)
    ).optimize(zorder_by=["x", "y"], n_files=8)

    r = IcebergTableReader(spark, t)
    got = r.read()
    assert got.count() == 8_000
    all_files = r._file_sets(None, None, None)[0]
    day_files = r._file_sets(None, {"day": 2}, None)[0]
    assert 0 < len(day_files) < len(all_files)
    pruned = r._file_sets(None, None, {"x": (0, 20), "y": (0, 20)})[0]
    assert len(pruned) < len(all_files)
    one = sorted(
        x.payload
        for x in r.read(
            partition_filter={"day": 2},
            stats_filter={"x": (0, 20), "y": (0, 20)},
        )
        .filter((F.col("x") <= 20) & (F.col("y") <= 20))
        .collect()
    )
    want = sorted(
        x.payload
        for x in df.filter(
            (F.col("day") == 2) & (F.col("x") <= 20) & (F.col("y") <= 20)
        ).collect()
    )
    assert one == want and one


def test_iceberg_optimize_zorder_degenerate_inputs_fall_back(spark, tmp_path):
    """ADVICE r13: OPTIMIZE ZORDER must degrade to the linear rewrite —
    not fail the maintenance job — when the curve key is undefined:
    every live row deleted, or an all-NULL zorder column."""
    from pyspark.sql import functions as F

    from deimos_spark.operators.iceberg_interop import IcebergKeyedTable

    # all rows deleted
    t = str(tmp_path / "ice_empty")
    kt = IcebergKeyedTable(spark, t, ["id"])
    kt.upsert(spark.createDataFrame([(1, 2), (3, 4)], "id long, x long"))
    kt.delete(spark.createDataFrame([(1,), (3,)], "id long"))
    assert IcebergTableReader(spark, t).read().count() == 0
    kt.optimize(zorder_by=["x"], n_files=2)  # must not raise
    assert IcebergTableReader(spark, t).read().count() == 0

    # all-NULL zorder column
    t2 = str(tmp_path / "ice_null")
    kt2 = IcebergKeyedTable(spark, t2, ["id"])
    kt2.upsert(
        spark.range(50).select(
            F.col("id"), F.lit(None).cast("long").alias("x")
        )
    )
    kt2.optimize(zorder_by=["x"], n_files=2)  # must not raise
    got = IcebergTableReader(spark, t2).read()
    assert got.count() == 50
