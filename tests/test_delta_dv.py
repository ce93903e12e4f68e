"""Deletion-vector reads: the deltadv codec (Z85, portable Roaring,
native RoaringBitmapArray, DV file framing+CRC) and DeltaTableReader
integration — hand-authored minReaderVersion-3 logs per the public
protocol spec, rows dropped by file-local row index.
"""

import json
import os

import numpy as np
import pytest
from pyspark.sql import types as T

from deimos_spark.operators import deltadv
from deimos_spark.operators.delta_interop import (
    DeltaProtocolError,
    DeltaTableReader,
)
from tests.test_delta_interop import (
    SCHEMA_JSON,
    _add,
    _commit,
    _meta,
    _write_data_file,
)

PROTO_V3 = {
    "protocol": {
        "minReaderVersion": 3,
        "minWriterVersion": 7,
        "readerFeatures": ["deletionVectors"],
        "writerFeatures": ["deletionVectors"],
    }
}


# ------------------------------------------------------------- codec unit


def test_z85_roundtrip():
    for data in (b"", b"\x00\x00\x00\x00", b"\xff" * 8, bytes(range(32))):
        assert deltadv.z85_decode(deltadv.z85_encode(data)) == data
    with pytest.raises(deltadv.DeletionVectorError):
        deltadv.z85_decode("abc")  # not a multiple of 5


@pytest.mark.parametrize(
    "indexes",
    [
        [],
        [0],
        [0, 1, 2, 5, 65535, 65536, 70000],
        list(range(5000)),  # forces a bitmap container (card > 4096)
        [2**32 + 7, 2**33 + 1, 3],  # multiple high-32 bitmaps
    ],
)
def test_bitmap_array_roundtrip(indexes):
    idx = np.asarray(indexes, dtype=np.int64)
    data = deltadv.serialize_bitmap_array(idx)
    out = deltadv.deserialize_bitmap_array(data)
    assert out.tolist() == sorted(set(indexes))


def test_run_container_decode():
    """Hand-build a SERIAL_COOKIE run-container bitmap and decode it."""
    import struct

    # one container, run flag set, runs [(10, len 5), (100, len 1)]
    buf = struct.pack("<I", deltadv._SERIAL_COOKIE | (0 << 16))
    buf += b"\x01"  # run flag bitset: container 0 is a run container
    buf += struct.pack("<HH", 0, 7 - 1)  # key 0, cardinality 7
    buf += struct.pack("<H", 2)  # 2 runs (size<4 → no offset header)
    buf += struct.pack("<HH", 10, 4)  # 10..14
    buf += struct.pack("<HH", 100, 1)  # 100..101
    vals, pos = deltadv._deserialize_roaring32(bytes(buf), 0)
    assert pos == len(buf)
    assert vals.tolist() == [10, 11, 12, 13, 14, 100, 101]


def test_dv_file_roundtrip(tmp_path):
    table = str(tmp_path)
    idx = np.array([1, 3, 2**32 + 4], dtype=np.int64)
    desc = deltadv.write_dv_file(table, idx, prefix="ab")
    assert desc["storageType"] == "u"
    assert desc["cardinality"] == 3
    out = deltadv.dv_row_indexes(table, desc)
    assert out.tolist() == [1, 3, 2**32 + 4]


def test_dv_file_crc_detects_corruption(tmp_path):
    table = str(tmp_path)
    desc = deltadv.write_dv_file(table, np.array([5, 6], dtype=np.int64))
    u = desc["pathOrInlineDv"]
    fname = next(f for f in os.listdir(table) if f.startswith("deletion_"))
    p = os.path.join(table, fname)
    blob = bytearray(open(p, "rb").read())
    blob[10] ^= 0xFF
    open(p, "wb").write(bytes(blob))
    with pytest.raises(deltadv.DeletionVectorError, match="checksum"):
        deltadv.dv_row_indexes(table, desc)
    assert u  # descriptor untouched — the FILE is what failed


def test_inline_descriptor_roundtrip(tmp_path):
    desc = deltadv.inline_dv_descriptor(np.array([0, 9, 100], dtype=np.int64))
    assert desc["storageType"] == "i"
    out = deltadv.dv_row_indexes(str(tmp_path), desc)
    assert out.tolist() == [0, 9, 100]


# ------------------------------------------------------- reader integration


def _add_dv(path, desc, pvals=None):
    a = _add(path, pvals)
    a["add"]["deletionVector"] = desc
    return a


def test_read_drops_dv_rows(spark, tmp_path):
    table = str(tmp_path / "t")
    os.makedirs(table)
    rows = [(i, f"v{i}") for i in range(10)]
    _write_data_file(spark, table, "part-0.parquet", rows)
    # rows 2, 5, 7 soft-deleted via an on-disk DV
    desc = deltadv.write_dv_file(table, np.array([2, 5, 7], dtype=np.int64))
    _commit(table, 0, [PROTO_V3, _meta(), _add_dv("part-0.parquet", desc)])
    got = sorted(
        r.id for r in DeltaTableReader(spark, table).read().collect()
    )
    assert got == [0, 1, 3, 4, 6, 8, 9]


def test_read_mixes_clean_and_dv_files(spark, tmp_path):
    table = str(tmp_path / "t")
    os.makedirs(table)
    _write_data_file(spark, table, "a.parquet", [(i, "a") for i in range(5)])
    _write_data_file(
        spark, table, "b.parquet", [(i, "b") for i in range(5, 10)]
    )
    desc = deltadv.inline_dv_descriptor(np.array([0, 4], dtype=np.int64))
    _commit(
        table,
        0,
        [PROTO_V3, _meta(), _add("a.parquet"), _add_dv("b.parquet", desc)],
    )
    got = sorted(
        r.id for r in DeltaTableReader(spark, table).read().collect()
    )
    # b.parquet local rows 0 and 4 are ids 5 and 9
    assert got == [0, 1, 2, 3, 4, 6, 7, 8]


def test_dv_updated_by_readd(spark, tmp_path):
    """MERGE-style history: re-adding a file with a wider DV replaces the
    old entry; time travel still sees the narrow one."""
    table = str(tmp_path / "t")
    os.makedirs(table)
    _write_data_file(spark, table, "f.parquet", [(i, "x") for i in range(6)])
    d1 = deltadv.inline_dv_descriptor(np.array([1], dtype=np.int64))
    d2 = deltadv.inline_dv_descriptor(np.array([1, 2, 3], dtype=np.int64))
    _commit(table, 0, [PROTO_V3, _meta(), _add_dv("f.parquet", d1)])
    _commit(
        table,
        1,
        [
            {"remove": {"path": "f.parquet", "dataChange": True}},
            _add_dv("f.parquet", d2),
        ],
    )
    rd = DeltaTableReader(spark, table)
    assert sorted(r.id for r in rd.read().collect()) == [0, 4, 5]
    assert sorted(r.id for r in rd.read(version=0).collect()) == [
        0, 2, 3, 4, 5,
    ]


def test_dv_on_partitioned_table(spark, tmp_path):
    table = str(tmp_path / "t")
    os.makedirs(table)
    schema_json = json.dumps(
        {
            "type": "struct",
            "fields": [
                {"name": "id", "type": "long", "nullable": False, "metadata": {}},
                {"name": "v", "type": "string", "nullable": True, "metadata": {}},
                {"name": "p", "type": "string", "nullable": True, "metadata": {}},
            ],
        }
    )
    _write_data_file(spark, table, "p=x/a.parquet", [(1, "a"), (2, "b")])
    _write_data_file(spark, table, "p=y/b.parquet", [(3, "c"), (4, "d")])
    desc = deltadv.inline_dv_descriptor(np.array([0], dtype=np.int64))
    _commit(
        table,
        0,
        [
            PROTO_V3,
            _meta(schema_json, ("p",)),
            _add("p=x/a.parquet", {"p": "x"}),
            _add_dv("p=y/b.parquet", desc, {"p": "y"}),
        ],
    )
    got = {(r.id, r.p) for r in DeltaTableReader(spark, table).read().collect()}
    assert got == {(1, "x"), (2, "x"), (4, "y")}  # id 3 deleted


def test_unknown_reader_feature_still_refused(spark, tmp_path):
    table = str(tmp_path / "t")
    os.makedirs(table)
    _commit(
        table,
        0,
        [
            {
                "protocol": {
                    "minReaderVersion": 3,
                    "minWriterVersion": 7,
                    "readerFeatures": ["v2Checkpoint"],
                }
            },
            _meta(),
        ],
    )
    with pytest.raises(DeltaProtocolError, match="v2Checkpoint"):
        DeltaTableReader(spark, table).read()
