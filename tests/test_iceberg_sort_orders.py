"""Iceberg sort orders (table spec `sort-orders` /
`default-sort-order-id` / data_file.sort_order_id field 140):
declared sorting range-clusters data so per-file bounds are disjoint
and stats pruning works; foreign sort-order metadata is preserved
instead of clobbered."""

import json
import os

import pytest

from deimos_spark.operators.iceberg_interop import (
    IcebergProtocolError,
    IcebergTableReader,
    IcebergTableWriter,
)
from deimos_spark.schemas.avro_ocf import ocf_read

SCHEMA = "id bigint, v string"


def _df(spark, lo, hi):
    import random

    rng = random.Random(7)
    rows = [(i, f"r{i}") for i in range(lo, hi)]
    rng.shuffle(rows)
    return spark.createDataFrame(rows, SCHEMA).repartition(4)


def test_sorted_write_records_order_and_disjoint_bounds(spark, tmp_path):
    t = str(tmp_path / "t")
    w = IcebergTableWriter(
        spark, t, sort_by=("id",), sort_partitions=4
    )
    w.append(_df(spark, 0, 4000))
    r = IcebergTableReader(spark, t)
    md = r.metadata
    so = next(
        s
        for s in md["sort-orders"]
        if s["order-id"] == md["default-sort-order-id"]
    )
    assert so["fields"] == [
        {
            "transform": "identity",
            "source-id": 1,
            "direction": "asc",
            "null-order": "nulls-first",
        }
    ]
    # every data entry carries the order id; bounds are DISJOINT
    data, *_ = r._file_sets(None)
    assert len(data) > 1, "need a multi-file write to test clustering"
    snap = r.snapshot()
    _, manifests = ocf_read(r._local(snap["manifest-list"]))
    ranges = []
    for mf in manifests:
        _, entries = ocf_read(r._local(mf["manifest_path"]))
        for e in entries:
            d = e["data_file"]
            assert d["sort_order_id"] == md["default-sort-order-id"]
            lo = hi = None
            for b in d["lower_bounds"] or []:
                if b["key"] == 1:
                    lo = int.from_bytes(b["value"][:8], "little", signed=True)
            for b in d["upper_bounds"] or []:
                if b["key"] == 1:
                    hi = int.from_bytes(b["value"][:8], "little", signed=True)
            assert lo is not None and hi is not None
            ranges.append((lo, hi))
    ranges.sort()
    for (l1, h1), (l2, h2) in zip(ranges, ranges[1:]):
        assert h1 < l2, f"file ranges overlap: {ranges}"
    # content intact
    assert r.read().count() == 4000
    # stats pruning now opens a strict subset of files
    pruned, *_ = r._file_sets(None, None, {"id": (10, 20)})
    assert len(pruned) < len(data)


def test_same_sort_reuses_order_id(spark, tmp_path):
    t = str(tmp_path / "t")
    w = IcebergTableWriter(spark, t, sort_by=("id",))
    w.append(_df(spark, 0, 100))
    w.append(_df(spark, 100, 200))
    md = IcebergTableReader(spark, t).metadata
    assert len(md["sort-orders"]) == 2  # order 0 (unsorted) + ours
    assert md["default-sort-order-id"] == 1


def test_foreign_sort_orders_preserved_by_unsorted_writer(
    spark, tmp_path
):
    t = str(tmp_path / "t")
    w = IcebergTableWriter(spark, t)
    w.append(_df(spark, 0, 50))
    meta_dir = os.path.join(t, "metadata")
    mv = int(open(os.path.join(meta_dir, "version-hint.text")).read())
    mp = os.path.join(meta_dir, f"v{mv}.metadata.json")
    md = json.load(open(mp))
    foreign = {
        "order-id": 7,
        "fields": [
            {
                "transform": "bucket[16]",
                "source-id": 2,
                "direction": "asc",
                "null-order": "nulls-last",
            }
        ],
    }
    md["sort-orders"] = md.get("sort-orders", []) + [foreign]
    md["default-sort-order-id"] = 7
    json.dump(md, open(os.path.join(meta_dir, f"v{mv+1}.metadata.json"), "w"))
    open(os.path.join(meta_dir, "version-hint.text"), "w").write(str(mv + 1))

    w.append(_df(spark, 50, 100))  # unsorted writer must not clobber
    md2 = IcebergTableReader(spark, t).metadata
    assert foreign in md2["sort-orders"]
    assert md2["default-sort-order-id"] == 7


def test_unknown_sort_column_refuses(spark, tmp_path):
    t = str(tmp_path / "t")
    w = IcebergTableWriter(spark, t, sort_by=("nope",))
    with pytest.raises(IcebergProtocolError, match="sort_by"):
        w.append(_df(spark, 0, 10))
