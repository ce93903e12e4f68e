"""Iceberg branch/tag refs (table spec `refs` map): reader resolution
(`read(ref=...)`), writer-maintained `main`, tag/branch management,
and ref-aware snapshot expiry (a tagged snapshot never expires)."""

import pytest

from deimos_spark.operators.iceberg_interop import (
    IcebergProtocolError,
    IcebergTableReader,
    IcebergTableWriter,
)

SCHEMA = "id bigint, v string"


def _append(spark, w, ids):
    w.append(
        spark.createDataFrame([(i, f"r{i}") for i in ids], SCHEMA)
    )


def test_main_tracks_current_snapshot(spark, tmp_path):
    t = str(tmp_path / "t")
    w = IcebergTableWriter(spark, t)
    _append(spark, w, [1])
    _append(spark, w, [2])
    r = IcebergTableReader(spark, t)
    refs = r.refs()
    assert refs["main"]["type"] == "branch"
    assert refs["main"]["snapshot-id"] == r.metadata["current-snapshot-id"]
    assert r.read(ref="main").count() == r.read().count() == 2


def test_tag_pins_a_state(spark, tmp_path):
    t = str(tmp_path / "t")
    w = IcebergTableWriter(spark, t)
    _append(spark, w, [1, 2])
    first_sid = IcebergTableReader(spark, t).metadata[
        "current-snapshot-id"
    ]
    w.set_ref("audit-2026q1", snapshot_id=first_sid, ref_type="tag")
    _append(spark, w, [3, 4, 5])
    r = IcebergTableReader(spark, t)
    assert r.read().count() == 5
    assert r.read(ref="audit-2026q1").count() == 2
    # unchanged through further commits
    _append(spark, w, [6])
    r = IcebergTableReader(spark, t)
    assert r.read(ref="audit-2026q1").count() == 2


def test_ref_exclusive_with_other_time_travel(spark, tmp_path):
    t = str(tmp_path / "t")
    w = IcebergTableWriter(spark, t)
    _append(spark, w, [1])
    r = IcebergTableReader(spark, t)
    with pytest.raises(ValueError, match="at most one"):
        r.read(ref="main", snapshot_id=1)
    with pytest.raises(IcebergProtocolError, match="not found"):
        r.read(ref="nope")


def test_expire_keeps_ref_targets(spark, tmp_path):
    t = str(tmp_path / "t")
    w = IcebergTableWriter(spark, t)
    _append(spark, w, [1])
    tagged_sid = IcebergTableReader(spark, t).metadata[
        "current-snapshot-id"
    ]
    w.set_ref("keepme", snapshot_id=tagged_sid, ref_type="tag")
    for ids in ([2], [3], [4]):
        _append(spark, w, ids)
    w.expire_snapshots(keep_last=1, retention_seconds=0.0)
    r = IcebergTableReader(spark, t)
    # the tagged snapshot survived the keep_last=1 window
    assert r.read(ref="keepme").count() == 1
    assert r.read().count() == 4
    # drop the tag; now it expires and its exclusive files go away
    w.drop_ref("keepme")
    w.expire_snapshots(keep_last=1, retention_seconds=0.0)
    r = IcebergTableReader(spark, t)
    assert "keepme" not in r.refs()
    with pytest.raises(IcebergProtocolError):
        r.read(snapshot_id=tagged_sid)


def test_ref_management_guards(spark, tmp_path):
    t = str(tmp_path / "t")
    w = IcebergTableWriter(spark, t)
    _append(spark, w, [1])
    with pytest.raises(ValueError, match="main"):
        w.set_ref("main", ref_type="branch")
    with pytest.raises(ValueError, match="main"):
        w.drop_ref("main")
    with pytest.raises(IcebergProtocolError, match="not found"):
        w.drop_ref("ghost")
    with pytest.raises(IcebergProtocolError, match="not found"):
        w.set_ref("t2", snapshot_id=999999)
    with pytest.raises(ValueError, match="tag or branch"):
        w.set_ref("t3", ref_type="bookmark")


def test_foreign_refs_read(spark, tmp_path):
    """Refs written by another engine (hand-authored into the
    metadata JSON) resolve identically."""
    import json
    import os

    t = str(tmp_path / "t")
    w = IcebergTableWriter(spark, t)
    _append(spark, w, [1, 2])
    sid = IcebergTableReader(spark, t).metadata["current-snapshot-id"]
    _append(spark, w, [3])
    meta_dir = os.path.join(t, "metadata")
    mv = int(open(os.path.join(meta_dir, "version-hint.text")).read())
    mp = os.path.join(meta_dir, f"v{mv}.metadata.json")
    md = json.load(open(mp))
    md.setdefault("refs", {})["foreign-tag"] = {
        "snapshot-id": sid,
        "type": "tag",
        "max-ref-age-ms": 604800000,
    }
    json.dump(md, open(os.path.join(meta_dir, f"v{mv+1}.metadata.json"), "w"))
    open(os.path.join(meta_dir, "version-hint.text"), "w").write(
        str(mv + 1)
    )
    r = IcebergTableReader(spark, t)
    assert r.read(ref="foreign-tag").count() == 2
    # and OUR next commit preserves the foreign ref verbatim
    _append(spark, w, [4])
    r = IcebergTableReader(spark, t)
    assert r.refs()["foreign-tag"]["max-ref-age-ms"] == 604800000
