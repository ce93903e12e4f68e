"""Corruption-resilience posture: damaged table artifacts must fail
LOUDLY (typed error or Spark read error), never read as silently
truncated/empty data. At 100 TB bit rot and torn writes are routine —
a reader that turns a damaged manifest into '0 matching files' quietly
drops data from every downstream job.

Each test damages ONE artifact class of a freshly-written table and
asserts the read (a) raises, or (b) where the artifact is legitimately
optional (e.g. version-hint), still returns the COMPLETE data via the
documented fallback — never a silent subset.
"""

import json
import os

import pytest

from deimos_spark.operators.delta_interop import (
    DeltaProtocolError,
    DeltaTableReader,
    DeltaTableWriter,
)
from deimos_spark.operators.iceberg_interop import (
    IcebergProtocolError,
    IcebergTableReader,
    IcebergTableWriter,
)


def _delta(spark, path, n=8):
    w = DeltaTableWriter(spark, path)
    w.append(spark.range(n).selectExpr("id", "id * 2 AS v"))
    return w


def _iceberg(spark, path, n=8):
    w = IcebergTableWriter(spark, path)
    w.append(spark.range(n).selectExpr("id", "id * 2 AS v"))
    return w


def test_truncated_delta_data_file_raises(spark, tmp_path):
    path = str(tmp_path / "t")
    _delta(spark, path)
    part = next(
        f for f in os.listdir(path) if f.endswith(".parquet")
    )
    full = os.path.join(path, part)
    data = open(full, "rb").read()
    with open(full, "wb") as fh:
        fh.write(data[: len(data) // 2])  # torn write
    with pytest.raises(Exception):  # Spark parquet reader: loud
        DeltaTableReader(spark, path).read().collect()


def test_garbled_delta_log_line_raises(spark, tmp_path):
    path = str(tmp_path / "t")
    _delta(spark, path)
    log = os.path.join(path, "_delta_log", "00000000000000000000.json")
    with open(log, "a") as fh:
        fh.write('{"add": {"path": \n')  # torn JSON line
    with pytest.raises(Exception):
        DeltaTableReader(spark, path).snapshot()


def test_delta_log_gap_raises_not_partial(spark, tmp_path):
    """A MISSING intermediate commit must not silently replay around
    the hole (that would resurrect deleted rows / drop appended ones)."""
    path = str(tmp_path / "t")
    w = _delta(spark, path)
    w.append(spark.range(100, 104).selectExpr("id", "id * 2 AS v"))
    w.append(spark.range(200, 204).selectExpr("id", "id * 2 AS v"))
    os.remove(os.path.join(path, "_delta_log", f"{1:020d}.json"))
    with pytest.raises(Exception):
        DeltaTableReader(spark, path).read().collect()


def test_corrupt_checkpoint_full_log_reads_complete(spark, tmp_path):
    """A corrupt checkpoint whose commits all still exist is a
    REDUNDANT artifact: the reader must fall back to a from-scratch
    JSON replay and return the COMPLETE table, not raise and not
    truncate."""
    path = str(tmp_path / "t")
    w = DeltaTableWriter(spark, path, checkpoint_interval=2)
    for b in range(3):  # v0..v2, checkpoint at v2
        w.append(
            spark.range(b * 10, b * 10 + 4).selectExpr("id", "id * 2 AS v")
        )
    ckpt = os.path.join(path, "_delta_log", f"{2:020d}.checkpoint.parquet")
    assert os.path.exists(ckpt)
    with open(ckpt, "wb") as fh:
        fh.write(b"\x00" * 64)  # not parquet at all
    assert DeltaTableReader(spark, path).read().count() == 12


def test_corrupt_checkpoint_after_log_cleanup_raises(spark, tmp_path):
    """Once cleanup_log has aged out the commits a checkpoint subsumes,
    that checkpoint is the ONLY source for versions <= it. Corrupting
    it must raise — falling back to the surviving JSON tail would
    silently drop every pre-checkpoint row."""
    path = str(tmp_path / "t")
    w = DeltaTableWriter(spark, path, checkpoint_interval=4)
    for b in range(7):  # v0..v6, checkpoint at v4
        w.append(
            spark.range(b * 10, b * 10 + 2).selectExpr("id", "id * 2 AS v")
        )
    w.cleanup_log(retention_seconds=0.0)  # drops v0..v4 json
    ckpt = os.path.join(path, "_delta_log", f"{4:020d}.checkpoint.parquet")
    data = open(ckpt, "rb").read()
    with open(ckpt, "wb") as fh:
        fh.write(data[: len(data) // 3])
    with pytest.raises(DeltaProtocolError):
        DeltaTableReader(spark, path).read().collect()


def test_corrupt_checkpoint_no_commits_left_raises(spark, tmp_path):
    """Degenerate cleanup state: the checkpoint IS the whole log.
    Corrupting it must raise, never read as an empty table."""
    path = str(tmp_path / "t")
    w = DeltaTableWriter(spark, path, checkpoint_interval=2)
    for b in range(3):  # v0..v2, checkpoint at v2
        w.append(
            spark.range(b * 10, b * 10 + 2).selectExpr("id", "id * 2 AS v")
        )
    w.cleanup_log(retention_seconds=0.0)
    log_dir = os.path.join(path, "_delta_log")
    # age out the commit tail the cleaner retains: any commit <= the
    # newest checkpoint's version is legally removable
    for n in os.listdir(log_dir):
        if n.endswith(".json") and n[:-5].isdigit() and int(n[:-5]) <= 2:
            os.remove(os.path.join(log_dir, n))
    assert not [n for n in os.listdir(log_dir) if n.endswith(".json")
                and n[:-5].isdigit()]
    ckpt = os.path.join(log_dir, f"{2:020d}.checkpoint.parquet")
    with open(ckpt, "wb") as fh:
        fh.write(b"torn")
    with pytest.raises(DeltaProtocolError):
        DeltaTableReader(spark, path).snapshot()


def test_corrupt_last_checkpoint_pointer_reads_complete(spark, tmp_path):
    """_last_checkpoint is an OPTIMIZATION pointer: garbling it must
    fall back to the directory LIST and still return complete data."""
    path = str(tmp_path / "t")
    w = DeltaTableWriter(spark, path, checkpoint_interval=2)
    for b in range(3):
        w.append(
            spark.range(b * 10, b * 10 + 4).selectExpr("id", "id * 2 AS v")
        )
    lc = os.path.join(path, "_delta_log", "_last_checkpoint")
    assert os.path.exists(lc)
    with open(lc, "w") as fh:
        fh.write('{"version": ')  # torn JSON
    assert DeltaTableReader(spark, path).read().count() == 12


def test_missing_delta_dv_file_raises(spark, tmp_path):
    """A deletion-vector file is LOAD-BEARING state: losing it must
    raise, not resurrect the deleted rows."""
    from deimos_spark.operators.delta_interop import DeltaKeyedTable

    path = str(tmp_path / "t")
    t = DeltaKeyedTable(spark, path, ["k"], schema="k bigint, v string",
                        use_dvs=True)
    t.merge(upserts=spark.createDataFrame(
        [(i, "a") for i in range(8)], "k bigint, v string"))
    t.merge(delete_keys=spark.createDataFrame([(3,), (5,)], "k bigint"))
    dvs = [n for n in os.listdir(path) if n.startswith("deletion_vector_")]
    assert dvs, "expected an on-disk deletion vector file"
    os.remove(os.path.join(path, dvs[0]))
    with pytest.raises(Exception):
        DeltaTableReader(spark, path).read().collect()


def test_truncated_iceberg_manifest_list_raises(spark, tmp_path):
    path = str(tmp_path / "t")
    _iceberg(spark, path)
    r = IcebergTableReader(spark, path)
    snap = r.snapshot(None)
    mlist = r._local(snap["manifest-list"])
    data = open(mlist, "rb").read()
    with open(mlist, "wb") as fh:
        fh.write(data[: len(data) - 9])
    with pytest.raises(Exception):
        IcebergTableReader(spark, path).read().collect()


def test_missing_iceberg_delete_file_raises(spark, tmp_path):
    """A position-delete file is load-bearing: losing it must raise,
    not return the deleted rows as live."""
    from deimos_spark.operators.iceberg_interop import IcebergKeyedTable

    path = str(tmp_path / "t")
    t = IcebergKeyedTable(spark, path, ["k"])
    t.merge(upserts=spark.createDataFrame(
        [(i, "a") for i in range(8)], "k bigint, v string"))
    ddir = os.path.join(path, "data")
    before = set(os.listdir(ddir))
    t.merge(delete_keys=spark.createDataFrame([(3,), (5,)], "k bigint"))
    new = [n for n in os.listdir(ddir) if n not in before]
    assert new, "expected a new delete file from the delete merge"
    for n in new:
        os.remove(os.path.join(ddir, n))
    with pytest.raises(Exception):
        IcebergTableReader(spark, path).read().collect()


def test_truncated_iceberg_manifest_raises(spark, tmp_path):
    path = str(tmp_path / "t")
    _iceberg(spark, path)
    r = IcebergTableReader(spark, path)
    snap = r.snapshot(None)
    from deimos_spark.schemas.avro_ocf import ocf_read

    _, manifests = ocf_read(r._local(snap["manifest-list"]))
    mpath = r._local(manifests[0]["manifest_path"])
    data = open(mpath, "rb").read()
    with open(mpath, "wb") as fh:
        fh.write(data[: len(data) - 7])  # chop mid-block
    with pytest.raises(Exception):
        IcebergTableReader(spark, path).read().collect()


def test_garbled_iceberg_metadata_json_raises(spark, tmp_path):
    path = str(tmp_path / "t")
    _iceberg(spark, path)
    meta_dir = os.path.join(path, "metadata")
    with open(os.path.join(meta_dir, "version-hint.text")) as fh:
        mv = int(fh.read().strip())
    mpath = os.path.join(meta_dir, f"v{mv}.metadata.json")
    data = open(mpath).read()
    with open(mpath, "w") as fh:
        fh.write(data[: len(data) // 2])
    with pytest.raises(Exception):
        IcebergTableReader(spark, path)


def test_missing_version_hint_still_reads_complete_table(spark, tmp_path):
    """version-hint.text is an OPTIMIZATION (HadoopTables convention):
    without it the reader must recover the LATEST version by scanning
    metadata files — full data, not a stale subset."""
    path = str(tmp_path / "t")
    w = _iceberg(spark, path)
    w.append(spark.range(100, 104).selectExpr("id", "id * 2 AS v"))
    os.remove(os.path.join(path, "metadata", "version-hint.text"))
    assert IcebergTableReader(spark, path).read().count() == 12


def test_missing_iceberg_data_file_raises(spark, tmp_path):
    path = str(tmp_path / "t")
    _iceberg(spark, path)
    ddir = os.path.join(path, "data")
    victim = next(
        os.path.join(ddir, f)
        for f in os.listdir(ddir)
        if f.endswith(".parquet")
    )
    os.remove(victim)
    with pytest.raises(Exception):
        IcebergTableReader(spark, path).read().collect()


def test_wide_delta_log_hole_raises_fast_path(spark, tmp_path):
    """A 2-wide hole BELOW a fresh _last_checkpoint-less table: both
    replay paths must detect it (fast path probes a window past the
    first absent commit; slow path checks contiguity on the listing)."""
    path = str(tmp_path / "t")
    w = _delta(spark, path)
    for b in range(1, 5):
        w.append(
            spark.range(b * 100, b * 100 + 2).selectExpr("id", "id * 2 AS v")
        )
    for missing in (1, 2):
        os.remove(os.path.join(path, "_delta_log", f"{missing:020d}.json"))
    with pytest.raises(DeltaProtocolError):
        DeltaTableReader(spark, path).read().collect()


def test_wide_hole_above_checkpoint_raises_no_list(spark, tmp_path):
    """Same 2-wide hole, but UNDER a fresh _last_checkpoint pointer —
    the no-LIST fast path must find it via the probe window (and must
    not have fallen back to a directory LIST to do so)."""
    path = str(tmp_path / "t")
    w = DeltaTableWriter(spark, path, checkpoint_interval=4)
    for b in range(8):  # v0..v7, checkpoint + pointer at v4
        w.append(
            spark.range(b * 10, b * 10 + 2).selectExpr("id", "id * 2 AS v")
        )
    for missing in (5, 6):
        os.remove(os.path.join(path, "_delta_log", f"{missing:020d}.json"))
    r = DeltaTableReader(spark, path)
    with pytest.raises(DeltaProtocolError):
        r.snapshot()
    assert r.last_snapshot_listed_log is False  # stayed on the fast path


def test_wide_hole_beyond_probe_window_raises(spark, tmp_path):
    """ADVICE r12: a hole WIDER than any fixed probe window (4 commits
    gone, a later one present) under a FRESH pointer was the blind spot
    of the 3-probe version — the name-only end-of-log confirmation must
    catch it without falling back to the slow-path replay."""
    path = str(tmp_path / "t")
    w = DeltaTableWriter(spark, path, checkpoint_interval=6)
    for b in range(12):  # v0..v11, checkpoint + pointer at v6
        w.append(
            spark.range(b * 10, b * 10 + 2).selectExpr("id", "id * 2 AS v")
        )
    for missing in (7, 8, 9, 10):
        os.remove(os.path.join(path, "_delta_log", f"{missing:020d}.json"))
    r = DeltaTableReader(spark, path)
    with pytest.raises(DeltaProtocolError, match="hole"):
        r.snapshot()
    assert r.last_snapshot_listed_log is False
    # a pinned read BELOW the hole is still legitimately servable
    assert r.read(version=6).count() == 14


def test_unreadable_existing_commit_raises(spark, tmp_path):
    """A commit that EXISTS but cannot be opened (I/O error — modeled
    as a directory squatting on the name, since root ignores chmod)
    must raise, not be treated as end-of-log."""
    path = str(tmp_path / "t")
    w = _delta(spark, path)
    w.append(spark.range(100, 104).selectExpr("id", "id * 2 AS v"))
    victim = os.path.join(path, "_delta_log", f"{1:020d}.json")
    os.remove(victim)
    os.mkdir(victim)
    with pytest.raises(DeltaProtocolError, match="unreadable"):
        DeltaTableReader(spark, path).snapshot()


def test_stale_iceberg_version_hint_reads_latest(spark, tmp_path):
    """version-hint.text is written AFTER the metadata commit, so a
    crash in that window leaves it stale — a ROUTINE state. The reader
    must probe forward to the true latest version, not silently serve
    the old snapshot the hint names."""
    path = str(tmp_path / "t")
    w = _iceberg(spark, path)
    w.append(spark.range(100, 104).selectExpr("id", "id * 2 AS v"))
    hint = os.path.join(path, "metadata", "version-hint.text")
    assert os.path.exists(
        os.path.join(path, "metadata", "v2.metadata.json")
    )
    with open(hint, "w") as fh:
        fh.write("1")  # crashed-before-hint-update state
    assert IcebergTableReader(spark, path).read().count() == 12


def test_delta_pointer_to_missing_checkpoint_reads_complete(
    spark, tmp_path
):
    """_last_checkpoint naming a checkpoint whose files don't exist
    (torn pointer write) must fall back to the LIST path and return
    complete data."""
    path = str(tmp_path / "t")
    w = _delta(spark, path)
    w.append(spark.range(100, 104).selectExpr("id", "id * 2 AS v"))
    with open(os.path.join(path, "_delta_log", "_last_checkpoint"),
              "w") as fh:
        fh.write(json.dumps({"version": 99, "size": 1}))
    assert DeltaTableReader(spark, path).read().count() == 12
