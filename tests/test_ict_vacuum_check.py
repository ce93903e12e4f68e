"""In-Commit Timestamps + vacuumProtocolCheck writer support
(PROTOCOL.md "In-Commit Timestamps", "Vacuum Protocol Check").

- Tables with the inCommitTimestamp feature AND
  delta.enableInCommitTimestamps=true get a monotonic
  commitInfo.inCommitTimestamp as the FIRST action of every commit we
  write — strictly greater than the previous commit's even against
  wall-clock skew (the feature's whole point).
- vacuumProtocolCheck (reader+writer) tables read/write/vacuum
  normally; the contract is that vacuum PROBES the writer protocol
  before deleting — a table with an unknown writer feature refuses
  vacuum with nothing deleted.

Foreign fixtures hand-authored in the test_writer_protocol_gate.py
style.
"""

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from deimos_spark.operators.delta_interop import (
    DeltaProtocolError,
    DeltaTableReader,
    DeltaTableWriter,
)


def _schema_json() -> str:
    return json.dumps(
        {
            "type": "struct",
            "fields": [
                {"name": "id", "type": "long", "nullable": True,
                 "metadata": {}},
                {"name": "v", "type": "string", "nullable": True,
                 "metadata": {}},
            ],
        }
    )


def _foreign_table(
    table: str,
    protocol: dict,
    configuration: dict | None = None,
    commit_info: dict | None = None,
) -> None:
    os.makedirs(os.path.join(table, "_delta_log"), exist_ok=True)
    rel = "part-00000-foreign.parquet"
    pq.write_table(
        pa.Table.from_pylist(
            [{"id": 1, "v": "a"}],
            schema=pa.schema([("id", pa.int64()), ("v", pa.string())]),
        ),
        os.path.join(table, rel),
    )
    actions = []
    if commit_info is not None:
        actions.append({"commitInfo": commit_info})
    actions += [
        {"protocol": protocol},
        {
            "metaData": {
                "id": "foreign-ict0",
                "format": {"provider": "parquet", "options": {}},
                "schemaString": _schema_json(),
                "partitionColumns": [],
                "configuration": configuration or {},
                "createdTime": 1,
            }
        },
        {
            "add": {
                "path": rel,
                "partitionValues": {},
                "size": os.path.getsize(os.path.join(table, rel)),
                "modificationTime": 1,
                "dataChange": True,
            }
        },
    ]
    with open(
        os.path.join(table, "_delta_log", f"{0:020d}.json"), "w"
    ) as fh:
        for a in actions:
            fh.write(json.dumps(a) + "\n")


def _commit_actions(table: str, version: int) -> list[dict]:
    with open(
        os.path.join(table, "_delta_log", f"{version:020d}.json")
    ) as fh:
        return [json.loads(line) for line in fh if line.strip()]


ICT_PROTOCOL = {
    "minReaderVersion": 1,
    "minWriterVersion": 7,
    "writerFeatures": ["inCommitTimestamp"],
}


def _df(spark, ids):
    return spark.createDataFrame(
        [(i, f"n{i}") for i in ids], "id long, v string"
    )


def test_ict_stamped_first_and_monotonic(spark, tmp_path):
    t = str(tmp_path / "t")
    _foreign_table(
        t,
        ICT_PROTOCOL,
        configuration={"delta.enableInCommitTimestamps": "true"},
        commit_info={"timestamp": 5000, "inCommitTimestamp": 5000},
    )
    w = DeltaTableWriter(spark, t)
    w.append(_df(spark, [2]))
    w.append(_df(spark, [3]))
    icts = [5000]
    for v in (1, 2):
        acts = _commit_actions(t, v)
        # spec: commitInfo must be the FIRST action when ICT enabled
        assert "commitInfo" in acts[0]
        ict = acts[0]["commitInfo"]["inCommitTimestamp"]
        assert ict > icts[-1]
        icts.append(ict)


def test_ict_beats_clock_skew(spark, tmp_path):
    """Previous commit stamped far in the future (skewed writer): our
    commit must still be strictly greater, not wall-clock."""
    t = str(tmp_path / "t")
    future = 4102444800000  # 2100-01-01 in epoch ms
    _foreign_table(
        t,
        ICT_PROTOCOL,
        configuration={"delta.enableInCommitTimestamps": "true"},
        commit_info={"timestamp": future, "inCommitTimestamp": future},
    )
    DeltaTableWriter(spark, t).append(_df(spark, [2]))
    acts = _commit_actions(t, 1)
    assert acts[0]["commitInfo"]["inCommitTimestamp"] == future + 1
    # and timestamp time travel resolves by ICT: everything is at or
    # after `future`, nothing at 2020
    r = DeltaTableReader(spark, t)
    assert r.version_at(future + 10) == 1
    with pytest.raises(DeltaProtocolError, match="no commit"):
        r.version_at(1577836800000)  # 2020-01-01


def test_ict_feature_without_property_not_stamped(spark, tmp_path):
    """Feature declared but delta.enableInCommitTimestamps unset →
    ICT is disabled; we must not invent timestamps."""
    t = str(tmp_path / "t")
    _foreign_table(t, ICT_PROTOCOL)
    DeltaTableWriter(spark, t).append(_df(spark, [2]))
    acts = _commit_actions(t, 1)
    assert "inCommitTimestamp" not in acts[0].get("commitInfo", {})


def test_vacuum_protocol_check_table_full_lifecycle(spark, tmp_path):
    t = str(tmp_path / "t")
    _foreign_table(
        t,
        {
            "minReaderVersion": 3,
            "minWriterVersion": 7,
            "readerFeatures": ["vacuumProtocolCheck"],
            "writerFeatures": ["vacuumProtocolCheck"],
        },
    )
    w = DeltaTableWriter(spark, t)
    w.append(_df(spark, [2]))
    assert DeltaTableReader(spark, t).read().count() == 2
    w.overwrite(_df(spark, [9]))
    gone = w.vacuum(retention_seconds=0.0)
    assert gone, "overwritten files should vacuum away"
    assert DeltaTableReader(spark, t).read().count() == 1


def test_vacuum_refuses_unknown_writer_feature(spark, tmp_path):
    """The check vacuumProtocolCheck exists to force: an unknown
    writer feature might track files in ways we can't see — refuse
    and delete NOTHING."""
    t = str(tmp_path / "t")
    _foreign_table(
        t,
        {
            "minReaderVersion": 1,
            "minWriterVersion": 7,
            "writerFeatures": ["icebergCompatV2"],
        },
    )
    w = DeltaTableWriter(spark, t)
    files_before = set(os.listdir(t))
    with pytest.raises(DeltaProtocolError, match="icebergCompatV2"):
        w.vacuum(retention_seconds=0.0)
    assert set(os.listdir(t)) == files_before


# ------------------------------------------------- write clustering

def test_delta_sort_by_clusters_file_stats(spark, tmp_path):
    """sort_by range-clusters data files so each add's stats
    minValues/maxValues are disjoint — what makes the protocol's
    data skipping effective for every conforming reader."""
    import random

    t = str(tmp_path / "t")
    rng = random.Random(3)
    rows = [(i, f"r{i}") for i in range(4000)]
    rng.shuffle(rows)
    df = spark.createDataFrame(rows, "id long, v string").repartition(4)
    w = DeltaTableWriter(spark, t, sort_by=("id",), sort_partitions=4)
    w.append(df)
    snap = DeltaTableReader(spark, t).snapshot()
    assert len(snap.files) > 1
    ranges = []
    for a in snap.adds_raw.values():
        st = json.loads(a["stats"])
        ranges.append((st["minValues"]["id"], st["maxValues"]["id"]))
    ranges.sort()
    for (l1, h1), (l2, h2) in zip(ranges, ranges[1:]):
        assert h1 < l2, f"file stat ranges overlap: {ranges}"
    assert DeltaTableReader(spark, t).read().count() == 4000
    with pytest.raises(DeltaProtocolError, match="sort_by"):
        DeltaTableWriter(spark, t, sort_by=("ghost",)).append(df)


def test_vacuum_allowed_on_identity_column_tables(spark, tmp_path):
    """Vacuum writes no data rows, so active enforce-at-write column
    features (identity/generated/invariants/CHECK) cannot be violated
    by it — vacuum proceeds while appends still refuse."""
    t = str(tmp_path / "t")
    os.makedirs(os.path.join(t, "_delta_log"), exist_ok=True)
    rel = "part-00000-foreign.parquet"
    pq.write_table(
        pa.Table.from_pylist(
            [{"id": 1, "v": "a"}],
            schema=pa.schema([("id", pa.int64()), ("v", pa.string())]),
        ),
        os.path.join(t, rel),
    )
    schema_json = json.dumps(
        {
            "type": "struct",
            "fields": [
                {
                    "name": "id",
                    "type": "long",
                    "nullable": True,
                    "metadata": {
                        "delta.identity.start": 1,
                        "delta.identity.step": 1,
                        "delta.identity.allowExplicitInsert": False,
                    },
                },
                {"name": "v", "type": "string", "nullable": True,
                 "metadata": {}},
            ],
        }
    )
    actions = [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 7,
                      "writerFeatures": ["identityColumns"]}},
        {"metaData": {"id": "x", "format": {"provider": "parquet",
                      "options": {}}, "schemaString": schema_json,
                      "partitionColumns": [], "configuration": {},
                      "createdTime": 1}},
        {"add": {"path": rel, "partitionValues": {},
                 "size": os.path.getsize(os.path.join(t, rel)),
                 "modificationTime": 1, "dataChange": True}},
    ]
    with open(os.path.join(t, "_delta_log", f"{0:020d}.json"), "w") as fh:
        for a in actions:
            fh.write(json.dumps(a) + "\n")
    w = DeltaTableWriter(spark, t)
    with pytest.raises(DeltaProtocolError, match="identity"):
        w.append(_df(spark, [2]))
    assert w.vacuum(retention_seconds=0.0) == []  # proceeds, no orphans


@pytest.mark.parametrize("fmt", ["classic", "v2"])
def test_ict_monotonic_survives_log_cleanup(spark, tmp_path, fmt):
    """ADVICE r9: after cleanup_log truncates the JSON commits at the
    checkpoint, {version-1}.json is gone — the monotonicity watermark
    must be recovered from _last_checkpoint's advisory
    inCommitTimestamp field, not silently reset to wall-clock (a
    backwards clock step would then emit a non-monotonic ICT)."""
    t = str(tmp_path / "t")
    future = 4102444800000  # 2100-01-01: far beyond any test wall-clock
    proto = dict(ICT_PROTOCOL)
    if fmt == "v2":
        # v2 checkpoints are a table feature: the writer only emits
        # them when the table declares it
        proto = {
            "minReaderVersion": 3,
            "minWriterVersion": 7,
            "readerFeatures": ["v2Checkpoint"],
            "writerFeatures": ["inCommitTimestamp", "v2Checkpoint"],
        }
    _foreign_table(
        t,
        proto,
        configuration={"delta.enableInCommitTimestamps": "true"},
        commit_info={"timestamp": future, "inCommitTimestamp": future},
    )
    w = DeltaTableWriter(
        spark, t, checkpoint_interval=2, checkpoint_format=fmt
    )
    w.append(_df(spark, [2]))  # v1
    w.append(_df(spark, [3]))  # v2 → checkpoint at v2
    deleted = w.cleanup_log(retention_seconds=0.0)
    assert deleted, "cleanup must have truncated the JSON tail"
    assert not os.path.exists(
        os.path.join(t, "_delta_log", f"{2:020d}.json")
    )
    # _last_checkpoint carries the watermark
    with open(os.path.join(t, "_delta_log", "_last_checkpoint")) as fh:
        lc = json.load(fh)
    assert lc["inCommitTimestamp"] > future
    # the next commit (prev JSON missing) stays strictly monotonic
    w.append(_df(spark, [4]))  # v3
    acts = _commit_actions(t, 3)
    assert acts[0]["commitInfo"]["inCommitTimestamp"] > future
