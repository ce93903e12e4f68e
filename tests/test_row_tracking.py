"""Delta Row Tracking + Domain Metadata writer support (PROTOCOL.md
"Row Tracking", "Domain Metadata").

Contract under test:
- Tables declaring the rowTracking writer feature accept our writes;
  every committed `add` carries a fresh `baseRowId` range strictly
  above the `delta.rowTracking` domain's rowIdHighWaterMark and
  `defaultRowCommitVersion` = the commit's version; the domain action
  advances the watermark past every assigned id.
- `remove` actions carry the removed add's row-tracking fields.
- DV merges re-add the SAME file: its baseRowId is preserved (the
  spec's rule for unrewritten files).
- `delta.enableRowTracking=true` tables refuse merge/optimize (copied
  rows would need materialized-column preservation we don't produce)
  but keep append/overwrite.
- Domain metadata — ours and UNKNOWN foreign domains, including
  removed tombstones — survives checkpoint truncation in BOTH
  checkpoint formats.

Foreign fixtures are hand-authored (pyarrow data files + spec-exact
JSON commits) in the style of test_writer_protocol_gate.py.
"""

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from deimos_spark.operators.delta_interop import (
    DeltaKeyedTable,
    DeltaProtocolError,
    DeltaTableReader,
    DeltaTableWriter,
)

PROTOCOL_RT = {
    "minReaderVersion": 1,
    "minWriterVersion": 7,
    "writerFeatures": ["rowTracking", "domainMetadata"],
}


def _schema_json() -> str:
    return json.dumps(
        {
            "type": "struct",
            "fields": [
                {
                    "name": "id",
                    "type": "long",
                    "nullable": True,
                    "metadata": {},
                },
                {
                    "name": "v",
                    "type": "string",
                    "nullable": True,
                    "metadata": {},
                },
            ],
        }
    )


def _foreign_rt_table(
    table: str,
    configuration: dict | None = None,
    hwm: int | None = 9,
    extra_actions: list | None = None,
    n_rows: int = 3,
) -> None:
    """Commit 0 of a row-tracking table some OTHER engine wrote: one
    data file whose add carries baseRowId 0..n_rows-1 and (when hwm is
    not None) the delta.rowTracking domain watermark."""
    os.makedirs(os.path.join(table, "_delta_log"), exist_ok=True)
    rel = "part-00000-foreign.parquet"
    pq.write_table(
        pa.Table.from_pylist(
            [{"id": i, "v": f"r{i}"} for i in range(n_rows)],
            schema=pa.schema([("id", pa.int64()), ("v", pa.string())]),
        ),
        os.path.join(table, rel),
    )
    actions = [
        {"protocol": PROTOCOL_RT},
        {
            "metaData": {
                "id": "foreign-rt00",
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
                "baseRowId": 0,
                "defaultRowCommitVersion": 0,
                "stats": json.dumps({"numRecords": n_rows}),
            }
        },
    ]
    if hwm is not None:
        actions.append(
            {
                "domainMetadata": {
                    "domain": "delta.rowTracking",
                    "configuration": json.dumps(
                        {"rowIdHighWaterMark": hwm}
                    ),
                    "removed": False,
                }
            }
        )
    actions.extend(extra_actions or [])
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


def _hwm(actions: list[dict]) -> int | None:
    for a in actions:
        dm = a.get("domainMetadata")
        if dm and dm.get("domain") == "delta.rowTracking":
            return json.loads(dm["configuration"])["rowIdHighWaterMark"]
    return None


def _df(spark, ids):
    return spark.createDataFrame(
        [(i, f"n{i}") for i in ids], "id long, v string"
    )


# ---------------------------------------------------------------- append

def test_append_assigns_fresh_ids_above_watermark(spark, tmp_path):
    t = str(tmp_path / "t")
    _foreign_rt_table(t, hwm=9)
    DeltaTableWriter(spark, t).append(_df(spark, [100, 101]))
    acts = _commit_actions(t, 1)
    adds = [a["add"] for a in acts if "add" in a]
    assert adds, "append committed no add"
    total = 0
    for a in adds:
        assert a["baseRowId"] >= 10, "fresh ids must clear the watermark"
        assert a["defaultRowCommitVersion"] == 1
        total += json.loads(a["stats"])["numRecords"]
    # watermark advanced past every assigned id
    assert _hwm(acts) == 9 + total
    # rows all present
    assert DeltaTableReader(spark, t).read().count() == 5


def test_append_without_prior_domain_derives_floor_from_adds(
    spark, tmp_path
):
    """A table that declares rowTracking but carries no watermark
    domain (a prior writer's spec violation): fresh ids must clear
    the EXISTING adds' assigned ranges — starting at 0 would collide
    with the foreign file's rows 0..n-1."""
    t = str(tmp_path / "t")
    _foreign_rt_table(t, hwm=None, n_rows=2)  # foreign add: ids 0..1
    DeltaTableWriter(spark, t).append(_df(spark, [100]))
    acts = _commit_actions(t, 1)
    adds = [a["add"] for a in acts if "add" in a]
    assert min(a["baseRowId"] for a in adds) == 2
    assert _hwm(acts) is not None and _hwm(acts) >= 2


def test_sequential_appends_never_overlap(spark, tmp_path):
    t = str(tmp_path / "t")
    _foreign_rt_table(t, hwm=9)
    w = DeltaTableWriter(spark, t)
    w.append(_df(spark, [100, 101]))
    w.append(_df(spark, [200, 201, 202]))
    ranges = []
    for v in (1, 2):
        for a in _commit_actions(t, v):
            if "add" in a:
                n = json.loads(a["add"]["stats"])["numRecords"]
                b = a["add"]["baseRowId"]
                ranges.append((b, b + n - 1))
    ranges.append((0, 2))  # the foreign file's ids
    ranges.sort()
    for (s1, e1), (s2, e2) in zip(ranges, ranges[1:]):
        assert e1 < s2, f"row id ranges overlap: {ranges}"


# ----------------------------------------------------------------- merge

def test_merge_removes_carry_row_tracking_fields(spark, tmp_path):
    t = str(tmp_path / "t")
    _foreign_rt_table(t, hwm=9)
    kt = DeltaKeyedTable(spark, t, ["id"])
    kt.merge(upserts=_df(spark, [1]))
    acts = _commit_actions(t, 1)
    removes = [a["remove"] for a in acts if "remove" in a]
    assert removes and removes[0]["baseRowId"] == 0
    assert removes[0]["defaultRowCommitVersion"] == 0
    adds = [a["add"] for a in acts if "add" in a]
    assert all(a["baseRowId"] >= 10 for a in adds)
    assert _hwm(acts) is not None


def test_dv_merge_preserves_base_row_id_of_readded_file(spark, tmp_path):
    t = str(tmp_path / "t")
    _foreign_rt_table(t, hwm=9)
    kt = DeltaKeyedTable(spark, t, ["id"], use_dvs=True)
    kt.merge(delete_keys=spark.createDataFrame([(1,)], "id long"))
    acts = _commit_actions(t, 1)
    dv_adds = [
        a["add"]
        for a in acts
        if "add" in a and a["add"].get("deletionVector")
    ]
    assert dv_adds, "DV merge should re-add the touched file"
    # the SAME file keeps its original ids — the spec's preservation
    # rule for unrewritten files
    assert dv_adds[0]["baseRowId"] == 0
    assert dv_adds[0]["defaultRowCommitVersion"] == 0
    assert DeltaTableReader(spark, t).read().count() == 2


# --------------------------------------------------- enableRowTracking

ENABLED_CONF = {
    "delta.enableRowTracking": "true",
    "delta.rowTracking.materializedRowIdColumnName": "_row_id_mat",
    "delta.rowTracking.materializedRowCommitVersionColumnName": "_rcv_mat",
}


def _ids(spark, t):
    return {
        r["id"]: (r["__rt_row_id"], r["__rt_rcv"])
        for r in DeltaTableReader(spark, t)
        .read(with_row_ids=True)
        .collect()
    }


def test_enabled_table_merge_preserves_survivor_ids(spark, tmp_path):
    """VERDICT r9 #4: delta.enableRowTracking tables accept rewrite
    merges — copied (surviving) rows keep their row id AND commit
    version via the configured materialized columns; upserted rows are
    logically new (delete+insert) and get fresh ids above the
    watermark."""
    t = str(tmp_path / "t")
    _foreign_rt_table(t, configuration=ENABLED_CONF, hwm=9)  # ids 0,1,2
    kt = DeltaKeyedTable(spark, t, ["id"])
    kt.merge(
        upserts=_df(spark, [1]),  # update id=1
        delete_keys=spark.createDataFrame([(2,)], "id long"),
    )
    got = _ids(spark, t)
    assert set(got) == {0, 1}
    assert got[0] == (0, 0), "survivor must keep row id + commit version"
    rid1, rcv1 = got[1]
    assert rid1 >= 10 and rcv1 == 1, "updated row is new: fresh id"
    # the new files PHYSICALLY carry the materialized columns
    import pyarrow.parquet as _pq

    acts = _commit_actions(t, 1)
    add_paths = [a["add"]["path"] for a in acts if "add" in a]
    assert add_paths
    cols = set()
    for p in add_paths:
        cols |= set(_pq.read_schema(os.path.join(t, p)).names)
    assert {"_row_id_mat", "_rcv_mat"} <= cols
    # watermark advanced past every assigned id
    assert _hwm(acts) >= rid1


def test_enabled_table_optimize_preserves_all_ids(spark, tmp_path):
    t = str(tmp_path / "t")
    _foreign_rt_table(t, configuration=ENABLED_CONF, hwm=9)
    kt = DeltaKeyedTable(spark, t, ["id"])
    kt.merge(upserts=_df(spark, [1, 100]))
    before = _ids(spark, t)
    DeltaTableWriter(spark, t).optimize()
    after = _ids(spark, t)
    assert after == before, "OPTIMIZE must not move any row id"
    # and the data files were actually rewritten (fresh file set)
    acts = _commit_actions(t, 2)
    assert any("add" in a for a in acts)
    assert all(
        not a["add"]["dataChange"] for a in acts if "add" in a
    )


def test_enabled_table_without_mat_cols_mints_them(spark, tmp_path):
    """An enabled table whose enabling writer never recorded the
    materialized column names: the first rewrite mints them and commits
    the updated metaData, so ids still survive."""
    t = str(tmp_path / "t")
    _foreign_rt_table(
        t, configuration={"delta.enableRowTracking": "true"}, hwm=9
    )
    kt = DeltaKeyedTable(spark, t, ["id"])
    kt.merge(delete_keys=spark.createDataFrame([(2,)], "id long"))
    got = _ids(spark, t)
    assert got[0] == (0, 0) and got[1] == (1, 0)
    snap = DeltaTableReader(spark, t).snapshot()
    conf = (snap.meta_raw or {}).get("configuration") or {}
    assert conf.get("delta.rowTracking.materializedRowIdColumnName")
    assert conf.get(
        "delta.rowTracking.materializedRowCommitVersionColumnName"
    )
    # stability holds through a subsequent optimize too
    DeltaTableWriter(spark, t).optimize()
    assert _ids(spark, t) == got


def test_enabled_table_dv_merge_allowed_and_stable(spark, tmp_path):
    """DV-mode merge never copies rows — enabled tables take it with no
    materialization: the re-added file keeps its baseRowId."""
    t = str(tmp_path / "t")
    _foreign_rt_table(t, configuration=ENABLED_CONF, hwm=9)
    kt = DeltaKeyedTable(spark, t, ["id"], use_dvs=True)
    kt.merge(delete_keys=spark.createDataFrame([(1,)], "id long"))
    got = _ids(spark, t)
    assert got == {0: (0, 0), 2: (2, 0)}
    # the DV protocol upgrade must UNION features, not clobber them —
    # dropping rowTracking here would stop id assignment on appends
    proto = DeltaTableReader(spark, t).snapshot().protocol_raw
    wf = set(proto.get("writerFeatures") or [])
    assert {"rowTracking", "domainMetadata", "deletionVectors"} <= wf
    # appends stay fresh-id as before
    DeltaTableWriter(spark, t).append(_df(spark, [100]))
    assert _ids(spark, t)[100][0] >= 10


# ------------------------------------------------------- checkpointing

@pytest.mark.parametrize("fmt", ["classic", "v2"])
def test_domains_and_row_ids_survive_checkpoint(spark, tmp_path, fmt):
    """After a checkpoint + truncated-log replay, the watermark domain,
    an unknown foreign domain (incl. a removed tombstone), and each
    add's baseRowId must all survive — losing any of them corrupts a
    foreign engine's row tracking."""
    t = str(tmp_path / "t")
    proto = dict(PROTOCOL_RT)
    if fmt == "v2":
        proto = {
            "minReaderVersion": 3,
            "minWriterVersion": 7,
            "readerFeatures": ["v2Checkpoint"],
            "writerFeatures": [
                "rowTracking", "domainMetadata", "v2Checkpoint",
            ],
        }
    _foreign_rt_table(
        t,
        hwm=9,
        extra_actions=[
            {
                "domainMetadata": {
                    "domain": "foreign.engine.domain",
                    "configuration": json.dumps({"opaque": True}),
                    "removed": False,
                }
            },
            {
                "domainMetadata": {
                    "domain": "foreign.engine.gone",
                    "configuration": "{}",
                    "removed": True,
                }
            },
        ],
    )
    # patch protocol for the v2 variant
    if fmt == "v2":
        p = os.path.join(t, "_delta_log", f"{0:020d}.json")
        lines = [json.loads(x) for x in open(p) if x.strip()]
        lines[0] = {"protocol": proto}
        with open(p, "w") as fh:
            for a in lines:
                fh.write(json.dumps(a) + "\n")

    w = DeltaTableWriter(
        spark, t, checkpoint_interval=2, checkpoint_format=fmt
    )
    w.append(_df(spark, [100]))
    w.append(_df(spark, [101]))  # version 2 → checkpoint fires
    ckpts = [
        n
        for n in os.listdir(os.path.join(t, "_delta_log"))
        if ".checkpoint." in n or n.endswith(".checkpoint.parquet")
    ]
    assert ckpts, "checkpoint did not fire"
    # simulate log truncation: replay must come from the checkpoint
    for v in (0, 1, 2):
        p = os.path.join(t, "_delta_log", f"{v:020d}.json")
        if os.path.exists(p):
            os.unlink(p)
    r = DeltaTableReader(spark, t)
    snap = r.snapshot()
    assert "delta.rowTracking" in snap.domains
    hwm = json.loads(
        snap.domains["delta.rowTracking"]["configuration"]
    )["rowIdHighWaterMark"]
    assert hwm >= 10
    assert "foreign.engine.domain" in snap.domains
    gone = snap.domains["foreign.engine.gone"]
    assert bool(gone.get("removed")) is True
    base_ids = sorted(
        a.get("baseRowId")
        for a in snap.adds_raw.values()
        if a.get("baseRowId") is not None
    )
    assert 0 in base_ids and len(base_ids) == len(snap.adds_raw)
    # and the NEXT write keeps assigning above the recovered watermark
    w.append(_df(spark, [102]))
    acts = _commit_actions(t, 3)
    adds = [a["add"] for a in acts if "add" in a]
    assert all(a["baseRowId"] > hwm for a in adds)


def test_non_tracking_tables_unaffected(spark, tmp_path):
    """No rowTracking feature → no row-tracking fields, no domain
    actions; the patch is a structural no-op."""
    t = str(tmp_path / "t")
    w = DeltaTableWriter(spark, t)
    w.append(_df(spark, [1, 2]))
    w.append(_df(spark, [3]))
    for v in (0, 1):
        for a in _commit_actions(t, v):
            if "add" in a:
                assert "baseRowId" not in a["add"]
            assert "domainMetadata" not in a


def test_pruned_snapshot_keeps_domains(spark, tmp_path):
    """ADVICE r9 (medium): partition/stats-pruned snapshots must carry
    domainMetadata — _merge_dv commits against a pruned snapshot, and a
    snapshot that silently dropped delta.rowTracking would let the
    committed rowIdHighWaterMark regress below another writer's
    advanced watermark (spec violation, row-id reuse)."""
    t = str(tmp_path / "t")
    os.makedirs(os.path.join(t, "_delta_log"), exist_ok=True)
    schema = json.dumps(
        {
            "type": "struct",
            "fields": [
                {"name": "id", "type": "long", "nullable": True,
                 "metadata": {}},
                {"name": "p", "type": "string", "nullable": True,
                 "metadata": {}},
            ],
        }
    )
    adds = []
    for part in ("x", "y"):
        rel = f"p={part}/f.parquet"
        os.makedirs(os.path.join(t, f"p={part}"), exist_ok=True)
        pq.write_table(
            pa.Table.from_pylist(
                [{"id": 1}], schema=pa.schema([("id", pa.int64())])
            ),
            os.path.join(t, rel),
        )
        adds.append(
            {
                "add": {
                    "path": rel,
                    "partitionValues": {"p": part},
                    "size": os.path.getsize(os.path.join(t, rel)),
                    "modificationTime": 1,
                    "dataChange": True,
                    "stats": json.dumps(
                        {"numRecords": 1, "minValues": {"id": 1},
                         "maxValues": {"id": 1}}
                    ),
                }
            }
        )
    actions = [
        {"protocol": PROTOCOL_RT},
        {
            "metaData": {
                "id": "foreign-rt01",
                "format": {"provider": "parquet", "options": {}},
                "schemaString": schema,
                "partitionColumns": ["p"],
                "configuration": {},
                "createdTime": 1,
            }
        },
        *adds,
        {
            "domainMetadata": {
                "domain": "delta.rowTracking",
                "configuration": json.dumps({"rowIdHighWaterMark": 41}),
                "removed": False,
            }
        },
        {
            "domainMetadata": {
                "domain": "foreign.domain",
                "configuration": "{}",
                "removed": False,
            }
        },
    ]
    with open(os.path.join(t, "_delta_log", f"{0:020d}.json"), "w") as fh:
        for a in actions:
            fh.write(json.dumps(a) + "\n")

    r = DeltaTableReader(spark, t)
    full = r.snapshot()
    assert set(full.domains) == {"delta.rowTracking", "foreign.domain"}
    part_pruned = r.snapshot(partition_filter={"p": "x"})
    assert len(part_pruned.files) == 1
    assert part_pruned.domains == full.domains
    assert part_pruned.txns == full.txns
    stats_pruned = r.snapshot(stats_filter={"id": (5, None)})
    assert len(stats_pruned.files) == 0
    assert stats_pruned.domains == full.domains
