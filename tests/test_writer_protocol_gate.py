"""Writer-protocol gate (VERDICT r8 #1): the spec-required mirror of
the reader gate. PROTOCOL.md requires a writer to refuse any table
whose minWriterVersion/writerFeatures it does not implement — without
the gate, appending to a foreign table declaring rowTracking /
identityColumns / generatedColumns silently breaks those invariants
for every other engine, and delta.appendOnly tables accept deletes.

Fixtures are hand-authored foreign tables (pyarrow data files +
spec-exact JSON commits), in the style of test_foreign_delta_shapes.py:
nothing here was produced by this repo's writer.
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


def _schema_json(field_meta: dict | None = None) -> str:
    meta = field_meta or {}
    return json.dumps(
        {
            "type": "struct",
            "fields": [
                {
                    "name": "id",
                    "type": "long",
                    "nullable": True,
                    "metadata": meta.get("id", {}),
                },
                {
                    "name": "v",
                    "type": "string",
                    "nullable": True,
                    "metadata": meta.get("v", {}),
                },
            ],
        }
    )


def _foreign_table(
    table: str,
    protocol: dict,
    configuration: dict | None = None,
    field_meta: dict | None = None,
    partition_columns: list | None = None,
) -> None:
    """Commit 0 of a table some OTHER engine wrote: protocol + metaData
    + one pyarrow data file."""
    os.makedirs(os.path.join(table, "_delta_log"), exist_ok=True)
    rel = "part-00000-foreign.parquet"
    pq.write_table(
        pa.Table.from_pylist(
            [{"id": 1, "v": "a"}],
            schema=pa.schema([("id", pa.int64()), ("v", pa.string())]),
        ),
        os.path.join(table, rel),
    )
    actions = [
        {"protocol": protocol},
        {
            "metaData": {
                "id": "foreign-0000",
                "format": {"provider": "parquet", "options": {}},
                "schemaString": _schema_json(field_meta),
                "partitionColumns": partition_columns or [],
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


def _df(spark):
    return spark.createDataFrame([(9, "z")], "id long, v string")


def _keys(spark):
    return spark.createDataFrame([(1,)], "id long")


def test_unknown_writer_feature_refuses_all_writes(spark, tmp_path):
    """icebergCompatV2 is a write-time invariant we don't maintain:
    every write path must refuse, and the table must be bit-identical
    after. (rowTracking moved to the supported set in round 9 — see
    tests/test_row_tracking.py.)"""
    t = str(tmp_path / "icebergcompat")
    _foreign_table(
        t,
        {
            "minReaderVersion": 1,
            "minWriterVersion": 7,
            "writerFeatures": ["icebergCompatV2"],
        },
    )
    before = open(os.path.join(t, "_delta_log", f"{0:020d}.json")).read()
    w = DeltaTableWriter(spark, t)
    with pytest.raises(DeltaProtocolError, match="icebergCompatV2"):
        w.append(_df(spark))
    with pytest.raises(DeltaProtocolError, match="icebergCompatV2"):
        w.overwrite(_df(spark))
    with pytest.raises(DeltaProtocolError, match="icebergCompatV2"):
        w.optimize()
    kt = DeltaKeyedTable(spark, t, ["id"])
    with pytest.raises(DeltaProtocolError, match="icebergCompatV2"):
        kt.merge(upserts=_df(spark))
    kt_dv = DeltaKeyedTable(spark, t, ["id"], use_dvs=True)
    with pytest.raises(DeltaProtocolError, match="icebergCompatV2"):
        kt_dv.merge(delete_keys=_keys(spark))
    # log untouched, no stray version-1 commit, no orphan data commits
    assert (
        open(os.path.join(t, "_delta_log", f"{0:020d}.json")).read()
        == before
    )
    assert not os.path.exists(
        os.path.join(t, "_delta_log", f"{1:020d}.json")
    )


def test_min_writer_version_above_7_refuses(spark, tmp_path):
    t = str(tmp_path / "mwv8")
    _foreign_table(t, {"minReaderVersion": 1, "minWriterVersion": 8})
    with pytest.raises(DeltaProtocolError, match="minWriterVersion 8"):
        DeltaTableWriter(spark, t).append(_df(spark))


def test_active_invariant_refuses(spark, tmp_path):
    """Legacy v2 implies the invariants feature; it only blocks writes
    when a column actually DECLARES one (we don't enforce it)."""
    t = str(tmp_path / "invariants")
    _foreign_table(
        t,
        {"minReaderVersion": 1, "minWriterVersion": 2},
        field_meta={
            "v": {
                "delta.invariants": json.dumps(
                    {"expression": {"expression": "v IS NOT NULL"}}
                )
            }
        },
    )
    with pytest.raises(DeltaProtocolError, match="invariant"):
        DeltaTableWriter(spark, t).append(_df(spark))


def test_check_constraint_refuses(spark, tmp_path):
    """CHECK constraints live in table configuration; active constraints
    refuse even though legacy v3 is otherwise acceptable."""
    t = str(tmp_path / "checks")
    _foreign_table(
        t,
        {"minReaderVersion": 1, "minWriterVersion": 3},
        configuration={"delta.constraints.positive_id": "id > 0"},
    )
    with pytest.raises(DeltaProtocolError, match="positive_id"):
        DeltaTableWriter(spark, t).append(_df(spark))


def test_generated_and_identity_columns_refuse(spark, tmp_path):
    t = str(tmp_path / "gencol")
    _foreign_table(
        t,
        {"minReaderVersion": 1, "minWriterVersion": 4},
        field_meta={"v": {"delta.generationExpression": "CAST(id AS STRING)"}},
    )
    with pytest.raises(DeltaProtocolError, match="generated column"):
        DeltaTableWriter(spark, t).append(_df(spark))

    t2 = str(tmp_path / "identcol")
    _foreign_table(
        t2,
        {"minReaderVersion": 1, "minWriterVersion": 6},
        field_meta={
            "id": {
                "delta.identity.start": 1,
                "delta.identity.step": 1,
                "delta.identity.allowExplicitInsert": False,
            }
        },
    )
    with pytest.raises(DeltaProtocolError, match="identity column"):
        DeltaTableWriter(spark, t2).append(_df(spark))


def test_append_only_allows_append_refuses_deletes(spark, tmp_path):
    """delta.appendOnly: append passes, overwrite/merge (logical
    deletes) refuse — in rewrite AND DV modes."""
    t = str(tmp_path / "appendonly")
    _foreign_table(
        t,
        {"minReaderVersion": 1, "minWriterVersion": 2},
        configuration={"delta.appendOnly": "true"},
    )
    w = DeltaTableWriter(spark, t)
    w.append(_df(spark))  # allowed
    assert sorted(
        (r["id"], r["v"])
        for r in DeltaTableReader(spark, t).read().collect()
    ) == [(1, "a"), (9, "z")]
    with pytest.raises(DeltaProtocolError, match="appendOnly"):
        w.overwrite(_df(spark))
    with pytest.raises(DeltaProtocolError, match="appendOnly"):
        DeltaKeyedTable(spark, t, ["id"]).merge(delete_keys=_keys(spark))
    with pytest.raises(DeltaProtocolError, match="appendOnly"):
        DeltaKeyedTable(spark, t, ["id"], use_dvs=True).merge(
            delete_keys=_keys(spark)
        )
    # OPTIMIZE is the spec's explicit appendOnly exception
    # (dataChange=false removes): must still commit
    w.optimize()
    assert sorted(
        (r["id"], r["v"])
        for r in DeltaTableReader(spark, t).read().collect()
    ) == [(1, "a"), (9, "z")]


def test_column_mapped_table_passes_the_gate(spark, tmp_path):
    """Mapped tables are WRITABLE since round 9's tail (files land
    physical names + field ids — full write-path coverage in
    tests/test_mapped_writes.py); the gate itself must pass for every
    operation. (This fixture's data file is intentionally NOT read —
    its columns are logical-named, which a real mapped table never
    has.)"""
    from deimos_spark.operators.delta_interop import (
        check_writer_protocol,
    )

    t = str(tmp_path / "mapped")
    _foreign_table(
        t,
        {
            "minReaderVersion": 2,
            "minWriterVersion": 5,
        },
        configuration={"delta.columnMapping.mode": "name"},
        field_meta={
            "id": {
                "delta.columnMapping.id": 1,
                "delta.columnMapping.physicalName": "col-aaa",
            },
            "v": {
                "delta.columnMapping.id": 2,
                "delta.columnMapping.physicalName": "col-bbb",
            },
        },
    )
    snap = DeltaTableReader(spark, t).snapshot(_meta_only=True)
    for op in ("append", "overwrite", "merge", "optimize", "vacuum"):
        check_writer_protocol(snap, op)  # must not raise


def test_inert_legacy_features_still_write(spark, tmp_path):
    """Control: legacy v4 implies invariants/checkConstraints/
    generatedColumns/changeDataFeed — with none ACTIVE (and CDF off),
    appends proceed. The gate refuses active use, not declarations."""
    t = str(tmp_path / "inert")
    _foreign_table(t, {"minReaderVersion": 1, "minWriterVersion": 4})
    DeltaTableWriter(spark, t).append(_df(spark))
    assert DeltaTableReader(spark, t).read().count() == 2


def test_foreign_cdf_table_merge_emits_cdc(spark, tmp_path):
    """A table declaring delta.enableChangeDataFeed obliges EVERY
    writer to emit cdc files on remove-carrying commits — a keyed merge
    constructed with enable_cdf=False must still honor it, and the
    plain writer's overwrite (which can't emit cdc) must refuse."""
    t = str(tmp_path / "foreigncdf")
    _foreign_table(
        t,
        {
            "minReaderVersion": 1,
            "minWriterVersion": 7,
            "writerFeatures": ["changeDataFeed"],
        },
        configuration={"delta.enableChangeDataFeed": "true"},
    )
    kt = DeltaKeyedTable(spark, t, ["id"])  # note: enable_cdf=False
    kt.merge(
        upserts=spark.createDataFrame([(1, "A1")], "id long, v string")
    )
    feed = DeltaTableReader(spark, t).read_changes(1, 1)
    assert sorted(
        (r["id"], r["v"], r["_change_type"]) for r in feed.collect()
    ) == [(1, "A1", "update_postimage"), (1, "a", "update_preimage")]

    with pytest.raises(DeltaProtocolError, match="CDC files"):
        DeltaTableWriter(spark, t).overwrite(_df(spark))


@pytest.mark.parametrize("mwv", [0, -3, "two", None, 2.5])
def test_invalid_min_writer_version_refuses_cleanly(spark, tmp_path, mwv):
    """ADVICE r9: a corrupt/foreign log with minWriterVersion 0,
    negative, or non-int must refuse with DeltaProtocolError, not crash
    with KeyError/TypeError."""
    t = str(tmp_path / "bad_mwv")
    _foreign_table(t, {"minReaderVersion": 1, "minWriterVersion": mwv})
    with pytest.raises(DeltaProtocolError, match="minWriterVersion"):
        DeltaTableWriter(spark, t).append(_df(spark))
    assert not os.path.exists(
        os.path.join(t, "_delta_log", f"{1:020d}.json")
    )
