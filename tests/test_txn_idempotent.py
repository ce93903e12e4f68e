"""Idempotent writes via the Delta `txn` action (PROTOCOL.md
"Transaction Identifiers"; VERDICT r8 item #6): a streaming sink passes
(app_id, micro-batch id) and a crash-replayed batch becomes a silent
no-op — the exactly-once half the at-least-once offset story stops
short of. Covered: rewrite-mode merge, DV-mode merge, plain append,
watermark survival across classic and v2 checkpoints (including log
truncation), and multi-app independence.

Reference semantics: the reference delegates exactly-once to DB
transactions per batch (behavior from batch_consumption.rb — behavior
only); on a lakehouse table the protocol's txn action is the native
equivalent.
"""

import json
import os

import pytest

from deimos_spark.operators.delta_interop import (
    DeltaKeyedTable,
    DeltaTableReader,
    DeltaTableWriter,
)

SCHEMA = "id bigint, v string"


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _state(spark, path):
    return {
        r.id: r.v for r in DeltaTableReader(spark, path).read().collect()
    }


def _versions(path):
    log = os.path.join(path, "_delta_log")
    return sorted(
        int(n[:-5])
        for n in os.listdir(log)
        if n.endswith(".json") and n[:-5].isdigit()
    )


@pytest.mark.parametrize("use_dvs", [False, True], ids=["rewrite", "dv"])
def test_replayed_batch_is_noop(spark, tmp_path, use_dvs):
    """foreachBatch crash-replay: batch 0 commits, the 'restarted job'
    re-runs batch 0 (no-op), then batch 1 applies."""
    path = str(tmp_path / "t")
    t = DeltaKeyedTable(spark, path, ["id"], schema=SCHEMA, use_dvs=use_dvs)

    t.merge(upserts=_df(spark, [(1, "a"), (2, "b")]), txn=("job", 0))
    v_after_b0 = _versions(path)[-1]

    # duplicated micro-batch: same app, same version → silent no-op
    t.merge(upserts=_df(spark, [(1, "a"), (2, "b")]), txn=("job", 0))
    assert _versions(path)[-1] == v_after_b0  # no new commit
    assert _state(spark, path) == {1: "a", 2: "b"}

    # even a DIFFERENT payload at the same version is skipped (the
    # watermark, not the content, decides)
    t.merge(upserts=_df(spark, [(1, "POISON")]), txn=("job", 0))
    assert _state(spark, path) == {1: "a", 2: "b"}

    t.merge(upserts=_df(spark, [(2, "b2"), (3, "c")]), txn=("job", 1))
    assert _state(spark, path) == {1: "a", 2: "b2", 3: "c"}
    # and replay of batch 1 after more progress is also a no-op
    t.merge(upserts=_df(spark, [(2, "XX")]), txn=("job", 1))
    assert _state(spark, path) == {1: "a", 2: "b2", 3: "c"}


@pytest.mark.parametrize("use_dvs", [False, True], ids=["rewrite", "dv"])
def test_delete_batches_idempotent(spark, tmp_path, use_dvs):
    path = str(tmp_path / "t")
    t = DeltaKeyedTable(spark, path, ["id"], schema=SCHEMA, use_dvs=use_dvs)
    t.merge(upserts=_df(spark, [(1, "a"), (2, "b")]), txn=("job", 0))
    t.merge(delete_keys=_df(spark, [(1, "x")]).select("id"), txn=("job", 1))
    assert _state(spark, path) == {2: "b"}
    n = len(_versions(path))
    t.merge(delete_keys=_df(spark, [(1, "x")]).select("id"), txn=("job", 1))
    assert _state(spark, path) == {2: "b"}
    assert len(_versions(path)) == n


def test_append_idempotent(spark, tmp_path):
    path = str(tmp_path / "t")
    w = DeltaTableWriter(spark, path, schema=SCHEMA)
    w.append(_df(spark, [(1, "a")]), txn=("ingest", 0))
    w.append(_df(spark, [(1, "a")]), txn=("ingest", 0))  # replay
    w.append(_df(spark, [(2, "b")]), txn=("ingest", 1))
    rows = DeltaTableReader(spark, path).read().collect()
    assert sorted((r.id, r.v) for r in rows) == [(1, "a"), (2, "b")]


def test_apps_independent(spark, tmp_path):
    path = str(tmp_path / "t")
    t = DeltaKeyedTable(spark, path, ["id"], schema=SCHEMA)
    t.merge(upserts=_df(spark, [(1, "a")]), txn=("app_a", 5))
    # a DIFFERENT app at version 5 must still apply
    t.merge(upserts=_df(spark, [(2, "b")]), txn=("app_b", 5))
    assert _state(spark, path) == {1: "a", 2: "b"}
    r = DeltaTableReader(spark, path)
    assert r.txn_version("app_a") == 5
    assert r.txn_version("app_b") == 5
    assert r.txn_version("nobody") is None


def test_untxn_writes_unaffected(spark, tmp_path):
    """merge() without txn keeps pre-existing behavior byte-for-byte:
    no txn actions in the log."""
    path = str(tmp_path / "t")
    t = DeltaKeyedTable(spark, path, ["id"], schema=SCHEMA)
    t.merge(upserts=_df(spark, [(1, "a")]))
    t.merge(upserts=_df(spark, [(1, "a2")]))
    log = os.path.join(path, "_delta_log")
    for n in sorted(os.listdir(log)):
        if n.endswith(".json"):
            assert '"txn"' not in open(os.path.join(log, n)).read()
    assert _state(spark, path) == {1: "a2"}


@pytest.mark.parametrize("fmt", ["classic", "v2"])
def test_watermark_survives_checkpoint_and_log_truncation(
    spark, tmp_path, fmt
):
    """Spec: checkpoints must carry the latest txn per appId. Proven
    the hard way — after the checkpoint, the JSON commits at or below
    it are DELETED (legal log truncation); the watermark must still
    gate replays."""
    path = str(tmp_path / "t")
    w = DeltaTableWriter(
        spark, path, schema=SCHEMA, checkpoint_interval=4,
        checkpoint_format=fmt,
    )
    t = DeltaKeyedTable(spark, path, ["id"], schema=SCHEMA)
    t.writer = w
    for b in range(5):  # commits v0..v4 → checkpoint at v4
        t.merge(upserts=_df(spark, [(b, f"v{b}")]), txn=("job", b))

    log = os.path.join(path, "_delta_log")
    lc = json.load(open(os.path.join(log, "_last_checkpoint")))
    assert lc["version"] == 4
    for v in range(5):  # truncate the replayed tail
        os.unlink(os.path.join(log, f"{v:020d}.json"))

    r = DeltaTableReader(spark, path)
    assert r.txn_version("job") == 4
    # replay of an old batch: still a no-op post-truncation
    t.merge(upserts=_df(spark, [(0, "POISON")]), txn=("job", 2))
    assert _state(spark, path)[0] == "v0"
    # fresh batch applies
    t.merge(upserts=_df(spark, [(9, "new")]), txn=("job", 5))
    assert _state(spark, path)[9] == "new"
