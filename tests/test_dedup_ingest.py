"""Streaming dedup-ingest (the t30 twin): per-batch increment-vs-corpus
dedup + exactly-once survivor appends. Batch-mode process_batch calls
stand in for foreachBatch invocations (the Spark contract: same body,
same batch-id on replay); one availableNow run covers the wiring."""

import pytest
from pyspark.sql import Row

from deimos_spark.streaming.dedup_ingest import DedupIngest


def _batch(spark, rows):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in rows], "doc_id long, text string"
    )


def test_batches_found_then_dedup_against_corpus(spark, tmp_path):
    ing = DedupIngest(spark, str(tmp_path / "corpus"))
    ing.process_batch(_batch(spark, [(1, "alpha"), (2, "beta")]), txn=("j", 0))
    assert ing.corpus().count() == 2
    # batch 1: one dup content, one new
    ing.process_batch(_batch(spark, [(3, "alpha"), (4, "gamma")]), txn=("j", 1))
    got = {r.doc_id: r.text for r in ing.corpus().collect()}
    assert got == {1: "alpha", 2: "beta", 4: "gamma"}  # 3 dropped


def test_within_batch_dups_keep_min_id(spark, tmp_path):
    ing = DedupIngest(spark, str(tmp_path / "corpus"))
    ing.process_batch(
        _batch(spark, [(7, "same"), (5, "same"), (6, "other")]), txn=("j", 0)
    )
    ids = sorted(r.doc_id for r in ing.corpus().collect())
    assert ids == [5, 6]  # 7 lost the in-batch tie to 5


def test_replayed_batch_is_exactly_once_noop(spark, tmp_path):
    ing = DedupIngest(spark, str(tmp_path / "corpus"))
    b0 = _batch(spark, [(1, "a"), (2, "b")])
    ing.process_batch(b0, txn=("job", 0))
    ing.process_batch(b0, txn=("job", 0))  # crash-replay
    assert ing.corpus().count() == 2
    b1 = _batch(spark, [(3, "c")])
    ing.process_batch(b1, txn=("job", 1))
    ing.process_batch(b1, txn=("job", 1))
    assert ing.corpus().count() == 3
    # content idempotence holds even WITHOUT txn: a replay's contents
    # are already in the corpus, so the t30 step drops all of them
    ing.process_batch(b1)  # no txn
    assert ing.corpus().count() == 3


def test_streaming_attach_available_now(spark, tmp_path):
    import os

    src = str(tmp_path / "in")
    os.makedirs(src)
    _batch(spark, [(1, "x"), (2, "y"), (3, "x")]).coalesce(1).write.mode(
        "overwrite"
    ).json(src)
    stream = (
        spark.readStream.schema("doc_id long, text string").json(src)
    )
    ing = DedupIngest(spark, str(tmp_path / "corpus"))
    q = ing.attach(
        stream, str(tmp_path / "ckpt"), txn_app_id="ingest"
    ).trigger(availableNow=True).start()
    q.awaitTermination(120)
    ids = sorted(r.doc_id for r in ing.corpus().collect())
    assert ids == [1, 2]  # 3 is a within-batch dup of 1


def test_null_contents_are_not_dups_of_each_other(spark, tmp_path):
    """NULL equals nothing (the same rule the corpus step applies):
    two NULL-text rows in one batch both survive, and NULL rows pass
    the corpus check on every later batch too."""
    ing = DedupIngest(spark, str(tmp_path / "corpus"))
    ing.process_batch(
        _batch(spark, [(1, None), (2, None), (3, "real")]), txn=("j", 0)
    )
    assert sorted(r.doc_id for r in ing.corpus().collect()) == [1, 2, 3]
    ing.process_batch(_batch(spark, [(4, None), (5, "real")]), txn=("j", 1))
    assert sorted(r.doc_id for r in ing.corpus().collect()) == [1, 2, 3, 4]
