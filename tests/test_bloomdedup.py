"""t30 Bloom-prefiltered incremental dedup: exactness under every bitmap
regime (well-sized, saturated, empty), null/dup edge cases, and the plan
properties the 100-TB argument rests on (no corpus-side sort-merge join,
broadcast-only confirm)."""

import random

import pytest
from pyspark.sql import functions as F

from deimos_spark.operators import bloomdedup


def _ref_new_ids(spark, corpus, inc):
    """Plain anti-join reference (the semantics t30 must reproduce)."""
    hashes = corpus.select(F.md5("text").alias("h")).distinct()
    ref = inc.join(hashes, F.md5(inc["text"]) == F.col("h"), "leftanti")
    return sorted(r.doc_id for r in ref.select("doc_id").collect())


def _docs_df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_matches_anti_join_with_overlap(spark):
    rows = [(i, f"body {i % 40}") for i in range(300)]
    df = _docs_df(spark, rows)
    corpus = df.filter("doc_id < 200")
    inc = df.filter("doc_id >= 200")
    out = bloomdedup.incremental_new_docs(corpus, inc)
    got = sorted(r.doc_id for r in out.select("doc_id").collect())
    assert got == _ref_new_ids(spark, corpus, inc)
    # every increment content exists in the corpus (i%40 < 200) — the
    # interesting branch (confirm join) is what decided every row here
    assert got == []


def test_saturated_bitmap_stays_exact(spark):
    """max_bits=64 forces near-100% fpp: everything routes through the
    confirm join and the answer must not change — the property that
    makes the size cap safe at any corpus scale."""
    rows = [(i, f"text {i}") for i in range(120)]
    df = _docs_df(spark, rows)
    corpus = df.filter("doc_id < 60")
    inc = df.filter("doc_id >= 60")
    out = bloomdedup.incremental_new_docs(corpus, inc, max_bits=64)
    got = sorted(r.doc_id for r in out.select("doc_id").collect())
    assert got == list(range(60, 120))  # all new, despite bloom saying maybe


def test_no_false_negatives(spark):
    """Bloom misses are treated as proof of novelty, so a false negative
    would silently re-admit a duplicate. Every duplicated content must be
    dropped — across several corpus sizes and a fixed seed sweep."""
    rng = random.Random(42)
    for n in (10, 200, 1000):
        rows = [(i, f"doc {rng.randrange(n)}") for i in range(n)]
        df = _docs_df(spark, rows)
        corpus = df.filter(f"doc_id < {n * 3 // 4}")
        inc = df.filter(f"doc_id >= {n * 3 // 4}")
        out = bloomdedup.incremental_new_docs(corpus, inc)
        got = sorted(r.doc_id for r in out.select("doc_id").collect())
        assert got == _ref_new_ids(spark, corpus, inc), f"n={n}"


def test_null_content_counts_as_new(spark):
    """NULL text equals nothing (anti-join/NOT EXISTS semantics): NULL
    increment rows survive; NULL corpus rows constrain nothing."""
    corpus = _docs_df(spark, [(1, "a"), (2, None)])
    inc = _docs_df(spark, [(10, None), (11, "a"), (12, "b")])
    out = bloomdedup.incremental_new_docs(corpus, inc)
    assert sorted(r.doc_id for r in out.collect()) == [10, 12]


def test_empty_corpus_and_empty_increment(spark):
    df = _docs_df(spark, [(1, "x"), (2, "y")])
    none = df.filter("doc_id < 0")
    assert bloomdedup.incremental_new_docs(none, df).count() == 2
    assert bloomdedup.incremental_new_docs(df, none).count() == 0


def test_increment_internal_duplicates_all_survive(spark):
    """Dedup is vs the CORPUS only: two copies of a novel content inside
    the increment both come back (collapsing them is b31's job, a
    separate decision a pipeline makes explicitly)."""
    corpus = _docs_df(spark, [(1, "old")])
    inc = _docs_df(spark, [(10, "new"), (11, "new"), (12, "old")])
    out = bloomdedup.incremental_new_docs(corpus, inc)
    assert sorted(r.doc_id for r in out.collect()) == [10, 11]


def test_bloom_params_cap_and_k():
    m, k = bloomdedup.bloom_params(1000, 0.01, bloomdedup.DEFAULT_MAX_BITS)
    assert m % 8 == 0 and 9000 < m < 10500 and k == 7
    # cap binds: m pinned, k re-derived DOWN (fewer probes as the bitmap
    # saturates — never more)
    m2, k2 = bloomdedup.bloom_params(10**9, 0.01, bloomdedup.DEFAULT_MAX_BITS)
    assert m2 == bloomdedup.DEFAULT_MAX_BITS and k2 == 1
    # floor: tiny corpora still get a non-degenerate bitmap
    m3, k3 = bloomdedup.bloom_params(1, 0.01, bloomdedup.DEFAULT_MAX_BITS)
    assert m3 >= 64 and 1 <= k3 <= 16


def test_probe_has_no_row_wise_python_and_no_smj(spark):
    """Plan gates for the scale argument: the probe is Arrow-vectorized
    (no BatchEvalPython) and every join in the final plan is broadcast
    (the corpus is never the build side of a shuffled join)."""
    rows = [(i, f"body {i % 10}") for i in range(100)]
    df = _docs_df(spark, rows)
    out = bloomdedup.incremental_new_docs(
        df.filter("doc_id < 80"), df.filter("doc_id >= 80")
    )
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    assert "BatchEvalPython" not in plan
    assert "SortMergeJoin" not in plan
    assert "ShuffledHashJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "ArrowEvalPython" in plan  # the sanctioned probe kernel


def test_n_items_hint_skips_sizing_scan_but_not_correctness(spark):
    rows = [(i, f"b {i % 5}") for i in range(50)]
    df = _docs_df(spark, rows)
    corpus, inc = df.filter("doc_id < 40"), df.filter("doc_id >= 40")
    out = bloomdedup.incremental_new_docs(corpus, inc, n_items=10_000)
    assert sorted(r.doc_id for r in out.collect()) == _ref_new_ids(
        spark, corpus, inc
    )
