"""t29 fastText-style classifier inference (operators/classifier.py,
Joulin et al. 2016 arXiv:1607.01759 — inference side only). Semantics
pinned against an independent pure-Python reimplementation; the
engine-vs-DuckDB identity is the oracle rows (t29/t29b, green at
sf0.001/0.01). The reference has no classifier surface (it moves
opaque messages, lib/deimos/message.rb:5-32) — beyond-reference
training-data layer."""

import hashlib

from pyspark.sql import types as T

from deimos_spark.operators.classifier import (
    MIX_MOD,
    MIX_MULT,
    MIX_OFFSET,
    classifier_scores,
)

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ]
)


def _py_wint(tok: str, buckets: int = 1 << 20, salt: str = "ft") -> int:
    b = int(hashlib.md5((salt + tok).encode()).hexdigest()[:8], 16) % buckets
    return (b * MIX_MULT) % MIX_MOD - MIX_OFFSET


def _py_score(text: str, word_ngrams: int = 1):
    toks = [w for w in text.split(" ") if w != ""]
    feats = list(toks)
    if word_ngrams >= 2:
        feats += [f"{a} {b}" for a, b in zip(toks, toks[1:])]
    if not feats:
        return 0, 0.0, 0
    s = sum(_py_wint(t) for t in feats) / (len(feats) * float(MIX_MOD))
    return len(feats), s, int(s > 0)


def test_matches_pure_python_reference(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the the the the"),
        (2, "zyx qwv"),
        (3, "single"),
    ]
    out = {
        r.doc_id: (r.n_features, r.score, r.label)
        for r in classifier_scores(
            spark.createDataFrame(rows, SCHEMA)
        ).collect()
    }
    for i, text in rows:
        assert out[i] == _py_score(text), f"doc {i}"


def test_bigram_features_and_scores(spark):
    rows = [(0, "a b c d"), (1, "a"), (2, "")]
    out = {
        r.doc_id: (r.n_features, r.score, r.label)
        for r in classifier_scores(
            spark.createDataFrame(rows, SCHEMA), word_ngrams=2
        ).collect()
    }
    # 4 unigrams + 3 bigrams
    assert out[0][0] == 7
    assert out[0] == _py_score("a b c d", word_ngrams=2)
    # 0/1-token docs need no guard (slice lengths clamp to 0)
    assert out[1] == _py_score("a", word_ngrams=2)
    assert out[2] == (0, 0.0, 0)


def test_empty_and_whitespace_docs_score_zero(spark):
    rows = [(0, ""), (1, "   "), (2, "x")]
    out = {
        r.doc_id: (r.n_features, r.score, r.label)
        for r in classifier_scores(
            spark.createDataFrame(rows, SCHEMA)
        ).collect()
    }
    assert out[0] == (0, 0.0, 0)
    assert out[1] == (0, 0.0, 0)
    assert out[2][0] == 1


def test_trained_weights_path(spark):
    """Production path: explicit (bucket, weight) model table,
    broadcast-joined. Unseen buckets contribute 0; score is the plain
    average of matched weights over ALL features (fastText divides by
    the token count, not the matched count)."""
    docs = spark.createDataFrame([(0, "a b"), (1, "zz"), (2, "")], SCHEMA)

    def bucket(tok):
        return int(
            hashlib.md5(("ft" + tok).encode()).hexdigest()[:8], 16
        ) % (1 << 20)

    w = spark.createDataFrame(
        [(bucket("a"), 2.0), (bucket("b"), 1.0)],
        T.StructType(
            [
                T.StructField("bucket", T.LongType()),
                T.StructField("weight", T.DoubleType()),
            ]
        ),
    )
    out = {
        r.doc_id: (r.n_features, r.score, r.label)
        for r in classifier_scores(docs, weights=w).collect()
    }
    assert out[0] == (2, 1.5, 1)  # (2.0 + 1.0) / 2
    assert out[1] == (1, 0.0, 0)  # unseen token -> weight 0
    assert out[2] == (0, 0.0, 0)  # feature-less doc survives the join


def test_label_is_sign_of_score(spark):
    rows = [(i, f"tok{i} tok{i + 1} tok{i + 2}") for i in range(40)]
    for r in classifier_scores(spark.createDataFrame(rows, SCHEMA)).collect():
        assert r.label == (1 if r.score > 0 else 0)
