"""fastText-style linear text-classifier INFERENCE (t29).

The public fastText supervised model (Joulin et al. 2016,
arXiv:1607.01759 "Bag of Tricks for Efficient Text Classification")
scores a document as a linear function of its averaged bag-of-features
representation: features are word unigrams (plus word n-grams when
`wordNgrams` > 1) hashed into a fixed bucket space, and the score is
`(1/n) * sum_f  w[h(f)]` — a dot product against a weight vector the
training stage produced. This module implements the INFERENCE side
(the staple "quality classifier" filter step of public LLM data
pipelines — e.g. the CCNet/GPT-3/LLaMA Wikipedia-vs-CommonCrawl
filters), leaving training to any external tool that can emit a
(bucket, weight) table.

Two weight sources:

- `weights=None` (default, the oracle-checkable path): weights derive
  from the bucket id itself by a fixed public mixing step,
      w_int(b) = (b * 2654435761) % 1000003 - 501001
  (Knuth's multiplicative constant; centered so E[w] ~ 0). INTEGER
  weights make the per-document sum EXACT — the only float op is one
  final division `sum / (n * 1000003.0)`, which IEEE-754 pins to the
  same bits in every engine, so the DuckDB oracle matches with no
  rounding convention at all.
- `weights=DataFrame(bucket BIGINT, weight DOUBLE)` (the production
  path): a trained model table, broadcast-joined onto the hashed
  token stream (the DSIR broadcast-model shape — a fastText bucket
  space is <= a few million rows, far under broadcast limits at
  executor scale).

Scale shape (100 TB):
- seeded path: ZERO shuffle — tokenize, hash, weigh, and sum happen
  inside ONE whole-stage-codegen projection per input row
  (`transform` + `aggregate` over the token array; no explode, no
  groupBy). The corpus is touched exactly once; cost is linear CPU,
  embarrassingly parallel. This is the best possible plan for
  model-inference filters at any scale.
- trained path: one explode + broadcast join + per-doc hash aggregate
  (map-side combinable) — one shuffle of (doc_id, partial-sum), the
  same contract as operators/dsir.py.

The reference has no classifier surface (it moves opaque messages;
lib/deimos/message.rb:5-32) — this is the beyond-reference
training-data layer, like dsir.py and dedup.py.

Hash/tokenize conventions are shared with operators/dsir.py so every
text op in the engine agrees: whitespace tokens, empty strings
dropped, bucket = first-8-hex-chars-of-md5(salt || token) % buckets
(md5 because it is the only hash both engines compute identically).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["classifier_scores", "MIX_MULT", "MIX_MOD", "MIX_OFFSET"]

# Fixed public mixing constants for the seeded weight path (see module
# docstring). MIX_MOD is prime so buckets spread over the full range;
# MIX_OFFSET centers the integer weights near zero so corpus-level
# scores straddle the 0 decision boundary.
MIX_MULT = 2654435761  # Knuth multiplicative hash constant (2^32 * phi)
MIX_MOD = 1000003
MIX_OFFSET = 501001

# Overflow audit for the seeded path: bucket < DEFAULT_BUCKETS = 2^20,
# so b * MIX_MULT < 2^52 (< 2^63); |w_int| <= 501001, so the per-doc
# long sum is exact up to ~1.8e13 tokens per document.
DEFAULT_BUCKETS = 1 << 20


def _ws_tokens(text_col: str) -> Column:
    """array<string> of non-empty whitespace tokens (dsir convention)."""
    return F.filter(F.split(F.col(text_col), " "), lambda w: w != "")


def _features(text_col: str, word_ngrams: int) -> Column:
    """Token array -> feature array: unigrams, plus space-joined
    adjacent bigrams when word_ngrams >= 2 (fastText wordNgrams=2;
    both families share the hash space, as in fastText itself)."""
    ws = _ws_tokens(text_col)
    if word_ngrams < 2:
        return ws
    # bigrams = zip_with(ws[0:n-1], ws[1:n]) — slice lengths clamp to 0
    # for 0/1-token docs, so empty/short docs need no special case
    # (unlike sequence(1, 0), which is DESCENDING — dsir._tokens had to
    # guard it)
    return F.concat(
        ws,
        F.zip_with(
            F.slice(ws, 1, F.greatest(F.size(ws) - 1, F.lit(0))),
            F.slice(
                ws,
                2,
                F.greatest(F.size(ws) - 1, F.lit(0)),
            ),
            lambda a, b: F.concat(a, F.lit(" "), b),
        ),
    )


def _bucket(tok: Column, buckets: int, salt: str) -> Column:
    """Engine-portable md5-prefix bucket (dsir._bucket convention):
    `('0x' || substr(md5(salt || t), 1, 8))::BIGINT % buckets`."""
    return (
        F.conv(F.substring(F.md5(F.concat(F.lit(salt), tok)), 1, 8), 16, 10)
        .cast("long")
        % buckets
    )


def classifier_scores(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = DEFAULT_BUCKETS,
    salt: str = "ft",
    word_ngrams: int = 1,
    weights: DataFrame | None = None,
) -> DataFrame:
    """(id, n_features INT, score DOUBLE, label INT) for every doc.

    score = sum(w[h(f)]) / (n_features * MIX_MOD) under seeded weights
    (exact integer sum, one final float division — bit-identical in
    any IEEE engine); under a trained `weights` table the score is
    sum(weight)/n_features. label = 1 iff score > 0 (the sigmoid
    decision boundary sigmoid(0) = 0.5 without computing exp(), whose
    last-ulp behavior differs between engines). Feature-less docs
    (empty/whitespace-only text) score 0.0 with n_features = 0.
    """
    feats = _features(text_col, word_ngrams)
    if weights is None:
        w_int = lambda t: (  # noqa: E731
            (_bucket(t, buckets, salt) * MIX_MULT) % MIX_MOD - MIX_OFFSET
        )
        # materialize the hashed-weight array ONCE in its own Project:
        # n_features/score/label all reference it, and an inlined form
        # would pay the tokenize+md5 transform up to 6x per row
        # (CollapseProject keeps the intermediate because the aliased
        # expression is non-cheap and multiply-referenced)
        staged = docs.select(
            F.col(id_col), F.transform(feats, w_int).alias("__wints")
        )
        n = F.size(F.col("__wints"))
        num = F.aggregate(
            F.col("__wints"), F.lit(0).cast("long"), lambda acc, x: acc + x
        )
        scored = staged.select(
            F.col(id_col),
            n.cast("int").alias("n_features"),
            F.when(
                n > 0, num / (n.cast("double") * F.lit(float(MIX_MOD)))
            )
            .otherwise(F.lit(0.0))
            .alias("score"),
        )
        return scored.withColumn(
            "label", (F.col("score") > 0).cast("int")
        )
    # trained path: explode + broadcast model join + per-doc agg
    # (map-side combinable; one shuffle keyed by doc id)
    tok = docs.select(
        F.col(id_col), F.explode(feats).alias("__t")
    ).withColumn("__b", _bucket(F.col("__t"), buckets, salt))
    scored = (
        tok.join(F.broadcast(weights), tok["__b"] == weights["bucket"], "left")
        .groupBy(id_col)
        .agg(
            F.count("*").cast("int").alias("n_features"),
            (
                F.sum(F.coalesce(F.col("weight"), F.lit(0.0)))
                / F.count("*")
            ).alias("score"),
        )
    )
    base = docs.select(F.col(id_col))
    return (
        base.join(scored, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_features", F.lit(0)).alias("n_features"),
            F.coalesce("score", F.lit(0.0)).alias("score"),
        )
        .withColumn("label", (F.col("score") > 0).cast("int"))
    )
