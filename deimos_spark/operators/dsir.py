"""DSIR-style importance weighting for training-data selection.

Implements the hashed n-gram importance-weight estimator from the
public "Data Selection via Importance Resampling" method (Xie et al.,
2023): build bag-of-hashed-n-gram unigram models for a TARGET
distribution (e.g. a high-quality subset) and the RAW corpus, then score
every document with

    log w(x) = sum_b  n_b(x) * [ log p_target(b) - log p_raw(b) ]

where b ranges over hash buckets and the per-bucket probabilities are
Laplace-smoothed counts. Documents with high log-weight "look like" the
target; importance resampling keeps them proportionally.

Why this shape scales to 100 TB: the corpus is touched by exactly
  1. one tokenize projection (codegen'd string ops, no Python),
  2. one hash aggregate over (doc, token) — map-side combine collapses
     within-partition repeats before the shuffle,
  3. a distinct-token map hashed to buckets ONCE per vocabulary entry
     (not per occurrence — see _per_doc_bucket_counts) and joined back,
  4. one hash aggregate over (doc, bucket) + one over (bucket),
  5. a broadcast join of the ≤B-row log-ratio table + a per-doc agg.
No all-pairs step, no driver-side model fit; the "model" IS the ≤B-row
broadcast relation. The bucket hash is the engine-portable md5 prefix
(same construction as operators/sampling.py), so DuckDB oracles and any
other engine reproduce the weights bit-for-bit at the rounding
precision.

The reference has no data-selection surface (it moves opaque messages;
lib/deimos/message.rb:5-32) — this is part of the beyond-reference
training-data layer, like dedup.py and sampling.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket(col: Column, buckets: int, salt: str) -> Column:
    """Engine-portable hash bucket: first 8 hex chars of md5, as a long.
    Matches `('0x' || substr(md5(salt || x), 1, 8))::BIGINT % buckets`
    in DuckDB/ANSI engines."""
    return (
        F.conv(F.substring(F.md5(F.concat(F.lit(salt), col)), 1, 8), 16, 10)
        .cast("long")
        % buckets
    )


def _tokens(
    docs: DataFrame, id_col: str, text_col: str, extra_cols: list[str],
    ngram: int,
) -> DataFrame:
    """(id, *extra, token) — whitespace unigrams, plus space-joined
    bigrams when ngram >= 2 (both feature families share the hash
    space, as in the published estimator)."""
    ws = F.filter(F.split(F.col(text_col), " "), lambda w: w != "")
    base = docs.select(id_col, *extra_cols, ws.alias("__ws"))
    uni = base.select(
        id_col, *extra_cols, F.explode("__ws").alias("token")
    )
    if ngram < 2:
        return uni
    bi = base.select(
        id_col,
        *extra_cols,
        # guard: sequence(1, 0) is DESCENDING in Spark ([1, 0]), so an
        # unguarded expression emits two null "bigrams" for 0-1-token
        # docs — null-bucket counts that shift every bucket's log-ratio
        F.explode(
            F.expr(
                "CASE WHEN size(__ws) >= 2 THEN "
                "transform(sequence(1, size(__ws) - 1), "
                "i -> concat(__ws[i - 1], ' ', __ws[i])) "
                "ELSE array() END"
            )
        ).alias("token"),
    )
    return uni.unionByName(bi)


def _per_doc_bucket_counts(
    docs: DataFrame,
    target: Column,
    id_col: str,
    text_col: str,
    buckets: int,
    salt: str,
    ngram: int,
    broadcast_vocab: bool = True,
) -> DataFrame:
    """(id, __tgt, __b, __n): tokenize once, then hash each DISTINCT
    token ONCE instead of per occurrence (VERDICT r10 #1; the t10b
    tokenize-once-per-distinct-word pattern, operators/bpe.py).

    md5+conv per token occurrence was the dominant CPU of the t23
    headline query — natural text repeats tokens heavily, so hashing
    the vocabulary and mapping it back pays |vocab| hashes instead of
    |occurrences|. Shape: one (doc, token) hash aggregate (map-side
    partial combine collapses within-partition repeats before the
    shuffle), a distinct-token projection hashed to buckets (its input
    REUSES the (doc, token) exchange), a broadcast join of the
    token→bucket map, and a fold to (doc, bucket). Same md5 per token
    ⇒ bucket counts bit-identical to hashing inline.

    Scale note: `broadcast_vocab=False` for corpora whose whitespace
    vocabulary exceeds broadcast size (web-scale crawls with URLs /
    typos) — the join then shuffles two already-aggregated relations
    on `token`, still never the raw occurrence stream."""
    tok = _tokens(
        docs.withColumn("__tgt", target), id_col, text_col, ["__tgt"], ngram
    )
    per_tok = tok.groupBy(id_col, "__tgt", "token").agg(
        F.count("*").alias("__tn")
    )
    vocab = (
        per_tok.select("token")
        .distinct()
        .select("token", _bucket(F.col("token"), buckets, salt).alias("__b"))
    )
    if broadcast_vocab:
        vocab = F.broadcast(vocab)
    return (
        per_tok.join(vocab, "token")
        .groupBy(id_col, "__tgt", "__b")
        .agg(F.sum("__tn").alias("__n"))
    )


def dsir_log_weights(
    docs: DataFrame,
    target: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 4096,
    salt: str = "dsir",
    ngram: int = 1,
) -> DataFrame:
    """Per-document DSIR log importance weight → (id_col, log_weight).

    `target` is a boolean Column over `docs` selecting the target
    subset (e.g. `F.col("lang") == "en"`). Probabilities are
    Laplace-smoothed: p(b) = (count_b + 1) / (total + buckets).
    """
    # single (doc, bucket) aggregate; both the bucket model and the
    # per-doc scoring derive from it, so the tokenize projection and its
    # shuffle run ONCE (Spark reuses the identical exchange subplan)
    per_doc = _per_doc_bucket_counts(
        docs, target, id_col, text_col, buckets, salt, ngram
    )
    by_bucket = per_doc.groupBy("__b").agg(
        F.sum("__n").alias("__cr"),
        F.sum(F.when(F.col("__tgt"), F.col("__n")).otherwise(0)).alias(
            "__ct"
        ),
    )
    totals = by_bucket.agg(
        F.sum("__cr").alias("__tr"), F.sum("__ct").alias("__tt")
    )
    ratio = (
        by_bucket.crossJoin(F.broadcast(totals))
        .select(
            "__b",
            (
                F.log((F.col("__ct") + 1.0) / (F.col("__tt") + float(buckets)))
                - F.log(
                    (F.col("__cr") + 1.0) / (F.col("__tr") + float(buckets))
                )
            ).alias("__lr"),
        )
    )
    return (
        per_doc.join(F.broadcast(ratio), "__b")
        .groupBy(id_col)
        .agg(F.sum(F.col("__n") * F.col("__lr")).alias("log_weight"))
    )


def unigram_ppl_scores(
    docs: DataFrame,
    target: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 4096,
    salt: str = "ppl",
) -> DataFrame:
    """CCNet-style language-model quality scoring → (id_col, n_tokens,
    ppl_score): mean negative log-probability of each document's tokens
    under a Laplace-smoothed hashed-unigram model trained on the TARGET
    subset (Wenzek et al. 2020, arXiv:1911.00359, use a target-domain LM
    and keep low-perplexity documents; the hashed-unigram model is the
    engine-portable stand-in for their KenLM). Lower = more target-like.

    Differs from `dsir_log_weights`: DSIR scores a target/raw RATIO
    (importance weight for resampling); this scores absolute likelihood
    under one model (quality filter threshold). Same 100-TB shape: one
    tokenize projection, one (doc,bucket) aggregate reused for both the
    model and scoring, a ≤`buckets`-row broadcast model — no all-pairs
    step, no driver-side fit. Docs with zero tokens are absent from the
    output (no tokens → no likelihood), mirroring dsir_log_weights.
    """
    per_doc = _per_doc_bucket_counts(
        docs, target, id_col, text_col, buckets, salt, 1
    )
    # one aggregate covers every corpus bucket; target counts fold in as
    # a conditional sum (ct = 0 where the target never hashed there →
    # the smoothed floor probability), so the tokenize exchange is
    # shared with scoring exactly as in dsir_log_weights
    by_bucket = per_doc.groupBy("__b").agg(
        F.sum(F.when(F.col("__tgt"), F.col("__n")).otherwise(0)).alias(
            "__ct"
        )
    )
    totals = by_bucket.agg(F.sum("__ct").alias("__tt"))
    model = (
        by_bucket.crossJoin(F.broadcast(totals))
        .select(
            "__b",
            (
                -F.log(
                    (F.col("__ct") + 1.0)
                    / (F.coalesce(F.col("__tt"), F.lit(0)) + float(buckets))
                )
            ).alias("__nll"),
        )
    )
    return (
        per_doc.join(F.broadcast(model), "__b")
        .groupBy(id_col)
        .agg(
            F.sum("__n").cast("bigint").alias("n_tokens"),
            (F.sum(F.col("__n") * F.col("__nll")) / F.sum("__n")).alias(
                "ppl_score"
            ),
        )
    )
