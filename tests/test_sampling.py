"""Deterministic sampling/splitting: stability, coverage, plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from deimos_spark.operators.sampling import (
    hash_bucket,
    hash_sample,
    hash_split,
    stratified_hash_sample,
)

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_split_is_total_and_disjoint(spark, docs):
    d = hash_split(docs, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    n = docs.count()
    assert d.count() == n  # every row labeled
    assert d.filter(F.col("split").isNull()).count() == 0
    # per-row determinism: recomputing yields identical assignment
    a = {r.doc_id: r.split for r in d.select("doc_id", "split").collect()}
    b = {
        r.doc_id: r.split
        for r in hash_split(docs, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
        .select("doc_id", "split")
        .collect()
    }
    assert a == b


def test_split_rates_approximate(spark, docs):
    d = hash_split(docs, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    n = docs.count()
    counts = {r.split: r["count"] for r in d.groupBy("split").count().collect()}
    assert 0.7 < counts["train"] / n < 0.9
    assert 0.05 < counts["val"] / n < 0.16
    assert 0.05 < counts["test"] / n < 0.16


def test_sample_stable_and_subsetting(spark, docs):
    s10 = hash_sample(docs, "doc_id", 0.10)
    s20 = hash_sample(docs, "doc_id", 0.20)
    ids10 = {r.doc_id for r in s10.select("doc_id").collect()}
    ids20 = {r.doc_id for r in s20.select("doc_id").collect()}
    assert ids10 <= ids20  # rate increase only ADDS rows (bucket monotone)
    n = docs.count()
    assert 0.04 < len(ids10) / n < 0.18


def test_salt_decorrelates(spark, docs):
    a = {r.doc_id for r in hash_sample(docs, "doc_id", 0.5, salt="a").collect()}
    b = {r.doc_id for r in hash_sample(docs, "doc_id", 0.5, salt="b").collect()}
    assert a != b
    # overlap ≈ 25% of total if independent; just require non-degenerate
    inter = len(a & b)
    assert 0 < inter < min(len(a), len(b))


def test_stratified_rates(spark, docs):
    d = stratified_hash_sample(
        docs, "lang", "doc_id", rates={"en": 0.0, "de": 1.0}, default_rate=0.5
    )
    got = {r.lang: r["count"] for r in d.groupBy("lang").count().collect()}
    assert "en" not in got  # rate 0 drops the stratum entirely
    all_de = docs.filter(F.col("lang") == "de").count()
    assert got["de"] == all_de  # rate 1 keeps everything
    for lang in ("es", "fr", "zh"):
        full = docs.filter(F.col("lang") == lang).count()
        assert 0 < got[lang] < full


def test_no_shuffle_in_sample_plan(spark, docs):
    plan = hash_sample(docs, "doc_id", 0.1)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # pure map-side filter
    plan2 = (
        hash_split(docs, "doc_id", {"train": 0.9, "test": 0.1})
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan2


def test_bucket_range(spark):
    df = spark.range(1000).select(hash_bucket("id", buckets=100).alias("b"))
    mn, mx = df.agg(F.min("b"), F.max("b")).head()
    assert 0 <= mn and mx <= 99


def test_bad_weights_raise(spark, docs):
    with pytest.raises(ValueError, match="sum to 1"):
        hash_split(docs, "doc_id", {"train": 0.5, "test": 0.1})


def test_mixture_sample_hits_target_shares(spark, docs):
    """Output proportions approach the target mixture; the binding
    stratum (largest n/p deficit) is kept whole; membership is stable."""
    from deimos_spark.operators.sampling import mixture_sample

    targets = {"en": 0.4, "de": 0.2, "es": 0.2, "fr": 0.1, "zh": 0.1}
    kept = mixture_sample(docs, "lang", targets, "doc_id")
    counts = {r["lang"]: r["n"] for r in
              kept.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    orig = {r["lang"]: r["n"] for r in
            docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    # binding stratum kept (near-)whole: min over langs of n/p
    binding = min(orig, key=lambda s: orig[s] / targets[s])
    assert counts[binding] >= orig[binding] * 0.99
    total = sum(counts.values())
    for lang, p in targets.items():
        if lang in counts:
            assert abs(counts[lang] / total - p) < 0.05  # bucket granularity
    # deterministic: second run identical
    again = mixture_sample(docs, "lang", targets, "doc_id")
    assert {r["doc_id"] for r in kept.select("doc_id").collect()} == {
        r["doc_id"] for r in again.select("doc_id").collect()
    }


def test_pack_plan_bins_are_contiguous_and_conserve_tokens(spark, docs):
    from deimos_spark.operators.packing import pack_plan

    plan = pack_plan(docs, capacity=256, shards=4).collect()
    # token mass conserved
    total_tokens = docs.select(
        F.sum(F.size(F.split(F.trim(F.col("text")), r"\s+"))).alias("t")
    ).head()["t"]
    assert sum(r["n_tokens"] for r in plan) == total_tokens
    # within a shard, bins start at 0 and are dense (contiguous layout)
    by_shard = {}
    for r in plan:
        by_shard.setdefault(r["shard"], []).append(r["bin"])
    for bins in by_shard.values():
        bins = sorted(bins)
        assert bins[0] == 0 and bins == list(range(len(bins)))
    # no shard exceeds its share wildly (hash balance sanity)
    docs_per_shard = {s: 0 for s in by_shard}
    for r in plan:
        docs_per_shard[r["shard"]] += r["n_docs"]
    n = docs.count()
    assert all(c < n for c in docs_per_shard.values()) and len(by_shard) > 1


# ------------------------------------------------- DSIR importance weights


def test_dsir_weights_target_affinity_and_bigrams(spark):
    from pyspark.sql import functions as F

    from deimos_spark.operators.dsir import dsir_log_weights

    docs = spark.createDataFrame(
        [
            (1, "alpha beta alpha beta", "en"),
            (2, "gamma delta gamma delta", "de"),
            (3, "alpha beta gamma delta", "en"),
        ],
        "doc_id long, text string, lang string",
    )
    w = {
        r.doc_id: r.log_weight
        for r in dsir_log_weights(docs, F.col("lang") == "en").collect()
    }
    # doc 1 is pure target vocabulary, doc 2 pure non-target: the log
    # importance weight must order them accordingly
    assert w[1] > w[3] > w[2]
    # bigram features share the hash space and keep every doc scored
    w2 = dsir_log_weights(docs, F.col("lang") == "en", ngram=2).collect()
    assert len(w2) == 3
    w2m = {r.doc_id: r.log_weight for r in w2}
    assert w2m[1] > w2m[2]


def test_dsir_bigrams_no_null_tokens_for_short_docs(spark):
    """sequence(1, 0) is DESCENDING in Spark, so an unguarded bigram
    transform emits null 'bigrams' for 0-1-token docs — nulls that hash
    into a phantom bucket and shift every log-ratio. The guarded
    expression must emit NO tokens for such docs, and their presence
    must not change other docs' weights."""
    from pyspark.sql import functions as F

    from deimos_spark.operators.dsir import _tokens, dsir_log_weights

    base = [
        (1, "alpha beta alpha beta", "en"),
        (2, "gamma delta gamma delta", "de"),
    ]
    schema = "doc_id long, text string, lang string"
    docs = spark.createDataFrame(base, schema)
    with_short = spark.createDataFrame(
        base + [(4, "solo", "en"), (5, "", "de")], schema
    )
    tok = _tokens(with_short, "doc_id", "text", [], 2)
    assert tok.filter(F.col("token").isNull()).count() == 0
    # the short docs contribute only unigrams; docs 1/2's weights are
    # affected only through the shared totals, never a null bucket
    ref = {
        r.doc_id: r.log_weight
        for r in dsir_log_weights(docs, F.col("lang") == "en", ngram=2).collect()
    }
    got = {
        r.doc_id: r.log_weight
        for r in dsir_log_weights(
            with_short, F.col("lang") == "en", ngram=2
        ).collect()
    }
    assert 4 in got and 5 not in got  # empty doc has no tokens at all
    assert ref[1] > ref[2] and got[1] > got[2]


def test_unigram_ppl_orders_by_target_likelihood(spark):
    """t23: a document made of target vocabulary must score LOWER (more
    likely under the target LM) than one of never-seen vocabulary; a
    zero-token document is absent; token counts are exact."""
    from pyspark.sql import functions as F

    from deimos_spark.operators.dsir import unigram_ppl_scores

    docs = spark.createDataFrame(
        [
            (1, "alpha beta alpha beta alpha beta", "en"),
            (2, "zork quux zork grue", "de"),
            (3, "alpha beta zork quux", "en"),
            (4, "", "en"),
        ],
        "doc_id long, text string, lang string",
    )
    got = {
        r.doc_id: (r.n_tokens, r.ppl_score)
        for r in unigram_ppl_scores(docs, F.col("lang") == "en").collect()
    }
    assert set(got) == {1, 2, 3}  # empty doc has no likelihood
    assert got[1][0] == 6 and got[2][0] == 4 and got[3][0] == 4
    # pure target vocab < mixed < pure non-target
    assert got[1][1] < got[3][1] < got[2][1]


def test_source_overlap_counts_shared_contents(spark):
    """t24: distinct shared contents per source pair, self-pairs and
    symmetric duplicates excluded."""
    from deimos_spark.queries import q_source_overlap

    rows = (
        [(i, f"shared {i % 3}", "en", "crawl_a", 1) for i in range(6)]
        + [(10 + i, f"shared {i % 3}", "en", "crawl_b", 1) for i in range(3)]
        + [(20, "only in a", "en", "crawl_a", 1)]
        + [(21, "shared 0", "en", "crawl_c", 1)]
    )
    d = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    import os
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        d.write.parquet(os.path.join(td, "documents.parquet"))
        got = {
            (r.source_a, r.source_b): r.shared_contents
            for r in q_source_overlap(spark, td).collect()
        }
    # every pair present — zero-overlap pairs included (the audit's
    # "clean" verdict is signal too)
    assert got == {
        ("crawl_a", "crawl_b"): 3,   # shared 0/1/2
        ("crawl_a", "crawl_c"): 1,   # shared 0
        ("crawl_b", "crawl_c"): 1,
    }


def test_dedup_safe_split_colocates_duplicates(spark):
    from pyspark.sql import functions as F

    from deimos_spark.operators.sampling import dedup_safe_split, hash_split

    # 200 distinct contents, each duplicated 3x under different ids —
    # the boilerplate-heavy corpus shape
    rows = [(i * 3 + j, f"content number {i}") for i in range(200) for j in range(3)]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    w = {"train": 0.7, "test": 0.3}

    def leaked(df):
        return (
            df.groupBy("text")
            .agg(F.countDistinct("split").alias("ns"))
            .filter(F.col("ns") > 1)
            .count()
        )

    assert leaked(hash_split(d, "doc_id", w, salt="leak")) > 0  # id split leaks
    safe = dedup_safe_split(d, "text", w, salt="leak")
    assert leaked(safe) == 0  # content split cannot leak
    # and it is still a real split, not everything in one bucket
    assert safe.select("split").distinct().count() == 2


def test_x10_scaled_long_split_equals_decimal_cast_formulation(spark):
    """x10's scaled-long fast path (VERDICT r10 #2) must be row-for-row
    equal — Decimal cells included — to the naive decimal-cast
    formulation it replaced, at two SFs. Pins BOTH the +0.5/trunc cents
    extraction (exact for 2-decimal money doubles) and the lo/hi bigint
    partial-sum reconstruction."""
    from deimos_spark.catalog import load_table
    from deimos_spark.queries import all_queries

    for sf_dir in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        li = load_table(spark, sf_dir, "lineitem")
        naive = (
            li.select(
                "l_returnflag",
                F.col("l_extendedprice").cast("decimal(18,2)").alias("_p"),
                (F.lit(1) - F.col("l_discount"))
                .cast("decimal(18,4)")
                .alias("_d"),
            )
            .groupBy("l_returnflag")
            .agg(
                F.sum(F.col("_p") * F.col("_d"))
                .cast("decimal(38,6)")
                .alias("revenue"),
                F.sum("_p").cast("decimal(18,2)").alias("gross"),
            )
            .orderBy("l_returnflag")
        )
        fast = all_queries()["x10_decimal_revenue"].builder(spark, sf_dir)
        assert [tuple(r) for r in fast.collect()] == [
            tuple(r) for r in naive.collect()
        ]


def test_dsir_distinct_token_hash_path_identical(spark):
    """The optional distinct-token-hash variant (kept for corpora
    where per-token work genuinely dominates — see
    dsir._per_doc_bucket_counts) must produce bit-identical bucket
    counts to the default inline hash: same md5 per token."""
    from deimos_spark.operators.dsir import _per_doc_bucket_counts

    d = spark.createDataFrame(
        [(1, "a b a c", True), (2, "b b d", False), (3, "", True)],
        "doc_id long, text string, tgt boolean",
    )
    kw = dict(
        id_col="doc_id", text_col="text", buckets=64, salt="s", ngram=2
    )
    base = _per_doc_bucket_counts(
        d, F.col("tgt"), distinct_token_hash=False, **kw
    )
    alt = _per_doc_bucket_counts(
        d, F.col("tgt"), distinct_token_hash=True, **kw
    )
    key = lambda rows: sorted(tuple(r) for r in rows)
    assert key(base.collect()) == key(alt.collect())
