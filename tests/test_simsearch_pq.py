"""IVF-PQ (b33d) specifics beyond the registry recall gate
(test_approx_tolerance.py): the exactness regime that pins the ADC
math, the uint8 code-width clamp the exactness debugging uncovered,
and the loud refusals."""

import pytest
from pyspark.sql import functions as F

from deimos_spark.operators import simsearch


def _emb(spark, limit=None):
    df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    return df.filter(f"vec_id < {limit}") if limit else df


def test_adc_is_exact_when_codebooks_memorize_the_sample(spark):
    """With ksub >= n every residual sub-block is its own codebook entry,
    so ADC distance equals true squared L2 on unit vectors — the PQ
    top-k must match exact cosine top-k EXACTLY (ids and order). Pins
    the whole encode→ADC pipeline bit-for-bit; 200 vectors keeps
    ksub = n <= 256 (codes are single bytes)."""
    e = _emb(spark, limit=200)
    q = [float(x) for x in e.filter("vec_id = 0").first()["embedding"]]
    model = simsearch.pq_train(
        e, n_cells=4, m=8, codebook_size=256, seed=1, max_iter=5
    )
    codes = simsearch.pq_encode(e, model)
    got = [
        r.vec_id
        for r in simsearch.pq_topk(codes, model, q, k=10, nprobe=4).collect()
    ]
    exact = [r.vec_id for r in simsearch.cosine_topk(e, q, 10).collect()]
    assert got == exact


def test_rerank_restores_recall(spark):
    """IVFADC+R: re-ranking the ADC shortlist with exact cosine returns
    the exact top-k on this corpus (raw ADC plateaus at 0.7 recall —
    quantization error, the reason the published recipe re-ranks)."""
    e = _emb(spark)
    q = [float(x) for x in e.filter("vec_id = 0").first()["embedding"]]
    model = simsearch.pq_train(e, n_cells=8, m=8, seed=42, max_iter=5)
    codes = simsearch.pq_encode(e, model)
    got = simsearch.pq_topk_rerank(
        codes, e, model, q, k=10, nprobe=6, shortlist=50
    ).collect()
    exact = simsearch.cosine_topk(e, q, 10).collect()
    # re-ranked sims are computed by the SAME exact kernel — ids AND
    # sims line up wherever the shortlist covered the true top-k
    got_ids = [r.vec_id for r in got]
    exact_ids = [r.vec_id for r in exact]
    assert len(set(got_ids) & set(exact_ids)) >= 8
    exact_sims = {r.vec_id: r.sim for r in exact}
    for r in got:
        if r.vec_id in exact_sims:
            assert r.sim == exact_sims[r.vec_id]


def test_encode_is_deterministic(spark):
    e = _emb(spark, limit=100)
    model = simsearch.pq_train(e, n_cells=4, m=8, seed=7, max_iter=3)
    a = {
        r.vec_id: (r.pq_cell, bytes(r.pq_code))
        for r in simsearch.pq_encode(e, model).collect()
    }
    b = {
        r.vec_id: (r.pq_cell, bytes(r.pq_code))
        for r in simsearch.pq_encode(e, model).collect()
    }
    assert a == b and len(a) == 100
    assert all(len(code) == 8 for _, code in a.values())


def test_codebook_and_dim_refusals(spark):
    e = _emb(spark, limit=50)
    with pytest.raises(ValueError, match="WRAP"):
        simsearch.pq_train(e, codebook_size=300)
    with pytest.raises(ValueError, match="divisible"):
        simsearch.pq_train(e, m=7)  # 64 % 7 != 0


def test_zero_norm_vectors_never_rank_near(spark):
    rows = [(1, [0.0] * 8), (2, [1.0] * 8), (3, [0.9] * 8)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    model = simsearch.pq_train(df, n_cells=1, m=2, seed=3, max_iter=2)
    codes = simsearch.pq_encode(df, model)
    got = [
        r.vec_id
        for r in simsearch.pq_topk(
            codes, model, [1.0] * 8, k=2, nprobe=1
        ).collect()
    ]
    assert got == [2, 3]  # the zero vector is last, not NaN-first


def test_clustered_pq_layout_partition_prunes(spark, tmp_path):
    """The materialized codes layout turns the probe filter into
    PartitionFilters — the scan never lists unprobed cell dirs."""
    e = _emb(spark)
    q = [float(x) for x in e.filter("vec_id = 0").first()["embedding"]]
    model = simsearch.pq_train(e, n_cells=8, m=8, seed=42, max_iter=5)
    path = str(tmp_path / "pq_codes")
    simsearch.write_pq_clustered(e, path, model)

    import numpy as np

    cents = np.asarray(model["centroids"])
    qn = np.asarray(q) / np.linalg.norm(q)
    probes = [
        int(i)
        for i in np.argsort(((cents - qn[None, :]) ** 2).sum(axis=1))[:5]
    ]
    pruned = spark.read.parquet(path).filter(
        F.col("pq_cell").isin(probes)
    )
    plan = pruned._sc._jvm.PythonSQLUtils.explainString(
        pruned._jdf.queryExecution(), "formatted"
    )
    assert "PartitionFilters: [pq_cell" in plan

    got = simsearch.pq_topk_clustered(
        spark, path, e, model, q, k=10, nprobe=6, shortlist=50
    ).collect()
    exact = simsearch.cosine_topk(e, q, 10).collect()
    assert len(
        {r.vec_id for r in got} & {r.vec_id for r in exact}
    ) >= 8


def test_scale_rule_is_the_default(spark):
    """VERDICT r13 #2: nprobe=None / shortlist=None must derive the
    measured STRESS_ANN deployment rule — a user calling the functions
    as-documented gets the rule the artifact gates (min recall 0.875),
    not the 500-row fixture constants that decay to 0.71."""
    # the rule itself, at the artifact's gate points
    assert simsearch.scale_nprobe(8) == 6
    assert simsearch.scale_nprobe(40) == 12
    assert simsearch.scale_nprobe(120) == 36
    assert simsearch.scale_nprobe(4) == 4  # never more cells than exist
    assert simsearch.scale_shortlist(60_000) == 800
    assert simsearch.scale_shortlist(2_000) == 50
    assert simsearch.scale_shortlist(100, k=20) == 100  # 5·k floor

    # functional: default-args ivf_topk probes the rule's cells and
    # still puts the query vector itself first
    e = _emb(spark)
    q = [float(x) for x in e.filter("vec_id = 0").first()["embedding"]]
    cents = simsearch.ivf_train(e, n_cells=8, seed=42, max_iter=5)
    got = simsearch.ivf_topk(e, q, cents, k=5).collect()
    assert got[0].vec_id == 0 and got[0].sim == 1.0

    # default-args rerank returns k rows, shortlist derived from codes
    model = simsearch.pq_train(e, n_cells=8, m=8, seed=42, max_iter=5)
    codes = simsearch.pq_encode(e, model)
    got = simsearch.pq_topk_rerank(codes, e, model, q, k=5).collect()
    assert len(got) == 5 and got[0].vec_id == 0
