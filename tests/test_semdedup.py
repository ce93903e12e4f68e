"""SemDeDup (t27, operators/semdedup.py) — cluster-then-prune semantic
dedup (Abbas et al. 2023, arXiv:2303.09540). Semantics pinned on
hand-built vectors; the engine-vs-DuckDB construction identity is the
oracle row (t27_semdedup, green at sf0.001/0.01/0.1)."""

from pyspark.sql import types as T

from deimos_spark.operators.semdedup import semdedup_summary

SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField(
            "embedding", T.ArrayType(T.FloatType())
        ),
    ]
)


def _df(spark, rows):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows], SCHEMA
    )


def test_identical_pair_removes_exactly_one(spark):
    """Two identical vectors share a cluster and tie on centroid
    similarity — the dominance rule (tie -> lower id wins) removes
    exactly the higher id."""
    rows = [
        (0, [1, 0, 0, 0]),
        (1, [1, 0, 0, 0]),   # exact dup of 0
        (2, [0, 1, 0, 0]),   # orthogonal — never a near-dup
        (3, [0, 0, 1, 0]),
    ]
    out = semdedup_summary(
        _df(spark, rows), n_clusters=2, threshold=0.9
    ).collect()
    assert sum(r.n_vectors for r in out) == 4
    assert sum(r.n_removed for r in out) == 1
    assert len(out) <= 2


def test_no_near_dups_removes_nothing(spark):
    rows = [(i, [1.0 if j == i else 0.0 for j in range(4)]) for i in range(4)]
    out = semdedup_summary(
        _df(spark, rows), n_clusters=2, threshold=0.9
    ).collect()
    assert sum(r.n_vectors for r in out) == 4
    assert sum(r.n_removed for r in out) == 0


def test_near_dup_group_keeps_lowest_centroid_sim(spark):
    """Three mutual near-dups: everyone dominated by the group's
    lowest-centroid-similarity member survives the pruning — exactly
    one kept (the paper's keep-farthest-from-centroid rule, pairwise
    relaxation)."""
    base = [1.0, 0.05, 0.0, 0.0]
    rows = [
        (0, base),
        (1, [1.0, 0.06, 0.0, 0.0]),
        (2, [1.0, 0.04, 0.0, 0.0]),
        (3, [0.0, 0.0, 1.0, 0.0]),  # unrelated
    ]
    out = semdedup_summary(
        _df(spark, rows), n_clusters=2, threshold=0.99
    ).collect()
    assert sum(r.n_vectors for r in out) == 4
    # 3 near-dups -> 2 removed; the unrelated vector untouched
    assert sum(r.n_removed for r in out) == 2


def test_skewed_cluster_raises_loudly(spark):
    """VERDICT r10 #5: one cluster is one in-memory pandas group, so a
    cluster bigger than max_cluster_rows must fail fast with a message
    pointing at raising K — not OOM an executor at scale."""
    import pytest

    rows = [(i, [1.0, 0.0, 0.0, 0.0]) for i in range(6)]
    with pytest.raises(Exception, match="max_cluster_rows"):
        semdedup_summary(
            _df(spark, rows), n_clusters=1, threshold=0.9,
            max_cluster_rows=3,
        ).collect()


def test_blockwise_prune_matches_single_block(spark, monkeypatch):
    """The blockwise pair pass (memory cap, VERDICT r10 #5) is exact:
    forcing 2-row blocks must reproduce the one-shot result."""
    from deimos_spark.operators import semdedup as sd

    rows = [
        (0, [1.0, 0.05, 0.0, 0.0]),
        (1, [1.0, 0.06, 0.0, 0.0]),
        (2, [1.0, 0.04, 0.0, 0.0]),
        (3, [0.0, 0.0, 1.0, 0.0]),
        (4, [0.0, 0.01, 1.0, 0.0]),
    ]
    want = sorted(
        tuple(r) for r in semdedup_summary(
            _df(spark, rows), n_clusters=2, threshold=0.99
        ).collect()
    )
    monkeypatch.setattr(sd, "PRUNE_BLOCK_ROWS", 2)
    got = sorted(
        tuple(r) for r in sd.semdedup_summary(
            _df(spark, rows), n_clusters=2, threshold=0.99
        ).collect()
    )
    assert got == want and sum(r[2] for r in got) >= 1


def test_trained_centroids_override(spark):
    """The production path: centroids from a trainer (ivf_train) plug
    in via `centroids`, bypassing the seeded md5 selection."""
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [0.0, 0.0, 1.0, 0.0]),
    ]
    out = semdedup_summary(
        _df(spark, rows), threshold=0.9,
        centroids=[(100, [1.0, 0.0, 0.0, 0.0]), (200, [0.0, 0.0, 1.0, 0.0])],
    ).collect()
    by_c = {r.cluster_id: r for r in out}
    assert set(by_c) == {100, 200}
    assert by_c[100].n_vectors == 2 and by_c[100].n_removed == 1
    assert by_c[200].n_vectors == 1 and by_c[200].n_removed == 0


def test_empty_input_and_k_above_n(spark):
    """Robustness pins: an empty corpus yields an empty summary (the
    assignment kernel skips empty Arrow batches; no centroid job
    blowup), and n_clusters > N degrades to one cluster per vector."""
    empty = _df(spark, [])
    assert semdedup_summary(empty).collect() == []
    few = _df(spark, [(1, [1.0, 0, 0, 0]), (2, [0, 1.0, 0, 0])])
    out = semdedup_summary(few, n_clusters=8).collect()
    assert sorted((r.cluster_id, r.n_vectors, r.n_removed) for r in out) == [
        (1, 1, 0),
        (2, 1, 0),
    ]


def test_round4_half_up_matches_oracle_convention():
    """r12 regression (ADVICE): np.round is half-to-even; the oracle
    (DuckDB round, Spark F.round HALF_UP) rounds halves away from
    zero. 0.03125 (= 2^-5; 0.03125*1e4 = 312.5 is an EXACT float
    midpoint) must round to 0.0313, not 0.0312."""
    import numpy as np

    from deimos_spark.operators.semdedup import _round4_half_up

    a = np.array([0.03125, -0.03125, 0.00005, -0.00005, 0.6, 0.0])
    assert _round4_half_up(a).tolist() == [
        0.0313, -0.0313, 0.0001, -0.0001, 0.6, 0.0
    ]
    # the half-to-even behavior this replaces would have been:
    assert np.round(0.03125, 4) == 0.0312


def test_null_and_zero_norm_vectors_raise_naming_id(spark):
    """r12 regression (ADVICE): a NULL embedding crashed the job with
    an opaque numpy stack error, and a zero-norm vector silently
    yielded NaN sims. Both must refuse loudly, naming the row id
    (max_cluster_rows fail-fast precedent)."""
    import pytest

    rows = [(0, (1.0, 0.0, 0.0, 0.0)), (7, None), (2, (0.0, 1.0, 0.0, 0.0))]
    df = spark.createDataFrame(
        [(i, list(v) if v is not None else None) for i, v in rows], SCHEMA
    )
    with pytest.raises(Exception, match="NULL.*id=7"):
        semdedup_summary(df, n_clusters=1).collect()

    zero = _df(spark, [(0, [1, 0, 0, 0]), (9, [0, 0, 0, 0])])
    with pytest.raises(Exception, match="zero-norm.*id=9"):
        semdedup_summary(zero, n_clusters=1).collect()

    ragged = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0, 0.0]), (5, [1.0, 0.0])], SCHEMA
    )
    with pytest.raises(Exception, match="ragged.*id=5"):
        semdedup_summary(ragged, n_clusters=1).collect()


def test_sim_round4_lr_fast_bit_identical_to_gram_lr():
    """The BLAS+boundary-fixup gram (r14) must be BIT-identical to
    round4(gram_lr / outer-norms) — including engineered sims that sit
    exactly on and ~1e-12 off the .00005 rounding boundary, where the
    dgemm reassociation error could otherwise flip the round."""
    import numpy as np

    from deimos_spark.operators.semdedup import (
        _gram_lr,
        _norms_lr,
        _round4_half_up,
        _sim_round4_lr_fast,
    )

    rng = np.random.RandomState(11)
    x = rng.standard_normal((200, 64))
    y = rng.standard_normal((300, 64))
    # engineered boundary rows: unit-ish vectors whose pairwise cosine
    # lands exactly on / within 1e-12 of a .00005 midpoint
    base = np.zeros(64)
    base[0] = 1.0
    for eps, c in ((0.0, 0.12345), (1e-12, 0.00005), (-1e-12, 0.99995)):
        v = np.zeros(64)
        v[0] = c + eps
        v[1] = np.sqrt(max(0.0, 1.0 - (c + eps) ** 2))
        x = np.vstack([x, base])
        y = np.vstack([y, v])
    nx, ny = _norms_lr(x), _norms_lr(y)
    want = _round4_half_up(_gram_lr(x, y) / (nx[:, None] * ny[None, :]))
    got = _sim_round4_lr_fast(x, y, nx, ny)
    assert got.shape == want.shape
    assert np.array_equal(got, want)
