"""Metric-ball-blocked EXACT pair relation (VERDICT r12 #2 — lifts the
Θ(n²) 20k-row cap on t28's pair source): the blocked operator must
produce the IDENTICAL pair set to pairwise_cosine_exact (it feeds an
oracle-checked query), prune provably-empty cell pairs on clustered
data, and never plan a cartesian/BNLJ."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from deimos_spark.operators import simsearch

SF_DIR = "/root/testdata/sf0.01"


def _pairs(df):
    return {(r.id_a, r.id_b, r.sim) for r in df.collect()}


def test_blocked_equals_exact_on_registry_data(spark):
    """Bit-for-bit the t09 relation (round-to-4 included) on the real
    registry input — isotropic embeddings, the documented no-prune
    worst case: correctness must hold even when blocking can't help."""
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    exact = _pairs(simsearch.pairwise_cosine_exact(emb, 0.4))
    blocked = _pairs(simsearch.pairwise_cosine_exact_blocked(emb, 0.4))
    assert exact and blocked == exact


def test_blocked_equals_exact_across_thresholds(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    for t in (0.2, 0.6, 0.9):
        exact = _pairs(simsearch.pairwise_cosine_exact(emb, t))
        blocked = _pairs(
            simsearch.pairwise_cosine_exact_blocked(emb, t, n_cells=8)
        )
        assert blocked == exact, t


def _topical(spark, topics=16, members=24, dim=32, noise=0.02, seed=7):
    rng = np.random.RandomState(seed)
    dirs = rng.standard_normal((topics, dim))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    x = (
        np.repeat(dirs, members, axis=0)
        + rng.standard_normal((topics * members, dim)) * noise
    )
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    pdf = pd.DataFrame(
        {
            "vec_id": np.arange(len(x), dtype=np.int64),
            "embedding": [r.tolist() for r in x],
        }
    )
    return spark.createDataFrame(pdf)


def test_blocked_prunes_clustered_corpus_and_stays_exact(spark):
    """On a topical corpus (the realistic embedding shape) the
    geodesic triangle-inequality bound must discard most cell pairs —
    the property that makes the uncapped operator subquadratic — while
    the surviving candidates still reproduce the exact pair set."""
    emb = _topical(spark)
    exact = _pairs(simsearch.pairwise_cosine_exact(emb, 0.8))
    assert len(exact) >= 16 * (24 * 23) // 2  # within-topic pairs all hit

    blocked = simsearch.pairwise_cosine_exact_blocked(
        emb, 0.8, n_cells=32, max_iter=10
    )
    assert _pairs(blocked) == exact

    # measure the pruning directly: candidate cell pairs << all pairs
    from deimos_spark.operators.simsearch import (
        _blocked_cell_pairs,
        _kmeans,
        _unit_rows,
        to_double_array,
    )
    from deimos_spark.schemas.kernels import ivf_cell_dist_udf

    x = np.asarray(
        [
            r["_v"]
            for r in emb.select(
                to_double_array("embedding").alias("_v")
            ).collect()
        ]
    )
    cents = _kmeans(_unit_rows(x), 32, 42, 10)
    cd = ivf_cell_dist_udf(cents.tolist())(F.col("embedding"))
    a = emb.select(
        cd.getField("cell").alias("c"), cd.getField("dist").alias("d")
    ).toPandas()
    radii = a.groupby("c")["d"].max().to_dict()
    cand = _blocked_cell_pairs(cents, radii, 0.8)
    half = {(min(p), max(p)) for p in cand}
    k = len(radii)
    assert len(half) * 3 <= k * (k + 1) // 2, (len(half), k)


def test_blocked_plan_has_no_cartesian(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    plan = (
        simsearch.pairwise_cosine_exact_blocked(emb, 0.4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_blocked_degenerate_inputs(spark):
    one = spark.createDataFrame(
        [(1, [1.0, 0.0])], "vec_id long, embedding array<double>"
    )
    assert simsearch.pairwise_cosine_exact_blocked(one, 0.5).count() == 0
    empty = one.filter("vec_id < 0")
    assert simsearch.pairwise_cosine_exact_blocked(empty, 0.5).count() == 0
    # zero-norm vectors never pair (cosine NULL), exactly like exact
    z = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [0.0, 0.0]), (3, [1.0, 0.0]), (4, [1.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    got = _pairs(simsearch.pairwise_cosine_exact_blocked(z, 0.5, n_cells=2))
    assert got == _pairs(simsearch.pairwise_cosine_exact(z, 0.5)) == {
        (3, 4, 1.0)
    }


def test_dot_unrolled_nullprop_matches_fold(spark):
    """The confirm stage's codegen'd dot must be BIT-identical to the
    interpreted fold — including NULL elements, NULL arrays, and ragged
    lengths (NULL-propagating, not zero-padding)."""
    from deimos_spark.functions.vectors import (
        dot,
        dot_cols_unrolled_nullprop,
        to_double_array,
    )

    rng = np.random.RandomState(3)
    rows = [
        (rng.standard_normal(4).tolist(), rng.standard_normal(4).tolist())
        for _ in range(50)
    ]
    rows += [
        (None, [1.0, 2.0, 3.0, 4.0]),
        ([1.0, None, 3.0, 4.0], [1.0, 2.0, 3.0, 4.0]),
        ([1.0, 2.0], [1.0, 2.0, 3.0, 4.0]),  # ragged -> NULL, like zip_with
    ]
    df = spark.createDataFrame(
        rows, "a array<double>, b array<double>"
    )
    out = df.select(
        dot(to_double_array(F.col("a")), to_double_array(F.col("b"))).alias(
            "fold"
        ),
        dot_cols_unrolled_nullprop("a", "b", 4).alias("unrolled"),
    ).collect()
    for r in out:
        if r["fold"] is None:
            assert r["unrolled"] is None
        else:
            assert r["fold"] == r["unrolled"]  # exact equality, not approx


def test_budget_guard_refuses_unprunable_input(spark):
    """VERDICT r13 #3: in the regime the triangle bound cannot prune
    (isotropic high-dim at a loose threshold) the operator must refuse
    LOUDLY with the pair estimate in the message — not silently launch
    the quadratic join — and point at the approximate operators built
    for that regime."""
    rng = np.random.RandomState(3)
    x = rng.standard_normal((400, 64))
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "vec_id": np.arange(400, dtype=np.int64),
                "embedding": [r.tolist() for r in x],
            }
        )
    )
    with pytest.raises(ValueError, match="max_pair_budget") as ei:
        simsearch.pairwise_cosine_exact_blocked(
            df, 0.1, n_cells=8, max_pair_budget=1_000
        )
    msg = str(ei.value)
    assert "pairs" in msg and "t06/t08" in msg  # estimate + LSH pointer

    # soft budget: warns but still returns the exact relation
    with pytest.warns(UserWarning, match="warn_pair_budget"):
        got = _pairs(
            simsearch.pairwise_cosine_exact_blocked(
                df, 0.1, n_cells=8, warn_pair_budget=1_000
            )
        )
    assert got == _pairs(simsearch.pairwise_cosine_exact(df, 0.1))


def test_auto_n_cells_scales_with_corpus():
    """n_cells=None derives cells from n at STRESS_T28's measured
    density (~640 rows/cell), clamped [16, 4096] — the static 16 was a
    fixture constant that meant ~600k-row cells at n=10M."""
    from deimos_spark.operators.simsearch import _auto_n_cells

    assert _auto_n_cells(500) == 16
    assert _auto_n_cells(2_560 * 30) == 120  # the STRESS_T28 K=30 point
    assert _auto_n_cells(10_000_000) == 4096


def test_blocked_boundary_sims_match_exact(spark):
    """r14 regression: the BLAS confirm kernel rounds via scaled
    arithmetic with an exact-recompute band; sims engineered to land
    exactly ON and ~1e-12 OFF .00005 rounding midpoints must still be
    bit-identical to the expression path (which rounds via Spark's
    BigDecimal HALF_UP)."""
    import numpy as np
    import pandas as pd

    rows = []
    vid = 0
    base = [1.0] + [0.0] * 7
    rows.append((vid, base))
    vid += 1
    # cos(base, v) == c exactly-ish for v = [c, sqrt(1-c^2), 0...]:
    # pick c on/near round-4 midpoints, including the threshold's own
    # boundary (0.39995 rounds UP to 0.4 under HALF_UP)
    for c in (0.39995, 0.39995 - 1e-12, 0.40005, 0.12345,
              0.99995, 0.00005, 0.5, 0.49995):
        v = [float(c), float(np.sqrt(max(0.0, 1.0 - c * c)))] + [0.0] * 6
        rows.append((vid, v))
        vid += 1
    df = spark.createDataFrame(
        pd.DataFrame({"vec_id": [r[0] for r in rows],
                      "embedding": [r[1] for r in rows]})
    )
    for t in (0.4, 0.5, 0.0001):
        exact = _pairs(simsearch.pairwise_cosine_exact(df, t))
        blocked = _pairs(
            simsearch.pairwise_cosine_exact_blocked(df, t, n_cells=3)
        )
        assert blocked == exact, t


def test_blocked_equals_exact_randomized_sweep(spark):
    """r14 fuzz: the BLAS confirm kernel must reproduce the expression
    path bit-for-bit across random corpus shapes — clustered and
    isotropic, odd dims, dims above UNROLL_MAX_DIM (where exact falls
    back to the interpreted fold), tight and loose thresholds, and
    n_cells that force both intra- and cross-cell confirm tasks."""
    import numpy as np
    import pandas as pd

    rng = np.random.RandomState(20260816)
    cases = [
        # (n, dim, clustered, threshold, n_cells)
        (60, 7, True, 0.6, 4),
        (80, 16, False, 0.2, 5),
        (50, 3, True, 0.9, 2),
        (64, 300, False, 0.15, 4),   # dim > UNROLL_MAX_DIM: fold path
        (40, 8, True, 0.0001, 3),    # near-zero threshold, dense output
    ]
    for n, dim, clustered, thr, cells in cases:
        if clustered:
            k = max(2, n // 12)
            dirs = rng.standard_normal((k, dim))
            dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
            x = dirs[rng.randint(0, k, n)] + rng.standard_normal(
                (n, dim)) * 0.05
        else:
            x = rng.standard_normal((n, dim))
        nrm = np.linalg.norm(x, axis=1, keepdims=True)
        x = x / np.where(nrm == 0, 1.0, nrm)
        df = spark.createDataFrame(
            pd.DataFrame(
                {"vec_id": np.arange(n, dtype=np.int64),
                 "embedding": [r.tolist() for r in x]}
            )
        )
        exact = _pairs(simsearch.pairwise_cosine_exact(df, thr))
        blocked = _pairs(
            simsearch.pairwise_cosine_exact_blocked(
                df, thr, n_cells=cells, max_iter=4
            )
        )
        assert blocked == exact, (n, dim, clustered, thr, cells)
