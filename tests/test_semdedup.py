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
