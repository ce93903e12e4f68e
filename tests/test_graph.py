"""Connected components: duplicate-cluster formation over pair edges."""

from pyspark.sql import functions as F

from deimos_spark.operators.graph import cluster_sizes, connected_components


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "id_a long, id_b long")


def test_components_chain_and_triangle(spark):
    # chain 1-2-3-4-5 (diameter tests multi-round propagation),
    # triangle 10-11-12, separate pair 20-21
    e = _edges(
        spark,
        [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11), (11, 12), (10, 12), (20, 21)],
    )
    got = {
        (r["node"], r["comp"]) for r in connected_components(e).collect()
    }
    assert got == {
        (1, 1), (2, 1), (3, 1), (4, 1), (5, 1),
        (10, 10), (11, 10), (12, 10),
        (20, 20), (21, 20),
    }


def test_components_label_direction_independent(spark):
    # min id arrives from the HIGH side of edges too
    e = _edges(spark, [(5, 1), (4, 5), (2, 4)])
    got = {(r["node"], r["comp"]) for r in connected_components(e).collect()}
    assert got == {(1, 1), (2, 1), (4, 1), (5, 1)}


def test_cluster_sizes_report(spark):
    e = _edges(spark, [(1, 2), (2, 3), (7, 8)])
    rows = [(r["comp"], r["size"]) for r in cluster_sizes(e).collect()]
    assert rows == [(1, 3), (7, 2)]


def test_long_chain_converges_within_max_iters(spark):
    n = 12
    e = _edges(spark, [(i, i + 1) for i in range(n)])
    got = {(r["node"], r["comp"]) for r in connected_components(e).collect()}
    assert got == {(i, 0) for i in range(n + 1)}


def test_keep_representatives_applies_dedup(spark):
    """t28: survivors = isolated docs + each cluster's min id; other
    columns pass through untouched."""
    from deimos_spark.operators.graph import keep_representatives

    corpus = spark.createDataFrame(
        [(i, f"d{i}") for i in range(1, 8)], "doc_id long, body string"
    )
    # clusters {1,2,3} (chain) and {5,6}; 4 and 7 isolated
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6)], "id_a long, id_b long"
    )
    kept = keep_representatives(corpus, edges, "doc_id")
    assert sorted(r.doc_id for r in kept.collect()) == [1, 4, 5, 7]
    assert kept.columns == ["doc_id", "body"]


def test_keep_representatives_no_edges_keeps_all(spark):
    from deimos_spark.operators.graph import keep_representatives

    corpus = spark.createDataFrame([(1,), (2,)], "doc_id long")
    edges = spark.createDataFrame([], "id_a long, id_b long")
    assert keep_representatives(corpus, edges, "doc_id").count() == 2
