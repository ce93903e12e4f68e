"""Quantified tolerance/recall gates for the registry's four
approximate-by-design (`no_oracle`) queries — VERDICT r5 #2: these were
the weakest-checked queries (rows-only), so an approximation regression
could pass silently. Each gate computes the EXACT reference in-process
with the same engine and asserts a numeric bound on the DECLARED
registry query (not a private reimplementation), at the driver's
correctness scale factors.
"""

import pytest

from deimos_spark.queries import all_queries

SF = "/root/testdata/sf0.001"
SF_MID = "/root/testdata/sf0.01"

_QUERIES = {name: spec.builder for name, spec in all_queries().items()}


def _one_value(df):
    row = df.collect()
    assert len(row) == 1
    return list(row[0].asDict().values())[0]


def test_b13_approx_distinct_within_5pct(spark):
    """SURVEY §2B B13's implied bound: HLL++ at rsd=0.01 must land
    within ±5% of the exact count distinct."""
    from pyspark.sql import functions as F

    from deimos_spark.catalog import load_table

    for sf in (SF, SF_MID):
        approx = _one_value(_QUERIES["b13_approx_distinct"](spark, sf))
        exact = _one_value(
            load_table(spark, sf, "orders").agg(
                F.countDistinct("o_custkey")
            )
        )
        assert abs(approx - exact) <= 0.05 * exact, (sf, approx, exact)


def test_b13b_approx_quantile_within_2pct(spark):
    """approx_percentile(accuracy=1000) has rank error <= n/1000; on
    lineitem prices that is well inside 2% of the exact median value."""
    from pyspark.sql import functions as F

    from deimos_spark.catalog import load_table

    for sf in (SF, SF_MID):
        approx = float(
            _one_value(_QUERIES["b13b_approx_quantile"](spark, sf))
        )
        exact = float(
            _one_value(
                load_table(spark, sf, "lineitem").agg(
                    F.expr("percentile(l_extendedprice, 0.5)")
                )
            )
        )
        assert exact > 0
        assert abs(approx - exact) <= 0.02 * exact, (sf, approx, exact)


@pytest.mark.parametrize(
    "name",
    ["b33b_simsearch_lsh", "b33c_simsearch_ivf", "b33d_simsearch_pq"],
)
def test_b33_ann_recall_at_10(spark, name):
    """recall@10 of each ANN variant vs the exact b33 top-k >= 0.8 for
    the documented seeds — AND every returned (id, sim) that IS in the
    exact top-k carries the identical exactly-computed similarity
    (candidates are pruned, never re-scored approximately)."""
    for sf in (SF, SF_MID):
        exact = {
            r["vec_id"]: r["sim"]
            for r in _QUERIES["b33_simsearch_topk"](spark, sf).collect()
        }
        approx = {
            r["vec_id"]: r["sim"] for r in _QUERIES[name](spark, sf).collect()
        }
        hits = set(exact) & set(approx)
        recall = len(hits) / len(exact)
        assert recall >= 0.8, (name, sf, recall)
        for vid in hits:
            assert exact[vid] == approx[vid]
