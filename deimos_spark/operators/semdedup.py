"""SemDeDup — semantic deduplication by cluster-then-prune (Abbas et
al. 2023, arXiv:2303.09540 "SemDeDup: Data-efficient learning at
web-scale through semantic deduplication").

The published recipe: k-means the embedding space, then WITHIN each
cluster mark pairs above a cosine threshold as semantic duplicates and
keep the member with the LOWEST similarity to the centroid (the
"farthest from centroid" representative — it preserves the cluster's
diversity better than keeping a random member).

Engine-portable determinism: the clustering here is a SEEDED
assignment, not Lloyd's — centroids are the `n_clusters` vectors with
the smallest md5(salt || vec_id), every vector joins its
highest-cosine centroid (ties to the lowest centroid id). That makes
the whole operator reproducible in ANSI SQL (the DuckDB oracle runs
the identical construction), exactly like the hashed-unigram stand-in
DSIR/t23 use for KenLM. The production path composes with the real
k-means trainer (`simsearch.ivf_train`) by passing `centroid_ids`.

Scale shape (100 TB):
- centroid selection: one TakeOrdered of n_clusters rows (bounded,
  like DSIR's <= 4096-row model collect) — broadcast back as a tiny
  relation, never literals in a megabyte expression tree.
- assignment: broadcast cross-join (N x K rows, K bounded) -> one
  row_number window PARTITIONED by vec_id — no unpartitioned window,
  no driver state.
- pruning: the pair join is keyed on the CLUSTER id — per-cluster
  quadratic exactly as the paper's per-cluster GPU pass; K is chosen
  so N/K is bounded (the paper uses K ~ sqrt(N)-ish), and the join
  never goes cartesian across clusters.
- dominance rule: v is removed iff SOME same-cluster near-dup u has a
  strictly lower centroid-similarity (tie: lower id wins) — the
  pairwise relaxation of the paper's per-group keep-one; full
  connected-component grouping is the separate t20 operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from deimos_spark.functions.vectors import cosine, to_double_array

__all__ = ["semdedup_summary"]


def semdedup_summary(
    df: DataFrame,
    n_clusters: int = 8,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    salt: str = "semdedup",
) -> DataFrame:
    """Per-cluster SemDeDup summary: (cluster_id, n_vectors,
    n_removed) — cluster_id is the centroid's vec_id; all-integer
    output so the oracle comparison is exact. Centroid similarities
    are rounded to 4 digits BEFORE any comparison so the dominance
    rule is decided on values both engines agree on bit-for-bit
    (the t09 precedent: double-cast cosine, round 4)."""
    cent = (
        df.select(
            F.col(id_col).alias("_cid"),
            to_double_array(vec_col).alias("_cv"),
            F.md5(
                F.concat(F.lit(salt), F.col(id_col).cast("string"))
            ).alias("_h"),
        )
        .orderBy("_h", "_cid")
        .limit(n_clusters)
        .drop("_h")
    )
    e = df.select(F.col(id_col), to_double_array(vec_col).alias("_v"))
    sims = e.crossJoin(F.broadcast(cent)).select(
        id_col,
        "_v",
        "_cid",
        F.round(cosine(F.col("_v"), F.col("_cv")), 4).alias("_cs"),
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("_cs").desc(), F.col("_cid").asc()
    )
    assigned = (
        sims.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select(id_col, "_cid", "_cs", "_v")
    )
    a = assigned.select(
        F.col(id_col).alias("_ida"),
        F.col("_cid"),
        F.col("_cs").alias("_csa"),
        F.col("_v").alias("_va"),
    )
    b = assigned.select(
        F.col(id_col).alias("_idb"),
        F.col("_cid"),
        F.col("_cs").alias("_csb"),
        F.col("_v").alias("_vb"),
    )
    pair_sim = F.round(cosine(F.col("_va"), F.col("_vb")), 4)
    dominated = (F.col("_csb") < F.col("_csa")) | (
        (F.col("_csb") == F.col("_csa")) & (F.col("_idb") < F.col("_ida"))
    )
    removed = (
        a.join(b, "_cid")
        .where(F.col("_ida") != F.col("_idb"))
        .where(pair_sim >= threshold)
        .where(dominated)
        .select(F.col("_ida").alias(id_col))
        .distinct()
        .withColumn("_rm", F.lit(True))
    )
    return (
        assigned.join(removed, id_col, "left")
        .groupBy(F.col("_cid").alias("cluster_id"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_vectors"),
            F.sum(F.col("_rm").isNotNull().cast("int"))
            .cast("bigint")
            .alias("n_removed"),
        )
        .orderBy("cluster_id")
    )
