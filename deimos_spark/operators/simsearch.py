"""Similarity search over embedding columns.

Baseline: brute-force cosine top-k — a single scan + TakeOrderedAndProject
(per-partition top-k, driver merge of k*numPartitions rows), so it scales
linearly with zero shuffle. Scale path: LSH bucketing (random hyperplanes)
to prune candidates, and an IVF-style coarse quantizer using KMeans.

No Python in the hot path: cosine is a codegen'd zip_with/aggregate fold.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from deimos_spark.functions.vectors import cosine, dot, lit_vector, to_double_array


def cosine_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int | None = 4,
) -> DataFrame:
    """Brute-force cosine top-k against a literal query vector.

    Plan shape: Scan → Project(cosine) → TakeOrderedAndProject(k). At 100 TB
    this is one pass, no shuffle; each executor returns only k rows.
    Deterministic: ties broken by id.
    """
    emb = to_double_array(vec_col)
    q = to_double_array(lit_vector(query_vec))
    sim = cosine(emb, q)
    if round_digits is not None:
        sim = F.round(sim, round_digits)
    return (
        df.select(F.col(id_col), sim.alias("sim"))
        .orderBy(F.col("sim").desc(), F.col(id_col))
        .limit(k)
    )


def cosine_topk_pandas(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int | None = 4,
) -> DataFrame:
    """Arrow/NumPy variant of brute-force cosine top-k for HIGH dims.

    The codegen'd fold (cosine_topk) wins below ~1k dims; above that, BLAS
    via a vectorized mapInPandas wins — each Arrow batch becomes one
    (batch × dim) @ (dim,) matmul. Per-partition top-k inside the kernel
    keeps driver traffic at k rows per partition, same as
    TakeOrderedAndProject.
    """
    import numpy as np
    import pandas as pd

    q = np.asarray(query_vec, dtype=np.float64)
    qn = np.linalg.norm(q)

    def kernel(batches):
        best: pd.DataFrame | None = None
        for pdf in batches:
            m = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
            sims = (m @ q) / (np.linalg.norm(m, axis=1) * qn)
            if round_digits is not None:
                sims = np.round(sims, round_digits)
            cur = pd.DataFrame({id_col: pdf[id_col], "sim": sims})
            best = cur if best is None else pd.concat((best, cur))
            best = best.sort_values(
                ["sim", id_col], ascending=[False, True]
            ).head(k)
        if best is not None:
            yield best

    import pyspark.sql.types as T

    id_type = df.schema[id_col].dataType
    out_schema = T.StructType(
        [T.StructField(id_col, id_type), T.StructField("sim", T.DoubleType())]
    )
    partial = df.select(id_col, vec_col).mapInPandas(kernel, out_schema)
    return partial.orderBy(F.col("sim").desc(), F.col(id_col)).limit(k)


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic random hyperplanes (driver-side constants, tiny)."""
    import numpy as np

    rng = np.random.RandomState(seed)
    return rng.randn(n_planes, dim).tolist()


def lsh_bucket(
    df: DataFrame,
    dim: int,
    n_planes: int = 8,
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Add a `bucket` column = sign-bits of random-hyperplane projections.

    Vectors in the same bucket are likely-similar (SRP-LSH). The bucket id is
    an int in [0, 2^n_planes) — use it to pre-partition/bucket the table so a
    query only scans matching buckets (candidate pruning at scale).
    """
    planes = _hyperplanes(dim, n_planes, seed)
    emb = to_double_array(vec_col)
    bucket = F.lit(0)
    for i, p in enumerate(planes):
        bit = F.when(dot(emb, to_double_array(lit_vector(p))) >= 0, 1).otherwise(0)
        bucket = bucket + F.shiftleft(bit, i)
    return df.withColumn("bucket", bucket)


def cosine_topk_lsh(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_planes: int = 8,
    probe_hamming: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: only score vectors whose LSH bucket is within
    `probe_hamming` bits of the query's bucket. At 100 TB with a bucketed
    table layout this prunes ~ (1 - probed/2^n_planes) of the scan."""
    dim = len(query_vec)
    planes = _hyperplanes(dim, n_planes, seed)
    qbits = 0
    for i, p in enumerate(planes):
        if sum(a * b for a, b in zip(query_vec, p)) >= 0:
            qbits |= 1 << i
    bucketed = lsh_bucket(df, dim, n_planes, vec_col, seed)
    # hamming distance via popcount of XOR — bit_count is JVM-side
    ham = F.bit_count(F.col("bucket").bitwiseXOR(F.lit(qbits)))
    candidates = bucketed.filter(ham <= probe_hamming)
    return cosine_topk(candidates, query_vec, k, id_col, vec_col)


def ivf_assign(
    df: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF coarse quantization: assign each vector to its nearest centroid
    (by dot product on normalized centroids). Write the result partitioned
    by `ivf_cell` so queries prune cells at the file level."""
    emb = to_double_array(vec_col)
    best_cell = F.lit(0)
    best_score = dot(emb, to_double_array(lit_vector(centroids[0])))
    for i, c in enumerate(centroids[1:], start=1):
        score = dot(emb, to_double_array(lit_vector(c)))
        better = score > best_score
        best_cell = F.when(better, F.lit(i)).otherwise(best_cell)
        best_score = F.when(better, score).otherwise(best_score)
    return df.withColumn("ivf_cell", best_cell)


def pairwise_cosine_exact(
    df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact all-pairs cosine >= threshold. O(n²) — correctness baseline for
    the LSH variant; at scale use `pairwise_cosine_above` (bucketed join).
    The id-inequality join is a broadcast nested loop: only valid for small
    n (the verification set), which is exactly its role."""
    left = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    right = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    pairs = left.join(F.broadcast(right), F.col("id_a") < F.col("id_b"))
    sim = cosine(to_double_array(F.col("va")), to_double_array(F.col("vb")))
    return (
        pairs.select("id_a", "id_b", F.round(sim, 4).alias("sim"))
        .filter(F.col("sim") >= threshold)
    )


def pairwise_cosine_above(
    df: DataFrame,
    threshold: float,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Embedding near-duplicate pairs: cosine >= threshold. LSH-bucketed
    self-join (equi-join on bucket → shuffle co-location, no cartesian).
    Returns (id_a, id_b, sim) with id_a < id_b."""
    b = lsh_bucket(df, dim, n_planes, vec_col, seed).select(
        F.col(id_col), F.col(vec_col), F.col("bucket")
    )
    left = b.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"), "bucket"
    )
    right = b.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"), "bucket"
    )
    pairs = left.join(right, "bucket").filter(F.col("id_a") < F.col("id_b"))
    sim = cosine(to_double_array(F.col("va")), to_double_array(F.col("vb")))
    return (
        pairs.select("id_a", "id_b", F.round(sim, 4).alias("sim"))
        .filter(F.col("sim") >= threshold)
        .distinct()
    )
