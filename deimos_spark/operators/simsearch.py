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

from deimos_spark.functions.vectors import (
    cosine,
    cosine_vs_literal,
    dot,
    lit_vector,
    to_double_array,
)


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
    Deterministic: ties broken by id. The cosine is unrolled into codegen'd
    scalar arithmetic for dims ≤ 256 (see vectors.cosine_vs_literal).
    """
    # pass the NAME through: cosine_vs_literal's string path builds the
    # whole unrolled expression as one SQL parse; wrapping in F.col here
    # forced the Column path (~5·dim py4j calls, ~0.45s of driver time
    # per plan build at 64 dims)
    sim = cosine_vs_literal(vec_col, query_vec)
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
                # half-AWAY-FROM-ZERO, matching cosine_topk's F.round
                # (HALF_UP) — np.round is half-to-even, which could
                # rank a row differently than the codegen path on an
                # exact midpoint (semdedup._round4_half_up precedent)
                scale = 10.0 ** round_digits
                sims = np.copysign(
                    np.floor(np.abs(sims) * scale + 0.5) / scale, sims
                )
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
    return df.withColumn("bucket", _bucket_expr(vec_col, planes))


def _bucket_expr(vec_col: str, planes: list[list[float]]):
    """Sign-bit bucket id as a codegen'd Column expression."""
    emb = to_double_array(vec_col)
    bucket = F.lit(0)
    for i, p in enumerate(planes):
        bit = F.when(
            dot(emb, to_double_array(lit_vector(p))) >= 0, 1
        ).otherwise(0)
        bucket = bucket + F.shiftleft(bit, i)
    return bucket


def cosine_topk_lsh(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_planes: int = 8,
    probe_hamming: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    n_tables: int = 1,
) -> DataFrame:
    """Approximate top-k: only score vectors whose LSH bucket is within
    `probe_hamming` bits of the query's bucket. At 100 TB with a bucketed
    table layout this prunes ~ (1 - probed/2^n_planes) of the scan.

    `n_tables > 1` is the standard LSH recall amplifier: L independent
    plane sets, a vector is a candidate when ANY table's bucket is
    within the probe radius (candidate-miss probability decays as
    miss_one^L). Here that is an OR of L codegen'd popcount predicates
    over ONE scan — no join, no extra pass; the scanned fraction grows
    ~L-fold, which is the documented recall/cost dial."""
    dim = len(query_vec)
    cond = None
    for t in range(n_tables):
        planes = _hyperplanes(dim, n_planes, seed + t)
        qbits = 0
        for i, p in enumerate(planes):
            if sum(a * b for a, b in zip(query_vec, p)) >= 0:
                qbits |= 1 << i
        # hamming distance via popcount of XOR — bit_count is JVM-side
        ham = F.bit_count(
            _bucket_expr(vec_col, planes).bitwiseXOR(F.lit(qbits))
        )
        c = ham <= probe_hamming
        cond = c if cond is None else cond | c
    return cosine_topk(df.filter(cond), query_vec, k, id_col, vec_col)


def ivf_assign(
    df: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF coarse quantization: assign each vector to its nearest centroid
    (L2). Write the result partitioned by `ivf_cell` so queries prune cells
    at the file level.

    Implemented as an Arrow-batched pandas_udf: one (batch × dim) @
    (dim × n_cells) BLAS matmul per batch. The expression-tree alternative
    (n_cells chained when/dot folds) is quadratically slower to *analyze*
    and runs interpreted — a vectorized kernel is the right tool here.
    """
    from deimos_spark.schemas.kernels import ivf_cell_udf

    return df.withColumn("ivf_cell", ivf_cell_udf(centroids)(F.col(vec_col)))


def ivf_train(
    df: DataFrame,
    n_cells: int = 16,
    vec_col: str = "embedding",
    max_train: int = 100_000,
    seed: int = 42,
    max_iter: int = 10,
) -> list[list[float]]:
    """Train an IVF coarse quantizer: k-means centroids over a bounded
    sample of the embedding column.

    At 100 TB you never train the coarse quantizer distributed — the
    standard IVF recipe (FAISS-style) samples a bounded training set
    (~100k vectors regardless of table size), runs Lloyd's locally, and
    ships the tiny model (n_cells × dim doubles) back into the scan plan as
    literals. The only cluster work is one bounded-sample collect; recall
    comes from nprobe, so a few Lloyd's rounds suffice.
    """
    import numpy as np

    n = df.count()
    frac = min(1.0, max_train / max(n, 1))
    train = df.select(to_double_array(vec_col).alias("_v"))
    if frac < 1.0:
        train = train.sample(fraction=frac, seed=seed)
    x = np.asarray(
        [r["_v"] for r in train.limit(max_train).collect()], dtype=np.float64
    )
    rng = np.random.RandomState(seed)
    cents = x[rng.choice(len(x), size=min(n_cells, len(x)), replace=False)]
    for _ in range(max_iter):
        # assign → recenter; empty cells re-seeded from the farthest points
        d2 = ((x[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        new = np.empty_like(cents)
        for c in range(len(cents)):
            members = x[assign == c]
            if len(members):
                new[c] = members.mean(axis=0)
            else:
                new[c] = x[d2.min(axis=1).argmax()]
        if np.allclose(new, cents):
            break
        cents = new
    return cents.tolist()


def ivf_topk(
    df: DataFrame,
    query_vec: list[float],
    centroids: list[list[float]],
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int | None = 4,
) -> DataFrame:
    """IVF-pruned approximate top-k: score only vectors in the `nprobe`
    cells whose centroids are nearest the query.

    Probe-cell selection is driver-side (n_cells dot products on a tiny
    model); the table-side plan is Filter(ivf_cell IN probes) → cosine →
    TakeOrderedAndProject. With the table written partitioned by ivf_cell
    the filter becomes partition pruning — the scan reads nprobe/n_cells of
    the files, which is the entire point at 100 TB. nprobe = n_cells
    degrades gracefully to exact brute force.
    """
    probes = probe_cells(query_vec, centroids, nprobe)
    assigned = ivf_assign(df, centroids, vec_col)
    pruned = assigned.filter(F.col("ivf_cell").isin(probes))
    return cosine_topk(pruned, query_vec, k, id_col, vec_col, round_digits)


def probe_cells(
    query_vec: list[float], centroids: list[list[float]], nprobe: int
) -> list[int]:
    """The `nprobe` cell ids nearest the query — ranked by the SAME metric
    as assignment (L2), so a vector equal to the query is always in the
    first probed cell. Driver-side: n_cells dot products on a tiny model."""
    import numpy as np

    q = np.asarray(query_vec, dtype=np.float64)
    cents = np.asarray(centroids, dtype=np.float64)
    d = ((cents - q[None, :]) ** 2).sum(axis=1)
    return [int(i) for i in np.argsort(d)[:nprobe]]


def write_ivf_clustered(
    df: DataFrame,
    path: str,
    centroids: list[list[float]],
    vec_col: str = "embedding",
    mode: str = "overwrite",
) -> None:
    """Materialize the IVF layout: assign cells once, write
    hive-partitioned by `ivf_cell`. This is the ANN scale path made
    physical — after this write, a probe-cell filter is PARTITION PRUNING:
    the scan lists and reads only nprobe/n_cells of the files, so query
    cost scales with the probed fraction, not the table. Pair with
    periodic `layout.compact_files` per partition as vectors accrete."""
    assigned = ivf_assign(df, centroids, vec_col)
    assigned.write.mode(mode).partitionBy("ivf_cell").parquet(path)


def ivf_topk_clustered(
    spark,
    path: str,
    query_vec: list[float],
    centroids: list[list[float]],
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int | None = 4,
) -> DataFrame:
    """IVF top-k over a table materialized by `write_ivf_clustered`: no
    per-row assignment UDF at query time — `ivf_cell` is a partition
    column, so Filter(ivf_cell IN probes) prunes directories before a
    single byte is read. The plan should show the probe set under
    PartitionFilters (asserted in tests)."""
    probes = probe_cells(query_vec, centroids, nprobe)
    pruned = spark.read.parquet(path).filter(F.col("ivf_cell").isin(probes))
    return cosine_topk(pruned, query_vec, k, id_col, vec_col, round_digits)


def write_lsh_clustered(
    df: DataFrame,
    path: str,
    dim: int,
    n_planes: int = 8,
    vec_col: str = "embedding",
    seed: int = 42,
    mode: str = "overwrite",
) -> None:
    """Materialize the SRP-LSH layout: compute each vector's sign-bit
    bucket once, write hive-partitioned by `lsh_bucket` — the LSH twin
    of `write_ivf_clustered`. After this write a multiprobe query's
    bucket set becomes PARTITION PRUNING (only probed/2^n_planes of the
    files are listed or read), so b33b-style queries scale with the
    probed fraction, not the table."""
    planes = _hyperplanes(dim, n_planes, seed)
    df.withColumn("lsh_bucket", _bucket_expr(vec_col, planes)).write.mode(
        mode
    ).partitionBy("lsh_bucket").parquet(path)


def lsh_topk_clustered(
    spark,
    path: str,
    query_vec: list[float],
    k: int = 10,
    n_planes: int = 8,
    probe_hamming: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    round_digits: int | None = 4,
) -> DataFrame:
    """Approximate top-k over a table materialized by
    `write_lsh_clustered`: the probe set (all buckets within
    `probe_hamming` of the query's) is a driver-side integer list, so
    Filter(lsh_bucket IN probes) prunes partitions before any byte is
    read — no per-row bucket computation at query time."""
    dim = len(query_vec)
    planes = _hyperplanes(dim, n_planes, seed)
    qbits = 0
    for i, p in enumerate(planes):
        if sum(a * b for a, b in zip(query_vec, p)) >= 0:
            qbits |= 1 << i
    probes = [
        b
        for b in range(1 << n_planes)
        if bin(b ^ qbits).count("1") <= probe_hamming
    ]
    pruned = spark.read.parquet(path).filter(
        F.col("lsh_bucket").isin(probes)
    )
    return cosine_topk(pruned, query_vec, k, id_col, vec_col, round_digits)


# Sized from measurement, not guesswork (r12): 20k rows = 200M ordered
# pairs took >40 min of interpreted-cosine BNLJ on local[32] — already
# the outer limit of "cheap verification baseline". The old 100k cap
# would have permitted ~16 h. Production pairs go through
# pairwise_cosine_above's bucketed join; don't raise this at scale.
MAX_EXACT_PAIRWISE_ROWS = 20_000


def pairwise_cosine_exact(
    df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_rows: int = MAX_EXACT_PAIRWISE_ROWS,
) -> DataFrame:
    """Exact all-pairs cosine >= threshold. O(n²) — correctness baseline for
    the LSH variant; at scale use `pairwise_cosine_above` (bucketed join).
    The id-inequality join is a broadcast nested loop: only valid for small
    n (the verification set), which is exactly its role.

    GUARDED against misuse as a production path: raises if the input
    exceeds `max_rows` (the count is a cheap metadata-only scan for parquet
    sources). Sample or bucket first — don't raise the cap at scale."""
    n = df.count()
    if n > max_rows:
        raise ValueError(
            f"pairwise_cosine_exact is an O(n²) verification baseline: input"
            f" has {n} rows > max_rows={max_rows}. Use pairwise_cosine_above"
            f" (LSH-bucketed) for production-scale data, or sample first."
        )
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
