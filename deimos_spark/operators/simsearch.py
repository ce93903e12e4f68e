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

from deimos_spark.functions import vectors
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
    return _kmeans(x, n_cells, seed, max_iter).tolist()


def ivf_topk(
    df: DataFrame,
    query_vec: list[float],
    centroids: list[list[float]],
    k: int = 10,
    nprobe: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int | None = 4,
) -> DataFrame:
    """IVF-pruned approximate top-k: score only vectors in the `nprobe`
    cells whose centroids are nearest the query. nprobe=None derives
    the measured scale rule max(6, 30%·n_cells) — see scale_nprobe.

    Probe-cell selection is driver-side (n_cells dot products on a tiny
    model); the table-side plan is Filter(ivf_cell IN probes) → cosine →
    TakeOrderedAndProject. With the table written partitioned by ivf_cell
    the filter becomes partition pruning — the scan reads nprobe/n_cells of
    the files, which is the entire point at 100 TB. nprobe = n_cells
    degrades gracefully to exact brute force.
    """
    if nprobe is None:
        nprobe = scale_nprobe(len(centroids))
    probes = probe_cells(query_vec, centroids, nprobe)
    assigned = ivf_assign(df, centroids, vec_col)
    pruned = assigned.filter(F.col("ivf_cell").isin(probes))
    return cosine_topk(pruned, query_vec, k, id_col, vec_col, round_digits)


def scale_nprobe(n_cells: int) -> int:
    """The measured IVF deployment rule (STRESS_ANN.json, VERDICT r13
    #2): a CONSTANT nprobe decays as cells grow with the corpus —
    recall@10 fell 0.99→0.71 at nprobe=6 while cells grew 8→120 —
    whereas nprobe = max(6, 30% of n_cells) held ≥0.875 across every
    ANN variant and corpus scale in the artifact. This is the default
    every probe-taking entry point derives when nprobe is not given;
    the old constant (4) was a 500-row-fixture setting."""
    return min(max(6, round(0.3 * n_cells)), int(n_cells))


def scale_shortlist(n_codes: int, k: int = 10) -> int:
    """The measured IVFADC+R shortlist rule (STRESS_ANN.json): rerank
    recall is SHORTLIST-capped, not probe-capped — at 60k codes recall
    moved 0.75→0.91 as the shortlist grew 50→800 with nprobe already at
    the scale rule. The artifact's gated point is 800 at 60k rows
    (n_codes/75); floor at the fixture's 50 (sufficient ≤2k rows) and
    never below 5·k rerank candidates."""
    import math

    return max(50, 5 * int(k), math.ceil(n_codes / 75))


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
    nprobe: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int | None = 4,
) -> DataFrame:
    """IVF top-k over a table materialized by `write_ivf_clustered`: no
    per-row assignment UDF at query time — `ivf_cell` is a partition
    column, so Filter(ivf_cell IN probes) prunes directories before a
    single byte is read. The plan should show the probe set under
    PartitionFilters (asserted in tests). nprobe=None derives the
    measured scale rule (scale_nprobe)."""
    if nprobe is None:
        nprobe = scale_nprobe(len(centroids))
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
    sources). Sample or bucket first — don't raise the cap at scale.

    Execution shape (r14): the stream side of the broadcast NL join is
    REPARTITIONED to the session's parallelism — a small parquet table
    arrives as ONE input split, which serialized the whole n² pair scan
    onto a single task (measured: 2k rows × 64 dims = 137s single-task
    vs ~2s spread over 32) — and, when the column is uniform-width (the
    embedding-table contract; probed with one bounded min/max-size agg),
    the per-pair cosine is the codegen'd unrolled dot/norm split from
    the blocked operator's confirm stage, bit-identical to the
    interpreted fold (same association, NULL and ragged behavior —
    pinned by tests/test_blocked_pairs.py) at ~25µs/pair less. Ragged
    or >UNROLL_MAX_DIM columns keep the fold."""
    n = df.count()
    if n > max_rows:
        raise ValueError(
            f"pairwise_cosine_exact is an O(n²) verification baseline: input"
            f" has {n} rows > max_rows={max_rows}. Use pairwise_cosine_above"
            f" (LSH-bucketed) for production-scale data, or sample first."
        )
    sz = df.agg(
        F.min(F.size(F.col(vec_col))).alias("mn"),
        F.max(F.size(F.col(vec_col))).alias("mx"),
    ).first()
    dim = sz["mn"] if sz["mn"] == sz["mx"] else None
    unroll = dim is not None and 0 < dim <= vectors.UNROLL_MAX_DIM
    par = df.sparkSession.sparkContext.defaultParallelism
    if unroll:
        na = vectors.norm_unrolled(vec_col, dim)
        left = df.select(
            F.col(id_col).alias("id_a"),
            F.col(vec_col).alias("va"),
            na.alias("_na"),
        ).repartition(par)
        right = df.select(
            F.col(id_col).alias("id_b"),
            F.col(vec_col).alias("vb"),
            na.alias("_nb"),
        )
        pairs = left.join(F.broadcast(right), F.col("id_a") < F.col("id_b"))
        sim = vectors.dot_cols_unrolled_nullprop("va", "vb", dim) / (
            F.col("_na") * F.col("_nb")
        )
    else:
        left = df.select(
            F.col(id_col).alias("id_a"), F.col(vec_col).alias("va")
        ).repartition(par)
        right = df.select(
            F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb")
        )
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


def _blocked_cell_pairs(
    cents, radii: dict[int, float], threshold: float
) -> list[tuple[int, int]]:
    """Candidate cell pairs for metric-ball blocking, BOTH orientations
    for a≠b (plus (a,a) once): unit vectors with cos ≥ t lie within
    GEODESIC angle θ_t = arccos(t) of each other, so by the spherical
    triangle inequality any qualifying cross-cell pair forces
    angle(ĉ_a, ĉ_b) ≤ r_a + θ_t + r_b (radii = max member angle to the
    cell's unit centroid direction, from ivf_cell_dist_udf) — every
    other cell pair is PROVABLY empty and never joined. Angles beat
    chords here: at t=0.4 the chord radius (1.095) is as large as a
    typical inter-centroid chord and prunes nothing. t is relaxed by
    1e-4 so pairs that only qualify after the output's round-to-4
    (sim ∈ [t−5e-5, t)) are still covered, plus 1e-9 for arccos
    rounding. Driver cost: one K×K angle matrix, K = n_cells."""
    import numpy as np

    t_eff = threshold - 1e-4
    theta = float(np.arccos(np.clip(t_eff, -1.0, 1.0)))
    c = np.asarray(cents, dtype=np.float64)
    n = np.sqrt((c * c).sum(axis=1, keepdims=True))
    cu = np.divide(c, n, out=np.zeros_like(c), where=n > 0)
    ca = np.arccos(np.clip(cu @ cu.T, -1.0, 1.0))
    # vectorized over the K×K grid (a Python double loop is itself a
    # quadratic driver cost at large n_cells); rows/cols restricted to
    # NON-EMPTY cells (radii keys)
    cells = np.asarray(sorted(radii), dtype=np.int64)
    r = np.asarray([radii[a] for a in cells])
    sub = ca[np.ix_(cells, cells)]
    ok = sub <= r[:, None] + r[None, :] + theta + 1e-9
    ai, bi = np.nonzero(np.triu(ok))
    pairs: list[tuple[int, int]] = []
    for a, b in zip(cells[ai], cells[bi]):
        pairs.append((int(a), int(b)))
        if a != b:
            pairs.append((int(b), int(a)))
    return pairs


def _auto_n_cells(n: int) -> int:
    """Cell count for metric-ball blocking when the caller doesn't pin
    one: ~640 rows/cell (the density STRESS_T28 measured — 4·K cells at
    2560·K rows), clamped to [16, 4096]. The floor keeps tiny corpora
    at the fixture geometry; the cap bounds the driver's K×K angle
    matrix (~128 MB of float64 at 4096)."""
    return min(4096, max(16, -(-int(n) // 640)))


def pairwise_cosine_exact_blocked(
    df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int | None = None,
    seed: int = 42,
    max_iter: int = 5,
    max_train: int = 100_000,
    warn_pair_budget: float = 5e8,
    max_pair_budget: float = 5e9,
    stage_timings: dict | None = None,
) -> DataFrame:
    """EXACT all-pairs cosine ≥ threshold without the Θ(n²) pair
    relation (VERDICT r12 #2 — lifts pairwise_cosine_exact's 20k cap).

    NOT LSH: banding by random hyperplanes loses pairs (finite bands
    can't guarantee recall at any threshold), so an LSH-blocked t28
    would diverge from its exact oracle. This blocks by METRIC BALLS
    instead: k-means cells in unit space, per-cell max radius, and the
    triangle inequality proving which cell pairs can possibly hold a
    qualifying pair (_blocked_cell_pairs) — identical output to
    pairwise_cosine_exact by construction, including the round-to-4
    boundary.

    Plan shape: one Arrow kernel pass for (cell, dist) assignment, a
    K-row driver agg for radii, then an equi-join co-located on the
    broadcast candidate cell-pair list — no BroadcastNestedLoopJoin,
    no cartesian. Work is Σ |A|·|B| over surviving cell pairs: on
    clustered corpora (real embeddings: topical cones) that is ~n²/K —
    with ++-seeded cells the STRESS bench measured candidates == output
    exactly. The honest worst case is ISOTROPIC high-dim data at a
    loose threshold: cell radii approach 90° and the triangle bound
    cannot exclude anything (curse of dimensionality — true for EVERY
    exact metric blocking, not this one), where the operator degrades
    to the co-located equi-join over all cell pairs — still ~2× the
    BNLJ baseline, but quadratic; that regime is what the t06/t08 LSH
    operators exist for when approximate recall is acceptable. Centroid
    training is the bounded-sample ivf_train recipe (collect ≤
    max_train rows, ++-seeded Lloyd's on the driver, model ships as
    literals); exactness never depends on centroid quality — only
    pruning does.

    n_cells=None scales cells with the corpus — ceil(n/640), the cell
    density STRESS_T28 itself measured (4·K cells at 2560·K rows),
    clamped to [16, 4096] (the static 16 was a fixture constant; at
    n=10M it meant ~600k-row cells whose pair products explode even
    under good pruning, and 4096 caps the driver's K×K angle matrix at
    ~128 MB). Before launching the confirm join, Σ|A|·|B| over the
    surviving cell pairs is ESTIMATED from driver-resident cell sizes
    (the radii agg already returns them): past `warn_pair_budget` it
    warns, past `max_pair_budget` it refuses loudly (VERDICT r13 #3 —
    the house style; silently degrading to the quadratic join in the
    un-prunable isotropic regime is how a 3-day job gets launched by
    accident) with the estimate in the message and a pointer to the
    t06/t08 LSH operators, which is what that regime actually needs."""
    import time as _time

    import numpy as np

    # stage_timings (VERDICT r13 #4): when a dict is passed, the driver-
    # side sync points record their wall time into it — the operator has
    # natural stage boundaries (count / train collect / k-means fit /
    # assignment+radii / candidate pairs), and the profile belongs HERE,
    # not re-derived in a tool that would drift from the real plan.
    st = stage_timings if stage_timings is not None else {}
    t0 = _time.perf_counter()
    n = df.count()
    st["count_sec"] = round(_time.perf_counter() - t0, 3)
    if n <= 1:
        return pairwise_cosine_exact(
            df, threshold, id_col, vec_col, max_rows=max(n, 1)
        )
    if n_cells is None:
        n_cells = _auto_n_cells(n)
    frac = min(1.0, max_train / n)
    train = df.select(to_double_array(vec_col).alias("_v"))
    if frac < 1.0:
        train = train.sample(fraction=frac, seed=seed)
    t0 = _time.perf_counter()
    x = np.asarray(
        [r["_v"] for r in train.limit(max_train).collect()],
        dtype=np.float64,
    )
    st["train_collect_sec"] = round(_time.perf_counter() - t0, 3)
    t0 = _time.perf_counter()
    cents = _kmeans(
        _unit_rows(x), min(n_cells, len(x)), seed, max_iter
    )
    st["kmeans_fit_sec"] = round(_time.perf_counter() - t0, 3)

    # ONE mapInPandas pass for (cell, geodesic dist): the struct-UDF
    # form (ivf_cell_dist_udf) evaluates the Arrow kernel once PER
    # FIELD ACCESS — ProjectCollapsing re-merges any select split, so
    # the plan carried two stacked ArrowEvalPython nodes per join side
    # (4 kernel evaluations + the python-worker round-trips each one
    # costs per task). A single mapInPandas node cannot be split. Math
    # is the kernel twin's (see schemas.kernels.ivf_cell_dist_udf).
    cents_l = cents.tolist()
    vec_t = df.schema[vec_col].dataType.simpleString()
    id_t = df.schema[id_col].dataType.simpleString()

    def _assign(batches):
        import numpy as np  # noqa: PLC0415
        import pandas as pd  # noqa: F401,PLC0415

        c = np.asarray(cents_l, dtype=np.float64)
        c2 = (c * c).sum(axis=1)
        cn = np.sqrt(c2)
        cu = np.divide(
            c, cn[:, None], out=np.zeros_like(c), where=cn[:, None] > 0
        )
        dim_ = c.shape[1]
        for pdf in batches:
            if not len(pdf):
                continue
            m = np.vstack(
                [
                    np.zeros(dim_)
                    if v is None
                    else np.asarray(v, dtype=np.float64)
                    for v in pdf[vec_col]
                ]
            )
            nrm = np.sqrt((m * m).sum(axis=1, keepdims=True))
            nz = (nrm > 0).ravel()
            mu = np.divide(m, nrm, out=np.zeros_like(m), where=nrm > 0)
            d2 = np.maximum(
                (mu * mu).sum(axis=1)[:, None]
                + c2[None, :]
                - 2.0 * (mu @ c.T),
                0.0,
            )
            cell = d2.argmin(axis=1)
            cosang = np.clip((mu * cu[cell]).sum(axis=1), -1.0, 1.0)
            out = pdf[[id_col, vec_col]].copy()
            out["_cell"] = cell.astype(np.int32)
            out["_dist"] = np.where(nz, np.arccos(cosang), 0.0)
            yield out

    assigned = df.select(id_col, vec_col).mapInPandas(
        _assign,
        f"{id_col} {id_t}, {vec_col} {vec_t}, _cell int, _dist double",
    )
    # persist: the kernel output feeds the radii agg AND both confirm
    # join sides — unpersisted, the Arrow kernel re-runs over the full
    # corpus 3× (ADVICE r13 #4). MEMORY_AND_DISK so big corpora spill
    # instead of evicting; the radii collect below materializes it.
    # Spark's ContextCleaner unpersists the blocks once the returned
    # plan is garbage-collected.
    from pyspark import StorageLevel

    assigned = assigned.persist(StorageLevel.MEMORY_AND_DISK)
    t0 = _time.perf_counter()
    radii = {}
    sizes = {}
    for r in (
        assigned.groupBy("_cell")
        .agg(F.max("_dist").alias("r"), F.count(F.lit(1)).alias("n"))
        .collect()
    ):
        radii[r["_cell"]] = r["r"]
        sizes[r["_cell"]] = r["n"]
    st["assign_radii_sec"] = round(_time.perf_counter() - t0, 3)
    # Radii over the FULL table (not the training sample): the bound
    # must cover every member, including ones the sample never saw.
    t0 = _time.perf_counter()
    cand_cells = _blocked_cell_pairs(cents, radii, threshold)
    st["cand_pairs_sec"] = round(_time.perf_counter() - t0, 3)
    # Work-budget guard (VERDICT r13 #3): the confirm join's pair count
    # is exactly Σ|A|·|B| over candidate cell pairs (each unordered
    # pair counted once — cand_cells carries both orientations), known
    # driver-side BEFORE any executor work is launched.
    # vectorized (VERDICT r14 nit): at the 4096-cell clamp a dense
    # candidate set is ~8M (a, b) tuples — a pure-Python accumulation
    # loop costs seconds of driver time before any executor work; the
    # numpy form is a masked product over two index vectors (~ms)
    if cand_cells:
        _ca = np.fromiter(
            (p[0] for p in cand_cells), dtype=np.int64, count=len(cand_cells)
        )
        _cb = np.fromiter(
            (p[1] for p in cand_cells), dtype=np.int64, count=len(cand_cells)
        )
        # sizes can hold cells whose pairs were ALL pruned (absent from
        # cand_cells) — size the lookup over both index spaces
        _maxc = int(max(_ca.max(), _cb.max(), max(sizes))) + 1
        _sz = np.zeros(_maxc, dtype=np.float64)
        for c, sc in sizes.items():
            _sz[c] = float(sc)
        _sa, _sb = _sz[_ca], _sz[_cb]
        est_pairs = float(
            np.where(
                _ca < _cb,
                _sa * _sb,
                np.where(_ca == _cb, _sa * (_sa - 1.0) / 2.0, 0.0),
            ).sum()
        )
    else:
        est_pairs = 0.0
    if est_pairs > max_pair_budget:
        assigned.unpersist()
        raise ValueError(
            f"pairwise_cosine_exact_blocked: estimated confirm-join "
            f"work {est_pairs:.3g} pairs exceeds max_pair_budget "
            f"{max_pair_budget:.3g} ({len(cand_cells)} candidate cell "
            f"pairs over {len(sizes)} cells, n={n}, "
            f"threshold={threshold}). The metric-ball bound cannot "
            f"prune this input — typically isotropic high-dimensional "
            f"data at a loose threshold, where EVERY exact blocking "
            f"degrades to ~all pairs. Raise max_pair_budget to force "
            f"the quadratic join, tighten the threshold, or use the "
            f"approximate near-dup operators (minhash_lsh_pairs / "
            f"embedding_near_pairs — t06/t08) built for that regime."
        )
    if est_pairs > warn_pair_budget:
        import warnings

        warnings.warn(
            f"pairwise_cosine_exact_blocked: estimated confirm-join "
            f"work {est_pairs:.3g} pairs exceeds warn_pair_budget "
            f"{warn_pair_budget:.3g} — pruning is weak on this input; "
            f"expect a long join stage.",
            stacklevel=2,
        )
    # Single-blob size bound (ADVICE r14): _blob serializes a whole cell
    # as ONE row whose vecs field is cell_n*dim float64 in a single
    # Arrow cell — a skewed cell at high dim can approach Arrow/JVM
    # single-record limits and fail the applyInPandas stage with an
    # opaque serialization error. Known driver-side before launch
    # (sizes from the radii agg, dim from the training sample), so
    # refuse loudly here instead: raising n_cells shrinks cells.
    if sizes:
        _max_cell = max(sizes.values())
        _dim_guess = int(x.shape[1]) if x.ndim == 2 else 0
        _blob_bytes = _max_cell * _dim_guess * 8
        if _blob_bytes > (1 << 30):
            assigned.unpersist()
            raise ValueError(
                f"pairwise_cosine_exact_blocked: largest cell holds "
                f"{_max_cell} rows × {_dim_guess} dims = "
                f"{_blob_bytes / (1 << 30):.2f} GiB in a single Arrow "
                f"cell (limit 1 GiB) — a skewed cell this size would "
                f"fail the blob stage at serialization. Raise n_cells "
                f"(currently {n_cells}) so k-means splits the hot "
                f"region, or reduce the input."
            )
    # Confirm stage (r14): BLAS-style blocks instead of a per-pair JVM
    # expression. The r13 shape — row-level equi-join + a 64-dim
    # unrolled dot — generated 23 KB-bytecode methods that HotSpot
    # REFUSES to JIT (DontCompileHugeMethods caps at 8 KB), so every
    # pair paid the bytecode INTERPRETER: measured 52s for ~2M pairs at
    # sf0.1 where the arithmetic is ~0.5s of vectorized work. Now each
    # cell becomes ONE blob row (ids + row-major matrix), the broadcast
    # candidate-pair list fans blobs into (A, B) tasks, and a mapInPandas
    # kernel confirms each block with numpy.
    #
    # Bit-exactness contract (vs pairwise_cosine_exact, pinned by
    # tests/test_blocked_pairs.py): the fast path is a BLAS gram +
    # scaled-integer round-half-up; every entry whose rounding COULD
    # differ from the fold convention — the ±1e-6 band around the
    # .00005 boundary, which covers both the ≲1e-13 dgemm
    # reassociation error and FP scaling error by ~4 orders of
    # magnitude — is RECOMPUTED exactly: scalar left-to-right dot
    # (the fold's association), canonical division by the
    # left-to-right norms, then HALF_UP on the SHORTEST-DECIMAL repr
    # (Python repr == Java Double.toString numerically; Spark's
    # round(double, 4) is BigDecimal.valueOf(d).setScale(4, HALF_UP)).
    # Same recipe as semdedup._sim_round4_lr_fast. NaN rows (null
    # arrays / null elements / zero norms → 0/0) fail the >= filter
    # exactly like the expression path's NULL propagation.
    if x.ndim != 2:
        # degenerate training sample (ragged / all-null vectors): keep
        # the expression fallback — the fold handles any shape.
        cellpairs = df.sparkSession.createDataFrame(
            cand_cells, "_ca int, _cb int"
        )
        left = assigned.select(
            F.col(id_col).alias("id_a"),
            F.col(vec_col).alias("va"),
            vectors.norm(to_double_array(F.col(vec_col))).alias("_na"),
            F.col("_cell").alias("_ca"),
        )
        right = assigned.select(
            F.col(id_col).alias("id_b"),
            F.col(vec_col).alias("vb"),
            vectors.norm(to_double_array(F.col(vec_col))).alias("_nb"),
            F.col("_cell").alias("_cb"),
        )
        pairs = (
            left.join(F.broadcast(cellpairs), "_ca")
            .join(right, "_cb")
            .filter(F.col("id_a") < F.col("id_b"))
        )
        d = dot(to_double_array(F.col("va")), to_double_array(F.col("vb")))
        sim = d / (F.col("_na") * F.col("_nb"))
        return pairs.select(
            "id_a", "id_b", F.round(sim, 4).alias("sim")
        ).filter(F.col("sim") >= threshold)

    dim = int(x.shape[1])
    # one unordered task per unordered cell pair — each doc pair lives
    # in exactly one (cell(a), cell(b)) task, so no output dedup needed
    upairs = sorted({(min(a, b), max(a, b)) for a, b in cand_cells})
    taskpairs = df.sparkSession.createDataFrame(
        upairs, "_ca int, _cb int"
    )

    def _blob(pdf):
        import numpy as np  # noqa: PLC0415
        import pandas as pd  # noqa: PLC0415

        rows = [
            np.full(dim, np.nan)
            if v is None
            else np.asarray(v, dtype=np.float64)
            for v in pdf[vec_col]
        ]
        m = np.vstack(rows) if rows else np.zeros((0, dim))
        return pd.DataFrame(
            {
                "_cell": [int(pdf["_cell"].iloc[0])],
                "ids": [list(pdf[id_col])],
                "vecs": [m.ravel().tolist()],
            }
        )

    # persisted for the same reason as `assigned` (feeds BOTH join
    # sides), and reclaimed the same way: no explicit unpersist path
    # exists once the plan is returned to the caller, so Spark's
    # ContextCleaner frees the blocks when the returned DataFrame (and
    # with it this lineage) is garbage-collected (ADVICE r14). No error
    # path can leak it — the budget guard raises before this point.
    blobs = assigned.groupBy("_cell").applyInPandas(
        _blob, f"_cell int, ids array<{id_t}>, vecs array<double>"
    ).persist(StorageLevel.MEMORY_AND_DISK)
    tasks = (
        blobs.select(
            F.col("_cell").alias("_ca"),
            F.col("ids").alias("ids_a"),
            F.col("vecs").alias("vecs_a"),
        )
        .join(F.broadcast(taskpairs), "_ca")
        .join(
            blobs.select(
                F.col("_cell").alias("_cb"),
                F.col("ids").alias("ids_b"),
                F.col("vecs").alias("vecs_b"),
            ),
            "_cb",
        )
    )
    thr = float(threshold)

    def _confirm(batches):
        from decimal import ROUND_HALF_UP, Decimal  # noqa: PLC0415

        import numpy as np  # noqa: PLC0415
        import pandas as pd  # noqa: PLC0415

        q4 = Decimal("0.0001")

        def emit(ids_a, A, na, ids_b, B, nb, same):
            # BLAS gram: reassociates the sum (pairwise/blocked), so it
            # differs from the fold's left-to-right value by ≲1e-13 in
            # sim units — which only matters within that distance of a
            # .00005 rounding boundary, and every such entry is inside
            # the ±1e-6 `near` band below, where the value is
            # RECOMPUTED exactly (scalar left-to-right + Decimal) —
            # see semdedup._sim_round4_lr_fast, the same recipe. The
            # d-pass accumulation loop this replaces paid d× the
            # memory traffic of one dgemm.
            acc = np.matmul(A, B.T)
            with np.errstate(divide="ignore", invalid="ignore"):
                sim = acc / (na[:, None] * nb[None, :])
            if same:
                mask = ids_a[:, None] < ids_b[None, :]
            else:
                # cross-cell blocks: mask id equality too (ADVICE r14) —
                # with a non-unique id column the expression path's
                # id_a < id_b excludes equal-id pairs, and the blocked
                # path must match it bit-for-bit
                mask = ids_a[:, None] != ids_b[None, :]
            # survivors with margin: anything that could round UP to
            # >= threshold is >= threshold - 0.00005 (HALF_UP); NaN
            # (null array/element, zero norm) fails the comparison,
            # matching the expression path's NULL propagation
            with np.errstate(invalid="ignore"):
                mask &= sim >= thr - 1e-4
            ia, ib = np.nonzero(mask)
            if not len(ia):
                return None
            s = sim[ia, ib]
            # scaled away-from-zero rounding; Decimal re-check only in
            # the band where FP scaling could disagree with the
            # decimal-digit HALF_UP
            sc = np.abs(s) * 10000.0
            base = np.floor(sc)
            frac = sc - base
            r = np.sign(s) * np.where(frac >= 0.5, base + 1.0, base) / 10000.0
            near = np.abs(frac - 0.5) < 1e-6
            if near.any():
                # boundary band: recompute the sim EXACTLY (the fold's
                # left-to-right association, canonical single division)
                # before the decimal-digit HALF_UP — this is where both
                # the BLAS reassociation and the FP-scaled rounding
                # could disagree with the expression path
                fixed = []
                for t_idx in np.nonzero(near)[0].tolist():
                    i, j = int(ia[t_idx]), int(ib[t_idx])
                    accv = 0.0
                    for k in range(dim):
                        accv += A[i, k] * B[j, k]
                    sv = accv / (na[i] * nb[j])
                    fixed.append(
                        float(
                            Decimal(repr(float(sv))).quantize(
                                q4, rounding=ROUND_HALF_UP
                            )
                        )
                    )
                r[near] = fixed
            keep = r >= thr
            if not keep.any():
                return None
            ia, ib, r = ia[keep], ib[keep], r[keep]
            xa, xb = ids_a[ia], ids_b[ib]
            lo = np.where(xa < xb, xa, xb)
            hi = np.where(xa < xb, xb, xa)
            return lo, hi, r

        def unpack(ids, vecs):
            ids = np.asarray(ids)
            m = np.asarray(vecs, dtype=np.float64).reshape(len(ids), dim)
            n = np.zeros(len(ids))
            for i in range(dim):
                n += m[:, i] * m[:, i]
            return ids, m, np.sqrt(n)

        for pdf in batches:
            outs = []
            for ca, cb, il_a, vl_a, il_b, vl_b in zip(
                pdf["_ca"], pdf["_cb"], pdf["ids_a"], pdf["vecs_a"],
                pdf["ids_b"], pdf["vecs_b"],
            ):
                ids_a, A, na = unpack(il_a, vl_a)
                ids_b, B, nb = unpack(il_b, vl_b)
                # bound the sim block at ~32 MB regardless of cell
                # sizes (the pair-budget guard bounds TOTAL work, not
                # a single block)
                step = max(1, 4_000_000 // max(1, len(ids_a)))
                for j0 in range(0, len(ids_b), step):
                    j1 = j0 + step
                    got = emit(
                        ids_a, A, na,
                        ids_b[j0:j1], B[j0:j1], nb[j0:j1],
                        same=(int(ca) == int(cb)),
                    )
                    if got is not None:
                        outs.append(got)
            if outs:
                yield pd.DataFrame(
                    {
                        "id_a": np.concatenate([o[0] for o in outs]),
                        "id_b": np.concatenate([o[1] for o in outs]),
                        "sim": np.concatenate([o[2] for o in outs]),
                    }
                )

    return tasks.mapInPandas(
        _confirm, f"id_a {id_t}, id_b {id_t}, sim double"
    )


# ------------------------------------------------------------------ IVF-PQ
# Product quantization on IVF residuals — the FAISS-standard recipe for
# ANN at corpus sizes where even the vectors don't fit the cluster
# (Jégou et al. 2011, "Product Quantization for Nearest Neighbor
# Search"). Memory per vector drops from dim×8 bytes to m bytes (64-dim
# float64 → 8 bytes at m=8, 64×), which is what makes a 100 TB embedding
# table scannable: the CODES table is ~1.6% of the vectors and the scan
# is a table-lookup sum per row (ADC), no float vector ever read at
# query time. Everything is normalized to unit length so L2 order ==
# cosine order (the b33 family's metric); training is the bounded-sample
# driver-side pattern ivf_train established.


def _sqdist(x, cents, out=None, x2=None):
    """(n, k) squared distances via the matmul identity
    |x|² + |c|² − 2x·c. The broadcast subtraction form
    ((x[:,None,:] − c[None,:,:])**2).sum(−1) materializes an
    (n, k, d) temp — ~1.6 GiB per call at pq_train defaults
    (100k × 256 × 8 float64) and multi-GiB at non-default n_cells —
    a driver MemoryError waiting to happen (ADVICE r12); this form
    only ever materializes (n, k). Tiny negatives from rounding are
    clamped so downstream sqrt/min stay sane.

    Composed IN PLACE into `out` (allocated if absent): matmul with
    out= then in-place broadcast adds. The expression form allocated
    three fresh (n, k) temps per call — at a 20k×3,840 fit that is
    3×614 MB of first-touch page faults PER LLOYD ITERATION on hosts
    with lazily-backed VM memory (this sandbox faults new pages at
    ~40-75 MB/s; measured 69s for the temps vs 0.5s of arithmetic).
    Callers that loop (Lloyd's) pass the same buffer every iteration
    so the fault cost is paid once. For the same reason, loop callers
    should pass a precomputed `x2 = (x*x).sum(axis=1)` (r15): x never
    changes across Lloyd iterations, but recomputing it here allocated
    a fresh (n, d) product temp per call — 37 MB per iteration at the
    STRESS K=30 fit, each paying first-touch faults again on this
    host. Same values either way — bit-identical distances."""
    import numpy as np

    if x2 is None:
        x2 = (x * x).sum(axis=1)
    c2 = (cents * cents).sum(axis=1)
    if out is None or out.shape != (len(x), len(cents)):
        out = np.empty((len(x), len(cents)))
    np.matmul(x, cents.T, out=out)
    out *= -2.0
    out += x2[:, None]
    out += c2[None, :]
    return np.maximum(out, 0.0, out=out)


def _kmeanspp_seeds(x, k: int, rng):
    """k-means++ seeding (Arthur & Vassilvitskii 2007), vectorized:
    each next seed drawn ∝ squared distance to the nearest seed so far
    — O(k·n) with one BLAS matvec per seed. Why it matters here:
    uniform seeding on a topical corpus double-seeds some topics and
    misses others, and the missed topics' members land in far-away
    cells whose radii blow up to ~90°; the metric-ball blocking then
    prunes nothing (measured: 252M candidate pairs at K=10 with
    uniform seeds vs 499k — exactly the output size — with ++ seeds).
    An already-chosen point has distance 0 and is never re-drawn, so
    seeds stay distinct (the PQ exactness property)."""
    import numpy as np

    n = len(x)
    k = min(k, n)
    x2 = (x * x).sum(axis=1)

    # one reused n-length work buffer per purpose: the expression forms
    # allocated 3-4 fresh n-vectors per seed (each > glibc's 128 KB
    # mmap threshold at n >= 16k, so every one re-pays first-touch
    # page faults on lazily-backed VM hosts — seeding read 7.7s of a
    # 3,840-seed fit). rng draws are kept IDENTICAL to the previous
    # rng.choice form (same cumsum/normalize/searchsorted recipe, one
    # random_sample per seed), so seeds — and everything downstream —
    # are bit-for-bit unchanged.
    buf = np.empty(n)
    cdf = np.empty(n)

    def _dist_to(c, out):
        np.matmul(x, c, out=out)
        out *= -2.0
        out += x2
        out += (c * c).sum()
        return np.maximum(out, 0.0, out=out)

    seeds = [int(rng.randint(n))]
    mind = _dist_to(x[seeds[0]], np.empty(n))
    for _ in range(k - 1):
        tot = mind.sum()
        if tot > 0:
            np.divide(mind, tot, out=cdf)
            np.cumsum(cdf, out=cdf)
            cdf /= cdf[-1]
            nxt = int(
                min(np.searchsorted(cdf, rng.random_sample(), side="right"),
                    n - 1)
            )
        else:  # all remaining points coincide with a seed
            nxt = int(rng.randint(n))
        seeds.append(nxt)
        d = _dist_to(x[nxt], buf)
        np.minimum(mind, d, out=mind)
    return x[np.asarray(seeds)].copy()


def _kmeans(x, k: int, seed: int, max_iter: int):
    """Lloyd's over a bounded in-memory sample (the ivf_train loop,
    factored for subspace codebooks). Returns (k', d) centroids with
    k' = min(k, len(x)) — distinct k-means++ seed points, so k' >= n
    reproduces the sample exactly (the property the PQ exactness test
    pins).

    Distances via _sqdist's matmul identity — see its docstring for
    why the subtraction form is a driver-memory hazard."""
    import numpy as np

    rng = np.random.RandomState(seed)
    cents = _kmeanspp_seeds(x, k, rng)
    d2 = None  # reused across iterations (see _sqdist's fault note)
    x2 = (x * x).sum(axis=1)  # loop-invariant; computed once (r15)
    for _ in range(max_iter):
        d2 = _sqdist(x, cents, out=d2, x2=x2)
        assign = d2.argmin(axis=1)
        # vectorized mean step: one bincount per dim instead of a
        # per-cell boolean-mask loop — the mask loop was O(cells·n)
        # python-side work and dominated large fits (STRESS_T28 K=30
        # warm profile: 33s of a 3,840-cell fit); bincount is O(n·d)
        # C code with deterministic left-to-right accumulation
        counts = np.bincount(assign, minlength=len(cents)).astype(
            np.float64
        )
        new = np.zeros_like(cents)
        for j in range(x.shape[1]):
            new[:, j] = np.bincount(
                assign, weights=x[:, j], minlength=len(cents)
            )
        nz = counts > 0
        new[nz] /= counts[nz, None]
        empty = np.nonzero(~nz)[0]
        if len(empty):
            # reseed empty cells from DISTINCT farthest points, ranked
            # ONCE per iteration — the old per-cell d2.min(axis=1) scan
            # was a hidden O(cells × n) quadratic (87s of a 1280-cell
            # fit was this line), and giving every empty cell the SAME
            # farthest point just re-collided them next iteration
            far = np.argsort(-d2.min(axis=1))
            for i, c in enumerate(empty):
                new[c] = x[far[i % len(far)]]
        if np.allclose(new, cents):
            break
        cents = new
    return cents


def _unit_rows(x):
    """Row-normalize; zero-norm rows stay zero (cosine is undefined for
    them — they land far from any unit query, never spuriously near)."""
    import numpy as np

    n = np.sqrt((x * x).sum(axis=1, keepdims=True))
    return np.divide(x, n, out=np.zeros_like(x), where=n > 0)


def pq_train(
    df: DataFrame,
    n_cells: int = 8,
    m: int = 8,
    codebook_size: int = 256,
    vec_col: str = "embedding",
    max_train: int = 100_000,
    seed: int = 42,
    max_iter: int = 5,
) -> dict:
    """Train the IVF-PQ model on a bounded sample (driver-side numpy —
    the ivf_train scale argument: the model is tiny and ships into the
    scan as a broadcast; only the sample collect touches the cluster).

    Returns {"centroids": (n_cells, dim), "codebooks": (m, ksub, dsub),
    "m", "dsub"} as plain lists. dim must divide by m (refused loudly:
    silent padding would corrupt every code)."""
    import numpy as np

    if codebook_size > 256:
        raise ValueError(
            f"pq_train: codebook_size {codebook_size} > 256 — PQ codes "
            f"are single bytes (argmin indices above 255 would WRAP in "
            f"the uint8 code); use more subspaces (m) for finer "
            f"quantization instead"
        )
    n = df.count()
    frac = min(1.0, max_train / max(n, 1))
    train = df.select(to_double_array(vec_col).alias("_v"))
    if frac < 1.0:
        train = train.sample(fraction=frac, seed=seed)
    x = np.asarray(
        [r["_v"] for r in train.limit(max_train).collect()],
        dtype=np.float64,
    )
    if not len(x):
        raise ValueError("pq_train: empty training sample")
    dim = x.shape[1]
    if dim % m:
        raise ValueError(
            f"pq_train: dim {dim} not divisible by m={m} subspaces"
        )
    dsub = dim // m
    x = _unit_rows(x)
    cents = _kmeans(x, n_cells, seed, max_iter)
    resid = x - cents[_sqdist(x, cents).argmin(axis=1)]
    books = [
        _kmeans(
            resid[:, j * dsub : (j + 1) * dsub], codebook_size,
            seed + 1 + j, max_iter,
        )
        for j in range(m)
    ]
    ksub = min(b.shape[0] for b in books)
    return {
        "centroids": cents.tolist(),
        # ragged-proof: every book trimmed to the common ksub (only
        # differs when the sample is smaller than codebook_size)
        "codebooks": [b[:ksub].tolist() for b in books],
        "m": m,
        "dsub": dsub,
    }


def pq_encode(
    df: DataFrame,
    model: dict,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, pq_cell, pq_code) — m bytes of code per vector, the compact
    index a 100 TB deployment materializes ONCE (write partitioned by
    pq_cell, the write_ivf_clustered pattern) and scans instead of the
    vectors. Arrow-batched kernel: one argmin matmul per subspace per
    batch."""
    from pyspark.sql.types import (
        BinaryType,
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    out_schema = StructType(
        [
            StructField("_pqid", LongType(), True),
            StructField("pq_cell", IntegerType(), True),
            StructField("pq_code", BinaryType(), True),
        ]
    )
    cents_l = model["centroids"]
    books_l = model["codebooks"]
    m, dsub = int(model["m"]), int(model["dsub"])

    def kernel(batches):
        import numpy as np
        import pandas as pd

        cents = np.asarray(cents_l, dtype=np.float64)
        books = np.asarray(books_l, dtype=np.float64)  # (m, ksub, dsub)
        for pdf in batches:
            if not len(pdf):
                continue
            x = _unit_rows(
                np.stack(
                    [np.asarray(v, dtype=np.float64) for v in pdf["_v"]]
                )
            )
            cell = _sqdist(x, cents).argmin(axis=1)
            resid = x - cents[cell]
            codes = np.empty((len(x), m), dtype=np.uint8)
            for j in range(m):
                sub = resid[:, j * dsub : (j + 1) * dsub]
                codes[:, j] = (
                    _sqdist(sub, books[j]).argmin(axis=1).astype(np.uint8)
                )
            yield pd.DataFrame(
                {
                    "_pqid": pdf["_id"].to_numpy(),
                    "pq_cell": cell.astype("int32"),
                    "pq_code": [c.tobytes() for c in codes],
                }
            )

    enc = (
        df.select(
            F.col(id_col).cast("long").alias("_id"),
            to_double_array(vec_col).alias("_v"),
        )
        .mapInPandas(kernel, out_schema)
        .withColumnRenamed("_pqid", id_col)
    )
    return enc


def pq_topk(
    codes: DataFrame,
    model: dict,
    query_vec: list,
    k: int = 10,
    nprobe: int | None = None,
    id_col: str = "vec_id",
) -> DataFrame:
    """ADC top-k over the codes table: probe-cell filter (partition
    pruning when the codes are materialized by pq_cell) → per-row
    table-lookup distance sum → TakeOrderedAndProject. The ADC tables
    ((m × ksub) per probed cell) are built driver-side from the tiny
    model — the only per-query work that touches floats. Ties break on
    id for determinism. Distances are squared L2 on unit vectors
    (monotone in cosine), rounded to 4 digits like the rest of the b33
    family."""
    import numpy as np

    cents = np.asarray(model["centroids"], dtype=np.float64)
    books = np.asarray(model["codebooks"], dtype=np.float64)
    m, dsub = int(model["m"]), int(model["dsub"])
    if nprobe is None:
        nprobe = scale_nprobe(len(cents))
    q = _unit_rows(np.asarray([query_vec], dtype=np.float64))[0]
    dq = ((cents - q[None, :]) ** 2).sum(axis=1)
    probes = [int(i) for i in np.argsort(dq)[: int(nprobe)]]
    tabs = {}
    for c in probes:
        r = q - cents[c]
        tab = np.empty((m, books.shape[1]), dtype=np.float64)
        for j in range(m):
            tab[j] = (
                (books[j] - r[j * dsub : (j + 1) * dsub][None, :]) ** 2
            ).sum(axis=1)
        tabs[c] = tab
    tabs_l = {c: t.tolist() for c, t in tabs.items()}

    from pyspark.sql.types import (
        DoubleType,
        LongType as _Long,
        StructField,
        StructType,
    )

    out_schema = StructType(
        [
            StructField("_pqid", _Long(), True),
            StructField("pq_dist", DoubleType(), True),
        ]
    )

    def kernel(batches):
        import numpy as np
        import pandas as pd

        T = {c: np.asarray(t, dtype=np.float64) for c, t in tabs_l.items()}
        ar = np.arange(m)
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf["_pqid"].to_numpy()
            cells = pdf["pq_cell"].to_numpy()
            code_mat = np.frombuffer(
                b"".join(pdf["pq_code"]), dtype=np.uint8
            ).reshape(-1, m)
            dist = np.empty(len(ids), dtype=np.float64)
            for c in np.unique(cells):
                sel = cells == c
                dist[sel] = T[int(c)][ar[None, :], code_mat[sel]].sum(
                    axis=1
                )
            yield pd.DataFrame({"_pqid": ids, "pq_dist": dist})

    pruned = codes.filter(F.col("pq_cell").isin(probes)).select(
        F.col(id_col).cast("long").alias("_pqid"), "pq_cell", "pq_code"
    )
    return (
        pruned.mapInPandas(kernel, out_schema)
        .select(
            F.col("_pqid").alias(id_col),
            F.round("pq_dist", 4).alias("pq_dist"),
        )
        .orderBy("pq_dist", id_col)
        .limit(k)
    )


def pq_topk_rerank(
    codes: DataFrame,
    vectors: DataFrame,
    model: dict,
    query_vec: list,
    k: int = 10,
    nprobe: int | None = None,
    shortlist: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int | None = 4,
) -> DataFrame:
    """IVFADC+R (Jégou et al. 2011 §VI): ADC shortlist over the CODES
    table, then exact cosine re-rank of only the shortlist against the
    raw vectors. This is the production PQ recipe — ADC quantization
    error caps raw recall (measured 0.7 here regardless of nprobe),
    while re-ranking a small multiple of k restores it (measured 1.0 at
    shortlist=5k) for the price of `shortlist` point lookups. At 100 TB
    the codes table (m bytes/vector) is the only thing scanned; the
    vector table is touched for `shortlist` rows via a broadcast
    semi-join (id-keyed point reads on a real deployment).

    nprobe=None / shortlist=None derive the measured STRESS_ANN scale
    rules (scale_nprobe / scale_shortlist — the shortlist derivation
    costs one count over the codes table, trivial next to the ADC
    scan it sizes); the old constants (4, 50) were fixture settings
    that decay to 0.69-0.75 recall@10 at deployment cell counts."""
    if shortlist is None:
        shortlist = scale_shortlist(codes.count(), k)
    short = pq_topk(
        codes, model, query_vec, k=int(shortlist), nprobe=nprobe,
        id_col=id_col,
    ).select(id_col)
    pruned = vectors.join(F.broadcast(short), id_col, "leftsemi")
    return cosine_topk(
        pruned, query_vec, k, id_col, vec_col, round_digits
    )


def write_pq_clustered(
    df: DataFrame,
    path: str,
    model: dict,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    mode: str = "overwrite",
) -> None:
    """Materialize the IVF-PQ index: encode once, write the CODES table
    hive-partitioned by `pq_cell`. The 100-TB posture made physical
    twice over — the index is m bytes/vector (the only thing a query
    scans) AND the probe-cell filter is partition pruning, so ADC cost
    scales with nprobe/n_cells of an already-64×-smaller table. The
    raw vectors stay wherever they live; re-rank touches them for
    `shortlist` ids only."""
    pq_encode(df, model, id_col, vec_col).write.mode(mode).partitionBy(
        "pq_cell"
    ).parquet(path)


def pq_topk_clustered(
    spark,
    codes_path: str,
    vectors: DataFrame,
    model: dict,
    query_vec: list,
    k: int = 10,
    nprobe: int | None = None,
    shortlist: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVFADC+R over a `write_pq_clustered` layout: the probe filter
    lands in PartitionFilters (asserted in tests) — directories outside
    the probe set are never listed, let alone read."""
    codes = spark.read.parquet(codes_path)
    return pq_topk_rerank(
        codes, vectors, model, query_vec, k=k, nprobe=nprobe,
        shortlist=shortlist, id_col=id_col, vec_col=vec_col,
    )


def max_cosine_vs_set(
    df: DataFrame,
    bench_vecs: list,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 4,
) -> DataFrame:
    """(id, max_sim): each row's maximum cosine against a SMALL fixed
    vector set (an eval suite, a probe battery). Arrow-batched BLAS —
    one (batch × dim) @ (dim × B) matmul per batch — for the same
    reason ivf_assign is: B chained zip_with/aggregate folds run
    INTERPRETED per row-pair (measured 1.5s at 5k×20×64 where the
    matmul is milliseconds), and the expression-unrolled form is
    quadratically worse to analyze. Rounding is half-away-from-zero
    (cosine_topk_pandas precedent) so the DuckDB oracle matches.
    Zero-norm rows yield max_sim NULL (cosine undefined), matching
    list_cosine_similarity's NULL propagation through MAX only when
    ALL sims are undefined."""
    import numpy as np

    B = np.asarray(bench_vecs, dtype=np.float64)  # (nb, dim)
    Bn = np.linalg.norm(B, axis=1)
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    out_schema = StructType(
        [
            StructField("_mcid", LongType(), True),
            StructField("max_sim", DoubleType(), True),
        ]
    )
    scale = 10.0 ** int(round_digits)

    def kernel(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            x = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf["_v"]]
            )
            xn = np.linalg.norm(x, axis=1)
            with np.errstate(divide="ignore", invalid="ignore"):
                sims = (x @ B.T) / (xn[:, None] * Bn[None, :])
            mx = np.nanmax(
                np.where(np.isfinite(sims), sims, np.nan), axis=1,
                initial=-np.inf,
            )
            mx = np.copysign(np.floor(np.abs(mx) * scale + 0.5) / scale, mx)
            out = pd.DataFrame(
                {"_mcid": pdf["_id"].to_numpy(), "max_sim": mx}
            )
            out.loc[~np.isfinite(mx), "max_sim"] = None
            yield out

    return (
        df.select(
            F.col(id_col).cast("long").alias("_id"),
            to_double_array(vec_col).alias("_v"),
        )
        .mapInPandas(kernel, out_schema)
        .withColumnRenamed("_mcid", id_col)
    )
