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
- centroid selection: one TakeOrdered of n_clusters rows collected to
  the driver (bounded, like DSIR's <= 4096-row model collect) and
  shipped to executors inside the two Arrow kernels' closures — never
  literals in a megabyte expression tree, never a crossJoin row blowup.
- assignment: ONE mapInPandas projection per input partition — each
  Arrow batch is scored against the (K x dim) centroid matrix and
  emits (id, cluster, centroid_sim, vector). No shuffle, no window:
  argmax over K replaces the old crossJoin(N x K) + row_number plan
  (that chain paid two extra stages of pure fixed cost — the reason
  r10 kept t27 out of the bench headline).
- pruning: groupBy(cluster) -> applyInPandas — per-cluster quadratic
  exactly as the paper's per-cluster GPU pass (CPU here). K is chosen
  so N/K is bounded (the paper uses K ~ sqrt(N)-ish). The n_c^2
  similarity matrix is computed BLOCKWISE (O(block x n_c) peak), and a
  skewed cluster larger than `max_cluster_rows` raises loudly (the
  t09 guard precedent): applyInPandas materializes the whole group in
  one executor's memory, so a 90%-of-rows hot cluster must fail fast
  with a message pointing at raising K, not OOM an executor.
- dominance rule: v is removed iff SOME same-cluster near-dup u has a
  strictly lower centroid-similarity (tie: lower id wins) — the
  pairwise relaxation of the paper's per-group keep-one; full
  connected-component grouping is the separate t20 operator.

Numeric determinism: every dot product / norm here accumulates
LEFT-TO-RIGHT over the dimension (a Python-level loop of vectorized
adds, `acc += x[:, k] * y[:, k]`), the same association as the
`functions.vectors.dot` fold and t09's pair baseline — NOT a BLAS
matmul, whose blocked accumulation order can flip a round-4 value
sitting on a rounding boundary against the DuckDB oracle. dim is 64;
the loop is 64 vectorized adds per block, within ~2x of dgemm and
bit-stable.
"""

from __future__ import annotations

import math
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["semdedup_summary"]


# applyInPandas holds one cluster per executor as a dense pandas group;
# beyond this many rows the (rows x dim) matrix plus block buffers stop
# being a sane single-task working set — refuse loudly (t09 precedent).
MAX_CLUSTER_ROWS = 2_000_000

# rows per similarity block: caps the pairwise pass at
# PRUNE_BLOCK_ROWS x n_c doubles (~32 MB at n_c = 2M and 2048 rows).
PRUNE_BLOCK_ROWS = 2048


def _gram_lr(x, y):
    """(B x d) . (M x d)^T pairwise dot-product matrix with
    LEFT-TO-RIGHT accumulation over d — bit-stable, engine-portable."""
    import numpy as np

    acc = np.zeros((x.shape[0], y.shape[0]), dtype=np.float64)
    for k in range(x.shape[1]):
        acc += np.multiply.outer(x[:, k], y[:, k])
    return acc


def _sim_round4_lr_fast(x, y, nx, ny):
    """round4(left-to-right cosine matrix) at BLAS speed.

    The d-pass accumulation loop (_gram_lr) exists only so the ROUNDED
    value matches the engine convention; but it costs d× the memory
    traffic of one dgemm plus a same-size temp per pass — 64× at
    dim 64, and it dominated t27's quadratic regime (WEAK_AB r14:
    138s for 450M pair sims where DuckDB took 22s). A BLAS gram
    differs from the left-to-right sum by ≲1e-13 in sim units, which
    can only flip round-to-4 for sims within that distance of a
    .00005 decision boundary — so: dgemm, round, then recompute
    EXACTLY (scalar left-to-right + _round4_half_up) just the entries
    inside a ±1e-9 sim band around the boundary (~2e-5 of entries on
    random data; the band is ~4 orders of magnitude wider than the
    reassociation error). Output is bit-identical to
    _round4_half_up(_gram_lr(x, y) / outer(nx, ny))."""
    import numpy as np

    with np.errstate(divide="ignore", invalid="ignore"):
        s = np.matmul(x, y.T)
        # two in-place row/col divisions instead of one (B×M) norm-
        # product temp: ((g/nx)/ny) differs from g/(nx·ny) by ≲1 ulp —
        # far inside the fixup band, so the banded exact recompute
        # (which uses the canonical single division) decides every
        # boundary case
        s /= nx[:, None]
        s /= ny[None, :]
    r = _round4_half_up(s)
    t = np.abs(s) * 1e4
    frac = t - np.floor(t)
    ii, jj = np.nonzero(np.abs(frac - 0.5) < 1e-5)  # 1e-9 in sim units
    if len(ii):
        d = x.shape[1]
        for i, j in zip(ii.tolist(), jj.tolist()):
            acc = 0.0
            for k in range(d):
                acc += x[i, k] * y[j, k]
            r[i, j] = _round4_half_up(acc / (nx[i] * ny[j]))
    return r


def _norms_lr(x):
    import numpy as np

    acc = np.zeros(x.shape[0], dtype=np.float64)
    for k in range(x.shape[1]):
        acc += x[:, k] * x[:, k]
    return np.sqrt(acc)


def _round4_half_up(a):
    """Round to 4 decimals, halves AWAY FROM ZERO — the convention of
    Spark's F.round(HALF_UP) and DuckDB's round(), which the oracle
    uses. np.round is half-to-even: a cosine landing exactly on a
    representable 4-decimal midpoint (e.g. 0.03125) would round
    differently and flip the >=-threshold / dominance-tie comparisons
    the round-4 convention exists to stabilize."""
    import numpy as np

    return np.copysign(np.floor(np.abs(a) * 1e4 + 0.5) / 1e4, a)


def _stack_vectors(vals, ids, dim, what):
    """np.stack with loud per-row validation: a single NULL or
    ragged-length embedding must name the offending row id, not crash
    the whole job with an opaque numpy error (max_cluster_rows
    fail-fast precedent)."""
    import numpy as np

    for v, i in zip(vals, ids):
        if v is None:
            raise ValueError(
                f"semdedup {what}: NULL {len(vals)}-batch embedding at"
                f" id={i!r} — filter null vectors before semdedup_summary"
            )
        if len(v) != dim:
            raise ValueError(
                f"semdedup {what}: ragged embedding at id={i!r}"
                f" (len {len(v)}, expected {dim})"
            )
    return np.stack(vals).astype(np.float64)


def semdedup_summary(
    df: DataFrame,
    n_clusters: int = 8,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    salt: str = "semdedup",
    max_cluster_rows: int = MAX_CLUSTER_ROWS,
    centroids: "list[tuple[int, list[float]]] | None" = None,
) -> DataFrame:
    """Per-cluster SemDeDup summary: (cluster_id, n_vectors,
    n_removed) — cluster_id is the centroid's vec_id; all-integer
    output so the oracle comparison is exact. Similarities are rounded
    to 4 digits BEFORE any comparison so the dominance rule is decided
    on values both engines agree on (the t09 precedent).

    `centroids` overrides the seeded md5 selection with trained ones
    (e.g. from `simsearch.ivf_train`) as (id, vector) pairs — the
    production path; the seeded default exists for the SQL oracle."""
    if centroids is None:
        cent_rows = [
            (int(r["_cid"]), [float(v) for v in r["_cv"]])
            for r in (
                df.select(
                    F.col(id_col).alias("_cid"),
                    F.col(vec_col).alias("_cv"),
                    F.md5(
                        F.concat(F.lit(salt), F.col(id_col).cast("string"))
                    ).alias("_h"),
                )
                .orderBy("_h", "_cid")
                .limit(n_clusters)
                .collect()
            )
        ]
    else:
        cent_rows = [
            (int(cid), [float(v) for v in vec]) for cid, vec in centroids
        ]
    # sorted by centroid id so np.argmax's first-max rule = lowest cid
    cent_rows.sort(key=lambda r: r[0])
    cent_ids = [r[0] for r in cent_rows]
    cent_vecs = [r[1] for r in cent_rows]
    # left-to-right norm, matching the executor-side convention
    cent_norms = [
        math.sqrt(sum(v * v for v in vec)) for vec in cent_vecs
    ]
    thr = float(threshold)

    def _assign(batches: Iterator["object"]) -> Iterator["object"]:
        import numpy as np
        import pandas as pd

        c = np.asarray(cent_vecs, dtype=np.float64)
        cn = np.asarray(cent_norms, dtype=np.float64)
        cids = np.asarray(cent_ids, dtype=np.int64)
        # empty corpus -> empty centroid list -> c is 1-D; every batch
        # is empty too, so dim is never consulted
        dim = c.shape[1] if c.ndim == 2 else 0
        for pdf in batches:
            if not len(pdf):
                continue
            row_ids = pdf[id_col].to_numpy()
            x = _stack_vectors(
                pdf[vec_col].to_numpy(), row_ids, dim, "assign"
            )
            xn = _norms_lr(x)
            if not xn.all():
                bad = row_ids[(xn == 0.0).nonzero()[0][0]]
                raise ValueError(
                    f"semdedup assign: zero-norm embedding at id={bad!r}"
                    f" — cosine is undefined (NaN); filter zero vectors"
                    f" before semdedup_summary"
                )
            cs = _sim_round4_lr_fast(x, c, xn, cn)
            best = cs.argmax(axis=1)  # first max -> lowest centroid id
            yield pd.DataFrame(
                {
                    "_id": pdf[id_col].to_numpy(),
                    "_cid": cids[best],
                    "_cs": cs[np.arange(len(best)), best],
                    "_v": list(x),
                }
            )

    assigned = df.mapInPandas(
        _assign, "_id long, _cid long, _cs double, _v array<double>"
    )

    def _prune(pdf):
        import numpy as np
        import pandas as pd

        n = len(pdf)
        if n > max_cluster_rows:
            raise ValueError(
                f"semdedup cluster {int(pdf['_cid'].iloc[0])} has {n} rows"
                f" > max_cluster_rows={max_cluster_rows}: one cluster is one"
                f" in-memory pandas group, so a skewed cluster this large"
                f" must be split by raising n_clusters (K ~ sqrt(N) is the"
                f" paper's contract), not crunched on one executor."
            )
        x = np.stack(pdf["_v"].to_numpy()).astype(np.float64)
        nrm = _norms_lr(x)
        cs = pdf["_cs"].to_numpy()
        ids = pdf["_id"].to_numpy()
        removed = 0
        # blockwise pair pass: peak extra memory O(block x n), not n^2
        for lo in range(0, n, PRUNE_BLOCK_ROWS):
            hi = min(lo + PRUNE_BLOCK_ROWS, n)
            s = _sim_round4_lr_fast(x[lo:hi], x, nrm[lo:hi], nrm)
            near = s >= thr
            near[np.arange(lo, hi) - lo, np.arange(lo, hi)] = False
            # dominated by j: near AND (j lower centroid-sim, tie lower id)
            lower = (cs[lo:hi, None] > cs[None, :]) | (
                (cs[lo:hi, None] == cs[None, :])
                & (ids[lo:hi, None] > ids[None, :])
            )
            removed += int((near & lower).any(axis=1).sum())
        return pd.DataFrame(
            {
                "cluster_id": [int(pdf["_cid"].iloc[0])],
                "n_vectors": [n],
                "n_removed": [removed],
            }
        )

    # sorted output without orderBy(): a global sort's range sampling
    # re-executes the whole pipeline when AQE is off (measured 0.33s of
    # the query at sf0.1). The summary is K rows (K = n_clusters, the
    # paper's K ~ sqrt(N) — bounded), so ONE round-robin exchange to a
    # single partition + local sort is the right plan at any corpus
    # size. repartition, NOT coalesce: coalesce(1) would pull the
    # per-cluster prune kernel itself into one task.
    return (
        assigned.groupBy("_cid")
        .applyInPandas(
            _prune,
            "cluster_id long, n_vectors long, n_removed long",
        )
        .repartition(1)
        .sortWithinPartitions("cluster_id")
    )
