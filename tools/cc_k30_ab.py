"""One-off diagnostic: old-vs-new CC loop shape on the K=30 STRESS_T28
edge relation (1.5M pairs, clique components), interleaved in one
session — answers whether the r15 CC change (lazy checkpoint fused with
a full-count probe) regressed the stress keep stage at this scale, or
whether the K=30 keep_sec spread (23-73s across same-HEAD runs) is host
noise. Edges are checkpointed first so only the CC loop is timed.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import pandas as pd

from cc_profile import run  # noqa: E402

from deimos_spark.operators.simsearch import (  # noqa: E402
    pairwise_cosine_exact_blocked,
)
from deimos_spark.session import get_spark  # noqa: E402


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    spark = get_spark("cc_k30_ab")
    spark.range(1).collect()
    topics, members, dim = 64 * k, 40, 64
    rng = np.random.RandomState(1234 + k)
    dirs = rng.standard_normal((topics, dim))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    x = (
        np.repeat(dirs, members, axis=0)
        + rng.standard_normal((topics * members, dim)) * 0.02
    )
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    pdf = pd.DataFrame(
        {
            "vec_id": np.arange(len(x), dtype=np.int64),
            "embedding": [r.tolist() for r in x],
        }
    )
    path = "/tmp/ds_cc_ab/emb"
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(path)
    emb = spark.read.parquet(path)
    pairs = pairwise_cosine_exact_blocked(
        emb, 0.8, n_cells=2 * topics, max_iter=10, max_train=20_000,
        id_col="vec_id", vec_col="embedding",
    )
    edges = pairs.localCheckpoint(eager=True)
    print(f"edges = {edges.count()}")
    for variant in ("old", "new", "old", "new", "old", "new"):
        print(f"variant {variant} loadavg {os.getloadavg()[0]:.2f}")
        run(edges, variant)


if __name__ == "__main__":
    main()
