"""Bloom-prefiltered incremental dedup (t30): dedup a NEW batch against an
EXISTING corpus without ever shuffling the corpus.

The 100-TB problem this solves: a daily crawl increment (say 0.1% of the
corpus) must be deduplicated against everything already ingested. The naive
plan — `increment ANTI JOIN corpus ON content_hash` — shuffles the corpus's
hash column end-to-end (~hundreds of GB of exchange at 10B docs) to answer a
question whose output is increment-sized. The standard fix (the same idea
behind Spark's own runtime bloom-filter join, which cannot fire here because
the "join" spans two scans of one table split by a predicate) is:

  1. scan the corpus ONCE, map-side, folding content hashes into a Bloom
     bitmap (partial bitmaps per partition, OR-combined in a 2-level tree);
  2. probe the increment against the broadcast bitmap — rows the filter
     rejects are DEFINITELY new (Bloom has no false negatives) and exit
     without touching any join;
  3. rows the filter accepts ("maybe dup": true dups + fpp of the rest) are
     confirmed EXACTLY: broadcast their distinct hashes to a second corpus
     scan (map-side LEFT SEMI — still no corpus shuffle), and anti-join the
     maybe set against the confirmed hashes.

The result is EXACTLY the anti-join's answer — false positives are weeded
out by the confirm join, false negatives don't exist — which is what makes
t30 DuckDB-oracle-checkable even though a Bloom filter sits in the middle.
Total corpus cost: two column-pruned scans, zero shuffles; everything that
does shuffle is increment-sized or smaller.

Scale posture:
- the bitmap is sized from n and fpp but HARD-CAPPED (`max_bits`, default
  2^26 bits = 8 MiB) so it stays broadcastable at any corpus size; past the
  cap the fpp degrades gracefully (more rows take the confirm join — which
  is exact — rather than anything breaking). At 10B docs the uncapped 1%
  bitmap would be ~1.4 GiB; the cap keeps executor/driver memory flat and
  turns the overage into extra (map-side, broadcast) confirm work.
- partial bitmaps are OR-combined in a 2-level tree: P map partials →
  `fan_in` grouped reducers (applyInPandas OR) → driver ORs `fan_in`
  bitmaps. The driver never holds more than fan_in × max_bits/8 bytes
  (default 16 × 8 MiB = 128 MiB) no matter how many input partitions.
- the probe is one Arrow-vectorized pandas UDF against the broadcast
  bitmap (a JVM-side spelling would need a bitmap-indexable type Spark
  lacks); hashes are the md5 the rest of the repo standardizes on, so the
  oracle pins the semantics (the bitmap itself never affects the answer).

Reference: the reference engine has no incremental-dedup operator; this
extends the b31/t06 dedup family with the pattern public pipelines use for
increment-vs-corpus dedup (e.g. CCNet's per-shard hash sets, Wenzek et al.
2020, arXiv:1911.00359 §3.1 — there, exact hash partitioning; here, the
shuffle-free Bloom+confirm variant).
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    BooleanType,
    IntegerType,
    StructField,
    StructType,
)

# 2^26 bits = 8 MiB bitmap: comfortably broadcastable, and at fpp=0.01 it
# covers ~7M corpus rows before the error rate starts degrading (exactness
# never does — see module docstring).
DEFAULT_MAX_BITS = 1 << 26
DEFAULT_FPP = 0.01
# partial-OR tree width: the driver collects at most this many bitmaps.
OR_FAN_IN = 16


def bloom_params(n_items: int, fpp: float, max_bits: int) -> tuple[int, int]:
    """(m bits, k hashes) for n items at target fpp, m capped and rounded
    up to a whole byte. k is re-derived from the CAPPED m so a saturated
    bitmap degrades to fewer probes (standard m/n·ln2), not more."""
    n = max(1, int(n_items))
    m = int(math.ceil(-n * math.log(fpp) / (math.log(2) ** 2)))
    m = min(max(m, 64), int(max_bits))
    m = (m + 7) // 8 * 8
    k = max(1, min(16, int(round(m / n * math.log(2)))))
    return m, k


def _positions(h: "object", m: int, k: int):
    """Kirsch-Mitzenmacher double hashing over the 16-byte md5 digest:
    pos_i = (h1 + i*h2) mod m, h1/h2 the digest's two 8-byte halves
    (h2 forced odd). Pure uint64 wraparound arithmetic — deterministic
    across retries, engines, and numpy versions. h: (n, 16) uint8."""
    import numpy as np

    h1 = h[:, :8].copy().view(">u8").reshape(-1).astype(np.uint64)
    h2 = h[:, 8:].copy().view(">u8").reshape(-1).astype(np.uint64)
    h2 = h2 | np.uint64(1)
    out = np.empty((k, h.shape[0]), dtype=np.uint64)
    acc = h1.copy()
    mm = np.uint64(m)
    for i in range(k):
        out[i] = acc % mm
        acc = acc + h2  # uint64 wraparound is the intended modulus
    return out


_PARTIAL_SCHEMA = StructType(
    [
        StructField("grp", IntegerType(), False),
        StructField("bits", BinaryType(), False),
    ]
)


def build_bloom_bitmap(
    hashes: DataFrame,
    hash_col: str,
    m: int,
    k: int,
    fan_in: int = OR_FAN_IN,
) -> bytes:
    """Fold a DataFrame of 16-byte digests into one m-bit bitmap.

    Map side: one partial bitmap per input partition (mapInPandas —
    per-partition imperative state is exactly what the Pandas-iterator
    form is for). Combine: partials are grouped by partition_id % fan_in
    and OR-reduced (applyInPandas), so the driver's final OR sees at most
    `fan_in` bitmaps regardless of input partition count. NULL digests
    contribute nothing (NULL content equals nothing — anti-join
    semantics)."""

    nbytes = m // 8

    def _partial(batches: Iterator["object"]) -> Iterator["object"]:
        import numpy as np
        import pandas as pd
        from pyspark import TaskContext

        bm = np.zeros(nbytes, dtype=np.uint8)
        seen = False
        for pdf in batches:
            vals = [v for v in pdf[hash_col] if v is not None]
            if not vals:
                continue
            seen = True
            h = np.frombuffer(b"".join(vals), dtype=np.uint8).reshape(-1, 16)
            pos = _positions(h, m, k).reshape(-1)
            np.bitwise_or.at(
                bm, (pos >> np.uint64(3)).astype(np.int64),
                (np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8)),
            )
        if seen:
            ctx = TaskContext.get()
            pid = ctx.partitionId() if ctx is not None else 0
            yield pd.DataFrame(
                {"grp": [pid % fan_in], "bits": [bm.tobytes()]}
            )

    def _combine(pdf: "object") -> "object":
        import numpy as np
        import pandas as pd

        acc = np.zeros(nbytes, dtype=np.uint8)
        for b in pdf["bits"]:
            acc |= np.frombuffer(b, dtype=np.uint8)
        return pd.DataFrame({"grp": pdf["grp"].iloc[:1], "bits": [acc.tobytes()]})

    partials = hashes.select(F.col(hash_col)).mapInPandas(
        _partial, _PARTIAL_SCHEMA
    )
    # the grouped OR level exists to bound what the driver collects;
    # when nparts × bitmap bytes already fits the same budget the tree
    # guarantees (fan_in × max bitmap size, 128 MiB at defaults), the
    # direct collect is strictly cheaper (drops a shuffle + stage per
    # build) AND respects the identical driver-memory invariant
    nparts = hashes.rdd.getNumPartitions()
    budget = fan_in * (DEFAULT_MAX_BITS // 8)
    reduced = (
        partials
        if nparts * nbytes <= budget
        else partials.groupBy("grp").applyInPandas(_combine, _PARTIAL_SCHEMA)
    )
    import numpy as np

    final = np.zeros(nbytes, dtype=np.uint8)
    for row in reduced.collect():  # bounded by `budget` bytes total
        final |= np.frombuffer(row["bits"], dtype=np.uint8)
    return final.tobytes()


def incremental_new_docs(
    corpus: DataFrame,
    increment: DataFrame,
    content_col: str = "text",
    fpp: float = DEFAULT_FPP,
    max_bits: int = DEFAULT_MAX_BITS,
    n_items: int | None = None,
) -> DataFrame:
    """Rows of `increment` whose content does NOT appear in `corpus` —
    bit-for-bit the anti-join answer, computed with zero corpus shuffle
    (see module docstring for the plan). Returns increment's columns.

    `n_items` overrides the corpus count used to size the bitmap (pass a
    cheap upper bound — e.g. the parquet metadata row count of the
    unfiltered table — to skip the sizing scan; oversizing only wastes
    capped bitmap space, never correctness)."""
    spark = SparkSession.getActiveSession() or corpus.sparkSession

    ck = F.unhex(F.md5(F.col(content_col))).alias("__ck")
    corpus_h = corpus.select(ck)
    n = int(n_items) if n_items is not None else corpus_h.count()
    m, k = bloom_params(n, fpp, max_bits)
    bitmap = build_bloom_bitmap(corpus_h, "__ck", m, k)
    bc = spark.sparkContext.broadcast(bitmap)

    @F.pandas_udf(BooleanType())
    def _maybe(col: pd.Series) -> pd.Series:
        import numpy as np

        bm = np.frombuffer(bc.value, dtype=np.uint8)
        vals = col.to_numpy()
        out = np.zeros(len(vals), dtype=bool)
        live = np.array([v is not None for v in vals], dtype=bool)
        if live.any():
            h = np.frombuffer(
                b"".join(vals[live]), dtype=np.uint8
            ).reshape(-1, 16)
            pos = _positions(h, m, k)
            hit = np.ones(h.shape[0], dtype=bool)
            for i in range(k):
                p = pos[i]
                hit &= (
                    bm[(p >> np.uint64(3)).astype(np.int64)]
                    & (np.uint8(1) << (p & np.uint64(7)).astype(np.uint8))
                ) != 0
            out[live] = hit
        return pd.Series(out)

    inc = increment.withColumn("__ck", ck)
    # Bloom has no false negatives, so `confirmed` (below) contains the
    # hash of EVERY duplicated increment row: rows the filter rejected
    # are provably absent from the corpus and can't be in `confirmed`
    # either. One anti-join against it therefore answers for the WHOLE
    # increment — no maybe/definitely branch union, and the probe UDF
    # runs exactly once (inside the maybe-hash build), not once per
    # branch (the original two-branch union re-ran it per branch —
    # measured 1.38s warm at sf0.1, ~2× this plan).
    maybe_hashes = (
        inc.filter(_maybe(F.col("__ck"))).select("__ck").distinct()
    )
    # Exact confirm, corpus side map-only: the maybe set is increment-
    # bounded (true dups + fpp·|increment|), so its distinct hashes
    # broadcast; LEFT SEMI against them is the second corpus scan.
    confirmed = (
        corpus_h.join(F.broadcast(maybe_hashes), "__ck", "leftsemi").distinct()
    )
    # NULL __ck (NULL content) never equals a confirmed hash → kept,
    # the anti-join/NOT EXISTS semantics.
    return inc.join(F.broadcast(confirmed), "__ck", "leftanti").drop("__ck")
