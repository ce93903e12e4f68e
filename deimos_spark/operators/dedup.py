"""Deduplication operators for LLM-data pipelines.

Exact, MinHash+LSH, SimHash, and n-gram-Jaccard near-dup — all expressed
with JVM-side columnar expressions (xxhash64, higher-order functions) so
they distribute cleanly: the only shuffles are the groupBy on hash keys /
LSH buckets, which is the theoretical minimum for dedup.

Scale notes (100 TB):
- exact dedup: shuffle on a 256-bit content hash, uniform by construction —
  no skew. Map-side combine removes intra-partition dupes first.
- MinHash-LSH: band buckets are the join key; bucket sizes are bounded by
  tuning (bands×rows); candidate verification is per-pair Jaccard, done
  after the equi-join (never cartesian).
- SimHash: 64-bit fingerprint; near-dup candidates via band equality on
  16-bit chunks (any hamming-≤3 pair shares ≥1 of 4 chunks — pigeonhole).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from deimos_spark.functions.text import shingles, tokens


# ---------------------------------------------------------------- exact

def dedup_exact(df: DataFrame, cols: list[str]) -> DataFrame:
    """Exact dedup on a column subset. dropDuplicates = hash shuffle on the
    cols + first-row pick; deterministic result set (not row identity)."""
    return df.dropDuplicates(cols)


def dedup_by_content_hash(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Keep the smallest id per identical content (sha2-256 of text).
    Hashing first means the shuffle carries a 32-byte key instead of the
    full document — at 100 TB that's the difference that matters."""
    h = F.sha2(F.col(text_col), 256)
    return (
        df.withColumn("_h", h)
        .groupBy("_h")
        .agg(F.min(id_col).alias(id_col))
        .drop("_h")
    )


# ---------------------------------------------------------------- MinHash + LSH

def minhash_signature(
    col: Column | str, num_hashes: int = 32, shingle_n: int = 3
) -> Column:
    """MinHash signature as array<bigint>: for seed j, min over shingles of
    xxhash64(shingle, j). Pure codegen (higher-order functions + xxhash64)."""
    sh = shingles(col, shingle_n)
    return F.array(
        *[
            F.array_min(F.transform(sh, lambda s, j=j: F.xxhash64(s, F.lit(j))))
            for j in range(num_hashes)
        ]
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    jaccard_threshold: float = 0.5,
) -> DataFrame:
    """Near-duplicate pairs via MinHash banding.

    bands=8 × rows=4 over 32 hashes ⇒ s-curve threshold ≈ (1/8)^(1/4) ≈ 0.59.
    Candidates = equi-join on (band_id, band_hash); each candidate pair is
    verified with exact shingle Jaccard. Returns (id_a, id_b, jaccard).
    """
    rows = num_hashes // bands
    sig = minhash_signature(text_col, num_hashes, shingle_n)
    with_sig = df.select(
        F.col(id_col), F.col(text_col), sig.alias("_sig")
    )
    banded = with_sig.select(
        id_col,
        text_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            *[F.element_at("_sig", b * rows + r + 1) for r in range(rows)]
                        ).alias("bh"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select(id_col, text_col, "bb.band", "bb.bh")

    left = banded.select(
        F.col(id_col).alias("id_a"), F.col(text_col).alias("ta"), "band", "bh"
    )
    right = banded.select(
        F.col(id_col).alias("id_b"), F.col(text_col).alias("tb"), "band", "bh"
    )
    cand = (
        left.join(right, ["band", "bh"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "ta", "tb")
        .distinct()
    )
    jac = ngram_jaccard_expr(F.col("ta"), F.col("tb"), shingle_n)
    return (
        cand.select("id_a", "id_b", F.round(jac, 4).alias("jaccard"))
        .filter(F.col("jaccard") >= jaccard_threshold)
    )


# ---------------------------------------------------------------- n-gram Jaccard

def ngram_jaccard_expr(a: Column, b: Column, n: int = 3) -> Column:
    """Exact Jaccard over word n-gram shingle *sets*."""
    sa = F.array_distinct(shingles(a, n))
    sb = F.array_distinct(shingles(b, n))
    inter = F.size(F.array_intersect(sa, sb))
    union = F.size(F.array_union(sa, sb))
    return F.when(union == 0, F.lit(0.0)).otherwise(inter / union)


def jaccard_vs_query(
    df: DataFrame,
    query_text: str,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 20,
) -> DataFrame:
    """Top-k most-similar documents to a fixed query text by shingle
    Jaccard — linear scan + TakeOrderedAndProject, no shuffle."""
    jac = ngram_jaccard_expr(F.col(text_col), F.lit(query_text), n)
    return (
        df.select(F.col(id_col), F.round(jac, 4).alias("jaccard"))
        .orderBy(F.col("jaccard").desc(), F.col(id_col))
        .limit(k)
    )


# ---------------------------------------------------------------- SimHash

def simhash64(col: Column | str) -> Column:
    """64-bit SimHash over whitespace tokens.

    bit b of the fingerprint = sign of Σ_tokens (±1 by bit b of
    xxhash64(token)). Folded entirely in codegen: aggregate over the token
    array with a 64-int accumulator (zip_with add), then re-pack to a long.
    """
    toks = tokens(col)
    # bit positions are unrolled Python-side (shiftright needs a literal int)
    bitvec = F.aggregate(
        toks,
        F.array_repeat(F.lit(0).cast("long"), 64),
        lambda acc, t: F.zip_with(
            acc,
            F.array(
                *[
                    F.when(
                        F.shiftright(F.xxhash64(t), i).bitwiseAND(F.lit(1)) == 1,
                        F.lit(1).cast("long"),
                    ).otherwise(F.lit(-1).cast("long"))
                    for i in range(64)
                ]
            ),
            lambda a, b: a + b,
        ),
    )
    # pack sign bits into a long: OR of 2^i for bits where acc[i] > 0
    packed = F.lit(0).cast("long")
    for i in range(64):
        mask = (1 << i) if i < 63 else -(1 << 63)  # bit 63 = long sign bit
        packed = packed.bitwiseOR(
            F.when(
                F.element_at(bitvec, i + 1) > 0, F.lit(mask).cast("long")
            ).otherwise(F.lit(0).cast("long"))
        )
    return packed


def simhash_near_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs with SimHash hamming distance ≤ max_hamming.

    Candidate generation: split the 64-bit fingerprint into 4 16-bit chunks;
    any pair within hamming 3 must agree on ≥1 chunk (pigeonhole), so an
    equi-join per chunk finds all candidates without a cartesian product.
    """
    sh = df.select(F.col(id_col), simhash64(text_col).alias("_sh"))
    chunks = sh.select(
        id_col,
        "_sh",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk"),
                        F.shiftright("_sh", 16 * c)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("cv"),
                    )
                    for c in range(4)
                ]
            )
        ).alias("cc"),
    ).select(id_col, "_sh", "cc.chunk", "cc.cv")
    left = chunks.select(
        F.col(id_col).alias("id_a"), F.col("_sh").alias("sa"), "chunk", "cv"
    )
    right = chunks.select(
        F.col(id_col).alias("id_b"), F.col("_sh").alias("sb"), "chunk", "cv"
    )
    ham = F.bit_count(F.col("sa").bitwiseXOR(F.col("sb")))
    return (
        left.join(right, ["chunk", "cv"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", ham.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )
