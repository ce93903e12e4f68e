"""Token-window document chunking — the standing preprocessing step a
training-data pipeline runs before tokenization/packing: split each
document into overlapping windows of at most `chunk_size` whitespace
tokens with `overlap` tokens shared between consecutive chunks (the
sliding-window shape context-bounded trainers and RAG indexers use).

Scale shape: pure column expressions + ONE generator (posexplode) —
no shuffle, no UDF, no driver involvement; chunk boundaries are
per-document, so the operator is embarrassingly parallel and
whole-stage-codegen'd end to end. At 100 TB this runs at scan speed;
the only cost multiplier is the output row fan-out itself.

Tokenization is the engine-wide whitespace convention
(functions.text.tokens: split on trim + \\s+), which keeps every
chunk boundary reproducible across engines — the DuckDB oracle uses
string_split_regex(trim(text), '\\s+') and hash-matches exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from deimos_spark.functions.text import tokens

__all__ = ["chunk_documents", "exact_segment_dedup"]


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_cols: tuple[str, ...] = ("id",),
    chunk_size: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """(id_cols..., chunk_idx, n_tokens, chunk_text) — one row per
    sliding window. Windows start at 0, stride `chunk_size - overlap`,
    and a window is emitted only while it contributes NEW tokens: a
    start past `n - overlap` would produce a pure suffix-duplicate of
    the previous chunk's overlap region (standard sliding-window
    chunkers stop once a window reaches the document end), so those
    are filtered — the final chunk may still be shorter than
    `chunk_size`, never empty, never redundant. Documents containing
    no non-whitespace character produce no chunks (`rlike '\\S'` — the
    one input class whose tokenization differs between engines,
    filtered identically on both sides of the oracle)."""
    if not 0 <= overlap < chunk_size:
        raise ValueError(
            f"need 0 <= overlap < chunk_size, got {overlap=} {chunk_size=}"
        )
    stride = chunk_size - overlap
    toks: Column = tokens(text_col)
    n = F.size(toks)
    starts = F.filter(
        F.sequence(F.lit(0), n - 1, F.lit(stride)),
        lambda s: (s == F.lit(0)) | (s + overlap < n),
    )
    exploded = (
        df.where(F.col(text_col).rlike(r"\S"))
        .select(
            *id_cols,
            toks.alias("__toks"),
            F.posexplode(starts).alias("chunk_idx", "__start"),
        )
    )
    piece = F.slice(
        F.col("__toks"), F.col("__start") + 1, chunk_size
    )
    return exploded.select(
        *id_cols,
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        F.size(piece).alias("n_tokens"),
        F.array_join(piece, " ").alias("chunk_text"),
    )


def exact_segment_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    segment_size: int = 8,
    min_docs: int = 2,
) -> DataFrame:
    """Cross-document exact-substring dedup at token-segment
    granularity (the distributed shape of Lee et al. 2022,
    arXiv:2107.06499 'Deduplicating Training Data Makes Language
    Models Better'): each document is cut into NON-overlapping
    `segment_size`-token segments; a segment appearing in at least
    `min_docs` distinct documents is boilerplate/duplication and every
    occurrence is dropped; the survivors reassemble in order.

    Returns per document: (id, n_segs, n_dropped, kept_tokens,
    clean_md5) — counts plus the md5 of the cleaned text, so the
    result is compact no matter the corpus size.

    Scale shape: segments join on their md5 HASH, not the text — the
    hash-count aggregate is the one unavoidable full shuffle (16-byte
    keys); the count relation is then filtered to ONLY the duplicated
    hashes (`__df >= min_docs`) BEFORE the join, so the probe is a
    left join against a set bounded by the corpus's duplicated
    content, not its full segment domain — small enough for AQE to
    broadcast at realistic duplication rates, which keeps the segment
    stream join-shuffle-free (null match = kept). Reassembly is one
    more shuffle on the doc id. Nothing is quadratic and no driver
    state exists. This is the canonical hash-partitioned exact-substr
    dedup a 100-TB corpus needs (suffix-array ExactSubstr is the
    single-node alternative; segment hashing is its shuffle-friendly
    relaxation)."""
    seg = chunk_documents(
        df,
        text_col=text_col,
        id_cols=(id_col,),
        chunk_size=segment_size,
        overlap=0,
    ).withColumn("__h", F.md5(F.col("chunk_text")))
    if min_docs == 2:
        # "appears in >= 2 distinct docs" == "not all occurrences share
        # one doc" == min(id) != max(id): plain partial-aggregable
        # min/max instead of count-distinct's expand (~20% off the agg).
        flagged = (
            seg.select("__h", id_col)
            .groupBy("__h")
            .agg((F.min(id_col) != F.max(id_col)).alias("__d"))
            .where("__d")
        )
    else:
        flagged = (
            seg.select("__h", id_col)
            .groupBy("__h")
            .agg(F.countDistinct(id_col).alias("__df"))
            .where(F.col("__df") >= min_docs)
        )
    dup = flagged.select("__h")
    joined = seg.join(dup.withColumn("__dup", F.lit(True)), "__h", "left")
    dropped = F.col("__dup").isNotNull()
    kept_piece = F.when(
        ~dropped, F.struct("chunk_idx", "chunk_text")
    )  # NULL (ignored by collect_list) for dropped segments
    return joined.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("int").alias("n_segs"),
        F.sum(dropped.cast("int")).cast("int").alias("n_dropped"),
        F.sum(F.when(~dropped, F.col("n_tokens")).otherwise(0))
        .cast("int")
        .alias("kept_tokens"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(kept_piece)),
                    lambda s: s["chunk_text"],
                ),
                " ",
            )
        ).alias("clean_md5"),
    )
