"""Sequence-packing plan for LLM training-data pipelines.

Training pipelines concatenate documents and chunk the stream into
fixed-size token windows ("sequence packing"). A GLOBAL running token
sum is the textbook scale-killer — `Window.orderBy` with no partition
moves the whole corpus to one task. The scale-correct shape (what real
corpus tooling does) is shard-parallel packing: documents are assigned
to shards by a deterministic content hash, and the pack is contiguous
WITHIN each shard — embarrassingly parallel, one bounded-size window
partition per shard, and reproducible across runs/engines because the
shard assignment is the same md5 bucketing the sampling operators use.

`pack_plan` emits the plan's summary per (shard, window): how many
documents start in each capacity-sized window and their token mass —
the numbers a packing job needs to size its output files. All integer
outputs → exact DuckDB oracle comparison (t17).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from deimos_spark.operators.sampling import hash_bucket


def pack_plan(
    df: DataFrame,
    capacity: int = 512,
    shards: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
    salt: str = "pack",
) -> DataFrame:
    """Per (shard, bin) packing summary: documents are laid out
    contiguously in id order within their shard; a doc's bin is the
    capacity-window its FIRST token lands in (docs may straddle
    windows, as packed training streams do)."""
    tok = F.size(F.split(F.trim(F.col(text_col)), r"\s+"))
    d = df.select(
        F.col(id_col),
        hash_bucket(F.col(id_col), shards, salt=salt).alias("shard"),
        tok.alias("_tok"),
    )
    w = Window.partitionBy("shard").orderBy(id_col)
    start = F.sum("_tok").over(w) - F.col("_tok")
    return (
        d.select("shard", "_tok", F.floor(start / capacity).alias("bin"))
        .groupBy("shard", "bin")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("_tok").cast("bigint").alias("n_tokens"),
        )
        .orderBy("shard", "bin")
    )
