"""Streaming twin of t30: a continuously-ingesting, always-deduplicated
corpus. Each micro-batch is deduplicated against everything ingested so
far WITHOUT shuffling the corpus, and the survivors are appended
exactly-once.

This is the shape a production crawl-ingest pipeline actually runs: the
corpus is a lakehouse table that only ever grows by appends; the daily /
per-batch increment is tiny relative to it; and dedup must be (a) exact,
(b) restart-safe, (c) sublinear in corpus traffic. The three pieces are
all existing machinery composed:

1. in-batch content dedup — keep the min-id row per md5(content) (the
   b31b rule): two copies of a new document arriving in ONE batch must
   not both survive (the corpus check can't catch them — neither is in
   the corpus yet);
2. increment-vs-corpus dedup — operators/bloomdedup.incremental_new_docs
   (t30): map-side Bloom bitmap over the corpus scan, broadcast exact
   confirm join; bit-for-bit the anti-join's answer, zero corpus
   shuffle;
3. exactly-once append — the corpus is a Delta table and the survivor
   append carries the (app_id, batch_id) `txn` action, so a replayed
   micro-batch is a protocol-level no-op (the C2 machinery,
   streaming/consumer.py precedent).

Even WITHOUT the txn action the design is content-idempotent: a replayed
batch's rows are already in the corpus, so step 2 drops every one of
them — the txn action closes only the window where a crash lands between
the append's data-file write and its commit.

Reference anchor: deimos consumers are exactly this loop for RDBMS
upserts (consumer.rb batch consumption → ActiveRecord upsert); this is
the corpus-dedup instantiation at lakehouse scale.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from deimos_spark.operators.bloomdedup import (
    DEFAULT_FPP,
    DEFAULT_MAX_BITS,
    incremental_new_docs,
)


class DedupIngest:
    """See module docstring. `process_batch` is the foreachBatch body;
    `attach` wires it to a streaming DataFrame."""

    def __init__(
        self,
        spark: SparkSession,
        corpus_path: str,
        content_col: str = "text",
        id_col: str = "doc_id",
        fpp: float = DEFAULT_FPP,
        max_bits: int = DEFAULT_MAX_BITS,
    ):
        self.spark = spark
        self.corpus_path = corpus_path
        self.content_col = content_col
        self.id_col = id_col
        self.fpp = fpp
        self.max_bits = max_bits

    # ------------------------------------------------------------ corpus

    def _exists(self) -> bool:
        return os.path.isdir(os.path.join(self.corpus_path, "_delta_log"))

    def corpus(self) -> DataFrame:
        from deimos_spark.operators.delta_interop import DeltaTableReader

        return DeltaTableReader(self.spark, self.corpus_path).read()

    # ------------------------------------------------------- batch body

    def _dedup_within_batch(self, batch: DataFrame) -> DataFrame:
        """Keep the min-id row per content (b31b keep-rule) — ties on
        content inside one batch are decided deterministically, so
        retries and the oracle agree. NULL contents are EXEMPT: NULL
        equals nothing (the anti-join semantics the corpus step also
        uses), so two NULL-text rows are not duplicates of each other
        — without the exemption they'd all share the md5(NULL) window
        partition and collapse to one."""
        w = Window.partitionBy(F.md5(F.col(self.content_col))).orderBy(
            F.col(self.id_col)
        )
        return (
            batch.withColumn("__rn", F.row_number().over(w))
            .filter(
                F.col(self.content_col).isNull() | (F.col("__rn") == 1)
            )
            .drop("__rn")
        )

    def _corpus_rows_hint(self) -> int | None:
        """Upper bound on corpus rows from the Delta snapshot's add
        stats — the bitmap sizer only needs a bound, and a metadata sum
        beats paying a third full corpus scan (count job) per
        micro-batch. None (→ count fallback) when any file lacks
        stats."""
        import json as _json

        from deimos_spark.operators.delta_interop import DeltaTableReader

        try:
            snap = DeltaTableReader(self.spark, self.corpus_path).snapshot()
            total = 0
            for add in snap.adds_raw.values():
                st = add.get("stats")
                if not st:
                    return None
                total += int(_json.loads(st)["numRecords"])
            return total if total > 0 else None
        except Exception:
            return None

    def process_batch(
        self, batch: DataFrame, txn: tuple[str, int] | None = None
    ) -> None:
        from deimos_spark.operators.delta_interop import DeltaTableWriter

        deduped = self._dedup_within_batch(batch)
        if self._exists():
            survivors = incremental_new_docs(
                self.corpus(),
                deduped,
                content_col=self.content_col,
                fpp=self.fpp,
                max_bits=self.max_bits,
                n_items=self._corpus_rows_hint(),
            )
        else:
            survivors = deduped  # first batch founds the corpus
        DeltaTableWriter(self.spark, self.corpus_path).append(
            survivors, txn=txn
        )

    # --------------------------------------------------------- streaming

    def attach(
        self,
        stream_df: DataFrame,
        checkpoint: str,
        txn_app_id: str | None = None,
    ):
        """foreachBatch wiring; with `txn_app_id` the append is
        exactly-once per (app_id, batch_id)."""
        return (
            stream_df.writeStream.foreachBatch(
                lambda b, bid: self.process_batch(
                    b,
                    txn=(txn_app_id, bid) if txn_app_id is not None else None,
                )
            )
            .option("checkpointLocation", checkpoint)
            .outputMode("append")
        )
