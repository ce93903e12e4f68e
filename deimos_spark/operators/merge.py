"""Keyed-table MERGE: bulk upsert + delete against a parquet-backed table.

Reference behavior (studied from /root/reference/lib/deimos/
active_record_consume/mass_updater.rb + batch_consumption.rb, behavior
only): INSERT ... ON CONFLICT (key_cols) DO UPDATE for upserts (A17),
`WHERE key IN (...) DELETE` for tombstones (A18), all-or-nothing per batch.

Spark-first design: the interface is MERGE-shaped (upserts df + deletes df
in, new table state out) so a Delta/Iceberg `MERGE INTO` can slot in
unchanged. The OSS-parquet fallback implements merge as:

    new_state = current ANTI-JOIN (upsert_keys ∪ delete_keys)  UNION  upserts

i.e. one shuffle on the key columns. Writes go to a temp dir then swap in
(atomic-enough for single-writer; a real deployment uses a transactional
table format). At 100 TB you'd partition the table by a key prefix and
rewrite only affected partitions — `partition_by` enables that: with it,
only partitions containing changed keys are rewritten (partition-pruned
read + dynamic partition overwrite).
"""

from __future__ import annotations

import os
import shutil
import uuid
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class KeyedParquetTable:
    """A mutable keyed table over parquet with MERGE semantics."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        key_cols: Sequence[str],
        schema=None,
        partition_by: Sequence[str] = (),
    ):
        self.spark = spark
        self.path = path
        self.key_cols = list(key_cols)
        self.schema = schema
        self.partition_by = list(partition_by)

    # ---------------------------------------------------------------- read

    def exists(self) -> bool:
        return os.path.exists(self.path) and any(
            name.endswith(".parquet") or name.startswith("part-")
            for root, _, files in os.walk(self.path)
            for name in files
        )

    def read(self) -> DataFrame:
        if not self.exists():
            if self.schema is None:
                raise FileNotFoundError(f"table {self.path} is empty and has no schema")
            return self.spark.createDataFrame([], self.schema)
        return self.spark.read.parquet(self.path)

    # --------------------------------------------------------------- write

    def overwrite(self, df: DataFrame) -> None:
        """Full rewrite via temp-dir swap (keeps readers from seeing a
        half-written table; single-writer assumption, like the reference's
        per-topic lock)."""
        tmp = f"{self.path}.__tmp_{uuid.uuid4().hex[:8]}"
        writer = df.write.mode("overwrite")
        if self.partition_by:
            writer = writer.partitionBy(*self.partition_by)
        writer.parquet(tmp)
        old = f"{self.path}.__old_{uuid.uuid4().hex[:8]}"
        if os.path.exists(self.path):
            os.rename(self.path, old)
        os.rename(tmp, self.path)
        if os.path.exists(old):
            shutil.rmtree(old)

    def merge(
        self,
        upserts: DataFrame | None = None,
        delete_keys: DataFrame | None = None,
    ) -> None:
        """MERGE: apply upserts (insert-or-replace by key) and deletes in one
        rewrite. `upserts` must already be compacted to one row per key
        (use operators.compaction.compact_keep_last); `delete_keys` needs
        only the key columns.

        Partitioned tables take the pruned path: only partitions containing
        affected keys are read and rewritten — at 100 TB a batch touching
        one day rewrites one day, not the table. Requires partition_by ⊆
        merge-input columns (true whenever partitions derive from keys).
        """
        affected_keys = None
        for src in (upserts, delete_keys):
            if src is not None:
                k = src.select(*self.key_cols).distinct()
                affected_keys = k if affected_keys is None else affected_keys.union(k).distinct()
        if affected_keys is None:
            return

        pruned = bool(self.partition_by) and all(
            (upserts is None or p in upserts.columns)
            and (delete_keys is None or p in delete_keys.columns)
            for p in self.partition_by
        )
        if pruned and self.exists():
            self._merge_pruned(upserts, delete_keys, affected_keys)
            return

        current = self.read() if (self.exists() or self.schema is not None) else None
        if current is not None:
            survivors = current.join(
                F.broadcast(affected_keys), self.key_cols, "left_anti"
            )
        else:
            survivors = None

        new_rows = upserts
        if survivors is not None and new_rows is not None:
            new_state = survivors.unionByName(new_rows.select(*survivors.columns))
        elif new_rows is not None:
            new_state = new_rows
        else:
            new_state = survivors
        self.overwrite(new_state)

    def _merge_pruned(self, upserts, delete_keys, affected_keys) -> None:
        """Partition-pruned merge: read only affected partitions (pushdown
        via IN-filter on partition columns), rewrite only those partitions
        with dynamic partitionOverwriteMode."""
        parts = None
        for src in (upserts, delete_keys):
            if src is not None:
                p = src.select(*self.partition_by).distinct()
                parts = p if parts is None else parts.union(p).distinct()
        part_rows = parts.collect()  # affected partition VALUES — small
        if not part_rows:
            return

        cond = None
        for r in part_rows:
            c = None
            for p in self.partition_by:
                pc = F.col(p) == r[p]
                c = pc if c is None else (c & pc)
            cond = c if cond is None else (cond | c)

        current = self.read().filter(cond)  # partition-pruned scan
        survivors = current.join(F.broadcast(affected_keys), self.key_cols, "left_anti")
        new_state = (
            survivors.unionByName(upserts.select(*survivors.columns))
            if upserts is not None
            else survivors
        )
        # dynamic overwrite only rewrites partitions PRESENT in new_state;
        # a partition emptied by deletes must be removed explicitly
        remaining = {
            tuple(r[p] for p in self.partition_by)
            for r in new_state.select(*self.partition_by).distinct().collect()
        }
        emptied = [
            r for r in part_rows
            if tuple(r[p] for p in self.partition_by) not in remaining
        ]

        new_state.cache()
        try:
            if new_state.head(1):
                (
                    new_state.write.mode("overwrite")
                    .option("partitionOverwriteMode", "dynamic")
                    .partitionBy(*self.partition_by)
                    .parquet(self.path)
                )
            for r in emptied:
                d = os.path.join(
                    self.path, *[f"{p}={r[p]}" for p in self.partition_by]
                )
                if os.path.exists(d):
                    shutil.rmtree(d)
        finally:
            new_state.unpersist()

    def upsert(self, batch: DataFrame, order_cols: Sequence[str] | None = None) -> None:
        """Convenience: compact a batch (keep-last per key if order given)
        then merge as upserts."""
        if order_cols:
            from deimos_spark.operators.compaction import compact_keep_last

            batch = compact_keep_last(batch, self.key_cols, order_cols)
        self.merge(upserts=batch)

    def delete(self, keys: DataFrame) -> None:
        self.merge(delete_keys=keys)
