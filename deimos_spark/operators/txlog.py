"""Transaction-logged keyed table: MERGE with snapshot isolation and
optimistic concurrency over plain parquet — a minimal, dependency-free
implementation of the Delta-Lake-style commit-log protocol (public
design: the "Delta Lake: High-Performance ACID Table Storage" VLDB'20
paper / delta.io PROTOCOL.md; no Delta code used).

Why: `KeyedParquetTable` (operators/merge.py) swaps the whole directory —
single-writer only, readers can race the swap, and a 100-TB table rewrite
is all-or-nothing. This format fixes all three with the standard log
trick:

- **Data files are immutable.** Each write creates new parquet file-units
  under `data/`; nothing is modified in place.
- **The log is the table.** `_txlog/{version:020d}.json` commits record
  file-units added/removed. A snapshot = replay of commits ≤ v. Readers
  always see a complete version — a reader planning over version N is
  unaffected by a concurrent commit of N+1 (its files still exist).
- **Commits are atomic + optimistic.** A commit claims its version via
  O_CREAT|O_EXCL (put-if-absent; on S3/HDFS this maps to the same
  conditional-put primitive Delta uses). Two writers racing version N+1:
  exactly one wins; the loser's MERGE re-reads the new snapshot and
  re-derives its result — correct because MERGE is deterministic in
  (inputs, current state).
- **Partition-pruned MERGE is file-level.** File-units carry their
  partition values in the log, so a merge touching one day rewrites only
  that day's units; unaffected units are carried forward untouched (no
  read, no write — just log entries).
- **Time travel** falls out: `read(version=k)` replays to k.

Partitioned storage detail: partition columns are kept IN the data files
(self-contained units) and the split into per-partition units is done with
shadow `_p_<col>` hive directories at write time — so a unit read needs no
basePath/discovery magic, and the log, not directory listing, is the
source of truth (the Delta design point that makes S3 listings irrelevant).

Reference parity: same MERGE semantics as KeyedParquetTable (reference
mass_updater.rb INSERT..ON CONFLICT DO UPDATE + batch deletes, batch
atomicity per commit), now with real concurrent-writer safety.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid
from collections.abc import Sequence
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


class CommitConflict(Exception):
    """Another writer claimed this version first."""


@dataclass
class Snapshot:
    version: int  # -1 = empty table, no commits yet
    units: dict[str, dict[str, str]]  # unit path (rel) -> partition values
    schema_json: str | None = None


@dataclass
class TransactionLogTable:
    """Keyed table with MERGE over a parquet + commit-log layout.

    Drop-in for KeyedParquetTable: read / merge / upsert / delete /
    overwrite / exists have identical signatures and semantics.
    """

    spark: SparkSession
    path: str
    key_cols: Sequence[str]
    schema: T.StructType | str | None = None
    partition_by: Sequence[str] = field(default_factory=tuple)
    max_commit_retries: int = 5

    def __post_init__(self):
        self.key_cols = list(self.key_cols)
        self.partition_by = list(self.partition_by)
        os.makedirs(self._log_dir, exist_ok=True)
        os.makedirs(self._data_dir, exist_ok=True)

    # ------------------------------------------------------------ log layer

    @property
    def _log_dir(self) -> str:
        return os.path.join(self.path, "_txlog")

    @property
    def _data_dir(self) -> str:
        return os.path.join(self.path, "data")

    def _commit_path(self, version: int) -> str:
        return os.path.join(self._log_dir, f"{version:020d}.json")

    def snapshot(self, version: int | None = None) -> Snapshot:
        """Replay commits ≤ version (default: all) into a live file set."""
        names = sorted(n for n in os.listdir(self._log_dir) if n.endswith(".json"))
        units: dict[str, dict[str, str]] = {}
        v, schema_json = -1, None
        for name in names:
            cv = int(name[:-5])
            if version is not None and cv > version:
                break
            with open(os.path.join(self._log_dir, name)) as fh:
                c = json.load(fh)
            for r in c.get("removes", []):
                units.pop(r, None)
            for a in c.get("adds", []):
                units[a["path"]] = a.get("partitions", {})
            v = cv
            schema_json = c.get("schema") or schema_json
        return Snapshot(v, units, schema_json)

    def _commit(
        self,
        version: int,
        adds: list[dict],
        removes: list[str],
        schema_json: str | None,
    ) -> None:
        """Atomically claim `version` (put-if-absent). Raises
        CommitConflict if another writer got there first."""
        payload = json.dumps(
            {
                "version": version,
                "adds": adds,
                "removes": removes,
                "schema": schema_json,
                "timestamp": time.time(),
            }
        )
        target = self._commit_path(version)
        try:
            fd = os.open(target, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError as e:
            raise CommitConflict(f"version {version} already committed") from e
        with os.fdopen(fd, "w") as fh:
            fh.write(payload)

    # ----------------------------------------------------------- read layer

    def exists(self) -> bool:
        return self.snapshot().version >= 0

    def _schema_struct(self, snap: Snapshot) -> T.StructType | None:
        if snap.schema_json:
            return T.StructType.fromJson(json.loads(snap.schema_json))
        if self.schema is None:
            return None
        if isinstance(self.schema, str):
            return T.StructType.fromDDL(self.schema)
        return self.schema

    def read(self, version: int | None = None) -> DataFrame:
        """Current (or time-travel) snapshot as a DataFrame."""
        snap = self.snapshot(version)
        if not snap.units:
            schema = self._schema_struct(snap)
            if schema is None:
                raise FileNotFoundError(
                    f"table {self.path} is empty and has no schema"
                )
            return self.spark.createDataFrame([], schema)
        return self._read_units(list(snap.units))

    def _read_units(self, unit_paths: list[str]) -> DataFrame:
        return self.spark.read.parquet(
            *[os.path.join(self.path, p) for p in unit_paths]
        )

    # ---------------------------------------------------------- write layer

    def _write_units(self, df: DataFrame) -> list[dict]:
        """Write df as new immutable file-unit(s); returns add-entries.
        Partitioned tables get one unit per partition value (split via
        shadow hive dirs so the real columns stay in the files)."""
        uid = uuid.uuid4().hex[:12]
        staging = os.path.join(self._data_dir, f".staging_{uid}")
        if not self.partition_by:
            df.write.mode("overwrite").parquet(staging)
            final = f"data/u_{uid}"
            os.rename(staging, os.path.join(self.path, final))
            return [{"path": final, "partitions": {}}]

        shadow = [f"_p_{c}" for c in self.partition_by]
        out = df
        for c, s in zip(self.partition_by, shadow):
            out = out.withColumn(s, F.col(c))
        out.write.mode("overwrite").partitionBy(*shadow).parquet(staging)

        adds = []
        for root, _dirs, files in os.walk(staging):
            if not any(f.endswith(".parquet") for f in files):
                continue
            rel = os.path.relpath(root, staging)
            parts = dict(
                seg.split("=", 1) for seg in rel.split(os.sep) if "=" in seg
            )
            pvals = {
                c: parts.get(f"_p_{c}", "") for c in self.partition_by
            }
            final = f"data/u_{uid}_{len(adds)}"
            os.rename(root, os.path.join(self.path, final))
            adds.append({"path": final, "partitions": pvals})
        shutil.rmtree(staging, ignore_errors=True)
        return adds

    @staticmethod
    def _hive_str(v) -> str:
        """Partition value as it appears in a hive dir name (None →
        the default-partition token)."""
        return "__HIVE_DEFAULT_PARTITION__" if v is None else str(v)

    def _drop_units(self, adds: list[dict]) -> None:
        for a in adds:
            shutil.rmtree(os.path.join(self.path, a["path"]), ignore_errors=True)

    # ---------------------------------------------------------------- MERGE

    def merge(
        self,
        upserts: DataFrame | None = None,
        delete_keys: DataFrame | None = None,
    ) -> None:
        """MERGE with snapshot isolation: apply upserts (insert-or-replace
        by key) and deletes as ONE atomic commit. On a commit race the
        merge re-derives against the winner's snapshot and retries —
        optimistic concurrency, no locks."""
        affected_keys = None
        for src in (upserts, delete_keys):
            if src is not None:
                k = src.select(*self.key_cols).distinct()
                affected_keys = (
                    k if affected_keys is None else affected_keys.union(k).distinct()
                )
        if affected_keys is None:
            return

        pruned = bool(self.partition_by) and all(
            (upserts is None or p in upserts.columns)
            and (delete_keys is None or p in delete_keys.columns)
            for p in self.partition_by
        )

        last_err: Exception | None = None
        for _attempt in range(self.max_commit_retries):
            snap = self.snapshot()
            adds, removes, schema_json = self._plan_merge(
                snap, upserts, delete_keys, affected_keys, pruned
            )
            try:
                self._commit(snap.version + 1, adds, removes, schema_json)
                return
            except CommitConflict as e:
                # loser cleans up its orphaned files and re-derives
                self._drop_units(adds)
                last_err = e
        raise last_err  # type: ignore[misc]

    def _plan_merge(
        self, snap, upserts, delete_keys, affected_keys, pruned
    ) -> tuple[list[dict], list[str], str | None]:
        """Compute (adds, removes, schema) for one merge attempt against a
        fixed snapshot. File-level pruning: only units whose partition
        values are affected get read + rewritten; the rest carry forward
        in the log untouched."""
        if pruned and snap.units:
            parts = None
            for src in (upserts, delete_keys):
                if src is not None:
                    p = src.select(*self.partition_by).distinct()
                    parts = p if parts is None else parts.union(p).distinct()
            hit_values = {
                tuple(self._hive_str(r[c]) for c in self.partition_by)
                for r in parts.collect()
            }
            touched = [
                path
                for path, pvals in snap.units.items()
                if tuple(pvals.get(c, "") for c in self.partition_by) in hit_values
            ]
            current = self._read_units(touched) if touched else None
            removes = touched
        else:
            current = self._read_units(list(snap.units)) if snap.units else None
            if current is None and self.schema is not None:
                current = self.read()  # empty frame with declared schema
            removes = list(snap.units)

        if current is not None:
            survivors = current.join(
                F.broadcast(affected_keys), self.key_cols, "left_anti"
            )
        else:
            survivors = None

        if survivors is not None and upserts is not None:
            new_state = survivors.unionByName(upserts.select(*survivors.columns))
        elif upserts is not None:
            new_state = upserts
        else:
            new_state = survivors

        schema_json = json.dumps(new_state.schema.jsonValue())
        adds = self._write_units(new_state) if new_state.head(1) else []
        if not adds:
            # all rows deleted: still write nothing, commit records removes
            pass
        return adds, removes, schema_json

    # ------------------------------------------------- parity conveniences

    def overwrite(self, df: DataFrame) -> None:
        """Replace the whole table in one commit (readers of the previous
        version are unaffected — their files remain until vacuum)."""
        for _attempt in range(self.max_commit_retries):
            snap = self.snapshot()
            adds = self._write_units(df) if df.head(1) else []
            schema_json = json.dumps(df.schema.jsonValue())
            try:
                self._commit(snap.version + 1, adds, list(snap.units), schema_json)
                return
            except CommitConflict:
                self._drop_units(adds)
        raise CommitConflict(f"could not commit after {self.max_commit_retries} tries")

    def upsert(self, batch: DataFrame, order_cols: Sequence[str] | None = None) -> None:
        if order_cols:
            from deimos_spark.operators.compaction import compact_keep_last

            batch = compact_keep_last(batch, self.key_cols, order_cols)
        self.merge(upserts=batch)

    def delete(self, keys: DataFrame) -> None:
        self.merge(delete_keys=keys)

    def vacuum(self) -> int:
        """Delete data units no longer referenced by the LATEST snapshot
        (breaks time travel to versions that used them). Returns the
        number of units removed."""
        live = set(self.snapshot().units)
        removed = 0
        for name in os.listdir(self._data_dir):
            rel = f"data/{name}"
            if name.startswith("u_") and rel not in live:
                shutil.rmtree(os.path.join(self._data_dir, name), ignore_errors=True)
                removed += 1
        return removed
