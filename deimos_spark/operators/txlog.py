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
- **Commits are atomic + optimistic.** The commit payload is fully
  written to a temp file first, then the version is claimed with a hard
  link (put-if-absent; on S3/HDFS this maps to the same conditional-put
  primitive Delta uses). The commit file therefore appears atomically
  and complete — a concurrent snapshot() can never observe a partial
  commit, and a writer crash leaves at worst an orphan temp file.
- **Partition-pruned MERGE is file-level.** File-units carry their
  partition values in the log, so a merge touching one day rewrites only
  that day's units; unaffected units are carried forward untouched (no
  read, no write — just log entries). Pruning is only taken when the
  partition columns are a subset of the key columns — then a key's
  partition value is immutable by construction and a pruned merge can
  never strand a stale copy of a key in another partition.
- **Checkpoints bound replay cost.** Every `checkpoint_interval` commits
  the full live file-set is written to `{v:020d}.checkpoint.json` and
  `_last_checkpoint` points at it (the Delta `_last_checkpoint` design).
  snapshot() loads the newest applicable checkpoint and replays only the
  commits after it — O(interval) instead of O(n_commits) per read.
- **Time travel** falls out: `read(version=k)` replays to k (using the
  newest checkpoint ≤ k when one exists).

Partitioned storage detail: partition columns are kept IN the data files
(self-contained units) and the split into per-partition units is done with
shadow `_p_<col>` hive directories at write time — so a unit read needs no
basePath/discovery magic, and the log, not directory listing, is the
source of truth (the Delta design point that makes S3 listings irrelevant).
Hive dir names percent-escape special characters (Spark/Hive
`escapePathName`); values are unescaped before being recorded in the log
so the log always stores RAW partition values and pruning matches them
exactly.

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


class LogCorruption(Exception):
    """A non-latest commit file is unreadable — the table needs repair."""


_HIVE_NULL = "__HIVE_DEFAULT_PARTITION__"


def _unescape_path_name(s: str) -> str:
    """Inverse of Spark/Hive escapePathName: decode %XX sequences.
    Hive escapes `/ : = % #` etc. as '%' + 2 uppercase hex digits."""
    if "%" not in s:
        return s
    out, i, n = [], 0, len(s)
    while i < n:
        c = s[i]
        if c == "%" and i + 3 <= n:
            try:
                out.append(chr(int(s[i + 1 : i + 3], 16)))
                i += 3
                continue
            except ValueError:
                pass
        out.append(c)
        i += 1
    return "".join(out)


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
    checkpoint_interval: int = 20

    def __post_init__(self):
        self.key_cols = list(self.key_cols)
        self.partition_by = list(self.partition_by)
        os.makedirs(self._log_dir, exist_ok=True)
        os.makedirs(self._data_dir, exist_ok=True)
        # diagnostics: commit files parsed by the most recent snapshot()
        # (lets tests assert replay cost stays bounded by the checkpoint
        # interval instead of growing with total commit count)
        self.last_snapshot_commit_reads = 0
        # diagnostics: whether the most recent snapshot() had to LIST the
        # log dir (the expensive primitive on object stores) instead of
        # following _last_checkpoint and probing exact commit names
        self.last_snapshot_listed_log = False

    # ------------------------------------------------------------ log layer

    @property
    def _log_dir(self) -> str:
        return os.path.join(self.path, "_txlog")

    @property
    def _data_dir(self) -> str:
        return os.path.join(self.path, "data")

    def _commit_path(self, version: int) -> str:
        return os.path.join(self._log_dir, f"{version:020d}.json")

    def _checkpoint_path(self, version: int) -> str:
        return os.path.join(self._log_dir, f"{version:020d}.checkpoint.json")

    def _load_json(self, path: str) -> dict | None:
        """Parse a log file; None if empty/unparseable (crashed legacy
        writer) or missing."""
        try:
            with open(path) as fh:
                raw = fh.read()
        except OSError:
            return None
        if not raw.strip():
            return None
        try:
            return json.loads(raw)
        except ValueError:
            return None

    def _best_checkpoint(
        self, ckpt_versions: list[int], version: int | None
    ) -> tuple[int, dict] | None:
        """Newest readable checkpoint with version ≤ the requested one."""
        for cv in sorted(ckpt_versions, reverse=True):
            if version is not None and cv > version:
                continue
            data = self._load_json(self._checkpoint_path(cv))
            if data is not None:
                return cv, data
        return None

    def _read_commit(self, cv: int):
        """One commit file → parsed dict, or a marker: "missing" (never
        claimed), "noop" (zero-length legacy claim), "corrupt" (non-empty
        but unparseable)."""
        try:
            with open(self._commit_path(cv)) as fh:
                raw = fh.read()
        except OSError:
            return "missing"
        if not raw.strip():
            return "noop"
        try:
            return json.loads(raw)
        except ValueError:
            return "corrupt"

    def _heal_or_raise(self, cv: int) -> None:
        """A non-empty unparseable commit. If it is the NEWEST commit,
        nothing ever depended on it, so heal it as a no-op — and PERSIST
        the heal by truncating the file to zero length (a zero-length
        commit is a no-op at any log position), so the table stays
        readable after later commits make this one mid-log. Mid-log
        corruption means real changes were silently lost — surface it."""
        if os.path.exists(self._commit_path(cv + 1)):
            raise LogCorruption(
                f"commit {cv} of {self.path} is unreadable but later "
                "commits exist"
            )
        try:
            with open(self._commit_path(cv), "w"):
                pass  # truncate; idempotent across racing readers
        except OSError:
            pass  # read-only mount: heal applies in-memory only

    def snapshot(self, version: int | None = None) -> Snapshot:
        """Live file set at `version` (default: latest). Starts from the
        newest applicable checkpoint and replays only later commits, so
        cost is O(checkpoint_interval), not O(n_commits).

        Commit versions are claimed sequentially (each writer commits
        snapshot.version + 1 via put-if-absent), so the log has no gaps
        and commits after a checkpoint can be PROBED by exact name —
        when the `_last_checkpoint` pointer is fresh, snapshot() never
        lists the log dir at all (on object stores, LIST is the
        expensive primitive the pointer exists to avoid)."""
        self.last_snapshot_commit_reads = 0
        self.last_snapshot_listed_log = False

        lc = self._load_json(os.path.join(self._log_dir, "_last_checkpoint"))
        if (
            lc is not None
            and isinstance(lc.get("version"), int)
            and (version is None or lc["version"] <= version)
        ):
            data = self._load_json(self._checkpoint_path(lc["version"]))
            if data is not None:
                return self._replay_from(
                    lc["version"], dict(data["units"]), data.get("schema"), version
                )

        # Slow path: no usable pointer (first reads, corrupt pointer, or
        # time travel to before the newest checkpoint) — list the dir.
        # Only numeric stems are log entries; in-flight writers stage
        # .tmp_* / .ckpt_* / .lc_* temp files in this same dir (hard-link
        # claims need same-filesystem), and they must never parse as
        # versions.
        self.last_snapshot_listed_log = True
        commit_versions, ckpt_versions = [], []
        for n in os.listdir(self._log_dir):
            if n.endswith(".checkpoint.json") and n[:-16].isdigit():
                ckpt_versions.append(int(n[:-16]))
            elif n.endswith(".json") and n[:-5].isdigit():
                commit_versions.append(int(n[:-5]))

        units: dict[str, dict[str, str]] = {}
        v, schema_json = -1, None
        ckpt = self._best_checkpoint(ckpt_versions, version)
        if ckpt is not None:
            v, data = ckpt
            units = dict(data["units"])
            schema_json = data.get("schema")
        return self._replay_from(v, units, schema_json, version)

    def _replay_from(
        self,
        v: int,
        units: dict[str, dict[str, str]],
        schema_json: str | None,
        version: int | None,
    ) -> Snapshot:
        """Apply commits v+1, v+2, ... (probed by exact name — no gaps by
        construction) until one is missing or `version` is reached."""
        reads = 0
        cv = v + 1
        while version is None or cv <= version:
            c = self._read_commit(cv)
            if c == "missing":
                break
            reads += 1
            if c == "noop":
                # Zero-length = a crashed legacy writer's bare claim, or
                # a persisted heal: provably never contained changes, so
                # it is a no-op at ANY log position.
                v = cv
                cv += 1
                continue
            if c == "corrupt":
                self._heal_or_raise(cv)
                v = cv
                cv += 1
                continue
            for r in c.get("removes", []):
                units.pop(r, None)
            for a in c.get("adds", []):
                units[a["path"]] = a.get("partitions", {})
            schema_json = c.get("schema") or schema_json
            v = cv
            cv += 1
        self.last_snapshot_commit_reads += reads
        return Snapshot(v, units, schema_json)

    def _commit(
        self,
        version: int,
        adds: list[dict],
        removes: list[str],
        schema_json: str | None,
    ) -> None:
        """Atomically claim `version` (put-if-absent). The payload is
        fully written to a temp file first, then linked into place, so
        the commit file appears atomically and complete. Raises
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
        tmp = os.path.join(self._log_dir, f".tmp_{uuid.uuid4().hex}.json")
        with open(tmp, "w") as fh:
            fh.write(payload)
            fh.flush()
            os.fsync(fh.fileno())
        try:
            os.link(tmp, target)  # atomic put-if-absent
        except FileExistsError as e:
            raise CommitConflict(f"version {version} already committed") from e
        finally:
            os.unlink(tmp)
        self._maybe_checkpoint(version)

    def _maybe_checkpoint(self, version: int) -> None:
        """After every Nth commit, materialize the live file-set so
        snapshot() never replays more than N commits. Idempotent (two
        racing writers produce identical content); written via
        temp+rename so readers never see a partial checkpoint. Failure
        is non-fatal — the log alone is always sufficient."""
        if self.checkpoint_interval <= 0 or version <= 0:
            return
        if version % self.checkpoint_interval != 0:
            return
        try:
            snap = self.snapshot(version)
            payload = json.dumps(
                {
                    "version": snap.version,
                    "units": snap.units,
                    "schema": snap.schema_json,
                }
            )
            tmp = os.path.join(self._log_dir, f".ckpt_{uuid.uuid4().hex}.json")
            with open(tmp, "w") as fh:
                fh.write(payload)
            os.replace(tmp, self._checkpoint_path(version))
            lc_tmp = os.path.join(self._log_dir, f".lc_{uuid.uuid4().hex}.json")
            with open(lc_tmp, "w") as fh:
                fh.write(json.dumps({"version": version}))
            os.replace(lc_tmp, os.path.join(self._log_dir, "_last_checkpoint"))
        except OSError:
            pass

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
        shadow hive dirs so the real columns stay in the files). Hive
        percent-escaping is undone so the log records RAW values."""
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
            pvals = {}
            for c in self.partition_by:
                raw = parts.get(f"_p_{c}", "")
                pvals[c] = raw if raw == _HIVE_NULL else _unescape_path_name(raw)
            final = f"data/u_{uid}_{len(adds)}"
            os.rename(root, os.path.join(self.path, final))
            adds.append({"path": final, "partitions": pvals})
        shutil.rmtree(staging, ignore_errors=True)
        return adds

    @staticmethod
    def _hive_str(v) -> str:
        """Partition value in log form (RAW string; None → the hive
        default-partition token)."""
        return _HIVE_NULL if v is None else str(v)

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

        # File-level pruning is only sound when a key's partition value
        # can never change, i.e. the partition columns are part of the
        # key. Otherwise an upsert that moves a key to a new partition
        # would rewrite only the new partition and strand the old copy.
        pruned = (
            bool(self.partition_by)
            and set(self.partition_by) <= set(self.key_cols)
            and all(
                (upserts is None or p in upserts.columns)
                and (delete_keys is None or p in delete_keys.columns)
                for p in self.partition_by
            )
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

        if new_state is None:
            # delete-only merge touching no existing unit (e.g. pruned
            # delete whose keys match no partition, or delete on an empty
            # table): commit a removes-only no-op, carrying the prior
            # schema forward so the table stays readable.
            return [], removes, snap.schema_json

        schema_json = json.dumps(new_state.schema.jsonValue())
        adds = self._write_units(new_state) if new_state.head(1) else []
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

    def vacuum(self, retention_seconds: float = 3600.0) -> int:
        """Delete data units no longer referenced by the LATEST snapshot
        (breaks time travel to versions that used them). Units younger
        than `retention_seconds` are kept even if unreferenced — an
        in-flight writer renames its units into data/ BEFORE committing,
        and deleting them would let its commit land pointing at missing
        files (the Delta retention-window rationale). Returns the number
        of units removed."""
        live = set(self.snapshot().units)
        cutoff = time.time() - retention_seconds
        removed = 0
        for name in os.listdir(self._data_dir):
            rel = f"data/{name}"
            if not name.startswith("u_") or rel in live:
                continue
            full = os.path.join(self._data_dir, name)
            try:
                if os.path.getmtime(full) > cutoff:
                    continue
            except OSError:
                continue
            shutil.rmtree(full, ignore_errors=True)
            removed += 1
        return removed
