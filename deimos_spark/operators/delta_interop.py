"""Delta Lake table interop — pure-Python log replay AND protocol-
faithful writes over the PUBLIC Delta transaction-log protocol
(delta.io PROTOCOL.md; no Delta code or jars used).

Why: `TransactionLogTable` (txlog.py) is protocol-SHAPED but bespoke; a
user migrating from the reference stack often lands data in real Delta
tables. This adapter lets every operator in this repo read such a table
with nothing but `spark.read.parquet` underneath:

- `_delta_log/{version:020d}.json` — one JSON action per line:
  `add` (file becomes live), `remove` (file dead), `metaData` (schema =
  a Spark StructType JSON string, partition columns), `protocol`,
  `commitInfo` (ignored).
- `{version:020d}.checkpoint.parquet` + `_last_checkpoint` — the full
  action state materialized; we load it WITH Spark's parquet reader and
  replay only later JSON commits (same O(interval) bound txlog.py uses).
- Partition values live in the LOG, not the files — each add's
  `partitionValues` map is re-attached as literal columns cast via the
  table schema.

Scope: reader protocol v1 (+ v2 tables that don't enable column mapping
or deletion vectors — those need feature support we honestly refuse).
The write side (`DeltaTableWriter`: append/overwrite; `DeltaKeyedTable`:
keyed MERGE) emits minReaderVersion-1 logs — add/remove/metaData/
protocol actions with hard-link put-if-absent version claims — so any
real Delta reader can consume tables these classes produce.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


class DeltaProtocolError(Exception):
    """Table uses a protocol/feature this reader doesn't support."""


@dataclass
class DeltaSnapshot:
    version: int
    # file path (rel) -> partitionValues map (raw strings, per protocol)
    files: dict[str, dict[str, str]]
    schema: T.StructType | None
    partition_columns: list[str] = field(default_factory=list)


class DeltaCommitConflict(Exception):
    """Another writer claimed this log version first."""


class DeltaTableReader:
    """Read a Delta table directory: `read()` → DataFrame (latest or
    time-travel version), `snapshot()` → live file set."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        self.log_dir = os.path.join(path, "_delta_log")
        if not os.path.isdir(self.log_dir):
            raise FileNotFoundError(f"{path} has no _delta_log — not a Delta table")

    # ------------------------------------------------------------- actions

    def _apply_action(self, action: dict, snap: DeltaSnapshot) -> None:
        if "add" in action:
            a = action["add"]
            snap.files[a["path"]] = dict(a.get("partitionValues") or {})
        elif "remove" in action:
            snap.files.pop(action["remove"]["path"], None)
        elif "metaData" in action:
            md = action["metaData"]
            fmt = (md.get("format") or {}).get("provider", "parquet")
            if fmt != "parquet":
                raise DeltaProtocolError(f"unsupported data format {fmt!r}")
            if (md.get("configuration") or {}).get("delta.columnMapping.mode") not in (
                None, "none",
            ):
                raise DeltaProtocolError("column mapping not supported")
            # schemaString IS Spark's StructType JSON — parse directly
            snap.schema = T.StructType.fromJson(json.loads(md["schemaString"]))
            snap.partition_columns = list(md.get("partitionColumns") or [])
        elif "protocol" in action:
            p = action["protocol"]
            if p.get("minReaderVersion", 1) > 2:
                raise DeltaProtocolError(
                    f"minReaderVersion {p['minReaderVersion']} > 2 unsupported"
                )
            for feat in p.get("readerFeatures") or []:
                if feat not in ("timestampNtz", "columnMapping"):
                    raise DeltaProtocolError(f"reader feature {feat!r} unsupported")
                if feat == "columnMapping":
                    raise DeltaProtocolError("column mapping not supported")
        # commitInfo / txn / cdc: no effect on the live file set

    def _replay_json_commit(self, version: int, snap: DeltaSnapshot) -> bool:
        p = os.path.join(self.log_dir, f"{version:020d}.json")
        try:
            with open(p) as fh:
                lines = fh.read().splitlines()
        except OSError:
            return False
        for line in lines:
            if line.strip():
                self._apply_action(json.loads(line), snap)
        snap.version = version
        return True

    # ---------------------------------------------------------- checkpoint

    def _load_checkpoint(self, version: int) -> DeltaSnapshot | None:
        p = os.path.join(self.log_dir, f"{version:020d}.checkpoint.parquet")
        if not os.path.exists(p):
            return None
        snap = DeltaSnapshot(version, {}, None)
        df = self.spark.read.parquet(p)
        cols = set(df.columns)
        for row in df.collect():
            d = row.asDict(recursive=True)
            for kind in ("protocol", "metaData", "add"):
                if kind in cols and d.get(kind) is not None:
                    action = {kind: d[kind]}
                    if kind == "metaData" and isinstance(
                        d[kind].get("schemaString"), str
                    ):
                        pass  # already protocol-shaped
                    self._apply_action(action, snap)
            # remove actions in a checkpoint are tombstones for vacuum
            # bookkeeping only — the add set is already net of them
        return snap

    # ------------------------------------------------------------ snapshot

    def snapshot(self, version: int | None = None) -> DeltaSnapshot:
        names = os.listdir(self.log_dir)
        commits = sorted(
            int(n[:-5]) for n in names if n.endswith(".json") and n[:-5].isdigit()
        )
        if not commits and not any(n.endswith(".checkpoint.parquet") for n in names):
            raise DeltaProtocolError(f"{self.path}: empty _delta_log")

        snap = DeltaSnapshot(-1, {}, None)
        ckpts = sorted(
            (
                int(n[: -len(".checkpoint.parquet")])
                for n in names
                if n.endswith(".checkpoint.parquet")
                and n[: -len(".checkpoint.parquet")].isdigit()
            ),
            reverse=True,
        )
        for cv in ckpts:
            if version is not None and cv > version:
                continue
            loaded = self._load_checkpoint(cv)
            if loaded is not None:
                snap = loaded
                break
        for v in commits:
            if v <= snap.version:
                continue
            if version is not None and v > version:
                break
            self._replay_json_commit(v, snap)
        if version is not None and snap.version < version:
            raise DeltaProtocolError(
                f"version {version} not present (latest {snap.version})"
            )
        return snap

    # ---------------------------------------------------------------- read

    def read(self, version: int | None = None) -> DataFrame:
        snap = self.snapshot(version)
        if snap.schema is None:
            raise DeltaProtocolError(f"{self.path}: no metaData action in log")
        data_fields = [
            f for f in snap.schema.fields if f.name not in snap.partition_columns
        ]
        data_schema = T.StructType(data_fields)
        if not snap.files:
            return self.spark.createDataFrame([], snap.schema)

        ptypes = {
            f.name: f.dataType
            for f in snap.schema.fields
            if f.name in snap.partition_columns
        }

        # group files by partition values: one scan per group, partition
        # columns re-attached as typed literals (they are not in the files)
        groups: dict[tuple, list[str]] = {}
        for path, pvals in snap.files.items():
            key = tuple(
                (c, pvals.get(c)) for c in snap.partition_columns
            )
            groups.setdefault(key, []).append(path)

        parts = []
        for key, paths in sorted(groups.items()):
            df = self.spark.read.schema(data_schema).parquet(
                *[os.path.join(self.path, p) for p in paths]
            )
            for col, raw in key:
                lit = (
                    F.lit(None).cast(ptypes[col])
                    if raw is None
                    else F.lit(raw).cast(ptypes[col])
                )
                df = df.withColumn(col, lit)
            parts.append(df.select(*[f.name for f in snap.schema.fields]))
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out


class DeltaTableWriter:
    """Append / overwrite / MERGE a Delta table by writing protocol-
    faithful JSON commits — the write-side twin of DeltaTableReader.

    Versions are claimed with the same temp-file + hard-link
    put-if-absent txlog.py uses (maps to a conditional put on object
    stores), so concurrent writers conflict cleanly instead of
    clobbering; losers re-derive against the winner's snapshot and
    retry (optimistic concurrency, the Delta commit protocol's shape).

    Partitioned writes follow the Delta convention: data files land
    under hive-style dirs but the partition COLUMNS are dropped from
    the files — values live only in each add's `partitionValues`, which
    is what real Delta readers (and our reader) expect.
    """

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        schema: T.StructType | str | None = None,
        partition_by: tuple[str, ...] = (),
        max_commit_retries: int = 5,
    ):
        self.spark = spark
        self.path = path
        self.partition_by = list(partition_by)
        self.max_commit_retries = max_commit_retries
        if isinstance(schema, str):
            schema = T.StructType.fromDDL(schema)
        self.schema = schema
        self.log_dir = os.path.join(path, "_delta_log")
        os.makedirs(self.log_dir, exist_ok=True)

    # -------------------------------------------------------------- commit

    def _latest_version(self) -> int:
        vs = [
            int(n[:-5])
            for n in os.listdir(self.log_dir)
            if n.endswith(".json") and n[:-5].isdigit()
        ]
        return max(vs, default=-1)

    def _commit(self, version: int, actions: list[dict]) -> None:
        import uuid

        payload = "\n".join(json.dumps(a) for a in actions) + "\n"
        tmp = os.path.join(self.log_dir, f".tmp_{uuid.uuid4().hex}.json")
        with open(tmp, "w") as fh:
            fh.write(payload)
            fh.flush()
            os.fsync(fh.fileno())
        target = os.path.join(self.log_dir, f"{version:020d}.json")
        try:
            os.link(tmp, target)  # atomic put-if-absent
        except FileExistsError as e:
            raise DeltaCommitConflict(f"version {version} already committed") from e
        finally:
            os.unlink(tmp)

    def _meta_actions(self, schema: T.StructType) -> list[dict]:
        import time as _time
        import uuid

        return [
            {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
            {
                "metaData": {
                    "id": str(uuid.uuid4()),
                    "format": {"provider": "parquet", "options": {}},
                    "schemaString": json.dumps(schema.jsonValue()),
                    "partitionColumns": self.partition_by,
                    "configuration": {},
                    "createdTime": int(_time.time() * 1000),
                }
            },
        ]

    # --------------------------------------------------------- data files

    def _write_files(self, df: DataFrame) -> list[dict]:
        """Write df as parquet file(s), Delta layout: partition columns
        stripped from the files, recorded per-file in add actions."""
        import shutil
        import time as _time
        import uuid

        uid = uuid.uuid4().hex[:12]
        staging = os.path.join(self.path, f".staging_{uid}")
        adds: list[dict] = []
        if not self.partition_by:
            df.write.mode("overwrite").parquet(staging)
            i = 0
            for f in sorted(os.listdir(staging)):
                if not f.endswith(".parquet"):
                    continue
                rel = f"part-{uid}-{i:05d}.parquet"
                os.rename(os.path.join(staging, f), os.path.join(self.path, rel))
                adds.append(self._add_action(rel, {}, _time))
                i += 1
            shutil.rmtree(staging, ignore_errors=True)
            return adds

        df.write.mode("overwrite").partitionBy(*self.partition_by).parquet(staging)
        i = 0
        for root, _dirs, files in os.walk(staging):
            pq = [f for f in files if f.endswith(".parquet")]
            if not pq:
                continue
            reldir = os.path.relpath(root, staging)
            segs = [s for s in reldir.split(os.sep) if "=" in s]
            pvals = {}
            for s in segs:
                k, v = s.split("=", 1)
                pvals[k] = (
                    None if v == "__HIVE_DEFAULT_PARTITION__"
                    else _unescape(v)
                )
            os.makedirs(os.path.join(self.path, reldir), exist_ok=True)
            for f in sorted(pq):
                rel = os.path.join(reldir, f"part-{uid}-{i:05d}.parquet")
                os.rename(os.path.join(root, f), os.path.join(self.path, rel))
                adds.append(self._add_action(rel, pvals, _time))
                i += 1
        shutil.rmtree(staging, ignore_errors=True)
        return adds

    def _add_action(self, rel: str, pvals: dict, _time) -> dict:
        full = os.path.join(self.path, rel)
        return {
            "add": {
                "path": rel.replace(os.sep, "/"),
                "partitionValues": pvals,
                "size": os.path.getsize(full),
                "modificationTime": int(_time.time() * 1000),
                "dataChange": True,
            }
        }

    @staticmethod
    def _drop_files(path: str, adds: list[dict]) -> None:
        for a in adds:
            try:
                os.unlink(os.path.join(path, a["add"]["path"]))
            except OSError:
                pass

    # ----------------------------------------------------------- write API

    def _reader(self) -> DeltaTableReader:
        return DeltaTableReader(self.spark, self.path)

    def append(self, df: DataFrame) -> None:
        for _ in range(self.max_commit_retries):
            v = self._latest_version()
            adds = self._write_files(df)
            actions = adds
            if v < 0:
                actions = self._meta_actions(df.schema) + adds
            try:
                self._commit(v + 1, actions)
                return
            except DeltaCommitConflict:
                self._drop_files(self.path, adds)
        raise DeltaCommitConflict(
            f"could not commit after {self.max_commit_retries} tries"
        )

    def overwrite(self, df: DataFrame) -> None:
        for _ in range(self.max_commit_retries):
            v = self._latest_version()
            removes = []
            if v >= 0:
                snap = self._reader().snapshot()
                removes = [
                    {"remove": {"path": p, "dataChange": True}}
                    for p in sorted(snap.files)
                ]
            adds = self._write_files(df)
            actions = (
                (self._meta_actions(df.schema) if v < 0 else [])
                + removes
                + adds
            )
            try:
                self._commit(v + 1, actions)
                return
            except DeltaCommitConflict:
                self._drop_files(self.path, adds)
        raise DeltaCommitConflict(
            f"could not commit after {self.max_commit_retries} tries"
        )


def _unescape(s: str) -> str:
    """Hive percent-escaping inverse for partition dir segments."""
    if "%" not in s:
        return s
    out, i, n = [], 0, len(s)
    while i < n:
        if s[i] == "%" and i + 3 <= n:
            try:
                out.append(chr(int(s[i + 1 : i + 3], 16)))
                i += 3
                continue
            except ValueError:
                pass
        out.append(s[i])
        i += 1
    return "".join(out)


class DeltaKeyedTable:
    """MERGE semantics over a real Delta table layout — the slot-in that
    lets `TransactionLogTable`-shaped pipelines (streaming consumer
    sinks, outbox targets) operate on Delta-protocol tables directly:
    upsert/delete by key as ONE atomic commit of remove+add actions,
    optimistic retry on conflict, snapshot-isolated readers."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        key_cols,
        schema: T.StructType | str | None = None,
        max_commit_retries: int = 5,
    ):
        self.spark = spark
        self.path = path
        self.key_cols = list(key_cols)
        self.writer = DeltaTableWriter(
            spark, path, schema=schema, max_commit_retries=max_commit_retries
        )
        if isinstance(schema, str):
            schema = T.StructType.fromDDL(schema)
        self.schema = schema

    def read(self, version: int | None = None) -> DataFrame:
        try:
            return DeltaTableReader(self.spark, self.path).read(version)
        except DeltaProtocolError:
            if self.schema is None:
                raise
            return self.spark.createDataFrame([], self.schema)

    def merge(
        self,
        upserts: DataFrame | None = None,
        delete_keys: DataFrame | None = None,
    ) -> None:
        affected = None
        for src in (upserts, delete_keys):
            if src is not None:
                k = src.select(*self.key_cols).distinct()
                affected = k if affected is None else affected.union(k).distinct()
        if affected is None:
            return

        w = self.writer
        for _ in range(w.max_commit_retries):
            v = w._latest_version()
            if v >= 0:
                snap = DeltaTableReader(self.spark, self.path).snapshot()
                current = (
                    DeltaTableReader(self.spark, self.path).read()
                    if snap.files
                    else None
                )
                removes = [
                    {"remove": {"path": p, "dataChange": True}}
                    for p in sorted(snap.files)
                ]
            else:
                current, removes = None, []
            survivors = (
                current.join(F.broadcast(affected), self.key_cols, "left_anti")
                if current is not None
                else None
            )
            if survivors is not None and upserts is not None:
                new_state = survivors.unionByName(
                    upserts.select(*survivors.columns)
                )
            elif upserts is not None:
                new_state = upserts
            else:
                new_state = survivors
            adds = (
                w._write_files(new_state)
                if new_state is not None and new_state.head(1)
                else []
            )
            actions = (
                (w._meta_actions(new_state.schema) if v < 0 else [])
                + removes
                + adds
            )
            if not actions:
                return
            try:
                w._commit(v + 1, actions)
                return
            except DeltaCommitConflict:
                DeltaTableWriter._drop_files(self.path, adds)
        raise DeltaCommitConflict(
            f"could not commit after {w.max_commit_retries} tries"
        )

    def upsert(self, batch: DataFrame, order_cols=None) -> None:
        if order_cols:
            from deimos_spark.operators.compaction import compact_keep_last

            batch = compact_keep_last(batch, self.key_cols, list(order_cols))
        self.merge(upserts=batch)

    def delete(self, keys: DataFrame) -> None:
        self.merge(delete_keys=keys)
