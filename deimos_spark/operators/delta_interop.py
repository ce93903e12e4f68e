"""Read-only Delta Lake table adapter — pure-Python log replay over the
PUBLIC Delta transaction-log protocol (delta.io PROTOCOL.md; no Delta
code or jars used).

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
Writing stays the job of txlog.py / real Delta writers.
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
