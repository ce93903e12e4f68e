"""Structured-Streaming source over a Delta transaction log —
`readStream.format("deltastream")` tails a Delta table written by
`DeltaTableWriter`/`DeltaKeyedTable` (or any engine), turning each
commit's ADDED files into a micro-batch. The lakehouse-native analogue
of the reference's table-polling CDC (`lib/deimos/utils/db_poller.rb`):
instead of re-querying the table with a cursor predicate, the
transaction log itself IS the change feed — each batch reads exactly
the files new commits added, never a full-table scan.

Semantics (matching the public Delta streaming-source contract):
- offsets are `{"version": N}` — Spark checkpoints them, restart
  resumes at the next commit; at-least-once on crash, like any source.
- append-only by default: a commit containing `remove` actions fails
  the stream loudly (a MERGE/overwrite rewrites files, which would
  re-emit rows); `ignoreChanges=true` opts into emitting only the adds
  of such commits, re-delivery accepted (Delta's own option).
- `startingVersion`: `earliest` (default — replay from commit 0) or
  `latest` (only new commits).

Scale shape: one Spark input partition per added file, read inside
executors with pyarrow; partition-column values come from the LOG
(Delta layout keeps them out of the files) and are re-attached as
typed literals per file.
"""

from __future__ import annotations

import datetime as _dt
import json
import os

from pyspark.sql import types as T
from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)


def _log_dir(path: str) -> str:
    return os.path.join(path, "_delta_log")


def _latest_version(path: str) -> int:
    try:
        names = os.listdir(_log_dir(path))
    except OSError:
        return -1
    vs = [int(n[:-5]) for n in names if n.endswith(".json") and n[:-5].isdigit()]
    return max(vs, default=-1)


def _table_schema(path: str) -> tuple[T.StructType, list[str]]:
    """(schema, partition_columns) from the newest metaData action —
    pure json/pyarrow, runs on the driver at plan time."""
    ld = _log_dir(path)
    names = sorted(os.listdir(ld))
    meta = None
    for n in names:  # later commits override earlier metaData
        if n.endswith(".json") and n[:-5].isdigit():
            with open(os.path.join(ld, n)) as fh:
                for line in fh:
                    if not line.strip():
                        continue
                    a = json.loads(line)
                    if "metaData" in a:
                        meta = a["metaData"]
    if meta is None:
        # checkpoint-only log (JSON commits expired)
        import pyarrow.parquet as papq

        ckpts = sorted(
            n for n in names if n.endswith(".checkpoint.parquet")
        )
        for n in reversed(ckpts):
            t = papq.read_table(os.path.join(ld, n), columns=["metaData"])
            for row in t.to_pylist():
                if row.get("metaData") and row["metaData"].get("schemaString"):
                    meta = row["metaData"]
                    break
            if meta:
                break
    if meta is None:
        raise ValueError(f"{path}: no metaData action in _delta_log")
    schema = T.StructType.fromJson(json.loads(meta["schemaString"]))
    return schema, list(meta.get("partitionColumns") or [])


def _cast_pval(raw: str | None, dt: T.DataType):
    """Partition value string (Delta log convention) → python value."""
    if raw is None:
        return None
    s = dt.simpleString()
    if s in ("int", "bigint", "smallint", "tinyint"):
        return int(raw)
    if s in ("float", "double"):
        return float(raw)
    if s == "boolean":
        return raw == "true"
    if s == "date":
        return _dt.date.fromisoformat(raw)
    if s == "string":
        return raw
    raise ValueError(f"unsupported partition column type {s!r}")


class _DeltaFilePartition(InputPartition):
    def __init__(
        self,
        table: str,
        rel: str,
        pvals: dict,
        version: int,
        change_type: str | None = None,
        commit_ts: int | None = None,
        is_cdc: bool = False,
    ):
        self.table = table
        self.rel = rel
        self.pvals = pvals
        self.version = version
        # change-feed mode: 'insert' for add-derived files, None for
        # cdc files (their _change_type column is IN the file)
        self.change_type = change_type
        self.commit_ts = commit_ts
        self.is_cdc = is_cdc


def _commit_ts_ms(path: str) -> int:
    """commitInfo.inCommitTimestamp > commitInfo.timestamp > mtime —
    the same resolution chain as the batch reader's _commit_ts."""
    ts = os.path.getmtime(path) * 1000.0
    try:
        with open(path) as fh:
            for line in fh:
                if not line.strip() or '"commitInfo"' not in line:
                    continue
                ci = json.loads(line).get("commitInfo") or {}
                if ci.get("inCommitTimestamp") is not None:
                    ts = float(ci["inCommitTimestamp"])
                elif ci.get("timestamp") is not None:
                    ts = float(ci["timestamp"])
                break
    except (OSError, ValueError):
        pass
    return int(ts)


class _DeltaStreamReader(DataSourceStreamReader):
    def __init__(
        self,
        path: str,
        starting: str,
        ignore_changes: bool,
        read_change_feed: bool = False,
    ):
        if starting not in ("earliest", "latest"):
            raise ValueError(
                f"startingVersion must be 'earliest' or 'latest', got {starting!r}"
            )
        self.path = path
        self.starting = starting
        self.ignore_changes = ignore_changes
        self.read_change_feed = read_change_feed
        self.schema, self.pcols = _table_schema(path)

    def initialOffset(self) -> dict:
        if self.starting == "latest":
            return {"version": _latest_version(self.path)}
        return {"version": -1}

    def latestOffset(self) -> dict:
        return {"version": _latest_version(self.path)}

    def partitions(self, start: dict, end: dict):
        out = []
        for v in range(int(start["version"]) + 1, int(end["version"]) + 1):
            p = os.path.join(_log_dir(self.path), f"{v:020d}.json")
            try:
                with open(p) as fh:
                    lines = [ln for ln in fh.read().splitlines() if ln.strip()]
            except OSError:
                continue  # expired commit — nothing to emit for it
            actions = [json.loads(ln) for ln in lines]
            if self.read_change_feed:
                out.extend(self._cdf_partitions(v, p, actions))
                continue
            if any("remove" in a for a in actions) and not self.ignore_changes:
                raise ValueError(
                    f"deltastream: commit {v} of {self.path} contains remove "
                    "actions (MERGE/overwrite); this source is append-only. "
                    "Set ignoreChanges=true to emit only added files "
                    "(re-delivery accepted)."
                )
            for a in actions:
                if "add" in a:
                    out.append(
                        _DeltaFilePartition(
                            self.path,
                            a["add"]["path"],
                            dict(a["add"].get("partitionValues") or {}),
                            v,
                        )
                    )
        return out

    def _cdf_partitions(self, v: int, commit_path: str, actions: list[dict]):
        """Change-feed planning for one commit, the streaming twin of the
        batch reader's read_changes: cdc actions win exclusively; add-only
        commits derive inserts; row-level changes without cdc files fail
        the stream loudly."""
        ts = _commit_ts_ms(commit_path)
        cdc = [a["cdc"] for a in actions if a.get("cdc")]
        if cdc:
            return [
                _DeltaFilePartition(
                    self.path,
                    c["path"],
                    dict(c.get("partitionValues") or {}),
                    v,
                    commit_ts=ts,
                    is_cdc=True,
                )
                for c in cdc
            ]
        adds = [
            a["add"]
            for a in actions
            if a.get("add") and a["add"].get("dataChange", True)
        ]
        removes = [
            a["remove"]
            for a in actions
            if a.get("remove") and a["remove"].get("dataChange", True)
        ]
        if removes or any(a.get("deletionVector") for a in adds):
            raise ValueError(
                f"deltastream: commit {v} of {self.path} contains "
                "row-level changes (remove/deletion-vector) without cdc "
                "files — the change feed is not reconstructable. Enable "
                "CDF on the writer (DeltaKeyedTable enable_cdf=True)."
            )
        return [
            _DeltaFilePartition(
                self.path,
                a["path"],
                dict(a.get("partitionValues") or {}),
                v,
                change_type="insert",
                commit_ts=ts,
            )
            for a in adds
        ]

    def read(self, partition: _DeltaFilePartition):
        import pyarrow.parquet as papq

        schema, pcols = self.schema, self.pcols
        data_fields = [f for f in schema.fields if f.name not in pcols]
        names = [f.name for f in data_fields]
        cdf = self.read_change_feed
        if partition.is_cdc:
            # cdc files carry their own _change_type column
            names = names + ["_change_type"]
        tbl = papq.read_table(
            os.path.join(partition.table, partition.rel),
            columns=names,
        )
        pvals = {
            f.name: _cast_pval(partition.pvals.get(f.name), f.dataType)
            for f in schema.fields
            if f.name in pcols
        }
        cols = {name: col.to_pylist() for name, col in zip(
            tbl.column_names, (tbl.column(i) for i in range(tbl.num_columns))
        )}
        cts = (
            _dt.datetime.fromtimestamp(
                (partition.commit_ts or 0) / 1000.0, _dt.timezone.utc
            ).replace(tzinfo=None)
            if cdf
            else None
        )
        n = tbl.num_rows
        for i in range(n):
            row = tuple(
                pvals[f.name] if f.name in pcols else cols[f.name][i]
                for f in schema.fields
            )
            if cdf:
                ct = (
                    cols["_change_type"][i]
                    if partition.is_cdc
                    else partition.change_type
                )
                row = row + (ct, partition.version, cts)
            yield row

    def commit(self, end: dict) -> None:
        pass  # Spark's checkpoint is the source of truth


class DeltaStreamDataSource(DataSource):
    """`format("deltastream")` — options: path (Delta table dir),
    startingVersion ('earliest' default | 'latest'),
    ignoreChanges ('true' to tolerate non-append commits),
    readChangeFeed ('true' to stream the CHANGE FEED instead of raw
    appends: rows gain _change_type/_commit_version/_commit_timestamp;
    commits with cdc actions stream those files exclusively — the
    streaming twin of DeltaTableReader.read_changes — and row-level
    changes without cdc files fail the stream loudly)."""

    @classmethod
    def name(cls) -> str:
        return "deltastream"

    def _cdf(self) -> bool:
        return (
            str(self.options.get("readChangeFeed", "false")).lower()
            == "true"
        )

    def schema(self):
        path = self.options.get("path")
        if not path:
            raise ValueError("deltastream needs a 'path' option")
        schema = _table_schema(path)[0]
        if self._cdf():
            schema = T.StructType(schema.fields.copy())
            schema.add("_change_type", T.StringType())
            schema.add("_commit_version", T.LongType())
            schema.add("_commit_timestamp", T.TimestampType())
        return schema

    def streamReader(self, schema) -> DataSourceStreamReader:
        path = self.options.get("path")
        if not path:
            raise ValueError("deltastream needs a 'path' option")
        return _DeltaStreamReader(
            path,
            self.options.get("startingVersion", "earliest"),
            str(self.options.get("ignoreChanges", "false")).lower() == "true",
            read_change_feed=self._cdf(),
        )
