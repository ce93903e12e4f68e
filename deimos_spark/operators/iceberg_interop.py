"""Read-only Apache Iceberg table adapter — pure-Python metadata walk
over the PUBLIC Iceberg table spec (iceberg.apache.org/spec; no Iceberg
jars or runtime used).

The metadata chain, exactly as the spec lays it out:

    metadata/version-hint.text           -> current metadata version
    metadata/v{N}.metadata.json          -> schema, snapshots,
                                            current-snapshot-id
    snapshot.manifest-list (Avro OCF)    -> manifest file paths
    manifest file (Avro OCF)             -> data-file entries
                                            (status: existing/added/deleted)
    data files (parquet)                 -> spark.read.parquet

The Avro layer is the pure-Python OCF codec (schemas/avro_ocf.py), so
nothing here needs a jar. Iceberg data files carry ALL columns
(identity-partition values included — unlike Delta/Hive layouts), so
reading is a plain parquet scan over the live file set; Catalyst
pushdown/pruning applies as usual.

Scope (honest gates, refused loudly): format-version 1 and 2 tables,
including v2 POSITION deletes (delete files of (file_path, pos) pairs,
applied as one anti-join against `_metadata.file_path`/`row_index` —
the common MERGE/DELETE output of real engines). Equality deletes,
unsupported file formats, and format-version 3+ raise
IcebergProtocolError.
"""

from __future__ import annotations

import json
import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from deimos_spark.schemas.avro_ocf import ocf_read


class IcebergProtocolError(Exception):
    """Table uses an Iceberg feature/version this reader doesn't support."""


# ----------------------------------------------------- schema conversion

_PRIMITIVES = {
    "boolean": T.BooleanType,
    "int": T.IntegerType,
    "long": T.LongType,
    "float": T.FloatType,
    "double": T.DoubleType,
    "date": T.DateType,
    "string": T.StringType,
    "uuid": T.StringType,
    "binary": T.BinaryType,
    "timestamp": T.TimestampNTZType,
    "timestamptz": T.TimestampType,
}


def iceberg_type_to_spark(t) -> T.DataType:
    """Iceberg JSON type → Spark type (the spec's documented mapping)."""
    if isinstance(t, str):
        if t in _PRIMITIVES:
            return _PRIMITIVES[t]()
        m = re.fullmatch(r"decimal\((\d+),\s*(\d+)\)", t)
        if m:
            return T.DecimalType(int(m.group(1)), int(m.group(2)))
        if re.fullmatch(r"fixed\[\d+\]", t):
            return T.BinaryType()
        raise IcebergProtocolError(f"unsupported Iceberg type {t!r}")
    kind = t.get("type")
    if kind == "struct":
        return T.StructType(
            [
                T.StructField(
                    f["name"],
                    iceberg_type_to_spark(f["type"]),
                    nullable=not f.get("required", False),
                )
                for f in t["fields"]
            ]
        )
    if kind == "list":
        return T.ArrayType(
            iceberg_type_to_spark(t["element"]),
            containsNull=not t.get("element-required", False),
        )
    if kind == "map":
        return T.MapType(
            iceberg_type_to_spark(t["key"]),
            iceberg_type_to_spark(t["value"]),
            valueContainsNull=not t.get("value-required", False),
        )
    raise IcebergProtocolError(f"unsupported Iceberg type {t!r}")


# ----------------------------------------------------------------- reader

class IcebergTableReader:
    """Read an Iceberg table directory: `read()` → DataFrame for the
    current (or any) snapshot; `data_files()` → live parquet paths."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        self.meta_dir = os.path.join(path, "metadata")
        if not os.path.isdir(self.meta_dir):
            raise FileNotFoundError(
                f"{path} has no metadata/ dir — not an Iceberg table"
            )
        self.metadata = self._load_metadata()
        fv = self.metadata.get("format-version", 1)
        if fv not in (1, 2):
            raise IcebergProtocolError(f"format-version {fv} unsupported")

    # ------------------------------------------------------- metadata file

    def _load_metadata(self) -> dict:
        hint = os.path.join(self.meta_dir, "version-hint.text")
        candidate = None
        if os.path.exists(hint):
            with open(hint) as fh:
                v = fh.read().strip()
            for name in (f"v{v}.metadata.json", f"{v}.metadata.json"):
                p = os.path.join(self.meta_dir, name)
                if os.path.exists(p):
                    candidate = p
                    break
        if candidate is None:
            versions = []
            for n in os.listdir(self.meta_dir):
                m = re.fullmatch(r"v?(\d+)(?:-[0-9a-f-]+)?\.metadata\.json", n)
                if m:
                    versions.append((int(m.group(1)), n))
            if not versions:
                raise IcebergProtocolError(
                    f"{self.meta_dir}: no *.metadata.json found"
                )
            candidate = os.path.join(self.meta_dir, max(versions)[1])
        with open(candidate) as fh:
            return json.load(fh)

    # --------------------------------------------------------------- paths

    def _local(self, uri: str) -> str:
        """Spec paths are absolute URIs; fixtures may use relative paths."""
        if uri.startswith("file://"):
            return uri[len("file://") :]
        if uri.startswith("/"):
            return uri
        if "://" in uri:
            raise IcebergProtocolError(
                f"non-local file URI {uri!r} unreachable from this adapter"
            )
        return os.path.join(self.path, uri)

    # ----------------------------------------------------------- snapshots

    def snapshot(self, snapshot_id: int | None = None) -> dict:
        snaps = self.metadata.get("snapshots") or []
        if snapshot_id is None:
            snapshot_id = self.metadata.get("current-snapshot-id")
            if snapshot_id in (None, -1):
                return {}
        for s in snaps:
            if s.get("snapshot-id") == snapshot_id:
                return s
        raise IcebergProtocolError(f"snapshot {snapshot_id} not found")

    def _file_sets(
        self, snapshot_id: int | None = None
    ) -> tuple[list[tuple[str, str]], list[str]]:
        """Walk the manifest chain → (data, position_deletes).

        data: (file_path as recorded in the manifest, local path) pairs —
        the recorded path is what position-delete rows reference (spec:
        delete rows carry the data file's exact `file_path`).
        position_deletes: local paths of parquet position-delete files
        (`content=1`). Equality deletes (`content=2`) are refused loudly.
        """
        snap = self.snapshot(snapshot_id)
        if not snap:
            return [], []
        _, manifests = ocf_read(self._local(snap["manifest-list"]))
        data: list[tuple[str, str]] = []
        deletes: list[str] = []
        for mf in manifests:
            _, entries = ocf_read(self._local(mf["manifest_path"]))
            for e in entries:
                if e.get("status") == 2:  # DELETED
                    continue
                df = e["data_file"]
                content = df.get("content", 0) or 0
                fmt = str(df.get("file_format", "PARQUET")).upper()
                if content == 0:
                    if fmt != "PARQUET":
                        raise IcebergProtocolError(
                            f"file format {fmt!r} unsupported"
                        )
                    data.append((df["file_path"], self._local(df["file_path"])))
                elif content == 1:  # position deletes
                    if fmt != "PARQUET":
                        raise IcebergProtocolError(
                            "non-parquet position-delete files unsupported"
                        )
                    deletes.append(self._local(df["file_path"]))
                else:
                    raise IcebergProtocolError(
                        "equality delete files unsupported"
                    )
        return data, deletes

    def data_files(self, snapshot_id: int | None = None) -> list[str]:
        return [p for _, p in self._file_sets(snapshot_id)[0]]

    # ---------------------------------------------------------------- read

    def schema(self) -> T.StructType:
        md = self.metadata
        if "schemas" in md:  # v2
            sid = md.get("current-schema-id", 0)
            ice = next(
                (s for s in md["schemas"] if s.get("schema-id") == sid),
                md["schemas"][0],
            )
        else:  # v1
            ice = md["schema"]
        out = iceberg_type_to_spark({"type": "struct", "fields": ice["fields"]})
        assert isinstance(out, T.StructType)
        return out

    def read(self, snapshot_id: int | None = None) -> DataFrame:
        schema = self.schema()
        data, deletes = self._file_sets(snapshot_id)
        if not data:
            return self.spark.createDataFrame([], schema)
        df = self.spark.read.schema(schema).parquet(*[p for _, p in data])
        if not deletes:
            return df
        return self._apply_position_deletes(df, data, deletes)

    def _apply_position_deletes(
        self,
        df: DataFrame,
        data: list[tuple[str, str]],
        deletes: list[str],
    ) -> DataFrame:
        """v2 position deletes: delete-file rows are (file_path, pos)
        pairs naming the data file's recorded path and the row's ordinal
        within it. Spark-first: `_metadata.file_path` + `_metadata
        .row_index` give exactly that ordinal at scan time, so the whole
        operation is one anti-join — no per-file driver loop, and the
        delete side stays a normal relation Catalyst/AQE can broadcast
        when small (the overwhelmingly common case)."""
        from pyspark.sql import functions as F

        cols = df.columns
        scan = df.select(
            "*",
            F.col("_metadata.file_path").alias("__ice_fp"),
            F.col("_metadata.row_index").alias("__ice_pos"),
        )
        # recorded manifest path -> the URI _metadata.file_path reports
        # (Hadoop renders local files as "file:/abs/path" — one slash)
        mapping = self.spark.createDataFrame(
            [("file:" + local, rec) for rec, local in data],
            "__ice_fp string, __del_fp string",
        )
        dels = (
            self.spark.read.parquet(*deletes)
            .select(
                F.col("file_path").alias("__del_fp"),
                F.col("pos").cast("long").alias("__ice_pos"),
            )
            .join(F.broadcast(mapping), "__del_fp")
            .select("__ice_fp", "__ice_pos")
        )
        return scan.join(
            dels, ["__ice_fp", "__ice_pos"], "left_anti"
        ).select(*cols)
