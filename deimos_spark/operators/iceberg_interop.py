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

Scope (honest gates, refused loudly): format-version 1 and 2
append-only tables. Row-level deletes (v2 delete manifests / delete
files), unsupported file formats, and format-version 3+ raise
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

    def data_files(self, snapshot_id: int | None = None) -> list[str]:
        snap = self.snapshot(snapshot_id)
        if not snap:
            return []
        _, manifests = ocf_read(self._local(snap["manifest-list"]))
        paths: list[str] = []
        for mf in manifests:
            if mf.get("content", 0) not in (0, None):
                raise IcebergProtocolError(
                    "v2 delete manifests (row-level deletes) unsupported"
                )
            _, entries = ocf_read(self._local(mf["manifest_path"]))
            for e in entries:
                if e.get("status") == 2:  # DELETED
                    continue
                df = e["data_file"]
                if df.get("content", 0) not in (0, None):
                    raise IcebergProtocolError("delete files unsupported")
                fmt = str(df.get("file_format", "PARQUET")).upper()
                if fmt != "PARQUET":
                    raise IcebergProtocolError(
                        f"file format {fmt!r} unsupported"
                    )
                paths.append(self._local(df["file_path"]))
        return paths

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
        files = self.data_files(snapshot_id)
        if not files:
            return self.spark.createDataFrame([], schema)
        return self.spark.read.schema(schema).parquet(*files)
