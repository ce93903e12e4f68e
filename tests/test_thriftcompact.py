"""Stdlib parquet-footer parser (schemas/thriftcompact.py) — exists
because the sandbox's pyarrow refuses footers mentioning the parquet
VARIANT logical type, and the Iceberg writer needs num_rows (manifest
record counts) from exactly those files. Pinned against pyarrow on
files pyarrow CAN parse, and against known content where it can't."""

import glob
import os

import pytest

from deimos_spark.schemas.thriftcompact import (
    SchemaNode,
    ThriftParseError,
    read_footer,
)

SF_DIR = "/root/testdata/sf0.001"


def test_matches_pyarrow_on_every_testdata_table():
    import pyarrow.parquet as pq

    checked = 0
    for f in sorted(glob.glob(os.path.join(SF_DIR, "*.parquet"))):
        n, root = read_footer(f)
        md = pq.read_metadata(f)
        assert n == md.num_rows, f
        assert [c.name for c in root.children] == list(
            pq.read_schema(f).names
        ), f
        checked += 1
    assert checked >= 10  # the full sf0.001 table set


def test_nested_schema_tree(spark, tmp_path):
    import pyarrow.parquet as pq

    p = str(tmp_path / "n")
    spark.sql(
        "SELECT 1 AS a, named_struct('x', 2, 'y', 'z') AS s, "
        "array(1, 2) AS l"
    ).coalesce(1).write.parquet(p)
    f = glob.glob(p + "/*.parquet")[0]
    n, root = read_footer(f)
    assert n == pq.read_metadata(f).num_rows == 1
    s = next(c for c in root.children if c.name == "s")
    assert s.child_names() == {"x", "y"}


def test_variant_footer_where_pyarrow_refuses(spark, tmp_path):
    """The reason this module exists: a VARIANT-annotated footer."""
    from pyspark.sql import functions as F

    p = str(tmp_path / "v")
    spark.range(7).select(
        F.parse_json(F.lit('{"k": 1}')).alias("v")
    ).coalesce(1).write.parquet(p)
    f = glob.glob(p + "/*.parquet")[0]

    import pyarrow.parquet as pq

    with pytest.raises(Exception):
        pq.read_metadata(f)  # the pyarrow gap being worked around
    n, root = read_footer(f)
    assert n == 7
    v = next(c for c in root.children if c.name == "v")
    assert {"metadata", "value"} <= v.child_names()


def test_refuses_non_parquet(tmp_path):
    p = str(tmp_path / "junk")
    with open(p, "wb") as fh:
        fh.write(b"not a parquet file at all.....")
    with pytest.raises(ThriftParseError, match="PAR1"):
        read_footer(p)
    with open(p, "wb") as fh:
        fh.write(b"x")
    with pytest.raises(ThriftParseError, match="too small"):
        read_footer(p)


def test_schemanode_helpers():
    n = SchemaNode("v", None, [SchemaNode("metadata"), SchemaNode("value")])
    assert n.child_names() == {"metadata", "value"}
