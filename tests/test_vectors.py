"""functions/vectors.py NULL/short-vector semantics (ADVICE r10):
the unrolled dot/norm forms must agree with the zip_with/aggregate
fold EVERYWHERE — an in-range NULL element propagates NULL (the old
coalesce silently turned it into 0), a vector shorter than `dim`
zero-pads, and a NULL array yields NULL."""

import math

from pyspark.sql import functions as F
from pyspark.sql import types as T

from deimos_spark.functions.vectors import (
    dot,
    dot_cols_unrolled,
    norm_unrolled,
    to_double_array,
)

SCHEMA = T.StructType(
    [
        T.StructField("a", T.ArrayType(T.DoubleType())),
        T.StructField("b", T.ArrayType(T.DoubleType())),
    ]
)


def _vals(spark, rows, expr):
    df = spark.createDataFrame(rows, SCHEMA)
    return [r[0] for r in df.select(expr).collect()]


def test_unrolled_dot_matches_fold_including_nulls(spark):
    rows = [
        ([1.0, 2.0, 3.0], [4.0, 5.0, 6.0]),      # plain
        ([1.0, None, 3.0], [4.0, 5.0, 6.0]),     # in-range NULL element
        (None, [4.0, 5.0, 6.0]),                  # NULL array
    ]
    unrolled = _vals(spark, rows, dot_cols_unrolled("a", "b", 3))
    fold = _vals(
        spark,
        rows,
        dot(to_double_array(F.col("a")), to_double_array(F.col("b"))),
    )
    assert unrolled == fold == [32.0, None, None]


def test_unrolled_dot_zero_pads_short_vectors(spark):
    # dim=4 over length-3 vectors: the out-of-range term contributes 0
    rows = [([1.0, 2.0, 3.0], [4.0, 5.0, 6.0])]
    assert _vals(spark, rows, dot_cols_unrolled("a", "b", 4)) == [32.0]
    # ragged: a shorter than b — only overlapping indexes contribute
    rows = [([1.0, 2.0], [4.0, 5.0, 6.0])]
    assert _vals(spark, rows, dot_cols_unrolled("a", "b", 3)) == [14.0]


def test_unrolled_norm_null_semantics(spark):
    rows = [
        ([3.0, 4.0, None], [0.0]),  # in-range NULL -> NULL norm
        ([3.0, 4.0], [0.0]),        # short -> zero-pad
        (None, [0.0]),              # NULL array -> NULL
    ]
    got = _vals(spark, rows, norm_unrolled("a", 3))
    assert got[0] is None and got[2] is None
    assert math.isclose(got[1], 5.0)
