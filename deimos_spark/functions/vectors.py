"""Vector column expressions (dot product, norms, cosine) over
array<float>/array<double> embedding columns.

JVM-side higher-order functions only — `F.zip_with` + `F.aggregate` compile
to codegen'd loops, so a 64-dim cosine over 1e9 rows never leaves the JVM.
For very high dims (>2k) a Pandas-UDF BLAS path wins; see
operators/simsearch.cosine_topk_pandas.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def to_double_array(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential left-to-right fold — bit-reproducible across engines."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def lit_vector(values: list[float]) -> Column:
    """Literal query vector (broadcast to every task as part of the plan)."""
    return F.array(*[F.lit(float(v)) for v in values])
