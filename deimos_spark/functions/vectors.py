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


UNROLL_MAX_DIM = 256


def cosine_vs_literal(vec_col: Column | str, query: list[float]) -> Column:
    """Cosine vs a literal vector, UNROLLED into 2·dim scalar expressions.

    Spark evaluates higher-order-function lambdas interpreted, one closure
    call per element; unrolled element_at arithmetic stays inside
    whole-stage codegen and is ~30% faster at 64 dims. The expression tree
    grows linearly with dim, so past UNROLL_MAX_DIM fall back to the fold
    (plan-size/analysis cost dominates there; above ~2k dims use the
    BLAS pandas path in simsearch)."""
    import math

    c = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    if len(query) > UNROLL_MAX_DIM:
        return cosine(to_double_array(c), to_double_array(lit_vector(query)))
    qn = math.sqrt(sum(float(x) * float(x) for x in query))
    if isinstance(vec_col, str):
        # one SQL-string parse instead of ~5·dim py4j Column calls —
        # at 128 dims the Column-API build costs ~0.3s of driver time
        # per plan build (same left-fold association, same doubles;
        # repr() round-trips IEEE doubles exactly)
        es = [
            f"CAST(element_at({vec_col}, {i + 1}) AS DOUBLE)"
            for i in range(len(query))
        ]
        dot = " + ".join(
            f"{e} * ({float(x)!r})" for e, x in zip(es, query)
        )
        n2s = " + ".join(f"{e} * {e}" for e in es)
        return F.expr(f"({dot}) / (sqrt({n2s}) * ({qn!r}))")
    dot_e = None
    n2 = None
    for i, x in enumerate(query):
        e = F.element_at(c, i + 1).cast("double")
        t = e * F.lit(float(x))
        s = e * e
        dot_e = t if dot_e is None else dot_e + t
        n2 = s if n2 is None else n2 + s
    return dot_e / (F.sqrt(n2) * F.lit(qn))


def dot_cols_unrolled(a: str, b: str, dim: int) -> Column:
    """Column-vs-column dot product UNROLLED into codegen'd
    element_at arithmetic (one SQL parse, left-to-right association —
    bit-identical to the fold in `dot` for full-length vectors,
    INCLUDING NULL-element and NULL-array propagation; ~10-30x faster:
    Spark runs higher-order-function lambdas interpreted, one closure
    call per element). `a`/`b` are COLUMN NAMES; `dim` the known
    vector length (callers pass it like simsearch's lsh does). The one
    deliberate divergence: a vector SHORTER than `dim` is zero-padded
    here, where the fold's zip_with would NULL-pad the ragged tail.
    Falls back to the fold past UNROLL_MAX_DIM where plan size
    dominates."""
    if dim > UNROLL_MAX_DIM:
        return dot(to_double_array(F.col(a)), to_double_array(F.col(b)))
    # zero-pad ONLY when the index is genuinely past a vector's real
    # length (adding 0.0 never changes an IEEE sum, so short vectors
    # dot correctly); an IN-RANGE NULL element must propagate NULL,
    # exactly like the zip_with/aggregate fold in `dot`. A NULL ARRAY
    # is handled by ONE outer IF — size(NULL) is -1 under legacy
    # sizeOfNull, which would otherwise silently zero-pad the whole
    # sum. Codegen CSEs the repeated size() calls.
    terms = " + ".join(
        f"IF(size({a}) < {i + 1} OR size({b}) < {i + 1}, 0.0D, "
        f"CAST(element_at({a}, {i + 1}) AS DOUBLE) * "
        f"CAST(element_at({b}, {i + 1}) AS DOUBLE))"
        for i in range(dim)
    )
    return F.expr(
        f"IF({a} IS NULL OR {b} IS NULL, CAST(NULL AS DOUBLE), ({terms}))"
    )


def dot_cols_unrolled_nullprop(a: str, b: str, dim: int) -> Column:
    """NULL-PROPAGATING unrolled dot — bit-identical to the fold `dot`
    (same left-to-right association; out-of-range element_at yields
    NULL exactly like zip_with's ragged padding, and any NULL term
    NULLs the sum) and ~3× leaner than dot_cols_unrolled's
    zero-padding form: no per-term IF, so a 64-dim product stays far
    from janino's 64 KB generated-method limit (the padded 3-piece
    cosine blew past it and silently fell back to interpreted).
    Caveat: vectors LONGER than `dim` are truncated where the fold
    would include the tail — callers probe `dim` from the data and
    fixed-width embedding columns are the contract (ragged input
    already breaks the numpy training path upstream)."""
    if dim > UNROLL_MAX_DIM:
        return dot(to_double_array(F.col(a)), to_double_array(F.col(b)))
    terms = " + ".join(
        f"CAST(element_at({a}, {i + 1}) AS DOUBLE) * "
        f"CAST(element_at({b}, {i + 1}) AS DOUBLE)"
        for i in range(dim)
    )
    return F.expr(terms)


def norm_unrolled(a: str, dim: int) -> Column:
    """sqrt(self-dot), unrolled like dot_cols_unrolled."""
    if dim > UNROLL_MAX_DIM:
        return norm(to_double_array(F.col(a)))
    terms = " + ".join(
        f"IF(size({a}) < {i + 1}, 0.0D, "
        f"CAST(element_at({a}, {i + 1}) AS DOUBLE) * "
        f"CAST(element_at({a}, {i + 1}) AS DOUBLE))"
        for i in range(dim)
    )
    return F.expr(
        f"IF({a} IS NULL, CAST(NULL AS DOUBLE), sqrt({terms}))"
    )
