"""Vector math over ``array<float>`` embedding columns — built-in
higher-order functions (zip_with / aggregate), fully JVM-side.

Cross-engine determinism: both engines fold left-to-right over the
same element order in **double** precision, so dot products are
bit-identical and rounding to 6dp is stable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot_col(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def dot_sql(a: str, b: str, dim: int) -> str:
    return (
        f"list_sum(list_transform(range(1, {dim + 1}), "
        f"i -> {a}[i]::double * {b}[i]::double))"
    )


def cosine_col(a: Column, b: Column) -> Column:
    """Cosine as NULL-on-zero-norm (round 8): ``try_divide`` instead
    of ANSI ``/`` — a degenerate (all-zero) vector yields a NULL
    cosine, which desc-orderings rank LAST and threshold filters drop,
    instead of one bad row crashing every query that touches it. This
    is also exactly DuckDB's double semantics (``x / 0.0`` is NULL),
    so the oracle twin agrees on degenerate rows, and values on
    non-degenerate rows are bit-identical to the plain division."""
    return F.try_divide(dot_col(a, b), F.sqrt(dot_col(a, a) * dot_col(b, b)))


def cosine_sql(a: str, b: str, dim: int) -> str:
    return (
        f"({dot_sql(a, b, dim)} / "
        f"sqrt({dot_sql(a, a, dim)} * {dot_sql(b, b, dim)}))"
    )
