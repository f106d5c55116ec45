"""Vector (embedding) column expressions.

Dot product / norm / cosine over ``array<float|double>`` columns using
JVM-side higher-order functions (``zip_with`` + ``aggregate``) — no
Python in the hot path, so brute-force similarity scans stay inside
whole-stage codegen. ``aggregate`` folds left sequentially, which makes
the result bit-comparable with the DuckDB oracle's sequential
``list_dot_product`` when both operate on doubles.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double_vec(v: Column) -> Column:
    return v.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product in double precision."""
    prods = F.zip_with(as_double_vec(a), as_double_vec(b), lambda x, y: x * y)
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; 0.0 for zero-norm vectors; NULL for NULL or
    length-mismatched inputs. Missing/corrupt data must not score as
    genuine orthogonality (the bare otherwise(0.0) silently ranked a
    NULL embedding as "minimally similar") — NULL propagates, like the
    SQL arithmetic an oracle would run, and sorts after real scores
    under the descending rankings every consumer uses."""
    d = dot(a, b)
    na, nb = norm(a), norm(b)
    return (
        F.when(a.isNull() | b.isNull() | (F.size(a) != F.size(b)), F.lit(None))
        .when((na > 0) & (nb > 0), d / (na * nb))
        .otherwise(F.lit(0.0))
    )
