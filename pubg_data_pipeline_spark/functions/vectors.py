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

# Unrolling wide vectors is bounded by TWO per-method JVM limits, and
# the danger zone is reached by COMPOSITION, which dot() cannot see:
# Janino refuses to compile a 64-dim cosine (three dots + null guards
# in one tree, ~1200 nodes — loud multi-second fail + interpreted
# fallback per stage), and even where Janino succeeds, HotSpot
# silently declines to JIT generated methods past its huge-method
# threshold — a projection composing eight unrolled 64-dim plane dots
# (the LSH sketch) compiled fine yet ran ~15× slower than the fold,
# with nothing in the logs. A 64-dim cap was tried and reverted for
# exactly that composition hazard: the cap must keep ANY plausible
# multi-dot projection inside JIT range, so it stays at 32 (measured
# safe for the 3-dot cosine and the 8-dot sketch alike; 16–32-dim
# single dots run ~10× faster unrolled). Above the cap the
# zip_with/aggregate fold is kept.
_UNROLL_MAX_DIM = 32
_UNROLL_MAX_DIM_COSINE = 32


def as_double_vec(v: Column) -> Column:
    return v.cast("array<double>")


def dot(a: Column, b: Column, dim: int | None = None) -> Column:
    """Sequential-fold dot product in double precision.

    With ``dim`` given (the caller's static vector dimension — every
    ANN entry point carries one) and ``dim <= _UNROLL_MAX_DIM``, the
    fold is UNROLLED into plain element accesses and multiply-adds:
    whole-stage-codegen arithmetic instead of the interpreted
    higher-order ``zip_with``/``aggregate`` path, measured ~10× faster
    per pair on narrow (<=32-dim) scans, which is
    the difference between a 1M-vector exact re-rank finishing in
    seconds vs minutes. The unrolled sum starts at ``0.0 + p0`` so the
    float fold order is BIT-IDENTICAL to the aggregate fold (and to the
    DuckDB oracle's sequential ``list_dot_product``) — switching paths
    can never move a value hash. Element access is ``F.get`` (NULL on
    out-of-range, even under ANSI) so arrays shorter than ``dim`` yield
    NULL, matching zip_with's NULL padding; arrays LONGER than ``dim``
    are caught by an explicit size guard that yields NULL instead of a
    silently truncated prefix sum (a wrong caller-supplied ``dim`` must
    fail visibly, not rank on plausible partial dots — NULL sorts after
    every real score under the descending rankings all consumers use).
    The guard costs ~4 expression nodes, far inside the JIT-composition
    budget documented above."""
    ad, bd = as_double_vec(a), as_double_vec(b)
    if dim is not None and dim <= _UNROLL_MAX_DIM:
        acc = F.lit(0.0)
        for k in range(dim):
            acc = acc + F.get(ad, k) * F.get(bd, k)
        return F.when((F.size(ad) == dim) & (F.size(bd) == dim), acc)
    prods = F.zip_with(ad, bd, lambda x, y: x * y)
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column, dim: int | None = None) -> Column:
    return F.sqrt(dot(a, a, dim))


def cosine(a: Column, b: Column, dim: int | None = None) -> Column:
    """Cosine similarity; 0.0 for zero-norm vectors; NULL for NULL or
    length-mismatched inputs. Missing/corrupt data must not score as
    genuine orthogonality (the bare otherwise(0.0) silently ranked a
    NULL embedding as "minimally similar") — NULL propagates, like the
    SQL arithmetic an oracle would run, and sorts after real scores
    under the descending rankings every consumer uses."""
    cdim = dim if dim is not None and dim <= _UNROLL_MAX_DIM_COSINE else None
    d = dot(a, b, cdim)
    na, nb = norm(a, cdim), norm(b, cdim)
    return (
        F.when(a.isNull() | b.isNull() | (F.size(a) != F.size(b)), F.lit(None))
        # A NULL norm with non-NULL equal-size inputs means the unrolled
        # path's dim guard fired (caller-supplied dim != actual size):
        # propagate NULL rather than letting the NULL comparison below
        # fall through to the zero-norm branch and score 0.0.
        .when(na.isNull() | nb.isNull(), F.lit(None))
        .when((na > 0) & (nb > 0), d / (na * nb))
        .otherwise(F.lit(0.0))
    )
