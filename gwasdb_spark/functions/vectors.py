"""Vector math over array<float> embedding columns — pure Catalyst.

`F.aggregate` folds sequentially left-to-right, so given identical inputs
the resulting double is deterministic. Elements are cast to double before
multiply so precision does not depend on engine-internal float paths.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product of two float arrays, in double."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """cosine = dot/(sqrt(dot_aa)*sqrt(dot_bb)) — fixed association order.
    Zero-norm input → null: ANSI mode (Spark 4 default) raises
    DIVIDE_BY_ZERO instead of returning NaN, and one degenerate vector must
    not kill a corpus-scale scoring job."""
    denom = F.sqrt(dot(a, a)) * F.sqrt(dot(b, b))
    return F.when(denom > 0, dot(a, b) / denom)


def vec_mean(a: Column) -> Column:
    """Mean of elements; empty array → null (ANSI divide-by-zero guard)."""
    s = dot(a, F.transform(a, lambda _: F.lit(1.0).cast("float")))
    return F.when(F.size(a) > 0, s / F.size(a))
