"""Embedding-vector column functions — pure JVM higher-order expressions.

Dot products and norms via ``zip_with``/``aggregate`` (sequential left
fold → deterministic summation order, bit-identical across engines and
parallelism levels). All math in fp64.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _to_double(v: Column) -> Column:
    return F.transform(v, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(_to_double(a), _to_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    # try_divide: a zero-norm vector is a 0/0 — under Spark's default
    # ANSI mode a plain `/` KILLS the query (DIVIDE_BY_ZERO) instead of
    # yielding NaN; NULL instead drops out of every >=-threshold filter
    # and sorts last under desc ordering (degenerate embeddings never
    # pair and never rank)
    return F.try_divide(dot(a, b), norm(a) * norm(b))
