"""Vector column expressions (F18: cosine / dot / euclidean).

Convention (SURVEY §7.0): raw cosine on L2-normalized vectors, NOT the
Atlas ``(1+cos)/2`` rescale (reference declares cosine at
index_manager.py:57-76 and normalizes at generation,
rag_config.yaml:27).  All expressions are higher-order-function
builtins (``zip_with``/``aggregate``/``transform``) — JVM-side,
codegen'd, no Python.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def to_double_array(col: Column) -> Column:
    """Testdata embeddings are array<float>; score in float64 so the
    DuckDB oracle (which computes in DOUBLE) agrees."""
    return F.transform(col, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential left-to-right sum — same order as the oracle's
    list_dot_product, so results agree bit-for-bit at equal precision."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """F18 cosine similarity (metric per index_manager.py:57-60)."""
    return dot(a, b) / (norm(a) * norm(b))


def euclidean(a: Column, b: Column) -> Column:
    return F.sqrt(
        F.aggregate(F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
                    F.lit(0.0), lambda acc, x: acc + x)
    )


def l2_normalize(a: Column) -> Column:
    n = norm(a)
    return F.when(n == 0, a).otherwise(F.transform(a, lambda x: x / n))
