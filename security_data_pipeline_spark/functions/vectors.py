"""Vector math over ``array<float|double>`` columns with higher-order functions.

Everything here is a pure Column expression (``aggregate`` / ``zip_with``) —
JVM-side, no Python UDF, no Arrow transfer. Used by the similarity-search and
embedding-dedup operators. Elements are upcast to double before any
arithmetic so Spark and the DuckDB oracle (``::DOUBLE[]``) accumulate
identically.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_double(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("array<double>")


def dot_product(a: Column | str, b: Column | str) -> Column:
    """Sequential-fold dot product of two equal-length arrays."""
    prods = F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y)
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column | str) -> Column:
    sq = F.aggregate(
        _as_double(a), F.lit(0.0), lambda acc, x: acc + x * x
    )
    return F.sqrt(sq)


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """dot(a,b) / (||a|| * ||b||); NULL if either norm is zero."""
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom != 0.0, dot_product(a, b) / denom)


def directional(df, vec_col: str = "embedding"):
    """Rows whose vector HAS a direction: non-NULL with nonzero norm.

    Cosine similarity is undefined for the zero vector, and the
    similarity operators precompute norms for reuse — a raw
    ``dot/(na*nb)`` over a zero or NULL vector is an ANSI
    divide-by-zero stage failure, not a NULL. Every public similarity
    entry filters through this, so degenerate embeddings (a failed
    encoder emitting zeros, a NULL from a left join) are IGNORED rather
    than crashing the job or polluting top-k output."""
    return df.filter(l2_norm(vec_col) > 0.0)
