"""Vector math over ``array<float>`` columns — no UDFs.

Built on Spark higher-order functions (``zip_with`` / ``aggregate``),
which run inside codegen on the JVM. Accumulation is sequential
left-to-right in double precision, which matches DuckDB's
``list_sum(list_transform(list_zip(...)))`` bit-for-bit — that exact
agreement is what lets the similarity-search queries use a value-hash
oracle instead of a tolerance check.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def _c(x: Column | str) -> Column:
    return F.col(x) if isinstance(x, str) else x


def dot(a: Column | str, b: Column | str) -> Column:
    """Double-precision dot product of two array<float|double> columns."""
    products = F.zip_with(
        _c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double")
    )
    return F.aggregate(products, F.lit(0.0), lambda acc, v: acc + v)


def l2_norm(a: Column | str) -> Column:
    return F.sqrt(dot(a, a))


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; null-safe on zero vectors (returns null)."""
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom > 0, dot(a, b) / denom)
