"""Vector expressions over ``array<float|double>`` columns.

All JVM-side higher-order functions (``zip_with`` + ``aggregate``) — no
Python in the hot path. Element iteration is sequential, so double-sum
results are deterministic and reproducible across runs (and match an
oracle computing the same left-to-right sum).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double_array(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine_similarity(a: Column, b: Column) -> Column:
    """Cosine over double arrays; null-safe for zero vectors (nullif)."""
    return dot(a, b) / F.nullif(norm(a) * norm(b), F.lit(0.0))


def sign_bucket(col: Column | str, n_bits: int = 8) -> Column:
    """Random-hyperplane-LSH-style bucket id from the signs of the first
    ``n_bits`` dimensions (axis-aligned planes — deterministic and
    engine-portable). Vectors in the same bucket are ANN candidates."""
    c = F.col(col) if isinstance(col, str) else col
    bits = [
        F.when(F.element_at(c, i + 1) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
        for i in range(n_bits)
    ]
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out.cast("int")
