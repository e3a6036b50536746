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
    """Bucket id from the signs of the first ``n_bits`` dimensions
    (axis-aligned planes). Kept as the data-independent baseline;
    ``hyperplane_bucket`` (seeded random projections) is the production
    path — axis-aligned signs collapse to few buckets on correlated
    embeddings."""
    c = F.col(col) if isinstance(col, str) else col
    bits = [
        F.when(F.element_at(c, i + 1) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
        for i in range(n_bits)
    ]
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out.cast("int")


def literal_vector(vals: list[float]) -> Column:
    """A literal array<double> column."""
    return F.array(*[F.lit(float(v)) for v in vals])


def hyperplane_bucket(col: Column | str, n_bits: int = 4) -> Column:
    """Random-hyperplane LSH bucket (Charikar SimHash construction): bit
    ``i`` is the sign of the projection onto frozen unit hyperplane ``i``
    (``functions.artifacts.HYPERPLANES``, seeded + committed). The same
    literal planes are embedded in the DuckDB oracles, so bucketing is
    engine-portable; projections are sequential double sums (bit-identical
    across engines)."""
    from machine_learning_with_spark_streaming_spark.functions.artifacts import HYPERPLANES

    c = as_double_array(col)
    bits = [
        F.when(dot(c, literal_vector(HYPERPLANES[i])) >= 0, F.lit(1 << i)).otherwise(
            F.lit(0)
        )
        for i in range(n_bits)
    ]
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out.cast("int")
