"""Vector-similarity column builders: dot / norm / cosine over
``array<float>`` columns via higher-order functions — JVM-side, no UDFs.

Determinism contract with the DuckDB oracle: both engines multiply
element-wise in array order, cast each element to double first, and sum
left-to-right, so the resulting doubles are bit-identical and rounding
is exact parity (see queries/similarity.py oracles using
``list_transform`` + ``list_sum`` with ``::DOUBLE`` casts).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    # floored at 1e-30 so a zero vector yields cosine 0 instead of an
    # engine-divergent 0/0 (Spark NaN vs DuckDB NULL) — every oracle
    # denominator mirrors greatest(sqrt(...), 1e-30)
    return F.greatest(F.sqrt(dot(a, a)), F.lit(1e-30))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def sqdist(a: Column, b: Column) -> Column:
    """Squared Euclidean distance, same determinism contract as ``dot``:
    element order, double casts, left-to-right sum, and an explicit
    multiply (not pow) mirrored in the oracle SQL."""
    return F.aggregate(
        F.zip_with(
            a,
            b,
            lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
