"""Skew-mitigation compositions (SCALING.md): two-level salted
aggregation for heavy-hitter grouping keys.

AQE's skew-join splitting covers joins; for AGGREGATION keys with heavy
hitters the standard fix is salting: spread each key over ``n_salts``
sub-keys, partially aggregate, then combine. Results are identical to
the direct groupBy for any algebraic aggregate (sum/count/min/max) —
asserted by tests/test_operators.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_agg_sum(
    df: DataFrame, key: str, value: str, n_salts: int = 16
) -> DataFrame:
    """sum(value) per key via salt → partial agg → final agg (two small
    shuffles instead of one skewed one).

    The salt is a DETERMINISTIC pure function of the row
    (pmod(hash(all columns), n)): under task retry / partial stage
    recomputation every row re-salts into the SAME partial-agg partition.
    A monotonically_increasing_id-based salt (round 1) is the known Spark
    hazard there — recomputed rows can land in a different sub-key and
    double-count or drop. Trade-off: fully duplicate rows share a salt,
    so a hot key consisting of identical rows won't spread; hot keys with
    any varying column (the realistic skew case) spread evenly."""
    salted = df.withColumn(
        "__salt", F.pmod(F.hash(*[F.col(c) for c in df.columns]), F.lit(n_salts))
    )
    partial = salted.groupBy(key, "__salt").agg(F.sum(value).alias("__psum"))
    return partial.groupBy(key).agg(F.sum("__psum").alias(f"sum_{value}"))
