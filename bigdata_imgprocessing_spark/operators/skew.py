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
    shuffles instead of one skewed one). Salt = monotonically_increasing_id
    mod n (a per-partition counter in the low bits), so rows of a hot key
    spread evenly without requiring a unique column."""
    salted = df.withColumn(
        "__salt", F.pmod(F.monotonically_increasing_id(), F.lit(n_salts))
    )
    partial = salted.groupBy(key, "__salt").agg(F.sum(value).alias("__psum"))
    return partial.groupBy(key).agg(F.sum("__psum").alias(f"sum_{value}"))
