"""Interval union / merge-overlapping (gaps-and-islands) operator.

Per key, merges every group of transitively-overlapping-or-touching
``[start, end]`` intervals into one island. The classic formulation: an
interval starts a NEW island iff its start is strictly after the
running max end of all earlier intervals (ordered by start); the island
id is the running count of such breaks. Both windows are per-key
partitioned — parallel at any scale — and all arithmetic is
comparisons, so any orderable column type works and parity is exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def merge_intervals(df: DataFrame, key: str, start: str, end: str) -> DataFrame:
    """Return one row per merged island: (key, start=min, end=max).

    Ties on ``start`` are safe without an explicit tie-break: rows that
    tie carry the running max through either order, so island
    membership (and thus min/max per island) is order-independent.
    """
    wp = (
        Window.partitionBy(key)
        .orderBy(start)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wc = (
        Window.partitionBy(key)
        .orderBy(start)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    m = df.withColumn("_pm", F.max(end).over(wp))
    f = m.withColumn(
        "_ni",
        F.when(F.col("_pm").isNull() | (F.col(start) > F.col("_pm")), 1).otherwise(0),
    )
    g = f.withColumn("_isl", F.sum("_ni").over(wc))
    return (
        g.groupBy(key, "_isl")
        .agg(F.min(start).alias(start), F.max(end).alias(end))
        .drop("_isl")
    )
