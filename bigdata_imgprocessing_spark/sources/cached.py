"""Materialized-intermediate pattern (S5): the reference's
``--cached-pred`` flag swaps recompute for reading prior CSV output
(pyspark_yolox.py:115-119, pyspark_dominant.py:59-62). Spark-native
form: write the intermediate as parquet once, read it on later runs —
checkpoint semantics with a durable, schema-carrying format.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def materialize(df: DataFrame, path: str) -> DataFrame:
    """Persist an intermediate to parquet and return the re-read (cuts
    lineage like checkpoint(), but durable across sessions)."""
    df.write.mode("overwrite").parquet(path)
    return df.sparkSession.read.parquet(path)


def read_or_compute(
    spark: SparkSession, path: str, compute: Callable[[], DataFrame], refresh: bool = False
) -> DataFrame:
    """Read the materialized result at ``path`` if present (and not
    ``refresh``), else compute → materialize → return."""
    if not refresh:
        try:
            return spark.read.parquet(path)
        except Exception:
            pass
    return materialize(compute(), path)
