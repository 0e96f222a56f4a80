"""Materialized-intermediate pattern (S5): the reference's
``--cached-pred`` flag swaps recompute for reading prior CSV output
(pyspark_yolox.py:115-119, pyspark_dominant.py:59-62). Spark-native
form: write the intermediate as parquet once, read it on later runs —
checkpoint semantics with a durable, schema-carrying format.
"""

from __future__ import annotations

import logging
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_log = logging.getLogger(__name__)


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
        except Exception as exc:
            # missing cache is the normal first-run path, but surface it:
            # a *corrupt* cache (partial write, perm error) looks identical
            # here and silence would hide the recompute churn it causes
            _log.warning("cached read at %s failed (%s); recomputing", path, exc)
    return materialize(compute(), path)
