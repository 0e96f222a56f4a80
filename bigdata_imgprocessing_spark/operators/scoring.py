"""Broadcast-model batch scoring — the reference's broadcast-torch-model
pattern (sc.broadcast(model), pyspark_yolox.py:49-50, dereferenced per
row at :63) re-expressed the Spark-native way: weights broadcast once
per executor, scoring vectorized over Arrow batches inside a
pandas_udf. A real model swaps the numpy dot for a forward pass
(predict_batch_udf); the stage shape is identical.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import Column, SparkSession
from pyspark.sql import functions as F


def deterministic_weights(dim: int, seed_tag: str = "w") -> list[int]:
    """Integer weight vector derived from md5 — reproducible in SQL, so
    scored outputs stay oracle-checkable."""
    return [
        (int(hashlib.md5(f"{seed_tag}{d}".encode()).hexdigest()[:10], 16) % 201) - 100
        for d in range(dim)
    ]


def make_linear_scorer(spark: SparkSession, weights: list[int]):
    """Returns a pandas_udf Column-builder closing over a broadcast of
    the weights (one copy per executor, not per task)."""
    bc = spark.sparkContext.broadcast(np.asarray(weights, dtype=np.float64))

    @F.pandas_udf("double")
    def score_udf(emb: pd.Series) -> pd.Series:
        w = bc.value
        m = np.stack(emb.map(lambda v: np.asarray(v, dtype=np.float64)))
        # per-row python-float accumulation in array order — matches the
        # oracle's element-wise sum exactly (np.dot would pair-sum)
        return pd.Series([float(sum(r * w, 0.0)) for r in m])

    def scorer(col: Column) -> Column:
        return score_udf(col)

    return scorer
