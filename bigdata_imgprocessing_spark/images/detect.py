"""Object-detection stage — deterministic STUB behind the real interface.

The reference runs YOLOX-tiny per image inside an RDD map
(pyspark_yolox.py:62-87) with the checkpoint absent from its own repo
(.MISSING_LARGE_BLOBS:1). Here the model forward pass is replaced by a
deterministic md5-derived fake (so the driver oracle can replicate it),
while everything Spark-grade is real: Arrow batch transfer, the
array<struct> detection schema, explode → threshold-filter → count
(pyspark_yolox.py:90-111, P6/P7). Swapping in a real model means
replacing ``_detections_for_id`` with a ``predict_batch_udf`` scorer —
the plan shape is unchanged.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    StructField,
    StructType,
)

#: score threshold for counting a detection (TRESHOLD, pyspark_yolox.py:17)
SCORE_THRESHOLD = 0.4

DETECTION_SCHEMA = ArrayType(
    StructType(
        [
            StructField("class_id", IntegerType()),
            StructField("score", DoubleType()),
        ]
    )
)


def _h40(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:10], 16)


def _detections_for_id(img_id: str) -> list[dict]:
    """0-3 pseudo-detections, fully determined by the image id."""
    n = _h40(img_id) % 4
    return [
        {
            "class_id": _h40(f"{img_id}_{j}") % 80,
            "score": (_h40(f"{img_id}_s{j}") % 1000) / 1000.0,
        }
        for j in range(1, n + 1)
    ]


@F.pandas_udf(DETECTION_SCHEMA)
def detect_udf(img_id: pd.Series) -> pd.Series:
    """Stub model inference (stands in for predict_batch_udf + YOLOX)."""
    return img_id.map(_detections_for_id)
