"""Perceptual image fingerprints over binary image columns.

aHash-family perceptual hash (mean-threshold bit per pixel-channel),
the standard blocking key for image near-duplicate detection in a
training-data pipeline: exact-dup via hash equality, near-dup via
hamming distance with banded-LSH candidate generation (the same
band-bucket trick as MinHash LSH in queries/dedup.py, applied to hash
bits instead of shingle signatures).

Reference analog: the per-image feature extraction stage of
pyspark_dominant.py:33-48 (decode -> per-image reduction); the hash is
computed from DECODED bytes so the whole binary round trip sits inside
the checked result.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

from .codec import decode_image


def _phash(buf: bytes) -> int:
    """Mean-threshold perceptual hash: bit i = (pixel_value_i >= mean),
    bits packed little-endian in row-major pixel-channel order.

    The mean is sum/float(n) in float64 — pixel ints are exact in
    double, so the oracle's SQL ``(p1+..+pn)/n.0`` computes the
    identical double and every bit matches exactly."""
    v = decode_image(buf).reshape(-1).astype(np.float64)
    m = v.sum() / float(len(v))
    return int(sum(1 << i for i in np.nonzero(v >= m)[0]))


@F.pandas_udf(LongType())
def phash_udf(content: pd.Series) -> pd.Series:
    return content.map(_phash)
