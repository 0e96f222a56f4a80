#!/usr/bin/env python
"""Round-10 scale stress: the banded hamming-k (k=3) join at
production shape — up to 1M distinct 64-bit fingerprints. Validates
the operator's scale claims empirically: index is |V|*(k+1) rows, wall
time scales with index + candidate volume (not the |V|^2 pair space),
and the bucket-size distribution matches the uniform-model
|V|/2^16 expectation (the docstring's skew caveat is about
non-uniform corpora, so the max bucket is reported too)."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from bigdata_imgprocessing_spark.core.session import build_session
from bigdata_imgprocessing_spark.operators.hamming import (
    band_keys,
    hamming_k_neighbor_join,
)


def main() -> None:
    spark = build_session("scale-r10")
    spark.sparkContext.setLogLevel("ERROR")
    k = 3
    for n in (100_000, 1_000_000):
        # ~uniform 64-bit fingerprints + planted near neighbors at
        # distances 1..3 for 1 in 50 ids (distance cycles by id % 3)
        base = spark.range(n).select(F.xxhash64("id").alias("fp"))
        seed = spark.range(n // 50).select(
            F.xxhash64("id").alias("fp0"), (F.col("id") % 3).alias("d")
        )
        flip = (
            F.when(F.col("d") == 0, F.shiftleft(F.lit(1).cast("long"), 17))
            .when(
                F.col("d") == 1,
                F.shiftleft(F.lit(1).cast("long"), 5)
                + F.shiftleft(F.lit(1).cast("long"), 40),
            )
            .otherwise(
                F.shiftleft(F.lit(1).cast("long"), 2)
                + F.shiftleft(F.lit(1).cast("long"), 33)
                + F.shiftleft(F.lit(1).cast("long"), 63)
            )
        )
        planted = seed.select(F.col("fp0").bitwiseXOR(flip).alias("fp"))
        fps = base.union(planted)
        t0 = time.perf_counter()
        pairs = hamming_k_neighbor_join(fps, "fp", 64, k)
        by_dist = {
            r.dist: r.cnt
            for r in pairs.groupBy("dist").agg(F.count("*").alias("cnt")).collect()
        }
        dt = time.perf_counter() - t0
        # bucket audit: distribution of (blk, block_bits) bucket sizes
        # via THE shared key derivation the operator itself uses
        keys = band_keys(
            fps.select(F.col("fp").cast("long").alias("fp")).distinct(),
            "fp",
            64,
            k,
        )
        sizes = keys.groupBy("blk", "kv").count()
        mx, avg = sizes.agg(F.max("count"), F.avg("count")).collect()[0]
        print(
            f"n={n:>9,}  pairs_by_dist={by_dist}  wall={dt:6.2f}s  "
            f"bucket max={mx} avg={avg:.2f} (planted {n//50:,})"
        )
    spark.stop()


if __name__ == "__main__":
    main()
