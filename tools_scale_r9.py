#!/usr/bin/env python
"""Round-9 scale stress: the hamming-1 wildcard index at production
shape — 1M distinct 64-bit fingerprints (vs the query's 65k-max 16-bit
space). Validates the operator's two scale claims empirically: the
index is |V|*bits rows with <= 2 rows per key bucket (skew-proof), and
wall time scales with the index size, not the pair space."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from bigdata_imgprocessing_spark.core.session import build_session
from bigdata_imgprocessing_spark.operators.hamming import hamming1_neighbor_join


def main() -> None:
    spark = build_session("scale-r9")
    spark.sparkContext.setLogLevel("ERROR")
    for n in (100_000, 1_000_000):
        # xxhash64 of ids: ~uniform 64-bit fingerprints, plus planted
        # distance-1 neighbors for 1 in 50 ids so recall is non-trivial
        base = spark.range(n).select(F.xxhash64("id").alias("fp"))
        planted = (
            spark.range(n // 50)
            .select(F.xxhash64("id").alias("fp0"))
            .select(
                F.col("fp0")
                .bitwiseXOR(F.shiftleft(F.lit(1).cast("long"), 17))
                .alias("fp")
            )
        )
        fps = base.union(planted)
        t0 = time.perf_counter()
        pairs = hamming1_neighbor_join(fps, "fp", 64)
        n_pairs = pairs.count()
        dt = time.perf_counter() - t0
        # key-bucket audit: every (pos, k) bucket must hold <= 2 fps
        # (recompute the index the same way the operator does)
        keys = fps.select(F.col("fp").cast("long").alias("fp")).distinct().select(
            "fp",
            F.explode(
                F.array(*[
                    F.struct(
                        F.lit(i).alias("pos"),
                        F.col("fp").bitwiseOR(
                            F.shiftleft(F.lit(1).cast("long"), i)
                        ).alias("k"),
                    )
                    for i in range(64)
                ])
            ).alias("pk"),
        )
        mx = (
            keys.groupBy("pk.pos", "pk.k").count().agg(F.max("count")).collect()[0][0]
        )
        print(
            f"n={n:>9,}  pairs={n_pairs:>7,}  wall={dt:6.2f}s  "
            f"max_bucket={mx} (planted {n//50:,})"
        )
    spark.stop()


if __name__ == "__main__":
    main()
