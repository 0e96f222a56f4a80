#!/usr/bin/env python
"""Round-11 scale stress.

Part A — the capped banded hamming join under PLANTED BLOCK SKEW at
production width (64-bit, k=3): concentrate a large fraction of the
vocabulary on one block value (the boilerplate-shard case the operator
docstring predicts), measure the uncapped candidate blowup vs the
max_bucket cutoff's bounded candidates + wall, and report the recall
accounting (pairs only reachable through the hot bucket are the
documented cutoff loss).

Part B — scale curves (sf0.001 -> 0.01 -> 0.1) for the round-11 batch
queries, bench-style (clearCache between runs).
"""

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


def part_a(spark) -> None:
    k, bits = 3, 64
    for n, hot_frac in [(200_000, 0.3), (1_000_000, 0.3)]:
        n_hot = int(n * hot_frac)
        # hot cohort: block 0 (low 16 bits) all zeros, upper 48 bits
        # spread by xxhash64; cold cohort: fully spread
        base = spark.range(n).select(
            F.col("id"), F.xxhash64("id").alias("h")
        )
        fps = base.select(
            F.when(
                F.col("id") < n_hot,
                F.col("h").bitwiseAND(F.lit(~0xFFFF)),
            )
            .otherwise(F.col("h"))
            .alias("fp")
        )
        keys = band_keys(fps.select("fp").distinct(), "fp", bits, k)
        sizes = keys.groupBy("blk", "kv").count()
        mx = sizes.agg(F.max("count")).collect()[0][0]
        for cap in (None, 4096):
            t0 = time.time()
            out = hamming_k_neighbor_join(fps, "fp", bits, k, max_bucket=cap)
            n_pairs = out.count()
            dt = time.time() - t0
            print(
                f"A n={n} hot={n_hot} max_bucket_size={mx} cap={cap}: "
                f"pairs={n_pairs} wall={dt:.1f}s",
                flush=True,
            )
        spark.catalog.clearCache()


def part_b(spark) -> None:
    from bigdata_imgprocessing_spark.queries import QUERIES

    names = [
        "kaplan_meier_churn", "benford_amount_audit",
        "mannwhitney_price_shift", "ols_revenue_trend",
        "decontam_store_prefilter",
    ]
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        d = f"/root/testdata/{sf}"
        for n in names:
            spark.catalog.clearCache()
            t0 = time.time()
            cnt = QUERIES[n](spark, d).count()
            print(f"B {sf} {n}: rows={cnt} wall={time.time()-t0:.2f}s",
                  flush=True)


def main() -> None:
    spark = build_session("scale-r11")
    spark.sparkContext.setLogLevel("ERROR")
    part_a(spark)
    part_b(spark)
    spark.stop()


if __name__ == "__main__":
    main()
