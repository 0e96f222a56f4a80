#!/usr/bin/env python
"""Relational-side scale stress: 10× fact tables (sf1-equivalent
lineitem/orders/events, dims unchanged) through the heavy relational /
window / as-of / streaming-batch headline queries. Records wall time
base vs scaled for SCALING.md — the evidence that the TPC-H-ish plans
(star joins, window funnels, as-of union-merge) grow linearly, not
quadratically, when facts grow and dims don't."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bigdata_imgprocessing_spark.core.session import build_session
from bigdata_imgprocessing_spark.pipelines.scale_stress import build_scaled_facts
from bigdata_imgprocessing_spark.queries import QUERIES

PICKS = [
    "pricing_summary",
    "top_orders",
    "region_revenue",
    "market_share_by_year",
    "window_topk_orders",
    "outlier_order_stats",
    "asof_purchase_click",
    "session_windows",
    "sliding_distinct_users",
    "event_histogram",
    "merge_into_orders",
    "cogroup_order_fill",
    "grouped_agg_udaf",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    factor = int(os.environ.get("SCALE_FACTOR", "10"))
    out = f"/tmp/bdip_scale_rel_{factor}x"
    spark = build_session("scale-rel")
    spark.sparkContext.setLogLevel("ERROR")
    if not os.path.exists(os.path.join(out, "lineitem.parquet")):
        t0 = time.perf_counter()
        build_scaled_facts(spark, sf_dir, out, factor=factor)
        print(f"built {factor}x facts in {round(time.perf_counter()-t0,1)}s",
              flush=True)
    for name in PICKS:
        row = [name]
        for d in (sf_dir, out):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            QUERIES[name](spark, d).write.format("noop").mode("overwrite").save()
            row.append(f"{round(time.perf_counter()-t0, 2)}s")
        print(f"| {row[0]} | {row[1]} | {row[2]} |", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
