#!/usr/bin/env python
"""One-off dedup/LSH scale-stress runner (SCALING.md evidence).

Builds a ``factor``× documents corpus from $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) with planted near-dups under /tmp, runs the three
LSH-path queries against base and scaled corpora, and prints a markdown
table for SCALING.md plus planted-pair recall.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bigdata_imgprocessing_spark.core.session import build_session
from bigdata_imgprocessing_spark.pipelines.scale_stress import (
    build_scaled_documents,
    run_scale_stress,
)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    factor = int(os.environ.get("SCALE_FACTOR", "10"))
    out_dir = f"/tmp/bdip_scale_{factor}x"
    spark = build_session("scale-stress")
    spark.sparkContext.setLogLevel("ERROR")

    base_metrics = run_scale_stress(spark, sf_dir)
    planted = build_scaled_documents(
        spark, sf_dir, out_dir, factor=factor, plant_every=10, mutate_every=25
    )
    scaled_metrics = run_scale_stress(spark, out_dir)

    from bigdata_imgprocessing_spark.queries.dedup import minhash_lsh_pairs

    found = {
        (r.doc_a, r.doc_b)
        for r in minhash_lsh_pairs(spark, out_dir).collect()
    }
    recall = len(found & set(planted)) / len(planted)

    print(f"\n| query | base ({sf_dir}) | scaled ({factor}x + planted) |")
    print("|---|---|---|")
    for name in base_metrics:
        b, s = base_metrics[name], scaled_metrics[name]
        bx = ", ".join(f"{k}={v}" for k, v in b.items())
        sx = ", ".join(f"{k}={v}" for k, v in s.items())
        print(f"| {name} | {bx} | {sx} |")
    print(f"\nplanted pairs: {len(planted)}; recall of planted: {recall:.3f}")
    spark.stop()


if __name__ == "__main__":
    main()
