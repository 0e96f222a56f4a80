#!/usr/bin/env python
"""Round-7 scale evidence (SCALING.md): time the round-7 surface at
base sf0.1 and at the existing scaled corpora (10× docs with planted
near-dups, 100× facts, 10× embeddings). Prints a markdown table per
corpus family. Reuses the corpora the earlier stress runs built
(tools_scale_stress.py / tools_scale_rel.py rebuild them if missing).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bigdata_imgprocessing_spark.core.session import build_session
from bigdata_imgprocessing_spark.queries import QUERIES

DOC_QUERIES = ["label_prop_communities", "kll_quantile_drift",
               "lsh_incremental_pairs"]
FACT_QUERIES = ["equidepth_price_buckets"]
EMB_QUERIES = ["pq_ann_recall"]

BASE = "/root/testdata/sf0.1"
DOCS10 = "/tmp/bdip_scale_10x"
REL100 = "/tmp/bdip_scale_rel_100x"
EMB10 = "/tmp/bdip_scale_emb_10x"


def _time(spark, name: str, sf_dir: str) -> tuple[float, int]:
    spark.catalog.clearCache()
    t0 = time.perf_counter()
    n = QUERIES[name](spark, sf_dir).count()
    return time.perf_counter() - t0, n


def main() -> None:
    spark = build_session("scale-r7")
    spark.sparkContext.setLogLevel("ERROR")
    for title, names, scaled in (
        ("10x documents", DOC_QUERIES, DOCS10),
        ("100x facts", FACT_QUERIES, REL100),
        ("10x embeddings", EMB_QUERIES, EMB10),
    ):
        if not os.path.isdir(scaled):
            print(f"SKIP {title}: {scaled} missing — run the "
                  "tools_scale_stress/rel builder first")
            continue
        print(f"\n### round-7 queries @ {title}\n")
        print("| query | sf0.1 | scaled | time ratio |")
        print("|---|---|---|---|")
        for name in names:
            tb, _ = _time(spark, name, BASE)
            ts, n = _time(spark, name, scaled)
            print(f"| `{name}` | {tb:.2f}s | {ts:.2f}s "
                  f"| {ts / tb:.1f}x (rows={n}) |")
    spark.stop()


if __name__ == "__main__":
    main()
