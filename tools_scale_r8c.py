#!/usr/bin/env python
"""Round-8 (third pass) scale evidence: the late additions —
`hyperball_reach` / `sorted_neighbor_lcp` at base sf0.1 vs the 10x
documents corpus with planted near-dups (/tmp/bdip_scale_10x), and
`dim_truncation_recall` vs the 10x embeddings corpus
(/tmp/bdip_scale_emb_10x). hyperball rides the shared LSH pipeline —
the question is whether the per-round sketch-union + exact-expansion
stages stay graph-sized; sorted_neighbor_lcp is one blocked sort —
expected ~linear; dim_truncation scores map-side off a broadcast query
frame — expected ~linear in corpus vectors. Prints a markdown table
for SCALING.md."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bigdata_imgprocessing_spark.core.session import build_session
from bigdata_imgprocessing_spark.queries import QUERIES

BASE = "/root/testdata/sf0.1"
DOCS10 = "/tmp/bdip_scale_10x"
EMB10 = "/tmp/bdip_scale_emb_10x"


def _time(spark, name: str, sf_dir: str) -> tuple[float, int]:
    spark.catalog.clearCache()
    t0 = time.perf_counter()
    n = QUERIES[name](spark, sf_dir).count()
    return time.perf_counter() - t0, n


def main() -> None:
    spark = build_session("scale-r8c")
    spark.sparkContext.setLogLevel("ERROR")
    # warm: charge plan-compile/JIT to a throwaway run
    _time(spark, "sorted_neighbor_lcp", "/root/testdata/sf0.01")
    print("| query | sf0.1 | 10x | time ratio |")
    print("|---|---|---|---|")
    for name, scaled in (
        ("hyperball_reach", DOCS10),
        ("sorted_neighbor_lcp", DOCS10),
        ("dim_truncation_recall", EMB10),
    ):
        if not os.path.isdir(scaled):
            print(f"| `{name}` | — | SKIP ({scaled} missing) | — |")
            continue
        tb, _ = _time(spark, name, BASE)
        ts, n = _time(spark, name, scaled)
        print(f"| `{name}` | {tb:.2f}s | {ts:.2f}s | {ts / tb:.1f}x "
              f"(rows={n}) |")
    spark.stop()


if __name__ == "__main__":
    main()
