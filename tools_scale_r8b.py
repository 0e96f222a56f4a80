#!/usr/bin/env python
"""Round-8 (late) scale evidence: the two graph-family additions —
`kcore_neardup` and `component_safe_split` — at base sf0.1 vs the 10x
documents corpus with planted near-dups (/tmp/bdip_scale_10x, built by
tools_scale_stress.py). Both ride the shared LSH pair pipeline, so the
question each measurement answers is whether the GRAPH stage added on
top (fixed-round peeling / closure + split labeling) stays graph-sized
as the corpus grows. Prints a markdown table for SCALING.md."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bigdata_imgprocessing_spark.core.session import build_session
from bigdata_imgprocessing_spark.queries import QUERIES

BASE = "/root/testdata/sf0.1"
DOCS10 = "/tmp/bdip_scale_10x"


def _time(spark, name: str, sf_dir: str) -> tuple[float, int]:
    spark.catalog.clearCache()
    t0 = time.perf_counter()
    n = QUERIES[name](spark, sf_dir).count()
    return time.perf_counter() - t0, n


def main() -> None:
    spark = build_session("scale-r8b")
    spark.sparkContext.setLogLevel("ERROR")
    # warm: charge plan-compile/JIT to a throwaway run
    _time(spark, "kcore_neardup", "/root/testdata/sf0.01")
    print("| query | sf0.1 | 10x docs | time ratio |")
    print("|---|---|---|---|")
    for name in ("kcore_neardup", "component_safe_split"):
        if not os.path.isdir(DOCS10):
            print(f"| `{name}` | — | SKIP ({DOCS10} missing) | — |")
            continue
        tb, _ = _time(spark, name, BASE)
        ts, n = _time(spark, name, DOCS10)
        print(f"| `{name}` | {tb:.2f}s | {ts:.2f}s | {ts / tb:.1f}x "
              f"(rows={n}) |")
    spark.stop()


if __name__ == "__main__":
    main()
