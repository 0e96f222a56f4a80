#!/usr/bin/env python
"""Round-8 scale evidence (SCALING.md): time the round-8 surface at
base sf0.1 and at the scaled corpora the earlier stress runs built —
`equidepth_approx_audit` at 100x facts (orders), `image_format_ingest`
(with the r8 textured/lossless/CMYK/partial slots) at 10x embeddings.
Prints a markdown table. Missing corpora: run tools_scale_stress.py /
tools_scale_rel.py first."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bigdata_imgprocessing_spark.core.session import build_session
from bigdata_imgprocessing_spark.queries import QUERIES

BASE = "/root/testdata/sf0.1"
REL100 = "/tmp/bdip_scale_rel_100x"
EMB10 = "/tmp/bdip_scale_emb_10x"


def _time(spark, name: str, sf_dir: str) -> tuple[float, int]:
    spark.catalog.clearCache()
    t0 = time.perf_counter()
    n = QUERIES[name](spark, sf_dir).count()
    return time.perf_counter() - t0, n


def main() -> None:
    spark = build_session("scale-r8")
    spark.sparkContext.setLogLevel("ERROR")
    # warm: charge plan-compile/JIT to a throwaway run
    _time(spark, "equidepth_approx_audit", "/root/testdata/sf0.01")
    print("| query | sf0.1 | scaled corpus | time ratio |")
    print("|---|---|---|---|")
    for name, scaled, label in (
        ("equidepth_approx_audit", REL100, "100x facts"),
        ("image_format_ingest", EMB10, "10x embeddings"),
    ):
        if not os.path.isdir(scaled):
            print(f"| `{name}` | — | SKIP ({scaled} missing) | — |")
            continue
        tb, _ = _time(spark, name, BASE)
        ts, n = _time(spark, name, scaled)
        print(f"| `{name}` | {tb:.2f}s | {ts:.2f}s @ {label} "
              f"| {ts / tb:.1f}x (rows={n}) |")
    spark.stop()


if __name__ == "__main__":
    main()
