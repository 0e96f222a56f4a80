#!/usr/bin/env python
"""Round-5 third-pass scale-stress runner (SCALING.md evidence).

Doc corpus: PageRank + BPE growth at 10x/100x (reusing the planted
near-dup builder). Embedding corpus: SemDeDup prune cost at 10x/30x
under fixed k=10 cells vs k ~ sqrt(N) — measuring the quadratic-bound
claim instead of asserting it.
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bigdata_imgprocessing_spark.core.session import build_session
from bigdata_imgprocessing_spark.pipelines.scale_stress import (
    build_scaled_documents,
    build_scaled_embeddings,
    run_scale_stress_r5c,
    run_semdedup_scale,
)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = build_session("scale-stress-r5c")
    spark.sparkContext.setLogLevel("ERROR")

    print("== document-corpus growth (pagerank, bpe) ==", flush=True)
    rows = {"base": run_scale_stress_r5c(spark, sf_dir)}
    for factor in (10, 100):
        out = f"/tmp/bdip_scale_{factor}x"
        if not os.path.exists(os.path.join(out, "documents.parquet")):
            build_scaled_documents(spark, sf_dir, out, factor=factor,
                                   plant_every=10, mutate_every=25)
        spark.catalog.clearCache()
        rows[f"{factor}x"] = run_scale_stress_r5c(spark, out)
        print(f"done {factor}x", flush=True)
    for name in rows["base"]:
        print(f"| {name} | " + " | ".join(
            ", ".join(f"{k}={v}" for k, v in rows[s][name].items())
            for s in ("base", "10x", "100x")) + " |", flush=True)

    print("== embedding-corpus growth (semdedup fixed-k vs sqrt-N k) ==",
          flush=True)
    res = []
    for factor in (10, 30):
        out = f"/tmp/bdip_scale_emb_{factor}x"
        if not os.path.exists(os.path.join(out, "embeddings.parquet")):
            build_scaled_embeddings(spark, sf_dir, out, factor=factor)
        # count the scaled parquet itself (cheap metadata-only count) —
        # exact in both the fresh-build and skip-if-exists branches
        # (ADVICE r5: the old closed-form overstated N by base_n).
        n = spark.read.parquet(os.path.join(out, "embeddings.parquet")).count()
        # fixed k=10 measured at 10x only: its cost is ~N^2/10 and the
        # 30x run would be ~1h — the sqrt-N curve is the claim under test
        ks = (10, int(math.sqrt(n))) if factor == 10 else (int(math.sqrt(n)),)
        for k in ks:
            spark.catalog.clearCache()
            m = run_semdedup_scale(spark, out, k_cells=k)
            res.append((factor, m))
            print(f"| {factor}x | " + ", ".join(f"{k2}={v}" for k2, v in m.items()) + " |", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
