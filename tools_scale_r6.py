#!/usr/bin/env python
"""Round-6 scale evidence (SCALING.md): time the new analytics surface
at base sf0.1 and at the existing 10× scaled corpora
(/tmp/bdip_scale_10x documents with planted near-dups,
/tmp/bdip_scale_rel_10x facts = sf1-equivalent orders/lineitem/events).
Prints a markdown table per corpus family.

Reuses the corpora the round-5 stress runs built; rebuilds them if the
dirs are missing (tools_scale_stress.py / tools_scale_rel.py logic).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bigdata_imgprocessing_spark.core.session import build_session
from bigdata_imgprocessing_spark.queries import QUERIES

DOC_QUERIES = [
    "ngram_containment_hist",
    "weighted_doc_sample",
    "chi2_lang_source",
    "ks_score_drift",
    "collation_group_names",
    "bpe_apply_stats",
    "pair_rouge_stats",
    "minhash_estimate_error",
]
FACT_QUERIES = [
    "bitmap_distinct_users",
    "m4_downsample",
    "cusum_changepoint",
    "pareto_front_orders",
    "gini_revenue_concentration",
    "rfm_segmentation",
    "interval_merge_coverage",
    "listagg_order_lines",
    "mode_per_group",
    "freq_event_pairs",
    "session_funnel_stats",
]
EMB_QUERIES = ["mmr_diverse_topk"]  # needs the scaled embeddings corpus


def _time(spark, name: str, sf_dir: str) -> tuple[float, int]:
    spark.catalog.clearCache()
    t0 = time.perf_counter()
    n = len(QUERIES[name](spark, sf_dir).collect())
    return round(time.perf_counter() - t0, 2), n


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    docs10 = "/tmp/bdip_scale_10x"
    rel10 = "/tmp/bdip_scale_rel_10x"
    spark = build_session("scale-r6")
    spark.sparkContext.setLogLevel("ERROR")

    if not os.path.exists(os.path.join(docs10, "documents.parquet")):
        from bigdata_imgprocessing_spark.pipelines.scale_stress import (
            build_scaled_documents,
        )

        build_scaled_documents(spark, sf_dir, docs10, factor=10,
                               plant_every=10, mutate_every=25)
    if not os.path.exists(os.path.join(rel10, "orders.parquet")):
        from bigdata_imgprocessing_spark.pipelines.scale_stress import (
            build_scaled_facts,
        )

        build_scaled_facts(spark, sf_dir, rel10, factor=10)
    emb10 = "/tmp/bdip_scale_emb_10x"
    if not os.path.exists(os.path.join(emb10, "embeddings.parquet")):
        from bigdata_imgprocessing_spark.pipelines.scale_stress import (
            build_scaled_embeddings,
        )

        build_scaled_embeddings(spark, sf_dir, emb10, factor=10)

    for label, names, scaled in (
        ("documents 10x", DOC_QUERIES, docs10),
        ("facts 10x (sf1-equivalent)", FACT_QUERIES, rel10),
        ("embeddings 10x", EMB_QUERIES, emb10),
    ):
        print(f"\n== {label} ==", flush=True)
        print("| query | base secs | base rows | 10x secs | 10x rows | ratio |")
        print("|---|---|---|---|---|---|")
        for name in names:
            bs, bn = _time(spark, name, sf_dir)
            ss, sn = _time(spark, name, scaled)
            ratio = round(ss / bs, 1) if bs > 0 else float("inf")
            print(f"| {name} | {bs} | {bn} | {ss} | {sn} | {ratio}x |",
                  flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
