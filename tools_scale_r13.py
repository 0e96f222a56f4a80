#!/usr/bin/env python
"""Round-13 scale stress: the hot-bucket residue and the capped
streaming probe, two decades past driver sf.

Three parts (VERDICT r12 items 1, 3, 4):

A. The representative pass at 10M docs (item 4): r12 measured
   `hot_bucket_rep_dedup`'s discipline at 1M syndicated (58,407
   comparisons, 16.0 s); the 10M syndicated corpus has ONE
   138,953-deep bucket per band, so part A confirms the claimed
   Σ(k-1) LINEARITY of the member/verify volume where the pairwise
   equivalent is ~4e10.

B. The PRODUCTION capped-dedup queries at a staged 1M corpus
   (item 1 done-criterion): `minhash_lsh_capped` and
   `hot_bucket_rep_dedup` run against a synthetic documents.parquet
   through their real code path — after the r13 width changes the
   candidate/member/shingle-set CACHES carry cache_parallelism-derived
   widths (the verify join spreads over the full core count instead of
   serializing onto 4 tasks) and the landed stores are VOLUME-sized
   (rows/~500k per file, floor 8: a fixed core-count width was
   measured regressing every repeat-reader at sf0.1 — see
   _fingerprinted_store). The landed store's file count is the
   on-disk proof of the write width.

C. The capped STREAMING probe under the syndicated cohort (item 3
   done-criterion): the cohort streamed in over 4 waves makes every
   later batch's uncapped probe quadratic in the hot bucket;
   max_bucket=64 keeps each batch's probe bounded by arrivals x cap.
   Measured uncapped-vs-capped at 200k (where uncapped is still
   feasible) and capped-only at 1M (where it is not), with the
   per-drain candidate volume and cut accounting.

Corpus: the deterministic generator from tools_scale_r12 (1% planted
near-dup pairs; heavy mode adds the 2% shared-30-token-prefix
syndicated cohort).

Usage: python tools_scale_r13.py [A|B|C ...]   (default: all)
Writes per-case lines; summarize into SCALING.md.
"""

from __future__ import annotations

import glob
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from bigdata_imgprocessing_spark.core.session import build_session
from tools_scale_r12 import corpus, run_rep_dedup


def part_a(spark):
    """Representative pass at 10M syndicated — Σ(k-1) linearity."""
    run_rep_dedup(spark, 10_000_000)


def _stage_docs(spark, n: int, root: str) -> str:
    """Land a synthetic documents.parquet (doc_id, text, lang) so the
    PRODUCTION queries (which read sf_dir/documents.parquet through
    the catalog) run their real code path on it."""
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root, exist_ok=True)
    docs = corpus(spark, n, heavy=True).withColumn(
        "lang", F.expr("element_at(array('en','de','fr'), cast(doc_id % 3 as int) + 1)")
    )
    # single-directory parquet named like the catalog expects
    tmp = f"{root}/_docs_dir"
    docs.write.mode("overwrite").parquet(tmp)
    os.rename(tmp, f"{root}/documents.parquet")
    return root


def part_b(spark, n: int = 1_000_000):
    """Production capped queries at a staged 1M corpus + width audit."""
    from bigdata_imgprocessing_spark.core.session import scaled_width
    from bigdata_imgprocessing_spark.queries import QUERIES

    root = "/tmp/scale13_docs"
    _stage_docs(spark, n, root)
    print(f"B staged corpus n={n} at {root} "
          f"(scaled_width={scaled_width(spark)})", flush=True)
    for name in ("minhash_lsh_capped", "hot_bucket_rep_dedup"):
        t0 = time.time()
        rows = QUERIES[name](spark, root).collect()
        dt = time.time() - t0
        print(f"B {name} n={n}: wall={dt:.1f}s rows={len(rows)}", flush=True)
        spark.catalog.clearCache()
    stores = sorted(glob.glob("/tmp/bdip_bands_*"), key=os.path.getmtime)
    nfiles = len(glob.glob(f"{stores[-1]}/part-*"))
    print(f"B bands store {os.path.basename(stores[-1])}: {nfiles} part "
          f"files (volume-sized landing width — fixed 8 before r13)",
          flush=True)


def _stage_feed(spark, n: int, root: str, waves: int = 4) -> str:
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root, exist_ok=True)
    docs = corpus(spark, n, heavy=True)
    for w in range(waves):
        # one file per wave so maxFilesPerTrigger=1 = one wave per batch
        dst = f"{root}/w{w}.parquet.dir"
        docs.where(F.col("doc_id") % waves == w).coalesce(1).write.mode(
            "overwrite"
        ).parquet(dst)
        one = glob.glob(f"{dst}/part-*.parquet")[0]
        final = f"{root}/wave{w}.parquet"
        shutil.move(one, final)
        shutil.rmtree(dst)
        os.utime(final, (1_700_000_000 + 60 * w,) * 2)
    return root


def part_c(spark, ns=(200_000, 1_000_000), cap: int = 64):
    """Streamed syndicated cohort: uncapped vs capped drain cost."""
    from bigdata_imgprocessing_spark.streaming.lsh_ingest import (
        read_acct,
        read_final_pairs,
        run_lsh_ingest,
    )

    for n in ns:
        feed = _stage_feed(spark, n, f"/tmp/scale13_feed_{n}")
        modes = [cap] if n > 200_000 else [None, cap]
        for mb in modes:
            state = f"/tmp/scale13_state_{n}_{mb}"
            shutil.rmtree(state, ignore_errors=True)
            s = (
                spark.readStream.schema("doc_id bigint, text string")
                .option("maxFilesPerTrigger", 1)
                .parquet(feed)
            )
            t0 = time.time()
            run_lsh_ingest(s, state, max_bucket=mb)
            dt = time.time() - t0
            n_pairs = read_final_pairs(spark, state).count()
            acct = read_acct(spark, state).agg(
                F.sum("n_buckets_cut"), F.sum("n_band_rows_cut")
            ).collect()[0]
            print(
                f"C stream n={n} max_bucket={mb}: drain_wall={dt:.1f}s "
                f"pairs={n_pairs} cut_buckets={acct[0]} "
                f"cut_band_rows={acct[1]}",
                flush=True,
            )
            shutil.rmtree(state, ignore_errors=True)
            spark.catalog.clearCache()
        shutil.rmtree(feed, ignore_errors=True)


def main():
    parts = [p.upper() for p in sys.argv[1:]] or ["A", "B", "C"]
    spark = build_session("scale-r13")
    spark.sparkContext.setLogLevel("ERROR")
    if "A" in parts:
        part_a(spark)
    if "B" in parts:
        part_b(spark)
    if "C" in parts:
        part_c(spark)
    spark.stop()


if __name__ == "__main__":
    main()
