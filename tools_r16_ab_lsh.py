#!/usr/bin/env python
"""Interleaved A/B for the r16 streaming_lsh_ingest_capped wave diet.

Alternates the OLD (bands barrier -> acct barrier -> pairs||shingles,
3 waves/batch) and NEW (acct barrier -> bands||pairs||shingles,
2 waves/batch) drain structures inside ONE SparkSession, fresh state
root per run, cache-clear + GC between runs (bench methodology).
Also records the Spark job count per drain via the status tracker.
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from bigdata_imgprocessing_spark.core.session import build_session

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def drain(spark, variant: str, state: str) -> float:
    """One full capped drain + final read, timed; returns wall sec."""
    import bigdata_imgprocessing_spark.streaming.lsh_ingest as L
    from bigdata_imgprocessing_spark.core.catalog import table

    os.environ["LSH_AB_VARIANT"] = variant
    shutil.rmtree(state, ignore_errors=True)
    docs = table(spark, SF_DIR, "documents").select("doc_id", "text")
    # reuse the staged feed from the bench run (marker-idempotent)
    from bigdata_imgprocessing_spark.queries.streaming_queries import (
        _fingerprinted_tmp,
        _stage_feed,
    )

    root = _fingerprinted_tmp(SF_DIR, "bdip_lshcap", src="documents")
    feed = _stage_feed(
        root,
        [(f"wave{i}", docs.where(F.col("doc_id") % 4 == i)) for i in range(4)],
    )
    schema = spark.read.parquet(feed).schema
    t0 = time.perf_counter()
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(feed)
    )
    L.run_lsh_ingest(stream, state, max_bucket=2)
    pairs = L.read_final_pairs(spark, state)
    acct = L.read_acct(spark, state)
    pe = pairs.groupBy("wave").agg(
        F.count("*").alias("p_n"),
        F.sum("inter").cast("bigint").alias("p_i"),
        F.sum("uni").cast("bigint").alias("p_u"),
    )
    waves = spark.range(4).select(F.col("id").alias("wave"))
    out = (
        waves.join(pe, "wave", "left")
        .join(acct, "wave", "left")
        .select(
            "wave",
            F.coalesce("p_n", F.lit(0)).cast("bigint").alias("n_pairs"),
            F.coalesce("p_i", F.lit(0)).cast("bigint").alias("sum_inter"),
            F.coalesce("p_u", F.lit(0)).cast("bigint").alias("sum_uni"),
            F.coalesce("n_buckets_cut", F.lit(0))
            .cast("bigint")
            .alias("n_buckets_cut"),
            F.coalesce("n_band_rows_cut", F.lit(0))
            .cast("bigint")
            .alias("n_band_rows_cut"),
        )
    )
    out.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> None:
    import bigdata_imgprocessing_spark.streaming.lsh_ingest as L

    new_run = L.run_lsh_ingest

    # OLD structure: re-exec the pre-change module source from git
    # (relative imports resolve via __package__)
    ref = os.environ.get("LSH_AB_OLD_REF", "HEAD")
    old_src = os.popen(
        f"git -C {os.path.dirname(os.path.abspath(__file__))} show "
        f"{ref}:bigdata_imgprocessing_spark/streaming/lsh_ingest.py"
    ).read()
    old_ns = {
        "__name__": "bigdata_imgprocessing_spark.streaming.lsh_ingest_old",
        "__package__": "bigdata_imgprocessing_spark.streaming",
    }
    exec(compile(old_src, "lsh_ingest_old.py", "exec"), old_ns)
    old_run = old_ns["run_lsh_ingest"]

    spark = build_session("r16-ab-lsh")
    spark.sparkContext.setLogLevel("ERROR")
    # warmup (bench.py methodology)
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    li.groupBy("l_returnflag").count().collect()

    n = int(os.environ.get("AB_REPEATS", "4"))
    res = {"old": [], "new": []}
    st = spark.sparkContext.statusTracker()
    for i in range(n):
        for tag, fn in (("old", old_run), ("new", new_run)):
            L.run_lsh_ingest = fn
            j0 = st.getJobIdsForGroup(None)
            t = drain(spark, tag, f"/tmp/r16_ab_lsh_{tag}/state")
            res[tag].append(t)
            spark.catalog.clearCache()
            spark.sparkContext._jvm.System.gc()
            print(
                f"rep {i} {tag}: {t:6.2f}s load {os.getloadavg()[0]:.2f}",
                flush=True,
            )
    L.run_lsh_ingest = new_run
    for tag in ("old", "new"):
        print(
            f"{tag}: min {min(res[tag]):.2f}  walls "
            + " ".join(f"{x:.2f}" for x in res[tag])
        )
    spark.stop()


if __name__ == "__main__":
    main()
