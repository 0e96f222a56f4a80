#!/usr/bin/env python
"""Round-15 scale stress: the streaming IVF assignment ingest
(streaming/ivf_ingest.py) at corpus scale — VERDICT r14 item 5's
linearity measurement.

Part A drains n synthetic embedded vectors (dim 64, k=64 codebook
cells) in 4 waves through the REAL `run_ivf_assign_ingest` path. The
corpus plants a distribution shift: waves 0-2 draw labels uniformly
over all 64 cells, wave 3 concentrates on 8 cells — so the landed
`occ_drift_e6` must SPIKE on the final wave (the stale-codebook signal
the operator exists to raise), while waves 1-2 stay near the uniform
baseline. Confirms drain-wall linearity in n and that the drift
detector fires at scale, not just on the 5-vector planted test.

Usage: python tools_scale_r15.py [n ...]   (default: 250000 1000000)
Writes per-case lines; summarize into SCALING.md.
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from bigdata_imgprocessing_spark.core.session import build_session

DIM = 64
K = 64


def _stage_emb_feed(spark, n: int, root: str) -> str:
    """4 mtime-ordered wave files of deterministic clustered embeddings:
    label = hash-uniform over K cells on waves 0-2 but over K/8 cells on
    wave 3 (the planted shift); embedding = per-label offset + sin
    jitter, so nearest-centroid recovers the label structure."""
    feed = f"{root}/feed"
    if os.path.exists(f"{feed}/_STAGED"):
        return feed
    shutil.rmtree(feed, ignore_errors=True)
    os.makedirs(feed, exist_ok=True)
    base = (
        spark.range(n)
        .select(
            F.col("id").alias("vec_id"),
            F.expr(
                f"CAST(CASE WHEN id % 4 = 3 THEN pmod(xxhash64(id), {K // 8})"
                f" ELSE pmod(xxhash64(id), {K}) END AS INT)"
            ).alias("label"),
        )
        .withColumn(
            "embedding",
            F.expr(
                f"transform(sequence(0, {DIM - 1}), i ->"
                " CAST(label * 3 + sin((vec_id + 1) * (i + 1)) AS FLOAT))"
            ),
        )
    )
    t0 = 1_700_000_000
    for w in range(4):
        tmp = f"{root}/stage_w{w}"
        base.where(F.col("vec_id") % 4 == w).coalesce(1).write.mode(
            "overwrite"
        ).parquet(tmp)
        src = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
        dst = f"{feed}/{w}_wave.parquet"
        shutil.copyfile(f"{tmp}/{src}", dst)
        os.utime(dst, (t0 + 60 * w,) * 2)
        shutil.rmtree(tmp, ignore_errors=True)
    open(f"{feed}/_STAGED", "w").close()
    return feed


def part_a(spark, ns=(250_000, 1_000_000)):
    from bigdata_imgprocessing_spark.streaming.ivf_ingest import (
        read_stats,
        run_ivf_assign_ingest,
        write_codebook,
    )

    for n in ns:
        root = f"/tmp/scale15a_{n}"
        feed = _stage_emb_feed(spark, n, root)
        state = f"{root}/state"
        shutil.rmtree(state, ignore_errors=True)
        corpus = spark.read.schema(
            "vec_id bigint, label int, embedding array<float>"
        ).parquet(feed)
        t0 = time.time()
        write_codebook(corpus, state)
        cb_wall = time.time() - t0
        s = (
            spark.readStream.schema(
                "vec_id bigint, label int, embedding array<float>"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(feed)
        )
        t0 = time.time()
        run_ivf_assign_ingest(s, state)
        drain = time.time() - t0
        rows = {r.wave: r for r in read_stats(spark, state).collect()}
        tot = sum(r.n_vecs for r in rows.values())
        drifts = {w: rows[w].occ_drift_e6 for w in sorted(rows)}
        print(
            f"A ivf ingest n={n}: codebook={cb_wall:.1f}s "
            f"drain_wall={drain:.1f}s vecs={tot} "
            f"cells_w0={rows[0].n_cells} drift_e6={drifts}",
            flush=True,
        )
        assert tot == n
        # the planted wave-3 shift must dominate the steady waves
        assert drifts[3] > 3 * max(drifts[1], drifts[2], 1)
        for p in (feed, state, root):
            shutil.rmtree(p, ignore_errors=True)
        spark.catalog.clearCache()


def main():
    ns = tuple(int(a) for a in sys.argv[1:]) or (250_000, 1_000_000)
    spark = build_session("scale-r15")
    spark.sparkContext.setLogLevel("ERROR")
    part_a(spark, ns)
    spark.stop()


if __name__ == "__main__":
    main()
