"""Streaming paragraph-dedup-at-ingest: the CCNet paragraph-hash scan
(`paragraph_dedup_stats`, queries/dedup.py) as a CONTINUOUS curation
loop. Documents arrive in waves; each micro-batch splits its arrivals
into fixed 8-word units, checks the unit hashes against the ACCUMULATED
seen-unit store (every earlier wave's first occurrences), counts how
many of the batch's unit instances are boilerplate already seen (or
repeated within the batch itself — first occurrence wins either way),
and lands ONLY the genuinely new distinct unit hashes as the store
extension for subsequent waves.

Per-batch cost is arrivals-sized: the probe is one equi-semi-shaped
left join of the batch's DISTINCT unit hashes against the store (8-byte
keys), the accumulated store is never self-joined, and — unlike the
LSH/simhash ingests — no verification stage exists (exact hash equality
IS the verdict), so counts fold map-side and the per-batch stats row is
one crossJoin of two 1-row aggregates.

Batch replays are idempotent by the same three invariants as
streaming/lsh_ingest.py: mode=overwrite into per-batch-id subdirs,
state reads filtered to STRICTLY-earlier batch ids
(batchstate.prior_batch_dirs), and deterministic per-batch recompute.
The store extension lands batch-distinct-minus-prior, so the unit
dirs are DISJOINT by construction and readers never need a distinct.

Reference parity: the reference has no streaming engine — this extends
the paragraph-dedup surface the same way streaming/lsh_ingest.py
extends minhash LSH (same module contract as the other streaming/
jobs).
"""

from __future__ import annotations

import glob

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _units(batch: DataFrame) -> DataFrame:
    """(doc_id, chunk_no, h) unit-hash instances of a (doc_id, text)
    frame — IMPORTS the batch query's unit expression
    (queries/dedup.py:_para_units_sql, the lsh_ingest convention of
    sharing the derivation with its batch twin) so the streaming and
    batch semantics cannot drift apart."""
    from ..queries.dedup import _para_units_sql

    return batch.select(
        "doc_id",
        F.posexplode(
            F.expr(_para_units_sql("split(text, ' ')"))
        ).alias("chunk_no", "h"),
    )


def run_paragraph_ingest(stream_df: DataFrame, state_root: str) -> None:
    """Drain a (doc_id, text) stream with availableNow, maintaining the
    seen-unit store under ``state_root/units`` and one per-wave stats
    row under ``state_root/stats``."""
    from .batchstate import prior_batch_dirs

    def step(batch: DataFrame, bid: int) -> None:
        # no isEmpty() guard: one Spark job per batch saved; an empty
        # batch overwrites its subdirs with empty frames, harmless
        spark = batch.sparkSession
        ch = _units(batch).coalesce(4).cache()
        prior = prior_batch_dirs(state_root, "units", bid)
        # explicit schema: fixed layout, skip per-batch footer
        # inference (the r12 lsh_ingest rule). Prior dirs are disjoint
        # (each lands only its NEW hashes), so no distinct on read.
        seen = (
            spark.read.schema("h bigint").parquet(*prior)
            if prior
            else spark.createDataFrame([], "h bigint")
        )
        bd = (
            ch.select("h")
            .distinct()
            .join(seen.withColumn("seen", F.lit(True)), "h", "left")
            .coalesce(4)
            .cache()
        )
        new_units = bd.where(F.col("seen").isNull()).select("h")
        # the units write doubles as the cache materialization barrier
        # for bd (and, through its lineage, ch) — the stats write then
        # reads both caches warm (the lsh_ingest bands-barrier rule)
        new_units.write.mode("overwrite").parquet(
            f"{state_root}/units/b{bid}"
        )
        inst = ch.agg(
            F.count("*").cast("bigint").alias("n_units"),
            F.count_distinct("doc_id").cast("bigint").alias("n_docs"),
        )
        dis = bd.agg(
            F.count("*").cast("bigint").alias("n_distinct"),
            F.coalesce(F.sum(F.col("seen").cast("long")), F.lit(0))
            .cast("bigint")
            .alias("n_seen"),
        )
        (
            inst.crossJoin(dis)
            .select(
                F.lit(bid).cast("bigint").alias("wave"),
                "n_docs",
                "n_units",
                # dup instances = all instances minus the first
                # occurrences of genuinely-new hashes
                (
                    F.col("n_units")
                    - (F.col("n_distinct") - F.col("n_seen"))
                ).alias("n_dup_units"),
                (F.col("n_distinct") - F.col("n_seen")).alias("n_new_units"),
            )
            .write.mode("overwrite")
            .parquet(f"{state_root}/stats/b{bid}")
        )
        bd.unpersist()
        ch.unpersist()

    (
        stream_df.writeStream.foreachBatch(step)
        .option("checkpointLocation", f"{state_root}/ckpt")
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def read_stats(spark: SparkSession, state_root: str) -> DataFrame:
    """One (wave, n_docs, n_units, n_dup_units, n_new_units) row per
    drained micro-batch."""
    dirs = sorted(glob.glob(f"{state_root}/stats/b*"))
    if not dirs:
        return spark.createDataFrame(
            [],
            "wave bigint, n_docs bigint, n_units bigint,"
            " n_dup_units bigint, n_new_units bigint",
        )
    return spark.read.parquet(*dirs)


def n_store_versions(state_root: str) -> int:
    """How many micro-batches extended the seen-unit store — the
    multi-batch-exercised assertion hook."""
    import os

    return len(glob.glob(os.path.join(state_root, "units", "b*")))
