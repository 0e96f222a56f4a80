"""Streaming LSH dedup-at-ingest: the near-dup index maintained as a
STREAM of document arrivals — the continuous form of the batch
`lsh_incremental_pairs` query (queries/dedup.py), which proves the
new×old ∪ new×new probe shape for ONE daily batch; this module runs
that same shape per micro-batch against a persistent band index, so
however the arrival stream is sliced, every near-dup pair is
discovered exactly once, in the micro-batch where its LATER document
arrives.

Per micro-batch (foreachBatch):
  1. band-key + signature the batch documents (the SAME `_shingles` /
     `_minhash_signatures` / `_band_frame` definitions as the batch
     pipeline — the banding scheme cannot drift between deployment
     modes),
  2. probe: batch bands join the accumulated index ∪ batch bands —
     candidates are new×old ∪ new×new; the old×old space is NEVER
     rejoined (at 100 TB that is the entire point: the index is
     bucketed on (band, bkey), the probe side is arrivals-sized),
  3. verify exact Jaccard >= 0.5 on shingle sets semi-join-pruned to
     candidate ids (old docs' sets come from the persisted shingle
     store — no re-derivation from raw text),
  4. append the verified pairs (tagged with the discovering batch id)
     and the batch's bands/shingles to the state stores.

State layout under ``state_root``: ``bands/b{N}``, ``shingles/b{N}``,
``pairs/b{N}`` — one subdir per micro-batch. Replay idempotence rests
on three invariants: (i) every write is mode=overwrite into its own
batch-id subdir, (ii) a batch reads only STRICTLY-earlier batches'
state (numeric batch-id filter — a replayed batch must not probe its
own bands/shingles, or the duplicated set rows would duplicate its
verified pairs), and (iii) the per-batch derivation is deterministic,
so a replay overwrites each subdir with identical content. Because
(ii)+(iii) hold regardless of write order, the first synchronous
write per batch is whichever job's lineage materializes every
multiply-consumed cache (capped: the acct landing, whose census
lineage fills batch + new_bands + census; uncapped: the bands write),
and every remaining store write then runs CONCURRENTLY (driver
threads, one Spark job each) — per-batch wall is barrier +
max(remaining writes), two job waves, not the sum of four jobs,
which matters for a query whose cost is stage count,
not data volume (161 stages/drain, VERDICT r9; the r12 rewrite also
moved plan construction to F.expr strings and pinned explicit schemas
on the per-batch state reads).

Reference parity: the reference has no streaming engine — this is the
Structured Streaming extension of its dedup surface, same contract as
the other streaming/ modules.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _prior_state(state_root: str, store: str, bid: int) -> list[str]:
    """Strictly-earlier batch state dirs (the shared replay rule,
    streaming/batchstate.py)."""
    from .batchstate import prior_batch_dirs

    return prior_batch_dirs(state_root, store, bid)


def run_lsh_ingest(
    stream_df: DataFrame, state_root: str, max_bucket: int | None = None
) -> None:
    """Drain a (doc_id, text) stream with availableNow, maintaining the
    band index and discovered-pairs store under ``state_root``.

    ``max_bucket`` ports the batch census cutoff (`minhash_lsh_capped`,
    queries/dedup.py) into the per-batch probe: without it, a
    syndicated cohort that concentrates ~70% of its docs on one
    (band, bkey) per band (SCALING.md r12: 138,953-deep buckets at 10M
    docs) arriving OVER TIME makes every subsequent batch's probe join
    quadratic in the hot bucket. With it, each batch censuses only the
    buckets its arrivals TOUCH (a semi-join — the same rows the probe
    join would read anyway, as a count instead of a product), probes
    only buckets whose accumulated depth is within the cap, and lands
    (n_buckets_cut, n_band_rows_cut) accounting per batch under
    ``acct/b{N}`` — the signal that routes the hot residue to the
    representative pass (`hot_bucket_rep_dedup`) instead of pairwise
    enumeration. A pair is therefore discovered iff SOME shared band
    bucket is within the cap at the later doc's batch; the census is
    deterministic from strictly-earlier state + the batch, so the
    replay invariants hold unchanged."""
    from concurrent.futures import ThreadPoolExecutor

    from ..queries.dedup import (
            _band_frame,
            _minhash_signatures,
            _shingles_sql,
        )

    def step(batch: DataFrame, bid: int) -> None:
        # no isEmpty() guard: it costs one Spark job per batch, and an
        # empty batch just overwrites its subdirs with empty frames —
        # harmless to every reader (availableNow over a staged feed
        # does not emit empty batches in practice anyway)
        spark = batch.sparkSession
        batch = batch.coalesce(4).cache()
        new_bands = _band_frame(_minhash_signatures(batch)).coalesce(4).cache()
        new_sh = batch.select(
            "doc_id",
            F.expr(f"array_distinct({_shingles_sql('text')})").alias("ss"),
        )
        # Explicit schemas on the state reads: the store layouts are
        # fixed by this module, and schema inference re-reads parquet
        # footers on EVERY micro-batch otherwise (~100 ms/read of pure
        # listing+footer latency at steady state, paid twice per batch).
        old_b = _prior_state(state_root, "bands", bid)
        all_bands = (
            spark.read.schema("doc_id bigint, band int, bkey string")
            .parquet(*old_b)
            .union(new_bands)
            if old_b
            else new_bands
        )
        old_s = _prior_state(state_root, "shingles", bid)
        all_sh = (
            spark.read.schema("doc_id bigint, ss array<string>")
            .parquet(*old_s)
            .union(new_sh)
            if old_s
            else new_sh
        )
        census = None
        probe = new_bands
        if max_bucket is not None:
            # Census only the buckets this batch TOUCHES: the semi-join
            # (broadcast of the arrivals' keys — the index side never
            # shuffles) reads exactly the band rows the probe join
            # would read, folded to one count per bucket instead of an
            # arrivals x depth product. Restricting the PROBE side to
            # surviving buckets suffices for the cutoff: cut keys
            # simply vanish from the a-side of the equi-join. Cached
            # (touched-bucket-sized) because BOTH the pairs write and
            # the acct write consume it; the acct write runs first,
            # synchronously, as the cache barrier. Three structures
            # were measured at sf0.1 (4-wave drain): this one 12.8 s;
            # census-uncached + concurrent acct 19.0 s (the pairs job
            # re-derives the semi-join + groupBy inline and the probe
            # loses its broadcast shape); caching the touched rows as
            # the pair join's index side 14.2 s (the wide cached
            # partitioning costs more than the saved scan at this
            # batch size). Uncapped drain is ~9.5 s in the same
            # windows — the cap's steady cost is the one extra
            # census-fold job per batch.
            census = (
                all_bands.join(
                    new_bands.select("band", "bkey"), ["band", "bkey"], "semi"
                )
                .groupBy("band", "bkey")
                .agg(F.count("*").alias("k"))
                .coalesce(4)
                .cache()
            )
            surv = census.where(F.col("k") <= max_bucket).select(
                "band", "bkey"
            )
            probe = new_bands.join(surv, ["band", "bkey"], "semi")
        a = probe.alias("a")
        b = all_bands.alias("b")
        cand = (
            a.join(
                b,
                (F.col("a.band") == F.col("b.band"))
                & (F.col("a.bkey") == F.col("b.bkey"))
                & (F.col("a.doc_id") != F.col("b.doc_id")),
            )
            .select(
                F.least("a.doc_id", "b.doc_id").alias("doc_a"),
                F.greatest("a.doc_id", "b.doc_id").alias("doc_b"),
            )
            .distinct()
            .coalesce(4)
            .cache()
        )
        cand_ids = cand.select(F.col("doc_a").alias("doc_id")).union(
            cand.select(F.col("doc_b").alias("doc_id"))
        )
        sets = (
            all_sh.join(cand_ids, "doc_id", "semi").coalesce(4).cache()
        )
        sa = sets.alias("sa")
        sb = sets.alias("sb")
        inter = F.size(F.array_intersect(F.col("sa.ss"), F.col("sb.ss")))
        uni = F.size(F.col("sa.ss")) + F.size(F.col("sb.ss")) - inter
        pairs = (
            cand.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
            .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
            .select(
                "doc_a",
                "doc_b",
                inter.alias("inter"),
                uni.alias("uni"),
                F.lit(bid).cast("bigint").alias("wave"),
            )
            .where(F.col("inter") * 1.0 / F.col("uni") >= 0.5)
        )
        # Wave structure (r16, one serialized job wave cut per capped
        # micro-batch — guide §2.6): the FIRST synchronous write must be
        # the one whose lineage materializes every multiply-consumed
        # cache, because Spark does not synchronize simultaneous
        # cold-cache fills (racing threads would each recompute the
        # signature derivation). For a capped batch that job is the
        # ACCT landing: census's lineage scans new_bands (both the
        # broadcast build and the union side), which in turn scans the
        # batch cache — one job fills batch + new_bands + census. The
        # bands / pairs / shingles writes then all run warm and
        # CONCURRENTLY: per-batch wall = acct + max(bands, pairs,
        # shingles), two waves instead of the former three
        # (bands barrier; acct census barrier; pairs ∥ shingles).
        # Uncapped there is no census, so the bands write stays the
        # barrier and pairs ∥ shingles follow — two waves as before.
        # Replay safety does not depend on write order (module
        # docstring invariants ii+iii): every store lands
        # mode=overwrite into its own b{bid} subdir from deterministic
        # strictly-earlier state. A crash between the two waves can
        # leave acct/b{bid} present without its bands/pairs/shingles
        # siblings; the replayed batch overwrites all four, and no
        # reader pairs acct with the other stores mid-drain.
        if census is not None:
            # Always lands exactly one row, so an un-cut batch reads
            # as explicit zeros.
            census.where(F.col("k") > max_bucket).agg(
                F.lit(bid).cast("bigint").alias("wave"),
                F.count("*").cast("bigint").alias("n_buckets_cut"),
                F.coalesce(F.sum("k"), F.lit(0))
                .cast("bigint")
                .alias("n_band_rows_cut"),
            ).write.mode("overwrite").parquet(f"{state_root}/acct/b{bid}")
            writes = [
                (new_bands, f"{state_root}/bands/b{bid}"),
                (pairs, f"{state_root}/pairs/b{bid}"),
                (new_sh, f"{state_root}/shingles/b{bid}"),
            ]
        else:
            new_bands.write.mode("overwrite").parquet(
                f"{state_root}/bands/b{bid}"
            )
            writes = [
                (pairs, f"{state_root}/pairs/b{bid}"),
                (new_sh, f"{state_root}/shingles/b{bid}"),
            ]
        # inheritable_thread_target keeps the concurrent write jobs in
        # the foreachBatch thread's job group under pinned-thread mode
        # (streaming cancellation + UI attribution — ADVICE r15).
        from pyspark.util import inheritable_thread_target

        with ThreadPoolExecutor(len(writes)) as pool:
            futs = [
                pool.submit(
                    inheritable_thread_target(
                        lambda df=df, p=p: df.write.mode(
                            "overwrite"
                        ).parquet(p)
                    )
                )
                for df, p in writes
            ]
            for f in futs:
                f.result()
        for frame in (sets, cand, new_bands, batch):
            frame.unpersist()
        if census is not None:
            census.unpersist()

    (
        stream_df.writeStream.foreachBatch(step)
        .option("checkpointLocation", f"{state_root}/ckpt")
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def read_final_pairs(spark: SparkSession, state_root: str) -> DataFrame:
    """All pairs discovered across the drained batches, each tagged
    with its discovering batch id (``wave``)."""
    dirs = sorted(glob.glob(f"{state_root}/pairs/b*"))
    if not dirs:
        return spark.createDataFrame(
            [], "doc_a bigint, doc_b bigint, inter int, uni int, wave bigint"
        )
    return spark.read.parquet(*dirs)


def read_acct(spark: SparkSession, state_root: str) -> DataFrame:
    """Per-batch cut accounting landed by a ``max_bucket``-capped drain:
    one (wave, n_buckets_cut, n_band_rows_cut) row per micro-batch —
    zeros when nothing was cut."""
    dirs = sorted(glob.glob(f"{state_root}/acct/b*"))
    if not dirs:
        return spark.createDataFrame(
            [], "wave bigint, n_buckets_cut bigint, n_band_rows_cut bigint"
        )
    return spark.read.parquet(*dirs)


def n_state_versions(state_root: str) -> int:
    """How many micro-batches extended the band index — the
    multi-batch-exercised assertion hook (>= 2 means the incremental
    probe really ran against a pre-existing index)."""
    return len(glob.glob(os.path.join(state_root, "bands", "b*")))
