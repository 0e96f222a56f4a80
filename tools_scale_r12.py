#!/usr/bin/env python
"""Round-12 scale stress: MinHash-LSH banding at 1M / 10M documents.

VERDICT r11 item 6: the banded hamming cap is proven at 1M
fingerprints, but minhash banding's hot-bucket behavior was argued
(candidate distinct(), "buckets stay corpus-bounded"), not measured
past sf0.1 (~60k docs). This tool measures it on a synthetic corpus
pushed through the PRODUCTION builders (`_minhash_signatures`,
`_band_frame` — the same F.expr plans the queries run), at two corpus
shapes:

- V1 "natural": 40 deterministic pseudo-random tokens per doc (50k
  vocab, xxhash64-derived — no Python RNG, fully reproducible), with
  1% planted near-dup pairs (ids (d-1, d) for d % 100 == 1; 2 of 40
  tokens perturbed → shingle Jaccard ≈ 0.73). Accidental cross-doc
  shingle collisions are vocabulary-bounded; expectation: max bucket
  stays O(planted cluster), no cap needed.
- V2 "syndicated": V1 plus a 2% heavy-boilerplate cohort (30 of 40
  tokens fixed — the syndication/mirror-site case): a constant
  30-token prefix makes the band minima boilerplate-dominated with
  probability ~(28/38)^2 per hash, concentrating a large fraction of
  the cohort on ONE (band, bkey) per band — the quadratic candidate
  bomb. Expectation: uncapped candidate count (computed ANALYTICALLY
  from bucket sizes as sum k(k-1)/2 — the join is not run when the
  count is infeasible) explodes; a max_bucket cutoff keeps the join
  bounded, and recall accounting over the planted pairs quantifies
  exactly what the cutoff loses.

Also measured: the incremental (new x old ∪ new x new) probe shape at
a 9.9M-doc index + 100k arrivals — the `lsh_incremental_pairs` /
`streaming_lsh_ingest` claim that probe cost is arrivals-sized, not
index-sized.

Ground truth: the planted pairs are the only sub-0.5-distance pairs by
construction, so recall = detected planted / planted (verified with
the production exact-Jaccard expression over shingle arrays).

Usage: python tools_scale_r12.py [1000000] [10000000]
(runs V1/V2 cases per n, the 10M incremental probe, and the 1M
representative-pass measurement)
Writes per-case lines; summarize into SCALING.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, functions as F

from bigdata_imgprocessing_spark.core.session import build_session
from bigdata_imgprocessing_spark.queries.dedup import (
    _band_frame,
    _minhash_signatures,
    _shingles_sql,
)

VOCAB = 50_000
N_TOK = 40


def corpus(spark, n: int, heavy: bool) -> DataFrame:
    """Deterministic synthetic corpus: (doc_id, text).

    bid = doc_id - 1 for dup docs (d % 100 == 1), else doc_id — so the
    planted pair (d-1, d) shares its token stream except positions 32
    and 36. Heavy-ness keys on bid so a planted pair never straddles
    the cohort boundary."""
    heavy_pred = f"((doc_id - CASE WHEN doc_id % 100 = 1 THEN 1 ELSE 0 END) % 50 = 3 AND {str(heavy).lower()})"
    tok = f"""
        CASE
          WHEN {heavy_pred} AND i < 30 THEN concat('b', i)
          WHEN doc_id % 100 = 1 AND (i = 32 OR i = 36)
            THEN concat('w', pmod(xxhash64(concat(doc_id, '_', i, '_p')), {VOCAB}))
          ELSE concat('w', pmod(xxhash64(concat(
                 doc_id - CASE WHEN doc_id % 100 = 1 THEN 1 ELSE 0 END,
                 '_', i)), {VOCAB}))
        END
    """
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.expr(
            f"concat_ws(' ', transform(sequence(0, {N_TOK - 1}), i -> {tok}))"
        ).alias("text"),
    )


def bucket_stats(bands: DataFrame):
    sizes = bands.groupBy("band", "bkey").agg(F.count("*").alias("k"))
    row = sizes.agg(
        F.count("*").alias("n_buckets"),
        F.max("k").alias("max_k"),
        F.sum(
            (F.col("k").cast("double") * (F.col("k") - 1) / 2)
        ).alias("uncapped_cand"),
        F.sum(F.when(F.col("k") > 64, 1).otherwise(0)).alias("n_gt64"),
    ).collect()[0]
    return sizes, row


def candidates(bands: DataFrame, sizes: DataFrame | None, cap: int | None):
    """Production candidate shape: (band,bkey) self-join + distinct;
    cap = drop buckets with k > cap first (the simhash64_neardup_capped
    discipline, applied to minhash bands)."""
    use = bands
    if cap is not None:
        keep = sizes.where(F.col("k") <= cap).select("band", "bkey")
        use = bands.join(keep, ["band", "bkey"])
    a = use.alias("a")
    b = use.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bkey") == F.col("b.bkey"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def verify(docs: DataFrame, cand: DataFrame) -> DataFrame:
    sh = docs.select(
        "doc_id", F.expr(f"array_distinct({_shingles_sql('text')})").alias("ss")
    )
    ids = cand.select(F.col("doc_a").alias("doc_id")).union(
        cand.select(F.col("doc_b").alias("doc_id"))
    )
    sets = sh.join(ids.distinct(), "doc_id")
    sa, sb = sets.alias("sa"), sets.alias("sb")
    inter = F.size(F.array_intersect(F.col("sa.ss"), F.col("sb.ss")))
    uni = F.size(F.col("sa.ss")) + F.size(F.col("sb.ss")) - inter
    return (
        cand.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
        .where(inter * 1.0 / uni >= 0.5)
        .select("doc_a", "doc_b")
    )


def run_case(spark, n: int, heavy: bool, caps, run_uncapped_join: bool):
    tag = f"n={n} {'V2-syndicated' if heavy else 'V1-natural'}"
    docs = corpus(spark, n, heavy)
    t0 = time.time()
    sig = _minhash_signatures(docs)
    bands = _band_frame(sig).persist()
    nb = bands.count()
    t_sig = time.time() - t0
    sizes, st = bucket_stats(bands)
    sizes = sizes.persist()
    n_planted = n // 100
    print(
        f"{tag}: band_rows={nb} sig+band_wall={t_sig:.1f}s "
        f"buckets={st['n_buckets']} max_k={st['max_k']} "
        f"gt64={st['n_gt64']} uncapped_cand={st['uncapped_cand']:.3e}",
        flush=True,
    )
    for cap in caps:
        if cap is None and not run_uncapped_join:
            print(f"{tag} cap=None: join SKIPPED (analytic count above)",
                  flush=True)
            continue
        t0 = time.time()
        cand = candidates(bands, sizes, cap)
        n_cand = cand.count()
        t_cand = time.time() - t0
        t0 = time.time()
        ver = verify(docs, cand).persist()
        n_ver = ver.count()
        hits = ver.where(
            (F.col("doc_b") == F.col("doc_a") + 1)
            & (F.col("doc_b") % 100 == 1)
        ).count()
        t_ver = time.time() - t0
        print(
            f"{tag} cap={cap}: cand={n_cand} cand_wall={t_cand:.1f}s "
            f"verified={n_ver} verify_wall={t_ver:.1f}s "
            f"planted_recall={hits}/{n_planted} = {hits / n_planted:.4f}",
            flush=True,
        )
        ver.unpersist()
    bands.unpersist()
    sizes.unpersist()
    spark.catalog.clearCache()


def run_incremental(spark, n: int):
    """Arrivals-sized probe at a big index: 1% arrivals vs the rest."""
    cut = n - n // 100
    docs = corpus(spark, n, False)
    t0 = time.time()
    all_bands = _band_frame(_minhash_signatures(docs)).persist()
    all_bands.count()
    t_index = time.time() - t0
    new_b = all_bands.where(F.col("doc_id") >= cut)
    t0 = time.time()
    a, b = new_b.alias("a"), all_bands.alias("b")
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
    )
    n_cand = cand.count()
    t_probe = time.time() - t0
    print(
        f"incremental n={n} index={cut} arrivals={n - cut}: "
        f"index_build={t_index:.1f}s probe_cand={n_cand} "
        f"probe_wall={t_probe:.1f}s",
        flush=True,
    )
    all_bands.unpersist()
    spark.catalog.clearCache()


def main():
    ns = [int(x) for x in sys.argv[1:]] or [1_000_000, 10_000_000]
    spark = build_session("scale-r12")
    spark.sparkContext.setLogLevel("ERROR")
    for n in ns:
        # V1: uncapped join is expected feasible — run it for real.
        run_case(spark, n, heavy=False, caps=[None, 64],
                 run_uncapped_join=True)
        # V2: uncapped candidate count reported analytically; the join
        # runs only capped (the uncapped join at 10M would be ~1e11
        # rows — the point of the measurement).
        run_case(spark, n, heavy=True, caps=[None, 64],
                 run_uncapped_join=(n <= 200_000))
    run_incremental(spark, max(ns))
    # part C: the representative pass on the hot residue (SCALING.md
    # r12 addendum) — measured at the smaller corpus (the hot-bucket
    # structure is already extreme at 1M; part A covers 10M analytics)
    run_rep_dedup(spark, min(ns))
    spark.stop()


def run_rep_dedup(spark, n: int, cap: int = 64):
    """Part C (r12 addendum): the hot-bucket REPRESENTATIVE pass on the
    syndicated corpus — the bounded treatment of exactly the residue
    the cap cuts (`hot_bucket_rep_dedup`'s scale claim, measured):
    members of each hot bucket verify against the bucket's min-doc
    representative only, so a k-deep bucket costs k-1 comparisons, not
    k(k-1)/2."""
    docs = corpus(spark, n, heavy=True)
    bands = _band_frame(_minhash_signatures(docs)).persist()
    bands.count()
    census = bands.groupBy("band", "bkey").agg(F.count("*").alias("k"))
    census = census.persist()
    hot = census.where(F.col("k") > cap).select("band", "bkey")
    t0 = time.time()
    hb = bands.join(hot, ["band", "bkey"])
    rep = hb.groupBy("band", "bkey").agg(F.min("doc_id").alias("rep"))
    mem = (
        hb.join(rep, ["band", "bkey"])
        .where(F.col("doc_id") != F.col("rep"))
        .select(F.col("doc_id").alias("m_doc"), F.col("rep").alias("m_rep"))
        .distinct()
        .persist()
    )
    n_mem = mem.count()
    ids = mem.select(F.col("m_doc").alias("doc_id")).union(
        mem.select(F.col("m_rep").alias("doc_id"))
    ).distinct()
    sets = docs.join(ids, "doc_id", "semi").select(
        "doc_id",
        F.expr(f"array_distinct({_shingles_sql('text')})").alias("ss"),
    ).persist()
    sm, sr = sets.alias("sm"), sets.alias("sr")
    inter = F.size(F.array_intersect(F.col("sm.ss"), F.col("sr.ss")))
    uni = F.size(F.col("sm.ss")) + F.size(F.col("sr.ss")) - inter
    n_dup = (
        mem.join(sm, F.col("m_doc") == F.col("sm.doc_id"))
        .join(sr, F.col("m_rep") == F.col("sr.doc_id"))
        .where(inter * 1.0 / uni >= 0.5)
        .select("m_doc")
        .distinct()
        .count()
    )
    dt = time.time() - t0
    uncapped = census.where(F.col("k") > cap).agg(
        F.sum(F.col("k").cast("double") * (F.col("k") - 1) / 2)
    ).collect()[0][0]
    print(
        f"C rep-dedup n={n} cap={cap}: members={n_mem} "
        f"dup_vs_rep={n_dup} wall={dt:.1f}s "
        f"(pairwise-equivalent candidates: {uncapped:.3e})",
        flush=True,
    )
    for fr in (sets, mem, census, bands):
        fr.unpersist()
    spark.catalog.clearCache()


if __name__ == "__main__":
    main()
