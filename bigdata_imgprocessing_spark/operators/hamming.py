"""Hamming-distance-1 neighbor join — the wildcard (masked-key) index.

An operator the reference lacks and Spark has no native form for: find
every pair of bit-fingerprints (SimHash, pHash, feature bitmaps) that
differ in EXACTLY one bit, without an all-pairs scan. This generalizes
the FastSS deletion-neighborhood trick used for edit distance inside
``er_golden_record`` (queries/dedup.py) from string space to Hamming
space: instead of one-character deletions, each fingerprint emits one
key per bit position with that bit forced HIGH — ``(pos, fp | 1<<pos)``
— and two fingerprints differing exactly at ``pos`` collide on exactly
that one key, while fingerprints differing in two or more bits collide
on none. Candidate generation is therefore a single EQUI-join on the
key, never a cross product or bit_count theta join.

Why set-the-bit rather than mask-it-out: identical semantics (clearing
gives ``(pos, fp & ~(1<<pos))`` — the same collision rule), but OR
avoids 64-bit NOT-mask literals and keeps the key derivable with one
JVM-side bitwise op in both engines (the DuckDB oracle replays the
identical index).

Scale properties (the reason this survives 100 TB):
  * Index size is |V|·bits rows, linear in the distinct-fingerprint
    vocabulary (distinct-reduce-first rule: dedupe fingerprints before
    indexing, join per-fp payload/counts back after).
  * The join is SKEW-PROOF BY CONSTRUCTION: a key ``(pos, k)`` can only
    be produced by the two fingerprints ``k`` and ``k ^ (1<<pos)`` —
    every hash bucket holds at most 2 rows, so no hot key exists for
    any input distribution, and each distance-1 pair is emitted exactly
    once (no distinct pass needed).
  * For distance k > 1 the same pigeonhole generalizes by banding
    (split bits into k+1 blocks; near pairs match exactly on >= 1
    block) — that shape already exists as the MinHash-LSH band join
    (queries/dedup.py); this operator is the exact-distance-1 fast
    path where banding would over-generate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hamming1_neighbor_join(
    fps: DataFrame, fp_col: str, bits: int
) -> DataFrame:
    """All unordered pairs of distinct fingerprint VALUES in ``fps``
    at Hamming distance exactly 1, as ``(fp_a, fp_b, pos)`` with
    ``fp_a < fp_b`` and ``pos`` the single differing bit position.

    ``fps`` may contain duplicate fingerprints (rows are
    distinct-reduced internally); callers carrying per-fingerprint
    payloads or multiplicities join them back on ``fp_a``/``fp_b``.
    ``bits`` is the fingerprint width (1..64; position 63 uses the
    sign bit of the long, which is still a plain bitwise op).

    Each output pair is produced exactly once — by the one key whose
    position is the differing bit — so the result needs no dedup, and
    every key bucket holds at most two fingerprints (see module
    docstring), so the equi-join cannot skew.
    """
    if not 1 <= bits <= 64:
        raise ValueError(f"bits must be in 1..64, got {bits}")
    fp = F.col(fp_col).cast("long")
    distinct_fp = fps.select(fp.alias("fp")).distinct()
    # one (pos, key) per bit, built JVM-side from literal shifts
    # (shiftleft on a long handles pos 63 without a Python-int overflow)
    keys = distinct_fp.select(
        "fp",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("pos"),
                        F.col("fp")
                        .bitwiseOR(F.shiftleft(F.lit(1).cast("long"), i))
                        .alias("k"),
                    )
                    for i in range(bits)
                ]
            )
        ).alias("pk"),
    ).select("fp", F.col("pk.pos").alias("pos"), F.col("pk.k").alias("k"))
    # PIN a sort-merge join: both sides are the SAME |V|*bits exploded
    # frame, so broadcast is never the right strategy — and Catalyst
    # would pick it anyway at scale, because explode propagates its
    # child's size estimate (the 64x row fan-out is invisible to the
    # optimizer), then OOMs building the broadcast relation. Measured:
    # 1M distinct 64-bit fingerprints = a 64M-row index per side ->
    # "Not enough memory to build and broadcast" without the hint
    # (tools_scale_r9.py); with it, a plain two-sided shuffle whose
    # <= 2-row buckets cannot skew.
    a = keys.alias("a").hint("merge")
    b = keys.alias("b")
    return a.join(
        b,
        (F.col("a.pos") == F.col("b.pos"))
        & (F.col("a.k") == F.col("b.k"))
        & (F.col("a.fp") < F.col("b.fp")),
    ).select(
        F.col("a.fp").alias("fp_a"),
        F.col("b.fp").alias("fp_b"),
        F.col("a.pos").alias("pos"),
    )
