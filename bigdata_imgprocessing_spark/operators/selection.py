"""Distributed exact rank selection — exact quantiles with NO global sort.

The classic scale gap: ``percentile()`` / a rank window needs a total
sort (single-partition at the window, or a full range-shuffle), while
``approx_percentile`` is sketched. This operator returns EXACT order
statistics in O(log_B(span)) histogram passes over an integer column:

1. One aggregate for (min, max, count).
2. Bucket the value range into B equal-width integer buckets, histogram
   with one map-side-combinable groupBy (shuffle carries <= B rows),
   and locate the bucket holding each requested rank via the cumulative
   bucket counts.
3. Recurse INTO the located buckets only (the candidate set shrinks by
   ~B per level) until bucket width == 1 — at width 1 the bucket id IS
   the value, so no row is ever sorted and value-skew is free: a value
   with a billion duplicates is one width-1 bucket.

With B = 65536, any 32-bit-span column needs 2 passes; a full int64
span needs 4. Every pass is a filter + groupBy (map-side partials), so
the plan survives 100 TB: nothing bigger than B rows crosses a shuffle
and the driver only ever sees the |ranks|-row bucket locations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_BUCKETS = 65536


def exact_rank_values(
    vals: DataFrame,
    col: str,
    ranks: list[tuple[int, int]],
    n_buckets: int = DEFAULT_BUCKETS,
) -> list[tuple[int, int, int]]:
    """Exact order statistics of integer column ``col``.

    ``ranks`` is a list of (tag, k) with 1-based global ranks k; the
    return value is [(tag, k, value)] where value is the k-th smallest
    element (ties collapse to the same value by definition). Driver
    traffic is bounded: one 1-row stats collect plus one <= |ranks|-row
    collect per refinement level (<= 4 levels for int64 spans).
    """
    stats = vals.agg(
        F.min(col).alias("lo"), F.max(col).alias("hi"), F.count("*").alias("n")
    ).collect()[0]
    if stats["n"] == 0:
        return []
    lo, hi = int(stats["lo"]), int(stats["hi"])
    # per-target search state: (tag, k, range_lo, range_hi, rank_within)
    todo = [(tag, k, lo, hi, k) for tag, k in ranks]
    out: list[tuple[int, int, int]] = []
    cand = vals.select(F.col(col).alias("v"))
    while todo:
        done = [t for t in todo if t[2] == t[3]]
        out.extend((tag, k, rlo) for tag, k, rlo, _rhi, _w in done)
        todo = [t for t in todo if t[2] != t[3]]
        if not todo:
            break
        # one histogram pass refines EVERY pending target: bucket ids
        # are (target, bucket) so disjoint/overlapping ranges coexist.
        span_w = {
            i: max(1, -(-(rhi - rlo + 1) // n_buckets))
            for i, (_t, _k, rlo, rhi, _w) in enumerate(todo)
        }
        conds = None
        per_bucket = []
        for i, (_tag, _k, rlo, rhi, _w) in enumerate(todo):
            w = span_w[i]
            b = F.floor((F.col("v") - F.lit(rlo)) / F.lit(w)).cast("bigint")
            sel = (F.col("v") >= rlo) & (F.col("v") <= rhi)
            per_bucket.append(
                F.when(sel, F.struct(F.lit(i).alias("t"), b.alias("b")))
            )
            conds = sel if conds is None else (conds | sel)
        hist = (
            cand.where(conds)
            .select(
                F.explode(
                    F.filter(
                        F.array(*per_bucket), lambda x: x.isNotNull()
                    )
                ).alias("tb")
            )
            .groupBy(F.col("tb.t").alias("t"), F.col("tb.b").alias("b"))
            .agg(F.count("*").alias("c"))
        )
        wdw = Window.partitionBy("t").orderBy("b").rowsBetween(
            Window.unboundedPreceding, 0
        )
        cum = hist.select(
            "t", "b", "c", F.sum("c").over(wdw).alias("hi_c")
        ).withColumn("lo_c", F.col("hi_c") - F.col("c"))
        # locate each target's bucket Spark-side (lo_c < rank <= hi_c)
        # so the driver collects exactly |targets| rows, never the
        # B-bucket histogram itself.
        targets = vals.sparkSession.createDataFrame(
            [(i, t[4]) for i, t in enumerate(todo)], "ti INT, wk BIGINT"
        )
        hits = {
            int(r["t"]): r
            for r in cum.join(
                F.broadcast(targets),
                (F.col("t") == F.col("ti"))
                & (F.col("lo_c") < F.col("wk"))
                & (F.col("wk") <= F.col("hi_c")),
            ).collect()
        }
        nxt = []
        for i, (tag, k, rlo, rhi, within) in enumerate(todo):
            w = span_w[i]
            hit = hits[i]
            b = int(hit["b"])
            nlo = rlo + b * w
            nhi = min(rhi, rlo + (b + 1) * w - 1)
            nxt.append((tag, k, nlo, nhi, within - int(hit["lo_c"])))
        todo = nxt
    return sorted(out)
