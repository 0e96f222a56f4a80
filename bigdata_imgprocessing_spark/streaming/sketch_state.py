"""Incremental sketch maintenance via ``foreachBatch`` — the streaming
form of the mergeable-sketch rolling-distinct metric
(``queries/timeseries.py sliding_users_sketch`` is the batch form).

Per micro-batch: the batch reduces to one HLL sketch per day
(``hll_sketch_agg``), which is UNION-MERGED into the persistent per-day
sketch state (``hll_union_agg``) — the associative/commutative update
that makes the result independent of how the stream was segmented into
micro-batches (the stream≡batch contract the oracle checks). State is
versioned per batch id exactly like ``upsert.py``: a replayed batch
recomputes from the highest version BELOW its own id and overwrites its
own dir, so restarts never double-merge a batch (idempotent sketch
maintenance — the property that makes sketch state safe under
at-least-once delivery).

Scale: per-batch work is one day-keyed shuffle of kilobyte sketches;
the state table is |days| rows regardless of stream volume, and the
downstream rolling window re-merges 7 sketches per day instead of
re-scanning raw events — the entire point of maintaining sketches
incrementally at 100 TB/day ingest.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .upsert import _versions


def run_sketch_maintenance(
    stream_df: DataFrame, out_dir: str, state_partitions: int = 8
) -> None:
    """Drain a (user_id, d) stream into versioned per-day HLL sketch
    state; final state is the highest ``state_v<id>`` dir."""
    spark = stream_df.sparkSession
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        s = batch_df.sparkSession
        delta = batch_df.groupBy("d").agg(
            F.hll_sketch_agg("user_id").alias("sk")
        )
        prev = [d for v, d in _versions(out_dir) if v < batch_id]
        if prev:
            state = s.read.parquet(prev[-1])
            merged = state.unionByName(delta).groupBy("d").agg(
                F.hll_union_agg("sk").alias("sk")
            )
        else:
            merged = delta
        merged.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"state_v{batch_id}")
        )

    try:
        q = (
            stream_df.writeStream.foreachBatch(_merge)
            .option("checkpointLocation", os.path.join(out_dir, "_checkpoint"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


def read_final_sketches(spark: SparkSession, out_dir: str) -> DataFrame:
    versions = _versions(out_dir)
    if not versions:
        raise FileNotFoundError(f"no completed sketch state under {out_dir}")
    return spark.read.parquet(versions[-1][1])


def n_state_versions(out_dir: str) -> int:
    return len(_versions(out_dir))
