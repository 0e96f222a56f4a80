"""MERGE-style upsert sink via ``foreachBatch`` (NOTES r2 item 3) —
the keyed-state sink shape a real ingest pipeline runs against Delta/
Iceberg/JDBC ``MERGE INTO``, built here on versioned parquet because no
transactional table format ships in this container.

Semantics per micro-batch (classic CDC compaction):
- batch rows are reduced to one candidate per key (newest wins);
- existing state keys are UPDATED if the candidate is newer, kept
  otherwise; unseen keys are INSERTED — i.e. ``MERGE INTO state USING
  delta ON state.key = delta.key WHEN MATCHED AND delta.newer THEN
  UPDATE WHEN NOT MATCHED THEN INSERT``.

"Newest" is the lexicographic max of ``(ts_sec, event_id)`` — a total
order, so the result is independent of micro-batch segmentation and
arrival interleaving (the stream≡batch contract the oracle checks).

Exactly-once: state version dirs are keyed by batch id; a replayed
batch recomputes from the highest version BELOW its own id and
overwrites its own dir — rerunning batch N is idempotent and never
double-applies. (Delta's MERGE gets this from the txn log; versioned
dirs are the same construction by hand.)

Scale: the merge is one shuffle per micro-batch on the upsert key, and
state stays distributed (no driver round-trip). At 100 TB the state
table is a partitioned/bucketed Delta table and this function body is
replaced by one MERGE INTO statement — the plan shape is identical.
"""

from __future__ import annotations

import glob
import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: columns folded into the newest-wins struct, order matters: the
#: leading (ts_sec, event_id) pair IS the recency total order.
_STATE_COLS = ("ts_sec", "event_id", "event_type", "value")


def _latest_per_key(df: DataFrame, key: str) -> DataFrame:
    """One row per key: lexicographic max over (ts_sec, event_id, ...) —
    an associative/commutative reduce, so Spark runs it map-side partial
    then one shuffle, and the result is segmentation-independent."""
    packed = df.groupBy(key).agg(
        F.max(F.struct(*[F.col(c) for c in _STATE_COLS])).alias("m")
    )
    return packed.select(key, *[F.col(f"m.{c}").alias(c) for c in _STATE_COLS])


def _versions(out_dir: str) -> list[tuple[int, str]]:
    out = []
    for d in glob.glob(os.path.join(out_dir, "state_v*")):
        m = re.fullmatch(r"state_v(\d+)", os.path.basename(d))
        if m and os.path.exists(os.path.join(d, "_SUCCESS")):
            out.append((int(m.group(1)), d))
    return sorted(out)


def run_foreachbatch_upsert(
    parsed_stream: DataFrame,
    out_dir: str,
    key: str = "user_id",
    state_partitions: int = 8,
) -> None:
    """Drain the stream through the MERGE upsert; final state is the
    highest ``state_v<id>`` dir under ``out_dir``."""
    spark = parsed_stream.sparkSession
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        s = batch_df.sparkSession
        delta = _latest_per_key(batch_df.select(key, *_STATE_COLS), key)
        prev = [d for v, d in _versions(out_dir) if v < batch_id]
        if prev:
            state = s.read.parquet(prev[-1])
            merged = _latest_per_key(state.unionByName(delta), key)
        else:
            merged = delta
        merged.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"state_v{batch_id}")
        )

    try:
        q = (
            parsed_stream.writeStream.foreachBatch(_merge)
            # checkpoint under the sink root: a restarted drain continues
            # batch numbering (replay → same id → idempotent overwrite;
            # new data → next id → merges from the prior version)
            .option("checkpointLocation", os.path.join(out_dir, "_checkpoint"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


def read_final_state(spark: SparkSession, out_dir: str) -> DataFrame:
    versions = _versions(out_dir)
    if not versions:
        raise FileNotFoundError(f"no completed state version under {out_dir}")
    return spark.read.parquet(versions[-1][1])
