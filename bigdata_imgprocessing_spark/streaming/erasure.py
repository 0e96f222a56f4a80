"""Streaming erasure propagation — the governance twin of the MERGE
upsert sink (`streaming/upsert.py`): a live feed of right-to-be-
forgotten REQUESTS (victim keys) drains through ``foreachBatch``, and
each micro-batch rewrites the keyed state table minus that batch's
victims (``DELETE FROM state WHERE key IN (SELECT key FROM requests)``
— the by-hand form of Delta/Iceberg row-level DELETE, on versioned
parquet because no transactional format ships in this container).

Deletion is idempotent by nature (re-deleting a key is a no-op), so
replayed batches are harmless; version dirs keyed by batch id keep
restarts monotone exactly like the upsert sink. Each batch's work is
ONE broadcast anti join + a partition-parallel rewrite — at 100 TB the
rewrite touches only the partitions the audit pass
(``user_erasure_audit``) shows contain victims.
"""

from __future__ import annotations

import glob
import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _versions(out_dir: str) -> list[tuple[int, str]]:
    out = []
    for d in glob.glob(os.path.join(out_dir, "state_v*")):
        m = re.fullmatch(r"state_v(\d+)", os.path.basename(d))
        if m and os.path.exists(os.path.join(d, "_SUCCESS")):
            out.append((int(m.group(1)), d))
    return sorted(out)


def init_state(df: DataFrame, out_dir: str, state_partitions: int = 8) -> None:
    """Materialize the pre-stream state table (the lake before any
    erasure requests arrive)."""
    df.repartition(state_partitions).write.mode("overwrite").parquet(
        os.path.join(out_dir, "state_init")
    )


def run_foreachbatch_erasure(
    request_stream: DataFrame,
    out_dir: str,
    key: str = "user_id",
    state_partitions: int = 8,
) -> None:
    """Drain the victim-key stream, rewriting state minus victims per
    micro-batch. Final state = highest ``state_v<id>`` dir."""
    spark = request_stream.sparkSession
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))

    def _erase(batch_df: DataFrame, batch_id: int) -> None:
        s = batch_df.sparkSession
        victims = batch_df.select(key).distinct()
        prev = [d for v, d in _versions(out_dir) if v < batch_id]
        src = prev[-1] if prev else os.path.join(out_dir, "state_init")
        state = s.read.parquet(src)
        remaining = state.join(
            F.broadcast(victims), state[key] == victims[key], "left_anti"
        )
        remaining.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"state_v{batch_id}")
        )

    try:
        (
            request_stream.writeStream.foreachBatch(_erase)
            .option("checkpointLocation", os.path.join(out_dir, "_chk"))
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


def read_final_state(spark: SparkSession, out_dir: str) -> DataFrame:
    vs = _versions(out_dir)
    path = vs[-1][1] if vs else os.path.join(out_dir, "state_init")
    return spark.read.parquet(path)
