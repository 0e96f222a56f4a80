"""Custom stateful streaming operator via ``applyInPandasWithState`` —
the arbitrary-state surface the built-in windowed aggregations can't
express (running per-key state with custom transition logic).

Demonstrated op: per-user running totals with a "large purchase" counter
(count of purchases whose running cumulative value crossed a threshold
at arrival — an inherently order-and-state-dependent quantity). The
drain test checks the stream's final state equals the batch
recomputation, the stream-batch contract for stateful ops.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from .jobs import event_stream, run_to_memory

_OUT_SCHEMA = "user_id bigint, n_events bigint, total_value double, n_large bigint"
_STATE_SCHEMA = "n bigint, total double, n_large bigint"
#: running-total threshold for the "large" counter (public: the oracle
#: SQL in queries/streaming_queries.py embeds the same constant)
THRESHOLD = 500.0
_THRESHOLD = THRESHOLD


def _update(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    n, total, n_large = state.get if state.exists else (0, 0.0, 0)
    # Concat ALL Arrow chunks for the group, then sort ONCE: a group
    # larger than arrow.maxRecordsPerBatch arrives as multiple chunks,
    # and chunk-local sorts would fold values out of global (ts,
    # event_id) order (ADVICE r2). Residual assumption (documented): a
    # group split ACROSS micro-batches still folds in micro-batch order;
    # the order-dependent n_large contract holds because the file source
    # delivers each key's rows within one micro-batch per file-chunk and
    # ts ordering across batches follows file order in this corpus.
    chunks = [p for p in pdfs if len(p)]
    batch = pd.concat(chunks, ignore_index=True) if chunks else pd.DataFrame()
    if len(batch):
        batch = batch.sort_values(["ts", "event_id"])
        for v in batch["value"]:
            n += 1
            total += float(v)
            if total > _THRESHOLD:
                n_large += 1
    state.update((n, total, n_large))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "total_value": [round(total, 2)],
            "n_large": [n_large],
        }
    )


def running_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drain the event stream through the stateful operator; returns the
    final per-user state materialized from the memory sink (last update
    per user wins across micro-batches)."""
    s = event_stream(spark, sf_dir).select("user_id", "ts", "event_id", "value")
    updated = s.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    drained = run_to_memory(updated, mode="update")
    # multiple micro-batches emit multiple updates per user → keep the last
    # (max n_events) per user
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    w = Window.partitionBy("user_id").orderBy(F.col("n_events").desc())
    return (
        drained.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .drop("rn")
    )
