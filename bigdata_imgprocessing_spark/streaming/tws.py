"""Arbitrary stateful streaming via ``transformWithStateInPandas`` —
the Spark 4 successor to ``applyInPandasWithState`` (stateful.py) and
the remaining Structured Streaming state surface this repo had not
covered: instead of ONE opaque state tuple per key, the processor
declares NAMED, TYPED state variables (ValueState / MapState /
ListState, each independently evolvable and TTL-capable), which is the
API a long-running 100 TB ingest deployment would use — per-variable
schema evolution and eviction instead of versioning one monolithic
blob.

Demonstrated op: a per-user inventory carrying all three variable
kinds across micro-batches —
  * ValueState ``n``: total events seen,
  * MapState ``bt``: event_type -> count (the per-key breakdown a
    single tuple cannot express without packing),
  * ListState ``recent``: the last two event ids in arrival order.
The emitted snapshot's top-type is the max by (count, type), a pure
function of the map, so the driver hash pins the MapState carry; the
penultimate event id pins the ListState order across batches.

ENVIRONMENT GATE (the ``images/detect.py`` real-weights precedent):
``transformWithState``'s state-server protocol runs over protobuf, and
this container ships no ``google.protobuf`` (verified: the driver-side
worker dies with ``ImportError: cannot import name 'descriptor'``
before ``init()`` runs — the minimal ValueState repro fails
identically, so the gate is the environment, not this processor).
The operator is therefore NOT registered as a driver-checked query;
``tests/test_sources.py::test_tws_user_inventory_gated`` runs the full
drain + oracle comparison whenever protobuf exists and skips
otherwise, so the first environment that can run it checks it.

Reference parity: the reference has no streaming engine — this is the
Structured Streaming extension of its surface, same module contract as
the other streaming/ jobs.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

from .jobs import run_to_memory

_OUT = (
    "user_id bigint, n_events bigint, n_types bigint, top_type string,"
    " top_type_n bigint, penult_event_id bigint"
)


class _UserInventory(StatefulProcessor):
    """Per-user event inventory over three typed state variables."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._n = handle.getValueState("n", "n bigint")
        self._bt = handle.getMapState("bt", "t string", "c bigint")
        self._recent = handle.getListState("recent", "eid bigint")

    def handleInputRows(self, key, rows, timerValues):
        chunks = [p for p in rows if len(p)]
        batch = (
            pd.concat(chunks, ignore_index=True) if chunks else pd.DataFrame()
        )
        n = self._n.get()[0] if self._n.exists() else 0
        if len(batch):
            # chunk-concat-then-sort, the stateful.py ADVICE-r2 rule
            batch = batch.sort_values(["ts", "event_id"])
            n += len(batch)
            for t, c in batch.groupby("event_type").size().items():
                cur = self._bt.getValue((t,))
                self._bt.updateValue((t,), ((cur[0] if cur else 0) + int(c),))
            ids = (
                [r[0] for r in self._recent.get()]
                if self._recent.exists()
                else []
            )
            ids = (ids + [int(e) for e in batch["event_id"]])[-2:]
            self._recent.put([(e,) for e in ids])
        self._n.update((n,))
        items = [(t[0], v[0]) for t, v in self._bt.iterator()]
        # max over the full map — store iteration order never matters
        top_t, top_c = max(items, key=lambda x: (x[1], x[0]))
        ids = [r[0] for r in self._recent.get()]
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "n_types": [len(items)],
                "top_type": [top_t],
                "top_type_n": [top_c],
                "penult_event_id": [ids[0]],
            }
        )

    def close(self) -> None:
        pass


def user_inventory(spark: SparkSession, feed: str) -> DataFrame:
    """Drain a ts-tertile-staged event feed through the typed-state
    processor; returns the FINAL per-user snapshot (last update per
    key across micro-batches)."""
    from .jobs import file_feed_stream, last_state_per_key

    updated = file_feed_stream(spark, feed).groupBy(
        "user_id"
    ).transformWithStateInPandas(
        statefulProcessor=_UserInventory(),
        outputStructType=_OUT,
        outputMode="Update",
        timeMode="None",
    )
    # transformWithState requires the RocksDB state store (the HDFS
    # provider lacks the column-family support behind typed state
    # variables — the provider a continuous deployment runs anyway);
    # scoped to this drain, restored after.
    key = "spark.sql.streaming.stateStore.providerClass"
    old = spark.conf.get(key, None)
    spark.conf.set(
        key,
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        drained = run_to_memory(updated, mode="update")
    finally:
        if old:
            spark.conf.set(key, old)
        else:
            spark.conf.unset(key)
    return last_state_per_key(drained, "user_id", "n_events")
