#!/usr/bin/env python
"""Round-15 whole-registry plan audit.

For every batch query (streaming drains have build-time side effects and
are plan-checked by their own tests), capture the formatted physical
plan and count the structures the optimization guide says to hunt:

- parquet scans PER TABLE (a table scanned more often than the query's
  logic needs marks a duplicated subtree — the spearman/mannwhitney
  class fixed this round),
- Exchange nodes and SinglePartition exchanges (global sorts/windows),
- join strategies (BroadcastHashJoin / SortMergeJoin / ShuffledHashJoin
  / BroadcastNestedLoopJoin / CartesianProduct),
- Python boundary nodes (BatchEvalPython / ArrowEvalPython / MapInArrow
  / FlatMapGroupsInPandas),
- Window / Sort / Generate / Union counts.

Writes plans/r15/_audit.json. Plan capture only — nothing executes.
"""

from __future__ import annotations

import io
import json
import os
import re
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bigdata_imgprocessing_spark.core.session import build_session
from bigdata_imgprocessing_spark.queries import QUERIES

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
HERE = os.path.dirname(os.path.abspath(__file__))

SKIP_PREFIX = ("streaming_",)
# build-time side effects (sink round trips, bucketed materialization)
SKIP = {"stats_pipeline_e2e", "jsonl_roundtrip_stats", "bucketed_join_revenue"}

OPS = [
    "Exchange",
    "Window",
    "Sort",
    "Generate",
    "Union",
    "BroadcastHashJoin",
    "SortMergeJoin",
    "ShuffledHashJoin",
    "BroadcastNestedLoopJoin",
    "CartesianProduct",
    "BatchEvalPython",
    "ArrowEvalPython",
    "MapInArrow",
    "FlatMapGroupsInPandas",
    "HashAggregate",
    "SortAggregate",
    "ObjectHashAggregate",
]


def n_nodes(plan: str, op: str) -> int:
    return len(re.findall(rf"^\(\d+\) {re.escape(op)}\b", plan, re.M))


def main() -> None:
    spark = build_session("r15-audit")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict[str, dict] = {}
    for name in sorted(QUERIES):
        if name.startswith(SKIP_PREFIX) or name in SKIP:
            continue
        try:
            df = QUERIES[name](spark, SF_DIR)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            plan = buf.getvalue()
        except Exception as exc:  # noqa: BLE001 - audit must cover the rest
            out[name] = {"error": str(exc)[:200]}
            continue
        rec = {op: n_nodes(plan, op) for op in OPS}
        rec = {k: v for k, v in rec.items() if v}
        # scans per source table
        scans: dict[str, int] = {}
        for m in re.finditer(r"^Location: \S+ ?\[file:([^\]]+)\]", plan, re.M):
            t = os.path.basename(m.group(1)).replace(".parquet", "")
            scans[t] = scans.get(t, 0) + 1
        rec["scans"] = scans
        rec["single_partition"] = plan.count("SinglePartition")
        out[name] = rec
        spark.catalog.clearCache()
    path = os.path.join(HERE, "plans", "r15", "_audit.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    print("written", path, "n", len(out))
    spark.stop()


if __name__ == "__main__":
    main()
