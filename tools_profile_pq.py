#!/usr/bin/env python
"""One-off profiler for the pq_ann_recall drift (VERDICT r8 item 2):
runs the query N times at sf0.1 under the bench's exact conditions
(warm-up, cache-clear + GC between runs) and prints per-run wall
clock plus per-stage executorRunTime from the Spark status API, so
host variance (same stages, fatter wall gaps) is separable from a
plan change (different stage set / skewed stage time)."""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bigdata_imgprocessing_spark.core.session import build_session
from bigdata_imgprocessing_spark.queries import QUERIES

NAME = os.environ.get("PROF_QUERY", "pq_ann_recall")
REPS = int(os.environ.get("PROF_REPS", "4"))


def stages(ui: str, app: str) -> list[dict]:
    with urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/stages") as r:
        return json.load(r)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # build_session pins spark.ui.enabled=false; the status API needs
    # the UI, so replicate the factory's conf with the UI on.
    import bigdata_imgprocessing_spark.core.session as sess_mod
    from pyspark.sql import SparkSession

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 4)
    spark = (
        SparkSession.builder.appName("profile")
        .master(f"local[{cpus}]")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(max(cpus, 32)))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    assert sess_mod  # keep the import explicit
    spark.sparkContext.setLogLevel("ERROR")
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    li.groupBy("l_returnflag").count().collect()
    _warm = pandas_udf(lambda s: s, "long")
    spark.range(1000).select(_warm("id")).count()

    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    runs = []
    for i in range(REPS):
        before = {s["stageId"] for s in stages(ui, app)}
        t0 = time.perf_counter()
        df = QUERIES[NAME](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
        new = [s for s in stages(ui, app) if s["stageId"] not in before]
        runs.append((wall, new))
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()

    for i, (wall, new) in enumerate(runs):
        run_ms = sum(s.get("executorRunTime", 0) for s in new)
        cpu_ms = sum(s.get("executorCpuTime", 0) for s in new) / 1e6
        print(f"\nrun {i}: wall={wall:.2f}s stages={len(new)} "
              f"executorRunTime={run_ms/1000:.2f}s cpu={cpu_ms/1000:.2f}s")
        top = sorted(new, key=lambda s: -s.get("executorRunTime", 0))[:8]
        for s in top:
            print(f"  stage {s['stageId']:>4} {s['status']:<9} "
                  f"run={s.get('executorRunTime',0)/1000:6.2f}s "
                  f"tasks={s.get('numCompleteTasks',0):>3} "
                  f"shufRead={s.get('shuffleReadBytes',0)>>10}K "
                  f"{s.get('name','')[:60]}")
    spark.stop()


if __name__ == "__main__":
    main()
