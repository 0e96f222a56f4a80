#!/usr/bin/env python
"""Interleaved A/B for the r16 size-conditional local closure: swaps
operators.components.connected_components between the git-HEAD form and
the working-tree form inside one session (consumers import it at call
time). Also prints job counts per run."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import bigdata_imgprocessing_spark.operators.components as C
from bigdata_imgprocessing_spark.core.session import build_session
from bigdata_imgprocessing_spark.queries import QUERIES

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
HERE = os.path.dirname(os.path.abspath(__file__))


def main() -> None:
    names = sys.argv[1:]
    new_fn = C.connected_components
    src = os.popen(
        f"git -C {HERE} show HEAD:bigdata_imgprocessing_spark/operators/components.py"
    ).read()
    ns = {
        "__name__": "bigdata_imgprocessing_spark.operators._cc_old",
        "__package__": "bigdata_imgprocessing_spark.operators",
    }
    exec(compile(src, "components.py@HEAD", "exec"), ns)
    old_fn = ns["connected_components"]

    spark = build_session("r16-ab-cc")
    spark.sparkContext.setLogLevel("ERROR")
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    li.groupBy("l_returnflag").count().collect()
    st = spark.sparkContext.statusTracker()

    repeats = int(os.environ.get("AB_REPEATS", "4"))
    for n in names:
        res = {"old": [], "new": []}
        jobs = {"old": [], "new": []}
        for _ in range(repeats):
            for tag, fn in (("old", old_fn), ("new", new_fn)):
                C.connected_components = fn
                spark.sparkContext.setJobDescription(f"ab {tag}: {n}")
                j0 = max(st.getJobIdsForGroup() or [0])
                t0 = time.perf_counter()
                QUERIES[n](spark, SF_DIR).write.format("noop").mode(
                    "overwrite"
                ).save()
                res[tag].append(time.perf_counter() - t0)
                jobs[tag].append(max(st.getJobIdsForGroup() or [0]) - j0)
                spark.catalog.clearCache()
                spark.sparkContext._jvm.System.gc()
        C.connected_components = new_fn
        print(
            f"{n:32s} old min {min(res['old']):6.3f} (jobs {jobs['old']})"
            f" new min {min(res['new']):6.3f} (jobs {jobs['new']})"
            f"  ratio {min(res['new']) / min(res['old']):.3f}"
            f"  load {os.getloadavg()[0]:.1f}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
