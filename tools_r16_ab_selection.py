#!/usr/bin/env python
"""Interleaved A/B for the r16 selection-operator locate change: swaps
operators.selection.exact_rank_values between the git-HEAD form and the
working-tree form inside one session (the consumer queries import it at
call time, so the module attribute is the switch point)."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import bigdata_imgprocessing_spark.operators.selection as S
from bigdata_imgprocessing_spark.core.session import build_session
from bigdata_imgprocessing_spark.queries import QUERIES

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
HERE = os.path.dirname(os.path.abspath(__file__))


def main() -> None:
    names = sys.argv[1:]
    new_fn = S.exact_rank_values
    src = os.popen(
        f"git -C {HERE} show HEAD:bigdata_imgprocessing_spark/operators/selection.py"
    ).read()
    ns = {
        "__name__": "bigdata_imgprocessing_spark.operators._sel_old",
        "__package__": "bigdata_imgprocessing_spark.operators",
    }
    exec(compile(src, "selection.py@HEAD", "exec"), ns)
    old_fn = ns["exact_rank_values"]

    spark = build_session("r16-ab-selection")
    spark.sparkContext.setLogLevel("ERROR")
    from pyspark.sql import functions as F

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    li.groupBy("l_returnflag").count().collect()

    repeats = int(os.environ.get("AB_REPEATS", "5"))
    for n in names:
        res = {"old": [], "new": []}
        for _ in range(repeats):
            for tag, fn in (("old", old_fn), ("new", new_fn)):
                S.exact_rank_values = fn
                spark.sparkContext.setJobDescription(f"ab {tag}: {n}")
                t0 = time.perf_counter()
                QUERIES[n](spark, SF_DIR).write.format("noop").mode(
                    "overwrite"
                ).save()
                res[tag].append(time.perf_counter() - t0)
                spark.catalog.clearCache()
                spark.sparkContext._jvm.System.gc()
        S.exact_rank_values = new_fn
        print(
            f"{n:32s} old min {min(res['old']):6.3f} new min"
            f" {min(res['new']):6.3f}  ratio"
            f" {min(res['new']) / min(res['old']):.3f}  load"
            f" {os.getloadavg()[0]:.1f}\n"
            f"    old walls {' '.join(f'{x:.2f}' for x in res['old'])}\n"
            f"    new walls {' '.join(f'{x:.2f}' for x in res['new'])}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
