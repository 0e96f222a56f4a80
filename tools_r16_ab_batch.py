#!/usr/bin/env python
"""Interleaved same-session A/B for r16 batch-query changes.

Usage: tools_r16_ab_batch.py <git_ref> <module_relpath> <query...>

Execs the OLD module source from git (the @query decorator re-registers
the old forms), restores the registry to the new forms, then alternates
old/new with the bench methodology (noop sink, cache-clear + GC between
runs, min of AB_REPEATS). Loadavg printed per run so a busy window is
visible next to its number (host-noise discipline)."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bigdata_imgprocessing_spark.core.session import build_session
from bigdata_imgprocessing_spark.queries import QUERIES

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
HERE = os.path.dirname(os.path.abspath(__file__))


def main() -> None:
    ref, relpath = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    new_fns = {n: QUERIES[n] for n in names}
    snapshot = dict(QUERIES)
    QUERIES.clear()  # the decorator rejects duplicates; re-register old
    src = os.popen(f"git -C {HERE} show {ref}:{relpath}").read()
    pkg = os.path.dirname(relpath).replace("/", ".")
    ns = {"__name__": pkg + "._ab_old", "__package__": pkg}
    exec(compile(src, relpath + "@" + ref, "exec"), ns)
    old_fns = {n: QUERIES[n] for n in names}
    QUERIES.clear()
    QUERIES.update(snapshot)  # restore registry to the working tree

    spark = build_session("r16-ab-batch")
    spark.sparkContext.setLogLevel("ERROR")
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    li.groupBy("l_returnflag").count().collect()
    sup = spark.read.parquet(f"{SF_DIR}/supplier.parquet")
    li.join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey).count()
    _warm = pandas_udf(lambda s: s, "long")
    spark.range(1000).select(_warm("id")).count()

    repeats = int(os.environ.get("AB_REPEATS", "5"))
    for n in names:
        res = {"old": [], "new": []}
        for i in range(repeats):
            for tag, fn in (("old", old_fns[n]), ("new", new_fns[n])):
                spark.sparkContext.setJobDescription(f"ab {tag}: {n}")
                t0 = time.perf_counter()
                fn(spark, SF_DIR).write.format("noop").mode(
                    "overwrite"
                ).save()
                res[tag].append(time.perf_counter() - t0)
                spark.catalog.clearCache()
                spark.sparkContext._jvm.System.gc()
        load = os.getloadavg()[0]
        print(
            f"{n:32s} old min {min(res['old']):6.3f} new min"
            f" {min(res['new']):6.3f}  ratio"
            f" {min(res['new']) / min(res['old']):.3f}  load {load:.1f}\n"
            f"    old walls {' '.join(f'{x:.2f}' for x in res['old'])}\n"
            f"    new walls {' '.join(f'{x:.2f}' for x in res['new'])}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
