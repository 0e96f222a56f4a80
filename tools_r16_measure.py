#!/usr/bin/env python
"""Round-15 optimization measurement harness.

Two subcommands:

  plans  <out_suffix> <query...>   — write plans/r16/<q>_<out_suffix>.txt
                                     (.explain("formatted") of the exact
                                     frame the bench times)
  time   <query...>                — isolated timing, bench methodology
                                     (noop sink, cache-clear + GC between
                                     repeats, min of N; BENCH_REPEATS env)

Same session factory as bench.py so numbers are comparable.
"""

from __future__ import annotations

import io
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bigdata_imgprocessing_spark.core.session import build_session
from bigdata_imgprocessing_spark.queries import QUERIES

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
HERE = os.path.dirname(os.path.abspath(__file__))


def capture_plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    cmd, args = sys.argv[1], sys.argv[2:]
    spark = build_session("r16-measure")
    spark.sparkContext.setLogLevel("ERROR")
    if cmd == "plans":
        suffix, names = args[0], args[1:]
        outdir = os.path.join(HERE, "plans", "r16")
        os.makedirs(outdir, exist_ok=True)
        for n in names:
            spark.sparkContext.setJobDescription(f"r16 plan: {n}")
            df = QUERIES[n](spark, SF_DIR)
            with open(os.path.join(outdir, f"{n}_{suffix}.txt"), "w") as fh:
                fh.write(capture_plan(df))
            spark.catalog.clearCache()
            print(f"plan written: {n}_{suffix}.txt", flush=True)
    elif cmd == "time":
        names = args
        repeats = max(1, int(os.environ.get("BENCH_REPEATS", "3")))
        # Same warmup as bench.py so first-query JIT/Arrow cost is excluded.
        from pyspark.sql import functions as F
        from pyspark.sql.functions import pandas_udf

        li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        li.groupBy("l_returnflag").count().collect()
        sup = spark.read.parquet(f"{SF_DIR}/supplier.parquet")
        li.join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey).count()
        _warm = pandas_udf(lambda s: s, "long")
        spark.range(1000).select(_warm("id")).count()

        for n in names:
            samples = []
            for _ in range(repeats):
                spark.sparkContext.setJobDescription(f"r16 time: {n}")
                t0 = time.perf_counter()
                df = QUERIES[n](spark, SF_DIR)
                df.write.format("noop").mode("overwrite").save()
                samples.append(time.perf_counter() - t0)
                spark.catalog.clearCache()
                spark.sparkContext._jvm.System.gc()
            print(
                f"{n:40s} min {min(samples):7.3f}  walls "
                + " ".join(f"{s:.3f}" for s in samples),
                flush=True,
            )
    spark.stop()


if __name__ == "__main__":
    main()
