"""SparkSession factory with scale-oriented defaults.

Local testing runs ``local[N]`` single-JVM, but every setting here is
chosen for the 1000-executor / 100 TB target: AQE handles runtime
coalescing and skew-join splitting, broadcast threshold keeps dimension
joins shuffle-free, and Arrow makes the unavoidable Python stages batched
instead of row-at-a-time (the reference pays JVM<->Python socket serde per
row — SURVEY.md §3.1).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def build_session(app_name: str = "bigdata_imgprocessing_spark", cpus: int | None = None) -> SparkSession:
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 4)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        # AQE: runtime partition coalescing, skew-join splitting, plan re-opt.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Sized for local test SFs; a real cluster would set this to
        # ~2-3x total cores (or rely on AQE initialPartitionNum).
        .config("spark.sql.shuffle.partitions", str(max(cpus, 32)))
        # Arrow for pandas_udf / toPandas — the fast Python boundary.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Python DataSource filter pushdown (required once a reader
        # implements pushFilters — see sources/fimg_source.py)
        .config("spark.sql.python.filterPushdown.enabled", "true")
        # events.ts is parquet TIMESTAMP(NANOS), which the vectorized
        # reader rejects; always-on for this corpus (set here once, not
        # toggled per-read — a mid-session flip would change how other
        # concurrent parquet reads interpret nanos columns)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Deterministic wall-clock semantics for timestamp queries: the
        # DuckDB oracle treats naive parquet timestamps as tz-free, so we
        # pin the session to UTC (container default, made explicit).
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
    )
    return builder.getOrCreate()


def cache_parallelism(spark: SparkSession) -> int:
    """Partition count to coalesce to before cache()/localCheckpoint().

    Cached/checkpointed frames FREEZE their partitioning: AQE never
    re-coalesces them (spark.sql.optimizer.canChangeCachedPlanOutputPartitioning
    defaults false), so a frame cached under a default-conf session
    keeps 200 partitions and every downstream stage pays 200 tasks —
    measured 14.5s vs ~2s for the ngram posting-list query at sf0.01.
    defaultParallelism = total cores on any deployment, which is the
    right materialization width locally AND on a cluster. coalesce() to
    it is a no-op when the frame is already narrower."""
    return spark.sparkContext.defaultParallelism


def scaled_width(spark: SparkSession, floor: int = 4) -> int:
    """Partition width for CORPUS-PROPORTIONAL intermediate and store
    frames (LSH candidate/member/shingle-set frames, landed stores).

    A fixed ``coalesce(4)`` is right at driver sf — these frames hold
    dozens of rows and task overhead dominates — but candidate volume
    grows with the corpus (98,793 pairs at 10M docs per SCALING.md), so
    a fixed width serializes the exact-Jaccard verify join and the
    store write onto 4-8 tasks at 100x. Scale with the deployment's
    core count instead (defaultParallelism = total cores on any
    cluster); ``floor`` keeps artificially narrow local sessions at
    least as wide as the old fixed values (VERDICT r12 item 1)."""
    return max(floor, cache_parallelism(spark))


def ensure_utc(spark: SparkSession) -> SparkSession:
    """Pin session timezone to UTC (idempotent, runtime-mutable conf).

    Called by time-bucketing queries so wall-clock extraction
    (``date_format`` etc.) matches the tz-free DuckDB oracle even when the
    caller-provided session was built with other defaults."""
    if spark.conf.get("spark.sql.session.timeZone") != "UTC":
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    return spark
