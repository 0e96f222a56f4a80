"""Table catalog over the driver-generated parquet star schema.

Parquet is the native storage format (columnar, statistics, predicate
pushdown, partition pruning); the reference's ``;``-CSV and binary-file
ingest live in ``sources``/``images`` as ingest formats, not storage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one catalog table. Column pruning + filter pushdown reach the
    scan because callers express plans declaratively on the returned DF."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; catalog has {TABLES}")
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS) which Spark's vectorized
        # reader rejects; read nanos as long and convert to a microsecond
        # timestamp (sub-µs truncation — DuckDB keeps ns; all time queries
        # therefore compare at >=second granularity).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        return df.withColumn(
            "ts", F.timestamp_micros(F.floor(F.col("ts") / 1000).cast("long"))
        )
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")
