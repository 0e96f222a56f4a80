"""Physical-layout scale proofs (SCALING.md): bucketing kills the
fact-fact join shuffle; date-partitioned writes give partition-pruned
scans. These run against temp warehouses/dirs — the layout decisions a
100 TB deployment would bake into its tables, demonstrated and
plan-asserted at test scale."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdata_imgprocessing_spark.core.catalog import table


def test_bucketed_join_has_no_shuffle(spark, sf_dir, tmp_path):
    """Both sides bucketed by the join key into the same bucket count →
    sort-merge join with ZERO Exchange operators."""
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    l = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    # external tables with explicit locations (warehouse dir is a static conf)
    o.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").option(
        "path", str(tmp_path / "b_orders")
    ).saveAsTable("b_orders")
    l.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").option(
        "path", str(tmp_path / "b_lineitem")
    ).saveAsTable("b_lineitem")

    # disable auto-broadcast so the join would otherwise shuffle
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table("b_lineitem").join(
            spark.table("b_orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # co-located: no shuffle at all
        assert j.count() == spark.table("b_lineitem").count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_partitioned_write_prunes_scan(spark, sf_dir, tmp_path):
    """Write events date-partitioned; a day-filtered read must prune to
    that partition's directory (PartitionFilters, not a full scan)."""
    e = table(spark, sf_dir, "events").withColumn(
        "day", F.date_format("ts", "yyyy-MM-dd")
    )
    out = str(tmp_path / "events_by_day")
    e.write.partitionBy("day").mode("overwrite").parquet(out)

    got = spark.read.parquet(out).where(F.col("day") == "2024-01-05")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    plan = got._jdf.queryExecution().explainString(mode)
    assert "PartitionFilters: [isnotnull(day" in plan
    # correctness of the pruned read
    expected = e.where(F.col("day") == "2024-01-05").count()
    assert got.count() == expected > 0
