"""As-of (point-in-time) join — an operator the reference lacks and Spark
has no native form for (SURVEY.md §2.5 "not present" list).

Implemented as the scalable union-merge composition rather than an
inequality join: tag both sides, union, and carry the most recent right
payload forward with ``last(ignorenulls)`` over one window. That is a
SINGLE shuffle on (key, ts) — an inequality join would either
cross-product per key or need a join + a second window dedup shuffle.
At 100 TB the union-merge also avoids row explosion when a key has many
right rows before a left row: each right row is visited once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    payload_cols: list[str] | None = None,
    prefix: str = "asof_",
    tie_break: str | None = None,
) -> DataFrame:
    """For every left row, attach the payload of the most recent right row
    with the same ``on`` key and ``right_ts <= left_ts`` (backward as-of,
    inclusive). Left rows with no prior right row keep null payloads.

    Ties on ``right_ts`` are broken EXPLICITLY: pass ``tie_break`` (a
    right column name, typically a unique id) and at equal timestamps the
    row with the greatest ``tie_break`` value wins. Without it, ties fall
    back to ordering by the full payload struct — still a total order
    (greatest payload wins, field by field), but it requires every
    payload column to be orderable (no maps) and couples the winner to
    payload contents; prefer an explicit ``tie_break``. Property-tested
    with duplicate right timestamps in tests/test_properties.py.

    Returns all left columns + ``prefix + right_ts`` + prefixed payload
    columns.
    """
    if payload_cols is None:
        payload_cols = [c for c in right.columns if c not in (on, right_ts)]

    tb_right = F.col(tie_break) if tie_break is not None else F.lit(0)
    r = right.select(
        F.col(on).alias("__key"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),  # right sorts before left at equal ts → inclusive
        tb_right.alias("__tb"),
        F.struct(F.col(right_ts).alias(f"{prefix}{right_ts}"), *[
            F.col(c).alias(f"{prefix}{c}") for c in payload_cols
        ]).alias("__payload"),
        *[F.lit(None).cast(t.dataType).alias(f"__l_{t.name}") for t in left.schema.fields],
    )
    l = left.select(
        F.col(on).alias("__key"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(r.schema["__tb"].dataType).alias("__tb"),
        F.lit(None).cast(r.schema["__payload"].dataType).alias("__payload"),
        *[F.col(c).alias(f"__l_{c}") for c in left.columns],
    )
    w = (
        Window.partitionBy("__key")
        .orderBy("__ts", "__side", "__tb", "__payload")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = r.unionByName(l).withColumn(
        "__asof", F.last("__payload", ignorenulls=True).over(w)
    )
    out = merged.where(F.col("__side") == 1).select(
        *[F.col(f"__l_{c}").alias(c) for c in left.columns],
        F.col(f"__asof.{prefix}{right_ts}").alias(f"{prefix}{right_ts}"),
        *[F.col(f"__asof.{prefix}{c}").alias(f"{prefix}{c}") for c in payload_cols],
    )
    return out
