"""Z-order (Morton-curve) data layout for multi-dimensional pruning.

A 100 TB events table is usually range-laid-out on ONE dimension (time).
Queries filtering on a second dimension (user, tenant, device) then scan
every file. Interleaving the bits of both dimensions into a Morton key
and range-partitioning on it gives every file a tight bounding BOX in
(dim1, dim2) space, so parquet min/max statistics prune files for
filters on EITHER dimension (or both) — the technique behind
Delta/Iceberg Z-ORDER clustering, here as plain Spark expressions.

Everything is JVM bitwise arithmetic (whole-stage codegen): rank each
dimension to a 16-bit bucket, spread bits with the classic
shift-and-mask ladder, interleave. No UDF anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _spread16(x: Column) -> Column:
    """Spread a 16-bit int's bits to the even positions (0b1111 ->
    0b01010101) via the standard mask ladder. Computed in LONG: the top
    source bit lands at position 30, and the subsequent interleave shift
    puts it at 31 — the sign bit of a 32-bit int, which would flip the
    key negative and break the Morton ORDER at the dimension midpoint
    (caught by the hypothesis cross-check against a Python interleave)."""
    x = x.cast("bigint")
    x = x.bitwiseOR(F.shiftleft(x, 8)).bitwiseAND(F.lit(0x00FF00FF))
    x = x.bitwiseOR(F.shiftleft(x, 4)).bitwiseAND(F.lit(0x0F0F0F0F))
    x = x.bitwiseOR(F.shiftleft(x, 2)).bitwiseAND(F.lit(0x33333333))
    x = x.bitwiseOR(F.shiftleft(x, 1)).bitwiseAND(F.lit(0x55555555))
    return x


def morton_key(a16: Column, b16: Column) -> Column:
    """Interleave two 16-bit bucket ids into a 32-bit Morton key."""
    return _spread16(a16).bitwiseOR(F.shiftleft(_spread16(b16), 1))


def _bucket16(c: Column, cmin: Column, cmax: Column) -> Column:
    """Linear-scale a numeric column into [0, 65535] given its min/max
    (both as columns so the stats can join in without a collect)."""
    span = (cmax - cmin).cast("double")
    unit = (c - cmin).cast("double") / F.when(span > 0, span).otherwise(F.lit(1.0))
    return F.least(F.floor(unit * 65536).cast("int"), F.lit(65535))


def with_morton_key(df: DataFrame, col_a: str, col_b: str) -> DataFrame:
    """Add a ``zkey`` column interleaving ``col_a`` × ``col_b``. Min/max
    for the scaling come from a 1-row aggregate joined in by broadcast —
    one extra pass over (col_a, col_b) only, no driver collect."""
    stats = df.agg(
        F.min(col_a).alias("__amin"),
        F.max(col_a).alias("__amax"),
        F.min(col_b).alias("__bmin"),
        F.max(col_b).alias("__bmax"),
    )
    j = df.crossJoin(F.broadcast(stats))
    return j.withColumn(
        "zkey",
        morton_key(
            _bucket16(F.col(col_a), F.col("__amin"), F.col("__amax")),
            _bucket16(F.col(col_b), F.col("__bmin"), F.col("__bmax")),
        ),
    ).drop("__amin", "__amax", "__bmin", "__bmax")


def write_zordered(
    df: DataFrame, path: str, col_a: str, col_b: str, n_files: int = 16
) -> None:
    """Write ``df`` as ``n_files`` parquet files range-partitioned and
    sorted by the Morton key of (col_a, col_b). Each output file covers
    a compact box in both dimensions, so file- and row-group-level
    min/max stats prune on either column. At cluster scale n_files
    becomes O(table_size / target_file_size)."""
    z = with_morton_key(df, col_a, col_b)
    (
        z.repartitionByRange(n_files, "zkey")
        .sortWithinPartitions("zkey")
        .drop("zkey")
        .write.mode("overwrite")
        .parquet(path)
    )
