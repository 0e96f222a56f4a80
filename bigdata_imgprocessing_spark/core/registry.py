"""Query registry — the driver-contract surface.

Every SQL-expressible operator from SURVEY.md §2 is registered here as a
named query (a callable ``(spark, sf_dir) -> DataFrame``) together with the
ANSI-SQL oracle DuckDB runs on the same parquet tables. Keeping the oracle
next to the Spark plan makes the parity contract reviewable in one place.

Column-name discipline: the driver's compare sorts columns by name before
hashing values, so every computed column is aliased identically in the
Spark plan and the oracle SQL.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register ``fn`` as a named query; ``oracle`` is DuckDB SQL over the
    pre-registered views (region nation customer supplier part orders
    lineitem events documents embeddings). ``oracle=None`` marks a
    genuinely non-SQL-expressible op (driver falls back to rows-only)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco
