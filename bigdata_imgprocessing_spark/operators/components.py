"""Distributed connected components — the final stage of near-dup
clustering (LSH/Jaccard emit candidate PAIRS; dedup needs the transitive
closure: every document mapped to a canonical cluster representative).

Min-label propagation: each round every node takes the minimum
component label among itself and its neighbors; converges in
O(graph diameter) rounds (near-dup clusters are small and dense, so
diameter is tiny; for web-scale general graphs swap in the
large-star/small-star variant of Kiveris et al., SoCC'14, which
converges in O(log n)). Genuinely iterative — not SQL-expressible as
one query (the driver contract's rows-only class), so it lives as an
operator with unit tests rather than an oracle query.

Scale: per round, one shuffle on node id; localCheckpoint between
rounds cuts the exponentially growing lineage (the classic
iterative-algorithm failure mode on Spark).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame, src: str = "src", dst: str = "dst", max_iter: int = 20
) -> DataFrame:
    """(src, dst) undirected edge list → (node, comp) with comp = min
    node id in the component. Nodes appear iff they occur in an edge;
    union isolated nodes afterwards if needed."""
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
    )
    labels = (
        sym.groupBy("a")
        .agg(F.min("b").alias("min_nbr"))
        .select(F.col("a").alias("node"), F.least("min_nbr", F.col("a")).alias("comp"))
        .localCheckpoint()
    )

    for _ in range(max_iter):
        nbr = sym.join(labels, sym.b == labels.node).select(
            F.col("a").alias("node"), F.col("comp")
        )
        new_labels = (
            labels.union(nbr)
            .groupBy("node")
            .agg(F.min("comp").alias("comp"))
            .localCheckpoint()  # cut lineage growth between rounds
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), F.col("n.node") == F.col("o.node"))
            .where(F.col("n.comp") != F.col("o.comp"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels
