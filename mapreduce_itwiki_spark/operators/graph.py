"""Iterative algorithms over the link graph — PageRank on the
(page_from → page_to) edge list the reference pipeline produces.

This is the 'iterative algorithm' slot of the driver contract (rows-only
check: a fixed-point loop is not single-statement SQL). Spark-first
design: each iteration is one join + one aggregation on DataFrames —
Catalyst handles partial aggs; the edge list is re-used across
iterations so at scale you'd persist it (and checkpoint ranks every ~10
iterations to cut lineage). Dangling nodes (no outgoing links)
redistribute uniformly, the standard correction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src: str = "page_from",
    dst: str = "page_to",
    iterations: int = 10,
    damping: float = 0.85,
) -> DataFrame:
    """(node, rank) after a fixed number of synchronous iterations.

    Deterministic given the edge list (float sums vary in the last ulp
    across partitionings — callers that need hash-stable output should
    round; the unit test uses a tolerance against a NetworkX-free
    hand-rolled reference)."""
    nodes = (
        edges.select(F.col(src).alias("node"))
        .union(edges.select(F.col(dst).alias("node")))
        .distinct()
    )
    n_nodes = nodes.count()
    out_deg = edges.groupBy(src).agg(F.count(F.lit(1)).alias("out_deg"))
    # cache the static sides: re-scanned every iteration otherwise
    edges_deg = (
        edges.join(out_deg, src)
        .select(F.col(src).alias("node"), F.col(dst).alias("to"), F.col("out_deg"))
        .persist()
    )
    ranks = nodes.withColumn("rank", F.lit(1.0 / n_nodes))
    base = (1.0 - damping) / n_nodes
    for _ in range(iterations):
        contribs = (
            edges_deg.join(ranks, "node")
            .select(F.col("to").alias("node"), (F.col("rank") / F.col("out_deg")).alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("in_sum"))
        )
        # dangling mass: rank that had no outgoing edges this round
        linked_mass = (
            edges_deg.select("node", "out_deg").distinct().join(ranks, "node")
            .agg(F.sum("rank"))
            .collect()[0][0]
            or 0.0
        )
        dangling = 1.0 - linked_mass
        ranks = nodes.join(contribs, "node", "left").select(
            "node",
            (
                F.lit(base)
                + F.lit(damping)
                * (F.coalesce(F.col("in_sum"), F.lit(0.0)) + F.lit(dangling / n_nodes))
            ).alias("rank"),
        )
        # truncate lineage each round — without this, iteration k replays
        # all k-1 prior joins (and the dangling-mass action makes that
        # quadratic); at cluster scale use checkpoint() on HDFS instead
        ranks = ranks.localCheckpoint(eager=True)
    edges_deg.unpersist()
    return ranks
