"""Iterative algorithms over the link graph — PageRank on the
(page_from → page_to) edge list the reference pipeline produces.

This is the 'iterative algorithm' slot of the driver contract (rows-only
check: a fixed-point loop is not single-statement SQL). Spark-first
design: each iteration is one join + one aggregation on DataFrames —
Catalyst handles partial aggs; the edge list is persisted across
iterations; the dangling-node mass correction is folded INTO the lazy
plan (a 1-row aggregate broadcast via crossJoin) so an iteration adds
ZERO driver-side actions — the whole loop collapses into one job per
checkpoint interval. Lineage is truncated every ``checkpoint_every``
iterations instead of every one: localCheckpoint locally, checkpoint()
on HDFS at cluster scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    iterations: int = 8,
    checkpoint_every: int = 2,
) -> DataFrame:
    """(node, comp) — min-label propagation over an undirected edge list:
    every node's component id converges to the smallest node id reachable
    from it. This is the 'apply near-dedup' closer: MinHash/SimHash emit
    PAIRS, but keep-one-per-cluster needs the transitive closure (a~b,
    b~c ⇒ keep one of {a,b,c}).

    Spark-first loop in the pagerank mold: one join + union + groupBy-min
    per iteration, fully lazy (NO driver-side actions inside the loop),
    lineage checkpointed every ``checkpoint_every`` rounds. Min-label
    propagation covers graph diameter d in d iterations; near-dup
    clusters are shallow (dup sets, not social graphs), so a small fixed
    ``iterations`` bounds the scan count deterministically — at true
    scale use the large-star/small-star variant, which converges in
    O(log n) rounds.
    """
    sym = edges.select(
        F.col(src).alias("a"), F.col(dst).alias("b")
    ).union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b"))).persist()
    labels = sym.select(F.col("a").alias("node")).distinct().select(
        "node", F.col("node").alias("comp")
    )
    for it in range(1, iterations + 1):
        nbr = (
            sym.join(labels, sym.b == labels.node)
            .select(F.col("a").alias("node"), F.col("comp"))
        )
        labels = (
            nbr.union(labels)
            .groupBy("node")
            .agg(F.min("comp").alias("comp"))
        )
        if it % checkpoint_every == 0 or it == iterations:
            labels = labels.localCheckpoint(eager=True)
    sym.unpersist()
    return labels


def pagerank(
    edges: DataFrame,
    src: str = "page_from",
    dst: str = "page_to",
    iterations: int = 10,
    damping: float = 0.85,
    checkpoint_every: int = 2,
) -> DataFrame:
    """(node, rank) after a fixed number of synchronous iterations.

    Deterministic given the edge list (float sums vary in the last ulp
    across partitionings — callers that need hash-stable output should
    round; the unit test uses a tolerance against a NetworkX-free
    hand-rolled reference).

    Scale contract: NO driver-side action inside the loop. The
    dangling mass (total rank on nodes with no outgoing edges) is a
    1-row aggregate — ``ranks ⟕ sources`` left-anti, summed — that is
    crossJoined (broadcast, 1 row) back into the rank update, staying
    entirely lazy. On a 1000-executor cluster each checkpoint interval
    is one job; the old collect-per-iteration version ran ≥2 full jobs
    per iteration.

    ``checkpoint_every`` is deliberately small: ``ranks`` feeds BOTH the
    contribution join and the dangling aggregate, so the un-checkpointed
    LOGICAL plan doubles per iteration (the physical plan reuses the
    shared exchange, but analysis cost is exponential in the interval).
    k=2 bounds the plan at 4 rank-subtrees while halving the job count —
    at cluster scale raise it only with care."""
    nodes = (
        edges.select(F.col(src).alias("node"))
        .union(edges.select(F.col(dst).alias("node")))
        .distinct()
    )
    out_deg = edges.groupBy(src).agg(F.count(F.lit(1)).alias("out_deg"))
    # cache the static sides: re-scanned every iteration otherwise
    edges_deg = (
        edges.join(out_deg, src)
        .select(F.col(src).alias("node"), F.col(dst).alias("to"), F.col("out_deg"))
        .persist()
    )
    # distinct source nodes (nodes with outgoing edges) — static, tiny
    sources = edges_deg.select("node").distinct().persist()
    nodes = nodes.persist()
    n_nodes = nodes.count()  # one up-front action, outside the loop

    ranks = nodes.withColumn("rank", F.lit(1.0 / n_nodes))
    base = (1.0 - damping) / n_nodes
    for it in range(1, iterations + 1):
        contribs = (
            edges_deg.join(ranks, "node")
            .select(F.col("to").alias("node"), (F.col("rank") / F.col("out_deg")).alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("in_sum"))
        )
        # dangling mass as a LAZY 1-row aggregate: rank sitting on nodes
        # with no outgoing edges this round (left-anti vs. source nodes)
        dangling = (
            ranks.join(sources, "node", "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dangling_mass"))
        )
        ranks = (
            nodes.join(contribs, "node", "left")
            .crossJoin(F.broadcast(dangling))  # 1-row build side: a map stage
            .select(
                "node",
                (
                    F.lit(base)
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("in_sum"), F.lit(0.0))
                        + F.col("dangling_mass") / F.lit(float(n_nodes))
                    )
                ).alias("rank"),
            )
        )
        # truncate lineage every k rounds — each checkpoint is ONE job
        # covering k iterations; at cluster scale use checkpoint() on HDFS
        if it % checkpoint_every == 0 or it == iterations:
            ranks = ranks.localCheckpoint(eager=True)
    edges_deg.unpersist()
    sources.unpersist()
    nodes.unpersist()
    return ranks
