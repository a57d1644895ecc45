"""Distributed connected components for dedup-cluster resolution.

Near-dup detection (MinHash/SimHash/LSH) emits PAIRS; turning pairs into
dedup GROUPS ("keep one doc per cluster") is a connected-components
problem over the pair graph. The reference resolves duplicate ways into a
single representative per identical-geometry group
(reference: conflate-boundaries.py:214-258 picks one way per duplicate
set); this generalizes that to transitive near-dup chains at corpus
scale.

Algorithm: iterative min-label propagation to a fixpoint. Each round is
one shuffle (edge join + groupBy min); rounds needed = graph diameter.
Near-dup graphs have tiny, shallow components (a doc and its variants),
so diameter is small in practice — at 100 TB with adversarially long
chains, switch to alternating large-star/small-star (Kiveris et al.,
"Connected Components in MapReduce and Beyond"), which converges in
O(log n) rounds with the same per-round plan shape. Every round cuts
lineage with localCheckpoint so the plan does not grow unboundedly.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    max_iter: int = 25,
) -> DataFrame:
    """Label every node with the MIN node id in its connected component.

    nodes: one column ``id`` (bigint). edges: columns ``src``, ``dst``
    (undirected; either orientation). Returns (id, cluster_id) —
    singletons get cluster_id = id.

    Deterministic: the fixpoint of min-propagation is unique regardless
    of iteration order or partitioning.
    """
    # materialize the symmetric edge list ONCE — upstream edge producers
    # (e.g. the whole MinHash-LSH verify pipeline) must not re-execute on
    # every propagation round
    sym = (
        edges.select(F.col("src").alias("u"), F.col("dst").alias("v"))
        .union(edges.select(F.col("dst").alias("u"), F.col("src").alias("v")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = nodes.select("id", F.col("id").alias("label")).localCheckpoint(eager=True)

    for _ in range(max_iter):
        # min label among neighbours (one shuffle: join on v + groupBy u)
        neigh = (
            sym.join(labels.select(F.col("id").alias("v"), "label"), "v")
            .groupBy("u")
            .agg(F.min("label").alias("nlabel"))
        )
        new = (
            labels.join(neigh.select(F.col("u").alias("id"), "nlabel"), "id", "left")
            .select(
                "id",
                F.least("label", F.coalesce("nlabel", "label")).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new.join(labels.select("id", F.col("label").alias("old")), "id")
            .filter(F.col("label") != F.col("old"))
            .count()
        )
        labels = new
        if changed == 0:
            break

    return labels.select("id", F.col("label").alias("cluster_id"))


def bfs_hops(edges: DataFrame, source: int, max_hops: int = 10) -> DataFrame:
    """Minimum hop count from `source` to every reachable node.

    edges: (src, dst) undirected. Frontier expansion: each round joins
    the CURRENT frontier to the edge list (one shuffle), anti-joins
    already-visited nodes, and checkpoints — the distributed BFS shape
    (at 1000 executors the frontier join partitions by vertex; a
    high-diameter graph wants bidirectional search or CC-style pointer
    doubling instead).
    """
    sym = (
        edges.select(F.col("src").alias("u"), F.col("dst").alias("v"))
        .union(edges.select(F.col("dst").alias("u"), F.col("src").alias("v")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    spark = edges.sparkSession
    visited = spark.createDataFrame([(source, 0)], "id long, hop int").localCheckpoint(
        eager=True
    )
    frontier = visited
    for hop in range(1, max_hops + 1):
        nxt = (
            frontier.join(sym, frontier.id == sym.u)
            .select(F.col("v").alias("id"))
            .distinct()
            .join(visited.select("id"), "id", "left_anti")
            .select("id", F.lit(hop).cast("int").alias("hop"))
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            break
        visited = visited.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt
    return visited
