"""Distributed greedy maximal matching — locally-dominant-edge rounds.

The parallel classic (Preis / Hoepman): every alive vertex proposes its
min-(w,u,v) incident edge; an edge BOTH of whose endpoints propose it
is LOCALLY DOMINANT — lighter than every edge touching it — so the
sequential greedy-by-weight matching must contain it. All dominant
edges join the matching simultaneously, their endpoints leave the
graph, and the next round runs on the residual. With distinct weights
the fixpoint equals sequential greedy EXACTLY (induction: the global
min edge is always dominant; remove its endpoints and recurse), which
is what the differential test pins against a python greedy.

Each round is two equi-joins (alive-filter), one per-vertex min-struct
aggregate and one count-2 group — all shuffles on vertex/edge keys,
nothing quadratic, no driver row loop. Rounds are O(log n) expected on
scrambled weights (adversarial sorted-path weights degrade to O(n) —
callers with such inputs should pre-scramble by hashing the weight's
tie-break, exactly how the gate world is built). Per-round
localCheckpoints cut the otherwise round-multiplicative lineage.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def greedy_matching(nodes: DataFrame, edges: DataFrame, max_rounds: int = 40) -> DataFrame:
    """nodes(id) + undirected edges(u, v, w) with DISTINCT w ->
    matched edge set (u, v, w) == sequential greedy by ascending w.
    Raises RuntimeError if live edges remain after max_rounds."""
    e = edges.select("u", "v", "w").localCheckpoint(eager=True)
    alive = nodes.select("id").localCheckpoint(eager=True)
    picked = []
    for _ in range(max_rounds):
        au = alive.select(F.col("id").alias("u"))
        av = alive.select(F.col("id").alias("v"))
        live = e.join(au, "u").join(av, "v").localCheckpoint(eager=True)
        if live.count() == 0:  # tiny job on the checkpointed residual
            break
        ek = F.struct("w", "u", "v")
        prop = live.select(F.col("u").alias("vx"), ek.alias("e")).unionAll(
            live.select(F.col("v").alias("vx"), ek.alias("e"))
        )
        best = prop.groupBy("vx").agg(F.min("e").alias("e"))
        dominant = (
            best.groupBy("e")
            .agg(F.count(F.lit(1)).alias("c"))
            .filter(F.col("c") == 2)
            .select(F.col("e.u").alias("u"), F.col("e.v").alias("v"), F.col("e.w").alias("w"))
            .localCheckpoint(eager=True)
        )
        picked.append(dominant)
        gone = dominant.select(F.col("u").alias("id")).unionAll(
            dominant.select(F.col("v").alias("id"))
        )
        alive = alive.join(gone, "id", "left_anti").localCheckpoint(eager=True)
        e = live  # residual edge set shrinks with the matching
    else:
        raise RuntimeError(f"greedy_matching: live edges after {max_rounds} rounds")
    if not picked:
        return edges.select("u", "v", "w").limit(0)
    out = picked[0]
    for fr in picked[1:]:
        out = out.unionAll(fr)
    return out
