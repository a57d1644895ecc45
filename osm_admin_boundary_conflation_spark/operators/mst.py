"""Distributed minimum spanning forest — Borůvka rounds on DataFrames.

The classic distributed MST: every component picks its cheapest
outgoing edge (all picks are simultaneously safe when edge weights are
distinct — the cut property), the picked edges merge components, and
the component count at least halves per round, so O(log n) rounds
total. Each round is:

1. annotate every edge's endpoints with their current component label
   (two equi-joins against the label table);
2. drop intra-component edges; per component, keep the min
   (w, u, v)-struct edge (one shuffled agg — the min-struct tiebreak
   makes the pick deterministic even if a caller passes duplicate
   weights);
3. contract: connected components over the picked edge set
   (operators/graph.connected_components on the component-level graph,
   which shrinks geometrically) relabel the nodes.

Nothing is quadratic and no step is a driver loop over rows; the only
driver-side values are per-round picked-edge counts (metadata scale),
used to stop early. Labels and the symmetric edge list are
localCheckpointed per round — without it every round would re-execute
the whole upstream DAG (the lesson from connected_components).

Weights must be distinct for the simultaneous picks to be safe; the
operator enforces determinism regardless via struct-min, but MST
uniqueness (what the gate asserts) needs distinctness, guaranteed by
the synthetic world and documented here for callers.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from .graph import connected_components


def boruvka_mst(nodes: DataFrame, edges: DataFrame, max_rounds: int = 20) -> DataFrame:
    """nodes(id) + undirected edges(u, v, w) -> the MST/MSF edge set
    (u, v, w). Raises RuntimeError if components still merge after
    max_rounds (non-converged forests are silently wrong)."""
    labels = nodes.select("id", F.col("id").alias("comp")).localCheckpoint(eager=True)
    e = edges.select("u", "v", "w").localCheckpoint(eager=True)
    picked_frames = []
    for _ in range(max_rounds):
        lu = labels.select(F.col("id").alias("u"), F.col("comp").alias("cu"))
        lv = labels.select(F.col("id").alias("v"), F.col("comp").alias("cv"))
        ann = e.join(lu, "u").join(lv, "v").filter(F.col("cu") != F.col("cv"))
        # per component: cheapest outgoing edge, deterministic tiebreak
        cand = ann.select(F.col("cu").alias("comp"), "w", "u", "v").unionAll(
            ann.select(F.col("cv").alias("comp"), "w", "u", "v")
        )
        picked = (
            cand.groupBy("comp")
            .agg(F.min(F.struct("w", "u", "v")).alias("e"))
            .select(F.col("e.w").alias("w"), F.col("e.u").alias("u"), F.col("e.v").alias("v"))
            .dropDuplicates(["u", "v"])
            .localCheckpoint(eager=True)
        )
        n_picked = picked.count()  # tiny job on the checkpointed picks
        if n_picked == 0:
            break
        picked_frames.append(picked)
        # contract the component graph: CC over picked edges at the
        # component level, then relabel nodes through their old comp
        comp_edges = picked.join(lu, "u").join(lv, "v").select(
            F.col("cu").alias("src"), F.col("cv").alias("dst")
        )
        comp_nodes = labels.select(F.col("comp").alias("id")).distinct()
        relab = connected_components(comp_nodes, comp_edges, max_iter=30, algorithm="star")
        labels = (
            labels.join(relab, labels["comp"] == relab["id"])
            .select(labels["id"], F.col("cluster_id").alias("comp"))
            .localCheckpoint(eager=True)
        )
    else:
        raise RuntimeError(f"boruvka_mst: still merging after {max_rounds} rounds")
    if not picked_frames:
        return edges.select("u", "v", "w").limit(0)
    out = picked_frames[0]
    for fr in picked_frames[1:]:
        out = out.unionAll(fr)
    return out.select("u", "v", "w")
