"""Grid-blocked distributed DBSCAN (Ester et al., KDD'96).

Density clustering over planar integer points — the spatial-clustering
counterpart of the engine's boundary grouping (the reference groups
duplicate ways by shared geometry, conflate-boundaries.py:214-258; DBSCAN
generalizes "same place" to "dense neighbourhood" for POI/page-coordinate
corpora).

Scale shape: candidate pairs come from an eps-grid 3x3 neighbour-cell
equi-join — the same blocking family as ``operators/spatial_join`` /
``operators/knn`` — never all-pairs. A pair within Euclidean eps is
within Chebyshev eps, so its cells differ by at most 1 per axis and the
exploded 9-cell probe is a COMPLETE candidate generator; the exact
``d2 <= eps^2`` filter runs on candidates only. Cluster formation is
connected components over the core-core eps-graph
(``operators/graph.connected_components`` — one Spark job per round,
Observation-folded convergence), so the whole operator is
{one blocked self-join} + {one groupBy} + {O(diameter) CC rounds}: no
stage is quadratic in the corpus.

Semantics (deterministic):
- ``core``: |N_eps(p)| >= min_pts, where N_eps INCLUDES p itself.
- clusters: connected components of core points under the eps graph;
  cluster id = min core id in the component.
- ``border``: non-core point with >=1 core eps-neighbour; it joins the
  MIN cluster id among its core neighbours (the deterministic
  tie-break for the classic "border point reachable from two
  clusters" ambiguity).
- ``noise``: everything else; cluster_id = -1.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from .graph import connected_components


def eps_neighbor_pairs(points: DataFrame, eps: int) -> DataFrame:
    """All unordered pairs (ia < ib) within Euclidean eps.

    points: columns ``id`` (bigint), ``x``, ``y`` (non-negative bigint).
    One side explodes to its 3x3 neighbour cells (cell = eps grid) and
    equi-joins the other side's home cell, so each qualifying pair meets
    exactly once: (a expl -> cell(b)) keeps ia < ib, the mirror copy is
    filtered. Returns (ia, ib, d2).
    """
    p = points.select(
        "id",
        "x",
        "y",
        F.expr(f"x div {eps}").alias("cx"),
        F.expr(f"y div {eps}").alias("cy"),
    )
    offs = F.expr(
        "explode(transform(sequence(0, 8), "
        "i -> struct(CAST(i div 3 AS BIGINT) - 1 AS dx, CAST(i % 3 AS BIGINT) - 1 AS dy)))"
    )
    a = p.select(
        F.col("id").alias("ia"),
        F.col("x").alias("xa"),
        F.col("y").alias("ya"),
        "cx",
        "cy",
        offs.alias("o"),
    ).select(
        "ia",
        "xa",
        "ya",
        (F.col("cx") + F.col("o.dx")).alias("jx"),
        (F.col("cy") + F.col("o.dy")).alias("jy"),
    )
    b = p.select(
        F.col("id").alias("ib"),
        F.col("x").alias("xb"),
        F.col("y").alias("yb"),
        F.col("cx").alias("jx"),
        F.col("cy").alias("jy"),
    )
    dx = F.col("xa") - F.col("xb")
    dy = F.col("ya") - F.col("yb")
    return (
        a.join(b, ["jx", "jy"])
        .filter(F.col("ia") < F.col("ib"))
        .withColumn("d2", dx * dx + dy * dy)
        .filter(F.col("d2") <= eps * eps)
        .select("ia", "ib", "d2")
    )


def dbscan(points: DataFrame, eps: int, min_pts: int, max_iter: int = 25) -> DataFrame:
    """Label every point (id, role, cluster_id); role in core/border/noise.

    The pair list feeds four branches (degrees, core filter, CC edges,
    border assignment), so it is checkpointed once — upstream point
    synthesis never re-executes per consumer.
    """
    pairs = eps_neighbor_pairs(points, eps).localCheckpoint(eager=True)
    sym = pairs.select(F.col("ia").alias("id"), F.col("ib").alias("nb")).union(
        pairs.select(F.col("ib").alias("id"), F.col("ia").alias("nb"))
    )
    deg = sym.groupBy("id").agg(F.count("*").alias("deg"))
    flagged = (
        points.select("id")
        .join(deg, "id", "left")
        .select("id", ((F.coalesce("deg", F.lit(0)) + 1) >= min_pts).alias("is_core"))
    )
    core = flagged.filter("is_core").select("id")
    core_edges = (
        pairs.join(core.select(F.col("id").alias("ia")), "ia", "semi")
        .join(core.select(F.col("id").alias("ib")), "ib", "semi")
        .select(F.col("ia").alias("src"), F.col("ib").alias("dst"))
    )
    clab = connected_components(core, core_edges, max_iter=max_iter)

    border = (
        sym.join(clab.select(F.col("id").alias("nb"), "cluster_id"), "nb")
        .join(core, "id", "anti")
        .groupBy("id")
        .agg(F.min("cluster_id").alias("b_cluster"))
    )
    return (
        flagged.join(clab, "id", "left")
        .join(border, "id", "left")
        .select(
            "id",
            F.when(F.col("is_core"), F.lit("core"))
            .when(F.col("b_cluster").isNotNull(), F.lit("border"))
            .otherwise(F.lit("noise"))
            .alias("role"),
            F.coalesce("cluster_id", "b_cluster", F.lit(-1).cast("long")).alias("cluster_id"),
        )
    )
