"""Exact distributed closest-pair-of-points over integer coordinates.

Two-phase grid algorithm (the MapReduce-folklore shape, made exact):

1. **Upper bound**: take a small deterministic sample (lowest ``id``
   values via TakeOrderedAndProject) and compute its min pairwise
   squared distance on the driver side of a broadcast — ANY pair gives
   a valid upper bound ``d2_ub >= d2_min``, so correctness never
   depends on the sample being lucky; only phase-2's candidate count
   does (documented below).
2. **Refine**: grid every point at cell size ``ceil(sqrt(d2_ub))``.
   The true closest pair lies within ``sqrt(d2_ub)`` of each other, so
   its two points fall in the same or 3x3-adjacent cells — the
   exploded-neighbor equi join enumerates exactly those candidates and
   the global min is a ``TakeOrderedAndProject`` (no single-partition
   window, no full sort).

Scale notes (10^12 points): phase 1 is a bounded ``limit(k)`` +
broadcast; phase 2's join is equi on cell with per-cell population
``density * cell_area`` — a loose ``d2_ub`` in adversarially clustered
data inflates candidates, in which case re-running phase 2 with the
(now tight) phase-2 output as the new bound converges in one extra
round; the synthetic worlds here never need it. All arithmetic is
int64 (squared distances), so results are bit-identical across
engines and partitionings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def closest_pair(points: DataFrame, sample_k: int = 256) -> DataFrame:
    """(id_a, id_b, d2): the globally closest pair of ``(id, x, y)``
    int64 points (id_a < id_b), ties broken by (d2, id_a, id_b).
    Duplicate coordinates are legal (d2 = 0 wins)."""
    pts = points.select("id", "x", "y")

    # Phase 1: deterministic sample -> exact min pairwise d2 among it.
    samp = pts.orderBy("id").limit(sample_k)
    a, b = samp.alias("a"), samp.alias("b")
    ub = (
        a.join(F.broadcast(b), F.col("a.id") < F.col("b.id"))
        .select(
            (
                (F.col("a.x") - F.col("b.x")) * (F.col("a.x") - F.col("b.x"))
                + (F.col("a.y") - F.col("b.y")) * (F.col("a.y") - F.col("b.y"))
            ).alias("d2")
        )
        .agg(F.min("d2").alias("d2_ub"))
        .collect()[0]["d2_ub"]
    )
    # Degenerate inputs (< 2 sample points) have no pair at all.
    if ub is None:
        return pts.sparkSession.createDataFrame([], "id_a long, id_b long, d2 long")
    # Cell size c >= sqrt(d2_ub) so any pair closer than the bound is
    # same-or-adjacent-cell. Integer ceil(sqrt) without float trust:
    # start from the float estimate and fix up.
    c = max(1, int(float(ub) ** 0.5))
    while c * c < ub:
        c += 1

    g = pts.select(
        "id", "x", "y",
        (F.col("x") - (((F.col("x") % c) + c) % c)).alias("cx0"),
        (F.col("y") - (((F.col("y") % c) + c) % c)).alias("cy0"),
    ).select(
        "id", "x", "y",
        F.expr(f"cx0 div {c}").alias("cx"),
        F.expr(f"cy0 div {c}").alias("cy"),
    )
    probe = g.select(
        F.col("id").alias("id_b"),
        F.col("x").alias("xb"),
        F.col("y").alias("yb"),
        F.explode(F.sequence(F.col("cx") - 1, F.col("cx") + 1)).alias("cx"),
        F.col("cy").alias("cy1"),
    ).select(
        "id_b", "xb", "yb", "cx",
        F.explode(F.sequence(F.col("cy1") - 1, F.col("cy1") + 1)).alias("cy"),
    )
    cand = g.join(probe, ["cx", "cy"]).filter(F.col("id") < F.col("id_b"))
    d2 = (F.col("x") - F.col("xb")) * (F.col("x") - F.col("xb")) + (
        F.col("y") - F.col("yb")
    ) * (F.col("y") - F.col("yb"))
    return (
        cand.select(
            F.col("id").alias("id_a"), "id_b", d2.cast("long").alias("d2")
        )
        .filter(F.col("d2") <= F.lit(int(ub)))
        .orderBy("d2", "id_a", "id_b")
        .limit(1)
    )
