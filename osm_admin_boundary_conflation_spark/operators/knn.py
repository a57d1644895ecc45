"""Exact distributed kNN join: points → k nearest reference sites.

The reference's candidate-matching step (conflate.py central join /
README "find nearest admin boundary") needs, per extracted page
coordinate, the k nearest boundary centroids. A crossJoin against a
broadcast dim is right when the site table is dim-sized; when the site
side scales with the corpus it is O(P·S). This operator is the scale
path: the classic two-round sample-bounded cell-probe kNN join (the
shape used by Spark spatial extensions like Simba/Sedona, rebuilt here
on plain DataFrame ops):

1. **Bound**: broadcast a deterministic sample of ≥k sites to every
   point; the k-th smallest distance to ANY subset of ≥k sites is a
   valid UPPER bound d_up on the true k-th distance.
2. **Probe**: explode, per point, exactly the grid cells that intersect
   the disk of radius d_up (conservative spherical bounds below), then
   equi-join on cell key against the cell-indexed site table and take
   the per-point top-k. Every true neighbor lies inside the disk, so
   the result is EXACT — the sample quality only affects how many
   candidate cells are probed, never correctness.

Spherical cover bounds (R = EARTH_RADIUS_M, haversine metric):
- any site with |Δlat| > d_up/M_DEG is farther than d_up
  (d ≥ R·Δφ), M_DEG = π·R/180 meters per degree;
- for longitude, sin²(d/2R) ≥ cosφ₁·cosφ₂·sin²(Δλ/2); with φ₂ limited
  to the surviving lat band, cosφ₂ ≥ cos(φ_max), giving
  Δλ ≤ 2·asin(min(1, sin(d_up/2R)/√(cosφ₁·cosφ_max))).
  Near the poles the bound degrades to the full longitude range; the
  explode is capped at the full ring so the plan stays finite.

Both rounds are shuffles on well-distributed keys (point id / cell id);
nothing is quadratic and nothing single-tasks.
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from ..functions.geometry import EARTH_RADIUS_M
from ..functions.udfs import haversine_expr

M_PER_DEG = math.pi * EARTH_RADIUS_M / 180.0  # meridian meters per degree


def _cell(coord, size_deg: float):
    return F.floor(coord / F.lit(size_deg)).cast("long")


def knn_join(
    points: DataFrame,
    sites: DataFrame,
    k: int = 3,
    point_id: str = "url",
    site_id: str = "level9_id",
    cell_deg: float = 2.0,
    sample_size: int = 64,
    strategy: str = "auto",
    broadcast_threshold: int = 10_000,
) -> DataFrame:
    """points(point_id, lon, lat) × sites(site_id, clon, clat) →
    (point_id, knn_rank, site_id, dist) with the k nearest sites per
    point under geodesic (haversine) distance, ties broken on site_id.

    strategy: 'cross' broadcasts the whole site table (right for
    dim-sized site sets), 'bucketed' runs the two-round exact probe
    (the 100-TB path), 'auto' picks by site count vs
    broadcast_threshold.
    """
    if strategy == "auto":
        strategy = "cross" if sites.count() <= broadcast_threshold else "bucketed"

    def topk(cand: DataFrame) -> DataFrame:
        w = Window.partitionBy(point_id).orderBy("dist", site_id)
        return (
            cand.withColumn("knn_rank", F.row_number().over(w))
            .filter(F.col("knn_rank") <= k)
            .select(point_id, "knn_rank", site_id, "dist")
        )

    if strategy == "cross":
        cand = points.crossJoin(F.broadcast(sites)).withColumn(
            "dist", haversine_expr(F.col("lon"), F.col("lat"), F.col("clon"), F.col("clat"))
        )
        return topk(cand)

    # ---- bucketed (exact two-round probe) --------------------------------
    n_sample = max(k, sample_size)
    # deterministic "sample": md5-ordered prefix — uniform over site ids,
    # reproducible across runs/partitionings.
    sample = sites.orderBy(F.md5(F.col(site_id).cast("string")), site_id).limit(n_sample)
    sampled = points.crossJoin(F.broadcast(sample)).withColumn(
        "sdist", haversine_expr(F.col("lon"), F.col("lat"), F.col("clon"), F.col("clat"))
    )
    wk = Window.partitionBy(point_id).orderBy("sdist", site_id)
    bounds = (
        sampled.withColumn("rn", F.row_number().over(wk))
        .filter(F.col("rn") <= k)
        .groupBy(point_id, "lon", "lat")
        .agg(F.max("sdist").alias("d_up"))
    )

    size = float(cell_deg)
    lat_span_deg = F.col("d_up") / F.lit(M_PER_DEG)
    # cos of the extreme |lat| reachable inside the lat band (clamped)
    phi_max = F.least(F.abs(F.col("lat")) + lat_span_deg, F.lit(89.999))
    cos_prod = F.cos(F.radians(F.col("lat"))) * F.cos(F.radians(phi_max))
    sin_half = F.sin(F.col("d_up") / F.lit(2.0 * EARTH_RADIUS_M))
    lam = F.lit(2.0) * F.degrees(
        F.asin(F.least(F.lit(1.0), sin_half / F.sqrt(F.greatest(cos_prod, F.lit(1e-12)))))
    )
    # full-ring cap keeps the explode finite even at polar degradation
    lon_span_deg = F.least(lam, F.lit(180.0))

    dy = F.ceil(lat_span_deg / F.lit(size)).cast("long") + F.lit(1)
    dx = F.least(
        F.ceil(lon_span_deg / F.lit(size)).cast("long") + F.lit(1),
        F.lit(int(math.ceil(360.0 / size))),
    )
    cy0 = _cell(F.col("lat"), size)
    cx0 = _cell(F.col("lon"), size)
    # longitude cells wrap at the antimeridian: probe ids are taken
    # mod the ring size (matching the site index) and deduped so a
    # full-ring probe cannot double-count a site.
    n_lon = int(math.ceil(360.0 / size))
    probes = (
        bounds.withColumn("cy", F.explode(F.sequence(cy0 - dy, cy0 + dy)))
        .withColumn("cx", F.explode(F.sequence(cx0 - dx, cx0 + dx)))
        .withColumn("cx", F.pmod(F.col("cx"), F.lit(n_lon)))
        .select(point_id, "lon", "lat", "cx", "cy")
        .dropDuplicates([point_id, "cx", "cy"])
    )
    site_idx = sites.withColumn(
        "cx", F.pmod(_cell(F.col("clon"), size), F.lit(n_lon))
    ).withColumn("cy", _cell(F.col("clat"), size))
    cand = probes.join(site_idx, ["cx", "cy"]).withColumn(
        "dist", haversine_expr(F.col("lon"), F.col("lat"), F.col("clon"), F.col("clat"))
    )
    return topk(cand)
