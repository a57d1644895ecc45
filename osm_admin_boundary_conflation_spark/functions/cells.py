"""Deterministic H3-style grid cell index (G21).

The north rule requires "batched H3/S2 cell encoding"; the h3 library is
not available in this environment, so we use a deterministic
equal-angle quantization grid. The scheme only needs determinism,
hierarchy and locality — all satisfied:

- resolution r has cell edge ``RES0_DEG / 2**r`` degrees,
- cell id is ``"r{r}:{row}:{col}"`` with
  row = floor((lat + 90) / size), col = floor((lon + 180) / size),
- a child cell's (row, col) integer-divides to its parent's → hierarchy.

Crucially the encoding is pure ``floor`` arithmetic, so the DuckDB
correctness oracle can recompute it in ANSI SQL, and the Spark side can
compute it JVM-side with built-in expressions (no UDF in the hot path).
"""

from __future__ import annotations

import numpy as np

RES0_DEG = 4.0  # resolution-0 cell edge in degrees


def cell_size_deg(res: int) -> float:
    return RES0_DEG / (2.0**res)


def encode_cells(lon, lat, res: int) -> np.ndarray:
    """Vectorized lat/lon → cell id strings."""
    size = cell_size_deg(res)
    row = np.floor((np.asarray(lat, np.float64) + 90.0) / size).astype(np.int64)
    col = np.floor((np.asarray(lon, np.float64) + 180.0) / size).astype(np.int64)
    return np.array([f"r{res}:{r}:{c}" for r, c in zip(row, col)], dtype=object)


def cell_bounds(cell_id: str) -> tuple[float, float, float, float]:
    """cell id → (min_lon, min_lat, max_lon, max_lat)."""
    res_s, row_s, col_s = cell_id.split(":")
    res, row, col = int(res_s[1:]), int(row_s), int(col_s)
    size = cell_size_deg(res)
    return (col * size - 180.0, row * size - 90.0, (col + 1) * size - 180.0, (row + 1) * size - 90.0)


def cover_bbox(min_lon: float, min_lat: float, max_lon: float, max_lat: float, res: int) -> list[str]:
    """All cells intersecting a bbox (inclusive of edge-touching cells)."""
    size = cell_size_deg(res)
    r0 = int(np.floor((min_lat + 90.0) / size))
    r1 = int(np.floor((max_lat + 90.0) / size))
    c0 = int(np.floor((min_lon + 180.0) / size))
    c1 = int(np.floor((max_lon + 180.0) / size))
    return [f"r{res}:{r}:{c}" for r in range(r0, r1 + 1) for c in range(c0, c1 + 1)]


def cover_polygon(mp: list[list[np.ndarray]], res: int) -> list[str]:
    """Cells intersecting a multipolygon: bbox cells filtered by
    rectangle-polygon intersection (any cell corner/center in polygon,
    any polygon vertex in cell, or edge crossing).
    """
    from . import geometry as G

    out: list[str] = []
    bx = G.bbox(mp)
    for cid in cover_bbox(*bx, res=res):
        lo_lon, lo_lat, hi_lon, hi_lat = cell_bounds(cid)
        if _rect_intersects_mp(lo_lon, lo_lat, hi_lon, hi_lat, mp):
            out.append(cid)
    return out


def _rect_intersects_mp(lo_lon, lo_lat, hi_lon, hi_lat, mp) -> bool:
    from . import geometry as G

    probes = np.array(
        [
            [lo_lon, lo_lat],
            [hi_lon, lo_lat],
            [hi_lon, hi_lat],
            [lo_lon, hi_lat],
            [(lo_lon + hi_lon) / 2.0, (lo_lat + hi_lat) / 2.0],
        ]
    )
    if G.points_in_multipolygon(probes, mp).any():
        return True
    # any polygon vertex inside the rect
    for poly in mp:
        for ring in poly:
            inside = (
                (ring[:, 0] >= lo_lon)
                & (ring[:, 0] <= hi_lon)
                & (ring[:, 1] >= lo_lat)
                & (ring[:, 1] <= hi_lat)
            )
            if inside.any():
                return True
    # edge crossing: clip each ring's segments against the rect
    rect = G.rect_ring(lo_lon, lo_lat, hi_lon, hi_lat)
    for poly in mp:
        for ring in poly:
            clipped = G.clip_convex(ring, rect)
            if len(clipped) >= 3:
                return True
    return False


def parent_cell(cell_id: str) -> str:
    res_s, row_s, col_s = cell_id.split(":")
    res, row, col = int(res_s[1:]), int(row_s), int(col_s)
    assert res > 0
    return f"r{res - 1}:{row // 2}:{col // 2}"
