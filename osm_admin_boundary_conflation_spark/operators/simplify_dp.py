"""Douglas-Peucker polyline simplification — the classic recursive
max-deviation split, run as a per-geometry Arrow kernel.

Unlike Visvalingam-Whyatt (operators-level `simplify_vw_rounds`, which
removes a fixed number of smallest-triangle points per round and is
expressible round-by-round in relational ops), Douglas-Peucker's
recursion depth is data-dependent — the natural Spark home is ONE
shuffle (groupBy way_id) followed by grouped ``applyInPandas``: each
polyline arrives as a single Arrow batch, the whole divide-and-conquer
runs vectorized in numpy inside the group, and nothing about the
recursion ever crosses a partition boundary. At 100 TB the unit of
parallelism is the geometry (the same per-feature grain the reference's
shapely `simplify` call works at — /root/reference/conflate.py uses
per-way geometry ops throughout), so a billion ways spread over
executors with no skew beyond the largest single way, which
`segmentation.py`'s giant-way splitter already bounds upstream.

Determinism: the split point is ``argmax`` of perpendicular deviation,
numpy ties resolve to the LOWEST index, and the per-way grouping makes
the computation independent of partitioning — the same way always
yields the same kept set.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

_OUT_SCHEMA = "way_id long, idx long, px long, py long"


def douglas_peucker_mask(xs: np.ndarray, ys: np.ndarray, eps: float) -> np.ndarray:
    """Boolean keep-mask for one polyline (iterative stack, no Python
    recursion limit): endpoints are always kept; a segment splits at
    its maximum-perpendicular-deviation point while that deviation
    exceeds ``eps``. Degenerate chords (identical endpoints) fall back
    to point distance, the standard DP convention."""
    n = len(xs)
    keep = np.zeros(n, dtype=bool)
    if n == 0:
        return keep
    keep[0] = keep[n - 1] = True
    if n <= 2:
        return keep
    stack = [(0, n - 1)]
    while stack:
        i, j = stack.pop()
        if j <= i + 1:
            continue
        x1, y1, x2, y2 = xs[i], ys[i], xs[j], ys[j]
        dx, dy = x2 - x1, y2 - y1
        seg = float(np.hypot(dx, dy))
        sl = slice(i + 1, j)
        if seg == 0.0:
            d = np.hypot(xs[sl] - x1, ys[sl] - y1)
        else:
            d = np.abs(dx * (ys[sl] - y1) - dy * (xs[sl] - x1)) / seg
        k = int(np.argmax(d))
        if d[k] > eps:
            m = i + 1 + k
            keep[m] = True
            stack.append((i, m))
            stack.append((m, j))
    return keep


def douglas_peucker_brute(xs, ys, eps) -> np.ndarray:
    """Reference O(n^2) recursive DP for the property tests — textbook
    formulation, independent of the stack/vectorized implementation."""
    n = len(xs)
    keep = np.zeros(n, dtype=bool)
    if n == 0:
        return keep
    keep[0] = keep[n - 1] = True

    def rec(i: int, j: int) -> None:
        if j <= i + 1:
            return
        x1, y1, x2, y2 = xs[i], ys[i], xs[j], ys[j]
        dx, dy = x2 - x1, y2 - y1
        seg = (dx * dx + dy * dy) ** 0.5
        best_d, best_m = -1.0, -1
        for m in range(i + 1, j):
            if seg == 0.0:
                d = ((xs[m] - x1) ** 2 + (ys[m] - y1) ** 2) ** 0.5
            else:
                d = abs(dx * (ys[m] - y1) - dy * (xs[m] - x1)) / seg
            if d > best_d:
                best_d, best_m = d, m
        if best_d > eps:
            keep[best_m] = True
            rec(i, best_m)
            rec(best_m, j)

    rec(0, n - 1)
    return keep


def simplify_ways_dp(points: DataFrame, eps: float) -> DataFrame:
    """Simplify every way in ``points`` (way_id, idx, px, py) with
    Douglas-Peucker at tolerance ``eps``; returns the kept points in
    the same schema. One shuffle (groupBy way_id), then the kernel per
    Arrow group."""

    def _one_way(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("idx")
        mask = douglas_peucker_mask(
            pdf["px"].to_numpy(dtype=np.float64),
            pdf["py"].to_numpy(dtype=np.float64),
            eps,
        )
        return pdf.loc[mask, ["way_id", "idx", "px", "py"]]

    return points.groupBy("way_id").applyInPandas(_one_way, schema=_OUT_SCHEMA)
