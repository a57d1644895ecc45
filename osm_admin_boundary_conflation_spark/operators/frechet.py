"""Discrete Fréchet distance between polylines (squared-integer metric).

The trajectory-similarity primitive (dog-walking distance): the minimal
over all monotone couplings of the max pairwise distance. The reference
scores candidate boundary shapes with Hausdorff (measure_quality.py);
Fréchet is the order-aware refinement for open polylines (GPS traces,
way geometries) where Hausdorff ignores traversal order.

dp[i][j] = max(d2(P_i, Q_j), min(dp[i-1][j], dp[i][j-1], dp[i-1][j-1]))
over SQUARED integer distances, so the whole table is exact int64 —
no sqrt until (optionally) the caller's display layer.

The distributed shape is embarrassingly parallel per trajectory PAIR:
the gate query ships each pair through one applyInPandas group (Arrow
batch), never a row-at-a-time UDF; at 100 TB the pairing itself comes
from a blocked candidate join (bbox/cell prefilter, as in
segment_crossing_join) and this kernel scores survivors only.
"""

from __future__ import annotations

import numpy as np


def discrete_frechet2(px, py, qx, qy) -> int:
    """Squared discrete Fréchet distance between P and Q (int arrays)."""
    px = np.asarray(px, dtype=np.int64)
    py = np.asarray(py, dtype=np.int64)
    qx = np.asarray(qx, dtype=np.int64)
    qy = np.asarray(qy, dtype=np.int64)
    n, m = len(px), len(qx)
    # full pairwise squared-distance matrix (n*m ints; callers bound n,m)
    dx = px[:, None] - qx[None, :]
    dy = py[:, None] - qy[None, :]
    d2 = dx * dx + dy * dy
    dp = np.empty((n, m), dtype=np.int64)
    dp[0, 0] = d2[0, 0]
    for j in range(1, m):
        dp[0, j] = max(dp[0, j - 1], d2[0, j])
    for i in range(1, n):
        dp[i, 0] = max(dp[i - 1, 0], d2[i, 0])
        row, prev = dp[i], dp[i - 1]
        for j in range(1, m):
            best = prev[j]
            if prev[j - 1] < best:
                best = prev[j - 1]
            if row[j - 1] < best:
                best = row[j - 1]
            row[j] = best if best > d2[i, j] else d2[i, j]
    return int(dp[n - 1, m - 1])
