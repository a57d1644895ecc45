"""Distributed convex hull: per-partition monotone chain + tiny merge.

The classic two-stage distributed hull (e.g. Goodrich's parallel hull
bound): every partition reduces its points to its LOCAL convex hull with
Andrew's monotone chain (exact integer cross products, numpy), and only
those candidate vertices — O(h) per partition, h = local hull size —
reach the final merge, which runs the same chain over the concatenated
candidates. The merge input is tiny (sum of partition hull sizes, not
corpus size), the same deliberately-single-task exact finish as
operators/skyline.py's pareto front; everything discarded locally can
never be a global hull vertex because a point inside a local hull is
inside the global hull.

Output is canonical and deterministic: the STRICT hull (collinear
mid-edge points dropped) in counter-clockwise ring order, position 0 at
the lexicographically smallest (x, y) vertex.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

_SCHEMA = "x long, y long"


def _chain(pts: np.ndarray) -> np.ndarray:
    """Andrew's monotone chain, strict (collinear dropped), CCW order
    starting at the lexicographically smallest point. pts: (n, 2) int64,
    assumed deduplicated."""
    if len(pts) <= 2:
        return pts[np.lexsort((pts[:, 1], pts[:, 0]))]
    p = pts[np.lexsort((pts[:, 1], pts[:, 0]))]

    def half(seq):
        out: list[np.ndarray] = []
        for q in seq:
            while (
                len(out) >= 2
                and (out[-1][0] - out[-2][0]) * (q[1] - out[-2][1])
                - (out[-1][1] - out[-2][1]) * (q[0] - out[-2][0])
                <= 0
            ):
                out.pop()
            out.append(q)
        return out

    lower = half(p)
    upper = half(p[::-1])
    # lower runs min->max along the bottom, upper max->min along the top;
    # dropping each chain's last point and concatenating yields the CCW
    # ring starting at the lexicographic minimum
    ring = lower[:-1] + upper[:-1]
    return np.array(ring, dtype=np.int64)


def _partition_hull(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for b in batches:
        if len(b) == 0:
            continue
        pts = np.unique(b[["x", "y"]].to_numpy(dtype=np.int64), axis=0)
        h = _chain(pts)
        yield pd.DataFrame({"x": h[:, 0], "y": h[:, 1]})


def convex_hull(points: DataFrame) -> DataFrame:
    """(pos, x, y): the strict global hull of the (x, y) bigint points,
    CCW from the lexicographic minimum. Stage 1 is mapInPandas (Arrow,
    one pass, no shuffle); stage 2 merges the few surviving candidates
    in one task."""
    cand = points.select("x", "y").mapInPandas(_partition_hull, _SCHEMA)

    def merge(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        allp = pd.concat(list(batches), ignore_index=True)
        if len(allp) == 0:
            return
        pts = np.unique(allp[["x", "y"]].to_numpy(dtype=np.int64), axis=0)
        h = _chain(pts)
        yield pd.DataFrame(
            {"pos": np.arange(len(h), dtype=np.int64), "x": h[:, 0], "y": h[:, 1]}
        )

    return cand.coalesce(1).mapInPandas(merge, "pos long, x long, y long")
