"""Bucketed interval (range) join.

Joining points to the intervals that CONTAIN them (`s <= x < e`) is an
inequality join — naively a nested-loop cross product that Catalyst
executes as BroadcastNestedLoopJoin (fine only when one side is tiny).
This operator turns it into an equi-join, the same trick the spatial
cell join uses in one dimension (operators/spatial_join.py:70-137):

- each interval is replicated to every fixed-width bucket it overlaps
  (``floor(s/w) .. floor((e-1)/w)``, JVM sequence+explode);
- each point lands in exactly ONE bucket (``floor(x/w)``);
- equi-join on the bucket, then the exact residual predicate.

Because the point has a single bucket, each (point, interval) pair meets
exactly once — no post-join dedup. Replication factor is
``ceil(len/w)+1`` per interval, so pick ``w`` near the typical interval
length: shuffle volume is points + intervals*(len/w), both spread over
well-distributed bucket keys. At 100 TB both sides shuffle once on the
bucket key; skewed hot buckets (a burst of points in one time slice)
can reuse the salting pattern from the spatial join.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    x: str = "x",
    s: str = "s",
    e: str = "e",
    width: int = 16,
) -> DataFrame:
    """Inner-join points to containing half-open intervals [s, e).

    points must carry integer column `x`; intervals integer `s` < `e`.
    All other columns pass through. Returns the matched rows.
    """
    b_pts = points.withColumn("_bucket", F.floor(F.col(x) / F.lit(width)))
    b_int = intervals.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(s) / F.lit(width)),
                F.floor((F.col(e) - 1) / F.lit(width)),
            )
        ),
    )
    residual: Column = (F.col(s) <= F.col(x)) & (F.col(x) < F.col(e))
    return b_pts.join(b_int, "_bucket").filter(residual).drop("_bucket")
