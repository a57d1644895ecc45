"""Hilbert-curve space-filling index, pure JVM integer arithmetic.

The Hilbert curve preserves 2-D locality strictly better than Z-order
(no Z-shaped seam jumps), which is why table formats offer it for
multi-dimensional clustering: ranges of the Hilbert index map to more
compact rectangles, so min/max file stats prune tighter than under
zorder_key (sources/snapshot_table.py) for the same file count.

This is the canonical xy2d walk (see Hamilton, "Compact Hilbert
Indices", or the classic Warren formulation): per bit level s =
n/2 .. 1, take the quadrant bits (rx, ry), add s^2 * gray(rx, ry) to
the index, and reflect/transpose the frame. Bit tests are (v div s)
mod 2 and the quadrant Gray code is a 4-way CASE, so every step is
plain integer arithmetic that evaluates identically in Spark SQL and
any ANSI engine — no bitwise-XOR dialect risk.

Each level is materialized as its own projection (one .select per
level); threading the state through substitution instead would double
the expression tree per level (the rotation references BOTH x and y),
exploding to 2^bits nodes once Catalyst collapses the projections —
at bits=8 the collapsed tree is a few hundred nodes, which is fine.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def _gray(rx, ry):
    """s^2 multiplier: (3*rx) XOR ry for rx, ry in {0, 1} as a CASE."""
    code = rx * 2 + ry
    return (
        F.when(code == 0, 0).when(code == 1, 1).when(code == 2, 3).otherwise(2)
    )


def with_hilbert(
    df: DataFrame, xcol: str, ycol: str, out: str = "h", bits: int = 8
) -> DataFrame:
    """Append the Hilbert index of (xcol, ycol) — integer coordinates in
    [0, 2^bits) — as column ``out``. Preserves all input columns."""
    n = 1 << bits
    keep = df.columns
    cur = df.select(
        *keep,
        F.col(xcol).cast("long").alias("_hx"),
        F.col(ycol).cast("long").alias("_hy"),
        F.lit(0).cast("long").alias("_hd"),
    )
    s = n // 2
    while s > 0:
        x, y, d = F.col("_hx"), F.col("_hy"), F.col("_hd")
        rx = F.expr(f"(_hx div {s}) % 2")
        ry = F.expr(f"(_hy div {s}) % 2")
        nd = d + F.lit(s * s) * _gray(rx, ry)
        # ry=1: frame unchanged; ry=0 & rx=1: reflect then transpose;
        # ry=0 & rx=0: transpose only
        nx = F.when(ry == 1, x).when(rx == 1, F.lit(n - 1) - y).otherwise(y)
        ny = F.when(ry == 1, y).when(rx == 1, F.lit(n - 1) - x).otherwise(x)
        cur = cur.select(
            *keep, nx.alias("_hx"), ny.alias("_hy"), nd.alias("_hd")
        )
        s //= 2
    return cur.select(*keep, F.col("_hd").alias(out))
