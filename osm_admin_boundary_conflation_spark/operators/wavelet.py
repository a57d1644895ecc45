"""Integer Haar wavelet (S-transform) over per-key time series.

Forward, one level, on a length-2n non-negative integer array `a`:
    s[i] = (a[2i] + a[2i+1]) div 2      (floor; operands non-negative)
    d[i] = a[2i] - a[2i+1]
Inverse:  a[2i] = s[i] + floor((d[i]+1)/2),  a[2i+1] = a[2i] - d[i].

The S-transform is the integer-lossless form of the Haar wavelet
(used by JPEG 2000 reversible mode): the floor in the average loses a
bit that the difference retains, so reconstruction is EXACT in
integers — which is what makes it gateable cross-engine. `d[i]` can be
negative, and floor-vs-truncate integer division differs between
engines on negative dividends, so the inverse computes
    floor((d+1)/2)  ==  (d + 2^40 + 1) div 2  -  2^39
whose dividend is always positive (|d| is bounded by the series
values, far below 2^40) — every engine agrees on non-negative div.

Spark-first shape: the series lives as one array column per key; each
level is a pair of `transform` higher-order expressions over halved
index sequences — JVM-evaluated, no explode, no shuffle beyond the
initial groupBy(key). At 100 TB keys are independent rows and the
wavelet is O(len) per row.

Reference analogue: none; this is the multi-resolution rollup
companion to queries.q_seasonal_decompose_daily.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

_OFF = (1 << 40) + 1
_HALF = 1 << 39


def haar_forward(arr: str, half: int) -> tuple[Column, Column]:
    """One S-transform level over array column `arr` (length 2*half):
    returns (smooth, detail) array Columns, each of length `half`.
    element_at is 1-based: pair i pairs elements 2i+1 and 2i+2."""
    s = F.expr(
        f"transform(sequence(0, {half - 1}), i -> "
        f"(element_at({arr}, i*2+1) + element_at({arr}, i*2+2)) div 2)"
    )
    d = F.expr(
        f"transform(sequence(0, {half - 1}), i -> "
        f"element_at({arr}, i*2+1) - element_at({arr}, i*2+2))"
    )
    return s, d


def haar_inverse(s: str, d: str, half: int) -> Column:
    """Invert one level from array columns `s` and `d` (length `half`)
    back to the length-2*half series."""
    def even(j: str) -> str:
        # element_at requires an INT index; div yields BIGINT
        jj = f"cast({j} as int)"
        return (
            f"(element_at({s}, {jj}) + "
            f"(element_at({d}, {jj}) + {_OFF}) div 2 - {_HALF})"
        )

    return F.expr(
        f"transform(sequence(0, {2 * half - 1}), i -> "
        f"CASE WHEN i % 2 = 0 "
        f"THEN {even('(i div 2 + 1)')} "
        f"ELSE {even('((i-1) div 2 + 1)')}"
        f" - element_at({d}, cast((i-1) div 2 + 1 as int)) END)"
    )
