"""Distributed dense index: 0..N-1 by sort order, without the
single-partition global-window antipattern.

`row_number().over(Window.orderBy(col))` collapses the whole table
into ONE task. The scalable shape: bucket rows by DETERMINISTIC
fixed-width ranges of the order column (NOT repartitionByRange — its
sampled boundaries are not stable across the two jobs this needs),
count rows per bucket (tiny driver-side cumsum — O(#buckets), not
O(rows)), then add each bucket's offset to a bucket-local row_number
(a window partitioned by bucket: parallel, no global sort).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def dense_index(
    df: DataFrame,
    order_col: str,
    index_col: str = "k",
    num_buckets: int | None = None,
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """``tiebreak``: extra columns appended to the within-bucket window
    order so equal ``order_col`` values rank deterministically (the
    bucket boundaries only ever split on ``order_col``, so ties always
    land in the same bucket and a bucket-local tiebreak IS a global
    one)."""
    n = num_buckets or df.sparkSession.sparkContext.defaultParallelism * 2
    stats = df.agg(
        F.min(order_col).alias("lo"), F.max(order_col).alias("hi")
    ).collect()[0]
    lo, hi = stats["lo"], stats["hi"]
    width = max(1, (int(hi) - int(lo)) // n + 1)
    bucket = F.least(F.lit(n - 1), ((F.col(order_col) - F.lit(lo)) / F.lit(width)).cast("int"))
    b = df.withColumn("_bkt", bucket)
    counts = sorted(
        (r["_bkt"], r["cnt"]) for r in b.groupBy("_bkt").agg(F.count("*").alias("cnt")).collect()
    )
    offsets, acc = {}, 0
    for bk, cnt in counts:
        offsets[bk] = acc
        acc += cnt
    offset_map = F.create_map(*[x for bk, off in offsets.items() for x in (F.lit(bk), F.lit(off))])
    w = Window.partitionBy("_bkt").orderBy(order_col, *(tiebreak or []))
    return b.withColumn(index_col, offset_map[F.col("_bkt")] + F.row_number().over(w) - 1).drop(
        "_bkt"
    )


def global_rank(
    df: DataFrame,
    order_col: str,
    rank_col: str,
    descending: bool = False,
    tiebreak: list[str] | None = None,
    num_buckets: int | None = None,
) -> DataFrame:
    """1-based global row_number over (order_col [DESC], tiebreak...)
    via the same two-phase bucket shape — the scale-safe replacement
    for a partition-less ``row_number().over(Window.orderBy(...))``.
    Descending order negates the (numeric) order column for bucketing
    so bucket ranges stay deterministic."""
    src = df
    oc = order_col
    if descending:
        src = src.withColumn("_neg", -F.col(order_col))
        oc = "_neg"
    out = dense_index(
        src, oc, index_col="_gr0", num_buckets=num_buckets, tiebreak=tiebreak
    )
    return out.withColumn(rank_col, (F.col("_gr0") + 1).cast("int")).drop("_gr0", "_neg")
