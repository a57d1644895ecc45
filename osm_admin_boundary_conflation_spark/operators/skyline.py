"""Pareto-skyline (non-dominated frontier) operator.

The data-curation use: pick documents no other document beats on BOTH
axes (e.g. length vs quality score) — the frontier a mixture sampler
draws from first. Dominance here: q dominates p iff q.a >= p.a and
q.b >= p.b with at least one strict; exact ties (equal on both axes)
do not dominate each other, so tied frontier points all survive.

Two implementations, differential-tested equal:

- ``skyline``: aggregate to DISTINCT a-values (groupBy a -> max b),
  one running-max window over that aggregate (descending a, exclusive
  frame) gives M1(a) = best b among strictly-greater a; a row is on
  the frontier iff its b equals its a-group max and beats M1. The
  window runs over #distinct(a) rows in ONE partition — fine when the
  dimension domain is bounded (document lengths), pinned semantics
  otherwise.
- ``skyline_salted``: the scale path — phase 1 computes a LOCAL
  frontier inside each of n_salt hash groups (the window partitions by
  salt: no single-partition stage over raw data); any global-frontier
  point is also a local-frontier point in its group, so the candidate
  union (tiny: frontiers are small) feeds phase 2 = the exact skyline
  over candidates only. Same shape as TakeOrderedAndProject: per-
  partition prune, then a bounded global finish.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def skyline(df: DataFrame, a_col: str, b_col: str) -> DataFrame:
    """Exact frontier via one window over the distinct-a aggregate."""
    per_a = df.groupBy(a_col).agg(F.max(b_col).alias("_mb"))
    w = Window.orderBy(F.desc(a_col)).rowsBetween(Window.unboundedPreceding, -1)
    per_a = per_a.withColumn("_m1", F.max("_mb").over(w))
    return (
        df.join(per_a, a_col)
        .filter(
            (F.col(b_col) == F.col("_mb"))
            & (F.col("_m1").isNull() | (F.col("_m1") < F.col(b_col)))
        )
        .drop("_mb", "_m1")
    )


def skyline_salted(
    df: DataFrame, a_col: str, b_col: str, key_col: str, n_salt: int = 64
) -> DataFrame:
    """Scale path: salted local frontiers -> exact finish on the union."""
    salted = df.withColumn("_g", F.pmod(F.xxhash64(key_col), F.lit(n_salt)))
    per_ga = salted.groupBy("_g", a_col).agg(F.max(b_col).alias("_mb"))
    w = (
        Window.partitionBy("_g")
        .orderBy(F.desc(a_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    per_ga = per_ga.withColumn("_m1", F.max("_mb").over(w))
    candidates = (
        salted.join(per_ga, ["_g", a_col])
        .filter(
            (F.col(b_col) == F.col("_mb"))
            & (F.col("_m1").isNull() | (F.col("_m1") < F.col(b_col)))
        )
        .drop("_g", "_mb", "_m1")
    )
    return skyline(candidates, a_col, b_col)
