"""As-of join — a time-travel operator Spark's built-ins lack.

For each left row, pick the latest right value with the same key whose
timestamp is <= the left timestamp. Implemented without a UDF and
without a range cross-join: union both sides tagged, sort within key by
(ts, side) — right rows sort before left rows at equal ts, giving
"<=" semantics — and carry the most recent right payload forward with
``last(..., ignorenulls)`` over an unbounded-preceding window. One
shuffle on the key, linear work (the standard window-over-union as-of
shape; skewed keys can be salted exactly like the cell join).

Inputs are pre-projected:
  left(key, ts, ...id cols...)   right(key, ts, val)
Output: left columns + ``val`` (NULL when no right row precedes).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "key",
    ts: str = "ts",
    val: str = "val",
    tiebreak: str | None = None,
) -> DataFrame:
    """tiebreak: a column present in BOTH inputs that makes the sort
    within equal (ts) deterministic (e.g. an event id) — without it,
    several right rows sharing (key, ts) carry an arbitrary winner."""
    extra = [c for c in left.columns if c not in (key, ts)]
    l_tag = left.select(
        key, ts, F.lit(1).alias("_side"), F.lit(None).cast(right.schema[val].dataType).alias(val), *extra
    )
    r_extras = [
        F.col(c) if c == tiebreak else F.lit(None).cast(left.schema[c].dataType).alias(c)
        for c in extra
    ]
    r_tag = right.select(key, ts, F.lit(0).alias("_side"), val, *r_extras)
    both = l_tag.unionByName(r_tag)
    order = [ts, "_side"] + ([tiebreak] if tiebreak else [])
    w = Window.partitionBy(key).orderBy(*order).rowsBetween(Window.unboundedPreceding, 0)
    carried = both.withColumn(val, F.last(val, ignorenulls=True).over(w))
    return carried.filter(F.col("_side") == 1).drop("_side")
