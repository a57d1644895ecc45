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
    # The payload rides inside a struct so that a right row whose value
    # is legitimately NULL still wins as the latest observation: the
    # struct itself is non-null for every right row, and ignorenulls
    # skips only the left rows' placeholder structs (ADVICE r06).
    vt = right.schema[val].dataType.simpleString()
    l_tag = left.select(
        key,
        ts,
        F.lit(1).alias("_side"),
        F.lit(None).cast(f"struct<v:{vt}>").alias("_rv"),
        *extra,
    )
    r_extras = [
        F.col(c) if c == tiebreak else F.lit(None).cast(left.schema[c].dataType).alias(c)
        for c in extra
    ]
    r_tag = right.select(
        key, ts, F.lit(0).alias("_side"), F.struct(F.col(val).alias("v")).alias("_rv"), *r_extras
    )
    both = l_tag.unionByName(r_tag)
    order = [ts, "_side"] + ([tiebreak] if tiebreak else [])
    w = Window.partitionBy(key).orderBy(*order).rowsBetween(Window.unboundedPreceding, 0)
    carried = both.withColumn("_rv", F.last("_rv", ignorenulls=True).over(w))
    out = carried.filter(F.col("_side") == 1).drop("_side")
    return out.select(
        *[c for c in out.columns if c != "_rv"], F.col("_rv.v").alias(val)
    )


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    key: str = "key",
    ts: str = "ts",
    val: str = "val",
    tolerance: int | None = None,
    tiebreak: str | None = None,
) -> DataFrame:
    """Forward as-of: for each left row, the EARLIEST right value with
    right.ts >= left.ts (and right.ts - left.ts <= tolerance when set)
    — the "next quote / next response" direction pandas calls
    merge_asof(direction='forward'). Same window-over-union shape as
    asof_join but ordered DESCENDING, so the nearest FOLLOWING right
    row is carried; the right timestamp rides along in a struct and the
    tolerance is applied after the carry (a match beyond tolerance
    nulls out). Adds ``val`` and ``val_ts`` to the left columns. One
    shuffle on the key."""
    extra = [c for c in left.columns if c not in (key, ts)]
    rv_t = F.struct(F.col(ts).alias("rts"), F.col(val).alias("v"))
    l_tag = left.select(
        key,
        ts,
        F.lit(1).alias("_side"),
        F.lit(None).cast(f"struct<rts:{right.schema[ts].dataType.simpleString()},v:{right.schema[val].dataType.simpleString()}>").alias("_rv"),
        *extra,
    )
    r_extras = [
        F.col(c) if c == tiebreak else F.lit(None).cast(left.schema[c].dataType).alias(c)
        for c in extra
    ]
    r_tag = right.select(key, ts, F.lit(0).alias("_side"), rv_t.alias("_rv"), *r_extras)
    both = l_tag.unionByName(r_tag)
    order = [F.col(ts).desc(), F.col("_side")] + (
        [F.col(tiebreak).desc()] if tiebreak else []
    )
    w = Window.partitionBy(key).orderBy(*order).rowsBetween(Window.unboundedPreceding, 0)
    carried = both.withColumn("_rv", F.last("_rv", ignorenulls=True).over(w))
    out = carried.filter(F.col("_side") == 1).drop("_side")
    ok = F.col("_rv").isNotNull() & (
        F.lit(True)
        if tolerance is None
        else (F.col("_rv.rts") - F.col(ts) <= F.lit(tolerance))
    )
    return out.select(
        *[c for c in out.columns if c != "_rv"],
        F.when(ok, F.col("_rv.v")).alias(val),
        F.when(ok, F.col("_rv.rts")).alias(f"{val}_ts"),
    )
