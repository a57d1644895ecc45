"""global_rank: two-phase bucket rank == single global window."""

import random

import pyspark.sql.functions as F
from pyspark.sql import Window

from osm_admin_boundary_conflation_spark.plans.dense_index import global_rank


def _want(rows, desc):
    key = lambda r: ((-r[1] if desc else r[1]), r[0])
    return {r[0]: i + 1 for i, r in enumerate(sorted(rows, key=key))}


def test_global_rank_matches_window_with_ties(spark):
    rng = random.Random(42)
    rows = [(i, rng.randrange(0, 25)) for i in range(500)]  # heavy ties
    df = spark.createDataFrame(rows, "id long, v long")
    for desc in (False, True):
        got = {
            r.id: r.rk
            for r in global_rank(df, "v", "rk", descending=desc, tiebreak=["id"]).collect()
        }
        assert got == _want(rows, desc)


def test_global_rank_no_single_partition_exchange(spark):
    df = spark.createDataFrame([(i, i * 7 % 97) for i in range(300)], "id long, v long")
    out = global_rank(df, "v", "rk", tiebreak=["id"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the window is partitioned by bucket — no partition-less global sort
    import re
    benign = len(re.findall(r"Exchange SinglePartition\s*\n?.{0,250}?Aggregate\(key(?:s)?=\[\], functions=\[(?:partial_|merge_)", plan, re.S))
    total = plan.count("Exchange SinglePartition")
    assert total - benign == 0, plan


def test_global_rank_negative_and_constant_values(spark):
    rows = [(i, -5) for i in range(40)]  # all equal (single bucket)
    df = spark.createDataFrame(rows, "id long, v long")
    got = {r.id: r.rk for r in global_rank(df, "v", "rk", tiebreak=["id"]).collect()}
    assert got == {i: i + 1 for i in range(40)}
