"""Exact cell-bucketed kNN join (operators/knn.py) vs brute force."""

import random

import pyspark.sql.functions as F

from osm_admin_boundary_conflation_spark.operators.knn import knn_join


def _world(spark, n_points=300, n_sites=400, seed=11):
    rng = random.Random(seed)
    pts = [
        (f"p{i}", rng.uniform(-179.9, 179.9), rng.uniform(-70.0, 70.0))
        for i in range(n_points)
    ]
    # clustered + antimeridian + near-pole sites so the sample bound is
    # loose for some points and the lon wraparound actually matters
    sites = []
    for i in range(n_sites):
        kind = i % 4
        if kind == 0:
            sites.append((f"s{i:04d}", rng.uniform(-10, 10), rng.uniform(-10, 10)))
        elif kind == 1:
            sites.append((f"s{i:04d}", rng.uniform(170, 180) * rng.choice([1, -1]),
                          rng.uniform(-30, 30)))
        elif kind == 2:
            sites.append((f"s{i:04d}", rng.uniform(-180, 180), rng.uniform(60, 69)))
        else:
            sites.append((f"s{i:04d}", rng.uniform(-180, 180), rng.uniform(-69, 69)))
    p = spark.createDataFrame(pts, "url string, lon double, lat double")
    s = spark.createDataFrame(sites, "level9_id string, clon double, clat double")
    return p, s


def _frame(df):
    return sorted(
        (r["url"], r["knn_rank"], r["level9_id"], round(r["dist"], 6))
        for r in df.collect()
    )


def test_bucketed_knn_equals_bruteforce(spark):
    p, s = _world(spark)
    cross = knn_join(p, s, k=3, strategy="cross")
    bucketed = knn_join(p, s, k=3, strategy="bucketed")
    assert _frame(bucketed) == _frame(cross)


def test_bucketed_knn_small_sample_still_exact(spark):
    """A tiny (worst-luck) sample only widens the probe disk — the
    result must stay exact."""
    p, s = _world(spark, n_points=120, n_sites=200, seed=99)
    cross = knn_join(p, s, k=5, strategy="cross")
    bucketed = knn_join(p, s, k=5, strategy="bucketed", sample_size=5, cell_deg=3.0)
    assert _frame(bucketed) == _frame(cross)


def test_auto_picks_cross_for_dim_sized_sites(spark):
    p, s = _world(spark, n_points=50, n_sites=30)
    auto = knn_join(p, s, k=2, strategy="auto")
    cross = knn_join(p, s, k=2, strategy="cross")
    assert _frame(auto) == _frame(cross)
    # the dim-sized plan must be a broadcast nested-loop (cross) join,
    # not the two-round probe
    plan = auto._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan


def test_bucketed_plan_probes_by_cell_key(spark):
    p, s = _world(spark, n_points=50, n_sites=200)
    out = knn_join(p, s, k=3, strategy="bucketed")
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the candidate join is an equi hash/merge join on (cx, cy)
    assert "cx" in plan and "cy" in plan
    lowered = plan.lower()
    assert "sortmergejoin" in lowered or "broadcasthashjoin" in lowered or "shuffledhashjoin" in lowered
