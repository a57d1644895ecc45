"""Distributed convex hull: differential vs brute gift wrapping."""

import random

import numpy as np

from osm_admin_boundary_conflation_spark.operators.hull import _chain, convex_hull


def _gift_wrap(pts):
    pts = [tuple(p) for p in pts]
    start = min(pts)
    hull = [start]
    cur = start
    while True:
        nxt = None
        for q in pts:
            if q == cur:
                continue
            if nxt is None:
                nxt = q
                continue
            cr = (nxt[0] - cur[0]) * (q[1] - cur[1]) - (nxt[1] - cur[1]) * (q[0] - cur[0])
            far = (q[0] - cur[0]) ** 2 + (q[1] - cur[1]) ** 2 > (nxt[0] - cur[0]) ** 2 + (
                nxt[1] - cur[1]
            ) ** 2
            if cr < 0 or (cr == 0 and far):
                nxt = q
        cur = nxt
        if cur == start:
            break
        hull.append(cur)
    return hull


def test_chain_matches_gift_wrap_random():
    rng = random.Random(42)
    for _ in range(60):
        n = rng.randrange(3, 80)
        pts = np.unique(
            np.array(
                [[rng.randrange(0, 40), rng.randrange(0, 40)] for _ in range(n)],
                dtype=np.int64,
            ),
            axis=0,
        )
        if len(pts) < 3:
            continue
        assert [tuple(p) for p in _chain(pts)] == _gift_wrap(pts)


def test_chain_degenerate_collinear():
    pts = np.array([[0, 0], [1, 1], [2, 2], [3, 3]], dtype=np.int64)
    got = [tuple(p) for p in _chain(pts)]
    # all collinear: strict hull keeps the two extremes
    assert got == [(0, 0), (3, 3)]


def test_distributed_hull_partition_invariant(spark):
    rng = random.Random(9)
    rows = [(rng.randrange(0, 1000), rng.randrange(0, 1000)) for _ in range(3000)]
    df = spark.createDataFrame(rows, "x long, y long")
    for parts in (1, 7):
        got = [
            (r.pos, r.x, r.y)
            for r in convex_hull(df.repartition(parts)).orderBy("pos").collect()
        ]
        pts = np.unique(np.array(rows, dtype=np.int64), axis=0)
        want = [(i, x, y) for i, (x, y) in enumerate(_gift_wrap(pts))]
        assert got == want
