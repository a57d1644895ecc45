"""greedy_matching vs sequential python greedy on random graphs."""

import random

from osm_admin_boundary_conflation_spark.operators.matching import greedy_matching


def _greedy(edges):
    used, out = set(), set()
    for w, u, v in sorted((w, u, v) for u, v, w in edges):
        if u not in used and v not in used:
            used.update((u, v))
            out.add((min(u, v), max(u, v), w))
    return out


def test_matches_sequential_greedy_random(spark):
    rng = random.Random(23)
    for n, m in [(40, 80), (80, 200)]:
        weights = rng.sample(range(1, 10 ** 6), m)
        seen, edges = set(), []
        while len(edges) < m:
            u, v = rng.randrange(n), rng.randrange(n)
            if u == v or (min(u, v), max(u, v)) in seen:
                continue
            seen.add((min(u, v), max(u, v)))
            edges.append((u, v, weights[len(edges)]))
        want = _greedy(edges)
        nodes = spark.createDataFrame([(i,) for i in range(n)], "id long")
        edf = spark.createDataFrame(edges, "u long, v long, w long")
        got = {
            (min(r.u, r.v), max(r.u, r.v), r.w)
            for r in greedy_matching(nodes, edf).collect()
        }
        assert got == want


def test_empty_graph_returns_empty(spark):
    nodes = spark.createDataFrame([(1,), (2,)], "id long")
    edges = spark.createDataFrame([], "u long, v long, w long")
    assert greedy_matching(nodes, edges).collect() == []
