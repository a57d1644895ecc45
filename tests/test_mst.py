"""boruvka_mst vs a pure-python Kruskal on random connected graphs."""

import random

from osm_admin_boundary_conflation_spark.operators.mst import boruvka_mst


def _kruskal(n, edges):
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    total, picked = 0, []
    for w, u, v in sorted((w, u, v) for u, v, w in edges):
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[ru] = rv
            total += w
            picked.append((min(u, v), max(u, v), w))
    return total, set(picked)


def _random_graph(rng, n, extra):
    # random spanning tree + extra edges, all weights distinct
    weights = rng.sample(range(1, 100000), n - 1 + extra)
    edges = []
    for i in range(1, n):
        edges.append((rng.randrange(0, i), i, weights.pop()))
    seen = {(min(u, v), max(u, v)) for u, v, _ in edges}
    while weights:
        u, v = rng.randrange(n), rng.randrange(n)
        if u == v or (min(u, v), max(u, v)) in seen:
            continue
        seen.add((min(u, v), max(u, v)))
        edges.append((u, v, weights.pop()))
    return edges


def test_boruvka_matches_kruskal_random(spark):
    rng = random.Random(11)
    for n, extra in [(30, 40), (64, 100)]:
        edges = _random_graph(rng, n, extra)
        want_total, want_set = _kruskal(n, edges)
        nodes = spark.createDataFrame([(i,) for i in range(n)], "id long")
        edf = spark.createDataFrame(edges, "u long, v long, w long")
        got = boruvka_mst(nodes, edf).collect()
        got_set = {(min(r.u, r.v), max(r.u, r.v), r.w) for r in got}
        assert got_set == want_set
        assert sum(r.w for r in got) == want_total


def test_boruvka_forest_on_disconnected_graph(spark):
    # two components -> spanning FOREST with n1-1 + n2-1 edges
    edges = [(0, 1, 5), (1, 2, 3), (0, 2, 9), (10, 11, 7)]
    nodes = spark.createDataFrame([(i,) for i in [0, 1, 2, 10, 11]], "id long")
    edf = spark.createDataFrame(edges, "u long, v long, w long")
    got = {(min(r.u, r.v), max(r.u, r.v), r.w) for r in boruvka_mst(nodes, edf).collect()}
    assert got == {(0, 1, 5), (1, 2, 3), (10, 11, 7)}
