"""Differential tests: kendall_counts and closest_pair vs brute force
on random integer point sets (including adversarial tie/duplicate
layouts the gates' synthetic worlds never produce)."""

import random

from osm_admin_boundary_conflation_spark.operators.closest_pair import closest_pair
from osm_admin_boundary_conflation_spark.operators.rankcorr import kendall_counts


def _brute_kendall(pts):
    conc = disc = 0
    for i in range(len(pts)):
        for j in range(i + 1, len(pts)):
            s = (pts[i][1] - pts[j][1]) * (pts[i][2] - pts[j][2])
            if s > 0:
                conc += 1
            elif s < 0:
                disc += 1
    return conc, disc, len(pts) * (len(pts) - 1) // 2


def _brute_closest(pts):
    best = None
    for i in range(len(pts)):
        for j in range(i + 1, len(pts)):
            d2 = (pts[i][1] - pts[j][1]) ** 2 + (pts[i][2] - pts[j][2]) ** 2
            key = (d2, min(pts[i][0], pts[j][0]), max(pts[i][0], pts[j][0]))
            if best is None or key < best:
                best = key
    return best


def test_kendall_random_with_ties(spark):
    rng = random.Random(7)
    for trial in range(3):
        n = 120 + trial * 40
        # x distinct; y with deliberate ties (small range)
        ys = [rng.randrange(0, 23) for _ in range(n)]
        pts = [(i, i * 3 + 1, ys[i]) for i in range(n)]
        df = spark.createDataFrame(pts, "id long, x long, y long")
        for wx, wy in [(64, 4), (7, 7), (1000, 1000)]:
            row = kendall_counts(df, wx=wx, wy=wy).collect()[0]
            conc, disc, pairs = _brute_kendall(pts)
            assert (row["concordant"], row["discordant"], row["n_pairs"]) == (
                conc,
                disc,
                pairs,
            ), (trial, wx, wy)


def test_kendall_negative_and_clustered(spark):
    rng = random.Random(11)
    # negative coordinates exercise div-bucket monotonicity below zero
    raw = [
        (rng.randrange(-500, 500), rng.randrange(-30, 30)) for _ in range(150)
    ]
    # x made distinct while keeping the negative range
    pts = [(i, x * 1000 + i, y) for i, (x, y) in enumerate(raw)]
    df = spark.createDataFrame(pts, "id long, x long, y long")
    row = kendall_counts(df, wx=997, wy=5).collect()[0]
    conc, disc, pairs = _brute_kendall(pts)
    assert (row["concordant"], row["discordant"], row["n_pairs"]) == (
        conc,
        disc,
        pairs,
    )


def test_closest_pair_random(spark):
    rng = random.Random(3)
    for trial in range(3):
        n = 200
        pts = [
            (i, rng.randrange(0, 100000), rng.randrange(0, 100000))
            for i in range(n)
        ]
        df = spark.createDataFrame(pts, "id long, x long, y long")
        got = closest_pair(df, sample_k=16).collect()[0]
        d2, ia, ib = _brute_closest(pts)
        assert (got["d2"], got["id_a"], got["id_b"]) == (d2, ia, ib), trial


def test_closest_pair_duplicates_and_clusters(spark):
    # duplicate coordinates -> d2 = 0 with the lowest id pair
    pts = [(0, 10, 10), (1, 500000, 500000), (2, 10, 10), (3, 10, 11), (4, 10, 10)]
    df = spark.createDataFrame(pts, "id long, x long, y long")
    got = closest_pair(df, sample_k=2).collect()[0]
    assert (got["d2"], got["id_a"], got["id_b"]) == (0, 0, 2)
    # two far clusters; sample covers only one -> bound is loose but exact
    pts2 = [(i, i * 7, 0) for i in range(50)] + [
        (100 + i, 10_000_000 + i * 3, 9_000_000) for i in range(50)
    ]
    df2 = spark.createDataFrame(pts2, "id long, x long, y long")
    got2 = closest_pair(df2, sample_k=8).collect()[0]
    d2, ia, ib = _brute_closest(pts2)
    assert (got2["d2"], got2["id_a"], got2["id_b"]) == (d2, ia, ib)
