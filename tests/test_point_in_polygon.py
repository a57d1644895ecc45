"""point_in_polygon_join vs a pure-python ray caster on random polygons."""

import random

import pyspark.sql.functions as F

from osm_admin_boundary_conflation_spark.operators.point_in_polygon import (
    point_in_polygon_join,
    polygon_edges,
)


def _inside(px, py, ring):
    n = len(ring)
    cnt = 0
    for i in range(n):
        x1, y1 = ring[i]
        x2, y2 = ring[(i + 1) % n]
        if (y1 > py) != (y2 > py):
            cross = (x1 - px) * (y2 - y1) + (py - y1) * (x2 - x1)
            if (cross > 0) == (y2 - y1 > 0):
                cnt += 1
    return cnt % 2 == 1


def _polys_df(spark, rings):
    rows = [(i, [{"x": x, "y": y} for x, y in r]) for i, r in enumerate(rings)]
    return spark.createDataFrame(
        rows, "poly_id long, vertices array<struct<x:long,y:long>>"
    )


def test_edges_pairs_consecutive_and_closes_ring(spark):
    ring = [(0, 0), (8, 0), (8, 8), (0, 8)]
    e = polygon_edges(_polys_df(spark, [ring])).collect()
    got = {(r.x1, r.y1, r.x2, r.y2) for r in e}
    want = {(0, 0, 8, 0), (8, 0, 8, 8), (8, 8, 0, 8), (0, 8, 0, 0)}
    assert got == want


def test_matches_python_ray_caster_nonconvex(spark):
    # a comb polygon (two teeth) — concave, multiple crossings per ray
    comb = [(0, 0), (40, 0), (40, 24), (32, 24), (32, 8), (24, 8),
            (24, 24), (16, 24), (16, 8), (8, 8), (8, 24), (0, 24)]
    # offset copy two cells away, spanning a cell boundary (cell=16)
    comb2 = [(x + 50, y + 30) for x, y in comb]
    rings = [comb, comb2]
    rng = random.Random(7)
    # odd coords so no point sits on an edge and no ray hits a vertex
    pts = [(i, 2 * rng.randrange(0, 50) + 1, 2 * rng.randrange(0, 30) + 1)
           for i in range(400)]
    want = {
        (pid, k)
        for pid, px, py in pts
        for k, r in enumerate(rings)
        if _inside(px, py, r)
    }
    assert want, "test world must place some points inside"
    pdf = spark.createDataFrame(pts, "pid long, px long, py long")
    got = {
        (r.pid, r.poly_id)
        for r in point_in_polygon_join(pdf, _polys_df(spark, rings), cell=16).collect()
    }
    assert got == want


def test_polygon_spanning_many_cells_meets_point_once(spark):
    # big square spans a 4x4 block of cells; candidate pairing must not
    # duplicate (point, poly) even though the poly covers 16 cells
    ring = [(0, 0), (63, 0), (63, 63), (0, 63)]
    pdf = spark.createDataFrame([(1, 31, 31), (2, 99, 99)], "pid long, px long, py long")
    out = point_in_polygon_join(pdf, _polys_df(spark, [ring]), cell=16).collect()
    assert [(r.pid, r.poly_id) for r in out] == [(1, 0)]
