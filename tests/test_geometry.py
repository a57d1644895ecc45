"""Unit tests for the pure-numpy geometry kernel (SURVEY.md §5 item 1)."""

import math

import numpy as np
import pytest

from osm_admin_boundary_conflation_spark.functions import geometry as G


def sq(x0, y0, s):
    return np.array([[x0, y0], [x0 + s, y0], [x0 + s, y0 + s], [x0, y0 + s], [x0, y0]], dtype=float)


class TestWkt:
    def test_polygon_roundtrip(self):
        mp = G.parse_wkt("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))")
        assert len(mp) == 1 and len(mp[0]) == 1
        assert mp[0][0].shape == (5, 2)
        assert G.multipolygon_area(mp) == pytest.approx(16.0)

    def test_polygon_with_hole(self):
        mp = G.parse_wkt("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 2 1, 2 2, 1 2, 1 1))")
        assert G.multipolygon_area(mp) == pytest.approx(15.0)

    def test_multipolygon(self):
        mp = G.parse_wkt(
            "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)), ((10 10, 12 10, 12 12, 10 12, 10 10)))"
        )
        assert len(mp) == 2
        assert G.multipolygon_area(mp) == pytest.approx(5.0)

    def test_scientific_and_negative(self):
        mp = G.parse_wkt("POLYGON ((-1 -1, 1e0 -1, 1 1, -1 1, -1 -1))")
        assert G.multipolygon_area(mp) == pytest.approx(4.0)


class TestPointInPolygon:
    def test_simple(self):
        poly = [sq(0, 0, 4)]
        pts = np.array([[2, 2], [5, 5], [-0.1, 2], [3.999, 3.999]])
        got = G.points_in_polygon(pts, poly)
        assert got.tolist() == [True, False, False, True]

    def test_hole(self):
        poly = [sq(0, 0, 4), sq(1, 1, 1)]
        pts = np.array([[1.5, 1.5], [0.5, 0.5], [3, 3]])
        assert G.points_in_polygon(pts, poly).tolist() == [False, True, True]

    def test_concave(self):
        ring = np.array([[0, 0], [4, 0], [4, 4], [2, 4], [2, 1], [0, 1], [0, 0]], dtype=float)
        pts = np.array([[3, 3], [1, 3], [1, 0.5]])
        assert G.points_in_polygon(pts, [ring]).tolist() == [True, False, True]


class TestIntersection:
    def test_disjoint(self):
        assert G.intersection_area([[sq(0, 0, 1)]], [[sq(5, 5, 1)]]) == 0.0

    def test_identical(self):
        a = [[sq(0, 0, 2)]]
        assert G.intersection_area(a, a) == pytest.approx(4.0)
        assert G.iou(a, a) == pytest.approx(1.0)

    def test_half_overlap(self):
        a, b = [[sq(0, 0, 2)]], [[sq(1, 0, 2)]]
        assert G.intersection_area(a, b) == pytest.approx(2.0)
        assert G.iou(a, b) == pytest.approx(2.0 / 6.0)
        assert G.area_diff(a, b) == pytest.approx(0.5)

    def test_concave_vs_square(self):
        # L-shape: 4x4 square minus the 2x3 top-right notch -> area 10
        l_ring = np.array([[0, 0], [4, 0], [4, 1], [2, 1], [2, 4], [0, 4], [0, 0]], dtype=float)
        a, b = [[l_ring]], [[sq(0, 0, 4)]]
        assert G.polygon_area([l_ring]) == pytest.approx(10.0)
        assert G.intersection_area(a, b) == pytest.approx(10.0)
        assert G.iou(a, b) == pytest.approx(10.0 / 16.0)

    def test_hole_subtracted(self):
        # A = square with hole, B = the hole region -> intersection 0
        a = [[sq(0, 0, 4), sq(1, 1, 1)]]
        b = [[sq(1, 1, 1)]]
        assert G.intersection_area(a, b) == pytest.approx(0.0, abs=1e-12)
        # and intersection with the full square is area(A)
        full = [[sq(0, 0, 4)]]
        assert G.intersection_area(a, full) == pytest.approx(15.0)

    def test_triangle_pair(self):
        t1 = np.array([[0, 0], [2, 0], [0, 2], [0, 0]], dtype=float)
        t2 = np.array([[0, 0], [2, 0], [2, 2], [0, 0]], dtype=float)
        assert G.intersection_area([[t1]], [[t2]]) == pytest.approx(1.0)


class TestGeodesy:
    def test_haversine_equator_degree(self):
        # one degree of longitude at the equator ~ 111.19 km
        d = float(G.haversine_m(0.0, 0.0, 1.0, 0.0))
        assert d == pytest.approx(111195, rel=1e-3)

    def test_bearing_cardinal(self):
        assert float(G.compass_bearing(0, 0, 0, 1)) == pytest.approx(0.0, abs=1e-9)
        assert float(G.compass_bearing(0, 0, 1, 0)) == pytest.approx(90.0, abs=1e-9)
        assert float(G.compass_bearing(0, 1, 0, 0)) == pytest.approx(180.0, abs=1e-9)
        assert float(G.compass_bearing(1, 0, 0, 0)) == pytest.approx(270.0, abs=1e-9)

    def test_endpoint_match_keep_and_reverse(self):
        src = np.array([[20.0, 44.0], [20.1, 44.1]])
        osm_same = np.array([[20.0, 44.0], [20.1, 44.1]])
        d, rev = G.endpoint_match(src, osm_same)
        assert d == pytest.approx(0.0, abs=1e-9) and rev is False
        d, rev = G.endpoint_match(src, osm_same[::-1])
        assert d == pytest.approx(0.0, abs=1e-9) and rev is True

    def test_is_same_geometry_tolerance(self):
        src = np.array([[20.0, 44.0], [20.1, 44.1], [20.2, 44.15]])
        # ~0.5m shift (1e-5 deg lat ~ 1.11m; use 4e-6)
        osm = src + np.array([0.0, 4e-6])
        assert G.is_same_geometry(src, osm)
        osm_far = src + np.array([0.0, 2e-5])  # ~2.2m
        assert not G.is_same_geometry(src, osm_far)
        assert G.is_same_geometry(src, src[::-1])
        assert not G.is_same_geometry(src, src[:2])

    def test_hausdorff(self):
        a = np.array([[0.0, 0.0], [1.0, 0.0]])
        b = np.array([[0.0, 0.0], [1.0, 0.0], [1.0, 1.0]])
        # farthest b-vertex (1,1) is ~111km from nearest a-vertex (1,0)
        assert G.hausdorff_m(a, b) == pytest.approx(111195, rel=1e-3)


class TestCanonical:
    def test_open_way_reversal_invariant(self):
        assert G.canonical_node_fingerprint([5, 3, 9]) == G.canonical_node_fingerprint([9, 3, 5])

    def test_ring_rotation_reversal_invariant(self):
        base = [7, 2, 9, 4, 7]
        rotated = [9, 4, 7, 2, 9]
        reversed_ = [7, 4, 9, 2, 7]
        fps = {
            G.canonical_node_fingerprint(base),
            G.canonical_node_fingerprint(rotated),
            G.canonical_node_fingerprint(reversed_),
        }
        assert len(fps) == 1
        assert fps.pop().startswith("R:2,")

    def test_different_ways_differ(self):
        assert G.canonical_node_fingerprint([1, 2, 3]) != G.canonical_node_fingerprint([1, 2, 4])


class TestValidity:
    def test_flags(self):
        open_line = np.array([[0, 0], [1, 0], [1, 1]], dtype=float)
        ring = np.array([[0, 0], [1, 0], [1, 1], [0, 0]], dtype=float)
        dup = np.array([[0, 0], [1, 0], [1, 0], [1, 1], [0, 0]], dtype=float)
        assert G.validity_flags(open_line) == (True, False, False)
        assert G.validity_flags(ring) == (True, True, True)
        v, c, r = G.validity_flags(dup)
        assert c is True and r is False

    def test_buffer_contains(self):
        outer = np.array([[20.0, 44.0], [20.1, 44.0]])
        inner = outer + np.array([0.0, 0.004])
        assert G.buffer_contains(outer, inner, 0.005)
        assert not G.buffer_contains(outer, outer + np.array([0.0, 0.006]), 0.005)


class TestReprojection:
    def test_utm_roundtrip(self):
        lons = np.array([19.0, 20.4612, 21.9, 22.5])
        lats = np.array([42.0, 44.8125, 46.1, 43.3])
        e, n = G.wgs84_to_utm(lons, lats, zone=34)
        lon2, lat2 = G.utm_to_wgs84(e, n, zone=34)
        assert np.abs(lon2 - lons).max() < 1e-7
        assert np.abs(lat2 - lats).max() < 1e-7

    def test_utm_known_point(self):
        # central meridian of zone 34 (21E): easting = false easting,
        # northing ~ meridian arc length from equator
        e, n = G.wgs84_to_utm(21.0, 0.0, zone=34)
        assert float(e) == pytest.approx(500000.0, abs=1e-6)
        assert float(n) == pytest.approx(0.0, abs=1e-6)
        e45, n45 = G.wgs84_to_utm(21.0, 45.0, zone=34)
        # meridian arc to 45N ~ 4,984,944 m * k0
        assert float(n45) == pytest.approx(0.9996 * 4984944.4, rel=1e-4)

    def test_utm_zone34_belgrade_plausible(self):
        e, n = G.wgs84_to_utm(20.4612, 44.8125, zone=34)
        # Belgrade sits west of the central meridian -> easting < 500km
        assert 400_000 < float(e) < 500_000
        assert 4_900_000 < float(n) < 5_050_000
