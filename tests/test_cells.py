import numpy as np

from osm_admin_boundary_conflation_spark.functions import cells as C
from osm_admin_boundary_conflation_spark.functions import geometry as G


def test_encode_roundtrip_bounds():
    ids = C.encode_cells([20.46], [44.81], res=6)
    assert ids[0].startswith("r6:")
    lo_lon, lo_lat, hi_lon, hi_lat = C.cell_bounds(ids[0])
    assert lo_lon <= 20.46 < hi_lon
    assert lo_lat <= 44.81 < hi_lat


def test_hierarchy():
    (cid,) = C.encode_cells([20.46], [44.81], res=6)
    (pid,) = C.encode_cells([20.46], [44.81], res=5)
    assert C.parent_cell(cid) == pid


def test_cover_bbox_counts():
    size = C.cell_size_deg(6)  # 0.0625 deg
    cells = C.cover_bbox(20.0, 44.0, 20.0 + 2 * size, 44.0 + size, res=6)
    # spans 3 columns x 2 rows (inclusive of edges)
    assert len(cells) == 6


def test_cover_polygon_filters_corners():
    # a thin diagonal triangle should NOT cover every bbox cell
    tri = np.array([[20.0, 44.0], [20.5, 44.0], [20.0, 44.5], [20.0, 44.0]])
    mp = [[tri]]
    covered = set(C.cover_polygon(mp, res=6))
    bbox_cells = set(C.cover_bbox(*G.bbox(mp), res=6))
    assert covered <= bbox_cells
    assert len(covered) < len(bbox_cells)
    # every cell containing a vertex is covered
    for lon, lat in tri[:-1]:
        (cid,) = C.encode_cells([lon], [lat], res=6)
        assert cid in covered
    # covering is CONSERVATIVE: every cell whose center is inside is covered
    size = C.cell_size_deg(6)
    for cid in bbox_cells:
        lo_lon, lo_lat, hi_lon, hi_lat = C.cell_bounds(cid)
        center = np.array([[(lo_lon + hi_lon) / 2, (lo_lat + hi_lat) / 2]])
        if G.points_in_multipolygon(center, mp)[0]:
            assert cid in covered, cid


def test_cover_polygon_adaptive_coarsens():
    # a huge polygon must coarsen resolution to fit MAX_COVER_CELLS
    big = np.array([[0.0, 0.0], [30.0, 0.0], [30.0, 20.0], [0.0, 20.0], [0.0, 0.0]])
    cover = C.cover_polygon_adaptive([[big]], base_res=6, max_cells=256)
    assert 0 < len(cover) <= 256
    res = int(cover[0].split(":")[0][1:])
    assert res < 6
    # a small polygon keeps base resolution
    small = np.array([[20.0, 44.0], [20.1, 44.0], [20.1, 44.1], [20.0, 44.1], [20.0, 44.0]])
    cover_s = C.cover_polygon_adaptive([[small]], base_res=6, max_cells=256)
    assert cover_s[0].startswith("r6:")


def test_determinism():
    a = C.encode_cells(np.linspace(-179, 179, 100), np.linspace(-89, 89, 100), res=7)
    b = C.encode_cells(np.linspace(-179, 179, 100), np.linspace(-89, 89, 100), res=7)
    assert list(a) == list(b)
