import numpy as np

from xcube_stac_spark import cells
from xcube_stac_spark.geom import bbox_to_ring


def test_cell_id_rowmajor():
    level = 9
    size = cells.cell_size_deg(level)
    assert abs(size - 180.0 / 512) < 1e-12
    nc = cells.n_cols(level)
    assert nc == 1024
    # cell containing (-180+eps, -90+eps) is 0; (+180-eps, +90-eps) is last
    assert cells.cell_id(-180.0 + 1e-9, -90.0 + 1e-9, level) == 0
    assert cells.cell_id(180.0 - 1e-9, 90.0 - 1e-9, level) == 512 * nc - 1
    # vectorized matches scalar
    lons = np.array([0.0, 10.3, -77.7])
    lats = np.array([0.0, 45.2, -12.1])
    ids = cells.cell_id(lons, lats, level)
    for i in range(3):
        assert ids[i] == cells.cell_id(lons[i], lats[i], level)


def test_cover_bbox_counts():
    level = 9
    size = cells.cell_size_deg(level)
    ids = cells.cover_bbox(0.0, 0.0, 2 * size * 0.9, size * 0.9, level)
    # spans 2 columns x 1 row (0.9 and 1.8 cell widths)
    assert ids.size == 2
    ids = cells.cover_bbox(0.0, 0.0, 0.0, 0.0, level)
    assert ids.size == 1


def test_cover_polygon_diamond_drops_corner_cells():
    level = 6  # 2.8125° cells
    size = cells.cell_size_deg(level)
    # diamond inscribed in a 4x4-cell bbox: the 4 extreme corner cells of
    # the bbox cover don't intersect the diamond
    cx, cy = 2 * size, 2 * size
    r = 2 * size * 0.98
    ring_x = np.array([cx - r, cx, cx + r, cx, cx - r])
    ring_y = np.array([cy, cy - r, cy, cy + r, cy])
    bbox_cover = cells.cover_bbox(cx - r, cy - r, cx + r, cy + r, level)
    poly_cover = cells.cover_polygon(ring_x, ring_y, level)
    assert poly_cover.size < bbox_cover.size
    assert set(poly_cover).issubset(set(bbox_cover))


def test_cover_polygon_matches_bbox_for_rect():
    ring_x, ring_y = bbox_to_ring([1.0, 1.0, 3.0, 2.0])
    a = set(cells.cover_bbox(1.0, 1.0, 3.0, 2.0, 9).tolist())
    b = set(cells.cover_polygon(ring_x, ring_y, 9).tolist())
    assert a == b


def test_morton_locality_and_bijection():
    rng = np.random.default_rng(3)
    lons = rng.uniform(-180, 180, 1000)
    lats = rng.uniform(-90, 90, 1000)
    rm = cells.cell_id(lons, lats, 9)
    mz = cells.morton_id(lons, lats, 9)
    # bijective on the same cells
    assert len(set(rm.tolist())) == len(set(mz.tolist()))
    mz2 = cells.morton_from_rowmajor(rm, 9)
    np.testing.assert_array_equal(mz, mz2)
