"""Geometry/projection kernel tests.

The UTM implementation is validated two independent ways: round-trip
accuracy, and agreement with a from-scratch Snyder-series forward transform
(different formulation, different coefficients) to < 1 mm.
"""

import numpy as np
import pytest

from xcube_stac_spark import geom


# --- independent Snyder (1987) forward TM, for cross-validation ------------
def snyder_tm_forward(lon_deg, lat_deg, zone):
    a = 6378137.0
    f = 1 / 298.257223563
    e2 = f * (2 - f)
    ep2 = e2 / (1 - e2)
    k0 = 0.9996
    lam0 = np.radians(zone * 6 - 183)
    phi = np.radians(np.asarray(lat_deg, float))
    lam = np.radians(np.asarray(lon_deg, float))
    N = a / np.sqrt(1 - e2 * np.sin(phi) ** 2)
    T = np.tan(phi) ** 2
    C = ep2 * np.cos(phi) ** 2
    A = (lam - lam0) * np.cos(phi)
    M = a * (
        (1 - e2 / 4 - 3 * e2**2 / 64 - 5 * e2**3 / 256) * phi
        - (3 * e2 / 8 + 3 * e2**2 / 32 + 45 * e2**3 / 1024) * np.sin(2 * phi)
        + (15 * e2**2 / 256 + 45 * e2**3 / 1024) * np.sin(4 * phi)
        - (35 * e2**3 / 3072) * np.sin(6 * phi)
    )
    easting = 500000.0 + k0 * N * (
        A
        + (1 - T + C) * A**3 / 6
        + (5 - 18 * T + T**2 + 72 * C - 58 * ep2) * A**5 / 120
    )
    northing = k0 * (
        M
        + N
        * np.tan(phi)
        * (
            A**2 / 2
            + (5 - T + 9 * C + 4 * C**2) * A**4 / 24
            + (61 - 58 * T + T**2 + 600 * C - 330 * ep2) * A**6 / 720
        )
    )
    return easting, northing


def test_tm_matches_independent_snyder_series():
    rng = np.random.default_rng(42)
    lats = rng.uniform(-80, 80, 200)
    zone = 32
    lons = rng.uniform(6, 12, 200)  # inside zone 32
    e1, n1 = geom.tm_forward(lons, lats, zone)
    e2, n2 = snyder_tm_forward(lons, lats, zone)
    assert np.max(np.abs(e1 - e2)) < 1e-3  # < 1 mm
    assert np.max(np.abs(n1 - n2)) < 1e-3


def test_tm_roundtrip():
    rng = np.random.default_rng(7)
    lons = rng.uniform(3, 15, 500)
    lats = rng.uniform(-75, 75, 500)
    for zone in (31, 32, 33):
        e, n = geom.tm_forward(lons, lats, zone)
        lon2, lat2 = geom.tm_inverse(e, n, zone)
        # 3rd-order Krüger series: ~1e-8 deg (≈1 mm) at 12° from the
        # central meridian — zones 31/33 are tested far outside their width
        assert np.max(np.abs(lon2 - lons)) < 1e-8
        assert np.max(np.abs(lat2 - lats)) < 1e-8


def test_tm_invariants():
    # central meridian maps to false easting; equator to northing 0
    e, n = geom.tm_forward(9.0, 0.0, 32)
    assert abs(e - 500000.0) < 1e-6
    assert abs(n) < 1e-6
    # southern hemisphere false northing
    _, ns = geom.tm_forward(9.0, -1.0, 32, south=True)
    _, nn = geom.tm_forward(9.0, 1.0, 32, south=False)
    assert abs((10000000.0 - ns) - nn) < 1e-3


def test_utm_zone():
    assert geom.utm_zone(9.0, 50.0) == (32, "EPSG:32632")
    assert geom.utm_zone(9.0, -50.0) == (32, "EPSG:32732")
    assert geom.utm_zone(4.0, 50.0) == (31, "EPSG:32631")
    assert geom.utm_zone(16.0, 50.0) == (33, "EPSG:32633")
    assert geom.parse_epsg_zone("EPSG:32632") == (32, False)
    assert geom.parse_epsg_zone("EPSG:32732") == (32, True)


def test_bbox_predicates():
    assert geom.bboxes_intersect([0, 0, 2, 2], [1, 1, 3, 3])
    assert geom.bboxes_intersect([0, 0, 2, 2], [2, 2, 3, 3])  # touching counts
    assert not geom.bboxes_intersect([0, 0, 2, 2], [2.1, 0, 3, 2])
    assert geom.bbox_center([0, 0, 2, 4]) == (1.0, 2.0)


def test_point_in_polygon_square_and_rotated():
    ring_x, ring_y = geom.bbox_to_ring([0, 0, 10, 10])
    px = np.array([5.0, -1.0, 10.5, 9.99, 0.01])
    py = np.array([5.0, 5.0, 5.0, 0.01, 9.99])
    got = geom.point_in_polygon(px, py, ring_x, ring_y)
    assert got.tolist() == [True, False, False, True, True]
    # rotated diamond
    dx = np.array([5.0, 10.0, 5.0, 0.0, 5.0])
    dy = np.array([0.0, 5.0, 10.0, 5.0, 0.0])
    got = geom.point_in_polygon(np.array([5.0, 1.0, 9.0]), np.array([5.0, 1.0, 9.0]), dx, dy)
    assert got.tolist() == [True, False, False]


def test_polygon_intersects_rect():
    ring_x, ring_y = geom.bbox_to_ring([2, 2, 8, 8])
    assert geom.polygon_intersects_rect(ring_x, ring_y, 0, 0, 3, 3)  # overlap
    assert geom.polygon_intersects_rect(ring_x, ring_y, 3, 3, 5, 5)  # rect inside
    assert geom.polygon_intersects_rect(ring_x, ring_y, 0, 0, 10, 10)  # poly inside
    assert not geom.polygon_intersects_rect(ring_x, ring_y, 9, 9, 11, 11)
    # edge-crossing without contained vertices: thin diamond through rect
    dx = np.array([0.0, 5.0, 10.0, 5.0, 0.0])
    dy = np.array([5.0, 5.2, 5.0, 4.8, 5.0])
    assert geom.polygon_intersects_rect(dx, dy, 4.0, 0.0, 6.0, 10.0)


def test_tps_uv_identity_on_axis_aligned():
    # axis-aligned square footprint → UV is a pure affine normalize
    corners = np.array([[0.0, 10.0], [10.0, 10.0], [10.0, 0.0], [0.0, 0.0]])
    tps = geom.TpsUV(corners)
    u, v = tps(np.array([0.0, 10.0, 5.0]), np.array([10.0, 0.0, 5.0]))
    np.testing.assert_allclose(u, [0.0, 1.0, 0.5], atol=1e-9)
    np.testing.assert_allclose(v, [0.0, 1.0, 0.5], atol=1e-9)


def test_find_relative_bbox_clip():
    ring_x, ring_y = geom.bbox_to_ring([0, 0, 10, 10])
    # query overlapping the scene's lower-left quadrant (descending order:
    # upper-left corner is max(lat-lon) = (0,10) → v grows southwards)
    rel = geom.find_relative_bbox(ring_x, ring_y, [-5, -5, 5, 5], descending=True)
    assert rel is not None
    u0, v0, u1, v1 = rel
    assert u0 == 0.0 and abs(u1 - 0.5) < 1e-9
    assert abs(v0 - 0.5) < 1e-9 and v1 == 1.0
    assert geom.find_relative_bbox(ring_x, ring_y, [20, 20, 30, 30]) is None


def test_deg_m_conversion():
    mx, my = geom.deg_to_m(1.0, 0.0)
    assert abs(mx - 111320.0) < 1e-6 and abs(my - 111320.0) < 1e-6
    mx60, _ = geom.deg_to_m(1.0, 60.0)
    assert abs(mx60 - 111320.0 * 0.5) < 1.0
