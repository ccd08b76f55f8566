"""Pure-NumPy geometry + map projection kernels.

The reference leans on shapely (bbox intersect, ``xcube_stac/utils.py:307-322``),
pyproj (UTM transforms, ``utils.py:818-830``) and scipy RBF (thin-plate-spline
footprint UV mapping, ``utils.py:769-808``). None of those libraries are
available here, and none are needed: everything the engine uses is closed-form
and vectorizes, which is exactly what the Arrow-UDF hot path wants — NumPy on
contiguous batches, zero per-row Python.

Contents
--------
* bbox predicates (F1) and helpers (C7, C8, C16 in SURVEY §2).
* ``point_in_polygon``: vectorized ray casting — the exact refine stage of the
  spatial join (J1b).
* ``polygon_intersects_rect``: exact cell-rectangle vs polygon test used by
  the cell covering.
* WGS84 <-> Transverse Mercator (UTM) forward/inverse via the Karney/Krüger
  series (public formulation, accurate to <1 mm for |lon-lon0| < 7°) — used
  by regrid (J9/J12) and validated in tests against an independent
  Snyder-series implementation.
* 4-point thin-plate-spline UV mapping of a scene footprint (J6) — with
  exactly 4 control points the TPS system is a tiny closed-form solve.
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------------------
# bbox predicates (reference: utils.py:307-322 via shapely box.intersects)
# ---------------------------------------------------------------------------


def bboxes_intersect(a, b) -> bool:
    """Closed-boundary bbox intersection, [xmin, ymin, xmax, ymax] each."""
    return not (a[2] < b[0] or a[0] > b[2] or a[3] < b[1] or a[1] > b[3])


def bbox_center(bbox) -> tuple[float, float]:
    """Reference: utils.py:613-625."""
    return ((bbox[0] + bbox[2]) / 2.0, (bbox[1] + bbox[3]) / 2.0)


def bbox_to_ring(bbox) -> tuple[np.ndarray, np.ndarray]:
    """bbox -> closed CCW polygon ring (reference: utils.py:77-90)."""
    xmin, ymin, xmax, ymax = bbox
    lon = np.array([xmin, xmax, xmax, xmin, xmin], dtype=np.float64)
    lat = np.array([ymin, ymin, ymax, ymax, ymin], dtype=np.float64)
    return lon, lat


# ---------------------------------------------------------------------------
# point-in-polygon (vectorized ray casting) — J1b exact refine
# ---------------------------------------------------------------------------


def point_in_polygon(px, py, ring_x, ring_y) -> np.ndarray:
    """Vectorized even-odd ray cast: are points (px, py) inside the ring?

    ``px, py``: arrays of query points. ``ring_x, ring_y``: closed or open
    ring vertices. Points exactly on an edge may land either side (standard
    ray-cast behavior); the engine treats boundary cells as candidates at
    the coarse stage so this never drops a true hit at cell granularity.
    """
    px = np.asarray(px, np.float64)
    py = np.asarray(py, np.float64)
    rx = np.asarray(ring_x, np.float64)
    ry = np.asarray(ring_y, np.float64)
    if rx[0] == rx[-1] and ry[0] == ry[-1]:
        rx, ry = rx[:-1], ry[:-1]
    n = rx.size
    inside = np.zeros(px.shape, dtype=bool)
    j = n - 1
    for i in range(n):
        xi, yi = rx[i], ry[i]
        xj, yj = rx[j], ry[j]
        crosses = (yi > py) != (yj > py)
        with np.errstate(divide="ignore", invalid="ignore"):
            x_at = (xj - xi) * (py - yi) / (yj - yi) + xi
        inside ^= crosses & (px < x_at)
        j = i
    return inside


def _segments_intersect(p1, p2, q1, q2) -> bool:
    """Exact 2-D segment intersection via orientation tests (scalar)."""

    def orient(a, b, c):
        return (b[0] - a[0]) * (c[1] - a[1]) - (b[1] - a[1]) * (c[0] - a[0])

    d1 = orient(q1, q2, p1)
    d2 = orient(q1, q2, p2)
    d3 = orient(p1, p2, q1)
    d4 = orient(p1, p2, q2)
    if ((d1 > 0) != (d2 > 0) or d1 == 0 or d2 == 0) and (
        (d3 > 0) != (d4 > 0) or d3 == 0 or d4 == 0
    ):
        # conservative: includes collinear-touching cases
        if (d1 > 0) != (d2 > 0) and (d3 > 0) != (d4 > 0):
            return True
        for d, a, b, c in (
            (d1, q1, q2, p1),
            (d2, q1, q2, p2),
            (d3, p1, p2, q1),
            (d4, p1, p2, q2),
        ):
            if d == 0 and (
                min(a[0], b[0]) <= c[0] <= max(a[0], b[0])
                and min(a[1], b[1]) <= c[1] <= max(a[1], b[1])
            ):
                return True
    return False


def polygon_intersects_rect(
    ring_x, ring_y, xmin: float, ymin: float, xmax: float, ymax: float
) -> bool:
    """Exact polygon vs axis-aligned rectangle intersection.

    True iff any ring vertex is inside the rect, any rect corner is inside
    the polygon, or any ring edge crosses any rect edge.
    """
    rx = np.asarray(ring_x, np.float64)
    ry = np.asarray(ring_y, np.float64)
    if np.any((rx >= xmin) & (rx <= xmax) & (ry >= ymin) & (ry <= ymax)):
        return True
    corners_x = np.array([xmin, xmax, xmax, xmin])
    corners_y = np.array([ymin, ymin, ymax, ymax])
    if point_in_polygon(corners_x, corners_y, rx, ry).any():
        return True
    if rx[0] != rx[-1] or ry[0] != ry[-1]:
        rx = np.append(rx, rx[0])
        ry = np.append(ry, ry[0])
    rect = [
        ((xmin, ymin), (xmax, ymin)),
        ((xmax, ymin), (xmax, ymax)),
        ((xmax, ymax), (xmin, ymax)),
        ((xmin, ymax), (xmin, ymin)),
    ]
    for i in range(rx.size - 1):
        p1 = (rx[i], ry[i])
        p2 = (rx[i + 1], ry[i + 1])
        for q1, q2 in rect:
            if _segments_intersect(p1, p2, q1, q2):
                return True
    return False


# ---------------------------------------------------------------------------
# WGS84 <-> Transverse Mercator (Karney/Krüger series)
# ---------------------------------------------------------------------------

_A = 6378137.0  # WGS84 semi-major
_F = 1.0 / 298.257223563
_K0 = 0.9996
_E0 = 500000.0  # false easting
_N = _F / (2.0 - _F)  # third flattening
_A1 = _A / (1.0 + _N) * (1.0 + _N**2 / 4.0 + _N**4 / 64.0)  # rectifying radius

_ALPHA = (
    _N / 2.0 - 2.0 * _N**2 / 3.0 + 5.0 * _N**3 / 16.0,
    13.0 * _N**2 / 48.0 - 3.0 * _N**3 / 5.0,
    61.0 * _N**3 / 240.0,
)
_BETA = (
    _N / 2.0 - 2.0 * _N**2 / 3.0 + 37.0 * _N**3 / 96.0,
    _N**2 / 48.0 + _N**3 / 15.0,
    17.0 * _N**3 / 480.0,
)
_DELTA = (
    2.0 * _N - 2.0 * _N**2 / 3.0 - 2.0 * _N**3,
    7.0 * _N**2 / 3.0 - 8.0 * _N**3 / 5.0,
    56.0 * _N**3 / 15.0,
)


def utm_zone(lon: float, lat: float) -> tuple[int, str]:
    """UTM zone number + EPSG code (reference: utils.py:818-824; hemisphere
    fix accessors/hls.py:522-556 — EPSG 326xx north / 327xx south)."""
    zone = int(np.floor((lon + 180.0) / 6.0)) + 1
    zone = min(max(zone, 1), 60)
    epsg = (32600 if lat >= 0 else 32700) + zone
    return zone, f"EPSG:{epsg}"


def zone_central_lon(zone: int) -> float:
    return zone * 6.0 - 183.0


def tm_forward(lon, lat, zone: int, south: bool = False):
    """lon/lat degrees -> UTM easting/northing meters (vectorized)."""
    lon = np.asarray(lon, np.float64)
    lat = np.asarray(lat, np.float64)
    lam0 = np.radians(zone_central_lon(zone))
    phi = np.radians(lat)
    lam = np.radians(lon) - lam0
    es = 2.0 * np.sqrt(_N) / (1.0 + _N)
    t = np.sinh(np.arctanh(np.sin(phi)) - es * np.arctanh(es * np.sin(phi)))
    xi_p = np.arctan2(t, np.cos(lam))
    eta_p = np.arctanh(np.sin(lam) / np.sqrt(1.0 + t * t))
    xi = xi_p.copy()
    eta = eta_p.copy()
    for j, a in enumerate(_ALPHA, start=1):
        xi += a * np.sin(2 * j * xi_p) * np.cosh(2 * j * eta_p)
        eta += a * np.cos(2 * j * xi_p) * np.sinh(2 * j * eta_p)
    easting = _E0 + _K0 * _A1 * eta
    northing = _K0 * _A1 * xi + (10000000.0 if south else 0.0)
    return easting, northing


def tm_inverse(easting, northing, zone: int, south: bool = False):
    """UTM easting/northing meters -> lon/lat degrees (vectorized)."""
    easting = np.asarray(easting, np.float64)
    northing = np.asarray(northing, np.float64)
    lam0 = np.radians(zone_central_lon(zone))
    xi = (northing - (10000000.0 if south else 0.0)) / (_K0 * _A1)
    eta = (easting - _E0) / (_K0 * _A1)
    xi_p = xi.copy()
    eta_p = eta.copy()
    for j, b in enumerate(_BETA, start=1):
        xi_p -= b * np.sin(2 * j * xi) * np.cosh(2 * j * eta)
        eta_p -= b * np.cos(2 * j * xi) * np.sinh(2 * j * eta)
    chi = np.arcsin(np.clip(np.sin(xi_p) / np.cosh(eta_p), -1.0, 1.0))
    phi = chi.copy()
    for j, d in enumerate(_DELTA, start=1):
        phi += d * np.sin(2 * j * chi)
    lam = np.arctan2(np.sinh(eta_p), np.cos(xi_p))
    return np.degrees(lam + lam0), np.degrees(phi)


def parse_epsg_zone(proj_code: str) -> tuple[int, bool]:
    """'EPSG:326xx'/'EPSG:327xx' -> (zone, south)."""
    code = int(str(proj_code).split(":")[-1])
    if 32601 <= code <= 32660:
        return code - 32600, False
    if 32701 <= code <= 32760:
        return code - 32700, True
    raise ValueError(f"not a UTM EPSG code: {proj_code}")


# degrees <-> meters quick conversion (reference constants.py:64 factor 111320,
# cos(lat) shrink in x — sen2.py:966-968, :1218-1229)
M_PER_DEG = 111320.0


def deg_to_m(res_deg: float, lat: float = 0.0) -> tuple[float, float]:
    return res_deg * M_PER_DEG * np.cos(np.radians(lat)), res_deg * M_PER_DEG


def m_to_deg(res_m: float, lat: float = 0.0) -> tuple[float, float]:
    return res_m / (M_PER_DEG * np.cos(np.radians(lat))), res_m / M_PER_DEG


# ---------------------------------------------------------------------------
# thin-plate-spline UV mapping over 4 footprint corners (J6)
# ---------------------------------------------------------------------------


def order_footprint_corners(ring_x, ring_y, descending: bool = True):
    """Pick the 4 extreme corners of a (possibly rotated) footprint ring in
    a fixed traversal order, orbit-direction aware.

    Mirrors the reference corner selection by argmin/argmax of (lat±lon)
    (``utils.py:788-806``): for descending orbits the scene's local "upper
    left" is the max of (lat - lon) etc.; ascending swaps the diagonals.
    Returns 4x2 array [(x, y) upper-left, upper-right, lower-right,
    lower-left] in scene-local (u, v) order.
    """
    rx = np.asarray(ring_x, np.float64)
    ry = np.asarray(ring_y, np.float64)
    if rx[0] == rx[-1] and ry[0] == ry[-1]:
        rx, ry = rx[:-1], ry[:-1]
    s = ry + rx  # lat + lon
    d = ry - rx  # lat - lon
    if descending:
        ul = np.argmax(d)
        ur = np.argmax(s)
        lr = np.argmin(d)
        ll = np.argmin(s)
    else:
        ul = np.argmax(s)
        ur = np.argmin(d)
        lr = np.argmin(s)
        ll = np.argmax(d)
    idx = [ul, ur, lr, ll]
    return np.stack([rx[idx], ry[idx]], axis=1)


def _tps_kernel(r2: np.ndarray) -> np.ndarray:
    with np.errstate(divide="ignore", invalid="ignore"):
        k = 0.5 * r2 * np.log(r2)
    return np.where(r2 > 0.0, k, 0.0)


class TpsUV:
    """Thin-plate-spline interpolators u(x, y), v(x, y) fit on the 4 scene
    corners mapped to unit-square UV coords (reference utils.py:769-808:
    scipy RBFInterpolator with thin_plate_spline kernel, degree-1 poly).

    With 4 control points the linear system is 7x7 per output — solved once
    per scene with ``np.linalg.solve``; evaluation is vectorized.

    ORIENTATION (deliberate deviation from the reference): this engine maps
    ul→(0,0), ur→(1,0), lr→(1,1), ll→(0,1) — v grows DOWN the swath in scene
    row order, so swath row index = v * (n_rows - 1) directly. The reference
    build_footprint_uv_mapping (utils.py:788-806) instead anchors v=0 at the
    along-track END corner (descending: ll→(0,0), ul→(0,1)), i.e. its v axis
    is flipped relative to ours: v_ref = 1 - v_engine. Any row-range consumer
    ported from reference conventions must apply that flip; in-repo consumers
    (operators/swath.uv_clip_scenes row pruning) use the engine convention
    consistently.
    """

    UV = np.array([[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0]])  # ul,ur,lr,ll

    def __init__(self, corners_xy: np.ndarray):
        c = np.asarray(corners_xy, np.float64)  # 4x2
        n = c.shape[0]
        d2 = ((c[:, None, :] - c[None, :, :]) ** 2).sum(-1)
        K = _tps_kernel(d2)
        P = np.hstack([np.ones((n, 1)), c])  # 4x3
        A = np.zeros((n + 3, n + 3))
        A[:n, :n] = K
        A[:n, n:] = P
        A[n:, :n] = P.T
        rhs = np.zeros((n + 3, 2))
        rhs[:n] = self.UV
        self._c = c
        self._w = np.linalg.solve(A, rhs)  # (n+3) x 2

    def __call__(self, x, y) -> tuple[np.ndarray, np.ndarray]:
        x = np.asarray(x, np.float64).ravel()
        y = np.asarray(y, np.float64).ravel()
        pts = np.stack([x, y], axis=1)
        d2 = ((pts[:, None, :] - self._c[None, :, :]) ** 2).sum(-1)
        K = _tps_kernel(d2)
        P = np.hstack([np.ones((x.size, 1)), pts])
        uv = K @ self._w[:4] + P @ self._w[4:]
        return uv[:, 0], uv[:, 1]


def find_relative_bbox(ring_x, ring_y, query_bbox, descending: bool = True):
    """Query bbox -> clipped UV sub-rectangle of the scene footprint
    (reference ``find_relative_bbox`` utils.py:811-849): project query
    corners through the TPS UV map, clip to [0, 1].

    Returns (u0, v0, u1, v1) or None when the query misses the footprint
    entirely. Drives swath row/col pruning (F12).
    """
    corners = order_footprint_corners(ring_x, ring_y, descending)
    tps = TpsUV(corners)
    qx, qy = bbox_to_ring(query_bbox)
    u, v = tps(qx[:-1], qy[:-1])
    u0, u1 = np.clip([u.min(), u.max()], 0.0, 1.0)
    v0, v1 = np.clip([v.min(), v.max()], 0.0, 1.0)
    if u1 <= u0 or v1 <= v0:
        return None
    return float(u0), float(v0), float(u1), float(v1)
