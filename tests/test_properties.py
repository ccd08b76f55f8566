"""Property-based tests (hypothesis) for the pure-NumPy kernels."""

import numpy as np
from hypothesis import given, settings, strategies as st

from xcube_stac_spark import cells, codecs, geom


@given(
    h=st.integers(1, 40),
    w=st.integers(1, 40),
    seed=st.integers(0, 2**31 - 1),
)
@settings(max_examples=30, deadline=None)
def test_lossless_roundtrip_any_uint16(h, w, seed):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 65536, (h, w)).astype(np.uint16)
    for fmt in ("raw", "png"):
        out = codecs.decode(codecs.encode(img, fmt), fmt, w, h)
        np.testing.assert_array_equal(out, img)


@given(h=st.integers(8, 48), w=st.integers(8, 48), seed=st.integers(0, 2**31 - 1))
@settings(max_examples=20, deadline=None)
def test_lossy_shape_and_determinism(h, w, seed):
    rng = np.random.default_rng(seed)
    base = rng.uniform(500, 4000)
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.clip(base + 10 * np.sin(xx / 3) + 8 * np.cos(yy / 4), 0, 65535).astype(np.uint16)
    blob = codecs.encode(img, "lossy")
    assert blob == codecs.encode(img, "lossy")
    out = codecs.decode(blob, "lossy", w, h)
    assert out.shape == (h, w)
    # smooth content reconstructs tightly
    assert np.abs(out.astype(float) - img.astype(float)).max() < 64


@given(
    lon=st.floats(-179, 179), lat=st.floats(-84, 84),
    zone_off=st.floats(-2.9, 2.9),
)
@settings(max_examples=100, deadline=None)
def test_tm_roundtrip_property(lon, lat, zone_off):
    zone = min(max(int(np.floor((lon + 180) / 6)) + 1, 1), 60)
    lon2 = geom.zone_central_lon(zone) + zone_off
    e, n = geom.tm_forward(np.array([lon2]), np.array([lat]), zone)
    lo, la = geom.tm_inverse(e, n, zone)
    # 3rd-order Krüger truncation: ~6e-9 deg (≈0.7 mm) worst-case at
    # mid-latitudes — tolerance 2e-8 (~2 mm)
    assert abs(lo[0] - lon2) < 2e-8 and abs(la[0] - lat) < 2e-8


@given(
    xmin=st.floats(-170, 160), ymin=st.floats(-80, 70),
    dx=st.floats(0.01, 9.0), dy=st.floats(0.01, 9.0),
    fx=st.floats(0.01, 0.99), fy=st.floats(0.01, 0.99),
)
@settings(max_examples=100, deadline=None)
def test_cover_bbox_contains_interior_points(xmin, ymin, dx, dy, fx, fy):
    xmax, ymax = xmin + dx, ymin + dy
    cover = set(cells.cover_bbox(xmin, ymin, xmax, ymax).tolist())
    px, py = xmin + fx * dx, ymin + fy * dy
    assert int(cells.cell_id(px, py)) in cover


@given(
    cx=st.floats(-100, 100), cy=st.floats(-60, 60),
    r=st.floats(0.1, 5.0), ang=st.floats(0, 2 * np.pi),
    fr=st.floats(0.0, 2.0),
)
@settings(max_examples=100, deadline=None)
def test_pip_diamond_property(cx, cy, r, ang, fr):
    """Points at radius fr*r along the axes of a diamond of 'radius' r:
    inside iff fr < 1 (measured along the diamond axes)."""
    ring_x = np.array([cx - r, cx, cx + r, cx, cx - r])
    ring_y = np.array([cy, cy - r, cy, cy + r, cy])
    # test point along one axis (rotate angle to pick axis mix)
    t = fr * r * 0.999 if fr < 1 else fr * r * 1.001
    px, py = cx + t * np.cos(ang), cy + t * np.sin(ang)
    inside = bool(geom.point_in_polygon(np.array([px]), np.array([py]), ring_x, ring_y)[0])
    # diamond: |x-cx| + |y-cy| < r
    expected = (abs(px - cx) + abs(py - cy)) < r
    assert inside == expected


@given(h=st.integers(1, 48), w=st.integers(1, 48), seed=st.integers(0, 2**31 - 1))
@settings(max_examples=25, deadline=None)
def test_jpeg_roundtrip_any_shape(h, w, seed):
    """Baseline JPEG: shape/dtype-preserving decode and deterministic bytes
    for ANY image shape (incl. 1xN edge cases), bounded error (<=2x the
    8-bit quantization step on smooth content is not guaranteed for noise,
    so only structural properties are asserted universally)."""
    rng = np.random.default_rng(seed)
    base = rng.uniform(500, 60000)
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.clip(base + 300 * np.sin(xx / 5) + 200 * np.cos(yy / 7), 0, 65535).astype(np.uint16)
    blob = codecs.encode(img, "jpeg")
    assert blob == codecs.encode(img, "jpeg")  # deterministic
    out = codecs.decode(blob, "jpeg", w, h)
    assert out.shape == (h, w) and out.dtype == np.uint16
    # smooth content: within a few 8-bit quantization steps everywhere
    assert np.abs(out.astype(np.int64) - img.astype(np.int64)).max() <= 8 * 257


@given(
    mantissa=st.integers(0, 10**10),
    exp=st.integers(-9, 3),
    digits=st.integers(0, 7),
    sign=st.sampled_from([1.0, -1.0]),
)
@settings(max_examples=200, deadline=None)
def test_round_half_up_properties(mantissa, exp, digits, sign):
    """fixtures.round_half_up: idempotent, sign-symmetric (HALF_UP rounds
    away from zero), and never further than half an ulp of the target digit
    from the shortest-repr decimal value."""
    from decimal import Decimal

    from xcube_stac_spark.fixtures import round_half_up

    x = sign * mantissa * (10.0 ** exp)
    r = round_half_up(x, digits)
    assert round_half_up(r, digits) == r
    assert round_half_up(-x, digits) == -r
    assert abs(Decimal(repr(x)) - Decimal(repr(r))) <= Decimal(1).scaleb(-digits) / 2


@given(
    h=st.integers(1, 32),
    w=st.integers(1, 32),
    color=st.booleans(),
    seed=st.integers(0, 2**31 - 1),
)
@settings(max_examples=25, deadline=None)
def test_webp_roundtrip_any_8bit_content(h, w, color, seed):
    """VP8L subset is exact for ANY 8-bit-valued content and shape,
    gray or color — including degenerate 1-pixel and 1-2-symbol images
    (the simple-code form)."""
    rng = np.random.default_rng(seed)
    shape = (3, h, w) if color else (h, w)
    img = (rng.integers(0, 256, shape).astype(np.uint16)) * np.uint16(257)
    out = codecs.decode_webp(codecs.encode_webp(img))
    assert out.shape == (3, h, w)
    if color:
        np.testing.assert_array_equal(out, img)
    else:
        for c in range(3):
            np.testing.assert_array_equal(out[c], img)


@given(
    n=st.integers(1, 8),
    h=st.integers(8, 24),
    w=st.integers(8, 24),
    fps=st.integers(1, 60),
    color=st.booleans(),
    seed=st.integers(0, 2**31 - 1),
)
@settings(max_examples=15, deadline=None)
def test_avi_container_roundtrip_any_clip(n, h, w, fps, color, seed):
    """MJPEG-in-AVI: any frame count/geometry/fps survives the container
    (index-seek frame == full-decode frame; metadata matches)."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    frames = []
    for t in range(n):
        base = np.clip(20000 + 8000 * np.sin(xx / 5.0 + t), 0, 65535)
        if color:
            frames.append(np.stack([base, base / 2, base / 3]).astype(np.uint16))
        else:
            frames.append(base.astype(np.uint16))
    data = codecs.encode_avi_mjpeg(frames, fps=fps)
    meta = codecs.parse_avi(data)
    assert (meta["n_frames"], meta["w"], meta["h"]) == (n, w, h)
    assert meta["fps"] == float(fps)
    _, full = codecs.decode_avi_mjpeg(data)
    pick = int(rng.integers(0, n))
    np.testing.assert_array_equal(
        codecs.decode_avi_frame(data, pick, meta), full[pick]
    )


@given(
    h=st.integers(1, 40),
    w=st.integers(1, 40),
    seed=st.integers(0, 2**31 - 1),
)
@settings(max_examples=20, deadline=None)
def test_color_tiff_cog_roundtrip_any_uint16(h, w, seed):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 65536, (3, h, w)).astype(np.uint16)
    for fmt in ("tiff", "cog"):
        out = codecs.decode(codecs.encode(img, fmt), fmt, w, h)
        np.testing.assert_array_equal(out, img)
