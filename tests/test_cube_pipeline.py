"""End-to-end flagship pipeline vs the independent NumPy oracle.

The distributed result must match the oracle EXACTLY on: selected scenes,
tile assignment (key set), per-tile lineage (mosaic order), and pixels
(float32 bit-level — both paths do scale*DN+offset in float64 then cast).
Mirrors the reference's golden end-to-end asserts (test_store.py:843-937)
plus the mosaic golden matrices (test_utils.py:585-662) philosophy.
"""

import numpy as np
import pytest

from xcube_stac_spark import oracle, synth
from xcube_stac_spark.operators import tiles as tiles_op
from xcube_stac_spark.plans import cube as cube_plan
from xcube_stac_spark.sources.catalog import SceneCatalog

BANDS = ["B02", "B03"]
TIME_RANGE = ("2025-06-01", "2025-06-30")


@pytest.fixture(scope="module")
def built(spark, sf0001_dir):
    grid = synth.default_grid("sf0.001")
    cat = SceneCatalog(spark, sf0001_dir)
    df = cube_plan.build_cube(cat, grid, time_range=TIME_RANGE, bands=BANDS)
    rows = df.collect()
    ocube = oracle.build_cube_numpy(sf0001_dir, grid, time_range=TIME_RANGE, bands=BANDS)
    return grid, rows, ocube


def test_tile_key_sets_match(built):
    grid, rows, ocube = built
    got = {(r.solar_day.isoformat(), r.band, r.tile_y, r.tile_x) for r in rows}
    assert got == set(ocube.tiles.keys())
    assert len(got) > 20  # non-trivial cube


def test_lineage_and_order_match(built):
    grid, rows, ocube = built
    for r in rows:
        key = (r.solar_day.isoformat(), r.band, r.tile_y, r.tile_x)
        assert r.item_ids.split(",") == ocube.lineage[key], key
        assert r.n_scenes == len(ocube.lineage[key])


def test_pixels_match_oracle(built):
    grid, rows, ocube = built
    n_multi = 0
    for r in rows:
        key = (r.solar_day.isoformat(), r.band, r.tile_y, r.tile_x)
        shape = ocube.tiles[key].shape
        got = tiles_op.tile_to_array(r.data, shape[0], shape[1])
        exp = ocube.tiles[key]
        both_nan = np.isnan(got) & np.isnan(exp)
        assert np.array_equal(got[~both_nan], exp[~both_nan]), key
        if r.n_scenes > 1:
            n_multi += 1
    assert n_multi > 0  # mosaic actually merged multiple scenes somewhere


def test_mosaic_merges_complementary_stripes(built):
    """Same-day A/B scene pairs have complementary nodata stripes; the
    merged tile must be more complete than either contribution alone."""
    grid, rows, ocube = built
    paired = [r for r in rows if r.n_scenes >= 2]
    assert paired
    # at least one paired tile is (nearly) fully valid thanks to the merge
    assert max(r.valid_frac for r in paired) > 0.95


def test_dedup_excluded_old_versions(built):
    grid, rows, ocube = built
    all_items = set()
    for r in rows:
        all_items.update(r.item_ids.split(","))
    # 05.11 reprocessings exist for (tx+ty+day)%5==0 tiles; their 05.00
    # originals must never contribute
    dup_days_tiles = {i.rsplit("_", 1)[0] for i in all_items if i.endswith("0511")}
    for base in dup_days_tiles:
        assert f"{base}_0500" not in {i.rsplit(':', 1)[0] for i in all_items}


def test_antimeridian_item_excluded(built):
    grid, rows, ocube = built
    for r in rows:
        assert "_XAM" not in r.item_ids


def test_angle_bands_regrid_like_spectral(spark, sf0001_dir):
    """C14/C15: 23x23 angle planes (different res + scaling per asset) flow
    through the same pipeline and match the NumPy oracle bit-exactly."""
    grid = synth.default_grid("sf0.001")
    cat = SceneCatalog(spark, sf0001_dir)
    df = cube_plan.build_cube(
        cat, grid, time_range=("2025-06-01", "2025-06-03"), bands=["VZA"]
    )
    rows = df.collect()
    assert rows
    ocube = oracle.build_cube_numpy(
        sf0001_dir, grid, time_range=("2025-06-01", "2025-06-03"), bands=["VZA"]
    )
    got_keys = {(r.solar_day.isoformat(), r.band, r.tile_y, r.tile_x) for r in rows}
    assert got_keys == set(ocube.tiles.keys())
    for r in rows:
        key = (r.solar_day.isoformat(), r.band, r.tile_y, r.tile_x)
        exp = ocube.tiles[key]
        got = tiles_op.tile_to_array(r.data, exp.shape[0], exp.shape[1])
        both_nan = np.isnan(got) & np.isnan(exp)
        assert np.array_equal(got[~both_nan], exp[~both_nan]), key
        # angle values decode to plausible degrees (scale 0.01, offset -0.01)
        finite = got[np.isfinite(got)]
        assert finite.size and (finite >= 0).all() and (finite <= 360).all()


def test_empty_region_returns_no_rows(spark, sf0001_dir):
    grid = synth.default_grid("sf0.001")
    cat = SceneCatalog(spark, sf0001_dir)
    df = cube_plan.build_cube(
        cat, grid, bbox=[100.0, 10.0, 101.0, 11.0], time_range=TIME_RANGE, bands=BANDS
    )
    assert df.count() == 0


def test_categorical_integer_band_never_blends(spark):
    """SCL-style categorical bands (reference CHANGES 1.2.0: 'mosaicking of
    integer arrays now works correctly when requesting the Scene
    Classification Layer'): with scale=1/offset=0, the NN-regrid +
    take-first path must emit EXACTLY the source class ids — no
    interpolation, no blending, even where two same-day scenes overlap."""
    import pandas as pd

    from xcube_stac_spark import codecs, geom
    from xcube_stac_spark.gridspec import GridSpec
    from xcube_stac_spark.operators import tiles as tiles_op

    classes = np.array([0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11], np.uint16)
    rng = np.random.default_rng(3)
    grid = GridSpec("EPSG:4326", x0=11.9, y0=49.62, res=0.001, width=64,
                    height=64, tile_w=32, tile_h=32)
    # scene extent derived from the grid's own UTM projection so it covers it
    lons = np.array([grid.x0, grid.x1])
    lats = np.array([grid.y1, grid.y0])
    e, n = geom.tm_forward(*np.meshgrid(lons, lats), 32, False)
    x0 = float(e.min()) - 500.0
    y0 = float(n.max()) + 500.0  # north edge

    rows = []
    for i, second in enumerate((False, True)):
        scl = rng.choice(classes[1:], size=(120, 120)).astype(np.uint16)
        if second:
            scl[:, :60] = 0  # nodata half — the first scene must win there
        rows.append(dict(
            solar_day=__import__("datetime").date(2025, 6, 1),
            band="SCL", item_id=f"S{i}", t_order=i,
            bytes=codecs.encode_raw(scl), fmt="raw", w=120, h=120,
            zone=32, south=False,
            scene_x0=x0, scene_y0=y0, scene_res=100.0,
            nodata=0.0, scale=1.0, offset=0.0,
            bbox_xmin=11.8, bbox_ymin=49.5, bbox_xmax=12.0, bbox_ymax=49.65,
        ))
    ddl = ("solar_day date, band string, item_id string, t_order long, "
           "bytes binary, fmt string, w int, h int, zone int, south boolean, "
           "scene_x0 double, scene_y0 double, scene_res double, nodata double, "
           "scale double, offset double, bbox_xmin double, bbox_ymin double, "
           "bbox_xmax double, bbox_ymax double")
    df = spark.createDataFrame(pd.DataFrame(rows), ddl)
    assigned = tiles_op.assign_grid_tiles(df, grid)
    cube = tiles_op.mosaic_take_first(tiles_op.decode_regrid(assigned, grid)).collect()
    assert cube
    seen = set()
    for r in cube:
        arr = tiles_op.tile_to_array(bytes(r.data), *grid.tile_shape(r.tile_x, r.tile_y))
        vals = arr[np.isfinite(arr)]
        # every output pixel is EXACTLY one of the integer class ids
        assert np.array_equal(vals, np.round(vals)), "blended class values"
        seen |= set(np.unique(vals).astype(int).tolist())
    assert seen <= set(classes.tolist()) - {0}
    assert len(seen) > 3  # actually sampled a mix of classes


def test_decode_regrid_scene_missing_grid_is_empty_not_crash(spark):
    """Regression: a decode batch whose scenes all MISS the grid must yield
    an empty result, not an Arrow dtype crash (empty dict-of-lists DataFrame
    defaulted solar_day to float64 → 'cast double to date32' error)."""
    import datetime as dt

    import pandas as pd

    from xcube_stac_spark import codecs
    from xcube_stac_spark.gridspec import GridSpec
    from xcube_stac_spark.operators import tiles as tiles_op

    grid = GridSpec("EPSG:4326", x0=11.9, y0=49.62, res=0.001, width=64,
                    height=64, tile_w=32, tile_h=32)
    img = np.full((8, 8), 7, np.uint16)
    row = dict(
        solar_day=dt.date(2025, 6, 1), band="B02", item_id="S0", t_order=0,
        bytes=codecs.encode_raw(img), fmt="raw", w=8, h=8,
        zone=32, south=False,
        # far away in UTM: tiles intersect the bbox but no pixel lands inside
        scene_x0=900_000.0, scene_y0=6_000_000.0, scene_res=100.0,
        nodata=0.0, scale=1.0, offset=0.0,
        bbox_xmin=11.8, bbox_ymin=49.5, bbox_xmax=12.0, bbox_ymax=49.65,
    )
    ddl = ("solar_day date, band string, item_id string, t_order long, "
           "bytes binary, fmt string, w int, h int, zone int, south boolean, "
           "scene_x0 double, scene_y0 double, scene_res double, nodata double, "
           "scale double, offset double, bbox_xmin double, bbox_ymin double, "
           "bbox_xmax double, bbox_ymax double")
    df = spark.createDataFrame(pd.DataFrame([row]), ddl)
    assigned = tiles_op.assign_grid_tiles(df, grid)
    out = tiles_op.decode_regrid(assigned, grid)
    assert out.count() == 0


def test_regrid_fast_path_survives_int32_overflowing_shift():
    """Interior-tile fast path at a REALISTIC UTM origin: northing ~5e6 m and
    a 10k-px-wide scene make sy*w ~ 5e9 > 2^31. The flat plane and scalar
    shift wrap mod 2^32 by construction; the gather must neither raise
    (NumPy >= 2 scalar conversion) nor mis-index. Values are checked against
    the index spec computed independently in int64."""
    import zlib

    from xcube_stac_spark import geom
    from xcube_stac_spark.gridspec import GridSpec
    from xcube_stac_spark.operators.tiles import (
        _regrid_one, _tile_utm_coords, pixel_residue_shift,
    )

    res_deg = 10.0 / 111320.0
    grid = GridSpec(
        crs="EPSG:4326", x0=9.0, y0=45.0, res=res_deg,
        width=32, height=32, tile_w=32, tile_h=32,
    )
    gd = grid.to_dict()
    g_key = tuple(sorted(gd.items()))
    zone, south = 32, False
    e, n = _tile_utm_coords(g_key, 0, 0, zone, south)
    scene_res = 10.0
    h, w = 200, 10_000
    # scene origin on the res lattice, covering the tile with margin
    scene_x0 = np.floor(e.min() / scene_res) * scene_res - 40 * scene_res
    scene_y0 = np.ceil(n.max() / scene_res) * scene_res + 40 * scene_res
    sy = int(round(scene_y0 / scene_res))
    assert sy * w > 2**31, "fixture must exercise the overflow regime"

    rng = np.random.default_rng(7)
    img = rng.integers(1, 60000, size=(h, w), dtype=np.uint16)
    out = _regrid_one(
        img, grid, g_key, 0, 0, zone, south,
        float(scene_x0), float(scene_y0), scene_res, nodata=0.0,
    )
    assert out is not None
    from xcube_stac_spark.operators.tiles import decompress_window

    dn = np.frombuffer(
        decompress_window(out[0], 2 * e.size), np.uint16
    ).reshape(e.shape)

    # independent int64 spec: residue decomposition then integer shift
    rx, sx = pixel_residue_shift(float(scene_x0), scene_res)
    ry, sy2 = pixel_residue_shift(float(scene_y0), scene_res)
    col = np.floor((e - np.float32(rx)) / np.float32(scene_res)).astype(np.int64) - sx
    row = np.floor((np.float32(ry) - n) / np.float32(scene_res)).astype(np.int64) + sy2
    assert (col >= 0).all() and (col < w).all() and (row >= 0).all() and (row < h).all()
    np.testing.assert_array_equal(dn, img[row, col])


def test_error_bands_dropped_unless_requested(spark, sf0001_dir):
    """F9 (sen3.py:186-190): *_err uncertainty companions are excluded from
    an all-bands selection, but selectable explicitly by name."""
    import pyspark.sql.functions as F

    cat = SceneCatalog(spark, sf0001_dir)
    base_assets = cat.assets()

    class _ErrCat(SceneCatalog):
        def assets(self):
            err = base_assets.withColumn(
                "band", F.concat(F.col("band"), F.lit("_err"))
            )  # same image_id: the payload join must still resolve
            return base_assets.unionByName(err)

    ecat = _ErrCat(spark, sf0001_dir)
    grid = synth.default_grid("sf0.001")
    scenes = cube_plan.select_scenes(ecat, grid.bbox(), TIME_RANGE)

    all_bands = {
        r.band for r in cube_plan.scene_images(ecat, scenes).select("band").distinct().collect()
    }
    assert all_bands and not any(b.endswith("_err") for b in all_bands)

    asked = {
        r.band
        for r in cube_plan.scene_images(ecat, scenes, bands=["B02", "B02_err"])
        .select("band").distinct().collect()
    }
    assert asked == {"B02", "B02_err"}
