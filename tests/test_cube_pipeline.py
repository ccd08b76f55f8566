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
