"""Swath operators (UV clip, orthorectify, rectify) + pyramid + pivot."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from xcube_stac_spark import geom, synth
from xcube_stac_spark.gridspec import GridSpec
from xcube_stac_spark.operators import swath as swath_op
from xcube_stac_spark.operators import pyramid as pyr_op
from xcube_stac_spark.operators import tiles as tiles_op
from xcube_stac_spark.plans import cube as cube_plan
from xcube_stac_spark.sources.catalog import SceneCatalog


@pytest.fixture(scope="module")
def swaths_df(spark):
    return spark.createDataFrame(synth.swath_rows(), synth.SWATH_DDL)


def test_uv_clip(spark, sf0001_dir):
    cat = SceneCatalog(spark, sf0001_dir)
    scenes = cat.scenes().where(~F.col("item_id").endswith("_XAM"))
    # query inside the world core → some hits with sub-unit UV boxes
    rows = swath_op.uv_clip_scenes(scenes, [11.8, 49.2, 12.2, 49.5]).collect()
    hits = [r for r in rows if r.hit]
    assert hits and len(hits) < len(rows)
    for r in hits:
        assert 0.0 <= r.u0 < r.u1 <= 1.0 and 0.0 <= r.v0 < r.v1 <= 1.0
    # far-away query → no hits
    rows = swath_op.uv_clip_scenes(scenes, [100.0, 10.0, 101.0, 11.0]).collect()
    assert not any(r.hit for r in rows)


def test_orthorectify_matches_formula(spark, swaths_df):
    got = {r.item_id: r for r in swath_op.orthorectify(swaths_df).collect()}
    for row in synth.swath_rows():
        shp = (row["rows"], row["cols"])
        lon = np.frombuffer(row["lon"], np.float64).reshape(shp)
        lat = np.frombuffer(row["lat"], np.float64).reshape(shp)
        elev = np.frombuffer(row["elev"], np.float64).reshape(shp)
        zen = np.frombuffer(row["zenith"], np.float64).reshape(shp)
        azi = np.frombuffer(row["azimuth"], np.float64).reshape(shp)
        exp_lon, exp_lat = swath_op.orthorectify_arrays(lon, lat, elev, zen, azi)
        r = got[row["item_id"]]
        np.testing.assert_array_equal(
            np.frombuffer(r.lon, np.float64).reshape(shp), exp_lon
        )
        np.testing.assert_array_equal(
            np.frombuffer(r.lat, np.float64).reshape(shp), exp_lat
        )
        # shift magnitude sane: 1000m at 30deg zenith ≈ 577 m ≈ 0.005 deg
        d = np.abs(exp_lat - lat).max()
        assert 0.001 < d < 0.01


def test_netcdf_swath_reader_matches_columnar_path(spark, swaths_df):
    """S9 real-reader parity: NetCDF-3 granules decode to bit-identical
    planes, and rectify over the nc path equals rectify over raw columns."""
    nc_df = spark.createDataFrame(synth.swath_nc_rows(), synth.SWATH_NC_DDL)
    decoded = {r.item_id: r for r in swath_op.swaths_from_netcdf(nc_df).collect()}
    for raw in synth.swath_rows():
        d = decoded[raw["item_id"]]
        assert (d.rows, d.cols) == (raw["rows"], raw["cols"])
        for col in ("lon", "lat", "elev", "zenith", "azimuth", "values"):
            assert bytes(getattr(d, col)) == raw[col], (raw["item_id"], col)
    grid = GridSpec("EPSG:4326", x0=11.0, y0=50.5, res=0.02, width=80, height=70, tile_w=40, tile_h=35)
    via_nc = swath_op.rectify_swath(swath_op.swaths_from_netcdf(nc_df), grid)
    via_raw = swath_op.rectify_swath(swaths_df, grid)
    key = lambda r: (r.item_id, r.tile_y, r.tile_x)
    a = {key(r): (bytes(r.data), r.valid) for r in via_nc.collect()}
    b = {key(r): (bytes(r.data), r.valid) for r in via_raw.collect()}
    assert a == b and a


def test_rectify_swath_nearest(spark, swaths_df):
    grid = GridSpec("EPSG:4326", x0=11.0, y0=50.5, res=0.02, width=80, height=70, tile_w=40, tile_h=35)
    rows = swath_op.rectify_swath(swaths_df, grid).collect()
    assert rows
    # every emitted value exists in the source plane of that granule
    src = {r["item_id"]: np.frombuffer(r["values"], np.float32) for r in synth.swath_rows()}
    for r in rows[:4]:
        vals = np.frombuffer(r.data, np.float32)
        finite = vals[np.isfinite(vals)]
        assert finite.size == r.valid
        assert np.isin(finite, src[r.item_id]).all()


def test_pyramid_levels(spark, sf0001_dir):
    cat = SceneCatalog(spark, sf0001_dir)
    grid = synth.default_grid("sf0.001")
    cube = cube_plan.build_cube(
        cat, grid, time_range=("2025-06-01", "2025-06-02"), bands=["B02"]
    )
    pyr = pyr_op.build_pyramid(cube, grid, levels=2)
    counts = {r.level: r.n for r in pyr.groupBy("level").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {0, 1, 2}
    assert counts[1] < counts[0] and counts[2] <= counts[1]
    # level-1 nanmean parity on one parent: pick an INTERIOR level-1 tile
    # (full-size children) and recompute
    g1 = grid.coarsen()
    lvl0 = {(r.solar_day, r.band, r.tile_y, r.tile_x): r.data
            for r in pyr.where(F.col("level") == 0).collect()}
    th, tw = grid.tile_h, grid.tile_w
    r1 = None
    for cand in pyr.where(F.col("level") == 1).collect():
        if g1.tile_shape(cand.tile_x, cand.tile_y) == (th, tw) and all(
            grid.tile_shape(2 * cand.tile_x + dx, 2 * cand.tile_y + dy) == (th, tw)
            for dy in (0, 1) for dx in (0, 1)
        ):
            r1 = cand
            break
    assert r1 is not None
    parent = np.full((th, tw), np.nan, np.float32)
    for dy in (0, 1):
        for dx in (0, 1):
            key = (r1.solar_day, r1.band, 2 * r1.tile_y + dy, 2 * r1.tile_x + dx)
            if key in lvl0:
                child = tiles_op.tile_to_array(lvl0[key], th, tw)
                small = pyr_op._halve(child)
                parent[dy * th // 2 : (dy + 1) * th // 2, dx * tw // 2 : (dx + 1) * tw // 2] = small
    got = tiles_op.tile_to_array(r1.data, th, tw)
    both_nan = np.isnan(got) & np.isnan(parent)
    np.testing.assert_array_equal(got[~both_nan], parent[~both_nan])


def test_mosaic_take_last_update_merge(spark, sf0001_dir):
    """order='last' = update-merge: on overlap, the later scene wins."""
    cat = SceneCatalog(spark, sf0001_dir)
    grid = synth.default_grid("sf0.001")
    scenes = cube_plan.select_scenes(cat, grid.bbox(), ("2025-06-01", "2025-06-30"))
    imgs = cube_plan.scene_images(cat, scenes, ["B02"])
    reg = tiles_op.decode_regrid(tiles_op.assign_grid_tiles(imgs, grid), grid)
    first = tiles_op.mosaic_take_first(reg, order="first")
    last = tiles_op.mosaic_take_first(reg, order="last")
    a = {(str(r.solar_day), r.tile_y, r.tile_x): r.checksum for r in first.collect()}
    b = {(str(r.solar_day), r.tile_y, r.tile_x): r.checksum for r in last.collect()}
    assert a.keys() == b.keys()
    assert any(abs(a[k] - b[k]) > 1e-6 for k in a)  # overlaps resolved differently


def test_bilinear_sample_properties(spark, sf0001_dir):
    """Bilinear variant: exact at source-pixel centers, intermediate
    between neighbors elsewhere, NaN near nodata corners."""
    import numpy as np

    from xcube_stac_spark.operators.tiles import (
        _bilinear_sample, _tile_utm_coords,
    )

    img = (np.arange(100, dtype=np.uint16).reshape(10, 10) + 1) * 10
    # fabricate a tiny "mesh" directly in scene meters: centers at
    # x0 + (j+0.5)*res
    res = 10.0
    x0, y0 = 0.0, 100.0
    e = np.array([[x0 + 2.5 * res, x0 + 3.0 * res]], dtype=np.float32)
    n = np.array([[y0 - 4.5 * res, y0 - 4.5 * res]], dtype=np.float32)
    vals, ok = _bilinear_sample(img, e, n, x0, y0, res, nodata=0.0)
    assert ok.all()
    # first point: exactly the center of pixel (row 4, col 2) → value 10*(4*10+2+1)
    assert abs(vals[0, 0] - img[4, 2]) < 1e-3
    # second point midway between cols 2 and 3 → mean of the neighbors
    assert abs(vals[0, 1] - (img[4, 2] + img[4, 3]) / 2) < 1e-3
    # nodata corner → invalid
    img2 = img.copy()
    img2[4, 3] = 0
    v2, ok2 = _bilinear_sample(img2, e, n, x0, y0, res, nodata=0.0)
    assert ok2[0, 0] and not ok2[0, 1]


def test_pivot_bands(spark, sf0001_dir):
    cat = SceneCatalog(spark, sf0001_dir)
    wide = tiles_op.pivot_bands(cat.assets(), ["B02", "B03"], "fmt", ["item_id"]).collect()
    assert all(r.B02_fmt is not None and r.B03_fmt is not None for r in wide)


def test_build_pyramid_rejects_odd_tile_sizes(spark):
    import pytest as _pytest

    from xcube_stac_spark.gridspec import GridSpec
    from xcube_stac_spark.operators import pyramid as pyr_op

    grid = GridSpec("EPSG:4326", x0=0.0, y0=1.0, res=0.01, width=99, height=99,
                    tile_w=33, tile_h=33)
    cube = spark.createDataFrame(
        [], "solar_day date, band string, tile_y int, tile_x int, data binary, valid_frac double"
    )
    with _pytest.raises(ValueError, match="even tile sizes"):
        pyr_op.build_pyramid(cube, grid, levels=1)
