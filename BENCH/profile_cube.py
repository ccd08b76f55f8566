#!/usr/bin/env python
"""Stage-level profiling of the flagship cube build at a given sf/core count.

Separates: metadata joins | decode+regrid (map-only) | + mosaic shuffle,
so regressions are attributable. Usage:
  SPARK_GRAFT_CPUS=32 python BENCH/profile_cube.py [sf0.1]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from xcube_stac_spark import synth
from xcube_stac_spark.session import get_spark
from xcube_stac_spark.operators import tiles as tiles_op
from xcube_stac_spark.plans import cube as cube_plan
from xcube_stac_spark.sources.catalog import SceneCatalog

sf = sys.argv[1] if len(sys.argv) > 1 else "sf0.1"
cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
sdir = synth.generate(sf)
spark = get_spark("profile", master=f"local[{cpus}]")
cat = SceneCatalog(spark, sdir)
grid = synth.default_grid(sf, tile=128, res_factor=float(os.environ.get("XSS_RES_FACTOR", "1.1")))
bands = list(synth.PARAMS[sf].bands)
tr = ("2025-06-01", "2025-06-30")

t0 = time.perf_counter()
scenes = cube_plan.select_scenes(cat, grid.bbox(), tr)
imgs = cube_plan.scene_images(cat, scenes, bands)
assigned = tiles_op.assign_grid_tiles(imgs, grid)
n_imgs = assigned.count()
t1 = time.perf_counter()
regridded = tiles_op.decode_regrid(assigned, grid)
n_reg = regridded.count()
t2 = time.perf_counter()
cube = tiles_op.mosaic_take_first(regridded)
n_tiles = cube.count()
t3 = time.perf_counter()
print(
    f"cpus={cpus} sf={sf} | meta={t1 - t0:.1f}s ({n_imgs} imgs) | "
    f"decode+regrid={t2 - t1:.1f}s ({n_reg} tile-contribs) | "
    f"regrid+mosaic={t3 - t2:.1f}s ({n_tiles} tiles) | total={t3 - t0:.1f}s"
)
