#!/usr/bin/env python
"""spark-submit entry point for the flagship cube build.

Production invocation (north rule: spark-submit --py-files on a
multi-executor cluster):

    spark-submit \
      --py-files xcube_stac_spark.zip \
      jobs/build_cube_job.py \
      --catalog /data/catalog --out /data/cube \
      --bbox 10.6 48.9 13.4 50.8 \
      --time-range 2025-06-01 2025-06-30 \
      --bands B02 B03 B04 \
      --grid-res 0.0099 --tile 1024 --resume

Locally it runs on whatever master the session default picks
(local[$SPARK_GRAFT_CPUS]). The job is resumable: re-running with the same
--out skips partitions already in the commit log.

Build the --py-files archive with:
    (cd /root/repo && zip -qr xcube_stac_spark.zip xcube_stac_spark)
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--catalog", required=True, help="catalog root (scenes/images/assets tables)")
    p.add_argument("--out", required=True, help="output cube path")
    p.add_argument("--bbox", nargs=4, type=float, metavar=("XMIN", "YMIN", "XMAX", "YMAX"))
    p.add_argument("--time-range", nargs=2, metavar=("T0", "T1"), default=["1970-01-01", "2100-01-01"])
    p.add_argument("--bands", nargs="+", default=None)
    p.add_argument("--collections", nargs="+", default=None)
    p.add_argument("--grid-res", type=float, required=True, help="target grid resolution (deg)")
    p.add_argument("--tile", type=int, default=1024, help="grid tile size (px)")
    p.add_argument("--levels", type=int, default=0, help="extra pyramid levels to write")
    p.add_argument("--resume", action="store_true", help="skip partitions already committed")
    p.add_argument("--master", default=None)
    args = p.parse_args(argv)

    from xcube_stac_spark.session import get_spark
    from xcube_stac_spark.gridspec import GridSpec
    from xcube_stac_spark import lineage
    from xcube_stac_spark.operators import pyramid as pyr
    from xcube_stac_spark.plans import cube as cube_plan
    from xcube_stac_spark.sources.catalog import SceneCatalog

    spark = get_spark("build_cube", master=args.master)
    cat = SceneCatalog(spark, args.catalog)
    if args.bbox:
        xmin, ymin, xmax, ymax = args.bbox
    else:
        r = cat.collections().collect()[0]
        xmin, ymin, xmax, ymax = r.xmin, r.ymin, r.xmax, r.ymax
    width = max(1, int(round((xmax - xmin) / args.grid_res)))
    height = max(1, int(round((ymax - ymin) / args.grid_res)))
    grid = GridSpec(
        crs="EPSG:4326", x0=xmin, y0=ymax, res=args.grid_res,
        width=width, height=height, tile_w=args.tile, tile_h=args.tile,
    )
    cube = cube_plan.build_cube(
        cat, grid, bbox=(xmin, ymin, xmax, ymax),
        time_range=tuple(args.time_range), bands=args.bands,
        collections=args.collections,
    )
    metrics = lineage.write_cube(
        cube, args.out, resume=args.resume,
        attrs={
            "bbox": [xmin, ymin, xmax, ymax],
            "time_range": args.time_range,
            "bands": args.bands,
            "grid": grid.to_dict(),
            "engine": "xcube_stac_spark",
        },
    )
    if args.levels > 0:
        base = lineage.read_cube(spark, args.out)
        pyr_df = pyr.build_pyramid(base, grid, args.levels)
        (
            pyr_df.where("level > 0")
            .withColumn("solar_day", pyr_df["solar_day"].cast("string"))
            .write.mode("overwrite")
            .partitionBy("level", "solar_day")
            .parquet(args.out.rstrip("/") + "_pyramid")
        )
        metrics["pyramid_levels"] = args.levels
    print(json.dumps(metrics))
    return 0


if __name__ == "__main__":
    sys.exit(main())
