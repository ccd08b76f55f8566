"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship cube build on sf0.001.
``queries()`` exposes one callable per implemented operator (SURVEY §2);
``oracle_sql()`` gives the DuckDB-equivalent SQL. Geospatial queries run on
the deterministic synthetic scenes/images tables generated into
``/root/repo/synthdata/<sf>/`` (seed-fixed; regenerate with
``python -m xcube_stac_spark.synth``); their oracle SQL reads the same
parquet via ``read_parquet`` absolute paths at sf0.01 (the driver's
correctness scale). Non-SQL-expressible pixel ops (cube_build) are covered
by the NumPy oracle in tests/test_cube_pipeline.py and get rows-only checks
here.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from xcube_stac_spark import cells
from xcube_stac_spark import functions as X
from xcube_stac_spark import synth
from xcube_stac_spark.operators import spatial
from xcube_stac_spark.plans import cube as cube_plan
from xcube_stac_spark.sources.catalog import SceneCatalog

# fixed query parameters (shared by Spark queries and oracle SQL)
TIME_RANGE = ("2025-06-02 00:00:00", "2025-06-20 23:59:59")
REGION = (11.4, 49.3, 12.3, 50.0)
KNN_POINT = (12.0, 49.5)
KNN_K = 5
LEVEL = cells.DEFAULT_LEVEL
CELL = cells.cell_size_deg(LEVEL)
NC = cells.n_cols(LEVEL)
NR = 1 << LEVEL

SYNTH_SF001 = "/root/repo/synthdata/sf0.01"


def _cat(spark: SparkSession, sf_dir: str) -> SceneCatalog:
    return SceneCatalog(spark, synth.synth_dir_for(sf_dir))


def _searched(spark, sf_dir):
    return spatial.search_scenes(
        _cat(spark, sf_dir).scenes(), time_range=TIME_RANGE
    )


# ---------------------------------------------------------------------------
# entry
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full spatial-join + decode + regrid + mosaic cube on the
    sf0.001 synthetic world (metadata columns only — pixel payloads stay
    distributed)."""
    sdir = synth.generate("sf0.001")
    cat = SceneCatalog(spark, sdir)
    grid = synth.default_grid("sf0.001")
    cube = cube_plan.build_cube(
        cat, grid, time_range=("2025-06-01", "2025-06-30"), bands=["B02", "B03"]
    )
    return cube.select(
        F.col("solar_day").cast("string").alias("solar_day"),
        "band", "tile_y", "tile_x", "n_scenes", "item_ids",
        F.round("valid_frac", 6).alias("valid_frac"),
        F.round("checksum", 3).alias("checksum"),
    )


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------

def _q_scene_search(spark, sf_dir):
    return _searched(spark, sf_dir).select("item_id", "tile_id", "proc_version")


def _q_solar_day(spark, sf_dir):
    df = spatial.with_solar_day(_searched(spark, sf_dir))
    return df.select(
        "item_id", F.col("solar_day").cast("string").alias("solar_day")
    )


def _q_dedup_latest(spark, sf_dir):
    df = spatial.dedup_latest_version(_searched(spark, sf_dir))
    return df.select(
        "item_id", "tile_id", F.col("solar_day").cast("string").alias("solar_day"),
        "proc_version",
    )


def _q_cell_cover(spark, sf_dir):
    df = spatial.cover_with_cells(_searched(spark, sf_dir), LEVEL)
    return df.select("item_id", "cell")


def _q_spatial_join_region(spark, sf_dir):
    df = spatial.spatial_join_region(_searched(spark, sf_dir), REGION, LEVEL, refine="bbox")
    return df.select("item_id", "tile_id")


def _q_knn_tiles(spark, sf_dir):
    df = spatial.knn_scenes(_searched(spark, sf_dir), KNN_POINT[0], KNN_POINT[1], KNN_K)
    return df.select("tile_id", "knn_rank", F.round("dist2", 6).alias("dist2"))


def _q_bbox_union(spark, sf_dir):
    df = spatial.bbox_union(_searched(spark, sf_dir))
    return df.select(
        "tile_id",
        F.round("xmin", 6).alias("xmin"), F.round("ymin", 6).alias("ymin"),
        F.round("xmax", 6).alias("xmax"), F.round("ymax", 6).alias("ymax"),
        "n_scenes",
    )


def _q_lineage(spark, sf_dir):
    df = spatial.lineage_per_time(_searched(spark, sf_dir))
    return df.select(
        F.col("solar_day").cast("string").alias("solar_day"), "item_ids", "n_items"
    )


def _q_hemisphere_fix(spark, sf_dir):
    scn = _cat(spark, sf_dir).scenes()
    center_lat = X.bbox_center_lat(F.col("bbox_ymin"), F.col("bbox_ymax"))
    return scn.select(
        "item_id", "proj_code",
        X.fix_hemisphere(F.col("proj_code"), center_lat).alias("proj_code_fixed"),
    )


def _q_collections_stats(spark, sf_dir):
    df = _cat(spark, sf_dir).collections()
    return df.select(
        "collection", "n_items",
        F.round("xmin", 6).alias("xmin"), F.round("ymin", 6).alias("ymin"),
        F.round("xmax", 6).alias("xmax"), F.round("ymax", 6).alias("ymax"),
    )


def _q_cube_build(spark, sf_dir):
    """Flagship pixel pipeline — non-SQL-expressible (decode/regrid/mosaic
    in Arrow UDFs); correctness is enforced bit-exactly against the NumPy
    oracle in tests/test_cube_pipeline.py. Rows-only check here."""
    sf = os.path.basename(os.path.normpath(sf_dir))
    if sf not in synth.PARAMS:
        sf = "sf0.01"
    cat = _cat(spark, sf_dir)
    grid = synth.default_grid(sf)
    cube = cube_plan.build_cube(
        cat, grid, time_range=TIME_RANGE, bands=["B02", "B03"]
    )
    return cube.select(
        F.col("solar_day").cast("string").alias("solar_day"),
        "band", "tile_y", "tile_x", "n_scenes", "item_ids",
        F.round("valid_frac", 6).alias("valid_frac"),
    )


def _q_tpch_q1(spark, sf_dir):
    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 3).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 3).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 3
            ).alias("sum_disc_price"),
            F.count("*").alias("count_order"),
        )
    )


def _q_events_daily(spark, sf_dir):
    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    return (
        ev.groupBy(F.to_date("ts").cast("string").alias("day"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 3).alias("total_value"))
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "scene_search": _q_scene_search,
        "solar_day": _q_solar_day,
        "dedup_latest": _q_dedup_latest,
        "cell_cover": _q_cell_cover,
        "spatial_join_region": _q_spatial_join_region,
        "knn_tiles": _q_knn_tiles,
        "bbox_union": _q_bbox_union,
        "lineage": _q_lineage,
        "hemisphere_fix": _q_hemisphere_fix,
        "collections_stats": _q_collections_stats,
        "cube_build": _q_cube_build,
        "tpch_q1": _q_tpch_q1,
        "events_daily": _q_events_daily,
    }


# ---------------------------------------------------------------------------
# oracle SQL (DuckDB dialect)
# ---------------------------------------------------------------------------

_SCENES = f"read_parquet('{SYNTH_SF001}/scenes.parquet')"

# the search_scenes predicate (bbox-less variant used by most queries)
_SEARCH_CTE = f"""
searched AS (
  SELECT * FROM {_SCENES}
  WHERE abs(bbox_xmax - bbox_xmin) < 20
    AND (
      (datetime IS NOT NULL AND epoch(datetime) BETWEEN epoch(TIMESTAMP '{TIME_RANGE[0]}') AND epoch(TIMESTAMP '{TIME_RANGE[1]}'))
      OR (datetime IS NULL AND epoch(start_datetime) <= epoch(TIMESTAMP '{TIME_RANGE[1]}')
          AND epoch(end_datetime) >= epoch(TIMESTAMP '{TIME_RANGE[0]}'))
    )
)"""

_SOLAR_CTE = """
solar AS (
  SELECT *,
    strftime(to_timestamp(epoch(coalesce(datetime, start_datetime + (end_datetime - start_datetime) / 2))
             + trunc(((bbox_xmin + bbox_xmax) / 2) / 15) * 3600), '%Y-%m-%d') AS solar_day
  FROM searched
)"""


def oracle_sql() -> dict[str, str]:
    sqls: dict[str, str] = {}
    sqls["scene_search"] = f"WITH {_SEARCH_CTE.strip()} SELECT item_id, tile_id, proc_version FROM searched"
    sqls["solar_day"] = (
        f"WITH {_SEARCH_CTE.strip()}, {_SOLAR_CTE.strip()} SELECT item_id, solar_day FROM solar"
    )
    sqls["dedup_latest"] = f"""
WITH {_SEARCH_CTE.strip()}, {_SOLAR_CTE.strip()},
ranked AS (
  SELECT *, max(proc_version) OVER (PARTITION BY solar_day, tile_id) AS mv FROM solar
)
SELECT item_id, tile_id, solar_day, proc_version FROM ranked WHERE proc_version = mv
"""
    sqls["cell_cover"] = f"""
WITH {_SEARCH_CTE.strip()}
SELECT item_id, (cy * {NC} + cx) AS cell
FROM searched,
LATERAL (SELECT unnest(generate_series(
    greatest(least(cast(floor((bbox_xmin+180)/{CELL!r}) AS bigint), {NC - 1}), 0),
    greatest(least(cast(floor((bbox_xmax+180)/{CELL!r}) AS bigint), {NC - 1}), 0))) AS cx) t1,
LATERAL (SELECT unnest(generate_series(
    greatest(least(cast(floor((bbox_ymin+90)/{CELL!r}) AS bigint), {NR - 1}), 0),
    greatest(least(cast(floor((bbox_ymax+90)/{CELL!r}) AS bigint), {NR - 1}), 0))) AS cy) t2
"""
    x0, y0, x1, y1 = REGION
    sqls["spatial_join_region"] = f"""
WITH {_SEARCH_CTE.strip()}
SELECT item_id, tile_id FROM searched
WHERE NOT (bbox_xmax < {x0} OR bbox_xmin > {x1} OR bbox_ymax < {y0} OR bbox_ymin > {y1})
"""
    sqls["knn_tiles"] = f"""
WITH {_SEARCH_CTE.strip()},
tiles AS (
  SELECT tile_id, min(bbox_xmin) AS xmin, min(bbox_ymin) AS ymin,
         max(bbox_xmax) AS xmax, max(bbox_ymax) AS ymax
  FROM searched GROUP BY tile_id
),
d AS (
  SELECT tile_id,
         pow((xmin + xmax)/2 - {KNN_POINT[0]}, 2) + pow((ymin + ymax)/2 - {KNN_POINT[1]}, 2) AS dist2
  FROM tiles
),
r AS (SELECT tile_id, dist2, row_number() OVER (ORDER BY dist2 ASC, tile_id ASC) AS knn_rank FROM d)
SELECT tile_id, knn_rank, round(dist2, 6) AS dist2 FROM r WHERE knn_rank <= {KNN_K}
"""
    sqls["bbox_union"] = f"""
WITH {_SEARCH_CTE.strip()}
SELECT tile_id, round(min(bbox_xmin), 6) AS xmin, round(min(bbox_ymin), 6) AS ymin,
       round(max(bbox_xmax), 6) AS xmax, round(max(bbox_ymax), 6) AS ymax,
       count(*) AS n_scenes
FROM searched GROUP BY tile_id
"""
    sqls["lineage"] = f"""
WITH {_SEARCH_CTE.strip()}, {_SOLAR_CTE.strip()}
SELECT solar_day, string_agg(item_id, ',' ORDER BY item_id) AS item_ids, count(*) AS n_items
FROM solar GROUP BY solar_day
"""
    sqls["hemisphere_fix"] = f"""
SELECT item_id, proj_code,
  CASE WHEN cast(split_part(proj_code, ':', 2) AS int) BETWEEN 32601 AND 32760
    THEN 'EPSG:' || cast(
      CASE WHEN (bbox_ymin + bbox_ymax)/2 >= 0
        THEN cast(split_part(proj_code, ':', 2) AS int) % 100 + 32600
        ELSE cast(split_part(proj_code, ':', 2) AS int) % 100 + 32700 END AS varchar)
    ELSE proj_code END AS proj_code_fixed
FROM {_SCENES}
"""
    sqls["collections_stats"] = f"""
SELECT collection, count(*) AS n_items,
       round(min(bbox_xmin), 6) AS xmin, round(min(bbox_ymin), 6) AS ymin,
       round(max(bbox_xmax), 6) AS xmax, round(max(bbox_ymax), 6) AS ymax
FROM {_SCENES} GROUP BY collection
"""
    sqls["tpch_q1"] = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 3) AS sum_qty,
       round(sum(l_extendedprice), 3) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 3) AS sum_disc_price,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""
    sqls["events_daily"] = """
SELECT strftime(cast(ts AS date), '%Y-%m-%d') AS day, event_type,
       count(*) AS n, round(sum(value), 3) AS total_value
FROM events GROUP BY 1, 2
"""
    # cube_build: intentionally no SQL oracle (pixel pipeline; NumPy-oracle
    # verified in tests/test_cube_pipeline.py) → rows-only check
    return sqls
