"""Multi-level image pyramid over the cube — the MultiLevelDataset analogue.

Reference: ``store.py:236-242`` opens datasets as ``MultiLevelDataset``
(image pyramids for geotiff/levels formats); ``CombinedMultiLevelDataset``
composes them (``accessors/base.py:86-100``). Here the pyramid is an extra
``level`` column: level 0 is the native cube, level L+1 halves each axis by
2x2 nanmean of level L. Tiles keep their pixel size, so four level-L tiles
merge into one level-L+1 tile — one groupBy per level on
(solar_day, band, tile_y//2, tile_x//2), which is also the write
partitioning, so each level costs a single co-partitioned shuffle.

Ragged edge tiles (grid width/height not a tile multiple) are handled by
carrying the per-level GridSpec (``GridSpec.coarsen``): children are padded
into a NaN canvas before reduction and parents cropped to their true shape.
"""

from __future__ import annotations

import warnings

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from xcube_stac_spark.gridspec import GridSpec
from xcube_stac_spark.operators import tiles as tiles_mod

LEVEL_SCHEMA = T.StructType(
    [
        T.StructField("solar_day", T.DateType()),
        T.StructField("band", T.StringType()),
        T.StructField("tile_y", T.IntegerType()),
        T.StructField("tile_x", T.IntegerType()),
        T.StructField("data", T.BinaryType()),
        T.StructField("valid_frac", T.DoubleType()),
    ]
)


def _halve(tile: np.ndarray) -> np.ndarray:
    """2x2 nanmean block reduce (all-NaN blocks stay NaN); odd trailing
    row/col handled by NaN padding to even."""
    h, w = tile.shape
    if h % 2 or w % 2:
        tile = np.pad(
            tile, ((0, h % 2), (0, w % 2)), constant_values=np.nan
        )
        h, w = tile.shape
    blocks = tile.reshape(h // 2, 2, w // 2, 2)
    with np.errstate(invalid="ignore"), warnings.catch_warnings():
        warnings.simplefilter("ignore", RuntimeWarning)  # all-NaN blocks
        out = np.nanmean(blocks, axis=(1, 3))
    return out.astype(np.float32)


def next_level(cube: DataFrame, child_grid: GridSpec) -> DataFrame:
    """Level L tiles (on ``child_grid``) → level L+1 tiles (on
    ``child_grid.coarsen()``). Four children (2x2 in tile space) shrink to
    quadrants of the parent; missing children become NaN quadrants."""
    cg = child_grid.to_dict()

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        child = GridSpec.from_dict(cg)
        parent_grid = child.coarsen()
        pty = int(pdf["ptile_y"].iloc[0])
        ptx = int(pdf["ptile_x"].iloc[0])
        prows, pcols = parent_grid.tile_shape(ptx, pty)
        parent = np.full((prows, pcols), np.nan, dtype=np.float32)
        for r in pdf.itertuples(index=False):
            crows, ccols = child.tile_shape(int(r.tile_x), int(r.tile_y))
            arr = tiles_mod.tile_to_array(r.data, crows, ccols)
            canvas = np.full((child.tile_h, child.tile_w), np.nan, np.float32)
            canvas[:crows, :ccols] = arr
            small = _halve(canvas)
            qy = (int(r.tile_y) % 2) * (child.tile_h // 2)
            qx = (int(r.tile_x) % 2) * (child.tile_w // 2)
            sub = small[: max(0, prows - qy), : max(0, pcols - qx)]
            parent[qy : qy + sub.shape[0], qx : qx + sub.shape[1]] = sub
        finite = np.isfinite(parent)
        return pd.DataFrame(
            {
                "solar_day": [pdf["solar_day"].iloc[0]],
                "band": [pdf["band"].iloc[0]],
                "tile_y": [pty],
                "tile_x": [ptx],
                "data": [tiles_mod.encode_plane(parent)],
                "valid_frac": [float(finite.mean())],
            }
        )

    with_parent = cube.withColumn(
        "ptile_y", (F.col("tile_y") / 2).cast("int")
    ).withColumn("ptile_x", (F.col("tile_x") / 2).cast("int"))
    return with_parent.groupBy("solar_day", "band", "ptile_y", "ptile_x").applyInPandas(
        merge, LEVEL_SCHEMA
    )


def combine_pyramids(pyramids: list[DataFrame], on_conflict: str = "first") -> DataFrame:
    """Compose several pyramids into one multi-level dataset — the
    ``CombinedMultiLevelDataset`` analogue (reference accessors/base.py:
    86-100, which wraps N MultiLevelDatasets and merges their variables
    level by level).

    Disjoint variables (bands) simply union; when the SAME
    (level, solar_day, band, tile_y, tile_x) key appears in several inputs,
    the EARLIEST pyramid in the list wins (``on_conflict="first"`` — the
    reference's first-dataset-precedence merge) or the latest
    (``"last"`` — update semantics). One window over the combined key, no
    pixel work."""
    if on_conflict not in ("first", "last"):
        raise ValueError(f"on_conflict must be 'first' or 'last', not {on_conflict!r}")
    tagged = [p.withColumn("__src", F.lit(i)) for i, p in enumerate(pyramids)]
    allp = tagged[0]
    for t in tagged[1:]:
        allp = allp.unionByName(t)
    order = F.col("__src").asc() if on_conflict == "first" else F.col("__src").desc()
    w = Window.partitionBy(
        "level", "solar_day", "band", "tile_y", "tile_x"
    ).orderBy(order)
    return (
        allp.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__src", "__rn")
    )


def build_pyramid(cube: DataFrame, grid: GridSpec, levels: int) -> DataFrame:
    """Stack levels 0..levels into one DataFrame with a ``level`` column —
    the whole pyramid remains a single queryable table (level pruning =
    partition pruning on write).

    Tile sizes must be even: next_level places child quadrants at
    (tile % 2) * (tile_size // 2), which misaligns for odd sizes (the halved
    canvas has ceil(size/2) rows)."""
    if grid.tile_w % 2 or grid.tile_h % 2:
        raise ValueError(
            f"build_pyramid requires even tile sizes, got "
            f"{grid.tile_w}x{grid.tile_h} (quadrant offsets assume "
            f"tile_size/2 is integral)"
        )
    out = cube.select(
        "solar_day", "band", "tile_y", "tile_x", "data", "valid_frac"
    ).withColumn("level", F.lit(0))
    cur = out.drop("level")
    g = grid
    for lv in range(1, levels + 1):
        cur = next_level(cur, g)
        g = g.coarsen()
        out = out.unionByName(cur.withColumn("level", F.lit(lv)))
    return out
