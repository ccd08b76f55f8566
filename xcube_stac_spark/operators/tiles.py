"""Raster tile pipeline: decode → regrid → take-first mosaic → time stack.

The Spark re-expression of the reference cube assembly (SURVEY §2.3/§3.2):

* ``assign_grid_tiles`` — raster→grid tile assignment (J8): instead of the
  reference's driver-side positional insert into a preallocated xr cube
  (sen2.py:1232-1325), each scene row gets the ARRAY of target grid tiles
  its bbox touches (pure-SQL sequence arithmetic); the "insert" becomes a
  shuffle of emitted tile rows into grid partitions.
* ``decode_regrid`` — S8-S11 + C1 + J9/J12 in one Arrow pass: decode the
  inline image bytes ONCE per scene/band, then for every target tile
  inverse-map the tile's cell centers through the scene's UTM affine (pure
  NumPy Transverse-Mercator), nearest-neighbor sample, apply
  scale/offset/nodata→NaN (stac_extension/raster.py:57-93). Emits long-form
  tile rows — the reference's (time, y, x) cube becomes the
  ``(time, band, tile_y, tile_x, data)`` DataFrame (SURVEY §1.1).
* ``mosaic_take_first`` — J5/A1 (utils.py:723-766 mosaic_spatial_take_first):
  per (solar_day, band, tile_y, tile_x) group, first non-NaN pixel wins in
  DETERMINISTIC (nominal_datetime, item_id) order — the reference relies on
  Python list order (sen2.py:612-615), nondeterministic under distribution,
  so the engine imposes this total order and the NumPy oracle uses the same
  (documented deviation-with-equivalence, SURVEY §7.3.1).
* ``time_spine`` — U2 gap fill (hls.py:510, sen2.py:1406-1464): left join
  against the full day spine; missing (day, band, tile) rows are explicit
  NaN-tile rows or left absent per ``materialize_gaps``.

Scale notes: decode+regrid is map-side only (no shuffle); the single shuffle
of the pipeline is the mosaic groupBy on (solar_day, band, tile_y, tile_x) —
exactly the cube's write partitioning, so the sink needs no extra exchange.
Tile payloads are float32 binary ~= 16 KB (64²) to 256 KB (256²); Arrow batch
size is capped in session.py so UDF groups stay comfortably in executor
memory at 2048² reference tile size.
"""

from __future__ import annotations

import zlib
from functools import lru_cache
from typing import Iterable, Iterator, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from xcube_stac_spark import codecs
from xcube_stac_spark import geom as geom_mod
from xcube_stac_spark.gridspec import GridSpec

# ---------------------------------------------------------------------------
# J8: scene bbox → covering grid tiles (pure SQL)
# ---------------------------------------------------------------------------


def grid_tiles_expr(grid: GridSpec):
    """Array<struct<tile_x,tile_y>> of grid tiles intersecting the scene
    bbox — same floor arithmetic as GridSpec.tiles_for_bbox, as Column
    expressions (sequence + transform + flatten, fully codegen'd)."""
    tw = grid.tile_w * grid.res
    th = grid.tile_h * grid.res

    def clampx(c):
        return F.least(F.greatest(c, F.lit(0)), F.lit(grid.n_tiles_x - 1))

    def clampy(c):
        return F.least(F.greatest(c, F.lit(0)), F.lit(grid.n_tiles_y - 1))

    xmin, ymin = F.col("bbox_xmin"), F.col("bbox_ymin")
    xmax, ymax = F.col("bbox_xmax"), F.col("bbox_ymax")
    disjoint = (
        (xmax <= F.lit(grid.x0))
        | (xmin >= F.lit(grid.x1))
        | (ymax <= F.lit(grid.y1))
        | (ymin >= F.lit(grid.y0))
    )
    tx0 = clampx(F.floor((xmin - F.lit(grid.x0)) / F.lit(tw)).cast("int"))
    tx1 = clampx(F.floor((xmax - F.lit(grid.x0)) / F.lit(tw)).cast("int"))
    ty0 = clampy(F.floor((F.lit(grid.y0) - ymax) / F.lit(th)).cast("int"))
    ty1 = clampy(F.floor((F.lit(grid.y0) - ymin) / F.lit(th)).cast("int"))
    tiles = F.flatten(
        F.transform(
            F.sequence(ty0, ty1),
            lambda ty: F.transform(
                F.sequence(tx0, tx1),
                lambda tx: F.struct(tx.cast("int").alias("tile_x"), ty.cast("int").alias("tile_y")),
            ),
        )
    )
    empty = F.array().cast(T.ArrayType(T.StructType([
        T.StructField("tile_x", T.IntegerType()),
        T.StructField("tile_y", T.IntegerType()),
    ])))
    return F.when(disjoint, empty).otherwise(tiles)


def assign_grid_tiles(scene_images: DataFrame, grid: GridSpec) -> DataFrame:
    """Attach the target-tile array to each scene/band image row."""
    return scene_images.withColumn("grid_tiles", grid_tiles_expr(grid)).where(
        F.size("grid_tiles") > 0
    )


# ---------------------------------------------------------------------------
# decode + regrid (mapInPandas — one Arrow hop, decode once per image)
# ---------------------------------------------------------------------------

REGRID_SCHEMA = T.StructType(
    [
        T.StructField("solar_day", T.DateType()),
        T.StructField("band", T.StringType()),
        T.StructField("tile_y", T.IntegerType()),
        T.StructField("tile_x", T.IntegerType()),
        T.StructField("item_id", T.StringType()),
        T.StructField("t_order", T.LongType()),
        # raw DN (uint16 LE) + packed validity bitmask: HALF the bytes of a
        # float32 tile through the two expensive boundaries (Arrow hop +
        # mosaic shuffle); scale/offset ride along and are applied AFTER the
        # take-first pick (identical result to scaling first, since each
        # pixel is scaled by its own scene's factors either way)
        T.StructField("dn", T.BinaryType()),
        T.StructField("mask", T.BinaryType()),
        T.StructField("scale", T.DoubleType()),
        T.StructField("offset", T.DoubleType()),
        T.StructField("valid", T.IntegerType()),
    ]
)

_REGRID_IN_COLS = [
    "solar_day", "band", "item_id", "t_order", "bytes", "fmt", "w", "h",
    "zone", "south", "scene_x0", "scene_y0", "scene_res",
    "nodata", "scale", "offset", "grid_tiles",
]


@lru_cache(maxsize=256)
def _tile_utm_coords(
    grid_key: tuple, tile_x: int, tile_y: int, zone: int, south: bool
) -> tuple[np.ndarray, np.ndarray]:
    """UTM easting/northing of one grid tile's cell centers — CACHED per
    worker. The projection depends only on (grid, tile, zone), NOT on the
    scene, so every scene/band regridding the same tile reuses it; this
    removes ~95% of the trig work.

    Stored as float32 BY SPEC (and the NumPy oracle computes the identical
    float32 mesh): 0.06 m worst-case coordinate rounding at UTM easting
    magnitudes, ~3 orders finer than any source pixel, and it HALVES the
    memory traffic of the sampling pass — the regrid kernel is
    bandwidth-bound, not flop-bound."""
    grid = GridSpec.from_dict(dict(grid_key))
    lons, lats = grid.tile_cell_centers(tile_x, tile_y)
    lon2, lat2 = np.meshgrid(lons, lats)
    e, n = geom_mod.tm_forward(lon2, lat2, zone, south)
    return e.astype(np.float32), n.astype(np.float32)


@lru_cache(maxsize=256)
def _tile_index_planes(
    grid_key: tuple, tile_x: int, tile_y: int, zone: int, south: bool,
    res: float, rx: float, ry: float,
) -> tuple[np.ndarray, np.ndarray]:
    """Base pixel-index planes floor((e - rx)/res), floor((ry - n)/res) as
    int32 — cached per (tile, zone, res, sub-pixel residue).

    Real tiled products share a per-zone pixel grid (Sentinel-2 MGRS tiles
    all sit on the common 10 m UTM lattice), so every aligned scene differs
    from the cached plane by an INTEGER shift — one subtraction instead of
    a float mesh read + divide + floor per sample. This is the regrid
    kernel's dominant memory-traffic saving (the mesh pass was ~3x these
    bytes), and the NumPy oracle implements the identical decomposition
    (the defined index spec)."""
    e, n = _tile_utm_coords(grid_key, tile_x, tile_y, zone, south)
    col = np.floor((e - np.float32(rx)) / np.float32(res)).astype(np.int32)
    row = np.floor((np.float32(ry) - n) / np.float32(res)).astype(np.int32)
    return col, row


@lru_cache(maxsize=256)
def _tile_flat_plane(
    grid_key: tuple, tile_x: int, tile_y: int, zone: int, south: bool,
    res: float, rx: float, ry: float, w: int,
) -> tuple[np.ndarray, int, int, int, int]:
    """Flattened base index plane row0*w + col0 (int32) plus the col0/row0
    extrema — the INTERIOR-TILE fast path: when a whole tile falls inside
    the scene (checked from the cached extrema alone), sampling is a single
    int32 plane read + scalar shift + gather, skipping the two bounds-plane
    reads and four comparisons of the general path. Identical indices by
    construction (flat = (row0+sy)*w + (col0-sx) = flat0 + sy*w - sx)."""
    col0, row0 = _tile_index_planes(grid_key, tile_x, tile_y, zone, south, res, rx, ry)
    # row0*w reaches ~5e9 at realistic UTM origins (10 m res, 10k-px scenes):
    # compute in int64, store wrapped mod 2^32 as int32 — the final gather
    # index flat0 + shift32 re-wraps to the true in-bounds value, and the
    # int32 plane keeps the bandwidth-bound kernel's memory traffic halved
    flat = (row0.astype(np.int64) * np.int64(w) + col0).astype(np.int32)
    return flat, int(col0.min()), int(col0.max()), int(row0.min()), int(row0.max())


def pixel_residue_shift(origin: float, res: float) -> tuple[float, int]:
    """Split a scene origin into (sub-pixel residue, integer pixel shift):
    origin = residue + shift*res with shift integral. Shared spec between
    engine and oracle."""
    shift = int(round(origin / res))
    r = origin - shift * res
    return r, shift


def _bilinear_sample(
    img: np.ndarray, e: np.ndarray, n: np.ndarray,
    scene_x0: float, scene_y0: float, res: float, nodata: float,
) -> tuple[np.ndarray, np.ndarray]:
    """Bilinear resampling variant (the reference's resample_in_space
    supports interpolation; NN remains the flagship default because the
    take-first mosaic wants radiometrically untouched DNs). Returns
    (float32 values, valid mask); any nodata corner invalidates a pixel."""
    cf = (e - np.float32(scene_x0)) / np.float32(res) - np.float32(0.5)
    rf = (np.float32(scene_y0) - n) / np.float32(res) - np.float32(0.5)
    c0 = np.floor(cf).astype(np.int32)
    r0 = np.floor(rf).astype(np.int32)
    h, w = img.shape
    inside = (c0 >= 0) & (c0 + 1 < w) & (r0 >= 0) & (r0 + 1 < h)
    out = np.full(e.shape, np.nan, np.float32)
    if inside.any():
        c0i, r0i = c0[inside], r0[inside]
        fx = (cf[inside] - c0i).astype(np.float32)
        fy = (rf[inside] - r0i).astype(np.float32)
        q00 = img[r0i, c0i].astype(np.float32)
        q01 = img[r0i, c0i + 1].astype(np.float32)
        q10 = img[r0i + 1, c0i].astype(np.float32)
        q11 = img[r0i + 1, c0i + 1].astype(np.float32)
        w00 = (1 - fx) * (1 - fy)
        w01 = fx * (1 - fy)
        w10 = (1 - fx) * fy
        w11 = fx * fy
        val = q00 * w00 + q01 * w01 + q10 * w10 + q11 * w11
        # a nodata corner only invalidates where it actually contributes
        bad = (
            ((q00 == nodata) & (w00 > 0))
            | ((q01 == nodata) & (w01 > 0))
            | ((q10 == nodata) & (w10 > 0))
            | ((q11 == nodata) & (w11 > 0))
        )
        val[bad] = np.nan
        out[inside] = val
    return out, np.isfinite(out)


def _regrid_one(
    img: np.ndarray,
    grid: GridSpec,
    grid_key: tuple,
    tile_x: int,
    tile_y: int,
    zone: int,
    south: bool,
    scene_x0: float,
    scene_y0: float,
    scene_res: float,
    nodata: float,
) -> tuple[bytes, bytes, int] | None:
    """Nearest-neighbor sample one target tile from one decoded scene image.

    Target cell centers (lon/lat) → scene UTM via TM forward (cached per
    (grid, tile, zone)) → fractional pixel indices in the scene's north-up
    affine → NN sample. Emits raw DN + packed validity bits (out-of-scene
    and DN==nodata are invalid); the scale/offset application (C1,
    stac_extension/raster.py:57-93) happens after the mosaic pick. Returns
    (dn bytes, mask bytes, n_valid) or None when the tile catches no valid
    pixel (empty-clip drop, sen2.py:704-706)."""
    h, w = img.shape
    rx, sx = pixel_residue_shift(scene_x0, scene_res)
    ry, sy = pixel_residue_shift(scene_y0, scene_res)
    if h * w < 2**31:
        flat0, cmin, cmax, rmin, rmax = _tile_flat_plane(
            grid_key, tile_x, tile_y, zone, south, float(scene_res), rx, ry, w
        )
        # col = col0 - sx ∈ [0, w) and row = row0 + sy ∈ [0, h) for the
        # WHOLE tile → no bounds planes needed, one gather
        if cmin >= sx and cmax <= w - 1 + sx and rmin >= -sy and rmax <= h - 1 - sy:
            # shift may exceed int32 (sy*w ~ 5e9 at UTM northings); wrap it
            # mod 2^32 explicitly — flat0 is stored wrapped the same way, and
            # the int32 sum re-wraps to the true index, which the guard above
            # proves lies in [0, h*w) < 2^31
            shift32 = (np.int64(sy) * np.int64(w) - np.int64(sx)).astype(np.int32)
            dn = img.ravel()[flat0 + shift32]
            valid = dn != nodata
            n_valid = int(valid.sum())
            if n_valid == 0:
                return None
            dn_z = zlib.compress(dn.tobytes(), 1)
            mask_z = zlib.compress(np.packbits(valid.ravel()).tobytes(), 1)
            return dn_z, mask_z, n_valid
    col0, row0 = _tile_index_planes(
        grid_key, tile_x, tile_y, zone, south, float(scene_res), rx, ry
    )
    col = col0 - sx
    row = row0 + sy
    inside = (col >= 0) & (col < w) & (row >= 0) & (row < h)
    dn = np.zeros(col.shape, dtype=np.uint16)
    if inside.any():
        dn[inside] = img[row[inside], col[inside]]
    valid = inside & (dn != nodata)
    n_valid = int(valid.sum())
    if n_valid == 0:
        return None
    # light zlib over the DN plane: the tile crosses two Arrow hops and one
    # shuffle before the mosaic — compressing here trades cheap CPU for the
    # scarce resource (network on a cluster, memory bandwidth on this VM);
    # gradient-ish imagery compresses ~3-4x at level 1
    dn_z = zlib.compress(dn.tobytes(), 1)
    mask_z = zlib.compress(np.packbits(valid.ravel()).tobytes(), 1)
    return dn_z, mask_z, n_valid


def decode_regrid(
    scene_images: DataFrame, grid: GridSpec, parallelism: int | None = None
) -> DataFrame:
    """mapInPandas: (scene,band) image rows with target-tile arrays →
    long-form regridded tile rows. Decode runs once per input row; each
    emitted tile reuses the decoded array.

    The input is explicitly round-robin repartitioned to ~3x core count
    first: the decode+regrid stage is the compute-heavy one and its
    parallelism must come from the ENGINE, not from however many row groups
    the upstream parquet had (one fat input split serialized the whole
    stage: 0.28 measured scaling efficiency). Round-robin beats spatial
    keying here — per-tile projection is cached per worker and measured
    cheap (~2 ms/tile, ~1% of stage time), so load balance matters more
    than projection-cache locality. (On a real cluster the scenes table is
    additionally partitioned by cell key so the METADATA joins prune; that
    is orthogonal to this decode-stage balance.)"""
    gd = grid.to_dict()

    if parallelism is None:
        parallelism = scene_images.sparkSession.sparkContext.defaultParallelism * 3
    # skip the (bytes-heavy) exchange when the upstream scan already yields
    # enough splits — repartition exists to FIX under-parallel inputs, not to
    # tax well-partitioned ones with an extra full shuffle of the payload
    if scene_images.rdd.getNumPartitions() < max(2, parallelism // 2):
        scene_images = scene_images.repartition(parallelism)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        g = GridSpec.from_dict(gd)
        g_key = tuple(sorted(gd.items()))
        for pdf in batches:
            rows: dict[str, list] = {k.name: [] for k in REGRID_SCHEMA.fields}
            for r in pdf.itertuples(index=False):
                img = codecs.decode(bytes(r.bytes), r.fmt, int(r.w), int(r.h))
                for t in r.grid_tiles:
                    res = _regrid_one(
                        img, g, g_key, int(t["tile_x"]), int(t["tile_y"]),
                        int(r.zone), bool(r.south),
                        float(r.scene_x0), float(r.scene_y0), float(r.scene_res),
                        float(r.nodata),
                    )
                    if res is None:
                        continue
                    dn, mask, valid = res
                    rows["solar_day"].append(r.solar_day)
                    rows["band"].append(r.band)
                    rows["tile_y"].append(int(t["tile_y"]))
                    rows["tile_x"].append(int(t["tile_x"]))
                    rows["item_id"].append(r.item_id)
                    rows["t_order"].append(int(r.t_order))
                    rows["dn"].append(dn)
                    rows["mask"].append(mask)
                    rows["scale"].append(float(r.scale))
                    rows["offset"].append(float(r.offset))
                    rows["valid"].append(valid)
            # a batch whose scenes all miss the grid yields NOTHING: an empty
            # dict-of-lists DataFrame defaults every column to float64 and
            # Arrow cannot cast an empty double column to date32
            if rows["item_id"]:
                yield pd.DataFrame(rows)

    return scene_images.select(*_REGRID_IN_COLS).mapInPandas(run, REGRID_SCHEMA)


# ---------------------------------------------------------------------------
# J5/A1: take-first mosaic
# ---------------------------------------------------------------------------

MOSAIC_SCHEMA = T.StructType(
    [
        T.StructField("solar_day", T.DateType()),
        T.StructField("band", T.StringType()),
        T.StructField("tile_y", T.IntegerType()),
        T.StructField("tile_x", T.IntegerType()),
        T.StructField("data", T.BinaryType()),
        T.StructField("n_scenes", T.IntegerType()),
        T.StructField("item_ids", T.StringType()),
        T.StructField("valid_frac", T.DoubleType()),
        T.StructField("checksum", T.DoubleType()),
    ]
)


def _take_first_dn(
    dns: np.ndarray, masks: np.ndarray, scales: np.ndarray, offsets: np.ndarray
) -> np.ndarray:
    """First VALID DN along axis 0, scaled by the winning scene's
    scale/offset — the pixel core of the reference's
    ``mosaic_spatial_take_first`` (utils.py:746-758: argmax over the
    non-fill mask + da.choose). NaN where no scene contributes.

    Scaling after selection equals scaling before it: each output pixel is
    scale_s*DN + offset_s for its OWN winning scene s either way."""
    first = masks.argmax(axis=0)
    dn = np.take_along_axis(dns, first[None, :], axis=0)[0].astype(np.float64)
    out = (scales[first] * dn + offsets[first]).astype(np.float32)
    out[~masks.any(axis=0)] = np.nan
    return out


def mosaic_take_first(tiles: DataFrame, order: str = "first") -> DataFrame:
    """Grouped take-first mosaic over (solar_day, band, tile_y, tile_x).

    Scene order inside a group is (t_order, item_id) ascending — the
    engine's deterministic replacement for the reference's Python list
    order (sen2.py:612-615), which would be nondeterministic under
    distribution.

    ``order="last"`` flips priority: LAST valid wins — the update-merge /
    combine_first-reversed semantics (U3 utils.py:716-720, J10
    hls.py:496-500); used by the multi-res merge (J7, utils.py:652-706)
    where finer-resolution datasets update coarser ones."""

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            ["t_order", "item_id"], kind="mergesort", ascending=(order == "first")
        )
        dns = np.stack(
            [np.frombuffer(zlib.decompress(b), dtype=np.uint16) for b in pdf["dn"]]
        )
        npix = dns.shape[1]
        masks = np.stack(
            [
                np.unpackbits(np.frombuffer(zlib.decompress(b), np.uint8))[:npix].astype(bool)
                for b in pdf["mask"]
            ]
        )
        out = _take_first_dn(
            dns, masks,
            pdf["scale"].to_numpy(), pdf["offset"].to_numpy(),
        )
        finite = np.isfinite(out)
        return pd.DataFrame(
            {
                "solar_day": [pdf["solar_day"].iloc[0]],
                "band": [pdf["band"].iloc[0]],
                "tile_y": [pdf["tile_y"].iloc[0]],
                "tile_x": [pdf["tile_x"].iloc[0]],
                "data": [out.tobytes()],
                "n_scenes": [len(pdf)],
                "item_ids": [",".join(pdf["item_id"].tolist())],
                "valid_frac": [float(finite.mean())],
                "checksum": [float(np.nansum(out.astype(np.float64)))],
            }
        )

    return tiles.groupBy("solar_day", "band", "tile_y", "tile_x").applyInPandas(
        merge, MOSAIC_SCHEMA
    )


# ---------------------------------------------------------------------------
# U1/U2: temporal stacking + gap fill
# ---------------------------------------------------------------------------


def time_spine(cube: DataFrame, t0: str, t1: str) -> DataFrame:
    """Full (solar_day x band x tile) spine left-joined against the cube —
    reindex-with-fill semantics (hls.py:510; NaN-slice insertion
    sen2.py:1406-1464). Missing combinations appear with NULL data."""
    spark = cube.sparkSession
    days = spark.sql(
        f"select explode(sequence(to_date('{t0}'), to_date('{t1}'), interval 1 day)) as solar_day"
    )
    keys = cube.select("band", "tile_y", "tile_x").distinct()
    spine = F.broadcast(days).crossJoin(keys)
    return spine.join(cube, ["solar_day", "band", "tile_y", "tile_x"], "left")


def pivot_bands(df: DataFrame, bands: Sequence[str], value_col: str, group_cols: Sequence[str]) -> DataFrame:
    """Long-form band rows → wide per-group columns (U3 variable
    update-merge / the reference's one-variable-per-band dataset shape,
    utils.py:628-649 naming). Conditional aggregation (not .pivot) so the
    plan is static and the DuckDB oracle is expressible identically."""
    aggs = [
        F.max(F.when(F.col("band") == b, F.col(value_col))).alias(f"{b}_{value_col}")
        for b in bands
    ]
    return df.groupBy(*group_cols).agg(*aggs)


def tile_to_array(data: bytes, rows: int, cols: int) -> np.ndarray:
    """Decode a cube tile payload back to (rows, cols) float32."""
    return np.frombuffer(data, dtype=np.float32).reshape(rows, cols)
