"""Single-process NumPy reference implementation of the cube pipeline.

Plays the role of the reference's golden fixtures (mosaic take-first golden
matrices, test/test_utils.py:585-662; cube-shape asserts
test/test_store.py:843-937): an independently-structured implementation the
Spark engine must match EXACTLY (tile assignment, lineage order) and
pixel-allclose (float32).

Deliberately different code shape from operators/tiles.py: whole-scene
regridding with pandas groupbys and dict accumulation instead of Arrow
batches and shuffles — so agreement actually validates the distributed
plumbing (joins, dedup window, group ordering), not one shared kernel.
"""

from __future__ import annotations

import datetime as dt
import os
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from xcube_stac_spark import codecs, geom
from xcube_stac_spark.gridspec import GridSpec


@dataclass
class OracleCube:
    tiles: dict = field(default_factory=dict)  # (day_iso, band, ty, tx) -> float32 array
    lineage: dict = field(default_factory=dict)  # same key -> [item_id, ...] in mosaic order

    def checksum(self, key) -> float:
        return float(np.nansum(self.tiles[key].astype(np.float64)))


def _load(sdir: str, name: str) -> pd.DataFrame:
    return pq.read_table(os.path.join(sdir, f"{name}.parquet")).to_pandas()


def search_scenes_pandas(
    scenes: pd.DataFrame,
    bbox=None,
    time_range=None,
    collections=None,
    query: dict | None = None,
) -> pd.DataFrame:
    """The SEARCH stage alone (F1/F2/F5 + property query), pandas edition —
    mirrors operators/spatial.search_scenes semantics with no bbox/time when
    omitted."""
    df = scenes.copy()
    if collections:
        df = df[df["collection"].isin(collections)]
    if bbox is not None:
        # bbox envelope intersect (F1)
        df = df[
            ~(
                (df["bbox_xmax"] < bbox[0])
                | (df["bbox_xmin"] > bbox[2])
                | (df["bbox_ymax"] < bbox[1])
                | (df["bbox_ymin"] > bbox[3])
            )
        ]
    if time_range is not None:
        # time (F2): point within, or interval overlap
        t0 = pd.Timestamp(time_range[0], tz="UTC")
        t1 = pd.Timestamp(time_range[1], tz="UTC")
        point_ok = df["datetime"].notna() & (df["datetime"] >= t0) & (df["datetime"] <= t1)
        iv_ok = df["datetime"].isna() & (df["start_datetime"] <= t1) & (df["end_datetime"] >= t0)
        df = df[point_ok | iv_ok]
    if query:
        for prop, vals in query.items():
            df = df[df[prop].isin(vals)]
    # antimeridian guard (F5)
    df = df[(df["bbox_xmax"] - df["bbox_xmin"]).abs() < 20.0]
    return df


def select_scenes_pandas(
    scenes: pd.DataFrame,
    bbox,
    time_range,
    collections=None,
    query: dict | None = None,
) -> pd.DataFrame:
    """Search + solar-day + dedup, pandas edition (mirrors SEMANTICS of
    store.py:577-595, utils.py:248-280/354-371, sen2.py:368-374/617-623)."""
    df = search_scenes_pandas(scenes, bbox, time_range, collections, query)
    # nominal datetime + solar day (C6) — int() truncation like the reference
    mid = df["start_datetime"] + (df["end_datetime"] - df["start_datetime"]) / 2
    df = df.assign(nominal_datetime=df["datetime"].fillna(mid))
    center_lon = (df["bbox_xmin"] + df["bbox_xmax"]) / 2
    offs = (center_lon / 15.0).astype(int) * 3600
    df = df.assign(
        solar_day=[
            (ts + dt.timedelta(seconds=int(o))).date()
            for ts, o in zip(df["nominal_datetime"], offs)
        ]
    )
    # dedup: latest proc_version per (solar_day, tile_id) (J2/A4)
    maxv = df.groupby(["solar_day", "tile_id"])["proc_version"].transform("max")
    df = df[df["proc_version"] == maxv]
    # hemisphere fix (hls.py:522-556) + zone/south
    epsg = df["proj_code"].str.split(":").str[1].astype(int)
    center_lat = (df["bbox_ymin"] + df["bbox_ymax"]) / 2
    zone = epsg % 100
    fixed = np.where(center_lat >= 0, 32600 + zone, 32700 + zone)
    fixed = np.where((epsg >= 32601) & (epsg <= 32760), fixed, epsg)
    df = df.assign(epsg=fixed, zone=fixed % 100, south=(fixed >= 32700) & (fixed <= 32760))
    df = df.assign(t_order=[int(ts.value // 1000) for ts in df["nominal_datetime"]])
    return df


def regrid_scene_band(
    img: np.ndarray,
    grid: GridSpec,
    scene_row,
    tile_list,
    res: float | None = None,
    scale: float | None = None,
    offset: float | None = None,
    nodata: float | None = None,
) -> dict[tuple[int, int], np.ndarray]:
    """Regrid one decoded image onto all target tiles it touches —
    whole-extent vectorized (different structure than the engine's per-tile
    kernel). Per-asset res/scale/offset/nodata override the scene values."""
    res = scene_row.scene_res if res is None else res
    scale = scene_row.scale if scale is None else scale
    offset = scene_row.offset if offset is None else offset
    nodata = scene_row.nodata if nodata is None else nodata
    out: dict[tuple[int, int], np.ndarray] = {}
    for tx, ty in tile_list:
        lons, lats = grid.tile_cell_centers(tx, ty)
        lon2, lat2 = np.meshgrid(lons, lats)
        e, n = geom.tm_forward(lon2, lat2, int(scene_row.zone), bool(scene_row.south))
        # float32 coordinate + residue/shift index spec (shared with the
        # engine — see tiles.pixel_residue_shift / _tile_index_planes)
        from xcube_stac_spark.operators.tiles import pixel_residue_shift

        e = e.astype(np.float32)
        n = n.astype(np.float32)
        rx, sx = pixel_residue_shift(float(scene_row.scene_x0), float(res))
        ry, sy = pixel_residue_shift(float(scene_row.scene_y0), float(res))
        ci = np.floor((e - np.float32(rx)) / np.float32(res)).astype(np.int32) - sx
        ri = np.floor((np.float32(ry) - n) / np.float32(res)).astype(np.int32) + sy
        h, w = img.shape
        ok = (ci >= 0) & (ci < w) & (ri >= 0) & (ri < h)
        tile = np.full(lon2.shape, np.nan, np.float32)
        if ok.any():
            dn = img[ri[ok], ci[ok]].astype(np.float64)
            v = scale * dn + offset
            v[dn == nodata] = np.nan
            tile[ok] = v.astype(np.float32)
        if np.isfinite(tile).any():
            out[(tx, ty)] = tile
    return out


def build_cube_numpy(
    synth_dir: str,
    grid: GridSpec,
    bbox=None,
    time_range=None,
    bands=None,
) -> OracleCube:
    scenes = _load(synth_dir, "scenes")
    images = _load(synth_dir, "images").set_index("image_id")
    assets = _load(synth_dir, "assets")
    if bbox is None:
        bbox = grid.bbox()
    if time_range is None:
        time_range = ("1970-01-01", "2100-01-01")
    sel = select_scenes_pandas(scenes, bbox, time_range)
    a = assets[assets["item_id"].isin(sel["item_id"])]
    if bands:
        a = a[a["band"].isin(bands)]

    # accumulate contributions: key -> list[(t_order, item_id, tile_array)]
    contrib: dict[tuple, list] = {}
    for srow in sel.itertuples(index=False):
        tile_list = grid.tiles_for_bbox(
            srow.bbox_xmin, srow.bbox_ymin, srow.bbox_xmax, srow.bbox_ymax
        )
        if not tile_list:
            continue
        for arow in a[a["item_id"] == srow.item_id].itertuples(index=False):
            irow = images.loc[arow.image_id]
            img = codecs.decode(bytes(irow["bytes"]), irow["fmt"], int(irow["w"]), int(irow["h"]))
            asset_meta = dict(
                res=getattr(arow, "res", None),
                scale=getattr(arow, "scale", None),
                offset=getattr(arow, "offset", None),
                nodata=getattr(arow, "nodata", None),
            )
            for (tx, ty), tile in regrid_scene_band(
                img, grid, srow, tile_list, **asset_meta
            ).items():
                key = (srow.solar_day.isoformat(), arow.band, ty, tx)
                contrib.setdefault(key, []).append((srow.t_order, srow.item_id, tile))

    cube = OracleCube()
    for key, entries in contrib.items():
        entries.sort(key=lambda e: (e[0], e[1]))
        stack = np.stack([e[2] for e in entries], axis=0)
        mask = np.isfinite(stack)
        first = mask.argmax(axis=0)
        merged = np.take_along_axis(stack, first[None, ...], axis=0)[0]
        merged[~mask.any(axis=0)] = np.nan
        cube.tiles[key] = merged
        cube.lineage[key] = [e[1] for e in entries]
    return cube
