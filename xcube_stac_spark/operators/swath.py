"""Swath (curvilinear-grid) operators: UV clip, orthorectification, rectify.

The Sentinel-3 side of the reference — unrectified swaths with 2-D lat/lon
geolocation arrays (``accessors/sen3.py``) — re-expressed over a long-form
``swaths`` table: one row per swath granule with geolocation + variable
planes as binary columns (rows x cols float64/float32).

* ``uv_clip_scenes`` — J6/F12: footprint → thin-plate-spline UV mapping →
  relative bbox of a query region in swath row/col space
  (``utils.py:769-873``). Drives row-range pruning so only the needed swath
  rows are ever decoded — the reference's v1.2.2 performance fix
  (CHANGES.md:45-47), here expressed as a pandas-UDF predicate feeding a
  pure-SQL row filter.
* ``orthorectify`` — J11 (``accessors/sen3.py:596-670``): parallax-correct
  geolocation by elevation and satellite viewing angles, spherical earth
  R=6370997 m (``constants.py:65``), per-partition NumPy via mapInPandas.
* ``rectify_swath`` — J12 (xcube_resampling.rectify_dataset call sites
  ``sen3.py:220-232``): curvilinear → regular grid via nearest-neighbor
  inverse lookup on the corrected lat/lon planes.
"""

from __future__ import annotations

from typing import Iterator, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from xcube_stac_spark import geom as geom_mod
from xcube_stac_spark.gridspec import GridSpec

EARTH_R = 6370997.0  # reference constants.py:65

UV_SCHEMA = T.StructType(
    [
        T.StructField("item_id", T.StringType()),
        T.StructField("u0", T.DoubleType()),
        T.StructField("v0", T.DoubleType()),
        T.StructField("u1", T.DoubleType()),
        T.StructField("v1", T.DoubleType()),
        T.StructField("hit", T.BooleanType()),
    ]
)


#: NetCDF variable names of one swath granule (Sentinel-3 SLSTR naming,
#: reference accessors/sen3.py geodetic_an/LST reads) → columnar schema
_NC_SWATH_VARS = (
    ("longitude_an", "lon", np.float64),
    ("latitude_an", "lat", np.float64),
    ("elevation_an", "elev", np.float64),
    ("sat_zenith_tn", "zenith", np.float64),
    ("sat_azimuth_tn", "azimuth", np.float64),
    ("LST", "values", np.float32),
)

SWATH_SCHEMA = T.StructType(
    [
        T.StructField("item_id", T.StringType()),
        T.StructField("var", T.StringType()),
        T.StructField("rows", T.IntegerType()),
        T.StructField("cols", T.IntegerType()),
        T.StructField("lon", T.BinaryType()),
        T.StructField("lat", T.BinaryType()),
        T.StructField("elev", T.BinaryType()),
        T.StructField("zenith", T.BinaryType()),
        T.StructField("azimuth", T.BinaryType()),
        T.StructField("values", T.BinaryType()),
    ]
)


def swaths_from_netcdf(nc_granules: DataFrame) -> DataFrame:
    """S9 as a REAL reader: decode NetCDF-3 classic swath granules
    (item_id, var, nc:binary) into the columnar ``swaths`` table every
    swath operator consumes — the Spark re-expression of the reference's
    per-file xarray open (accessors/sen3.py:172-173), as an Arrow-batched
    map over inline container bytes (codecs.decode_netcdf3, pure struct).
    Decoded planes are bit-identical to the generator's raw-column path
    (pinned by test)."""
    from xcube_stac_spark import codecs

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k.name: [] for k in SWATH_SCHEMA.fields}
            for r in pdf.itertuples(index=False):
                v = codecs.decode_netcdf3(bytes(r.nc))
                shape = v["longitude_an"].shape
                out["item_id"].append(r.item_id)
                out["var"].append(r.var)
                out["rows"].append(int(shape[0]))
                out["cols"].append(int(shape[1]))
                for nc_name, col, dt in _NC_SWATH_VARS:
                    out[col].append(
                        np.ascontiguousarray(v[nc_name], dtype=dt).tobytes()
                    )
            yield pd.DataFrame(out)

    return nc_granules.mapInPandas(run, SWATH_SCHEMA)


def uv_clip_scenes(scenes: DataFrame, query_bbox: Sequence[float]) -> DataFrame:
    """Per-scene UV sub-rectangle of a query bbox inside the footprint
    (TPS over the 4 orbit-oriented corners). hit=False → footprint missed.

    Downstream, (v0, v1) x n_rows gives the swath row range to read — the
    partition-pruning predicate for swath stores."""
    bbox = [float(v) for v in query_bbox]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k.name: [] for k in UV_SCHEMA.fields}
            for r in pdf.itertuples(index=False):
                lons = np.array([p["lon"] for p in r.footprint])
                lats = np.array([p["lat"] for p in r.footprint])
                rel = geom_mod.find_relative_bbox(
                    lons, lats, bbox, descending=(r.orbit_state == "descending")
                )
                out["item_id"].append(r.item_id)
                if rel is None:
                    out["u0"].append(0.0); out["v0"].append(0.0)
                    out["u1"].append(0.0); out["v1"].append(0.0)
                    out["hit"].append(False)
                else:
                    u0, v0, u1, v1 = rel
                    out["u0"].append(u0); out["v0"].append(v0)
                    out["u1"].append(u1); out["v1"].append(v1)
                    out["hit"].append(True)
            yield pd.DataFrame(out)

    return scenes.select("item_id", "footprint", "orbit_state").mapInPandas(
        run, UV_SCHEMA
    )


# ---------------------------------------------------------------------------
# J11: orthorectification
# ---------------------------------------------------------------------------


def orthorectify_arrays(
    lon: np.ndarray,
    lat: np.ndarray,
    elev: np.ndarray,
    zenith: np.ndarray,
    azimuth: np.ndarray,
) -> tuple[np.ndarray, np.ndarray]:
    """Parallax correction (same math as sen3.py:631-662): ground shift
    d = elev * tan(zenith), decomposed by azimuth, converted to deg on a
    spherical earth; x-shift shrinks by cos(lat)."""
    shift = elev * np.tan(np.radians(zenith))
    dlat = shift * np.cos(np.radians(azimuth)) / (np.pi * EARTH_R / 180.0)
    dlon = shift * np.sin(np.radians(azimuth)) / (
        np.pi * EARTH_R / 180.0
    ) / np.cos(np.radians(lat))
    return lon + dlon, lat + dlat


ORTHO_SCHEMA = T.StructType(
    [
        T.StructField("item_id", T.StringType()),
        T.StructField("rows", T.IntegerType()),
        T.StructField("cols", T.IntegerType()),
        T.StructField("lon", T.BinaryType()),
        T.StructField("lat", T.BinaryType()),
        # plane means ride along so metadata-only consumers (and the DuckDB
        # value oracle) can check the correction without touching binaries
        T.StructField("lon_mean", T.DoubleType()),
        T.StructField("lat_mean", T.DoubleType()),
    ]
)


def orthorectify(swaths: DataFrame) -> DataFrame:
    """Swath rows (lon/lat/elev/zenith/azimuth planes as float64 binaries) →
    corrected lon/lat planes. Pure map-side Arrow pass."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k.name: [] for k in ORTHO_SCHEMA.fields}
            for r in pdf.itertuples(index=False):
                shp = (int(r.rows), int(r.cols))
                lon = np.frombuffer(r.lon, np.float64).reshape(shp)
                lat = np.frombuffer(r.lat, np.float64).reshape(shp)
                elev = np.frombuffer(r.elev, np.float64).reshape(shp)
                zen = np.frombuffer(r.zenith, np.float64).reshape(shp)
                azi = np.frombuffer(r.azimuth, np.float64).reshape(shp)
                lon2, lat2 = orthorectify_arrays(lon, lat, elev, zen, azi)
                out["item_id"].append(r.item_id)
                out["rows"].append(shp[0])
                out["cols"].append(shp[1])
                out["lon"].append(lon2.tobytes())
                out["lat"].append(lat2.tobytes())
                out["lon_mean"].append(float(lon2.mean()))
                out["lat_mean"].append(float(lat2.mean()))
            yield pd.DataFrame(out)

    return swaths.select(
        "item_id", "rows", "cols", "lon", "lat", "elev", "zenith", "azimuth"
    ).mapInPandas(run, ORTHO_SCHEMA)


# ---------------------------------------------------------------------------
# J12: rectify curvilinear swath → regular grid
# ---------------------------------------------------------------------------

RECTIFY_SCHEMA = T.StructType(
    [
        T.StructField("item_id", T.StringType()),
        T.StructField("var", T.StringType()),
        T.StructField("tile_y", T.IntegerType()),
        T.StructField("tile_x", T.IntegerType()),
        T.StructField("data", T.BinaryType()),
        T.StructField("valid", T.IntegerType()),
    ]
)


def rectify_plane(
    lon: np.ndarray, lat: np.ndarray, val: np.ndarray, g: GridSpec
) -> np.ndarray | None:
    """The rectification kernel: bin swath pixels (1-D arrays) into target
    cells, resolve collisions by nearest-to-center, return the full
    (height, width) float32 plane (NaN where no swath pixel lands) or None
    when the swath misses the grid entirely. Shared by the Spark UDF and the
    fixture oracle."""
    gc = np.floor((lon - g.x0) / g.res).astype(np.int64)
    gr = np.floor((g.y0 - lat) / g.res).astype(np.int64)
    ok = (gc >= 0) & (gc < g.width) & (gr >= 0) & (gr < g.height)
    if not ok.any():
        return None
    gc, gr, lon_s, lat_s, val_s = gc[ok], gr[ok], lon[ok], lat[ok], val[ok]
    # nearest-to-center collision resolve: order candidates by
    # distance DESC then overwrite — last (=nearest) wins
    cx = g.x0 + (gc + 0.5) * g.res
    cy = g.y0 - (gr + 0.5) * g.res
    d2 = (lon_s - cx) ** 2 + (lat_s - cy) ** 2
    order = np.argsort(-d2, kind="stable")
    flat = gr[order] * g.width + gc[order]
    plane = np.full(g.width * g.height, np.nan, np.float32)
    plane[flat] = val_s[order]
    return plane.reshape(g.height, g.width)


def rectify_swath(swaths: DataFrame, grid: GridSpec) -> DataFrame:
    """Nearest-source rectification: for each target cell, pick the swath
    pixel whose (lon, lat) is nearest, if within half a swath-pixel spacing.

    Implementation: bin every swath pixel into target cells (vectorized),
    resolve collisions by nearest-center, then emit per-tile planes. Long
    swaths explode to multiple tiles exactly like scene regridding."""
    gd = grid.to_dict()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        g = GridSpec.from_dict(gd)
        for pdf in batches:
            out = {k.name: [] for k in RECTIFY_SCHEMA.fields}
            for r in pdf.itertuples(index=False):
                shp = (int(r.rows), int(r.cols))
                lon = np.frombuffer(r.lon, np.float64).reshape(shp).ravel()
                lat = np.frombuffer(r.lat, np.float64).reshape(shp).ravel()
                val = np.frombuffer(r.values, np.float32).reshape(shp).ravel()
                plane = rectify_plane(lon, lat, val, g)
                if plane is None:
                    continue
                # emit per-tile
                for ty in range(g.n_tiles_y):
                    for tx in range(g.n_tiles_x):
                        rows_, cols_ = g.tile_shape(tx, ty)
                        sub = plane[
                            ty * g.tile_h : ty * g.tile_h + rows_,
                            tx * g.tile_w : tx * g.tile_w + cols_,
                        ]
                        nv = int(np.isfinite(sub).sum())
                        if nv == 0:
                            continue
                        out["item_id"].append(r.item_id)
                        out["var"].append(r.var)
                        out["tile_y"].append(ty)
                        out["tile_x"].append(tx)
                        out["data"].append(np.ascontiguousarray(sub).tobytes())
                        out["valid"].append(nv)
            yield pd.DataFrame(out)

    return swaths.select(
        "item_id", "var", "rows", "cols", "lon", "lat", "values"
    ).mapInPandas(run, RECTIFY_SCHEMA)
