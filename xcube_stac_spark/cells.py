"""Spatial cell index — the coarse key of the scene<->region spatial join.

The reference pushes its spatial predicate to the STAC API server
(``xcube_stac/store.py:577-595``) or nested-loops client-side
(``xcube_stac/utils.py:93-140``). Neither distributes. Here the coarse
stage of the spatial join (J1 in SURVEY §2.3) is an EQUI-JOIN on discrete
cell ids covering footprints and query regions, so Catalyst can broadcast /
sort-merge / AQE-skew-split it like any other join.

Two cell-id schemes, one interface:

* ``grid`` (default): row-major lat/lon grid cells at a fixed resolution.
  Deliberately SQL-expressible (floor arithmetic only) so every cell-join
  query has a DuckDB oracle. Cell ids are dense within a region → good
  min/max pruning in parquet/Iceberg.
* ``morton``: bit-interleaved (Z-order) variant of the same grid for
  locality-preserving partitioning of planetary-scale tables — neighbors in
  space are neighbors in key space, so range-partitioned writes cluster
  spatially (the public S2/H3 idea, reduced to its join-relevant core).

All functions are vectorized NumPy; the Spark-side equivalents are pure
Column expressions in :mod:`xcube_stac_spark.functions`.
"""

from __future__ import annotations

import numpy as np

#: degrees per cell at "level" L: 180 / 2**L rows. Level 9 → ~0.35° (~39 km).
DEFAULT_LEVEL = 9


def cell_size_deg(level: int = DEFAULT_LEVEL) -> float:
    return 180.0 / (1 << level)


def n_cols(level: int = DEFAULT_LEVEL) -> int:
    return 2 << level  # 360 / cell_size


def cell_xy(
    lon: np.ndarray, lat: np.ndarray, level: int = DEFAULT_LEVEL
) -> tuple[np.ndarray, np.ndarray]:
    """Integer cell column/row for lon/lat arrays (clamped to valid range)."""
    size = cell_size_deg(level)
    cx = np.clip(np.floor((np.asarray(lon) + 180.0) / size), 0, n_cols(level) - 1)
    cy = np.clip(np.floor((np.asarray(lat) + 90.0) / size), 0, (1 << level) - 1)
    return cx.astype(np.int64), cy.astype(np.int64)


def cell_id(lon, lat, level: int = DEFAULT_LEVEL) -> np.ndarray:
    """Row-major cell id: ``cy * n_cols + cx`` (the SQL-expressible scheme)."""
    cx, cy = cell_xy(np.asarray(lon, dtype=np.float64), np.asarray(lat, np.float64), level)
    return cy * n_cols(level) + cx


def cover_bbox(
    xmin: float, ymin: float, xmax: float, ymax: float, level: int = DEFAULT_LEVEL
) -> np.ndarray:
    """All cell ids intersecting a bbox (inclusive of boundary cells)."""
    size = cell_size_deg(level)
    nc = n_cols(level)
    cx0 = int(np.clip(np.floor((xmin + 180.0) / size), 0, nc - 1))
    cx1 = int(np.clip(np.floor((xmax + 180.0) / size), 0, nc - 1))
    cy0 = int(np.clip(np.floor((ymin + 90.0) / size), 0, (1 << level) - 1))
    cy1 = int(np.clip(np.floor((ymax + 90.0) / size), 0, (1 << level) - 1))
    cys, cxs = np.meshgrid(
        np.arange(cy0, cy1 + 1, dtype=np.int64),
        np.arange(cx0, cx1 + 1, dtype=np.int64),
        indexing="ij",
    )
    return (cys * nc + cxs).ravel()


def cover_polygon(ring_lon, ring_lat, level: int = DEFAULT_LEVEL) -> np.ndarray:
    """Cell ids covering a polygon ring: bbox cells filtered to those whose
    cell-rectangle intersects the polygon (exact rect-vs-polygon test).

    For the convex-quadrilateral footprints of satellite scenes this is
    exact; for arbitrary polygons it upper-bounds (fine for a coarse join
    key — the exact refine is the point-in-polygon stage).
    """
    from xcube_stac_spark.geom import polygon_intersects_rect

    ring_lon = np.asarray(ring_lon, np.float64)
    ring_lat = np.asarray(ring_lat, np.float64)
    ids = cover_bbox(ring_lon.min(), ring_lat.min(), ring_lon.max(), ring_lat.max(), level)
    if ids.size <= 1:
        return ids
    size = cell_size_deg(level)
    nc = n_cols(level)
    cx = ids % nc
    cy = ids // nc
    keep = np.array(
        [
            polygon_intersects_rect(
                ring_lon,
                ring_lat,
                x * size - 180.0,
                y * size - 90.0,
                (x + 1) * size - 180.0,
                (y + 1) * size - 90.0,
            )
            for x, y in zip(cx, cy)
        ],
        dtype=bool,
    )
    return ids[keep]


# ---------------------------------------------------------------------------
# Morton (Z-order) variant — locality-preserving key for planetary layouts.
# ---------------------------------------------------------------------------

def _part1by1(v: np.ndarray) -> np.ndarray:
    """Spread the low 32 bits of each int64 so a bit of space appears
    between consecutive bits (standard Morton interleave gadget)."""
    v = v.astype(np.uint64) & np.uint64(0xFFFFFFFF)
    v = (v | (v << np.uint64(16))) & np.uint64(0x0000FFFF0000FFFF)
    v = (v | (v << np.uint64(8))) & np.uint64(0x00FF00FF00FF00FF)
    v = (v | (v << np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    v = (v | (v << np.uint64(2))) & np.uint64(0x3333333333333333)
    v = (v | (v << np.uint64(1))) & np.uint64(0x5555555555555555)
    return v


def morton_id(lon, lat, level: int = DEFAULT_LEVEL) -> np.ndarray:
    """Z-order cell id at the same resolution as :func:`cell_id`."""
    cx, cy = cell_xy(np.asarray(lon, np.float64), np.asarray(lat, np.float64), level)
    return (_part1by1(cx) | (_part1by1(cy) << np.uint64(1))).astype(np.int64)


def morton_from_rowmajor(ids: np.ndarray, level: int = DEFAULT_LEVEL) -> np.ndarray:
    nc = n_cols(level)
    cx = (ids % nc).astype(np.int64)
    cy = (ids // nc).astype(np.int64)
    return (_part1by1(cx) | (_part1by1(cy) << np.uint64(1))).astype(np.int64)
