"""Fixed target cube grid — the Spark analogue of the reference GridMapping.

Reference: ``GridMapping.regular_from_bbox`` construction sites
(``xcube_stac/accessors/sen2.py:295-300``, ``:1368-1380``,
``accessors/hls.py:247-249``) — CRS + bbox + resolution + tile size.

Here a grid is a tiny frozen dataclass broadcast to every task; all
pixel<->cell arithmetic is derived from it with closed-form NumPy, never a
lookup. Convention is north-up raster order: row 0 is the northernmost row
(y decreasing with row index), matching the reference's descending-y
coordinates (``accessors/hls.py:505`` sortby y ascending=False).
"""

from __future__ import annotations

from dataclasses import dataclass, asdict

import numpy as np


@dataclass(frozen=True)
class GridSpec:
    """Regular target grid in geographic (lon/lat degree) coordinates.

    ``x0, y0`` is the OUTER corner of pixel (0, 0): x0 = west edge,
    y0 = north edge.  Cell (row r, col c) center is at
    ``(x0 + (c+0.5)*res, y0 - (r+0.5)*res)``.
    Tiles are ``tile_h x tile_w`` pixel blocks; tile (tile_y, tile_x) covers
    rows [tile_y*tile_h, (tile_y+1)*tile_h) and likewise for cols.
    """

    crs: str  # e.g. "EPSG:4326"
    x0: float
    y0: float
    res: float  # degrees per pixel (square pixels)
    width: int  # total pixels in x
    height: int  # total pixels in y
    tile_w: int
    tile_h: int

    # ---- derived ----------------------------------------------------------
    @property
    def n_tiles_x(self) -> int:
        return -(-self.width // self.tile_w)

    @property
    def n_tiles_y(self) -> int:
        return -(-self.height // self.tile_h)

    @property
    def x1(self) -> float:
        return self.x0 + self.width * self.res

    @property
    def y1(self) -> float:
        """South edge (y0 is the north edge)."""
        return self.y0 - self.height * self.res

    def bbox(self) -> tuple[float, float, float, float]:
        return (self.x0, self.y1, self.x1, self.y0)

    # ---- tile geometry ----------------------------------------------------
    def tile_bbox(self, tile_x: int, tile_y: int) -> tuple[float, float, float, float]:
        """(xmin, ymin, xmax, ymax) of one tile in grid CRS degrees."""
        xmin = self.x0 + tile_x * self.tile_w * self.res
        ymax = self.y0 - tile_y * self.tile_h * self.res
        xmax = min(xmin + self.tile_w * self.res, self.x1)
        ymin = max(ymax - self.tile_h * self.res, self.y1)
        return (xmin, ymin, xmax, ymax)

    def tile_shape(self, tile_x: int, tile_y: int) -> tuple[int, int]:
        """(rows, cols) of one tile — edge tiles may be ragged."""
        rows = min(self.tile_h, self.height - tile_y * self.tile_h)
        cols = min(self.tile_w, self.width - tile_x * self.tile_w)
        return (rows, cols)

    def tile_cell_centers(
        self, tile_x: int, tile_y: int
    ) -> tuple[np.ndarray, np.ndarray]:
        """Lon/lat center coordinate arrays for one tile.

        Returns ``(lons[cols], lats[rows])`` 1-D arrays (regular grid, so the
        2-D mesh is their outer product; callers broadcast as needed).
        """
        rows, cols = self.tile_shape(tile_x, tile_y)
        c0 = tile_x * self.tile_w
        r0 = tile_y * self.tile_h
        lons = self.x0 + (c0 + np.arange(cols) + 0.5) * self.res
        lats = self.y0 - (r0 + np.arange(rows) + 0.5) * self.res
        return lons, lats

    def tiles_for_bbox(
        self, xmin: float, ymin: float, xmax: float, ymax: float
    ) -> list[tuple[int, int]]:
        """All (tile_x, tile_y) whose extent intersects the given bbox."""
        if xmax <= self.x0 or xmin >= self.x1 or ymax <= self.y1 or ymin >= self.y0:
            return []
        tx0 = max(0, int((xmin - self.x0) / (self.tile_w * self.res)))
        tx1 = min(self.n_tiles_x - 1, int((xmax - self.x0) / (self.tile_w * self.res)))
        ty0 = max(0, int((self.y0 - ymax) / (self.tile_h * self.res)))
        ty1 = min(self.n_tiles_y - 1, int((self.y0 - ymin) / (self.tile_h * self.res)))
        return [(tx, ty) for ty in range(ty0, ty1 + 1) for tx in range(tx0, tx1 + 1)]

    def coarsen(self) -> "GridSpec":
        """The next pyramid level's grid: 2x the cell size, halved (ceil)
        pixel counts, same origin and tile size (MultiLevelDataset levels,
        reference store.py:236-242)."""
        return GridSpec(
            crs=self.crs, x0=self.x0, y0=self.y0, res=self.res * 2.0,
            width=-(-self.width // 2), height=-(-self.height // 2),
            tile_w=self.tile_w, tile_h=self.tile_h,
        )

    def to_dict(self) -> dict:
        return asdict(self)

    @staticmethod
    def from_dict(d: dict) -> "GridSpec":
        return GridSpec(**d)
