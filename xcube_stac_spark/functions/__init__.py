"""Scalar Column-expression helpers — the JVM-side (whole-stage-codegen'd)
re-expressions of the reference's Python scalar functions (SURVEY §2.8).

Everything here is a pure ``pyspark.sql.functions`` composition: no UDFs, no
Python in the hot path. Each helper cites the reference function it mirrors.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from xcube_stac_spark import cells as _cells

# ---------------------------------------------------------------------------
# time (C5, C6)
# ---------------------------------------------------------------------------


def solar_time(utc: Column, lon: Column) -> Column:
    """UTC timestamp + int(lon/15) hours — reference ``convert_to_solar_time``
    (utils.py:573-591; note int() truncation toward zero, not floor)."""
    return F.timestamp_add("SECOND", (lon / 15.0).cast("int") * 3600, utc)


def solar_day(utc: Column, lon: Column) -> Column:
    """The (solar-day, tile) grouping key's date part — reference
    ``add_nominal_datetime`` (utils.py:354-371) + ``.dt.date`` use at
    ``accessors/sen2.py:595``."""
    return F.to_date(solar_time(utc, lon))


def nominal_datetime(dt_col: Column, start_col: Column, end_col: Column) -> Column:
    """Point datetime, else interval midpoint (items carry either a point
    datetime or start/end_datetime — utils.py:248-280)."""
    mid = F.timestamp_add(
        "SECOND",
        (F.unix_timestamp(end_col) - F.unix_timestamp(start_col)) / F.lit(2),
        start_col,
    )
    return F.coalesce(dt_col, mid)


# ---------------------------------------------------------------------------
# bbox predicates / derivations (F1, F2, F5, C7)
# ---------------------------------------------------------------------------


def bbox_intersects(
    axmin: Column, aymin: Column, axmax: Column, aymax: Column,
    bxmin: float, bymin: float, bxmax: float, bymax: float,
) -> Column:
    """Pure-SQL bbox∩bbox (reference utils.py:307-322 via shapely)."""
    return ~(
        (axmax < F.lit(bxmin))
        | (axmin > F.lit(bxmax))
        | (aymax < F.lit(bymin))
        | (aymin > F.lit(bymax))
    )


def time_in_range(
    dt_col: Column, start_col: Column, end_col: Column, t0: str, t1: str
) -> Column:
    """Point-in-range for datetime items, interval-overlap for
    start/end_datetime items (reference utils.py:248-280)."""
    point_ok = dt_col.isNotNull() & dt_col.between(F.lit(t0).cast("timestamp"), F.lit(t1).cast("timestamp"))
    interval_ok = (
        dt_col.isNull()
        & start_col.isNotNull()
        & (start_col <= F.lit(t1).cast("timestamp"))
        & (end_col >= F.lit(t0).cast("timestamp"))
    )
    return point_ok | interval_ok


def antimeridian_ok(xmin: Column, xmax: Column, max_width: float = 20.0) -> Column:
    """Drop catalog-bug items with absurd bbox width (sen2.py:368-374)."""
    return F.abs(xmax - xmin) < F.lit(max_width)


def bbox_center_lon(xmin: Column, xmax: Column) -> Column:
    return (xmin + xmax) / 2.0


def bbox_center_lat(ymin: Column, ymax: Column) -> Column:
    return (ymin + ymax) / 2.0


# ---------------------------------------------------------------------------
# UTM zone / CRS fix (C9)
# ---------------------------------------------------------------------------


def utm_zone_from_lon(lon: Column) -> Column:
    """zone = floor((lon+180)/6)+1 (reference utils.py:818-824)."""
    return F.least(F.greatest(F.floor((lon + 180.0) / 6.0) + 1, F.lit(1)), F.lit(60)).cast("int")


def utm_epsg(lon: Column, lat: Column) -> Column:
    """EPSG 326xx north / 327xx south — includes the wrong-hemisphere fix
    the reference applies to HLS metadata (hls.py:522-556)."""
    zone = utm_zone_from_lon(lon)
    return F.concat(
        F.lit("EPSG:"),
        (F.when(lat >= 0, F.lit(32600)).otherwise(F.lit(32700)) + zone).cast("string"),
    )


def fix_hemisphere(proj_code: Column, center_lat: Column) -> Column:
    """Correct EPSG 326xx<->327xx when it contradicts the bbox-center
    hemisphere (reference accessors/hls.py:522-556)."""
    num = F.split(proj_code, ":").getItem(1).cast("int")
    zone = num % 100
    fixed = F.when(center_lat >= 0, zone + 32600).otherwise(zone + 32700)
    return F.when(
        (num >= 32601) & (num <= 32760), F.concat(F.lit("EPSG:"), fixed.cast("string"))
    ).otherwise(proj_code)


# ---------------------------------------------------------------------------
# cell index expressions (J1 coarse key) — mirror cells.py in pure SQL
# ---------------------------------------------------------------------------


def cell_x(lon: Column, level: int = _cells.DEFAULT_LEVEL) -> Column:
    size = _cells.cell_size_deg(level)
    nc = _cells.n_cols(level)
    return F.least(F.greatest(F.floor((lon + 180.0) / size), F.lit(0)), F.lit(nc - 1)).cast("long")


def cell_y(lat: Column, level: int = _cells.DEFAULT_LEVEL) -> Column:
    size = _cells.cell_size_deg(level)
    nr = 1 << level
    return F.least(F.greatest(F.floor((lat + 90.0) / size), F.lit(0)), F.lit(nr - 1)).cast("long")


def cell_id_expr(lon: Column, lat: Column, level: int = _cells.DEFAULT_LEVEL) -> Column:
    """Row-major cell id — numerically identical to cells.cell_id (tested)."""
    return cell_y(lat, level) * F.lit(_cells.n_cols(level)) + cell_x(lon, level)


def bbox_cells_expr(
    xmin: Column, ymin: Column, xmax: Column, ymax: Column,
    level: int = _cells.DEFAULT_LEVEL,
) -> Column:
    """Array of all cell ids covering a bbox — pure SQL (sequence + flatten),
    exploded by the caller. Mirrors cells.cover_bbox."""
    nc = F.lit(_cells.n_cols(level))
    return F.flatten(
        F.transform(
            F.sequence(cell_y(ymin, level), cell_y(ymax, level)),
            lambda cy: F.transform(
                F.sequence(cell_x(xmin, level), cell_x(xmax, level)),
                lambda cx: cy * nc + cx,
            ),
        )
    )


# ---------------------------------------------------------------------------
# raster-extension scaling metadata (C1) — the SQL side; pixel application
# happens in the decode UDF
# ---------------------------------------------------------------------------


def scaled_value(dn: Column, scale: Column, offset: Column, nodata: Column) -> Column:
    """L = scale*DN + offset with nodata→NULL (stac_extension/raster.py:57-93)."""
    return F.when(dn == nodata, F.lit(None).cast("double")).otherwise(dn * scale + offset)


# ---------------------------------------------------------------------------
# naming (C10)
# ---------------------------------------------------------------------------


def resolve_band_asset(
    band: str, spatial_res: float | None, available: list[str],
    res_options: tuple[float, ...] = (10.0, 20.0, 60.0),
) -> str | None:
    """Resolution-aware asset name resolution (F7, sen2.py:232-245):
    prefer ``{band}_{res}m`` for the requested resolution, else the nearest
    available of res_options by |res - option| argsort, else the bare band.
    Driver-side (broadcast map at scale) — returns None when nothing fits."""
    if band in available and spatial_res is None:
        return band
    order = (
        sorted(res_options, key=lambda r: abs((spatial_res or res_options[0]) - r))
        if spatial_res is not None
        else list(res_options)
    )
    for r in order:
        cand = f"{band}_{int(r)}m"
        if cand in available:
            return cand
    return band if band in available else None


def band_var_name(asset: Column, var: Column | None = None) -> Column:
    """'{asset}' or '{asset}_{var}' rename rule (utils.py:628-649)."""
    if var is None:
        return asset
    return F.when(var.isNull(), asset).otherwise(F.concat_ws("_", asset, var))
