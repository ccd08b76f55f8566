"""Deterministic synthetic scenes + images generator (seed-fixed, no external
data) — the in-repo analogue of the reference test fixtures.

Mirrors:
* ``test/sampledata.py:27-451`` — deterministic synthetic rasters with real
  UTM georeferencing (here: non-constant gradient+noise content so mosaics
  are distinguishable, unlike the reference's all-ones fixtures).
* item property fixtures ``test/test_utils.py:93-117`` and property keys
  ``accessors/sen2.py:151-156`` (tile id, proc version, orbit state, CRS).
* edge cases the reference handles in code: antimeridian-buggy bbox width
  >= 20 deg (``accessors/sen2.py:368-374``), wrong-hemisphere EPSG codes
  (``accessors/hls.py:522-556``), interval-datetime items
  (``utils.py:248-280``), duplicate processing versions
  (``accessors/sen2.py:617-623``), multi-scene same-day tiles (mosaic).

World geometry: two UTM zones (32, 33) whose scene grids BOTH cover the
shared zone boundary at lon 12 deg — the maximal cross-zone-merge case
(reference ``accessors/sen2.py:1328-1403``). Scene (zone, tx, ty) covers a
square of ``w*res`` meters in its zone's UTM CRS; footprints are the
corners+edge-midpoints projected to WGS84 (slightly curved quads).

The ``images`` table has EXACTLY the mandated shape
``(image_id, bytes, w, h, fmt, caption, phash)``; band/item linkage lives
in the ``assets`` side table (image_id = "{item_id}:{band}").

Output: ``/root/repo/synthdata/sf{X}/{scenes,images,assets}.parquet``.
Run ``python -m xcube_stac_spark.synth [sf ...]`` to (re)generate.
"""

from __future__ import annotations

import datetime as dt
import os
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from xcube_stac_spark import codecs, geom
from xcube_stac_spark.gridspec import GridSpec

SYNTH_ROOT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "synthdata")

COLLECTION = "syn-l2a"
BASE_DATE = dt.date(2025, 6, 1)
OVERPASS_UTC = (10, 30)  # HH, MM
SCALE = 0.0001
OFFSET = -0.1
NODATA = 0.0
ZONES = (32, 33)
BOUNDARY_LON = 12.0  # zone 32/33 boundary both grids straddle
LAT0 = 49.0  # approximate south edge of the scene grids
N0 = 5_430_000.0  # northing of scene-grid row 0 (south edge)


@dataclass(frozen=True)
class SynthParams:
    sf: str
    days: int
    ntx: int
    nty: int
    bands: tuple[str, ...]
    w: int
    h: int
    res: float  # scene pixel size in meters


PARAMS = {
    "sf0.001": SynthParams("sf0.001", days=4, ntx=2, nty=2, bands=("B02", "B03"), w=64, h=64, res=1000.0),
    "sf0.01": SynthParams("sf0.01", days=8, ntx=3, nty=3, bands=("B02", "B03", "B04"), w=64, h=64, res=1000.0),
    "sf0.1": SynthParams("sf0.1", days=16, ntx=4, nty=4, bands=("B02", "B03", "B04", "B08"), w=256, h=256, res=250.0),
    # sf1.0: the 10x scale-headroom shape — same world/scene layout as sf0.1
    # but 832-px scenes (10.6x the pixels), so 2048-px output tiles (the
    # reference's native chunk size, constants.py:61) each span multiple
    # scenes and every scene fans out over multiple tiles. Scene extent stays
    # w*res = 64 km so footprints/zone geometry match the smaller sfs.
    "sf1.0": SynthParams("sf1.0", days=16, ntx=4, nty=4, bands=("B02", "B03", "B04", "B08"), w=832, h=832, res=64000.0 / 832),
}

_FMTS = ("raw", "png", "lossy")

#: bump to force regeneration of already-materialized synth dirs when the
#: generated content changes (checked against the _SUCCESS marker)
SYNTH_VERSION = 9  # v8: RGB rows rotate containers; v9: webp joins the RGB rotation
#                    (png/tiff/cog/jpeg) so color flows through every codec

ANGLE_GRID_N = 23  # native angle-grid size (reference sen2.py:1031-1032)
ANGLE_SCALE = 0.01
ANGLE_OFFSET = -0.01


def _angle_values_xml(plane: np.ndarray, col_step: float, indent: str) -> str:
    """<Zenith>/<Azimuth> body: COL/ROW_STEP + 23 space-separated rows
    (NaN for cells outside the detector's coverage) — the reference's
    Values_List shape (sen2.py:1100-1112)."""
    rows = "\n".join(
        f"{indent}    <VALUES>" + " ".join(
            "NaN" if not np.isfinite(v) else f"{v:.4f}" for v in row
        ) + "</VALUES>"
        for row in plane
    )
    return (
        f"{indent}<COL_STEP unit=\"m\">{col_step!r}</COL_STEP>\n"
        f"{indent}<ROW_STEP unit=\"m\">{col_step!r}</ROW_STEP>\n"
        f"{indent}  <Values_List>\n{rows}\n{indent}  </Values_List>"
    )


def granule_xml(
    item_id: str,
    proj_code: str,
    ulx: float,
    uly: float,
    col_step: float,
    vza_deg: np.ndarray,
    vaa_deg: np.ndarray,
) -> str:
    """Granule metadata XML mirroring the Sentinel-2 L2A Tile_Angles layout
    the reference parses (sen2.py:997-1112): Tile_Geocoding geoposition +
    per-(band, detector) Viewing_Incidence_Angles_Grids with Zenith/Azimuth
    23x23 value lists, plus a Sun_Angles_Grid. The full band-0 plane is
    SPLIT across two detectors (cols 0..11 / 12..22 with an identical
    overlap column) so the consumer's nanmean-over-detectors really merges.
    """
    n = vza_deg.shape[1]
    det1 = np.full_like(vza_deg, np.nan)
    det2 = np.full_like(vza_deg, np.nan)
    half = n // 2
    det1[:, : half + 1] = vza_deg[:, : half + 1]
    det2[:, half:] = vza_deg[:, half:]
    det1a = np.full_like(vaa_deg, np.nan)
    det2a = np.full_like(vaa_deg, np.nan)
    det1a[:, : half + 1] = vaa_deg[:, : half + 1]
    det2a[:, half:] = vaa_deg[:, half:]
    grids = "\n".join(
        f"""    <Viewing_Incidence_Angles_Grids bandId="0" detectorId="{det_id}">
      <Zenith>
{_angle_values_xml(z, col_step, '        ')}
      </Zenith>
      <Azimuth>
{_angle_values_xml(a, col_step, '        ')}
      </Azimuth>
    </Viewing_Incidence_Angles_Grids>"""
        for det_id, z, a in ((1, det1, det1a), (2, det2, det2a))
    )
    sun = f"""    <Sun_Angles_Grid>
      <Zenith>
{_angle_values_xml(vza_deg * 0.5 + 20.0, col_step, '        ')}
      </Zenith>
      <Azimuth>
{_angle_values_xml(vaa_deg * 0.25 + 90.0, col_step, '        ')}
      </Azimuth>
    </Sun_Angles_Grid>"""
    return f"""<n1:Level-2A_Tile_ID xmlns:n1="https://psd-14.sentinel2.eo.esa.int/PSD/S2_PDI_Level-2A_Tile_Metadata.xsd">
  <n1:General_Info><TILE_ID>{item_id}</TILE_ID></n1:General_Info>
  <n1:Geometric_Info>
    <Tile_Geocoding>
      <HORIZONTAL_CS_CODE>{proj_code}</HORIZONTAL_CS_CODE>
      <Geoposition><ULX>{ulx!r}</ULX><ULY>{uly!r}</ULY></Geoposition>
    </Tile_Geocoding>
    <Tile_Angles>
{sun}
{grids}
    </Tile_Angles>
  </n1:Geometric_Info>
</n1:Level-2A_Tile_ID>"""


def zone_grid_origin(zone: int, p: SynthParams) -> tuple[float, float]:
    """West-edge easting / south-edge northing of the zone's scene grid,
    positioned so the grid straddles ``BOUNDARY_LON``."""
    clon = geom.zone_central_lon(zone)
    m_per_deg = geom.M_PER_DEG * float(np.cos(np.radians(LAT0 + 0.5)))
    span = p.ntx * p.w * p.res
    e_center = 500000.0 + (BOUNDARY_LON - clon) * m_per_deg
    return e_center - span / 2.0, N0


def scene_bounds(zone: int, tx: int, ty: int, p: SynthParams):
    """(x0, y0_north, x1, y1_south) of scene tile in UTM meters.

    y0 is the NORTH edge (north-up raster convention; row 0 = north)."""
    e0, n0 = zone_grid_origin(zone, p)
    T = p.w * p.res
    x0 = e0 + tx * T
    y_south = n0 + ty * T
    return x0, y_south + p.h * p.res, x0 + T, y_south


def footprint_ring(zone: int, tx: int, ty: int, p: SynthParams):
    """Closed lon/lat ring: 4 corners + edge midpoints of the UTM square."""
    x0, y_north, x1, y_south = scene_bounds(zone, tx, ty, p)
    xm, ym = (x0 + x1) / 2.0, (y_south + y_north) / 2.0
    es = np.array([x0, xm, x1, x1, x1, xm, x0, x0, x0])
    ns = np.array([y_south, y_south, y_south, ym, y_north, y_north, y_north, ym, y_south])
    lon, lat = geom.tm_inverse(es, ns, zone)
    return lon, lat


def scene_pixels(zone: int, tx: int, ty: int, band_idx: int, day: int, p: SynthParams, second: bool = False) -> np.ndarray:
    """Deterministic uint16 DN plane for one (scene, band, day).

    Content is a function of ABSOLUTE scene-grid coordinates so adjacent
    scenes are continuous (mosaic seams checkable), plus band/day terms and
    seeded noise. ``second`` scenes (same-day duplicates) carry a diagonal
    nodata stripe complementary to the first scene's stripe so the
    take-first mosaic must merge both.
    """
    T = p.w * p.res
    e0, n0 = zone_grid_origin(zone, p)
    # absolute pixel-center coordinates, row 0 = north edge
    x = e0 + tx * T + (np.arange(p.w) + 0.5) * p.res
    y = n0 + (ty + 1) * T - (np.arange(p.h) + 0.5) * p.res
    xx, yy = np.meshgrid(x, y)
    base = (
        3000.0
        + 800.0 * np.sin(xx / 40000.0 + band_idx)
        + 800.0 * np.cos(yy / 55000.0 - band_idx * 0.5)
        + 120.0 * day
        + 2.0e-4 * (xx - 500000.0)
    )
    seed = abs(hash((zone, tx, ty, band_idx, day, second))) % (2**32)
    rng = np.random.default_rng(seed)
    img = base + rng.normal(0.0, 20.0, size=(p.h, p.w))
    img = np.clip(img, 1.0, 65535.0)  # keep clear of nodata=0
    # nodata stripes: first scene loses the lower-left diagonal band,
    # second scene loses the complementary upper-right band
    ii, jj = np.mgrid[0 : p.h, 0 : p.w]
    diag = ii + jj
    if second:
        img[diag >= int(1.4 * p.w)] = NODATA
    elif (tx + ty + day) % 4 == 0:
        # scenes that will get a same-day pair: stripe out where the pair
        # has data (ensures the mosaic needs BOTH scenes)
        img[diag < int(0.6 * p.w)] = NODATA
    return img.astype(np.uint16)


def _fmt_for(zone: int, tx: int, ty: int, day: int, band_idx: int) -> str:
    mix = zone + tx + 2 * ty + day + band_idx
    # ~1/8 of spectral payloads are baseline JPEG, ~1/8 uncompressed-strip
    # TIFF, and ~1/8 tiled+DEFLATE COG (the reference's real-world container
    # shape, constants.py:76-83, accessors/hls.py:131-140); the rest rotate
    # through raw/png/lossy
    if mix % 8 == 5:
        return "jpeg"
    if mix % 8 == 2:
        return "tiff"
    if mix % 8 == 7:
        return "cog"
    return _FMTS[mix % 3]


def _item_id(zone: int, tx: int, ty: int, day: int, proc: str, second: bool) -> str:
    d = BASE_DATE + dt.timedelta(days=day)
    suff = "B" if second else "A"
    return f"S2{suff}_T{zone}{tx}{ty}_{d.strftime('%Y%m%d')}_{proc.replace('.', '')}"


def _tile_id(zone: int, tx: int, ty: int) -> str:
    return f"T{zone}{chr(ord('A') + tx)}{chr(ord('B') + ty)}"


def _encode_spectral(job: tuple) -> tuple[bytes, np.int64]:
    """Pool worker for one deferred spectral payload: render the seeded DN
    plane and encode it. Deterministic across processes (the scene_pixels
    seed hashes an int/bool tuple, which PYTHONHASHSEED does not perturb)."""
    p, zone, tx, ty, bi, day, second, fmt = job
    img = scene_pixels(zone, tx, ty, bi, day, p, second)
    return codecs.encode(img, fmt), np.int64(codecs.phash64(img))


def generate(sf: str, out_root: str | None = None, force: bool = False) -> str:
    """Generate scenes/images/assets parquet for one scale factor.

    Deterministic: same sf → byte-identical logical content. Returns the
    output directory. Skips generation when the directory already exists
    (unless ``force``).
    """
    p = PARAMS[sf]
    out_dir = os.path.join(out_root or SYNTH_ROOT, sf)
    marker = os.path.join(out_dir, "_SUCCESS")
    if os.path.exists(marker) and not force:
        with open(marker) as f:
            # trailing space = exact-token match (see ensure_audio)
            if f"synth_version={SYNTH_VERSION} " in f.read():
                return out_dir
    os.makedirs(out_dir, exist_ok=True)

    scenes: list[dict] = []
    images: list[dict] = []
    assets: list[dict] = []
    xmls: list[dict] = []
    #: deferred spectral encodes: (images_index, zone, tx, ty, band_idx, day, second, fmt)
    pending: list[tuple] = []

    def add_scene(zone, tx, ty, day, proc, second, *, buggy_bbox=False, wrong_hemi=False, interval=False):
        item_id = _item_id(zone, tx, ty, day, proc, second)
        if buggy_bbox:
            item_id += "_XAM"  # distinct id for the antimeridian-bug fixture
        x0, y_north, x1, y_south = scene_bounds(zone, tx, ty, p)
        lon_ring, lat_ring = footprint_ring(zone, tx, ty, p)
        bbox = [float(lon_ring.min()), float(lat_ring.min()), float(lon_ring.max()), float(lat_ring.max())]
        if buggy_bbox:
            bbox = [bbox[0] - 25.0, bbox[1], bbox[2], bbox[3]]  # width >= 20 deg → must be filtered (sen2.py:368-374)
        d = BASE_DATE + dt.timedelta(days=day)
        minute_jitter = (zone * 7 + tx * 3 + ty * 5 + (40 if second else 0)) % 50
        t = dt.datetime(d.year, d.month, d.day, OVERPASS_UTC[0], OVERPASS_UTC[1] + minute_jitter % 29, minute_jitter, tzinfo=dt.timezone.utc)
        proj = f"EPSG:{(32700 if wrong_hemi else 32600) + zone}"
        scenes.append(
            dict(
                item_id=item_id,
                collection=COLLECTION,
                datetime=None if interval else t,
                start_datetime=t - dt.timedelta(minutes=5) if interval else None,
                end_datetime=t + dt.timedelta(minutes=5) if interval else None,
                bbox_xmin=bbox[0], bbox_ymin=bbox[1], bbox_xmax=bbox[2], bbox_ymax=bbox[3],
                footprint=[{"lon": float(lo), "lat": float(la)} for lo, la in zip(lon_ring, lat_ring)],
                tile_id=_tile_id(zone, tx, ty),
                zone=zone,
                proj_code=proj,
                proc_version=proc,
                orbit_state="descending" if day % 2 == 0 else "ascending",
                scene_x0=x0,
                scene_y0=y_north,
                scene_res=p.res,
                nodata=NODATA,
                scale=SCALE,
                offset=OFFSET,
            )
        )
        # C14/C15 angle grids: the reference extracts 23x23 zenith/azimuth
        # planes at 5 km from granule XML (sen2.py:997-1112) and resamples
        # them like coarse rasters. Here they ARE coarse rasters: two extra
        # 23x23 assets per item (VZA/VAA) flowing through the identical
        # decode+regrid pipeline (scale 0.01, DN offset +1 keeps 0 free for
        # nodata).
        # per-asset (band) raster-extension scaling, reference
        # stac_extension/raster.py:96-115 — spectral bands share one set,
        # angle planes another (deg = 0.01*DN - 0.01)
        # spectral payloads are DEFERRED: the (bi, second) marker is replaced
        # by pool-encoded bytes after enumeration (encode order == append
        # order, so output is deterministic regardless of pool scheduling)
        band_imgs = [
            (band, (bi, second), _fmt_for(zone, tx, ty, day, bi), p.res, SCALE, OFFSET)
            for bi, band in enumerate(p.bands)
        ]
        e_mid = (x0 + x1) / 2.0
        ang_base = (zone * 13 + tx * 7 + ty * 11 + day) % 60
        jj, ii = np.meshgrid(np.arange(23), np.arange(23))
        vza = np.clip((ang_base / 2.0 + ii * 0.3 + jj * 0.1) * 100 + 1, 1, 65535).astype(np.uint16)
        vaa = np.clip(((ang_base * 3.0) % 360 + ii * 0.2) * 100 + 1, 1, 65535).astype(np.uint16)
        ang_res = (p.w * p.res) / 23.0  # 23x23 plane spans the whole tile
        band_imgs.append(("VZA", vza, "raw", ang_res, ANGLE_SCALE, ANGLE_OFFSET))
        band_imgs.append(("VAA", vaa, "raw", ang_res, ANGLE_SCALE, ANGLE_OFFSET))
        # C14 sidecar: the SAME angle planes as granule XML (degrees), the
        # raw form the reference parses; the XML consumer must reconstruct
        # the VZA/VAA DN planes above bit-exactly
        xmls.append(
            dict(
                item_id=item_id,
                xml=granule_xml(
                    item_id, proj,
                    ulx=x0, uly=y_north, col_step=ang_res,
                    vza_deg=vza.astype(np.float64) * ANGLE_SCALE + ANGLE_OFFSET,
                    vaa_deg=vaa.astype(np.float64) * ANGLE_SCALE + ANGLE_OFFSET,
                ),
            )
        )
        for band, img, fmt, res, a_scale, a_offset in band_imgs:
            image_id = f"{item_id}:{band}"
            if isinstance(img, tuple):
                bi, sec = img
                pending.append((len(images), zone, tx, ty, bi, day, sec, fmt))
                payload, ph, iw, ih = None, None, p.w, p.h
            else:
                payload = codecs.encode(img, fmt)
                ph = np.int64(codecs.phash64(img))
                iw, ih = img.shape[1], img.shape[0]
            images.append(
                dict(
                    image_id=image_id,
                    bytes=payload,
                    w=np.int32(iw),
                    h=np.int32(ih),
                    fmt=fmt,
                    caption=f"scene {item_id} band {band} day {d.isoformat()} tile {_tile_id(zone, tx, ty)}",
                    phash=ph,
                )
            )
            assets.append(
                dict(
                    item_id=item_id, band=band, image_id=image_id, fmt=fmt,
                    res=float(res), scale=float(a_scale), offset=float(a_offset),
                    nodata=NODATA,
                )
            )

    for day in range(p.days):
        for zone in ZONES:
            for ty in range(p.nty):
                for tx in range(p.ntx):
                    interval = (tx + ty + day) % 7 == 3
                    wrong_hemi = zone == 33 and tx == 0 and ty == 0 and day == 0
                    add_scene(zone, tx, ty, day, "05.00", False, interval=interval, wrong_hemi=wrong_hemi)
                    if (tx + ty + day) % 5 == 0:
                        # duplicate with newer processing version — dedup must keep it
                        add_scene(zone, tx, ty, day, "05.11", False)
                    if (tx + ty + day) % 4 == 0:
                        # same-day second acquisition (complementary nodata stripe)
                        add_scene(zone, tx, ty, day, "05.00", True)
    # antimeridian-buggy item (bbox width >= 20 deg) — one per dataset
    add_scene(ZONES[0], 0, 0, 0, "05.00", False, buggy_bbox=True)

    # fill in the deferred spectral payloads; at large sfs the pure-Python
    # lossy/jpeg encoders dominate generation, so fan the (independent,
    # seed-deterministic) encodes over a process pool. ex.map preserves job
    # order, so the parquet content is identical to the serial path.
    jobs = [(p, z, jtx, jty, bi, day, sec, fmt) for (_i, z, jtx, jty, bi, day, sec, fmt) in pending]
    if len(jobs) > 256 and (os.cpu_count() or 1) > 1:
        from concurrent.futures import ProcessPoolExecutor

        with ProcessPoolExecutor(max_workers=min(32, os.cpu_count() or 1)) as ex:
            results = list(ex.map(_encode_spectral, jobs, chunksize=8))
    else:
        results = [_encode_spectral(j) for j in jobs]
    for (idx, *_), (payload, ph) in zip(pending, results):
        images[idx]["bytes"] = payload
        images[idx]["phash"] = ph

    # RGB multimodal rows (channel-major (3,h,w)): the image+caption
    # TRAINING-corpus shape next to the single-band rasters. Standalone
    # rows — no asset linkage, so the cube band path never sees them;
    # image_stats/thumbnails/pHash exercise the 3-channel decode. The
    # container rotates over every color-capable codec (PNG color type 2,
    # chunky-spp3 TIFF and tiled+DEFLATE COG, 4:2:0 baseline JPEG), so the
    # whole color surface is in the corpus. phash is computed over the
    # luminance (channel mean) of the ORIGINAL plane (lossy jpeg rows then
    # show a small, nonzero hamming — same convention as the spectral mix).
    rh, rw = max(32, p.h // 2), max(32, p.w // 2)
    yy, xx = np.mgrid[0:rh, 0:rw]
    _rgb_fmts = ("png", "tiff", "cog", "jpeg", "webp")
    for i in range(4 * p.days):
        rng = np.random.default_rng(900_000 + i)
        chans = []
        for c in range(3):
            plane = (
                8000.0 + 2500.0 * c
                + 9000.0 * np.sin(xx / (6.0 + i % 5) + c) * np.cos(yy / (7.0 + i % 3))
                + rng.normal(0.0, 400.0, (rh, rw))
            )
            chans.append(np.clip(plane, 0.0, 65535.0))
        rgb = np.stack(chans).astype(np.uint16)
        fmt = _rgb_fmts[i % len(_rgb_fmts)]
        images.append(
            dict(
                image_id=f"RGB{i:04d}",
                bytes=codecs.encode(rgb, fmt),
                w=np.int32(rw),
                h=np.int32(rh),
                fmt=fmt,
                caption=f"photo {i} of a synthetic landscape",
                phash=np.int64(codecs.phash64_any(rgb)),
            )
        )

    scenes_schema = pa.schema(
        [
            ("item_id", pa.string()),
            ("collection", pa.string()),
            ("datetime", pa.timestamp("us", tz="UTC")),
            ("start_datetime", pa.timestamp("us", tz="UTC")),
            ("end_datetime", pa.timestamp("us", tz="UTC")),
            ("bbox_xmin", pa.float64()),
            ("bbox_ymin", pa.float64()),
            ("bbox_xmax", pa.float64()),
            ("bbox_ymax", pa.float64()),
            ("footprint", pa.list_(pa.struct([("lon", pa.float64()), ("lat", pa.float64())]))),
            ("tile_id", pa.string()),
            ("zone", pa.int32()),
            ("proj_code", pa.string()),
            ("proc_version", pa.string()),
            ("orbit_state", pa.string()),
            ("scene_x0", pa.float64()),
            ("scene_y0", pa.float64()),
            ("scene_res", pa.float64()),
            ("nodata", pa.float64()),
            ("scale", pa.float64()),
            ("offset", pa.float64()),
        ]
    )
    images_schema = pa.schema(
        [
            ("image_id", pa.string()),
            ("bytes", pa.binary()),
            ("w", pa.int32()),
            ("h", pa.int32()),
            ("fmt", pa.string()),
            ("caption", pa.string()),
            ("phash", pa.int64()),
        ]
    )
    assets_schema = pa.schema(
        [
            ("item_id", pa.string()),
            ("band", pa.string()),
            ("image_id", pa.string()),
            ("fmt", pa.string()),
            ("res", pa.float64()),  # per-asset pixel size (B02@10m vs VZA@5km)
            ("scale", pa.float64()),
            ("offset", pa.float64()),
            ("nodata", pa.float64()),
        ]
    )
    pq.write_table(pa.Table.from_pylist(scenes, schema=scenes_schema), os.path.join(out_dir, "scenes.parquet"))
    # small row groups keep the pixel table SPLITTABLE: a single row group
    # cannot be divided across Spark input partitions, which would serialize
    # the decode stage no matter how many cores exist
    pq.write_table(
        pa.Table.from_pylist(images, schema=images_schema),
        os.path.join(out_dir, "images.parquet"),
        row_group_size=32,
    )
    pq.write_table(pa.Table.from_pylist(assets, schema=assets_schema), os.path.join(out_dir, "assets.parquet"))
    xml_schema = pa.schema([("item_id", pa.string()), ("xml", pa.string())])
    pq.write_table(
        pa.Table.from_pylist(xmls, schema=xml_schema),
        os.path.join(out_dir, "granule_xml.parquet"),
    )
    with open(marker, "w") as f:
        f.write(f"synth_version={SYNTH_VERSION} scenes={len(scenes)} images={len(images)}\n")
    return out_dir


#: bumped independently of SYNTH_VERSION: the audio table is generated
#: LAZILY beside an existing synth dir (its own marker), so adding/changing
#: it never invalidates the scene/image payloads or the scaling-history
#: data_version those records are keyed on
AUDIO_VERSION = 3  # v2: clips alternate WAV/AIFF; v3: FLAC joins the rotation
AUDIO_SR = 4000


def ensure_audio(sf: str, out_root: str | None = None) -> str:
    """Deterministic audio table (the audio modality of the multimodal
    brief): PCM16 clips as opaque binary + typed metadata (audio_id,
    bytes, sr, n_samples, caption), rotating RIFF/WAV, FORM/AIFF and FLAC
    containers (the reader sniffs by magic). Sine mixtures + noise,
    seeded per clip; ~0.5-2 s at 4 kHz keeps the table tiny at every
    sf. The fixture oracle recomputes this exact recipe per clip
    (fixtures._audio_pcm), so keep the two in lockstep."""
    p = PARAMS[sf]
    out_dir = os.path.join(out_root or SYNTH_ROOT, sf)
    marker = os.path.join(out_dir, "_AUDIO_SUCCESS")
    path = os.path.join(out_dir, "audio.parquet")
    if os.path.exists(marker):
        with open(marker) as f:
            # trailing space = exact-token match (version 1 must not match
            # a future marker saying version 12)
            if f"audio_version={AUDIO_VERSION} " in f.read():
                return path
    os.makedirs(out_dir, exist_ok=True)
    rows = []
    for i in range(8 * p.days):
        rng = np.random.default_rng(700_000 + i)
        n = int(AUDIO_SR * (0.5 + 1.5 * ((i * 37) % 16) / 15.0))
        t = np.arange(n) / AUDIO_SR
        f0 = 80.0 + 40.0 * (i % 11)
        sig = (
            0.55 * np.sin(2 * np.pi * f0 * t)
            + 0.25 * np.sin(2 * np.pi * 2.7 * f0 * t + 0.3 * i)
            + 0.1 * rng.standard_normal(n)
        )
        pcm = np.clip(np.round(sig * 12000.0), -32768, 32767).astype(np.int16)
        rows.append(
            dict(
                audio_id=f"AUD{i:04d}",
                bytes=(codecs.encode_wav, codecs.encode_aiff, codecs.encode_flac)[
                    i % 3
                ](pcm, AUDIO_SR),
                sr=np.int32(AUDIO_SR),
                n_samples=np.int32(n),
                caption=f"clip {i}: tone at {f0:.0f} Hz",
            )
        )
    schema = pa.schema(
        [
            ("audio_id", pa.string()),
            ("bytes", pa.binary()),
            ("sr", pa.int32()),
            ("n_samples", pa.int32()),
            ("caption", pa.string()),
        ]
    )
    pq.write_table(pa.Table.from_pylist(rows, schema=schema), path)
    with open(marker, "w") as f:
        f.write(f"audio_version={AUDIO_VERSION} clips={len(rows)}\n")
    return path


#: like AUDIO_VERSION: the video table is generated lazily beside an
#: existing synth dir with its own marker, so it never invalidates the
#: scene/image payloads or the scaling-history data_version
VIDEO_VERSION = 3  # v3: clips rotate AVI / MP4 / MKV containers
VIDEO_W, VIDEO_H = 64, 48


def video_clip_frames(i: int) -> np.ndarray:
    """Deterministic frames of synthetic clip ``i``: a drifting sinusoid
    field (motion = per-frame phase shift). Even clips are grayscale
    (n, h, w); odd clips are color (n, 3, h, w) — both shapes the MJPEG
    encoder accepts. Shared by synth, tests and the fixture oracle."""
    h, w = VIDEO_H, VIDEO_W
    n = 6 + (i * 7) % 11
    yy, xx = np.mgrid[0:h, 0:w]
    frames = []
    for t in range(n):
        base = 20000.0 + 9000.0 * np.sin(
            xx / (6.0 + i % 5) + 0.6 * t
        ) * np.cos(yy / (7.0 + i % 3) - 0.3 * t)
        if i % 2 == 0:
            frames.append(np.clip(base, 0, 65535).astype(np.uint16))
        else:
            frames.append(
                np.stack(
                    [
                        np.clip(base + 2500.0 * c + 900.0 * np.sin(t + c), 0, 65535)
                        for c in range(3)
                    ]
                ).astype(np.uint16)
            )
    return np.stack(frames)


def ensure_video(sf: str, out_root: str | None = None) -> str:
    """Deterministic video table (the video modality of the multimodal
    brief): MJPEG clips as opaque binary + typed metadata (video_id,
    bytes, fps, n_frames, w, h, caption). Grayscale and 4:2:0 color clips
    alternate so both JPEG paths flow, and the CONTAINER rotates
    over RIFF/AVI, ISO-BMFF/MP4 and EBML/Matroska so every index-seek
    path is in the corpus (the reader sniffs by magic)."""
    p = PARAMS[sf]
    out_dir = os.path.join(out_root or SYNTH_ROOT, sf)
    marker = os.path.join(out_dir, "_VIDEO_SUCCESS")
    path = os.path.join(out_dir, "video.parquet")
    if os.path.exists(marker):
        with open(marker) as f:
            if f"video_version={VIDEO_VERSION} " in f.read():
                return path
    os.makedirs(out_dir, exist_ok=True)
    rows = []
    for i in range(4 * p.days):
        frames = video_clip_frames(i)
        fps = 4 + i % 5
        enc = (
            codecs.encode_avi_mjpeg,
            codecs.encode_mp4_mjpeg,
            codecs.encode_mkv_mjpeg,
        )[(i // 2) % 3]
        rows.append(
            dict(
                video_id=f"VID{i:04d}",
                bytes=enc(list(frames), fps=fps),
                fps=np.int32(fps),
                n_frames=np.int32(len(frames)),
                w=np.int32(VIDEO_W),
                h=np.int32(VIDEO_H),
                caption=f"clip {i}: drifting interference pattern",
            )
        )
    schema = pa.schema(
        [
            ("video_id", pa.string()),
            ("bytes", pa.binary()),
            ("fps", pa.int32()),
            ("n_frames", pa.int32()),
            ("w", pa.int32()),
            ("h", pa.int32()),
            ("caption", pa.string()),
        ]
    )
    pq.write_table(pa.Table.from_pylist(rows, schema=schema), path)
    with open(marker, "w") as f:
        f.write(f"video_version={VIDEO_VERSION} clips={len(rows)}\n")
    return path


def swath_rows(n: int = 4, rows: int = 40, cols: int = 30) -> list[dict]:
    """Deterministic synthetic swath granules — the Sentinel-3 analogue of
    the reference fixtures: skewed (0.2) + rotated (-25 deg) 2-D lon/lat
    with cos(lat) stretch (test/sampledata.py:255-291), elevation ramp
    0..1000 m and constant unit viewing angles (sampledata.py:359-451).
    Returned as plain dicts with float64/float32 binary planes for a Spark
    ``swaths`` DataFrame (schema in operators/swath.py).
    """
    out = []
    theta = np.radians(-25.0)
    for i in range(n):
        jj, ii = np.meshgrid(np.arange(cols), np.arange(rows))
        x = jj * 0.02 + ii * 0.2 * 0.02  # skew 0.2
        y = ii * 0.02
        xr = x * np.cos(theta) - y * np.sin(theta)
        yr = x * np.sin(theta) + y * np.cos(theta)
        lat0 = 49.2 + 0.3 * i
        lat = lat0 + yr
        lon = (11.2 + 0.25 * i) + xr / np.cos(np.radians(lat0))
        elev = np.broadcast_to(
            np.linspace(0.0, 1000.0, cols), (rows, cols)
        ).copy()
        zenith = np.full((rows, cols), 30.0 + i)
        azimuth = np.full((rows, cols), 120.0 + 5 * i)
        vals = (
            250.0 + 10.0 * np.sin(ii / 7.0) + 5.0 * np.cos(jj / 5.0) + i
        ).astype(np.float32)
        out.append(
            dict(
                item_id=f"S3_{i:03d}",
                var="lst",
                rows=rows,
                cols=cols,
                lon=lon.astype(np.float64).tobytes(),
                lat=lat.astype(np.float64).tobytes(),
                elev=elev.astype(np.float64).tobytes(),
                zenith=zenith.astype(np.float64).tobytes(),
                azimuth=azimuth.astype(np.float64).tobytes(),
                values=vals.tobytes(),
            )
        )
    return out


SWATH_DDL = (
    "item_id string, var string, rows int, cols int, lon binary, lat binary, "
    "elev binary, zenith binary, azimuth binary, values binary"
)

SWATH_NC_DDL = "item_id string, var string, nc binary"


def swath_nc_rows(n: int = 4, rows: int = 40, cols: int = 30) -> list[dict]:
    """The SAME granules as swath_rows, packed as real NetCDF-3 classic
    containers with Sentinel-3-style variable names (the reference reads
    geodetic_an.nc / LST_in.nc through xarray, accessors/sen3.py:172-173).
    operators/swath.swaths_from_netcdf decodes these back to the columnar
    swath shape bit-exactly (pinned by test)."""
    out = []
    for r in swath_rows(n, rows, cols):
        shape = (r["rows"], r["cols"])
        nc = codecs.encode_netcdf3(
            {
                "longitude_an": np.frombuffer(r["lon"], np.float64).reshape(shape),
                "latitude_an": np.frombuffer(r["lat"], np.float64).reshape(shape),
                "elevation_an": np.frombuffer(r["elev"], np.float64).reshape(shape),
                "sat_zenith_tn": np.frombuffer(r["zenith"], np.float64).reshape(shape),
                "sat_azimuth_tn": np.frombuffer(r["azimuth"], np.float64).reshape(shape),
                "LST": np.frombuffer(r["values"], np.float32).reshape(shape),
            }
        )
        out.append(dict(item_id=r["item_id"], var=r["var"], nc=nc))
    return out


def default_grid(sf: str, tile: int = 64, res_factor: float = 1.1) -> GridSpec:
    """Target cube grid for a scale factor: lon/lat grid over the synthetic
    world's core region (straddling the zone 32/33 boundary), sized so scene
    tiles land at non-integer offsets (regrid really resamples; FIXTURES T3).

    ``res_factor`` scales the grid resolution relative to the scene pixel
    size: <1 oversamples (more output pixels — the bench uses this to run a
    job large enough that fixed JVM costs don't dominate the scaling
    measurement).
    """
    p = PARAMS[sf]
    # grid res ≈ scene res in degrees at the world latitude, slightly off so
    # source/target grids never align exactly
    res = (p.res / geom.M_PER_DEG) * res_factor
    span_m = p.ntx * p.w * p.res
    m_per_deg = geom.M_PER_DEG * float(np.cos(np.radians(LAT0 + 0.5)))
    half_lon = (span_m / m_per_deg) / 2.0
    x0 = BOUNDARY_LON - half_lon * 1.05
    y0 = LAT0 + (p.nty * p.h * p.res + N0 - N0) / geom.M_PER_DEG * 1.12 + 0.15
    width = int(2 * half_lon * 1.05 / res) + 1
    height = int((y0 - (LAT0 - 0.05)) / res) + 1
    return GridSpec(crs="EPSG:4326", x0=round(x0, 6), y0=round(y0, 6), res=round(res, 9), width=width, height=height, tile_w=tile, tile_h=tile)


def synth_dir_for(sf_dir: str) -> str:
    """Map a driver sf dir (/root/testdata/sf0.01) to the synthetic
    geospatial tables dir, generating them on first use."""
    sf = os.path.basename(os.path.normpath(sf_dir))
    if sf not in PARAMS:
        sf = "sf0.01"
    return generate(sf)


if __name__ == "__main__":
    import sys

    targets = sys.argv[1:] or list(PARAMS)
    for sf in targets:
        d = generate(sf, force=True)
        print(sf, "->", d)
