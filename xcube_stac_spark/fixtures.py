"""DuckDB-readable oracle fixtures for the non-SQL-expressible pixel queries.

The driver's correctness gate compares each ``queries()`` entry against a
DuckDB oracle. SQL cannot express the pixel pipelines (decode / TPS / regrid
/ mosaic / pyramid), so for those the oracle is a PARQUET FIXTURE computed by
the independent NumPy implementations (``oracle.build_cube_numpy`` and the
plain-NumPy swath/pyramid recomputations below) and the oracle SQL is a
``read_parquet`` of the fixture — the same golden-fixture strategy as the
reference test suite (mosaic golden matrices test/test_utils.py:585-662,
cube-shape asserts test/test_store.py:843-937), but machine-checked by the
driver every round instead of only by pytest.

Determinism: fixtures are derived purely from the seed-fixed synthetic
tables; every float is rounded with Java-BigDecimal HALF_UP semantics to
mirror Spark's ``F.round`` exactly. ``FIXTURE_VERSION`` busts the cache when
fixture definitions change.

The query parameters shared by the Spark queries, the SQL oracles and the
fixtures live HERE (single source of truth; ``__spark_entry__`` imports
them).
"""

from __future__ import annotations

import math
import os
import warnings
from decimal import ROUND_HALF_UP, Decimal

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from xcube_stac_spark import codecs, geom, oracle, synth
from xcube_stac_spark.gridspec import GridSpec

# ---------------------------------------------------------------------------
# canonical query parameters (used by __spark_entry__ AND the fixtures)
# ---------------------------------------------------------------------------

TIME_RANGE = ("2025-06-02 00:00:00", "2025-06-20 23:59:59")
REGION = (11.4, 49.3, 12.3, 50.0)
CUBE_BANDS = ["B02", "B03"]
ANGLE_TIME_RANGE = ("2025-06-01", "2025-06-03")
ANGLE_BANDS = ["VZA", "VAA"]
PYR_TIME_RANGE = ("2025-06-01", "2025-06-03")
PYR_BANDS = ["B02"]
COMBINED_PYR_BANDS = ["B02", "VZA"]
PYR_LEVELS = 2
#: IVF ANN fixture params (query ids match __spark_entry__.ANN_QUERY_IDS)
IVF_QUERY_IDS = (0, 1, 2)
IVF_TOPK_K = 10

FIXTURE_VERSION = 10  # v9: int32-abs audio peak; v10: real video_frames

THUMB_W = THUMB_H = 16
N_FRAMES = 4

#: queries whose oracle is a fixture parquet (name -> parquet file)
FIXTURE_QUERIES = (
    "cube_build",
    "angles_cube",
    "image_stats",
    "thumbnails",
    "video_frames",
    "uv_clip",
    "orthorectify",
    "rectify_swath",
    "ann_ivf_topk",
    "embedding_clusters",
    "audio_features",
    "pyramid",
    "pyramid_combined",
)


def round_half_up(x: float, digits: int) -> float:
    """Exact mirror of Spark's ``F.round`` on doubles: Java
    ``BigDecimal.valueOf(x)`` — i.e. the SHORTEST decimal representation of
    the double (``repr`` in Python), not its exact binary expansion — rounded
    HALF_UP at ``digits`` decimals, back to the nearest double. Python's
    round()/np.round are half-EVEN — they differ on exact .5 digits
    (e.g. 32/4096 = 0.0078125 → 0.007813 vs 0.007812); Decimal(x) (exact
    binary) differs on shortest-repr halves (5e-07 → 1e-06 vs 0.0)."""
    if x is None or not math.isfinite(x):
        return x
    q = Decimal(repr(x)).quantize(Decimal(1).scaleb(-digits), rounding=ROUND_HALF_UP)
    return float(q)


def _write(out_dir: str, name: str, rows: list[dict], schema: pa.Schema) -> None:
    pq.write_table(
        pa.Table.from_pylist(rows, schema=schema),
        os.path.join(out_dir, f"{name}.parquet"),
    )


# ---------------------------------------------------------------------------
# cube-shaped fixtures (flagship + angle planes) — from the NumPy oracle
# ---------------------------------------------------------------------------

_CUBE_SCHEMA = pa.schema(
    [
        ("solar_day", pa.string()),
        ("band", pa.string()),
        ("tile_y", pa.int32()),
        ("tile_x", pa.int32()),
        ("n_scenes", pa.int32()),
        ("item_ids", pa.string()),
        ("valid_frac", pa.float64()),
    ]
)


def _cube_rows(sdir: str, grid: GridSpec, time_range, bands, with_lineage: bool):
    ocube = oracle.build_cube_numpy(sdir, grid, time_range=time_range, bands=bands)
    rows = []
    for (day, band, ty, tx), tile in ocube.tiles.items():
        r = {
            "solar_day": day,
            "band": band,
            "tile_y": ty,
            "tile_x": tx,
            "n_scenes": len(ocube.lineage[(day, band, ty, tx)]),
            "valid_frac": round_half_up(float(np.isfinite(tile).mean()), 6),
        }
        if with_lineage:
            r["item_ids"] = ",".join(ocube.lineage[(day, band, ty, tx)])
        rows.append(r)
    return ocube, rows


def _fx_cube_build(sdir: str, out_dir: str, grid: GridSpec) -> None:
    _, rows = _cube_rows(sdir, grid, TIME_RANGE, CUBE_BANDS, with_lineage=True)
    _write(out_dir, "cube_build", rows, _CUBE_SCHEMA)


def _fx_angles_cube(sdir: str, out_dir: str, grid: GridSpec) -> None:
    _, rows = _cube_rows(sdir, grid, ANGLE_TIME_RANGE, ANGLE_BANDS, with_lineage=False)
    schema = pa.schema([f for f in _CUBE_SCHEMA if f.name != "item_ids"])
    _write(out_dir, "angles_cube", rows, schema)


# ---------------------------------------------------------------------------
# image stats — single-process decode of every image row
# ---------------------------------------------------------------------------

_STATS_SCHEMA = pa.schema(
    [
        ("image_id", pa.string()),
        ("fmt", pa.string()),
        ("mean", pa.float64()),
        ("std", pa.float64()),
        ("phash_hamming", pa.int32()),
    ]
)


_THUMB_SCHEMA = pa.schema(
    [
        ("image_id", pa.string()),
        ("tw", pa.int32()),
        ("th", pa.int32()),
        ("thumb_md5", pa.string()),
    ]
)

_FRAME_SCHEMA = pa.schema(
    [
        ("video_id", pa.string()),
        ("frame_idx", pa.int32()),
        ("src_frame", pa.int32()),
        ("t_sec", pa.float64()),
        ("frame_mean", pa.float64()),
        ("frame_std", pa.float64()),
    ]
)


def _fx_image_stats(sdir: str, out_dir: str) -> None:
    """Single-process decode of every image: stats + pHash verify, plus the
    thumbnail-digest fixture (same decode pass)."""
    import hashlib

    images = pq.read_table(os.path.join(sdir, "images.parquet")).to_pandas()
    rows, trows = [], []
    for r in images.itertuples(index=False):
        img = codecs.decode(bytes(r.bytes), r.fmt, int(r.w), int(r.h)).astype(np.float64)
        ph = codecs.phash64_any(img)
        rows.append(
            {
                "image_id": r.image_id,
                "fmt": r.fmt,
                "mean": round_half_up(float(img.mean()), 3),
                "std": round_half_up(float(img.std()), 3),
                "phash_hamming": bin(ph ^ int(r.phash)).count("1"),
            }
        )
        # block-mean thumbnail, identical math to multimodal.thumbnails
        # (channel-major; gray = 1-channel stack, RGB keeps 3 channels)
        arr = img if img.ndim == 3 else img[None]
        ch, h, w = arr.shape
        pad_h, pad_w = (-h) % THUMB_H, (-w) % THUMB_W
        padded = np.pad(arr, ((0, 0), (0, pad_h), (0, pad_w)), mode="edge")
        small = padded.reshape(
            ch, THUMB_H, padded.shape[1] // THUMB_H, THUMB_W, padded.shape[2] // THUMB_W
        ).mean(axis=(2, 4))
        thumb = np.round(small).astype(np.uint16).tobytes()
        trows.append(
            {
                "image_id": r.image_id,
                "tw": THUMB_W,
                "th": THUMB_H,
                "thumb_md5": hashlib.md5(thumb).hexdigest(),
            }
        )
    _write(out_dir, "image_stats", rows, _STATS_SCHEMA)
    _write(out_dir, "thumbnails", trows, _THUMB_SCHEMA)


def _fx_video_frames(sf: str, sdir: str, out_dir: str) -> None:
    """Independent mirror of multimodal.frame_sample over the video table,
    per container:

    * AVI — a SEPARATE sequential RIFF walker (plain movi-list scan, NOT
      codecs.parse_avi whose offsets come from the idx1 index), so the
      engine's index-seek path is cross-checked against chunk order;
    * MP4 — frame payloads recovered by slicing the mdat blob with
      CUMULATIVE stsz sizes (the engine's parse_mp4 uses the stco
      absolute-offset table instead — two different derivations of the
      same frame boundaries);
    * MKV — an independently-written minimal EBML scanner (flat varint
      walk collecting SimpleBlocks; fps from DefaultDuration).

    Frame pixels decode through the baseline-JPEG codec, which is
    independently oracled by the image fixtures (stored-pHash checks) and
    PSNR tests."""
    import struct as _s

    from xcube_stac_spark import synth as synth_mod

    def avi_payloads(data):
        payloads = []
        fps = None

        def walk(pos, end):
            nonlocal fps
            while pos + 8 <= end:
                tag = data[pos : pos + 4]
                (size,) = _s.unpack("<I", data[pos + 4 : pos + 8])
                if tag == b"LIST":
                    walk(pos + 12, pos + 8 + size)
                elif tag == b"00dc":
                    payloads.append(data[pos + 8 : pos + 8 + size])
                elif tag == b"strh" and data[pos + 8 : pos + 12] == b"vids":
                    scale, rate = _s.unpack("<II", data[pos + 28 : pos + 36])
                    fps = rate / max(1, scale)
                pos += 8 + size + (size & 1)

        walk(12, len(data))
        return payloads, fps

    def mp4_payloads(data):
        # flat box scan for mdat extent; recursive scan for stsz/mdhd/stts
        sizes = []
        mdat = None
        timescale = delta0 = None

        def walk(pos, end):
            nonlocal mdat, sizes, timescale, delta0
            while pos + 8 <= end:
                (size,) = _s.unpack(">I", data[pos : pos + 4])
                tag = data[pos + 4 : pos + 8]
                if tag in (b"moov", b"trak", b"mdia", b"minf", b"stbl"):
                    walk(pos + 8, pos + size)
                elif tag == b"mdat":
                    mdat = (pos + 8, pos + size)
                elif tag == b"stsz":
                    uniform, count = _s.unpack(">II", data[pos + 12 : pos + 20])
                    sizes = (
                        [uniform] * count
                        if uniform
                        else list(
                            _s.unpack(
                                f">{count}I", data[pos + 20 : pos + 20 + 4 * count]
                            )
                        )
                    )
                elif tag == b"mdhd":
                    (timescale,) = _s.unpack(">I", data[pos + 20 : pos + 24])
                elif tag == b"stts":
                    _, delta0 = _s.unpack(">II", data[pos + 16 : pos + 24])
                pos += size

        walk(0, len(data))
        assert mdat is not None and sizes and timescale and delta0
        payloads = []
        pos = mdat[0]
        for sz in sizes:
            payloads.append(data[pos : pos + sz])
            pos += sz
        assert pos == mdat[1], "stsz sizes must exactly tile the mdat blob"
        return payloads, timescale / delta0

    def mkv_payloads(data):
        def vint(pos, keep):
            first = data[pos]
            n = 8 - first.bit_length() + 1
            v = int.from_bytes(data[pos : pos + n], "big")
            if not keep:
                v &= (1 << (7 * n)) - 1
            return v, pos + n

        payloads = []
        fps = None
        stack = [(0, len(data))]
        while stack:
            pos, end = stack.pop()
            while pos < end:
                eid, p = vint(pos, True)
                size, p = vint(p, False)
                if eid in (0x18538067, 0x1654AE6B, 0xAE, 0x1F43B675):
                    stack.append((p + size, end))
                    pos, end = p, p + size
                    continue
                if eid == 0x23E383:
                    fps = 1e9 / int.from_bytes(data[p : p + size], "big")
                elif eid == 0xA3:
                    _, bp = vint(p, False)
                    payloads.append(data[bp + 3 : p + size])
                pos = p + size
        return payloads, round(fps, 6)

    vpath = synth_mod.ensure_video(sf, out_root=os.path.dirname(sdir))
    rows = []
    for r in pq.read_table(vpath).to_pylist():
        data = r["bytes"]
        if data[:4] == b"RIFF":
            payloads, fps = avi_payloads(data)
        elif data[:4] == b"\x1a\x45\xdf\xa3":
            payloads, fps = mkv_payloads(data)
        else:
            payloads, fps = mp4_payloads(data)
        assert len(payloads) == r["n_frames"] and fps is not None
        k = min(N_FRAMES, len(payloads))
        idxs = np.unique(np.linspace(0, len(payloads) - 1, k).astype(int))
        for j, src in enumerate(idxs):
            lum = codecs.luma(codecs.decode_jpeg(payloads[int(src)]))
            rows.append(
                {
                    "video_id": r["video_id"],
                    "frame_idx": int(j),
                    "src_frame": int(src),
                    "t_sec": round_half_up(float(src) / fps, 6),
                    "frame_mean": round_half_up(float(lum.mean()), 6),
                    "frame_std": round_half_up(float(lum.std()), 6),
                }
            )
    _write(out_dir, "video_frames", rows, _FRAME_SCHEMA)


# ---------------------------------------------------------------------------
# UV clip — TPS relative bbox per searched scene
# ---------------------------------------------------------------------------

_UV_SCHEMA = pa.schema(
    [
        ("item_id", pa.string()),
        ("hit", pa.bool_()),
        ("u0", pa.float64()),
        ("v0", pa.float64()),
        ("u1", pa.float64()),
        ("v1", pa.float64()),
    ]
)


def _fx_uv_clip(sdir: str, out_dir: str) -> None:
    scenes = pq.read_table(os.path.join(sdir, "scenes.parquet")).to_pandas()
    searched = oracle.search_scenes_pandas(scenes, time_range=TIME_RANGE)
    rows = []
    for r in searched.itertuples(index=False):
        lons = np.array([p["lon"] for p in r.footprint])
        lats = np.array([p["lat"] for p in r.footprint])
        rel = geom.find_relative_bbox(
            lons, lats, list(REGION), descending=(r.orbit_state == "descending")
        )
        if rel is None:
            u0 = v0 = u1 = v1 = 0.0
            hit = False
        else:
            u0, v0, u1, v1 = rel
            hit = True
        rows.append(
            {
                "item_id": r.item_id,
                "hit": hit,
                "u0": round_half_up(u0, 6),
                "v0": round_half_up(v0, 6),
                "u1": round_half_up(u1, 6),
                "v1": round_half_up(v1, 6),
            }
        )
    _write(out_dir, "uv_clip", rows, _UV_SCHEMA)


# ---------------------------------------------------------------------------
# swath fixtures (orthorectify / rectify) — from the deterministic granules
# ---------------------------------------------------------------------------

_ORTHO_SCHEMA = pa.schema(
    [
        ("item_id", pa.string()),
        ("rows", pa.int32()),
        ("cols", pa.int32()),
        ("lon_mean", pa.float64()),
        ("lat_mean", pa.float64()),
    ]
)

_RECTIFY_SCHEMA = pa.schema(
    [
        ("item_id", pa.string()),
        ("var", pa.string()),
        ("tile_y", pa.int32()),
        ("tile_x", pa.int32()),
        ("valid", pa.int32()),
    ]
)

# the rectify_swath query's fixed target grid (mirrored in __spark_entry__)
RECTIFY_GRID = dict(
    crs="EPSG:4326", x0=11.0, y0=50.5, res=0.02, width=80, height=70,
    tile_w=40, tile_h=35,
)


def _fx_orthorectify(out_dir: str) -> None:
    """INDEPENDENT parallax recomputation (does not call the engine's
    operators/swath kernels): ground shift elev*tan(zenith) decomposed by
    azimuth on the reference's spherical earth R=6370997 m
    (constants.py:65, correction math sen3.py:631-662)."""
    deg = math.pi / 180.0
    m_per_deg = math.pi * 6370997.0 / 180.0
    rows = []
    for s in synth.swath_rows():
        shp = (s["rows"], s["cols"])
        lon = np.frombuffer(s["lon"], np.float64).reshape(shp)
        lat = np.frombuffer(s["lat"], np.float64).reshape(shp)
        elev = np.frombuffer(s["elev"], np.float64).reshape(shp)
        zen = np.frombuffer(s["zenith"], np.float64).reshape(shp)
        azi = np.frombuffer(s["azimuth"], np.float64).reshape(shp)
        shift = elev * np.tan(zen * deg)
        lat2 = lat + shift * np.cos(azi * deg) / m_per_deg
        lon2 = lon + shift * np.sin(azi * deg) / m_per_deg / np.cos(lat * deg)
        rows.append(
            {
                "item_id": s["item_id"],
                "rows": shp[0],
                "cols": shp[1],
                "lon_mean": round_half_up(float(lon2.mean()), 6),
                "lat_mean": round_half_up(float(lat2.mean()), 6),
            }
        )
    _write(out_dir, "orthorectify", rows, _ORTHO_SCHEMA)


def _fx_rectify_swath(out_dir: str) -> None:
    """INDEPENDENT nearest-source rectification (different structure than
    the engine's sort-descending-then-overwrite kernel): per target cell,
    a grouped first-match after lexsort on (cell, distance, reverse input
    order) — same semantics incl. the tie-break (equal distances keep the
    LATEST input pixel), arrived at by selection instead of overwriting."""
    g = GridSpec(**RECTIFY_GRID)
    rows = []
    for s in synth.swath_rows():
        shp = (s["rows"], s["cols"])
        lon = np.frombuffer(s["lon"], np.float64).reshape(shp).ravel()
        lat = np.frombuffer(s["lat"], np.float64).reshape(shp).ravel()
        val = np.frombuffer(s["values"], np.float32).reshape(shp).ravel()
        gc = np.floor((lon - g.x0) / g.res).astype(np.int64)
        gr = np.floor((g.y0 - lat) / g.res).astype(np.int64)
        ok = (gc >= 0) & (gc < g.width) & (gr >= 0) & (gr < g.height)
        if not ok.any():
            continue
        gc, gr, lon_s, lat_s, val_s = gc[ok], gr[ok], lon[ok], lat[ok], val[ok]
        cx = g.x0 + (gc + 0.5) * g.res
        cy = g.y0 - (gr + 0.5) * g.res
        d2 = (lon_s - cx) ** 2 + (lat_s - cy) ** 2
        flat = gr * g.width + gc
        order = np.lexsort((-np.arange(len(flat)), d2, flat))
        fs = flat[order]
        first = np.ones(len(fs), bool)
        first[1:] = fs[1:] != fs[:-1]
        plane = np.full(g.width * g.height, np.nan, np.float32)
        plane[fs[first]] = val_s[order][first]
        plane = plane.reshape(g.height, g.width)
        for ty in range(g.n_tiles_y):
            for tx in range(g.n_tiles_x):
                rs, cs = g.tile_shape(tx, ty)
                sub = plane[ty * g.tile_h : ty * g.tile_h + rs, tx * g.tile_w : tx * g.tile_w + cs]
                nv = int(np.isfinite(sub).sum())
                if nv:
                    rows.append(
                        {
                            "item_id": s["item_id"],
                            "var": s["var"],
                            "tile_y": ty,
                            "tile_x": tx,
                            "valid": nv,
                        }
                    )
    _write(out_dir, "rectify_swath", rows, _RECTIFY_SCHEMA)


# ---------------------------------------------------------------------------
# pyramid — canvas-based NumPy recomputation (independent of the engine's
# per-tile groupBy structure)
# ---------------------------------------------------------------------------

_PYR_SCHEMA = pa.schema(
    [
        ("level", pa.int32()),
        ("n_tiles", pa.int64()),
        ("avg_valid_frac", pa.float64()),
    ]
)


def _halve_canvas(c: np.ndarray) -> np.ndarray:
    h, w = c.shape
    blocks = c.reshape(h // 2, 2, w // 2, 2)
    with np.errstate(invalid="ignore"), warnings.catch_warnings():
        warnings.simplefilter("ignore", RuntimeWarning)  # all-NaN blocks
        return np.nanmean(blocks, axis=(1, 3)).astype(np.float32)


def _pyramid_level_fracs(
    sdir: str, grid: GridSpec, time_range, bands, levels: int
) -> dict[tuple[str, int], list[float]]:
    """Whole-canvas pyramid recomputation: stitch each (day, band)'s oracle
    tiles onto a NaN canvas padded to tile multiples, nanmean-halve the
    canvas per level, track tile existence as parent-of-existing-children.
    Tile sizes are even so canvas 2x2 blocks never straddle engine tile
    boundaries — the engine's per-tile quadrant assembly computes identical
    planes. Returns {(band, level): [valid_frac per existing tile]}."""
    ocube = oracle.build_cube_numpy(sdir, grid, time_range=time_range, bands=bands)
    groups: dict[tuple, dict] = {}
    for (day, band, ty, tx), tile in ocube.tiles.items():
        groups.setdefault((day, band), {})[(ty, tx)] = tile

    out: dict[tuple[str, int], list[float]] = {}
    for (_, band), tiles_d in groups.items():
        g = grid
        canvas = np.full(
            (g.n_tiles_y * g.tile_h, g.n_tiles_x * g.tile_w), np.nan, np.float32
        )
        exist = set()
        for (ty, tx), tile in tiles_d.items():
            r, c = tile.shape
            canvas[ty * g.tile_h : ty * g.tile_h + r, tx * g.tile_w : tx * g.tile_w + c] = tile
            exist.add((ty, tx))
        for lv in range(levels + 1):
            if lv > 0:
                halved = _halve_canvas(canvas)
                g = g.coarsen()
                exist = {(ty // 2, tx // 2) for ty, tx in exist}
                canvas = np.full(
                    (g.n_tiles_y * g.tile_h, g.n_tiles_x * g.tile_w), np.nan, np.float32
                )
                canvas[: halved.shape[0], : halved.shape[1]] = halved
            fr = out.setdefault((band, lv), [])
            for ty, tx in exist:
                rs, cs = g.tile_shape(tx, ty)
                sub = canvas[
                    ty * g.tile_h : ty * g.tile_h + rs, tx * g.tile_w : tx * g.tile_w + cs
                ]
                fr.append(float(np.isfinite(sub).mean()))
    return out


def _avg4(v: list[float]) -> float:
    return round_half_up(float(np.sum(np.asarray(v, np.float64)) / len(v)), 4)


def _fx_pyramid(sdir: str, out_dir: str, grid: GridSpec) -> None:
    fracs = _pyramid_level_fracs(sdir, grid, PYR_TIME_RANGE, PYR_BANDS, PYR_LEVELS)
    per_level: dict[int, list[float]] = {}
    for (_, lv), v in fracs.items():
        per_level.setdefault(lv, []).extend(v)
    rows = [
        {"level": lv, "n_tiles": len(v), "avg_valid_frac": _avg4(v)}
        for lv, v in sorted(per_level.items())
        if v
    ]
    _write(out_dir, "pyramid", rows, _PYR_SCHEMA)


_PYR_COMBINED_SCHEMA = pa.schema(
    [
        ("level", pa.int32()),
        ("band", pa.string()),
        ("n_tiles", pa.int64()),
        ("avg_valid_frac", pa.float64()),
    ]
)


def _fx_pyramid_combined(sdir: str, out_dir: str, grid: GridSpec) -> None:
    """CombinedMultiLevelDataset oracle: the combination of the B02 pyramid,
    the VZA pyramid and a DUPLICATE B02 pyramid equals (per (level, band))
    the union of the two distinct pyramids — collisions keep the first."""
    fracs = _pyramid_level_fracs(
        sdir, grid, PYR_TIME_RANGE, COMBINED_PYR_BANDS, PYR_LEVELS
    )
    rows = [
        {"level": lv, "band": band, "n_tiles": len(v), "avg_valid_frac": _avg4(v)}
        for (band, lv), v in sorted(fracs.items(), key=lambda kv: (kv[0][1], kv[0][0]))
        if v
    ]
    _write(out_dir, "pyramid_combined", rows, _PYR_COMBINED_SCHEMA)


# ---------------------------------------------------------------------------
# entry point
# ---------------------------------------------------------------------------


_IVF_SCHEMA = pa.schema(
    [
        ("query_id", pa.int64()),
        ("vec_id", pa.int64()),
        ("cos_sim", pa.float64()),
        ("rank", pa.int32()),
    ]
)

_CLUSTER_SCHEMA = pa.schema(
    [
        ("vec_id", pa.int64()),
        ("cluster", pa.int32()),
    ]
)


def _fx_ann_ivf(sf: str, out_dir: str) -> None:
    """Independent NumPy replica of ann.ivf_topk over the driver embeddings
    table: same md5-ordered bounded training sample, same first-min L2
    assignment, same HALF_UP-rounded per-dim means (absorbing
    summation-order differences), same stable-sort probe and
    (cos desc, vec_id) ranking. Skipped when the driver table is absent
    (bare checkout)."""
    import hashlib

    from xcube_stac_spark.operators.ann import (
        IVF_ITERS, IVF_K, IVF_NPROBE, IVF_TRAIN_SAMPLE,
    )

    path = os.path.join(
        os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata"), sf, "embeddings.parquet"
    )
    if not os.path.exists(path):
        return
    t = pq.read_table(path)
    ids = np.asarray(t["vec_id"].to_pylist(), dtype=np.int64)
    V = np.asarray(t["embedding"].to_pylist(), dtype=np.float64)
    order = sorted(range(len(ids)), key=lambda i: hashlib.md5(str(int(ids[i])).encode()).hexdigest())
    S = V[order[:IVF_TRAIN_SAMPLE]]  # md5-ordered bounded training sample
    C = S[:IVF_K].copy()
    for _ in range(IVF_ITERS):
        d = ((S[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        a = np.argmin(d, axis=1)
        for c in range(IVF_K):
            members = S[a == c]
            if len(members):
                C[c] = [round_half_up(float(x), 6) for x in members.mean(axis=0)]
    d = ((V[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
    final_assign = np.argmin(d, axis=1)
    # embedding_clusters fixture: the full-corpus assignment itself (the
    # k-means document-clustering query) — same codebook, same first-min
    # tie-break as the engine's _ivf_assign_udf
    _write(
        out_dir,
        "embedding_clusters",
        [
            {"vec_id": int(ids[i]), "cluster": int(final_assign[i])}
            for i in range(len(ids))
        ],
        _CLUSTER_SCHEMA,
    )

    rows: list[dict] = []
    for q in IVF_QUERY_IDS:
        qv = V[ids == q][0]
        probe = set(
            np.argsort(((C - qv) ** 2).sum(axis=1), kind="stable")[:IVF_NPROBE].tolist()
        )
        scored = []
        for i in range(len(ids)):
            if final_assign[i] not in probe or ids[i] == q:
                continue
            cos = float(np.dot(V[i], qv) / (np.linalg.norm(V[i]) * np.linalg.norm(qv)))
            scored.append((int(ids[i]), round_half_up(cos, 6)))
        scored.sort(key=lambda s: (-s[1], s[0]))
        for rank, (vid, cos) in enumerate(scored[:IVF_TOPK_K], start=1):
            rows.append(dict(query_id=int(q), vec_id=vid, cos_sim=cos, rank=rank))
    _write(out_dir, "ann_ivf_topk", rows, _IVF_SCHEMA)


def _audio_pcm(i: int, sr: int) -> np.ndarray:
    """Ground-truth PCM of synth audio clip ``i`` — the exact generation
    recipe of synth.ensure_audio, recomputed independently of any codec.
    Used as the oracle signal for FLAC rows (no stdlib FLAC parser
    exists): the engine's decode must reproduce this bit-exactly or the
    fixture mismatches."""
    rng = np.random.default_rng(700_000 + i)
    n = int(sr * (0.5 + 1.5 * ((i * 37) % 16) / 15.0))
    t = np.arange(n) / sr
    f0 = 80.0 + 40.0 * (i % 11)
    sig = (
        0.55 * np.sin(2 * np.pi * f0 * t)
        + 0.25 * np.sin(2 * np.pi * 2.7 * f0 * t + 0.3 * i)
        + 0.1 * rng.standard_normal(n)
    )
    return np.clip(np.round(sig * 12000.0), -32768, 32767).astype(np.int16)


def _fx_audio_features(sf: str, sdir: str, out_dir: str) -> None:
    """Independent mirror of multimodal.audio_features: WAV/AIFF rows are
    parsed with the STDLIB modules (``wave`` / ``aifc`` — not the engine's
    codecs), so container parsing itself is cross-checked; FLAC rows (no
    stdlib parser) use the recomputed GROUND-TRUTH signal (_audio_pcm), the
    strongest oracle a lossless codec admits — any decode deviation
    mismatches. Then the identical feature math (duration, RMS, peak,
    zero-crossing rate)."""
    import io
    import warnings
    import wave

    from xcube_stac_spark import synth as synth_mod

    with warnings.catch_warnings():
        warnings.simplefilter("ignore", DeprecationWarning)
        import aifc

    apath = synth_mod.ensure_audio(sf, out_root=os.path.dirname(sdir))
    t = pq.read_table(apath)
    rows = []
    for r in t.to_pylist():
        if r["bytes"][:4] == b"RIFF":
            with wave.open(io.BytesIO(r["bytes"])) as w:
                assert w.getnchannels() == 1 and w.getsampwidth() == 2
                sr = w.getframerate()
                samples = np.frombuffer(w.readframes(w.getnframes()), dtype="<i2")
        elif r["bytes"][:4] == b"fLaC":
            sr = int(r["sr"])
            samples = _audio_pcm(int(r["audio_id"][3:]), sr)
            assert len(samples) == int(r["n_samples"])
        else:
            with aifc.open(io.BytesIO(r["bytes"])) as a:
                assert a.getnchannels() == 1 and a.getsampwidth() == 2
                sr = a.getframerate()
                samples = np.frombuffer(
                    a.readframes(a.getnframes()), dtype=">i2"
                ).astype("<i2")
        x = samples.astype(np.float64)
        rows.append(
            {
                "audio_id": r["audio_id"],
                "sr": sr,
                "n_samples": len(samples),
                "duration_sec": round_half_up(len(samples) / sr, 6),
                "rms": round_half_up(float(np.sqrt(np.mean(x * x))), 6),
                "peak": int(np.max(np.abs(samples.astype(np.int32)))),
                "zcr": round_half_up(
                    float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1]))), 6
                ),
            }
        )
    _write(
        out_dir,
        "audio_features",
        rows,
        pa.schema(
            [
                ("audio_id", pa.string()),
                ("sr", pa.int32()),
                ("n_samples", pa.int32()),
                ("duration_sec", pa.float64()),
                ("rms", pa.float64()),
                ("peak", pa.int32()),
                ("zcr", pa.float64()),
            ]
        ),
    )


def ensure_fixtures(sf: str, force: bool = False) -> str:
    """Generate (or reuse) the fixture parquet set for one scale factor.
    Returns the fixtures directory. Cached via a marker keyed on BOTH the
    fixture version and the synth-data version, so regenerating the
    synthetic tables invalidates golden answers computed from old data."""
    sdir = synth.generate(sf)
    out_dir = os.path.join(sdir, "fixtures")
    marker = os.path.join(out_dir, "_SUCCESS")
    # _fx_ann_ivf skips silently on checkouts without the driver embeddings
    # table; tag that in the stamp so a later run WITH the table regenerates
    # instead of serving the partial set as complete
    emb_path = os.path.join(
        os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata"), sf, "embeddings.parquet"
    )
    # audio/video tables have their OWN version markers (they regenerate
    # without a SYNTH_VERSION bump), so their versions must be in the stamp
    # or their fixtures would serve stale answers after a table change
    stamp = (
        f"{FIXTURE_VERSION}:{synth.SYNTH_VERSION}"
        f":a{synth.AUDIO_VERSION}v{synth.VIDEO_VERSION}"
    ) + ("" if os.path.exists(emb_path) else ":no-embeddings")
    if not force and os.path.exists(marker):
        with open(marker) as f:
            if f.read().strip() == stamp:
                return out_dir
    os.makedirs(out_dir, exist_ok=True)
    grid = synth.default_grid(sf)
    _fx_cube_build(sdir, out_dir, grid)
    _fx_angles_cube(sdir, out_dir, grid)
    _fx_image_stats(sdir, out_dir)
    _fx_uv_clip(sdir, out_dir)
    _fx_orthorectify(out_dir)
    _fx_rectify_swath(out_dir)
    _fx_pyramid(sdir, out_dir, grid)
    _fx_pyramid_combined(sdir, out_dir, grid)
    _fx_ann_ivf(sf, out_dir)
    _fx_audio_features(sf, sdir, out_dir)
    _fx_video_frames(sf, sdir, out_dir)
    with open(marker, "w") as f:
        f.write(stamp)
    return out_dir


if __name__ == "__main__":
    import sys

    for sf in sys.argv[1:] or ["sf0.001", "sf0.01"]:
        print(sf, "->", ensure_fixtures(sf, force=True))
