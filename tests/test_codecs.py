import numpy as np
import pytest

from xcube_stac_spark import codecs


def _img(h=64, w=48, seed=42):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    img = 2000 + 30 * np.sin(xx / 7.0) * np.cos(yy / 9.0) + 5 * xx + 3 * yy
    img += rng.normal(0, 4, size=(h, w))
    return np.clip(img, 0, 65535).astype(np.uint16)


def test_raw_roundtrip():
    img = _img()
    data = codecs.encode(img, "raw")
    out = codecs.decode(data, "raw", img.shape[1], img.shape[0])
    np.testing.assert_array_equal(img, out)


def test_png_roundtrip_lossless():
    img = _img()
    data = codecs.encode(img, "png")
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    out = codecs.decode(data, "png", img.shape[1], img.shape[0])
    np.testing.assert_array_equal(img, out)


def test_png_decoder_handles_all_filters():
    # build a tiny 8-bit PNG by hand with each filter type per row and check
    # the decoder reconstructs it (encode path only emits filter 0)
    import struct
    import zlib

    h, w = 5, 4
    img = (np.arange(h * w, dtype=np.uint8).reshape(h, w) * 7 + 3).astype(np.uint8)
    lines = []
    prev = np.zeros(w, np.uint8)
    for r, f in zip(range(h), [0, 1, 2, 3, 4]):
        cur = img[r]
        if f == 0:
            enc = cur.copy()
        elif f == 1:
            enc = np.zeros(w, np.uint8)
            for i in range(w):
                a = cur[i - 1] if i >= 1 else 0
                enc[i] = np.uint8(int(cur[i]) - int(a))
        elif f == 2:
            enc = (cur.astype(np.int32) - prev).astype(np.uint8)
        elif f == 3:
            enc = np.zeros(w, np.uint8)
            for i in range(w):
                a = cur[i - 1] if i >= 1 else 0
                enc[i] = np.uint8(int(cur[i]) - ((int(a) + int(prev[i])) >> 1))
        else:
            enc = np.zeros(w, np.uint8)
            for i in range(w):
                a = int(cur[i - 1]) if i >= 1 else 0
                b = int(prev[i])
                c = int(prev[i - 1]) if i >= 1 else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                enc[i] = np.uint8(int(cur[i]) - pred)
        lines.append(bytes([f]) + enc.tobytes())
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    data = (
        codecs._PNG_SIG
        + codecs._chunk(b"IHDR", ihdr)
        + codecs._chunk(b"IDAT", zlib.compress(b"".join(lines)))
        + codecs._chunk(b"IEND", b"")
    )
    out = codecs.decode_png(data)
    np.testing.assert_array_equal(out, img.astype(np.uint16))


def test_lossy_psnr_above_40db():
    img = _img(128, 128)
    data = codecs.encode(img, "lossy")
    out = codecs.decode(data, "lossy", 128, 128)
    assert out.shape == img.shape
    # PSNR relative to actual dynamic range of the content
    peak = float(img.max())
    p = codecs.psnr(img, out, peak=peak)
    assert p >= 40.0, f"PSNR {p:.1f} < 40 dB"


def test_lossy_deterministic():
    img = _img(64, 64, seed=1)
    assert codecs.encode(img, "lossy") == codecs.encode(img, "lossy")


def test_lossy_nonsquare_and_ragged():
    img = _img(50, 37)
    out = codecs.decode(codecs.encode(img, "lossy"), "lossy", 37, 50)
    assert out.shape == (50, 37)


def test_phash_stability_across_codecs():
    img = _img(64, 64)
    h_raw = codecs.phash64(img)
    png = codecs.decode(codecs.encode(img, "png"), "png", 64, 64)
    assert codecs.phash64(png) == h_raw
    lossy = codecs.decode(codecs.encode(img, "lossy"), "lossy", 64, 64)
    # hamming distance small for lossy
    ham = bin(h_raw ^ codecs.phash64(lossy)).count("1")
    assert ham <= 6
    assert 0 <= h_raw < 2**63


def test_phash_distinguishes_content():
    a = codecs.phash64(_img(64, 64, seed=1))
    b = codecs.phash64(_img(64, 64, seed=2))
    # noise differs but structure same → some distance yet not required huge;
    # structurally different image must differ a lot
    rng = np.random.default_rng(9)
    c = codecs.phash64(rng.integers(0, 65535, (64, 64)).astype(np.uint16))
    assert bin(a ^ c).count("1") > 10


def test_jpeg_roundtrip_psnr_and_shapes():
    """Baseline JPEG: spec-structured stream (SOI/DQT/SOF0/DHT/SOS/EOI),
    shape-preserving decode incl. non-multiple-of-8 edges, PSNR >= 40 dB on
    synthetic-like content (8-bit mapping + quality-90 quantization)."""
    rng = np.random.default_rng(7)
    for shape in [(64, 64), (23, 23), (61, 77)]:
        yy, xx = np.mgrid[0 : shape[0], 0 : shape[1]]
        img = np.clip(
            3000 + 800 * np.sin(xx / 9.0) + 400 * np.cos(yy / 13.0)
            + rng.normal(0, 20, shape),
            1, 65535,
        ).astype(np.uint16)
        data = codecs.encode_jpeg(img)
        assert data[:2] == b"\xff\xd8" and data[-2:] == b"\xff\xd9"
        assert b"\xff\xc0" in data and b"\xff\xc4" in data and b"\xff\xdb" in data
        dec = codecs.decode_jpeg(data)
        assert dec.shape == img.shape and dec.dtype == np.uint16
        assert codecs.psnr(img, dec) >= 40.0


def test_jpeg_rejects_non_baseline_and_garbage():
    import pytest as _pytest

    with _pytest.raises(ValueError, match="SOI"):
        codecs.decode_jpeg(b"not a jpeg")
    img = np.full((16, 16), 9000, np.uint16)
    data = bytearray(codecs.encode_jpeg(img))
    sof = data.find(b"\xff\xc0")
    data[sof + 1] = 0xC2  # rewrite SOF0 -> SOF2 (progressive)
    with _pytest.raises(ValueError, match="non-baseline"):
        codecs.decode_jpeg(bytes(data))


def test_jpeg_preserves_nodata_stripes():
    """The synth nodata convention (DN 0 stripes) survives the lossy
    roundtrip: stripe interiors stay exactly 0 after 8-bit mapping."""
    img = np.full((64, 64), 4000, np.uint16)
    img[:24] = 0
    dec = codecs.decode_jpeg(codecs.encode_jpeg(img))
    assert (dec[:20] == 0).all()  # away from the DCT-ringing boundary
    assert (dec[28:] > 3000).all()


def test_jpeg_accepts_fill_bytes_before_markers():
    """T.81 B.1.1.2: any number of 0xFF fill bytes may precede a marker;
    streams from other encoders use them for alignment."""
    img = np.full((16, 16), 9000, np.uint16)
    data = codecs.encode_jpeg(img)
    sof = data.find(b"\xff\xc0")
    padded = data[:sof] + b"\xff\xff\xff" + data[sof:]
    assert np.array_equal(codecs.decode_jpeg(padded), codecs.decode_jpeg(data))


def test_jpeg_midblock_truncation_raises_cleanly():
    """A stream cut mid-entropy-data must raise the explicit truncation
    error from ANY decode position (block start, AC loop, magnitude read) —
    never a numpy shape-mismatch ValueError."""
    import pytest as _pytest

    rng = np.random.default_rng(3)
    img = rng.integers(0, 65535, size=(48, 48), dtype=np.uint16)
    data = codecs.encode_jpeg(img)
    sos = data.find(b"\xff\xda")
    body_start = sos + 2 + int.from_bytes(data[sos + 2 : sos + 4], "big")
    for cut in range(body_start + 1, len(data) - 2, 7):
        with _pytest.raises(ValueError) as ei:
            codecs.decode_jpeg(data[:cut])
        assert "truncated" in str(ei.value) or "Huffman" in str(ei.value) or "AC run" in str(ei.value), (
            cut, str(ei.value))


def _mm_tiff(img: np.ndarray, rows_per_strip: int) -> bytes:
    """Minimal BIG-ENDIAN single/multi-strip grayscale TIFF for decode tests
    (the encoder only writes II, so MM coverage needs its own builder)."""
    import struct

    img = np.ascontiguousarray(img, dtype=">u2")
    h, w = img.shape
    strips = [img[r : r + rows_per_strip].tobytes() for r in range(0, h, rows_per_strip)]
    n = len(strips)
    offs, cnts, pos = [], [], 8
    for s in strips:
        offs.append(pos)
        cnts.append(len(s))
        pos += len(s)
    ifd_off = pos
    overflow_off = ifd_off + 2 + 9 * 12 + 4
    ent = lambda t, ty, c, vf: struct.pack(">HHI", t, ty, c) + vf
    sv = lambda v: struct.pack(">HH", v, 0)
    lv = lambda v: struct.pack(">I", v)
    overflow = b""
    if n == 1:
        off_f, cnt_f = lv(offs[0]), lv(cnts[0])
    else:
        off_f = lv(overflow_off)
        overflow += struct.pack(f">{n}I", *offs)
        cnt_f = lv(overflow_off + 4 * n)
        overflow += struct.pack(f">{n}I", *cnts)
    entries = [
        ent(256, 4, 1, lv(w)), ent(257, 4, 1, lv(h)), ent(258, 3, 1, sv(16)),
        ent(259, 3, 1, sv(1)), ent(262, 3, 1, sv(1)), ent(273, 4, n, off_f),
        ent(277, 3, 1, sv(1)), ent(278, 4, 1, lv(rows_per_strip)), ent(279, 4, n, cnt_f),
    ]
    ifd = struct.pack(">H", 9) + b"".join(entries) + struct.pack(">I", 0)
    return struct.pack(">2sHI", b"MM", 42, ifd_off) + b"".join(strips) + ifd + overflow


def test_tiff_roundtrip_lossless_multistrip():
    rng = np.random.default_rng(5)
    for h, w in [(64, 64), (37, 53), (1, 8), (200, 3)]:
        img = rng.integers(0, 65535, size=(h, w), dtype=np.uint16)
        data = codecs.encode_tiff(img)
        out = codecs.decode_tiff(data)
        np.testing.assert_array_equal(out, img)
        # explicit multi-strip and single-strip organizations
        for rps in (1, 5, h):
            out2 = codecs.decode_tiff(codecs.encode_tiff(img, rows_per_strip=rps))
            np.testing.assert_array_equal(out2, img)


def test_tiff_big_endian_decodes():
    rng = np.random.default_rng(6)
    img = rng.integers(0, 65535, size=(23, 17), dtype=np.uint16)
    for rps in (4, 23):
        np.testing.assert_array_equal(codecs.decode_tiff(_mm_tiff(img, rps)), img)


def test_tiff_rejects_unsupported_and_truncated():
    import pytest as _pytest

    img = np.full((8, 8), 1234, np.uint16)
    good = codecs.encode_tiff(img)
    with _pytest.raises(ValueError, match="byte-order"):
        codecs.decode_tiff(b"XX" + good[2:])
    with _pytest.raises(ValueError, match="truncated"):
        codecs.decode_tiff(good[: len(good) // 2])
    # compression flag != 1 → explicit unsupported error (entry order: tag 259
    # is the 4th entry; flip its SHORT value to 5=LZW)
    bad = bytearray(good)
    import struct

    (ifd_off,) = struct.unpack("<I", good[4:8])
    e_off = ifd_off + 2 + 3 * 12
    assert struct.unpack("<H", good[e_off : e_off + 2])[0] == 259
    bad[e_off + 8 : e_off + 10] = struct.pack("<H", 5)
    with _pytest.raises(ValueError, match="unsupported TIFF compression=5"):
        codecs.decode_tiff(bytes(bad))


def test_netcdf3_roundtrip_and_rejection():
    """CDF-1 classic container: bit-exact round trip across dtypes/shapes,
    and loud failures on malformed streams."""
    import pytest as _pytest

    rng = np.random.default_rng(4)
    vars_ = {
        "longitude_an": rng.uniform(-180, 180, (13, 7)),
        "LST": rng.uniform(200, 320, (13, 7)).astype(np.float32),
        "counts": rng.integers(-9, 9, (5,)).astype(np.int16),
        "flag": np.array(3, dtype=np.int32),
    }
    data = codecs.encode_netcdf3(vars_)
    assert data[:4] == b"CDF\x01"
    out = codecs.decode_netcdf3(data)
    assert set(out) == set(vars_)
    for k, v in vars_.items():
        np.testing.assert_array_equal(out[k], v)
        assert out[k].dtype == v.dtype
    with _pytest.raises(ValueError, match="not a NetCDF"):
        codecs.decode_netcdf3(b"HDF" + data[3:])
    with _pytest.raises(ValueError, match="truncated NetCDF"):
        codecs.decode_netcdf3(data[: len(data) // 2])


def test_wav_roundtrip_and_stdlib_parity():
    """RIFF/PCM16 WAV: bit-lossless round trip, and the container is a
    REAL wav — the stdlib wave module parses it identically."""
    import io
    import wave

    rng = np.random.default_rng(9)
    pcm = rng.integers(-32768, 32768, 5000).astype(np.int16)
    data = codecs.encode_wav(pcm, 4000)
    sr, out = codecs.decode_wav(data)
    assert sr == 4000
    np.testing.assert_array_equal(out, pcm)
    with wave.open(io.BytesIO(data)) as w:
        assert (w.getframerate(), w.getnchannels(), w.getsampwidth()) == (4000, 1, 2)
        np.testing.assert_array_equal(
            np.frombuffer(w.readframes(w.getnframes()), "<i2"), pcm
        )
    import pytest as _pytest

    with _pytest.raises(ValueError, match="RIFF"):
        codecs.decode_wav(b"nope" + data[4:])


def test_cog_roundtrip_tiled_deflate_predictor():
    """Tiled + DEFLATE + predictor-2 (the COG shape) is bit-lossless across
    edge-tile geometries, incl. images smaller than one tile."""
    rng = np.random.default_rng(7)
    for h, w in [(64, 64), (256, 256), (300, 517), (255, 257), (40, 24), (1, 1)]:
        img = rng.integers(0, 65536, size=(h, w), dtype=np.uint16)
        data = codecs.encode_cog(img)
        np.testing.assert_array_equal(codecs.decode_tiff(data), img)
    # explicit small tile size → many tiles incl. partial edge tiles
    img = rng.integers(0, 65536, size=(100, 75), dtype=np.uint16)
    np.testing.assert_array_equal(
        codecs.decode_tiff(codecs.encode_cog(img, tile_size=32)), img)


def test_cog_actually_compresses_smooth_content():
    y, x = np.mgrid[0:256, 0:256]
    smooth = (40 * y + 17 * x).astype(np.uint16)
    data = codecs.encode_cog(smooth)
    assert len(data) < smooth.nbytes // 4  # DEFLATE+predictor bites
    np.testing.assert_array_equal(codecs.decode_tiff(data), smooth)


def test_cog_is_tiled_and_deflate_on_the_wire():
    """The container really is tile-organized DEFLATE: tags 259=8, 317=2,
    322-325 present, and a strip decoder that only knew compression=1 would
    not parse the payload."""
    import struct as _s

    img = np.arange(256 * 256, dtype=np.uint16).reshape(256, 256)
    data = codecs.encode_cog(img, tile_size=128)
    (ifd_off,) = _s.unpack("<I", data[4:8])
    (n,) = _s.unpack("<H", data[ifd_off : ifd_off + 2])
    tags = {}
    for i in range(n):
        t, ty, c = _s.unpack("<HHI", data[ifd_off + 2 + i * 12 : ifd_off + 10 + i * 12])
        tags[t] = data[ifd_off + 10 + i * 12 : ifd_off + 14 + i * 12]
    assert _s.unpack("<HH", tags[259])[0] == 8      # DEFLATE
    assert _s.unpack("<HH", tags[317])[0] == 2      # predictor
    assert _s.unpack("<I", tags[322])[0] == 128     # TileWidth
    assert _s.unpack("<I", tags[323])[0] == 128     # TileLength
    assert 324 in tags and 325 in tags and 273 not in tags


def test_tiff_8bit_scales_like_jpeg_path():
    img8 = np.arange(64, dtype=np.uint8).reshape(8, 8)
    # hand-build an 8-bit II TIFF by patching BitsPerSample and payload
    import struct

    strips = img8.tobytes()
    ifd_off = 8 + len(strips)
    ent = lambda t, ty, c, vf: struct.pack("<HHI", t, ty, c) + vf
    sv = lambda v: struct.pack("<HH", v, 0)
    lv = lambda v: struct.pack("<I", v)
    entries = [
        ent(256, 4, 1, lv(8)), ent(257, 4, 1, lv(8)), ent(258, 3, 1, sv(8)),
        ent(259, 3, 1, sv(1)), ent(262, 3, 1, sv(1)), ent(273, 4, 1, lv(8)),
        ent(277, 3, 1, sv(1)), ent(278, 4, 1, lv(8)), ent(279, 4, 1, lv(len(strips))),
    ]
    ifd = struct.pack("<H", 9) + b"".join(entries) + struct.pack("<I", 0)
    data = struct.pack("<2sHI", b"II", 42, ifd_off) + strips + ifd
    out = codecs.decode_tiff(data)
    np.testing.assert_array_equal(out, img8.astype(np.uint16) * 257)


def test_cog_tile_dims_forced_to_multiple_of_16():
    """TIFF 6.0 §15: TileWidth/TileLength must be multiples of 16. A
    caller-supplied odd tile size is rounded down (never below 16) so
    external readers accept the file; roundtrip stays lossless."""
    import struct as _s

    rng = np.random.default_rng(23)
    img = rng.integers(0, 65536, size=(300, 517), dtype=np.uint16)
    for ts in (100, 17, 16, 250):
        data = codecs.encode_cog(img, tile_size=ts)
        (ifd_off,) = _s.unpack("<I", data[4:8])
        (n,) = _s.unpack("<H", data[ifd_off : ifd_off + 2])
        tags = {}
        for i in range(n):
            t, ty, c = _s.unpack(
                "<HHI", data[ifd_off + 2 + i * 12 : ifd_off + 10 + i * 12]
            )
            (v,) = _s.unpack(
                "<I", data[ifd_off + 10 + i * 12 : ifd_off + 14 + i * 12]
            )
            tags[t] = v
        assert tags[322] % 16 == 0 and tags[322] >= 16
        assert tags[323] % 16 == 0 and tags[323] >= 16
        np.testing.assert_array_equal(codecs.decode_tiff(data), img)


def _smooth_rgb(h, w, seed=0):
    yy, xx = np.mgrid[0:h, 0:w]
    rng = np.random.default_rng(seed)
    chans = []
    for c in range(3):
        plane = (
            28000 + 2500 * c
            + 8000 * np.sin(xx / (9.0 + c)) * np.cos(yy / 11.0)
            + rng.normal(0, 150, (h, w))
        )
        chans.append(np.clip(plane, 0, 65535))
    return np.stack(chans).astype(np.uint16)


def test_tiff_rgb_chunky_roundtrip():
    """spp=3 chunky TIFF (Photometric=2, BitsPerSample 16,16,16) is
    bit-lossless and returns channel-major (3, h, w), matching the PNG RGB
    convention; grayscale output stays byte-identical to before."""
    rng = np.random.default_rng(31)
    for h, w in [(64, 64), (33, 47), (1, 1), (100, 75)]:
        img = rng.integers(0, 65536, size=(3, h, w), dtype=np.uint16)
        out = codecs.decode_tiff(codecs.encode_tiff(img))
        assert out.shape == (3, h, w)
        np.testing.assert_array_equal(out, img)


def test_cog_rgb_roundtrip_with_predictor():
    """Color COG: tiled + DEFLATE + per-channel predictor-2 roundtrip, edge
    tiles included."""
    for h, w in [(64, 64), (300, 517), (40, 24)]:
        img = _smooth_rgb(h, w, seed=h)
        data = codecs.encode_cog(img, tile_size=32)
        np.testing.assert_array_equal(codecs.decode_tiff(data), img)
    # predictor + DEFLATE actually compress noise-free smooth color content
    yy, xx = np.mgrid[0:256, 0:256]
    img = np.stack(
        [(40 * yy + 17 * xx + 999 * c).astype(np.uint16) for c in range(3)]
    )
    assert len(codecs.encode_cog(img)) < img.nbytes // 4
    np.testing.assert_array_equal(codecs.decode_tiff(codecs.encode_cog(img)), img)


def test_jpeg_color_420_roundtrip_psnr():
    """YCbCr 4:2:0 baseline color JPEG: >= 40 dB on smooth content, exact
    shape back, and structurally a 3-component interleaved stream (SOF0
    ncomp=3 with Y sampling 0x22, two DQT tables)."""
    import struct as _s

    for h, w in [(64, 64), (100, 130), (33, 47), (16, 16)]:
        img = _smooth_rgb(h, w, seed=w)
        data = codecs.encode_jpeg(img)
        out = codecs.decode_jpeg(data)
        assert out.shape == (3, h, w)
        assert codecs.psnr(img, out) >= 40.0
    data = codecs.encode_jpeg(_smooth_rgb(64, 64))
    # walk markers: expect SOF0 with ncomp=3 and sampling 0x22/0x11/0x11
    pos = 2
    n_dqt = 0
    saw_sof = False
    while pos < len(data):
        marker = data[pos + 1]
        if marker == 0xDA:
            break
        (ln,) = _s.unpack(">H", data[pos + 2 : pos + 4])
        payload = data[pos + 4 : pos + 2 + ln]
        if marker == 0xDB:
            n_dqt += 1
        if marker == 0xC0:
            saw_sof = True
            assert payload[5] == 3
            assert [payload[7], payload[10], payload[13]] == [0x22, 0x11, 0x11]
        pos += 2 + ln
    assert saw_sof and n_dqt == 2


def test_jpeg_grayscale_bytes_unchanged_by_color_support():
    """The grayscale encoder emits the identical stream as before the color
    extension (single-component hot path untouched)."""
    rng = np.random.default_rng(41)
    img = rng.integers(0, 65536, size=(64, 96), dtype=np.uint16)
    data = codecs.encode_jpeg(img)
    # single component, luminance-only tables
    assert data[:2] == b"\xff\xd8"
    out = codecs.decode_jpeg(data)
    assert out.shape == (64, 96)
    assert codecs.psnr(img, out) > 0  # noisy content, just structural


def test_phash_any_stable_across_color_containers():
    """The luminance pHash of the same RGB content agrees across png (
    lossless), tiff, cog and is close for 4:2:0 jpeg."""
    img = _smooth_rgb(64, 64, seed=7)
    ph_ref = codecs.phash64_any(img)
    for fmt in ("png", "tiff", "cog"):
        dec = codecs.decode(codecs.encode(img, fmt), fmt, 64, 64)
        assert codecs.phash64_any(dec) == ph_ref, fmt
    dec_j = codecs.decode_jpeg(codecs.encode_jpeg(img))
    ham = bin(codecs.phash64_any(dec_j) ^ ph_ref).count("1")
    assert ham <= 6


def test_webp_vp8l_roundtrip_exact_for_8bit_content():
    """Pure-struct VP8L lossless subset: canonical prefix codes with
    code-length coding, LSB-first bit order, RIFF/WEBP container. Exact
    roundtrip for 8-bit-valued uint16 (x257) content, gray and color."""
    rng = np.random.default_rng(53)
    for shape in [(32, 32), (1, 1), (33, 47)]:
        v8 = rng.integers(0, 256, size=shape, dtype=np.uint16)
        img = v8 * np.uint16(257)
        out = codecs.decode_webp(codecs.encode_webp(img))
        assert out.shape == (3,) + shape
        for c in range(3):
            np.testing.assert_array_equal(out[c], img)
    v8 = rng.integers(0, 256, size=(3, 40, 56), dtype=np.uint16)
    img = v8 * np.uint16(257)
    np.testing.assert_array_equal(codecs.decode_webp(codecs.encode_webp(img)), img)
    # dispatch round-trips too
    np.testing.assert_array_equal(
        codecs.decode(codecs.encode(img, "webp"), "webp", 56, 40), img
    )


def test_webp_container_structure_and_subset_guards():
    import struct as _s

    img = (np.arange(32 * 32, dtype=np.uint16).reshape(32, 32) % 256) * 257
    data = codecs.encode_webp(img)
    assert data[:4] == b"RIFF" and data[8:12] == b"WEBP" and data[12:16] == b"VP8L"
    (riff_size,) = _s.unpack("<I", data[4:8])
    assert riff_size == len(data) - 8
    # VP8L payload starts with the 0x2f signature and 14-bit dims
    payload = data[20:]
    assert payload[0] == 0x2F
    with np.testing.assert_raises(ValueError):
        codecs.decode_webp(b"RIFF\x04\x00\x00\x00WEBP")
    with np.testing.assert_raises(ValueError):
        codecs.decode_webp(b"nope")


def test_webp_low_cardinality_uses_simple_codes_and_compresses():
    """1-2-symbol planes take the spec's simple-code form: a constant
    image is a few dozen bytes, not O(pixels)."""
    img = np.full((64, 64), 100 * 257, np.uint16)
    data = codecs.encode_webp(img)
    assert len(data) < 120, len(data)
    out = codecs.decode_webp(data)
    assert (out == 100 * 257).all()
    # two-valued plane
    img2 = np.where(np.arange(64 * 64).reshape(64, 64) % 3 == 0, 7, 200).astype(
        np.uint16
    ) * 257
    out2 = codecs.decode_webp(codecs.encode_webp(img2))
    np.testing.assert_array_equal(out2[0], img2)


def test_mp4_mjpeg_container_roundtrip_and_seek():
    """ISO-BMFF/MP4 with 'jpeg' samples: box-walk parse (stsd/stts/stsz/
    stco), O(1) frame seek equals the AVI path's decode of the same
    frames; sniff_video dispatches both containers."""
    yy, xx = np.mgrid[0:48, 0:64]

    def frame(i):
        return np.clip(
            20000 + 9000 * np.sin(xx / 7.0 + i * 0.5) * np.cos(yy / 9.0), 0, 65535
        ).astype(np.uint16)

    frames = [frame(i) for i in range(9)]
    mp4 = codecs.encode_mp4_mjpeg(frames, fps=6)
    assert mp4[4:8] == b"ftyp"
    meta = codecs.parse_mp4(mp4)
    assert (meta["n_frames"], meta["w"], meta["h"], meta["fps"]) == (9, 64, 48, 6.0)
    for i in (0, 4, 8):
        assert codecs.psnr(frames[i], codecs.decode_mp4_frame(mp4, i, meta)) >= 40
    # MJPEG samples are byte-identical across containers: frame seek from
    # either container decodes to the same pixels
    avi = codecs.encode_avi_mjpeg(frames, fps=6)
    assert codecs.sniff_video(mp4) == "mp4" and codecs.sniff_video(avi) == "avi"
    np.testing.assert_array_equal(
        codecs.decode_video_frame(mp4, 3), codecs.decode_video_frame(avi, 3)
    )
    # color clips flow too
    cframes = [np.stack([frame(i), frame(i + 1), frame(i + 2)]) for i in range(4)]
    d = codecs.decode_mp4_frame(codecs.encode_mp4_mjpeg(cframes, fps=3), 2)
    assert d.shape == (3, 48, 64) and codecs.psnr(cframes[2], d) >= 40
    with pytest.raises(ValueError):
        codecs.parse_mp4(b"\x00\x00\x00\x08nope")
    with pytest.raises(ValueError):
        codecs.sniff_video(b"garbage!")


def test_container_parsers_raise_only_valueerror_on_corruption():
    """Fuzz contract for every pure-struct container parser: truncation,
    byte flips and magic-preserving garbage must raise ValueError (or
    NotImplementedError for declared-unsupported features) — never a raw
    struct.error / KeyError / IndexError. A corrupt row in a 10^12-row
    corpus must fail a task with a diagnosable message, not a stack
    internals error."""
    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:24, 0:32]

    def frame(i):
        return np.clip(20000 + 9000 * np.sin(xx / 7.0 + i), 0, 65535).astype(
            np.uint16
        )

    samples = {
        "avi": (codecs.parse_avi, codecs.encode_avi_mjpeg([frame(i) for i in range(3)], fps=5)),
        "mp4": (codecs.parse_mp4, codecs.encode_mp4_mjpeg([frame(i) for i in range(3)], fps=5)),
        "webp": (codecs.decode_webp, codecs.encode_webp((frame(0) // 257) * 257)),
        "wav": (codecs.decode_wav, codecs.encode_wav(np.zeros(100, np.int16), 4000)),
        "nc": (codecs.decode_netcdf3, codecs.encode_netcdf3({"a": np.zeros((3, 4), np.float32)})),
        "mkv": (codecs.parse_mkv, codecs.encode_mkv_mjpeg([frame(i) for i in range(3)], fps=5)),
        "aiff": (codecs.decode_aiff, codecs.encode_aiff(np.zeros(100, np.int16), 4000)),
        "flac": (codecs.decode_flac, codecs.encode_flac(
            np.clip(np.round(9000 * np.sin(np.arange(600) / 9.0)), -32768, 32767).astype(np.int16), 4000
        )),
        # decode_jpeg is reachable through every video container's frame
        # slices (corrupt offsets hand it arbitrary byte ranges), so it is
        # bound to the same contract — incl. SOS-before-SOF (ADVICE r5)
        "jpeg": (codecs.decode_jpeg, codecs.encode_jpeg(frame(0))),
    }
    for name, (parse, data) in samples.items():
        for trial in range(300):
            kind = trial % 3
            if kind == 0:
                mutated = data[: int(rng.integers(0, len(data)))]
            elif kind == 1:
                m = bytearray(data)
                for _ in range(int(rng.integers(1, 8))):
                    m[int(rng.integers(0, len(m)))] = int(rng.integers(0, 256))
                mutated = bytes(m)
            else:
                mutated = data[:12] + bytes(
                    rng.integers(0, 256, int(rng.integers(0, 200))).astype(np.uint8)
                )
            try:
                parse(mutated)
            except (ValueError, NotImplementedError):
                pass  # the contract


def test_mkv_mjpeg_container_roundtrip_and_seek():
    """EBML/Matroska with V_MJPEG SimpleBlocks: metadata-only walk yields
    (fps, n_frames, w, h) + absolute frame offsets; seek decode equals the
    other containers' decode of the same frames."""
    yy, xx = np.mgrid[0:48, 0:64]

    def frame(i):
        return np.clip(
            20000 + 9000 * np.sin(xx / 7.0 + i * 0.5) * np.cos(yy / 9.0), 0, 65535
        ).astype(np.uint16)

    frames = [frame(i) for i in range(9)]
    for fps in (4, 6, 7, 30):
        mkv = codecs.encode_mkv_mjpeg(frames, fps=fps)
        meta = codecs.parse_mkv(mkv)
        assert (meta["n_frames"], meta["w"], meta["h"], meta["fps"]) == (9, 64, 48, float(fps))
    mkv = codecs.encode_mkv_mjpeg(frames, fps=6)
    assert codecs.sniff_video(mkv) == "mkv"
    avi = codecs.encode_avi_mjpeg(frames, fps=6)
    mp4 = codecs.encode_mp4_mjpeg(frames, fps=6)
    np.testing.assert_array_equal(
        codecs.decode_video_frame(mkv, 3), codecs.decode_video_frame(avi, 3)
    )
    np.testing.assert_array_equal(
        codecs.decode_video_frame(mkv, 3), codecs.decode_video_frame(mp4, 3)
    )
    cframes = [np.stack([frame(i), frame(i + 1), frame(i + 2)]) for i in range(4)]
    d = codecs.decode_video_frame(codecs.encode_mkv_mjpeg(cframes, fps=3), 2)
    assert d.shape == (3, 48, 64) and codecs.psnr(cframes[2], d) >= 40
    with pytest.raises(ValueError):
        codecs.parse_mkv(b"nope")


def test_aiff_roundtrip_and_stdlib_cross_check():
    """FORM/AIFF PCM16 mono: exact roundtrip (incl. the 80-bit extended
    sample-rate field at common rates), byte-level agreement with the
    stdlib aifc parser, and sniff dispatch next to WAV."""
    import io
    import warnings

    rng = np.random.default_rng(2)
    for n, sr in [(100, 4000), (1, 8000), (5555, 44100)]:
        s = rng.integers(-32768, 32768, n).astype(np.int16)
        data = codecs.encode_aiff(s, sr)
        r2, s2 = codecs.decode_aiff(data)
        assert r2 == sr
        np.testing.assert_array_equal(s2, s)
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            import aifc
            with aifc.open(io.BytesIO(data)) as a:
                assert a.getframerate() == sr
                np.testing.assert_array_equal(
                    np.frombuffer(a.readframes(a.getnframes()), ">i2").astype("<i2"),
                    s,
                )
    wav = codecs.encode_wav(s, sr)
    assert codecs.sniff_audio(wav) == "wav" and codecs.sniff_audio(data) == "aiff"
    np.testing.assert_array_equal(codecs.decode_audio(data)[1], s)
    # f80 edge values round-trip
    for x in (1.0, 4000.0, 44100.0, 96000.0, 0.0):
        assert codecs._f80_decode(codecs._f80_encode(x)) == x


def test_flac_roundtrip_crc_and_subset_rejection():
    """FLAC mono/16-bit subset: bit-exact lossless roundtrip across block
    boundaries and signal shapes, all three in-band integrity oracles fire
    on corruption (header CRC-8, frame CRC-16, STREAMINFO MD5), and
    out-of-subset features (stereo channel assignment) are rejected with
    ValueError rather than mis-decoded."""
    rng = np.random.default_rng(3)
    for n, sr in [(1, 4000), (4096, 44100), (4097, 8000), (9999, 4000)]:
        t = np.arange(n) / sr
        sig = 0.6 * np.sin(2 * np.pi * 180 * t) + 0.05 * rng.standard_normal(n)
        s = np.clip(np.round(sig * 9000), -32768, 32767).astype(np.int16)
        data = codecs.encode_flac(s, sr)
        r2, s2 = codecs.decode_flac(data)
        assert r2 == sr
        np.testing.assert_array_equal(s2, s)
    # constant + extreme-value blocks
    for s in [np.zeros(5000, np.int16), np.full(123, -32768, np.int16),
              np.array([32767, -32768] * 2048, np.int16)]:
        np.testing.assert_array_equal(codecs.decode_flac(codecs.encode_flac(s, 4000))[1], s)
    # compression is real on tonal content (not a raw container)
    t = np.arange(20000) / 8000
    tone = np.clip(np.round(9000 * np.sin(2 * np.pi * 200 * t)), -32768, 32767).astype(np.int16)
    enc = codecs.encode_flac(tone, 8000)
    assert len(enc) < 0.9 * 2 * len(tone)
    # CRC / MD5 integrity: flipping any of a spread of bytes must raise
    m = bytearray(enc)
    for off in (5, 30, len(m) // 2, len(m) - 3):
        m2 = bytearray(m)
        m2[off] ^= 0x40
        with pytest.raises(ValueError):
            codecs.decode_flac(bytes(m2))
    # stereo channel assignment (out of subset) -> ValueError, not garbage
    # (patch the STREAMINFO channels-1 field: byte 4+4+10 of the block,
    # bits ...rrrrrccc b: channels bits sit at bit offset 100 of STREAMINFO)
    si_off = 8  # fLaC + block header
    b = bytearray(enc)
    b[si_off + 12] |= 0x02  # channels-1: 0 -> 1 (20-bit sr ends mid-byte 12)
    with pytest.raises(ValueError):
        codecs.decode_flac(bytes(b))
    # dispatch
    assert codecs.sniff_audio(enc) == "flac"
    np.testing.assert_array_equal(codecs.decode_audio(enc)[1], tone)
