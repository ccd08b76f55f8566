"""ANN correctness vs NumPy + multimodal decode plumbing."""

import numpy as np
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry_mod
from xcube_stac_spark import codecs, synth
from xcube_stac_spark.operators import ann as ann_op
from xcube_stac_spark.operators import multimodal as mm_op
from xcube_stac_spark.sources.catalog import SceneCatalog

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def emb_np():
    t = pq.read_table(f"{SF_DIR}/embeddings.parquet").to_pandas()
    return t["vec_id"].to_numpy(), np.stack(t["embedding"].to_numpy()).astype(np.float64)


def test_brute_force_topk_matches_numpy(spark, emb_np):
    ids, M = emb_np
    q = M[ids == 0][0]
    cos = (M @ q) / (np.linalg.norm(M, axis=1) * np.linalg.norm(q))
    cos[ids == 0] = -np.inf
    exp_top = ids[np.argsort(-cos, kind="stable")[:10]].tolist()
    got = (
        entry_mod._q_ann_topk(spark, SF_DIR)
        .where(F.col("query_id") == 0)
        .orderBy("rank")
        .collect()
    )
    assert [r.vec_id for r in got] == exp_top


def _np_band_keys(M: np.ndarray, bands: int, bits: int) -> np.ndarray:
    """NumPy twin of ann.hyperplane_bands: keys[n, band]."""
    planes = np.array(ann_op.hyperplane_signs(bands, bits, M.shape[1]))  # (B, bits, D)
    dots = np.einsum("nd,bid->nbi", M, planes)
    return ((np.round(dots, 6) > 0) * (1 << np.arange(bits))).sum(axis=2)


def test_lsh_topk_matches_numpy_banded_candidates(spark, emb_np):
    ids, M = emb_np
    keys = _np_band_keys(M, ann_op.TOPK_BANDS, ann_op.TOPK_BITS)
    qk = keys[ids == 1][0]
    cand = (keys == qk).any(axis=1) & (ids != 1)
    cos = (M[cand] @ M[ids == 1][0]) / (
        np.linalg.norm(M[cand], axis=1) * np.linalg.norm(M[ids == 1][0])
    )
    order = np.argsort(-np.round(cos, 6), kind="stable")[:10]
    exp = ids[cand][order].tolist()
    got = (
        entry_mod._q_ann_lsh_topk(spark, SF_DIR)
        .where(F.col("query_id") == 1)
        .orderBy("rank")
        .collect()
    )
    assert [r.vec_id for r in got] == exp
    assert len(got) <= 10  # may be < k when the band buckets are sparse


def test_ivf_full_probe_equals_brute_force(spark):
    """nprobe == n_clusters degenerates IVF to exhaustive search: the result
    must equal brute_force_topk exactly (same scores, same tie-breaks) —
    the invariant that pins the probe/rank machinery independent of the
    codebook quality."""
    emb = entry_mod._emb(spark, SF_DIR).select("vec_id", "embedding")
    q = entry_mod._ann_queries_df(spark, SF_DIR)
    full = {
        (r.query_id, r.vec_id, r.cos_sim, r.rank)
        for r in ann_op.ivf_topk(emb, q, 10, n_clusters=4, nprobe=4, iters=2).collect()
    }
    brute = {
        (r.query_id, r.vec_id, r.cos_sim, r.rank)
        for r in ann_op.brute_force_topk(emb, q, 10).collect()
    }
    assert full == brute


def test_ivf_trainer_is_sample_based_and_deterministic(spark):
    """The codebook is a pure function of the md5-ordered bounded sample:
    (a) two trainings agree bit-for-bit with an independent NumPy replica
    over the same sample; (b) shrinking the sample below the corpus size
    changes only the training SET, not determinism; (c) k=None applies the
    sqrt(n) sizing rule."""
    import hashlib

    from xcube_stac_spark.fixtures import round_half_up

    emb = entry_mod._emb(spark, SF_DIR).select("vec_id", "embedding")
    rows = emb.collect()
    ids = np.asarray([r.vec_id for r in rows])
    V = np.asarray([list(r.embedding) for r in rows], np.float64)
    order = sorted(
        range(len(ids)),
        key=lambda i: hashlib.md5(str(int(ids[i])).encode()).hexdigest(),
    )
    for sample_size in (len(ids), 64):
        got = ann_op.ivf_train(emb, k=4, iters=2, sample_size=sample_size)
        S = V[order[:sample_size]]
        exp = ann_op._lloyd_numpy(S.copy(), 4, 2, 6)
        np.testing.assert_array_equal(got, exp)
    # sqrt(n) auto-k: 500 vectors -> k=22; clamped by sample_size//4
    assert ann_op.ivf_k_for(500) == 22
    assert ann_op.ivf_k_for(10**12) == ann_op.IVF_TRAIN_SAMPLE // 4
    assert ann_op.ivf_k_for(1) == 1
    auto = ann_op.ivf_train(emb, k=None, iters=1)
    assert auto.shape[0] == 22


def test_ivf_probe_subsets_and_recall(spark):
    """Partial probing returns a subset of clusters' candidates; recall of
    the true top-10 stays useful at nprobe=3/8 on this corpus."""
    emb = entry_mod._emb(spark, SF_DIR).select("vec_id", "embedding")
    q = entry_mod._ann_queries_df(spark, SF_DIR)
    ivf = ann_op.ivf_topk(emb, q, 10).collect()
    brute = ann_op.brute_force_topk(emb, q, 10).collect()
    truth = {(r.query_id, r.vec_id) for r in brute}
    got = {(r.query_id, r.vec_id) for r in ivf}
    recall = len(got & truth) / len(truth)
    assert recall >= 0.5, recall


def test_near_dup_banding_shrinks_candidates_and_keeps_recall(spark, emb_np):
    """The VERDICT-r01 scale fix: banded random-hyperplane LSH must cut the
    candidate set by orders of magnitude (≈2^bits per band for unrelated
    pairs) while keeping high recall on true near-duplicates."""
    ids, M = emb_np
    n = len(ids)
    # planted near-dups: every 10th vector, first 8 dims zeroed (the query's
    # augmentation), all with cosine >= 0.8 vs their source
    aug = entry_mod._aug_emb(spark, SF_DIR)
    n_aug = aug.count()
    total_pairs = n_aug * (n_aug - 1) // 2
    bk = ann_op.hyperplane_bands(
        aug, "vec_id", "embedding", ann_op.NEAR_BANDS, ann_op.NEAR_BITS
    )
    a, b = bk.alias("a"), bk.alias("b")
    n_cand = (
        a.join(b, ["band", "key"])
        .where(F.col("a.vec_id") < F.col("b.vec_id"))
        .select("a.vec_id", "b.vec_id")
        .distinct()
        .count()
    )
    # >= 20x shrink vs all-pairs on this clustered corpus (unrelated pairs
    # collide per band with ~p^12, p≈0.5-0.7)
    assert n_cand * 20 <= total_pairs, (n_cand, total_pairs)

    # recall: planted pairs at cos >= 0.9 must mostly survive the banding
    found = {
        (r.vec_a, r.vec_b)
        for r in entry_mod._q_ann_near_dup(spark, SF_DIR).collect()
    }
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    Mm = M.copy()
    Mm[:, :8] = 0.0
    Mm = Mm / np.linalg.norm(Mm, axis=1, keepdims=True)
    cos = (Mn * Mm).sum(axis=1)
    planted = {
        (int(i), int(i) + 100000)
        for i, c in zip(ids, cos)
        if i % 10 == 0 and round(c, 6) >= 0.9
    }
    assert planted, "corpus should plant near-dups above the threshold"
    recall = len(found & planted) / len(planted)
    assert recall >= 0.9, recall  # 16x12 banding: >= 0.9 even AT the boundary
    # and every reported pair really clears the exact-cosine threshold
    assert all(
        r.cos_sim >= entry_mod.ANN_NEAR_THRESHOLD
        for r in entry_mod._q_ann_near_dup(spark, SF_DIR).collect()
    )


def test_image_stats_matches_numpy(spark):
    sdir = synth.generate("sf0.001")
    cat = SceneCatalog(spark, sdir)
    stats = mm_op.image_stats(cat.images().limit(64)).collect()
    imgs = pq.read_table(f"{sdir}/images.parquet").to_pandas().set_index("image_id")
    assert stats
    for r in stats:
        row = imgs.loc[r.image_id]
        img = codecs.decode(bytes(row["bytes"]), row["fmt"], int(row["w"]), int(row["h"])).astype(np.float64)
        assert abs(r.mean - img.mean()) < 1e-9
        assert abs(r.std - img.std()) < 1e-9
        # the recomputed hash must equal the hash of the decoded pixels in
        # every format (the engine's phash_calc is correct); RGB rows hash
        # their luminance
        assert r.phash_calc == codecs.phash64_any(img), r.image_id
        if r.fmt in codecs.LOSSLESS:
            assert r.phash_hamming == 0, r.image_id
        elif r.fmt == "lossy":
            assert r.phash_hamming <= 6, r.image_id
        # jpeg: the 8-bit remap legitimately flips near-median pHash bits on
        # smooth synthetic gradients — value fidelity (PSNR) is asserted in
        # test_codecs instead


def test_thumbnails_block_mean(spark):
    sdir = synth.generate("sf0.001")
    cat = SceneCatalog(spark, sdir)
    one = cat.images().where(F.col("fmt") == "raw").limit(1)
    r = mm_op.thumbnails(one, tw=8, th=8).collect()[0]
    src = one.collect()[0]
    img = codecs.decode(bytes(src.bytes), src.fmt, src.w, src.h).astype(np.float64)
    exp = img.reshape(8, img.shape[0] // 8, 8, img.shape[1] // 8).mean(axis=(1, 3))
    got = np.frombuffer(r.thumb, dtype=np.uint16).reshape(8, 8)
    np.testing.assert_array_equal(got, np.round(exp).astype(np.uint16))


def test_frame_sample_real_video(spark):
    """frame_sample is a REAL video reader now: MJPEG clips in AVI or
    MP4, container-index seek, only sampled frames decoded. Sampled stats must equal a
    direct decode of the same source frames from the deterministic clip
    generator, for both grayscale and color clips."""
    synth.generate("sf0.001")
    videos = spark.read.parquet(synth.ensure_video("sf0.001"))
    sub = videos.orderBy("video_id").limit(6)
    rows = mm_op.frame_sample(sub, n_frames=4).collect()
    metas = {r.video_id: r for r in sub.collect()}
    assert set(metas) == {r.video_id for r in rows}
    import collections

    by = collections.Counter(r.video_id for r in rows)
    for vid, cnt in by.items():
        assert cnt == min(4, metas[vid].n_frames)
    for r in rows:
        i = int(r.video_id[3:])
        frames = synth.video_clip_frames(i)
        k = min(4, len(frames))
        idxs = np.unique(np.linspace(0, len(frames) - 1, k).astype(int))
        src = int(idxs[r.frame_idx])
        assert r.src_frame == src
        # decoded-frame stats vs the ORIGINAL frame: JPEG-lossy but close
        lum_orig = codecs.luma(frames[src])
        assert abs(r.frame_mean - lum_orig.mean()) < 200.0
        assert codecs.psnr(
            frames[src],
            codecs.decode_video_frame(bytes(metas[r.video_id].bytes), src),
        ) >= 40.0


def test_video_covers_gray_color_and_both_containers(spark):
    synth.generate("sf0.001")
    import pyarrow.parquet as pq2

    t = pq2.read_table(synth.ensure_video("sf0.001")).to_pylist()
    shapes, containers = set(), set()
    for r in t[:8]:
        containers.add(codecs.sniff_video(r["bytes"]))
        meta = codecs.parse_video(r["bytes"])
        assert meta["n_frames"] == r["n_frames"]
        shapes.add(codecs.decode_video_frame(r["bytes"], 0, meta).ndim)
    assert shapes == {2, 3}  # both grayscale and color clips in the table
    assert containers == {"avi", "mp4", "mkv"}  # all three containers


def test_lossy_rows_psnr_above_40db_vs_source():
    """North-rule lossy acceptance: decoded lossy pixels vs the ORIGINAL
    (regenerated deterministically) at PSNR >= 40 dB, per row."""
    import pyarrow.parquet as pq2

    from xcube_stac_spark import synth as synth_mod

    sdir = synth_mod.generate("sf0.01")
    p = synth_mod.PARAMS["sf0.01"]
    imgs = pq2.read_table(f"{sdir}/images.parquet").to_pandas()
    lossy = imgs[imgs.fmt == "lossy"]
    checked = 0
    for r in lossy.head(40).itertuples(index=False):
        item_id, band = r.image_id.split(":")
        # parse the deterministic id: S2{A|B}_T{zone}{tx}{ty}_{date}_{proc}
        parts = item_id.split("_")
        zti = parts[1]
        zone, tx, ty = int(zti[1:3]), int(zti[3]), int(zti[4])
        import datetime as dt

        day = (dt.date.fromisoformat(
            f"{parts[2][:4]}-{parts[2][4:6]}-{parts[2][6:]}") - synth_mod.BASE_DATE).days
        if band.startswith("V"):
            continue  # angle planes are raw
        bi = p.bands.index(band)
        second = item_id.startswith("S2B")
        src = synth_mod.scene_pixels(zone, tx, ty, bi, day, p, second)
        dec = codecs.decode(bytes(r.bytes), "lossy", r.w, r.h)
        val = src[src != 0]
        pk = float(val.max()) if val.size else 65535.0
        ps = codecs.psnr(src, dec, peak=pk)
        assert ps >= 40.0, (r.image_id, ps)
        checked += 1
    assert checked >= 30


def test_stubbed_formats_raise(spark):
    df = spark.createDataFrame(
        [("x", b"notanmp3", 4, 4, "mp3", 0)],
        "image_id string, bytes binary, w int, h int, fmt string, phash long",
    )
    with pytest.raises(Exception) as ei:
        mm_op.image_stats(df).collect()
    assert "NotImplementedError" in str(ei.value) or "external codec" in str(ei.value)


def test_webp_is_supported_not_stubbed(spark):
    """WebP decode is real now (pure-struct VP8L lossless subset): webp
    rows flow through image_stats' full Arrow path, stats and pHash match
    the source plane exactly for 8-bit-valued content."""
    assert "webp" in mm_op.SUPPORTED and "webp" not in mm_op.STUBBED
    yy, xx = np.mgrid[0:32, 0:40]
    v8 = ((yy * 5 + xx * 3) % 256).astype(np.uint16)
    img = np.stack([v8, (v8 + 17) % 256, (v8 + 91) % 256]).astype(np.uint16) * 257
    data = codecs.encode_webp(img)
    ph = codecs.phash64_any(img)
    df = spark.createDataFrame(
        [("w0", bytearray(data), 40, 32, "webp", int(ph))],
        "image_id string, bytes binary, w int, h int, fmt string, phash long",
    )
    rows = mm_op.image_stats(df).collect()
    assert len(rows) == 1 and rows[0].phash_hamming == 0
    assert abs(rows[0].mean - img.mean()) < 1e-9


def test_jpeg_is_supported_not_stubbed(spark):
    """Baseline JPEG decode is real now (pure-NumPy Huffman+IDCT): jpeg rows
    in the corpus decode through image_stats instead of raising."""
    assert "jpeg" in mm_op.SUPPORTED and "jpeg" not in mm_op.STUBBED
    yy, xx = np.mgrid[0:32, 0:32]
    img = (3000 + 800 * np.sin(xx / 5.0) + 600 * np.cos(yy / 7.0)).astype(np.uint16)
    data = codecs.encode_jpeg(img)
    df = spark.createDataFrame(
        [("j", bytearray(data), 32, 32, "jpeg", int(codecs.phash64(img)))],
        "image_id string, bytes binary, w int, h int, fmt string, phash long",
    )
    r = mm_op.image_stats(df).collect()[0]
    dec = codecs.decode_jpeg(data)
    assert r.mean == pytest.approx(float(dec.mean()))
    # value fidelity is the real check (pHash hamming is noisy on smooth
    # synthetic content whose low-freq DCT coeffs sit near the median)
    assert codecs.psnr(img, dec) >= 40.0


def test_near_dup_boundary_recall_meets_target():
    """SURVEY recall target: the NEAR_BANDS x NEAR_BITS defaults must catch
    >= 0.9 of pairs planted EXACTLY at the cos = 0.9 threshold, while random
    pairs collide in < 1% of band sets. Deterministic: md5 planes + seeded
    vectors; this is the same key spec the Spark exprs and DuckDB oracle
    evaluate (test_lsh_topk asserts that equivalence)."""
    rng = np.random.default_rng(42)
    dim, n = ann_op.EMB_DIM, 2000
    a = rng.normal(size=(n, dim))
    a /= np.linalg.norm(a, axis=1, keepdims=True)
    r = rng.normal(size=(n, dim))
    perp = r - np.sum(r * a, axis=1, keepdims=True) * a
    perp /= np.linalg.norm(perp, axis=1, keepdims=True)
    b = 0.9 * a + np.sqrt(1.0 - 0.81) * perp  # cos(a_i, b_i) = 0.9 exactly

    ka = _np_band_keys(a, ann_op.NEAR_BANDS, ann_op.NEAR_BITS)
    kb = _np_band_keys(b, ann_op.NEAR_BANDS, ann_op.NEAR_BITS)
    recall = (ka == kb).all(axis=-1).any(axis=-1).mean() if ka.ndim == 3 else (ka == kb).any(axis=1).mean()
    assert recall >= 0.9, recall
    # candidate bound: unrelated pairs (a_i vs b_j, i != j) almost never share
    # a band key — sample 20k random cross pairs
    i = rng.integers(0, n, 20000)
    j = rng.integers(0, n, 20000)
    keep = i != j
    collide = (ka[i[keep]] == kb[j[keep]]).any(axis=1).mean()
    assert collide < 0.01, collide


def test_band_layout_probe_prunes_partitions_and_matches_lsh(spark, tmp_path):
    """At-rest (band, key) layout: probe result == in-memory lsh_topk, and
    the probe's scan is PARTITION-PRUNED (PartitionFilters on band/key)."""
    import io
    from contextlib import redirect_stdout

    emb = entry_mod._emb(spark, SF_DIR)
    queries = entry_mod._ann_queries_df(spark, SF_DIR)
    path = str(tmp_path / "emb_layout")
    ann_op.write_band_layout(emb, path)
    got = ann_op.probe_band_layout(spark, path, queries, k=entry_mod.ANN_K)
    exp = ann_op.lsh_topk(emb, queries, k=entry_mod.ANN_K)
    key = lambda r: (r.query_id, r.rank)
    g = sorted(((r.query_id, r.rank, r.vec_id, r.cos_sim) for r in got.collect()))
    e = sorted(((r.query_id, r.rank, r.vec_id, r.cos_sim) for r in exp.collect()))
    assert g == e and g
    buf = io.StringIO()
    with redirect_stdout(buf):
        got.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan and "band" in plan
    # pruning is real: the scan must NOT read all bands*2^bits directories
    import re

    m = re.search(r"partitions read: (\d+)", plan)
    if m:  # formatted plans expose the pruned partition count
        n_meta = ann_op.read_band_layout_meta(path)
        assert int(m.group(1)) < n_meta["bands"] * (1 << n_meta["bits"])


def test_ivf_layout_probe_prunes_partitions_and_matches_ivf(spark, tmp_path):
    """At-rest cluster layout: probe result == in-memory ivf_topk, and the
    probe's scan is PARTITION-PRUNED (PartitionFilters on cluster)."""
    emb = entry_mod._emb(spark, SF_DIR).select("vec_id", "embedding")
    queries = entry_mod._ann_queries_df(spark, SF_DIR)
    path = str(tmp_path / "ivf_layout")
    ann_op.write_ivf_layout(emb, path)
    got = ann_op.probe_ivf_layout(spark, path, queries, k=entry_mod.ANN_K)
    exp = ann_op.ivf_topk(emb, queries, k=entry_mod.ANN_K)
    g = sorted(((r.query_id, r.rank, r.vec_id, r.cos_sim) for r in got.collect()))
    e = sorted(((r.query_id, r.rank, r.vec_id, r.cos_sim) for r in exp.collect()))
    assert g == e and g
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        got.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan and "cluster" in plan
    import re

    m = re.search(r"partitions read: (\d+)", plan)
    if m:
        # exactly the union of the queries' probed cells, never the full corpus
        import json
        import os

        with open(os.path.join(path, "_ivf_meta.json")) as f:
            C = np.asarray(json.load(f)["centroids"])
        probed = set()
        for r in queries.collect():
            qv = np.asarray(r.qvec, np.float64)
            d = ((C - qv) ** 2).sum(axis=1)
            probed |= set(np.argsort(d, kind="stable")[: ann_op.IVF_NPROBE].tolist())
        assert int(m.group(1)) == len(probed) <= ann_op.IVF_K


def test_rgb_rows_decode_channel_major_and_verify(spark):
    """RGB multimodal rows rotate over every color-capable container
    (png/tiff/cog lossless, jpeg 4:2:0 lossy, webp VP8L 8-bit-mapped), all
    channel-major (3,h,w): lossless rows keep luminance-pHash hamming 0,
    jpeg/webp rows stay close; thumbnails carry 3 channels."""
    sdir = synth.generate("sf0.001")
    cat = SceneCatalog(spark, sdir)
    rgb = cat.images().where(F.col("image_id").startswith("RGB"))
    rows = rgb.orderBy("image_id").limit(5).collect()
    assert rows, "synth corpus must include RGB rows"
    assert {r.fmt for r in rows} == {"png", "tiff", "cog", "jpeg", "webp"}
    decoded = codecs.decode(bytes(rows[0].bytes), rows[0].fmt, rows[0].w, rows[0].h)
    assert decoded.ndim == 3 and decoded.shape[0] == 3
    stats = mm_op.image_stats(rgb).collect()
    assert stats
    for r in stats:
        if r.fmt in codecs.LOSSLESS:
            assert r.phash_hamming == 0, (r.image_id, r.fmt, r.phash_hamming)
        else:
            # 32x32 noisy content through 4:2:0 is the worst pHash case;
            # still far under the ~32-bit expectation for unrelated images
            assert r.phash_hamming <= 16, (r.image_id, r.fmt, r.phash_hamming)
    by_id = {r.image_id: r for r in stats}
    img = decoded.astype(np.float64)
    np.testing.assert_allclose(by_id[rows[0].image_id].mean, img.mean())
    np.testing.assert_allclose(by_id[rows[0].image_id].std, img.std())
    t = mm_op.thumbnails(rgb.limit(1), tw=8, th=8).collect()[0]
    thumb = np.frombuffer(t.thumb, np.uint16)
    assert thumb.size == 3 * 8 * 8  # three channels, channel-major
    # channel 0 of the thumb equals the block-mean of channel 0
    c0 = img[0]
    exp0 = c0.reshape(8, c0.shape[0] // 8, 8, c0.shape[1] // 8).mean(axis=(1, 3))
    np.testing.assert_array_equal(
        thumb.reshape(3, 8, 8)[0], np.round(exp0).astype(np.uint16)
    )


def test_tiff_is_supported_and_in_corpus(spark):
    """Uncompressed-strip TIFF is a first-class decode path now: corpus rows
    carry fmt='tiff' (the synth mix) and image_stats decodes them LOSSLESSLY
    (phash_hamming == 0, mean exact vs the raw DN plane)."""
    assert "tiff" in mm_op.SUPPORTED and "tiff" not in mm_op.STUBBED
    imgs = SceneCatalog(spark, synth.generate("sf0.01")).images()
    tiff_rows = mm_op.image_stats(imgs.where(F.col("fmt") == "tiff")).collect()
    assert tiff_rows, "synth corpus must include tiff payloads"
    assert all(r.phash_hamming == 0 for r in tiff_rows)


def test_assign_l2_chunked_is_bit_identical():
    """The Lloyd assignment step chunks its rows (the full (n,k,dim)
    broadcast tensor is ~4 GB at trainer defaults); chunked argmin must be
    BIT-identical to the one-shot tensor, including first-min tie-breaks."""
    rng = np.random.default_rng(11)
    V = rng.normal(size=(37, 5))
    C = V[:6].copy()
    V[20] = C[3]  # exact tie candidate
    V[21] = C[3]
    full = np.argmin(((V[:, None, :] - C[None, :, :]) ** 2).sum(axis=2), axis=1)
    for chunk in (1, 3, 16, 37, 1000):
        np.testing.assert_array_equal(ann_op._assign_l2(V, C, chunk=chunk), full)
    # default chunk sizing stays bounded for the trainer defaults
    assert ann_op._assign_l2(V, C) is not None


def test_band_and_ivf_layout_append(spark, tmp_path):
    """Incremental ANN layouts: base write + append of a held-out slice ==
    probe results of a single full write (same deterministic hyperplanes /
    codebook); pre-existing partition FILES are untouched by the append."""
    import glob
    import os

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    base = emb.where(F.col("vec_id") % 5 != 0)
    extra = emb.where(F.col("vec_id") % 5 == 0)
    queries = (
        emb.where(F.col("vec_id").isin([0, 1, 2]))
        .select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec"))
    )

    full_p, inc_p = str(tmp_path / "band_full"), str(tmp_path / "band_inc")
    ann_op.write_band_layout(emb, full_p, bands=4, bits=8)
    ann_op.write_band_layout(base, inc_p, bands=4, bits=8)
    pre_files = {
        f: os.path.getmtime(f)
        for f in glob.glob(os.path.join(inc_p, "band=*", "key=*", "*.parquet"))
    }
    ann_op.append_band_layout(extra, inc_p)
    for f, m in pre_files.items():
        assert os.path.getmtime(f) == m, f"append rewrote {f}"
    k = lambda df: {
        (r.query_id, r.vec_id, r.cos_sim, r.rank) for r in df.collect()
    }
    assert k(ann_op.probe_band_layout(spark, inc_p, queries, k=5)) == k(
        ann_op.probe_band_layout(spark, full_p, queries, k=5)
    )

    ivf_full, ivf_inc = str(tmp_path / "ivf_full"), str(tmp_path / "ivf_inc")
    ann_op.write_ivf_layout(emb, ivf_full, n_clusters=8)
    # incremental: train on the FULL corpus semantics is the generational
    # rebuild; here base-trained codebook + appended vectors must equal a
    # full write that used the same codebook — pin by copying the meta
    ann_op.write_ivf_layout(base, ivf_inc, n_clusters=8)
    import json

    with open(os.path.join(ivf_inc, "_ivf_meta.json")) as f:
        C_inc = json.load(f)["centroids"]
    pre = {
        f: os.path.getmtime(f)
        for f in glob.glob(os.path.join(ivf_inc, "cluster=*", "*.parquet"))
    }
    ann_op.append_ivf_layout(extra, ivf_inc)
    for f, m in pre.items():
        assert os.path.getmtime(f) == m
    # probe the incremental layout with full nprobe == n_clusters: result
    # must equal brute-force cosine top-k over the whole corpus
    got = k(ann_op.probe_ivf_layout(spark, ivf_inc, queries, k=5, nprobe=8))
    want = k(ann_op.brute_force_topk(emb, queries, k=5))
    assert got == want
    assert C_inc  # meta survived the append


def test_band_and_ivf_layout_compact(spark, tmp_path):
    """Generational compaction for the ANN layouts (mirrors
    compact_scene_layout): folding an append-accumulated layout into a new
    generation keeps the probe row-identical, never rewrites the source
    generation's files (atomic switch-by-path, no in-place rewrite), does
    not lose the codebook/hyperplane meta, reduces (or holds) the per-
    partition file count, and preserves the append manifest for audit."""
    import glob
    import json
    import os

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    base = emb.where(F.col("vec_id") % 5 != 0)
    extra = emb.where(F.col("vec_id") % 5 == 0)
    queries = (
        emb.where(F.col("vec_id").isin([0, 1, 2]))
        .select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec"))
    )
    k = lambda df: {(r.query_id, r.vec_id, r.cos_sim, r.rank) for r in df.collect()}

    band_p, band_g2 = str(tmp_path / "band"), str(tmp_path / "band_gen2")
    ann_op.write_band_layout(base, band_p, bands=4, bits=8)
    ann_op.append_band_layout(extra, band_p)
    want_band = k(ann_op.probe_band_layout(spark, band_p, queries, k=5))
    src_files = {
        f: os.path.getmtime(f)
        for f in glob.glob(os.path.join(band_p, "band=*", "key=*", "*.parquet"))
    }
    ann_op.compact_band_layout(spark, band_p, band_g2)
    for f, m in src_files.items():
        assert os.path.getmtime(f) == m, f"compaction rewrote source file {f}"
    assert k(ann_op.probe_band_layout(spark, band_g2, queries, k=5)) == want_band
    assert ann_op.read_band_layout_meta(band_g2) == ann_op.read_band_layout_meta(band_p)
    assert os.path.exists(os.path.join(band_g2, "_appends_compacted.jsonl"))
    # per-partition file count shrinks back to one file set
    def max_files(root, pat):
        dirs = glob.glob(os.path.join(root, pat))
        return max((len(glob.glob(os.path.join(d, "*.parquet"))) for d in dirs), default=0)

    assert max_files(band_g2, "band=*/key=*") <= max_files(band_p, "band=*/key=*")

    ivf_p, ivf_g2 = str(tmp_path / "ivf"), str(tmp_path / "ivf_gen2")
    ann_op.write_ivf_layout(base, ivf_p, n_clusters=8)
    ann_op.append_ivf_layout(extra, ivf_p)
    want_ivf = k(ann_op.probe_ivf_layout(spark, ivf_p, queries, k=5, nprobe=8))
    src_files = {
        f: os.path.getmtime(f)
        for f in glob.glob(os.path.join(ivf_p, "cluster=*", "*.parquet"))
    }
    ann_op.compact_ivf_layout(spark, ivf_p, ivf_g2)
    for f, m in src_files.items():
        assert os.path.getmtime(f) == m, f"compaction rewrote source file {f}"
    assert k(ann_op.probe_ivf_layout(spark, ivf_g2, queries, k=5, nprobe=8)) == want_ivf
    with open(os.path.join(ivf_p, "_ivf_meta.json")) as f:
        m_src = json.load(f)
    with open(os.path.join(ivf_g2, "_ivf_meta.json")) as f:
        m_dst = json.load(f)
    assert m_src == m_dst  # codebook carried over verbatim, no retrain
    assert os.path.exists(os.path.join(ivf_g2, "_appends_compacted.jsonl"))
    assert max_files(ivf_g2, "cluster=*") <= max_files(ivf_p, "cluster=*")


def test_scene_layout_append_and_compact(spark, tmp_path):
    """Incremental spatial layout: base + appended later days == full
    rebuild under the probe; old partition files untouched; compaction
    into a new generation preserves the probe and reduces file count."""
    import glob
    import os

    import __spark_entry__ as em

    sdir = synth.generate("sf0.01")
    scenes = SceneCatalog(spark, sdir).scenes()
    t = F.coalesce(F.col("datetime"), F.col("start_datetime"))
    base = scenes.where(F.dayofmonth(t) % 2 == 0)
    later = scenes.where(F.dayofmonth(t) % 2 == 1)
    assert base.count() > 0 and later.count() > 0

    from xcube_stac_spark.operators import spatial as sp

    full_p, inc_p = str(tmp_path / "sl_full"), str(tmp_path / "sl_inc")
    sp.write_scene_layout(scenes, full_p)
    sp.write_scene_layout(base, inc_p)
    pre = {
        f: os.path.getmtime(f)
        for f in glob.glob(os.path.join(inc_p, "pcell=*", "*.parquet"))
    }
    sp.append_scene_layout(later, inc_p)
    for f, m in pre.items():
        assert os.path.getmtime(f) == m, f"append rewrote {f}"
    key = lambda df: {(r.item_id, r.tile_id) for r in df.collect()}
    region, tr = em.REGION, em.TIME_RANGE
    want = key(sp.probe_scene_layout(spark, full_p, region, time_range=tr))
    assert key(sp.probe_scene_layout(spark, inc_p, region, time_range=tr)) == want
    # manifest recorded the batch
    with open(os.path.join(inc_p, "_appends.jsonl")) as f:
        assert sum(1 for _ in f) == 1
    # compact into a new generation: same probe, fewer files per partition
    gen2 = str(tmp_path / "sl_gen2")
    sp.compact_scene_layout(spark, inc_p, gen2)
    assert key(sp.probe_scene_layout(spark, gen2, region, time_range=tr)) == want
    n_inc = len(glob.glob(os.path.join(inc_p, "pcell=*", "*.parquet")))
    n_gen2 = len(glob.glob(os.path.join(gen2, "pcell=*", "*.parquet")))
    assert n_gen2 <= n_inc


def test_sq8_quantized_topk_recall_and_types(spark):
    """SQ8 scalar quantization (the 4-8x memory/IO lever for 10^12-vector
    serving): int8 storage type on the wire, NumPy-exact quantization rule,
    and >= 0.9 recall@10 of the exact-float top-10 when ranking runs
    entirely on the int8 representation."""
    emb = entry_mod._emb(spark, SF_DIR).select("vec_id", "embedding")
    q = entry_mod._ann_queries_df(spark, SF_DIR)
    quant = ann_op.sq8_quantize(emb)
    # storage really is int8 + one float scale
    dt = dict(quant.dtypes)
    assert dt["qvec8"] == "array<tinyint>" and dt["qscale"] == "float"
    # NumPy twin of the quantization rule (HALF-even round like F.round? —
    # F.round is HALF_UP; verify against the exact column values instead)
    r = quant.orderBy("vec_id").first()
    v = np.asarray(r.embedding, np.float64)
    mx = max(np.abs(v).max(), 1e-30)
    x = v * 127.0 / mx
    exp = (np.sign(x) * np.floor(np.abs(x) + 0.5)).astype(np.int8)  # HALF_UP
    np.testing.assert_array_equal(np.asarray(r.qvec8, np.int8), exp)
    assert abs(r.qscale - mx / 127.0) < 1e-9

    got = ann_op.sq8_topk(quant, q, k=10).collect()
    exact = ann_op.brute_force_topk(emb, q, k=10).collect()
    truth = {(r.query_id, r.vec_id) for r in exact}
    pred = {(r.query_id, r.vec_id) for r in got}
    recall = len(pred & truth) / len(truth)
    assert recall >= 0.9, recall


def test_image_near_dup_collapse_and_banding(spark):
    """Exact-phash groups collapse to one representative before pairing
    (a 3-image identical cluster yields NO intra-cluster pairs, one row
    against a 2-bit-flipped variant); pairs beyond max_hamming are
    dropped; a hamming-4 flip confined to one band is still found."""
    from xcube_stac_spark.operators import multimodal as mm

    base = 0x123456789ABCDEF0
    rows = [
        ("a1", base), ("a2", base), ("a3", base),      # identical cluster
        ("b1", base ^ 0b11),                            # hamming 2, band 0
        ("c1", base ^ 0xF),                             # hamming 4, band 0
        ("d1", base ^ 0x1111),                          # hamming 4, band 0 (bits 0,4,8,12)
        # hamming 4 spread across all 4 bands -> no colliding band, dropped
        ("e1", (base ^ (1 << 63) ^ (1 << 1) ^ (1 << 17) ^ (1 << 33)) - (1 << 64)),
        ("f1", base ^ 0x3F),                            # hamming 6 > max: verified out
    ]
    df = spark.createDataFrame(rows, "image_id string, phash long")
    out = mm.image_near_dup(df, max_hamming=4).collect()
    pairs = {(r.rep_a, r.rep_b): r for r in out}
    # representative of the identical cluster is min image_id, size 3
    assert ("a1", "b1") in pairs or ("b1", "a1") in pairs
    key = ("a1", "b1") if ("a1", "b1") in pairs else ("b1", "a1")
    assert pairs[key].hamming == 2
    assert {pairs[key].n_a, pairs[key].n_b} == {3, 1}
    got = {frozenset(k) for k in pairs}
    assert frozenset({"a1", "c1"}) in got and frozenset({"a1", "d1"}) in got
    # all-bands spread (e1) has no colliding band with ANY variant
    assert not any("e1" in k for k in got)
    # hamming-6 vs the base cluster fails verify (f1 still pairs with the
    # nearer variants c1/b1 — hamming 2/4 — which is correct)
    assert frozenset({"a1", "f1"}) not in got
    assert pairs[("c1", "f1") if ("c1", "f1") in pairs else ("f1", "c1")].hamming == 2


def test_pq_adc_topk_recall_compression_and_determinism(spark):
    """Product quantization (the 32x at-rest lever past SQ8's 4x): codes
    are m=8 single bytes, ADC+exact-refine recall@10 >= 0.9 vs the float
    brute force, codebooks deterministic across invocations, and every
    code addresses a real codebook row."""
    emb = entry_mod._emb(spark, SF_DIR).select("vec_id", "embedding")
    q = entry_mod._ann_queries_df(spark, SF_DIR)
    C = ann_op.pq_train(emb)
    C2 = ann_op.pq_train(emb)
    np.testing.assert_array_equal(C, C2)
    assert C.shape == (ann_op.PQ_M, ann_op.PQ_KSUB, ann_op.EMB_DIM // ann_op.PQ_M)

    enc = ann_op.pq_encode(emb, C)
    assert dict(enc.dtypes)["pq_code"] == "array<tinyint>"
    import pyspark.sql.functions as SF
    mx = enc.select(SF.array_max("pq_code").alias("m"), SF.array_min("pq_code").alias("n")).agg(
        SF.max("m"), SF.min("n")).first()
    # codes are zero-point-offset by -128 so ksub=256 fits signed tinyint:
    # stored value s addresses codebook row s+128, which must be in [0, ksub)
    assert 0 <= mx[1] + 128 and mx[0] + 128 < ann_op.PQ_KSUB

    got = ann_op.pq_topk(enc, q, C, k=10, refine=4).collect()
    exact = ann_op.brute_force_topk(emb, q, k=10).collect()
    truth = {(r.query_id, r.vec_id) for r in exact}
    pred = {(r.query_id, r.vec_id) for r in got}
    recall = len(pred & truth) / len(truth)
    assert recall >= 0.9, recall


def test_ivfpq_full_probe_equals_brute_force_and_recall(spark):
    """IVFADC (coarse cells + residual PQ + ADC + exact refine): at full
    probe with a corpus-covering shortlist the result must EQUAL brute
    force row-for-row (refine restores exact ranking once coverage is
    total); at serving defaults (nprobe=3 of 8 cells) recall@10 must be
    AT LEAST plain IVF's at the same nprobe — the residual-PQ + exact-
    refine tier may not lose recall vs the coarse ceiling (measured: both
    0.767 on this corpus) — with an absolute floor of 0.75; build is
    deterministic and codes address real codebook rows."""
    emb = entry_mod._emb(spark, SF_DIR).select("vec_id", "embedding")
    q = entry_mod._ann_queries_df(spark, SF_DIR)
    n = emb.count()

    built = ann_op.ivfpq_build(emb)
    built2 = ann_op.ivfpq_build(emb)
    np.testing.assert_array_equal(built[0], built2[0])
    np.testing.assert_array_equal(built[1], built2[1])
    enc = built[2]
    assert dict(enc.dtypes)["pq_code"] == "array<tinyint>"
    import pyspark.sql.functions as SF
    rng = enc.select(
        SF.max(SF.array_max("pq_code")).alias("mx"),
        SF.min(SF.array_min("pq_code")).alias("mn"),
        SF.countDistinct("cluster").alias("nc"),
    ).first()
    assert 0 <= rng.mn + 128 and rng.mx + 128 < ann_op.PQ_KSUB
    assert 1 <= rng.nc <= ann_op.IVF_K

    # full probe + corpus-covering shortlist == exact brute force
    full = ann_op.ivfpq_topk(
        emb, q, k=10, nprobe=ann_op.IVF_K, refine=(n // 10) + 1, built=built
    )
    exact = ann_op.brute_force_topk(emb, q, k=10)
    got = {(r.query_id, r.rank): (r.vec_id, r.cos_sim) for r in full.collect()}
    want = {(r.query_id, r.rank): (r.vec_id, r.cos_sim) for r in exact.collect()}
    assert got == want

    # serving defaults: recall@10 vs exact truth, held to the plain-IVF
    # ceiling at the same nprobe (residual PQ + refine must be lossless
    # past the coarse probe) and an absolute floor
    truth = {(r.query_id, r.vec_id) for r in exact.collect()}
    pred = {(r.query_id, r.vec_id) for r in ann_op.ivfpq_topk(emb, q, built=built).collect()}
    ivf = {(r.query_id, r.vec_id) for r in ann_op.ivf_topk(emb, q, 10).collect()}
    r_pq = len(pred & truth) / len(truth)
    r_ivf = len(ivf & truth) / len(truth)
    assert r_pq >= r_ivf, (r_pq, r_ivf)
    assert r_pq >= 0.75, r_pq


def test_ivfpq_layout_write_append_compact_probe(spark, tmp_path):
    """IVFADC at-rest layout: (a) full-probe + corpus-covering refine from
    the layout EQUALS brute force (write path and probe machinery exact);
    (b) appends encode with the base generation's codebooks and the
    appended corpus still probes exactly; (c) the serving-default probe is
    a PARTITION-PRUNED scan; (d) compaction keeps the probe row-identical
    and never rewrites the source generation's files."""
    import glob
    import io
    import os
    from contextlib import redirect_stdout

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    base = emb.where(F.col("vec_id") % 5 != 0)
    extra = emb.where(F.col("vec_id") % 5 == 0)
    queries = entry_mod._ann_queries_df(spark, SF_DIR)
    n = emb.count()
    k = lambda df: {(r.query_id, r.vec_id, r.cos_sim, r.rank) for r in df.collect()}
    full = dict(k=10, nprobe=ann_op.IVF_K, refine=(n // 10) + 1)

    path = str(tmp_path / "ivfpq")
    ann_op.write_ivfpq_layout(base, path)
    assert k(ann_op.probe_ivfpq_layout(spark, path, queries, **full)) == k(
        ann_op.brute_force_topk(base, queries, k=10)
    )

    ann_op.append_ivfpq_layout(extra, path)
    assert k(ann_op.probe_ivfpq_layout(spark, path, queries, **full)) == k(
        ann_op.brute_force_topk(emb, queries, k=10)
    )

    serve = ann_op.probe_ivfpq_layout(spark, path, queries)
    buf = io.StringIO()
    with redirect_stdout(buf):
        serve.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan and "cluster" in plan
    want = k(serve)

    g2 = str(tmp_path / "ivfpq_gen2")
    src_files = {
        f: os.path.getmtime(f)
        for f in glob.glob(os.path.join(path, "cluster=*", "*.parquet"))
    }
    assert src_files
    ann_op.compact_ivfpq_layout(spark, path, g2)
    for f, m in src_files.items():
        assert os.path.getmtime(f) == m, f"compaction rewrote source file {f}"
    assert k(ann_op.probe_ivfpq_layout(spark, g2, queries)) == want
    assert os.path.exists(os.path.join(g2, "_appends_compacted.jsonl"))
