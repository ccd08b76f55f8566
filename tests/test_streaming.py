"""Structured-Streaming incremental cube maintenance tests."""

import os
import shutil

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from xcube_stac_spark import lineage, synth
from xcube_stac_spark.plans import cube as cube_plan
from xcube_stac_spark.sources.catalog import SceneCatalog
from xcube_stac_spark.streaming import ingest


@pytest.fixture()
def stream_world(tmp_path, sf0001_dir):
    """Catalog whose scenes table is a DIRECTORY receiving parquet drops."""
    root = tmp_path / "cat"
    root.mkdir()
    scenes_dir = root / "scenes"
    scenes_dir.mkdir()
    for name in ("images.parquet", "assets.parquet"):
        shutil.copy(os.path.join(sf0001_dir, name), root / name)
    t = pq.read_table(os.path.join(sf0001_dir, "scenes.parquet"))
    # split arrivals: first 2 solar days land first, the rest later
    import pyarrow.compute as pc

    days = pc.strftime(t["datetime"], format="%Y-%m-%d")
    first = t.filter(pc.is_in(days, value_set=__import__("pyarrow").array(
        ["2025-06-01", "2025-06-02"])))
    rest_mask = pc.invert(pc.is_in(days, value_set=__import__("pyarrow").array(
        ["2025-06-01", "2025-06-02"])))
    rest = t.filter(rest_mask)
    return root, scenes_dir, first, rest


def test_incremental_cube_converges_to_batch(spark, stream_world, tmp_path):
    root, scenes_dir, first, rest = stream_world
    grid = synth.default_grid("sf0.001")
    out = str(tmp_path / "cube_out")
    ckpt = str(tmp_path / "ckpt")
    cat = SceneCatalog(spark, str(root))
    batches = []

    pq.write_table(first, os.path.join(str(scenes_dir), "drop-0.parquet"))
    q = ingest.run_incremental_cube(
        spark, str(scenes_dir), cat, grid, out, ["B02"], ckpt,
        on_batch=lambda e, n: batches.append((e, n)),
    )
    q.awaitTermination(120)
    assert batches and batches[0][1] > 0

    # second arrival (includes interval-datetime rows with NULL datetime)
    pq.write_table(rest, os.path.join(str(scenes_dir), "drop-1.parquet"))
    q2 = ingest.run_incremental_cube(
        spark, str(scenes_dir), cat, grid, out, ["B02"], ckpt,
        on_batch=lambda e, n: batches.append((e, n)),
    )
    q2.awaitTermination(120)

    # converged result == one-shot batch build over the full catalog
    batch_cube = cube_plan.build_cube(
        cat, grid, time_range=("2025-06-01", "2025-06-30"), bands=["B02"]
    )
    got = {
        (str(r.solar_day), r.band, r.tile_y, r.tile_x): (r.n_scenes, r.item_ids)
        for r in lineage.read_cube(spark, out).collect()
    }
    exp = {
        (str(r.solar_day), r.band, r.tile_y, r.tile_x): (r.n_scenes, r.item_ids)
        for r in batch_cube.collect()
    }
    assert got == exp


def test_session_window_stream_matches_batch(spark, tmp_path):
    """Streaming session_window sessions == batch lag+cumsum sessions
    (same 30-min gap): identical session count and per-user event totals."""
    from pyspark.sql import functions as F

    from xcube_stac_spark.operators import events as events_op

    src = "/root/testdata/sf0.001/events.parquet"
    ev_schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(ev_schema).parquet("/root/testdata/sf0.001/")
    )
    # restrict to the events file via schema? the dir has other tables —
    # stage a dedicated dir instead
    import shutil, os

    d = tmp_path / "ev"
    d.mkdir()
    shutil.copy(src, d / "events.parquet")
    stream = spark.readStream.schema(ev_schema).parquet(str(d))
    sess = ingest.session_stats_stream(stream, gap="30 minutes")
    q = (
        sess.writeStream.outputMode("append")
        .format("memory").queryName("sessions")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("select * from sessions").collect()
    assert got
    batch_all = events_op.sessionize(spark.read.parquet(src), gap_sec=1800).collect()
    # append mode only emits sessions whose window end (last event + gap)
    # has passed the final watermark (max ts - 1h); still-open sessions
    # stay in state — compare against the same subset of batch sessions
    import pandas as pd

    ev = pd.read_parquet(src)
    wm_sec = int((ev.ts.max() - pd.Timedelta("1 hour")).timestamp())
    batch = [r for r in batch_all if r.t_end_sec + 1800 <= wm_sec]
    # session COUNT per user must match between the two formulations
    from collections import Counter

    gc = Counter(r.user_id for r in got)
    bc = Counter(r.user_id for r in batch)
    assert gc == bc
    # and total events per user
    ge = Counter()
    be = Counter()
    for r in got:
        ge[r.user_id] += r.n_events
    for r in batch:
        be[r.user_id] += r.n_events
    assert ge == be


def test_reprocessing_detector_stateful(spark, stream_world, tmp_path):
    """applyInPandasWithState: a scene with a NEWER proc_version than the
    tile's state emits a supersession record; same-version scenes don't."""
    root, scenes_dir, first, rest = stream_world
    pq.write_table(first, os.path.join(str(scenes_dir), "drop-0.parquet"))
    pq.write_table(rest, os.path.join(str(scenes_dir), "drop-1.parquet"))
    stream = ingest.stream_scenes(spark, str(scenes_dir))
    det = ingest.reprocessing_detector(stream)
    q = (
        det.writeStream.outputMode("append")
        .format("memory").queryName("reproc")
        .option("checkpointLocation", str(tmp_path / "ck3"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("select * from reproc").collect()
    # the synthetic world plants 05.11 reprocessings over 05.00 baselines
    assert rows
    assert all(r.new_version > r.old_version for r in rows)
    assert all(r.new_version == "05.11" and r.old_version == "05.00" for r in rows)


def test_scene_arrival_stats_stream(spark, stream_world, tmp_path):
    root, scenes_dir, first, rest = stream_world
    pq.write_table(first, os.path.join(str(scenes_dir), "drop-0.parquet"))
    pq.write_table(rest, os.path.join(str(scenes_dir), "drop-1.parquet"))
    stream = ingest.stream_scenes(spark, str(scenes_dir))
    stats = ingest.scene_arrival_stats(stream)
    q = (
        stats.writeStream.outputMode("append")
        .format("memory").queryName("arrivals")
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # append mode emits only watermark-closed windows; with availableNow the
    # final watermark closes all, so rows should exist
    rows = spark.sql("select * from arrivals").collect()
    assert rows
    assert all(r.n_scenes >= 1 for r in rows)


def test_recompute_time_range_covers_far_lon_solar_days(spark):
    """A scene at lon 150° acquired 2025-06-01T20:00 UTC has solar day
    2025-06-02 (offset +10 h). A naive UTC window equal to the dirty solar
    day would MISS it; the widened recompute_time_range catches it."""
    import datetime as dt

    from xcube_stac_spark.operators import spatial

    row = {
        "item_id": "FAR_LON", "collection": "c",
        "datetime": dt.datetime(2025, 6, 1, 20, 0, tzinfo=dt.timezone.utc),
        "start_datetime": None, "end_datetime": None,
        "bbox_xmin": 149.5, "bbox_ymin": 10.0, "bbox_xmax": 150.5, "bbox_ymax": 11.0,
        "footprint": [], "tile_id": "T1", "zone": 56, "proj_code": "EPSG:32656",
        "proc_version": "05.00", "orbit_state": "descending",
        "scene_x0": 0.0, "scene_y0": 0.0, "scene_res": 10.0,
        "nodata": 0.0, "scale": 1.0, "offset": 0.0,
    }
    df = spark.createDataFrame([row], ingest.SCENES_DDL)
    solar = spatial.with_solar_day(df).select("solar_day").first()[0]
    assert str(solar) == "2025-06-02"
    dirty = [solar]

    naive = (f"{min(dirty)} 00:00:00", f"{max(dirty)} 23:59:59")
    assert spatial.search_scenes(df, time_range=naive).count() == 0  # the bug
    widened = ingest.recompute_time_range(dirty)
    found = spatial.search_scenes(df, time_range=widened)
    assert found.count() == 1
    # and the output restriction still limits to the dirty partition
    assert spatial.with_solar_day(found).where(
        F.col("solar_day").isin(dirty)).count() == 1


def test_incremental_cube_far_lon_late_arrival(spark, sf0001_dir, tmp_path):
    """END-TO-END late-arrival completeness at lon ~173° (solar offset
    +11 h): the whole sf0.001 world translated +162° east (zones 32/33 →
    59/60 — identical UTM coordinates, TM depends only on lon − central_lon)
    and +13 h in time, so every overpass sits near UTC MIDNIGHT and every
    solar day is UTC date + 1 — the regime where the unwidened recompute
    window dropped scenes. A scene held back until a second micro-batch must
    appear in the recomputed mosaic partition's lineage, and the converged
    cube must equal the one-shot batch build."""
    import glob

    from xcube_stac_spark.gridspec import GridSpec
    from xcube_stac_spark.operators import spatial

    sc = spark.read.parquet(os.path.join(sf0001_dir, "scenes.parquet"))
    epsg = F.split("proj_code", ":").getItem(1).cast("int")
    shifted = (
        sc.withColumn("bbox_xmin", F.col("bbox_xmin") + 162.0)
        .withColumn("bbox_xmax", F.col("bbox_xmax") + 162.0)
        .withColumn(
            "footprint",
            F.transform(
                "footprint",
                lambda p: F.struct((p["lon"] + 162.0).alias("lon"), p["lat"].alias("lat")),
            ),
        )
        .withColumn("zone", F.col("zone") + 27)
        .withColumn("proj_code", F.concat(F.lit("EPSG:"), (epsg + 27).cast("string")))
        .withColumn("datetime", F.col("datetime") + F.expr("INTERVAL 13 HOURS"))
        .withColumn("start_datetime", F.col("start_datetime") + F.expr("INTERVAL 13 HOURS"))
        .withColumn("end_datetime", F.col("end_datetime") + F.expr("INTERVAL 13 HOURS"))
    )
    root = tmp_path / "cat170"
    root.mkdir()
    scenes_dir = root / "scenes"
    scenes_dir.mkdir()
    for name in ("images.parquet", "assets.parquet"):
        shutil.copy(os.path.join(sf0001_dir, name), root / name)
    g = synth.default_grid("sf0.001")
    grid = GridSpec(
        crs=g.crs, x0=g.x0 + 162.0, y0=g.y0, res=g.res,
        width=g.width, height=g.height, tile_w=g.tile_w, tile_h=g.tile_h,
    )

    # regime sanity: every dated scene's solar day is UTC date + 1
    sd = spatial.with_solar_day(shifted.where(F.col("datetime").isNotNull()))
    assert sd.where(F.to_date("datetime") == F.col("solar_day")).count() == 0

    # hold back one mosaic-contributing scene (a latest-version item of a
    # multi-item solar day) as the "late arrival near UTC midnight"
    surv = spatial.dedup_latest_version(
        spatial.search_scenes(shifted, bbox=grid.bbox())
    )
    day_counts = (
        surv.groupBy("solar_day").agg(F.countDistinct("item_id").alias("n"))
        .where(F.col("n") >= 2).orderBy("solar_day").collect()
    )
    assert day_counts
    late_day = day_counts[0]["solar_day"]
    late_item = (
        surv.where(F.col("solar_day") == F.lit(late_day))
        .orderBy("item_id").select("item_id").first()[0]
    )
    # the late scene really is near UTC midnight
    late_dt = shifted.where(F.col("item_id") == late_item).select("datetime").first()[0]
    assert late_dt is None or late_dt.hour >= 22

    def drop(df, name):
        d = str(tmp_path / f"stage_{name}")
        df.coalesce(1).write.mode("overwrite").parquet(d)
        src = glob.glob(os.path.join(d, "part-*.parquet"))[0]
        shutil.copy(src, scenes_dir / f"{name}.parquet")

    drop(shifted.where(F.col("item_id") != late_item), "drop-0")
    out = str(tmp_path / "cube_out")
    ckpt = str(tmp_path / "ckpt")
    cat = SceneCatalog(spark, str(root))
    q = ingest.run_incremental_cube(spark, str(scenes_dir), cat, grid, out, ["B02"], ckpt)
    q.awaitTermination(180)
    before = {
        (str(r.solar_day), r.tile_y, r.tile_x): r.item_ids
        for r in lineage.read_cube(spark, out)
        .where(F.col("solar_day") == F.lit(late_day)).collect()
    }
    assert before and not any(late_item in v for v in before.values())

    drop(shifted.where(F.col("item_id") == late_item), "drop-1")
    q2 = ingest.run_incremental_cube(spark, str(scenes_dir), cat, grid, out, ["B02"], ckpt)
    q2.awaitTermination(180)

    after = {
        (str(r.solar_day), r.tile_y, r.tile_x): r.item_ids
        for r in lineage.read_cube(spark, out)
        .where(F.col("solar_day") == F.lit(late_day)).collect()
    }
    assert any(late_item in v for v in after.values()), (
        "late near-midnight scene missing from the recomputed mosaic lineage"
    )
    # converged == one-shot batch over the full far-lon catalog
    batch_cube = cube_plan.build_cube(
        cat, grid, time_range=("2025-06-01", "2025-07-02"), bands=["B02"]
    )
    got = {
        (str(r.solar_day), r.band, r.tile_y, r.tile_x): (r.n_scenes, r.item_ids)
        for r in lineage.read_cube(spark, out).collect()
    }
    exp = {
        (str(r.solar_day), r.band, r.tile_y, r.tile_x): (r.n_scenes, r.item_ids)
        for r in batch_cube.collect()
    }
    assert got == exp


def test_quality_gate_stream_matches_batch_filter(spark, sf0001_dir, tmp_path):
    """Streaming multimodal quality gate: two arrival batches of image rows
    (good rows + corrupted rows whose stored pHash can't match + a blank
    tile), processed incrementally, must yield exactly the batch filter
    over the union — same Arrow decode path, stateless gate."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq2

    from xcube_stac_spark import codecs
    from xcube_stac_spark.streaming import ingest as si

    t = pq2.read_table(os.path.join(sf0001_dir, "images.parquet"))
    good = t.slice(0, 24)
    # corrupted rows: stored phash is flipped on every bit -> hamming ~ 63
    bad = t.slice(24, 8)
    bad = bad.set_column(
        bad.schema.get_field_index("phash"),
        "phash",
        pa.array([(~int(v.as_py())) & 0x7FFFFFFFFFFFFFFF for v in bad["phash"]],
                 pa.int64()),
    )
    # a blank (zero-variance) tile with a CORRECT phash — caught by min_std
    blank_img = np.full((16, 16), 777, np.uint16)
    blank = pa.Table.from_pylist(
        [
            {
                "image_id": "BLANK0",
                "bytes": codecs.encode(blank_img, "png"),
                "w": 16, "h": 16, "fmt": "png",
                "caption": "blank",
                "phash": int(codecs.phash64(blank_img)),
            }
        ],
        schema=t.schema,
    )
    watch = tmp_path / "arrivals"
    watch.mkdir()
    pq2.write_table(pa.concat_tables([good.slice(0, 12), bad.slice(0, 4)]),
                    str(watch / "batch0.parquet"))

    sink = str(tmp_path / "kept")
    q = (
        si.quality_gate_stream(si.stream_images(spark, str(watch)))
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    pq2.write_table(
        pa.concat_tables([good.slice(12, 12), bad.slice(4, 4), blank]),
        str(watch / "batch1.parquet"),
    )
    q2 = (
        si.quality_gate_stream(si.stream_images(spark, str(watch)))
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)

    kept = {r.image_id for r in spark.read.parquet(sink).collect()}
    # batch twin over the union of all arrivals: the gate is the same
    # DataFrame transformation either way, only the source differs
    union = spark.read.schema(si.IMAGES_DDL).parquet(str(watch))
    want = {r.image_id for r in si.quality_gate_stream(union).collect()}
    assert kept == want
    assert "BLANK0" not in kept
    good_ids = {v.as_py() for v in good["image_id"]}
    bad_ids = {v.as_py() for v in bad["image_id"]}
    assert not (kept & bad_ids)
    # every good row survives (corpus rows are self-consistent: lossless
    # ham=0, lossy small)
    assert good_ids <= kept


def test_exact_dedup_stream_suppresses_cross_batch_copies(spark, tmp_path):
    """Streaming exact dedup: a text re-arriving in a LATER micro-batch
    (new doc_id, same content) must be suppressed by the checkpointed
    seen-set state; the surviving hash set equals the batch distinct over
    the union of all arrivals."""
    import pyarrow as pa
    import pyarrow.parquet as pq2

    from xcube_stac_spark.streaming import ingest as si

    def tbl(rows):
        return pa.Table.from_pylist(
            [
                {"doc_id": i, "text": t, "lang": "en", "source": "s",
                 "n_chars": len(t)}
                for i, t in rows
            ],
            schema=pa.schema(
                [("doc_id", pa.int64()), ("text", pa.string()),
                 ("lang", pa.string()), ("source", pa.string()),
                 ("n_chars", pa.int64())]
            ),
        )

    watch = tmp_path / "docs"
    watch.mkdir()
    b0 = [(1, "alpha beta"), (2, "gamma delta"), (3, "alpha beta")]  # in-batch dup
    b1 = [(4, "ALPHA Beta"), (5, "epsilon zeta"), (6, "gamma delta")]  # cross-batch dups
    pq2.write_table(tbl(b0), str(watch / "b0.parquet"))

    sink = str(tmp_path / "uniq")

    def run():
        q = (
            si.exact_dedup_stream(si.stream_documents(spark, str(watch)))
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run()
    pq2.write_table(tbl(b1), str(watch / "b1.parquet"))
    run()

    got = spark.read.parquet(sink).collect()
    by_text = {}
    for r in got:
        assert r.text.lower() not in by_text, "duplicate text emitted"
        by_text[r.text.lower()] = r.doc_id
    assert set(by_text) == {"alpha beta", "gamma delta", "epsilon zeta"}
    # first-arrival wins: batch-1 copies (ids 4, 6) never surface
    assert by_text["alpha beta"] in (1, 3) and by_text["gamma delta"] == 2
    assert by_text["epsilon zeta"] == 5
