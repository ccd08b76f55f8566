"""Checkpointed write / resume / metrics tests."""

import json
import os

import pytest
from pyspark.sql import functions as F

from xcube_stac_spark import lineage, synth
from xcube_stac_spark.plans import cube as cube_plan
from xcube_stac_spark.sources.catalog import SceneCatalog

BANDS = ["B02"]
TR = ("2025-06-01", "2025-06-30")


@pytest.fixture(scope="module")
def small_cube(spark, sf0001_dir):
    grid = synth.default_grid("sf0.001")
    cat = SceneCatalog(spark, sf0001_dir)
    return cube_plan.build_cube(cat, grid, time_range=TR, bands=BANDS)


def test_write_resume_roundtrip(spark, small_cube, tmp_path):
    out = str(tmp_path / "cube")
    m1 = lineage.write_cube(small_cube, out, attrs={"bands": BANDS, "time_range": TR})
    assert m1["written_partitions"] > 0
    # resume: everything committed → nothing to do
    m2 = lineage.write_cube(small_cube, out)
    assert m2["written_partitions"] == 0
    # read back equals the computed cube (keys + n_scenes)
    back = lineage.read_cube(spark, out)
    a = {(str(r.solar_day), r.band, r.tile_y, r.tile_x, r.n_scenes) for r in back.collect()}
    b = {(str(r.solar_day), r.band, r.tile_y, r.tile_x, r.n_scenes) for r in small_cube.collect()}
    assert a == b
    assert lineage.read_meta(out)["bands"] == BANDS


def test_partial_resume_recomputes_only_missing(spark, small_cube, tmp_path):
    import pyarrow.parquet as pq

    out = str(tmp_path / "cube2")
    lineage.write_cube(small_cube, out)
    # simulate a partially-failed run: drop some partitions from the commit
    d = lineage._log_dir(out)
    commit = [f for f in os.listdir(d) if f.startswith("commit-") and f.endswith(".parquet")][0]
    cpath = os.path.join(d, commit)
    tbl = pq.read_table(cpath)
    assert tbl.num_rows > 3
    import shutil

    shutil.rmtree(cpath)
    pq.write_table(tbl.slice(0, tbl.num_rows - 3), cpath)  # dir -> single file
    pend = lineage.pending_partitions(small_cube, out)
    assert pend.select("solar_day", "tile_y", "tile_x").distinct().count() == 3
    m = lineage.write_cube(small_cube, out)
    assert m["written_partitions"] == 3
    # now complete
    assert lineage.write_cube(small_cube, out)["written_partitions"] == 0


def test_legacy_jsonl_commits_still_honored(spark, small_cube, tmp_path):
    """Old driver-written jsonl commit logs keep resuming correctly."""
    import json as _json

    out = str(tmp_path / "cube4")
    os.makedirs(lineage._log_dir(out), exist_ok=True)
    keys = (
        small_cube.select("solar_day", "tile_y", "tile_x").distinct().collect()
    )
    assert len(keys) > 2
    legacy = keys[:2]
    with open(os.path.join(lineage._log_dir(out), "commit-legacy.jsonl"), "w") as f:
        for r in legacy:
            f.write(
                _json.dumps(
                    {"solar_day": str(r.solar_day), "tile_y": r.tile_y, "tile_x": r.tile_x}
                )
                + "\n"
            )
    pend = lineage.pending_partitions(small_cube, out)
    assert (
        pend.select("solar_day", "tile_y", "tile_x").distinct().count()
        == len(keys) - 2
    )
    assert lineage.write_cube(small_cube, out)["written_partitions"] == len(keys) - 2


def test_write_cube_plan_has_no_driver_collect(small_cube, tmp_path):
    """The metrics path must stay distributed: write_cube's source contains
    no DataFrame.collect/toPandas call (the VERDICT r2 scaling limit)."""
    import inspect

    src = inspect.getsource(lineage.write_cube)
    assert ".collect()" not in src and "toPandas" not in src


def test_metrics_content(spark, small_cube, tmp_path):
    out = str(tmp_path / "cube3")
    lineage.write_cube(small_cube, out)
    ms = lineage.metrics(out)
    assert ms and all(m["n_rows"] >= 1 and m["bytes"] > 0 for m in ms)
    assert all("lineage" in m and m["lineage"] for m in ms)
