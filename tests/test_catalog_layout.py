"""Iceberg-style layout: partition pruning + result equivalence."""

import io
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F

from xcube_stac_spark.operators import spatial
from xcube_stac_spark.sources.catalog import SceneCatalog


@pytest.fixture(scope="module")
def laid_out(spark, sf001_dir, tmp_path_factory):
    cat = SceneCatalog(spark, sf001_dir)
    dst = str(tmp_path_factory.mktemp("layout"))
    return cat, cat.materialize_layout(dst)


def test_layout_preserves_search_results(laid_out):
    cat, lcat = laid_out
    args = dict(bbox=[11.0, 49.0, 12.5, 50.0], time_range=("2025-06-02", "2025-06-20"))
    a = {r.item_id for r in spatial.search_scenes(cat.scenes(), **args).collect()}
    b = {r.item_id for r in spatial.search_scenes(lcat.scenes(), **args).collect()}
    assert a == b and a


def test_month_partition_pruning(laid_out, spark):
    """A time filter on the laid-out table must prune month partitions:
    the plan's PartitionFilters reference the month column."""
    cat, lcat = laid_out
    df = lcat.scenes().where(F.col("month") == "2025-06").select("item_id")
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan and "month" in plan
    # and a non-matching partition reads zero rows without scanning data
    assert lcat.scenes().where(F.col("month") == "1999-01").count() == 0


def test_cell_sort_within_partitions(laid_out):
    """center_cell must be non-decreasing within each parquet file (the
    min/max-skip precondition)."""
    cat, lcat = laid_out
    rows = (
        lcat.scenes()
        .select(F.input_file_name().alias("f"), "center_cell")
        .collect()
    )
    by_file: dict[str, list] = {}
    for r in rows:
        by_file.setdefault(r.f, []).append(r.center_cell)
    assert by_file
    for f, cells in by_file.items():
        assert cells == sorted(cells), f
