"""Fixture-oracle parity: every pixel query must equal its NumPy fixture.

This is the in-repo twin of the driver's correctness gate for the 7
non-SQL-expressible queries — the same comparison (sorted columns, sorted
rows, exact values) the driver performs between queries() and oracle_sql(),
run here at sf0.001 for speed (the driver runs sf0.01)."""

import os

import pandas as pd
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry_mod
from xcube_stac_spark import fixtures

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def fx_dir():
    return fixtures.ensure_fixtures("sf0.001")


#: fixture-oracled queries retired from the 50-entry driver registry (the
#: driver caps correctness rows at 50) but still pinned here every run
_RETIRED = {"pyramid_combined": entry_mod._q_pyramid_combined}


def _compare(spark, fx_dir, name):
    fn = entry_mod.queries().get(name) or _RETIRED[name]
    sdf = fn(spark, SF_DIR).toPandas()
    odf = pq.read_table(os.path.join(fx_dir, f"{name}.parquet")).to_pandas()
    cols = sorted(sdf.columns)
    assert cols == sorted(odf.columns), (cols, sorted(odf.columns))
    s = sdf[cols].sort_values(cols).reset_index(drop=True)
    o = odf[cols].sort_values(cols).reset_index(drop=True).astype(s.dtypes.to_dict())
    assert len(s) == len(o), (name, len(s), len(o))
    pd.testing.assert_frame_equal(s, o, check_exact=True)


@pytest.mark.parametrize("name", fixtures.FIXTURE_QUERIES)
def test_fixture_query_parity(spark, fx_dir, name):
    _compare(spark, fx_dir, name)


def test_round_half_up_matches_spark_round(spark):
    """Adversarial values where Python/NumPy banker's rounding differs from
    Spark's BigDecimal HALF_UP (exact .5 at the target digit)."""
    vals = [0.0078125, -0.0078125, 0.0000005, 1.2345675, 32.0 / 4096.0, 96.0 / 4096.0]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    got = [r[0] for r in df.select(F.round("x", 6).alias("r")).collect()]
    exp = [fixtures.round_half_up(v, 6) for v in vals]
    assert got == exp
    # and they genuinely differ from banker's rounding on the .5 cases
    assert round(0.0078125, 6) != fixtures.round_half_up(0.0078125, 6)
