"""Scalar helper tests (functions/ + F7 resolution resolve)."""

from xcube_stac_spark import functions as X


def test_resolve_band_asset_exact_and_nearest():
    avail = ["B02_10m", "B02_20m", "B02_60m", "B03_20m", "SCL"]
    assert X.resolve_band_asset("B02", 10.0, avail) == "B02_10m"
    # 15 m → nearest of (10, 20, 60) is 10 (|5| < |5|? tie: sorted stable
    # keeps 10 first), 25 m → 20
    assert X.resolve_band_asset("B02", 25.0, avail) == "B02_20m"
    assert X.resolve_band_asset("B02", 100.0, avail) == "B02_60m"
    # band with only one resolution: any request lands on it
    assert X.resolve_band_asset("B03", 10.0, avail) == "B03_20m"
    # bare asset without res suffix
    assert X.resolve_band_asset("SCL", None, avail) == "SCL"
    # nothing available
    assert X.resolve_band_asset("B08", 10.0, avail) is None


def test_resolve_band_asset_no_res_requested():
    avail = ["B02_10m"]
    assert X.resolve_band_asset("B02", None, avail) == "B02_10m"
