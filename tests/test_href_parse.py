"""S12 href decoding — the nine URL shapes and validation errors the
reference pins in ``test/test_href_parse.py:34-170``."""

import pytest

from xcube_stac_spark.href_parse import (
    assert_aws_s3_bucket,
    assert_aws_s3_region_name,
    decode_href,
)

REGION_OPTS = {"anon": True, "client_kwargs": {"region_name": "us-east-1"}}

CASES = [
    ("https://s3.amazonaws.com/bucket-name/filename",
     ("s3", "bucket-name", "filename", {"anon": True})),
    ("s3://bucket-name/filename",
     ("s3", "bucket-name", "filename", {"anon": True})),
    ("https://bucket-name.s3.amazonaws.com/filename",
     ("s3", "bucket-name", "filename", {"anon": True})),
    ("https://s3-us-east-1.amazonaws.com/bucket-name/filename",
     ("s3", "bucket-name", "filename", REGION_OPTS)),
    ("https://bucket-name.s3-us-east-1.amazonaws.com/filename",
     ("s3", "bucket-name", "filename", REGION_OPTS)),
    ("https://bucket-name.s3.us-east-1.amazonaws.com/filename",
     ("s3", "bucket-name", "filename", REGION_OPTS)),
    (
        "https://s3.eu-central-1.wasabisys.com/eumap/lcv/lcv_blue.tif",
        (
            "s3", "eumap", "lcv/lcv_blue.tif",
            {"anon": True,
             "client_kwargs": {"endpoint_url": "https://s3.eu-central-1.wasabisys.com"}},
        ),
    ),
    (
        "https://download.geoservice.dlr.de/ENMAP/files/L0/QL_VNIR_COG.TIF",
        ("https", "download.geoservice.dlr.de", "ENMAP/files/L0/QL_VNIR_COG.TIF", {}),
    ),
    (
        "https://sentinel2l2a01.blob.core.windows.net/sentinel2-l2/55/X/EJ/B01_60m.tif",
        ("https", "sentinel2l2a01.blob.core.windows.net",
         "sentinel2-l2/55/X/EJ/B01_60m.tif", {}),
    ),
]


@pytest.mark.parametrize("href,expected", CASES)
def test_decode_href_shapes(href, expected):
    assert decode_href(href) == expected


def test_decode_href_custom_endpoint_with_credentials():
    href = "https://s3.gfz-potsdam.de/root/data_id.zarr"
    assert decode_href(href) == (
        "s3", "root", "data_id.zarr",
        {"anon": True, "client_kwargs": {"endpoint_url": "https://s3.gfz-potsdam.de"}},
    )
    assert decode_href(href, storage_options={"key": "key", "secret": "secret"}) == (
        "s3", "root", "data_id.zarr",
        {"key": "key", "secret": "secret",
         "client_kwargs": {"endpoint_url": "https://s3.gfz-potsdam.de"}},
    )


def test_http_fallback_keeps_scheme():
    assert decode_href("http://example.org/some/file.tif") == (
        "http", "example.org", "some/file.tif", {})


def test_gov_cloud_regions_accepted():
    href = "https://bucket-name.s3.us-gov-west-1.amazonaws.com/filename"
    assert decode_href(href) == (
        "s3", "bucket-name", "filename",
        {"anon": True, "client_kwargs": {"region_name": "us-gov-west-1"}})
    assert_aws_s3_region_name("us-gov-east-1", href)


def test_anon_injected_alongside_other_storage_options():
    # Reference injects anon whenever key/secret are absent, even when other
    # storage options (e.g. client_kwargs) were passed.
    href = "https://bucket-name.s3.us-east-1.amazonaws.com/filename"
    proto, root, path, opts = decode_href(
        href, storage_options={"client_kwargs": {"connect_timeout": 5}})
    assert opts["anon"] is True
    assert opts["client_kwargs"] == {
        "connect_timeout": 5, "region_name": "us-east-1"}


def test_custom_endpoint_validates_bucket():
    with pytest.raises(ValueError, match="bucket naming rules"):
        decode_href("https://s3.gfz-potsdam.de/bad-s3alias/data_id.zarr")


@pytest.mark.parametrize(
    "bucket",
    ["test_123-s3alias", "m" * 64, "ab", "192.168.1.1", "xn--abc",
     "bad-s3alias", "sthree-bucket", "bucket--ol-s3"])
def test_bad_bucket_names_rejected(bucket):
    href = "https://s3-us-east-1.amazonaws.com/bucket-name/filename"
    with pytest.raises(ValueError, match="does not follow the AWS S3 bucket naming rules"):
        assert_aws_s3_bucket(bucket, href)


def test_bad_region_rejected():
    href = "https://s3-us-east-5.amazonaws.com/bucket-name/filename"
    with pytest.raises(ValueError, match="is not supported by AWS S3"):
        assert_aws_s3_region_name("us-east-5", href)
    with pytest.raises(ValueError, match="is not supported by AWS S3"):
        decode_href(href)


def test_bad_bucket_in_href_rejected():
    with pytest.raises(ValueError, match="bucket naming rules"):
        decode_href("s3://Bad_Bucket/filename")
