"""Asset href → (protocol, root, fs_path, storage_options) decoding (S12).

Re-implements the BEHAVIOR of the reference's ``xcube_stac/href_parse.py:
70-186`` (shapes + validation asserted by ``test/test_href_parse.py:34-170``)
from scratch, without the xcube store dependency:

* the six AWS S3 URL shapes (path-style/virtual-hosted, with or without a
  region, plus ``s3://``) → ``("s3", bucket, path, {anon, region_name?})``;
* S3-compatible custom endpoints (host starting ``s3.`` that is not AWS) →
  ``("s3", bucket, path, {..., client_kwargs.endpoint_url})``;
* anything else → ``("https", host, path, {})``;
* AWS bucket-naming and region validation with the reference's exact error
  messages (raised as ``ValueError`` here — no DataStoreError available).

In this engine pixel payloads are inline ``bytes`` (BASELINE input_hint), so
nothing in the pipeline calls this; it exists so reference users with
href-carrying catalogs keep their parsing semantics.
"""

from __future__ import annotations

import re
from urllib.parse import urlsplit

#: AWS commercial-partition region names (public AWS documentation).
AWS_REGIONS = frozenset(
    {
        "us-east-1", "us-east-2", "us-west-1", "us-west-2",
        "af-south-1",
        "ap-east-1", "ap-south-1", "ap-south-2",
        "ap-southeast-1", "ap-southeast-2", "ap-southeast-3", "ap-southeast-4",
        "ap-northeast-1", "ap-northeast-2", "ap-northeast-3",
        "ca-central-1", "ca-west-1",
        "eu-central-1", "eu-central-2",
        "eu-west-1", "eu-west-2", "eu-west-3",
        "eu-north-1", "eu-south-1", "eu-south-2",
        "il-central-1", "me-central-1", "me-south-1",
        "sa-east-1",
        "us-gov-east-1", "us-gov-west-1",
    }
)

#: AWS S3 bucket naming rules: 3-63 chars of lowercase letters, digits,
#: dots, hyphens; must start and end with a letter or digit; no IP-address
#: form; no ``xn--``/``sthree-`` prefixes; no ``-s3alias``/``--ol-s3``
#: suffixes (reference ``xcube_stac/href_parse.py:27-32``).
_BUCKET_RE = re.compile(
    r"^(?!xn--)(?!sthree-)(?!.+--ol-s3$)(?!.+-s3alias$)"
    r"[a-z0-9](?:[a-z0-9.-]{1,61})[a-z0-9]$"
)
_IP_RE = re.compile(r"^\d{1,3}(\.\d{1,3}){3}$")


def assert_aws_s3_bucket(bucket: str, href: str) -> None:
    if not _BUCKET_RE.match(bucket) or _IP_RE.match(bucket):
        raise ValueError(
            f"Bucket name {bucket!r} extracted from the href {href!r} "
            f"does not follow the AWS S3 bucket naming rules."
        )


def assert_aws_s3_region_name(region_name: str, href: str) -> None:
    if region_name not in AWS_REGIONS:
        raise ValueError(
            f"Region name {region_name!r} extracted from the href {href!r} "
            "is not supported by AWS S3"
        )


def _with_region(region: str | None, storage_options: dict | None) -> dict:
    # The reference injects anon=True whenever the caller supplied neither
    # 'key' nor 'secret', even alongside other storage options
    # (xcube_stac/href_parse.py:166-168).
    opts = dict(storage_options) if storage_options else {}
    if "key" not in opts and "secret" not in opts:
        opts["anon"] = True
    if region:
        ck = dict(opts.get("client_kwargs", {}))
        ck["region_name"] = region
        opts["client_kwargs"] = ck
    return opts


def decode_href(
    href: str, storage_options: dict | None = None
) -> tuple[str, str, str, dict]:
    """Decode one asset href. Returns (protocol, root, fs_path,
    storage_options); AWS bucket/region names are validated."""
    if href.startswith("s3://"):
        bucket, _, path = href[len("s3://") :].partition("/")
        assert_aws_s3_bucket(bucket, href)
        return "s3", bucket, path, _with_region(None, storage_options)

    parts = urlsplit(href)
    host = parts.netloc
    path = parts.path.lstrip("/")

    if host.endswith(".amazonaws.com"):
        stem = host[: -len(".amazonaws.com")]
        bucket = region = None
        if stem == "s3":
            # https://s3.amazonaws.com/<bucket>/<path>
            bucket, _, path = path.partition("/")
        elif stem.startswith("s3-"):
            # https://s3-<region>.amazonaws.com/<bucket>/<path>
            region = stem[3:]
            bucket, _, path = path.partition("/")
        elif stem.endswith(".s3"):
            # https://<bucket>.s3.amazonaws.com/<path>
            bucket = stem[: -len(".s3")]
        elif ".s3-" in stem:
            # https://<bucket>.s3-<region>.amazonaws.com/<path>
            bucket, _, region = stem.rpartition(".s3-")
        elif ".s3." in stem:
            # https://<bucket>.s3.<region>.amazonaws.com/<path>
            bucket, _, region = stem.rpartition(".s3.")
        if bucket is not None:
            assert_aws_s3_bucket(bucket, href)
            if region is not None:
                assert_aws_s3_region_name(region, href)
            return "s3", bucket, path, _with_region(region, storage_options)

    if host.startswith("s3."):
        # S3-compatible custom endpoint: first path segment is the bucket.
        # The reference validates the bucket and injects anon like the AWS
        # branches (xcube_stac/href_parse.py:155-169).
        bucket, _, fs_path = path.partition("/")
        assert_aws_s3_bucket(bucket, href)
        opts = _with_region(None, storage_options)
        ck = dict(opts.get("client_kwargs", {}))
        ck["endpoint_url"] = f"{parts.scheme}://{host}"
        opts["client_kwargs"] = ck
        return "s3", bucket, fs_path, opts

    # Non-S3 fallback keeps the href's own scheme
    # (xcube_stac/href_parse.py:95-99: protocol = href.split("://")[0]).
    return parts.scheme or "https", host, path, {}
