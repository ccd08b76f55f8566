"""xcube_stac_spark — a from-scratch, DataFrame-first PySpark engine with the
query/data-processing capabilities of xcube-dev/xcube-stac (reference snapshot
read-only at /root/reference; cited as ``file:line`` throughout).

NOT a port: the reference assembles xarray/dask cubes on one machine; this
engine re-expresses every operator (spatial search/join, scene grouping/dedup,
tile decode, scale/mask, take-first mosaic, regrid, temporal stacking) as
Spark SQL / DataFrame / Arrow-UDF primitives with explicit partitioning and
skew handling, over an Iceberg-style table of image+caption pairs
``(image_id, bytes, w, h, fmt, caption, phash)``.
"""

__version__ = "0.1.0"

from xcube_stac_spark.gridspec import GridSpec  # noqa: F401
