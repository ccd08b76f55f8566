"""Table registry / catalog seam — the Spark analogue of the reference's
STAC store plumbing.

Reference mapping (SURVEY §2.1):
* ``StacDataStore.__init__`` capability probe (store.py:94-108) → here a
  catalog is just a directory (or Iceberg namespace) of tables; "searchable"
  vs "static" collapses into: filters are ALWAYS pushed down by Catalyst.
* ``access_item`` single-item fetch w/ retry (utils.py:473-518) → row lookup;
  storage-level retries belong to the FS layer, Spark task retries cover the
  rest.
* ``get_data_ids`` (store.py:131-146) → projection over the scenes table.
* opener-id / format dispatch (store.py:271-292, constants.py:84-98) →
  ``fmt`` column predicate on the images table.

If an Iceberg runtime jar is on the classpath the same seam reads
``spark.read.format("iceberg")``; offline (this sandbox) it reads plain
parquet laid out Iceberg-style. The commit-log/manifest side lives in
:mod:`xcube_stac_spark.lineage`.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _read(spark: SparkSession, path: str, fmt: str = "parquet") -> DataFrame:
    if fmt == "iceberg":
        return spark.read.format("iceberg").load(path)
    return spark.read.parquet(path)


class SceneCatalog:
    """A directory of {scenes, images, assets} tables for one collection
    root. All reads are lazy DataFrames; Catalyst pushes filters/projections
    into the parquet (or Iceberg) scan.
    """

    def __init__(self, spark: SparkSession, root: str, fmt: str = "parquet"):
        self.spark = spark
        self.root = root
        self.fmt = fmt

    def _table(self, name: str) -> DataFrame:
        if self.fmt != "parquet":
            return _read(self.spark, f"{self.root}.{name}", self.fmt)
        # single-file layout (synth fixtures) or directory layout (streaming
        # appends / partitioned writes) — whichever exists
        d = os.path.join(self.root, name)
        path = d if os.path.isdir(d) else os.path.join(self.root, f"{name}.parquet")
        return _read(self.spark, path, self.fmt)

    # -- S4/S5/S7: the scenes (STAC items) table ---------------------------
    def scenes(self) -> DataFrame:
        return self._table("scenes")

    # -- S8-S11: the images (pixel payload) table — mandated input shape ---
    def images(self) -> DataFrame:
        return self._table("images")

    # -- asset listing (utils.py:325-351): item->band->image mapping -------
    def assets(self) -> DataFrame:
        return self._table("assets")

    # -- S13/C14: granule metadata XML sidecars (sen2.py:997-1112) ----------
    def granule_xml(self) -> DataFrame:
        return self._table("granule_xml")

    # -- S2: single item lookup (access_item, utils.py:473-518) ------------
    def item(self, item_id: str) -> DataFrame:
        return self.scenes().where(F.col("item_id") == item_id)

    # -- S7: data-id enumeration (store.py:131-146; attrs utils.py:179-217)
    def data_ids(self, include_attrs: list[str] | None = None) -> DataFrame:
        cols = ["item_id"] + (include_attrs or [])
        return self.scenes().select(*cols)

    # -- search_data → DatasetDescriptor projection (store.py:219-242) -----
    def describe_data(self) -> DataFrame:
        """Per-item descriptor: (data_id, bbox, time_range, crs). Mirrors
        the reference's DatasetDescriptor fields: time_range is
        (start_datetime, end_datetime) for interval items, else
        (datetime, NULL) — store.py:226-235."""
        s = self.scenes()
        interval = F.col("start_datetime").isNotNull() & F.col("end_datetime").isNotNull()
        return s.select(
            F.col("item_id").alias("data_id"),
            F.col("bbox_xmin").alias("xmin"),
            F.col("bbox_ymin").alias("ymin"),
            F.col("bbox_xmax").alias("xmax"),
            F.col("bbox_ymax").alias("ymax"),
            F.when(interval, F.col("start_datetime"))
            .otherwise(F.col("datetime"))
            .cast("string")
            .alias("t_start"),
            F.when(interval, F.col("end_datetime"))
            .otherwise(F.lit(None).cast("timestamp"))
            .cast("string")
            .alias("t_end"),
            F.col("proj_code").alias("crs"),
        )

    # -- Iceberg-style physical layout ---------------------------------------
    def materialize_layout(self, dst_root: str) -> "SceneCatalog":
        """Rewrite the catalog into the at-scale physical layout:

        * ``scenes`` partitioned by (collection, month) and sorted within
          partitions by the spatial cell id of the bbox center — so bbox +
          time searches become partition pruning + row-group min/max skips
          (the hand-rolled equivalent of Iceberg partition specs + sort
          orders; swap in `spark.read.format("iceberg")` when the runtime
          jar is present).
        * ``images`` bucket-sorted by image_id (the join key to assets).

        Returns a catalog over the new root."""
        import pyspark.sql.functions as F2

        from xcube_stac_spark import functions as X

        os.makedirs(dst_root, exist_ok=True)
        scenes = self.scenes().withColumn(
            "month",
            F2.date_format(F2.coalesce("datetime", "start_datetime"), "yyyy-MM"),
        ).withColumn(
            "center_cell",
            X.cell_id_expr(
                (F.col("bbox_xmin") + F.col("bbox_xmax")) / 2,
                (F.col("bbox_ymin") + F.col("bbox_ymax")) / 2,
            ),
        )
        (
            # global range sort (not repartition+sortWithinPartitions): AQE
            # partition coalescing concatenates hash partitions and would
            # break the within-file cell order; range partitions stay sorted
            # under coalesce because only ADJACENT ranges merge
            scenes.orderBy("collection", "month", "center_cell")
            .write.mode("overwrite")
            .partitionBy("collection", "month")
            .parquet(os.path.join(dst_root, "scenes"))
        )
        (
            self.images()
            .repartition(16, "image_id")
            .sortWithinPartitions("image_id")
            .write.mode("overwrite")
            .parquet(os.path.join(dst_root, "images"))
        )
        self.assets().write.mode("overwrite").parquet(os.path.join(dst_root, "assets"))
        return SceneCatalog(self.spark, dst_root, self.fmt)

    # -- S6/S3: collection-level metadata (utils.py:521-549, :143-168) -----
    def collections(self) -> DataFrame:
        """Collection extents derived by aggregation (the reference reads
        them from collection JSON; here they ARE the data: A5-style envelope
        + time range per collection)."""
        return (
            self.scenes()
            .groupBy("collection")
            .agg(
                F.min("bbox_xmin").alias("xmin"),
                F.min("bbox_ymin").alias("ymin"),
                F.max("bbox_xmax").alias("xmax"),
                F.max("bbox_ymax").alias("ymax"),
                F.min(F.coalesce("datetime", "start_datetime")).alias("time_start"),
                F.max(F.coalesce("datetime", "end_datetime")).alias("time_end"),
                F.count("*").alias("n_items"),
            )
        )
