from xcube_stac_spark.sources.catalog import SceneCatalog  # noqa: F401
