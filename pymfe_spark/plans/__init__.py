from pymfe_spark.plans.catalog import CATALOG, load_catalog, register  # noqa: F401
