from etl__project_spark.plans.catalog import ORACLES, QUERIES  # noqa: F401
