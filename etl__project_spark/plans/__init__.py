from etl__project_spark.plans.catalog import ORACLES, QUERIES  # noqa: F401
from etl__project_spark.plans.sqlrun import register_views, run_sql  # noqa: F401
