"""SQL entry point: run plain Spark SQL over the fixture tables.

The reference's users drive their warehouse with SQL (Snowflake
worksheets / Redshift COPY-then-query); this is the switch path for
them: ``register_views`` exposes every fixture table as a temp view
(through ``load_table``, so the timestamp-precision and UTC-session
normalizations apply identically to SQL and DataFrame callers), and
``run_sql`` executes any statement against them. Catalyst treats a SQL
query and the equivalent DataFrame chain as the same logical plan, so
everything the plan tests pin — pushdown, broadcast stars, partial
aggregation — holds for SQL users for free (pinned by test against the
catalog's ``tpch_q1_sql`` twin-pair).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from etl__project_spark.sources.tables import TABLES, load_table


def register_views(
    spark: SparkSession, sf_dir: str, tables: list[str] | None = None
) -> list[str]:
    """Register each fixture table as a temp view named after itself.

    Views are lazy references to the parquet scans — registration costs
    nothing and every query planned against them gets filter/column
    pushdown into the file source as usual.
    """
    names = tables or list(TABLES)
    for t in names:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return names


def run_sql(spark: SparkSession, sf_dir: str, sql: str) -> DataFrame:
    """Register the fixture views, then execute ``sql`` against them."""
    register_views(spark, sf_dir)
    return spark.sql(sql)
