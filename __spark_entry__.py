"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``etl__project_spark``; the catalog
(``etl__project_spark/plans/catalog.py``) maps every operator from
SURVEY.md §2 to a named query + DuckDB oracle.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Runs the complete reference pipeline in miniature: synth raw →
    VideoStart filter → parse → star rollup of video-starts per
    (platform, minute).
    """
    from etl__project_spark.plans import QUERIES

    return QUERIES["vs_fact_rollup"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from etl__project_spark.plans import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI-SQL twin for each query (where expressible)."""
    from etl__project_spark.plans import ORACLES

    return dict(ORACLES)
