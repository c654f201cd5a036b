"""Row-level transform operators — SURVEY.md §2.2 (F1/F1b/F2/F3) and the
full parse stage of the reference's transform Lambda
(``lambda_s3/lambda_function_s3.py:40-110``) as one narrow DataFrame chain.

All operators are narrow (no shuffle); Catalyst pushes the filters to the
scan when the source is parquet, so at 100 TB the discarded rows are never
materialized past the first stage.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from etl__project_spark.functions import scalar


def filter_videostart(df: DataFrame, events_col: str = "events") -> DataFrame:
    """F1 (canonical) — keep rows whose comma-separated ``events`` list
    contains the exact token ``'206'`` (VideoStart).

    Reference: ``'206' in x.split(',')`` (lambda_function_s3.py:71). Exact
    token match: ``'1206'``/``'2060'`` do NOT qualify.
    """
    return df.filter(F.array_contains(F.split(F.col(events_col), ","), "206"))


def filter_videostart_like(df: DataFrame, events_col: str = "events") -> DataFrame:
    """F1b (documented divergence, NOT canonical) — substring variant.

    Reference (Snowflake path): ``events like '%206%'``
    (snow pipe.sql:91) — also matches 1206/2060. Kept as an explicitly
    named variant so the semantic difference stays visible and tested.
    """
    return df.filter(F.col(events_col).like("%206%"))


def filter_well_formed_title(df: DataFrame, title_col: str = "VideoTitle") -> DataFrame:
    """F2 — keep rows whose title contains at least one pipe.

    Reference: ``len(x.split('|')) > 1`` (lambda_function_s3.py:74).
    """
    return df.filter(F.size(F.split(F.col(title_col), r"\|")) > 1)


def parse_raw(
    df: DataFrame,
    dt_col: str = "DateTime",
    title_col: str = "VideoTitle",
    events_col: str = "events",
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """The complete transform stage: F1 → F2 → C1-C8 → F3 (prune).

    Input: raw video_data-shaped frame (ISO datetime string, pipe-delimited
    title, comma-joined event tokens). Output columns:

    ``datetime`` (minute-truncated ISO string, the staging natural key),
    ``datetime_key`` (yyyyMMddHHmm string), ``year month day hour minute``
    (int), ``platform``, ``site`` (nullable), ``video``.

    Mirrors ``data_process`` (lambda_function_s3.py:40-110) but stays lazy
    and columnar; the reference's 5 intermediate CSV files are unnecessary
    because stages chain as one logical plan.
    """
    dt_minute: Column = scalar.minute_truncate(F.col(dt_col))
    ts = scalar.parse_iso_minute(dt_minute)
    comps = scalar.datetime_components(ts)
    out = (
        filter_well_formed_title(filter_videostart(df, events_col), title_col)
        .select(
            *[F.col(c) for c in (keep_cols or [])],
            dt_minute.alias("datetime"),
            scalar.datetime_key(ts).alias("datetime_key"),
            *[c.alias(n) for n, c in comps.items()],
            scalar.platform_of(F.col(title_col)).alias("platform"),
            scalar.site_of(F.col(title_col)).alias("site"),
            scalar.video_of(F.col(title_col)).alias("video"),
        )
    )
    # F3 (drop consumed VideoTitle/events) is implicit: select() projects
    # them away and Catalyst prunes the scan to only the 3 input columns.
    return out
