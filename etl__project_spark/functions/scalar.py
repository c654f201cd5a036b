"""Scalar column-expression kit — SURVEY.md §2.3 (C1-C12).

Every scalar the reference computes with pandas row lambdas
(``lambda_s3/lambda_function_s3.py:41-62,79-99``) or Snowflake SQL
(``ETL-load to snowflake/snow pipe.sql:82-92``), re-expressed as pure Spark
column expressions: JVM-side, whole-stage-codegen'd, zero Python UDFs.

Canonical semantics are the pandas/Lambda path (SURVEY.md §2, "canonical
semantics" note); the Snowflake variants (C3b etc.) are deliberately NOT
reproduced here.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tokens that mark the head of a VideoTitle as a *platform*, not a site
# (reference: `like_site`, lambda_s3/lambda_function_s3.py:57-62 — the
# membership test is case-sensitive and word-exact).
PLATFORM_TOKENS = ["Android", "iPhone", "iPad", "Web"]


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def url_decode_key(key: Column | str) -> Column:
    """C12 — percent-decode an object-store key (reference:
    ``unquote_plus(key)`` on the S3 event, lambda_function_s3.py:22).
    Only needed when modeling path metadata."""
    return F.url_decode(_col(key))


def head_token(title: Column | str) -> Column:
    """C2 — first pipe-delimited piece of the title.

    Reference: ``VideoTitle.split('|')[0]`` (lambda_function_s3.py:50,59).
    """
    return F.split(_col(title), r"\|").getItem(0)


def video_of(title: Column | str) -> Column:
    """C1 — last pipe-delimited piece = the video name; middle pieces dropped.

    Reference: ``VideoTitle.split('|')[-1]`` (lambda_function_s3.py:91).
    """
    return F.element_at(F.split(_col(title), r"\|"), -1)


def platform_of(title: Column | str) -> Column:
    """C3 — platform classification on the head token.

    Case-sensitive substring tests, first match wins, default Desktop
    (reference ``like_platform``, lambda_function_s3.py:49-55). Note the
    reference quirk: a head like ``'App Web'`` contains none of the three
    substrings so it classifies as Desktop — preserved here.
    """
    head = head_token(title)
    return (
        F.when(head.contains("Android"), F.lit("Android"))
        .when(head.contains("iPhone"), F.lit("iPhone"))
        .when(head.contains("iPad"), F.lit("iPad"))
        .otherwise(F.lit("Desktop"))
    )


def site_of(title: Column | str) -> Column:
    """C4 — site detection: head token unless any space-separated word of it
    is a platform token, in which case NULL.

    Reference ``like_site`` (lambda_function_s3.py:57-62): splits the head on
    spaces and returns None when the word set overlaps
    {Android, iPhone, iPad, Web} (case-sensitive), else the head itself.
    """
    head = head_token(title)
    words = F.split(head, " ")
    platform_arr = F.array(*[F.lit(t) for t in PLATFORM_TOKENS])
    return F.when(F.arrays_overlap(words, platform_arr), F.lit(None).cast("string")).otherwise(
        head
    )


def minute_truncate(dt_iso: Column | str) -> Column:
    """C6 — minute-grain truncation of an ISO string.

    Reference slices ``x[:-8]`` off ``2017-01-11T00:00:31.000Z`` →
    ``2017-01-11T00:00`` (lambda_function_s3.py:79). Implemented as a
    16-char prefix (equivalent for the fixed-width ISO-8601-with-ms-Z
    format the reference consumes).
    """
    return F.substring(_col(dt_iso), 1, 16)


def parse_iso_minute(dt_minute: Column | str) -> Column:
    """C5 — parse the minute-truncated ISO string to a timestamp.

    Reference: ``strptime(x, '%Y-%m-%dT%H:%M')`` (lambda_function_s3.py:41-42).
    """
    return F.to_timestamp(_col(dt_minute), "yyyy-MM-dd'T'HH:mm")


def datetime_key(ts: Column | str) -> Column:
    """C7 — 12-char minute key, e.g. ``201701110049``.

    Reference: strftime ``'%Y%m%d%H%M'`` (lambda_function_s3.py:44-47);
    Snowflake ``to_char(datetime,'YYYYMMDDHH24MI')``.
    """
    return F.date_format(_col(ts), "yyyyMMddHHmm")


def datetime_components(ts: Column | str) -> dict[str, Column]:
    """C8 — year/month/day/hour/minute int components for dim_time.

    Reference: lambda_function_s3.py:82-86; smallint DDL
    lambda_function_redishift.py:58-63.
    """
    c = _col(ts)
    return {
        "year": F.year(c).cast("int"),
        "month": F.month(c).cast("int"),
        "day": F.dayofmonth(c).cast("int"),
        "hour": F.hour(c).cast("int"),
        "minute": F.minute(c).cast("int"),
    }
