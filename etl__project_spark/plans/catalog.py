"""Query catalog: every implemented operator exposed as a named query with a
DuckDB oracle (driver contract, ``__spark_entry__.py``).

Naming maps to SURVEY.md §2 operator ids:

- ``vs_*``   reference VideoStart pipeline (F1/F1b/F2, C1-C8, A1/A3/A4,
             I1, J1, J2, J3) over the deterministic video_data synth
             (``refdata.py``)
- ``tpch_*`` analytic join/agg workloads on the TPC-H-ish fixtures
             (engine capability + bench headliners)
- ``ev_*``   event-stream analytics (rollups, sessionization, JSON props)
- ``doc_*``  text / dedup pipeline (documents table)
- ``emb_*``  embedding similarity (embeddings table)

Conventions for oracle parity (the driver hash-compares values after
sorting columns by name): every computed column is aliased identically in
Spark and SQL; ints are cast to BIGINT on both sides; doubles that result
from arithmetic are rounded to a fixed number of decimals on both sides;
timestamps are emitted as formatted strings.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl__project_spark.operators import (
    build_fact,
    derive_dim,
    derive_dim_time,
    filter_videostart,
    filter_videostart_like,
    filter_well_formed_title,
    max_lengths,
    merge_insert_new,
    parse_raw,
    record_count,
    scd1_upsert,
    with_dense_ids,
)
from etl__project_spark.refdata import VIDEO_DATA_CTE, synth_video_data
from etl__project_spark.sources import load_table

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def _video(spark: SparkSession, sf_dir: str) -> DataFrame:
    return synth_video_data(load_table(spark, sf_dir, "events"))


def _parsed(spark: SparkSession, sf_dir: str, keep_id: bool = False) -> DataFrame:
    return parse_raw(_video(spark, sf_dir), keep_cols=["event_id"] if keep_id else None)


# DuckDB CTE chain mirroring synth → F1 → F2 → C1-C8.
PARSED_CTE = f"""{VIDEO_DATA_CTE},
kept AS (
  SELECT * FROM video_data
  WHERE list_contains(string_split(events, ','), '206')
    AND len(string_split(VideoTitle, '|')) > 1
),
parsed_pre AS (
  SELECT event_id,
         substr(DateTime, 1, 16) AS datetime,
         strptime(substr(DateTime, 1, 16), '%Y-%m-%dT%H:%M') AS __ts,
         string_split(VideoTitle, '|')[1] AS __head,
         VideoTitle
  FROM kept
),
parsed AS (
  SELECT event_id,
         datetime,
         strftime(__ts, '%Y%m%d%H%M') AS datetime_key,
         year(__ts)::BIGINT AS year, month(__ts)::BIGINT AS month,
         day(__ts)::BIGINT AS day, hour(__ts)::BIGINT AS hour,
         minute(__ts)::BIGINT AS minute,
         CASE WHEN __head LIKE '%Android%' THEN 'Android'
              WHEN __head LIKE '%iPhone%' THEN 'iPhone'
              WHEN __head LIKE '%iPad%' THEN 'iPad'
              ELSE 'Desktop' END AS platform,
         CASE WHEN list_has_any(string_split(__head, ' '),
                                ['Android','iPhone','iPad','Web'])
              THEN NULL ELSE __head END AS site,
         string_split(VideoTitle, '|')[-1] AS video
  FROM parsed_pre
)"""

# Star-dimension CTEs with dense surrogate keys (oracle form of I1:
# row_number over natural-key order, start 0).
DIMS_CTE = f"""{PARSED_CTE},
dimdate AS (
  SELECT row_number() OVER (ORDER BY datetime) - 1 AS datetime_skey, datetime
  FROM (SELECT DISTINCT datetime FROM parsed)
),
dimplatform AS (
  SELECT row_number() OVER (ORDER BY platform) - 1 AS platform_skey, platform
  FROM (SELECT DISTINCT platform FROM parsed)
),
dimsite AS (
  SELECT row_number() OVER (ORDER BY site) - 1 AS site_skey, site
  FROM (SELECT DISTINCT site FROM parsed WHERE site IS NOT NULL)
),
dimtitle AS (
  SELECT row_number() OVER (ORDER BY video) - 1 AS title_skey, video
  FROM (SELECT DISTINCT video FROM parsed)
)"""


def _int(c):
    return c.cast("long")


# ---------------------------------------------------------------------------
# vs_* — reference pipeline operators
# ---------------------------------------------------------------------------


@query(
    "vs_filter_token",
    f"""WITH {VIDEO_DATA_CTE}
SELECT event_id, DateTime, VideoTitle, events FROM video_data
WHERE list_contains(string_split(events, ','), '206')""",
)
def vs_filter_token(spark, sf_dir):
    """F1 — canonical VideoStart filter: exact token '206' membership."""
    return filter_videostart(_video(spark, sf_dir))


@query(
    "vs_filter_like",
    f"""WITH {VIDEO_DATA_CTE}
SELECT event_id, DateTime, VideoTitle, events FROM video_data
WHERE events LIKE '%206%'""",
)
def vs_filter_like(spark, sf_dir):
    """F1b — Snowflake-path substring variant (documented divergence)."""
    return filter_videostart_like(_video(spark, sf_dir))


@query(
    "vs_filter_title",
    f"""WITH {VIDEO_DATA_CTE}
SELECT event_id, DateTime, VideoTitle, events FROM video_data
WHERE len(string_split(VideoTitle, '|')) > 1""",
)
def vs_filter_title(spark, sf_dir):
    """F2 — malformed-title filter (title must contain a pipe)."""
    return filter_well_formed_title(_video(spark, sf_dir))


@query(
    "vs_parse",
    f"""WITH {PARSED_CTE}
SELECT datetime, datetime_key, year, month, day, hour, minute,
       platform, site, video
FROM parsed""",
)
def vs_parse(spark, sf_dir):
    """C1-C8 over F1+F2 — the complete transform-Lambda stage."""
    df = _parsed(spark, sf_dir)
    return df.select(
        "datetime",
        "datetime_key",
        *[_int(F.col(c)).alias(c) for c in ["year", "month", "day", "hour", "minute"]],
        "platform",
        "site",
        "video",
    )


@query(
    "vs_dim_time",
    f"""WITH {PARSED_CTE}
SELECT datetime,
       year(__t)::BIGINT AS year, month(__t)::BIGINT AS month,
       day(__t)::BIGINT AS day, hour(__t)::BIGINT AS hour,
       minute(__t)::BIGINT AS minute
FROM (SELECT DISTINCT datetime, strptime(datetime, '%Y-%m-%dT%H:%M') AS __t
      FROM parsed)""",
)
def vs_dim_time(spark, sf_dir):
    """A1+C8 — minute-grain time dimension delta."""
    d = derive_dim_time(_parsed(spark, sf_dir))
    return d.select(
        "datetime",
        *[_int(F.col(c)).alias(c) for c in ["year", "month", "day", "hour", "minute"]],
    )


@query(
    "vs_dim_platform",
    f"WITH {PARSED_CTE}\nSELECT DISTINCT platform FROM parsed",
)
def vs_dim_platform(spark, sf_dir):
    """A1 — platform dimension delta (expect the 4-value domain)."""
    return derive_dim(_parsed(spark, sf_dir), "platform")


@query(
    "vs_dim_site",
    f"WITH {PARSED_CTE}\nSELECT DISTINCT site FROM parsed WHERE site IS NOT NULL",
)
def vs_dim_site(spark, sf_dir):
    """A1 — site dimension delta (NULL = platform-headed titles excluded)."""
    return derive_dim(_parsed(spark, sf_dir), "site")


@query(
    "vs_dim_title",
    f"WITH {PARSED_CTE}\nSELECT DISTINCT video FROM parsed",
)
def vs_dim_title(spark, sf_dir):
    """A1 — video/title dimension delta."""
    return derive_dim(_parsed(spark, sf_dir), "video")


@query(
    "vs_dim_date_skey",
    f"""WITH {DIMS_CTE}
SELECT datetime_skey::BIGINT AS datetime_skey, datetime FROM dimdate""",
)
def vs_dim_date_skey(spark, sf_dir):
    """I1 — dense insertion-ordered surrogate keys on the date dimension
    (scalable range-partitioned row_number, oracle = global row_number)."""
    dim = derive_dim(_parsed(spark, sf_dir), "datetime")
    return with_dense_ids(dim, "datetime", id_col="datetime_skey").select(
        _int(F.col("datetime_skey")).alias("datetime_skey"), "datetime"
    )


@query(
    "vs_fact",
    f"""WITH {DIMS_CTE}
SELECT d.datetime_skey::BIGINT AS datetime_skey,
       p.platform_skey::BIGINT AS platform_skey,
       s.site_skey::BIGINT AS site_skey,
       t.title_skey::BIGINT AS title_skey
FROM parsed f
LEFT JOIN dimdate d ON f.datetime = d.datetime
LEFT JOIN dimplatform p ON f.platform = p.platform
LEFT JOIN dimsite s ON f.site = s.site
LEFT JOIN dimtitle t ON f.video = t.video""",
)
def vs_fact(spark, sf_dir):
    """J2 — star fact build: staging LEFT JOIN 4 dims → surrogate keys.

    Every dim side is broadcast; the fact never shuffles."""
    parsed = _parsed(spark, sf_dir)
    dims = {
        "datetime_skey": (
            with_dense_ids(derive_dim(parsed, "datetime"), "datetime", "datetime_skey"),
            "datetime",
            "datetime",
        ),
        "platform_skey": (
            with_dense_ids(derive_dim(parsed, "platform"), "platform", "platform_skey"),
            "platform",
            "platform",
        ),
        "site_skey": (
            with_dense_ids(derive_dim(parsed, "site"), "site", "site_skey"),
            "site",
            "site",
        ),
        "title_skey": (
            with_dense_ids(derive_dim(parsed, "video"), "video", "title_skey"),
            "video",
            "video",
        ),
    }
    fact = build_fact(parsed, dims)
    return fact.select(*[_int(F.col(c)).alias(c) for c in fact.columns])


@query(
    "vs_fact_rollup",
    f"""WITH {DIMS_CTE}
SELECT p.platform, f.datetime_key, count(*)::BIGINT AS n_starts
FROM parsed f JOIN dimplatform p ON f.platform = p.platform
GROUP BY p.platform, f.datetime_key""",
)
def vs_fact_rollup(spark, sf_dir):
    """Flagship — video-starts per (platform, minute): the reference's
    business question ("track VideoStart events over time")."""
    parsed = _parsed(spark, sf_dir)
    return parsed.groupBy("platform", "datetime_key").agg(
        F.count(F.lit(1)).alias("n_starts")
    )


@query(
    "vs_scd1_upsert",
    f"""WITH {PARSED_CTE},
initial AS (SELECT DISTINCT datetime FROM parsed WHERE event_id % 10 < 5),
dim0 AS (
  SELECT row_number() OVER (ORDER BY datetime) - 1 AS datetime_skey, datetime
  FROM initial
),
delta AS (SELECT DISTINCT datetime FROM parsed WHERE event_id % 10 >= 5),
newk AS (
  SELECT datetime FROM delta
  WHERE datetime NOT IN (SELECT datetime FROM initial)
)
SELECT datetime_skey::BIGINT AS datetime_skey, datetime FROM dim0
UNION ALL
SELECT ((SELECT count(*) FROM initial)
        + row_number() OVER (ORDER BY datetime) - 1)::BIGINT, datetime
FROM newk""",
)
def vs_scd1_upsert(spark, sf_dir):
    """J1 — SCD Type-1 anti-join upsert: two half-batches; the second only
    inserts unseen natural keys, with surrogate keys continuing densely."""
    parsed = _parsed(spark, sf_dir, keep_id=True)
    initial = derive_dim(parsed.filter(F.col("event_id") % 10 < 5), "datetime")
    dim0 = with_dense_ids(initial, "datetime", id_col="datetime_skey")
    delta = parsed.filter(F.col("event_id") % 10 >= 5).select("datetime")
    out = scd1_upsert(dim0, delta, "datetime", "datetime_skey")
    return out.select(_int(F.col("datetime_skey")).alias("datetime_skey"), "datetime")


@query(
    "vs_merge_dedup",
    f"""WITH {VIDEO_DATA_CTE},
b1 AS (SELECT DateTime, VideoTitle, events FROM video_data WHERE event_id % 3 <= 1),
b2 AS (SELECT DateTime, VideoTitle, events FROM video_data WHERE event_id % 3 >= 1)
SELECT DISTINCT DateTime, VideoTitle, events FROM (
  SELECT * FROM b1 UNION ALL SELECT * FROM b2
)""",
)
def vs_merge_dedup(spark, sf_dir):
    """J3/T5 — MERGE insert-if-not-matched: re-delivered overlapping batches
    land exactly once (full-row dedup against the destination)."""
    raw = _video(spark, sf_dir)
    b1 = raw.filter(F.col("event_id") % 3 <= 1).select("DateTime", "VideoTitle", "events")
    b2 = raw.filter(F.col("event_id") % 3 >= 1).select("DateTime", "VideoTitle", "events")
    dest = b1.dropDuplicates()
    return merge_insert_new(dest, b2)


@query(
    "vs_audit_count",
    f"WITH {VIDEO_DATA_CTE}\nSELECT count(*)::BIGINT AS n_records FROM video_data",
)
def vs_audit_count(spark, sf_dir):
    """A3 — record-count audit (the reference's CloudWatch count log)."""
    return record_count(_video(spark, sf_dir))


@query(
    "vs_audit_maxlen",
    f"""WITH {VIDEO_DATA_CTE}
SELECT max(len(DateTime))::BIGINT AS max_len_DateTime,
       max(len(VideoTitle))::BIGINT AS max_len_VideoTitle,
       max(len(events))::BIGINT AS max_len_events
FROM video_data""",
)
def vs_audit_maxlen(spark, sf_dir):
    """A4 — per-column max-length audit (drove the reference's VARCHAR
    sizing; one single-pass distributed aggregate here)."""
    out = max_lengths(_video(spark, sf_dir), ["DateTime", "VideoTitle", "events"])
    return out.select(*[_int(F.col(c)).alias(c) for c in out.columns])
