"""Deterministic video_data synthesizer.

The driver's fixtures (TESTDATA.md) don't include the reference's raw
``video_data`` table (DateTime / VideoTitle / events —
``lambda_s3/raw_data _sample.pdf`` p.1), so we derive one deterministically
from the ``events`` fixture, twice: once as Spark column expressions and
once as a DuckDB SQL CTE. Both produce byte-identical rows, which lets
every reference operator (F1/F1b/F2, C1-C8, A1, I1, J1, J2) be
oracle-checked end-to-end by the driver.

The branch mix is chosen to hit every edge case in FIXTURES.md §A1:
platform-substring heads (incl. the 'App Web' → Desktop quirk and the
case-sensitivity probe 'android'), site heads, a no-pipe title (dropped by
F2), and events lists that separate exact-token-206 (F1) from
substring-206 (F1b).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_TITLE_BRANCHES = [
    "'Android App|Clips|' || event_type",
    "'iPhone App|News|' || event_type",
    "'iPad|today;2017|' || event_type",
    "'news|' || event_type",
    "'App Web|Sports|' || event_type",
    "'no pipe title ' || event_type",
    "'android|' || event_type",
]

_EVENTS_BRANCHES = [
    "'127,157,206'",
    "'1206,2060'",
    "'206'",
    "'100,101,118'",
]


def synth_video_data(events: DataFrame) -> DataFrame:
    """Spark-side synthesis: events fixture → raw video_data shape.

    Keeps ``event_id`` as a deterministic row id (the reference's raw file
    has none; we carry it only for tie-breaking in oracle comparisons).
    """
    title = F.when(F.lit(False), F.lit(None))
    for i, expr in enumerate(_TITLE_BRANCHES):
        title = title.when(F.col("event_id") % 7 == i, F.expr(expr))
    ev = F.when(F.lit(False), F.lit(None))
    for i, expr in enumerate(_EVENTS_BRANCHES):
        ev = ev.when(F.col("event_id") % 4 == i, F.expr(expr))
    return events.select(
        F.col("event_id"),
        F.concat(F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss"), F.lit(".000Z")).alias(
            "DateTime"
        ),
        title.alias("VideoTitle"),
        ev.alias("events"),
    )


def _sql_case(col_mod: str, branches: list[str]) -> str:
    whens = "\n      ".join(
        f"WHEN {i} THEN {b}" for i, b in enumerate(branches)
    )
    return f"CASE {col_mod}\n      {whens}\n    END"


# DuckDB CTE producing the identical table from the `events` view.
VIDEO_DATA_CTE = f"""video_data AS (
  SELECT
    event_id,
    strftime(ts, '%Y-%m-%dT%H:%M:%S') || '.000Z' AS DateTime,
    {_sql_case('event_id % 7', _TITLE_BRANCHES)} AS VideoTitle,
    {_sql_case('event_id % 4', _EVENTS_BRANCHES)} AS events
  FROM events
)"""
