"""Reference-pipeline semantics: F1/F1b/F2 filters and the C1-C8 parse.

Fixture rows exercise every edge case catalogued in FIXTURES.md §A1 and
the reference-bug list (SURVEY.md §2.12): token-vs-substring 206, the
'App Web' Desktop quirk, case-sensitive platform rules, NULL sites.
"""

from __future__ import annotations

from etl__project_spark.operators import (
    filter_videostart,
    filter_videostart_like,
    filter_well_formed_title,
    parse_raw,
)


def test_f1_exact_token(raw_rows):
    kept = filter_videostart(raw_rows).select("events").rdd.flatMap(lambda r: r).collect()
    assert all("206" in e.split(",") for e in kept)
    # substring-only matches are dropped
    assert "1206,2060" not in kept
    assert len(kept) == 7


def test_f1b_substring_divergence(raw_rows):
    kept = filter_videostart_like(raw_rows).count()
    assert kept == 8  # F1b additionally keeps the 1206,2060 row


def test_f2_pipe_filter(raw_rows):
    kept = filter_well_formed_title(raw_rows).select("VideoTitle").rdd.flatMap(
        lambda r: r
    ).collect()
    assert "no pipe title" not in kept
    assert len(kept) == 8


def test_parse_semantics(raw_rows):
    rows = {r["video"]: r for r in parse_raw(raw_rows).collect()}
    # C6/C7/C8: minute truncation + key + components
    a = rows["video A"]
    assert a["datetime"] == "2017-01-11T00:00"
    assert a["datetime_key"] == "201701110000"
    assert (a["year"], a["month"], a["day"], a["hour"], a["minute"]) == (
        2017, 1, 11, 0, 0,
    )
    # C3: platform classification, case-sensitive
    assert rows["video A"]["platform"] == "Android"
    assert rows["video B"]["platform"] == "iPhone"
    assert rows["video C"]["platform"] == "iPad"
    # the 'App Web' head contains none of the 3 substrings → Desktop quirk
    assert rows["video D"]["platform"] == "Desktop"
    # lowercase 'android' does NOT match the case-sensitive rules
    assert rows["lower case probe"]["platform"] == "Desktop"
    # C4: site is NULL for platform-headed titles, head otherwise
    assert rows["video A"]["site"] is None  # 'Android App' word-overlaps
    assert rows["video D"]["site"] is None  # 'App Web' contains Web token
    assert rows[" Shark attacks spearfisherman"]["site"] == "news"
    assert rows["lower case probe"]["site"] == "android"  # case-sensitive set
    # C1: last pipe piece is the video, middle pieces dropped
    assert "video A" in rows and rows["video A"]["video"] == "video A"
    # F1+F2 combined: 6 surviving rows
    assert len(rows) == 6


def test_parse_keep_cols(raw_rows):
    from pyspark.sql import functions as F

    with_id = raw_rows.withColumn("rid", F.monotonically_increasing_id())
    out = parse_raw(with_id, keep_cols=["rid"])
    assert "rid" in out.columns
