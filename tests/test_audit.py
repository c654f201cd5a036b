"""Audit operators A3/A4."""

from __future__ import annotations

from etl__project_spark.operators import max_lengths, record_count


def test_record_count(raw_rows):
    assert record_count(raw_rows).first()["n_records"] == 9


def test_max_lengths(raw_rows):
    row = max_lengths(raw_rows, ["DateTime", "VideoTitle", "events"]).first()
    assert row["max_len_DateTime"] == 24
    assert row["max_len_VideoTitle"] == max(
        len(t) for t in raw_rows.select("VideoTitle").rdd.flatMap(lambda r: r).collect()
    )
