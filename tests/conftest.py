from __future__ import annotations

import pytest

from etl__project_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture()
def raw_rows(spark):
    """Reference-shaped video_data rows covering FIXTURES.md §A1 edge cases."""
    rows = [
        # (DateTime, VideoTitle, events)
        ("2017-01-11T00:00:31.000Z", "Android App|Clips|video A", "127,157,206"),
        ("2017-01-11T00:00:59.000Z", "iPhone App|News|video B", "206"),
        ("2017-01-11T00:01:01.000Z", "iPad|today;2017|video C", "104,206,161"),
        ("2017-01-11T00:01:02.000Z", "news| Shark attacks spearfisherman", "206"),
        ("2017-01-11T00:01:03.000Z", "App Web|Clips|video D", "206,100"),
        ("2017-01-11T00:01:04.000Z", "android|lower case probe", "206"),
        # dropped by F1 (substring-only 206)
        ("2017-01-11T00:02:00.000Z", "news|kept by F1b only", "1206,2060"),
        # dropped by F1 (no 206 at all)
        ("2017-01-11T00:02:01.000Z", "news|no 206", "100,101"),
        # dropped by F2 (no pipe)
        ("2017-01-11T00:02:02.000Z", "no pipe title", "206"),
    ]
    return spark.createDataFrame(rows, "DateTime string, VideoTitle string, events string")
