"""CSV round-trip parity (S1/K1): quote/escape edge cases from
FIXTURES.md §A1 item 6 — embedded commas, double quotes, backslashes,
pipes, non-ASCII."""

from __future__ import annotations

import os
import tempfile

from etl__project_spark.sources import read_raw_csv, write_csv


def test_csv_round_trip(spark):
    rows = [
        ("2017-01-11T00:00:31.000Z", 'title with "quotes"|video', "206"),
        ("2017-01-11T00:00:32.000Z", "commas, inside|video", "206,100"),
        ("2017-01-11T00:00:33.000Z", "back\\slash|video", "206"),
        ("2017-01-11T00:00:34.000Z", "píp€|unicodé vidéo", "206"),
        ("2017-01-11T00:00:35.000Z", None, "100"),
    ]
    df = spark.createDataFrame(rows, "DateTime string, VideoTitle string, events string")
    with tempfile.TemporaryDirectory() as tmp:
        path = os.path.join(tmp, "out")
        write_csv(df, path)
        back = read_raw_csv(spark, path)
        orig = {(r[0], r[1], r[2]) for r in df.collect()}
        rt = {(r[0], r[1], r[2]) for r in back.collect()}
        assert rt == orig


def test_csv_rejects_quarantine(spark, tmp_path):
    """Corrupt lines land verbatim in the reject frame; good rows parse;
    counts stay auditable (good + rejects == data lines)."""
    from etl__project_spark.sources.readers import read_csv_with_rejects
    import pyspark.sql.types as T

    schema = T.StructType(
        [
            T.StructField("a", T.LongType(), True),
            T.StructField("b", T.LongType(), True),
        ]
    )
    p = tmp_path / "in.csv"
    p.write_text("a,b\n1,2\nnot_a_number,5\n3,4\n")
    good, rejects = read_csv_with_rejects(spark, str(p), schema=schema)
    assert sorted(map(tuple, good.select("a", "b").collect())) == [(1, 2), (3, 4)]
    rej = [r["_corrupt_record"] for r in rejects.collect()]
    assert rej == ["not_a_number,5"]
    assert good.count() + rejects.count() == 3


def test_normalize_timestamps_is_session_tz_independent(spark):
    """ADVICE r4: normalize_timestamps must neither mutate the session
    timezone nor depend on it — an NTZ wall clock becomes the identical
    UTC instant whether the caller's session runs UTC or New York, and
    the caller's tz survives the call."""
    from pyspark.sql import functions as F

    from etl__project_spark.sources.tables import normalize_timestamps

    orig = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        df = spark.createDataFrame([("2020-01-01 00:00:00",)], "w string").select(
            F.col("w").cast("timestamp_ntz").alias("ts")
        )
        out = normalize_timestamps(df)
        assert (
            spark.conf.get("spark.sql.session.timeZone") == "America/New_York"
        ), "load must not mutate the caller's session timezone"
        assert out.schema["ts"].dataType.simpleString() == "timestamp"
        [row] = out.select(F.unix_micros("ts").alias("us")).collect()
        assert row["us"] == 1577836800000000  # 2020-01-01T00:00:00Z
    finally:
        spark.conf.set("spark.sql.session.timeZone", orig)


def test_jsonl_round_trip_with_explicit_schema(spark, tmp_path):
    from pyspark.sql import types as T

    from etl__project_spark.sources import read_jsonl, write_jsonl

    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("name", T.StringType()),
            T.StructField("score", T.DoubleType()),
        ]
    )
    df = spark.createDataFrame(
        [(1, "a", 0.5), (2, 'quote " inside', -3.25), (3, None, None)], schema
    )
    out = str(tmp_path / "jl")
    write_jsonl(df, out)
    back = read_jsonl(spark, out, schema)
    assert back.schema == schema
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_jsonl_permissive_nulls_malformed_dropmalformed_drops(spark, tmp_path):
    from pyspark.sql import types as T

    from etl__project_spark.sources import read_jsonl

    p = tmp_path / "in.jsonl"
    p.write_text('{"id": 1, "name": "ok"}\n{not json at all}\n{"id": 2}\n')
    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("name", T.StringType())]
    )
    perm = read_jsonl(spark, str(p), schema).collect()
    assert len(perm) == 3  # malformed row kept as all-null under PERMISSIVE
    dropped = read_jsonl(spark, str(p), schema, mode="DROPMALFORMED").collect()
    assert sorted(r["id"] for r in dropped) == [1, 2]


def test_orc_round_trip_preserves_types(spark, tmp_path):
    from etl__project_spark.sources import read_orc, write_orc

    df = spark.createDataFrame(
        [(1, "x", [1.0, 2.0]), (2, "y", [])],
        "id long, s string, arr array<double>",
    )
    out = str(tmp_path / "orc")
    write_orc(df, out)
    back = read_orc(spark, out)
    assert back.schema == df.schema
    assert sorted((r["id"], r["s"], r["arr"]) for r in back.collect()) == [
        (1, "x", [1.0, 2.0]),
        (2, "y", []),
    ]


def test_orc_scan_pushes_filters(spark, tmp_path):
    from etl__project_spark.sources import read_orc, write_orc

    df = spark.range(100).selectExpr("id", "id % 7 as k")
    out = str(tmp_path / "orc2")
    write_orc(df, out)
    plan = (
        read_orc(spark, out)
        .filter("k = 3")
        .select("id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [IsNotNull(k), EqualTo(k,3)]" in plan
