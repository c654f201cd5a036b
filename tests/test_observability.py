"""Observation-based audits (O1) and CSV error-mode handling (S5's
skip-on-error policy at row granularity)."""

from __future__ import annotations

import os

import pytest

from pyspark.sql import types as T

from etl__project_spark.operators.audit import observed
from etl__project_spark.sources import read_raw_csv


def test_observed_count_no_extra_pass(raw_rows):
    df, obs = observed(raw_rows)
    n_action = df.count()
    assert obs.get["n_records"] == n_action == 9


def test_csv_dropmalformed(spark, tmp_path):
    path = str(tmp_path / "bad.csv")
    with open(path, "w") as fh:
        fh.write("DateTime,n,events\n")
        fh.write("2017-01-11T00:00:31.000Z,42,206\n")
        fh.write("2017-01-11T00:00:32.000Z,not_an_int,206\n")
    schema = T.StructType(
        [
            T.StructField("DateTime", T.StringType()),
            T.StructField("n", T.IntegerType()),
            T.StructField("events", T.StringType()),
        ]
    )
    permissive = read_raw_csv(spark, path, schema=schema).collect()
    assert len(permissive) == 2
    assert sorted([r["n"] for r in permissive], key=str) == [42, None]
    dropped = read_raw_csv(spark, path, schema=schema, mode="DROPMALFORMED").collect()
    assert len(dropped) == 1 and dropped[0]["n"] == 42
    assert os.path.exists(path)


def test_check_manifest(tmp_path):
    from etl__project_spark.plans.star_load import check_manifest

    p1 = tmp_path / "a.csv"
    p1.write_text("x")
    missing = check_manifest([str(p1), str(tmp_path / "b.csv")])
    assert missing == [str(tmp_path / "b.csv")]


def test_url_decode_key(spark):
    from pyspark.sql import functions as F

    from etl__project_spark.functions.scalar import url_decode_key

    df = spark.createDataFrame([("rawData/video%20data%7C1.csv",)], "key string")
    assert (
        df.select(url_decode_key(F.col("key")).alias("k")).first()["k"]
        == "rawData/video data|1.csv"
    )


def test_hll_set_ops_flags_actually_hold(spark):
    """The oracle proves Spark == DuckDB; this pins that the accuracy
    flags are TRUE on the fixture (a hash match of two False flags would
    also 'pass' — this closes that loophole) and that the estimates obey
    inclusion-exclusion arithmetic exactly."""
    from etl__project_spark.plans import QUERIES

    row = QUERIES["ev_hll_set_ops"](spark, "/root/testdata/sf0.001").collect()[0]
    assert row["union_ok"] and row["intersection_ok"]
    assert row["est_intersection"] == pytest.approx(
        row["est_a"] + row["est_b"] - row["est_union"], abs=0.02
    )
    assert row["exact_union"] >= max(row["exact_a"], row["exact_b"])
