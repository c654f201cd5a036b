"""J3/T5 merge-dedup semantics: re-delivered batches land exactly once."""

from __future__ import annotations

from etl__project_spark.operators import merge_insert_new


def test_merge_insert_new(spark):
    dest = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    batch = spark.createDataFrame(
        [(2, "b"), (3, "c"), (3, "c")], "id long, v string"
    )
    out = merge_insert_new(dest, batch)
    assert sorted((r["id"], r["v"]) for r in out.collect()) == [
        (1, "a"),
        (2, "b"),
        (3, "c"),
    ]


def test_merge_redelivery_noop(spark):
    dest = spark.createDataFrame([(1, "a")], "id long, v string")
    once = merge_insert_new(dest, dest)
    assert once.count() == 1
