"""Fact-build operators: broadcast star join, unknown-member handling
for late-arriving dimensions, and the repair pass."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl__project_spark.operators.fact import (
    build_fact_unknown_member,
    repair_unknown_facts,
)


def _staging(spark):
    return spark.createDataFrame(
        [("a", 1), ("b", 2), ("c", 3), (None, 4)], "plat string, rowid long"
    )


def _dim(spark, rows):
    return spark.createDataFrame(rows, "plat string, plat_skey long")


def test_unknown_member_distinguishes_miss_from_null_key(spark):
    dim = _dim(spark, [("a", 0), ("b", 1)])  # 'c' is late
    fact = build_fact_unknown_member(
        _staging(spark), {"plat_skey": (dim, "plat", "plat")}, keep_cols=["plat"]
    )
    got = {r["plat"]: r["plat_skey"] for r in fact.collect()}
    assert got["a"] == 0 and got["b"] == 1
    assert got["c"] == -1  # present key, missed lookup -> unknown member
    assert got[None] is None  # NULL natural key stays NULL, not unknown


def test_repair_resolves_only_unknown_slice(spark):
    dim0 = _dim(spark, [("a", 0), ("b", 1)])
    fact = build_fact_unknown_member(
        _staging(spark), {"plat_skey": (dim0, "plat", "plat")}, keep_cols=["plat"]
    )
    # the dim catches up: 'c' lands at the next dense skey
    dim1 = _dim(spark, [("a", 0), ("b", 1), ("c", 2)])
    repaired = repair_unknown_facts(fact, dim1, "plat", "plat", "plat_skey")
    got = {r["plat"]: r["plat_skey"] for r in repaired.collect()}
    assert got == {"a": 0, "b": 1, "c": 2, None: None}
    # idempotent: repairing again changes nothing
    again = repair_unknown_facts(repaired, dim1, "plat", "plat", "plat_skey")
    assert {r["plat"]: r["plat_skey"] for r in again.collect()} == got


def test_repair_leaves_still_late_keys_unknown(spark):
    dim0 = _dim(spark, [("a", 0)])
    fact = build_fact_unknown_member(
        _staging(spark), {"plat_skey": (dim0, "plat", "plat")}, keep_cols=["plat"]
    )
    dim1 = _dim(spark, [("a", 0), ("b", 1)])  # 'c' STILL late
    repaired = repair_unknown_facts(fact, dim1, "plat", "plat", "plat_skey")
    got = {r["plat"]: r["plat_skey"] for r in repaired.collect()}
    assert got["b"] == 1
    assert got["c"] == -1  # stays quarantined until its member arrives


def test_unknown_member_repair_is_broadcast_probe(spark):
    """The repair re-probe must stay a broadcast join on the thin -1
    slice — no sort-merge, no shuffle of the fact."""
    dim0 = _dim(spark, [("a", 0)])
    fact = build_fact_unknown_member(
        _staging(spark), {"plat_skey": (dim0, "plat", "plat")}, keep_cols=["plat"]
    )
    dim1 = _dim(spark, [("a", 0), ("b", 1), ("c", 2)])
    plan = (
        repair_unknown_facts(fact, dim1, "plat", "plat", "plat_skey")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_signed_rollup_matches_recompute_under_churn(spark):
    from etl__project_spark.operators import (
        merge_rollups_signed,
        partial_rollup_signed,
    )

    base = spark.createDataFrame(
        [("x", 1.25, 1), ("x", 2.00, 1), ("y", 5.00, 1)],
        "k string, value double, sign long",
    )
    state = partial_rollup_signed(base, ["k"])
    # churn: retract (x, 2.00), assert (x, 7.75); retract ALL of y
    churn = spark.createDataFrame(
        [("x", 2.00, -1), ("x", 7.75, 1), ("y", 5.00, -1)],
        "k string, value double, sign long",
    )
    merged = merge_rollups_signed(
        state, partial_rollup_signed(churn, ["k"]), ["k"]
    )
    rows = {
        r["k"]: (r["n"], float(r["total"])) for r in merged.collect()
    }
    assert rows == {"x": (2, 9.00)}  # y vanished at net-zero count
