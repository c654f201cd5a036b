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


def test_minmax_rollup_survives_extremum_deletes(spark):
    """CDC deletes a group's current min AND max: re-derived extremes
    come from the post-change base state; untouched groups keep their
    stored extremes; net-zero groups vanish (VERDICT r6 #3)."""
    from etl__project_spark.operators import merge_rollups_minmax_cdc

    base = spark.createDataFrame(
        [("x", 1.00), ("x", 5.00), ("x", 3.00), ("y", 2.00), ("z", 9.00),
         ("w", 4.00)],
        "k string, value double",
    )
    qv = F.round(F.col("value"), 2).cast("decimal(18,2)")

    def agg(df):
        return df.groupBy("k").agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(qv).alias("total"),
            F.min(qv).alias("vmin"),
            F.max(qv).alias("vmax"),
        )

    # delete x's extrema (1.00, 5.00); update y 2.00 -> 7.50; delete all
    # of z; leave w untouched
    delta = spark.createDataFrame(
        [("x", 1.00, -1), ("x", 5.00, -1),
         ("y", 2.00, -1), ("y", 7.50, 1),
         ("z", 9.00, -1)],
        "k string, value double, sign long",
    )
    post = spark.createDataFrame(
        [("x", 3.00), ("y", 7.50), ("w", 4.00)], "k string, value double"
    )
    merged = merge_rollups_minmax_cdc(agg(base), delta, post, ["k"])
    rows = {
        r["k"]: (r["n"], float(r["total"]), float(r["vmin"]), float(r["vmax"]))
        for r in merged.collect()
    }
    assert rows == {
        "x": (1, 3.00, 3.00, 3.00),
        "y": (1, 7.50, 7.50, 7.50),
        "w": (1, 4.00, 4.00, 4.00),
    }


def test_minmax_rollup_random_churn_matches_recompute(spark):
    """Randomized churn that ALWAYS deletes each group's current extrema
    (the case merged partial state cannot answer) plus a random update:
    the maintained rollup equals the one-shot recompute on post state."""
    import random

    from etl__project_spark.operators import merge_rollups_minmax_cdc

    random.seed(11)
    rows = [(f"g{i % 5}", random.randrange(1, 400) / 4.0) for i in range(80)]
    state = {}
    for k, v in rows:
        state.setdefault(k, []).append(v)
    deltas = []
    for k, vs in state.items():
        for doom in {max(vs), min(vs)}:  # delete current extrema
            vs.remove(doom)
            deltas.append((k, doom, -1))
        old = random.choice(vs)  # plus one update
        vs.remove(old)
        vs.append(old + 1.0)
        deltas.append((k, old, -1))
        deltas.append((k, old + 1.0, 1))
    base = spark.createDataFrame(rows, "k string, value double")
    post = spark.createDataFrame(
        [(k, v) for k, vs in state.items() for v in vs],
        "k string, value double",
    )
    qv = F.round(F.col("value"), 2).cast("decimal(18,2)")

    def agg(df):
        return df.groupBy("k").agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(qv).alias("total"),
            F.min(qv).alias("vmin"),
            F.max(qv).alias("vmax"),
        )

    merged = merge_rollups_minmax_cdc(
        agg(base),
        spark.createDataFrame(deltas, "k string, value double, sign long"),
        post,
        ["k"],
    )
    assert {tuple(r) for r in merged.collect()} == {
        tuple(r) for r in agg(post).collect()
    }


def test_distinct_count_survives_last_occurrence_deletes(spark):
    """Retractable COUNT(DISTINCT): deleting a value's LAST occurrence
    drops it from the count, deleting one of several does not, and a
    re-attributed value moves between groups."""
    from etl__project_spark.operators import (
        finalize_distinct,
        merge_distinct_signed,
        partial_distinct_signed,
    )

    base = spark.createDataFrame(
        [("x", 1), ("x", 1), ("x", 2), ("y", 3), ("y", 4)],
        "k string, u long",
    )
    state = partial_distinct_signed(
        base.withColumn("sign", F.lit(1)), ["k"], "u"
    )
    # delete ONE of x's two u=1 rows (still distinct-counted), delete
    # x's only u=2 row (drops), move y's u=3 to group x
    delta_rows = spark.createDataFrame(
        [("x", 1, -1), ("x", 2, -1), ("y", 3, -1), ("x", 3, 1)],
        "k string, u long, sign long",
    )
    merged = merge_distinct_signed(
        state, partial_distinct_signed(delta_rows, ["k"], "u"), ["k"], "u"
    )
    got = {r["k"]: r["n_distinct"] for r in finalize_distinct(merged, ["k"]).collect()}
    assert got == {"x": 2, "y": 1}  # x: {1, 3}; y: {4}


def test_distinct_count_random_churn_matches_recompute(spark):
    """Randomized churn folded through the signed (group, value) state
    equals the one-shot COUNT(DISTINCT) over the replayed post state."""
    import random

    from etl__project_spark.operators import (
        finalize_distinct,
        merge_distinct_signed,
        partial_distinct_signed,
    )

    random.seed(23)
    rows = [(f"g{i % 4}", random.randrange(12)) for i in range(60)]
    base = spark.createDataFrame(rows, "k string, u long")
    state = partial_distinct_signed(
        base.withColumn("sign", F.lit(1)), ["k"], "u"
    )
    live = list(rows)
    deltas = []
    for _ in range(25):
        if live and random.random() < 0.5:
            victim = live.pop(random.randrange(len(live)))
            deltas.append((*victim, -1))
        else:
            row = (f"g{random.randrange(4)}", random.randrange(12))
            live.append(row)
            deltas.append((*row, 1))
    merged = merge_distinct_signed(
        state,
        partial_distinct_signed(
            spark.createDataFrame(deltas, "k string, u long, sign long"),
            ["k"],
            "u",
        ),
        ["k"],
        "u",
    )
    got = {r["k"]: r["n_distinct"] for r in finalize_distinct(merged, ["k"]).collect()}
    want = {}
    for k, u in live:
        want.setdefault(k, set()).add(u)
    assert got == {k: len(v) for k, v in want.items()}


def test_variance_moments_signed_match_recompute(spark):
    """Signed second moments under churn (incl. deleting extreme values)
    equal the one-shot recompute — variance is sign-linear, needing no
    base-state consultation, unlike min/max/distinct."""
    import random

    from etl__project_spark.operators import (
        finalize_variance,
        merge_moments_signed,
        partial_moments_signed,
    )

    random.seed(31)
    rows = [(f"g{i % 4}", random.randrange(1, 40000)) for i in range(80)]
    state = {}
    for k, c in rows:
        state.setdefault(k, []).append(c)
    deltas = []
    for k, cs in state.items():
        for doom in {max(cs), min(cs)}:  # delete extremes too — no special case
            cs.remove(doom)
            deltas.append((k, doom, -1))
        old = random.choice(cs)
        cs.remove(old)
        cs.append(old + 100)
        deltas.append((k, old, -1))
        deltas.append((k, old + 100, 1))
    base = spark.createDataFrame(rows, "k string, c long")
    merged = merge_moments_signed(
        partial_moments_signed(base.withColumn("sign", F.lit(1)), ["k"], "c"),
        partial_moments_signed(
            spark.createDataFrame(deltas, "k string, c long, sign long"),
            ["k"],
            "c",
        ),
        ["k"],
    )
    got = {
        r["k"]: (r["n_events"], r["var_value"])
        for r in finalize_variance(merged, ["k"]).collect()
    }
    import math

    want = {}
    for k, cs in state.items():
        n = len(cs)
        mean = sum(cs) / n
        var = sum((c - mean) ** 2 for c in cs) / n
        want[k] = (n, math.floor(var + 0.5) / 10000.0)
    assert got == want


def test_hist_quantile_read_is_bucket_lower_edge(spark):
    """Quantile reads off the retractable histogram: p-th estimate is
    the LOWER EDGE of the first bucket whose cumulative count reaches
    ceil(p·N) — checked against a hand-computed fixture."""
    from etl__project_spark.operators import hist_quantiles, partial_hist_signed

    # group a: 5×1.0 (bucket 0), 4×25.0 (bucket 2), 1×99.0 (bucket 9)
    rows = [("a", 1.0)] * 5 + [("a", 25.0)] * 4 + [("a", 99.0)]
    df = spark.createDataFrame(rows, "k string, value double")
    state = partial_hist_signed(df.withColumn("sign", F.lit(1)), ["k"])
    got = hist_quantiles(state, ["k"]).collect()[0]
    assert got["n_events"] == 10
    assert got["p50_lo"] == 0.0  # rank ceil(5.0)=5, bucket 0 cum=5
    assert got["p90_lo"] == 20.0  # rank 9, bucket 2 cum=9


def test_hist_rollup_random_churn_matches_recompute(spark):
    """Randomized churn (deletes draining buckets to zero, updates that
    cross bucket edges) folded through the signed histogram equals a
    one-shot sketch of the replayed post state — including the
    quantile reads."""
    import random

    from etl__project_spark.operators import (
        hist_quantiles,
        merge_hist_signed,
        partial_hist_signed,
    )

    random.seed(31)
    rows = [(f"g{i % 4}", random.randrange(1, 800) / 4.0) for i in range(120)]
    state = {}
    for k, v in rows:
        state.setdefault(k, []).append(v)
    deltas = []
    for k, vs in state.items():
        for _ in range(6):  # deletes
            doom = random.choice(vs)
            vs.remove(doom)
            deltas.append((k, doom, -1))
        for _ in range(4):  # updates that jump ~2 buckets
            old = random.choice(vs)
            vs.remove(old)
            new = old + 21.5
            vs.append(new)
            deltas.append((k, old, -1))
            deltas.append((k, new, 1))
    base = spark.createDataFrame(rows, "k string, value double")
    post = spark.createDataFrame(
        [(k, v) for k, vs in state.items() for v in vs],
        "k string, value double",
    )
    delta_df = spark.createDataFrame(deltas, "k string, value double, sign long")
    merged = merge_hist_signed(
        partial_hist_signed(base.withColumn("sign", F.lit(1)), ["k"]),
        partial_hist_signed(delta_df, ["k"]),
        ["k"],
    )
    oneshot = partial_hist_signed(post.withColumn("sign", F.lit(1)), ["k"])
    assert {tuple(r) for r in merged.collect()} == {
        tuple(r) for r in oneshot.collect()
    }
    assert {tuple(r) for r in hist_quantiles(merged, ["k"]).collect()} == {
        tuple(r) for r in hist_quantiles(oneshot, ["k"]).collect()
    }


def test_hist_bucket_drained_to_net_zero_vanishes(spark):
    """A bucket whose count is retracted to zero leaves NO row in the
    merged state (count is liveness — same contract as the signed
    rollup)."""
    from etl__project_spark.operators import merge_hist_signed, partial_hist_signed

    base = spark.createDataFrame(
        [("a", 5.0), ("a", 15.0)], "k string, value double"
    )
    kill = spark.createDataFrame(
        [("a", 15.0, -1)], "k string, value double, sign long"
    )
    merged = merge_hist_signed(
        partial_hist_signed(base.withColumn("sign", F.lit(1)), ["k"]),
        partial_hist_signed(kill, ["k"]),
        ["k"],
    )
    assert [(r["bucket"], r["n"]) for r in merged.collect()] == [(0, 1)]


def test_cms_signed_churn_no_underestimate_and_prunes(spark):
    """Turnstile CMS on a skewed fixture: after deletes and a key remap,
    (a) every live key's estimate ≥ its exact count (no false
    negatives at any threshold), (b) thresholding the sketch prunes
    the candidate set well below the key count, and (c) exact-verify
    over the candidates returns exactly the true heavy hitters."""
    from etl__project_spark.datapipe.sketches import (
        cms_cells_signed,
        cms_estimate_keys,
        cms_merge_signed,
    )

    hot = [("h1",)] * 200 + [("h2",)] * 200
    cold = [(f"c{i}",) for i in range(300)]
    base = spark.createDataFrame(hot + cold, "k string")
    cells = cms_cells_signed(base.withColumn("sign", F.lit(1)), "k")
    # churn: 150 of h2's rows deleted (drops below threshold), one cold
    # key remapped onto another (mass moves between keys)
    delta = spark.createDataFrame(
        [("h2", -1)] * 150 + [("c0", -1), ("c1", 1)], "k string, sign long"
    )
    cells = cms_merge_signed(cells, cms_cells_signed(delta, "k"))
    post = {"h1": 200, "h2": 50, "c1": 2}
    post.update({f"c{i}": 1 for i in range(2, 300)})
    keys = spark.createDataFrame([(k,) for k in post], "k string")
    est = {
        r["k"]: r["est_count"]
        for r in cms_estimate_keys(keys, cells, "k").collect()
    }
    assert all(est[k] >= n for k, n in post.items())  # (a)
    threshold = 100
    candidates = {k for k, e in est.items() if e >= threshold}
    truth = {k for k, n in post.items() if n >= threshold}
    assert truth <= candidates  # soundness
    assert len(candidates) < len(post) // 2  # (b) pruning is real
    exact_hh = {k: post[k] for k in candidates if post[k] >= threshold}
    assert exact_hh == {"h1": 200}  # (c)


def test_exact_quantile_2pass_matches_sorted_truth(spark):
    """Two-pass refinement returns the exact ceil(q·N)-th smallest value
    — including when the rank lands exactly on a bucket boundary, under
    duplicate values, and for even/odd N and a non-median q."""
    import random

    from etl__project_spark.operators import exact_quantile_2pass

    random.seed(7)
    cases = {
        # boundary: 10 values fill bucket 0 exactly, rank 5 is inside it
        "edge": [float(i) for i in range(1, 11)],
        # duplicates straddling the median rank
        "dups": [5.0] * 4 + [15.0] * 4 + [15.0, 25.0],
        "odd": [random.randrange(1, 4000) / 4.0 for _ in range(31)],
        "even": [random.randrange(1, 4000) / 4.0 for _ in range(32)],
    }
    rows = [(k, v) for k, vs in cases.items() for v in vs]
    df = spark.createDataFrame(rows, "k string, value double")
    for num, den in ((1, 2), (9, 10)):
        got = {
            r["k"]: (r["n_events"], r["q_cents"])
            for r in exact_quantile_2pass(df, ["k"], num=num, den=den).collect()
        }
        for k, vs in cases.items():
            srt = sorted(round(v, 2) for v in vs)
            rank = (num * len(vs) + den - 1) // den
            assert got[k] == (len(vs), int(srt[rank - 1] * 100)), (k, num, den)


def test_join_stats_flip_broadcast_to_salted_plan(spark):
    """VERDICT r8 #8: the maintained CMS join-size bound, fed through
    build_fact's optional join_stats hook, must FLIP the plan — a dim
    whose estimate exceeds the broadcast limit joins via the salted
    shuffle (no BroadcastHashJoin for that lookup; the dim side is
    exploded over the salt range), while an under-threshold estimate
    keeps the broadcast star join. Results are identical either way."""
    from etl__project_spark.operators.fact import build_fact

    staging = spark.createDataFrame(
        [("a", i) for i in range(100)] + [("b", i) for i in range(100, 120)],
        "nk string, payload int",
    )
    dim = spark.createDataFrame(
        [("a", 1), ("b", 2)], "dim_nk string, sk long"
    )
    dims = {"sk": (dim, "nk", "dim_nk")}

    bcast = build_fact(staging, dims)
    salted = build_fact(staging, dims, join_stats={"sk": 10**9})
    under = build_fact(staging, dims, join_stats={"sk": 10})

    p_b = bcast._jdf.queryExecution().executedPlan().toString()
    p_s = salted._jdf.queryExecution().executedPlan().toString()
    p_u = under._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in p_b and "BroadcastHashJoin" in p_u
    assert "BroadcastHashJoin" not in p_s, "over-threshold estimate did not flip the plan"
    assert "Generate explode" in p_s or "Explode" in p_s or "explode" in p_s.lower()

    want = sorted(r["sk"] for r in bcast.collect())
    assert sorted(r["sk"] for r in salted.collect()) == want
    assert sorted(r["sk"] for r in under.collect()) == want


def test_join_stats_from_cms_reads_maintained_grids(spark, tmp_path):
    """join_stats_from_cms derives each dim's bound from the two
    maintained turnstile-CMS grids in the warehouse, and the bound never
    underestimates the true join size (exact-plus-collisions)."""
    from etl__project_spark.datapipe.sketches import cms_cells_signed
    from etl__project_spark.plans.star_load import (
        ParquetWarehouse,
        join_stats_from_cms,
    )
    from etl__project_spark.streaming.pipeline import CMS_CELLS_SCHEMA

    wh = ParquetWarehouse(spark, str(tmp_path / "js_wh"))
    fact_keys = spark.createDataFrame(
        [(f"k{i % 5}",) for i in range(50)], "key string"
    ).withColumn("sign", F.lit(1))
    dim_keys = spark.createDataFrame(
        [(f"k{i}",) for i in range(5)], "key string"
    ).withColumn("sign", F.lit(1))
    wh.publish("grid_fact", cms_cells_signed(fact_keys, "key"))
    wh.publish("grid_dim", cms_cells_signed(dim_keys, "key"))

    stats = join_stats_from_cms(wh, {"sk": ("grid_fact", "grid_dim")})
    assert stats["sk"] >= 50  # exact join size is 50 (10 fact rows x 5 keys... each key matches once)
    # absent grids -> no statistic, broadcast default preserved
    assert join_stats_from_cms(wh, {"sk2": ("nope_a", "nope_b")}) == {}


def test_analyze_ndv_stat_flips_plan_through_unified_interface(spark, tmp_path):
    """VERDICT r9 #6: the maintained ANALYZE (column, value) state is a
    second producer behind ONE stats interface
    (join_stats_from_warehouse) — a dim key column whose maintained NDV
    exceeds the broadcast row limit must flip build_fact to the salted
    shuffle, exactly as a CMS join-size bound does; producers combine
    by MAX (OOM avoidance: any flag wins)."""
    from etl__project_spark.operators.fact import build_fact
    from etl__project_spark.operators.quality import column_value_partial
    from etl__project_spark.plans.star_load import (
        ParquetWarehouse,
        join_stats_from_analyze,
        join_stats_from_warehouse,
    )

    wh = ParquetWarehouse(spark, str(tmp_path / "ndv_wh"))
    # maintained stats state over a dim whose natural key has 4000
    # distinct live values (NDV > the 2000-row broadcast limit used
    # below), plus a small second column that must NOT flag
    big_dim_rows = spark.createDataFrame(
        [(f"k{i}", f"t{i % 3}") for i in range(4000)], "nk string, tier string"
    ).withColumn("sign", F.lit(1))
    wh.publish("dim_stats_state", column_value_partial(big_dim_rows, ["nk", "tier"]))

    ndv = join_stats_from_analyze(
        wh, {"sk": ("dim_stats_state", "nk"), "tier_sk": ("dim_stats_state", "tier")}
    )
    assert ndv["sk"] == 4000 and ndv["tier_sk"] == 3
    # absent state table -> no statistic
    assert join_stats_from_analyze(wh, {"sk2": ("nope", "nk")}) == {}

    stats = join_stats_from_warehouse(
        wh, analyze_ndv={"sk": ("dim_stats_state", "nk")}
    )
    assert stats == {"sk": 4000}

    staging = spark.createDataFrame(
        [(f"k{i % 10}", i) for i in range(100)], "nk string, payload int"
    )
    dim = spark.createDataFrame(
        [(f"k{i}", i) for i in range(10)], "dim_nk string, sk long"
    )
    dims = {"sk": (dim, "nk", "dim_nk")}
    flipped = build_fact(staging, dims, join_stats=stats, broadcast_row_limit=2000)
    kept = build_fact(staging, dims, join_stats={}, broadcast_row_limit=2000)
    p_f = flipped._jdf.queryExecution().executedPlan().toString()
    p_k = kept._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" not in p_f, "high maintained NDV did not flip the plan"
    assert "BroadcastHashJoin" in p_k
    assert sorted(r["sk"] for r in flipped.collect()) == sorted(
        r["sk"] for r in kept.collect()
    )
