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


def test_cdc_apply_latest_wins_and_deletes(spark):
    from etl__project_spark.operators import cdc_apply

    changes = spark.createDataFrame(
        [
            # key 1: insert then update — latest update wins
            (1, 10, "U", 1.0),
            (1, 20, "U", 2.0),
            # key 2: update then delete — key vanishes
            (2, 10, "U", 5.0),
            (2, 30, "D", None),
            # key 3: delete then re-insert — resurrection wins
            (3, 10, "D", None),
            (3, 40, "U", 7.0),
            # key 4: same seq impossible here; single op
            (4, 5, "U", 9.0),
        ],
        "id long, seq long, op string, v double",
    )
    out = cdc_apply(changes, key_cols=["id"], seq_cols=["seq"])
    got = sorted((r["id"], r["seq"], r["v"]) for r in out.collect())
    assert got == [(1, 20, 2.0), (3, 40, 7.0), (4, 5, 9.0)]


def test_cdc_apply_is_associative_across_batches(spark):
    """latest-wins(all) == latest-wins(latest-wins(b1) ∪ b2-survivors) —
    the property that lets the same operator run per-micro-batch."""
    from etl__project_spark.operators import cdc_apply

    rows = [(k, s, "D" if (k + s) % 5 == 0 else "U", float(k * 100 + s))
            for k in range(6) for s in range(1, 7)]
    full = spark.createDataFrame(rows, "id long, seq long, op string, v double")
    b1 = full.filter("seq <= 3")
    b2 = full.filter("seq > 3")

    one_shot = cdc_apply(full, ["id"], ["seq"])
    # incremental: compact each batch (keep tombstones!), then re-apply.
    # compaction = latest row per key per batch INCLUDING deletes:
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    def compact(df):
        w = Window.partitionBy("id").orderBy(F.col("seq").desc())
        return (
            df.withColumn("__rn", F.row_number().over(w))
            .filter("__rn = 1")
            .drop("__rn")
        )

    merged = compact(b1).unionByName(compact(b2))
    incremental = cdc_apply(merged, ["id"], ["seq"])
    assert sorted(map(tuple, one_shot.collect())) == sorted(
        map(tuple, incremental.collect())
    )


def test_cdc_apply_single_exchange_no_join(spark):
    from etl__project_spark.operators import cdc_apply

    changes = spark.createDataFrame(
        [(1, 1, "U", 1.0)], "id long, seq long, op string, v double"
    )
    plan = cdc_apply(changes, ["id"], ["seq"])._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert plan.count("Exchange") <= 1


def test_delta_join_equals_one_shot_join(spark):
    """IVM algebra: folding per-batch deltas reproduces the full join —
    including pairs whose two sides arrive in different batches — with
    no duplicates."""
    import random

    from pyspark.sql import functions as F

    from etl__project_spark.operators import maintain_join_view

    random.seed(31)
    a_rows = [(random.randrange(20), i) for i in range(60)]
    b_rows = [(random.randrange(20), 100 + i) for i in range(30)]
    a = spark.createDataFrame(a_rows, "k long, av long")
    b = spark.createDataFrame(b_rows, "k long, bv long")
    # random 3-way batch split on both sides
    a_b = [a.filter(F.pmod(F.col("av"), 3) == i) for i in range(3)]
    b_b = [b.filter(F.pmod(F.col("bv"), 3) == i) for i in range(3)]
    got = sorted(map(tuple, maintain_join_view(a_b, b_b, on=["k"]).collect()))
    want = sorted(map(tuple, a.join(b, "k").collect()))
    assert got == want


def test_delta_join_batch_cost_probes_not_rejoins(spark):
    """The per-batch delta never re-joins state_a against state_b —
    only delta-probe joins appear (ΔA⋈B, A⋈ΔB, ΔA⋈ΔB)."""
    from etl__project_spark.operators import delta_join

    sa = spark.createDataFrame([(1, 10)], "k long, av long")
    sb = spark.createDataFrame([(1, 20)], "k long, bv long")
    da = spark.createDataFrame([(2, 11)], "k long, av long")
    db = spark.createDataFrame([(2, 21)], "k long, bv long")
    out = delta_join(sa, sb, da, db, on=["k"])
    # state×state pair (1,10,20) must NOT be in the delta
    assert sorted(map(tuple, out.collect())) == [(2, 11, 21)]


def test_delta_join_checkpointed_state_same_result(spark):
    import random

    from pyspark.sql import functions as F

    from etl__project_spark.operators import maintain_join_view

    random.seed(32)
    a = spark.createDataFrame(
        [(random.randrange(10), i) for i in range(40)], "k long, av long"
    )
    b = spark.createDataFrame(
        [(random.randrange(10), 100 + i) for i in range(20)], "k long, bv long"
    )
    a_b = [a.filter(F.pmod(F.col("av"), 2) == i) for i in range(2)]
    b_b = [b.filter(F.pmod(F.col("bv"), 2) == i) for i in range(2)]
    lazy = sorted(map(tuple, maintain_join_view(a_b, b_b, on=["k"]).collect()))
    ckpt = sorted(
        map(tuple, maintain_join_view(a_b, b_b, on=["k"], checkpoint=True).collect())
    )
    assert lazy == ckpt == sorted(map(tuple, a.join(b, "k").collect()))


def test_signed_ivm_absorbs_updates_and_deletes(spark):
    """Signed-delta IVM vs a replay model: maintain A⋈B while B takes
    CDC batches of inserts/updates/deletes; the consolidated view must
    equal the one-shot join against B's replayed final state."""
    from etl__project_spark.operators import maintain_join_view_cdc

    a = spark.createDataFrame(
        [(k, 10 * k + i) for k in range(6) for i in range(2)], "k long, av long"
    )
    b0 = spark.createDataFrame(
        [(1, "one"), (2, "two"), (3, "three")], "k long, bv string"
    )
    # batch 1: update k=2, insert k=4; batch 2: re-update k=2, delete k=3
    b1 = spark.createDataFrame(
        [(2, "TWO", "U"), (4, "four", "I")], "k long, bv string, op string"
    )
    b2 = spark.createDataFrame(
        [(2, "ZWEI", "U"), (3, None, "D")], "k long, bv string, op string"
    )
    view = maintain_join_view_cdc(a, b0, [b1, b2], on=["k"], key_cols_b=["k"])
    got = sorted((r["k"], r["av"], r["bv"], r["sign"]) for r in view.collect())
    # replay model: final B state, one-shot join, every multiplicity 1
    b_final = spark.createDataFrame(
        [(1, "one"), (2, "ZWEI"), (4, "four")], "k long, bv string"
    )
    want = sorted(
        (r["k"], r["av"], r["bv"], 1) for r in a.join(b_final, "k").collect()
    )
    assert got == want


def test_signed_ivm_random_property_vs_replay(spark):
    """Randomized churn: any interleaving of upserts/deletes folded
    through signed deltas equals the replayed post-state join."""
    import random

    from etl__project_spark.operators import maintain_join_view_cdc

    random.seed(41)
    a = spark.createDataFrame(
        [(random.randrange(12), i) for i in range(40)], "k long, av long"
    )
    state = {k: f"v{k}" for k in range(0, 12, 2)}
    b0 = spark.createDataFrame(list(state.items()), "k long, bv string")
    batches = []
    for bi in range(3):
        ops, seen = [], set()
        for _ in range(8):
            k = random.randrange(12)
            if k in seen:  # one op per key per batch (latest-wins input)
                continue
            seen.add(k)
            if k in state and random.random() < 0.3:
                ops.append((k, None, "D"))
                del state[k]
            else:
                v = f"v{k}b{bi}"
                ops.append((k, v, "U" if k in state else "I"))
                state[k] = v
        batches.append(
            spark.createDataFrame(ops, "k long, bv string, op string")
        )
    view = maintain_join_view_cdc(a, b0, batches, on=["k"], key_cols_b=["k"])
    b_final = spark.createDataFrame(list(state.items()), "k long, bv string")
    want_rows = a.join(b_final, "k").groupBy("k", "av", "bv").count().collect()
    want = sorted((r["k"], r["av"], r["bv"], r["count"]) for r in want_rows)
    got = sorted((r["k"], r["av"], r["bv"], r["sign"]) for r in view.collect())
    assert got == want


def test_signed_delta_retraction_cancels_exactly(spark):
    """A +1/-1 pair for the same row nets to zero after consolidation —
    no phantom rows, no negative leftovers."""
    from etl__project_spark.operators import consolidate

    signed = spark.createDataFrame(
        [(1, "x", 1), (1, "x", -1), (2, "y", 1), (2, "y", 1)],
        "k long, v string, sign long",
    )
    got = sorted(map(tuple, consolidate(signed).collect()))
    assert got == [(2, "y", 2)]


def test_leftjoin_ivm_null_extension_transitions(spark):
    """Left-outer IVM: a late insert RETRACTS the null-extended row
    (0 -> >0) and deleting a key's last match ASSERTS one (>0 -> 0);
    a key that flaps (insert then delete) ends null-extended again."""
    from etl__project_spark.operators import maintain_leftjoin_view_cdc

    a = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 30), (5, 50), (9, 90)], "k long, av long"
    )
    b0 = spark.createDataFrame([(1, "one"), (3, "three")], "k long, bv string")
    # batch 1: first matches for k=2 and k=5 arrive; batch 2: k=3 loses
    # its only match, k=5 flaps back to unmatched; k=9 never matches.
    b1 = spark.createDataFrame(
        [(2, "two", "I"), (5, "five", "I")], "k long, bv string, op string"
    )
    b2 = spark.createDataFrame(
        [(3, None, "D"), (5, None, "D")], "k long, bv string, op string"
    )
    view = maintain_leftjoin_view_cdc(a, b0, [b1, b2], on=["k"], key_cols_b=["k"])
    got = sorted((r["k"], r["av"], r["bv"], r["sign"]) for r in view.collect())
    want = [
        (1, 10, "one", 1),
        (2, 20, "two", 1),
        (3, 30, None, 1),
        (5, 50, None, 1),
        (9, 90, None, 1),
    ]
    assert got == want


def test_leftjoin_ivm_random_property_vs_replay(spark):
    """Randomized churn (VERDICT r6 #2 'property test vs replay'): any
    interleaving of upserts/deletes folded through the left-outer signed
    deltas equals the one-shot LEFT join against the replayed state."""
    import random

    from etl__project_spark.operators import maintain_leftjoin_view_cdc

    random.seed(43)
    a = spark.createDataFrame(
        [(random.randrange(12), i) for i in range(40)], "k long, av long"
    )
    state = {k: f"v{k}" for k in range(0, 12, 2)}
    b0 = spark.createDataFrame(list(state.items()), "k long, bv string")
    batches = []
    for bi in range(3):
        ops, seen = [], set()
        for _ in range(8):
            k = random.randrange(12)
            if k in seen:  # one op per key per batch (latest-wins input)
                continue
            seen.add(k)
            if k in state and random.random() < 0.4:
                ops.append((k, None, "D"))
                del state[k]
            else:
                v = f"v{k}b{bi}"
                ops.append((k, v, "U" if k in state else "I"))
                state[k] = v
        batches.append(
            spark.createDataFrame(ops, "k long, bv string, op string")
        )
    view = maintain_leftjoin_view_cdc(a, b0, batches, on=["k"], key_cols_b=["k"])
    b_final = spark.createDataFrame(
        list(state.items()) or [], "k long, bv string"
    )
    want_rows = (
        a.join(b_final, "k", "left").groupBy("k", "av", "bv").count().collect()
    )
    want = sorted((r["k"], r["av"], r["bv"], r["count"]) for r in want_rows)
    got = sorted((r["k"], r["av"], r["bv"], r["sign"]) for r in view.collect())
    assert got == want


def test_fulljoin_ivm_random_property_vs_replay(spark):
    """Full-outer IVM under randomized churn: both A-side placeholders
    (transition-maintained) and B-side null-extensions (keys with no A
    match, entering/leaving by their own sign) must equal the one-shot
    FULL join against the replayed post-state."""
    import random

    from etl__project_spark.operators import maintain_fulljoin_view_cdc

    random.seed(47)
    # A covers keys 0..8 only; B churns over 0..11 → keys 9..11 exist
    # only B-side (null-extended A payload) whenever present in B
    a = spark.createDataFrame(
        [(random.randrange(9), i) for i in range(30)], "k long, av long"
    )
    state = {k: f"v{k}" for k in range(0, 12, 2)}
    b0 = spark.createDataFrame(list(state.items()), "k long, bv string")
    batches = []
    for bi in range(3):
        ops, seen = [], set()
        for _ in range(8):
            k = random.randrange(12)
            if k in seen:
                continue
            seen.add(k)
            if k in state and random.random() < 0.4:
                ops.append((k, None, "D"))
                del state[k]
            else:
                v = f"v{k}b{bi}"
                ops.append((k, v, "U" if k in state else "I"))
                state[k] = v
        batches.append(
            spark.createDataFrame(ops, "k long, bv string, op string")
        )
    view = maintain_fulljoin_view_cdc(a, b0, batches, on=["k"], key_cols_b=["k"])
    b_final = spark.createDataFrame(
        list(state.items()) or [], "k long, bv string"
    )
    want_rows = (
        a.join(b_final, "k", "full").groupBy("k", "av", "bv").count().collect()
    )
    want = sorted(
        (r["k"], r["av"], r["bv"], r["count"]) for r in want_rows
    )
    got = sorted(
        (r["k"], r["av"], r["bv"], r["sign"]) for r in view.collect()
    )
    assert got == want
    # the B-only population is genuinely exercised
    assert any(r[1] is None for r in got)
    assert any(r[2] is None for r in got)


def test_agg_over_join_equals_view_then_aggregate(spark):
    """Composed IVM: maintaining the aggregate directly from signed join
    deltas equals consolidating the maintained view and aggregating it —
    on the same randomized churn."""
    import random

    from pyspark.sql import functions as F

    from etl__project_spark.operators import (
        maintain_agg_over_join_cdc,
        maintain_join_view_cdc,
    )

    random.seed(53)
    a = spark.createDataFrame(
        [(random.randrange(10), random.randrange(100)) for _ in range(40)],
        "k long, x long",
    )
    state = {k: k % 3 for k in range(0, 10, 2)}
    b0 = spark.createDataFrame(list(state.items()), "k long, g long")
    batches = []
    for bi in range(3):
        ops, seen = [], set()
        for _ in range(6):
            k = random.randrange(10)
            if k in seen:
                continue
            seen.add(k)
            if k in state and random.random() < 0.4:
                ops.append((k, None, "D"))
                del state[k]
            else:
                g = random.randrange(3)
                ops.append((k, g, "U" if k in state else "I"))
                state[k] = g
        batches.append(spark.createDataFrame(ops, "k long, g long, op string"))

    def partial(joined):
        return joined.groupBy("g").agg(
            F.sum("sign").cast("long").alias("n"),
            F.sum(F.col("x") * F.col("sign")).alias("total"),
        )

    direct = maintain_agg_over_join_cdc(
        a, b0, batches, on=["k"], key_cols_b=["k"],
        partial_fn=partial, agg_keys=["g"],
    )
    view = maintain_join_view_cdc(a, b0, batches, on=["k"], key_cols_b=["k"])
    via_view = view.groupBy("g").agg(
        F.sum("sign").cast("long").alias("n"),
        F.sum(F.col("x") * F.col("sign")).alias("total"),
    )
    got = sorted((r["g"], r["n"], r["total"]) for r in direct.collect())
    want = sorted((r["g"], r["n"], r["total"]) for r in via_view.collect())
    assert got == want and got  # non-empty and identical


def test_fulljoin_bothsides_same_batch_cross_transitions(spark):
    """The cross-term cases that kill a 'other side static this batch'
    shortcut (VERDICT r7 #5): in ONE batch — k=1 loses its only A row
    while its B row updates (view must end with the NEW B row
    null-extended, not the old); k=2 gains its first A row while its B
    row updates (old B null-extension retracts, matched row appears);
    k=3 gains an A row while its only B row is deleted (matched pair
    cancels in the ΔA⋈ΔB term, A-side null-extension asserts)."""
    from etl__project_spark.operators import (
        maintain_fulljoin_view_cdc_bothsides,
    )

    a0 = spark.createDataFrame([(1, 10, 100)], "k long, aid long, av long")
    b0 = spark.createDataFrame(
        [(1, "b1-old"), (2, "b2-old"), (3, "b3")], "k long, bv string"
    )
    batch_a = spark.createDataFrame(
        [(1, 10, None, "D"), (2, 20, 200, "I"), (3, 30, 300, "I")],
        "k long, aid long, av long, op string",
    )
    batch_b = spark.createDataFrame(
        [(1, "b1-new", "U"), (2, "b2-new", "U"), (3, None, "D")],
        "k long, bv string, op string",
    )
    view = maintain_fulljoin_view_cdc_bothsides(
        a0, b0, [batch_a], [batch_b],
        on=["k"], key_cols_a=["aid"], key_cols_b=["k"],
    )
    got = sorted(
        (r["k"], r["aid"], r["av"], r["bv"], r["sign"]) for r in view.collect()
    )
    want = [
        (1, None, None, "b1-new", 1),
        (2, 20, 200, "b2-new", 1),
        (3, 30, 300, None, 1),
    ]
    assert got == want


def test_fulljoin_bothsides_random_property_vs_replay(spark):
    """Both-sides churn under randomized CDC: inserts/updates/deletes on
    A (keyed by aid — updates may MOVE a row to a different join key,
    so a single op can fire transitions on two keys) and on B, folded
    through fulljoin_delta_signed_bothsides, must equal the one-shot
    FULL join of the two replayed post-states."""
    import random

    from etl__project_spark.operators import (
        maintain_fulljoin_view_cdc_bothsides,
    )

    random.seed(59)
    astate = {aid: (random.randrange(9), random.randrange(100)) for aid in range(25)}
    bstate = {k: f"v{k}" for k in range(0, 12, 2)}
    a0 = spark.createDataFrame(
        [(k, aid, v) for aid, (k, v) in astate.items()],
        "k long, aid long, av long",
    )
    b0 = spark.createDataFrame(list(bstate.items()), "k long, bv string")
    batches_a, batches_b = [], []
    next_aid = 25
    for bi in range(3):
        ops_a, seen_a = [], set()
        for _ in range(10):
            if astate and random.random() < 0.35:
                aid = random.choice(list(astate))
                if aid in seen_a:
                    continue
                seen_a.add(aid)
                if random.random() < 0.5:
                    ops_a.append((astate[aid][0], aid, None, "D"))
                    del astate[aid]
                else:  # update: may move the row to a new join key
                    nk, nv = random.randrange(9), random.randrange(100)
                    ops_a.append((nk, aid, nv, "U"))
                    astate[aid] = (nk, nv)
            else:
                aid, next_aid = next_aid, next_aid + 1
                nk, nv = random.randrange(9), random.randrange(100)
                ops_a.append((nk, aid, nv, "I"))
                astate[aid] = (nk, nv)
        ops_b, seen_b = [], set()
        for _ in range(8):
            k = random.randrange(12)
            if k in seen_b:
                continue
            seen_b.add(k)
            if k in bstate and random.random() < 0.4:
                ops_b.append((k, None, "D"))
                del bstate[k]
            else:
                v = f"v{k}b{bi}"
                ops_b.append((k, v, "U" if k in bstate else "I"))
                bstate[k] = v
        batches_a.append(
            spark.createDataFrame(ops_a, "k long, aid long, av long, op string")
        )
        batches_b.append(
            spark.createDataFrame(ops_b, "k long, bv string, op string")
        )
    view = maintain_fulljoin_view_cdc_bothsides(
        a0, b0, batches_a, batches_b,
        on=["k"], key_cols_a=["aid"], key_cols_b=["k"],
    )
    a_final = spark.createDataFrame(
        [(k, aid, v) for aid, (k, v) in astate.items()] or [],
        "k long, aid long, av long",
    )
    b_final = spark.createDataFrame(
        list(bstate.items()) or [], "k long, bv string"
    )
    want_rows = (
        a_final.join(b_final, "k", "full")
        .groupBy("k", "aid", "av", "bv")
        .count()
        .collect()
    )
    want = sorted(
        (r["k"], r["aid"], r["av"], r["bv"], r["count"]) for r in want_rows
    )
    got = sorted(
        (r["k"], r["aid"], r["av"], r["bv"], r["sign"]) for r in view.collect()
    )
    assert got == want
    assert any(r[1] is None for r in got)  # B-only keys present
    assert any(r[3] is None for r in got)  # A-only keys present


def test_fulljoin_bothsides_idle_side_batches(spark):
    """None batches (a side idling) degrade to the single-side algebra."""
    from etl__project_spark.operators import (
        maintain_fulljoin_view_cdc,
        maintain_fulljoin_view_cdc_bothsides,
    )

    a = spark.createDataFrame(
        [(1, 10), (2, 20), (4, 40)], "k long, av long"
    )
    b0 = spark.createDataFrame([(1, "one"), (3, "three")], "k long, bv string")
    b1 = spark.createDataFrame(
        [(2, "two", "I"), (1, None, "D")], "k long, bv string, op string"
    )
    both = maintain_fulljoin_view_cdc_bothsides(
        a, b0, [None], [b1], on=["k"], key_cols_a=["av"], key_cols_b=["k"]
    )
    single = maintain_fulljoin_view_cdc(
        a, b0, [b1], on=["k"], key_cols_b=["k"]
    )
    got = sorted((r["k"], r["av"], r["bv"], r["sign"]) for r in both.collect())
    want = sorted(
        (r["k"], r["av"], r["bv"], r["sign"]) for r in single.collect()
    )
    assert got == want


def test_semijoin_support_enter_exit_transitions(spark):
    """EXISTS maintenance: support counts must assert a key at 0→>0 and
    retract it at >0→0 — driven through all three CDC verbs, including
    an update whose old image qualified and whose post-image doesn't
    (predicate-crossing, the case a naive filtered-insert feed misses)."""
    from pyspark.sql import functions as F

    from etl__project_spark.operators import maintain_semijoin_support_cdc

    # qualifying = q >= 10. k1: one qualifying row; k2: none; k3: two.
    initial = spark.createDataFrame(
        [("k1", 1, 12.0), ("k2", 1, 3.0), ("k3", 1, 11.0), ("k3", 2, 15.0)],
        "k string, ln long, q double",
    )
    # batch1: k2 gains its first qualifying row (ENTER); k1's only
    # qualifying row is updated BELOW the predicate (EXIT by update);
    # k3 loses one of two (stays, support 2→1).
    batch1 = spark.createDataFrame(
        [
            ("k2", 2, 10.0, "I"),
            ("k1", 1, 4.0, "U"),
            ("k3", 1, 11.0, "D"),
        ],
        "k string, ln long, q double, op string",
    )
    # batch2: k3's last qualifying row deleted (EXIT by delete).
    batch2 = spark.createDataFrame(
        [("k3", 2, 15.0, "D")], "k string, ln long, q double, op string"
    )
    support = maintain_semijoin_support_cdc(
        initial,
        [batch1, batch2],
        on=["k"],
        key_cols_b=["k", "ln"],
        qualifies=F.col("q") >= 10,
    )
    got = {(r["k"], r["n_support"]) for r in support.collect()}
    assert got == {("k2", 1)}


def test_semijoin_support_random_churn_matches_recompute(spark):
    """Randomized CDC churn over the support state equals the one-shot
    EXISTS evaluation of the replayed post state."""
    import random

    from pyspark.sql import functions as F

    from etl__project_spark.operators import maintain_semijoin_support_cdc

    random.seed(47)
    state = {
        (f"k{i % 12}", ln): float(random.randrange(1, 20))
        for i in range(40)
        for ln in (1, 2)
    }
    initial = spark.createDataFrame(
        [(k, ln, q) for (k, ln), q in state.items()],
        "k string, ln long, q double",
    )
    batches = []
    for _ in range(2):
        ops = []
        keys = list(state)
        for key in random.sample(keys, 8):
            verb = random.choice(["U", "D"])
            if verb == "D":
                state.pop(key)
                ops.append((key[0], key[1], 0.0, "D"))
            else:
                state[key] = float(random.randrange(1, 20))
                ops.append((key[0], key[1], state[key], "U"))
        newkey = (f"k{random.randrange(12)}", random.randrange(100, 200))
        state[newkey] = float(random.randrange(1, 20))
        ops.append((newkey[0], newkey[1], state[newkey], "I"))
        batches.append(
            spark.createDataFrame(ops, "k string, ln long, q double, op string")
        )
    support = maintain_semijoin_support_cdc(
        initial, batches, on=["k"], key_cols_b=["k", "ln"],
        qualifies=F.col("q") >= 10,
    )
    got = {(r["k"], r["n_support"]) for r in support.collect()}
    want = {}
    for (k, _ln), q in state.items():
        if q >= 10:
            want[k] = want.get(k, 0) + 1
    assert got == set(want.items())
