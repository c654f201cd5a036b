"""As-of join IVM (operators/asof.py maintain_asof_view_cdc): the
non-equi maintenance cases the equi-join delta algebra can't express —
a right insert re-pairs left rows it never joins to in the delta, a
right delete falls affected rows back to the PREDECESSOR, and both
sides churn in the same batch. Replay oracle = one-shot asof_join of
the post-CDC states."""

from __future__ import annotations

import datetime
import random

from etl__project_spark.operators.asof import asof_join, maintain_asof_view_cdc

T0 = datetime.datetime(2024, 1, 1, 12, 0, 0)


def _ts(seconds: float) -> datetime.datetime:
    return T0 + datetime.timedelta(seconds=seconds)


def _left(spark, rows):
    """rows: (event_id, user_id, seconds)"""
    return spark.createDataFrame(
        [(eid, u, _ts(s)) for eid, u, s in rows],
        "event_id long, user_id long, ts timestamp",
    )


def _right(spark, rows):
    """rows: (sid, user_id, seconds)"""
    return spark.createDataFrame(
        [(sid, u, _ts(s)) for sid, u, s in rows],
        "sid long, user_id long, ts timestamp",
    )


def _lbatch(spark, rows):
    return spark.createDataFrame(
        [(eid, u, _ts(s), op) for eid, u, s, op in rows],
        "event_id long, user_id long, ts timestamp, op string",
    )


def _rbatch(spark, rows):
    return spark.createDataFrame(
        [(sid, u, _ts(s), op) for sid, u, s, op in rows],
        "sid long, user_id long, ts timestamp, op string",
    )


def _pairs(df):
    return sorted(
        (r["event_id"], r["user_id"], r["ts_asof"]) for r in df.collect()
    )


def _maintain_keyed(initial_l, initial_r, batches_l, batches_r):
    """Variant keeping the right key column in state (so updates/deletes
    address individual right rows even at duplicate timestamps)."""
    return maintain_asof_view_cdc(
        initial_l,
        initial_r,
        batches_l,
        batches_r,
        on="ts",
        by="user_id",
        left_keys=["event_id"],
        right_keys=["sid"],
    )


def test_right_insert_repairs_interior_rows_only(spark):
    """Signups at t=0 and t=100; purchases at 10, 50, 150. Inserting a
    signup at t=40 re-pairs ONLY the t=50 purchase (t=10 is before it,
    t=150 is shielded by the surviving t=100 signup)."""
    lt = _left(spark, [(1, 1, 10), (2, 1, 50), (3, 1, 150)])
    rt = _right(spark, [(10, 1, 0), (11, 1, 100)])
    got = _maintain_keyed(lt, rt, [], [_rbatch(spark, [(12, 1, 40, "I")])])
    assert _pairs(got) == [
        (1, 1, _ts(0)),
        (2, 1, _ts(40)),
        (3, 1, _ts(100)),
    ]


def test_right_delete_falls_back_to_predecessor_or_null(spark):
    """Deleting the matched signup re-pairs to the previous one; with no
    predecessor the match becomes NULL (left-outer as-of)."""
    lt = _left(spark, [(1, 1, 10), (2, 1, 50)])
    rt = _right(spark, [(10, 1, 5), (11, 1, 40)])
    got = _maintain_keyed(lt, rt, [], [_rbatch(spark, [(11, 1, 40, "D")])])
    assert _pairs(got) == [(1, 1, _ts(5)), (2, 1, _ts(5))]
    got2 = _maintain_keyed(
        lt,
        rt,
        [],
        [_rbatch(spark, [(10, 1, 5, "D"), (11, 1, 40, "D")])],
    )
    assert _pairs(got2) == [(1, 1, None), (2, 1, None)]


def test_right_update_moves_match_across_a_purchase(spark):
    """Moving the only signup from t=5 to t=60 flips the t=50 purchase
    to NULL and leaves the t=80 purchase matched at the new position."""
    lt = _left(spark, [(1, 1, 50), (2, 1, 80)])
    rt = _right(spark, [(10, 1, 5)])
    got = _maintain_keyed(lt, rt, [], [_rbatch(spark, [(10, 1, 60, "U")])])
    assert _pairs(got) == [(1, 1, None), (2, 1, _ts(60))]


def test_left_churn_probes_current_right_state(spark):
    """Left inserts pair against the post-CDC right state; left updates
    re-pair at the new timestamp; left deletes drop the view row."""
    lt = _left(spark, [(1, 1, 10), (2, 1, 50)])
    rt = _right(spark, [(10, 1, 0), (11, 1, 30)])
    got = _maintain_keyed(
        lt,
        rt,
        [_lbatch(spark, [(3, 1, 35, "I"), (1, 1, 31, "U"), (2, 1, 50, "D")])],
        [],
    )
    assert _pairs(got) == [(1, 1, _ts(30)), (3, 1, _ts(30))]


def test_same_batch_both_sides_cross_case(spark):
    """A signup insert and the purchase it should capture arrive in the
    SAME batch; meanwhile another user's matched signup is deleted."""
    lt = _left(spark, [(1, 2, 100)])
    rt = _right(spark, [(10, 2, 90)])
    got = _maintain_keyed(
        lt,
        rt,
        [_lbatch(spark, [(2, 1, 20, "I")])],
        [_rbatch(spark, [(11, 1, 15, "I"), (10, 2, 90, "D")])],
    )
    assert _pairs(got) == [(1, 2, None), (2, 1, _ts(15))]


def test_tie_signup_at_exact_purchase_ts_matches(spark):
    lt = _left(spark, [(1, 1, 10)])
    rt = _right(spark, [(10, 1, 0)])
    got = _maintain_keyed(lt, rt, [], [_rbatch(spark, [(11, 1, 10, "I")])])
    assert _pairs(got) == [(1, 1, _ts(10))]


def test_asof_random_property_vs_replay(spark):
    """Random churn on both sides over 3 batches equals a one-shot as-of
    join of the replayed final states."""
    random.seed(83)
    lstate = {}  # event_id -> (user, sec)
    rstate = {}  # sid -> (user, sec)
    for eid in range(40):
        lstate[eid] = (random.randrange(4), random.randrange(200))
    for sid in range(15):
        rstate[sid] = (random.randrange(4), random.randrange(200))
    initial_l = _left(spark, [(e, u, s) for e, (u, s) in lstate.items()])
    initial_r = _right(spark, [(i, u, s) for i, (u, s) in rstate.items()])
    batches_l, batches_r = [], []
    next_eid, next_sid = 100, 100
    for _ in range(3):
        lops, seen = [], set()
        for _ in range(8):
            if lstate and random.random() < 0.4:
                eid = random.choice(list(lstate))
                if eid in seen:
                    continue
                seen.add(eid)
                u, s = lstate[eid]
                if random.random() < 0.5:
                    lops.append((eid, u, s, "D"))
                    del lstate[eid]
                else:
                    ns = random.randrange(200)
                    lops.append((eid, u, ns, "U"))
                    lstate[eid] = (u, ns)
            else:
                eid, next_eid = next_eid, next_eid + 1
                u, s = random.randrange(4), random.randrange(200)
                lops.append((eid, u, s, "I"))
                lstate[eid] = (u, s)
                seen.add(eid)
        rops, rseen = [], set()
        for _ in range(5):
            if rstate and random.random() < 0.5:
                sid = random.choice(list(rstate))
                if sid in rseen:
                    continue
                rseen.add(sid)
                u, s = rstate[sid]
                if random.random() < 0.5:
                    rops.append((sid, u, s, "D"))
                    del rstate[sid]
                else:
                    ns = random.randrange(200)
                    rops.append((sid, u, ns, "U"))
                    rstate[sid] = (u, ns)
            else:
                sid, next_sid = next_sid, next_sid + 1
                u, s = random.randrange(4), random.randrange(200)
                rops.append((sid, u, s, "I"))
                rstate[sid] = (u, s)
                rseen.add(sid)
        batches_l.append(_lbatch(spark, lops))
        batches_r.append(_rbatch(spark, rops))
    got = _maintain_keyed(initial_l, initial_r, batches_l, batches_r)
    final_l = _left(spark, [(e, u, s) for e, (u, s) in lstate.items()])
    final_r = _right(spark, [(i, u, s) for i, (u, s) in rstate.items()])
    want = asof_join(
        final_l,
        final_r.select("user_id", "ts"),
        on="ts",
        by="user_id",
        right_cols=["ts"],
    )
    assert _pairs(got) == _pairs(want)
