"""Funnel maintenance under CDC (operators/funnel.py): a late signup
must retroactively advance a user through several stages at once, a
deleted signup must retreat them from all of them, and random churn
must replay to the one-shot funnel."""

from __future__ import annotations

import datetime
import random

from etl__project_spark.operators.funnel import (
    funnel_counts_from_users,
    funnel_user_times,
    maintain_funnel_cdc,
)

T0 = datetime.datetime(2024, 1, 1, 12, 0, 0)
TYPES = ["signup", "view", "click", "purchase"]


def _ts(seconds: float) -> datetime.datetime:
    return T0 + datetime.timedelta(seconds=seconds)


def _events(spark, rows):
    """rows: (event_id, user_id, seconds, type)"""
    return spark.createDataFrame(
        [(e, u, _ts(s), t) for e, u, s, t in rows],
        "event_id long, user_id long, ts timestamp, event_type string",
    )


def _batch(spark, rows):
    return spark.createDataFrame(
        [(e, u, _ts(s), t, op) for e, u, s, t, op in rows],
        "event_id long, user_id long, ts timestamp, event_type string, op string",
    )


def _counts(df):
    return {r["stage_name"]: r["n_users"] for r in df.collect()}


def test_late_signup_retro_advances_all_stages(spark):
    """User has view→click→purchase but no signup: zero stages. The
    LATE signup (before all of them) lights up all four at once."""
    initial = _events(
        spark, [(1, 1, 10, "view"), (2, 1, 20, "click"), (3, 1, 30, "purchase")]
    )
    got = maintain_funnel_cdc(
        initial, [_batch(spark, [(4, 1, 5, "signup", "I")])]
    )
    assert _counts(got) == {"signup": 1, "view": 1, "click": 1, "purchase": 1}


def test_deleting_only_signup_retreats_every_stage(spark):
    initial = _events(
        spark,
        [
            (1, 1, 5, "signup"),
            (2, 1, 10, "view"),
            (3, 1, 20, "click"),
            (4, 1, 30, "purchase"),
        ],
    )
    got = maintain_funnel_cdc(
        initial, [_batch(spark, [(1, 1, 5, "signup", "D")])]
    )
    assert _counts(got) == {"signup": 0, "view": 0, "click": 0, "purchase": 0}


def test_ts_update_flips_strict_order(spark):
    """Moving the view AFTER the click breaks the chain at stage 3."""
    initial = _events(
        spark,
        [(1, 1, 5, "signup"), (2, 1, 10, "view"), (3, 1, 20, "click")],
    )
    got = maintain_funnel_cdc(
        initial, [_batch(spark, [(2, 1, 25, "view", "U")])]
    )
    assert _counts(got) == {"signup": 1, "view": 1, "click": 0, "purchase": 0}


def test_funnel_random_property_vs_replay(spark):
    random.seed(37)
    state = {}
    for eid in range(50):
        state[eid] = (
            random.randrange(6),
            random.randrange(100),
            random.choice(TYPES),
        )
    initial = _events(spark, [(e, u, s, t) for e, (u, s, t) in state.items()])
    batches = []
    next_eid = 100
    for _ in range(3):
        ops, seen = [], set()
        for _ in range(12):
            if state and random.random() < 0.45:
                eid = random.choice(list(state))
                if eid in seen:
                    continue
                seen.add(eid)
                u, s, t = state[eid]
                if random.random() < 0.5:
                    ops.append((eid, u, s, t, "D"))
                    del state[eid]
                else:
                    ns = random.randrange(100)
                    ops.append((eid, u, ns, t, "U"))
                    state[eid] = (u, ns, t)
            else:
                eid, next_eid = next_eid, next_eid + 1
                u, s, t = (
                    random.randrange(6),
                    random.randrange(100),
                    random.choice(TYPES),
                )
                ops.append((eid, u, s, t, "I"))
                state[eid] = (u, s, t)
                seen.add(eid)
        batches.append(_batch(spark, ops))
    got = maintain_funnel_cdc(initial, batches)
    final = _events(spark, [(e, u, s, t) for e, (u, s, t) in state.items()])
    want = funnel_counts_from_users(funnel_user_times(final))
    assert _counts(got) == _counts(want)
