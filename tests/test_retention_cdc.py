"""Retention maintenance under CDC (operators/retention.py): the cohort
key is data-derived, so a late event predating a user's history must
re-key their every cell, deleting a first event must re-cohort, and
random churn must replay to the one-shot retention."""

from __future__ import annotations

import datetime
import random

from etl__project_spark.operators.retention import (
    maintain_retention_cdc,
    retention_cells,
    retention_from_membership,
)

T0 = datetime.datetime(2024, 1, 1, 12, 0, 0)  # a Monday


def _ts(days: float) -> datetime.datetime:
    return T0 + datetime.timedelta(days=days)


def _events(spark, rows):
    """rows: (event_id, user_id, days)"""
    return spark.createDataFrame(
        [(e, u, _ts(d)) for e, u, d in rows],
        "event_id long, user_id long, ts timestamp",
    )


def _batch(spark, rows):
    return spark.createDataFrame(
        [(e, u, _ts(d), op) for e, u, d, op in rows],
        "event_id long, user_id long, ts timestamp, op string",
    )


def _cells(df):
    return {
        (r["cohort_week"], r["offset_weeks"]): r["n_active_users"]
        for r in df.collect()
    }


def _oneshot(post):
    return retention_from_membership(retention_cells(post))


def test_late_earlier_event_rekeys_every_cell(spark):
    """User active in weeks 2 and 3 (cohort = week 2). A LATE insert in
    week 0 moves their cohort back two weeks and shifts every offset —
    the old cells must vanish wholesale."""
    initial = _events(spark, [(1, 1, 14), (2, 1, 21)])
    before = _cells(maintain_retention_cdc(initial, []))
    assert before == {("2024-01-15", 0): 1, ("2024-01-15", 1): 1}
    got = _cells(
        maintain_retention_cdc(
            initial, [_batch(spark, [(3, 1, 0, "I")])]
        )
    )
    assert got == {
        ("2024-01-01", 0): 1,
        ("2024-01-01", 2): 1,
        ("2024-01-01", 3): 1,
    }


def test_deleting_first_event_recohorts(spark):
    """Deleting the cohort-defining first event re-keys the survivor
    cells to the NEXT earliest event's week."""
    initial = _events(spark, [(1, 1, 0), (2, 1, 14)])
    got = _cells(
        maintain_retention_cdc(initial, [_batch(spark, [(1, 1, 0, "D")])])
    )
    assert got == {("2024-01-15", 0): 1}


def test_deleting_users_last_event_removes_them(spark):
    initial = _events(spark, [(1, 1, 0), (2, 2, 0)])
    got = _cells(
        maintain_retention_cdc(initial, [_batch(spark, [(2, 2, 0, "D")])])
    )
    assert got == {("2024-01-01", 0): 1}


def test_random_churn_replays_to_oneshot(spark):
    """Random multi-batch churn (inserts incl. history-predating ones,
    first-event deletes, timestamp updates) equals the one-shot
    retention over the replayed post state."""
    random.seed(59)
    state = {e: (e % 7, float(random.randrange(3, 40))) for e in range(60)}
    initial = _events(spark, [(e, u, d) for e, (u, d) in state.items()])
    batches, next_id = [], 100
    for _ in range(2):
        ops = []
        for e in random.sample(sorted(state), 10):
            verb = random.choice(["U", "D"])
            if verb == "D":
                u, _d = state.pop(e)
                ops.append((e, u, 0.0, "D"))
            else:
                u, _d = state[e]
                nd = float(random.randrange(0, 40))
                state[e] = (u, nd)
                ops.append((e, u, nd, "U"))
        for _ in range(3):  # late inserts, some predating history
            u = random.randrange(7)
            nd = float(random.randrange(0, 40))
            state[next_id] = (u, nd)
            ops.append((next_id, u, nd, "I"))
            next_id += 1
        batches.append(_batch(spark, ops))
    got = _cells(maintain_retention_cdc(initial, batches))
    post = _events(spark, [(e, u, d) for e, (u, d) in state.items()])
    assert got == _cells(_oneshot(post))
