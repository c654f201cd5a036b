"""Incremental sessionization under CDC (operators/sessions.py) — the
merge/split cases VERDICT r7 #4 named, plus a randomized replay
property. Gap = 10 s throughout (gap_us=10_000_000) so tiny fixtures
force real neighborhood interactions."""

from __future__ import annotations

import datetime
import random

from pyspark.sql import functions as F

from etl__project_spark.operators import (
    maintain_sessions_cdc,
    sessionize_counts,
)

GAP_US = 10 * 1_000_000
T0 = datetime.datetime(2024, 1, 1, 12, 0, 0)


def _ts(seconds: float) -> datetime.datetime:
    return T0 + datetime.timedelta(seconds=seconds)


def _events(spark, rows):
    """rows: (event_id, user_id, seconds)"""
    return spark.createDataFrame(
        [(eid, u, _ts(s)) for eid, u, s in rows],
        "event_id long, user_id long, ts timestamp",
    )


def _batch(spark, rows):
    """rows: (event_id, user_id, seconds, op)"""
    return spark.createDataFrame(
        [(eid, u, _ts(s), op) for eid, u, s, op in rows],
        "event_id long, user_id long, ts timestamp, op string",
    )


def _counts(df):
    return sorted(
        (r["user_id"], r["n_sessions"], r["n_events"]) for r in df.collect()
    )


def test_gap_bridging_insert_merges_two_sessions(spark):
    """Events at t=0 and t=15 are two sessions (gap 15 > 10); a LATE
    insert at t=7 bridges them — session count drops 2 → 1 even though
    no row was retracted."""
    initial = _events(spark, [(1, 1, 0), (2, 1, 15)])
    assert _counts(
        sessionize_counts(initial, gap_us=GAP_US)
    ) == [(1, 2, 2)]
    got = maintain_sessions_cdc(
        initial,
        [_batch(spark, [(3, 1, 7, "I")])],
        key_cols=["event_id"],
        gap_us=GAP_US,
    )
    assert _counts(got) == [(1, 1, 3)]


def test_bridge_delete_splits_one_session(spark):
    """Deleting the bridging middle event splits one session into two."""
    initial = _events(spark, [(1, 1, 0), (2, 1, 7), (3, 1, 15)])
    got = maintain_sessions_cdc(
        initial,
        [_batch(spark, [(2, 1, 7, "D")])],
        key_cols=["event_id"],
        gap_us=GAP_US,
    )
    assert _counts(got) == [(1, 2, 2)]


def test_timestamp_update_moves_event_across_boundary(spark):
    """An UPDATE shifting an event's timestamp is retract+assert: moving
    t=7 (bridge) out to t=40 splits the session AND opens a third."""
    initial = _events(spark, [(1, 1, 0), (2, 1, 7), (3, 1, 15)])
    got = maintain_sessions_cdc(
        initial,
        [_batch(spark, [(2, 1, 40, "U")])],
        key_cols=["event_id"],
        gap_us=GAP_US,
    )
    assert _counts(got) == [(1, 3, 3)]


def test_delete_all_of_users_events_drops_the_user(spark):
    initial = _events(spark, [(1, 1, 0), (2, 2, 0), (3, 2, 30)])
    got = maintain_sessions_cdc(
        initial,
        [_batch(spark, [(1, 1, 0, "D")])],
        key_cols=["event_id"],
        gap_us=GAP_US,
    )
    assert _counts(got) == [(2, 2, 2)]


def test_far_events_unaffected_by_neighborhood_recompute(spark):
    """A user's history far outside the delta's bands keeps its counts
    — and a second untouched user is never touched at all."""
    initial = _events(
        spark,
        [(1, 1, 0), (2, 1, 5), (3, 1, 1000), (4, 1, 1018), (5, 2, 0)],
    )
    got = maintain_sessions_cdc(
        initial,
        [_batch(spark, [(6, 1, 1009, "I")])],  # bridges the t=1000/1018 pair
        key_cols=["event_id"],
        gap_us=GAP_US,
    )
    # user 1: {0,5} one session; {1000,1009,1018} merged into one
    assert _counts(got) == [(1, 2, 5), (2, 1, 1)]


def test_sessions_random_property_vs_replay(spark):
    """Randomized churn over a dense timeline: any interleaving of
    late inserts, timestamp-moving updates, and deletes equals one-shot
    sessionization of the replayed post-CDC log."""
    random.seed(61)
    state = {}  # event_id -> (user, seconds)
    rows = []
    for eid in range(60):
        u, s = random.randrange(4), random.randrange(120)
        state[eid] = (u, s)
        rows.append((eid, u, s))
    initial = _events(spark, rows)
    batches = []
    next_eid = 60
    for _ in range(3):
        ops, seen = [], set()
        for _ in range(15):
            if state and random.random() < 0.45:
                eid = random.choice(list(state))
                if eid in seen:
                    continue
                seen.add(eid)
                u, s = state[eid]
                if random.random() < 0.5:
                    ops.append((eid, u, s, "D"))
                    del state[eid]
                else:  # move the event in time
                    ns = random.randrange(120)
                    ops.append((eid, u, ns, "U"))
                    state[eid] = (u, ns)
            else:
                eid, next_eid = next_eid, next_eid + 1
                u, s = random.randrange(4), random.randrange(120)
                ops.append((eid, u, s, "I"))
                state[eid] = (u, s)
                seen.add(eid)  # CDC batches are latest-wins within themselves
        batches.append(_batch(spark, ops))
    got = maintain_sessions_cdc(
        initial, batches, key_cols=["event_id"], gap_us=GAP_US
    )
    final = _events(spark, [(eid, u, s) for eid, (u, s) in state.items()])
    want = sessionize_counts(final, gap_us=GAP_US)
    assert _counts(got) == _counts(want)


def test_session_tie_ordering_matches_batch_sessionizer(spark):
    """Equal timestamps order by event_id (gap 0 → same session) in both
    the incremental and one-shot paths."""
    initial = _events(spark, [(5, 1, 0)])
    got = maintain_sessions_cdc(
        initial,
        [_batch(spark, [(2, 1, 0, "I"), (9, 1, 0, "I")])],
        key_cols=["event_id"],
        gap_us=GAP_US,
    )
    assert _counts(got) == [(1, 1, 3)]
