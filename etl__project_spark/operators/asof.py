"""As-of join — an operator Spark has no native form of (the reference has
none either; this is engine capability for time-series workloads).

Implemented as a pure DataFrame composition (no Python, no
``merge_asof``-in-pandas): union the two sides with a side tag, then one
partitioned window computes ``last(right value ignoring nulls)`` in
(time, side) order, then filter back to left rows.

Scale: one shuffle on the join key; within each key partition the window
is a linear scan. This beats the per-group ``applyInPandas`` +
``pd.merge_asof`` alternative (Arrow transfer + Python) and never builds
the quadratic inequality-join pair space.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from etl__project_spark.session import state_checkpoint


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    right_cols: list[str],
    suffix: str = "_asof",
) -> DataFrame:
    """For each left row, attach the ``right_cols`` of the latest right row
    with ``right.on <= left.on`` and equal ``by`` key (NULLs when no prior
    right row exists — left-outer as-of semantics).

    Ties on ``on`` resolve right-before-left (a right row at exactly the
    left timestamp matches).
    """
    lt = left.withColumn("__side", F.lit(1))
    rt = right.select(
        by, on, *[F.col(c).alias(f"{c}{suffix}") for c in right_cols]
    ).withColumn("__side", F.lit(0))
    tagged = lt.unionByName(rt, allowMissingColumns=True)
    w = (
        Window.partitionBy(by)
        .orderBy(F.col(on).asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = tagged.select(
        "*",
        *[
            F.last(f"{c}{suffix}", ignorenulls=True).over(w).alias(f"__f_{c}")
            for c in right_cols
        ],
    )
    out = filled.filter(F.col("__side") == 1).drop(
        "__side", *[f"{c}{suffix}" for c in right_cols]
    )
    for c in right_cols:
        out = out.withColumnRenamed(f"__f_{c}", f"{c}{suffix}")
    return out


# --- Incremental maintenance (as-of IVM) -------------------------------
#
# The equi-join IVM family (operators/ivm.py) decomposes Δ(A ⋈ B) into
# key-probe joins; an AS-OF join has no such bilinear form — a single
# right-side insert at (u, t) silently re-pairs every left row between t
# and the NEXT surviving right row, none of which appear in the delta.
# The exploitable structure is an interval version of the sessionization
# neighborhood argument (operators/sessions.py): a left row's match can
# change ONLY if some right delta lands inside its current lookback span.
# Formally, for a right delta at (u, t) let nxt(t) = the smallest right
# timestamp > t among rows present BOTH before and after the batch
# (untouched rows). Any left row with ts < t never sees t; any left row
# with ts >= nxt(t) has an untouched right row in (t, ts], so its match
# is at least that row and cannot be (or have been) the delta. Hence the
# affected set is exactly covered by the windows [t, nxt(t)) — computed
# with one window function over (deltas ∪ untouched), never an
# inequality join.


def asof_affected_windows(
    delta_r: DataFrame,
    unchanged_r: DataFrame,
    on: str,
    by: str,
) -> DataFrame:
    """Per right-side delta row, the half-open interval ``[lo, hi)`` of
    left timestamps whose as-of match may change: ``lo`` = the delta's
    own timestamp, ``hi`` = the next strictly-greater timestamp among
    ``unchanged_r`` rows of the same ``by`` key (NULL = unbounded).

    Shape: one union + one per-key window over (|Δ| + |unchanged rows of
    touched keys|) rows — callers pre-restrict ``unchanged_r`` to the
    delta's ``by`` keys, so at 100 TB this touches only the churned
    users' right-side history, never the full right table."""
    d = delta_r.select(F.col(by), F.col(on).alias("__lo")).distinct()
    u = unchanged_r.select(
        F.col(by), F.col(on).alias("__uts")
    ).withColumn("__lo", F.lit(None).cast(d.schema["__lo"].dataType))
    tagged = d.withColumn("__uts", F.lit(None).cast(u.schema["__uts"].dataType)).unionByName(u)
    # Order deltas and unchanged rows on the shared time axis: a row's
    # sort key is its own timestamp; unchanged rows at EXACTLY a delta's
    # timestamp must sort before it (they bound nothing — a surviving
    # row at t means matches at t keep their value), which the
    # (ts, is_delta) compound order gives us.
    ts_axis = F.coalesce(F.col("__lo"), F.col("__uts"))
    w = (
        Window.partitionBy(by)
        .orderBy(ts_axis.asc(), F.col("__lo").isNotNull().cast("int").asc())
        .rowsBetween(1, Window.unboundedFollowing)
    )
    return (
        tagged.select(
            F.col(by),
            "__lo",
            F.min("__uts").over(w).alias("__hi"),
        )
        .filter(F.col("__lo").isNotNull())
        .select(by, F.col("__lo").alias("lo"), F.col("__hi").alias("hi"))
    )


def maintain_asof_view_cdc(
    initial_l: DataFrame,
    initial_r: DataFrame,
    cdc_batches_l: list[DataFrame | None],
    cdc_batches_r: list[DataFrame | None],
    on: str,
    by: str,
    left_keys: list[str],
    right_keys: list[str],
    suffix: str = "_asof",
    op_col: str = "op",
    delete_op: str = "D",
    checkpoint: bool = True,
) -> DataFrame:
    """Maintain ``asof_join(L, R, on, by, [on])`` while BOTH sides take
    CDC batches (late inserts, timestamp-moving updates, deletes).
    Returns the maintained view — equal to a one-shot as-of join of the
    replayed post-CDC states (pinned by the ``ev_asof_cdc`` oracle and
    an adversarial replay test).

    Per batch:

    1. CDC → signed deltas against each side's consolidated state
       (:func:`~etl__project_spark.operators.ivm.cdc_to_signed_delta`).
    2. Right deltas (both signs) become affected intervals via
       :func:`asof_affected_windows`, with ``unchanged_r`` restricted to
       the touched ``by`` keys (semi-join probe of bucketed state).
    3. Affected left rows = post-state left rows inside any window
       (equi-join on ``by`` + interval filter — windows per user are
       O(|Δ|), so this reads only churned users' left rows) ∪ the left
       batch's own touched keys.
    4. Re-pair ONLY those rows with :func:`asof_join` against the
       post-state right rows of the same ``by`` keys; splice into the
       view by key anti-join + union.

    Cost: O(|Δ| + churned users' rows); the view, both states, and the
    splice all stay key-bucketed — nothing rescans history. The windows
    arg never degenerates to an inequality join: interval membership is
    checked AFTER an equi-join on ``by``.
    """
    from etl__project_spark.operators.ivm import cdc_to_signed_delta, consolidate

    sign1 = F.lit(1).cast("long").alias("sign")
    state_l = initial_l.select("*", sign1)
    state_r = initial_r.select("*", sign1)
    l_payload = initial_l.columns
    view = asof_join(
        initial_l, initial_r.select(by, on), on=on, by=by, right_cols=[on],
        suffix=suffix,
    )
    if checkpoint:
        state_l = state_checkpoint(state_l, table_sized=True)
        state_r = state_checkpoint(state_r, table_sized=True)
        view = state_checkpoint(view, table_sized=True)
    n_batches = max(len(cdc_batches_l), len(cdc_batches_r))
    for i in range(n_batches):
        batch_l = cdc_batches_l[i] if i < len(cdc_batches_l) else None
        batch_r = cdc_batches_r[i] if i < len(cdc_batches_r) else None

        touched_by = None  # by-keys whose left rows may need re-pairing
        wins = None
        if batch_r is not None:
            delta_r = cdc_to_signed_delta(
                state_r, batch_r, right_keys, op_col=op_col, delete_op=delete_op
            )
            if checkpoint:
                delta_r = state_checkpoint(delta_r, table_sized=False)
            touched_r = batch_r.select(*right_keys).distinct()
            d_by = delta_r.select(by).distinct()
            unchanged_r = state_r.join(
                touched_r, right_keys, "left_anti"
            ).join(d_by, [by], "left_semi")
            wins = asof_affected_windows(delta_r, unchanged_r, on, by)
            state_r = consolidate(state_r.unionByName(delta_r))
            if checkpoint:
                state_r = state_checkpoint(state_r, table_sized=True)

        touched_l_keys = None
        if batch_l is not None:
            delta_l = cdc_to_signed_delta(
                state_l, batch_l, left_keys, op_col=op_col, delete_op=delete_op
            )
            if checkpoint:
                delta_l = state_checkpoint(delta_l, table_sized=False)
            touched_l_keys = batch_l.select(*left_keys).distinct()
            state_l = consolidate(state_l.unionByName(delta_l))
            if checkpoint:
                state_l = state_checkpoint(state_l, table_sized=True)

        if wins is not None:
            in_window = state_l.join(wins, [by]).filter(
                (F.col(on) >= F.col("lo"))
                & (F.col("hi").isNull() | (F.col(on) < F.col("hi")))
            ).select(*left_keys).distinct()
            touched_l_keys = (
                in_window
                if touched_l_keys is None
                else touched_l_keys.unionByName(in_window).distinct()
            )
        if touched_l_keys is None:
            continue
        if checkpoint:
            touched_l_keys = state_checkpoint(touched_l_keys, table_sized=False)

        repair_l = state_l.join(touched_l_keys, left_keys, "left_semi").select(
            *l_payload
        )
        repair_by = repair_l.select(by).distinct()
        repair_r = state_r.join(repair_by, [by], "left_semi").select(by, on)
        new_pairs = asof_join(
            repair_l, repair_r, on=on, by=by, right_cols=[on], suffix=suffix
        )
        view = view.join(touched_l_keys, left_keys, "left_anti").unionByName(
            new_pairs
        )
        if checkpoint:
            view = state_checkpoint(view, table_sized=True)
    return view
