"""Incremental sessionization under CDC churn (VERDICT r7 #4).

The batch sessionizer (``ev_sessionize``: 30-min inactivity gap, lag
window + conditional sum) is non-monotone under churn: a LATE INSERT
inside the gap threshold MERGES two sessions (count −1 with no row
retracted), and a DELETE of a bridging event SPLITS one (count +1).
Neither is expressible in the signed rollup algebra — a session-start
flag is a property of an event's *neighborhood*, not of the event.

The key identity this module exploits: with sessions counted as
``Σ start_flag(e)`` (flag = no same-user event within the gap window
before e), a CDC batch can only change the flags of events whose
trailing gap-window CONTAINS a delta event. Therefore

    Δ n_sessions(u) = Σ_{e ∈ post ∩ N} flag_N(e)  −  Σ_{e ∈ pre ∩ N} flag_N(e)

where N is ANY superset of the delta events' ±gap neighborhoods that is
pre/post-identical in definition: affected events have their whole gap
window inside N (so their N-local flags are exact), and unaffected
events in N get identically-computed flags pre and post (the only
set difference between pre∩N and post∩N is the delta itself, which by
definition is outside an unaffected event's window) — so their terms
cancel exactly. N here is the band over-approximation: events whose
``floor(ts / gap)`` band is within ±1 of a delta event's band — one
equi-join against band-bucketed state, no range join, no re-scan.

Per-batch cost: O(|Δ| + |state events in touched bands|) — at 100 TB
the event state is stored bucketed by (user, time-band), so the probe
touches only the bands the batch lands in; a power user's years of
history outside those bands is never read. This is strictly tighter
than the house minmax/median pattern (re-derive per touched GROUP):
sessionization re-derives per touched NEIGHBORHOOD.

Reference basis: the reference's event rollup re-aggregates each load
from scratch (`lambda_s3/lambda_function_s3.py:79` recomputes the
pandas groupby per file); this is its incremental, late/retracted-event
counterpart.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from etl__project_spark.session import state_checkpoint

from etl__project_spark.operators.ivm import cdc_to_signed_delta, consolidate


def _start_flag_sums(
    events: DataFrame, user_col: str, ts_col: str, order_col: str, gap_us: int
) -> DataFrame:
    """Per-user sum of session-start flags over the given event set.

    Flag convention matches ``ev_sessionize`` / the DuckDB oracle: order
    by (ts, order_col); start iff no predecessor or gap strictly greater
    than ``gap_us`` (microsecond precision — ties gap 0)."""
    w = Window.partitionBy(user_col).orderBy(ts_col, order_col)
    lag_us = F.lag(F.unix_micros(ts_col)).over(w)
    flag = F.when(
        lag_us.isNull() | ((F.unix_micros(ts_col) - lag_us) > gap_us), 1
    ).otherwise(0)
    return (
        events.withColumn("__flag", flag)
        .groupBy(user_col)
        .agg(F.sum("__flag").cast("long").alias("__starts"))
    )


def sessionize_counts(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
    gap_us: int = 1800 * 1_000_000,
) -> DataFrame:
    """One-shot per-user session/event counts — the init path and the
    replay oracle's twin: (user, n_sessions, n_events)."""
    w = Window.partitionBy(user_col).orderBy(ts_col, order_col)
    lag_us = F.lag(F.unix_micros(ts_col)).over(w)
    flag = F.when(
        lag_us.isNull() | ((F.unix_micros(ts_col) - lag_us) > gap_us), 1
    ).otherwise(0)
    return (
        events.withColumn("__flag", flag)
        .groupBy(user_col)
        .agg(
            F.sum("__flag").cast("long").alias("n_sessions"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


def session_count_delta(
    state: DataFrame,
    delta: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
    gap_us: int = 1800 * 1_000_000,
    sign_col: str = "sign",
) -> DataFrame:
    """Signed per-user (d_sessions, d_events) for one signed event delta
    against the PRE-batch consolidated event state.

    Neighborhood N = state events whose gap-band is within ±1 of any
    delta event's band (module docstring proves sufficiency: affected
    windows land fully inside N; unaffected flags cancel). Local flag
    sums over pre-N and post-N (= pre-N ⊎ delta, consolidated) give the
    exact session-count delta; the event-count delta is Σ sign."""
    band = (F.unix_micros(ts_col) / F.lit(gap_us)).cast("long")
    d_bands = (
        delta.select(F.col(user_col), band.alias("__b0"))
        .select(
            user_col,
            F.explode(
                F.array(F.col("__b0") - 1, F.col("__b0"), F.col("__b0") + 1)
            ).alias("__band"),
        )
        .distinct()
    )
    payload = [c for c in state.columns if c != sign_col]
    pre_n = (
        state.withColumn("__band", band)
        .join(d_bands, [user_col, "__band"])
        .select(*payload, sign_col)
    )
    post_n = consolidate(pre_n.unionByName(delta), sign_col)
    pre_part = _start_flag_sums(
        pre_n.select(*payload), user_col, ts_col, order_col, gap_us
    )
    post_part = _start_flag_sums(
        post_n.select(*payload), user_col, ts_col, order_col, gap_us
    )
    d_sessions = (
        post_part.withColumnRenamed("__starts", "__post")
        .join(pre_part.withColumnRenamed("__starts", "__pre"), user_col, "full")
        .select(
            user_col,
            (
                F.coalesce(F.col("__post"), F.lit(0))
                - F.coalesce(F.col("__pre"), F.lit(0))
            ).alias("d_sessions"),
        )
    )
    d_events = delta.groupBy(user_col).agg(
        F.sum(sign_col).cast("long").alias("d_events")
    )
    return (
        d_sessions.join(d_events, user_col, "full")
        .select(
            user_col,
            F.coalesce("d_sessions", F.lit(0)).alias("d_sessions"),
            F.coalesce("d_events", F.lit(0)).alias("d_events"),
        )
        .filter((F.col("d_sessions") != 0) | (F.col("d_events") != 0))
    )


def maintain_sessions_cdc(
    initial: DataFrame,
    cdc_batches: list[DataFrame],
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
    key_cols: list[str] | None = None,
    gap_us: int = 1800 * 1_000_000,
    op_col: str = "op",
    delete_op: str = "D",
    checkpoint: bool = True,
) -> DataFrame:
    """Maintain per-user session counts while the event log receives
    CDC batches (inserts of late events, updates that move timestamps,
    deletes). Returns (user, n_sessions, n_events) — equal to one-shot
    :func:`sessionize_counts` of the replayed post-CDC state (pinned by
    the ``ev_session_cdc`` oracle and a gap-bridging/session-splitting
    property test).

    State = (1) the distinct-grain event log, consolidated and — at
    scale — bucketed by (user, time-band); (2) the per-user counts
    table. Per batch: one probe of the touched bands, two local lag
    windows, one counts merge; nothing rescans history. ``checkpoint``
    materializes the delta (it feeds the neighborhood join and the
    counts merge), the event state, and the counts state, so batch N's
    plan is O(1) in N."""
    key_cols = key_cols or [order_col]
    sign1 = F.lit(1).cast("long").alias("sign")
    state = initial.select("*", sign1)
    counts = sessionize_counts(initial, user_col, ts_col, order_col, gap_us)
    if checkpoint:
        state = state_checkpoint(state, table_sized=True)
        counts = state_checkpoint(counts, table_sized=True)
    for batch in cdc_batches:
        delta = cdc_to_signed_delta(
            state, batch, key_cols, op_col=op_col, delete_op=delete_op
        )
        if checkpoint:
            delta = state_checkpoint(delta, table_sized=False)
        d = session_count_delta(
            state, delta, user_col, ts_col, order_col, gap_us
        )
        counts = (
            counts.unionByName(
                d.select(
                    F.col(user_col),
                    F.col("d_sessions").alias("n_sessions"),
                    F.col("d_events").alias("n_events"),
                )
            )
            .groupBy(user_col)
            .agg(
                F.sum("n_sessions").cast("long").alias("n_sessions"),
                F.sum("n_events").cast("long").alias("n_events"),
            )
            .filter(F.col("n_events") > 0)
        )
        state = consolidate(state.unionByName(delta))
        if checkpoint:
            state = state_checkpoint(state, table_sized=True)
            counts = state_checkpoint(counts, table_sized=True)
    return counts
