"""Observability / audit operators — A3, A4, O1-O2 (SURVEY.md §2.11).

Reference: record-count print (lambda_function_s3.py:68, observed 1,333,658)
and per-column max-length audit (lambda_function_s3.py:109-110) that drove
the VARCHAR sizing (summary.pdf pp.4-5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def observed(df: DataFrame, name: str = "audit"):
    """O1 — non-blocking audit: attach an Observation that records row
    count and null-free-ness metrics as a side effect of whatever action
    the caller runs (no extra pass over the data, unlike ``count()``).

    Returns (df, observation); read ``observation.get`` after an action.
    """
    from pyspark.sql import Observation

    obs = Observation(name)
    return df.observe(obs, F.count(F.lit(1)).alias("n_records")), obs


def record_count(df: DataFrame) -> DataFrame:
    """A3 — total record count, as a 1-row frame (so it composes into plans
    and oracles instead of forcing a driver-side action)."""
    return df.agg(F.count(F.lit(1)).alias("n_records"))


def lateness_audit(
    events: DataFrame,
    ts_col: str = "ts",
    arrival_col: str = "arr_key",
    user_col: str = "user_id",
    id_col: str = "event_id",
    bin_s: int = 4,
) -> DataFrame:
    """Event-time lateness audit — the measurement that sizes a
    watermark (``streaming/windows.py:size_watermark`` consumes it).
    Per ``user_col``, in ``arrival_col`` order, how far does each
    event's timestamp lag the running max already seen? Returns ONE row:
    (n_checked, n_late, late_frac, max_lateness_s, p50_lateness_bin_s,
    p95_lateness_bin_s) — percentile bins are LOWER edges of
    ``bin_s``-second histogram bins (≤4096 cells, clamped).

    To audit GLOBAL lateness (what a job-wide watermark actually
    compares against), pass a constant ``user_col`` — per-key running
    max then equals the global running max.

    Distributed shape: one user-keyed exchange for the running-max
    window, a bounded histogram aggregate, and a CDF readoff over the
    SKETCH (bins, not events). The catalog's ``ev_lateness_audit``
    drives this on a deterministic disorder replay; tests drive it on
    synthetic known-lateness streams.
    """
    from pyspark.sql import Window

    w = (
        Window.partitionBy(user_col)
        .orderBy(arrival_col, id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    lat = (
        events.select(
            user_col,
            id_col,
            F.unix_micros(ts_col).alias("ts_us"),
            arrival_col,
        )
        .select(
            F.greatest(F.max("ts_us").over(w) - F.col("ts_us"), F.lit(0)).alias(
                "late_us"
            )
        )
        .filter(F.col("late_us").isNotNull())
    )
    hist = (
        lat.filter(F.col("late_us") > 0)
        .select(
            F.least(
                F.expr(f"late_us div {bin_s * 1_000_000}"), F.lit(4095)
            ).alias("sec_bin")
        )
        .groupBy("sec_bin")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    cdf = hist.select(
        "sec_bin",
        F.sum("c")
        .over(Window.orderBy("sec_bin").rowsBetween(Window.unboundedPreceding, 0))
        .alias("cum"),
    )
    tot = lat.agg(
        F.count(F.lit(1)).alias("n_checked"),
        F.sum(F.when(F.col("late_us") > 0, 1).otherwise(0))
        .cast("long")
        .alias("n_late"),
        (
            F.floor(
                F.coalesce(F.max("late_us"), F.lit(0)) / F.lit(1000000.0) * 100
                + F.lit(0.5)
            )
            / F.lit(100.0)
        ).alias("max_lateness_s"),
    )
    probes = events.sparkSession.createDataFrame([(0.5,), (0.95,)], "q double")
    piv = (
        cdf.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(probes))
        .filter(F.col("cum") >= F.ceil(F.col("q") * F.col("n_late")))
        .groupBy("q")
        .agg(F.min("sec_bin").alias("qbin"))
        .agg(
            (F.max(F.when(F.col("q") == 0.5, F.col("qbin"))) * bin_s)
            .cast("long")
            .alias("p50_lateness_bin_s"),
            (F.max(F.when(F.col("q") == 0.95, F.col("qbin"))) * bin_s)
            .cast("long")
            .alias("p95_lateness_bin_s"),
        )
    )
    late_frac = (
        F.floor(
            F.col("n_late").cast("double") / F.col("n_checked") * 10000 + F.lit(0.5)
        )
        / F.lit(10000.0)
    )
    return tot.crossJoin(F.broadcast(piv)).select(
        "n_checked",
        "n_late",
        late_frac.alias("late_frac"),
        "max_lateness_s",
        "p50_lateness_bin_s",
        "p95_lateness_bin_s",
    )


def max_lengths(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """A4 — max string length per column; the reference's schema-sizing audit.

    One distributed aggregate over all columns at once (single pass, partial
    aggregation map-side) instead of the reference's per-column pandas loop.
    """
    if cols is None:
        cols = [c for c, t in df.dtypes if t == "string"]
    return df.agg(
        *[F.max(F.length(F.col(c))).cast("int").alias(f"max_len_{c}") for c in cols]
    )
