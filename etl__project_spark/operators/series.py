"""Bounded time-series monitors shared by the batch catalog and the
streaming maintenance path.

These operate on a DAILY-GRAIN series — the calendar-bounded table a
100 TB event stream collapses to before any of this runs — so every
window here is the justified single-partition class (<= |days| rows).
The batch query ``ev_ewma_anomaly`` and the streaming serve view
``streaming/pipeline.py:read_daily_anomaly`` both call
:func:`ewma_flags`, so the monitor can never drift between the one-shot
and maintained paths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

EWMA_LAGS = 30
EWMA_FLAG_THRESHOLD_E4 = 5000  # |dev_ratio| > 0.5 flags, compared in 1e-4 ints


def ewma_flags(daily: DataFrame, lags: int = EWMA_LAGS) -> DataFrame:
    """EWMA anomaly flags over a (day, x) daily series.

    Each day is compared against the exponentially-weighted moving
    average of its trailing ``lags`` observed days with half-life = 1
    day (weight 2^-k for the k-th lag). Powers of TWO as decay weights
    keep the whole fold in exact integers — num = sum x_{t-k} *
    2^(lags-k), den = sum 2^(lags-k) over the lags that exist — no
    float pow(), no float summation; the two final divides floor-
    quantize to 4 dp and the ±50% flag compares the already-quantized
    integer, so the boolean can never straddle an ulp. Warm-up days
    (no lag-1) are excluded rather than zero-filled.

    Returns columns: day, x, ewma, dev_ratio, flag.
    """
    wo = Window.orderBy("day")
    lag_cols = [F.lag("x", k).over(wo).alias(f"g{k}") for k in range(1, lags + 1)]
    ld = daily.select("day", "x", *lag_cols)

    def dec(c):
        return c.cast("decimal(18,0)")

    num = None
    den = None
    for k in range(1, lags + 1):
        w = 2 ** (lags - k)
        n_t = F.when(
            F.col(f"g{k}").isNotNull(), dec(F.col(f"g{k}")) * F.lit(w)
        ).otherwise(F.lit(0).cast("decimal(18,0)"))
        d_t = F.when(F.col(f"g{k}").isNotNull(), F.lit(w)).otherwise(0).cast(
            "decimal(18,0)"
        )
        num = n_t if num is None else num + n_t
        den = d_t if den is None else den + d_t
    f = ld.filter(F.col("g1").isNotNull()).select(
        "day", "x", num.alias("num"), den.alias("den")
    )
    devq = F.floor(
        (dec(F.col("x")) * F.col("den") - F.col("num")).cast("double")
        / F.col("num").cast("double")
        * 10000
        + F.lit(0.5)
    )
    return f.select(
        "day",
        "x",
        (
            F.floor(
                F.col("num").cast("double") / F.col("den").cast("double") * 10000
                + F.lit(0.5)
            )
            / 10000.0
        ).alias("ewma"),
        (devq / 10000.0).alias("dev_ratio"),
        (F.abs(devq) > EWMA_FLAG_THRESHOLD_E4).alias("flag"),
    )


def big_ticket() -> "F.Column":
    """The conversion-event predicate shared by the batch KM query
    (``ev_survival_km``), the A/B conversion tests, and the streaming
    per-user conversion fold — one definition so the curves can never
    disagree about what "converted" means."""
    return (F.col("event_type") == "purchase") & (F.col("value") > 180)


def survival_curve(users: DataFrame) -> DataFrame:
    """Kaplan-Meier product-limit curve over a per-user conversion
    table with columns ``first_day`` (DATE), ``conv_day`` (DATE,
    null = never converted) and ``last_day`` (DATE).

    t = days from first_day to conv_day for converters (event), or to
    the global max(last_day) for the censored. Factors ln(1 - d/r)
    are quantized to integer micro-units before the prefix sum (the
    ``doc_unigram_logprob`` discipline); the d = r "curve hits zero"
    boundary travels as an exact integer flag. Everything after the
    per-user table lives on the <= |days|-row histogram — the same
    justified single-partition class as :func:`ewma_flags`.

    Returns columns: t_day, n_risk, n_events, n_censored, survival.
    """
    mx = users.agg(F.max("last_day").alias("dmax"))
    usr = users.crossJoin(F.broadcast(mx)).select(
        F.when(
            F.col("conv_day").isNotNull(),
            F.datediff("conv_day", "first_day"),
        )
        .otherwise(F.datediff("dmax", "first_day"))
        .cast("long")
        .alias("t"),
        F.when(F.col("conv_day").isNotNull(), 1).otherwise(0).alias("ev"),
    )
    days = usr.groupBy("t").agg(
        F.sum("ev").alias("d"), F.sum(1 - F.col("ev")).alias("c")
    )
    wdesc = Window.orderBy(F.desc("t")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    risk = days.select(
        "t", "d", "c", F.sum(F.col("d") + F.col("c")).over(wdesc).alias("r")
    )
    terms = risk.filter(F.col("d") > 0).select(
        "t",
        "d",
        "c",
        "r",
        F.when(
            F.col("d") < F.col("r"),
            F.floor(
                F.log(
                    (F.col("r") - F.col("d")).cast("double")
                    / F.col("r").cast("double")
                )
                * 1000000
                + F.lit(0.5)
            ),
        ).otherwise(F.lit(0)).cast("long").alias("qln"),
        F.when(F.col("d") >= F.col("r"), 1).otherwise(0).alias("dead"),
    )
    wasc = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    curve = terms.select(
        "t",
        "d",
        "c",
        "r",
        F.sum("qln").over(wasc).alias("cq"),
        F.sum("dead").over(wasc).alias("zp"),
    )
    return curve.select(
        F.col("t").alias("t_day"),
        F.col("r").alias("n_risk"),
        F.col("d").alias("n_events"),
        F.col("c").alias("n_censored"),
        F.when(F.col("zp") > 0, F.lit(0.0))
        .otherwise(
            F.floor(
                F.exp(F.col("cq").cast("double") / F.lit(1000000.0)) * 10000
                + F.lit(0.5)
            )
            / 10000.0
        )
        .alias("survival"),
    )
