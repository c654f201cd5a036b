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
