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
