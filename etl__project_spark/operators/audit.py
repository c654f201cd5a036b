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
