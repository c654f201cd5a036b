"""Deterministic sampling for training-data pipelines.

``hash_sample`` keeps a row iff a stable hash of its key falls below the
rate — unlike ``df.sample()`` this is reproducible across runs, engines,
partitionings and cluster sizes (the property dataset builders need so a
re-run selects the SAME subset), and it needs no shuffle: a narrow
filter fused into the scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hash_bucket(key: Column, n_buckets: int = 100, salt: str = "") -> Column:
    """Stable [0, n_buckets) bucket from md5 of the key (+ salt).

    md5 → first 15 hex digits → BIGINT is engine-portable (DuckDB parses
    the identical value with ('0x' || hex)::BIGINT), unlike xxhash64
    which only Spark exposes.
    """
    h = F.conv(F.substring(F.md5(F.concat(key.cast("string"), F.lit(salt))), 1, 15), 16, 10)
    return F.pmod(h.cast("long"), F.lit(n_buckets))


def hash_sample(
    df: DataFrame, rate_pct: int, key_col: str, salt: str = ""
) -> DataFrame:
    """Keep ~rate_pct% of rows, deterministically by key hash. Stratify by
    running per stratum with a different salt, or sample keys (users,
    documents) rather than rows by hashing the entity key."""
    return df.filter(hash_bucket(F.col(key_col), 100, salt) < rate_pct)
