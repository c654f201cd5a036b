"""Skew mitigation for joins — the hand-rolled complement to AQE's
``skewJoin`` (enabled in session.py), for when a hot key must be split
deterministically.

``salted_join``: the big (skewed) side gets a deterministic salt in
[0, n); the small side is exploded ×n so every (key, salt) bucket can
join. The hot key's rows spread over n tasks instead of one. Cost: the
small side is replicated n× — use only when the small side is modest and
one key dominates (else AQE's runtime splitting is cheaper).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``big ⋈ small`` on ``key`` with the big side salted.

    The salt is derived from xxhash64 of the full row's key + a row-local
    disambiguator — deterministic, uniform, no Python. Result equals the
    plain join (tested), with the shuffle keyed on (key, salt).
    """
    big_s = big.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), n_salts)
    )
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias("__salt")
    small_s = small.select("*", salts)
    out = big_s.join(small_s, [key, "__salt"], how)
    return out.drop("__salt")
