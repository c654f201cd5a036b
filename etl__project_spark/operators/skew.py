"""Skew mitigation for joins — the hand-rolled complement to AQE's
``skewJoin`` (enabled in session.py), for when a hot key must be split
deterministically.

``salted_join``: the big (skewed) side gets a salt in [0, n); the small
side is exploded ×n so every (key, salt) bucket can join. The hot key's
rows spread over n tasks instead of one. Cost: the small side is
replicated n× — use only when the small side is modest and one key
dominates (else AQE's runtime splitting is cheaper).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SUPPORTED_HOW = {"inner", "left", "left_outer", "leftouter"}


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``big ⋈ small`` on ``key`` with the big side salted.

    The salt mixes the row's column hash with a ROW-LOCAL disambiguator
    (partition id + per-partition monotonic id), so byte-identical
    duplicate rows — the classic source of hot-key skew — still spread
    across all n buckets instead of re-colliding into one. Deterministic
    given a fixed input partitioning, uniform, no Python. Result equals
    the plain join (tested), with the shuffle keyed on (key, salt).

    Only ``inner`` and ``left`` joins are supported: the small side is
    replicated n× so a right/full outer join would emit n copies of each
    unmatched small-side row.
    """
    if how not in _SUPPORTED_HOW:
        raise ValueError(
            f"salted_join supports how in {sorted(_SUPPORTED_HOW)}, got {how!r}: "
            "the exploded small side breaks right/full outer semantics"
        )
    row_local = F.monotonically_increasing_id() + F.spark_partition_id()
    big_s = big.withColumn(
        "__salt",
        F.pmod(
            F.xxhash64(*[F.col(c) for c in big.columns], row_local), n_salts
        ),
    )
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias("__salt")
    small_s = small.select("*", salts)
    out = big_s.join(small_s, [key, "__salt"], how)
    return out.drop("__salt")
