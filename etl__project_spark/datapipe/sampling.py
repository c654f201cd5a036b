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


def hash_priority(key: Column, salt: str = "bk") -> Column:
    """Raw 60-bit md5 priority (the :func:`hash_bucket` hash without the
    modulus) — the ordering key for bottom-k sketches and consistent
    fixed-size samples. Engine-portable: DuckDB computes the identical
    value as ('0x' || substr(md5(key || salt), 1, 15))::BIGINT."""
    return F.conv(
        F.substring(F.md5(F.concat(key.cast("string"), F.lit(salt))), 1, 15),
        16,
        10,
    ).cast("long")


def hash_sample(
    df: DataFrame, rate_pct: int, key_col: str, salt: str = ""
) -> DataFrame:
    """Keep ~rate_pct% of rows, deterministically by key hash. Stratify by
    running per stratum with a different salt, or sample keys (users,
    documents) rather than rows by hashing the entity key."""
    return df.filter(hash_bucket(F.col(key_col), 100, salt) < rate_pct)


def pack_sequences(
    df: DataFrame,
    budget: int = 512,
    n_groups: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Sequence packing (concat-and-chunk): assign every document a
    (pack_id, start_offset) inside fixed ``budget``-token training
    sequences — the standard pretraining data-prep step that turns
    ragged documents into dense, fixed-length model inputs.

    Exact first-fit bin packing is inherently sequential; what
    production packers actually do is concatenate a stream and cut every
    ``budget`` tokens, letting documents straddle cut points. That
    formulation parallelizes: documents are hash-partitioned into
    ``n_groups`` independent streams (deterministic ``id % n_groups``,
    engine-portable), each stream orders by id and takes a running token
    cumsum (one partitioned window — no global sort, no single-task
    stage), and the pack id is the start offset's budget multiple.
    Waste is bounded by the per-group tail (< budget tokens per group).

    Returns (id, n_tokens, pack_id, start_offset) where
    ``pack_id = group * 2^32 + floor(start_in_group / budget)`` is
    globally unique and ``start_offset`` is the position within the
    group's concatenated stream at which this document begins.
    """
    from pyspark.sql import Window

    n_tokens = F.size(F.split(F.col(text_col), " "))
    grouped = df.select(
        F.col(id_col),
        n_tokens.cast("long").alias("n_tokens"),
        F.pmod(F.col(id_col), F.lit(n_groups)).cast("long").alias("__grp"),
    )
    w = (
        Window.partitionBy("__grp")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = F.sum("n_tokens").over(w) - F.col("n_tokens")
    return grouped.select(
        id_col,
        "n_tokens",
        (
            F.col("__grp") * F.lit(2**32)
            + F.floor(start / F.lit(budget))
        ).cast("long").alias("pack_id"),
        start.cast("long").alias("start_offset"),
    )


def stratified_hash_sample(
    df: DataFrame,
    rates_pct: dict[str, int],
    stratum_col: str,
    key_col: str,
    default_pct: int = 0,
    salt: str = "",
) -> DataFrame:
    """Per-stratum deterministic sampling: keep ~``rates_pct[stratum]``%
    of each stratum's rows (``default_pct`` for unlisted strata), by the
    same engine-portable md5 bucket as ``hash_sample``.

    This is the dataset-mixing primitive in sampling-fraction form: when
    sources have target weights (wiki oversampled, crawl downsampled),
    one narrow filter applies every per-source rate in a single scan —
    no shuffle, no per-source jobs, reproducible across runs and
    engines. Spark's ``df.sampleBy`` is the built-in analogue but is
    seed-dependent on partitioning; hash-of-key sampling is not.
    """
    rate = F.lit(default_pct)
    for stratum, pct in sorted(rates_pct.items()):
        rate = F.when(F.col(stratum_col) == stratum, F.lit(pct)).otherwise(rate)
    return df.filter(hash_bucket(F.col(key_col), 100, salt) < rate)
