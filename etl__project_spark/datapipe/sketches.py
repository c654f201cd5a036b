"""Mergeable sketch primitives as reusable library functions.

The catalog proves sketch correctness against DuckDB oracles
(``ev_distinct_hll``, ``ev_quantile_digest``, ``ev_heavy_hitters_cms``);
this module packages the HLL register algebra so OTHER components — the
streaming pipeline, observability rollups — can maintain the same
sketches incrementally. Register semantics match ``ev_distinct_hll``
exactly (same hash split, same rho, same estimator), so a sketch
maintained batch-by-batch here hash-equals the one-shot catalog sketch:
mergeability is the whole contract.

At 100 TB the point of an HLL table is that per-shard/per-batch state is
a FIXED 64 longs: every executor, day-partition, or micro-batch sketches
independently and the combine is a register-wise max — associative,
commutative, idempotent, so retries and out-of-order merges are free.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

HLL_M = 64  # registers; alpha for m=64 is 0.709
HLL_SCHEMA = T.StructType(
    [T.StructField("reg", T.LongType()), T.StructField("rho", T.LongType())]
)


def hll_registers(df: DataFrame, col: str, m: int = HLL_M) -> DataFrame:
    """One HLL sketch of ``df[col]`` as (reg, rho) rows — at most ``m``.

    Identical hash discipline to the catalog oracle: a 60-bit prefix of
    md5(value || 'hll') splits into a 6-bit register index and a 54-bit
    remainder; rho is the 1-based position of the remainder's leading
    set bit counted from a 55-bit field (all-zero remainder → 55).
    GroupBy-max is the whole aggregation — two-phase, 64-cell keyspace.
    """
    hashed = df.select(
        F.conv(
            F.substring(F.md5(F.concat(F.col(col).cast("string"), F.lit("hll"))), 1, 15),
            16,
            10,
        )
        .cast("long")
        .alias("h")
    ).select(
        F.pmod(F.col("h"), F.lit(m)).alias("reg"),
        F.expr(f"h div {m}").alias("rem"),
    )
    rho = F.when(F.col("rem") == 0, F.lit(55)).otherwise(
        F.lit(55) - F.length(F.expr("bin(rem)"))
    )
    return (
        hashed.select("reg", rho.alias("rho"))
        .groupBy("reg")
        .agg(F.max("rho").alias("rho"))
    )


def hll_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Register-wise max — the associative/commutative/idempotent combine
    that makes HLL shardable and replay-safe."""
    return a.unionByName(b).groupBy("reg").agg(F.max("rho").alias("rho"))


def hll_estimate(registers: DataFrame, m: int = HLL_M) -> float:
    """Cardinality estimate from a (reg, rho) frame. Collects at most
    ``m`` rows (64 longs) — reading a sketch is a driver-side act by
    design. Uses the m=64 bias constant and the linear-counting branch
    for the small range, matching ``ev_distinct_hll``."""
    rows = {int(r["reg"]): int(r["rho"]) for r in registers.collect()}
    regs = [rows.get(i, 0) for i in range(m)]
    s_scaled = sum(1 << (55 - r) for r in regs)
    v_zero = sum(1 for r in regs if r == 0)
    e_raw = 0.709 * m * m * float(1 << 55) / s_scaled
    if v_zero > 0 and e_raw <= 2.5 * m:
        return m * math.log(m / v_zero)
    return e_raw


def hll_registers_keyed(
    df: DataFrame, key_col: str, val_col: str, m: int = HLL_M
) -> DataFrame:
    """One HLL sketch PER KEY as (key, reg, rho) rows — the grouped
    generalization of :func:`hll_registers` (identical hash/rho
    discipline, so a single-key slice hash-equals the ungrouped
    sketch). GroupBy-max over a |keys|·m cell keyspace — bounded state
    however many rows flow through; merge = groupBy (key, reg) max."""
    hashed = df.select(
        F.col(key_col),
        F.conv(
            F.substring(
                F.md5(F.concat(F.col(val_col).cast("string"), F.lit("hll"))), 1, 15
            ),
            16,
            10,
        )
        .cast("long")
        .alias("h"),
    ).select(
        key_col,
        F.pmod(F.col("h"), F.lit(m)).alias("reg"),
        F.expr(f"h div {m}").alias("rem"),
    )
    rho = F.when(F.col("rem") == 0, F.lit(55)).otherwise(
        F.lit(55) - F.length(F.expr("bin(rem)"))
    )
    return (
        hashed.select(key_col, "reg", rho.alias("rho"))
        .groupBy(key_col, "reg")
        .agg(F.max("rho").alias("rho"))
    )


# --- count-min sketch under signed updates (turnstile stream) -----------------
#
# The catalog's batch CMS (``ev_heavy_hitters_cms``) is insert-only; the
# maintenance form below accepts SIGNED updates — CDC deletes and
# update old-images decrement cells, post-images increment — which the
# CMS algebra absorbs natively (cells are plain sums). The classic
# guarantee survives in the strict turnstile setting: as long as every
# key's TRUE net count is non-negative, each cell = true + Σ(colliding
# true counts) ≥ true, so min-over-rows never underestimates and a
# threshold scan has NO FALSE NEGATIVES. That makes the maintained
# sketch a sound PRUNING filter for heavy-hitter reads: broadcast the
# d×w cells (fixed KB, independent of key cardinality), keep only keys
# whose estimate clears the threshold, and run the exact aggregate over
# the survivors — at 100 TB the exact pass touches the few candidate
# keys' rows instead of every key. Hashing reuses ``hash_bucket``'s
# md5-based scheme (engine-portable, deterministic).


def cms_cells_signed(
    df: DataFrame,
    key_col: str,
    sign_col: str = "sign",
    depth: int = 4,
    width: int = 256,
    salt: str = "cms",
) -> DataFrame:
    """One signed batch's CMS contribution: (r, b, c) cells with
    c = Σ sign per cell. All ``depth`` hash rows come from ONE pass
    over the input (explode, not a d-way union of scans)."""
    from etl__project_spark.datapipe.sampling import hash_bucket

    cells = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(j).alias("r"),
                    hash_bucket(
                        F.col(key_col), width, salt=f"{salt}{j}"
                    ).alias("b"),
                )
                for j in range(depth)
            ]
        )
    )
    return (
        df.select(cells.alias("x"), F.col(sign_col).alias("s"))
        .select("x.r", "x.b", "s")
        .groupBy("r", "b")
        .agg(F.sum("s").cast("long").alias("c"))
    )


def cms_merge_signed(existing: DataFrame, delta: DataFrame) -> DataFrame:
    """Cell-wise sum; zero cells are kept only implicitly (absent rows
    read as 0 — ``cms_estimate_keys`` left-joins and coalesces)."""
    return (
        existing.unionByName(delta.select(existing.columns))
        .groupBy("r", "b")
        .agg(F.sum("c").cast("long").alias("c"))
        .filter(F.col("c") != 0)
    )


def cms_estimate_keys(
    keys_df: DataFrame,
    cells: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 256,
    salt: str = "cms",
) -> DataFrame:
    """Point estimates for a key frame: est = min over the d rows of the
    key's cell counters (absent cell = 0). The cells frame is fixed-size
    (d·w rows) and is broadcast — the probe never shuffles keys_df."""
    from pyspark.sql.functions import broadcast

    from etl__project_spark.datapipe.sampling import hash_bucket

    probes = keys_df.select(
        key_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("r"),
                        hash_bucket(
                            F.col(key_col), width, salt=f"{salt}{j}"
                        ).alias("b"),
                    )
                    for j in range(depth)
                ]
            )
        ).alias("x"),
    ).select(key_col, "x.r", "x.b")
    return (
        probes.join(broadcast(cells), ["r", "b"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce("c", F.lit(0))).cast("long").alias("est_count"))
    )


def cms_join_size_bound(cells_a: DataFrame, cells_b: DataFrame) -> DataFrame:
    """Upper bound on |A ⋈ B| from the two sides' maintained CMS grids:
    min over the d hash rows of the row-wise inner product Σ_b c_a·c_b.

    With non-negative net per-key counts each cell is exact-plus-
    collisions, so the inner product never underestimates the true join
    cardinality (AGMS/CMS join-size estimation; ``ev_join_size_cdc``
    pins the no-underestimate property against an exact join under
    CDC). Both grids are fixed KB-sized tables, so the read is O(d·w)
    regardless of corpus size — cheap enough to consult per load.
    Returns a 1-row frame (est_size)."""
    ip = (
        cells_a.join(
            cells_b.select("r", "b", F.col("c").alias("cb")), ["r", "b"]
        )
        .groupBy("r")
        .agg(F.sum(F.col("c") * F.col("cb")).cast("long").alias("ip"))
    )
    return ip.agg(F.min("ip").cast("long").alias("est_size"))
