"""Generate a larger-SF fixture by replicating the driver fixtures with
shifted keys (scale-smoke harness, VERDICT r1 next-round #7).

The driver fixtures are read-only and capped at sf0.1; constant-factor
scale problems (LSH bucket skew, component-loop round counts, window
state) can hide at that size. This tool replicates each table N× with
keys shifted per replica so cardinalities grow linearly (documents get a
per-replica CHARACTER ROTATION — ``translate`` through a shifted
alphabet — so replica texts share no char-k-gram shingles with their
base at all: lengths and word structure are preserved, but every
shingle is distinct across replicas. A mere text PREFIX is not enough:
char-5-gram Jaccard between 'r1 <text>' and '<text>' is ~0.97, which
turns each base document into an N-clique of near-duplicates and grows
the dedup pair space and the prefix-join candidate space quadratically
in N — no real corpus grows that way, and it OOMs similarity joins that
are perfectly healthy on linear-growth data).

Usage: python tools/gen_scale_fixture.py [src_sf_dir] [dst_dir] [n_replicas]
Defaults: /root/testdata/sf0.1 .scratch/sf1 10
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from etl__project_spark.session import get_spark  # noqa: E402
from etl__project_spark.sources.tables import load_table  # noqa: E402

# per-table key columns to shift by replica_id * stride (stride = a round
# power of ten above the source max so replica key ranges never collide)
SHIFT_COLS = {
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
}
COPY_TABLES = ["region", "nation"]  # true dimensions: do not scale


def _stride(df: DataFrame, cols: list[str]) -> int:
    mx = df.agg(*[F.max(c) for c in cols]).collect()[0]
    s = 10
    while s <= max(mx):
        s *= 10
    return s


def replicate(df: DataFrame, cols: list[str], n: int, text_rotate: bool) -> DataFrame:
    stride = _stride(df, cols)
    parts = []
    for i in range(n):
        r = df
        for c in cols:
            r = r.withColumn(c, (F.col(c) + F.lit(i * stride)).cast("long"))
        if text_rotate and i > 0:
            # 26 distinct rotations: beyond 26 replicas, every 26th is an
            # EXACT copy of the base text (new doc_id) — deliberate; real
            # corpora carry exact copies, and exact dedup collapses them
            # before any near-dup join (see jaccard_prefix_pairs step 1).
            alpha = "abcdefghijklmnopqrstuvwxyz"
            k = i % 26
            rot = alpha[k:] + alpha[:k]
            r = r.withColumn("text", F.translate(F.col("text"), alpha, rot))
        parts.append(r)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else ".scratch/sf1"
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    only = set(sys.argv[4].split(",")) if len(sys.argv) > 4 else None
    spark = get_spark("gen-scale-fixture")
    os.makedirs(dst, exist_ok=True)
    for table in COPY_TABLES:
        if only and table not in only:
            continue
        load_table(spark, src, table).write.mode("overwrite").parquet(
            f"{dst}/{table}.parquet"
        )
        print(f"copied {table}")
    for table, cols in SHIFT_COLS.items():
        if only and table not in only:
            continue
        df = load_table(spark, src, table)
        big = replicate(df, cols, n, text_rotate=(table == "documents"))
        # many output files so downstream scans parallelize like a real
        # multi-file warehouse table (the driver fixtures are single-file)
        big.repartition(32).write.mode("overwrite").parquet(f"{dst}/{table}.parquet")
        print(f"scaled {table} x{n}")
    spark.stop()


if __name__ == "__main__":
    main()
