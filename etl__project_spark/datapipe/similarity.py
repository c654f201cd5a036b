"""Similarity search over embedding columns (``array<float>``).

Two paths:

- ``brute_force_topk`` — exact cosine top-k against a query vector. The
  baseline; a full scan but embarrassingly parallel (no shuffle until the
  final top-k, which AQE/takeOrdered keeps tiny).
- ``bucketed_topk`` — sign-random-projection LSH: vectors are assigned to
  2^n_bits buckets by the signs of their leading components; the query
  only scans its own bucket. At 100 TB the table is written partitioned
  by bucket, so bucket pruning turns top-k into a partition-pruned scan.

All arithmetic is promoted to double before multiplication so results are
bit-comparable with the DuckDB oracle (float32 upcast is exact).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def cosine_components(a: Column, b: Column) -> Column:
    """Cosine similarity dot(a,b)/(|a||b|) as a single column expression."""
    return _dot(a, b) / (F.sqrt(_dot(a, a)) * F.sqrt(_dot(b, b)))


def brute_force_topk(
    embeddings: DataFrame,
    query: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k neighbours of the (single-row) ``query`` frame.

    The query side is broadcast (one row); the scan side never shuffles.
    Ties broken by id for determinism.
    """
    q = query.select(F.col(vec_col).alias("__qvec"))
    sim = cosine_components(F.col(vec_col), F.col("__qvec"))
    return (
        embeddings.crossJoin(F.broadcast(q))
        .select(
            F.col(id_col),
            F.round(sim, 4).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


def sign_bucket(vec: Column, n_bits: int = 4) -> Column:
    """Sign-random-projection bucket id from the leading ``n_bits``
    components (a fixed axis-aligned projection — deterministic and
    oracle-portable; production would use random hyperplanes)."""
    b = F.lit(0)
    for i in range(n_bits):
        b = b + F.when(F.element_at(vec, i + 1) > 0, F.lit(2**i)).otherwise(0)
    return b.cast("long")


def bucketed_topk(
    embeddings: DataFrame,
    query: DataFrame,
    k: int = 10,
    n_bits: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """ANN top-k: only the query's sign-projection bucket is scanned
    (~1/2^n_bits of the data; recall < 1.0 by design, the scale path)."""
    bucketed = embeddings.withColumn("__bucket", sign_bucket(F.col(vec_col), n_bits))
    q = query.select(
        F.col(vec_col).alias("__qvec"),
        sign_bucket(F.col(vec_col), n_bits).alias("__qbucket"),
    )
    sim = cosine_components(F.col(vec_col), F.col("__qvec"))
    return (
        bucketed.join(
            F.broadcast(q), F.col("__bucket") == F.col("__qbucket"), "inner"
        )
        .select(F.col(id_col), F.round(sim, 4).alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


def near_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.4,
    block_by_bucket: bool = False,
    n_bits: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    allow_quadratic: bool = False,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (id_a, id_b, cosine) for
    every pair with cosine >= threshold, id_a < id_b.

    ``block_by_bucket=False`` is the exact O(N^2/2) baseline — correct at
    any threshold but quadratic, only for modest N or a sampled audit.
    Because pointing it at a full corpus is a scale-killer (a cartesian
    over 10^9 rows is 10^18 pairs), the quadratic path must be opted into
    explicitly with ``allow_quadratic=True``; without it the call raises
    rather than silently planning a CartesianProduct. ``block_by_bucket=
    True`` joins on sign-projection bucket equality first (equi-join,
    shuffle-partitioned by bucket — no cross join), the scale path: each
    of the 2^n_bits buckets pairs only within itself, at the cost of
    missing cross-bucket pairs (recall < 1, standard blocking/LSH
    trade-off; raise recall with multiple independent projections
    unioned, as MinHash-LSH does with bands).

    The filter compares the ROUNDED cosine (4 dp) so the threshold cut is
    identical across engines regardless of last-bit float noise.
    """
    if not block_by_bucket and not allow_quadratic:
        raise ValueError(
            "near_dup_pairs(block_by_bucket=False) plans an O(N^2) cross "
            "join — a sampled-audit baseline, not a pipeline stage. Pass "
            "allow_quadratic=True to run it on a bounded input, or use "
            "block_by_bucket=True / ivf_topk for the scale path "
            "(catalog: emb_near_dup_blocked, emb_ivf_topk)."
        )
    a = embeddings.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("__va"))
    b = embeddings.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("__vb"))
    if block_by_bucket:
        a = a.withColumn("__bucket", sign_bucket(F.col("__va"), n_bits))
        b = b.withColumn("__bucket", sign_bucket(F.col("__vb"), n_bits))
        joined = a.join(b, "__bucket")
    else:
        joined = a.crossJoin(b)
    cos = F.round(cosine_components(F.col("__va"), F.col("__vb")), 4)
    return (
        joined.filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", cos.alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )


def ivf_topk(
    embeddings: DataFrame,
    n_centroids: int = 8,
    n_probe: int = 2,
    k: int = 3,
    n_queries: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF (inverted-file) ANN: partition vectors into centroid cells,
    then answer each query by scanning only its ``n_probe`` nearest
    cells.

    Centroid "training" is stubbed to seed selection (the first
    ``n_centroids`` vectors by id) so the structure is deterministic and
    oracle-portable; a production build would run Lloyd iterations with
    the same assignment step (see ``emb_kmeans_assign``). At 100 TB the
    cell assignment is written as a partition column, so probing becomes
    partition-pruned scans; centroids are always broadcast (KB-sized).

    Returns (q_id, cand_id, sim): top-``k`` candidates per query among
    the probed cells, ranked on 4-dp-rounded cosine with id tiebreaks
    (cross-engine determinism). Recall < 1.0 by design when the true
    neighbour lives in an unprobed cell — the standard IVF trade-off.
    """
    from pyspark.sql import Window

    seeds = embeddings.filter(F.col(id_col) < n_centroids).select(
        F.col(id_col).alias("centroid_id"), F.col(vec_col).alias("cv")
    )
    sim_to_seed = F.round(cosine_components(F.col(vec_col), F.col("cv")), 4)
    scored_all = embeddings.crossJoin(F.broadcast(seeds)).select(
        F.col(id_col), F.col(vec_col), F.col("centroid_id"), sim_to_seed.alias("s")
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("s"), F.asc("centroid_id"))
    ranked = scored_all.withColumn("rn", F.row_number().over(w))
    cells = ranked.filter(F.col("rn") == 1).select(
        F.col(id_col).alias("cand_id"),
        F.col(vec_col).alias("cand_vec"),
        "centroid_id",
    )
    probes = (
        ranked.filter((F.col(id_col) < n_queries) & (F.col("rn") <= n_probe))
        .select(
            F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec"), "centroid_id"
        )
    )
    pair_sim = F.round(cosine_components(F.col("q_vec"), F.col("cand_vec")), 4)
    cand = (
        probes.join(cells, "centroid_id")
        .filter(F.col("cand_id") != F.col("q_id"))
        .select("q_id", "cand_id", pair_sim.alias("sim"))
    )
    wq = Window.partitionBy("q_id").orderBy(F.desc("sim"), F.asc("cand_id"))
    return (
        cand.withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= k)
        .select("q_id", "cand_id", "sim")
    )
