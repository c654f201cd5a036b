"""Distributed linear algebra over embedding columns.

The one primitive a cluster must compute is the d×d second-moment /
covariance matrix: it is the whole input to PCA (principal directions
for whitening, dimensionality reduction before ANN, outlier axes), and
it reduces 100 TB of vectors to d² numbers with ONE pass and a shuffle
whose volume is O(#partitions × d²) — independent of row count. The
eigen-decomposition itself then runs driver-side on a KB-sized matrix
(64×64 doubles = 32 KB), which is the correct split of labor: clusters
aggregate, drivers do O(d³) dense algebra.

Cross-engine determinism: per-term products are quantized to integer
1e-8 units and summed as exact BIGINTs, so the only floating point is a
fixed sequence of divides/multiplies on identical values — the same
micro-unit discipline as ``kmeans_iterate`` / ``ev_quantile_digest``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def covariance_matrix(
    embeddings: DataFrame,
    dim: int = 64,
    vec_col: str = "embedding",
) -> DataFrame:
    """Upper-triangle covariance matrix of the embedding distribution:
    rows (i, j, n, cov) for 1 <= i <= j <= dim, where
    cov = E[x_i x_j] - E[x_i] E[x_j].

    Distributed shape: each row explodes into its d(d+1)/2
    upper-triangle product terms (map-side, no shuffle), which feed a
    two-phase hash aggregate over a keyspace of exactly d(d+1)/2 cells
    — partial aggregation collapses every partition to one value per
    cell, so the exchange carries O(partitions × d²) longs no matter
    how many vectors were scanned. Per-dimension sums ride the same
    pattern on a d-cell keyspace and join back by broadcast. Nothing
    in the plan grows with N except the scan itself.

    Precision: products are floored to 1e-8 units, components to 1e-6
    units, both summed as BIGINTs (exact); with |x| ~ 1 this holds ~1e9
    rows per cell before BIGINT range is threatened — and the fix at
    that scale is a two-level sum (per-shard sketch then merge), the
    same move every sketch in this repo makes. The final covariance is
    a fixed chain of double ops on exact integers, half-up rounded to
    6 dp — bit-identical across engines.
    """
    emb = embeddings.select(F.col(vec_col).cast("array<double>").alias("e"))
    pair_terms = emb.select(
        F.explode(
            F.flatten(
                F.expr(
                    f"transform(sequence(1, {dim}), i -> "
                    f"transform(sequence(i, {dim}), j -> struct(i, j, "
                    f"cast(floor(element_at(e, i) * element_at(e, j) "
                    f"* 100000000.0 + 0.5d) as bigint) as xy)))"
                )
            )
        ).alias("t")
    ).select(
        F.col("t.i").cast("long").alias("i"),
        F.col("t.j").cast("long").alias("j"),
        F.col("t.xy").alias("xy"),
    )
    pair_sums = pair_terms.groupBy("i", "j").agg(F.sum("xy").alias("sxy"))
    dim_sums = (
        emb.select(F.posexplode("e").alias("pos", "x"))
        .select(
            (F.col("pos") + 1).cast("long").alias("i"),
            F.floor(F.col("x") * 1000000.0 + F.lit(0.5)).cast("long").alias("xm"),
        )
        .groupBy("i")
        .agg(F.sum("xm").alias("sx"))
    )
    n = emb.agg(F.count(F.lit(1)).alias("n"))
    a = dim_sums.select(F.col("i"), F.col("sx").alias("sx_i"))
    b = dim_sums.select(F.col("i").alias("j"), F.col("sx").alias("sx_j"))
    cov = (
        F.col("sxy").cast("double") / F.lit(100000000.0) / F.col("n")
        - (F.col("sx_i").cast("double") / F.lit(1000000.0) / F.col("n"))
        * (F.col("sx_j").cast("double") / F.lit(1000000.0) / F.col("n"))
    )
    return (
        pair_sums.join(F.broadcast(a), "i")
        .join(F.broadcast(b), "j")
        .crossJoin(F.broadcast(n))
        .select(
            "i",
            "j",
            "n",
            (F.floor(cov * 1000000.0 + F.lit(0.5)) / F.lit(1000000.0)).alias("cov"),
        )
    )


def covariance_oracle_sql(dim: int = 64) -> str:
    """DuckDB twin of :func:`covariance_matrix` (same quantization and
    operation order, so the value hash matches bit-for-bit)."""
    return f"""WITH v AS (SELECT embedding::DOUBLE[] AS e FROM embeddings),
idx AS (
  SELECT a.range::BIGINT AS i, b.range::BIGINT AS j
  FROM range(1, {dim + 1}) a, range(1, {dim + 1}) b
  WHERE b.range >= a.range
),
pair AS (
  SELECT i, j,
         sum(floor(e[i::INT] * e[j::INT] * 100000000.0 + 0.5)::BIGINT)::BIGINT AS sxy
  FROM v, idx GROUP BY i, j
),
dims AS (SELECT range::BIGINT AS i FROM range(1, {dim + 1})),
dsum AS (
  SELECT i, sum(floor(e[i::INT] * 1000000.0 + 0.5)::BIGINT)::BIGINT AS sx
  FROM v, dims GROUP BY i
),
nn AS (SELECT count(*)::BIGINT AS n FROM v)
SELECT p.i, p.j, nn.n,
       floor((sxy::DOUBLE / 100000000.0 / nn.n
              - (a.sx::DOUBLE / 1000000.0 / nn.n)
                * (b.sx::DOUBLE / 1000000.0 / nn.n)) * 1000000.0 + 0.5)
           / 1000000.0 AS cov
FROM pair p
JOIN dsum a ON a.i = p.i
JOIN dsum b ON b.i = p.j
CROSS JOIN nn"""


def pca_top_component(cov_df: DataFrame, dim: int = 64, n_iter: int = 300):
    """Top principal component by power iteration on the DRIVER.

    The input is the (i, j, n, cov) frame from :func:`covariance_matrix`
    — d(d+1)/2 rows, i.e. ~32 KB at d=64. Collecting it is the point,
    not a scale bug: the cluster has already reduced the corpus to d²
    numbers, and O(d³)-ish dense iteration belongs on one machine (the
    same driver-side step as picking the argmax BPE pair or reading a
    64-register HLL sketch). Returns ``(eigenvalue, eigenvector)`` with
    the sign convention that the largest-magnitude component is
    positive, so results are comparable across runs.
    """
    import numpy as np

    m = np.zeros((dim, dim))
    for r in cov_df.collect():
        i, j = int(r["i"]) - 1, int(r["j"]) - 1
        m[i, j] = r["cov"]
        m[j, i] = r["cov"]
    v = np.ones(dim) / np.sqrt(dim)
    for _ in range(n_iter):
        w = m @ v
        nrm = np.linalg.norm(w)
        if nrm == 0.0:
            break
        v = w / nrm
    eigval = float(v @ m @ v)
    k = int(np.argmax(np.abs(v)))
    if v[k] < 0:
        v = -v
    return eigval, v


def pca_top_k(cov_df: DataFrame, dim: int = 64, k: int = 2, n_iter: int = 300):
    """Top-``k`` principal components by power iteration with Hotelling
    deflation (subtract λ v vᵀ after each extraction) on the collected
    covariance matrix — same driver-side contract as
    :func:`pca_top_component`. Returns ``(eigvals, eigvecs)`` as a list
    of floats and a k×dim list of unit vectors, largest first.
    """
    import numpy as np

    m = np.zeros((dim, dim))
    for r in cov_df.collect():
        i, j = int(r["i"]) - 1, int(r["j"]) - 1
        m[i, j] = r["cov"]
        m[j, i] = r["cov"]
    vals, vecs = [], []
    work = m.copy()
    for _ in range(k):
        v = np.ones(dim) / np.sqrt(dim)
        for _ in range(n_iter):
            w = work @ v
            nrm = np.linalg.norm(w)
            if nrm == 0.0:
                break
            v = w / nrm
        lam = float(v @ work @ v)
        top = int(np.argmax(np.abs(v)))
        if v[top] < 0:
            v = -v
        vals.append(lam)
        vecs.append([float(x) for x in v])
        work = work - lam * np.outer(v, v)
    return vals, vecs


def project_embeddings(
    embeddings: DataFrame,
    directions: list[list[float]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Project every embedding onto the given direction vectors (e.g.
    the PCA components from :func:`pca_top_k`) — the APPLY step of
    dimensionality reduction: (vec_id, p0, p1, …).

    The directions ride into the plan as array literals (KBs — the
    driver→executor path a broadcast variable would take), and each
    projection is a JVM-side ``zip_with``/``aggregate`` dot product in
    the scan stage: zero shuffle, zero Python in the hot path, columnar
    output ready to be written as the reduced representation.
    """
    cols = [F.col(id_col)]
    for n, d in enumerate(directions):
        lit = F.array(*[F.lit(float(x)) for x in d])
        dot = F.aggregate(
            F.zip_with(
                F.col(vec_col), lit, lambda x, y: x.cast("double") * y
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        cols.append(dot.alias(f"p{n}"))
    return embeddings.select(*cols)
