"""Word co-occurrence graph operators: edge construction, TextRank
centrality, triangle counting.

The graph family next to connected components (``dedup.py``):
an explicit vocabulary-sized edge list built from one corpus-sized
distinct-bigram pass, then fixpoint/self-join algorithms that never
touch the corpus again. Shared by the batch catalog queries
(``doc_textrank_keywords``, ``doc_cooccur_triangles``) and the
streaming maintenance path (``streaming/pipeline.py:stream_word_graph``).

All scores are exact BIGINT micro-units so iterated compositions are
bit-identical across engines (the ``kmeans_iterate`` discipline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl__project_spark.session import empty_frame, state_checkpoint


def word_cooccur_edges(
    docs: DataFrame, text_col: str = "text", checkpoint: bool = True
) -> DataFrame:
    """Undirected word co-occurrence graph as a symmetric distinct
    (src, dst) edge list: whitespace-lowered tokens, adjacent-pair
    windows, self-loops dropped, both directions materialized.

    This is the ONLY corpus-sized stage of the graph family — one
    explode + one distinct (two-phase hash aggregate); the result is
    vocabulary-bounded (distinct bigrams), so downstream iteration cost
    is independent of corpus size. ``checkpoint`` truncates lineage so
    multi-pass consumers don't re-tokenize (skip it for per-batch
    deltas that are consumed once).
    """
    toks = docs.select(F.split(F.lower(F.col(text_col)), r"\s+").alias("t"))
    pairs = (
        toks.select(
            F.explode(
                F.arrays_zip(
                    F.slice(F.col("t"), 1, F.size("t") - 1).alias("w_a"),
                    F.slice(F.col("t"), 2, F.size("t") - 1).alias("w_b"),
                )
            ).alias("p")
        )
        .select("p.w_a", "p.w_b")
        .filter(F.col("w_a") != F.col("w_b"))
    )
    edges = (
        pairs.select(F.col("w_a").alias("src"), F.col("w_b").alias("dst"))
        .union(pairs.select(F.col("w_b").alias("src"), F.col("w_a").alias("dst")))
        .distinct()
    )
    return state_checkpoint(edges, table_sized=False) if checkpoint else edges


def degrees(edges: DataFrame) -> DataFrame:
    """(src, d) — distinct-neighbor count per node (edges are
    symmetric, so src ranges over every node)."""
    return edges.groupBy("src").agg(F.count(F.lit(1)).alias("d"))


def _pagerank_rounds(edges, deg, scores, restart_of, n_iter):
    """Shared floor-quantized power-iteration loop: per round, scores
    (vocab-sized) BROADCAST onto edges, contributions ``floor(s/deg)``,
    damped update ``restart + floor(0.85 * sum)``, per-round
    ``localCheckpoint``. ``restart_of(node_col)`` supplies the restart
    mass (uniform 150000 for TextRank; seed-gated for PPR) — ONE coded
    path so the micro-unit discipline cannot fork between the two."""
    for _ in range(n_iter):
        contrib = (
            edges.join(F.broadcast(scores), edges["src"] == scores["word"])
            .join(F.broadcast(deg), "src")
            .select(
                "dst",
                F.floor(
                    F.col("s").cast("double") / F.col("d").cast("double")
                ).alias("c"),
            )
        )
        scores = (
            contrib.groupBy("dst")
            .agg(F.sum("c").alias("m"))
            .select(
                F.col("dst").alias("word"),
                (
                    restart_of(F.col("dst"))
                    + F.floor(F.lit(0.85) * F.col("m").cast("double"))
                ).alias("s"),
            )
        )
        scores = state_checkpoint(scores, table_sized=False)
    return scores


def textrank(edges: DataFrame, n_iter: int = 5) -> DataFrame:
    """PageRank power iteration over a symmetric edge list —
    ``PR(v) = 0.15 + 0.85 * sum_u PR(u)/deg(u)`` — returning
    (word, rank_micro, degree) for EVERY node (callers rank/limit).

    Scores live in BIGINT micro-units (start 1_000_000, base 150_000);
    each contribution is ``floor(s/deg)`` and each damped update floors
    once, so round N+1's input is bit-identical on any engine.
    Distributed shape per round: scores (|vocab| rows) re-attach to
    edges by BROADCAST, one vocab-sized hash aggregate, per-round
    ``localCheckpoint`` lineage truncation (loop shared with
    :func:`personalized_pagerank` via ``_pagerank_rounds``).
    """
    edges = state_checkpoint(edges, table_sized=False)
    deg = state_checkpoint(degrees(edges), table_sized=False)
    scores = deg.select(
        F.col("src").alias("word"), F.lit(1000000).cast("long").alias("s")
    )
    scores = _pagerank_rounds(
        edges, deg, scores, lambda _: F.lit(150000).cast("long"), n_iter
    )
    return scores.join(F.broadcast(deg), scores["word"] == deg["src"]).select(
        "word", F.col("s").alias("rank_micro"), F.col("d").alias("degree")
    )


def triangle_stats(edges: DataFrame) -> DataFrame:
    """One-row (n_triangles, n_wedges, global_clustering_micro) via
    degree-ordered orientation (each undirected edge kept low→high by
    (degree, word)), so every triangle is counted exactly once and the
    wedge self-join fans out by out-degree — O(sqrt(m))-bounded for any
    graph, the classic distributed triangle-count trick (Cohen 2009;
    Suri & Vassilvitskii WWW'11)."""
    edges = state_checkpoint(edges, table_sized=False)
    deg = degrees(edges)
    da = deg.select(F.col("src").alias("a_key"), F.col("d").alias("da"))
    db = deg.select(F.col("src").alias("b_key"), F.col("d").alias("db"))
    oriented = (
        edges.join(F.broadcast(da), edges["src"] == da["a_key"])
        .join(F.broadcast(db), edges["dst"] == db["b_key"])
        .filter(
            (F.col("da") < F.col("db"))
            | ((F.col("da") == F.col("db")) & (F.col("src") < F.col("dst")))
        )
        .select(F.col("src").alias("a"), F.col("dst").alias("b"))
    )
    oriented = state_checkpoint(oriented, table_sized=False)
    e2 = oriented.select(F.col("a").alias("b"), F.col("b").alias("c"))
    wedges2 = oriented.join(e2, "b").select("a", "b", "c")
    closing = oriented.select(F.col("a"), F.col("b").alias("c"))
    tri = wedges2.join(closing, ["a", "c"], "left_semi").agg(
        F.count(F.lit(1)).alias("n_triangles")
    )
    wedge = deg.agg(
        F.sum(F.col("d") * (F.col("d") - 1) / 2).cast("long").alias("n_wedges")
    )
    return tri.crossJoin(F.broadcast(wedge)).select(
        "n_triangles",
        "n_wedges",
        F.when(F.col("n_wedges") == 0, F.lit(0))  # wedge-free graph
        .otherwise(
            F.floor(
                F.lit(3.0)
                * F.col("n_triangles").cast("double")
                / F.col("n_wedges").cast("double")
                * 1000000
                + F.lit(0.5)
            )
        )
        .cast("long")
        .alias("global_clustering_micro"),
    )


def kcore_hindex(edges: DataFrame, n_iter: int = 6) -> DataFrame:
    """Coreness estimation by h-index iteration (Lü, Chen, Zhou et al.,
    "The H-index of a network node...", 2016): start every node at its
    degree and repeatedly replace each node's value with the H-INDEX of
    its neighbors' values — the sequence is monotone non-increasing and
    converges to the k-core number. A FIXED ``n_iter`` rounds gives a
    deterministic upper-bound estimate (the catalog's fixed-round
    discipline — kmeans 2, TextRank 5), which is also how you'd run it
    at 100 TB: each round is one vocab-sized join + window, no
    data-dependent convergence test.

    H-index per node: sort neighbor values descending, take
    ``max(min(rank, value))`` — one row_number window partitioned by
    node. Returns (word, coreness_est, degree) for every node.
    """
    from pyspark.sql import Window

    edges = state_checkpoint(edges, table_sized=False)
    deg = state_checkpoint(degrees(edges), table_sized=False)
    vals = deg.select(F.col("src").alias("word"), F.col("d").alias("c"))
    for _ in range(n_iter):
        nb = edges.join(F.broadcast(vals), edges["src"] == vals["word"]).select(
            F.col("dst"), F.col("c")
        )
        # tie order among equal c is irrelevant to max(min(rn, c))
        w = Window.partitionBy("dst").orderBy(F.desc("c"))
        vals = (
            nb.withColumn("rn", F.row_number().over(w))
            .groupBy("dst")
            .agg(F.max(F.least(F.col("rn").cast("long"), F.col("c"))).alias("h"))
            .select(F.col("dst").alias("word"), F.col("h").alias("c"))
        )
        vals = state_checkpoint(vals, table_sized=False)
    return vals.join(F.broadcast(deg), vals["word"] == deg["src"]).select(
        "word", F.col("c").alias("coreness_est"), F.col("d").alias("degree")
    )


def personalized_pagerank(
    edges: DataFrame, seed: str, n_iter: int = 5
) -> DataFrame:
    """Personalized PageRank with restart at a single seed word —
    ``PPR(v) = 0.15*[v = seed] + 0.85 * sum_u PPR(u)/deg(u)`` — the
    query-time use of the co-occurrence graph: related-term expansion
    for corpus curation (seed a topic word, harvest its neighborhood
    by stationary visit probability rather than raw adjacency).

    Same BIGINT micro-unit discipline as :func:`textrank` (seed starts
    at 1_000_000; restart mass 150_000 lands only on the seed), and the
    same per-round shape: broadcast scores onto edges, one vocab-sized
    aggregate, localCheckpoint. Mass never reaches disconnected
    components, so unreached words are simply ABSENT (score 0) — rows
    only exist for nodes with a contributing neighbor, matching the
    SQL-oracle aggregation semantics. Returns (word, ppr_micro, degree)
    for reached nodes INCLUDING the seed (callers usually drop it)."""
    edges = state_checkpoint(edges, table_sized=False)
    deg = state_checkpoint(degrees(edges), table_sized=False)
    scores = deg.select(
        F.col("src").alias("word"),
        F.when(F.col("src") == seed, F.lit(1000000))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("s"),
    )
    scores = _pagerank_rounds(
        edges,
        deg,
        scores,
        lambda node: F.when(node == seed, F.lit(150000))
        .otherwise(F.lit(0))
        .cast("long"),
        n_iter,
    )
    return scores.join(F.broadcast(deg), scores["word"] == deg["src"]).select(
        "word", F.col("s").alias("ppr_micro"), F.col("d").alias("degree")
    )


# --- incremental triangle counting under edge CDC ------------------------------
#
# Triangle count is a DEGREE-3 polynomial of the edge set — one degree
# beyond everything else the IVM layer maintains (join views and their
# aggregates are bilinear; support counts linear). The signed algebra
# still applies, through the trilinear expansion: for a 0/1 adjacency A
# and a conformal signed batch D (+1 only on absent edges, −1 only on
# present ones),
#
#   6·ΔT = 3·Σ_ord D(u,v)A(v,w)A(w,u)
#        + 3·Σ_ord D(u,v)D(v,w)A(w,u)
#        + Σ_ord D(u,v)D(v,w)D(w,u)
#
# (sums over ordered vertex triples; the ×3s are the symmetry of the
# cyclic product under position of D). Every term is an equi-join chain
# anchored on the BATCH — cost O(|Δ| · deg²) against the vertex-bucketed
# live edge table, never a graph rescan — and all arithmetic is exact
# integer sign products, so the maintained count is bit-identical to a
# recount. The classic streaming-graph result (Eckmann–Moses;
# Becchetti et al. KDD'08 for the batch form); production graph stores
# (e.g. LinkedIn's) maintain triangle/wedge counts exactly this way.


def triangle_delta_signed(adj: DataFrame, delta: DataFrame) -> DataFrame:
    """One-row (d_triangles) = T(A ⊎ D) − T(A). ``adj`` is the live
    simple edge set (u, v) canonicalized u < v; ``delta`` carries
    (u, v, sign) with the conformal-batch contract above (the
    :func:`edge_liveness_deltas` output satisfies it by construction)."""
    a_s = adj.select("u", "v").unionByName(
        adj.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    d_s = delta.select("u", "v", "sign").unionByName(
        delta.select(F.col("v").alias("u"), F.col("u").alias("v"), "sign")
    )
    # D(u,v) A(v,w) A(w,u)
    t1 = (
        d_s.select(F.col("u").alias("x"), F.col("v").alias("y"), "sign")
        .join(a_s.select(F.col("u").alias("y"), F.col("v").alias("z")), "y")
        .join(
            a_s.select(F.col("u").alias("z"), F.col("v").alias("x")),
            ["z", "x"],
        )
        .agg(F.coalesce(F.sum("sign"), F.lit(0)).cast("long").alias("t1"))
    )
    # D(u,v) D(v,w) A(w,u)
    t2 = (
        d_s.select(F.col("u").alias("x"), F.col("v").alias("y"),
                   F.col("sign").alias("s1"))
        .join(
            d_s.select(F.col("u").alias("y"), F.col("v").alias("z"),
                       F.col("sign").alias("s2")),
            "y",
        )
        .join(
            a_s.select(F.col("u").alias("z"), F.col("v").alias("x")),
            ["z", "x"],
        )
        .agg(
            F.coalesce(F.sum(F.col("s1") * F.col("s2")), F.lit(0))
            .cast("long")
            .alias("t2")
        )
    )
    # D(u,v) D(v,w) D(w,u)
    t3 = (
        d_s.select(F.col("u").alias("x"), F.col("v").alias("y"),
                   F.col("sign").alias("s1"))
        .join(
            d_s.select(F.col("u").alias("y"), F.col("v").alias("z"),
                       F.col("sign").alias("s2")),
            "y",
        )
        .join(
            d_s.select(F.col("u").alias("z"), F.col("v").alias("x"),
                       F.col("sign").alias("s3")),
            ["z", "x"],
        )
        .agg(
            F.coalesce(F.sum(F.col("s1") * F.col("s2") * F.col("s3")), F.lit(0))
            .cast("long")
            .alias("t3")
        )
    )
    return (
        t1.crossJoin(t2)
        .crossJoin(t3)
        .select(
            F.expr("(3 * t1 + 3 * t2 + t3) div 6").alias("d_triangles")
        )
    )


def edge_liveness_deltas(
    mult_state: DataFrame, delta_mult: DataFrame
) -> DataFrame:
    """0 ↔ >0 multiplicity transitions → conformal signed simple-edge
    deltas. ``mult_state`` is the live (u, v, m) multiplicity table,
    ``delta_mult`` the batch's (u, v, dm) net changes — the same
    two-level shape as the semi-join support state: multiplicities
    absorb the churn linearly, and only LIVENESS transitions surface to
    the (more expensive) polynomial layer above."""
    old = mult_state.select("u", "v", F.col("m").alias("old_m"))
    j = old.join(delta_mult, ["u", "v"], "full").select(
        "u",
        "v",
        F.coalesce("old_m", F.lit(0)).alias("om"),
        (F.coalesce("old_m", F.lit(0)) + F.coalesce("dm", F.lit(0))).alias(
            "nm"
        ),
    )
    return j.select(
        "u",
        "v",
        F.when((F.col("om") == 0) & (F.col("nm") > 0), 1)
        .when((F.col("om") > 0) & (F.col("nm") == 0), -1)
        .otherwise(0)
        .cast("long")
        .alias("sign"),
    ).filter(F.col("sign") != 0)


def maintain_triangles_cdc(
    initial_edges: DataFrame,
    liveness_batches: list[DataFrame],
    checkpoint: bool = True,
) -> DataFrame:
    """Maintain the global triangle count while the simple edge set
    receives conformal signed batches. Returns one row (n_triangles,
    n_edges). The initial count itself is one :func:`triangle_delta_signed`
    call from the empty graph (T(D) = Σ DDD / 6 — the expansion's
    degenerate case), so there is exactly one coded triangle-counting
    path. Edge state is table-sized → DISK_ONLY checkpoints (the
    SCALE.md §9m/§9o rule)."""
    from pyspark.storagelevel import StorageLevel

    disk = StorageLevel.DISK_ONLY
    spark = initial_edges.sparkSession
    adj = initial_edges.select("u", "v")
    empty = empty_frame(spark, "u long, v long")
    counts = [
        triangle_delta_signed(
            empty, adj.select("*", F.lit(1).cast("long").alias("sign"))
        )
    ]
    if checkpoint:
        adj = state_checkpoint(adj, table_sized=True)
        counts[0] = state_checkpoint(counts[0], table_sized=False)
    for batch in liveness_batches:
        if checkpoint:
            batch = state_checkpoint(batch, table_sized=False)
        d = triangle_delta_signed(adj, batch)
        if checkpoint:
            d = state_checkpoint(d, table_sized=False)
        counts.append(d)
        adj = (
            adj.select("*", F.lit(1).cast("long").alias("sign"))
            .unionByName(batch)
            .groupBy("u", "v")
            .agg(F.sum("sign").cast("long").alias("s"))
            .filter(F.col("s") > 0)
            .select("u", "v")
        )
        if checkpoint:
            adj = state_checkpoint(adj, table_sized=True)
    total = counts[0]
    for c in counts[1:]:
        total = total.unionByName(c)
    n_edges = adj.agg(F.count(F.lit(1)).cast("long").alias("n_edges"))
    return (
        total.agg(F.sum("d_triangles").cast("long").alias("n_triangles"))
        .crossJoin(F.broadcast(n_edges))
    )


def maintain_degrees_cdc(
    initial_edges: DataFrame,
    liveness_batches: list[DataFrame],
    checkpoint: bool = True,
) -> DataFrame:
    """Maintain per-vertex degrees under the same conformal signed edge
    batches :func:`maintain_triangles_cdc` consumes. Degrees are LINEAR
    in the edge set (each edge contributes +1 to both endpoints), so
    the fold is one bounded hash-agg per batch — no base consultation.
    Returns (vertex, d) for live vertices. The O(V) degree state is
    what read-time wedge counts (Σ d·(d−1)/2) derive from: wedges are
    quadratic in degrees but a plain projection of this state, the
    same maintain-finest/derive-at-read split as the grouping-sets
    rollup."""
    def sym_signed(df, has_sign):
        s = F.col("sign") if has_sign else F.lit(1).cast("long")
        return df.select(F.col("u").alias("vertex"), s.alias("ds")).unionByName(
            df.select(F.col("v").alias("vertex"), s.alias("ds"))
        )

    deg = (
        sym_signed(initial_edges, False)
        .groupBy("vertex")
        .agg(F.sum("ds").cast("long").alias("d"))
    )
    if checkpoint:
        deg = state_checkpoint(deg, table_sized=True)
    for batch in liveness_batches:
        deg = (
            deg.select("vertex", F.col("d").alias("ds"))
            .unionByName(sym_signed(batch, True))
            .groupBy("vertex")
            .agg(F.sum("ds").cast("long").alias("d"))
            .filter(F.col("d") != 0)
        )
        if checkpoint:
            deg = state_checkpoint(deg, table_sized=True)
    return deg
