"""IVF posting-list maintenance under embedding CDC
(datapipe/similarity.py:maintain_ivf_cells_cdc): maintained cells must
equal a from-scratch assignment of the replayed post-CDC corpus against
the same frozen centroids — including re-embeddings that provably move
a vector between cells."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from etl__project_spark.datapipe.similarity import (
    assign_cells,
    maintain_ivf_cells_cdc,
)


def _emb(spark, rows):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<float>",
    )


def _batch(spark, rows):
    return spark.createDataFrame(
        [(i, [float(x) for x in v] if v is not None else None, op) for i, v, op in rows],
        "vec_id long, embedding array<float>, op string",
    )


def _cells(df):
    return sorted(
        (r["cand_id"], r["centroid_id"]) for r in df.collect()
    )


def test_reembedding_moves_vector_between_cells(spark):
    # centroids 0 and 1 point along +x and +y; vector 5 starts x-ish
    initial = _emb(
        spark,
        [(0, [1, 0]), (1, [0, 1]), (5, [0.9, 0.1]), (6, [0.1, 0.9])],
    )
    _, cells = maintain_ivf_cells_cdc(
        initial,
        [_batch(spark, [(5, [0.1, 0.9], "U")])],
        n_centroids=2,
    )
    live = cells.filter(F.col("sign") > 0).select("cand_id", "centroid_id")
    assert _cells(live) == [(0, 0), (1, 1), (5, 1), (6, 1)]


def test_delete_and_late_insert_track_postings(spark):
    initial = _emb(spark, [(0, [1, 0]), (1, [0, 1]), (5, [1, 0.2])])
    _, cells = maintain_ivf_cells_cdc(
        initial,
        [
            _batch(spark, [(6, [0.2, 1], "I")]),
            _batch(spark, [(5, None, "D")]),
        ],
        n_centroids=2,
    )
    live = cells.filter(F.col("sign") > 0).select("cand_id", "centroid_id")
    assert _cells(live) == [(0, 0), (1, 1), (6, 1)]


def test_ivf_cdc_random_property_vs_rebuild(spark):
    random.seed(53)
    dim = 4

    def vec():
        return [round(random.uniform(-1, 1), 3) for _ in range(dim)]

    state = {i: vec() for i in range(30)}
    initial = _emb(spark, list(state.items()))
    seeds_frozen = {i: state[i] for i in range(8)}
    batches = []
    next_id = 100
    for _ in range(3):
        ops, seen = [], set()
        for _ in range(8):
            churnable = [i for i in state if i >= 8]
            if churnable and random.random() < 0.5:
                i = random.choice(churnable)
                if i in seen:
                    continue
                seen.add(i)
                if random.random() < 0.5:
                    ops.append((i, None, "D"))
                    del state[i]
                else:
                    state[i] = vec()
                    ops.append((i, state[i], "U"))
            else:
                i, next_id = next_id, next_id + 1
                state[i] = vec()
                ops.append((i, state[i], "I"))
                seen.add(i)
        batches.append(_batch(spark, ops))
    _, cells = maintain_ivf_cells_cdc(initial, batches, n_centroids=8)
    live = cells.filter(F.col("sign") > 0).select("cand_id", "centroid_id")
    seeds = _emb(spark, list(seeds_frozen.items())).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("cv")
    )
    want = assign_cells(_emb(spark, list(state.items())), seeds).select(
        "cand_id", "centroid_id"
    )
    assert _cells(live) == _cells(want)


def _stats(df):
    return sorted(
        (r["centroid_id"], r["dim"], r["s"], r["n"]) for r in df.collect()
    )


def test_centroid_stats_cell_move_transfers_mass(spark):
    """A re-embedding that crosses cells must move the vector's sums AND
    its membership count from the old centroid to the new one."""
    from etl__project_spark.datapipe.similarity import (
        maintain_centroid_stats_cdc,
        signed_centroid_stats,
    )

    initial = _emb(
        spark, [(0, [1, 0]), (1, [0, 1]), (5, [0.9, 0.1]), (6, [0.1, 0.9])]
    )
    got = maintain_centroid_stats_cdc(
        initial,
        [_batch(spark, [(5, [0.1, 0.9], "U")])],
        n_centroids=2,
    )
    post = _emb(
        spark, [(0, [1, 0]), (1, [0, 1]), (5, [0.1, 0.9]), (6, [0.1, 0.9])]
    )
    seeds = initial.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("cv")
    )
    want = signed_centroid_stats(
        assign_cells(post, seeds).select("*", F.lit(1).cast("long").alias("sign"))
    )
    assert _stats(got) == _stats(want)
    # centroid 1 now holds BOTH moved vectors plus its seed
    n1 = {r["centroid_id"]: r["n"] for r in got.collect()}
    assert n1[1] == 3 and n1[0] == 1


def test_centroid_stats_random_churn_matches_recompute(spark):
    """Random multi-batch churn (inserts, re-embeddings, takedowns)
    folded through the signed stats equals the one-shot statistics of
    the replayed corpus against the same frozen seeds — bit-exact,
    thanks to integer micro-unit sums."""
    from etl__project_spark.datapipe.similarity import (
        maintain_centroid_stats_cdc,
        signed_centroid_stats,
    )

    random.seed(67)

    def vec():
        return [random.uniform(-1, 1) for _ in range(4)]

    state = {i: vec() for i in range(30)}
    initial = _emb(spark, sorted(state.items()))
    seeds = initial.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("cv")
    ).localCheckpoint()
    batches, next_id = [], 100
    for _ in range(2):
        ops = []
        for i in random.sample(sorted(k for k in state if k >= 3), 6):
            if random.random() < 0.4:
                state.pop(i)
                ops.append((i, None, "D"))
            else:
                state[i] = vec()
                ops.append((i, state[i], "U"))
        for _ in range(2):
            state[next_id] = vec()
            ops.append((next_id, state[next_id], "I"))
            next_id += 1
        batches.append(_batch(spark, ops))
    got = maintain_centroid_stats_cdc(initial, batches, n_centroids=3)
    post = _emb(spark, sorted(state.items()))
    want = signed_centroid_stats(
        assign_cells(post, seeds).select("*", F.lit(1).cast("long").alias("sign"))
    )
    assert _stats(got) == _stats(want)
