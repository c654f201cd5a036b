"""Incremental connected components (datapipe/dedup.py:
merge_components_delta / maintain_components_incremental): batch-folded
labels must equal one-shot clustering of the full edge set — including
batches that merge several existing components at once."""

from __future__ import annotations

import random

from etl__project_spark.datapipe.dedup import (
    char_shingles,
    connected_components,
    lsh_candidate_pairs,
    maintain_components_incremental,
    merge_components_delta,
    minhash_signature,
)


def _nodes(spark, ids):
    return spark.createDataFrame([(i,) for i in ids], "id long")


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(a, b) for a, b in pairs], "id_a long, id_b long"
    )


def _labels(df):
    return sorted((r["id"], r["component"]) for r in df.collect())


def test_cross_edge_merges_components(spark):
    labels = connected_components(
        _nodes(spark, range(6)), _edges(spark, [(0, 1), (2, 3), (4, 5)])
    )
    assert _labels(labels) == [(0, 0), (1, 0), (2, 2), (3, 2), (4, 4), (5, 4)]
    got = merge_components_delta(labels, _edges(spark, [(1, 2)]))
    assert _labels(got) == [(0, 0), (1, 0), (2, 0), (3, 0), (4, 4), (5, 4)]


def test_one_batch_merges_three_components(spark):
    labels = connected_components(
        _nodes(spark, range(6)), _edges(spark, [(0, 1), (2, 3), (4, 5)])
    )
    got = merge_components_delta(labels, _edges(spark, [(3, 4), (1, 5)]))
    assert _labels(got) == [(i, 0) for i in range(6)]


def test_components_random_property_vs_replay(spark):
    random.seed(97)
    n = 30
    all_edges = []
    labels = connected_components(_nodes(spark, range(n)), _edges(spark, []))
    for _ in range(4):
        batch = [
            tuple(sorted(random.sample(range(n), 2))) for _ in range(6)
        ]
        all_edges.extend(batch)
        labels = merge_components_delta(labels, _edges(spark, batch))
        labels = labels.localCheckpoint(eager=True)
    want = connected_components(_nodes(spark, range(n)), _edges(spark, all_edges))
    assert _labels(labels) == _labels(want)


def test_doc_batches_equal_oneshot_lsh_clustering(spark):
    texts = [
        "the quick brown fox jumps over the lazy dog again and again",
        "the quick brown fox jumps over the lazy cat again and again",
        "spark structured streaming maintains state across micro batches",
        "completely unrelated text about warehouse loading and star schemas",
    ]
    rows = [(i, texts[i % 4]) for i in range(12)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    m3 = docs.doc_id % 3
    got = maintain_components_incremental(
        [docs.filter(m3 == 0), docs.filter(m3 == 1), docs.filter(m3 == 2)]
    )
    sh = char_shingles(docs, distinct=False)
    sig = minhash_signature(sh, n_hashes=8)
    pairs = lsh_candidate_pairs(sig, n_bands=2, rows_per_band=4)
    want = connected_components(
        docs.selectExpr("doc_id AS id"), pairs
    )
    assert _labels(got) == _labels(want)
