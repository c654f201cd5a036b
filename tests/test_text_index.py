"""Incremental BM25 text index (datapipe/text_index.py): maintained
state equals a from-scratch build of the replayed post-CDC corpus —
postings, lengths, df, and corpus totals all checked directly (the
doc_bm25_cdc oracle additionally pins end-to-end scoring)."""

from __future__ import annotations

import random

from etl__project_spark.datapipe.text_index import (
    bm25_from_index,
    build_text_index,
    maintain_text_index_cdc,
)

WORDS = ["spark", "merge", "window", "delta", "index", "the", "a"]


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _batch(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, op string")


def _index_facts(index):
    postings = sorted(
        (r["doc_id"], r["term"], r["tf"], r["sign"])
        for r in index.postings.collect()
    )
    lengths = sorted(
        (r["doc_id"], r["len"], r["sign"]) for r in index.lengths.collect()
    )
    df = sorted((r["term"], r["df"]) for r in index.df.collect())
    stats = [(r["n_docs"], r["n_toks"]) for r in index.stats.collect()]
    return postings, lengths, df, stats


def test_rewrite_insert_delete_track_df_and_totals(spark):
    initial = _docs(
        spark, [(1, "spark merge"), (2, "merge merge window"), (3, "spark")]
    )
    batches = [
        _batch(spark, [(2, "spark spark", "U"), (4, "window delta", "I")]),
        _batch(spark, [(3, None, "D")]),
    ]
    got = maintain_text_index_cdc(initial, batches)
    final = _docs(
        spark, [(1, "spark merge"), (2, "spark spark"), (4, "window delta")]
    )
    want = build_text_index(final)
    assert _index_facts(got) == _index_facts(want)


def test_text_index_random_property_vs_replay(spark):
    random.seed(47)
    state = {}
    for did in range(20):
        state[did] = " ".join(random.choices(WORDS, k=random.randrange(1, 6)))
    initial = _docs(spark, list(state.items()))
    batches = []
    next_id = 100
    for _ in range(3):
        ops, seen = [], set()
        for _ in range(8):
            if state and random.random() < 0.45:
                did = random.choice(list(state))
                if did in seen:
                    continue
                seen.add(did)
                if random.random() < 0.5:
                    ops.append((did, None, "D"))
                    del state[did]
                else:
                    txt = " ".join(
                        random.choices(WORDS, k=random.randrange(1, 6))
                    )
                    ops.append((did, txt, "U"))
                    state[did] = txt
            else:
                did, next_id = next_id, next_id + 1
                txt = " ".join(random.choices(WORDS, k=random.randrange(1, 6)))
                ops.append((did, txt, "I"))
                state[did] = txt
                seen.add(did)
        batches.append(_batch(spark, ops))
    got = maintain_text_index_cdc(initial, batches)
    want = build_text_index(_docs(spark, list(state.items())))
    assert _index_facts(got) == _index_facts(want)
    # end-to-end: scores from the maintained index == from-scratch scores
    g = sorted(
        (r["doc_id"], r["s_micro"])
        for r in bm25_from_index(got, ["spark", "merge"]).collect()
    )
    w = sorted(
        (r["doc_id"], r["s_micro"])
        for r in bm25_from_index(want, ["spark", "merge"]).collect()
    )
    assert g == w
