"""LSH candidate maintenance under CDC (datapipe/dedup.py:
maintain_lsh_pairs_cdc): pairs must appear AND disappear exactly as a
full rebuild would have them — the retraction story the ingest-only
index (lsh_index_increment) cannot express."""

from __future__ import annotations

import random

from etl__project_spark.datapipe.dedup import (
    char_shingles,
    lsh_candidate_pairs,
    maintain_lsh_pairs_cdc,
    minhash_signature,
)

# near-dup fodder: long repeated phrases so rewrites genuinely move
# MinHash minima between variants
PHRASES = [
    "the quick brown fox jumps over the lazy dog again and again",
    "the quick brown fox jumps over the lazy cat again and again",
    "spark structured streaming maintains state across micro batches",
    "spark structured streaming maintains state across mini batches",
    "completely unrelated text about warehouse loading and star schemas",
]


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _batch(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, op string")


def _oneshot_pairs(docs):
    sh = char_shingles(docs, distinct=False)
    sig = minhash_signature(sh, n_hashes=8)
    return lsh_candidate_pairs(sig, n_bands=2, rows_per_band=4)


def _pairs(df):
    return sorted((r["id_a"], r["id_b"]) for r in df.collect())


def test_delete_retracts_its_pairs(spark):
    initial = _docs(
        spark, [(1, PHRASES[0]), (2, PHRASES[0]), (3, PHRASES[4])]
    )
    assert _pairs(_oneshot_pairs(initial)) == [(1, 2)]
    got = maintain_lsh_pairs_cdc(
        initial, [_batch(spark, [(2, None, "D")])]
    )
    assert _pairs(got) == []


def test_rewrite_moves_pairs(spark):
    """Rewriting doc 2 away from doc 1's text dissolves their pair and
    can create a new one with the doc it now duplicates."""
    initial = _docs(
        spark, [(1, PHRASES[0]), (2, PHRASES[0]), (3, PHRASES[2])]
    )
    got = maintain_lsh_pairs_cdc(
        initial, [_batch(spark, [(2, PHRASES[2], "U")])]
    )
    final = _docs(spark, [(1, PHRASES[0]), (2, PHRASES[2]), (3, PHRASES[2])])
    assert _pairs(got) == _pairs(_oneshot_pairs(final))
    assert (2, 3) in _pairs(got)
    assert (1, 2) not in _pairs(got)


def test_lsh_cdc_random_property_vs_replay(spark):
    random.seed(29)
    state = {}
    for did in range(12):
        state[did] = random.choice(PHRASES)
    initial = _docs(spark, list(state.items()))
    batches = []
    next_id = 100
    for _ in range(3):
        ops, seen = [], set()
        for _ in range(6):
            if state and random.random() < 0.5:
                did = random.choice(list(state))
                if did in seen:
                    continue
                seen.add(did)
                if random.random() < 0.5:
                    ops.append((did, None, "D"))
                    del state[did]
                else:
                    txt = random.choice(PHRASES)
                    ops.append((did, txt, "U"))
                    state[did] = txt
            else:
                did, next_id = next_id, next_id + 1
                txt = random.choice(PHRASES)
                ops.append((did, txt, "I"))
                state[did] = txt
                seen.add(did)
        batches.append(_batch(spark, ops))
    got = maintain_lsh_pairs_cdc(initial, batches)
    want = _oneshot_pairs(_docs(spark, list(state.items())))
    assert _pairs(got) == _pairs(want)
