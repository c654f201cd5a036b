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


def test_phrase_match_adjacency_and_overlaps(spark):
    """phrase_match must require strict adjacency (not mere co-occurrence),
    count multiple and OVERLAPPING occurrences, and handle 3-term
    phrases — the cases a (doc, term, tf) index cannot answer."""
    from etl__project_spark.datapipe.text_index import (
        phrase_match,
        positional_postings,
    )

    docs = spark.createDataFrame(
        [
            (1, "a b c"),        # one "a b"
            (2, "a x b"),        # co-occurrence, NOT adjacent
            (3, "a b a b"),      # two occurrences
            (4, "a a a"),        # overlapping "a a" twice
            (5, "b a"),          # wrong order
        ],
        "doc_id long, text string",
    )
    post = positional_postings(docs)
    got = {r["doc_id"]: r["n_occ"] for r in phrase_match(post, ["a", "b"]).collect()}
    assert got == {1: 1, 3: 2}
    got3 = {
        r["doc_id"]: r["n_occ"]
        for r in phrase_match(post, ["a", "b", "a"]).collect()
    }
    assert got3 == {3: 1}
    gotaa = {r["doc_id"]: r["n_occ"] for r in phrase_match(post, ["a", "a"]).collect()}
    assert gotaa == {4: 2}


def test_zorder_key_interleaves_and_bounds_rectangles(spark):
    """zorder_key must place a's bit i at 2i+1 and b's at 2i (checked
    against a Python reference on exhaustive 4-bit inputs), agree with
    the SQL twin via DuckDB, and Z-range buckets must bound BOTH
    dimensions (the layout property a single-column sort lacks)."""
    import duckdb
    from pyspark.sql import functions as F

    from etl__project_spark.operators.layout import zorder_key, zorder_key_sql

    def ref(a, b, bits=4):
        z = 0
        for i in range(bits):
            z |= ((a >> i) & 1) << (2 * i + 1)
            z |= ((b >> i) & 1) << (2 * i)
        return z

    rows = [(a, b) for a in range(16) for b in range(16)]
    df = spark.createDataFrame(rows, "a long, b long")
    got = {
        (r["a"], r["b"]): r["z"]
        for r in df.select(
            "a", "b", zorder_key(F.col("a"), F.col("b"), bits=4).alias("z")
        ).collect()
    }
    assert got == {(a, b): ref(a, b) for a, b in rows}
    sql = zorder_key_sql("a", "b", bits=4)
    duck = duckdb.sql(
        f"SELECT a, b, {sql} AS z FROM (SELECT unnest(range(16)) a), "
        "(SELECT unnest(range(16)) b)"
    ).fetchall()
    assert {(a, b): z for a, b, z in duck} == got
    # bucket (top 4 z-bits) bounds both dims within a 4x4 rectangle
    by_bucket = {}
    for (a, b), z in got.items():
        by_bucket.setdefault(z >> 4, []).append((a, b))
    for pts in by_bucket.values():
        aa = [p[0] for p in pts]
        bb = [p[1] for p in pts]
        assert max(aa) - min(aa) <= 3 and max(bb) - min(bb) <= 3


def test_positional_index_maintenance_matches_replay(spark):
    """maintain_positional_postings_cdc must equal positional_postings of
    the replayed post state when a rewrite SHORTENS a doc (stale tail
    positions must retract), another rewrite creates a new phrase match,
    and a delete removes a doc entirely."""
    from pyspark.sql import functions as F

    from etl__project_spark.datapipe.text_index import (
        maintain_positional_postings_cdc,
        positional_postings,
    )

    docs = spark.createDataFrame(
        [(1, "a b c d"), (2, "x y"), (3, "p q r")],
        "doc_id long, text string",
    )
    batches = [
        spark.createDataFrame(
            [(1, "a b", "U"), (2, "x a b y", "U")],
            "doc_id long, text string, op string",
        ),
        spark.createDataFrame(
            [(3, None, "D")], "doc_id long, text string, op string"
        ),
    ]
    got = maintain_positional_postings_cdc(docs, batches)
    post = spark.createDataFrame(
        [(1, "a b"), (2, "x a b y")], "doc_id long, text string"
    )
    want = positional_postings(post)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_proximity_match_window_and_order(spark):
    """proximity_match must enforce ORDER (b after a) and the slop
    window, counting all qualifying pairs."""
    from etl__project_spark.datapipe.text_index import (
        positional_postings,
        proximity_match,
    )

    docs = spark.createDataFrame(
        [
            (1, "a x x b"),    # distance 3: inside slop=3
            (2, "a x x x b"),  # distance 4: outside
            (3, "b x a"),      # wrong order
            (4, "a b x a x b"),  # pairs: (0,1), (3,5); (0,5) is dist 5
        ],
        "doc_id long, text string",
    )
    post = positional_postings(docs)
    got = {
        r["doc_id"]: r["n_pairs"]
        for r in proximity_match(post, "a", "b", slop=3).collect()
    }
    assert got == {1: 1, 4: 2}
