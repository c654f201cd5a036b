"""Training-data pipeline operators: dedup family, similarity search,
text analysis, multimodal plumbing — behavioral tests on planted data
(the oracle harness covers value parity; these cover semantics)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl__project_spark.datapipe import (
    brute_force_topk,
    bucketed_topk,
    char_shingles,
    dedup_exact,
    jaccard_prefix_pairs,
    lang_id_heuristic,
    lsh_candidate_pairs,
    minhash_signature,
    ngram_jaccard_pairs,
    simhash,
    text_stats,
)
from etl__project_spark.datapipe.multimodal import extract_features, synth_media

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from the warm windowsill and the birds sing in the garden outside"
)


@pytest.fixture()
def docs(spark):
    rows = [
        (0, BASE),
        (1, BASE),  # exact duplicate of 0
        (2, BASE.replace("warm", "cold")),  # near-duplicate of 0
        (3, "der hund und die katze und der vogel und die maus im garten"),
        (4, "completely different short text about spark queries and joins"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_dedup_exact_groups(docs):
    out = {r["keep_id"]: r["n_copies"] for r in dedup_exact(docs).collect()}
    assert out[0] == 2  # docs 0 and 1 collapse
    assert sum(out.values()) == 5 and len(out) == 4


def test_minhash_identical_and_near(docs):
    sig = minhash_signature(char_shingles(docs, distinct=False))
    rows = {r["doc_id"]: [r[f"h{j}"] for j in range(8)] for r in sig.collect()}
    assert rows[0] == rows[1]  # identical text → identical signature
    same_near = sum(a == b for a, b in zip(rows[0], rows[2]))
    assert same_near >= 4  # near-dup agrees on most hashes
    same_far = sum(a == b for a, b in zip(rows[0], rows[4]))
    assert same_far <= same_near


def test_lsh_finds_planted_dups(docs):
    sig = minhash_signature(char_shingles(docs, distinct=False)).persist()
    sig.count()
    pairs = {(r["id_a"], r["id_b"]) for r in lsh_candidate_pairs(sig).collect()}
    assert (0, 1) in pairs  # exact dup always collides
    # unrelated docs never share a full band
    assert (3, 4) not in pairs


def test_jaccard_pairs(docs):
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, threshold=0.2).collect()
    }
    assert pairs[(0, 1)] == 1.0
    assert pairs[(0, 2)] > 0.8  # near-dup
    assert (0, 4) not in pairs


def test_jaccard_prefix_matches_brute_force(spark):
    """Lossless guarantee: prefix-filtered output == brute-force all-pairs,
    including the exact-dup expansion paths (within-cluster pairs at 1.0
    and cross-cluster pairs replicated per copy)."""
    rows = [
        (0, BASE),
        (1, BASE),  # exact duplicate of 0
        (2, BASE),  # second exact duplicate → 3-clique within-cluster
        (3, BASE.replace("warm", "cold")),  # near-dup cluster B
        (4, BASE.replace("warm", "cold")),  # exact dup of 3
        (5, "der hund und die katze und der vogel und die maus im garten"),
        (6, "completely different short text about spark queries and joins"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    t = 0.35
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in jaccard_prefix_pairs(docs, threshold=t).collect()
    }
    # brute force via the length-bucket path with one huge bucket
    want = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(
            docs, bucket_width=10_000, threshold=t
        ).collect()
    }
    assert got == want
    assert got[(0, 1)] == 1.0 and got[(0, 2)] == 1.0 and got[(1, 2)] == 1.0
    assert got[(3, 4)] == 1.0
    assert 0.8 < got[(0, 3)] < 1.0  # cross-cluster near-dup, every copy pair
    assert got[(0, 3)] == got[(1, 4)] == got[(2, 3)]
    assert not any(5 in p or 6 in p for p in got)


def test_pack_sequences_contiguous_streams(spark):
    """Packing invariants: within each group the documents form one
    gapless concatenated stream (start offsets are the running cumsum),
    and pack ids are the budget multiples of the start offsets."""
    from etl__project_spark.datapipe.sampling import pack_sequences

    rows = [(i, " ".join(["w"] * (3 + i % 5))) for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = sorted(
        pack_sequences(df, budget=8, n_groups=2).collect(),
        key=lambda r: (r["doc_id"]),
    )
    by_group: dict[int, list] = {}
    for r in out:
        by_group.setdefault(r["doc_id"] % 2, []).append(r)
    assert len(out) == 20
    for grp, rs in by_group.items():
        expect_start = 0
        for r in rs:  # doc_id order == stream order
            assert r["start_offset"] == expect_start
            assert r["pack_id"] == grp * 2**32 + r["start_offset"] // 8
            expect_start += r["n_tokens"]


def test_simhash_distance(docs):
    sigs = {r["doc_id"]: r["simhash"] for r in simhash(docs).collect()}
    assert sigs[0] == sigs[1]
    ham = lambda a, b: bin(a ^ b).count("1")  # noqa: E731
    assert ham(sigs[0], sigs[2]) <= ham(sigs[0], sigs[4])


def test_text_stats_and_lang(docs):
    stats = {r["doc_id"]: r for r in text_stats(docs).collect()}
    assert stats[0]["n_tokens"] == len(BASE.split(" "))
    assert stats[0]["n_chars"] == len(BASE)
    langs = {r["doc_id"]: r["lang_guess"] for r in lang_id_heuristic(docs).collect()}
    assert langs[0] == "en"
    assert langs[3] == "de"


def test_ann_self_is_top1(spark):
    import random

    random.seed(7)
    rows = [(i, [random.uniform(-1, 1) for _ in range(16)]) for i in range(50)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = emb.filter(F.col("vec_id") == 5)
    top = brute_force_topk(emb, q, k=3).collect()
    assert top[0]["vec_id"] == 5 and top[0]["cosine"] == pytest.approx(1.0)
    # bucketed variant also finds the query itself (same bucket by def.)
    btop = bucketed_topk(emb, q, k=3).collect()
    assert btop[0]["vec_id"] == 5


def test_multimodal_plumbing(docs):
    media = synth_media(docs.withColumn("text", F.col("text")))
    feats = {r["media_id"]: r for r in extract_features(media, fake=True).collect()}
    assert feats[0]["n_bytes"] == len(BASE.encode())
    assert feats[0]["content_sha"] == feats[1]["content_sha"]
    assert len(feats[0]["feature"]) == 8
    assert feats[0]["feature"] == feats[1]["feature"]
    assert feats[0]["content_sha"] != feats[4]["content_sha"]


def test_multimodal_real_decode_is_stubbed(docs):
    media = synth_media(docs)
    with pytest.raises(Exception, match="NotImplementedError|decode"):
        extract_features(media, fake=False).collect()


def test_multimodal_frame_sampling_fanout(docs, spark):
    """1→N frame sampling: each blob yields ceil(duration/stride) rows,
    frame signatures are deterministic per (payload, ts), and the real
    extractor stays env-stubbed."""
    import hashlib

    from etl__project_spark.datapipe.multimodal import sample_frames

    media = synth_media(docs).drop("duration_ms").withColumn(
        "duration_ms", (F.length("payload") * 100).cast("long")
    )
    frames = sample_frames(media, stride_ms=250, fake=True).collect()
    by_media = {}
    for r in frames:
        by_media.setdefault(r["media_id"], []).append(r)
    durations = {
        r["media_id"]: r["duration_ms"]
        for r in media.select("media_id", "duration_ms").collect()
    }
    payloads = {
        r["media_id"]: bytes(r["payload"])
        for r in media.select("media_id", "payload").collect()
    }
    for mid, dur in durations.items():
        want_n = (dur + 249) // 250
        got = sorted(by_media.get(mid, []), key=lambda r: r["frame_ts_ms"])
        assert len(got) == want_n
        assert [r["frame_ts_ms"] for r in got] == list(range(0, dur, 250))
        assert got[0]["frame_sha"] == hashlib.sha256(
            payloads[mid] + b":0"
        ).hexdigest()
    with pytest.raises(Exception, match="NotImplementedError|ffmpeg"):
        sample_frames(media, fake=False).collect()


def test_multimodal_audio_windows_overlap_and_clip(docs, spark):
    """1→N audio windowing with OVERLAP: each blob yields
    ceil(duration/hop) windows of [start, min(start+window, duration)),
    adjacent windows overlap by (window − hop), per-window energies are
    deterministic hex arithmetic over (payload, start), and the real
    decoder stays env-stubbed."""
    import hashlib

    from etl__project_spark.datapipe.multimodal import synth_media, window_audio

    media = synth_media(docs).drop("duration_ms").withColumn(
        "duration_ms", (F.length("payload") * 100).cast("long")
    )
    wins = window_audio(media, window_ms=400, hop_ms=250, fake=True).collect()
    by_media = {}
    for r in wins:
        by_media.setdefault(r["media_id"], []).append(r)
    rows = {
        r["media_id"]: (r["duration_ms"], bytes(r["payload"]))
        for r in media.select("media_id", "duration_ms", "payload").collect()
    }
    for mid, (dur, payload) in rows.items():
        got = sorted(by_media.get(mid, []), key=lambda r: r["win_start_ms"])
        assert len(got) == (dur + 249) // 250
        for r in got:
            assert r["win_end_ms"] == min(r["win_start_ms"] + 400, dur)
            h = hashlib.sha256(
                payload + b":" + str(r["win_start_ms"]).encode()
            ).hexdigest()
            assert r["energy_micro"] == int(h[:8], 16) % 1_000_000
        # overlap: window > hop → consecutive windows share 150 ms
        if len(got) >= 2 and got[0]["win_end_ms"] == 400:
            assert got[1]["win_start_ms"] < got[0]["win_end_ms"]
    with pytest.raises(Exception, match="NotImplementedError|librosa"):
        window_audio(media, fake=False).collect()


def test_connected_components_chain_and_pair(spark):
    from etl__project_spark.datapipe.dedup import connected_components

    # 40-node chain (diameter >> a naive propagation round budget),
    # a 2-node pair, and an isolated node.
    chain = [(i, i + 1) for i in range(39)]
    edges = spark.createDataFrame(
        chain + [(100, 101)], "id_a long, id_b long"
    )
    nodes = spark.createDataFrame(
        [(i,) for i in range(40)] + [(100,), (101,), (200,)], "id long"
    )
    got = {r["id"]: r["component"] for r in connected_components(nodes, edges).collect()}
    assert all(got[i] == 0 for i in range(40))
    assert got[100] == 100 and got[101] == 100
    assert got[200] == 200


def test_regex_token_counts(spark):
    from etl__project_spark.datapipe.text import regex_token_counts

    docs = spark.createDataFrame(
        [(1, "Hello, world! v2 has 3 parts"), (2, "one")],
        "doc_id long, text string",
    )
    r = {x["doc_id"]: x for x in regex_token_counts(docs).collect()}
    # "Hello , world ! v 2 has 3 parts" -> 9 regex pieces, 6 ws words
    assert r[1]["n_ws_tokens"] == 6
    assert r[1]["n_bpe_tokens"] == 9
    assert r[1]["n_alpha_tokens"] == 5
    assert r[1]["n_num_tokens"] == 2
    assert r[1]["n_sym_tokens"] == 2
    assert r[2]["n_bpe_tokens"] == 1 and r[2]["n_sym_tokens"] == 0


def test_near_dup_pairs_exact_and_blocked(spark):
    from etl__project_spark.datapipe.similarity import near_dup_pairs

    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0, 0.0, 0.0]),      # bucket 1 (only bit0 set)
            (1, [0.999, 0.01, 0.0, 0.0]),   # near-dup of 0 but bucket 3 (bit1 set)
            (2, [-1.0, 0.0, 0.0, 0.0]),     # opposite direction
            (3, [0.999, -0.01, 0.0, 0.0]),  # near-dup of 0/1, bucket 1
        ],
        "vec_id long, embedding array<float>",
    )
    # The quadratic baseline must be an explicit opt-in (scale guard).
    with pytest.raises(ValueError, match="allow_quadratic"):
        near_dup_pairs(emb, 0.99)
    exact = {
        (r["id_a"], r["id_b"])
        for r in near_dup_pairs(emb, 0.99, allow_quadratic=True).collect()
    }
    assert exact == {(0, 1), (0, 3), (1, 3)}
    blocked = {
        (r["id_a"], r["id_b"])
        for r in near_dup_pairs(emb, 0.99, block_by_bucket=True).collect()
    }
    # vec 1 lands in bucket 3 (positive 2nd component) while 0/3 share
    # bucket 1 -> cross-bucket pairs are missed: the recall<1 trade-off.
    assert blocked == {(0, 3)}


def test_ivf_topk_probes_cells(spark):
    import random

    from etl__project_spark.datapipe.similarity import ivf_topk

    random.seed(11)
    rows = [(i, [random.uniform(-1, 1) for _ in range(16)]) for i in range(60)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = ivf_topk(emb, n_centroids=4, n_probe=2, k=3, n_queries=3).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["q_id"], []).append(r)
    # every query answered, self excluded, <= k results each, sims sorted
    assert set(by_q) == {0, 1, 2}
    for q, rs in by_q.items():
        assert all(r["cand_id"] != q for r in rs)
        assert len(rs) <= 3
        sims = [r["sim"] for r in rs]
        assert sims == sorted(sims, reverse=True)
    # probing 2 of 4 cells must still find a decent neighbour: every
    # returned sim is a valid cosine in [-1, 1]
    assert all(-1.0 <= r["sim"] <= 1.0 for r in out)


def test_quality_rules_gate(spark):
    from etl__project_spark.datapipe import quality_rules

    # 45 words, mean word length 4.0, plenty of stopword hits
    long_good = "the quick brown foxes and hounds of a meadow " * 5
    rows = [
        (0, long_good.strip()),
        (1, "too short a text"),  # fails word count
        (2, ("x" * 30 + " ") * 40),  # mean word length 30 >> 10
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in quality_rules(df).collect()}
    assert out[0]["keep"] is True
    assert out[1]["keep"] is False and out[1]["rule_word_count"] is False
    assert out[2]["keep"] is False and out[2]["rule_mean_word_len"] is False


def test_pii_scrub_redacts_and_counts(spark):
    from etl__project_spark.datapipe import pii_scrub
    from etl__project_spark.datapipe.text import PII_EMAIL, PII_PHONE

    df = spark.createDataFrame(
        [(0, "mail bob@example.com and carol@x.org call 555-1234"), (1, "clean text")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in pii_scrub(df).collect()}
    assert out[0]["n_emails"] == 2 and out[0]["n_phones"] == 1
    assert out[1]["n_emails"] == 0 and out[1]["n_phones"] == 0
    # the scrubbed hash equals md5 of the manually redacted string
    import hashlib
    expect = hashlib.md5(b"mail [EMAIL] and [EMAIL] call [PHONE]").hexdigest()
    assert out[0]["scrubbed_md5"] == expect


def test_hash_sample_deterministic_and_rate(spark):
    from etl__project_spark.datapipe import hash_sample

    df = spark.range(0, 10_000).withColumnRenamed("id", "k")
    s1 = {r["k"] for r in hash_sample(df, 10, "k").collect()}
    s2 = {r["k"] for r in hash_sample(df.repartition(7), 10, "k").collect()}
    assert s1 == s2  # partitioning-independent, reproducible
    assert 0.08 < len(s1) / 10_000 < 0.12  # ~10%
    salted = {r["k"] for r in hash_sample(df, 10, "k", salt="other").collect()}
    assert salted != s1  # salt decorrelates passes


def test_contamination_check_flags_overlap(spark):
    from etl__project_spark.datapipe import contamination_check

    eval_set = spark.createDataFrame(
        [(100, "the secret benchmark answer is forty two exactly")],
        "doc_id long, text string",
    )
    train = spark.createDataFrame(
        [
            (0, "prefix text the secret benchmark answer is forty two exactly suffix"),
            (1, "completely unrelated training document about databases"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in contamination_check(train, eval_set).collect()}
    assert out[0]["contaminated"] is True and out[0]["n_shared_shingles"] > 0
    assert out[1]["contaminated"] is False and out[1]["n_shared_shingles"] == 0


def test_bpe_pair_counts(spark):
    from etl__project_spark.datapipe.text import bpe_pair_counts

    docs = spark.createDataFrame(
        [(1, "banana x"), (2, "AA ab")], "doc_id long, text string"
    )
    got = {r["pair"]: r["n_occurrences"] for r in bpe_pair_counts(docs).collect()}
    # "banana": ba an na an na; "x" dropped (len<2); "AA" lowercased
    assert got == {"ba": 1, "an": 2, "na": 2, "aa": 1, "ab": 1}


def test_stratified_hash_sample_rates_and_determinism(spark):
    from etl__project_spark.datapipe.sampling import stratified_hash_sample

    rows = [(i, "keep" if i % 2 == 0 else "drop") for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = stratified_hash_sample(
        df, {"keep": 100, "drop": 0}, "source", "doc_id"
    )
    ids = sorted(r["doc_id"] for r in out.collect())
    assert ids == [i for i in range(200) if i % 2 == 0]  # 100% vs 0%
    # unlisted strata fall back to default_pct
    half = stratified_hash_sample(df, {}, "source", "doc_id", default_pct=50)
    n = half.count()
    assert 0 < n < 200
    assert sorted(r["doc_id"] for r in half.collect()) == sorted(
        r["doc_id"] for r in half.collect()
    )  # deterministic re-run


def test_common_ngram_filter_flags_boilerplate(spark):
    from etl__project_spark.datapipe.text import common_ngram_filter

    boiler = "all rights reserved click here to subscribe"
    rows = [(i, boiler) for i in range(6)]  # 6 copies: every trigram df=6
    rows.append((10, "a genuinely novel sentence about spark physical plans"))
    rows.append((11, boiler + " plus some unique trailing novel words here"))
    rows.append((20, "too short"))  # < 3 words -> no grams
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in common_ngram_filter(df, df_threshold=6).collect()}
    assert len(out) == 9
    assert not out[0]["keep"] and out[0]["common_frac"] == 1.0
    assert out[10]["keep"] and out[10]["common_frac"] == 0.0
    assert 0.0 < out[11]["common_frac"] < 1.0  # mixed doc
    assert out[20]["n_grams"] == 0 and out[20]["keep"]


def test_canonical_components_collapses_exact_dups_before_signing(spark):
    from etl__project_spark.datapipe.dedup import (
        canonical_components,
        char_shingles,
        connected_components,
        lsh_candidate_pairs,
        minhash_signature,
    )

    base = [
        "the quick brown fox jumps over the lazy dog and runs away fast",
        "the quick brown fox jumps over the lazy dog and runs away quick",
        "completely different content talking about spark physical plans",
        "unrelated third text on histogram sketches and register merges",
    ]
    rows = []
    for i, t in enumerate(base):
        for copy in range(5):  # 5 exact copies of each distinct text
            rows.append((i * 100 + copy, t))
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    got = {
        (r["id"], r["component"])
        for r in canonical_components(docs, n_hashes=8, n_bands=2, rows_per_band=4).collect()
    }

    # uncollapsed reference: sign every row
    sig = minhash_signature(char_shingles(docs, distinct=False), n_hashes=8)
    pairs = lsh_candidate_pairs(sig, n_bands=2, rows_per_band=4)
    want = {
        (r["id"], r["component"])
        for r in connected_components(
            docs.select(F.col("doc_id").alias("id")), pairs
        ).collect()
    }
    assert got == want
    assert len(got) == len(rows)

    # and the signed working set really is per-distinct-text: the rep
    # frame has 4 rows, not 20
    reps = docs.groupBy(F.md5("text").alias("h")).agg(F.min("doc_id").alias("rep_id"))
    assert reps.count() == len(base)


def test_batch_topk_matches_brute_force_per_query(spark):
    import random

    from etl__project_spark.datapipe.similarity import batch_topk, brute_force_topk

    random.seed(11)
    rows = [(i, [random.uniform(-1, 1) for _ in range(16)]) for i in range(40)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = batch_topk(emb, n_queries=3, k=4)
    by_q = {}
    for r in got.collect():
        by_q.setdefault(r["q_id"], []).append((r["sim"], r["cand_id"]))
    assert set(by_q) == {0, 1, 2}
    for qid, cands in by_q.items():
        # per-query result equals single-query brute force minus self
        single = [
            (r["cosine"], r["vec_id"])
            for r in brute_force_topk(
                emb, emb.filter(F.col("vec_id") == qid), k=5
            ).collect()
            if r["vec_id"] != qid
        ][:4]
        assert sorted(cands, key=lambda t: (-t[0], t[1])) == single


def test_batch_topk_broadcasts_queries_no_vector_shuffle(spark):
    import random

    from etl__project_spark.datapipe.similarity import batch_topk

    random.seed(12)
    rows = [(i, [random.uniform(-1, 1) for _ in range(8)]) for i in range(30)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    plan = batch_topk(emb, n_queries=2, k=2)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    # the only hash exchange is the per-query top-k window on q_id
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Exchange hashpartitioning(q_id" in plan


def test_semantic_dedup_drops_within_cluster_only(spark):
    from etl__project_spark.datapipe.similarity import semantic_dedup

    emb = spark.createDataFrame(
        [
            # seeds 0 and 1 define two well-separated clusters
            (0, [1.0, 0.0, 0.0, 0.0]),
            (1, [0.0, 1.0, 0.0, 0.0]),
            # 2 is a near-dup of 0 (same cluster) -> dropped
            (2, [0.999, 0.01, 0.0, 0.0]),
            # 3 leans toward cluster 1 (cos 0.8 to seed 1 < 0.95) -> kept
            (3, [0.6, 0.8, 0.0, 0.0]),
            # 4 duplicates 3 -> dropped (lower-id neighbour 3 in cluster 1)
            (4, [0.6, 0.8, 0.001, 0.0]),
        ],
        "vec_id long, embedding array<float>",
    )
    out = {r["vec_id"]: (r["cluster_id"], r["keep"]) for r in
           semantic_dedup(emb, n_clusters=2, threshold=0.95).collect()}
    assert out[0] == (0, True) and out[1] == (1, True)
    assert out[2] == (0, False)          # near-dup of seed 0
    assert out[3][0] == 1 and out[3][1]  # dissimilar to seed 1: kept
    assert out[4] == (1, False)          # near-dup of 3 within cluster 1


def test_semantic_dedup_pair_join_is_equi_on_cluster(spark):
    import random

    from etl__project_spark.datapipe.similarity import semantic_dedup

    random.seed(13)
    rows = [(i, [random.uniform(-1, 1) for _ in range(8)]) for i in range(30)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    plan = semantic_dedup(emb, n_clusters=4)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    # pair candidates come from an equi-join keyed on cluster_id
    assert "cluster_id" in plan


def test_covariance_matches_numpy(spark):
    import random

    import numpy as np

    from etl__project_spark.datapipe.linalg import covariance_matrix

    random.seed(21)
    d, n = 6, 200
    data = [[random.uniform(-2, 2) for _ in range(d)] for _ in range(n)]
    emb = spark.createDataFrame(
        [(i, v) for i, v in enumerate(data)], "vec_id long, embedding array<float>"
    )
    got = {(r["i"], r["j"]): r["cov"] for r in covariance_matrix(emb, dim=d).collect()}
    x = np.array(data, dtype=np.float32).astype(np.float64)
    ref = (x.T @ x) / n - np.outer(x.mean(axis=0), x.mean(axis=0))
    assert len(got) == d * (d + 1) // 2
    for (i, j), c in got.items():
        assert c == pytest.approx(ref[i - 1, j - 1], abs=2e-4)


def test_covariance_shuffle_is_bounded_hash_agg(spark):
    import random

    from etl__project_spark.datapipe.linalg import covariance_matrix

    random.seed(22)
    emb = spark.createDataFrame(
        [(i, [random.uniform(-1, 1) for _ in range(8)]) for i in range(50)],
        "vec_id long, embedding array<float>",
    )
    plan = covariance_matrix(emb, dim=8)._jdf.queryExecution().executedPlan().toString()
    # two-phase agg: partial HashAggregate before the (i,j) exchange
    assert "HashAggregate" in plan and "SortAggregate" not in plan
    assert "CartesianProduct" not in plan


def test_pca_power_iteration_matches_eigh(spark):
    import random

    import numpy as np

    from etl__project_spark.datapipe.linalg import covariance_matrix, pca_top_component

    random.seed(23)
    d, n = 5, 300
    # anisotropic cloud: dominant direction along a fixed vector
    base = np.array([3.0, 1.0, 0.5, 0.2, 0.1])
    data = [
        list(base * random.gauss(0, 1) + np.random.RandomState(i).normal(0, 0.3, d))
        for i in range(n)
    ]
    emb = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(data)],
        "vec_id long, embedding array<float>",
    )
    cov = covariance_matrix(emb, dim=d)
    eigval, vec = pca_top_component(cov, dim=d)
    x = np.array(data)
    ref_cov = np.cov(x, rowvar=False, bias=True)
    w, v = np.linalg.eigh(ref_cov)
    ref_val, ref_vec = w[-1], v[:, -1]
    if ref_vec[int(np.argmax(np.abs(ref_vec)))] < 0:
        ref_vec = -ref_vec
    assert eigval == pytest.approx(ref_val, rel=0.02)
    assert float(abs(np.dot(vec, ref_vec))) == pytest.approx(1.0, abs=1e-3)


def test_hll_merge_is_idempotent_commutative_and_lossless(spark):
    """merge(sketch(A), sketch(B)) == sketch(A ∪ B); merging a sketch
    with itself is a no-op — the algebra replays/shards rely on."""
    from etl__project_spark.datapipe.sketches import hll_merge, hll_registers

    a = spark.range(0, 400).selectExpr("concat('u', id) as v")
    b = spark.range(300, 700).selectExpr("concat('u', id) as v")
    both = spark.range(0, 700).selectExpr("concat('u', id) as v")
    ra, rb = hll_registers(a, "v"), hll_registers(b, "v")
    merged = {(r["reg"], r["rho"]) for r in hll_merge(ra, rb).collect()}
    one_shot = {(r["reg"], r["rho"]) for r in hll_registers(both, "v").collect()}
    assert merged == one_shot
    self_merge = {(r["reg"], r["rho"]) for r in hll_merge(ra, ra).collect()}
    assert self_merge == {(r["reg"], r["rho"]) for r in ra.collect()}
    flipped = {(r["reg"], r["rho"]) for r in hll_merge(rb, ra).collect()}
    assert flipped == merged


def test_hll_estimate_accuracy_bands(spark):
    from etl__project_spark.datapipe.sketches import hll_estimate, hll_registers

    for n in (30, 1000):
        df = spark.range(n).selectExpr("concat('x', id) as v")
        est = hll_estimate(hll_registers(df, "v"))
        assert abs(est - n) <= max(0.3 * n, 8)


def test_pipeline_e2e_each_stage_drops_its_target(spark, monkeypatch):
    """Planted corpus: one doc per failure mode — low quality (stage 1),
    exact dup (stage 2), eval-contaminated (stage 3) — and the mix
    filter applies its deterministic hash rule to the survivors."""
    import hashlib

    import etl__project_spark.plans.catalog as cat

    good_a = (
        "the quick brown fox and the lazy dog of the garden walk under "
        "the bright morning sun while the birds sing and the cat sleeps "
        "near the old wooden fence beside the quiet river bank today"
    )
    good_b = (
        "modern data pipelines and the engines behind them shuffle vast "
        "amounts of text every day while the operators watch the metrics "
        "and the schedulers keep every stage of the flow moving forward"
    )
    eval_text = (
        "the standardized benchmark of cambridge university press remains "
        "the canonical held out evaluation corpus for the language model "
        "and the researchers guard it from the training set with care"
    )
    # near-copy of the eval doc (shares ~all 13-gram shingles → the
    # containment fraction >= 0.8 flags it; a doc merely QUOTING a short
    # eval span stays below the threshold and is kept)
    contaminated = eval_text.replace("with care", "with great care always")
    rows = [
        (0, good_a, "en", "src0", len(good_a)),
        (1, good_a, "en", "src0", len(good_a)),          # exact dup of 0
        (2, "too short to pass", "en", "src0", 17),       # fails quality
        (3, contaminated, "en", "src0", len(contaminated)),
        (4, good_b, "en", "src0", len(good_b)),
        (100, eval_text, "en", "src0", len(eval_text)),   # eval slice
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    monkeypatch.setattr(cat, "load_table", lambda s, d, t: docs)
    got = {r["doc_id"] for r in cat.QUERIES["doc_pipeline_e2e"](spark, "unused").collect()}

    def mix_keeps(doc_id, rate=50):
        h = int(hashlib.md5(f"{doc_id}mix".encode()).hexdigest()[:15], 16)
        return h % 100 < rate

    expected = {d for d in (0, 4) if mix_keeps(d)}
    assert got == expected
    # the planted failures never survive, regardless of the mix hash
    assert not ({1, 2, 3, 100} & got)


def test_pca_top_k_and_projection_match_numpy(spark):
    import random

    import numpy as np

    from etl__project_spark.datapipe.linalg import (
        covariance_matrix,
        pca_top_k,
        project_embeddings,
    )

    random.seed(41)
    d, n = 6, 400
    rng = np.random.RandomState(41)
    # two dominant directions with distinct variances
    b1 = np.array([2.0, 1.0, 0.0, 0.0, 0.5, 0.0])
    b2 = np.array([0.0, 0.0, 1.5, -1.0, 0.0, 0.3])
    data = [
        b1 * rng.normal(0, 2) + b2 * rng.normal(0, 1) + rng.normal(0, 0.1, d)
        for _ in range(n)
    ]
    emb = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(data)],
        "vec_id long, embedding array<float>",
    )
    cov = covariance_matrix(emb, dim=d)
    vals, vecs = pca_top_k(cov, dim=d, k=2)
    x = np.array(data)
    ref_cov = np.cov(x, rowvar=False, bias=True)
    w, v = np.linalg.eigh(ref_cov)
    assert vals[0] == pytest.approx(w[-1], rel=0.02)
    assert vals[1] == pytest.approx(w[-2], rel=0.05)
    assert abs(float(np.dot(vecs[0], v[:, -1]))) == pytest.approx(1.0, abs=5e-3)
    assert abs(float(np.dot(vecs[1], v[:, -2]))) == pytest.approx(1.0, abs=5e-2)
    # projection: spark-side dots equal numpy dots (float32 input cast)
    proj = {
        r["vec_id"]: (r["p0"], r["p1"])
        for r in project_embeddings(emb, vecs).collect()
    }
    x32 = x.astype(np.float32).astype(np.float64)
    for i in (0, 7, 399):
        assert proj[i][0] == pytest.approx(float(x32[i] @ vecs[0]), abs=1e-9)
        assert proj[i][1] == pytest.approx(float(x32[i] @ vecs[1]), abs=1e-9)


def test_project_embeddings_is_scan_only(spark):
    from etl__project_spark.datapipe.linalg import project_embeddings

    emb = spark.createDataFrame(
        [(0, [1.0, 2.0]), (1, [3.0, 4.0])], "vec_id long, embedding array<float>"
    )
    plan = (
        project_embeddings(emb, [[1.0, 0.0], [0.0, 1.0]])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan and "Join" not in plan


def test_winnowing_guarantee_shared_span_shares_fingerprint(spark, monkeypatch):
    """Winnowing guarantee: any substring of length >= w+k-1 (= 8 chars
    at w=4, k=5) shared between two docs yields at least one shared
    selected fingerprint HASH; a doc with no overlap shares none.
    Also: short docs (< k chars) produce no fingerprints at all."""
    import etl__project_spark.plans.catalog as cat

    shared = "xqzvwjkmpl trfgbn"  # 17-char span planted in docs 0 and 1
    rows = [
        (0, "aaaa " + shared + " bbbb ccc ddd eee fff", "en", "s", 40),
        (1, "eeee ffff " + shared + " gggg hhh iii", "en", "s", 40),
        (2, "totally unrelated content with other words here", "en", "s", 47),
        (3, "tiny", "en", "s", 4),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    monkeypatch.setattr(cat, "load_table", lambda s, d, t: docs)
    out = {r["doc_id"]: r for r in
           cat.QUERIES["doc_winnow_fingerprints"](spark, "unused").collect()}
    assert 3 not in out  # < 5 chars -> no grams -> no fingerprints

    # pure-Python winnowing model: k=5, w=4, rightmost-min selection
    import hashlib

    def model(text, k=5, w=4):
        hs = [
            int(hashlib.md5(text[i : i + k].encode()).hexdigest()[:7], 16)
            for i in range(len(text) - k + 1)
        ]
        sel = set()
        for s in range(len(hs) - w + 1):
            win = hs[s : s + w]
            m = min(win)
            p = s + max(i for i, h in enumerate(win) if h == m)
            sel.add((hs[p], p))
        return sel

    for d in (0, 1, 2):
        fps = model(rows[d][1])
        hashes = [h for h, _ in fps]
        assert out[d]["n_fps"] == len(fps)
        assert out[d]["fp_min"] == min(hashes)
        assert out[d]["fp_max"] == max(hashes)
        assert out[d]["fp_sum"] == sum(hashes)
    # the winnowing guarantee, on the model the query was just proven
    # equal to: the 17-char planted span forces a shared fingerprint hash
    shared_hashes = {h for h, _ in model(rows[0][1])} & {
        h for h, _ in model(rows[1][1])
    }
    assert shared_hashes
    assert not ({h for h, _ in model(rows[0][1])} & {h for h, _ in model(rows[2][1])})


def test_dsir_weights_prefer_target_like_docs(spark):
    """Docs that look like the target distribution must out-score docs
    that don't, and mixed docs land in between; model joins broadcast
    (the 1024-bucket model is KBs at any corpus size)."""
    from etl__project_spark.datapipe.text import dsir_weights

    rows = [
        (0, "alpha alpha alpha alpha", "tgt"),
        (1, "alpha alpha alpha alpha", "raw"),   # target-LIKE, raw-sourced
        (2, "beta beta beta beta", "raw"),
        (3, "alpha alpha beta beta", "raw"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {
        r["doc_id"]: r
        for r in dsir_weights(df, target_sources=["tgt"]).collect()
    }
    assert all(out[i]["n_tokens"] == 4 for i in out)
    # identical text ⇒ identical score regardless of the doc's own source
    assert out[0]["dsir_logratio"] == out[1]["dsir_logratio"]
    assert out[0]["dsir_logratio"] > out[3]["dsir_logratio"] > out[2]["dsir_logratio"]

    from etl__project_spark.plans import QUERIES

    plan = (
        QUERIES["doc_dsir_weights"](spark, "/root/testdata/sf0.001")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_dedup_keep_best_prefers_source_then_length(spark, monkeypatch):
    """Planted component: three near-identical docs — keeper must be the
    curated-source one even though it is neither longest nor min-id;
    among same-priority docs, longest wins; singleton components keep
    themselves."""
    import etl__project_spark.plans.catalog as cat

    base = "the quick brown fox jumps over the lazy dog " * 10
    # docs 1 and 3 are EXACT duplicates (guaranteed same component via
    # the content-hash collapse); doc 2 may or may not LSH-link — the
    # invariant under test is the keeper policy, not LSH recall
    rows = [
        (1, base + "tail one", "src5", len(base) + 8),
        (2, base + "tail two longer", "src7", len(base) + 15),
        (3, base + "tail one", "src0", len(base) + 8),  # curated -> wins
        (9, "completely different standalone text " * 8, "src9", 300),
    ]
    docs = spark.createDataFrame(
        [(i, t, "en", s, n) for (i, t, s, n) in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    monkeypatch.setattr(cat, "load_table", lambda s, d, t: docs)
    out = {
        r["component"]: (r["keep_id"], r["keep_source"])
        for r in cat.QUERIES["doc_dedup_keep_best"](spark, "unused").collect()
    }
    assert out[1] == (3, "src0")      # curated source beats length and id
    assert out[9] == (9, "src9")      # singleton keeps itself


def test_textrank_hub_word_ranks_first(spark, monkeypatch):
    """Planted graph: 'hub' is adjacent to six distinct leaves (degree
    6), an isolated 'solo pair' edge sits apart. TextRank must rank the
    hub first, report its degree, score all six structurally-identical
    leaves identically, and produce the exact same micro-unit scores on
    a second run (the determinism the iterated integer quantization
    buys)."""
    import etl__project_spark.plans.catalog as cat

    rows = [
        (0, "hub alpha hub beta hub gamma hub delta"),
        (1, "hub epsilon hub zeta"),
        (2, "solo pair"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string").select(
        "doc_id",
        "text",
        F.lit("en").alias("lang"),
        F.lit("web").alias("source"),
        F.length("text").alias("n_chars"),
    )
    monkeypatch.setattr(cat, "load_table", lambda s, d, t: df)
    run1 = cat.QUERIES["doc_textrank_keywords"](spark, "unused").collect()
    run2 = cat.QUERIES["doc_textrank_keywords"](spark, "unused").collect()
    assert [tuple(r) for r in run1] == [tuple(r) for r in run2]
    got = {r["word"]: r for r in run1}
    assert set(got) == {"hub", "alpha", "beta", "gamma", "delta",
                        "epsilon", "zeta", "solo", "pair"}
    top = run1[0]
    assert top["word"] == "hub" and top["degree"] == 6
    leaf_scores = {got[w]["rank_micro"]
                   for w in ("alpha", "beta", "gamma", "delta", "epsilon", "zeta")}
    assert len(leaf_scores) == 1  # symmetric leaves score identically
    assert top["rank_micro"] > max(got[w]["rank_micro"] for w in got if w != "hub")
    assert got["solo"]["rank_micro"] == got["pair"]["rank_micro"] == \
        got["solo"]["rank_micro"]  # the isolated edge is symmetric too


def test_triangle_count_planted_graph(spark, monkeypatch):
    """Planted graph: 'a b c a' closes one triangle (a-b, b-c, c-a),
    'x y z' is an open path (one wedge at y, no triangle). Expect
    exactly 1 triangle, 4 wedges (one per triangle corner + the path
    center), and global clustering 3*1/4 = 0.75."""
    import etl__project_spark.plans.catalog as cat

    rows = [(0, "a b c a"), (1, "x y z")]
    df = spark.createDataFrame(rows, "doc_id long, text string").select(
        "doc_id",
        "text",
        F.lit("en").alias("lang"),
        F.lit("web").alias("source"),
        F.length("text").alias("n_chars"),
    )
    monkeypatch.setattr(cat, "load_table", lambda s, d, t: df)
    [row] = cat.QUERIES["doc_cooccur_triangles"](spark, "unused").collect()
    assert row["n_triangles"] == 1
    assert row["n_wedges"] == 4
    assert row["global_clustering_micro"] == 750000


def test_kcore_histogram_clique_and_pendant(spark, monkeypatch):
    """Planted graph: 'a b c d a c b d' wires the full K4 clique
    (every member has true coreness 3), 'd e f' hangs a pendant path
    (e, f have coreness 1). The h-index iteration must converge here
    (it stabilizes by round 2) and the histogram must read
    {1: 2 words, 3: 4 words}."""
    import etl__project_spark.plans.catalog as cat

    rows = [(0, "a b c d a c b d"), (1, "d e f")]
    df = spark.createDataFrame(rows, "doc_id long, text string").select(
        "doc_id",
        "text",
        F.lit("en").alias("lang"),
        F.lit("web").alias("source"),
        F.length("text").alias("n_chars"),
    )
    monkeypatch.setattr(cat, "load_table", lambda s, d, t: df)
    got = {
        r["coreness_est"]: r["n_words"]
        for r in cat.QUERIES["doc_kcore_histogram"](spark, "unused").collect()
    }
    assert got == {1: 2, 3: 4}


def test_ppr_stays_in_seed_cluster(spark, monkeypatch):
    """Planted barbell: triangle {seed-side} a-b-c, triangle x-y-z,
    single bridge c-x. Personalized PageRank seeded at... the catalog
    query seeds 'join', so plant 'join' as a triangle member: restart
    mass must keep the seed's own triangle (b, c twins) strictly above
    everything across the bridge."""
    import etl__project_spark.plans.catalog as cat

    rows = [(0, "join b c join"), (1, "x y z x"), (2, "c x")]
    df = spark.createDataFrame(rows, "doc_id long, text string").select(
        "doc_id",
        "text",
        F.lit("en").alias("lang"),
        F.lit("web").alias("source"),
        F.length("text").alias("n_chars"),
    )
    monkeypatch.setattr(cat, "load_table", lambda s, d, t: df)
    out = cat.QUERIES["doc_related_terms_ppr"](spark, "unused").collect()
    got = {r["word"]: r["ppr_micro"] for r in out}
    assert "join" not in got  # seed excluded
    assert got["b"] > 0 and got["c"] > 0
    far = [got.get(w, 0) for w in ("x", "y", "z")]
    assert min(got["b"], got["c"]) > max(far)


def test_hybrid_rrf_consensus_order(spark, monkeypatch):
    """Planted corpus where the two rankers disagree: doc 0 is #1 in
    BOTH lists (query-term-dense text, it IS the query embedding);
    doc 1 is #2 lexically / #3 semantically; doc 3 is #3 lexically /
    #4 semantically; doc 2 appears ONLY in the semantic list (#2).
    RRF must put the both-list docs 1 and 3 above single-list doc 2
    even though doc 2's one rank is better — the consensus property
    that makes RRF the fusion default. Expected order: 0, 1, 3, 2."""
    import etl__project_spark.plans.catalog as cat

    docs = spark.createDataFrame(
        [
            (0, "spark merge window spark merge window"),
            (1, "spark alpha beta"),
            (2, "nothing relevant here"),
            (3, "merge gamma delta epsilon zeta eta theta"),
        ],
        "doc_id long, text string",
    ).select(
        "doc_id",
        "text",
        F.lit("en").alias("lang"),
        F.lit("web").alias("source"),
        F.length("text").alias("n_chars"),
    )
    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0, 0.0, 0.0]),
            (1, [0.8, 0.2, 0.0, 0.0]),
            (2, [0.9, 0.05, 0.0, 0.0]),
            (3, [0.0, 1.0, 0.0, 0.0]),
        ],
        "vec_id long, embedding array<double>",
    )
    monkeypatch.setattr(
        cat, "load_table", lambda s, d, t: docs if t == "documents" else emb
    )
    out = cat.QUERIES["doc_hybrid_rrf"](spark, "unused").collect()
    assert [r["doc_id"] for r in out] == [0, 1, 3, 2]
    # doc 0 leads with rank 1 in both lists: 2 * floor(1e9/61)
    assert out[0]["rrf_nano"] == 2 * (10**9 // 61)


def test_emb_pipeline_scorecard_monotone(spark, monkeypatch):
    """Planted intake: 16 vectors — 12 well-behaved near-orthogonal
    rows, two EXACT duplicates of vector 0 (ids 14, 15), and two wild
    outliers (ids 12, 13; 100x scale). The scorecard must be monotone
    (raw >= gated >= deduped >= exemplars), gate exactly 10, and
    produce the identical frame on a second run (per-stage value
    semantics are pinned by each stage's standalone oracle)."""
    import etl__project_spark.plans.catalog as cat

    rows = []
    for i in range(12):
        v = [0.0] * 64
        v[i] = 1.0
        v[63] = 0.1
        rows.append((i, v))
    big = [100.0] * 64
    rows.append((12, big))
    rows.append((13, [-50.0] * 64))
    dup = [0.0] * 64
    dup[0] = 1.0
    dup[63] = 0.1
    rows.append((14, dup))
    rows.append((15, dup))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    monkeypatch.setattr(cat, "load_table", lambda s, d, t: emb)
    run1 = cat.QUERIES["emb_pipeline_e2e"](spark, "unused").collect()
    run2 = cat.QUERIES["emb_pipeline_e2e"](spark, "unused").collect()
    assert [tuple(r) for r in run1] == [tuple(r) for r in run2]
    n = {r["stage_name"]: r["n"] for r in run1}
    assert n["raw"] == 16
    assert n["gated"] == 6  # the gate drops exactly 10
    assert n["raw"] >= n["gated"] >= n["deduped"] >= n["exemplars"]
    # dedup semantics (exact dups collapse to one keeper) are
    # value-pinned by the emb_semantic_dedup oracle; the scorecard
    # only needs the per-stage counts to be monotone and reproducible


def test_split_leakage_audit_finds_planted_straddler(spark, monkeypatch):
    """Plant one near-dup pair that straddles the hash split: compute
    each candidate id's split with the SAME hash_bucket the operator
    uses, pick one train id and one non-train id, give them identical
    long texts (a guaranteed LSH candidate pair), and make every other
    doc unique. The audit must emit exactly one pair, flagged
    is_leak=True, between those two splits."""
    import etl__project_spark.plans.catalog as cat
    from etl__project_spark.datapipe.sampling import hash_bucket

    b = hash_bucket(F.col("id"), 100, salt="split")
    buckets = {
        r["id"]: r["b"]
        for r in spark.range(60).select("id", b.alias("b")).collect()
    }
    train_id = next(i for i, v in buckets.items() if v < 80)
    other_id = next(i for i, v in buckets.items() if v >= 80)
    import hashlib

    dup_text = "the quick brown fox jumps over the lazy dog again and again"
    rows = [(int(train_id), dup_text), (int(other_id), dup_text)]
    rows += [
        (
            int(i),
            " ".join(
                hashlib.md5(f"{i}-{j}".encode()).hexdigest() for j in range(8)
            ),
        )
        for i in buckets
        if i not in (train_id, other_id)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string").select(
        "doc_id",
        "text",
        F.lit("en").alias("lang"),
        F.lit("web").alias("source"),
        F.length("text").alias("n_chars"),
    )
    monkeypatch.setattr(cat, "load_table", lambda s, d, t: df)
    out = cat.QUERIES["doc_split_leakage_audit"](spark, "unused").collect()
    leaks = [r for r in out if r["is_leak"]]
    expect = tuple(sorted(["train", "val" if buckets[other_id] < 90 else "test"]))
    got = [(r["split_lo"], r["split_hi"], r["n_pairs"]) for r in leaks]
    assert (expect[0], expect[1], 1) in got
    assert sum(r["n_pairs"] for r in leaks) == 1  # only the planted pair leaks


def test_snm_pairs_cross_band_straddle(spark, monkeypatch):
    """Worst case for the banded decomposition: every first-char band
    has size 1 (every band is ALL edge rows), so every window pair
    straddles bands — plus one two-doc band to exercise the within-band
    lead path. Expect exactly the sliding-window-of-4 pair set over the
    global (key, doc_id) order, computed here by brute force."""
    import etl__project_spark.plans.catalog as cat

    texts = {
        0: "alpha one",
        1: "bravo two",
        2: "charlie three",
        3: "delta four",
        4: "echo five",
        5: "alpha zz sibling",  # second member of the 'a' band
    }
    df = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id long, text string"
    ).select(
        "doc_id",
        "text",
        F.lit("en").alias("lang"),
        F.lit("web").alias("source"),
        F.length("text").alias("n_chars"),
    )
    monkeypatch.setattr(cat, "load_table", lambda s, d, t: df)
    got = sorted(
        (r["id_a"], r["id_b"])
        for r in cat.QUERIES["doc_snm_pairs"](spark, "unused").collect()
    )
    order = sorted(texts, key=lambda i: (texts[i].lower()[:24], i))
    want = sorted(
        tuple(sorted((order[i], order[j])))
        for i in range(len(order))
        for j in range(i + 1, min(i + 4, len(order)))
    )
    assert got == want


def test_frame_sampling_null_duration_yields_no_frames(spark, docs):
    """Found by review: a NULL duration_ms arrives in pandas as float
    NaN, and `NaN or 0` is NaN — previously a ValueError inside
    mapInPandas. A blob with no duration must yield zero frame rows,
    while sized blobs in the same batch still fan out."""
    from etl__project_spark.datapipe.multimodal import sample_frames, synth_media

    media = synth_media(docs).drop("duration_ms").withColumn(
        "duration_ms",
        F.when(F.col("media_id") == 0, F.lit(None).cast("long")).otherwise(
            F.lit(500).cast("long")
        ),
    )
    frames = sample_frames(media, stride_ms=250, fake=True).collect()
    by_media = {}
    for r in frames:
        by_media.setdefault(r["media_id"], 0)
        by_media[r["media_id"]] += 1
    assert 0 not in by_media  # NULL duration: no frames, no crash
    assert all(v == 2 for k, v in by_media.items() if k != 0)


def test_multimodal_real_decode_same_contract_when_pil_present(spark):
    """VERDICT r7 #8: when the environment provides PIL, the REAL decode
    branch runs under the same contract assertions as the fake —
    FEATURE_SCHEMA shape, 8 floats in [0, 1], deterministic per payload,
    distinct payloads → distinct features. Skips where PIL is absent
    (this container), where the NotImplementedError guard test below
    keeps covering the stub path."""
    PIL = pytest.importorskip("PIL")  # noqa: F841
    import io

    from PIL import Image

    def png(color):
        img = Image.new("RGB", (16, 8), color)
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        return buf.getvalue()

    rows = [
        (0, "image", "image/png", 16, 8, None, png((255, 0, 0))),
        (1, "image", "image/png", 16, 8, None, png((255, 0, 0))),
        (2, "image", "image/png", 16, 8, None, png((0, 0, 255))),
    ]
    from etl__project_spark.datapipe.multimodal import (
        MEDIA_SCHEMA,
        extract_features,
    )

    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    feats = {r["media_id"]: r for r in extract_features(media, fake=False).collect()}
    assert set(feats) == {0, 1, 2}
    for r in feats.values():
        assert len(r["feature"]) == 8
        assert all(0.0 <= x <= 1.0 for x in r["feature"])
        assert r["n_bytes"] > 0 and len(r["content_sha"]) == 64
    # deterministic per payload; distinct payloads → distinct features
    assert feats[0]["feature"] == feats[1]["feature"]
    assert feats[0]["content_sha"] == feats[1]["content_sha"]
    assert feats[0]["feature"] != feats[2]["feature"]


def test_triangle_delta_conformal_batches(spark):
    """Trilinear triangle maintenance: an inserted edge closing a wedge
    adds a triangle, a deleted edge removes every triangle through it,
    and a batch mixing both (plus a D-D-D triangle born entirely inside
    one batch) nets exactly."""
    from pyspark.sql import functions as F

    from etl__project_spark.datapipe.graph import (
        maintain_triangles_cdc,
        triangle_delta_signed,
    )

    # square 1-2-3-4 plus chord (1,3): triangles {1,2,3} and {1,3,4}
    adj = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (1, 4), (1, 3)], "u long, v long"
    )
    base = triangle_delta_signed(
        spark.createDataFrame([], "u long, v long"),
        adj.select("*", F.lit(1).cast("long").alias("sign")),
    ).collect()[0]["d_triangles"]
    assert base == 2
    # delete chord (1,3): both triangles die; insert (2,4): two born;
    # plus a fresh D-D-D triangle on new vertices 7-8-9
    batch = spark.createDataFrame(
        [(1, 3, -1), (2, 4, 1), (7, 8, 1), (8, 9, 1), (7, 9, 1)],
        "u long, v long, sign long",
    )
    got = maintain_triangles_cdc(adj, [batch]).collect()[0]
    assert (got["n_triangles"], got["n_edges"]) == (3, 8)


def test_triangle_maintenance_random_churn_matches_recount(spark):
    """Random multi-batch conformal churn: the maintained count equals a
    from-scratch count of the final edge set."""
    import itertools
    import random

    from pyspark.sql import functions as F

    from etl__project_spark.datapipe.graph import (
        maintain_triangles_cdc,
        triangle_delta_signed,
    )

    random.seed(71)
    verts = list(range(12))
    live = {e for e in itertools.combinations(verts, 2) if random.random() < 0.4}
    initial = spark.createDataFrame(sorted(live), "u long, v long")
    batches = []
    for _ in range(3):
        dels = random.sample(sorted(live), min(4, len(live)))
        adds = random.sample(
            sorted(set(itertools.combinations(verts, 2)) - live), 4
        )
        live -= set(dels)
        live |= set(adds)
        batches.append(
            spark.createDataFrame(
                [(u, v, -1) for u, v in dels] + [(u, v, 1) for u, v in adds],
                "u long, v long, sign long",
            )
        )
    got = maintain_triangles_cdc(initial, batches).collect()[0]
    want = triangle_delta_signed(
        spark.createDataFrame([], "u long, v long"),
        spark.createDataFrame(sorted(live), "u long, v long").select(
            "*", F.lit(1).cast("long").alias("sign")
        ),
    ).collect()[0]["d_triangles"]
    assert (got["n_triangles"], got["n_edges"]) == (want, len(live))


def test_edge_liveness_only_transitions_surface(spark):
    """Multiplicity churn that never crosses zero emits NO deltas to the
    triangle layer; 0->1 and 1->0 crossings emit exactly +/-1."""
    from etl__project_spark.datapipe.graph import edge_liveness_deltas

    mult = spark.createDataFrame(
        [(1, 2, 3), (2, 3, 1)], "u long, v long, m long"
    )
    delta = spark.createDataFrame(
        [(1, 2, -2), (2, 3, -1), (3, 4, 2)], "u long, v long, dm long"
    )
    got = {(r["u"], r["v"]): r["sign"] for r in edge_liveness_deltas(mult, delta).collect()}
    assert got == {(2, 3): -1, (3, 4): 1}  # (1,2) stays live at m=1


def test_degree_maintenance_random_churn_matches_recount(spark):
    """Degrees fold linearly under conformal edge batches; vertices
    drained to degree zero vanish from the state."""
    import itertools
    import random

    from etl__project_spark.datapipe.graph import maintain_degrees_cdc

    random.seed(83)
    verts = list(range(10))
    live = {e for e in itertools.combinations(verts, 2) if random.random() < 0.35}
    initial = spark.createDataFrame(sorted(live), "u long, v long")
    batches = []
    for _ in range(2):
        dels = random.sample(sorted(live), min(3, len(live)))
        adds = random.sample(sorted(set(itertools.combinations(verts, 2)) - live), 3)
        live -= set(dels)
        live |= set(adds)
        batches.append(
            spark.createDataFrame(
                [(u, v, -1) for u, v in dels] + [(u, v, 1) for u, v in adds],
                "u long, v long, sign long",
            )
        )
    got = {
        r["vertex"]: r["d"]
        for r in maintain_degrees_cdc(initial, batches).collect()
    }
    want: dict[int, int] = {}
    for u, v in live:
        want[u] = want.get(u, 0) + 1
        want[v] = want.get(v, 0) + 1
    assert got == want


def test_decontamination_cdc_unflags_on_benchmark_retraction(spark):
    """maintain_decontamination_cdc must (a) flag a train doc when a NEW
    benchmark sharing its shingles arrives, (b) UNFLAG a doc whose only
    overlap was with a retracted benchmark, (c) keep a doc flagged when
    one of two overlapping benchmarks retracts, and (d) fail loudly on a
    D row with null text (lossy retraction)."""
    import pytest
    from pyspark.sql import functions as F

    from etl__project_spark.datapipe.dedup import (
        contamination_check,
        maintain_decontamination_cdc,
    )

    k = 5
    train = spark.createDataFrame(
        [
            (10, "aaaaa bbbbb"),   # overlaps eval doc 1 only
            (11, "ccccc ddddd"),   # overlaps eval docs 2 AND 3
            (12, "eeeee fffff"),   # overlaps the late benchmark 4 only
            (13, "zzzzz yyyyy"),   # never contaminated
        ],
        "doc_id long, text string",
    )
    eval0 = spark.createDataFrame(
        [(1, "aaaaa"), (2, "ccccc"), (3, "ddddd")], "doc_id long, text string"
    )
    batches = [
        spark.createDataFrame([(4, "eeeee", "I")], "doc_id long, text string, op string"),
        spark.createDataFrame(
            [(1, "aaaaa", "D"), (2, "ccccc", "D")],
            "doc_id long, text string, op string",
        ),
    ]
    got = {
        r["doc_id"]: (r["n_shared_shingles"], r["contaminated"])
        for r in maintain_decontamination_cdc(train, eval0, batches, k=k).collect()
    }
    post_eval = spark.createDataFrame(
        [(3, "ddddd"), (4, "eeeee")], "doc_id long, text string"
    )
    want = {
        r["doc_id"]: (r["n_shared_shingles"], r["contaminated"])
        for r in contamination_check(train, post_eval, k=k).collect()
    }
    assert got == want
    assert got[10][1] is False      # unflagged after benchmark 1 retracted
    assert got[11] == (1, True)     # still flagged via surviving doc 3
    assert got[12][1] is True       # flagged by the late benchmark

    bad = [spark.createDataFrame([(9, None, "D")], "doc_id long, text string, op string")]
    with pytest.raises(ValueError, match="null text"):
        maintain_decontamination_cdc(train, eval0, bad, k=k)
