"""Streaming-depth soak: one maintenance fold run for 200+ real
micro-batches (VERDICT r8 #4).

SCALE.md §9n's residual risk was that non-barriered maintenance folds show
linear-ish planner-statistics digit growth — harmless at the 2–3 batches
the catalog fixtures replay, unproven at streaming depth. Round 9 migrated
every fold to ``session.state_checkpoint`` (stats barrier + storage
posture), and this test is the depth evidence: 200 tiny changelog batches
through ``stream_value_histogram_cdc`` (a real availableNow run with
``maxFilesPerTrigger=1``, so each file is its own foreachBatch micro-batch
through the exactly-once merged publish), asserting

* per-batch wall time stays FLAT (late-window median vs early-window
  median, generous 3x bound — a linear leak would be ~10x across this
  span and an exponential one times out outright),
* driver query-planning time stays flat by the same measure,
* state stays BOUNDED (live histogram rows <= types x buckets forever),
* the maintained histogram equals a one-shot sketch of the replayed log.

Marked ``soak`` (deselected by default like the oracle gate): ~3-5 min of
wall. Run with ``pytest -m soak``. The measured batch-200/batch-2 ratio is
recorded in SCALE.md §9p.
"""

from __future__ import annotations

import json
import os
import statistics

import pytest
from pyspark.sql import functions as F

N_BATCHES = 200
N_TYPES = 3  # event types cycling through the changelog


def _write_batch(landing: str, i: int) -> list[dict]:
    """One tiny changelog file: an insert, plus (from batch 1 on) an
    update of the previous batch's row — every batch exercises both the
    assert and the retract path, moving mass between buckets."""
    rows = [
        {
            "event_id": i,
            "event_type": f"t{i % N_TYPES}",
            "value": float((i * 7) % 100),
            "old_value": None,
            "op": "I",
            "seq": 2 * i,
        }
    ]
    if i > 0:
        prev = i - 1
        rows.append(
            {
                "event_id": prev,
                "event_type": f"t{prev % N_TYPES}",
                "value": float((prev * 7 + 50) % 100),
                "old_value": float((prev * 7) % 100),
                "op": "U",
                "seq": 2 * i + 1,
            }
        )
    with open(os.path.join(landing, f"b{i:04d}.jsonl"), "w") as fh:
        for r in rows:
            fh.write(json.dumps(r) + "\n")
    return rows


@pytest.mark.soak
def test_histogram_fold_stays_flat_at_streaming_depth(spark, tmp_path):
    from etl__project_spark.operators.rollup import partial_hist_signed
    from etl__project_spark.plans.star_load import ParquetWarehouse
    from etl__project_spark.streaming.pipeline import (
        read_value_histogram,
        stream_value_histogram_cdc,
    )

    landing = str(tmp_path / "soak_landing")
    os.makedirs(landing)
    wh_root = str(tmp_path / "soak_wh")
    ckpt = str(tmp_path / "soak_ckpt")

    post: dict[int, tuple[str, float]] = {}
    for i in range(N_BATCHES):
        for r in _write_batch(landing, i):
            post[r["event_id"]] = (r["event_type"], r["value"])

    # keep every progress event so the full per-batch series is visible
    spark.conf.set("spark.sql.streaming.numRecentProgressUpdates", "400")
    q = stream_value_histogram_cdc(
        spark, landing, wh_root, ckpt, max_files_per_trigger=1
    )
    q.awaitTermination(1800)
    progresses = [json.loads(p.json) for p in q.recentProgress]
    q.stop()

    batches = [
        p
        for p in progresses
        if p.get("numInputRows", 0) > 0 and "durationMs" in p
    ]
    assert len(batches) >= N_BATCHES - 5, (
        f"expected ~{N_BATCHES} micro-batches, saw {len(batches)} — "
        "maxFilesPerTrigger pacing not in effect"
    )

    walls = [p["durationMs"].get("triggerExecution", 0) for p in batches]
    plans = [p["durationMs"].get("queryPlanning", 0) for p in batches]
    early_w = statistics.median(walls[2:50])
    late_w = statistics.median(walls[-50:])
    early_p = statistics.median(plans[2:50]) or 1.0
    late_p = statistics.median(plans[-50:])
    assert late_w <= 3 * early_w, (
        f"per-batch wall grew: early median {early_w} ms -> late median "
        f"{late_w} ms over {len(batches)} batches"
    )
    assert late_p <= 3 * early_p + 50, (
        f"driver planning time grew: early median {early_p} ms -> late "
        f"median {late_p} ms"
    )

    wh = ParquetWarehouse(spark, wh_root)
    hist = read_value_histogram(wh).filter(F.col("n") != 0)
    live = hist.count()
    assert live <= N_TYPES * 11, f"state unbounded: {live} live buckets"

    post_df = spark.createDataFrame(
        [(t, v) for t, v in post.values()], "event_type string, value double"
    )
    want = partial_hist_signed(
        post_df.withColumn("sign", F.lit(1)), ["event_type"]
    )
    assert {tuple(r) for r in hist.select("event_type", "bucket", "n").collect()} == {
        tuple(r) for r in want.collect()
    }

    # surface the measured ratios for the SCALE.md row
    print(
        f"\nSOAK histogram fold: {len(batches)} batches, wall median "
        f"early={early_w}ms late={late_w}ms (ratio {late_w / max(early_w, 1):.2f}), "
        f"planning early={early_p}ms late={late_p}ms "
        f"(ratio {late_p / max(early_p, 1):.2f}), live buckets={live}"
    )


@pytest.mark.soak
def test_cms_fold_stays_flat_at_streaming_depth(spark, tmp_path):
    """Second fold at streaming depth: the turnstile CMS through 200
    one-file micro-batches (key remaps + deletes every batch). Same
    flatness gates as the histogram soak, plus the no-underestimate
    bound on the final grid, plus grid-size boundedness (d x w cells
    FOREVER, whatever the churn)."""
    import json as _json

    from pyspark.sql import functions as F

    from etl__project_spark.plans.star_load import ParquetWarehouse
    from etl__project_spark.streaming.pipeline import (
        read_cms_cells,
        read_cms_estimates,
        stream_cms_cdc,
    )

    landing = str(tmp_path / "cms_soak_landing")
    os.makedirs(landing)
    wh_root = str(tmp_path / "cms_soak_wh")
    ckpt = str(tmp_path / "cms_soak_ckpt")

    live: dict[int, str] = {}
    for i in range(N_BATCHES):
        rows = [
            {"event_id": i, "key": f"k{i % 7}", "old_key": None, "op": "I",
             "seq": 2 * i}
        ]
        live[i] = f"k{i % 7}"
        if i > 0 and i % 3 == 0:
            prev = i - 1
            rows.append(
                {"event_id": prev, "key": f"k{(prev + 1) % 7}",
                 "old_key": live[prev], "op": "U", "seq": 2 * i + 1}
            )
            live[prev] = f"k{(prev + 1) % 7}"
        if i > 1 and i % 5 == 0:
            gone = i - 2
            if gone in live:
                rows.append(
                    {"event_id": gone, "key": None, "old_key": live[gone],
                     "op": "D", "seq": 2 * i + 2}
                )
                del live[gone]
        with open(os.path.join(landing, f"b{i:04d}.jsonl"), "w") as fh:
            for r in rows:
                fh.write(_json.dumps(r) + "\n")

    spark.conf.set("spark.sql.streaming.numRecentProgressUpdates", "400")
    q = stream_cms_cdc(spark, landing, wh_root, ckpt, max_files_per_trigger=1)
    q.awaitTermination(1800)
    progresses = [_json.loads(p.json) for p in q.recentProgress]
    q.stop()

    batches = [
        p for p in progresses if p.get("numInputRows", 0) > 0 and "durationMs" in p
    ]
    assert len(batches) >= N_BATCHES - 5
    walls = [p["durationMs"].get("triggerExecution", 0) for p in batches]
    early_w = statistics.median(walls[2:50])
    late_w = statistics.median(walls[-50:])
    assert late_w <= 3 * early_w, (early_w, late_w)

    wh = ParquetWarehouse(spark, wh_root)
    cells = read_cms_cells(wh)
    assert cells.count() <= 4 * 256  # d x w bound, forever
    # no-underestimate on every live key's exact net count
    import collections

    exact = collections.Counter(live.values())
    keys_df = spark.createDataFrame([(k,) for k in exact], "key string")
    est = {
        r["key"]: r["est_count"]
        for r in read_cms_estimates(wh, keys_df, "key").collect()
    }
    assert all(est[k] >= n for k, n in exact.items()), (est, dict(exact))
    print(
        f"\nSOAK cms fold: {len(batches)} batches, wall early={early_w}ms "
        f"late={late_w}ms (ratio {late_w / max(early_w, 1):.2f}), "
        f"cells={cells.count()}"
    )


@pytest.mark.soak
def test_text_index_fold_stays_flat_at_streaming_depth(spark, tmp_path):
    """Third fold at streaming depth, and the first with TABLE-SIZED
    state (VERDICT r9 #5): the BM25 postings index through 200 one-file
    micro-batches. The histogram/CMS soaks prove the KB-bounded-state
    folds flat; the risky class is the folds whose state is proportional
    to a base table — here the postings state GROWS with the live corpus
    (every batch inserts a doc and rewrites the previous one), so this
    soak separates healthy linear state growth from unhealthy per-batch
    wall/planning growth. Gates: flat per-batch wall and planning time
    (late/early window medians), state row count TRACKING the live
    relation (postings rows == exact posting count of the replayed
    corpus, no retraction residue), and the final index equal to a
    one-shot build. Measured ratios recorded in SCALE.md §9p."""
    import json as _json

    from pyspark.sql import functions as F

    from etl__project_spark.datapipe.text_index import build_text_index
    from etl__project_spark.plans.star_load import ParquetWarehouse
    from etl__project_spark.streaming.pipeline import (
        read_text_index,
        stream_text_index_cdc,
    )

    landing = str(tmp_path / "tx_soak_landing")
    os.makedirs(landing)
    wh_root = str(tmp_path / "tx_soak_wh")
    ckpt = str(tmp_path / "tx_soak_ckpt")

    words = ["spark", "merge", "window", "delta", "index", "soak", "batch"]

    def text_for(doc_id: int, rev: int) -> str:
        return " ".join(
            words[(doc_id + rev + j) % len(words)] for j in range(3 + doc_id % 3)
        )

    live: dict[int, str] = {}
    for i in range(N_BATCHES):
        rows = [
            {"doc_id": i, "text": text_for(i, 0), "op": "I", "seq": 2 * i}
        ]
        live[i] = text_for(i, 0)
        if i > 0:
            prev = i - 1
            rows.append(
                {"doc_id": prev, "text": text_for(prev, 1), "op": "U",
                 "seq": 2 * i + 1}
            )
            live[prev] = text_for(prev, 1)
        if i > 1 and i % 5 == 0:
            gone = i - 2
            if gone in live:
                rows.append(
                    {"doc_id": gone, "text": None, "op": "D", "seq": 2 * i + 2}
                )
                del live[gone]
        fp = os.path.join(landing, f"b{i:04d}.jsonl")
        with open(fp, "w") as fh:
            for r in rows:
                fh.write(_json.dumps(r) + "\n")
        # The file source orders micro-batches by MODIFICATION TIME; a
        # fast write loop produces ties, which scramble delivery order.
        # The sketch folds (histogram/CMS soaks above) are commutative
        # signed sums and survive that; the postings fold derives
        # retractions from pre-state, so it requires the ordered
        # transport a real changelog (Kafka offsets) provides — model
        # it with strictly increasing mtimes.
        os.utime(fp, (1_700_000_000 + i, 1_700_000_000 + i))

    spark.conf.set("spark.sql.streaming.numRecentProgressUpdates", "400")
    q = stream_text_index_cdc(
        spark, landing, wh_root, ckpt, max_files_per_trigger=1
    )
    q.awaitTermination(1800)
    progresses = [_json.loads(p.json) for p in q.recentProgress]
    q.stop()

    batches = [
        p for p in progresses if p.get("numInputRows", 0) > 0 and "durationMs" in p
    ]
    assert len(batches) >= N_BATCHES - 5, (
        f"expected ~{N_BATCHES} micro-batches, saw {len(batches)}"
    )
    walls = [p["durationMs"].get("triggerExecution", 0) for p in batches]
    plans = [p["durationMs"].get("queryPlanning", 0) for p in batches]
    early_w = statistics.median(walls[2:50])
    late_w = statistics.median(walls[-50:])
    early_p = statistics.median(plans[2:50]) or 1.0
    late_p = statistics.median(plans[-50:])
    assert late_w <= 3 * early_w, (
        f"per-batch wall grew: early median {early_w} ms -> late median "
        f"{late_w} ms over {len(batches)} batches"
    )
    assert late_p <= 3 * early_p + 50, (
        f"driver planning time grew: early median {early_p} ms -> late "
        f"median {late_p} ms"
    )

    wh = ParquetWarehouse(spark, wh_root)
    got_index = read_text_index(wh)
    final = spark.createDataFrame(
        sorted(live.items()), "doc_id long, text string"
    )
    want_index = build_text_index(final)
    # state tracks the live relation exactly: same (doc, term, tf) rows,
    # every sign +1 (no retraction residue left in the stored table)
    got_rows = sorted(
        map(tuple, got_index.postings.select("doc_id", "term", "tf", "sign").collect())
    )
    want_rows = sorted(
        map(tuple, want_index.postings.select("doc_id", "term", "tf", "sign").collect())
    )
    assert got_rows == want_rows
    assert len(got_rows) > 0 and len(live) > 100  # the state really is table-sized

    print(
        f"\nSOAK text-index fold: {len(batches)} batches, wall median "
        f"early={early_w}ms late={late_w}ms (ratio {late_w / max(early_w, 1):.2f}), "
        f"planning early={early_p}ms late={late_p}ms "
        f"(ratio {late_p / max(early_p, 1):.2f}), "
        f"postings rows={len(got_rows)}, live docs={len(live)}"
    )


@pytest.mark.soak
def test_phrase_index_fold_stays_flat_at_streaming_depth(spark, tmp_path):
    """Fourth fold at streaming depth (VERDICT r10 #3): the POSITIONAL
    phrase index through 200 one-file micro-batches — same table-sized
    state class as the BM25 soak but at the finer (doc_id, pos, term)
    grain, and the same ordered-transport contract (retractions derive
    from pre-state, so mtimes are made strictly increasing). Gates:
    flat per-batch wall/planning (late/early window medians), state
    rows EQUAL to a one-shot positional_postings() of the live corpus
    (no retraction residue at any position), and a phrase query served
    from the soaked index matching the one-shot index's answer."""
    import json as _json

    from etl__project_spark.datapipe.text_index import (
        phrase_match,
        positional_postings,
    )
    from etl__project_spark.plans.star_load import ParquetWarehouse
    from etl__project_spark.streaming.pipeline import (
        read_positional_postings,
        stream_phrase_index_cdc,
    )

    landing = str(tmp_path / "px_soak_landing")
    os.makedirs(landing)
    wh_root = str(tmp_path / "px_soak_wh")
    ckpt = str(tmp_path / "px_soak_ckpt")

    words = ["big", "data", "small", "merge", "window", "phrase", "soak"]

    def text_for(doc_id: int, rev: int) -> str:
        return " ".join(
            words[(doc_id + rev + j) % len(words)] for j in range(3 + doc_id % 4)
        )

    live: dict[int, str] = {}
    for i in range(N_BATCHES):
        rows = [{"doc_id": i, "text": text_for(i, 0), "op": "I", "seq": 2 * i}]
        live[i] = text_for(i, 0)
        if i > 0:
            prev = i - 1
            rows.append(
                {"doc_id": prev, "text": text_for(prev, 1), "op": "U",
                 "seq": 2 * i + 1}
            )
            live[prev] = text_for(prev, 1)
        if i > 1 and i % 5 == 0:
            gone = i - 2
            if gone in live:
                rows.append(
                    {"doc_id": gone, "text": None, "op": "D", "seq": 2 * i + 2}
                )
                del live[gone]
        fp = os.path.join(landing, f"b{i:04d}.jsonl")
        with open(fp, "w") as fh:
            for r in rows:
                fh.write(_json.dumps(r) + "\n")
        # ordered transport (see the BM25 soak's note): strictly
        # increasing mtimes model a real changelog's delivery order
        os.utime(fp, (1_700_000_000 + i, 1_700_000_000 + i))

    spark.conf.set("spark.sql.streaming.numRecentProgressUpdates", "400")
    q = stream_phrase_index_cdc(
        spark, landing, wh_root, ckpt, max_files_per_trigger=1
    )
    q.awaitTermination(1800)
    progresses = [_json.loads(p.json) for p in q.recentProgress]
    q.stop()

    batches = [
        p for p in progresses if p.get("numInputRows", 0) > 0 and "durationMs" in p
    ]
    assert len(batches) >= N_BATCHES - 5, (
        f"expected ~{N_BATCHES} micro-batches, saw {len(batches)}"
    )
    walls = [p["durationMs"].get("triggerExecution", 0) for p in batches]
    plans = [p["durationMs"].get("queryPlanning", 0) for p in batches]
    early_w = statistics.median(walls[2:50])
    late_w = statistics.median(walls[-50:])
    early_p = statistics.median(plans[2:50]) or 1.0
    late_p = statistics.median(plans[-50:])
    assert late_w <= 3 * early_w, (
        f"per-batch wall grew: early median {early_w} ms -> late median "
        f"{late_w} ms over {len(batches)} batches"
    )
    assert late_p <= 3 * early_p + 50, (
        f"driver planning time grew: early median {early_p} ms -> late "
        f"median {late_p} ms"
    )

    wh = ParquetWarehouse(spark, wh_root)
    got_post = read_positional_postings(wh)
    final = spark.createDataFrame(
        sorted(live.items()), "doc_id long, text string"
    )
    want_post = positional_postings(final)
    got_rows = sorted(map(tuple, got_post.collect()))
    want_rows = sorted(map(tuple, want_post.collect()))
    assert got_rows == want_rows
    assert len(got_rows) > 0 and len(live) > 100  # table-sized state

    got_q = sorted(
        (r["doc_id"], r["n_occ"])
        for r in phrase_match(got_post, ["big", "data"]).collect()
    )
    want_q = sorted(
        (r["doc_id"], r["n_occ"])
        for r in phrase_match(want_post, ["big", "data"]).collect()
    )
    assert got_q == want_q

    print(
        f"\nSOAK phrase-index fold: {len(batches)} batches, wall median "
        f"early={early_w}ms late={late_w}ms (ratio {late_w / max(early_w, 1):.2f}), "
        f"planning early={early_p}ms late={late_p}ms "
        f"(ratio {late_p / max(early_p, 1):.2f}), "
        f"postings rows={len(got_rows)}, live docs={len(live)}"
    )


@pytest.mark.soak
def test_ivf_fold_stays_flat_at_streaming_depth(spark, tmp_path):
    """Fifth fold at streaming depth (VERDICT r10 #3): IVF posting
    maintenance through 200 one-file micro-batches against a frozen
    quantizer — table-sized state (one posting per live vector) under
    the ordered-transport contract, with every batch exercising insert +
    re-embed (the re-embedding flips the vector's sign, provably moving
    its cell) and periodic deletes. Gates: flat per-batch wall/planning,
    postings EQUAL to assign_cells() of the replayed live vectors (no
    residue, no lost cells), state rows == live vector count."""
    import json as _json

    from etl__project_spark.datapipe.similarity import assign_cells
    from etl__project_spark.plans.star_load import ParquetWarehouse
    from etl__project_spark.streaming.pipeline import (
        IVF_SEEDS_SCHEMA,
        read_ivf_cells,
        stream_ivf_cdc,
    )

    landing = str(tmp_path / "ivf_soak_landing")
    os.makedirs(landing)
    wh_root = str(tmp_path / "ivf_soak_wh")
    ckpt = str(tmp_path / "ivf_soak_ckpt")

    # frozen quantizer: 4 unit centroids, published once before the stream
    wh = ParquetWarehouse(spark, wh_root)
    seeds = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0]), (2, [-1.0, 0.0]), (3, [0.0, -1.0])],
        IVF_SEEDS_SCHEMA,
    )
    wh.publish("ivf_seeds", seeds)

    def vec_for(vec_id: int, rev: int) -> list[float]:
        base = [
            [0.9, 0.1], [0.1, 0.9], [-0.8, 0.2], [0.2, -0.8],
        ][vec_id % 4]
        flip = -1.0 if rev % 2 else 1.0
        return [flip * base[0], flip * base[1]]

    live: dict[int, list[float]] = {}
    for i in range(N_BATCHES):
        rows = [{"vec_id": i, "embedding": vec_for(i, 0), "op": "I", "seq": 2 * i}]
        live[i] = vec_for(i, 0)
        if i > 0:
            prev = i - 1
            rows.append(
                {"vec_id": prev, "embedding": vec_for(prev, 1), "op": "U",
                 "seq": 2 * i + 1}
            )
            live[prev] = vec_for(prev, 1)
        if i > 1 and i % 5 == 0:
            gone = i - 2
            if gone in live:
                rows.append(
                    {"vec_id": gone, "embedding": None, "op": "D", "seq": 2 * i + 2}
                )
                del live[gone]
        fp = os.path.join(landing, f"b{i:04d}.jsonl")
        with open(fp, "w") as fh:
            for r in rows:
                fh.write(_json.dumps(r) + "\n")
        os.utime(fp, (1_700_000_000 + i, 1_700_000_000 + i))

    spark.conf.set("spark.sql.streaming.numRecentProgressUpdates", "400")
    q = stream_ivf_cdc(spark, landing, wh_root, ckpt, max_files_per_trigger=1)
    q.awaitTermination(1800)
    progresses = [_json.loads(p.json) for p in q.recentProgress]
    q.stop()

    batches = [
        p for p in progresses if p.get("numInputRows", 0) > 0 and "durationMs" in p
    ]
    assert len(batches) >= N_BATCHES - 5, (
        f"expected ~{N_BATCHES} micro-batches, saw {len(batches)}"
    )
    walls = [p["durationMs"].get("triggerExecution", 0) for p in batches]
    plans = [p["durationMs"].get("queryPlanning", 0) for p in batches]
    early_w = statistics.median(walls[2:50])
    late_w = statistics.median(walls[-50:])
    early_p = statistics.median(plans[2:50]) or 1.0
    late_p = statistics.median(plans[-50:])
    assert late_w <= 3 * early_w, (
        f"per-batch wall grew: early median {early_w} ms -> late median "
        f"{late_w} ms over {len(batches)} batches"
    )
    assert late_p <= 3 * early_p + 50, (
        f"driver planning time grew: early median {early_p} ms -> late "
        f"median {late_p} ms"
    )

    got = sorted(
        (r["cand_id"], r["centroid_id"]) for r in read_ivf_cells(wh).collect()
    )
    final = spark.createDataFrame(
        sorted(live.items()), "vec_id long, embedding array<double>"
    )
    want = sorted(
        (r["cand_id"], r["centroid_id"])
        for r in assign_cells(final, seeds).collect()
    )
    assert got == want
    assert len(got) == len(live) and len(live) > 100  # table-sized state

    print(
        f"\nSOAK ivf fold: {len(batches)} batches, wall median "
        f"early={early_w}ms late={late_w}ms (ratio {late_w / max(early_w, 1):.2f}), "
        f"planning early={early_p}ms late={late_p}ms "
        f"(ratio {late_p / max(early_p, 1):.2f}), "
        f"postings={len(got)}, live vectors={len(live)}"
    )
