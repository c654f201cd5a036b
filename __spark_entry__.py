"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``etl__project_spark``; the catalog
(``etl__project_spark/plans/catalog.py``) maps every operator from
SURVEY.md §2 to a named query + DuckDB oracle.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Runs the complete reference pipeline in miniature: synth raw →
    VideoStart filter → parse → star rollup of video-starts per
    (platform, minute).
    """
    from etl__project_spark.plans import QUERIES

    return QUERIES["vs_fact_rollup"](spark, "/root/testdata/sf0.001")


# The driver oracle-checks the first 50 queries in registration order per
# round. Round-6 rotation (VERDICT r5 #1): lead with the nine round-5
# third-wave queries that have never had a driver-side green (registered
# after the r5 window filled; judge oracle-gate green in r5), then the
# queries added or changed in round 6 (signed-delta CDC IVM, trained-PQ
# top-k + its recall audit — emb_pq_topk's codebooks changed from seed
# selection to 2 Lloyd rounds, so it re-checks as changed), then the
# standing canaries (vs_fact / vs_warehouse_load, re-checked every
# round). Remaining slots refresh the STALEST greens — last checked in
# round 3 — oldest first; the r3/r4 greens that don't fit are round-7's
# rotation, as is EVERYTHING registered after this window filled (the
# ~18 third-wave statistics/retrieval queries — KS/Benford/CUSUM/Gini/
# KL/autocorr/span-merge/repetition/BM25/PSI/hot-windows/EWMA/int8×2/
# attribution/confusion/coreset/weekday — and the later round-6 waves:
# Pareto shares, Mann-Whitney, Kaplan-Meier, 2-D skyline, IVF nprobe
# sweep, jackknife CI, trunc-dim recall, cohort LTV, Mann-Kendall, Zipf
# fit, k-anonymity, l-diversity, frame sampling, forecast backtest,
# Hamming recall audit, power/MDE, bot screen, TextRank, triangle
# count, k-core histogram, PPR related terms, RRF hybrid retrieval,
# embedding-intake pipeline e2e, t-closeness gate, Spearman rank corr,
# split leakage audit, Markov next-event eval, SNM blocking, event-
# intake pipeline e2e).
# Every query outside the
# window stays pinned in-repo by
# `pytest -m oracle` and the committed CORRECTNESS_FULL.json artifact
# (refreshed this round at sf0.01 — see the file for the count).
_PRIORITY_R6 = [
    # never driver-checked: r5 third wave
    "emb_znorm_outliers",
    "ev_active_users",
    "doc_containment_pairs",
    "doc_containment_reps",
    "ev_rfm_segments",
    "doc_winnow_fingerprints",
    "doc_simhash_wide_pairs",
    "ev_lateness_audit",
    "doc_ngram_novelty",
    # new or changed in round 6
    "tpch_join_cdc_incremental",
    "emb_pq_topk",
    "emb_pq_recall_audit",
    "ev_rollup_cdc_incremental",
    "vs_fact_late_dims",
    "ev_markov_stationary",
    "doc_fuzzy_word_pairs",
    "doc_weighted_sample",
    "emb_ivf_trained_topk",
    "doc_tokenizer_fertility",
    "doc_lsh_incremental",
    "ev_peak_concurrency",
    "tpch_column_stats",
    "emb_pq_rerank_topk",
    "doc_dsir_weights",
    "ev_join_size_est",
    "tpch_corr_matrix",
    "ev_chi2_independence",
    "ev_ab_test_zscore",
    "doc_dedup_keep_best",
    "vs_scd2_asof_lookup",
    "ev_session_copurchase",
    "vs_dim_calendar_spine",
    "doc_dup_size_histogram",
    "ev_funnel_latency",
    "doc_weighted_sample_stratified",
    "tpch_equidepth_hist",
    # standing canaries
    "vs_fact",
    "vs_warehouse_load",
    # stalest greens (r3), oldest-first refresh
    "ev_sessionize",
    "ev_session_window_native",
    "ev_range_lookback",
    "ev_approx_stats",
    "tpch_q4_semi",
    "tpch_q6_revenue",
    "tpch_q17_avg_qty",
    "tpch_q19_disjunct",
    "ev_window_sampler",
    "doc_dup_components",
    "doc_token_regex",
    "emb_near_dup_blocked",
]


def _reordered(mapping: dict) -> dict:
    head = {k: mapping[k] for k in _PRIORITY_R6 if k in mapping}
    head.update({k: v for k, v in mapping.items() if k not in head})
    return head


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from etl__project_spark.plans import QUERIES

    return _reordered(dict(QUERIES))


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI-SQL twin for each query (where expressible)."""
    from etl__project_spark.plans import ORACLES

    return _reordered(dict(ORACLES))
