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
# round. Round-5 rotation (VERDICT r4 #1): lead with the 13 queries that
# have never had, or have a stale, driver-side green — nine deferred since
# round 2 plus the four round-4 additions registered after slot 50 — then
# the standing canaries (vs_fact / vs_warehouse_load, re-checked every
# round), then every query added or changed in round 5 (TPC-H Q11/Q20/Q21,
# the BPE merge loop, the mergeable sketches, doc_dedup_canonical whose
# pipeline now collapses exact dups before signing, and the analytics
# family: funnel, cohort retention, PMI collocations, unigram-LM scoring).
# Remaining slots refresh round-3 greens in catalog order; the r3-green
# rows that don't fit are round-6's rotation (also rotate in round 6:
# emb_znorm_outliers, ev_active_users, doc_containment_pairs,
# doc_containment_reps, ev_rfm_segments, doc_winnow_fingerprints,
# doc_simhash_wide_pairs, ev_lateness_audit, doc_ngram_novelty — added
# after the window filled; judge oracle-gate green this round).
_PRIORITY_R5 = [
    # never/stale driver green: deferred since r2
    "ev_props_json",
    "ev_value_banding",
    "doc_entropy",
    "doc_upsample_epochs",
    "doc_shingle_count",
    "doc_media_features",
    "emb_norms",
    "emb_bucket_stats",
    "tpch_q1_sql",
    # never driver-checked: added in r4 after slot 50
    "doc_bpe_pair_counts",
    "doc_stratified_sample",
    "ev_hopping_rollup",
    "doc_common_ngram_filter",
    # standing canaries
    "vs_fact",
    "vs_warehouse_load",
    # new or changed in round 5
    "tpch_q11_important_stock",
    "tpch_q20_potential_promotion",
    "tpch_q21_waiting_supplier",
    "doc_bpe_merge_rounds",
    "ev_distinct_hll",
    "ev_quantile_digest",
    "doc_dedup_canonical",
    "ev_funnel_steps",
    "doc_pmi_bigrams",
    "doc_unigram_logprob",
    "emb_pq_topk",
    "ev_zorder_stats",
    "doc_bpe_encode",
    "dq_suite",
    "emb_kmeans_iterate",
    "ev_salted_join",
    "doc_dataset_card",
    "tpch_bloom_prune_join",
    "ev_mad_outliers",
    "doc_passage_scrub",
    "doc_quality_pctl_filter",
    "doc_bigram_logprob",
    "doc_simhash_pairs",
    # round-5 second wave: transition matrix, CDC apply, batched exact
    # retrieval, SemDeDup, distributed covariance
    "ev_transition_matrix",
    "ev_cdc_apply",
    "emb_batch_topk",
    "emb_semantic_dedup",
    "emb_covariance",
    "tpch_join_incremental",
    "ev_hll_set_ops",
    "doc_pipeline_e2e",
    "ev_group_quantiles",
    "doc_media_dedup",
    "ev_skew_report",
    "ev_user_paths",
    # refresh r3-green rows (catalog order); the rest rotate in round 6
]


def _reordered(mapping: dict) -> dict:
    head = {k: mapping[k] for k in _PRIORITY_R5 if k in mapping}
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
