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
# round. Rounds 1-2 left 45 catalog entries without a CORRECTNESS row, so
# the dicts below are reordered to put every not-yet-green query in the
# checked window this round: the 45 never-checked entries, the round-1/2
# red rows (ev_approx_stats, ev_sessionize, ev_session_window_native), the
# NTZ-regressed ev_range_lookback, and the flagship vs_fact. Queries
# already green in r1/r2 follow and keep pytest coverage.
_PRIORITY_R3 = [
    "vs_warehouse_load",
    "tpch_q2_min_cost_supplier",
    "tpch_q4_semi",
    "tpch_q6_revenue",
    "tpch_q7_nation_volume",
    "tpch_q8_market_share",
    "tpch_q9_profit",
    "tpch_q10_returned",
    "tpch_q12_late_lines",
    "tpch_q13_custdist",
    "tpch_q14_promo",
    "tpch_q15_top_supplier",
    "tpch_q16_supplier_cnt",
    "tpch_q17_avg_qty",
    "tpch_q18_big_orders",
    "tpch_q19_disjunct",
    "tpch_q22_idle_balance",
    "tpch_grouping_sets",
    "ev_approx_stats",
    "ev_sessionize",
    "ev_session_window_native",
    "ev_range_lookback",
    "ev_funnel",
    "ev_retention",
    "ev_window_sampler",
    "ev_pivot_type_counts",
    "ev_unpivot_type_counts",
    "ev_user_profile",
    "ev_calendar_features",
    "ev_quality_report",
    "ev_quartiles",
    "ev_anomaly_zscore",
    "doc_dup_components",
    "doc_token_regex",
    "doc_passage_dup",
    "doc_source_normalize",
    "doc_decontaminate",
    "doc_dedup_canonical",
    "doc_quality_gopher",
    "doc_pii_scrub",
    "doc_hash_sample",
    "doc_repetition_ratio",
    "doc_minhash_est",
    "doc_dataset_mix",
    "emb_near_dup_pairs",
    "emb_near_dup_blocked",
    "emb_ivf_topk",
    "emb_kmeans_update",
    "emb_ann_recall_audit",
    "vs_fact",
]


def _reordered(mapping: dict) -> dict:
    head = {k: mapping[k] for k in _PRIORITY_R3 if k in mapping}
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
