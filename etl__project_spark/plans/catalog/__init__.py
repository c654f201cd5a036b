"""Query catalog: every implemented operator exposed as a named query with a
DuckDB oracle (driver contract, ``__spark_entry__.py``).

Naming maps to SURVEY.md §2 operator ids:

- ``vs_*``   reference VideoStart pipeline (F1/F1b/F2, C1-C8, A1/A3/A4,
             I1, J1, J2, J3) over the deterministic video_data synth
             (``refdata.py``)
- ``tpch_*`` analytic join/agg workloads on the TPC-H-ish fixtures
             (engine capability + bench headliners)
- ``ev_*``   event-stream analytics (rollups, sessionization, JSON props)
- ``doc_*``  text / dedup pipeline (documents table)
- ``emb_*``  embedding similarity (embeddings table)

Conventions for oracle parity (the driver hash-compares values after
sorting columns by name): every computed column is aliased identically in
Spark and SQL; ints are cast to BIGINT on both sides; doubles that result
from arithmetic are rounded to a fixed number of decimals on both sides;
timestamps are emitted as formatted strings.
"""

from __future__ import annotations

from etl__project_spark.plans.catalog._registry import ORACLES, QUERIES, query  # noqa: F401
from etl__project_spark.plans.catalog._shared import *  # noqa: F401,F403
from etl__project_spark.plans.catalog._shared import (  # noqa: F401
    _video,
    _parsed,
    _int,
    _money_sum_raw,
    _money_sum,
    _quant4,
    _msum_raw,
    _msum,
    _q4,
    _vs_fact_dims,
    _SHINGLE_LIST,
    _LSH_SQL_SIG,
    _simhash_oracle,
    _COS,
    _BUCKET,
    _PAIR_COS,
    _IVF_COS_ES,
    _IVF_COS_QX,
    _EVENT_TYPES,
    _SHINGLE13,
    _SIG_CTE,
    _BPE_MERGE_STEP,
    _BPE_COUNTS,
    _funnel_counts,
    _pq_ctes,
    _pq_sql,
    _zexpr,
    _kmeans_ctes,
    _kmeans_iter_sql,
    _simhash_pairs_oracle,
    _GOPHER_KEEP,
    _pipeline_e2e_sql,
    _znorm_scores,
    _containment_sql,
    _SHINGLE5,
    _containment_reps_sql,
    _simhash_wide_pairs_oracle,
    _bm25_micro,
    _ewma_sql,
    _HALF_SIG,
    _bot_screen,
    _WORD_GRAPH_SQL,
    _textrank_iter_sql,
    _kcore_iter_sql,
    _ppr_iter_sql,
    _event_edge_liveness,
)
from etl__project_spark.sources import load_table  # noqa: F401

# Registration order: family modules execute their @query decorators on
# import. The driver window is pinned by __spark_entry__._PRIORITY_R{N},
# so only the head order matters; the tail is family-grouped.
from etl__project_spark.plans.catalog import (  # noqa: E402,F401
    vs,
    tpch,
    ev,
    doc,
    emb,
)
