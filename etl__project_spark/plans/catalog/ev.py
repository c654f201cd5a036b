"""Event-stream analytics: rollups, sessions, funnels, sketches, and IVM-under-CDC.

Split out of the monolithic catalog.py in round 9 (VERDICT r8 #7);
query bodies and oracle SQL unchanged — the 256-query oracle gate is
the safety net."""

from __future__ import annotations

from collections.abc import Callable
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T
from etl__project_spark.operators import (
    build_fact,
    derive_dim,
    derive_dim_time,
    filter_videostart,
    filter_videostart_like,
    filter_well_formed_title,
    max_lengths,
    merge_insert_new,
    parse_raw,
    record_count,
    scd1_upsert,
    with_dense_ids,
)
from etl__project_spark.datapipe.graph import (
    textrank,
    triangle_stats,
    word_cooccur_edges,
)
from etl__project_spark.refdata import VIDEO_DATA_CTE, synth_video_data
from etl__project_spark.session import state_checkpoint
from etl__project_spark.datapipe import (  # noqa: E402
    brute_force_topk,
    bucketed_topk,
    char_shingles,
    dedup_exact,
    doc_fingerprint,
    jaccard_prefix_pairs,
    lang_id_heuristic,
    lsh_candidate_pairs,
    minhash_signature,
    ngram_jaccard_pairs,
    sign_bucket,
    simhash,
    text_stats,
)
from etl__project_spark.datapipe.multimodal import extract_features, synth_media  # noqa: E402
from etl__project_spark.operators import scd2_upsert  # noqa: E402
from etl__project_spark.operators.asof import asof_join  # noqa: E402
from etl__project_spark.datapipe.dedup import contamination_check  # noqa: E402
from etl__project_spark.datapipe.sampling import hash_bucket, hash_sample  # noqa: E402
from etl__project_spark.datapipe.text import pii_scrub, quality_rules  # noqa: E402
from etl__project_spark.datapipe.linalg import covariance_oracle_sql  # noqa: E402

from etl__project_spark.plans.catalog._registry import ORACLES, QUERIES, query  # noqa: F401
from etl__project_spark.plans.catalog._shared import (  # noqa: F401
    load_table,
    _video,
    _parsed,
    PARSED_CTE,
    DIMS_CTE,
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


@query(
    "ev_minute_rollup",
    """SELECT event_type, strftime(date_trunc('minute', ts), '%Y%m%d%H%M') AS minute_key,
       count(*)::BIGINT AS n_events, (floor(sum(CAST(floor((value) * 10000 + 0.5) AS BIGINT)) / 100.0 + 0.5) / 100.0) AS total_value
FROM events
GROUP BY event_type, minute_key""",
)
def ev_minute_rollup(spark, sf_dir):
    """Minute-grain rollup over the event stream (the reference's
    'track events over time' question on the driver fixture)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            "event_type",
            F.date_format(F.date_trunc("minute", F.col("ts")), "yyyyMMddHHmm").alias(
                "minute_key"
            ),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            _money_sum(F.col("value")).alias("total_value"),
        )
    )


@query(
    "ev_rollup_incremental",
    """SELECT event_type,
       strftime(date_trunc('minute', ts), '%Y%m%d%H%M') AS minute_key,
       count(*)::BIGINT AS n_events,
       round((sum(round(value, 2)::DECIMAL(18,2)))::DOUBLE, 2) AS total_value,
       min(value) AS min_value,
       max(value) AS max_value,
       round((sum(round(value, 2)::DECIMAL(18,2)))::DOUBLE / count(*), 4) AS avg_value
FROM events
GROUP BY event_type, minute_key""",
)
def ev_rollup_incremental(spark, sf_dir):
    """Incremental rollup maintenance (operators/rollup.py): the event
    history arrives as three day-range batches; each batch contributes
    only its PARTIAL aggregates, merged into the running rollup —
    O(batch) per refresh, never O(history). The oracle is the one-shot
    full recompute: the driver hash match proves the merge algebra
    (decimal-quantized sums make it bit-exact at any merge shape)."""
    from etl__project_spark.operators.rollup import (
        finalize_rollup,
        merge_rollups,
        partial_rollup,
    )

    ev = load_table(spark, sf_dir, "events").withColumn(
        "minute_key",
        F.date_format(F.date_trunc("minute", F.col("ts")), "yyyyMMddHHmm"),
    )
    keys = ["event_type", "minute_key"]
    day = F.dayofmonth("ts")
    batches = [
        ev.filter(day <= 10),
        ev.filter((day > 10) & (day <= 20)),
        ev.filter(day > 20),
    ]
    rolled = partial_rollup(batches[0], keys)
    for b in batches[1:]:
        rolled = merge_rollups(rolled, partial_rollup(b, keys), keys)
    return finalize_rollup(rolled, keys)


@query(
    "ev_heavy_hitters_cms",
    """WITH tok AS (
  SELECT user_id::VARCHAR AS uid, r
  FROM events CROSS JOIN (VALUES (0), (1), (2), (3)) t(r)
),
sketch AS (
  SELECT r,
         ('0x' || substr(md5(uid || 'cms' || r), 1, 15))::BIGINT % 64 AS b,
         count(*)::BIGINT AS c
  FROM tok GROUP BY r, b
),
src AS (
  SELECT user_id::BIGINT AS user_id, count(*)::BIGINT AS exact_count
  FROM events GROUP BY user_id
),
est AS (
  SELECT s.user_id, min(k.c)::BIGINT AS est_count
  FROM (SELECT DISTINCT user_id FROM events) s
  CROSS JOIN (VALUES (0), (1), (2), (3)) t(r)
  JOIN sketch k
    ON k.r = t.r
   AND k.b = ('0x' || substr(md5(s.user_id::VARCHAR || 'cms' || t.r), 1, 15))::BIGINT % 64
  GROUP BY s.user_id
)
SELECT user_id, exact_count, est_count,
       (est_count >= exact_count) AS no_underestimate
FROM src JOIN est USING (user_id)""",
)
def ev_heavy_hitters_cms(spark, sf_dir):
    """Count-min-sketch heavy hitters, built the distributed way: each
    half of the stream produces its own 4x64 sketch (one groupBy of
    hashed buckets — fixed 256-cell state regardless of key
    cardinality), the sketches MERGE by cell-wise sum, and point
    estimates are the min over rows. The oracle computes a single-shot
    sketch: a hash match proves sketch mergeability (the property that
    lets every executor/day/shard sketch independently at 100 TB).
    Hashing is md5-based (engine-portable, deterministic), and the CMS
    no-underestimate guarantee is emitted as a checked column."""
    from etl__project_spark.datapipe.sampling import hash_bucket

    ev = load_table(spark, sf_dir, "events")
    d, w = 4, 64

    def sketch(df):
        # all d hash rows from ONE pass over the input (explode, not a
        # d-way union of scans — at scale the input is the big side)
        cells = F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("r"),
                        hash_bucket(F.col("user_id"), w, salt=f"cms{j}").alias("b"),
                    )
                    for j in range(d)
                ]
            )
        )
        return (
            df.select(cells.alias("x"))
            .select("x.r", "x.b")
            .groupBy("r", "b")
            .agg(F.count(F.lit(1)).alias("c"))
        )

    day = F.dayofmonth("ts")
    merged = (
        sketch(ev.filter(day <= 15))
        .unionByName(sketch(ev.filter(day > 15)))
        .groupBy("r", "b")
        .agg(F.sum("c").alias("c"))
    )
    srcs = ev.groupBy(F.col("user_id").cast("long").alias("user_id")).agg(
        F.count(F.lit(1)).alias("exact_count")
    )
    probes = srcs.select("user_id").crossJoin(
        spark.range(d).select(F.col("id").cast("int").alias("r"))
    ).withColumn(
        "b",
        F.when(F.col("r") == 0, hash_bucket(F.col("user_id"), w, salt="cms0"))
        .when(F.col("r") == 1, hash_bucket(F.col("user_id"), w, salt="cms1"))
        .when(F.col("r") == 2, hash_bucket(F.col("user_id"), w, salt="cms2"))
        .otherwise(hash_bucket(F.col("user_id"), w, salt="cms3")),
    )
    est = (
        probes.join(merged, ["r", "b"])
        .groupBy("user_id")
        .agg(F.min("c").cast("long").alias("est_count"))
    )
    return srcs.join(est, "user_id").select(
        "user_id",
        "exact_count",
        "est_count",
        (F.col("est_count") >= F.col("exact_count")).alias("no_underestimate"),
    )


@query(
    "ev_props_json",
    """SELECT event_type, sum(json_extract(props, '$.k')::BIGINT)::BIGINT AS sum_k,
       count(*)::BIGINT AS n
FROM events GROUP BY event_type""",
)
def ev_props_json(spark, sf_dir):
    """JSON payload extraction (semi-structured props column) + aggregate."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.sum(F.get_json_object("props", "$.k").cast("long")).cast("long").alias("sum_k"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "ev_sessionize",
    """WITH gaps AS (
  SELECT user_id, ts,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
                     OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > 1800000000 OR
                   lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
)
SELECT user_id, sum(new_session)::BIGINT AS n_sessions, count(*)::BIGINT AS n_events
FROM gaps GROUP BY user_id""",
)
def ev_sessionize(spark, sf_dir):
    """Sessionization: 30-minute inactivity gap splits sessions. Lag window
    + conditional sum — fully partition-parallel per user.

    Gap comparison is at MICROsecond precision on both engines
    (unix_micros / epoch_us): second-truncation would only match the
    oracle while no gap lands within 1s of the 1800s threshold — data
    luck, not semantics."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lag_us = F.lag(F.unix_micros("ts")).over(w)
    new_s = F.when(
        lag_us.isNull()
        | ((F.unix_micros("ts") - lag_us) > 1800 * 1_000_000),
        1,
    ).otherwise(0)
    return (
        ev.withColumn("new_session", new_s)
        .groupBy("user_id")
        .agg(
            F.sum("new_session").cast("long").alias("n_sessions"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


@query(
    "ev_session_window_native",
    """WITH gaps AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch_us(ts) - lag(epoch_us(ts)) OVER w >= 1800000000
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
tagged AS (
  SELECT user_id, ts,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_no
  FROM gaps
)
SELECT user_id, epoch_us(min(ts))::BIGINT AS session_start_us,
       count(*)::BIGINT AS n_events
FROM tagged GROUP BY user_id, session_no""",
)
def ev_session_window_native(spark, sf_dir):
    """Spark's native ``session_window`` aggregation (one groupBy, the
    same operator Structured Streaming uses for stateful sessions) —
    oracled by the classic gaps-and-islands SQL. Spark merges events
    whose gap is STRICTLY under the 30-min timeout (the next event must
    start before the open window closes), so the oracle's island break
    is ``gap >= 1800s`` — at full microsecond precision on both engines,
    not second-truncated."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.unix_micros(F.col("session_window.start")).alias("session_start_us"),
            "n_events",
        )
    )


@query(
    "ev_value_banding",
    """WITH tiers(lo, hi, tier) AS (
  VALUES (0.0, 25.0, 'p0_25'), (25.0, 50.0, 'p25_50'), (50.0, 100.0, 'p50_100'),
         (100.0, 200.0, 'p100_200'), (200.0, 1000.0, 'p200_1k')
)
SELECT tier, count(*)::BIGINT AS n_events, (floor(sum(CAST(floor((value) * 10000 + 0.5) AS BIGINT)) / 100.0 + 0.5) / 100.0) AS total_value
FROM events e JOIN tiers t ON e.value >= t.lo AND e.value < t.hi
GROUP BY tier""",
)
def ev_value_banding(spark, sf_dir):
    """Range-band dimension join: map a continuous measure onto a small
    banding table via a broadcast non-equi join. The big side never
    shuffles — Spark plans BroadcastNestedLoopJoin with the tier table
    (5 rows) replicated, so cost is one scan of events; the classic
    'join facts to a rate/tier/SLA table by range' pattern that an
    equi-join engine cannot express."""
    tiers = spark.createDataFrame(
        [
            (0.0, 25.0, "p0_25"),
            (25.0, 50.0, "p25_50"),
            (50.0, 100.0, "p50_100"),
            (100.0, 200.0, "p100_200"),
            (200.0, 1000.0, "p200_1k"),
        ],
        "lo double, hi double, tier string",
    )
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.join(
            F.broadcast(tiers),
            (F.col("value") >= F.col("lo")) & (F.col("value") < F.col("hi")),
        )
        .groupBy("tier")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            _money_sum(F.col("value")).alias("total_value"),
        )
    )


@query(
    "ev_set_ops",
    """SELECT user_id::BIGINT AS user_id FROM (
  SELECT user_id FROM events WHERE event_type = 'purchase' AND value > 280
  INTERSECT
  SELECT user_id FROM events WHERE event_type = 'signup'
  EXCEPT
  SELECT user_id FROM events WHERE event_type = 'error' AND value > 310
)""",
)
def ev_set_ops(spark, sf_dir):
    """Set operators: big-ticket purchasers who signed up and never had a
    high-value error."""
    ev = load_table(spark, sf_dir, "events")

    def by(t, minv=None):
        out = ev.filter(F.col("event_type") == t)
        if minv is not None:
            out = out.filter(F.col("value") > minv)
        return out.select("user_id")

    return by("purchase", 280).intersect(by("signup")).subtract(by("error", 310))


@query(
    "ev_running_sum",
    """SELECT event_id, user_id,
       round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
         AS running_value
FROM events""",
)
def ev_running_sum(spark, sf_dir):
    """Window frame spec: per-user running total in event-time order."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "event_id", "user_id", F.round(F.sum("value").over(w), 2).alias("running_value")
    )


@query(
    "ev_asof_signup",
    """SELECT l.event_id, l.user_id,
       strftime(r.ts, '%Y-%m-%dT%H:%M:%S') AS signup_ts_asof
FROM (SELECT * FROM events WHERE event_type = 'purchase') l
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'signup') r
  ON l.user_id = r.user_id AND r.ts <= l.ts""",
)
def ev_asof_signup(spark, sf_dir):
    """As-of join: each purchase annotated with the user's most recent
    prior (or simultaneous) signup. Spark has no native as-of join; this
    is the union + last_value(ignore nulls) window composition
    (operators/asof.py). Oracle: DuckDB's native ASOF JOIN."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    signups = ev.filter(F.col("event_type") == "signup").select("user_id", "ts")
    out = asof_join(purchases, signups, on="ts", by="user_id", right_cols=["ts"])
    return out.select(
        "event_id",
        "user_id",
        F.date_format("ts_asof", "yyyy-MM-dd'T'HH:mm:ss").alias("signup_ts_asof"),
    )


@query(
    "ev_range_lookback",
    """SELECT event_id, user_id, n_recent_clicks FROM (
  SELECT event_id, user_id, event_type,
         (count(CASE WHEN event_type = 'click' THEN 1 END)
            OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
                  RANGE BETWEEN 600000000 PRECEDING AND CURRENT ROW)
          - CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)::BIGINT
           AS n_recent_clicks
  FROM events
) WHERE event_type = 'error'""",
)
def ev_range_lookback(spark, sf_dir):
    """Range-interval window (a bounded range join): for every error
    event, how many clicks the same user made in the preceding 10
    minutes. RANGE frame over epoch MICROseconds on both engines —
    second-truncated frames only match the oracle while no click sits
    within 1s of a 600s boundary (DuckDB's epoch() is fractional
    DOUBLE seconds; micros are exact on both sides)."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-600 * 1_000_000, 0)
    )
    is_click = F.when(F.col("event_type") == "click", 1)
    n = (
        F.count(is_click).over(w)
        - F.when(F.col("event_type") == "click", 1).otherwise(0)
    ).cast("long")
    return (
        ev.select("event_id", "user_id", "event_type", n.alias("n_recent_clicks"))
        .filter(F.col("event_type") == "error")
        .drop("event_type")
    )


@query(
    "ev_value_stats",
    """SELECT event_type, round(median(value), 4) AS med,
       round(min(value), 2) AS min_v, round(max(value), 2) AS max_v,
       count(*)::BIGINT AS n
FROM events GROUP BY event_type""",
)
def ev_value_stats(spark, sf_dir):
    """Exact distributional aggregates (median is an exact interpolated
    50th percentile in both engines)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.median("value"), 4).alias("med"),
        F.round(F.min("value"), 2).alias("min_v"),
        F.round(F.max("value"), 2).alias("max_v"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "ev_approx_stats",
    """SELECT event_type,
       count(DISTINCT user_id)::BIGINT AS exact_users,
       round(median(value), 4) AS exact_median,
       TRUE AS users_within_bounds,
       TRUE AS median_within_bounds
FROM events GROUP BY event_type""",
)
def ev_approx_stats(spark, sf_dir):
    """Approximate aggregates — HLL++ distinct count and quantile sketch —
    under a BOUNDS oracle. The sketch algorithms differ per engine, so the
    values themselves can't be hash-compared; instead the result carries
    the exact aggregates (hash-checked against DuckDB) plus booleans
    asserting the sketches landed within documented error bounds:

    - ``approx_count_distinct`` default rsd = 0.05 → require relative
      error ≤ 0.15 (3σ);
    - ``percentile_approx`` accuracy 10000 → rank error ≤ n/10000, far
      inside the exact p45..p55 envelope used as the bound.

    A sketch regression flips a boolean and fails the driver hash check.
    """
    ev = load_table(spark, sf_dir, "events")
    agg = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_users"),
        F.round(F.median("value"), 4).alias("exact_median"),
        F.approx_count_distinct("user_id").alias("__approx_users"),
        F.percentile_approx("value", 0.5, 10000).alias("__approx_median"),
        F.expr("percentile(value, 0.45)").alias("__p45"),
        F.expr("percentile(value, 0.55)").alias("__p55"),
    )
    return agg.select(
        "event_type",
        "exact_users",
        "exact_median",
        (
            F.abs(F.col("__approx_users") - F.col("exact_users"))
            <= 0.15 * F.col("exact_users")
        ).alias("users_within_bounds"),
        (
            (F.col("__approx_median") >= F.col("__p45"))
            & (F.col("__approx_median") <= F.col("__p55"))
        ).alias("median_within_bounds"),
    )


@query(
    "ev_window_sampler",
    """SELECT event_id, user_id,
       strftime(lag(ts) OVER w, '%Y-%m-%dT%H:%M:%S') AS prev_ts,
       strftime(lead(ts) OVER w, '%Y-%m-%dT%H:%M:%S') AS next_ts,
       round(first_value(value) OVER w, 2) AS first_v,
       ntile(4) OVER w AS quartile,
       rank() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS value_rank
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""",
)
def ev_window_sampler(spark, sf_dir):
    """Window-function sampler: lag/lead, first_value, ntile, rank — the
    analytic kit over one partitioned ordered window."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wv = Window.partitionBy("user_id").orderBy(F.desc("value"), F.asc("event_id"))
    fmt = lambda c: F.date_format(c, "yyyy-MM-dd'T'HH:mm:ss")  # noqa: E731
    return ev.select(
        "event_id",
        "user_id",
        fmt(F.lag("ts").over(w)).alias("prev_ts"),
        fmt(F.lead("ts").over(w)).alias("next_ts"),
        F.round(F.first("value").over(w), 2).alias("first_v"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.rank().over(wv).cast("long").alias("value_rank"),
    )


@query(
    "ev_pivot_type_counts",
    """SELECT user_id,
       count(*) FILTER (event_type = 'click')::BIGINT AS click,
       count(*) FILTER (event_type = 'error')::BIGINT AS error,
       count(*) FILTER (event_type = 'purchase')::BIGINT AS purchase,
       count(*) FILTER (event_type = 'signup')::BIGINT AS signup,
       count(*) FILTER (event_type = 'view')::BIGINT AS view
FROM events GROUP BY user_id""",
)
def ev_pivot_type_counts(spark, sf_dir):
    """PIVOT: one column per event type, counts per user. The pivot
    values are declared explicitly so the plan is a single-pass
    conditional aggregate (no extra distinct-values job) with a fixed
    output schema — at scale an undeclared pivot is two jobs."""
    ev = load_table(spark, sf_dir, "events")
    piv = ev.groupBy("user_id").pivot("event_type", _EVENT_TYPES).count()
    return piv.select(
        "user_id",
        *[F.coalesce(F.col(t), F.lit(0)).cast("long").alias(t) for t in _EVENT_TYPES],
    )


@query(
    "ev_unpivot_type_counts",
    """WITH counts AS (
  SELECT user_id, event_type, count(*) AS n FROM events GROUP BY user_id, event_type
), u AS (SELECT DISTINCT user_id FROM events),
t AS (SELECT DISTINCT event_type FROM events)
SELECT u.user_id, t.event_type, coalesce(c.n, 0)::BIGINT AS n
FROM u CROSS JOIN t
LEFT JOIN counts c ON c.user_id = u.user_id AND c.event_type = t.event_type""",
)
def ev_unpivot_type_counts(spark, sf_dir):
    """UNPIVOT (melt): the wide per-type count matrix back to long form,
    zeros preserved — wide→long reshape without a Python round-trip."""
    wide = ev_pivot_type_counts(spark, sf_dir)
    return wide.unpivot(
        ids=["user_id"],
        values=_EVENT_TYPES,
        variableColumnName="event_type",
        valueColumnName="n",
    )


@query(
    "ev_user_profile",
    """SELECT user_id,
       array_to_string(list_sort(list(DISTINCT event_type)), ',') AS types_seen,
       count(*)::BIGINT AS n_events,
       (floor(sum(CAST(floor((value) * 10000 + 0.5) AS BIGINT)) / 100.0 + 0.5) / 100.0) AS total_value
FROM events GROUP BY user_id""",
)
def ev_user_profile(spark, sf_dir):
    """Array aggregation: collect_set → array_sort → array_join emitted
    as a canonical string (engine-portable array semantics) alongside
    plain aggregates in the same grouped pass."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.array_join(F.array_sort(F.collect_set("event_type")), ",").alias(
            "types_seen"
        ),
        F.count(F.lit(1)).alias("n_events"),
        _money_sum(F.col("value")).alias("total_value"),
    )


@query(
    "ev_calendar_features",
    """SELECT event_id,
       strftime(ts, '%Y-%m-%d') AS d,
       (dayofweek(ts) + 1)::BIGINT AS dow,
       quarter(ts)::BIGINT AS quarter,
       weekofyear(ts)::BIGINT AS week,
       dayofyear(ts)::BIGINT AS doy,
       strftime(last_day(ts), '%Y-%m-%d') AS month_end,
       date_diff('day', ts, TIMESTAMP '2001-01-01')::BIGINT AS days_to_y2001
FROM events WHERE event_id < 2000""",
)
def ev_calendar_features(spark, sf_dir):
    """Calendar scalar kit: dow/quarter/week/doy/last_day/datediff.
    Engine note: Spark dayofweek is 1=Sunday while DuckDB dayofweek is
    0=Sunday — the oracle adds 1; weekofyear is ISO in both."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    return ev.select(
        "event_id",
        F.date_format("ts", "yyyy-MM-dd").alias("d"),
        F.dayofweek("ts").cast("long").alias("dow"),
        F.quarter("ts").cast("long").alias("quarter"),
        F.weekofyear("ts").cast("long").alias("week"),
        F.dayofyear("ts").cast("long").alias("doy"),
        F.date_format(F.last_day("ts"), "yyyy-MM-dd").alias("month_end"),
        F.datediff(F.lit("2001-01-01").cast("date"), F.col("ts").cast("date"))
        .cast("long")
        .alias("days_to_y2001"),
    )


@query(
    "ev_quality_report",
    """SELECT count(*)::BIGINT AS n_rows,
       count(DISTINCT user_id)::BIGINT AS n_users,
       count(DISTINCT event_type)::BIGINT AS n_types,
       sum(CASE WHEN props IS NULL THEN 1 ELSE 0 END)::BIGINT AS null_props,
       sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END)::BIGINT AS null_value,
       round(min(value), 2) AS min_value, round(max(value), 2) AS max_value,
       strftime(min(ts), '%Y-%m-%dT%H:%M:%S') AS min_ts,
       strftime(max(ts), '%Y-%m-%dT%H:%M:%S') AS max_ts
FROM events""",
)
def ev_quality_report(spark, sf_dir):
    """Single-pass data-profiling audit (the reference's A3/A4 audits
    generalized): row/distinct/null counts + value and time ranges in
    ONE aggregate over one scan — at 100 TB a profile must not be one
    job per metric."""
    ev = load_table(spark, sf_dir, "events")
    return ev.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("user_id").alias("n_users"),
        F.countDistinct("event_type").alias("n_types"),
        F.sum(F.col("props").isNull().cast("long")).alias("null_props"),
        F.sum(F.col("value").isNull().cast("long")).alias("null_value"),
        F.round(F.min("value"), 2).alias("min_value"),
        F.round(F.max("value"), 2).alias("max_value"),
        F.date_format(F.min("ts"), "yyyy-MM-dd'T'HH:mm:ss").alias("min_ts"),
        F.date_format(F.max("ts"), "yyyy-MM-dd'T'HH:mm:ss").alias("max_ts"),
    )


@query(
    "ev_quartiles",
    """SELECT event_type,
       round(quantile_cont(value, 0.25), 4) AS p25,
       round(quantile_cont(value, 0.75), 4) AS p75,
       round(quantile_cont(value, 0.99), 4) AS p99
FROM events GROUP BY event_type""",
)
def ev_quartiles(spark, sf_dir):
    """Exact interpolated quantiles per group (p25/p75/p99) — Spark
    percentile ≡ DuckDB quantile_cont (both linear-interpolated)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.percentile("value", 0.25), 4).alias("p25"),
        F.round(F.percentile("value", 0.75), 4).alias("p75"),
        F.round(F.percentile("value", 0.99), 4).alias("p99"),
    )


@query(
    "ev_retention",
    """WITH first_seen AS (
  SELECT user_id, min(ts) AS first_ts FROM events GROUP BY user_id
)
SELECT strftime(date_trunc('week', f.first_ts), '%Y-%m-%d') AS cohort_week,
       ((epoch_us(e.ts) - epoch_us(f.first_ts)) // 604800000000)::BIGINT AS offset_weeks,
       count(DISTINCT e.user_id)::BIGINT AS n_active_users
FROM events e JOIN first_seen f ON e.user_id = f.user_id
GROUP BY 1, 2""",
)
def ev_retention(spark, sf_dir):
    """Weekly cohort retention: users grouped by first-seen week, counted
    in each subsequent activity week. first_ts comes from a window over
    the same user_id partitioning as the event rows (no self-join), then
    one distinct-count shuffle on (cohort, offset)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    first_ts = F.min("ts").over(w)
    wk = 604_800_000_000  # microseconds per week
    return (
        ev.withColumn("first_ts", first_ts)
        .select(
            F.date_format(F.date_trunc("week", "first_ts"), "yyyy-MM-dd").alias(
                "cohort_week"
            ),
            F.floor(
                (F.unix_micros("ts") - F.unix_micros("first_ts")) / wk
            ).cast("long").alias("offset_weeks"),
            "user_id",
        )
        .groupBy("cohort_week", "offset_weeks")
        .agg(F.countDistinct("user_id").alias("n_active_users"))
    )


@query(
    "ev_anomaly_zscore",
    """WITH stats AS (
  SELECT event_type, avg(value) AS m, stddev(value) AS s
  FROM events GROUP BY event_type
)
SELECT event_id, event_type, round((value - m) / s, 4) AS z
FROM events JOIN stats USING (event_type)
WHERE abs((value - m) / s) > 2.5""",
)
def ev_anomaly_zscore(spark, sf_dir):
    """Per-type z-score outlier detection (|z| > 2.5). Two-pass shape:
    tiny per-type stats aggregate, broadcast back over the stream — the
    standard scalable anomaly sweep (no window over all events needed
    when the grouping is low-cardinality)."""
    ev = load_table(spark, sf_dir, "events")
    stats = ev.groupBy("event_type").agg(
        F.avg("value").alias("m"), F.stddev("value").alias("s")
    )
    z = (F.col("value") - F.col("m")) / F.col("s")
    return (
        ev.join(F.broadcast(stats), "event_type")
        .filter(F.abs(z) > 2.5)
        .select("event_id", "event_type", F.round(z, 4).alias("z"))
    )


@query(
    "ev_hopping_rollup",
    """SELECT wstart, event_type, count(*)::BIGINT AS n_events,
       (floor(sum(CAST(floor((value) * 10000 + 0.5) AS BIGINT)) / 100.0 + 0.5) / 100.0) AS total_value
FROM (
  SELECT strftime(make_timestamp(CAST(unnest([floor(epoch(ts)/300)*300, floor(epoch(ts)/300)*300 - 300]) AS BIGINT)*1000000), '%Y%m%d%H%M') AS wstart,
         event_type, value
  FROM events
)
GROUP BY wstart, event_type""",
)
def ev_hopping_rollup(spark, sf_dir):
    """Hopping-window rollup (10-minute windows sliding every 5): each
    event lands in exactly size/slide = 2 windows. Spark's built-in
    ``F.window(ts, size, slide)`` plans this as one Expand (2 rows per
    event, map-side) + a partial-then-final hash aggregate — the same
    two-phase shape as a plain groupBy, so it scales like the tumbling
    rollup; no windowed sort, no single-partition stage. The oracle
    models the window-start assignment arithmetically."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window("ts", "10 minutes", "5 minutes").alias("w"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            _money_sum(F.col("value")).alias("total_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyyMMddHHmm").alias("wstart"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@query(
    "ev_distinct_hll",
    """WITH h AS (
  SELECT ('0x' || substr(md5(user_id::VARCHAR || 'hll'), 1, 15))::BIGINT AS h FROM events
),
hr AS (SELECT h % 64 AS reg, h // 64 AS rem FROM h),
regs AS (
  SELECT reg, max(CASE WHEN rem = 0 THEN 55 ELSE 55 - length(bin(rem)) END) AS rho
  FROM hr GROUP BY reg
),
spine AS (SELECT range AS reg FROM range(64)),
sk AS (SELECT s.reg, coalesce(r.rho, 0) AS m FROM spine s LEFT JOIN regs r USING (reg)),
agg AS (
  SELECT sum(1::BIGINT << (55 - m))::BIGINT AS s_scaled,
         sum(CASE WHEN m = 0 THEN 1 ELSE 0 END)::BIGINT AS v_zero
  FROM sk
),
ex AS (SELECT count(*)::BIGINT AS n_events, count(DISTINCT user_id)::BIGINT AS exact_distinct FROM events),
est AS (
  SELECT *,
         CASE WHEN v_zero > 0
                   AND (0.709::DOUBLE * 4096.0 * 36028797018963968.0 / s_scaled) <= 160.0
              THEN 64.0::DOUBLE * ln(64.0::DOUBLE / v_zero)
              ELSE 0.709::DOUBLE * 4096.0 * 36028797018963968.0 / s_scaled END AS e
  FROM agg, ex
)
SELECT n_events, exact_distinct, s_scaled, v_zero,
       floor(e * 100 + 0.5) / 100.0 AS est_distinct,
       (abs(floor(e * 100 + 0.5) / 100.0 - exact_distinct)
          <= greatest(0.4::DOUBLE * exact_distinct, 8.0::DOUBLE)) AS est_ok
FROM est""",
)
def ev_distinct_hll(spark, sf_dir):
    """HyperLogLog distinct count (Flajolet et al. 2007), built the
    distributed way like ``ev_heavy_hitters_cms``: each day-shard
    produces its own 64-register sketch (groupBy register → max rho —
    fixed 64-cell state regardless of cardinality), shards MERGE by
    register-wise max, and the estimate comes from the merged
    registers. The oracle computes a single-shot sketch: the hash match
    proves merge = single-shot, the property that lets every
    executor/day/shard sketch independently at 100 TB and combine with
    64 longs of network traffic.

    Engine-portable by construction: the 60-bit md5 hash splits into a
    6-bit register index and a 54-bit remainder; rho = 55 -
    length(bin(rem)) is exact integer arithmetic on both engines, and
    the harmonic sum is accumulated as exact scaled BIGINTs
    (sum of 2^(55-M_j)), so the only doubles are the final constant
    multiply/divide — identical IEEE ops on identical values. Both the
    raw estimator (alpha_64 * m^2 / harmonic sum) and the small-range
    linear-counting branch (m * ln(m / V), taken when E <= 2.5m with
    empty registers) are implemented on both engines; ``est_ok`` pins
    the estimate to the exact count within the sketch's error budget."""
    ev = load_table(spark, sf_dir, "events")
    m = 64
    hashed = ev.select(
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("user_id").cast("string"), F.lit("hll"))), 1, 15
            ),
            16,
            10,
        )
        .cast("long")
        .alias("h"),
        F.dayofmonth("ts").alias("day"),
    ).select(
        F.pmod(F.col("h"), F.lit(m)).alias("reg"),
        F.expr("h div 64").alias("rem"),
        "day",
    )
    rho = F.when(F.col("rem") == 0, F.lit(55)).otherwise(
        F.lit(55) - F.length(F.expr("bin(rem)"))
    )

    def sketch(df):
        return df.select("reg", rho.alias("rho")).groupBy("reg").agg(
            F.max("rho").alias("rho")
        )

    merged = (
        sketch(hashed.filter(F.col("day") <= 10))
        .unionByName(sketch(hashed.filter((F.col("day") > 10) & (F.col("day") <= 20))))
        .unionByName(sketch(hashed.filter(F.col("day") > 20)))
        .groupBy("reg")
        .agg(F.max("rho").alias("rho"))
    )
    spine = spark.range(m).select(F.col("id").alias("reg"))
    sk = spine.join(merged, "reg", "left").select(
        F.coalesce(F.col("rho"), F.lit(0)).alias("m")
    )
    agg = sk.agg(
        F.sum(F.expr("shiftleft(1L, 55 - m)")).alias("s_scaled"),
        F.sum(F.when(F.col("m") == 0, 1).otherwise(0)).cast("long").alias("v_zero"),
    )
    ex = ev.agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("exact_distinct"),
    )
    e_raw = F.lit(0.709) * F.lit(4096.0) * F.lit(36028797018963968.0) / F.col(
        "s_scaled"
    )
    e = F.when(
        (F.col("v_zero") > 0) & (e_raw <= F.lit(160.0)),
        F.lit(64.0) * F.log(F.lit(64.0) / F.col("v_zero")),
    ).otherwise(e_raw)
    est2 = F.floor(e * 100 + F.lit(0.5)) / F.lit(100.0)
    return agg.crossJoin(F.broadcast(ex)).select(
        "n_events",
        "exact_distinct",
        "s_scaled",
        "v_zero",
        est2.alias("est_distinct"),
        (
            F.abs(est2 - F.col("exact_distinct"))
            <= F.greatest(
                F.lit(0.4) * F.col("exact_distinct"), F.lit(8.0)
            )
        ).alias("est_ok"),
    )


@query(
    "ev_quantile_digest",
    """WITH hist AS (
  SELECT greatest(least(floor(value * 4)::BIGINT, 4095), 0) AS bin, count(*)::BIGINT AS c
  FROM events GROUP BY bin
),
cdf AS (
  SELECT bin, sum(c) OVER (ORDER BY bin ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS cum
  FROM hist
),
n AS (SELECT sum(c)::BIGINT AS n_total FROM hist),
probes AS (SELECT unnest([0.25::DOUBLE, 0.5::DOUBLE, 0.75::DOUBLE, 0.9::DOUBLE]) AS p)
SELECT p, (min(bin) + 1) * (0.25::DOUBLE) AS est_value, n_total
FROM cdf, n, probes
WHERE cum >= ceil(p * n_total)
GROUP BY p, n_total""",
)
def ev_quantile_digest(spark, sf_dir):
    """Mergeable quantile sketch: a bounded equi-width histogram
    (quarter-unit bins, clamped to 4096 cells — the q-digest/t-digest
    state-bound idea with a deterministic, engine-portable bin rule).
    Each day-shard builds its own histogram in one hash aggregate,
    shards MERGE by cell-wise count sum, and quantile q is read off the
    merged CDF as the smallest bin whose cumulative count reaches
    ceil(q*N) — everything integer arithmetic, so merge = single-shot
    exactly (the oracle computes the single-shot sketch; the hash match
    is the mergeability proof, as in ``ev_heavy_hitters_cms``).

    The CDF window is deliberately unpartitioned: its input is the
    SKETCH (<= 4096 rows by construction), not the data — sketch
    finalization is a single-node step in any engine. The data-sized
    stages (per-shard histograms) are plain two-phase hash aggregates.
    Estimates carry the half-bin-width error bound; the property test
    pins merge associativity and the error bound against a Python
    model."""
    ev = load_table(spark, sf_dir, "events")
    binc = F.greatest(
        F.least(F.floor(F.col("value") * 4).cast("long"), F.lit(4095)), F.lit(0)
    )

    def sketch(df):
        return df.select(binc.alias("bin")).groupBy("bin").agg(
            F.count(F.lit(1)).alias("c")
        )

    day = F.dayofmonth("ts")
    merged = (
        sketch(ev.filter(day <= 10))
        .unionByName(sketch(ev.filter((day > 10) & (day <= 20))))
        .unionByName(sketch(ev.filter(day > 20)))
        .groupBy("bin")
        .agg(F.sum("c").alias("c"))
    )
    cdf = merged.select(
        "bin",
        F.sum("c")
        .over(Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0))
        .alias("cum"),
    )
    n = merged.agg(F.sum("c").alias("n_total"))
    probes = spark.createDataFrame([(0.25,), (0.5,), (0.75,), (0.9,)], "p double")
    return (
        cdf.crossJoin(F.broadcast(n))
        .crossJoin(F.broadcast(probes))
        .filter(F.col("cum") >= F.ceil(F.col("p") * F.col("n_total")))
        .groupBy("p", "n_total")
        .agg(F.min("bin").alias("bin"))
        .select(
            "p",
            ((F.col("bin") + 1) * F.lit(0.25)).alias("est_value"),
            "n_total",
        )
    )


@query(
    "ev_funnel_steps",
    """WITH s1 AS (
  SELECT user_id, ts, event_type,
         min(CASE WHEN event_type = 'signup' THEN ts END)
             OVER (PARTITION BY user_id) AS t1
  FROM events
),
s2 AS (
  SELECT *, min(CASE WHEN event_type = 'view' AND ts > t1 THEN ts END)
                OVER (PARTITION BY user_id) AS t2 FROM s1
),
s3 AS (
  SELECT *, min(CASE WHEN event_type = 'click' AND ts > t2 THEN ts END)
                OVER (PARTITION BY user_id) AS t3 FROM s2
),
s4 AS (
  SELECT *, min(CASE WHEN event_type = 'purchase' AND ts > t3 THEN ts END)
                OVER (PARTITION BY user_id) AS t4 FROM s3
),
u AS (
  SELECT user_id, min(t1) AS t1, min(t2) AS t2, min(t3) AS t3, min(t4) AS t4
  FROM s4 GROUP BY user_id
),
c AS (
  SELECT count(t1)::BIGINT AS c1, count(t2)::BIGINT AS c2,
         count(t3)::BIGINT AS c3, count(t4)::BIGINT AS c4
  FROM u
)
SELECT 1::BIGINT AS stage, 'signup' AS stage_name, c1 AS n_users FROM c
UNION ALL SELECT 2::BIGINT, 'view', c2 FROM c
UNION ALL SELECT 3::BIGINT, 'click', c3 FROM c
UNION ALL SELECT 4::BIGINT, 'purchase', c4 FROM c""",
)
def ev_funnel_steps(spark, sf_dir):
    """Ordered conversion funnel signup → view → click → purchase: a user
    reaches stage N only with an event of that type STRICTLY AFTER their
    stage-N-1 time (the classic product-analytics funnel, not a bag-of-
    types count).

    Distributed shape: four chained min-over-partition windows on the
    SAME ``partitionBy(user_id)`` spec — Catalyst plans one exchange on
    user_id and stacks the Window operators on it, so the per-user
    ordering logic costs a single shuffle of (user_id, ts, type) triples
    regardless of funnel depth. The per-user reduction and the final
    4-row stack are hash aggregates; nothing is ever globally sorted,
    and no state grows with events-per-user (min-aggregate windows, not
    collect_list). At 100 TB this is exactly the shape you want: one
    user-keyed exchange, then embarrassingly parallel.
    """
    c = _funnel_counts(load_table(spark, sf_dir, "events"))
    return c.selectExpr(
        "stack(4, 1L, 'signup', c1, 2L, 'view', c2, 3L, 'click', c3,"
        " 4L, 'purchase', c4) AS (stage, stage_name, n_users)"
    )


@query(
    "ev_zorder_stats",
    f"""WITH keys AS (
  SELECT (user_id % 256)::BIGINT AS ub,
         ((epoch_us(ts) // 3600000000) % 256)::BIGINT AS tb
  FROM events
),
z AS (SELECT ub, tb, ({_zexpr("ub", "tb")})::BIGINT AS zkey FROM keys)
SELECT (zkey >> 10)::BIGINT AS zbucket, count(*)::BIGINT AS n_events,
       min(ub)::BIGINT AS ub_min, max(ub)::BIGINT AS ub_max,
       min(tb)::BIGINT AS tb_min, max(tb)::BIGINT AS tb_max
FROM z GROUP BY 1""",
)
def ev_zorder_stats(spark, sf_dir):
    """Z-order (Morton) data layout: interleave the bits of two
    independent cluster keys — user bucket and hour bucket — so that
    sorting/bucketing by the single zkey co-locates rows that are close
    in BOTH dimensions. Per 64-file bucket (the top 6 zkey bits) the
    query reports the min/max span of each source key: exactly the
    parquet footer min/max a reader prunes on, demonstrating that a
    user-predicate AND a time-predicate each touch only a fraction of
    the files — the multi-dimensional file-skipping story that a
    single-column sort cannot give at 100 TB.

    Plan: the interleave is a closed-form bit expression (fused into the
    scan, no UDF, no join), followed by one two-phase hash aggregate on
    a 64-value keyspace. At scale the same zkey feeds
    ``repartitionByRange(zkey).sortWithinPartitions(zkey)`` at write
    time — the coded write path is
    ``sources/connectors.py:write_zordered`` (whose test verifies the
    span bound from actual parquet footer stats); this query is the
    read-side layout auditor."""
    ev = load_table(spark, sf_dir, "events")
    ub = F.pmod(F.col("user_id"), F.lit(256)).cast("long")
    tb = F.pmod(F.expr("unix_micros(ts) div 3600000000"), F.lit(256)).cast("long")
    keyed = ev.select(ub.alias("ub"), tb.alias("tb"))
    zkey = F.expr(_zexpr("ub", "tb")).cast("long")
    return (
        keyed.select("ub", "tb", zkey.alias("zkey"))
        .groupBy(F.expr("zkey >> 10").cast("long").alias("zbucket"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ub").alias("ub_min"),
            F.max("ub").alias("ub_max"),
            F.min("tb").alias("tb_min"),
            F.max("tb").alias("tb_max"),
        )
    )


@query(
    "ev_salted_join",
    """WITH cohorts AS (
  SELECT user_id, strftime(date_trunc('week', min(ts)), '%Y-%m-%d') AS cohort_week
  FROM events GROUP BY user_id
)
SELECT c.cohort_week, count(*)::BIGINT AS n_events,
       count(DISTINCT e.user_id)::BIGINT AS n_users
FROM events e JOIN cohorts c ON e.user_id = c.user_id
GROUP BY c.cohort_week""",
)
def ev_salted_join(spark, sf_dir):
    """Skew-mitigated fact-to-dim join, surfaced as a catalog query: the
    event stream (big, potentially hot-keyed — one viral user can own a
    partition) joins its per-user cohort dim through
    ``operators/skew.py:salted_join``, which spreads each key over 16
    (key, salt) buckets while replicating only the SMALL side. The
    oracle is the plain unsalted join — the hash match is the proof
    that salting changes the shuffle layout, never the semantics.
    Deliberately the hand-rolled twin of AQE's runtime skew splitting
    (enabled in session.py) for the planned-ahead case."""
    from etl__project_spark.operators.skew import salted_join

    ev = load_table(spark, sf_dir, "events")
    cohorts = ev.groupBy("user_id").agg(
        F.date_format(F.date_trunc("week", F.min("ts")), "yyyy-MM-dd").alias(
            "cohort_week"
        )
    )
    joined = salted_join(ev.select("user_id", "event_id"), cohorts, "user_id")
    return joined.groupBy("cohort_week").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
    )


@query(
    "ev_mad_outliers",
    """WITH med AS (
  SELECT event_type, floor(median(value) * 10000 + 0.5) / 10000.0 AS med_q
  FROM events GROUP BY event_type
),
dev AS (
  SELECT e.event_type, abs(e.value - m.med_q) AS dev
  FROM events e JOIN med m USING (event_type)
),
mad AS (
  SELECT event_type, floor(median(dev) * 10000 + 0.5) / 10000.0 AS mad_q
  FROM dev GROUP BY event_type
),
fin AS (
  SELECT d.event_type, m.med_q, a.mad_q,
         floor((3.5 * a.mad_q / 0.6745) * 10000 + 0.5) / 10000.0 AS thr, d.dev
  FROM dev d JOIN mad a USING (event_type) JOIN med m USING (event_type)
)
SELECT event_type, min(med_q) AS median_value, min(mad_q) AS mad,
       count(*)::BIGINT AS n_events,
       sum(CASE WHEN dev > thr THEN 1 ELSE 0 END)::BIGINT AS n_outliers,
       floor((0.6745 * max(dev) / min(mad_q)) * 10000 + 0.5) / 10000.0 AS max_robust_z
FROM fin GROUP BY event_type""",
)
def ev_mad_outliers(spark, sf_dir):
    """Robust per-group outlier detection via median / MAD (the
    median-absolute-deviation rule, Iglewicz & Hoaglin's modified
    z-score): a point is an outlier when
    0.6745 * |x - median| / MAD > 3.5. Unlike mean/stddev z-scores this
    is immune to the outliers it is hunting — the standard screen for
    telemetry values before they poison downstream aggregates.

    Distributed shape: three passes, each a narrow (event_type, value)
    scan — group medians, then MAD of the re-attached deviations, then
    the outlier count — with the per-group statistics re-attached by
    broadcast (the group keyspace is tiny at any event volume). Exact
    interpolated medians keep the DuckDB oracle bit-comparable (the
    ``ev_approx_stats`` precedent); at 100 TB the same plumbing runs on
    ``approx_percentile`` sketches (mergeable, bounded state) — the
    swap is one expression, the join/aggregate shape is unchanged.
    Cross-engine determinism: the median and MAD are floor-quantized to
    4 dp BEFORE the threshold compare, so the > test runs on
    bit-identical doubles in both engines."""
    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    med = ev.groupBy("event_type").agg(_quant4(F.median("value")).alias("med_q"))
    dev = ev.join(F.broadcast(med), "event_type").select(
        "event_type", "med_q", F.abs(F.col("value") - F.col("med_q")).alias("dev")
    )
    mad = dev.groupBy("event_type").agg(_quant4(F.median("dev")).alias("mad_q"))
    thr = _quant4(F.lit(3.5) * F.col("mad_q") / F.lit(0.6745))
    fin = dev.join(F.broadcast(mad), "event_type").withColumn("thr", thr)
    return fin.groupBy("event_type").agg(
        F.min("med_q").alias("median_value"),
        F.min("mad_q").alias("mad"),
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.when(F.col("dev") > F.col("thr"), 1).otherwise(0))
        .cast("long")
        .alias("n_outliers"),
        _quant4(F.lit(0.6745) * F.max("dev") / F.min("mad_q")).alias(
            "max_robust_z"
        ),
    )


@query(
    "ev_transition_matrix",
    """WITH seq AS (
  SELECT user_id, event_type AS from_type,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
             AS to_type
  FROM events
),
pair AS (
  SELECT from_type, to_type, count(*)::BIGINT AS n
  FROM seq WHERE to_type IS NOT NULL
  GROUP BY from_type, to_type
)
SELECT from_type, to_type, n,
       floor(n::DOUBLE / sum(n) OVER (PARTITION BY from_type) * 10000 + 0.5)
           / 10000.0 AS p
FROM pair""",
)
def ev_transition_matrix(spark, sf_dir):
    """First-order Markov transition matrix over per-user event
    sequences: for each (from_type, to_type) pair, how often a user's
    next event is ``to_type`` given the current one is ``from_type`` —
    the classic clickstream model behind next-action prediction and
    anomalous-flow detection.

    Distributed shape: ONE exchange keyed on user_id feeds the
    ``lead`` window (sorting only within a user's own events), the pair
    counts are a two-phase hash aggregate over a keyspace bounded by
    |event_type|² (25 cells here — independent of row count), and the
    row-normalising denominator is a window over that tiny aggregate,
    not the raw events. At 100 TB nothing downstream of the single
    user-keyed shuffle grows with data volume; per-user sort state is
    bounded by events-per-user, the same bound sessionization already
    relies on. Probabilities are one double divide of exact BIGINTs,
    half-up-rounded to 4 dp on both engines."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.select(
            "user_id",
            F.col("event_type").alias("from_type"),
            F.lead("event_type").over(w).alias("to_type"),
        )
        .filter(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    denom = Window.partitionBy("from_type")
    p = (
        F.floor(
            F.col("n").cast("double") / F.sum("n").over(denom) * 10000 + F.lit(0.5)
        )
        / F.lit(10000.0)
    )
    return pairs.select("from_type", "to_type", "n", p.alias("p"))


@query(
    "ev_cdc_apply",
    """WITH changes AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op
  FROM events
),
latest AS (
  SELECT *
  FROM changes
  QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts DESC,
                             event_id DESC) = 1
),
counts AS (
  SELECT user_id, count(*)::BIGINT AS n_changes FROM changes GROUP BY user_id
)
SELECT l.user_id, l.value AS last_value,
       strftime(l.ts, '%Y-%m-%dT%H:%M:%S') AS last_ts, c.n_changes
FROM latest l JOIN counts c USING (user_id)
WHERE l.op <> 'D'""",
)
def ev_cdc_apply(spark, sf_dir):
    """CDC changelog apply with latest-wins semantics INCLUDING deletes
    (``operators/merge.py:cdc_apply``) — the ``WHEN MATCHED THEN
    UPDATE/DELETE`` half of MERGE that the reference's insert-only
    Snowflake MERGE (snowpipe.sql:96-109, J3) leaves on the table. The
    change stream is derived deterministically from events: every row
    is an upsert of (user_id → value) at sequence (ts, event_id),
    except ``error`` events which are tombstones. The post-image keeps,
    per user, the payload of the highest-sequence change — and drops
    users whose final change is a delete.

    Distributed shape: one exchange keyed on user_id, a row_number
    window descending on the sequence, a narrow filter — no
    self-join, O(1) per-key state. The same operator runs incrementally
    (latest-wins within each micro-batch, then batch-vs-snapshot merge)
    because latest-wins is associative; see the operator docstring for
    the foreachBatch composition."""
    from etl__project_spark.operators import cdc_apply

    ev = load_table(spark, sf_dir, "events")
    changes = ev.select(
        "user_id",
        "ts",
        "event_id",
        "value",
        F.when(F.col("event_type") == "error", F.lit("D"))
        .otherwise(F.lit("U"))
        .alias("op"),
    )
    counts = changes.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_changes"))
    applied = cdc_apply(
        changes, key_cols=["user_id"], seq_cols=["ts", "event_id"], op_col="op"
    )
    return applied.join(counts, "user_id").select(
        "user_id",
        F.col("value").alias("last_value"),
        F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss").alias("last_ts"),
        "n_changes",
    )


@query(
    "ev_hll_set_ops",
    """WITH h AS (
  SELECT (value < 100) AS in_a, (event_type IN ('view', 'click')) AS in_b,
         ('0x' || substr(md5(event_id::VARCHAR || 'hll'), 1, 15))::BIGINT AS h
  FROM events
),
hr AS (
  SELECT in_a, in_b, h % 64 AS reg,
         CASE WHEN h // 64 = 0 THEN 55 ELSE 55 - length(bin(h // 64)) END AS rho
  FROM h
),
ra AS (SELECT reg, max(rho) AS rho FROM hr WHERE in_a GROUP BY reg),
rb AS (SELECT reg, max(rho) AS rho FROM hr WHERE in_b GROUP BY reg),
ru AS (
  SELECT reg, max(rho) AS rho
  FROM (SELECT * FROM ra UNION ALL SELECT * FROM rb) GROUP BY reg
),
spine AS (SELECT range AS reg FROM range(64)),
agg AS (
  SELECT 'a' AS seg,
         sum(1::BIGINT << (55 - coalesce(r.rho, 0)))::BIGINT AS s_scaled,
         sum(CASE WHEN coalesce(r.rho, 0) = 0 THEN 1 ELSE 0 END)::BIGINT AS v_zero
  FROM spine s LEFT JOIN ra r USING (reg)
  UNION ALL
  SELECT 'b', sum(1::BIGINT << (55 - coalesce(r.rho, 0)))::BIGINT,
         sum(CASE WHEN coalesce(r.rho, 0) = 0 THEN 1 ELSE 0 END)::BIGINT
  FROM spine s LEFT JOIN rb r USING (reg)
  UNION ALL
  SELECT 'u', sum(1::BIGINT << (55 - coalesce(r.rho, 0)))::BIGINT,
         sum(CASE WHEN coalesce(r.rho, 0) = 0 THEN 1 ELSE 0 END)::BIGINT
  FROM spine s LEFT JOIN ru r USING (reg)
),
est AS (
  SELECT seg,
         CASE WHEN v_zero > 0
                   AND (0.709::DOUBLE * 4096.0 * 36028797018963968.0 / s_scaled)
                       <= 160.0
              THEN 64.0::DOUBLE * ln(64.0::DOUBLE / v_zero)
              ELSE 0.709::DOUBLE * 4096.0 * 36028797018963968.0 / s_scaled END AS e
  FROM agg
),
p AS (
  SELECT max(CASE WHEN seg = 'a' THEN e END) AS ea,
         max(CASE WHEN seg = 'b' THEN e END) AS eb,
         max(CASE WHEN seg = 'u' THEN e END) AS eu
  FROM est
),
ex AS (
  SELECT count(DISTINCT CASE WHEN value < 100 THEN event_id END)::BIGINT AS exact_a,
         count(DISTINCT CASE WHEN event_type IN ('view', 'click')
                             THEN event_id END)::BIGINT AS exact_b,
         count(DISTINCT CASE WHEN value < 100 OR event_type IN ('view', 'click')
                             THEN event_id END)::BIGINT AS exact_union,
         count(DISTINCT CASE WHEN value < 100 AND event_type IN ('view', 'click')
                             THEN event_id END)::BIGINT AS exact_intersection
  FROM events
)
SELECT exact_a, exact_b, exact_union, exact_intersection,
       floor(ea * 100 + 0.5) / 100.0 AS est_a,
       floor(eb * 100 + 0.5) / 100.0 AS est_b,
       floor(eu * 100 + 0.5) / 100.0 AS est_union,
       floor((ea + eb - eu) * 100 + 0.5) / 100.0 AS est_intersection,
       (abs(floor(eu * 100 + 0.5) / 100.0 - exact_union)
          <= 0.25::DOUBLE * exact_union) AS union_ok,
       (abs(floor((ea + eb - eu) * 100 + 0.5) / 100.0 - exact_intersection)
          <= 0.4::DOUBLE * exact_union) AS intersection_ok
FROM p, ex""",
)
def ev_hll_set_ops(spark, sf_dir):
    """Sketch SET ALGEBRA on two event segments (A: value < 100, B:
    view/click events): distinct-count estimates for A, B, A∪B from
    64-register HLL sketches (``datapipe/sketches.py``), and A∩B by
    inclusion-exclusion est_a + est_b - est_union — the query pattern
    that answers "how many items satisfy BOTH predicates" across 100 TB
    from three 64-long sketches instead of a distinct-count shuffle per
    predicate combination.

    The union sketch is DERIVED (register-wise max of A's and B's
    sketches), not recomputed from rows — the mergeability property the
    streaming pipeline relies on; the oracle recomputes the identical
    algebra in SQL and also pins both estimates to the exact counts
    within the sketch error budget (union ≤ 25%, intersection ≤ 40% of
    the union — inclusion-exclusion error scales with |A∪B|, the
    documented HLL set-op caveat; sketches that need tighter
    intersections use inclusion-exclusion over finer sketches or
    ThetaSketch-style sampling)."""
    from etl__project_spark.datapipe.sketches import hll_merge, hll_registers

    ev = load_table(spark, sf_dir, "events")
    in_a = F.col("value") < 100
    in_b = F.col("event_type").isin("view", "click")
    ra = hll_registers(ev.filter(in_a), "event_id")
    rb = hll_registers(ev.filter(in_b), "event_id")
    ru = hll_merge(ra, rb)
    spine = spark.range(64).select(F.col("id").alias("reg"))

    def sketch_agg(regs, tag):
        return (
            spine.join(regs, "reg", "left")
            .select(F.coalesce(F.col("rho"), F.lit(0)).alias("m"))
            .agg(
                F.sum(F.expr("shiftleft(1L, 55 - m)")).alias(f"s_{tag}"),
                F.sum(F.when(F.col("m") == 0, 1).otherwise(0))
                .cast("long")
                .alias(f"v_{tag}"),
            )
        )

    def e_of(tag):
        e_raw = (
            F.lit(0.709)
            * F.lit(4096.0)
            * F.lit(36028797018963968.0)
            / F.col(f"s_{tag}")
        )
        return F.when(
            (F.col(f"v_{tag}") > 0) & (e_raw <= F.lit(160.0)),
            F.lit(64.0) * F.log(F.lit(64.0) / F.col(f"v_{tag}")),
        ).otherwise(e_raw)

    ex = ev.agg(
        F.countDistinct(F.when(in_a, F.col("event_id"))).alias("exact_a"),
        F.countDistinct(F.when(in_b, F.col("event_id"))).alias("exact_b"),
        F.countDistinct(F.when(in_a | in_b, F.col("event_id"))).alias("exact_union"),
        F.countDistinct(F.when(in_a & in_b, F.col("event_id"))).alias(
            "exact_intersection"
        ),
    )
    combined = (
        sketch_agg(ra, "a")
        .crossJoin(F.broadcast(sketch_agg(rb, "b")))
        .crossJoin(F.broadcast(sketch_agg(ru, "u")))
        .crossJoin(F.broadcast(ex))
    )
    ea, eb, eu = e_of("a"), e_of("b"), e_of("u")
    r2 = lambda c: F.floor(c * 100 + F.lit(0.5)) / F.lit(100.0)  # noqa: E731
    return combined.select(
        "exact_a",
        "exact_b",
        "exact_union",
        "exact_intersection",
        r2(ea).alias("est_a"),
        r2(eb).alias("est_b"),
        r2(eu).alias("est_union"),
        r2(ea + eb - eu).alias("est_intersection"),
        (
            F.abs(r2(eu) - F.col("exact_union"))
            <= F.lit(0.25) * F.col("exact_union")
        ).alias("union_ok"),
        (
            F.abs(r2(ea + eb - eu) - F.col("exact_intersection"))
            <= F.lit(0.4) * F.col("exact_union")
        ).alias("intersection_ok"),
    )


@query(
    "ev_group_quantiles",
    """WITH hist AS (
  SELECT event_type, greatest(least(floor(value * 4)::BIGINT, 4095), 0) AS bin,
         count(*)::BIGINT AS c
  FROM events GROUP BY event_type, bin
),
cdf AS (
  SELECT event_type, bin,
         sum(c) OVER (PARTITION BY event_type ORDER BY bin
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT
             AS cum
  FROM hist
),
n AS (SELECT event_type, sum(c)::BIGINT AS n_total FROM hist GROUP BY event_type),
probes AS (SELECT unnest([0.5::DOUBLE, 0.95::DOUBLE]) AS p)
SELECT cdf.event_type, p, (min(bin) + 1) * (0.25::DOUBLE) AS est_value, n_total
FROM cdf JOIN n ON n.event_type = cdf.event_type
CROSS JOIN probes
WHERE cum >= ceil(p * n_total)
GROUP BY cdf.event_type, p, n_total""",
)
def ev_group_quantiles(spark, sf_dir):
    """Per-GROUP mergeable quantile rollup: one bounded histogram per
    event_type (the grouped form of ``ev_quantile_digest`` — the
    latency-percentile-per-endpoint table every observability stack
    materializes). The sketch table is (group × ≤4096 bins) rows; the
    CDF readoff window is PARTITIONED by group, so even finalization
    parallelizes across groups — per-group state stays bounded no
    matter how many events a group absorbs, and group sketches merge
    cell-wise exactly like the global one."""
    ev = load_table(spark, sf_dir, "events")
    binc = F.greatest(
        F.least(F.floor(F.col("value") * 4).cast("long"), F.lit(4095)), F.lit(0)
    )
    hist = (
        ev.select("event_type", binc.alias("bin"))
        .groupBy("event_type", "bin")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    cdf = hist.select(
        "event_type",
        "bin",
        F.sum("c")
        .over(
            Window.partitionBy("event_type")
            .orderBy("bin")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        .alias("cum"),
    )
    n = hist.groupBy("event_type").agg(F.sum("c").alias("n_total"))
    probes = spark.createDataFrame([(0.5,), (0.95,)], "p double")
    return (
        cdf.join(F.broadcast(n), "event_type")
        .crossJoin(F.broadcast(probes))
        .filter(F.col("cum") >= F.ceil(F.col("p") * F.col("n_total")))
        .groupBy("event_type", "p", "n_total")
        .agg(F.min("bin").alias("bin"))
        .select(
            "event_type",
            "p",
            ((F.col("bin") + 1) * F.lit(0.25)).alias("est_value"),
            "n_total",
        )
    )


@query(
    "ev_skew_report",
    """WITH perkey AS (
  SELECT user_id, count(*)::BIGINT AS c FROM events GROUP BY user_id
)
SELECT count(*)::BIGINT AS n_keys,
       sum(c)::BIGINT AS n_events,
       max(c)::BIGINT AS max_c,
       floor(quantile_cont(c, 0.5) * 10000 + 0.5) / 10000.0 AS p50_c,
       floor(quantile_cont(c, 0.99) * 10000 + 0.5) / 10000.0 AS p99_c,
       floor(max(c)::DOUBLE / sum(c) * 10000 + 0.5) / 10000.0 AS top_share,
       floor(max(c)::DOUBLE / (sum(c)::DOUBLE / count(*)) * 10000 + 0.5)
           / 10000.0 AS max_over_mean
FROM perkey""",
)
def ev_skew_report(spark, sf_dir):
    """Shuffle-health / skew diagnosis: the per-key count distribution of
    the events stream (key = user_id) reduced to the numbers that
    predict shuffle trouble — max/p99/p50 per-key cardinality, the
    hottest key's share, and max-over-mean (the straggler multiplier a
    key-partitioned stage will suffer). This is the measurement that
    DECIDES when `ev_salted_join`'s salting or AQE skew splitting is
    needed; running it is two hash aggregates (per-key counts, then a
    7-number reduction over the counts table — keys, not events, so the
    second stage input is already small)."""
    ev = load_table(spark, sf_dir, "events")
    perkey = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("c"))
    r4 = lambda c: F.floor(c * 10000 + F.lit(0.5)) / F.lit(10000.0)  # noqa: E731
    return perkey.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("c").alias("n_events"),
        F.max("c").alias("max_c"),
        r4(F.expr("percentile(c, 0.5)")).alias("p50_c"),
        r4(F.expr("percentile(c, 0.99)")).alias("p99_c"),
        r4(F.max("c").cast("double") / F.sum("c")).alias("top_share"),
        r4(
            F.max("c").cast("double")
            / (F.sum("c").cast("double") / F.count(F.lit(1)))
        ).alias("max_over_mean"),
    )


@query(
    "ev_user_paths",
    """WITH seq AS (
  SELECT user_id, event_type AS e1,
         lead(event_type, 1) OVER w AS e2,
         lead(event_type, 2) OVER w AS e3
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
paths AS (
  SELECT e1 || '>' || e2 || '>' || e3 AS path, count(*)::BIGINT AS n
  FROM seq WHERE e3 IS NOT NULL
  GROUP BY path
)
SELECT path, n FROM paths
ORDER BY n DESC, path
LIMIT 10""",
)
def ev_user_paths(spark, sf_dir):
    """Top frequent 3-step user paths (order-2 sequence mining, the
    companion to ``ev_transition_matrix``'s order-1 view): two stacked
    ``lead`` windows on ONE user-keyed exchange (Catalyst plans both
    offsets over the same sort), a hash aggregate over a keyspace
    bounded by |types|³ (125 cells), and a TakeOrderedAndProject top-10
    — no global sort, nothing downstream of the single exchange scales
    with events."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("e1"),
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    ).filter(F.col("e3").isNotNull())
    return (
        seq.select(
            F.concat_ws(">", "e1", "e2", "e3").alias("path")
        )
        .groupBy("path")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("path"))
        .limit(10)
    )


@query(
    "ev_active_users",
    """WITH du AS (
  SELECT DISTINCT date_trunc('day', ts) AS day, user_id FROM events
),
dau AS (SELECT day, count(*)::BIGINT AS dau FROM du GROUP BY day),
days AS (SELECT DISTINCT day FROM du),
wau AS (
  SELECT d.day, count(DISTINCT u.user_id)::BIGINT AS wau
  FROM days d JOIN du u
    ON u.day > d.day - INTERVAL 7 DAY AND u.day <= d.day
  GROUP BY d.day
)
SELECT strftime(dau.day, '%Y-%m-%d') AS day, dau.dau, wau.wau
FROM dau JOIN wau ON dau.day = wau.day""",
)
def ev_active_users(spark, sf_dir):
    """DAU + trailing-7-day WAU per day — the engagement rollup every
    product dashboard serves. Stage 1 collapses events to DISTINCT
    (day, user) pairs — the only stage that sees raw events, one hash
    aggregate, and at 100 TB the pre-aggregation that makes everything
    after it small (users×days, not events). WAU is a range join of
    the tiny day spine against those pairs (≤7-day band, broadcast
    spine) + count-distinct — cost 7×|day,user|, never a re-scan of
    events; the HLL variant (``ev_distinct_hll``) replaces the exact
    count-distinct when approximate WAU is acceptable and lets the
    7-day window merge from daily register tables instead of
    recounting."""
    ev = load_table(spark, sf_dir, "events")
    du = ev.select(
        F.date_trunc("day", F.col("ts")).alias("day"), "user_id"
    ).distinct()
    dau = du.groupBy("day").agg(F.count(F.lit(1)).alias("dau"))
    days = du.select("day").distinct()
    wau = (
        days.alias("d")
        .join(
            du.alias("u"),
            (F.col("u.day") > F.col("d.day") - F.expr("INTERVAL 7 DAY"))
            & (F.col("u.day") <= F.col("d.day")),
        )
        .groupBy(F.col("d.day").alias("day"))
        .agg(F.countDistinct("u.user_id").alias("wau"))
    )
    return dau.join(wau, "day").select(
        F.date_format("day", "yyyy-MM-dd").alias("day"), "dau", "wau"
    )


@query(
    "ev_rfm_segments",
    """WITH ref AS (SELECT max(ts)::DATE AS mx FROM events),
per AS (
  SELECT user_id,
         date_diff('day', max(ts)::DATE, (SELECT mx FROM ref))::BIGINT
             AS recency_days,
         count(*)::BIGINT AS frequency,
         sum(CAST(floor(value * 10000 + 0.5) AS BIGINT))::BIGINT AS monetary_micro
  FROM events GROUP BY user_id
),
seg AS (
  SELECT CASE WHEN recency_days <= 3 THEN 'active'
              WHEN recency_days <= 10 THEN 'cooling'
              ELSE 'dormant' END
         || '/' ||
         CASE WHEN frequency >= 100 THEN 'heavy'
              WHEN frequency >= 20 THEN 'regular'
              ELSE 'light' END AS segment,
         recency_days, frequency, monetary_micro
  FROM per
)
SELECT segment, count(*)::BIGINT AS n_users,
       sum(frequency)::BIGINT AS n_events,
       (floor(sum(monetary_micro) / 100.0 + 0.5) / 100.0) AS total_value,
       floor(avg(recency_days) * 100 + 0.5) / 100.0 AS avg_recency_days
FROM seg GROUP BY segment""",
)
def ev_rfm_segments(spark, sf_dir):
    """RFM segmentation: per-user Recency (days since last event,
    anchored to the corpus max date — deterministic, no wall clock),
    Frequency, and Monetary value, bucketed into named segments and
    rolled up. Two hash aggregates end-to-end — per-user RFM (keyed on
    user), then the segment rollup (9-cell keyspace); the 1-row
    reference date broadcasts. Money follows the micro-unit BIGINT
    discipline of the tpch_* entries, so segment totals are
    bit-identical across engines."""
    ev = load_table(spark, sf_dir, "events")
    ref = ev.agg(F.max(F.to_date("ts")).alias("mx"))
    per = ev.groupBy("user_id").agg(
        F.max(F.to_date("ts")).alias("last_day"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(
            F.floor(F.col("value") * 10000 + F.lit(0.5)).cast("long")
        ).alias("monetary_micro"),
    )
    per = per.crossJoin(F.broadcast(ref)).withColumn(
        "recency_days", F.datediff(F.col("mx"), F.col("last_day")).cast("long")
    )
    r_seg = (
        F.when(F.col("recency_days") <= 3, F.lit("active"))
        .when(F.col("recency_days") <= 10, F.lit("cooling"))
        .otherwise(F.lit("dormant"))
    )
    f_seg = (
        F.when(F.col("frequency") >= 100, F.lit("heavy"))
        .when(F.col("frequency") >= 20, F.lit("regular"))
        .otherwise(F.lit("light"))
    )
    return (
        per.withColumn("segment", F.concat_ws("/", r_seg, f_seg))
        .groupBy("segment")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.sum("frequency").alias("n_events"),
            (
                F.floor(F.sum("monetary_micro") / F.lit(100.0) + F.lit(0.5))
                / F.lit(100.0)
            ).alias("total_value"),
            (
                F.floor(F.avg("recency_days") * 100 + F.lit(0.5)) / F.lit(100.0)
            ).alias("avg_recency_days"),
        )
    )


@query(
    "ev_lateness_audit",
    """WITH arr AS (
  SELECT user_id, ts,
         epoch_us(ts) + (('0x' || substr(md5(event_id::VARCHAR), 1, 4))::BIGINT
                         % 14400) * 1000000 AS arr_key,
         event_id
  FROM events
),
seq AS (
  SELECT greatest(epoch_us(max(ts) OVER (PARTITION BY user_id
             ORDER BY arr_key, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
           - epoch_us(ts), 0) AS late_us
  FROM arr
),
lat AS (SELECT late_us FROM seq WHERE late_us IS NOT NULL),
hist AS (
  SELECT least(late_us // 4000000, 4095)::BIGINT AS sec_bin, count(*)::BIGINT AS c
  FROM lat WHERE late_us > 0 GROUP BY sec_bin
),
cdf AS (
  SELECT sec_bin, sum(c) OVER (ORDER BY sec_bin
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS cum
  FROM hist
),
tot AS (
  SELECT count(*)::BIGINT AS n_checked,
         sum(CASE WHEN late_us > 0 THEN 1 ELSE 0 END)::BIGINT AS n_late,
         floor(coalesce(max(late_us), 0) / 1000000.0 * 100 + 0.5) / 100.0
             AS max_lateness_s
  FROM lat
),
ro AS (
  SELECT q, min(sec_bin)::BIGINT AS qbin
  FROM cdf, tot, (SELECT unnest([0.5::DOUBLE, 0.95::DOUBLE]) AS q)
  WHERE cum >= ceil(q * n_late)
  GROUP BY q
),
piv AS (
  SELECT (max(CASE WHEN q = 0.5 THEN qbin END) * 4)::BIGINT AS p50_lateness_bin_s,
         (max(CASE WHEN q = 0.95 THEN qbin END) * 4)::BIGINT AS p95_lateness_bin_s
  FROM ro
)
SELECT tot.n_checked, tot.n_late,
       floor(tot.n_late::DOUBLE / tot.n_checked * 10000 + 0.5) / 10000.0
           AS late_frac,
       tot.max_lateness_s, piv.p50_lateness_bin_s, piv.p95_lateness_bin_s
FROM tot, piv""",
)
def ev_lateness_audit(spark, sf_dir):
    """Event-time LATENESS audit — the measurement that sizes a
    watermark: per user, in arrival order, how far does an event's
    timestamp lag the running maximum already seen? Emits one summary
    row always (zero-late corpora report n_late=0, not an empty
    frame): late fraction, max lateness, and p50/p95 lateness from a
    <=4096-cell second-bin histogram with a sketch-sized CDF readoff.
    A streaming deployment sets ``withWatermark`` to ~p95-p99 of this
    distribution and routes the tail to a late side output (4-second
    bins cover a [0, 4.55 h) lateness range before clamping).

    The fixture's arrival order IS event-time order (zero lateness —
    an all-zero audit would be a vacuous oracle), so the entry audits a
    deterministic DISORDER REPLAY: each event's arrival instant is its
    event time plus an md5-derived delay in [0, 4 h), the bounded
    out-of-orderness an at-least-once source produces, derived
    identically on both engines — the ``doc_pii_scrub`` augmentation
    pattern, so the hash match verifies the lateness math on real
    nonzero lateness.

    Distributed shape: one user-keyed exchange for the running-max
    window, a bounded histogram aggregate, and a CDF readoff over the
    SKETCH (bins, not events). Micro-exact unix_micros/epoch_us
    arithmetic end-to-end. Round 6 factored the computation into
    ``operators/audit.py:lateness_audit`` so tests and deployments can
    run the same audit on their own arrival streams;
    ``streaming/windows.py:size_watermark`` turns the audited
    percentile into the ``withWatermark`` duration (acceptance pinned
    by ``tests/test_streaming_windows.py``)."""
    from etl__project_spark.operators.audit import lateness_audit

    ev = load_table(spark, sf_dir, "events")
    jitter_s = F.pmod(
        F.conv(F.substring(F.md5(F.col("event_id").cast("string")), 1, 4), 16, 10)
        .cast("long"),
        F.lit(14400),
    )
    replay = ev.select(
        "user_id",
        "event_id",
        "ts",
        (F.unix_micros("ts") + jitter_s * 1000000).alias("arr_key"),
    )
    return lateness_audit(replay)


@query(
    "ev_rollup_cdc_incremental",
    """WITH post AS (
  SELECT event_type,
         CASE WHEN event_id % 10 = 3 THEN round(value, 2) + 1.00
              ELSE round(value, 2) END AS v
  FROM events WHERE event_id % 10 <> 7
)
SELECT event_type, count(*)::BIGINT AS n_events,
       round(sum(v::DECIMAL(18,2))::DOUBLE, 2) AS total_value
FROM post GROUP BY event_type""",
)
def ev_rollup_cdc_incremental(spark, sf_dir):
    """Signed AGGREGATE IVM — the rollup face of
    ``tpch_join_cdc_incremental``: a per-type (count, sum) rollup is
    maintained while the events table takes CDC churn (values of
    event_id%10==3 updated +1.00, event_id%10==7 deleted). The change
    batch becomes signed rows (−1 old image, +1 post-image), folds
    through ``operators/rollup.py:partial_rollup_signed`` /
    ``merge_rollups_signed``, and the oracle is the one-shot aggregate
    over the post-CDC state — decimal quantization makes the signed
    merge bit-exact against the recompute, so the hash match PROVES
    retraction arithmetic, not just approximate agreement. (min/max are
    documented NON-members of the signed spec: deleting the extremum
    needs the runner-up, which merged state no longer holds.)

    Cost shape: two bounded-keyspace hash aggregates (batch partials)
    plus a merge keyed on the rollup's own (tiny) key space — O(batch +
    touched groups) per refresh at any history size."""
    from etl__project_spark.operators import (
        merge_rollups_signed,
        partial_rollup_signed,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    m10 = F.col("event_id") % 10
    state = partial_rollup_signed(
        ev.withColumn("sign", F.lit(1)), ["event_type"]
    )
    retractions = ev.filter(m10.isin(3, 7)).withColumn("sign", F.lit(-1))
    post_images = (
        ev.filter(m10 == 3)
        .withColumn("value", F.round(F.col("value"), 2) + F.lit(1.0))
        .withColumn("sign", F.lit(1))
    )
    delta = partial_rollup_signed(
        retractions.unionByName(post_images), ["event_type"]
    )
    merged = merge_rollups_signed(state, delta, ["event_type"])
    return merged.select(
        "event_type",
        F.col("n").alias("n_events"),
        F.round(F.col("total").cast("double"), 2).alias("total_value"),
    )


@query(
    "ev_markov_stationary",
    """WITH seq AS (
  SELECT user_id, event_type,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
             AS next_type
  FROM events
),
edges AS (
  SELECT event_type AS f, next_type AS t, count(*)::BIGINT AS c
  FROM seq WHERE next_type IS NOT NULL GROUP BY f, t
),
outdeg AS (SELECT f, sum(c)::BIGINT AS cf FROM edges GROUP BY f),
p AS (SELECT e.f, e.t, (e.c * 1000000) // o.cf AS pm
      FROM edges e JOIN outdeg o USING (f)),
nodes AS (SELECT DISTINCT event_type AS v FROM events),
nn AS (SELECT count(*)::BIGINT AS n FROM nodes),
r0 AS (SELECT v, (1000000 // n)::BIGINT AS r FROM nodes, nn),
r1 AS (SELECT p.t AS v, sum((r0.r * p.pm) // 1000000)::BIGINT AS r
       FROM p JOIN r0 ON r0.v = p.f GROUP BY p.t),
r2 AS (SELECT p.t AS v, sum((r1.r * p.pm) // 1000000)::BIGINT AS r
       FROM p JOIN r1 ON r1.v = p.f GROUP BY p.t),
r3 AS (SELECT p.t AS v, sum((r2.r * p.pm) // 1000000)::BIGINT AS r
       FROM p JOIN r2 ON r2.v = p.f GROUP BY p.t)
SELECT v AS event_type, r AS rank_micro,
       floor(r / 100.0 + 0.5) / 10000.0 AS rank
FROM r3""",
)
def ev_markov_stationary(spark, sf_dir):
    """Markov stationary distribution by power iteration — PageRank's
    core loop over the user-behavior transition graph: edges are
    consecutive same-user event pairs (the ``ev_transition_matrix``
    construction), transition probabilities are integer micro-units
    (exact BIGINT division), and three rank iterations from the uniform
    vector give the where-do-users-end-up distribution. The oracle
    unrolls the identical iterations as CTEs, so the hash match covers
    the ITERATED fixed-point step, not one multiply.

    Distributed shape — the general large-graph layout even though the
    type-graph is tiny: ONE user-keyed exchange builds edges; the rank
    vector (|nodes| rows) is BROADCAST into each iteration's edge join;
    each round is edge-scan + hash-agg keyed by destination, the
    standard scalable PageRank step (at web scale edges stay
    partitioned by source, ranks re-broadcast or co-partitioned per
    round; nothing here re-shuffles the edge set). Rank mass at
    in-degree-0 nodes decays to absent rows identically on both
    engines; dangling-node redistribution and damping are the
    documented production extensions."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    ).filter(F.col("next_type").isNotNull())
    edges = seq.groupBy(F.col("event_type").alias("f"), F.col("next_type").alias("t")).agg(
        F.count(F.lit(1)).alias("c")
    )
    outdeg = edges.groupBy("f").agg(F.sum("c").alias("cf"))
    p = edges.join(F.broadcast(outdeg), "f").select(
        "f", "t", F.expr("(c * 1000000) div cf").alias("pm")
    )
    nodes = ev.select(F.col("event_type").alias("v")).distinct()
    nn = nodes.agg(F.count(F.lit(1)).alias("n"))
    r = nodes.crossJoin(F.broadcast(nn)).select(
        "v", F.expr("1000000 div n").cast("long").alias("r")
    )
    for _ in range(3):
        r = (
            p.join(F.broadcast(r), p["f"] == r["v"])
            .select(F.col("t"), F.expr("(r * pm) div 1000000").alias("contrib"))
            .groupBy("t")
            .agg(F.sum("contrib").cast("long").alias("r"))
            .select(F.col("t").alias("v"), "r")
        )
    return r.select(
        F.col("v").alias("event_type"),
        F.col("r").alias("rank_micro"),
        (F.floor(F.col("r") / F.lit(100.0) + F.lit(0.5)) / F.lit(10000.0)).alias(
            "rank"
        ),
    )


@query(
    "ev_join_size_est",
    """WITH rows4 AS (SELECT * FROM (VALUES (0), (1), (2), (3)) t(r)),
a AS (SELECT user_id::VARCHAR AS uid FROM events WHERE event_type = 'click'),
b AS (SELECT user_id::VARCHAR AS uid FROM events WHERE event_type = 'purchase'),
sa AS (
  SELECT r, ('0x' || substr(md5(uid || 'cms' || r), 1, 15))::BIGINT % 64 AS bk,
         count(*)::BIGINT AS c
  FROM a CROSS JOIN rows4 GROUP BY r, bk
),
sb AS (
  SELECT r, ('0x' || substr(md5(uid || 'cms' || r), 1, 15))::BIGINT % 64 AS bk,
         count(*)::BIGINT AS c
  FROM b CROSS JOIN rows4 GROUP BY r, bk
),
ip AS (
  SELECT sa.r, sum(sa.c * sb.c)::BIGINT AS ip
  FROM sa JOIN sb ON sa.r = sb.r AND sa.bk = sb.bk GROUP BY sa.r
),
est AS (SELECT min(ip)::BIGINT AS est_size FROM ip),
exact AS (
  SELECT sum(ca.na * cb.nb)::BIGINT AS exact_size
  FROM (SELECT user_id, count(*)::BIGINT AS na FROM events
        WHERE event_type = 'click' GROUP BY user_id) ca
  JOIN (SELECT user_id, count(*)::BIGINT AS nb FROM events
        WHERE event_type = 'purchase' GROUP BY user_id) cb USING (user_id)
)
SELECT exact_size, est_size, est_size >= exact_size AS no_underestimate,
       round((est_size - exact_size)::DOUBLE / exact_size, 4) AS rel_error
FROM exact CROSS JOIN est""",
)
def ev_join_size_est(spark, sf_dir):
    """JOIN-CARDINALITY estimation from mergeable sketches — the CBO
    primitive behind join reordering: |A ⋈_k B| = Σ_k cntA(k)·cntB(k)
    is the inner product of the two keys' frequency vectors, and the
    count-min inner product Σ_b cmsA[r][b]·cmsB[r][b] (min over hash
    rows) estimates it WITHOUT touching the other table's rows — each
    side's 4×64 sketch is built independently (shippable, mergeable,
    256 cells regardless of key cardinality), so at 100 TB the
    optimizer prices every candidate join order from KB-sized sketch
    metadata. The CMS guarantee (Cormode & Muthukrishnan 2005 §4.2):
    never an underestimate — emitted as a checked column alongside the
    exact size and relative error.

    Distributed shape: each sketch is ONE bounded hash aggregate (the
    ``ev_heavy_hitters_cms`` pattern); the inner product joins two
    256-row frames. The exact twin aggregates per-key counts — its
    shuffle carries (key, BIGINT) pairs, never the joined rows
    themselves (the join is priced, not executed)."""
    from etl__project_spark.datapipe.sampling import hash_bucket

    ev = load_table(spark, sf_dir, "events")
    d, w = 4, 64

    def sketch(df):
        cells = F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("r"),
                        hash_bucket(F.col("user_id"), w, salt=f"cms{j}").alias("b"),
                    )
                    for j in range(d)
                ]
            )
        )
        return (
            df.select(cells.alias("x"))
            .select("x.r", "x.b")
            .groupBy("r", "b")
            .agg(F.count(F.lit(1)).alias("c"))
        )

    a = ev.filter(F.col("event_type") == "click")
    b = ev.filter(F.col("event_type") == "purchase")
    est = (
        sketch(a)
        .join(sketch(b).withColumnRenamed("c", "cb"), ["r", "b"])
        .groupBy("r")
        .agg(F.sum(F.col("c") * F.col("cb")).alias("ip"))
        .agg(F.min("ip").cast("long").alias("est_size"))
    )
    ca = a.groupBy("user_id").agg(F.count(F.lit(1)).alias("na"))
    cb = b.groupBy("user_id").agg(F.count(F.lit(1)).alias("nb"))
    exact = (
        ca.join(cb, "user_id")
        .agg(F.sum(F.col("na") * F.col("nb")).cast("long").alias("exact_size"))
    )
    return exact.crossJoin(est).select(
        "exact_size",
        "est_size",
        (F.col("est_size") >= F.col("exact_size")).alias("no_underestimate"),
        F.round(
            (F.col("est_size") - F.col("exact_size")).cast("double")
            / F.col("exact_size"),
            4,
        ).alias("rel_error"),
    )


@query(
    "ev_peak_concurrency",
    """WITH gaps AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
numbered AS (
  SELECT user_id, ts,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_no
  FROM gaps
),
sess AS (
  SELECT user_id, session_no, min(ts) AS start_ts, max(ts) AS end_ts
  FROM numbered GROUP BY user_id, session_no
),
b AS (
  SELECT start_ts AS ts, 1 AS delta, user_id, session_no FROM sess
  UNION ALL
  SELECT end_ts, -1, user_id, session_no FROM sess
),
r AS (
  SELECT ts, delta,
         sum(delta) OVER (ORDER BY ts, delta DESC, user_id, session_no
                          ROWS UNBOUNDED PRECEDING) AS running
  FROM b
)
SELECT ts::DATE AS day,
       max(greatest(running, running - delta))::BIGINT AS peak_concurrency
FROM r GROUP BY day""",
)
def ev_peak_concurrency(spark, sf_dir):
    """Peak CONCURRENT sessions per day — the capacity-planning number
    — by distributed sweep-line: sessions (30-min-gap, the
    ``ev_sessionize`` definition) become ±1 boundary events, and the
    answer is the max of their running sum. The naive formulations are
    both scale-killers: an interval self-join is O(N²) in overlaps,
    and a single global-order window is one partition by definition.
    The scalable shape used here is the two-level prefix sum: running
    sums WITHIN each day partition (parallel across days), plus a
    carry-in of prior-day totals computed on the tiny per-day
    aggregate (≤ |days| rows) and broadcast back — global running =
    carry + local running, exactly; at higher volume the inner
    partition drops to hours with the same carry algebra. Ties order
    +1 before −1, so touching sessions count as concurrent and
    single-event sessions register. The oracle computes the SAME
    number with one global-order window — the hash match proves the
    two-level decomposition.

    Each boundary row contributes BOTH its after-event value and its
    before-event value (``running − delta``) as peak candidates: the
    before-value of a day's first row is the start-of-day concurrency,
    so a day whose only boundary is a session END still reports the
    sessions it inherited (carry alone would otherwise be invisible).
    Days with no session boundary at all don't emit a row (no change
    in the running sum — their concurrency equals the carry)."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    wu = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lag_us = F.lag(F.unix_micros("ts")).over(wu)
    new_s = F.when(
        lag_us.isNull() | ((F.unix_micros("ts") - lag_us) > 1800 * 1_000_000), 1
    ).otherwise(0)
    numbered = ev.withColumn("new_session", new_s).withColumn(
        "session_no",
        F.sum("new_session").over(
            Window.partitionBy("user_id")
            .orderBy("ts", "event_id")
            .rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    sess = numbered.groupBy("user_id", "session_no").agg(
        F.min("ts").alias("start_ts"), F.max("ts").alias("end_ts")
    )
    # one explode, not a two-branch union: the (two-window) session
    # derivation appears ONCE per consumer, and the identical user_id
    # exchange below it is reused across consumers (ReusedExchange)
    b = sess.select(
        "user_id",
        "session_no",
        F.explode(
            F.array(
                F.struct(
                    F.col("start_ts").alias("ts"), F.lit(1).alias("delta")
                ),
                F.struct(F.col("end_ts").alias("ts"), F.lit(-1).alias("delta")),
            )
        ).alias("e"),
    ).select(
        "user_id", "session_no", "e.ts", "e.delta", F.to_date("e.ts").alias("day")
    )
    # materialize the boundary stream once: it is 2×|sessions| rows —
    # orders of magnitude smaller than events — and three consumers
    # (local running, day totals, carry) would otherwise each re-run
    # the scan + two session windows (Catalyst plans branches
    # independently; no common-subplan materialization in the DF API)
    b = b.localCheckpoint(eager=True)
    wd = (
        Window.partitionBy("day")
        .orderBy("ts", F.desc("delta"), "user_id", "session_no")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = b.withColumn("running", F.sum("delta").over(wd))
    day_tot = b.groupBy("day").agg(F.sum("delta").alias("day_total"))
    wc = (
        Window.orderBy("day").rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = day_tot.withColumn(
        "carry", F.coalesce(F.sum("day_total").over(wc), F.lit(0))
    ).select("day", "carry")
    after = F.col("carry") + F.col("running")
    return (
        local.join(F.broadcast(carry), "day")
        .groupBy("day")
        .agg(
            F.max(F.greatest(after, after - F.col("delta")))
            .cast("long")
            .alias("peak_concurrency")
        )
    )


@query(
    "ev_chi2_independence",
    """WITH cells AS (
  SELECT event_type, dayofweek(ts)::BIGINT AS dow, count(*)::BIGINT AS n_ij
  FROM events GROUP BY event_type, dow
),
rt AS (SELECT event_type, sum(n_ij)::BIGINT AS n_i FROM cells GROUP BY event_type),
ct AS (SELECT dow, sum(n_ij)::BIGINT AS n_j FROM cells GROUP BY dow),
tot AS (SELECT sum(n_ij)::BIGINT AS n FROM cells),
grid AS (
  SELECT rt.event_type, rt.n_i, ct.dow, ct.n_j,
         coalesce(c.n_ij, 0)::BIGINT AS n_ij
  FROM rt CROSS JOIN ct
  LEFT JOIN cells c USING (event_type, dow)
),
terms AS (
  SELECT floor(
           ((g.n_ij::DOUBLE - (g.n_i * g.n_j)::DOUBLE / tot.n)
            * (g.n_ij::DOUBLE - (g.n_i * g.n_j)::DOUBLE / tot.n))
           / ((g.n_i * g.n_j)::DOUBLE / tot.n) * 1000000 + 0.5
         )::BIGINT AS t_micro
  FROM grid g CROSS JOIN tot
)
SELECT (SELECT count(*) FROM rt)::BIGINT AS n_rows_levels,
       (SELECT count(*) FROM ct)::BIGINT AS n_col_levels,
       ((SELECT count(*) FROM rt) - 1) * ((SELECT count(*) FROM ct) - 1)
           ::BIGINT AS dof,
       floor(sum(t_micro)::DOUBLE / 100.0 + 0.5) / 10000.0 AS chi2
FROM terms""",
)
def ev_chi2_independence(spark, sf_dir):
    """Pearson χ² test of independence between event type and
    day-of-week — the contingency-table significance test behind every
    "does behavior differ by segment?" question (and the categorical
    sibling of ``tpch_corr_matrix``'s numeric correlations). One hash
    aggregate builds the |types|×7 contingency table; row totals,
    column totals, and the grand total are aggregates OF that bounded
    table (broadcast back), so the full test is one scan + bounded
    small-keyspace joins at any corpus size — the expected counts
    n_i·n_j/n never materialize a second pass over events.

    Cross-engine determinism: each cell's (O−E)²/E term is computed
    with an identical expression shape from exact BIGINT marginals and
    quantized to integer micro-units BEFORE the sum (double summation
    order never matters); dof and level counts are emitted so a
    consumer can look up the p-value."""
    ev = load_table(spark, sf_dir, "events")
    cells = (
        ev.select("event_type", F.dayofweek("ts").cast("long").alias("dow"))
        .groupBy("event_type", "dow")
        .agg(F.count(F.lit(1)).alias("n_ij"))
    )
    cells = cells.localCheckpoint(eager=True)  # |types|x7 rows, 4 consumers
    rt = cells.groupBy("event_type").agg(F.sum("n_ij").alias("n_i"))
    ct = cells.groupBy("dow").agg(F.sum("n_ij").alias("n_j"))
    tot = cells.agg(F.sum("n_ij").alias("n"))
    e = (F.col("n_i") * F.col("n_j")).cast("double") / F.col("n")
    t_micro = F.floor(
        (F.col("n_ij").cast("double") - e) * (F.col("n_ij").cast("double") - e) / e
        * 1_000_000
        + F.lit(0.5)
    ).cast("long")
    grid = (
        rt.crossJoin(F.broadcast(ct))
        .join(F.broadcast(cells), ["event_type", "dow"], "left")
        .withColumn("n_ij", F.coalesce(F.col("n_ij"), F.lit(0)))
    )
    terms = grid.crossJoin(F.broadcast(tot)).select(t_micro.alias("t_micro"))
    dims = rt.agg(F.count(F.lit(1)).alias("n_rows_levels")).crossJoin(
        ct.agg(F.count(F.lit(1)).alias("n_col_levels"))
    )
    return (
        terms.agg(
            (
                F.floor(F.sum("t_micro").cast("double") / F.lit(100.0) + F.lit(0.5))
                / F.lit(10000.0)
            ).alias("chi2")
        )
        .crossJoin(F.broadcast(dims))
        .select(
            "n_rows_levels",
            "n_col_levels",
            ((F.col("n_rows_levels") - 1) * (F.col("n_col_levels") - 1))
            .cast("long")
            .alias("dof"),
            "chi2",
        )
    )


@query(
    "ev_ab_test_zscore",
    """WITH assign AS (
  SELECT user_id,
         ('0x' || substr(md5(user_id::VARCHAR || 'ab'), 1, 15))::BIGINT % 2
             AS arm,
         max(CASE WHEN event_type = 'purchase' AND value > 180
                  THEN 1 ELSE 0 END) AS converted
  FROM events GROUP BY user_id
),
arms AS (
  SELECT arm, count(*)::BIGINT AS n_users,
         sum(converted)::BIGINT AS n_converted
  FROM assign GROUP BY arm
),
w AS (
  SELECT max(CASE WHEN arm = 0 THEN n_users END)::BIGINT AS n0,
         max(CASE WHEN arm = 0 THEN n_converted END)::BIGINT AS c0,
         max(CASE WHEN arm = 1 THEN n_users END)::BIGINT AS n1,
         max(CASE WHEN arm = 1 THEN n_converted END)::BIGINT AS c1
  FROM arms
)
SELECT n0, c0, n1, c1,
       round(c0::DOUBLE / n0, 4) AS rate_0,
       round(c1::DOUBLE / n1, 4) AS rate_1,
       round((c1::DOUBLE / n1 - c0::DOUBLE / n0) /
             sqrt(((c0 + c1)::DOUBLE / (n0 + n1))
                  * (1.0 - (c0 + c1)::DOUBLE / (n0 + n1))
                  * (1.0 / n0 + 1.0 / n1)), 4) AS z_score
FROM w""",
)
def ev_ab_test_zscore(spark, sf_dir):
    """Two-proportion z-test — the A/B-test readout, completing the
    inferential family (χ² for categorical independence, Pearson r for
    numeric association, z for converting-proportion lift): users are
    assigned to two arms by deterministic hash (the md5 discipline —
    the SAME assignment any engine/run derives, which is exactly how a
    real experiment bucketing service works), per-user conversion is
    "ever made a big-ticket purchase" (value > 180 — every user makes
    SOME purchase in this fixture, so plain purchase-rate is the
    degenerate p̂=1), and z = (p1−p0)/√(p̂(1−p̂)(1/n0+1/n1)) under the
    pooled null. One user-keyed aggregate then a 2-row rollup — the
    expensive part is the per-user collapse, one exchange on user_id;
    everything after is constant-size. Identical formula shape over
    exact BIGINT counts on both engines, one 4 dp round."""
    ev = load_table(spark, sf_dir, "events")
    from etl__project_spark.datapipe.sampling import hash_bucket

    assign = ev.groupBy("user_id").agg(
        F.max(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("value") > 180), 1
            ).otherwise(0)
        ).alias("converted")
    ).select(
        hash_bucket(F.col("user_id"), 2, salt="ab").alias("arm"), "converted"
    )
    arms = assign.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("converted").cast("long").alias("n_converted"),
    )
    w = arms.agg(
        F.max(F.when(F.col("arm") == 0, F.col("n_users"))).alias("n0"),
        F.max(F.when(F.col("arm") == 0, F.col("n_converted"))).alias("c0"),
        F.max(F.when(F.col("arm") == 1, F.col("n_users"))).alias("n1"),
        F.max(F.when(F.col("arm") == 1, F.col("n_converted"))).alias("c1"),
    )
    p0 = F.col("c0").cast("double") / F.col("n0")
    p1 = F.col("c1").cast("double") / F.col("n1")
    pp = (F.col("c0") + F.col("c1")).cast("double") / (F.col("n0") + F.col("n1"))
    return w.select(
        "n0",
        "c0",
        "n1",
        "c1",
        F.round(p0, 4).alias("rate_0"),
        F.round(p1, 4).alias("rate_1"),
        F.round(
            (p1 - p0)
            / F.sqrt(pp * (F.lit(1.0) - pp) * (F.lit(1.0) / F.col("n0") + F.lit(1.0) / F.col("n1"))),
            4,
        ).alias("z_score"),
    )


@query(
    "ev_session_copurchase",
    """WITH gaps AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT user_id, event_type,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_no
  FROM gaps
),
items AS (SELECT DISTINCT user_id, session_no, event_type FROM sess),
n_sess AS (SELECT count(DISTINCT user_id || '#' || session_no)::BIGINT AS n
           FROM items),
singles AS (
  SELECT event_type, count(*)::BIGINT AS n_a FROM items GROUP BY event_type
),
pairs AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         count(*)::BIGINT AS n_ab
  FROM items a JOIN items b
    ON a.user_id = b.user_id AND a.session_no = b.session_no
   AND a.event_type < b.event_type
  GROUP BY type_a, type_b
)
SELECT p.type_a, p.type_b, p.n_ab,
       round(p.n_ab::DOUBLE / n.n, 4) AS support,
       round(p.n_ab::DOUBLE / sa.n_a, 4) AS confidence_a_b,
       round(p.n_ab::DOUBLE * n.n / (sa.n_a * sb.n_a), 4) AS lift
FROM pairs p
JOIN singles sa ON sa.event_type = p.type_a
JOIN singles sb ON sb.event_type = p.type_b
CROSS JOIN n_sess n""",
)
def ev_session_copurchase(spark, sf_dir):
    """Association-rule mining over sessions (the market-basket
    support/confidence/lift triple, Agrawal et al. 1993): a session is
    the basket, distinct event types its items, and every type pair
    gets support (fraction of sessions containing both), confidence
    (P(b|a)) and lift (observed/independent). The χ² test says WHETHER
    type and context associate; this says WHICH pairs and how much —
    the recommendation-engine primitive.

    Distributed shape: sessionization is the standard one-user-exchange
    double window; baskets collapse to DISTINCT (session, type) rows —
    at most |types| per session — and the pair join is an equi-join on
    the session key whose per-session cost is ≤ |types|² (a bounded
    item domain, the supermarket assumption). Single-type aggregates
    and the session count are bounded frames broadcast back. All
    ratios are single divisions of exact BIGINTs rounded to 4 dp."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    wu = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lag_us = F.lag(F.unix_micros("ts")).over(wu)
    new_s = F.when(
        lag_us.isNull() | ((F.unix_micros("ts") - lag_us) > 1800 * 1_000_000), 1
    ).otherwise(0)
    items = (
        ev.withColumn("new_session", new_s)
        .withColumn(
            "session_no",
            F.sum("new_session").over(
                Window.partitionBy("user_id")
                .orderBy("ts", "event_id")
                .rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .select("user_id", "session_no", "event_type")
        .distinct()
    )
    items = items.localCheckpoint(eager=True)  # 4 consumers, tiny rows
    n_sess = items.select("user_id", "session_no").distinct().agg(
        F.count(F.lit(1)).alias("n")
    )
    singles = items.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_a"))
    a = items.alias("a")
    b = items.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.session_no") == F.col("b.session_no"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_ab"))
    )
    sa = singles.select(F.col("event_type").alias("type_a"), F.col("n_a"))
    sb = singles.select(F.col("event_type").alias("type_b"), F.col("n_a").alias("n_b"))
    return (
        pairs.join(F.broadcast(sa), "type_a")
        .join(F.broadcast(sb), "type_b")
        .crossJoin(F.broadcast(n_sess))
        .select(
            "type_a",
            "type_b",
            "n_ab",
            F.round(F.col("n_ab").cast("double") / F.col("n"), 4).alias("support"),
            F.round(F.col("n_ab").cast("double") / F.col("n_a"), 4).alias(
                "confidence_a_b"
            ),
            F.round(
                F.col("n_ab").cast("double") * F.col("n") / (F.col("n_a") * F.col("n_b")),
                4,
            ).alias("lift"),
        )
    )


@query(
    "ev_funnel_latency",
    """WITH firsts AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'signup' THEN ts END) AS first_signup,
         min(CASE WHEN event_type = 'purchase' THEN ts END) AS any_purchase
  FROM events GROUP BY user_id
),
conv AS (
  SELECT f.user_id,
         epoch_us(p.first_purchase_after) - epoch_us(f.first_signup) AS lat_us
  FROM firsts f
  JOIN (
    SELECT e.user_id, min(e.ts) AS first_purchase_after
    FROM events e JOIN firsts f2 ON e.user_id = f2.user_id
    WHERE e.event_type = 'purchase' AND e.ts > f2.first_signup
    GROUP BY e.user_id
  ) p ON f.user_id = p.user_id
)
SELECT count(*)::BIGINT AS n_converted,
       round(quantile_cont(lat_us, 0.50) / 1000000.0, 4) AS p50_seconds,
       round(quantile_cont(lat_us, 0.90) / 1000000.0, 4) AS p90_seconds,
       round(min(lat_us) / 1000000.0, 4) AS min_seconds,
       round(max(lat_us) / 1000000.0, 4) AS max_seconds
FROM conv""",
)
def ev_funnel_latency(spark, sf_dir):
    """Time-to-convert: for every user who purchased strictly AFTER
    their first signup, the signup→first-subsequent-purchase latency —
    the product metric the ordered funnel (``ev_funnel_steps``, which
    counts WHO converts) doesn't give: HOW LONG conversion takes, read
    off as exact interpolated p50/p90 plus min/max. The strict
    'purchase after signup' condition matches the funnel's semantics
    (a purchase before signup doesn't convert).

    Distributed shape: both the first-signup and the
    first-purchase-after aggregates collapse on ONE user_id exchange
    each (conditional-min, then a filtered min over the
    first-signup-annotated stream — the annotation joins back by
    user, no window needed); latencies are exact integer microsecond
    diffs and the percentile is Spark ``percentile`` ≡ DuckDB
    ``quantile_cont`` (both linear-interpolated, the ``ev_quartiles``
    equivalence)."""
    ev = load_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.min(
            F.when(F.col("event_type") == "signup", F.col("ts"))
        ).alias("first_signup")
    )
    pafter = (
        ev.filter(F.col("event_type") == "purchase")
        .join(firsts, "user_id")
        .filter(F.col("ts") > F.col("first_signup"))
        .groupBy("user_id")
        .agg(
            F.min("ts").alias("first_purchase_after"),
            F.first("first_signup").alias("first_signup"),
        )
    )
    lat = pafter.select(
        (
            F.unix_micros("first_purchase_after") - F.unix_micros("first_signup")
        ).alias("lat_us")
    )
    return lat.agg(
        F.count(F.lit(1)).alias("n_converted"),
        F.round(F.percentile("lat_us", 0.50) / 1_000_000.0, 4).alias("p50_seconds"),
        F.round(F.percentile("lat_us", 0.90) / 1_000_000.0, 4).alias("p90_seconds"),
        F.round(F.min("lat_us") / 1_000_000.0, 4).alias("min_seconds"),
        F.round(F.max("lat_us") / 1_000_000.0, 4).alias("max_seconds"),
    )


@query(
    "ev_ks_test",
    """WITH vals AS (
  SELECT value AS v,
         sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)::BIGINT AS n1,
         sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)::BIGINT AS n2
  FROM events
  WHERE event_type IN ('click', 'purchase') AND value IS NOT NULL
  GROUP BY value
),
tot AS (SELECT sum(n1)::BIGINT AS t1, sum(n2)::BIGINT AS t2 FROM vals),
cum AS (
  SELECT sum(n1) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS c1,
         sum(n2) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS c2
  FROM vals
),
d AS (
  SELECT max(abs(c1::HUGEINT * t2 - c2::HUGEINT * t1)) AS d_num
  FROM cum CROSS JOIN tot
)
SELECT t1 AS n_click, t2 AS n_purchase,
       floor(d_num::DOUBLE / (t1::DOUBLE * t2::DOUBLE) * 10000 + 0.5) / 10000.0 AS ks_d,
       floor(1.3581 * sqrt((t1::DOUBLE + t2::DOUBLE) / (t1::DOUBLE * t2::DOUBLE)) * 10000 + 0.5) / 10000.0 AS crit_05,
       (floor(d_num::DOUBLE / (t1::DOUBLE * t2::DOUBLE) * 10000 + 0.5)
          > floor(1.3581 * sqrt((t1::DOUBLE + t2::DOUBLE) / (t1::DOUBLE * t2::DOUBLE)) * 10000 + 0.5)) AS reject_05
FROM d CROSS JOIN tot""",
)
def ev_ks_test(spark, sf_dir):
    """Two-sample Kolmogorov-Smirnov test: does the `value` distribution
    of clicks differ from purchases? D = max over observed values of
    |ECDF_click(v) - ECDF_purchase(v)|, with the alpha=0.05 decision
    against the classic c(0.05)=1.3581 critical value.

    Distributed shape: the ECDF is a running sum over value order — a
    global-order window is one partition by definition, so this uses
    the ``ev_peak_concurrency`` two-level prefix sum, with the bands
    coming from ONE exact-percentile aggregate over the values (the
    ``tpch_equidepth_hist`` banding): 31 cut points broadcast, each
    distinct value assigned a band map-side, running sums WITHIN each
    band (parallel), plus a carry-in of prior-band totals computed on
    the <=32-row band aggregate. The cuts are internal to the Spark
    plan only — the oracle computes the same D with one global window,
    so the hash match proves the decomposition.

    Determinism: D's argmax comparison happens in exact integers —
    |c1*t2 - c2*t1| as decimal products of exact counts (the max is
    found BEFORE any division) — and the single final divide is
    identically floor-quantized to 4 dp on both engines. The rejection
    decision compares the two QUANTIZED integers, so the boolean can
    never straddle an ulp."""
    from pyspark.sql import Window

    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("click", "purchase"))
        .filter(F.col("value").isNotNull())
    )
    vals = ev.groupBy(F.col("value").alias("v")).agg(
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias("n1"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias("n2"),
    )
    tot = vals.agg(F.sum("n1").alias("t1"), F.sum("n2").alias("t2"))
    cuts = ev.agg(
        F.percentile(
            "value", F.array(*[F.lit(i / 32.0) for i in range(1, 32)])
        ).alias("c")
    )
    banded = vals.crossJoin(F.broadcast(cuts)).select(
        "v",
        "n1",
        "n2",
        F.aggregate(
            F.filter("c", lambda x: F.col("v") > x), F.lit(0), lambda a, _: a + 1
        ).alias("band"),
    )
    # |distinct values| rows, consumed twice (local running + band totals)
    banded = banded.localCheckpoint(eager=True)
    wb = Window.partitionBy("band").orderBy("v").rowsBetween(
        Window.unboundedPreceding, 0
    )
    local = banded.select(
        "band",
        F.sum("n1").over(wb).alias("c1"),
        F.sum("n2").over(wb).alias("c2"),
    )
    wc = Window.orderBy("band").rowsBetween(Window.unboundedPreceding, -1)
    carry = banded.groupBy("band").agg(
        F.sum("n1").alias("b1"), F.sum("n2").alias("b2")
    ).select(
        "band",
        F.coalesce(F.sum("b1").over(wc), F.lit(0)).alias("k1"),
        F.coalesce(F.sum("b2").over(wc), F.lit(0)).alias("k2"),
    )

    # decimal(18,0) x decimal(18,0) -> decimal(37,0): exact up to 1e18
    # counts per side (any real corpus), no 38-precision truncation
    def dec(c):
        return c.cast("decimal(18,0)")

    d = (
        local.join(F.broadcast(carry), "band")
        .crossJoin(F.broadcast(tot))
        .agg(
            F.max(
                F.abs(
                    dec(F.col("k1") + F.col("c1")) * dec(F.col("t2"))
                    - dec(F.col("k2") + F.col("c2")) * dec(F.col("t1"))
                )
            ).alias("d_num")
        )
    )
    t1d = F.col("t1").cast("double")
    t2d = F.col("t2").cast("double")
    ks_scaled = F.floor(
        F.col("d_num").cast("double") / (t1d * t2d) * 10000 + F.lit(0.5)
    )
    crit_scaled = F.floor(
        F.lit(1.3581) * F.sqrt((t1d + t2d) / (t1d * t2d)) * 10000 + F.lit(0.5)
    )
    return d.crossJoin(F.broadcast(tot)).select(
        F.col("t1").alias("n_click"),
        F.col("t2").alias("n_purchase"),
        (ks_scaled / 10000.0).alias("ks_d"),
        (crit_scaled / 10000.0).alias("crit_05"),
        (ks_scaled > crit_scaled).alias("reject_05"),
    )


@query(
    "ev_benford_audit",
    """WITH m AS (
  SELECT CAST(floor(value * 10000 + 0.5) AS BIGINT) AS iu
  FROM events WHERE value IS NOT NULL AND floor(value * 10000 + 0.5) >= 1
),
o AS (
  SELECT substr(iu::VARCHAR, 1, 1)::BIGINT AS digit, count(*)::BIGINT AS n_obs
  FROM m GROUP BY 1
),
b AS (
  SELECT digit::BIGINT AS digit, p::DOUBLE AS p
  FROM (VALUES (1, 0.30103), (2, 0.17609), (3, 0.12494), (4, 0.09691),
               (5, 0.07918), (6, 0.06695), (7, 0.05799), (8, 0.05115),
               (9, 0.04576)) AS t(digit, p)
),
tt AS (SELECT sum(n_obs)::BIGINT AS n FROM o)
SELECT b.digit,
       coalesce(o.n_obs, 0)::BIGINT AS n_obs,
       floor(coalesce(o.n_obs, 0)::DOUBLE / tt.n::DOUBLE * 10000 + 0.5) / 10000.0 AS obs_frac,
       b.p AS benford_p,
       floor((coalesce(o.n_obs, 0)::DOUBLE - tt.n::DOUBLE * b.p)
             * (coalesce(o.n_obs, 0)::DOUBLE - tt.n::DOUBLE * b.p)
             / (tt.n::DOUBLE * b.p) * 10000 + 0.5) / 10000.0 AS chi2_term
FROM b LEFT JOIN o ON b.digit = o.digit CROSS JOIN tt""",
)
def ev_benford_audit(spark, sf_dir):
    """Benford first-digit audit of the `value` column — the classic
    fraud/synthetic-data screen: the distribution of first significant
    digits in naturally-occurring amounts follows p(d)=log10(1+1/d);
    per-digit chi-square contributions localize WHERE a synthetic or
    manipulated amount column deviates.

    First-digit extraction avoids log10 entirely (libm log10 at exact
    powers of 10 is an ulp landmine: floor(log10(100))=1 on a libm
    that returns 1.9999...8): amounts quantize to exact integer 1e-4
    units (the ``_money_sum_raw`` discipline), and the first digit is
    substr(int::VARCHAR, 1, 1) — integer-to-string is exact and
    engine-portable. The Benford probabilities are shared 5-dp
    literals, NOT engine log10 calls, so the chi-square terms are
    identical IEEE arithmetic on both engines.

    Shape: one narrow map + one 9-key hash aggregate; the digit table
    and grand total broadcast. A pure scan at any scale."""
    ev = load_table(spark, sf_dir, "events")
    iu = F.floor(F.col("value") * 10000 + F.lit(0.5)).cast("long")
    m = (
        ev.filter(F.col("value").isNotNull())
        .select(iu.alias("iu"))
        .filter(F.col("iu") >= 1)
    )
    o = (
        m.select(
            F.substring(F.col("iu").cast("string"), 1, 1).cast("long").alias("digit")
        )
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n_obs"))
    )
    tt = o.agg(F.sum("n_obs").alias("n"))
    benford = spark.createDataFrame(
        [
            (1, 0.30103), (2, 0.17609), (3, 0.12494), (4, 0.09691),
            (5, 0.07918), (6, 0.06695), (7, 0.05799), (8, 0.05115),
            (9, 0.04576),
        ],
        "digit long, p double",
    )
    nd = F.col("n").cast("double")
    obs = F.coalesce(F.col("n_obs"), F.lit(0)).cast("double")
    dev = obs - nd * F.col("p")
    return (
        benford.join(F.broadcast(o), "digit", "left")
        .crossJoin(F.broadcast(tt))
        .select(
            "digit",
            F.coalesce(F.col("n_obs"), F.lit(0)).cast("long").alias("n_obs"),
            (F.floor(obs / nd * 10000 + F.lit(0.5)) / 10000.0).alias("obs_frac"),
            F.col("p").alias("benford_p"),
            (
                F.floor(dev * dev / (nd * F.col("p")) * 10000 + F.lit(0.5))
                / 10000.0
            ).alias("chi2_term"),
        )
    )


@query(
    "ev_cusum_changepoint",
    """WITH daily AS (
  SELECT ts::DATE AS day, count(*)::BIGINT AS x FROM events GROUP BY day
),
tot AS (SELECT sum(x)::BIGINT AS total, count(*)::BIGINT AS n_days FROM daily),
cum AS (
  SELECT day,
         sum(x) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)::BIGINT AS cum_x,
         row_number() OVER (ORDER BY day)::BIGINT AS rk
  FROM daily
),
s AS (
  SELECT day, abs(cum_x * n_days - rk * total)::BIGINT AS s_num, n_days, total
  FROM cum CROSS JOIN tot
)
SELECT day AS changepoint_day,
       floor(s_num::DOUBLE / n_days::DOUBLE * 10000 + 0.5) / 10000.0 AS cusum_max,
       floor(total::DOUBLE / n_days::DOUBLE * 10000 + 0.5) / 10000.0 AS mean_daily,
       n_days
FROM s ORDER BY s_num DESC, day LIMIT 1""",
)
def ev_cusum_changepoint(spark, sf_dir):
    """CUSUM changepoint detection on the daily event-count series: the
    day where the cumulative deviation from the overall mean peaks —
    the standard single-changepoint estimator (the argmax of |S_i|,
    S_i = sum_{d<=i}(x_d - mean)) used to flag when traffic volume
    shifted regime.

    Exact-integer trick: S_i * n_days = cum_i * n_days - rank_i * total
    — every term a product of exact counts — so the argmax is decided
    in BIGINT arithmetic with no float mean in the loop; the mean and
    the max deviation are divided out only in the final 1-row
    projection, identically floor-quantized.

    Shape: events collapse to a <=|days|-row daily aggregate (one
    shuffle); the prefix sum and ranking run on that bounded series
    (calendar-bounded, data-size-independent — the justified single-
    partition window, same class as ``ev_peak_concurrency``'s carry);
    the argmax is a TakeOrdered(1), never a global sort."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("x")
    )
    tot = daily.agg(F.sum("x").alias("total"), F.count(F.lit(1)).alias("n_days"))
    w = Window.orderBy("day")
    cum = daily.select(
        "day",
        F.sum("x").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("cum_x"),
        F.row_number().over(w).cast("long").alias("rk"),
    )
    s = cum.crossJoin(F.broadcast(tot)).select(
        "day",
        F.abs(
            F.col("cum_x") * F.col("n_days") - F.col("rk") * F.col("total")
        ).alias("s_num"),
        "n_days",
        "total",
    )
    return s.orderBy(F.desc("s_num"), F.asc("day")).limit(1).select(
        F.col("day").alias("changepoint_day"),
        (
            F.floor(
                F.col("s_num").cast("double") / F.col("n_days").cast("double") * 10000
                + F.lit(0.5)
            )
            / 10000.0
        ).alias("cusum_max"),
        (
            F.floor(
                F.col("total").cast("double") / F.col("n_days").cast("double") * 10000
                + F.lit(0.5)
            )
            / 10000.0
        ).alias("mean_daily"),
        "n_days",
    )


@query(
    "ev_gini_concentration",
    """WITH per_user AS (
  SELECT user_id, count(*)::BIGINT AS x FROM events GROUP BY user_id
),
ranked AS (
  SELECT x, row_number() OVER (ORDER BY x, user_id)::BIGINT AS rk FROM per_user
),
agg AS (
  SELECT sum(rk::HUGEINT * x)::HUGEINT AS s1, sum(x)::HUGEINT AS t,
         count(*)::HUGEINT AS n
  FROM ranked
)
SELECT n::BIGINT AS n_users, t::BIGINT AS total_events,
       floor((2 * s1 - (n + 1) * t)::DOUBLE / (n * t)::DOUBLE * 10000 + 0.5)
         / 10000.0 AS gini
FROM agg""",
)
def ev_gini_concentration(spark, sf_dir):
    """Gini coefficient of per-user event counts — the traffic-
    concentration audit (0 = perfectly even, 1 = one whale does
    everything) that decides whether per-user keys need skew handling
    before a groupBy/join ships (the measured complement of
    ``ev_skew_report``'s top-k view).

    Distributed shape: the textbook formula needs a GLOBAL rank over
    users — a corpus-sized sort. This computes the identical rank sum
    from the |distinct count values|-sized histogram instead: users
    with equal x are rank-interchangeable (their x is constant inside
    the tie block), so each count-value group contributes
    x * (cum_before * m + m(m+1)/2) exactly, and the prefix sum runs
    over the BOUNDED count histogram (same justified-window class as
    ``ev_cusum_changepoint``'s calendar series). The oracle ranks
    per-user rows directly — the hash match proves the tie-block
    decomposition.

    Determinism: every term is exact integer arithmetic
    (decimal(12)x(12) products summed in decimal(38); the triangular
    number via integer DIV, exact while any one tie block holds under
    ~3e9 users); the single final divide is floor-quantized to 4 dp."""
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("x"))
    hist = per_user.groupBy("x").agg(F.count(F.lit(1)).alias("m"))
    wc = Window.orderBy("x").rowsBetween(Window.unboundedPreceding, -1)
    g = hist.select(
        "x",
        "m",
        F.coalesce(F.sum("m").over(wc), F.lit(0)).alias("cum_before"),
    )

    def dec(c):
        return c.cast("decimal(12,0)")

    tri = F.expr("m * (m + 1) DIV 2")
    s1_term = dec(F.col("x")) * (
        dec(F.col("cum_before")) * dec(F.col("m")) + dec(tri)
    )
    agg = g.agg(
        F.sum(s1_term).alias("s1"),
        F.sum(dec(F.col("x")) * dec(F.col("m"))).alias("t"),
        F.sum(dec(F.col("m"))).alias("n"),
    )
    num = (F.lit(2).cast("decimal(12,0)") * F.col("s1")
           - (F.col("n") + F.lit(1)) * F.col("t"))
    return agg.select(
        F.col("n").cast("long").alias("n_users"),
        F.col("t").cast("long").alias("total_events"),
        (
            F.floor(
                num.cast("double")
                / (F.col("n") * F.col("t")).cast("double")
                * 10000
                + F.lit(0.5)
            )
            / 10000.0
        ).alias("gini"),
    )


@query(
    "ev_autocorr_daily",
    """WITH daily AS (
  SELECT ts::DATE AS day, count(*)::BIGINT AS x FROM events GROUP BY day
),
tot AS (SELECT sum(x)::BIGINT AS t, count(*)::BIGINT AS n FROM daily),
y AS (SELECT day, (x * n - t)::BIGINT AS y FROM daily CROSS JOIN tot),
den AS (SELECT sum(y::HUGEINT * y)::HUGEINT AS d FROM y),
ks AS (SELECT unnest(range(1, 8))::BIGINT AS k),
num AS (
  SELECT ks.k, sum(a.y::HUGEINT * b.y)::HUGEINT AS s, count(*)::BIGINT AS n_pairs
  FROM ks, y a, y b
  WHERE b.day = a.day + ks.k::INTEGER
  GROUP BY ks.k
)
SELECT k AS lag, n_pairs,
       floor(s::DOUBLE / d::DOUBLE * 10000 + 0.5) / 10000.0 AS acf
FROM num CROSS JOIN den""",
)
def ev_autocorr_daily(spark, sf_dir):
    """Lag-1..7 autocorrelation of the daily event-count series — the
    seasonality screen (a weekly-traffic corpus shows the lag-7 spike)
    that tells a capacity planner or anomaly detector which lags carry
    signal. Completes the series-statistics family started by
    ``ev_cusum_changepoint`` (level shift) with the periodic component.

    Exact-integer trick: center in scaled units y_t = n*x_t - T (the
    n-scaled deviation, exact BIGINT); r_k = sum(y_t * y_{t+k}) /
    sum(y_t^2) — the n^2 scale cancels — so both sums are exact
    decimal(38) integer aggregates and the single divide per lag is
    floor-quantized to 4 dp.

    Distributed shape: events collapse to the calendar-bounded daily
    table once (one shuffle); lags come from a date equi-join of that
    bounded table against itself shifted by k (k exploded from a 7-row
    broadcast range), never a global-order window; the denominator is
    one scalar agg. Everything past the first aggregate is
    data-size-independent."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("x")
    )
    tot = daily.agg(F.sum("x").alias("t"), F.count(F.lit(1)).alias("n"))
    y = (
        daily.crossJoin(F.broadcast(tot))
        .select("day", (F.col("x") * F.col("n") - F.col("t")).alias("y"))
        .localCheckpoint(eager=True)  # calendar-bounded, consumed 3x
    )

    def dec(c):
        return c.cast("decimal(18,0)")

    den = y.agg(F.sum(dec(F.col("y")) * dec(F.col("y"))).alias("d"))
    ks = spark.range(1, 8).select(F.col("id").alias("k"))
    b = y.select(F.col("day").alias("bday"), F.col("y").alias("yb"))
    num = (
        y.crossJoin(F.broadcast(ks))
        .select(
            F.date_add("day", F.col("k").cast("int")).alias("bday"), "y", "k"
        )
        .join(b, "bday")
        .groupBy("k")
        .agg(
            F.sum(dec(F.col("y")) * dec(F.col("yb"))).alias("s"),
            F.count(F.lit(1)).alias("n_pairs"),
        )
    )
    return num.crossJoin(F.broadcast(den)).select(
        F.col("k").alias("lag"),
        "n_pairs",
        (
            F.floor(
                F.col("s").cast("double") / F.col("d").cast("double") * 10000
                + F.lit(0.5)
            )
            / 10000.0
        ).alias("acf"),
    )


@query(
    "ev_psi_drift",
    """WITH vals AS (
  SELECT epoch_us(ts) AS us, value AS v FROM events WHERE value IS NOT NULL
),
mid AS (SELECT (min(us) + max(us)) // 2 AS m FROM vals),
cuts AS (
  SELECT [round(quantile_cont(v, 0.1), 4), round(quantile_cont(v, 0.2), 4),
          round(quantile_cont(v, 0.3), 4), round(quantile_cont(v, 0.4), 4),
          round(quantile_cont(v, 0.5), 4), round(quantile_cont(v, 0.6), 4),
          round(quantile_cont(v, 0.7), 4), round(quantile_cont(v, 0.8), 4),
          round(quantile_cont(v, 0.9), 4)] AS c
  FROM vals
),
banded AS (
  SELECT len(list_filter(cuts.c, x -> vals.v > x))::BIGINT AS band,
         CASE WHEN vals.us < mid.m THEN 1 ELSE 0 END AS first_half
  FROM vals CROSS JOIN cuts CROSS JOIN mid
),
bc AS (
  SELECT band, sum(first_half)::BIGINT AS c1,
         sum(1 - first_half)::BIGINT AS c2
  FROM banded GROUP BY band
),
tot AS (SELECT sum(c1)::BIGINT AS t1, sum(c2)::BIGINT AS t2 FROM bc)
SELECT band, c1 AS n_first, c2 AS n_second,
       CASE WHEN c1 > 0 AND c2 > 0 THEN
         floor((c1::DOUBLE / t1::DOUBLE - c2::DOUBLE / t2::DOUBLE)
               * ln((c1::DOUBLE * t2::DOUBLE) / (c2::DOUBLE * t1::DOUBLE))
               * 10000 + 0.5) / 10000.0
       ELSE 0.0 END AS psi_term
FROM bc CROSS JOIN tot""",
)
def ev_psi_drift(spark, sf_dir):
    """Population Stability Index between the first and second time
    halves of the event stream's `value` distribution — the standard
    model-monitoring drift score (PSI < 0.1 stable, > 0.25 shifted),
    reported per decile band so the drift is localized, not just
    totaled. Completes the drift family: ``ev_ks_test`` answers "did it
    shift?" with a hypothesis test; PSI answers "where and how much?"
    in the banded form monitoring dashboards store.

    Shape (``tpch_equidepth_hist`` banding): ONE exact-percentile
    aggregate over all values yields the 9 decile cuts (broadcast, 4 dp
    -rounded on both engines); the time midpoint is a second 1-row
    aggregate; band assignment + half assignment are then a narrow
    scan feeding a 10-key aggregate. Nothing corpus-sized shuffles.

    Determinism: counts are exact; each band's PSI term is ONE
    identically-shaped double expression (count ratios and their ln)
    floor-quantized to 4 dp; empty-on-either-side bands contribute an
    exact 0 by guard rather than an epsilon-smoothed float."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    vals = ev.select(
        F.unix_micros("ts").alias("us"), F.col("value").alias("v")
    )
    mid = vals.agg(
        ((F.min("us") + F.max("us")) / 2).cast("long").alias("m")
    )
    cuts = vals.agg(
        F.array(
            *[F.round(F.percentile("v", x / 10.0), 4) for x in range(1, 10)]
        ).alias("c")
    )
    banded = (
        vals.crossJoin(F.broadcast(cuts))
        .crossJoin(F.broadcast(mid))
        .select(
            F.aggregate(
                F.filter("c", lambda x: F.col("v") > x),
                F.lit(0).cast("long"),
                lambda acc, _: acc + 1,
            ).alias("band"),
            F.when(F.col("us") < F.col("m"), 1).otherwise(0).alias("first_half"),
        )
    )
    bc = (
        banded.groupBy("band")
        .agg(
            F.sum("first_half").alias("c1"),
            F.sum(F.lit(1) - F.col("first_half")).alias("c2"),
        )
        .localCheckpoint(eager=True)  # 10 rows, consumed twice (output + totals)
    )
    tot = bc.agg(F.sum("c1").alias("t1"), F.sum("c2").alias("t2"))
    c1d, c2d = F.col("c1").cast("double"), F.col("c2").cast("double")
    t1d, t2d = F.col("t1").cast("double"), F.col("t2").cast("double")
    term = F.when(
        (F.col("c1") > 0) & (F.col("c2") > 0),
        F.floor(
            (c1d / t1d - c2d / t2d) * F.log((c1d * t2d) / (c2d * t1d)) * 10000
            + F.lit(0.5)
        )
        / 10000.0,
    ).otherwise(F.lit(0.0))
    return bc.crossJoin(F.broadcast(tot)).select(
        "band",
        F.col("c1").alias("n_first"),
        F.col("c2").alias("n_second"),
        term.alias("psi_term"),
    )


@query(
    "ev_hot_window_sessions",
    """WITH m AS (
  SELECT epoch_us(ts) // 60000000 AS minute, count(*)::BIGINT AS cnt
  FROM events GROUP BY minute
),
thr AS (SELECT quantile_cont(cnt, 0.95) AS t FROM m),
hot AS (SELECT minute FROM m CROSS JOIN thr WHERE cnt::DOUBLE >= t),
isl AS (
  SELECT minute,
         CASE WHEN minute > coalesce(lag(minute) OVER (ORDER BY minute),
                                     minute - 2) + 1
              THEN 1 ELSE 0 END AS brk
  FROM hot
),
iv AS (
  SELECT min(minute)::BIGINT AS s_min, max(minute)::BIGINT AS e_min,
         count(*)::BIGINT AS n_minutes
  FROM (SELECT minute,
               sum(brk) OVER (ORDER BY minute ROWS UNBOUNDED PRECEDING) AS iid
        FROM isl)
  GROUP BY iid
),
gaps AS (
  SELECT user_id, ts, event_id, epoch_us(ts) // 60000000 AS emin,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
                     OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > 1800000000 OR
                   lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
),
sess AS (
  SELECT user_id, min(emin)::BIGINT AS ss, max(emin)::BIGINT AS se
  FROM (SELECT user_id, emin,
               sum(new_session) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING) AS sid
        FROM gaps)
  GROUP BY user_id, sid
),
sh AS (SELECT user_id, ss, se, unnest(range(ss // 60, se // 60 + 1)) AS hr FROM sess),
ih AS (SELECT s_min, e_min, n_minutes, unnest(range(s_min // 60, e_min // 60 + 1)) AS hr FROM iv),
ov AS (
  SELECT DISTINCT ih.s_min, ih.e_min, ih.n_minutes, sh.user_id, sh.ss, sh.se
  FROM ih JOIN sh USING (hr)
  WHERE sh.ss <= ih.e_min AND ih.s_min <= sh.se
)
SELECT s_min AS window_start_min, e_min AS window_end_min, n_minutes,
       count(*)::BIGINT AS n_sessions,
       count(DISTINCT user_id)::BIGINT AS n_users
FROM ov GROUP BY s_min, e_min, n_minutes""",
)
def ev_hot_window_sessions(spark, sf_dir):
    """Which user sessions overlap the platform's hot windows? Hot
    windows = maximal runs of consecutive minutes whose event count is
    at or above the 95th percentile of per-minute traffic (the
    incident/peak intervals an on-call would investigate); sessions =
    the standard 30-minute-gap sessionization. Reports, per hot window,
    how many sessions and distinct users were active in it — the blast-
    radius readout.

    Distributed shape — a BANDED INTERVAL JOIN, the pattern that
    replaces the cartesian range join at scale: both interval sets
    explode to the HOURS they span (bounded fan-out: windows and
    sessions are minutes-to-hours long), equi-join on the hour bucket,
    then the exact overlap predicate filters residually and DISTINCT
    collapses multi-hour double-hits. Spark executes a shuffled hash
    join on the hour key — never session x window pairs. The island
    merge runs on the calendar-bounded hot-minute table (the justified
    single-partition class); sessionization windows are per-user
    parallel.

    Determinism: minutes are exact integer epoch-division; the only
    float is the p95 threshold, compared identically on both engines
    (percentile interpolation parity, ``tpch_equidepth_hist``)."""
    ev = load_table(spark, sf_dir, "events")
    m = ev.groupBy(
        F.expr("unix_micros(ts) div 60000000").alias("minute")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    thr = m.agg(F.percentile("cnt", 0.95).alias("t"))
    hot = (
        m.crossJoin(F.broadcast(thr))
        .filter(F.col("cnt").cast("double") >= F.col("t"))
        .select("minute")
    )
    wo = Window.orderBy("minute")
    isl = hot.select(
        "minute",
        F.when(
            F.col("minute")
            > F.coalesce(F.lag("minute").over(wo), F.col("minute") - 2) + 1,
            1,
        ).otherwise(0).alias("brk"),
    )
    iv = (
        isl.select(
            "minute",
            F.sum("brk").over(wo.rowsBetween(Window.unboundedPreceding, 0)).alias("iid"),
        )
        .groupBy("iid")
        .agg(
            F.min("minute").alias("s_min"),
            F.max("minute").alias("e_min"),
            F.count(F.lit(1)).alias("n_minutes"),
        )
        .drop("iid")
    )
    wu = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lag_us = F.lag(F.unix_micros("ts")).over(wu)
    gaps = ev.select(
        "user_id",
        F.expr("unix_micros(ts) div 60000000").alias("emin"),
        F.when(
            lag_us.isNull() | ((F.unix_micros("ts") - lag_us) > 1800 * 1_000_000),
            1,
        ).otherwise(0).alias("new_session"),
        "ts",
        "event_id",
    )
    sess = (
        gaps.select(
            "user_id",
            "emin",
            F.sum("new_session")
            .over(
                Window.partitionBy("user_id")
                .orderBy("ts", "event_id")
                .rowsBetween(Window.unboundedPreceding, 0)
            )
            .alias("sid"),
        )
        .groupBy("user_id", "sid")
        .agg(F.min("emin").alias("ss"), F.max("emin").alias("se"))
    )
    sh = sess.select(
        "user_id",
        "ss",
        "se",
        F.explode(F.expr("sequence(ss div 60, se div 60)")).alias("hr"),
    )
    ih = iv.select(
        "s_min",
        "e_min",
        "n_minutes",
        F.explode(F.expr("sequence(s_min div 60, e_min div 60)")).alias("hr"),
    )
    ov = (
        ih.join(sh, "hr")
        .filter((F.col("ss") <= F.col("e_min")) & (F.col("s_min") <= F.col("se")))
        .select("s_min", "e_min", "n_minutes", "user_id", "ss", "se")
        .distinct()
    )
    return ov.groupBy("s_min", "e_min", "n_minutes").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.countDistinct("user_id").alias("n_users"),
    ).select(
        F.col("s_min").alias("window_start_min"),
        F.col("e_min").alias("window_end_min"),
        "n_minutes",
        "n_sessions",
        "n_users",
    )


@query("ev_ewma_anomaly", _ewma_sql())
def ev_ewma_anomaly(spark, sf_dir):
    """EWMA anomaly flags on the daily event-count series: each day is
    compared against the exponentially-weighted moving average of its
    trailing 30 observed days (half-life = 1 day, i.e. weight 2^-k for
    the k-th lag), and days deviating more than ±50% from their own
    forecast are flagged — the standing traffic-anomaly monitor that
    complements ``ev_cusum_changepoint`` (one-shot level shift) and
    ``ev_autocorr_daily`` (seasonality) with a per-day alert column.

    Exact-arithmetic trick: powers of TWO as the decay weights make the
    truncated EWMA a pure integer computation — num = sum x_{t-k} *
    2^(30-k), den = sum 2^(30-k) over the lags that exist — so there is
    no float pow() (libm-portability hazard) and no float summation
    anywhere; the two final divides are floor-quantized to 4 dp, and
    the +-50% flag compares the already-quantized integer to 5000, so
    the boolean can never straddle an ulp.

    Shape: one daily aggregate (the only data-sized stage), then 30 lag
    columns over the calendar-bounded series (the justified single-
    partition window class, <= |days| rows) and a narrow projection.
    Warm-up days (no lag-1) are excluded rather than zero-filled.

    The fold lives in ``operators/series.py:ewma_flags`` — the SAME
    coded path serves the streaming-maintained daily series
    (``streaming/pipeline.py:read_daily_anomaly``), so the one-shot and
    at-ingest monitors cannot drift."""
    from etl__project_spark.operators.series import ewma_flags

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("x")
    )
    return ewma_flags(daily)


@query(
    "ev_attribution_last_touch",
    """WITH marked AS (
  SELECT user_id, ts, event_id, event_type, epoch_us(ts) AS us,
         max(CASE WHEN event_type = 'click' THEN epoch_us(ts) END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS UNBOUNDED PRECEDING) AS last_click_us
  FROM events
),
p AS (
  SELECT ts::DATE AS day,
         CASE WHEN last_click_us IS NOT NULL
                   AND us - last_click_us <= 604800000000 THEN 1 ELSE 0 END AS attributed
  FROM marked WHERE event_type = 'purchase'
)
SELECT day, count(*)::BIGINT AS n_purchases,
       sum(attributed)::BIGINT AS n_attributed,
       floor(sum(attributed)::DOUBLE / count(*)::DOUBLE * 10000 + 0.5) / 10000.0 AS attach_rate
FROM p GROUP BY day""",
)
def ev_attribution_last_touch(spark, sf_dir):
    """Last-touch marketing attribution: each purchase is attributed to
    the user's most recent click within a 7-day lookback window, daily
    attach rate reported — the standard conversion-attribution readout,
    and the batch twin of what ``ev_asof_signup`` does for dimension
    lookups (an as-of join expressed as a running conditional max, no
    join at all).

    Distributed shape: ONE per-user ordered window carries the last
    click timestamp forward (conditional running max — partition-
    parallel, microsecond-exact on both engines via unix_micros /
    epoch_us), then purchases project a boolean and collapse to a
    calendar-bounded daily aggregate. The naive formulation is a
    purchases x clicks range join; this is the linear-scan replacement.

    Determinism: timestamps compare in exact integer microseconds; the
    7-day window is the exact literal 604 800 000 000 us; only the
    final attach-rate divide is floating point, floor-quantized 4 dp."""
    ev = load_table(spark, sf_dir, "events")
    wu = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    last_click = F.max(
        F.when(F.col("event_type") == "click", F.unix_micros("ts"))
    ).over(wu)
    marked = ev.select(
        "user_id",
        "ts",
        "event_type",
        F.unix_micros("ts").alias("us"),
        last_click.alias("last_click_us"),
    )
    p = marked.filter(F.col("event_type") == "purchase").select(
        F.to_date("ts").alias("day"),
        F.when(
            F.col("last_click_us").isNotNull()
            & ((F.col("us") - F.col("last_click_us")) <= 604_800_000_000),
            1,
        ).otherwise(0).alias("attributed"),
    )
    return p.groupBy("day").agg(
        F.count(F.lit(1)).alias("n_purchases"),
        F.sum("attributed").alias("n_attributed"),
        (
            F.floor(
                F.sum("attributed").cast("double")
                / F.count(F.lit(1)).cast("double")
                * 10000
                + F.lit(0.5)
            )
            / 10000.0
        ).alias("attach_rate"),
    )


@query(
    "ev_weekday_profile",
    """WITH daily AS (
  SELECT ts::DATE AS day, count(*)::BIGINT AS x FROM events GROUP BY day
),
wk AS (
  SELECT CAST(dayofweek(day) + 1 AS BIGINT) AS dow, count(*)::BIGINT AS n_days,
         sum(x)::BIGINT AS n_events
  FROM daily GROUP BY 1
),
tot AS (SELECT sum(n_events)::BIGINT AS t, sum(n_days)::BIGINT AS d FROM wk)
SELECT dow, n_days, n_events,
       floor(n_events::DOUBLE / n_days::DOUBLE * 10000 + 0.5) / 10000.0 AS avg_per_day,
       floor((n_events::DOUBLE * d::DOUBLE) / (n_days::DOUBLE * t::DOUBLE)
             * 10000 + 0.5) / 10000.0 AS seasonality_index
FROM wk CROSS JOIN tot""",
)
def ev_weekday_profile(spark, sf_dir):
    """Day-of-week seasonality profile: events per weekday, the per-day
    average, and the seasonality index (weekday average over the
    all-days average; 1.0 = flat week) — the profile that tells the
    ``ev_ewma_anomaly`` consumer which deviations are just "it's
    Saturday", and the capacity-planning complement of
    ``ev_autocorr_daily``'s lag-7 signal.

    Shape: the same calendar-bounded daily aggregate every series
    monitor shares, then a 7-key rollup and one broadcast total.
    Counts exact; the two ratios are identically floor-quantized, the
    index computed as one cross-multiplied expression so no
    intermediate average is rounded twice."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("x")
    )
    wk = daily.groupBy(F.dayofweek("day").cast("long").alias("dow")).agg(
        F.count(F.lit(1)).alias("n_days"), F.sum("x").alias("n_events")
    )
    tot = wk.agg(F.sum("n_events").alias("t"), F.sum("n_days").alias("d"))
    ne, ndy = F.col("n_events").cast("double"), F.col("n_days").cast("double")
    return wk.crossJoin(F.broadcast(tot)).select(
        "dow",
        "n_days",
        "n_events",
        (F.floor(ne / ndy * 10000 + F.lit(0.5)) / 10000.0).alias("avg_per_day"),
        (
            F.floor(
                (ne * F.col("d").cast("double"))
                / (ndy * F.col("t").cast("double"))
                * 10000
                + F.lit(0.5)
            )
            / 10000.0
        ).alias("seasonality_index"),
    )


@query(
    "ev_pareto_shares",
    """WITH per_user AS (
  SELECT user_id, count(*)::BIGINT AS x FROM events GROUP BY user_id
),
hist AS (SELECT x, count(*)::BIGINT AS m FROM per_user GROUP BY x),
cum AS (
  SELECT x, m,
         coalesce(sum(m) OVER (ORDER BY x DESC ROWS BETWEEN UNBOUNDED PRECEDING
                               AND 1 PRECEDING), 0)::BIGINT AS cu_before,
         coalesce(sum(m * x) OVER (ORDER BY x DESC ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND 1 PRECEDING), 0)::BIGINT AS ce_before,
         sum(m) OVER (ORDER BY x DESC ROWS UNBOUNDED PRECEDING)::BIGINT AS cu
  FROM hist
),
tot AS (SELECT sum(m)::BIGINT AS n, sum(m * x)::BIGINT AS t FROM hist),
p(pct) AS (VALUES (1), (5), (10), (20)),
kk AS (SELECT pct::BIGINT AS pct, (pct * n + 99) // 100 AS k, t FROM p CROSS JOIN tot)
SELECT kk.pct, kk.k AS k_users,
       (c.ce_before + (kk.k - c.cu_before) * c.x)::BIGINT AS k_events,
       floor((c.ce_before + (kk.k - c.cu_before) * c.x)::DOUBLE / kk.t::DOUBLE
             * 10000 + 0.5) / 10000.0 AS events_share
FROM kk JOIN cum c ON c.cu_before < kk.k AND c.cu >= kk.k""",
)
def ev_pareto_shares(spark, sf_dir):
    """Pareto / Lorenz-curve readoff: what share of all events do the
    top 1% / 5% / 10% / 20% most active users generate? The curve
    points behind ``ev_gini_concentration``'s single number — the
    "is this an 80/20 corpus?" answer a capacity planner or skew-
    mitigation decision actually reads.

    Exact tie-block arithmetic (no sampling, no interpolation error):
    users sharing a count are interchangeable, so the top-k cut takes
    ``k - cum_before`` users from the boundary block at exactly ``x``
    events each — every term an exact integer; k itself is the exact
    ceiling (pct*n+99) DIV 100. Only the final share divides, floor-
    quantized 4 dp.

    Shape: one user exchange, then ALL ranking runs on the bounded
    count histogram (descending prefix windows — the
    ``ev_gini_concentration`` single-partition class), a 4-row
    threshold table broadcast, and a bounded non-equi join to locate
    each threshold's boundary block."""
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("x"))
    hist = per_user.groupBy("x").agg(F.count(F.lit(1)).alias("m"))
    wd = Window.orderBy(F.desc("x"))
    cum = hist.select(
        "x",
        "m",
        F.coalesce(
            F.sum("m").over(wd.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        ).alias("cu_before"),
        F.coalesce(
            F.sum(F.col("m") * F.col("x")).over(
                wd.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ).alias("ce_before"),
        F.sum("m").over(wd.rowsBetween(Window.unboundedPreceding, 0)).alias("cu"),
    )
    tot = hist.agg(
        F.sum("m").alias("n"), F.sum(F.col("m") * F.col("x")).alias("t")
    )
    p = spark.createDataFrame([(1,), (5,), (10,), (20,)], "pct long")
    kk = p.crossJoin(F.broadcast(tot)).select(
        "pct", F.expr("(pct * n + 99) DIV 100").alias("k"), "t"
    )
    k_events = F.col("ce_before") + (F.col("k") - F.col("cu_before")) * F.col("x")
    return (
        cum.join(
            F.broadcast(kk),
            (F.col("cu_before") < F.col("k")) & (F.col("cu") >= F.col("k")),
        )
        .select(
            "pct",
            F.col("k").alias("k_users"),
            k_events.cast("long").alias("k_events"),
            (
                F.floor(
                    k_events.cast("double") / F.col("t").cast("double") * 10000
                    + F.lit(0.5)
                )
                / 10000.0
            ).alias("events_share"),
        )
    )


@query(
    "ev_mann_whitney",
    """WITH pur AS (
  SELECT ('0x' || substr(md5(user_id::VARCHAR || 'mw'), 1, 15))::BIGINT % 2
             AS arm,
         value AS v
  FROM events WHERE event_type = 'purchase' AND value IS NOT NULL
),
vals AS (
  SELECT v, sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END)::BIGINT AS n1,
         count(*)::BIGINT AS n
  FROM pur GROUP BY v
),
cum AS (
  SELECT n1, n,
         coalesce(sum(n) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                               AND 1 PRECEDING), 0)::BIGINT AS c
  FROM vals
),
agg AS (
  SELECT sum(n1)::BIGINT AS n1t, sum(n - n1)::BIGINT AS n2t,
         sum(n1 * (2 * c + n + 1))::BIGINT AS r1x2,
         sum(n * n * n - n)::BIGINT AS ties
  FROM cum
)
SELECT n1t AS n_0, n2t AS n_1,
       (r1x2 - n1t * (n1t + 1))::DOUBLE / 2 AS u_0,
       floor((r1x2 - n1t * (n1t + 1) - n1t * n2t)::DOUBLE
             / sqrt(n1t::DOUBLE * n2t::DOUBLE / 3.0
                    * ((n1t + n2t + 1)::DOUBLE
                       - ties::DOUBLE / ((n1t + n2t)::DOUBLE
                                         * (n1t + n2t - 1)::DOUBLE)))
             * 10000 + 0.5) / 10000.0 AS z_score,
       (abs(floor((r1x2 - n1t * (n1t + 1) - n1t * n2t)::DOUBLE
             / sqrt(n1t::DOUBLE * n2t::DOUBLE / 3.0
                    * ((n1t + n2t + 1)::DOUBLE
                       - ties::DOUBLE / ((n1t + n2t)::DOUBLE
                                         * (n1t + n2t - 1)::DOUBLE)))
             * 10000 + 0.5)) > 19600) AS reject_05
FROM agg""",
)
def ev_mann_whitney(spark, sf_dir):
    """Mann-Whitney U (Wilcoxon rank-sum) test: do the purchase VALUES
    of hash-arm 0 come from the same distribution as arm 1? The
    nonparametric companion to ``ev_ab_test_zscore`` (which compares
    converting PROPORTIONS): rank-based, so a heavy-tailed value
    distribution or outlier spend can't swamp the readout the way it
    swamps a t-statistic. KS asks "are the distributions different
    anywhere"; Mann-Whitney asks the A/B question "does one arm
    stochastically dominate" — together they complete the two-sample
    family.

    Exactness: average ranks never materialize as fractions — the
    identity 2*avgrank(v) = 2*C(v) + n(v) + 1 (C = count of values
    strictly below v) keeps the doubled rank-sum 2*R1, the doubled
    centered statistic 2*(U1 - mu) = 2R1 - n1(n1+1) - n1*n2, and the
    tie term sum(n^3 - n) ALL exact BIGINTs on both engines; the only
    floating step is the final tie-corrected z = (2U-2mu)/sqrt(4*Var),
    floor-quantized 4 dp, and the 0.05 decision compares the QUANTIZED
    integer against 19600 = 1.96 * 10^4 exactly.

    Distributed shape: per-value collapse (one exchange on value),
    then C(v) is the ``ev_ks_test`` two-level prefix sum — 31
    percentile cuts broadcast, running sums WITHIN each band, carry-in
    from the <=32-row band rollup — so no global-order window ever
    sees the full distinct-value set; everything after is one
    constant-size aggregate."""
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .filter(F.col("value").isNotNull())
    )
    from etl__project_spark.datapipe.sampling import hash_bucket

    pur = ev.select(
        hash_bucket(F.col("user_id"), 2, salt="mw").alias("arm"),
        F.col("value").alias("v"),
    )
    vals = pur.groupBy("v").agg(
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).alias("n1"),
        F.count(F.lit(1)).alias("n"),
    )
    cuts = pur.agg(
        F.percentile(
            "v", F.array(*[F.lit(i / 32.0) for i in range(1, 32)])
        ).alias("cutpoints")
    )
    banded = vals.crossJoin(F.broadcast(cuts)).select(
        "v",
        "n1",
        "n",
        F.aggregate(
            F.filter("cutpoints", lambda x: F.col("v") > x),
            F.lit(0),
            lambda a, _: a + 1,
        ).alias("band"),
    )
    # |distinct values| rows, consumed twice (local running + band totals)
    banded = banded.localCheckpoint(eager=True)
    wb = Window.partitionBy("band").orderBy("v").rowsBetween(
        Window.unboundedPreceding, -1
    )
    local = banded.select(
        "band",
        "n1",
        "n",
        F.coalesce(F.sum("n").over(wb), F.lit(0)).alias("c_local"),
    )
    wc = Window.orderBy("band").rowsBetween(Window.unboundedPreceding, -1)
    carry = banded.groupBy("band").agg(F.sum("n").alias("b")).select(
        "band", F.coalesce(F.sum("b").over(wc), F.lit(0)).alias("c_carry")
    )
    c = F.col("c_local") + F.col("c_carry")
    agg = local.join(F.broadcast(carry), "band").agg(
        F.sum("n1").alias("n1t"),
        F.sum(F.col("n") - F.col("n1")).alias("n2t"),
        F.sum(F.col("n1") * (2 * c + F.col("n") + 1)).alias("r1x2"),
        F.sum(F.col("n") * F.col("n") * F.col("n") - F.col("n")).alias("ties"),
    )
    n1t, n2t = F.col("n1t"), F.col("n2t")
    diff_x2 = (F.col("r1x2") - n1t * (n1t + 1) - n1t * n2t).cast("double")
    var_x4 = (
        n1t.cast("double") * n2t.cast("double") / F.lit(3.0)
        * (
            (n1t + n2t + 1).cast("double")
            - F.col("ties").cast("double")
            / ((n1t + n2t).cast("double") * (n1t + n2t - 1).cast("double"))
        )
    )
    z_scaled = F.floor(diff_x2 / F.sqrt(var_x4) * 10000 + F.lit(0.5))
    return agg.select(
        n1t.alias("n_0"),
        n2t.alias("n_1"),
        ((F.col("r1x2") - n1t * (n1t + 1)).cast("double") / 2).alias("u_0"),
        (z_scaled / 10000.0).alias("z_score"),
        (F.abs(z_scaled) > 19600).alias("reject_05"),
    )


@query(
    "ev_survival_km",
    """WITH mx AS (SELECT max(ts::DATE) AS dmax FROM events),
usr AS (
  SELECT user_id,
         CASE WHEN min(CASE WHEN event_type = 'purchase' AND value > 180
                            THEN ts::DATE END) IS NOT NULL
              THEN date_diff('day', min(ts::DATE),
                             min(CASE WHEN event_type = 'purchase'
                                      AND value > 180
                                      THEN ts::DATE END))
              ELSE date_diff('day', min(ts::DATE), (SELECT dmax FROM mx))
              END::BIGINT AS t,
         CASE WHEN min(CASE WHEN event_type = 'purchase' AND value > 180
                            THEN ts::DATE END) IS NOT NULL
              THEN 1 ELSE 0 END AS ev
  FROM events GROUP BY user_id
),
days AS (
  SELECT t, sum(ev)::BIGINT AS d, sum(1 - ev)::BIGINT AS c
  FROM usr GROUP BY t
),
risk AS (
  SELECT t, d, c,
         sum(d + c) OVER (ORDER BY t DESC ROWS UNBOUNDED PRECEDING)::BIGINT
             AS r
  FROM days
),
terms AS (
  SELECT t, d, c, r,
         CASE WHEN d < r
              THEN floor(ln((r - d)::DOUBLE / r::DOUBLE) * 1000000
                         + 0.5)::BIGINT
              ELSE 0 END AS qln,
         CASE WHEN d >= r THEN 1 ELSE 0 END AS dead
  FROM risk WHERE d > 0
),
curve AS (
  SELECT t, d, c, r,
         sum(qln) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING)::BIGINT AS cq,
         sum(dead) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING)::BIGINT AS zp
  FROM terms
)
SELECT t AS t_day, r AS n_risk, d AS n_events, c AS n_censored,
       CASE WHEN zp > 0 THEN 0.0
            ELSE floor(exp(cq::DOUBLE / 1000000.0) * 10000 + 0.5)
                 / 10000.0 END AS survival
FROM curve""",
)
def ev_survival_km(spark, sf_dir):
    """Kaplan-Meier product-limit estimator of TIME-TO-CONVERSION with
    right-censoring — the survival curve behind ``ev_retention``'s
    cohort grid: t = days from a user's first event to their first
    BIG-TICKET purchase (value > 180, the ``ev_ab_test_zscore``
    conversion event); users who never convert are CENSORED at the end
    of the observation window (their true conversion time is only
    known to exceed what we observed — at fixture scale roughly 7 in
    10 users, so the censoring is load-bearing, not decorative).
    S(t) = prod over conversion-days t' <= t of (1 - d/r) with the
    risk set r(t) = users still unconverted and observed at t — the
    estimator that reads censored users correctly, where naive
    "fraction converted by t" over-counts the denominator.

    Determinism across engines: each factor ln(1 - d/r) is quantized
    to integer MICRO-units before summing (the ``doc_unigram_logprob``
    discipline), the prefix sum over quantized integers is exact, and
    one exp at the end is floor-quantized 4 dp. The d = r boundary
    (everyone remaining churns — S hits exactly 0, where ln blows up)
    is carried as a separate exact integer flag summed over the same
    prefix.

    Distributed shape: ONE exchange (per-user collapse); everything
    after lives on the day histogram, bounded by the corpus's day
    span (<= |days| rows — the ``ev_gini_concentration``
    single-partition class): descending risk-set prefix sum, ascending
    log-sum prefix, 1-row max-date broadcast. The curve itself is
    ``operators/series.py:survival_curve`` — the same coded path the
    streaming maintenance serves from the incrementally-folded
    per-user conversion table (``stream_user_conversion``), so the
    one-shot and maintained curves can never drift."""
    from etl__project_spark.operators.series import big_ticket, survival_curve

    ev = load_table(spark, sf_dir, "events")
    users = ev.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("first_day"),
        F.min(F.when(big_ticket(), F.to_date("ts"))).alias("conv_day"),
        F.max(F.to_date("ts")).alias("last_day"),
    )
    return survival_curve(users)


@query(
    "ev_jackknife_ci",
    """WITH pur AS (
  SELECT ('0x' || substr(md5(user_id::VARCHAR || 'jk'), 1, 15))::BIGINT % 32
             AS g,
         CAST(floor(value * 10000 + 0.5) AS BIGINT) AS iu
  FROM events WHERE event_type = 'purchase' AND value IS NOT NULL
),
blocks AS (
  SELECT g, sum(iu)::BIGINT AS s_g, count(*)::BIGINT AS n_g
  FROM pur GROUP BY g
),
tot AS (
  SELECT sum(s_g)::BIGINT AS s, sum(n_g)::BIGINT AS n,
         count(*)::BIGINT AS nb
  FROM blocks
),
loo AS (
  SELECT t.s, t.n, t.nb,
         CAST(floor((t.s - b.s_g)::DOUBLE / (t.n - b.n_g)::DOUBLE * 100
                    + 0.5) AS BIGINT) AS ql
  FROM blocks b CROSS JOIN tot t
),
agg AS (
  SELECT any_value(s) AS s, any_value(n) AS n, any_value(nb) AS nb,
         sum(ql)::HUGEINT AS sq,
         sum(ql::HUGEINT * ql::HUGEINT)::HUGEINT AS sqq
  FROM loo
)
SELECT n AS n_purchases, nb AS n_blocks,
       floor(s::DOUBLE / n::DOUBLE / 10000.0 * 10000 + 0.5) / 10000.0
           AS mean_value,
       floor(sqrt((nb - 1)::DOUBLE / nb::DOUBLE
                  * (sqq::DOUBLE - sq::DOUBLE * sq::DOUBLE / nb::DOUBLE))
             / 1000000.0 * 10000 + 0.5) / 10000.0 AS se_value,
       floor((s::DOUBLE / n::DOUBLE * 100.0
              - 1.96 * sqrt((nb - 1)::DOUBLE / nb::DOUBLE
                            * (sqq::DOUBLE
                               - sq::DOUBLE * sq::DOUBLE / nb::DOUBLE)))
             / 1000000.0 * 10000 + 0.5) / 10000.0 AS ci_lo,
       floor((s::DOUBLE / n::DOUBLE * 100.0
              + 1.96 * sqrt((nb - 1)::DOUBLE / nb::DOUBLE
                            * (sqq::DOUBLE
                               - sq::DOUBLE * sq::DOUBLE / nb::DOUBLE)))
             / 1000000.0 * 10000 + 0.5) / 10000.0 AS ci_hi
FROM agg""",
)
def ev_jackknife_ci(spark, sf_dir):
    """Delete-one-BLOCK jackknife confidence interval for the mean
    purchase value — resampling-based uncertainty without resampling
    cost: users hash into 32 blocks (block = f(user_id), so a user's
    correlated events leave together — the grouped jackknife that stays
    honest under within-user correlation, where the naive iid SE is
    too tight), each block's leave-one-out mean is recomputed from the
    TOTALS minus the block's sums, and the jackknife variance
    (G-1)/G * sum((theta_g - theta_bar)^2) prices the spread. The
    estimator every A/B platform publishes next to its point metric;
    complements ``ev_ab_test_zscore`` (which tests a difference; this
    bounds a level).

    Exactness: block sums are micro-unit BIGINTs (the ``ev_rfm``
    value-quantization discipline); each leave-one-out mean is
    quantized to an integer BEFORE the variance pass, so sum(ql) and
    sum(ql^2) are exact on both engines (HUGEINT / decimal products —
    the ``ev_ks_test`` wide-integer discipline) and the one floating
    step per output is floor-quantized 4 dp.

    Distributed shape: ONE 32-key hash aggregate over the purchase
    scan (map-side combine does nearly all the work); everything after
    lives on 32 rows — 1-row totals broadcast, 32-row pseudo-value
    pass, 1-row finalize."""
    from etl__project_spark.datapipe.sampling import hash_bucket

    pur = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .filter(F.col("value").isNotNull())
        .select(
            hash_bucket(F.col("user_id"), 32, salt="jk").alias("g"),
            F.floor(F.col("value") * 10000 + F.lit(0.5))
            .cast("long")
            .alias("iu"),
        )
    )
    blocks = pur.groupBy("g").agg(
        F.sum("iu").alias("s_g"), F.count(F.lit(1)).alias("n_g")
    )
    tot = blocks.agg(
        F.sum("s_g").alias("s"),
        F.sum("n_g").alias("n"),
        F.count(F.lit(1)).alias("nb"),
    )
    loo = blocks.crossJoin(F.broadcast(tot)).select(
        "s",
        "n",
        "nb",
        F.floor(
            (F.col("s") - F.col("s_g")).cast("double")
            / (F.col("n") - F.col("n_g")).cast("double")
            * 100
            + F.lit(0.5)
        )
        .cast("long")
        .alias("ql"),
    )

    def dec(c):
        return c.cast("decimal(18,0)")

    agg = loo.groupBy().agg(
        F.first("s").alias("s"),
        F.first("n").alias("n"),
        F.first("nb").alias("nb"),
        F.sum("ql").cast("decimal(38,0)").alias("sq"),
        F.sum(dec(F.col("ql")) * dec(F.col("ql"))).cast("decimal(38,0)").alias("sqq"),
    )
    sd, nd = F.col("s").cast("double"), F.col("n").cast("double")
    nbd = F.col("nb").cast("double")
    sqd, sqqd = F.col("sq").cast("double"), F.col("sqq").cast("double")
    se_ql = F.sqrt(
        (F.col("nb") - 1).cast("double") / nbd * (sqqd - sqd * sqd / nbd)
    )
    theta_ql = sd / nd * 100.0

    def q4(c):
        return F.floor(c / 1000000.0 * 10000 + F.lit(0.5)) / 10000.0

    return agg.select(
        F.col("n").alias("n_purchases"),
        F.col("nb").alias("n_blocks"),
        (F.floor(sd / nd / 10000.0 * 10000 + F.lit(0.5)) / 10000.0).alias(
            "mean_value"
        ),
        q4(se_ql).alias("se_value"),
        q4(theta_ql - 1.96 * se_ql).alias("ci_lo"),
        q4(theta_ql + 1.96 * se_ql).alias("ci_hi"),
    )


@query(
    "ev_cohort_ltv",
    """WITH base AS (
  SELECT user_id, event_type, value, ts::DATE AS day,
         min(ts::DATE) OVER (PARTITION BY user_id) AS first_day
  FROM events
),
cells AS (
  SELECT strftime(date_trunc('week', first_day), '%Y-%m-%d') AS cohort_week,
         (date_diff('day', first_day, day) // 7)::BIGINT AS age_week,
         user_id,
         CASE WHEN event_type = 'purchase' AND value IS NOT NULL
              THEN CAST(floor(value * 10000 + 0.5) AS BIGINT)
              ELSE 0 END AS rev_micro
  FROM base
),
rev AS (
  SELECT cohort_week, age_week, sum(rev_micro)::BIGINT AS rev_micro
  FROM cells GROUP BY cohort_week, age_week
),
users AS (
  SELECT cohort_week, count(DISTINCT user_id)::BIGINT AS cohort_users
  FROM cells GROUP BY cohort_week
)
SELECT r.cohort_week, r.age_week, u.cohort_users, r.rev_micro,
       floor(sum(r.rev_micro) OVER (PARTITION BY r.cohort_week
                                    ORDER BY r.age_week
                                    ROWS UNBOUNDED PRECEDING)::DOUBLE
             / u.cohort_users + 0.5) / 10000.0 AS cum_ltv
FROM rev r JOIN users u USING (cohort_week)""",
)
def ev_cohort_ltv(spark, sf_dir):
    """Cohort LTV triangle: cumulative revenue per user by signup-week
    cohort and weeks-since-signup — the monetized face of
    ``ev_retention``'s activity grid (retention counts who came back;
    LTV prices what they did). Each cohort's cum_ltv row at age a is
    the number a growth team reads off to compare acquisition vintages
    at equal age.

    Exactness: revenue is micro-unit BIGINT (the ``ev_rfm``
    quantization), so every cell and every running sum is exact; the
    single divide by cohort size floor-quantizes to 4 dp.

    Distributed shape: first_day comes from a min-over-user window —
    ONE exchange on user_id, reused in place of a self-join back to
    events (min is computed where the rows land, no second scan);
    the triangle is a (cohorts x ages)-key aggregate — calendar-
    bounded; the running sum partitions BY COHORT (parallel across
    cohorts, <= |ages| rows each — never single-partition); cohort
    sizes broadcast back."""
    ev = load_table(spark, sf_dir, "events")
    wu = Window.partitionBy("user_id")
    base = ev.select(
        "user_id",
        "event_type",
        "value",
        F.to_date("ts").alias("day"),
    ).withColumn("first_day", F.min("day").over(wu))
    cells = base.select(
        F.date_format(F.date_trunc("week", "first_day"), "yyyy-MM-dd").alias(
            "cohort_week"
        ),
        (F.datediff("day", "first_day") / 7).cast("long").alias("age_week"),
        "user_id",
        F.when(
            (F.col("event_type") == "purchase") & F.col("value").isNotNull(),
            F.floor(F.col("value") * 10000 + F.lit(0.5)),
        )
        .otherwise(0)
        .cast("long")
        .alias("rev_micro"),
    )
    rev = cells.groupBy("cohort_week", "age_week").agg(
        F.sum("rev_micro").cast("long").alias("rev_micro")
    )
    users = cells.groupBy("cohort_week").agg(
        F.countDistinct("user_id").alias("cohort_users")
    )
    wc = Window.partitionBy("cohort_week").orderBy("age_week").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        rev.withColumn("cum_micro", F.sum("rev_micro").over(wc))
        .join(F.broadcast(users), "cohort_week")
        .select(
            "cohort_week",
            "age_week",
            "cohort_users",
            "rev_micro",
            (
                F.floor(
                    F.col("cum_micro").cast("double") / F.col("cohort_users")
                    + F.lit(0.5)
                )
                / 10000.0
            ).alias("cum_ltv"),
        )
    )


@query(
    "ev_mann_kendall",
    """WITH daily AS (
  SELECT ts::DATE AS day, count(*)::BIGINT AS x FROM events GROUP BY day
),
s AS (
  SELECT sum(CASE WHEN b.x > a.x THEN 1
                  WHEN b.x < a.x THEN -1 ELSE 0 END)::BIGINT AS s_stat
  FROM daily a JOIN daily b ON b.day > a.day
),
n AS (SELECT count(*)::BIGINT AS n_days FROM daily),
ties AS (
  SELECT coalesce(sum(t * (t - 1) * (2 * t + 5)), 0)::BIGINT AS tie_term
  FROM (SELECT count(*)::BIGINT AS t FROM daily GROUP BY x) g
  WHERE t > 1
),
w AS (
  SELECT s.s_stat, n.n_days,
         (n.n_days * (n.n_days - 1) * (2 * n.n_days + 5) - ties.tie_term)
             ::BIGINT AS var18
  FROM s CROSS JOIN n CROSS JOIN ties
)
SELECT n_days, s_stat,
       CASE WHEN var18 = 0 THEN 0.0
            ELSE floor((CASE WHEN s_stat > 0 THEN s_stat - 1
                             WHEN s_stat < 0 THEN s_stat + 1
                             ELSE 0 END)::DOUBLE
                       / sqrt(var18::DOUBLE / 18.0) * 10000 + 0.5) / 10000.0
            END AS z_score,
       (var18 <> 0 AND
        abs(floor((CASE WHEN s_stat > 0 THEN s_stat - 1
                        WHEN s_stat < 0 THEN s_stat + 1
                        ELSE 0 END)::DOUBLE
                  / sqrt(var18::DOUBLE / 18.0) * 10000 + 0.5)) > 19600)
           AS trend_05
FROM w""",
)
def ev_mann_kendall(spark, sf_dir):
    """Mann-Kendall trend test on the daily event-count series — the
    nonparametric "is traffic actually trending?" answer that
    completes the series-statistics family: ``ev_cusum_changepoint``
    finds WHERE the level shifted, ``ev_autocorr_daily`` finds
    periodicity, this decides whether a monotone trend exists at all
    (robust to outlier days and any monotone transform — it reads only
    pairwise ORDER, the reason operations teams prefer it over fitting
    a slope to spiky traffic). S = sum over day pairs of
    sign(x_j - x_i), tie-corrected variance, continuity-corrected z.

    Everything is exact integers — S, n(n-1)(2n+5), the tie term — on
    both engines; the single divide+sqrt is floor-quantized 4 dp and
    the 0.05 decision compares the QUANTIZED integer against 19600.

    Distributed shape: one daily aggregate (the shared
    ``ev_ewma_anomaly`` class); the pairwise sum is a calendar-bounded
    self-join (<= |days|^2 pairs — ~900 at fixture scale — via
    broadcast), and ties come from a |distinct counts|-key aggregate.
    On a 100 TB stream the daily series is maintained at ingest
    (``stream_daily_counts``), so the trend test never rescans
    events."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("x")
    )
    daily = daily.localCheckpoint(eager=True)
    a = daily.select(F.col("day").alias("da"), F.col("x").alias("xa"))
    b = daily.select(F.col("day").alias("db"), F.col("x").alias("xb"))
    s = a.join(F.broadcast(b), F.col("db") > F.col("da")).agg(
        F.sum(
            F.when(F.col("xb") > F.col("xa"), 1)
            .when(F.col("xb") < F.col("xa"), -1)
            .otherwise(0)
        )
        .cast("long")
        .alias("s_stat")
    )
    n = daily.agg(F.count(F.lit(1)).alias("n_days"))
    t = F.col("t")
    ties = (
        daily.groupBy("x")
        .agg(F.count(F.lit(1)).alias("t"))
        .filter(t > 1)
        .agg(
            F.coalesce(F.sum(t * (t - 1) * (2 * t + 5)), F.lit(0))
            .cast("long")
            .alias("tie_term")
        )
    )
    nd = F.col("n_days")
    w = s.crossJoin(F.broadcast(n)).crossJoin(F.broadcast(ties)).select(
        "s_stat",
        "n_days",
        (nd * (nd - 1) * (2 * nd + 5) - F.col("tie_term"))
        .cast("long")
        .alias("var18"),
    )
    s_cc = (
        F.when(F.col("s_stat") > 0, F.col("s_stat") - 1)
        .when(F.col("s_stat") < 0, F.col("s_stat") + 1)
        .otherwise(0)
    )
    z_scaled = F.floor(
        s_cc.cast("double")
        / F.sqrt(F.col("var18").cast("double") / 18.0)
        * 10000
        + F.lit(0.5)
    )
    return w.select(
        "n_days",
        "s_stat",
        F.when(F.col("var18") == 0, F.lit(0.0))
        .otherwise(z_scaled / 10000.0)
        .alias("z_score"),
        ((F.col("var18") != 0) & (F.abs(z_scaled) > 19600)).alias("trend_05"),
    )


@query(
    "ev_k_anonymity",
    """WITH qi AS (
  SELECT (dayofweek(ts) + 1)::BIGINT AS dow,
         (hour(ts) // 6)::BIGINT AS hour_band,
         event_type,
         CASE WHEN value IS NULL THEN -1
              ELSE (floor(value / 50))::BIGINT END AS value_band,
         count(*)::BIGINT AS n
  FROM events
  GROUP BY 1, 2, 3, 4
)
SELECT count(*)::BIGINT AS n_groups,
       sum(n)::BIGINT AS n_rows,
       min(n)::BIGINT AS k_min,
       sum(CASE WHEN n < 5 THEN n ELSE 0 END)::BIGINT AS rows_below_5,
       floor(sum(CASE WHEN n < 5 THEN n ELSE 0 END)::DOUBLE
             / sum(n)::DOUBLE * 10000 + 0.5) / 10000.0 AS suppress_frac
FROM qi""",
)
def ev_k_anonymity(spark, sf_dir):
    """k-anonymity audit over a quasi-identifier tuple — the privacy
    gate a training-data release runs next to ``doc_pii_scrub``'s
    content scrub: PII regexes remove direct identifiers, this
    measures RE-identification risk from indirect ones. Rows group by
    (weekday, 6-hour band, event type, value band); k_min is the
    smallest group (the textbook k), rows_below_5 and suppress_frac
    price the k>=5 release policy (suppress or generalize those rows).

    Everything is one hash aggregate over derived integer bands plus a
    constant-size finalize — exact BIGINTs except the one quantized
    fraction. At 100 TB the QI aggregate is the same shuffle class as
    any rollup; no per-user state, no windows. Gate and banding are
    ``operators/quality.py:k_anonymity_gate`` / ``qi_band_counts`` —
    the same coded path the streaming maintenance serves from the
    incrementally-folded QI table (``stream_qi_counts``), so a release
    decision is always current without re-scanning history."""
    from etl__project_spark.operators.quality import (
        k_anonymity_gate,
        qi_band_counts,
    )

    return k_anonymity_gate(
        qi_band_counts(load_table(spark, sf_dir, "events")), k=5
    )


@query(
    "ev_l_diversity",
    """WITH qi AS (
  SELECT (dayofweek(ts) + 1)::BIGINT AS dow,
         (hour(ts) // 6)::BIGINT AS hour_band,
         event_type,
         count(DISTINCT CASE WHEN value IS NULL THEN -1
                             ELSE (floor(value / 50))::BIGINT END)::BIGINT
             AS l,
         count(*)::BIGINT AS n
  FROM events
  GROUP BY 1, 2, 3
)
SELECT count(*)::BIGINT AS n_groups,
       min(l)::BIGINT AS l_min,
       sum(CASE WHEN l < 2 THEN 1 ELSE 0 END)::BIGINT AS groups_below_2,
       sum(CASE WHEN l < 2 THEN n ELSE 0 END)::BIGINT AS rows_below_2,
       floor(sum(CASE WHEN l < 2 THEN n ELSE 0 END)::DOUBLE
             / sum(n)::DOUBLE * 10000 + 0.5) / 10000.0 AS risk_frac
FROM qi""",
)
def ev_l_diversity(spark, sf_dir):
    """l-diversity audit — ``ev_k_anonymity``'s companion: a large
    group is still an attribute-disclosure risk if everyone in it
    shares the SAME sensitive value (k-anonymity says you can't be
    singled out; l-diversity says the group doesn't give your
    attribute away anyway). Here the quasi-identifiers are (weekday,
    6-hour band, event type) and the sensitive attribute is the spend
    band: l = distinct sensitive values per QI group, l_min the
    release gate, rows in l < 2 groups the suppression candidates.

    Served from the same (QI, band)-grain count table as
    ``ev_k_anonymity`` (the band is part of the maintained grain, so l
    per group is a ROW COUNT — no distinct over raw events, no
    re-scan): gate is ``operators/quality.py:l_diversity_gate``,
    shared with the streaming face ``read_l_diversity``. The
    documented scale swap for ultra-wide QI spaces is the keyed HLL
    register path ``stream_column_stats`` already maintains."""
    from etl__project_spark.operators.quality import (
        l_diversity_gate,
        qi_band_counts,
    )

    return l_diversity_gate(
        qi_band_counts(load_table(spark, sf_dir, "events")), l_min=2
    )


@query(
    "ev_forecast_backtest",
    """WITH daily AS (
  SELECT ts::DATE AS day, count(*)::BIGINT AS x FROM events GROUP BY day
),
joined AS (
  SELECT a.day, a.x, b.x AS yhat
  FROM daily a JOIN daily b ON a.day = b.day + 7
),
err AS (
  SELECT count(*)::BIGINT AS n_days,
         sum(abs(x - yhat))::BIGINT AS abs_err,
         sum(x - yhat)::BIGINT AS bias_sum,
         sum(x)::BIGINT AS actual_sum,
         sum(CASE WHEN x > 0
                  THEN abs(x - yhat) * 1000000 // x
                  ELSE 0 END)::BIGINT AS ape_micro
  FROM joined
)
SELECT n_days, abs_err,
       floor(ape_micro::DOUBLE / n_days::DOUBLE / 1000000.0 * 10000 + 0.5)
           / 10000.0 AS mape,
       floor(abs_err::DOUBLE / actual_sum::DOUBLE * 10000 + 0.5) / 10000.0
           AS wape,
       floor(bias_sum::DOUBLE / n_days::DOUBLE * 10000 + 0.5) / 10000.0
           AS mean_bias
FROM err""",
)
def ev_forecast_backtest(spark, sf_dir):
    """Seasonal-naive forecast backtest: predict each day's event count
    as the count 7 days earlier, then score MAPE / WAPE / mean bias
    over every day with a week of history — the BASELINE every
    forecasting deployment must publish (a model that can't beat
    seasonal-naive isn't a model), completing the series family's arc:
    monitor (EWMA/CUSUM) → characterize (autocorr/weekday/trend) →
    forecast. ``ev_autocorr_daily``'s lag-7 spike is exactly the
    signal this baseline exploits.

    Exactness: per-day absolute percentage errors are integer-floored
    micro-units (abs_err * 1e6 DIV actual — integer division on exact
    BIGINTs, no float per-row), so every aggregate is exact and each
    output does ONE quantized floating divide.

    Distributed shape: one daily aggregate (maintained at ingest by
    ``stream_daily_counts``, so the backtest never rescans events);
    the lag join is the calendar-bounded ``ev_autocorr_daily``
    equi-join; the scorecard is a 1-row finalize."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("x")
    )
    daily = daily.localCheckpoint(eager=True)
    a = daily.select(F.col("day").alias("da"), F.col("x").alias("x"))
    b = daily.select(F.date_add(F.col("day"), 7).alias("db"), F.col("x").alias("yhat"))
    joined = a.join(F.broadcast(b), F.col("da") == F.col("db"))
    x, yhat = F.col("x"), F.col("yhat")
    # exact integer DIV (matches the oracle's //): (a - a mod x) / x
    ae_scaled = (F.abs(x - yhat) * 1000000).cast("long")
    ape = (ae_scaled - F.pmod(ae_scaled, x)) / x
    err = joined.agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum(F.abs(x - yhat)).cast("long").alias("abs_err"),
        F.sum(x - yhat).cast("long").alias("bias_sum"),
        F.sum(x).cast("long").alias("actual_sum"),
        F.sum(F.when(x > 0, ape).otherwise(0)).cast("long").alias("ape_micro"),
    )
    nd = F.col("n_days").cast("double")
    return err.select(
        "n_days",
        "abs_err",
        (
            F.floor(
                F.col("ape_micro").cast("double") / nd / 1000000.0 * 10000
                + F.lit(0.5)
            )
            / 10000.0
        ).alias("mape"),
        (
            F.floor(
                F.col("abs_err").cast("double")
                / F.col("actual_sum").cast("double")
                * 10000
                + F.lit(0.5)
            )
            / 10000.0
        ).alias("wape"),
        (
            F.floor(
                F.col("bias_sum").cast("double") / nd * 10000 + F.lit(0.5)
            )
            / 10000.0
        ).alias("mean_bias"),
    )


@query(
    "ev_power_mde",
    """WITH assign AS (
  SELECT user_id,
         ('0x' || substr(md5(user_id::VARCHAR || 'ab'), 1, 15))::BIGINT % 2
             AS arm,
         max(CASE WHEN event_type = 'purchase' AND value > 180
                  THEN 1 ELSE 0 END) AS converted
  FROM events GROUP BY user_id
),
arms AS (
  SELECT arm, count(*)::BIGINT AS n_users,
         sum(converted)::BIGINT AS n_converted
  FROM assign GROUP BY arm
),
w AS (
  SELECT max(CASE WHEN arm = 0 THEN n_users END)::BIGINT AS n0,
         max(CASE WHEN arm = 1 THEN n_users END)::BIGINT AS n1,
         sum(n_converted)::BIGINT AS c, sum(n_users)::BIGINT AS n
  FROM arms
)
SELECT n0, n1,
       floor(c::DOUBLE / n::DOUBLE * 10000 + 0.5) / 10000.0 AS base_rate,
       floor(2.8016 * sqrt((c::DOUBLE / n::DOUBLE)
                           * (1.0 - c::DOUBLE / n::DOUBLE)
                           * (1.0 / n0::DOUBLE + 1.0 / n1::DOUBLE))
             * 10000 + 0.5) / 10000.0 AS mde_abs,
       floor(2.8016 * sqrt((c::DOUBLE / n::DOUBLE)
                           * (1.0 - c::DOUBLE / n::DOUBLE)
                           * (1.0 / n0::DOUBLE + 1.0 / n1::DOUBLE))
             / (c::DOUBLE / n::DOUBLE) * 10000 + 0.5) / 10000.0 AS mde_rel
FROM w""",
)
def ev_power_mde(spark, sf_dir):
    """Minimum detectable effect for the running experiment — the
    power-analysis readout that belongs NEXT TO ``ev_ab_test_zscore``'s
    verdict: with these arm sizes and this baseline big-ticket
    conversion rate, the smallest absolute/relative lift a two-sided
    alpha = 0.05, power = 0.80 test can reliably detect is
    (z_{0.975} + z_{0.80}) * SE = 2.8016 * sqrt(p(1-p)(1/n0 + 1/n1)).
    An experimenter reads mde_rel BEFORE trusting a null z-test result
    — "not significant" means nothing if the detectable lift is 40%.

    Same one user-keyed aggregate as the z-test (identical hash
    assignment, so the two readouts describe the same experiment);
    everything after is a 2-row rollup and one quantized formula with
    the shared 2.8016 literal on both engines."""
    from etl__project_spark.datapipe.sampling import hash_bucket

    ev = load_table(spark, sf_dir, "events")
    assign = ev.groupBy("user_id").agg(
        F.max(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("value") > 180), 1
            ).otherwise(0)
        ).alias("converted")
    ).select(
        hash_bucket(F.col("user_id"), 2, salt="ab").alias("arm"), "converted"
    )
    arms = assign.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("converted").cast("long").alias("n_converted"),
    )
    w = arms.agg(
        F.max(F.when(F.col("arm") == 0, F.col("n_users"))).alias("n0"),
        F.max(F.when(F.col("arm") == 1, F.col("n_users"))).alias("n1"),
        F.sum("n_converted").alias("c"),
        F.sum("n_users").alias("n"),
    )
    p = F.col("c").cast("double") / F.col("n").cast("double")
    se = F.sqrt(
        p
        * (F.lit(1.0) - p)
        * (
            F.lit(1.0) / F.col("n0").cast("double")
            + F.lit(1.0) / F.col("n1").cast("double")
        )
    )

    def q4(c):
        return F.floor(c * 10000 + F.lit(0.5)) / 10000.0

    return w.select(
        "n0",
        "n1",
        q4(p).alias("base_rate"),
        q4(F.lit(2.8016) * se).alias("mde_abs"),
        q4(F.lit(2.8016) * se / p).alias("mde_rel"),
    )


@query(
    "ev_bot_detection",
    """WITH iat AS (
  SELECT user_id,
         epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id
                                                ORDER BY epoch_us(ts),
                                                         event_id) AS d
  FROM events
),
usr AS (
  SELECT user_id, count(*)::BIGINT AS n_gaps,
         sum(d)::BIGINT AS span_us,
         sum(d::HUGEINT * d)::HUGEINT AS d2
  FROM iat WHERE d IS NOT NULL
  GROUP BY user_id HAVING count(*) >= 19
),
scored AS (
  SELECT user_id, n_gaps + 1 AS n_events, span_us,
         (CASE WHEN span_us = 0 THEN NULL ELSE
          floor((n_gaps + 1)::DOUBLE
               / (span_us::DOUBLE / 60000000.0) * 10000 + 0.5) / 10000.0 END)
             AS events_per_min,
         (CASE WHEN span_us = 0 THEN NULL ELSE
          floor(sqrt(greatest(d2::DOUBLE / n_gaps::DOUBLE
                             - (span_us::DOUBLE / n_gaps::DOUBLE)
                               * (span_us::DOUBLE / n_gaps::DOUBLE), 0.0))
               / (span_us::DOUBLE / n_gaps::DOUBLE) * 10000 + 0.5) / 10000.0 END)
             AS iat_cv
  FROM usr
)
SELECT user_id, n_events, events_per_min, iat_cv,
       (CASE WHEN span_us = 0 THEN true
             ELSE (events_per_min > 0.5 OR iat_cv < 0.5) END) AS bot_flag
FROM scored""",
)
def ev_bot_detection(spark, sf_dir):
    """Behavioral bot screen — the abuse-filtering operator a
    training-data pipeline runs over clickstream sources before the
    content filters see anything: per user (min 20 events), event RATE
    (events/min over the active span) and inter-arrival-time
    REGULARITY (coefficient of variation of consecutive gaps — humans
    are bursty, cv >> 0.5; schedulers and replay scripts are
    metronomic, cv -> 0). Flag = too fast OR too regular. The two
    simplest signals that survive at 100 TB because they need only
    per-user sufficient statistics.

    Exactness: gaps are exact epoch MICROSECOND integers from one
    per-user ordered window (event_id tiebreak pins equal timestamps);
    n, sum(d), sum(d^2) are exact wide-integer aggregates, so the
    cv/rate formulas do their floating arithmetic once over exact
    sums, floor-quantized 4 dp; the flag compares QUANTIZED values.
    Variance is clamped at 0 (catastrophic-cancellation guard for
    perfectly regular synthetic gaps).

    Distributed shape: one user-partitioned lag window + one user
    aggregate — a single exchange on user_id; no global stage, no
    join. Output is the per-user scorecard (bounded by |users|)."""
    return _bot_screen(load_table(spark, sf_dir, "events"))


@query(
    "ev_t_closeness",
    """WITH qi AS (
  SELECT (dayofweek(ts) + 1)::BIGINT AS dow,
         (hour(ts) // 6)::BIGINT AS hour_band,
         event_type,
         (CASE WHEN value IS NULL THEN -1
               ELSE floor(value / 50) END)::BIGINT AS value_band,
         count(*)::BIGINT AS n
  FROM events GROUP BY 1, 2, 3, 4
),
band_tot AS (SELECT value_band, sum(n)::BIGINT AS nb FROM qi GROUP BY value_band),
grand AS (SELECT sum(n)::BIGINT AS nt FROM qi),
grp AS (
  SELECT dow, hour_band, event_type, sum(n)::BIGINT AS n_g
  FROM qi GROUP BY 1, 2, 3
),
per_group AS (
  SELECT q.dow, q.hour_band, q.event_type,
         min(g.n_g)::BIGINT AS n_g,
         floor(sum(floor(greatest(q.n::DOUBLE / g.n_g::DOUBLE
                                  - b.nb::DOUBLE / grand.nt::DOUBLE, 0.0)
                         * 100000000.0 + 0.5)::BIGINT)::DOUBLE
               / 10000.0 + 0.5) / 10000.0 AS tvd
  FROM qi q
  JOIN band_tot b USING (value_band)
  JOIN grp g ON q.dow = g.dow AND q.hour_band = g.hour_band
            AND q.event_type = g.event_type
  CROSS JOIN grand
  GROUP BY 1, 2, 3
)
SELECT count(*)::BIGINT AS n_groups,
       max(tvd) AS t_max,
       sum(CASE WHEN tvd > 0.5 THEN 1 ELSE 0 END)::BIGINT AS groups_above_t,
       sum(CASE WHEN tvd > 0.5 THEN n_g ELSE 0 END)::BIGINT AS rows_above_t,
       floor(sum(CASE WHEN tvd > 0.5 THEN n_g ELSE 0 END)::DOUBLE
             / sum(n_g)::DOUBLE * 10000 + 0.5) / 10000.0 AS risk_frac
FROM per_group""",
)
def ev_t_closeness(spark, sf_dir):
    """t-closeness audit (Li, Li & Venkatasubramanian, ICDE 2007) —
    completes the release-gate trio: ``ev_k_anonymity`` (can you be
    singled out), ``ev_l_diversity`` (does the group have one sensitive
    value), and now DISTRIBUTIONAL skew (a big, diverse group still
    leaks if its spend-band mix deviates far from the corpus). Distance
    = total variation between group and global band distributions,
    computed as the sum of positive deviations (equal to TVD since both
    sum to 1 — and absent bands contribute nothing, so the audit runs
    entirely on the same (QI, band)-grain count table the streaming
    path maintains at ingest).

    Distributed shape: everything downstream of ``qi_band_counts``'s
    one event-sized aggregate is QI-domain-bounded — band totals and
    the grand total broadcast back, one bounded aggregate per group,
    1-row finalize. Shared gate: ``operators/quality.py:
    t_closeness_gate`` (also servable from ``read_qi_counts``)."""
    from etl__project_spark.operators.quality import (
        qi_band_counts,
        t_closeness_gate,
    )

    return t_closeness_gate(
        qi_band_counts(load_table(spark, sf_dir, "events")), t=0.5
    )


@query(
    "ev_markov_eval",
    """WITH seq AS (
  SELECT user_id, epoch_us(ts) AS us, event_type AS cur,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
             AS nxt
  FROM events
),
mid AS (SELECT (min(us) + max(us)) // 2 AS m FROM seq),
train AS (
  SELECT cur, nxt, count(*)::BIGINT AS n
  FROM seq, mid WHERE nxt IS NOT NULL AND us <= m
  GROUP BY cur, nxt
),
pred AS (
  SELECT cur, nxt AS pred FROM (
    SELECT cur, nxt,
           row_number() OVER (PARTITION BY cur ORDER BY n DESC, nxt) AS rn
    FROM train
  ) WHERE rn = 1
),
test AS (
  SELECT s.cur, s.nxt, p.pred
  FROM seq s CROSS JOIN mid LEFT JOIN pred p ON s.cur = p.cur
  WHERE s.nxt IS NOT NULL AND s.us > mid.m
)
SELECT count(*)::BIGINT AS n_test,
       sum(CASE WHEN nxt = pred THEN 1 ELSE 0 END)::BIGINT AS n_correct,
       sum(CASE WHEN pred IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_covered,
       floor(sum(CASE WHEN nxt = pred THEN 1 ELSE 0 END)::DOUBLE
             / count(*)::DOUBLE * 10000 + 0.5) / 10000.0 AS top1_accuracy
FROM test""",
)
def ev_markov_eval(spark, sf_dir):
    """In-engine model evaluation: train the first-order Markov
    next-event predictor on the FIRST HALF of the event timeline
    (per-state argmax of ``ev_transition_matrix``'s counts), score
    top-1 accuracy on the SECOND half — the time-split train/eval loop
    a clickstream model actually ships through, run entirely as
    relational algebra. Output: test transitions, correct predictions,
    covered transitions (current state seen in training), accuracy.

    Distributed shape: the ONE user-keyed exchange feeds the lead
    window (shared with ``ev_transition_matrix``); the timeline
    midpoint is a 1-row broadcast; training counts and the per-state
    argmax live on the |types|²-bounded table; scoring joins the test
    stream against the ≤|types|-row broadcast prediction map and
    finalizes one row. Unseen-state test transitions score as misses
    (pred NULL ≠ any type) — the honest accounting for a cold-start
    state. At 100 TB the only data-sized stages are the window and
    the final scan-side scoring join."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # midpoint over ALL events (the oracle's seq CTE includes each
    # user's last event; only train/test filter nxt IS NOT NULL)
    allus = ev.select(F.unix_micros("ts").alias("us"))
    seq = ev.select(
        F.unix_micros("ts").alias("us"),
        F.col("event_type").alias("cur"),
        F.lead("event_type").over(w).alias("nxt"),
    ).filter(F.col("nxt").isNotNull()).localCheckpoint()
    mid = allus.agg(
        (
            (F.min("us") + F.max("us")) - F.pmod(F.min("us") + F.max("us"), 2)
        ).alias("m2")
    ).select(F.expr("m2 div 2").alias("m"))  # exact integer floor-div
    train = (
        seq.crossJoin(F.broadcast(mid))
        .filter(F.col("us") <= F.col("m"))
        .groupBy("cur", "nxt")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w_arg = Window.partitionBy("cur").orderBy(F.desc("n"), F.asc("nxt"))
    pred = (
        train.withColumn("rn", F.row_number().over(w_arg))
        .filter(F.col("rn") == 1)
        .select("cur", F.col("nxt").alias("pred"))
    )
    test = (
        seq.crossJoin(F.broadcast(mid))
        .filter(F.col("us") > F.col("m"))
        .join(F.broadcast(pred), "cur", "left")
    )
    hit = F.when(F.col("nxt") == F.col("pred"), 1).otherwise(0)
    return test.agg(
        F.count(F.lit(1)).alias("n_test"),
        F.sum(hit).cast("long").alias("n_correct"),
        F.sum(F.when(F.col("pred").isNotNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_covered"),
        (
            F.floor(
                F.sum(hit).cast("double") / F.count(F.lit(1)).cast("double")
                * 10000
                + F.lit(0.5)
            )
            / 10000.0
        ).alias("top1_accuracy"),
    )


@query(
    "ev_pipeline_e2e",
    """WITH iat AS (
  SELECT user_id,
         epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id
                                                ORDER BY epoch_us(ts),
                                                         event_id) AS d
  FROM events
),
usr AS (
  SELECT user_id, count(*)::BIGINT AS n_gaps,
         sum(d)::BIGINT AS span_us,
         sum(d::HUGEINT * d)::HUGEINT AS d2
  FROM iat WHERE d IS NOT NULL
  GROUP BY user_id HAVING count(*) >= 19
),
scored AS (
  SELECT user_id, span_us,
         (CASE WHEN span_us = 0 THEN NULL ELSE
          floor((n_gaps + 1)::DOUBLE
               / (span_us::DOUBLE / 60000000.0) * 10000 + 0.5) / 10000.0 END)
             AS events_per_min,
         (CASE WHEN span_us = 0 THEN NULL ELSE
          floor(sqrt(greatest(d2::DOUBLE / n_gaps::DOUBLE
                             - (span_us::DOUBLE / n_gaps::DOUBLE)
                               * (span_us::DOUBLE / n_gaps::DOUBLE), 0.0))
               / (span_us::DOUBLE / n_gaps::DOUBLE) * 10000 + 0.5) / 10000.0 END)
             AS iat_cv
  FROM usr
),
flagged AS (
  SELECT user_id FROM scored
  WHERE span_us = 0 OR events_per_min > 0.5 OR iat_cv < 0.5
),
kept AS (
  SELECT e.* FROM events e LEFT JOIN flagged f ON e.user_id = f.user_id
  WHERE f.user_id IS NULL
),
gaps AS (
  SELECT CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
                    OVER (PARTITION BY user_id ORDER BY ts, event_id)
                  > 1800000000 OR
                  lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                      IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM kept
),
s1 AS (
  SELECT user_id, ts, event_type,
         min(CASE WHEN event_type = 'signup' THEN ts END)
             OVER (PARTITION BY user_id) AS t1
  FROM kept
),
s2 AS (
  SELECT *, min(CASE WHEN event_type = 'view' AND ts > t1 THEN ts END)
                OVER (PARTITION BY user_id) AS t2 FROM s1
),
s3 AS (
  SELECT *, min(CASE WHEN event_type = 'click' AND ts > t2 THEN ts END)
                OVER (PARTITION BY user_id) AS t3 FROM s2
),
s4 AS (
  SELECT *, min(CASE WHEN event_type = 'purchase' AND ts > t3 THEN ts END)
                OVER (PARTITION BY user_id) AS t4 FROM s3
),
u AS (
  SELECT user_id, min(t1) AS t1, min(t2) AS t2, min(t3) AS t3, min(t4) AS t4
  FROM s4 GROUP BY user_id
),
c AS (
  SELECT count(t1)::BIGINT AS c1, count(t2)::BIGINT AS c2,
         count(t3)::BIGINT AS c3, count(t4)::BIGINT AS c4
  FROM u
)
SELECT 1::BIGINT AS stage, 'raw_events' AS metric,
       (SELECT count(*) FROM events)::BIGINT AS n
UNION ALL SELECT 2::BIGINT, 'flagged_users',
       (SELECT count(*) FROM flagged)::BIGINT
UNION ALL SELECT 3::BIGINT, 'kept_events',
       (SELECT count(*) FROM kept)::BIGINT
UNION ALL SELECT 4::BIGINT, 'sessions',
       (SELECT sum(new_session) FROM gaps)::BIGINT
UNION ALL SELECT 5::BIGINT, 'funnel_signup', c1 FROM c
UNION ALL SELECT 6::BIGINT, 'funnel_view', c2 FROM c
UNION ALL SELECT 7::BIGINT, 'funnel_click', c3 FROM c
UNION ALL SELECT 8::BIGINT, 'funnel_purchase', c4 FROM c
ORDER BY stage""",
)
def ev_pipeline_e2e(spark, sf_dir):
    """The event-intake pipeline composed end-to-end — completing the
    intake trio with ``doc_pipeline_e2e`` (text) and
    ``emb_pipeline_e2e`` (vectors): (1) GATE: drop every user the
    behavioral bot screen flags (shared ``_bot_screen`` — too fast or
    too metronomic); (2) SESSIONIZE the surviving events (30-min gap,
    the ``ev_sessionize`` definition); (3) FUNNEL the survivors
    through signup→view→click→purchase (shared ``_funnel_counts``);
    (4) an 8-row scorecard (raw events, flagged users, kept events,
    sessions, four funnel stages). The analytics a clickstream
    pipeline publishes AFTER abuse filtering — bot traffic would
    otherwise inflate every downstream number.

    Distributed shape: the bot scorecard and the anti-join gate are
    one user-keyed exchange + a users-bounded flag set; sessions and
    the funnel chain reuse ONE user-keyed exchange on the
    checkpointed kept stream (four stacked min windows + the lag
    window plan on the same partitioning); the scorecard is bounded
    1-row finalizes. Each stage shrinks the next stage's input — the
    composition property of the other two pipelines."""
    ev = load_table(spark, sf_dir, "events")
    flagged = (
        _bot_screen(ev)
        .filter(F.col("bot_flag"))
        .select("user_id")
        .localCheckpoint()
    )
    kept = ev.join(flagged, "user_id", "left_anti").localCheckpoint()
    wu = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lag_us = F.lag(F.unix_micros("ts")).over(wu)
    new_s = F.when(
        lag_us.isNull() | ((F.unix_micros("ts") - lag_us) > 1800 * 1_000_000), 1
    ).otherwise(0)
    n_sessions = kept.select(new_s.alias("s")).agg(
        F.sum("s").cast("long").alias("n")
    )

    def one(df, stage, name):
        return df.select(
            F.lit(stage).cast("long").alias("stage"),
            F.lit(name).alias("metric"),
            F.col("n"),
        )

    raw = one(ev.agg(F.count(F.lit(1)).alias("n")), 1, "raw_events")
    nf = one(flagged.agg(F.count(F.lit(1)).alias("n")), 2, "flagged_users")
    nk = one(kept.agg(F.count(F.lit(1)).alias("n")), 3, "kept_events")
    ns = one(n_sessions, 4, "sessions")
    fun = _funnel_counts(kept).selectExpr(
        "stack(4, 5L, 'funnel_signup', c1, 6L, 'funnel_view', c2,"
        " 7L, 'funnel_click', c3, 8L, 'funnel_purchase', c4)"
        " AS (stage, metric, n)"
    )
    return (
        raw.unionByName(nf)
        .unionByName(nk)
        .unionByName(ns)
        .unionByName(fun)
        .orderBy("stage")
    )


@query(
    "ev_rollup_cdc_minmax",
    """WITH post AS (
  SELECT event_type,
         CASE WHEN event_id % 10 = 3 THEN round(value, 2) + 1.00
              ELSE round(value, 2) END AS v
  FROM events WHERE event_id % 10 <> 7
)
SELECT event_type, count(*)::BIGINT AS n_events,
       round(sum(v::DECIMAL(18,2))::DOUBLE, 2) AS total_value,
       round(min(v::DECIMAL(18,2))::DOUBLE, 2) AS min_value,
       round(max(v::DECIMAL(18,2))::DOUBLE, 2) AS max_value
FROM post GROUP BY event_type""",
)
def ev_rollup_cdc_minmax(spark, sf_dir):
    """Min/max under retraction (VERDICT r6 #3) — the aggregates the
    signed spec deliberately excludes (``ev_rollup_cdc_incremental``
    documents why: deleting the extremum needs the runner-up, which
    merged partial state no longer holds). ``operators/rollup.py:
    merge_rollups_minmax_cdc`` keeps count/sum fully incremental
    through the ±1 algebra and RE-DERIVES min/max from the post-change
    base state for exactly the groups the CDC batch touches — the
    standard IVM split between self-maintainable and base-consulting
    aggregates. The churn here (values of event_id%10==3 updated
    +1.00, %10==7 deleted) removes per-type extrema wholesale, so the
    oracle hash-match against the one-shot post-CDC aggregate proves
    the re-derivation, not just the linear path; a property test
    additionally deletes the exact current min AND max of every group
    (``tests/test_fact.py``).

    Cost per refresh: the linear path's two bounded hash aggregates,
    plus one probe of the key-bucketed base state by the touched-key
    frame — O(batch + touched-group rows), never a full base rescan;
    untouched groups keep their stored extremes unread."""
    from etl__project_spark.operators import merge_rollups_minmax_cdc

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    m10 = F.col("event_id") % 10
    qv = F.round(F.col("value"), 2).cast("decimal(18,2)")
    existing = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(qv).alias("total"),
        F.min(qv).alias("vmin"),
        F.max(qv).alias("vmax"),
    )
    retractions = ev.filter(m10.isin(3, 7)).withColumn("sign", F.lit(-1))
    post_images = (
        ev.filter(m10 == 3)
        .withColumn("value", F.round(F.col("value"), 2) + F.lit(1.0))
        .withColumn("sign", F.lit(1))
    )
    delta_rows = retractions.unionByName(post_images)
    post_state = ev.filter(m10 != 7).withColumn(
        "value",
        F.when(m10 == 3, F.round(F.col("value"), 2) + F.lit(1.0)).otherwise(
            F.col("value")
        ),
    )
    merged = merge_rollups_minmax_cdc(
        existing, delta_rows, post_state, ["event_type"]
    )
    return merged.select(
        "event_type",
        F.col("n").alias("n_events"),
        F.round(F.col("total").cast("double"), 2).alias("total_value"),
        F.round(F.col("vmin").cast("double"), 2).alias("min_value"),
        F.round(F.col("vmax").cast("double"), 2).alias("max_value"),
    )


@query(
    "ev_scd2_multiversion",
    """WITH ordered AS (
  SELECT user_id, event_type, ts, event_id,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
             AS prev_type
  FROM events
),
starts AS (
  SELECT user_id, event_type, ts, event_id
  FROM ordered WHERE prev_type IS NULL OR prev_type <> event_type
),
chained AS (
  SELECT user_id, event_type, epoch_us(ts)::BIGINT AS start_ord,
         lead(epoch_us(ts)::BIGINT)
             OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_ord
  FROM starts
)
SELECT user_id, event_type, start_ord,
       coalesce(next_ord, 253402300800000000)::BIGINT AS end_ord,
       CASE WHEN next_ord IS NULL THEN 'Y' ELSE 'N' END AS current_flag
FROM chained""",
)
def ev_scd2_multiversion(spark, sf_dir):
    """SCD2 with intra-batch MULTI-versioning (VERDICT r6 gap #5) —
    ``scd2_upsert`` collapses a batch to one winner per key, which the
    reference's nightly loads never notice (summary.pdf p.8 loads one
    version per day) but a CDC-grade feed does: here the whole events
    table arrives as ONE batch of per-user profile changes (attr =
    event_type, effective ordinal = epoch micros, ties by event_id)
    and ``operators/dims.py:scd2_upsert_multi`` must emit EVERY
    distinct consecutive state as its own half-open validity interval
    [start_ord, end_ord), exactly one current row per user.
    Consecutive duplicates collapse (a repeat is a no-op, not a
    version); the oracle is the pure-SQL window form of the same
    chaining, so the hash match proves dedup, interval chaining, and
    current-flag placement row-for-row. Surrogate keys are excluded
    from the comparison frame (assignment order is pinned by pytest,
    not the oracle).

    Scale shape: two user-keyed window stages over the BATCH plus the
    dense-id range-partition path — the dim side (empty here) is only
    ever probed by touched keys, never re-windowed."""
    from etl__project_spark.operators import scd2_upsert_multi

    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.unix_micros("ts").alias("ord_us"),
        "event_id",
    )
    dim0 = spark.createDataFrame(
        [],
        "skey long, user_id long, event_type string, current_flag string, "
        "start_ord long, end_ord long",
    )
    out = scd2_upsert_multi(
        dim0,
        ev,
        natural_key="user_id",
        attr_cols=["event_type"],
        skey_col="skey",
        order_col="ord_us",
        tiebreak_cols=["event_id"],
    )
    return out.select(
        "user_id", "event_type", "start_ord", "end_ord", "current_flag"
    )


@query(
    "ev_rollup_cdc_distinct",
    """WITH post AS (
  SELECT event_type,
         CASE WHEN event_id % 10 = 3 THEN user_id + 1000000
              ELSE user_id END AS u
  FROM events WHERE event_id % 10 <> 7
)
SELECT event_type, count(DISTINCT u)::BIGINT AS n_users
FROM post GROUP BY event_type""",
)
def ev_rollup_cdc_distinct(spark, sf_dir):
    """COUNT(DISTINCT) under retraction — the third classically
    non-self-maintainable aggregate, completing the set with min/max
    (``ev_rollup_cdc_minmax``): a merged distinct count cannot absorb
    a delete (was that the value's last occurrence?) and HLL sketches
    are strictly insert-only. ``operators/rollup.py:
    partial_distinct_signed`` keeps the state one grain finer — signed
    multiplicity per (event_type, user_id) — so deletes decrement,
    values at net 0 vanish, and the distinct count is a row count over
    live state. The churn (event_id%10==3 re-attributed to a shifted
    user id, %10==7 deleted) changes per-type distinct-user sets in
    both directions; the oracle is the one-shot COUNT(DISTINCT) over
    post-CDC state, so the hash match proves last-occurrence handling.

    Cost shape: two (group, value)-keyed hash aggregates (batch
    partial + merge) and a group-keyed finalize — O(batch + touched
    values) per refresh; state is O(live distinct values), the
    documented price of retractable distinct counts, bucketed on the
    group key at scale."""
    from etl__project_spark.operators import (
        finalize_distinct,
        merge_distinct_signed,
        partial_distinct_signed,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "user_id"
    )
    m10 = F.col("event_id") % 10
    state = partial_distinct_signed(
        ev.withColumn("sign", F.lit(1)), ["event_type"], "user_id"
    )
    retractions = ev.filter(m10.isin(3, 7)).withColumn("sign", F.lit(-1))
    post_images = (
        ev.filter(m10 == 3)
        .withColumn("user_id", F.col("user_id") + F.lit(1000000))
        .withColumn("sign", F.lit(1))
    )
    delta = partial_distinct_signed(
        retractions.unionByName(post_images), ["event_type"], "user_id"
    )
    merged = merge_distinct_signed(state, delta, ["event_type"], "user_id")
    return finalize_distinct(merged, ["event_type"]).select(
        "event_type", F.col("n_distinct").alias("n_users")
    )


@query(
    "ev_rollup_cdc_variance",
    """WITH post AS (
  SELECT event_type,
         CAST(floor(round(value, 2) * 100 + 0.5) AS BIGINT)
         + CASE WHEN event_id % 10 = 3 THEN 100 ELSE 0 END AS c
  FROM events WHERE event_id % 10 <> 7
)
SELECT event_type, count(*)::BIGINT AS n_events,
       floor((count(*)::HUGEINT * sum(c::HUGEINT * c::HUGEINT)
              - sum(c)::HUGEINT * sum(c)::HUGEINT)::DOUBLE
             / (count(*)::DOUBLE * count(*)) + 0.5) / 10000.0 AS var_value
FROM post GROUP BY event_type""",
)
def ev_rollup_cdc_variance(spark, sf_dir):
    """VARIANCE under retraction — the counterpoint to
    ``ev_rollup_cdc_minmax``/``ev_rollup_cdc_distinct``: second moments
    ARE fully self-maintainable under churn, because variance derives
    from the sign-LINEAR power sums (Σx, Σx²). ``operators/rollup.py:
    partial_moments_signed`` keeps (n, s1, s2) in exact integer cents
    with decimal(38,0) accumulators, so the maintained state is
    bit-identical to a recompute at any merge shape and the final
    population variance — (n·s2 − s1²)/n², floor-quantized at 4dp —
    hash-matches the one-shot oracle exactly (DuckDB does the same
    integer arithmetic in HUGEINT). Same churn script as the other
    CDC rollups: %10==3 values shifted +1.00 (+100 cents), %10==7
    deleted.

    Cost shape: identical to the linear path — two bounded-keyspace
    signed hash aggregates and a merge; no base-state consultation,
    no per-value state. This is why a production rollup stores power
    sums rather than variances."""
    from etl__project_spark.operators import (
        finalize_variance,
        merge_moments_signed,
        partial_moments_signed,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.floor(F.round(F.col("value"), 2) * 100 + F.lit(0.5))
        .cast("long")
        .alias("c"),
    )
    m10 = F.col("event_id") % 10
    state = partial_moments_signed(
        ev.withColumn("sign", F.lit(1)), ["event_type"], "c"
    )
    retractions = ev.filter(m10.isin(3, 7)).withColumn("sign", F.lit(-1))
    post_images = (
        ev.filter(m10 == 3)
        .withColumn("c", F.col("c") + F.lit(100))
        .withColumn("sign", F.lit(1))
    )
    delta = partial_moments_signed(
        retractions.unionByName(post_images), ["event_type"], "c"
    )
    merged = merge_moments_signed(state, delta, ["event_type"])
    return finalize_variance(merged, ["event_type"])


@query(
    "ev_rollup_cdc_topk",
    """WITH post AS (
  SELECT event_type,
         CASE WHEN event_id % 10 = 3 THEN round(value, 2) + 1.00
              ELSE round(value, 2) END AS v
  FROM events WHERE event_id % 10 <> 7
),
live AS (SELECT DISTINCT event_type, v FROM post),
ranked AS (
  SELECT event_type, v,
         row_number() OVER (PARTITION BY event_type ORDER BY v DESC)
             AS rnk
  FROM live
)
SELECT event_type, rnk::BIGINT AS rnk,
       floor(v * 100 + 0.5) / 100.0 AS v
FROM ranked WHERE rnk <= 3""",
)
def ev_rollup_cdc_topk(spark, sf_dir):
    """TOP-K per group under retraction — the order-statistic cousin of
    ``ev_rollup_cdc_minmax``, maintained the way streaming engines
    (e.g. Materialize's hierarchical reductions) actually do it: the
    self-maintaining state is the (group, value)-grain signed
    multiplicity table (``ev_rollup_cdc_distinct``'s state — deletes
    decrement, net-zero values vanish, so 'was that the last
    occurrence of the 2nd-largest value?' needs no base rescan), and
    top-k is a READ-TIME window over the live state. Same churn
    script as the other CDC rollups; oracle = distinct-rank over the
    one-shot post-CDC state, proving the maintained state's liveness
    arithmetic places exactly the right values in the top 3 after
    extrema-affecting deletes and shifts.

    Cost: maintenance is the distinct path's two (group, value)-keyed
    hash aggregates; the read projection is one window over the live
    state, group-bucket-local at scale."""
    from etl__project_spark.operators import (
        merge_distinct_signed,
        partial_distinct_signed,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.round(F.col("value"), 2).alias("v"),
    )
    m10 = F.col("event_id") % 10
    state = partial_distinct_signed(
        ev.withColumn("sign", F.lit(1)), ["event_type"], "v"
    )
    retractions = ev.filter(m10.isin(3, 7)).withColumn("sign", F.lit(-1))
    post_images = (
        ev.filter(m10 == 3)
        .withColumn("v", F.col("v") + F.lit(1.0))
        .withColumn("sign", F.lit(1))
    )
    delta = partial_distinct_signed(
        retractions.unionByName(post_images), ["event_type"], "v"
    )
    live = merge_distinct_signed(state, delta, ["event_type"], "v")
    w = Window.partitionBy("event_type").orderBy(F.col("v").desc())
    return (
        live.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= 3)
        .select(
            "event_type",
            "rnk",
            (F.floor(F.col("v") * 100 + F.lit(0.5)) / F.lit(100.0)).alias("v"),
        )
    )


@query(
    "ev_rollup_cdc_median",
    """WITH post AS (
  SELECT event_type,
         CASE WHEN event_id % 10 = 3 THEN round(value, 2) + 1.00
              ELSE round(value, 2) END AS v
  FROM events WHERE event_id % 10 <> 7
),
r AS (
  SELECT event_type, v,
         row_number() OVER (PARTITION BY event_type ORDER BY v) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM post
)
SELECT event_type, max(n)::BIGINT AS n_rows,
       floor(min(CASE WHEN rn * 2 >= n THEN v END) * 100 + 0.5) / 100.0
           AS median_lo
FROM r GROUP BY event_type""",
)
def ev_rollup_cdc_median(spark, sf_dir):
    """MEDIAN under retraction — order statistics join the retractable
    family: quantile sketches (q-digest, t-digest) are strictly
    insert-only, so the maintainable state is again the
    (group, value)-grain signed multiplicity table
    (``ev_rollup_cdc_distinct``'s state, here WITH multiplicities
    weighting the rank arithmetic), and the lower weighted median —
    the smallest value whose cumulative live count reaches half the
    group total — is a READ-TIME prefix-sum window over live state.
    Same churn script as the other CDC rollups; the oracle ranks the
    one-shot post-CDC rows directly, so the hash match proves the
    multiplicity-weighted rank arithmetic equals row-level ranking.

    Cost: maintenance is the distinct path's aggregates; the read is
    one cumulative window over the per-group value domain (not the
    rows), group-bucket-local at scale."""
    from etl__project_spark.operators import (
        merge_distinct_signed,
        partial_distinct_signed,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.round(F.col("value"), 2).alias("v"),
    )
    m10 = F.col("event_id") % 10
    # NOTE: the state keeps per-(g, v) multiplicity n (may exceed 1) —
    # the same merge as distinct, but the read weights ranks by n.
    state = partial_distinct_signed(
        ev.withColumn("sign", F.lit(1)), ["event_type"], "v"
    )
    retractions = ev.filter(m10.isin(3, 7)).withColumn("sign", F.lit(-1))
    post_images = (
        ev.filter(m10 == 3)
        .withColumn("v", F.col("v") + F.lit(1.0))
        .withColumn("sign", F.lit(1))
    )
    delta = partial_distinct_signed(
        retractions.unionByName(post_images), ["event_type"], "v"
    )
    live = merge_distinct_signed(state, delta, ["event_type"], "v")
    wcum = (
        Window.partitionBy("event_type")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wall = Window.partitionBy("event_type")
    ranked = live.select(
        "event_type",
        "v",
        F.sum("n").over(wcum).alias("cum"),
        F.sum("n").over(wall).alias("n_total"),
    )
    return ranked.groupBy("event_type").agg(
        F.max("n_total").cast("long").alias("n_rows"),
        (
            F.floor(
                F.min(
                    F.when(F.col("cum") * 2 >= F.col("n_total"), F.col("v"))
                )
                * 100
                + F.lit(0.5)
            )
            / F.lit(100.0)
        ).alias("median_lo"),
    )


@query(
    "ev_session_cdc",
    """WITH post AS (
  SELECT event_id, user_id,
         CASE WHEN event_id % 10 = 3 THEN ts + INTERVAL 300 SECOND
              ELSE ts END AS ts
  FROM events WHERE event_id % 10 <> 7
),
gaps AS (
  SELECT user_id,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
                     OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > 1800000000 OR
                   lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM post
)
SELECT user_id, sum(new_session)::BIGINT AS n_sessions,
       count(*)::BIGINT AS n_events
FROM gaps GROUP BY user_id""",
)
def ev_session_cdc(spark, sf_dir):
    """Sessionization under retraction (VERDICT r7 #4) — the aggregate
    the whole IVM family couldn't yet express: session counts are a
    NEIGHBORHOOD property, so a late insert inside the 30-min gap
    MERGES two sessions (count −1) and a delete of a bridging event
    SPLITS one (count +1), neither visible to the signed rollup
    algebra. ``operators/sessions.py:maintain_sessions_cdc`` maintains
    per-user counts exactly: per batch it recomputes session-start
    flags ONLY inside the delta's ±gap band neighborhoods (one
    equi-join against band-bucketed event state — affected windows
    land fully inside the neighborhood, unaffected flags cancel
    between the pre/post partial sums; proof in the module docstring).

    CDC script: 10%% of events arrive LATE (event_id%%10==4 withheld
    from the initial log, inserted in batch 1 — gap-bridging),
    %%10==3 events have their timestamps SHIFTED +300 s (update =
    retract old position + assert new), and batch 2 deletes %%10==7
    (session-splitting). Oracle = one-shot sessionization of the
    replayed post-CDC log, per user — the hash match proves the
    neighborhood deltas merge and split with exact counts.

    Per-batch cost: O(|Δ| + |events in touched bands|); a user's
    history outside the touched time bands is never read — tighter
    than the per-touched-group re-derive the minmax/median CDC paths
    use. Reference basis: `lambda_s3/lambda_function_s3.py:79`
    re-aggregates every load from scratch; this is its incremental,
    late/retracted-event-correct counterpart."""
    from etl__project_spark.operators import maintain_sessions_cdc

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts"
    )
    m10 = F.col("event_id") % 10
    initial = ev.filter(m10 != 4)
    batch1 = (
        ev.filter(m10 == 3)
        .withColumn("ts", F.col("ts") + F.expr("INTERVAL 300 SECONDS"))
        .withColumn("op", F.lit("U"))
        .unionByName(ev.filter(m10 == 4).withColumn("op", F.lit("I")))
    )
    batch2 = ev.filter(m10 == 7).withColumn("op", F.lit("D"))
    return maintain_sessions_cdc(
        initial, [batch1, batch2], key_cols=["event_id"]
    )


@query(
    "ev_asof_cdc",
    """WITH post_l AS (
  SELECT event_id, user_id,
         CASE WHEN event_id % 10 = 3 THEN ts + INTERVAL 300 SECOND
              ELSE ts END AS ts
  FROM events WHERE event_type = 'purchase' AND event_id % 10 <> 7
),
post_r AS (
  SELECT user_id,
         CASE WHEN event_id % 10 = 2 THEN ts + INTERVAL 600 SECOND
              ELSE ts END AS ts
  FROM events WHERE event_type = 'signup' AND event_id % 10 <> 1
)
SELECT l.event_id, l.user_id,
       strftime(r.ts, '%Y-%m-%dT%H:%M:%S') AS signup_ts_asof
FROM post_l l ASOF LEFT JOIN post_r r
  ON l.user_id = r.user_id AND r.ts <= l.ts""",
)
def ev_asof_cdc(spark, sf_dir):
    """As-of join under CDC on BOTH sides — the first NON-EQUI member
    of the IVM family. The equi-join delta algebra
    (``operators/ivm.py``) cannot express it: a late signup INSERT at
    (u, t) re-pairs purchases it never joins to in the delta (every
    purchase of u in [t, next surviving signup)), a signup DELETE falls
    its matched purchases back to the PREDECESSOR signup, and a
    timestamp UPDATE does both at once. ``maintain_asof_view_cdc``
    (operators/asof.py) bounds each batch's work with the interval
    analogue of the sessionization neighborhood argument: affected
    left rows are exactly covered by per-delta windows
    [t, next-unchanged-right > t), computed with ONE window function
    over (deltas ∪ touched users' surviving signups) — no inequality
    join, no history rescan; only windowed rows re-pair, by key-splice
    into the maintained view.

    CDC script: purchases — %%10==4 arrive late (batch-1 inserts),
    %%10==3 shift +300 s (update may cross a signup), batch 2 deletes
    %%10==7; signups — %%10==6 arrive late (re-pair earlier
    purchases), %%10==2 shift +600 s, batch 2 deletes %%10==1
    (predecessor fallback, NULL when none). Oracle = DuckDB's native
    ASOF LEFT JOIN over the two replayed post-CDC states.

    Reference basis: the reference pipeline has no temporal-join or
    retraction surface at all (`lambda_s3/lambda_function_s3.py`
    re-derives everything per load); this extends its event analytics
    to the late/corrected-data regime a 100 TB feature store lives in."""
    from etl__project_spark.operators.asof import maintain_asof_view_cdc

    ev = load_table(spark, sf_dir, "events")
    m10 = F.col("event_id") % 10
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    signups = ev.filter(F.col("event_type") == "signup").select(
        "event_id", "user_id", "ts"
    )
    initial_l = purchases.filter(m10 != 4)
    batch_l1 = (
        purchases.filter(m10 == 3)
        .withColumn("ts", F.col("ts") + F.expr("INTERVAL 300 SECONDS"))
        .withColumn("op", F.lit("U"))
        .unionByName(purchases.filter(m10 == 4).withColumn("op", F.lit("I")))
    )
    batch_l2 = purchases.filter(m10 == 7).withColumn("op", F.lit("D"))
    initial_r = signups.filter(m10 != 6)
    batch_r1 = (
        signups.filter(m10 == 6)
        .withColumn("op", F.lit("I"))
        .unionByName(
            signups.filter(m10 == 2)
            .withColumn("ts", F.col("ts") + F.expr("INTERVAL 600 SECONDS"))
            .withColumn("op", F.lit("U"))
        )
    )
    batch_r2 = signups.filter(m10 == 1).withColumn("op", F.lit("D"))
    view = maintain_asof_view_cdc(
        initial_l,
        initial_r,
        [batch_l1, batch_l2],
        [batch_r1, batch_r2],
        on="ts",
        by="user_id",
        left_keys=["event_id"],
        right_keys=["event_id"],
    )
    return view.select(
        "event_id",
        "user_id",
        F.date_format("ts_asof", "yyyy-MM-dd'T'HH:mm:ss").alias(
            "signup_ts_asof"
        ),
    )


@query(
    "ev_funnel_cdc",
    """WITH post AS (
  SELECT event_id, user_id, event_type,
         CASE WHEN event_id % 10 = 3 THEN ts + INTERVAL 300 SECOND
              ELSE ts END AS ts
  FROM events WHERE event_id % 10 <> 7
),
s1 AS (
  SELECT user_id, ts, event_type,
         min(CASE WHEN event_type = 'signup' THEN ts END)
             OVER (PARTITION BY user_id) AS t1
  FROM post
),
s2 AS (
  SELECT *, min(CASE WHEN event_type = 'view' AND ts > t1 THEN ts END)
                OVER (PARTITION BY user_id) AS t2 FROM s1
),
s3 AS (
  SELECT *, min(CASE WHEN event_type = 'click' AND ts > t2 THEN ts END)
                OVER (PARTITION BY user_id) AS t3 FROM s2
),
s4 AS (
  SELECT *, min(CASE WHEN event_type = 'purchase' AND ts > t3 THEN ts END)
                OVER (PARTITION BY user_id) AS t4 FROM s3
),
u AS (
  SELECT user_id, min(t1) AS t1, min(t2) AS t2, min(t3) AS t3, min(t4) AS t4
  FROM s4 GROUP BY user_id
),
c AS (
  SELECT count(t1)::BIGINT AS c1, count(t2)::BIGINT AS c2,
         count(t3)::BIGINT AS c3, count(t4)::BIGINT AS c4
  FROM u
)
SELECT 1::BIGINT AS stage, 'signup' AS stage_name, c1 AS n_users FROM c
UNION ALL SELECT 2::BIGINT, 'view', c2 FROM c
UNION ALL SELECT 3::BIGINT, 'click', c3 FROM c
UNION ALL SELECT 4::BIGINT, 'purchase', c4 FROM c""",
)
def ev_funnel_cdc(spark, sf_dir):
    """Ordered funnel under CDC — non-monotone beyond even
    sessionization: ONE late signup before an existing view→click→
    purchase chain retroactively lights up stages 2–4 at once, and
    deleting a user's only signup retreats them from every stage. A
    stage vector is a function of the user's whole event set, so
    ``operators/funnel.py:maintain_funnel_cdc`` re-derives per TOUCHED
    USER (the min/max-under-retraction house pattern, group = user):
    one user-key probe of the bucketed log, the batch funnel's chained
    min-windows over only those users' rows, a 4-slot diff into the
    counters, a stage-table upsert.

    CDC script: events %%10==4 arrive late (retro-advances), %%10==3
    shift +300 s (can flip strict-order relationships), batch 2
    deletes %%10==7 (retreats). Oracle = the one-shot funnel SQL over
    the replayed post-CDC log."""
    from etl__project_spark.operators.funnel import maintain_funnel_cdc

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "event_type"
    )
    m10 = F.col("event_id") % 10
    initial = ev.filter(m10 != 4)
    batch1 = (
        ev.filter(m10 == 3)
        .withColumn("ts", F.col("ts") + F.expr("INTERVAL 300 SECONDS"))
        .withColumn("op", F.lit("U"))
        .unionByName(ev.filter(m10 == 4).withColumn("op", F.lit("I")))
    )
    batch2 = ev.filter(m10 == 7).withColumn("op", F.lit("D"))
    return maintain_funnel_cdc(initial, [batch1, batch2])


@query(
    "ev_quantile_cdc",
    """WITH post AS (
  SELECT event_type,
         CASE WHEN event_id % 10 = 3 THEN round(value, 2) + 1.00
              ELSE round(value, 2) END AS v
  FROM events WHERE event_id % 10 <> 7
),
hist AS (
  SELECT event_type,
         (v::DECIMAL(18,2) * 100)::BIGINT // 1000 AS bucket,
         count(*)::BIGINT AS n
  FROM post GROUP BY 1, 2
),
cum AS (
  SELECT event_type, bucket, n,
         sum(n) OVER (PARTITION BY event_type ORDER BY bucket) AS cum,
         sum(n) OVER (PARTITION BY event_type) AS n_total
  FROM hist
)
SELECT event_type,
       max(n_total)::BIGINT AS n_events,
       round(min(CASE WHEN cum >= (n_total + 1) // 2 THEN bucket END) * 10.0, 2)
           AS p50_lo,
       round(min(CASE WHEN cum >= (9 * n_total + 9) // 10 THEN bucket END) * 10.0,
             2) AS p90_lo
FROM cum GROUP BY event_type""",
)
def ev_quantile_cdc(spark, sf_dir):
    """Percentiles under retraction via a RETRACTABLE histogram sketch —
    the fourth non-self-maintainable read in the CDC-rollup family.
    ``ev_rollup_cdc_median`` pays for exactness with value-grain state;
    ``ev_quantile_digest``'s t-digest-style sketch is insert-only
    (centroids cannot absorb a delete). The middle ground production IVM
    engines ship is a fixed-width bucket histogram (``operators/
    rollup.py:partial_hist_signed``): bucket counts are plain signed
    sums, so CDC updates/deletes fold in through the same ±1 algebra as
    count/sum — NO base-state consultation, unlike min/max — and any
    quantile reads off the cumulative counts at read time, accurate to
    one bucket width but bit-deterministic (integer bucket ids from
    DECIMAL cents, integer ceil-division ranks), which is what lets the
    oracle hash-match a one-shot recompute of the same sketch.

    CDC script: the house churn (values of event_id%10==3 updated
    +1.00 — shifts rows across bucket edges; %10==7 deleted — drains
    buckets, some to net zero). State is O(buckets) per group, bucketed
    on the group key at 100 TB; maintenance is O(|Δ|) per batch."""
    from etl__project_spark.operators import (
        hist_quantiles,
        merge_hist_signed,
        partial_hist_signed,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    m10 = F.col("event_id") % 10
    keys = ["event_type"]
    state = partial_hist_signed(ev.withColumn("sign", F.lit(1)), keys)
    upd = ev.filter(m10 == 3)
    delta1 = upd.withColumn("sign", F.lit(-1)).unionByName(
        upd.withColumn("value", F.round(F.col("value"), 2) + F.lit(1.0))
        .withColumn("sign", F.lit(1))
    )
    delta2 = ev.filter(m10 == 7).withColumn("sign", F.lit(-1))
    for d in (delta1, delta2):
        state = merge_hist_signed(state, partial_hist_signed(d, keys), keys)
    return hist_quantiles(state, keys)


@query(
    "ev_heavy_hitters_cdc",
    """WITH post AS (
  SELECT CASE WHEN event_id % 10 = 3 THEN user_id + 1000000
              ELSE user_id END AS user_id
  FROM events WHERE event_id % 10 <> 7
)
SELECT user_id::BIGINT AS user_id, count(*)::BIGINT AS n_events
FROM post GROUP BY user_id HAVING count(*) >= 60""",
)
def ev_heavy_hitters_cdc(spark, sf_dir):
    """Heavy hitters under CDC churn via a count-min sketch maintained
    in the TURNSTILE model (``datapipe/sketches.py:cms_cells_signed``):
    deletes and update old-images decrement cells, post-images
    increment — the CMS algebra absorbs signed updates natively, unlike
    HLL's ratchet-only registers. With every key's true net count
    non-negative, min-over-rows still never underestimates, so a
    threshold scan over the sketch has NO FALSE NEGATIVES and the
    maintained sketch is a sound PRUNING filter: broadcast the fixed
    4×256-cell grid, keep only keys whose estimate clears the
    threshold, and run the exact aggregate over the survivors' rows
    only. The emitted result is EXACT (candidate false positives die in
    the verify pass), so the oracle is the plain post-CDC
    HAVING-count query — the hash match proves the sketch never dropped
    a true heavy hitter across the churn. At 100 TB the exact pass
    touches candidate keys' rows instead of every key; at sf0.01 the
    collision noise (~9 k rows / 256 buckets) makes most keys
    candidates — the pruning RATIO is a scale property, the SOUNDNESS
    is what this query pins (pruning measured in
    ``tests/test_fact.py``'s skewed fixture).

    CDC script: events %10==3 re-attributed to user_id+1000000 (a key
    REMAP — the hardest churn for a sketch: one key loses mass, a
    brand-new key gains it), %10==7 deleted."""
    from etl__project_spark.datapipe.sketches import (
        cms_cells_signed,
        cms_estimate_keys,
        cms_merge_signed,
    )

    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id")
    m10 = F.col("event_id") % 10
    remapped = F.col("user_id") + F.lit(1000000)
    cells = cms_cells_signed(ev.withColumn("sign", F.lit(1)), "user_id")
    upd = ev.filter(m10 == 3)
    delta1 = upd.withColumn("sign", F.lit(-1)).unionByName(
        upd.withColumn("user_id", remapped).withColumn("sign", F.lit(1))
    )
    # %10==7 rows were never remapped (3 ≠ 7), so the delete retracts
    # the original key.
    delta2 = ev.filter(m10 == 7).withColumn("sign", F.lit(-1))
    for d in (delta1, delta2):
        cells = cms_merge_signed(cells, cms_cells_signed(d, "user_id"))
    post = ev.filter(m10 != 7).withColumn(
        "user_id", F.when(m10 == 3, remapped).otherwise(F.col("user_id"))
    )
    candidates = cms_estimate_keys(
        post.select("user_id").distinct(), cells, "user_id"
    ).filter(F.col("est_count") >= 60)
    return (
        post.join(F.broadcast(candidates.select("user_id")), "user_id")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
        .filter(F.col("n_events") >= 60)
    )


@query(
    "ev_median_2pass",
    """WITH v AS (
  SELECT event_type,
         (round(value, 2)::DECIMAL(18,2) * 100)::BIGINT AS cents
  FROM events
),
r AS (
  SELECT event_type, cents,
         row_number() OVER (PARTITION BY event_type ORDER BY cents) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n_total
  FROM v
)
SELECT event_type, n_total::BIGINT AS n_events,
       round(cents / 100.0, 2) AS median_value
FROM r WHERE rn = (n_total + 1) // 2""",
)
def ev_median_2pass(spark, sf_dir):
    """EXACT median per group with NO global sort — the two-pass
    histogram refinement (``operators/rollup.py:exact_quantile_2pass``)
    that replaces ORDER BY at 100 TB: pass 1 is one hash-agg histogram
    whose cumulative counts pin the single bucket holding rank
    ceil(N/2) (plus the residual rank inside it); pass 2 re-scans with
    a BROADCAST probe that keeps only that bucket's rows per group —
    a ~buckets-fold prune — and a row_number window over the surviving
    sliver reads off the exact order statistic. The oracle sorts
    everything (fine at sf0.01; the point of the operator is that the
    engine never does): the hash match proves the refinement finds the
    identical rank under duplicate values and residual-rank arithmetic.

    Contrast: ``ev_group_quantiles`` stops at pass 1 (bucket-accurate
    estimate, mergeable sketch); ``ev_rollup_cdc_median`` maintains the
    value-grain state under CDC. This is the batch EXACT read."""
    from etl__project_spark.operators import exact_quantile_2pass

    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    out = exact_quantile_2pass(ev, ["event_type"], num=1, den=2)
    return out.select(
        "event_type",
        "n_events",
        F.round(F.col("q_cents").cast("double") / 100.0, 2).alias(
            "median_value"
        ),
    )


@query(
    "ev_retention_cdc",
    """WITH post AS (
  SELECT user_id,
         CASE WHEN event_id % 10 = 3 THEN ts + INTERVAL 21 DAY
              ELSE ts END AS ts
  FROM events WHERE event_id % 10 <> 7
),
first_seen AS (
  SELECT user_id, min(ts) AS first_ts FROM post GROUP BY user_id
)
SELECT strftime(date_trunc('week', f.first_ts), '%Y-%m-%d') AS cohort_week,
       ((epoch_us(e.ts) - epoch_us(f.first_ts)) // 604800000000)::BIGINT
           AS offset_weeks,
       count(DISTINCT e.user_id)::BIGINT AS n_active_users
FROM post e JOIN first_seen f ON e.user_id = f.user_id
GROUP BY 1, 2""",
)
def ev_retention_cdc(spark, sf_dir):
    """Cohort retention under CDC — the first maintained view whose
    GROUP KEY is itself data-derived: a user's cohort is the week of
    their min-timestamp event, so a late event that PREDATES everything
    seen re-keys the user's every cell (new cohort_week, every
    offset_weeks shifted), and deleting a user's first event does the
    same in reverse. No signed algebra on the cells can express that;
    ``operators/retention.py:maintain_retention_cdc`` re-derives the
    CELL SET per touched user (the house per-touched-group pattern,
    value = the set) into a one-row-per-(user, cell) membership table —
    retractable COUNT(DISTINCT) held one grain finer, read as a row
    count per cell.

    CDC script built to force re-keying all three ways: events %10==4
    are withheld then inserted late (some predate their user's current
    first event → retroactive re-cohort), %10==3 shift +21 days (a
    first event moving 3 weeks re-cohorts; a later one just changes
    offsets), %10==7 deleted (losing a first event re-cohorts). Oracle
    = one-shot retention over the replayed post-CDC log."""
    from etl__project_spark.operators import maintain_retention_cdc

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts"
    )
    m10 = F.col("event_id") % 10
    initial = ev.filter(m10 != 4)
    batch1 = (
        ev.filter(m10 == 3)
        .withColumn("ts", F.col("ts") + F.expr("INTERVAL 21 DAYS"))
        .withColumn("op", F.lit("U"))
        .unionByName(ev.filter(m10 == 4).withColumn("op", F.lit("I")))
    )
    batch2 = ev.filter(m10 == 7).withColumn("op", F.lit("D"))
    return maintain_retention_cdc(initial, [batch1, batch2])


@query(
    "ev_hll_sliding_window",
    """WITH h AS (
  SELECT ts::DATE AS day,
         ('0x' || substr(md5(user_id::VARCHAR || 'hll'), 1, 15))::BIGINT AS h
  FROM events
),
hr AS (SELECT day, h % 64 AS reg, h // 64 AS rem FROM h),
day_regs AS (
  SELECT day, reg,
         max(CASE WHEN rem = 0 THEN 55 ELSE 55 - length(bin(rem)) END) AS rho
  FROM hr GROUP BY day, reg
),
win AS (
  SELECT reg, max(rho) AS rho FROM day_regs
  WHERE day BETWEEN DATE '2024-01-20' AND DATE '2024-01-26' GROUP BY reg
),
spine AS (SELECT range AS reg FROM range(64)),
sk AS (SELECT s.reg, coalesce(w.rho, 0) AS m FROM spine s LEFT JOIN win w USING (reg)),
agg AS (
  SELECT sum(1::BIGINT << (55 - m))::BIGINT AS s_scaled,
         sum(CASE WHEN m = 0 THEN 1 ELSE 0 END)::BIGINT AS v_zero
  FROM sk
),
ex AS (
  SELECT count(*)::BIGINT AS n_events,
         count(DISTINCT user_id)::BIGINT AS exact_distinct
  FROM events WHERE ts::DATE BETWEEN DATE '2024-01-20' AND DATE '2024-01-26'
),
est AS (
  SELECT *,
         CASE WHEN v_zero > 0
                   AND (0.709::DOUBLE * 4096.0 * 36028797018963968.0 / s_scaled) <= 160.0
              THEN 64.0::DOUBLE * ln(64.0::DOUBLE / v_zero)
              ELSE 0.709::DOUBLE * 4096.0 * 36028797018963968.0 / s_scaled END AS e
  FROM agg, ex
)
SELECT n_events, exact_distinct, s_scaled, v_zero,
       floor(e * 100 + 0.5) / 100.0 AS est_distinct,
       (abs(floor(e * 100 + 0.5) / 100.0 - exact_distinct)
          <= greatest(0.4::DOUBLE * exact_distinct, 8.0::DOUBLE)) AS est_ok
FROM est""",
)
def ev_hll_sliding_window(spark, sf_dir):
    """Sliding-window distinct users via SLICED HLL — the production
    answer to "distinct over the last 7 days" at 100 TB. HLL registers
    cannot retract (they only ratchet up), so windowing by
    retraction is impossible; the standard pattern is slice-and-merge:
    maintain one 64-register sketch PER DAY (``datapipe/sketches.py:
    hll_registers_keyed`` — each ingest day appends its own ≤64-row
    slice, history never re-hashed), and ANY window reads as a
    register-wise max over its slices — 7 days × 64 longs, O(1) in the
    event count. Estimator discipline is ``ev_distinct_hll``'s exact-
    integer form (scaled harmonic sum, linear-counting branch), so the
    oracle hash-match proves slice-merge ≡ one-shot sketch of the
    window AND pins the estimate within the sketch's error budget
    against the window's exact count."""
    from etl__project_spark.datapipe.sketches import hll_registers_keyed

    m = 64
    ev = load_table(spark, sf_dir, "events")
    # the maintained slice table: one sketch per ingest day, keyed by the
    # FULL date (not dayofmonth) so slices from day N of different months
    # never merge — the pattern is multi-month-correct as documented
    # (ADVICE r8).
    day_regs = hll_registers_keyed(
        ev.withColumn("day", F.to_date("ts")), "day", "user_id", m=m
    )
    win = (
        day_regs.filter(F.col("day").between("2024-01-20", "2024-01-26"))
        .groupBy("reg")
        .agg(F.max("rho").alias("rho"))
    )
    spine = spark.range(m).select(F.col("id").alias("reg"))
    sk = spine.join(win, "reg", "left").select(
        F.coalesce(F.col("rho"), F.lit(0)).alias("m")
    )
    agg = sk.agg(
        F.sum(F.expr("shiftleft(1L, 55 - m)")).alias("s_scaled"),
        F.sum(F.when(F.col("m") == 0, 1).otherwise(0)).cast("long").alias(
            "v_zero"
        ),
    )
    ex = ev.filter(F.to_date("ts").between("2024-01-20", "2024-01-26")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("exact_distinct"),
    )
    e_raw = (
        F.lit(0.709) * F.lit(4096.0) * F.lit(36028797018963968.0)
        / F.col("s_scaled")
    )
    e = F.when(
        (F.col("v_zero") > 0) & (e_raw <= F.lit(160.0)),
        F.lit(64.0) * F.log(F.lit(64.0) / F.col("v_zero")),
    ).otherwise(e_raw)
    est2 = F.floor(e * 100 + F.lit(0.5)) / F.lit(100.0)
    return agg.crossJoin(F.broadcast(ex)).select(
        "n_events",
        "exact_distinct",
        "s_scaled",
        "v_zero",
        est2.alias("est_distinct"),
        (
            F.abs(est2 - F.col("exact_distinct"))
            <= F.greatest(F.lit(0.4) * F.col("exact_distinct"), F.lit(8.0))
        ).alias("est_ok"),
    )


@query(
    "ev_rollup_cdc_grouping_sets",
    """WITH post AS (
  SELECT CASE WHEN event_id % 10 = 3 THEN ts + INTERVAL 1 DAY ELSE ts END AS ts,
         event_type,
         CASE WHEN event_id % 10 = 3 THEN round(value, 2) + 1.00
              ELSE round(value, 2) END AS v
  FROM events WHERE event_id % 10 <> 7
),
keyed AS (
  SELECT event_type, (dayofweek(ts) + 1)::BIGINT AS weekday, v FROM post
)
SELECT coalesce(event_type, '(all)') AS etype,
       coalesce(weekday, -1)::BIGINT AS weekday,
       count(*)::BIGINT AS n_events,
       round(sum(v::DECIMAL(18,2))::DOUBLE, 2) AS total_value
FROM keyed
GROUP BY GROUPING SETS ((event_type, weekday), (event_type), (weekday), ())""",
)
def ev_rollup_cdc_grouping_sets(spark, sf_dir):
    """GROUPING SETS under retraction — the warehouse cube pattern
    "maintain the FINEST grain, derive every coarser grain at read":
    the signed algebra maintains only the (event_type, weekday) base
    rollup (count + decimal sum, ``merge_rollups_signed``), and the
    read CUBEs that O(groups)-row state — subtotal layers are sums of
    maintained sums, never separate maintained views, so one CDC batch
    costs one finest-grain merge no matter how many rollup layers
    readers consume. The CDC script moves rows BETWEEN groups (updates
    shift ts +1 day, rotating the weekday, while also changing the
    value) so the oracle hash-match proves subtotals at every layer
    re-balance from the finest grain alone. Decimal quantization keeps
    the cube's re-summation bit-exact against the one-shot GROUPING
    SETS (decimal addition is associative — the module-docstring
    contract of ``operators/rollup.py``)."""
    from etl__project_spark.operators import (
        merge_rollups_signed,
        partial_rollup_signed,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "ts", "value"
    )
    m10 = F.col("event_id") % 10
    keys = ["event_type", "weekday"]

    def keyed(df):
        return df.select(
            "event_type",
            F.dayofweek("ts").cast("long").alias("weekday"),
            "value",
            "sign",
        )

    state = partial_rollup_signed(keyed(ev.withColumn("sign", F.lit(1))), keys)
    upd = ev.filter(m10 == 3)
    delta1 = upd.withColumn("sign", F.lit(-1)).unionByName(
        upd.withColumn("value", F.round(F.col("value"), 2) + F.lit(1.0))
        .withColumn("ts", F.col("ts") + F.expr("INTERVAL 1 DAYS"))
        .withColumn("sign", F.lit(1))
    )
    delta2 = ev.filter(m10 == 7).withColumn("sign", F.lit(-1))
    for d in (delta1, delta2):
        state = merge_rollups_signed(
            state, partial_rollup_signed(keyed(d), keys), keys
        )
    return (
        state.cube("event_type", "weekday")
        .agg(
            F.sum("n").cast("long").alias("n_events"),
            F.round(F.sum("total").cast("double"), 2).alias("total_value"),
        )
        .select(
            F.coalesce("event_type", F.lit("(all)")).alias("etype"),
            F.coalesce("weekday", F.lit(-1)).cast("long").alias("weekday"),
            "n_events",
            "total_value",
        )
    )


@query(
    "ev_triangles_cdc",
    """WITH post AS (
  SELECT event_id * 13 AS araw,
         CASE WHEN event_id % 10 = 3 THEN event_id * 29 + user_id + 5
              ELSE event_id * 29 + user_id END AS braw
  FROM events WHERE event_id % 10 <> 7
),
pairs AS (SELECT araw % 211 AS a, braw % 211 AS b FROM post),
edges AS (
  SELECT DISTINCT least(a, b) AS u, greatest(a, b) AS v
  FROM pairs WHERE a <> b
),
tri AS (
  SELECT count(*)::BIGINT AS n_triangles
  FROM edges e1
  JOIN edges e2 ON e2.u = e1.u AND e2.v > e1.v
  JOIN edges e3 ON e3.u = e1.v AND e3.v = e2.v
)
SELECT n_triangles, (SELECT count(*) FROM edges)::BIGINT AS n_edges
FROM tri""",
)
def ev_triangles_cdc(spark, sf_dir):
    """Triangle count maintained under edge CDC — the first DEGREE-3
    polynomial view in the IVM family (join views and their aggregates
    are bilinear, support counts linear). ``datapipe/graph.py:
    triangle_delta_signed`` applies the trilinear expansion
    6·ΔT = 3·ΣDAA + 3·ΣDDA + ΣDDD: every term is an equi-join chain
    anchored on the batch (O(|Δ|·deg²), never a graph rescan), all
    arithmetic exact integer sign products. Composed BELOW it is the
    same two-level shape as ``tpch_semijoin_cdc``: event-grain churn
    folds linearly into edge MULTIPLICITIES, and only 0↔>0 liveness
    transitions (``edge_liveness_deltas``) surface to the polynomial
    layer — an event delete that leaves its edge multiply-supported
    costs the triangle layer nothing.

    The graph: each event contributes the edge (13·e mod 211,
    (29·e + u) mod 211); updates (%10==3) REMAP their edge (+5 shift —
    old edge may die, new may be born), %10==4 arrive late, %10==7
    deleted. Oracle = one-shot u<v<w triangle enumeration over the
    post-CDC live edge set; the hash match proves both levels."""
    from etl__project_spark.datapipe.graph import maintain_triangles_cdc

    live0, liveness_batches = _event_edge_liveness(spark, sf_dir)
    return maintain_triangles_cdc(live0, liveness_batches)


@query(
    "ev_clustering_cdc",
    """WITH post AS (
  SELECT event_id * 13 AS araw,
         CASE WHEN event_id % 10 = 3 THEN event_id * 29 + user_id + 5
              ELSE event_id * 29 + user_id END AS braw
  FROM events WHERE event_id % 10 <> 7
),
pairs AS (SELECT araw % 211 AS a, braw % 211 AS b FROM post),
edges AS (
  SELECT DISTINCT least(a, b) AS u, greatest(a, b) AS v
  FROM pairs WHERE a <> b
),
tri AS (
  SELECT count(*)::BIGINT AS n_triangles
  FROM edges e1
  JOIN edges e2 ON e2.u = e1.u AND e2.v > e1.v
  JOIN edges e3 ON e3.u = e1.v AND e3.v = e2.v
),
deg AS (
  SELECT vertex, count(*)::BIGINT AS d FROM (
    SELECT u AS vertex FROM edges UNION ALL SELECT v FROM edges
  ) GROUP BY vertex
),
wed AS (SELECT sum(d * (d - 1) // 2)::BIGINT AS n_wedges FROM deg)
SELECT n_triangles, n_wedges,
       CASE WHEN n_wedges = 0 THEN 0
            ELSE floor(3.0 * n_triangles / n_wedges * 1000000 + 0.5) END::BIGINT
           AS global_clustering_micro
FROM tri, wed""",
)
def ev_clustering_cdc(spark, sf_dir):
    """Global clustering coefficient maintained under edge CDC — the
    composition that closes the graph-metrics story: triangles come
    from the degree-3 polynomial layer (``maintain_triangles_cdc``),
    wedges DERIVE at read time from the linearly-maintained O(V) degree
    state (``maintain_degrees_cdc``; Σ d·(d−1)/2 is quadratic in
    degrees but a plain projection of that state — the maintain-finest/
    derive-at-read split again). One CDC batch costs the triangle
    layer's batch-anchored joins plus one bounded degree hash-agg; the
    coefficient itself is arithmetic over two one-row frames. Same
    event-derived graph and churn script as ``ev_triangles_cdc``
    (shared ``_event_edge_liveness`` derivation); micro-unit rounding
    matches the batch ``doc_cooccur_triangles`` convention."""
    from etl__project_spark.datapipe.graph import (
        maintain_degrees_cdc,
        maintain_triangles_cdc,
    )

    live0, liveness_batches = _event_edge_liveness(spark, sf_dir)
    tri = maintain_triangles_cdc(live0, liveness_batches).select("n_triangles")
    deg = maintain_degrees_cdc(live0, liveness_batches)
    wed = deg.agg(
        F.sum(F.expr("d * (d - 1) div 2")).cast("long").alias("n_wedges")
    )
    return tri.crossJoin(F.broadcast(wed)).select(
        "n_triangles",
        "n_wedges",
        F.when(F.col("n_wedges") == 0, F.lit(0))
        .otherwise(
            F.floor(
                F.lit(3.0)
                * F.col("n_triangles").cast("double")
                / F.col("n_wedges").cast("double")
                * 1000000
                + F.lit(0.5)
            )
        )
        .cast("long")
        .alias("global_clustering_micro"),
    )


@query(
    "ev_join_size_cdc",
    """WITH rows4 AS (SELECT * FROM (VALUES (0), (1), (2), (3)) t(r)),
post AS (
  SELECT CASE WHEN event_id % 10 = 3 THEN user_id + 1000000
              ELSE user_id END AS user_id,
         event_type
  FROM events WHERE event_id % 10 <> 7
),
a AS (SELECT user_id::VARCHAR AS uid FROM post WHERE event_type = 'click'),
b AS (SELECT user_id::VARCHAR AS uid FROM post WHERE event_type = 'purchase'),
sa AS (
  SELECT r, ('0x' || substr(md5(uid || 'cms' || r), 1, 15))::BIGINT % 256 AS bk,
         count(*)::BIGINT AS c
  FROM a CROSS JOIN rows4 GROUP BY r, bk
),
sb AS (
  SELECT r, ('0x' || substr(md5(uid || 'cms' || r), 1, 15))::BIGINT % 256 AS bk,
         count(*)::BIGINT AS c
  FROM b CROSS JOIN rows4 GROUP BY r, bk
),
ip AS (
  SELECT sa.r, sum(sa.c * sb.c)::BIGINT AS ip
  FROM sa JOIN sb ON sa.r = sb.r AND sa.bk = sb.bk GROUP BY sa.r
),
est AS (SELECT min(ip)::BIGINT AS est_size FROM ip),
exact AS (
  SELECT sum(ca.na * cb.nb)::BIGINT AS exact_size
  FROM (SELECT user_id, count(*)::BIGINT AS na FROM post
        WHERE event_type = 'click' GROUP BY user_id) ca
  JOIN (SELECT user_id, count(*)::BIGINT AS nb FROM post
        WHERE event_type = 'purchase' GROUP BY user_id) cb USING (user_id)
)
SELECT exact_size, est_size, est_size >= exact_size AS no_underestimate
FROM exact CROSS JOIN est""",
)
def ev_join_size_cdc(spark, sf_dir):
    """Join-cardinality estimation whose sketches are MAINTAINED under
    CDC — the CBO statistic kept current instead of recomputed:
    ``ev_join_size_est`` builds both count-min sketches from scratch;
    here each side's 4×256 grid absorbs the signed churn through the
    turnstile algebra (``cms_cells_signed``/``cms_merge_signed``, the
    ``ev_heavy_hitters_cdc`` machinery — a key remap moves mass between
    cells via its two opposite-signed images, a delete drains them),
    and the estimate derives at read as the min-over-rows inner product
    of two KB-sized broadcast grids. With non-negative net counts on
    both sides every cell is exact-plus-collisions, so the inner
    product never underestimates |A ⋈ B| — the optimizer's safe upper
    bound stays safe under churn, pinned by the emitted
    ``no_underestimate`` column and the exact post-CDC size in the
    oracle. Per batch: one bounded hash-agg per side; the read touches
    2·d·w cells, independent of corpus size.

    CDC script: the house churn on the join key itself (events %10==3
    re-attributed to user_id+1000000 on BOTH sides, %10==7 deleted)."""
    from etl__project_spark.datapipe.sketches import (
        cms_cells_signed,
        cms_merge_signed,
    )

    w = 256
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type"
    )
    m10 = F.col("event_id") % 10
    remapped = F.col("user_id") + F.lit(1000000)

    def side(etype):
        src = ev.filter(F.col("event_type") == etype)
        cells = cms_cells_signed(
            src.withColumn("sign", F.lit(1)), "user_id", width=w
        )
        upd = src.filter(m10 == 3)
        delta1 = upd.withColumn("sign", F.lit(-1)).unionByName(
            upd.withColumn("user_id", remapped).withColumn("sign", F.lit(1))
        )
        delta2 = src.filter(m10 == 7).withColumn("sign", F.lit(-1))
        for d in (delta1, delta2):
            cells = cms_merge_signed(cells, cms_cells_signed(d, "user_id", width=w))
        post = src.filter(m10 != 7).withColumn(
            "user_id", F.when(m10 == 3, remapped).otherwise(F.col("user_id"))
        )
        return cells, post

    cells_a, post_a = side("click")
    cells_b, post_b = side("purchase")
    # shared coded path with the planner hook (star_load join-strategy
    # choice consults the same bound — VERDICT r8 #8)
    from etl__project_spark.datapipe.sketches import cms_join_size_bound

    est = cms_join_size_bound(cells_a, cells_b)
    ca = post_a.groupBy("user_id").agg(F.count(F.lit(1)).alias("na"))
    cb = post_b.groupBy("user_id").agg(F.count(F.lit(1)).alias("nb"))
    exact = ca.join(cb, "user_id").agg(
        F.sum(F.col("na") * F.col("nb")).cast("long").alias("exact_size")
    )
    return exact.crossJoin(F.broadcast(est)).select(
        "exact_size",
        "est_size",
        (F.col("est_size") >= F.col("exact_size")).alias("no_underestimate"),
    )


@query(
    "ev_bottomk_sample_cdc",
    """WITH post AS (
  SELECT event_id,
         CASE WHEN event_id % 10 = 3 THEN 'retyped' ELSE event_type END AS event_type
  FROM events WHERE event_id % 10 <> 7
),
h AS (
  SELECT event_id, event_type,
         ('0x' || substr(md5(event_id::VARCHAR || 'bk'), 1, 15))::BIGINT AS h
  FROM post
),
smp AS (SELECT * FROM h ORDER BY h, event_id LIMIT 20),
hk AS (SELECT max(h)::BIGINT AS h_k FROM smp),
ex AS (SELECT count(*)::BIGINT AS exact_distinct FROM post),
est AS (
  SELECT (19 * (1152921504606846976 // h_k)
          + (19 * (1152921504606846976 % h_k)) // h_k)::BIGINT AS est_distinct,
         h_k
  FROM hk
)
SELECT s.event_id, s.event_type, s.h,
       e.est_distinct, x.exact_distinct,
       (abs(e.est_distinct - x.exact_distinct)
          <= (x.exact_distinct + 1) / 2) AS est_ok
FROM smp s, est e, ex x""",
)
def ev_bottomk_sample_cdc(spark, sf_dir):
    """Bottom-k hash sketch maintained under CDC — one order-statistics
    state serving BOTH a consistent fixed-size uniform sample and a
    distinct-count estimate, the sketch family HLL/CMS don't cover
    (Cohen & Kaplan's bottom-k / KMV). Priority = the engine-portable
    60-bit md5 (``datapipe/sampling.py:hash_priority``); the sample is
    the k=20 live rows with smallest priority, so membership is STABLE
    under churn (a member leaves only when deleted; the k+1-st row
    back-fills — the case retraction-blind reservoir samples cannot
    serve). NDV reads off the k-th smallest hash as
    (k−1)·2^60 div h_k, in exact two-term integer arithmetic (no
    BIGINT overflow for n ≥ k). Maintenance = the consolidated signed
    event state (liveness is what sampling needs — there is no lossy
    sketch to heal); the read is one TakeOrdered(k) + two 1-row
    broadcasts. CDC script: deletes (m10 = 7) remove bottom-member
    rows (forcing back-fill), updates (m10 = 3) retype members'
    payloads; the oracle pins sample membership, payload currency, the
    estimate, and its error bound against the post-CDC table."""
    from etl__project_spark.datapipe.sampling import hash_priority
    from etl__project_spark.operators import consolidate
    from etl__project_spark.session import state_checkpoint

    k = 20
    h_max = 1152921504606846976  # 16^15 = 2^60
    ev = load_table(spark, sf_dir, "events").select("event_id", "event_type")
    m10 = F.col("event_id") % 10
    sign = lambda s: F.lit(s).cast("long").alias("sign")  # noqa: E731
    state = ev.select("*", sign(1))
    upd = ev.filter(m10 == 3)
    deltas = [
        upd.select("*", sign(-1)).unionByName(
            upd.select(
                "event_id", F.lit("retyped").alias("event_type"), sign(1)
            )
        ),
        ev.filter(m10 == 7).select("*", sign(-1)),
    ]
    state = state_checkpoint(consolidate(state), table_sized=True)
    for d in deltas:
        state = state_checkpoint(
            consolidate(state.unionByName(d)), table_sized=True
        )
    live = state.select("event_id", "event_type").withColumn(
        "h", hash_priority(F.col("event_id"))
    )
    smp = live.orderBy("h", "event_id").limit(k)
    hk = smp.agg(F.max("h").cast("long").alias("h_k"))
    est = hk.select(
        (
            F.lit(k - 1) * F.expr(f"{h_max}L div h_k")
            + F.expr(f"({k - 1}L * pmod({h_max}L, h_k)) div h_k")
        ).cast("long").alias("est_distinct")
    )
    ex = live.agg(F.count(F.lit(1)).cast("long").alias("exact_distinct"))
    return (
        smp.crossJoin(F.broadcast(est))
        .crossJoin(F.broadcast(ex))
        .select(
            "event_id",
            "event_type",
            "h",
            "est_distinct",
            "exact_distinct",
            (
                F.abs(F.col("est_distinct") - F.col("exact_distinct"))
                <= (F.col("exact_distinct") + 1) / 2
            ).alias("est_ok"),
        )
    )


@query(
    "ev_zorder_layout",
    """WITH q AS (
  SELECT least(user_id, 255)::BIGINT AS ub,
         least((floor(value * 100 + 0.5)::BIGINT) // 256, 255)::BIGINT AS vb
  FROM events
),
z AS (SELECT ub, vb, (((ub // 1) % 2) * 2 + ((vb // 1) % 2) * 1 + ((ub // 2) % 2) * 8 + ((vb // 2) % 2) * 4 + ((ub // 4) % 2) * 32 + ((vb // 4) % 2) * 16 + ((ub // 8) % 2) * 128 + ((vb // 8) % 2) * 64 + ((ub // 16) % 2) * 512 + ((vb // 16) % 2) * 256 + ((ub // 32) % 2) * 2048 + ((vb // 32) % 2) * 1024 + ((ub // 64) % 2) * 8192 + ((vb // 64) % 2) * 4096 + ((ub // 128) % 2) * 32768 + ((vb // 128) % 2) * 16384)::BIGINT AS zval FROM q)
SELECT (zval // 1024)::BIGINT AS bucket,
       count(*)::BIGINT AS n,
       min(ub)::BIGINT AS u_min, max(ub)::BIGINT AS u_max,
       min(vb)::BIGINT AS v_min, max(vb)::BIGINT AS v_max,
       ((max(ub) - min(ub) + 1) * (max(vb) - min(vb) + 1))::BIGINT AS zone_area
FROM z GROUP BY 1""",
)
def ev_zorder_layout(spark, sf_dir):
    """Z-order (Morton) layout assignment — the multi-dimensional
    clustering move behind Delta OPTIMIZE ZORDER / Iceberg sort orders,
    as a verifiable query: quantize (user_id, value) to 8-bit grids,
    interleave bits into a 16-bit Z-value
    (``operators/layout.py:zorder_key`` — pure shift/mask integer
    expressions, codegen-friendly, with the oracle's div/mod twin built
    from the SAME Python loop so the hash match pins the interleave
    bit-for-bit), and bucket rows by Z-range (64 buckets = the files a
    ``repartitionByRange(zval)`` write would produce). The emitted
    per-bucket zone maps (min/max of BOTH dimensions + rectangle area)
    are the point of the layout: every bucket is a bounded rectangle in
    user x value space, so a range predicate on EITHER dimension prunes
    files — where a single-column sort gives tight maps on one
    dimension and full-range maps on the other. The area column makes
    the locality measurable, not asserted."""
    from etl__project_spark.operators.layout import zorder_key

    ev = load_table(spark, sf_dir, "events").select("user_id", "value")
    q = ev.select(
        F.least(F.col("user_id"), F.lit(255)).cast("long").alias("ub"),
        F.least(F.expr("cast(floor(value * 100 + 0.5) as long) div 256"), F.lit(255))
        .cast("long")
        .alias("vb"),
    )
    z = q.select("ub", "vb", zorder_key(F.col("ub"), F.col("vb")).alias("zval"))
    return (
        z.groupBy(F.expr("zval div 1024").cast("long").alias("bucket"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.min("ub").cast("long").alias("u_min"),
            F.max("ub").cast("long").alias("u_max"),
            F.min("vb").cast("long").alias("v_min"),
            F.max("vb").cast("long").alias("v_max"),
            (
                (F.max("ub") - F.min("ub") + 1) * (F.max("vb") - F.min("vb") + 1)
            ).cast("long").alias("zone_area"),
        )
    )


@query(
    "ev_zorder_prune_audit",
    """WITH q AS (
  SELECT least(user_id, 255)::BIGINT AS ub,
         least((floor(value * 100 + 0.5)::BIGINT) // 256, 255)::BIGINT AS vb
  FROM events
),
z AS (SELECT ub, vb, (((ub // 1) % 2) * 2 + ((vb // 1) % 2) * 1 + ((ub // 2) % 2) * 8 + ((vb // 2) % 2) * 4 + ((ub // 4) % 2) * 32 + ((vb // 4) % 2) * 16 + ((ub // 8) % 2) * 128 + ((vb // 8) % 2) * 64 + ((ub // 16) % 2) * 512 + ((vb // 16) % 2) * 256 + ((ub // 32) % 2) * 2048 + ((vb // 32) % 2) * 1024 + ((ub // 64) % 2) * 8192 + ((vb // 64) % 2) * 4096 + ((ub // 128) % 2) * 32768 + ((vb // 128) % 2) * 16384)::BIGINT AS zval FROM q),
zorder_files AS (
  SELECT (zval // 1024)::BIGINT AS f, min(ub) AS u_min, max(ub) AS u_max
  FROM z GROUP BY 1
),
valsort_files AS (
  SELECT (vb // 4)::BIGINT AS f, min(ub) AS u_min, max(ub) AS u_max
  FROM q GROUP BY 1
)
SELECT 'zorder' AS layout,
       count(*)::BIGINT AS n_files,
       sum(CASE WHEN u_max >= 8 AND u_min <= 15 THEN 1 ELSE 0 END)::BIGINT AS n_read,
       round(1.0 - sum(CASE WHEN u_max >= 8 AND u_min <= 15 THEN 1 ELSE 0 END)::DOUBLE
                   / count(*), 4) AS skip_ratio
FROM zorder_files
UNION ALL
SELECT 'value_sorted',
       count(*)::BIGINT,
       sum(CASE WHEN u_max >= 8 AND u_min <= 15 THEN 1 ELSE 0 END)::BIGINT,
       round(1.0 - sum(CASE WHEN u_max >= 8 AND u_min <= 15 THEN 1 ELSE 0 END)::DOUBLE
                   / count(*), 4)
FROM valsort_files""",
)
def ev_zorder_prune_audit(spark, sf_dir):
    """The MEASURED benefit of the Z-order layout (``ev_zorder_layout``):
    for the user-range predicate ub BETWEEN 8 AND 15, count how many of
    64 files each layout's zone maps force a reader to open. The
    value-sorted layout (single-column sort — the default anyone picks
    for value-range queries) has full-range user zone maps in every
    file, so the user predicate prunes ~nothing; the Z-ordered layout
    bounds every file's user rectangle, so most files skip. Both
    layouts' zone maps and the resulting read/skip counts are computed
    exactly and oracle-pinned — the layout claim is a number, not an
    assertion. At 100 TB these "files" are parquet files written by
    repartitionByRange(zval), and n_read/n_files IS the scan-cost
    ratio for the predicate."""
    from etl__project_spark.operators.layout import zorder_key

    ev = load_table(spark, sf_dir, "events").select("user_id", "value")
    q = ev.select(
        F.least(F.col("user_id"), F.lit(255)).cast("long").alias("ub"),
        F.least(F.expr("cast(floor(value * 100 + 0.5) as long) div 256"), F.lit(255))
        .cast("long")
        .alias("vb"),
    )
    z = q.select("ub", "vb", zorder_key(F.col("ub"), F.col("vb")).alias("zval"))

    def zone_audit(files_df, layout):
        overlap = (F.col("u_max") >= 8) & (F.col("u_min") <= 15)
        per_file = files_df.groupBy("f").agg(
            F.min("ub").alias("u_min"), F.max("ub").alias("u_max")
        )
        return per_file.agg(
            F.lit(layout).alias("layout"),
            F.count(F.lit(1)).cast("long").alias("n_files"),
            F.sum(F.when(overlap, 1).otherwise(0)).cast("long").alias("n_read"),
            F.round(
                F.lit(1.0)
                - F.sum(F.when(overlap, 1).otherwise(0)).cast("double")
                / F.count(F.lit(1)),
                4,
            ).alias("skip_ratio"),
        ).select("layout", "n_files", "n_read", "skip_ratio")

    zf = z.select(F.expr("zval div 1024").cast("long").alias("f"), "ub")
    vf = q.select(F.expr("vb div 4").cast("long").alias("f"), "ub")
    return zone_audit(zf, "zorder").unionByName(zone_audit(vf, "value_sorted"))


from etl__project_spark.operators.layout import zorder_key_n_sql  # noqa: E402

_Z3_SQL = zorder_key_n_sql(["ub", "vb", "tb"], 8)


@query(
    "ev_zorder3_layout",
    f"""WITH q AS (
  SELECT least(user_id, 255)::BIGINT AS ub,
         least((floor(value * 100 + 0.5)::BIGINT) // 256, 255)::BIGINT AS vb,
         hour(ts)::BIGINT AS tb
  FROM events
),
z AS (SELECT ub, vb, tb, ({_Z3_SQL})::BIGINT AS zval FROM q)
SELECT (zval // {1 << 18})::BIGINT AS bucket,
       count(*)::BIGINT AS n,
       min(ub)::BIGINT AS u_min, max(ub)::BIGINT AS u_max,
       min(vb)::BIGINT AS v_min, max(vb)::BIGINT AS v_max,
       min(tb)::BIGINT AS t_min, max(tb)::BIGINT AS t_max
FROM z GROUP BY 1""",
)
def ev_zorder3_layout(spark, sf_dir):
    """N-dimensional Z-order — the 3-column interleave (user, value,
    hour-of-day) Delta OPTIMIZE ZORDER users actually run, through the
    generalized ``operators/layout.py:zorder_key_n`` (round-robin bit
    placement; the 2-dim ``zorder_key`` is its N=2 case, bit-for-bit).
    The oracle's div/mod twin is emitted by ``zorder_key_n_sql`` from
    the SAME placement loop at registration time, so the hash match
    pins the 24-bit interleave itself. Per 64-file bucket the emitted
    zone maps bound ALL THREE dimensions — a range predicate on any one
    prunes files, the property no single- or two-column sort gives.
    Same write path as the 2-dim layout: ``ZOrderLayout(...,
    extra_dims=("tb",))`` on any warehouse publish/append/compaction.

    Plan: quantize + interleave is one codegen'd projection fused into
    the scan; the aggregate has a 64-value keyspace."""
    from etl__project_spark.operators.layout import zorder_key_n

    ev = load_table(spark, sf_dir, "events").select("user_id", "value", "ts")
    q = ev.select(
        F.least(F.col("user_id"), F.lit(255)).cast("long").alias("ub"),
        F.least(F.expr("cast(floor(value * 100 + 0.5) as long) div 256"), F.lit(255))
        .cast("long")
        .alias("vb"),
        F.hour("ts").cast("long").alias("tb"),
    )
    z = q.select(
        "ub", "vb", "tb",
        zorder_key_n([F.col("ub"), F.col("vb"), F.col("tb")], 8).alias("zval"),
    )
    return (
        z.groupBy(F.expr(f"zval div {1 << 18}").cast("long").alias("bucket"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.min("ub").cast("long").alias("u_min"),
            F.max("ub").cast("long").alias("u_max"),
            F.min("vb").cast("long").alias("v_min"),
            F.max("vb").cast("long").alias("v_max"),
            F.min("tb").cast("long").alias("t_min"),
            F.max("tb").cast("long").alias("t_max"),
        )
    )


@query(
    "ev_zorder_health",
    """WITH q AS (
  SELECT least(user_id, 255)::BIGINT AS ub,
         least((floor(value * 100 + 0.5)::BIGINT) // 256, 255)::BIGINT AS vb
  FROM events
),
z AS (SELECT ub, vb, (((ub // 1) % 2) * 2 + ((vb // 1) % 2) * 1 + ((ub // 2) % 2) * 8 + ((vb // 2) % 2) * 4 + ((ub // 4) % 2) * 32 + ((vb // 4) % 2) * 16 + ((ub // 8) % 2) * 128 + ((vb // 8) % 2) * 64 + ((ub // 16) % 2) * 512 + ((vb // 16) % 2) * 256 + ((ub // 32) % 2) * 2048 + ((vb // 32) % 2) * 1024 + ((ub // 64) % 2) * 8192 + ((vb // 64) % 2) * 4096 + ((ub // 128) % 2) * 32768 + ((vb // 128) % 2) * 16384)::BIGINT AS zval FROM q),
zones AS (
  SELECT 'zorder' AS layout, (zval // 1024)::BIGINT AS f,
         min(ub) AS u_min, max(ub) AS u_max
  FROM z GROUP BY 2
  UNION ALL
  SELECT 'value_sorted', (vb // 4)::BIGINT,
         min(ub), max(ub)
  FROM q GROUP BY 2
),
bounds AS (SELECT min(ub)::BIGINT AS lo, max(ub)::BIGINT AS hi FROM q),
probes AS (
  SELECT (lo + (greatest(hi - lo, 1) * k) // 63)::BIGINT AS p
  FROM bounds, unnest(generate_series(0, 63)) AS u(k)
)
SELECT layout,
       count(DISTINCT f)::BIGINT AS n_files,
       sum(CASE WHEN u_min <= p AND p <= u_max THEN 1 ELSE 0 END)::BIGINT
         AS n_covered,
       (floor(sum(CASE WHEN u_min <= p AND p <= u_max THEN 1 ELSE 0 END)
              / (64.0 * count(DISTINCT f)) * 10000 + 0.5) / 10000.0)
         AS mean_read_fraction
FROM zones CROSS JOIN probes
GROUP BY layout""",
)
def ev_zorder_health(spark, sf_dir):
    """Clustering health as an ORACLE-PINNED model — the read-
    amplification statistic ``operators/layout.py:
    zone_read_amplification`` measures from parquet footers, computed
    here over the MODELED zone maps of both layouts with the identical
    probe formula (64 points at lo + (max(hi−lo,1)·k) div 63): per
    layout, the mean fraction of files a point predicate on the user
    dimension must open. Z-order bounds every bucket's user rectangle →
    low fraction; the value-sorted layout's buckets all span the full
    user domain → fraction ≈ 1. The model and the physical measurement
    agree exactly on an equal-width Z-ordered write (same buckets, same
    probes — pinned in ``tests/test_layout.py``), which is what lets
    ``should_recluster`` trust footer probes as the OPTIMIZE trigger.

    Plan: two 64-row zone-map aggregates, a broadcast of the 64 probes,
    one bounded aggregate — O(buckets · probes) whatever the row
    count."""
    from etl__project_spark.operators.layout import zorder_key

    ev = load_table(spark, sf_dir, "events").select("user_id", "value")
    q = ev.select(
        F.least(F.col("user_id"), F.lit(255)).cast("long").alias("ub"),
        F.least(F.expr("cast(floor(value * 100 + 0.5) as long) div 256"), F.lit(255))
        .cast("long")
        .alias("vb"),
    )
    z = q.select("ub", "vb", zorder_key(F.col("ub"), F.col("vb")).alias("zval"))
    zones = (
        z.groupBy(F.expr("zval div 1024").cast("long").alias("f"))
        .agg(F.min("ub").alias("u_min"), F.max("ub").alias("u_max"))
        .select(F.lit("zorder").alias("layout"), "f", "u_min", "u_max")
        .unionByName(
            q.groupBy(F.expr("vb div 4").cast("long").alias("f"))
            .agg(F.min("ub").alias("u_min"), F.max("ub").alias("u_max"))
            .select(F.lit("value_sorted").alias("layout"), "f", "u_min", "u_max")
        )
    )
    bounds = q.agg(
        F.min("ub").cast("long").alias("lo"), F.max("ub").cast("long").alias("hi")
    )
    probes = bounds.select(
        F.explode(F.sequence(F.lit(0), F.lit(63))).alias("k"), "lo", "hi"
    ).select(
        (
            F.col("lo")
            + F.expr("(greatest(hi - lo, 1L) * k) div 63L")
        ).cast("long").alias("p")
    )
    covered = F.sum(
        F.when((F.col("u_min") <= F.col("p")) & (F.col("p") <= F.col("u_max")), 1)
        .otherwise(0)
    ).cast("long")
    return (
        zones.crossJoin(F.broadcast(probes))
        .groupBy("layout")
        .agg(
            F.countDistinct("f").cast("long").alias("n_files"),
            covered.alias("n_covered"),
            (
                F.floor(
                    covered.cast("double")
                    / (F.lit(64.0) * F.countDistinct("f"))
                    * 10000
                    + F.lit(0.5)
                )
                / 10000.0
            ).alias("mean_read_fraction"),
        )
    )


@query(
    "ev_zorder_range_read",
    """WITH q AS (
  SELECT least(user_id, 255)::BIGINT AS ub,
         least((floor(value * 100 + 0.5)::BIGINT) // 256, 255)::BIGINT AS vb
  FROM events
)
SELECT ub, count(*)::BIGINT AS n, sum(vb)::BIGINT AS sum_vb
FROM q WHERE ub BETWEEN 8 AND 15 GROUP BY ub""",
)
def ev_zorder_range_read(spark, sf_dir):
    """The zone-map range-prune READ path, end to end (VERDICT r10 #2 —
    the read-side twin of the Z-order write): the quantized events land
    in the REAL ``ParquetWarehouse`` under the production equal-count
    ``ZOrderLayout``, and the range query goes through
    ``plans/star_load.py:read_fact_range``, which prunes the file
    LISTING from parquet footer zone maps before Spark ever schedules a
    scan — on this layout most files' [u_min, u_max] rectangles miss
    [8, 15] entirely and are never opened (the measured skip is pinned
    physically in ``tests/test_layout.py``: files actually opened ==
    the footer audit's n_read). The oracle computes the same aggregate
    over ALL rows with a plain WHERE — a hash match proves the pruned
    listing lost no rows, the one thing file skipping must never do.
    The file-count benefit is deliberately NOT in the result schema
    (equal-count boundaries are sample-dependent); correctness is
    pinned here, the skip is pinned by the physical test and timed in
    SCALE.md."""
    import tempfile

    from etl__project_spark.operators.layout import ZOrderLayout
    from etl__project_spark.plans.star_load import (
        ParquetWarehouse,
        read_fact_range,
    )

    ev = load_table(spark, sf_dir, "events").select("user_id", "value")
    q = ev.select(
        F.least(F.col("user_id"), F.lit(255)).cast("long").alias("ub"),
        F.least(F.expr("cast(floor(value * 100 + 0.5) as long) div 256"), F.lit(255))
        .cast("long")
        .alias("vb"),
    )
    schema = T.StructType(
        [T.StructField("ub", T.LongType()), T.StructField("vb", T.LongType())]
    )
    wh = ParquetWarehouse(spark, tempfile.mkdtemp(prefix="ev_zrange_"))
    wh.fact_append(
        "events_z", q, "b1", layout=ZOrderLayout("ub", "vb", bits=8, n_files=32)
    )
    pruned = read_fact_range(wh, "events_z", schema, "ub", 8, 15)
    return pruned.groupBy("ub").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("vb").cast("long").alias("sum_vb"),
    )


@query(
    "ev_zorder_rect_read",
    """WITH q AS (
  SELECT least(user_id, 255)::BIGINT AS ub,
         least((floor(value * 100 + 0.5)::BIGINT) // 256, 255)::BIGINT AS vb
  FROM events
)
SELECT ub, vb, count(*)::BIGINT AS n
FROM q WHERE ub BETWEEN 8 AND 15 AND vb BETWEEN 32 AND 95 GROUP BY ub, vb""",
)
def ev_zorder_rect_read(spark, sf_dir):
    """Multi-column zone-map pruning, end to end: the rectangle
    predicate (ub range AND vb range) goes through
    ``plans/star_load.py:read_fact_rect``, which skips a file when ANY
    dimension's footer zone provably misses its range — on the
    Z-ordered layout every file is bounded in BOTH interleaved
    dimensions, so the two conjuncts' skips multiply (the payoff a
    single-column sort cannot give: its second dimension's zones span
    the whole domain and eliminate nothing). Oracle = the same
    aggregate over all rows with a plain conjunctive WHERE; the hash
    match proves the conjunction of advisory prunes lost no rows.
    Physical files-opened == the per-dimension audits' intersection is
    pinned in ``tests/test_layout.py``."""
    import tempfile

    from etl__project_spark.operators.layout import ZOrderLayout
    from etl__project_spark.plans.star_load import (
        ParquetWarehouse,
        read_fact_rect,
    )

    ev = load_table(spark, sf_dir, "events").select("user_id", "value")
    q = ev.select(
        F.least(F.col("user_id"), F.lit(255)).cast("long").alias("ub"),
        F.least(F.expr("cast(floor(value * 100 + 0.5) as long) div 256"), F.lit(255))
        .cast("long")
        .alias("vb"),
    )
    schema = T.StructType(
        [T.StructField("ub", T.LongType()), T.StructField("vb", T.LongType())]
    )
    wh = ParquetWarehouse(spark, tempfile.mkdtemp(prefix="ev_zrect_"))
    wh.fact_append(
        "events_z", q, "b1", layout=ZOrderLayout("ub", "vb", bits=8, n_files=32)
    )
    pruned = read_fact_rect(
        wh, "events_z", schema, {"ub": (8, 15), "vb": (32, 95)}
    )
    return pruned.groupBy("ub", "vb").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
