"""Helpers, CTE fragments, and oracle-SQL builders shared across the
catalog family modules. Split out of the monolithic catalog.py in
round 9 (VERDICT r8 #7); bodies unchanged."""

from __future__ import annotations

from collections.abc import Callable
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
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


def load_table(spark, sf_dir, table, **kw):
    """Proxy to the package-level ``catalog.load_table`` attribute — the
    ONE patch point tests and tools monkeypatch to substitute fixtures
    (pre-split behavior: every query resolved the module global). Family
    modules bind this proxy, so patching
    ``etl__project_spark.plans.catalog.load_table`` still governs every
    query after the family split. ``**kw`` forwards loader options
    (e.g. ``parallel=False``) when the patched-in loader accepts them;
    fixture substitutes that take only (spark, sf_dir, table) keep
    working because every call site passes options it can semantically
    drop."""
    import inspect

    import etl__project_spark.plans.catalog as _pkg

    fn = _pkg.load_table
    if kw:
        try:
            params = inspect.signature(fn).parameters
        except (TypeError, ValueError):
            params = {}
        kw = {
            k: v
            for k, v in kw.items()
            if k in params
            or any(p.kind is inspect.Parameter.VAR_KEYWORD for p in params.values())
        }
    return fn(spark, sf_dir, table, **kw)


BROADCAST_FILE_LIMIT_ENV = "SPARK_GRAFT_BROADCAST_FILE_LIMIT"
_BROADCAST_FILE_LIMIT_DEFAULT = 256 * 1024 * 1024  # bytes on disk


def _table_bytes(sf_dir: str, table: str) -> int | None:
    """On-disk size of a fixture table (file or directory of parts);
    None = no statistic (missing/patched fixture)."""
    import os

    path = os.path.join(sf_dir, f"{table}.parquet")
    try:
        if os.path.isfile(path):
            return os.path.getsize(path)
        if os.path.isdir(path):
            return sum(
                os.path.getsize(os.path.join(root, f))
                for root, _dirs, fs in os.walk(path)
                for f in fs
            )
    except OSError:
        pass
    return None


def size_gated_broadcast(df: DataFrame, sf_dir: str, table: str) -> DataFrame:
    """Size-gate an explicit broadcast hint on a SCALE-PROPORTIONAL
    table (VERDICT r11 #3, guide §3.1): in real TPC-H every base table
    except nation/region grows with the scale factor — orders is ~1/4
    of lineitem — so an unconditional ``F.broadcast(orders)`` is a
    100 TB driver/executor OOM baked into the plan. The statistic is the
    table's on-disk parquet size (zero Spark jobs, known before
    planning, the same footer-level truth Delta/Iceberg keep in
    manifests): under the limit → the fixture-scale BroadcastHashJoin
    plan; over it → NO hint, so Spark plans from its own estimates
    (sort-merge at scale, its 64 MB auto-broadcast threshold still free
    to fire on a heavily filtered side). Missing file (a monkeypatched
    fixture loader) = no statistic = keep the hint, matching the
    ``join_stats`` convention in ``operators/fact.py:build_fact``.

    The limit is env-tunable (``SPARK_GRAFT_BROADCAST_FILE_LIMIT``,
    default 256 MB of compressed parquet — a few hundred MB built, well
    under the 8 GB broadcast cap); read at call time so tests can flip
    the gate. Plan-only: join results are identical either way."""
    import os

    limit = int(
        os.environ.get(
            BROADCAST_FILE_LIMIT_ENV, str(_BROADCAST_FILE_LIMIT_DEFAULT)
        )
    )
    size = _table_bytes(sf_dir, table)
    if size is not None and size > limit:
        return df
    return F.broadcast(df)


def _video(spark: SparkSession, sf_dir: str) -> DataFrame:
    return synth_video_data(load_table(spark, sf_dir, "events"))


def _parsed(spark: SparkSession, sf_dir: str, keep_id: bool = False) -> DataFrame:
    return parse_raw(_video(spark, sf_dir), keep_cols=["event_id"] if keep_id else None)


PARSED_CTE = f"""{VIDEO_DATA_CTE},
kept AS (
  SELECT * FROM video_data
  WHERE list_contains(string_split(events, ','), '206')
    AND len(string_split(VideoTitle, '|')) > 1
),
parsed_pre AS (
  SELECT event_id,
         substr(DateTime, 1, 16) AS datetime,
         strptime(substr(DateTime, 1, 16), '%Y-%m-%dT%H:%M') AS __ts,
         string_split(VideoTitle, '|')[1] AS __head,
         VideoTitle
  FROM kept
),
parsed AS (
  SELECT event_id,
         datetime,
         strftime(__ts, '%Y%m%d%H%M') AS datetime_key,
         year(__ts)::BIGINT AS year, month(__ts)::BIGINT AS month,
         day(__ts)::BIGINT AS day, hour(__ts)::BIGINT AS hour,
         minute(__ts)::BIGINT AS minute,
         CASE WHEN __head LIKE '%Android%' THEN 'Android'
              WHEN __head LIKE '%iPhone%' THEN 'iPhone'
              WHEN __head LIKE '%iPad%' THEN 'iPad'
              ELSE 'Desktop' END AS platform,
         CASE WHEN list_has_any(string_split(__head, ' '),
                                ['Android','iPhone','iPad','Web'])
              THEN NULL ELSE __head END AS site,
         string_split(VideoTitle, '|')[-1] AS video
  FROM parsed_pre
)"""


DIMS_CTE = f"""{PARSED_CTE},
dimdate AS (
  SELECT row_number() OVER (ORDER BY datetime) - 1 AS datetime_skey, datetime
  FROM (SELECT DISTINCT datetime FROM parsed)
),
dimplatform AS (
  SELECT row_number() OVER (ORDER BY platform) - 1 AS platform_skey, platform
  FROM (SELECT DISTINCT platform FROM parsed)
),
dimsite AS (
  SELECT row_number() OVER (ORDER BY site) - 1 AS site_skey, site
  FROM (SELECT DISTINCT site FROM parsed WHERE site IS NOT NULL)
),
dimtitle AS (
  SELECT row_number() OVER (ORDER BY video) - 1 AS title_skey, video
  FROM (SELECT DISTINCT video FROM parsed)
)"""


def _int(c):
    return c.cast("long")


def _money_sum_raw(expr):
    """Engine-exact money sum, in integer 1e-4 units.

    Double addition is not associative, so a grouped sum of inexact
    money doubles differs between engines in the last ulp — and a result
    on a rounding boundary flips the driver's value hash (observed:
    tpch_q5/q10 one cent off at sf0.001). Worse, NO decimal-string step
    is engine-portable either: Spark's round()/decimal-cast round the
    double's SHORTEST DECIMAL REPRESENTATION (BigDecimal.valueOf) while
    DuckDB rounds the binary value, so per-term ``round(x, 4)`` diverges
    on ~1e-5 of terms (observed: tpch_q1 sum_charge at sf0.01).

    The portable quantization uses only IEEE arithmetic, identical on
    both engines by construction: ``floor(x * 10000 + 0.5)`` per term
    (half-up at 4 decimals of the BINARY value), summed as exact
    integers. Downstream projections divide/floor in integer space —
    never an engine ``round()``. SQL twin: ``_msum_raw``.

    The sum accumulates in DECIMAL(38,0): a 100 TB fact table's scaled
    units can exceed 2^63 (DuckDB silently promotes its BIGINT sum to
    HUGEINT; a Spark long sum would overflow), and decimal addition is
    exact at any scale. The result is handed onward as DOUBLE so every
    downstream division is double/double on both engines (DuckDB's
    HUGEINT sum promotes to double on division the same way; Spark
    decimal division would instead use decimal HALF_UP scale rules)."""
    return F.sum(F.floor(expr * 10000 + F.lit(0.5)).cast("decimal(38,0)")).cast(
        "double"
    )


def _money_sum(expr):
    """2-decimal money value from the exact scaled sum (half-up to
    cents in integer space, emitted as cents/100 — both engines compute
    the identical double). SQL twin: ``_msum``."""
    return F.floor(_money_sum_raw(expr) / F.lit(100.0) + F.lit(0.5)) / F.lit(100.0)


def _quant4(expr):
    """4-decimal projection of an arbitrary (cross-engine-identical)
    double without engine round(): floor(x*1e4 + 0.5) / 1e4."""
    return F.floor(expr * 10000 + F.lit(0.5)) / F.lit(10000.0)


def _msum_raw(expr: str) -> str:
    """DuckDB twin of ``_money_sum_raw`` (sum of BIGINT 1e-4 units)."""
    return f"sum(CAST(floor(({expr}) * 10000 + 0.5) AS BIGINT))"


def _msum(expr: str) -> str:
    """DuckDB twin of ``_money_sum``."""
    return f"(floor({_msum_raw(expr)} / 100.0 + 0.5) / 100.0)"


def _q4(expr: str) -> str:
    """DuckDB twin of ``_quant4``."""
    return f"(floor(({expr}) * 10000 + 0.5) / 10000.0)"


def _vs_fact_dims(parsed):
    """The four vs_fact dimension builds (split out so plan tests can
    assert the unbounded dims avoid the single-partition window)."""
    return {
        "datetime_skey": (
            with_dense_ids(derive_dim(parsed, "datetime"), "datetime", "datetime_skey"),
            "datetime",
            "datetime",
        ),
        "platform_skey": (
            with_dense_ids(
                derive_dim(parsed, "platform"), "platform", "platform_skey", small=True
            ),
            "platform",
            "platform",
        ),
        "site_skey": (
            with_dense_ids(derive_dim(parsed, "site"), "site", "site_skey", small=True),
            "site",
            "site",
        ),
        "title_skey": (
            with_dense_ids(derive_dim(parsed, "video"), "video", "title_skey"),
            "video",
            "video",
        ),
    }


_SHINGLE_LIST = (
    "list_distinct([substr(text, i, 5) for i in range(1, greatest(len(text) - 3, 1))])"
)


_LSH_SQL_SIG = """
  SELECT doc_id,
    min((506952115 * (('0x' || substr(md5(shingle), 1, 15))::BIGINT % 2147483647) + 1779033703) % 2147483647) AS h0,
    min((1013904229 * (('0x' || substr(md5(shingle), 1, 15))::BIGINT % 2147483647) + 1410583759) % 2147483647) AS h1,
    min((1520856343 * (('0x' || substr(md5(shingle), 1, 15))::BIGINT % 2147483647) + 1042133815) % 2147483647) AS h2,
    min((2027808457 * (('0x' || substr(md5(shingle), 1, 15))::BIGINT % 2147483647) + 673683871) % 2147483647) AS h3,
    min((387276923 * (('0x' || substr(md5(shingle), 1, 15))::BIGINT % 2147483647) + 305233927) % 2147483647) AS h4,
    min((894229037 * (('0x' || substr(md5(shingle), 1, 15))::BIGINT % 2147483647) + 2084267630) % 2147483647) AS h5,
    min((1401181151 * (('0x' || substr(md5(shingle), 1, 15))::BIGINT % 2147483647) + 1715817686) % 2147483647) AS h6,
    min((1908133265 * (('0x' || substr(md5(shingle), 1, 15))::BIGINT % 2147483647) + 1347367742) % 2147483647) AS h7
  FROM sh GROUP BY doc_id
"""


def _simhash_oracle(n_bits: int = 16) -> str:
    digit = lambda d: f"(strpos('0123456789abcdef', substr(md5(tok), {d}, 1)) - 1)"  # noqa: E731
    sums = ",\n    ".join(
        f"sum(CASE WHEN ({digit(i // 4 + 1)} // {2 ** (3 - i % 4)}) % 2 = 1 THEN 1 ELSE -1 END) AS s{i}"
        for i in range(n_bits)
    )
    sig = " + ".join(
        f"(CASE WHEN s{i} > 0 THEN {2 ** (n_bits - 1 - i)} ELSE 0 END)"
        for i in range(n_bits)
    )
    return f"""WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
),
sums AS (
  SELECT doc_id,
    {sums}
  FROM tok GROUP BY doc_id
)
SELECT doc_id, ({sig})::BIGINT AS simhash FROM sums"""


_COS = (
    "list_dot_product(e.embedding::DOUBLE[], q.qv) / "
    "(sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])) * "
    "sqrt(list_dot_product(q.qv, q.qv)))"
)


_BUCKET = (
    "(CASE WHEN embedding[1] > 0 THEN 1 ELSE 0 END"
    " + CASE WHEN embedding[2] > 0 THEN 2 ELSE 0 END"
    " + CASE WHEN embedding[3] > 0 THEN 4 ELSE 0 END"
    " + CASE WHEN embedding[4] > 0 THEN 8 ELSE 0 END)::BIGINT"
)


_PAIR_COS = (
    "list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) / "
    "(sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) * "
    "sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[])))"
)


_IVF_COS_ES = (
    "round(list_dot_product(e.embedding::DOUBLE[], s.cv) /"
    " (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])) *"
    " sqrt(list_dot_product(s.cv, s.cv))), 4)"
)


_IVF_COS_QX = (
    "round(list_dot_product(q.embedding::DOUBLE[], x.embedding::DOUBLE[]) /"
    " (sqrt(list_dot_product(q.embedding::DOUBLE[], q.embedding::DOUBLE[])) *"
    " sqrt(list_dot_product(x.embedding::DOUBLE[], x.embedding::DOUBLE[]))), 4)"
)


_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


_SHINGLE13 = (
    "list_distinct([substr(text, i, 13) for i in range(1, greatest(len(text) - 11, 1))])"
)


_SIG_CTE = """sig AS (
  SELECT doc_id,
    min((506952115 * (('0x' || substr(md5(shingle), 1, 15))::BIGINT % 2147483647) + 1779033703) % 2147483647) AS h0,
    min((1013904229 * (('0x' || substr(md5(shingle), 1, 15))::BIGINT % 2147483647) + 1410583759) % 2147483647) AS h1,
    min((1520856343 * (('0x' || substr(md5(shingle), 1, 15))::BIGINT % 2147483647) + 1042133815) % 2147483647) AS h2,
    min((2027808457 * (('0x' || substr(md5(shingle), 1, 15))::BIGINT % 2147483647) + 673683871) % 2147483647) AS h3,
    min((387276923 * (('0x' || substr(md5(shingle), 1, 15))::BIGINT % 2147483647) + 305233927) % 2147483647) AS h4,
    min((894229037 * (('0x' || substr(md5(shingle), 1, 15))::BIGINT % 2147483647) + 2084267630) % 2147483647) AS h5,
    min((1401181151 * (('0x' || substr(md5(shingle), 1, 15))::BIGINT % 2147483647) + 1715817686) % 2147483647) AS h6,
    min((1908133265 * (('0x' || substr(md5(shingle), 1, 15))::BIGINT % 2147483647) + 1347367742) % 2147483647) AS h7
  FROM sh GROUP BY doc_id
)"""


_BPE_MERGE_STEP = """string_split(list_reduce(s.syms, (acc, x) -> CASE
      WHEN (acc = b.a OR ends_with(acc, ' ' || b.a)) AND x = b.b
      THEN substr(acc, 1, length(acc) - length(b.a)) || b.a || b.b
      ELSE acc || ' ' || x END), ' ')"""


_BPE_COUNTS = """SELECT syms[i] AS a, syms[i+1] AS b, sum(freq)::BIGINT AS cnt
  FROM {src}, unnest(generate_series(1, len(syms)-1)) AS u(i)
  GROUP BY 1, 2"""


def _funnel_counts(ev):
    """One-row (c1..c4) strict-order funnel stage counts — shared by
    ``ev_funnel_steps`` and the event-intake pipeline."""
    w = Window.partitionBy("user_id")
    df = ev.select("user_id", "ts", "event_type")
    df = df.withColumn(
        "t1", F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).over(w)
    )
    df = df.withColumn(
        "t2",
        F.min(
            F.when(
                (F.col("event_type") == "view") & (F.col("ts") > F.col("t1")),
                F.col("ts"),
            )
        ).over(w),
    )
    df = df.withColumn(
        "t3",
        F.min(
            F.when(
                (F.col("event_type") == "click") & (F.col("ts") > F.col("t2")),
                F.col("ts"),
            )
        ).over(w),
    )
    df = df.withColumn(
        "t4",
        F.min(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("ts") > F.col("t3")),
                F.col("ts"),
            )
        ).over(w),
    )
    u = df.groupBy("user_id").agg(
        F.min("t1").alias("t1"),
        F.min("t2").alias("t2"),
        F.min("t3").alias("t3"),
        F.min("t4").alias("t4"),
    )
    return u.agg(
        F.count("t1").alias("c1"),
        F.count("t2").alias("c2"),
        F.count("t3").alias("c3"),
        F.count("t4").alias("c4"),
    )


def _pq_ctes(n_iter: int = 2) -> str:
    """Shared DuckDB CTE body for the trained-codebook PQ queries: per-
    subspace k-means training unrolled ``n_iter`` rounds (the
    ``_kmeans_iter_sql`` discipline with subspace ``s`` carried through
    every group key), then code assignment + ADC scoring against query
    vec_id=0. Ends with ``pq AS (SELECT vec_id, approx_dot ...)`` so
    callers append their own final SELECT. Explicit left-associated term
    sums and micro-unit integer quantization keep every round
    bit-identical with ``datapipe/similarity.py:pq_codebooks``."""
    l2 = " + ".join(
        f"(sub.v[{i}] - cc.c[{i}]) * (sub.v[{i}] - cc.c[{i}])" for i in range(1, 9)
    )
    assign = """SELECT vec_id, s, cw_id FROM (
    SELECT sub.vec_id, sub.s, cc.cw_id,
           row_number() OVER (PARTITION BY sub.vec_id, sub.s
                              ORDER BY floor(({l2}) * 1000000 + 0.5)::BIGINT,
                                       cc.cw_id) AS rn
    FROM sub JOIN {cents} cc USING (s)) WHERE rn = 1""".replace("{l2}", l2)
    update = """SELECT a.s, a.cw_id, x.dim,
         floor(sum(x.xm)::DOUBLE / count(*) / 100.0 + 0.5) / 10000.0 AS val
  FROM (
    SELECT vec_id, s, generate_subscripts(v, 1)::BIGINT AS dim,
           floor(unnest(v) * 1000000 + 0.5)::BIGINT AS xm
    FROM sub) x
  JOIN {assign} a ON x.vec_id = a.vec_id AND x.s = a.s
  GROUP BY a.s, a.cw_id, x.dim"""
    rounds = []
    prev = "c0"
    for r in range(1, n_iter + 1):
        rounds.append(f"a{r} AS ({assign.format(cents=prev)})")
        rounds.append(f"u{r} AS ({update.format(assign=f'a{r}')})")
        rounds.append(
            f"c{r} AS (SELECT s, cw_id, list(val ORDER BY dim) AS c"
            f" FROM u{r} GROUP BY s, cw_id)"
        )
        prev = f"c{r}"
    l2db = " + ".join(
        f"(db.v[{i}]::DOUBLE - cc.c[{i}]) * (db.v[{i}]::DOUBLE - cc.c[{i}])"
        for i in range(1, 9)
    )
    dot = " + ".join(f"(q.qv[{i}]::DOUBLE * cc.c[{i}])" for i in range(1, 9))
    rounds_sql = ",\n".join(rounds)
    return f"""WITH subsp AS (SELECT range::INT AS s FROM range(8)),
sub AS (
  SELECT vec_id, s, (embedding[8*s+1 : 8*s+8])::DOUBLE[] AS v
  FROM embeddings, subsp
),
c0 AS (SELECT s, vec_id AS cw_id, v AS c FROM sub WHERE vec_id < 16),
{rounds_sql},
db AS (
  SELECT vec_id, s, embedding[8*s+1 : 8*s+8] AS v
  FROM embeddings, subsp WHERE vec_id <> 0
),
d AS (
  SELECT db.vec_id, db.s, cc.cw_id,
         floor(({l2db}) * 1000000 + 0.5)::BIGINT AS r6
  FROM db JOIN {prev} cc USING (s)
),
codes AS (
  SELECT vec_id, s, cw_id FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id, s ORDER BY r6, cw_id) AS rn
    FROM d) WHERE rn = 1
),
q AS (SELECT s, embedding[8*s+1 : 8*s+8] AS qv
      FROM embeddings, subsp WHERE vec_id = 0),
lut AS (
  SELECT cc.s, cc.cw_id, floor(({dot}) * 1000000 + 0.5)::BIGINT AS lp
  FROM {prev} cc JOIN q USING (s)
),
pq AS (
  SELECT vec_id, floor(sum(lp) / 100.0 + 0.5) / 10000.0 AS approx_dot
  FROM codes JOIN lut USING (s, cw_id)
  GROUP BY vec_id
)"""


def _pq_sql() -> str:
    """DuckDB twin of datapipe.similarity.pq_topk (8 subspaces x 8 dims,
    16 trained codewords, 2 Lloyd rounds, query vec_id=0)."""
    return (
        _pq_ctes()
        + "\nSELECT vec_id, approx_dot FROM pq"
        + "\nORDER BY approx_dot DESC, vec_id LIMIT 10"
    )


def _zexpr(ub: str, tb: str) -> str:
    """16-bit Morton/Z-order interleave of two 8-bit keys, as a closed-
    form bit expression (identical integer ops on both engines)."""
    parts = [
        f"((({ub} >> {i}) & 1) << {2 * i}) + ((({tb} >> {i}) & 1) << {2 * i + 1})"
        for i in range(8)
    ]
    return " + ".join(parts)


def _kmeans_ctes(k: int, n_iter: int) -> str:
    """Parameterized DuckDB CTE chain for datapipe.similarity.
    kmeans_iterate (``n_iter`` Lloyd rounds unrolled; micro-unit integer
    centroid updates so round N+1's inputs are bit-identical across
    engines). Ends with ``c{n_iter}`` = (centroid_id, cv) and
    ``u{n_iter}`` = (centroid_id, dim, centroid_val); callers append
    their final SELECT."""
    assign = """SELECT vec_id, centroid_id FROM (
    SELECT e.vec_id, c.centroid_id,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY round(list_dot_product(e.v, c.cv) /
                   (sqrt(list_dot_product(e.v, e.v)) *
                    sqrt(list_dot_product(c.cv, c.cv))), 4) DESC,
                   c.centroid_id) AS rn
    FROM emb e CROSS JOIN {cents} c) WHERE rn = 1"""
    update = """SELECT ex.centroid_id, ex.dim, floor(sum(ex.xm)::DOUBLE / count(*) / 100.0 + 0.5) / 10000.0 AS centroid_val
  FROM (
    SELECT a.centroid_id, generate_subscripts(e.v, 1)::BIGINT AS dim,
           floor(unnest(e.v) * 1000000 + 0.5)::BIGINT AS xm
    FROM emb e JOIN {assign} a ON e.vec_id = a.vec_id) ex
  GROUP BY ex.centroid_id, ex.dim"""
    parts = [
        "emb AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)",
        f"c0 AS (SELECT vec_id AS centroid_id, v AS cv FROM emb"
        f" WHERE vec_id < {k})",
    ]
    for r in range(1, n_iter + 1):
        parts.append(f"a{r} AS ({assign.format(cents=f'c{r - 1}')})")
        parts.append(f"u{r} AS ({update.format(assign=f'a{r}')})")
        parts.append(
            f"c{r} AS (SELECT centroid_id, list(centroid_val ORDER BY dim)"
            f" AS cv FROM u{r} GROUP BY centroid_id)"
        )
    return "WITH " + ",\n".join(parts)


def _kmeans_iter_sql() -> str:
    """DuckDB twin of datapipe.similarity.kmeans_iterate (k=4, 2 Lloyd
    rounds)."""
    return _kmeans_ctes(4, 2) + "\nSELECT centroid_id, dim, centroid_val FROM u2"


def _simhash_pairs_oracle() -> str:
    """Banded SimHash pair oracle: the full signature CTE from
    ``_simhash_oracle`` feeds a 4x4-bit band self-join + Hamming filter."""
    return f"""WITH sig AS ({_simhash_oracle()}),
bands AS (
  SELECT doc_id, simhash, j, (simhash >> (4 * j)) & 15 AS band
  FROM sig, unnest([0, 1, 2, 3]) AS u(j)
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
         bit_count(xor(a.simhash, b.simhash))::BIGINT AS hamming
  FROM bands a JOIN bands b
    ON a.j = b.j AND a.band = b.band AND a.doc_id < b.doc_id
)
SELECT id_a, id_b, hamming FROM cand WHERE hamming <= 3"""


_GOPHER_KEEP = """(len(string_split(text, ' ')) BETWEEN 30 AND 100000)
    AND (round((len(text) - (len(string_split(text, ' ')) - 1))
               / len(string_split(text, ' ')), 4) BETWEEN 3.0 AND 10.0)
    AND (len(list_filter(string_split(text, ' '),
             t -> list_contains(['the','and','of','a'], t))) >= 2)
    AND (round(len(list_filter(string_split(text, ' '),
             t -> regexp_matches(t, '^[0-9]+$')))
               / len(string_split(text, ' ')), 4) <= 0.2)"""


def _pipeline_e2e_sql() -> str:
    """Oracle for the composed pipeline: each stage's SQL is the SAME
    logic as its standalone oracle (gopher keep expr, the recursive
    component walk re-rooted on the quality-kept set, the 13-gram
    decontamination join, the md5 mix rule), chained through CTEs."""
    comp = ORACLES["doc_dup_components"].replace("FROM documents", "FROM q")
    return f"""WITH q AS (
  SELECT doc_id, text, source,
         len(string_split(text, ' '))::BIGINT AS n_words
  FROM documents
  WHERE {_GOPHER_KEEP}
),
canon AS (
  SELECT q2.doc_id, q2.text, q2.source, q2.n_words
  FROM q q2 JOIN ({comp}) c
    ON q2.doc_id = c.doc_id AND c.doc_id = c.component
),
ev AS (
  SELECT DISTINCT unnest({_SHINGLE13}) AS sh
  FROM documents WHERE doc_id % 50 = 0
),
tr AS (
  SELECT doc_id, unnest({_SHINGLE13}) AS sh
  FROM canon WHERE doc_id % 50 <> 0
),
tot AS (SELECT doc_id, count(*)::BIGINT AS n_sh FROM tr GROUP BY doc_id),
hits AS (SELECT t.doc_id, count(*)::BIGINT AS n FROM tr t JOIN ev USING (sh)
         GROUP BY t.doc_id),
clean AS (
  SELECT c.doc_id, c.source, c.n_words FROM canon c
  LEFT JOIN tot ON tot.doc_id = c.doc_id
  LEFT JOIN hits h ON h.doc_id = c.doc_id
  WHERE c.doc_id % 50 <> 0
    AND coalesce(h.n, 0)::DOUBLE / coalesce(tot.n_sh, 1)::DOUBLE < 0.8
)
SELECT doc_id, source, n_words FROM clean
WHERE ('0x' || substr(md5(doc_id::VARCHAR || 'mix'), 1, 15))::BIGINT % 100 <
      CASE WHEN source = 'src0' THEN 50
           WHEN source IN ('src1', 'src2', 'src3') THEN 25
           ELSE 10 END"""


def _znorm_scores(embeddings):
    """Per-vector summed-squared-z QC score (vec_id, z2_score) —
    shared by ``emb_znorm_outliers`` and the embedding-intake
    pipeline's gate stage."""
    emb = embeddings.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    exploded = emb.select(
        "vec_id", F.posexplode("e").alias("pos", "x")
    ).select("vec_id", (F.col("pos") + 1).cast("long").alias("dim"), "x")
    stats = exploded.groupBy("dim").agg(
        F.sum(F.floor(F.col("x") * 1000000.0 + F.lit(0.5)).cast("long")).alias("sx"),
        F.sum(
            F.floor(F.col("x") * F.col("x") * 100000000.0 + F.lit(0.5)).cast("long")
        ).alias("sx2"),
        F.count(F.lit(1)).alias("n"),
    )
    mean = F.col("sx").cast("double") / F.lit(1000000.0) / F.col("n")
    var = (
        F.col("sx2").cast("double") / F.lit(100000000.0) / F.col("n") - mean * mean
    )
    ms = stats.select(
        "dim", mean.alias("mean"), F.sqrt(F.greatest(var, F.lit(1e-12))).alias("std")
    )
    z = (F.col("x") - F.col("mean")) / F.col("std")
    scores = (
        exploded.join(F.broadcast(ms), "dim")
        .select(
            "vec_id",
            F.floor(z * z * 1000000.0 + F.lit(0.5)).cast("long").alias("z2m"),
        )
        .groupBy("vec_id")
        .agg(
            (
                F.floor(F.sum("z2m").cast("double") / F.lit(100.0) + F.lit(0.5))
                / F.lit(10000.0)
            ).alias("z2_score")
        )
    )
    return scores


def _containment_sql() -> str:
    """LSH candidates (the doc_lsh_pairs SQL) + exact directed
    containment over the candidates' shingle sets."""
    return f"""WITH cand AS ({ORACLES["doc_lsh_pairs"]}),
sizes AS (
  SELECT doc_id, count(*)::BIGINT AS n_sh FROM (
    SELECT doc_id, unnest({_SHINGLE5}) AS shingle FROM documents
  ) GROUP BY doc_id
),
inter AS (
  SELECT c.id_a, c.id_b, count(*)::BIGINT AS n_common
  FROM cand c
  JOIN (SELECT doc_id, unnest({_SHINGLE5}) AS shingle FROM documents) a
    ON a.doc_id = c.id_a
  JOIN (SELECT doc_id, unnest({_SHINGLE5}) AS shingle FROM documents) b
    ON b.doc_id = c.id_b AND b.shingle = a.shingle
  GROUP BY c.id_a, c.id_b
)
SELECT i.id_a, i.id_b,
       floor(n_common::DOUBLE / sa.n_sh * 10000 + 0.5) / 10000.0 AS containment_ab,
       floor(n_common::DOUBLE / sb.n_sh * 10000 + 0.5) / 10000.0 AS containment_ba
FROM inter i
JOIN sizes sa ON sa.doc_id = i.id_a
JOIN sizes sb ON sb.doc_id = i.id_b
WHERE greatest(n_common::DOUBLE / sa.n_sh, n_common::DOUBLE / sb.n_sh) >= 0.5"""


_SHINGLE5 = (
    "list_distinct([substr(text, i, 5) for i in range(1, greatest(len(text) - 3, 1))])"
)


def _containment_reps_sql() -> str:
    """The containment SQL re-rooted on one representative per distinct
    text (min doc_id), the coded collapse-first scale path."""
    body = _containment_sql().replace("FROM documents", "FROM reps")
    return f"""WITH reps AS (
  SELECT min(doc_id)::BIGINT AS doc_id, text
  FROM documents GROUP BY text
),
res AS ({body})
SELECT * FROM res"""


def _simhash_wide_pairs_oracle() -> str:
    """60-bit SimHash (the full signature CTE at n_bits=60) + 4×15-bit
    band self-join + Hamming filter — the Manku-style scale twin of
    ``doc_simhash_pairs``."""
    return f"""WITH sig AS ({_simhash_oracle(60)}),
bands AS (
  SELECT doc_id, simhash, j, (simhash >> (15 * j)) & 32767 AS band
  FROM sig, unnest([0, 1, 2, 3]) AS u(j)
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
         bit_count(xor(a.simhash, b.simhash))::BIGINT AS hamming
  FROM bands a JOIN bands b
    ON a.j = b.j AND a.band = b.band AND a.doc_id < b.doc_id
)
SELECT id_a, id_b, hamming FROM cand WHERE hamming <= 3"""


def _bm25_micro(docs, terms):
    """Okapi BM25 (k1=1.2, b=0.75) per-document integer micro-unit
    scores for a fixed term list — shared by ``doc_bm25_topk`` and the
    hybrid-fusion query. Returns (doc_id, s_micro) for docs matching
    at least one term."""
    toks = docs.select(
        "doc_id", F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("w")
    )
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("len"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("len").alias("n_toks")
    )
    qtoks = toks.filter(F.col("w").isin(*terms))
    df = qtoks.groupBy(F.col("w").alias("term")).agg(
        F.countDistinct("doc_id").alias("df")
    )
    idf = df.crossJoin(F.broadcast(stats)).select(
        "term",
        F.floor(
            F.log(
                F.lit(1.0)
                + (F.col("n_docs").cast("double") - F.col("df").cast("double") + 0.5)
                / (F.col("df").cast("double") + 0.5)
            )
            * 1000000
            + F.lit(0.5)
        ).cast("long").alias("idf_micro"),
    )
    tf = qtoks.groupBy("doc_id", F.col("w").alias("term")).agg(
        F.count(F.lit(1)).alias("tf")
    )
    tfd = F.col("tf").cast("double")
    term_micro = F.floor(
        F.col("idf_micro").cast("double") / F.lit(1000000.0)
        * (tfd * F.lit(2.2))
        / (
            tfd
            + F.lit(1.2)
            * (
                F.lit(0.25)
                + F.lit(0.75)
                * F.col("len").cast("double")
                * F.col("n_docs").cast("double")
                / F.col("n_toks").cast("double")
            )
        )
        * 1000000
        + F.lit(0.5)
    ).cast("long")
    return (
        tf.join(F.broadcast(idf), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select("doc_id", term_micro.alias("term_micro"))
        .groupBy("doc_id")
        .agg(F.sum("term_micro").alias("s_micro"))
    )


def _ewma_sql() -> str:
    """DuckDB oracle for ev_ewma_anomaly: 30 explicit lag columns, exact
    half-life-1-day weights 2^(30-k), HUGEINT num/den folds."""
    lags = ",\n         ".join(
        f"lag(x, {k}) OVER (ORDER BY day) AS g{k}" for k in range(1, 31)
    )
    num = " + ".join(
        f"CASE WHEN g{k} IS NOT NULL THEN g{k}::HUGEINT * {2 ** (30 - k)} ELSE 0 END"
        for k in range(1, 31)
    )
    den = " + ".join(
        f"CASE WHEN g{k} IS NOT NULL THEN {2 ** (30 - k)}::HUGEINT ELSE 0 END"
        for k in range(1, 31)
    )
    return f"""WITH daily AS (
  SELECT ts::DATE AS day, count(*)::BIGINT AS x FROM events GROUP BY day
),
l AS (
  SELECT day, x,
         {lags}
  FROM daily
),
f AS (
  SELECT day, x, ({num}) AS num, ({den}) AS den
  FROM l WHERE g1 IS NOT NULL
)
SELECT day, x,
       floor(num::DOUBLE / den::DOUBLE * 10000 + 0.5) / 10000.0 AS ewma,
       floor((x::HUGEINT * den - num)::DOUBLE / num::DOUBLE * 10000 + 0.5) / 10000.0 AS dev_ratio,
       abs(floor((x::HUGEINT * den - num)::DOUBLE / num::DOUBLE * 10000 + 0.5)) > 5000 AS flag
FROM f"""


_HALF_SIG = (
    "list_sum(list_transform(range(1, 33),"
    " i -> CASE WHEN embedding[i + {off}] > 0"
    " THEN (1::BIGINT << (i - 1)) ELSE 0 END))::BIGINT"
)


def _bot_screen(ev):
    """Per-user behavioral bot scorecard (user_id, n_events,
    events_per_min, iat_cv, bot_flag) — shared by ``ev_bot_detection``
    and the event-intake pipeline's gate stage."""
    wu = Window.partitionBy("user_id").orderBy(
        F.unix_micros("ts"), F.col("event_id")
    )
    iat = ev.select(
        "user_id",
        (F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(wu)).alias("d"),
    ).filter(F.col("d").isNotNull())

    def dec(c):
        return c.cast("decimal(18,0)")

    usr = iat.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.sum("d").cast("long").alias("span_us"),
        F.sum(dec(F.col("d")) * dec(F.col("d")))
        .cast("decimal(38,0)")
        .alias("d2"),
    )
    from etl__project_spark.operators.quality import bot_scorecard

    return bot_scorecard(usr, min_gaps=19)


_WORD_GRAPH_SQL = r"""toks AS (
  SELECT string_split_regex(lower(text), '\s+') AS t FROM documents
),
bi AS (
  SELECT DISTINCT t[i] AS w_a, t[i+1] AS w_b
  FROM toks, unnest(generate_series(1, len(t) - 1)) AS u(i)
  WHERE t[i] <> t[i+1]
),
edges AS (
  SELECT w_a AS src, w_b AS dst FROM bi
  UNION
  SELECT w_b AS src, w_a AS dst FROM bi
),
deg AS (SELECT src, count(*)::BIGINT AS d FROM edges GROUP BY src)"""


def _textrank_iter_sql(prev: str, out: str) -> str:
    """One unrolled TextRank power-iteration CTE (DuckDB dialect)."""
    return f"""{out} AS (
  SELECT e.dst AS word,
         (150000 + floor(0.85 * sum(floor(s.s::DOUBLE / d.d::DOUBLE)::BIGINT)))::BIGINT AS s
  FROM edges e
  JOIN {prev} s ON e.src = s.word
  JOIN deg d ON e.src = d.src
  GROUP BY e.dst
)"""


def _kcore_iter_sql(prev: str, out: str) -> str:
    """One unrolled h-index iteration CTE (DuckDB dialect)."""
    return f"""{out} AS (
  SELECT dst AS word, max(least(rn, c))::BIGINT AS c
  FROM (
    SELECT e.dst, s.c,
           row_number() OVER (PARTITION BY e.dst ORDER BY s.c DESC) AS rn
    FROM edges e JOIN {prev} s ON e.src = s.word
  )
  GROUP BY dst
)"""


def _ppr_iter_sql(prev: str, out: str, seed: str) -> str:
    """One unrolled personalized-PageRank iteration CTE (DuckDB)."""
    return f"""{out} AS (
  SELECT e.dst AS word,
         ((CASE WHEN e.dst = '{seed}' THEN 150000 ELSE 0 END)
          + floor(0.85 * sum(floor(s.s::DOUBLE / d.d::DOUBLE)::BIGINT)))::BIGINT AS s
  FROM edges e
  JOIN {prev} s ON e.src = s.word
  JOIN deg d ON e.src = d.src
  GROUP BY e.dst
)"""


def _event_edge_liveness(spark, sf_dir):
    """Shared derivation for the graph-CDC queries: the event-grain
    churn script folded into edge multiplicities, surfacing only
    0 ↔ >0 liveness transitions — (initial live edges, conformal
    signed batches). See ``ev_triangles_cdc`` for the script."""
    from etl__project_spark.datapipe.graph import edge_liveness_deltas

    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id")
    m10 = F.col("event_id") % 10

    def edge_rows(df, shift, sign):
        a = F.pmod(F.col("event_id") * 13, F.lit(211))
        b = F.pmod(F.col("event_id") * 29 + F.col("user_id") + F.lit(shift),
                   F.lit(211))
        return (
            df.select(a.alias("a"), b.alias("b"))
            .filter(F.col("a") != F.col("b"))
            .select(
                F.least("a", "b").alias("u"),
                F.greatest("a", "b").alias("v"),
                F.lit(sign).cast("long").alias("sign"),
            )
        )

    initial = ev.filter(m10 != 4)
    upd = ev.filter(m10 == 3)
    batch_rows = [
        edge_rows(upd, 0, -1)
        .unionByName(edge_rows(upd, 5, 1))
        .unionByName(edge_rows(ev.filter(m10 == 4), 0, 1)),
        edge_rows(ev.filter(m10 == 7), 0, -1),
    ]
    mult = state_checkpoint(
        edge_rows(initial, 0, 1)
        .groupBy("u", "v")
        .agg(F.sum("sign").cast("long").alias("m")),
        table_sized=True,
    )
    live0 = mult.filter(F.col("m") > 0).select("u", "v")
    liveness_batches = []
    for rows in batch_rows:
        delta_mult = rows.groupBy("u", "v").agg(
            F.sum("sign").cast("long").alias("dm")
        )
        liveness_batches.append(
            state_checkpoint(edge_liveness_deltas(mult, delta_mult), table_sized=False)
        )
        mult = state_checkpoint(
            mult.unionByName(delta_mult.select("u", "v", F.col("dm").alias("m")))
            .groupBy("u", "v")
            .agg(F.sum("m").cast("long").alias("m"))
            .filter(F.col("m") != 0),
            table_sized=True,
        )
    return live0, liveness_batches
