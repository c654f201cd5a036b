"""Document/text pipeline queries: dedup, LSH, quality, BM25/DSIR, text indexes.

Split out of the monolithic catalog.py in round 9 (VERDICT r8 #7);
query bodies and oracle SQL unchanged — the 256-query oracle gate is
the safety net."""

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
    "doc_text_stats",
    """SELECT doc_id,
       len(text)::BIGINT AS n_chars,
       len(string_split(text, ' '))::BIGINT AS n_tokens,
       len(list_distinct(string_split(text, ' ')))::BIGINT AS n_distinct_tokens,
       round(len(list_distinct(string_split(text, ' '))) / len(string_split(text, ' ')), 4) AS distinct_ratio,
       len(regexp_replace(text, '[^.,!?;:]', '', 'g'))::BIGINT AS n_punct,
       round(len(regexp_replace(text, '[^.,!?;:]', '', 'g')) / len(text), 4) AS punct_ratio,
       round((len(text) - (len(string_split(text, ' ')) - 1)) / len(string_split(text, ' ')), 4) AS mean_token_len
FROM documents""",
)
def doc_text_stats(spark, sf_dir):
    """Quality scoring: per-document char/token/punctuation metrics."""
    return text_stats(load_table(spark, sf_dir, "documents"))


@query(
    "doc_lang_id",
    """WITH h AS (
  SELECT doc_id,
    len(list_filter(string_split(text,' '), t -> list_contains(['the','and','of'], t)))::BIGINT AS hits_en,
    len(list_filter(string_split(text,' '), t -> list_contains(['el','la','de'], t)))::BIGINT AS hits_es,
    len(list_filter(string_split(text,' '), t -> list_contains(['der','die','und'], t)))::BIGINT AS hits_de,
    len(list_filter(string_split(text,' '), t -> list_contains(['le','la','et'], t)))::BIGINT AS hits_fr
  FROM documents
)
SELECT doc_id, hits_en, hits_es, hits_de, hits_fr,
  CASE WHEN hits_en = greatest(hits_en, hits_es, hits_de, hits_fr) AND greatest(hits_en, hits_es, hits_de, hits_fr) > 0 THEN 'en'
       WHEN hits_es = greatest(hits_en, hits_es, hits_de, hits_fr) AND greatest(hits_en, hits_es, hits_de, hits_fr) > 0 THEN 'es'
       WHEN hits_de = greatest(hits_en, hits_es, hits_de, hits_fr) AND greatest(hits_en, hits_es, hits_de, hits_fr) > 0 THEN 'de'
       WHEN hits_fr = greatest(hits_en, hits_es, hits_de, hits_fr) AND greatest(hits_en, hits_es, hits_de, hits_fr) > 0 THEN 'fr'
       ELSE 'und' END AS lang_guess
FROM h""",
)
def doc_lang_id(spark, sf_dir):
    """Language-ID heuristic via stopword-marker overlap."""
    return lang_id_heuristic(load_table(spark, sf_dir, "documents"))


@query(
    "doc_fingerprint",
    r"""SELECT doc_id, md5(text) AS fingerprint,
       md5(regexp_replace(trim(text), '\s+', ' ', 'g')) AS fingerprint_norm
FROM documents""",
)
def doc_fingerprint_q(spark, sf_dir):
    """Content fingerprinting (exact + whitespace-normalized md5)."""
    return doc_fingerprint(load_table(spark, sf_dir, "documents"))


@query(
    "doc_entropy",
    """WITH tok AS (
  SELECT doc_id, len(string_split(text, ' ')) AS n,
         unnest(string_split(text, ' ')) AS t
  FROM documents
),
cnt AS (
  SELECT doc_id, n, count(*) AS c FROM tok GROUP BY doc_id, n, t
)
SELECT doc_id, n::BIGINT AS n_tokens,
       round(-sum((c / n) * log2(c / n)), 4) AS entropy_bits,
       round(CASE WHEN n > 1 THEN -sum((c / n) * log2(c / n)) / log2(n)
                  ELSE 0.0 END, 4) AS entropy_norm
FROM cnt GROUP BY doc_id, n""",
)
def doc_entropy(spark, sf_dir):
    """Token-distribution Shannon entropy per document (perplexity-proxy
    quality filter). The Spark side is a pure in-row map stage (nested
    array lambdas, no shuffle); the oracle recomputes it relationally
    (explode → count → sum)."""
    from etl__project_spark.datapipe.text import token_entropy

    return token_entropy(load_table(spark, sf_dir, "documents"))


@query(
    "doc_chunks",
    """WITH c AS (
  SELECT doc_id,
         [substr(text, (i - 1) * 200 + 1, 200)
          for i in range(1, (ceil(len(text) / 200.0))::INT + 1)] AS arr
  FROM documents
)
SELECT doc_id, generate_subscripts(arr, 1)::BIGINT AS chunk_id,
       unnest(arr) AS chunk_text,
       len(unnest(arr))::BIGINT AS n_chars
FROM c""",
)
def doc_chunks(spark, sf_dir):
    """Fixed-width chunk emission (context-window data prep): split each
    document into 200-char chunks with stable 1-based chunk ids — a
    narrow posexplode, no shuffle. DuckDB oracle uses the
    generate_subscripts + unnest twin (1-based, so Spark pos + 1)."""
    docs = load_table(spark, sf_dir, "documents")
    arr = F.expr(
        "transform(sequence(1, cast(ceil(length(text) / 200.0) as int)),"
        " i -> substring(text, (i - 1) * 200 + 1, 200))"
    )
    return docs.select(
        "doc_id", F.posexplode(arr).alias("pos", "chunk_text")
    ).select(
        "doc_id",
        (F.col("pos") + 1).cast("long").alias("chunk_id"),
        "chunk_text",
        F.length("chunk_text").cast("long").alias("n_chars"),
    )


@query(
    "doc_pack_sequences",
    """WITH g AS (
  SELECT doc_id, len(string_split(text, ' '))::BIGINT AS n_tokens,
         doc_id % 32 AS grp
  FROM documents
),
s AS (
  SELECT doc_id, n_tokens, grp,
         (sum(n_tokens) OVER (PARTITION BY grp ORDER BY doc_id
                              ROWS UNBOUNDED PRECEDING) - n_tokens) AS start
  FROM g
)
SELECT doc_id, n_tokens,
       (grp * 4294967296 + (start // 512))::BIGINT AS pack_id,
       start::BIGINT AS start_offset
FROM s""",
)
def doc_pack_sequences(spark, sf_dir):
    """Sequence packing (concat-and-chunk) — every document placed into a
    fixed 512-token training sequence via hash-grouped parallel streams
    and one partitioned running-sum window; see
    ``datapipe/sampling.py:pack_sequences`` for why this, and not
    first-fit bin packing, is the parallelizable production formulation."""
    from etl__project_spark.datapipe.sampling import pack_sequences

    return pack_sequences(load_table(spark, sf_dir, "documents"))


@query(
    "doc_upsample_epochs",
    """WITH w AS (
  SELECT doc_id, source,
         CASE WHEN source IN ('src0', 'src1') THEN 2.5
              WHEN source = 'src2' THEN 0.5 ELSE 1.0 END AS epochs
  FROM documents
),
rep AS (
  SELECT doc_id, source, epochs, unnest(range(1, ceil(epochs)::INT + 1)) AS epoch
  FROM w
),
kept AS (
  SELECT doc_id, source, epoch FROM rep
  WHERE epoch <= floor(epochs)
     OR ('0x' || substr(md5(doc_id::VARCHAR || 'ep' || epoch), 1, 15))::BIGINT % 100
        < (epochs - floor(epochs)) * 100
)
SELECT source, count(*)::BIGINT AS n_rows,
       count(DISTINCT doc_id)::BIGINT AS n_docs
FROM kept GROUP BY source""",
)
def doc_upsample_epochs(spark, sf_dir):
    """Epoch upsampling (temperature-style mixing, the UPWARD half that
    ``doc_dataset_mix``'s rate-based downsampling cannot express): each
    source gets a fractional epoch weight — 2.5 epochs means two full
    copies plus a deterministic hash-chosen half — via a narrow
    explode(sequence) + hash filter. No shuffle until the audit
    aggregate; repetition is reproducible across runs/engines/partitions
    because the fractional keep-set is keyed on (doc_id, epoch), never
    on random()."""
    from etl__project_spark.datapipe.sampling import hash_bucket

    docs = load_table(spark, sf_dir, "documents")
    epochs = (
        F.when(F.col("source").isin("src0", "src1"), F.lit(2.5))
        .when(F.col("source") == "src2", F.lit(0.5))
        .otherwise(F.lit(1.0))
    )
    rep = docs.select(
        "doc_id", "source", epochs.alias("epochs")
    ).select(
        "doc_id",
        "source",
        "epochs",
        F.explode(
            F.sequence(F.lit(1), F.ceil("epochs").cast("int"))
        ).alias("epoch"),
    )
    frac_keep = hash_bucket(
        F.concat(F.col("doc_id").cast("string"), F.lit("ep"), F.col("epoch")),
        100,
        salt="",
    ) < (F.col("epochs") - F.floor("epochs")) * 100
    kept = rep.filter((F.col("epoch") <= F.floor("epochs")) | frac_keep)
    return kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("doc_id").alias("n_docs"),
    )


@query(
    "doc_dedup_exact",
    """SELECT md5(text) AS content_hash, min(doc_id)::BIGINT AS keep_id,
       count(*)::BIGINT AS n_copies
FROM documents GROUP BY md5(text)""",
)
def doc_dedup_exact(spark, sf_dir):
    """Exact dedup: hash-groupBy keeper selection."""
    return dedup_exact(load_table(spark, sf_dir, "documents"))


@query(
    "doc_shingle_count",
    f"""SELECT doc_id, len({_SHINGLE_LIST})::BIGINT AS n_shingles
FROM documents""",
)
def doc_shingle_count(spark, sf_dir):
    """Character 5-gram shingling (the MinHash input stage)."""
    sh = char_shingles(load_table(spark, sf_dir, "documents"))
    return sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))


@query(
    "doc_minhash_sig",
    f"""WITH sh AS (
  SELECT doc_id, unnest({_SHINGLE_LIST}) AS shingle FROM documents
)
SELECT doc_id,
  min((506952115 * (('0x' || substr(md5(shingle), 1, 15))::BIGINT % 2147483647) + 1779033703) % 2147483647) AS h0,
  min((1013904229 * (('0x' || substr(md5(shingle), 1, 15))::BIGINT % 2147483647) + 1410583759) % 2147483647) AS h1,
  min((1520856343 * (('0x' || substr(md5(shingle), 1, 15))::BIGINT % 2147483647) + 1042133815) % 2147483647) AS h2,
  min((2027808457 * (('0x' || substr(md5(shingle), 1, 15))::BIGINT % 2147483647) + 673683871) % 2147483647) AS h3,
  min((387276923 * (('0x' || substr(md5(shingle), 1, 15))::BIGINT % 2147483647) + 305233927) % 2147483647) AS h4,
  min((894229037 * (('0x' || substr(md5(shingle), 1, 15))::BIGINT % 2147483647) + 2084267630) % 2147483647) AS h5,
  min((1401181151 * (('0x' || substr(md5(shingle), 1, 15))::BIGINT % 2147483647) + 1715817686) % 2147483647) AS h6,
  min((1908133265 * (('0x' || substr(md5(shingle), 1, 15))::BIGINT % 2147483647) + 1347367742) % 2147483647) AS h7
FROM sh GROUP BY doc_id""",
)
def doc_minhash_sig(spark, sf_dir):
    """MinHash signatures (8 engine-portable md5-order hash functions).

    Shingles stay non-distinct (duplicates can't change a min) — skips the
    quadratic per-row array_distinct."""
    sh = char_shingles(load_table(spark, sf_dir, "documents"), distinct=False)
    return minhash_signature(sh, n_hashes=8)


@query(
    "doc_lsh_pairs",
    f"""WITH sh AS (
  SELECT doc_id, unnest({_SHINGLE_LIST}) AS shingle FROM documents
),
sig AS (
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
),
bands AS (
  SELECT doc_id, 0 AS band_id,
         md5(h0::VARCHAR || h1::VARCHAR || h2::VARCHAR || h3::VARCHAR) AS band_hash FROM sig
  UNION ALL
  SELECT doc_id, 1 AS band_id,
         md5(h4::VARCHAR || h5::VARCHAR || h6::VARCHAR || h7::VARCHAR) AS band_hash FROM sig
)
SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
FROM bands a JOIN bands b
  ON a.band_id = b.band_id AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id""",
)
def doc_lsh_pairs(spark, sf_dir):
    """MinHash-LSH candidate near-dup pairs via band-bucket self-join.

    The self-join's two sides share ONE signature computation without
    any cache (VERDICT r11 #7, guide §2.2): both sides contain the
    identical ``Exchange hashpartitioning(doc_id)`` under the minhash
    aggregate, so AQE's runtime stage reuse materializes the shuffle
    once and the second consumer's stages are skipped — verified in the
    event log (one 32-task md5 map stage per run). The previous
    persist + count guarded against the broadcast build and probe
    racing a lazily-cached plan; with no cache there is nothing to
    race, the count job disappears, and no executor memory is pinned."""
    sh = char_shingles(load_table(spark, sf_dir, "documents"), distinct=False)
    sig = minhash_signature(sh, n_hashes=8)
    return lsh_candidate_pairs(sig, n_bands=2, rows_per_band=4)


@query(
    "doc_lsh_recall_audit",
    f"""WITH s AS (
  SELECT doc_id, {_SHINGLE_LIST} AS shingles FROM documents WHERE len(text) >= 5
),
exact AS (
  SELECT id_a, id_b FROM (
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           len(list_intersect(a.shingles, b.shingles)) /
           len(list_distinct(a.shingles || b.shingles)) AS j
    FROM s a JOIN s b ON a.doc_id < b.doc_id
  ) WHERE j >= 0.35
),
sh AS (
  SELECT doc_id, unnest({_SHINGLE_LIST}) AS shingle FROM documents
),
sig AS ({_LSH_SQL_SIG}),
bands AS (
  SELECT doc_id, 0 AS band_id,
         md5(h0::VARCHAR || h1::VARCHAR || h2::VARCHAR || h3::VARCHAR) AS band_hash FROM sig
  UNION ALL
  SELECT doc_id, 1 AS band_id,
         md5(h4::VARCHAR || h5::VARCHAR || h6::VARCHAR || h7::VARCHAR) AS band_hash FROM sig
),
lsh AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b
    ON a.band_id = b.band_id AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id
)
SELECT count(*)::BIGINT AS n_true,
       count(l.id_a)::BIGINT AS n_hit,
       round(count(l.id_a) / count(*), 4) AS recall
FROM exact e LEFT JOIN lsh l ON e.id_a = l.id_a AND e.id_b = l.id_b""",
)
def doc_lsh_recall_audit(spark, sf_dir):
    """Recall audit for the approximate text-dedup path: what fraction of
    the TRUE near-dup pairs (J >= 0.35, from the lossless prefix join)
    does MinHash-LSH banding (2 bands x 4 rows) surface as candidates?
    Both sides are md5-deterministic, so the audit itself is
    oracle-checkable — the text twin of ``emb_ann_recall_audit``, and
    the number that justifies (or vetoes) routing a corpus through the
    lossy path when the exact join is too expensive for it."""
    docs = load_table(spark, sf_dir, "documents")
    exact = jaccard_prefix_pairs(docs, threshold=0.35).select("id_a", "id_b")
    sig = minhash_signature(
        char_shingles(docs, distinct=False), n_hashes=8
    ).persist()
    sig.count()
    lsh = lsh_candidate_pairs(sig, n_bands=2, rows_per_band=4).withColumn(
        "hit", F.lit(1)
    )
    return (
        exact.join(lsh, ["id_a", "id_b"], "left")
        .agg(
            F.count(F.lit(1)).alias("n_true"),
            F.count("hit").alias("n_hit"),
            F.round(F.count("hit") / F.count(F.lit(1)), 4).alias("recall"),
        )
    )


@query("doc_simhash", _simhash_oracle())
def doc_simhash(spark, sf_dir):
    """SimHash document signatures (16-bit, md5-bit source)."""
    return simhash(load_table(spark, sf_dir, "documents"))


@query(
    "doc_jaccard_pairs",
    f"""WITH s AS (
  SELECT doc_id, len(text) // 50 AS len_bucket, {_SHINGLE_LIST} AS shingles
  FROM documents
)
SELECT id_a, id_b, jaccard FROM (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         round(len(list_intersect(a.shingles, b.shingles)) /
               len(list_distinct(a.shingles || b.shingles)), 4) AS jaccard
  FROM s a JOIN s b ON a.len_bucket = b.len_bucket AND a.doc_id < b.doc_id
  UNION ALL
  SELECT least(a.doc_id, b.doc_id), greatest(a.doc_id, b.doc_id),
         round(len(list_intersect(a.shingles, b.shingles)) /
               len(list_distinct(a.shingles || b.shingles)), 4)
  FROM s a JOIN s b ON a.len_bucket + 1 = b.len_bucket
) WHERE jaccard >= 0.2""",
)
def doc_jaccard_pairs(spark, sf_dir):
    """n-gram Jaccard near-dup pairs — length-bucketed pair space with
    adjacent-bucket union (boundary-straddling near-dups not missed)."""
    return ngram_jaccard_pairs(load_table(spark, sf_dir, "documents"))


@query(
    "doc_jaccard_prefix",
    f"""WITH s AS (
  SELECT doc_id, {_SHINGLE_LIST} AS shingles FROM documents WHERE len(text) >= 5
)
SELECT id_a, id_b, jaccard FROM (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         round(len(list_intersect(a.shingles, b.shingles)) /
               len(list_distinct(a.shingles || b.shingles)), 4) AS jaccard
  FROM s a JOIN s b ON a.doc_id < b.doc_id
) WHERE jaccard >= 0.35""",
)
def doc_jaccard_prefix(spark, sf_dir):
    """Lossless Jaccard near-dup self-join via frequency-ordered prefix
    filtering (AllPairs/PPJoin). The oracle is the BRUTE-FORCE all-pairs
    scan — a hash match here proves the prefix-filter candidate scheme
    drops no qualifying pair, while the Spark plan's pair space stays
    bounded by rare-shingle collisions (scales where per-bucket quadratic
    blocking cannot; see the sf1 scale sweep)."""
    return jaccard_prefix_pairs(load_table(spark, sf_dir, "documents"))


@query(
    "doc_media_features",
    """SELECT doc_id AS media_id, octet_length(encode(text))::BIGINT AS n_bytes,
       sha256(text) AS content_sha
FROM documents""",
)
def doc_media_features(spark, sf_dir):
    """Multimodal plumbing: opaque binary payloads → mapInPandas
    featurization (decode stubbed; Arrow batching + schema are real)."""
    media = synth_media(load_table(spark, sf_dir, "documents"))
    return extract_features(media, fake=True).select("media_id", "n_bytes", "content_sha")


@query(
    "doc_tfidf_top_terms",
    """WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
tf AS (
  SELECT doc_id, term, count(*)::BIGINT AS n_td FROM tok GROUP BY doc_id, term
),
dfreq AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term),
n AS (SELECT count(*)::BIGINT AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term,
         round(tf.n_td * (ln((n.n_docs + 1.0) / (dfreq.df + 1.0)) + 1.0), 4) AS tfidf
  FROM tf CROSS JOIN n JOIN dfreq ON tf.term = dfreq.term
)
SELECT doc_id, term, tfidf FROM (
  SELECT doc_id, term, tfidf,
         row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rn
  FROM scored
) WHERE rn <= 3""",
)
def doc_tfidf_top_terms(spark, sf_dir):
    """TF-IDF keyword extraction: term frequency × smoothed inverse
    document frequency, top-3 terms per document. Two aggregations + a
    broadcast idf join + a partitioned ranking window — the classic text
    pipeline, all JVM-side. Ordering uses the ROUNDED score (+ term
    tiebreak) so ranking is reproducible across engines."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("n_td"))
    # df counts tf's rows per term; phrasing it as count(CASE WHEN n_td
    # >= 1) — identical, n_td is a never-null count >= 1 — keeps n_td
    # referenced so column pruning cannot specialize this branch's copy
    # of the tf aggregate. Both branches then share one canonical
    # scan→explode→partial-agg→Exchange subtree and Spark's
    # ReuseExchange materializes the token shuffle ONCE instead of
    # scanning + exploding the documents table twice (guide §2.2).
    dfreq = tf.groupBy("term").agg(
        F.count(F.when(F.col("n_td") >= 1, 1)).alias("df")
    )
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.crossJoin(F.broadcast(n))
        .join(F.broadcast(dfreq), "term")
        .select(
            "doc_id",
            "term",
            F.round(
                F.col("n_td")
                * (F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0)) + 1.0),
                4,
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .drop("rn")
    )


@query(
    "doc_dup_components",
    """WITH sh AS (
  SELECT doc_id, unnest(list_distinct([substr(text, i, 5) for i in range(1, greatest(len(text) - 3, 1))])) AS shingle
  FROM documents
),
sig AS (
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
),
bands AS (
  SELECT doc_id, 0 AS band_id,
         md5(h0::VARCHAR || h1::VARCHAR || h2::VARCHAR || h3::VARCHAR) AS band_hash FROM sig
  UNION ALL
  SELECT doc_id, 1 AS band_id,
         md5(h4::VARCHAR || h5::VARCHAR || h6::VARCHAR || h7::VARCHAR) AS band_hash FROM sig
),
pairs AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b
    ON a.band_id = b.band_id AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id
),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION ALL SELECT id_b, id_a FROM pairs
),
walk AS (
  SELECT doc_id AS node, doc_id AS label FROM documents
  UNION
  SELECT e.dst AS node, w.label FROM walk w JOIN edges e ON w.node = e.src
)
SELECT node AS doc_id, min(label)::BIGINT AS component FROM walk GROUP BY node"""
    .replace("WITH ", "WITH RECURSIVE ", 1),
)
def doc_dup_components(spark, sf_dir):
    """Duplicate clustering: exact-dup collapse -> LSH candidate pairs
    over distinct texts -> connected components via iterative min-label
    propagation -> expand members through the content-hash map
    (datapipe.dedup canonical_components; the r5 restructure makes the
    collapse the CODED default rather than prose). Result-identical to
    signing every row — exact dups share every band so LSH connects
    them anyway — but the shingle/signature/band cost is driven by
    distinct texts, not rows. Oracle = a DuckDB recursive CTE computing
    min reachable id over the uncollapsed graph (same result, per the
    identity above). Each component's min doc_id is the canonical
    keeper."""
    from etl__project_spark.datapipe.dedup import canonical_components

    docs = load_table(spark, sf_dir, "documents")
    comp = canonical_components(docs, n_hashes=8, n_bands=2, rows_per_band=4)
    return comp.select(F.col("id").alias("doc_id"), _int(F.col("component")).alias("component"))


@query(
    "doc_token_regex",
    r"""SELECT doc_id,
  len(regexp_split_to_array(trim(text), '\s+'))::BIGINT AS n_ws_tokens,
  len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))::BIGINT AS n_bpe_tokens,
  len(list_filter(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'),
      t -> regexp_matches(t, '^[A-Za-z]+$')))::BIGINT AS n_alpha_tokens,
  len(list_filter(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'),
      t -> regexp_matches(t, '^[0-9]+$')))::BIGINT AS n_num_tokens,
  (len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))
   - len(list_filter(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'),
         t -> regexp_matches(t, '^[A-Za-z]+$')))
   - len(list_filter(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'),
         t -> regexp_matches(t, '^[0-9]+$'))))::BIGINT AS n_sym_tokens
FROM documents""",
)
def doc_token_regex(spark, sf_dir):
    """Token counting: whitespace words vs BPE-ish regex pre-tokenizer
    pieces (datapipe.text.regex_token_counts)."""
    from etl__project_spark.datapipe.text import regex_token_counts

    return regex_token_counts(load_table(spark, sf_dir, "documents"))


@query(
    "doc_passage_dup",
    """WITH idx AS (
  SELECT doc_id, text, unnest(range(0, ((len(text) - 1) // 100) + 1)) AS i
  FROM documents
),
chunks AS (
  SELECT doc_id, md5(substr(text, (i * 100 + 1)::INT, 100)) AS h FROM idx
)
SELECT h, count(DISTINCT doc_id)::BIGINT AS n_docs
FROM chunks GROUP BY h HAVING count(DISTINCT doc_id) > 1""",
)
def doc_passage_dup(spark, sf_dir):
    """Passage-level dedup: documents are chunked into fixed 100-char
    passages via sequence+explode (a generator, not a UDF), each passage
    md5-hashed, and hashes appearing in more than one document reported.
    The 100 TB shape: explode fans out map-side, the group-by shuffles
    only (hash, doc_id) pairs — bytes shuffled ≈ 48B per passage, not
    the text itself."""
    docs = load_table(spark, sf_dir, "documents")
    chunks = docs.select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(0), F.floor((F.length("text") - 1) / 100).cast("int"))
        ).alias("i"),
        "text",
    ).select(
        "doc_id",
        F.md5(F.col("text").substr(F.col("i") * 100 + 1, F.lit(100))).alias("h"),
    )
    return (
        chunks.groupBy("h")
        .agg(F.countDistinct("doc_id").alias("n_docs"))
        .filter(F.col("n_docs") > 1)
    )


@query(
    "doc_source_normalize",
    """SELECT doc_id,
       upper(source) AS src_upper,
       lpad(regexp_extract(source, '[0-9]+$', 0), 4, '0') AS src_num,
       concat('doc-', lpad(doc_id::VARCHAR, 6, '0')) AS doc_key,
       replace(lower(lang), 'en', 'eng') AS lang_norm,
       levenshtein(source, 'src0')::BIGINT AS src_dist,
       length(trim(source))::BIGINT AS src_len
FROM documents""",
)
def doc_source_normalize(spark, sf_dir):
    """String scalar kit beyond the reference's C1-C12: case mapping,
    lpad zero-fill key synthesis, regexp_extract, replace, levenshtein,
    trim/length — all JVM column expressions (whole-stage codegen)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.upper("source").alias("src_upper"),
        F.lpad(F.regexp_extract("source", "[0-9]+$", 0), 4, "0").alias("src_num"),
        F.concat(F.lit("doc-"), F.lpad(F.col("doc_id").cast("string"), 6, "0")).alias(
            "doc_key"
        ),
        F.replace(F.lower("lang"), F.lit("en"), F.lit("eng")).alias("lang_norm"),
        F.levenshtein("source", F.lit("src0")).cast("long").alias("src_dist"),
        F.length(F.trim("source")).cast("long").alias("src_len"),
    )


@query(
    "doc_decontaminate",
    f"""WITH ev AS (
  SELECT DISTINCT unnest({_SHINGLE13}) AS sh
  FROM documents WHERE doc_id % 50 = 0
),
tr AS (
  SELECT doc_id, unnest({_SHINGLE13}) AS sh
  FROM documents WHERE doc_id % 50 <> 0
),
hits AS (
  SELECT doc_id, count(*)::BIGINT AS n FROM tr JOIN ev USING (sh) GROUP BY doc_id
)
SELECT d.doc_id, coalesce(h.n, 0)::BIGINT AS n_shared_shingles,
       coalesce(h.n, 0) > 0 AS contaminated
FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
WHERE d.doc_id % 50 <> 0""",
)
def doc_decontaminate(spark, sf_dir):
    """Benchmark decontamination: training docs sharing any 13-char
    shingle with the held-out eval slice (doc_id % 50 = 0) are flagged —
    the n-gram overlap test run before LLM training. Equi-join on the
    shingle (eval side broadcast); never train x eval pairs."""
    docs = load_table(spark, sf_dir, "documents")
    train = docs.filter(F.col("doc_id") % 50 != 0)
    eval_set = docs.filter(F.col("doc_id") % 50 == 0)
    return contamination_check(train, eval_set, k=13)


@query(
    "doc_dedup_canonical",
    f"""SELECT doc_id FROM ({ORACLES["doc_dup_components"]}) WHERE doc_id = component""",
)
def doc_dedup_canonical(spark, sf_dir):
    """End-to-end near-dup removal: exact-dup collapse -> LSH pairs over
    distinct texts -> connected components -> keep each component's min
    doc_id (the canonical survivor set a training pipeline actually
    materializes). Shares canonical_components with
    doc_dup_components, so the collapse-first composition is the single
    coded path."""
    comp = QUERIES["doc_dup_components"](spark, sf_dir)
    return comp.filter(F.col("doc_id") == F.col("component")).select("doc_id")


@query(
    "doc_quality_gopher",
    """SELECT doc_id,
       len(string_split(text, ' '))::BIGINT AS n_words,
       len(string_split(text, ' ')) BETWEEN 30 AND 100000 AS rule_word_count,
       round((len(text) - (len(string_split(text, ' ')) - 1))
             / len(string_split(text, ' ')), 4) BETWEEN 3.0 AND 10.0 AS rule_mean_word_len,
       len(list_filter(string_split(text, ' '),
           t -> list_contains(['the','and','of','a'], t))) >= 2 AS rule_stopwords,
       round(len(list_filter(string_split(text, ' '),
           t -> regexp_matches(t, '^[0-9]+$')))
             / len(string_split(text, ' ')), 4) <= 0.2 AS rule_numeric_ratio,
       (len(string_split(text, ' ')) BETWEEN 30 AND 100000)
       AND (round((len(text) - (len(string_split(text, ' ')) - 1))
                  / len(string_split(text, ' ')), 4) BETWEEN 3.0 AND 10.0)
       AND (len(list_filter(string_split(text, ' '),
                t -> list_contains(['the','and','of','a'], t))) >= 2)
       AND (round(len(list_filter(string_split(text, ' '),
                t -> regexp_matches(t, '^[0-9]+$')))
                  / len(string_split(text, ' ')), 4) <= 0.2) AS keep
FROM documents""",
)
def doc_quality_gopher(spark, sf_dir):
    """Gopher-style quality gate: word-count bounds, mean-word-length
    window, stopword evidence, numeric-token cap — per-rule booleans plus
    the combined keep flag (filter + rejection audit in one pass)."""
    return quality_rules(load_table(spark, sf_dir, "documents"))


@query(
    "doc_pii_scrub",
    r"""WITH aug AS (
  SELECT doc_id,
         text || ' contact user' || doc_id || '@example.com or 555-'
              || lpad(((doc_id * 7) % 10000)::VARCHAR, 4, '0') AS text
  FROM documents
)
SELECT doc_id,
       len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))::BIGINT AS n_emails,
       len(regexp_extract_all(regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
           '[0-9]{3}-[0-9]{4}'))::BIGINT AS n_phones,
       md5(regexp_replace(regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
           '[0-9]{3}-[0-9]{4}', '[PHONE]', 'g')) AS scrubbed_md5
FROM aug""",
)
def doc_pii_scrub(spark, sf_dir):
    """PII redaction + audit counts. The synthetic corpus carries no PII,
    so each doc is deterministically augmented (on BOTH engines) with a
    doc_id-derived email and phone before scrubbing — the oracle then
    verifies the actual regex-redaction semantics, not an all-zero
    no-op."""
    docs = load_table(spark, sf_dir, "documents")
    aug = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or 555-"),
            F.lpad(((F.col("doc_id") * 7) % 10000).cast("string"), 4, "0"),
        ).alias("text"),
    )
    return pii_scrub(aug)


@query(
    "doc_hash_sample",
    """SELECT doc_id, lang FROM documents
WHERE ('0x' || substr(md5(doc_id::VARCHAR || 'r2'), 1, 15))::BIGINT % 100 < 10""",
)
def doc_hash_sample(spark, sf_dir):
    """Deterministic 10% corpus sample by key hash: reproducible across
    runs/engines/partitionings (df.sample() is not), zero-shuffle narrow
    filter. Salt 'r2' decorrelates from any other sampling pass."""
    docs = load_table(spark, sf_dir, "documents")
    return hash_sample(docs, 10, "doc_id", salt="r2").select("doc_id", "lang")


@query(
    "doc_repetition_ratio",
    """WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents
),
cnt AS (SELECT doc_id, t, count(*) AS c FROM tok GROUP BY doc_id, t),
top AS (SELECT doc_id, max(c) AS top_c FROM cnt GROUP BY doc_id),
base AS (
  SELECT doc_id, len(string_split(text, ' ')) AS n,
         len(list_distinct(string_split(text, ' '))) AS nd
  FROM documents
)
SELECT b.doc_id,
       round(b.n / b.nd, 4) AS dup_factor,
       round(t.top_c / b.n, 4) AS top_token_ratio,
       round(t.top_c / b.n, 4) <= 0.2 AS rule_top_token
FROM base b JOIN top t ON b.doc_id = t.doc_id""",
)
def doc_repetition_ratio(spark, sf_dir):
    """Gopher-style repetition filter: duplication factor (tokens per
    distinct token) and the most-frequent-token share (docs dominated by
    one repeated token are boilerplate). Narrow per-row array exprs —
    the top-token is found inside the row's own token array (sorted by
    count desc then token), no corpus-level shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    n = F.size(toks)
    # per-row top token: aggregate over the distinct tokens of THIS row
    top_cnt = F.array_max(
        F.transform(
            F.array_distinct(toks),
            lambda t: F.size(F.filter(toks, lambda x: x == t)),
        )
    )
    ratio = F.round(top_cnt / n, 4)
    return docs.select(
        "doc_id",
        F.round(n / F.size(F.array_distinct(toks)), 4).alias("dup_factor"),
        ratio.alias("top_token_ratio"),
        (ratio <= 0.2).alias("rule_top_token"),
    )


@query(
    "doc_minhash_est",
    f"""WITH sh AS (
  SELECT doc_id, unnest({_SHINGLE_LIST}) AS shingle FROM documents
),
{_SIG_CTE},
bands AS (
  SELECT doc_id, 0 AS band_id,
         md5(h0::VARCHAR || h1::VARCHAR || h2::VARCHAR || h3::VARCHAR) AS band_hash FROM sig
  UNION ALL
  SELECT doc_id, 1 AS band_id,
         md5(h4::VARCHAR || h5::VARCHAR || h6::VARCHAR || h7::VARCHAR) AS band_hash FROM sig
),
pairs AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b
    ON a.band_id = b.band_id AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id
)
SELECT p.id_a, p.id_b,
       round(((a.h0 = b.h0)::INT + (a.h1 = b.h1)::INT + (a.h2 = b.h2)::INT
            + (a.h3 = b.h3)::INT + (a.h4 = b.h4)::INT + (a.h5 = b.h5)::INT
            + (a.h6 = b.h6)::INT + (a.h7 = b.h7)::INT) / 8.0, 4) AS jaccard_est
FROM pairs p
JOIN sig a ON p.id_a = a.doc_id
JOIN sig b ON p.id_b = b.doc_id""",
)
def doc_minhash_est(spark, sf_dir):
    """MinHash dedup verification: score each LSH candidate pair by the
    fraction of agreeing signature components (an unbiased Jaccard
    estimate). The scoring join touches only the n_hashes-long
    signatures — never the documents — which is the whole reason the
    MinHash ladder scales."""
    from etl__project_spark.datapipe.dedup import minhash_jaccard_estimate

    docs = load_table(spark, sf_dir, "documents")
    sig = minhash_signature(char_shingles(docs, distinct=False), n_hashes=8).persist()
    sig.count()  # materialize: consumed by the band self-join AND two scoring joins
    pairs = lsh_candidate_pairs(sig, n_bands=2, rows_per_band=4)
    return minhash_jaccard_estimate(sig, pairs, n_hashes=8)


@query(
    "doc_dataset_mix",
    """SELECT doc_id, source FROM documents
WHERE ('0x' || substr(md5(doc_id::VARCHAR || 'mix'), 1, 15))::BIGINT % 100 <
      CASE WHEN source = 'src0' THEN 50
           WHEN source IN ('src1', 'src2', 'src3') THEN 25
           ELSE 10 END""",
)
def doc_dataset_mix(spark, sf_dir):
    """Dataset mixing: per-source sampling rates (upweight src0 to 50%,
    srcs 1-3 to 25%, the tail to 10%) via the deterministic hash bucket —
    the reproducible weighted-mixture step of training-corpus assembly,
    as a narrow zero-shuffle filter."""
    docs = load_table(spark, sf_dir, "documents")
    rate = (
        F.when(F.col("source") == "src0", 50)
        .when(F.col("source").isin("src1", "src2", "src3"), 25)
        .otherwise(10)
    )
    return docs.filter(hash_bucket(F.col("doc_id"), 100, salt="mix") < rate).select(
        "doc_id", "source"
    )


@query(
    "doc_bpe_pair_counts",
    r"""SELECT pair, count(*)::BIGINT AS n_occurrences
FROM (
  SELECT unnest([substring(word, i, 2) for i in generate_series(1, length(word)-1)]) AS pair
  FROM (SELECT unnest(string_split_regex(lower(text), '\s+')) AS word FROM documents)
  WHERE length(word) >= 2
)
GROUP BY pair
HAVING count(*) >= 5""",
)
def doc_bpe_pair_counts(spark, sf_dir):
    """Tokenizer-training primitive: corpus-wide adjacent-char-pair
    frequencies (one BPE merge round's counting step). Double explode is
    a narrow scan-fused map; the aggregate's key space is the symbol
    alphabet squared, so the shuffle is tiny regardless of corpus size."""
    from etl__project_spark.datapipe.text import bpe_pair_counts

    return bpe_pair_counts(
        load_table(spark, sf_dir, "documents"), min_count=5
    )


@query(
    "doc_stratified_sample",
    """SELECT doc_id, source FROM documents
WHERE ('0x' || substr(md5(doc_id::VARCHAR || 'mix1'), 1, 15))::BIGINT % 100
      < CASE source WHEN 'src0' THEN 80 WHEN 'src1' THEN 50 WHEN 'src2' THEN 20 ELSE 5 END""",
)
def doc_stratified_sample(spark, sf_dir):
    """Per-source sampling fractions in one narrow filter (dataset
    mixing as sampling: oversample curated sources, downsample crawl).
    Deterministic md5-of-key bucketing — reproducible across runs,
    engines, and partitionings, unlike df.sampleBy."""
    from etl__project_spark.datapipe.sampling import stratified_hash_sample

    docs = load_table(spark, sf_dir, "documents")
    return stratified_hash_sample(
        docs,
        {"src0": 80, "src1": 50, "src2": 20},
        stratum_col="source",
        key_col="doc_id",
        default_pct=5,
        salt="mix1",
    ).select("doc_id", "source")


@query(
    "doc_common_ngram_filter",
    r"""WITH g AS (
  SELECT doc_id, unnest(list_distinct([array_to_string(words[i:i+2], ' ')
                 for i in generate_series(1, len(words)-2)])) AS gram
  FROM (SELECT doc_id, string_split_regex(lower(text), '\s+') AS words FROM documents)
), df_counts AS (
  SELECT gram, count(*) AS df FROM g GROUP BY gram
), per_doc AS (
  SELECT g.doc_id, count(*) AS n_grams,
         count(*) FILTER (WHERE df_counts.df >= 5) AS n_common
  FROM g JOIN df_counts USING (gram) GROUP BY g.doc_id
)
SELECT d.doc_id,
       coalesce(p.n_grams, 0)::BIGINT AS n_grams,
       floor(coalesce(p.n_common / p.n_grams, 0.0) * 10000 + 0.5) / 10000.0 AS common_frac,
       (floor(coalesce(p.n_common / p.n_grams, 0.0) * 10000 + 0.5) / 10000.0) <= 0.5 AS keep
FROM documents d LEFT JOIN per_doc p ON d.doc_id = p.doc_id""",
)
def doc_common_ngram_filter(spark, sf_dir):
    """C4-style boilerplate filter: fraction of a document's distinct
    word trigrams that are corpus-common (document frequency >= 5).
    Linear two-aggregate shape — the shuffle carries hashed gram keys,
    never text; no per-bucket quadratic pair space (contrast
    doc_jaccard_pairs' audit-only cost model)."""
    from etl__project_spark.datapipe.text import common_ngram_filter

    return common_ngram_filter(
        load_table(spark, sf_dir, "documents"),
        n=3,
        df_threshold=5,
        max_common_frac=0.5,
    )


@query(
    "doc_bpe_merge_rounds",
    r"""WITH words0 AS (
  SELECT word, count(*)::BIGINT AS freq FROM (
    SELECT unnest(string_split_regex(lower(text), '\s+')) AS word FROM documents)
  WHERE length(word) >= 2 GROUP BY word
),
syms1 AS (
  SELECT [substr(word, i, 1) for i in generate_series(1, length(word))] AS syms, freq
  FROM words0
),
counts1 AS (%(counts1)s),
best1 AS (SELECT a, b, cnt FROM counts1 ORDER BY cnt DESC, a, b LIMIT 1),
syms2 AS (SELECT %(step)s AS syms, s.freq FROM syms1 s, best1 b),
counts2 AS (%(counts2)s),
best2 AS (SELECT a, b, cnt FROM counts2 ORDER BY cnt DESC, a, b LIMIT 1),
syms3 AS (SELECT %(step)s AS syms, s.freq FROM syms2 s, best2 b),
counts3 AS (%(counts3)s),
best3 AS (SELECT a, b, cnt FROM counts3 ORDER BY cnt DESC, a, b LIMIT 1)
SELECT 1::BIGINT AS round, a AS pair_left, b AS pair_right, a || b AS merged, cnt AS n_occurrences FROM best1
UNION ALL SELECT 2::BIGINT, a, b, a || b, cnt FROM best2
UNION ALL SELECT 3::BIGINT, a, b, a || b, cnt FROM best3"""
    % {
        "step": _BPE_MERGE_STEP,
        "counts1": _BPE_COUNTS.format(src="syms1"),
        "counts2": _BPE_COUNTS.format(src="syms2"),
        "counts3": _BPE_COUNTS.format(src="syms3"),
    },
)
def doc_bpe_merge_rounds(spark, sf_dir):
    """Iterative BPE tokenizer training, 3 merge rounds (VERDICT r4 #3:
    the loop doc_bpe_pair_counts only counted one round of). Each round
    depends on the previous merge, so the oracle unrolls the rounds as
    CTEs whose re-segmentation is the SAME left-to-right greedy fold
    (DuckDB ``list_reduce`` over a space-joined token string) as the
    engine's JVM ``aggregate``; ties break (count desc, pair asc) on
    both engines. See ``datapipe/text.py:bpe_merge_rounds`` for the
    distributed shape (vocabulary-collapse before iteration, bounded
    pair keyspace, TakeOrderedAndProject argmax, 1-row broadcast
    re-segmentation — no driver collect)."""
    from etl__project_spark.datapipe.text import bpe_merge_rounds

    return bpe_merge_rounds(load_table(spark, sf_dir, "documents"), n_rounds=3)


@query(
    "doc_pmi_bigrams",
    r"""WITH toks AS (
  SELECT string_split_regex(lower(text), '\s+') AS t FROM documents
),
uni AS (
  SELECT word, count(*)::BIGINT AS c_w
  FROM (SELECT unnest(t) AS word FROM toks) GROUP BY word
),
bi AS (
  SELECT t[i] AS w_a, t[i+1] AS w_b, count(*)::BIGINT AS c_ab
  FROM toks, unnest(generate_series(1, len(t) - 1)) AS u(i)
  GROUP BY 1, 2
),
n AS (
  SELECT (SELECT sum(c_w) FROM uni)::BIGINT AS n_uni,
         (SELECT sum(c_ab) FROM bi)::BIGINT AS n_bi
)
SELECT w_a, w_b, c_ab,
       floor(ln((c_ab * n_uni * n_uni)::DOUBLE / (ua.c_w * ub.c_w * n_bi)::DOUBLE)
             * 10000 + 0.5) / 10000.0 AS pmi
FROM bi
JOIN uni ua ON bi.w_a = ua.word
JOIN uni ub ON bi.w_b = ub.word
CROSS JOIN n
WHERE c_ab >= 20
ORDER BY pmi DESC, w_a, w_b LIMIT 20""",
)
def doc_pmi_bigrams(spark, sf_dir):
    """Corpus collocation mining: pointwise mutual information of
    adjacent word bigrams, PMI = ln(p(ab) / (p(a)·p(b))) with
    p(ab) = c_ab/N_bi and p(w) = c_w/N_uni — the classic phrase /
    multi-word-expression detector run over a training corpus before
    tokenizer or n-gram decisions.

    Distributed shape: bigrams come from zipping each token array with
    its own tail (``arrays_zip(slice, slice)`` — map-side, fused into
    the scan, no self-join on position), then two two-phase hash
    aggregates (bigram counts, unigram counts) whose keyspaces are
    vocabulary-sized, not corpus-sized. Unigram counts re-attach by
    broadcast (a vocabulary fits an executor at any corpus scale), the
    two totals are 1-row broadcasts, and the top-20 is
    TakeOrderedAndProject — no global sort. PMI is computed from exact
    BIGINT products divided once in double, then half-up-rounded to
    4 dp, so the ranking is bit-identical across engines.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.split(F.lower(F.col("text")), r"\s+").alias("t"))
    uni = (
        toks.select(F.explode("t").alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("c_w"))
    )
    bi = (
        toks.select(
            F.explode(
                F.arrays_zip(
                    F.slice(F.col("t"), 1, F.size("t") - 1).alias("w_a"),
                    F.slice(F.col("t"), 2, F.size("t") - 1).alias("w_b"),
                )
            ).alias("p")
        )
        .select("p.w_a", "p.w_b")
        .groupBy("w_a", "w_b")
        .agg(F.count(F.lit(1)).alias("c_ab"))
    )
    n = uni.agg(F.sum("c_w").alias("n_uni")).crossJoin(
        bi.agg(F.sum("c_ab").alias("n_bi"))
    )
    ua = uni.select(F.col("word").alias("w_a"), F.col("c_w").alias("c_a"))
    ub = uni.select(F.col("word").alias("w_b"), F.col("c_w").alias("c_b"))
    pmi_raw = F.log(
        (F.col("c_ab") * F.col("n_uni") * F.col("n_uni")).cast("double")
        / (F.col("c_a") * F.col("c_b") * F.col("n_bi")).cast("double")
    )
    return (
        bi.filter(F.col("c_ab") >= 20)
        .join(F.broadcast(ua), "w_a")
        .join(F.broadcast(ub), "w_b")
        .crossJoin(F.broadcast(n))
        .select(
            "w_a",
            "w_b",
            "c_ab",
            (F.floor(pmi_raw * 10000 + F.lit(0.5)) / F.lit(10000.0)).alias("pmi"),
        )
        .orderBy(F.desc("pmi"), "w_a", "w_b")
        .limit(20)
    )


@query(
    "doc_unigram_logprob",
    r"""WITH toks AS (
  SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS word
  FROM documents
),
uni AS (SELECT word, count(*)::BIGINT AS c_w FROM toks GROUP BY word),
n AS (SELECT sum(c_w)::BIGINT AS n_total FROM uni),
scored AS (
  SELECT t.doc_id,
         floor(ln(u.c_w::DOUBLE / n.n_total::DOUBLE) * 1000000 + 0.5)::BIGINT AS lp_micro
  FROM toks t JOIN uni u USING (word) CROSS JOIN n
)
SELECT doc_id, count(*)::BIGINT AS n_tokens,
       floor(sum(lp_micro)::DOUBLE / count(*) / 100.0 + 0.5) / 10000.0 AS avg_logprob
FROM scored GROUP BY doc_id""",
)
def doc_unigram_logprob(spark, sf_dir):
    """Model-based document quality score: mean per-token log-probability
    under the corpus's own unigram LM (the cheap end of the
    perplexity-filter family used to score web text before training).
    Low scores = rare-token-heavy documents; a threshold on this column
    is the filter.

    Distributed shape: one vocabulary-sized hash aggregate builds the LM,
    which re-attaches to the token stream by broadcast (vocabularies fit
    an executor at any corpus size), so the scoring pass is a narrow
    map + one doc-keyed hash aggregate — two shuffles total, both on
    small keyspaces. Cross-engine determinism: each token's ln p is
    quantized to integer micro-units BEFORE summing (the
    ``ev_value_banding`` trick), so the per-doc sum is exact BIGINT
    arithmetic and immune to float summation order; only the final
    per-doc divide is floating point, identically rounded to 4 dp.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("word")
    )
    uni = toks.groupBy("word").agg(F.count(F.lit(1)).alias("c_w"))
    n = uni.agg(F.sum("c_w").alias("n_total"))
    lp_micro = F.floor(
        F.log(F.col("c_w").cast("double") / F.col("n_total").cast("double"))
        * 1000000
        + F.lit(0.5)
    ).cast("long")
    return (
        toks.join(F.broadcast(uni), "word")
        .crossJoin(F.broadcast(n))
        .select("doc_id", lp_micro.alias("lp_micro"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            (
                F.floor(
                    F.sum("lp_micro").cast("double")
                    / F.count(F.lit(1))
                    / F.lit(100.0)
                    + F.lit(0.5)
                )
                / F.lit(10000.0)
            ).alias("avg_logprob"),
        )
    )


@query(
    "doc_bpe_encode",
    r"""WITH words0 AS (
  SELECT word, count(*)::BIGINT AS freq FROM (
    SELECT unnest(string_split_regex(lower(text), '\s+')) AS word FROM documents)
  WHERE length(word) >= 2 GROUP BY word
),
syms1 AS (
  SELECT [substr(word, i, 1) for i in generate_series(1, length(word))] AS syms, freq
  FROM words0
),
counts1 AS (%(counts1)s),
best1 AS (SELECT a, b, cnt FROM counts1 ORDER BY cnt DESC, a, b LIMIT 1),
syms2 AS (SELECT %(step)s AS syms, s.freq FROM syms1 s, best1 b),
counts2 AS (%(counts2)s),
best2 AS (SELECT a, b, cnt FROM counts2 ORDER BY cnt DESC, a, b LIMIT 1),
syms3 AS (SELECT %(step)s AS syms, s.freq FROM syms2 s, best2 b),
counts3 AS (%(counts3)s),
best3 AS (SELECT a, b, cnt FROM counts3 ORDER BY cnt DESC, a, b LIMIT 1),
dw AS (
  SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS word
  FROM documents
),
e1 AS (
  SELECT word, [substr(word, i, 1) for i in generate_series(1, length(word))] AS syms
  FROM (SELECT DISTINCT word FROM dw)
),
e2 AS (SELECT s.word, %(step)s AS syms FROM e1 s, best1 b),
e3 AS (SELECT s.word, %(step)s AS syms FROM e2 s, best2 b),
e4 AS (SELECT s.word, %(step)s AS syms FROM e3 s, best3 b)
SELECT dw.doc_id, count(*)::BIGINT AS n_words, sum(len(e4.syms))::BIGINT AS n_tokens
FROM dw JOIN e4 USING (word) GROUP BY dw.doc_id"""
    % {
        "step": _BPE_MERGE_STEP,
        "counts1": _BPE_COUNTS.format(src="syms1"),
        "counts2": _BPE_COUNTS.format(src="syms2"),
        "counts3": _BPE_COUNTS.format(src="syms3"),
    },
)
def doc_bpe_encode(spark, sf_dir):
    """Apply the 3-round learned merge table to encode every document —
    the deploy side of the BPE pair (train = ``doc_bpe_merge_rounds``).
    The oracle unrolls the same training CTEs, then re-segments the
    DISTINCT-word vocabulary with each winning merge and joins documents
    to the finished word→token-count mapping; the engine does the
    identical thing with 1-row broadcasts and a vocabulary broadcast
    join (``datapipe/text.py:bpe_encode``). n_tokens is what the corpus
    costs in tokenizer units after the merges."""
    from etl__project_spark.datapipe.text import bpe_encode

    return bpe_encode(load_table(spark, sf_dir, "documents"), n_rounds=3)


@query(
    "doc_dataset_card",
    r"""WITH base AS (
  SELECT source, count(*)::BIGINT AS n_docs,
         sum(len(string_split_regex(lower(text), '\s+')))::BIGINT AS n_tokens,
         count(DISTINCT lang)::BIGINT AS n_langs,
         count(DISTINCT md5(text))::BIGINT AS nd
  FROM documents GROUP BY source
),
langs AS (
  SELECT source, lang, count(*) AS c FROM documents GROUP BY source, lang
),
top AS (
  SELECT source, lang AS top_lang FROM (
    SELECT source, lang,
           row_number() OVER (PARTITION BY source ORDER BY c DESC, lang) AS rn
    FROM langs) WHERE rn = 1
)
SELECT b.source, b.n_docs, b.n_tokens,
       floor(b.n_tokens::DOUBLE / b.n_docs * 100 + 0.5) / 100.0 AS avg_tokens,
       b.n_langs, t.top_lang,
       floor((1 - b.nd::DOUBLE / b.n_docs) * 10000 + 0.5) / 10000.0 AS dup_rate
FROM base b JOIN top t USING (source)""",
)
def doc_dataset_card(spark, sf_dir):
    """Dataset card: the per-source summary a training-data release
    ships — document and token counts, language spread with the modal
    language, and the exact-duplicate rate (1 − distinct-text-hashes /
    docs). One groupBy(source) pass computes every count (token totals
    fused into the same scan via a map-side size(split())), the modal
    language is a (source, lang) hash agg + source-partitioned top-1
    window, and the md5-keyed distinct shuffles 16-byte hashes, never
    text — the whole card is two small-keyspace aggregates at any
    corpus size."""
    docs = load_table(spark, sf_dir, "documents")
    ntok = F.size(F.split(F.lower(F.col("text")), r"\s+"))
    base = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(ntok).cast("long").alias("n_tokens"),
        F.countDistinct("lang").alias("n_langs"),
        F.countDistinct(F.md5("text")).alias("nd"),
    )
    w = Window.partitionBy("source").orderBy(F.desc("c"), F.asc("lang"))
    top = (
        docs.groupBy("source", "lang")
        .agg(F.count(F.lit(1)).alias("c"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("source", F.col("lang").alias("top_lang"))
    )
    return base.join(F.broadcast(top), "source").select(
        "source",
        "n_docs",
        "n_tokens",
        (
            F.floor(F.col("n_tokens").cast("double") / F.col("n_docs") * 100 + F.lit(0.5))
            / F.lit(100.0)
        ).alias("avg_tokens"),
        "n_langs",
        "top_lang",
        (
            F.floor(
                (F.lit(1) - F.col("nd").cast("double") / F.col("n_docs")) * 10000
                + F.lit(0.5)
            )
            / F.lit(10000.0)
        ).alias("dup_rate"),
    )


@query(
    "doc_passage_scrub",
    """WITH idx AS (
  SELECT doc_id, text, unnest(range(0, ((len(text) - 1) // 100) + 1)) AS i
  FROM documents
),
chunks AS (
  SELECT doc_id, i, substr(text, (i * 100 + 1)::INT, 100) AS chunk FROM idx
),
ranked AS (
  SELECT doc_id, i, chunk,
         row_number() OVER (PARTITION BY md5(chunk) ORDER BY doc_id, i) AS rn
  FROM chunks
)
SELECT doc_id, count(*)::BIGINT AS n_chunks,
       sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END)::BIGINT AS n_kept,
       coalesce(sum(len(chunk)) FILTER (WHERE rn = 1), 0)::BIGINT AS scrubbed_len,
       md5(coalesce(string_agg(chunk, '' ORDER BY i) FILTER (WHERE rn = 1), '')) AS scrubbed_md5
FROM ranked GROUP BY doc_id""",
)
def doc_passage_scrub(spark, sf_dir):
    """Passage-level dedup REMOVAL with document reassembly (the C4 /
    RefinedWeb step after ``doc_passage_dup``'s detection): every
    100-char passage that already appeared earlier in the corpus —
    first occurrence = smallest (doc_id, position) — is dropped, and
    each document is rebuilt from its surviving passages in original
    order. Emits per-document passage counts plus the md5 of the
    reassembled text, so the hash match pins the exact reconstructed
    bytes without shipping full texts through the compare.

    Distributed shape: chunking is a map-side generator
    (sequence+explode, no UDF); the keep-first rule is a window over
    the 16-byte passage hash — ``row_number`` per md5 partition, the
    same one-exchange shape as ``doc_common_ngram_filter``, never a
    self-join; reassembly is a doc-keyed hash aggregate whose
    ``array_sort(collect_list(struct(pos, chunk)))`` state is bounded
    by document length, not corpus size. Two data-proportional
    exchanges total (by passage hash, then by doc_id) — the plan a
    1000-executor corpus scrub wants."""
    docs = load_table(spark, sf_dir, "documents")
    chunks = docs.select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(0), F.floor((F.length("text") - 1) / 100).cast("int"))
        ).alias("i"),
        "text",
    ).select(
        "doc_id",
        "i",
        F.col("text").substr(F.col("i") * 100 + 1, F.lit(100)).alias("chunk"),
    )
    w = Window.partitionBy(F.md5("chunk")).orderBy("doc_id", "i")
    ranked = chunks.withColumn("rn", F.row_number().over(w))
    kept_struct = F.when(
        F.col("rn") == 1, F.struct(F.col("i"), F.col("chunk"))
    )
    return ranked.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum(F.when(F.col("rn") == 1, 1).otherwise(0)).cast("long").alias("n_kept"),
        F.coalesce(
            F.sum(F.when(F.col("rn") == 1, F.length("chunk"))), F.lit(0)
        )
        .cast("long")
        .alias("scrubbed_len"),
        F.md5(
            F.concat_ws(
                "",
                F.transform(
                    F.array_sort(F.collect_list(kept_struct)), lambda x: x["chunk"]
                ),
            )
        ).alias("scrubbed_md5"),
    )


@query(
    "doc_quality_pctl_filter",
    """WITH cut AS (
  SELECT lang,
         floor(quantile_cont(n_chars, 0.10) * 10000 + 0.5) / 10000.0 AS p10_cutoff
  FROM documents GROUP BY lang
)
SELECT d.lang, min(c.p10_cutoff) AS p10_cutoff,
       count(*)::BIGINT AS n_total,
       sum(CASE WHEN d.n_chars >= c.p10_cutoff THEN 1 ELSE 0 END)::BIGINT AS n_kept,
       floor(sum(CASE WHEN d.n_chars >= c.p10_cutoff THEN 1 ELSE 0 END)::DOUBLE
             / count(*) * 10000 + 0.5) / 10000.0 AS keep_rate
FROM documents d JOIN cut c USING (lang)
GROUP BY d.lang""",
)
def doc_quality_pctl_filter(spark, sf_dir):
    """Dynamic (percentile-based) quality thresholding: instead of one
    global cutoff, each language learns its own — here the 10th
    percentile of document length — and the filter keeps documents at
    or above their language's cutoff. This is how multilingual corpus
    filters avoid starving low-resource languages whose length/quality
    distributions differ from English (a fixed global cutoff would
    delete whole languages).

    Distributed shape: one per-language percentile aggregate (tiny
    keyspace), re-attached by broadcast, then a single counting pass —
    the filter itself never shuffles the corpus. Exact interpolated
    percentile keeps the DuckDB oracle bit-comparable; at 100 TB the
    same plumbing runs on ``approx_percentile`` (mergeable sketch,
    bounded state) with the join/aggregate shape unchanged. The cutoff
    is floor-quantized to 4 dp before the >= compare, so the boundary
    decision is bit-identical across engines."""
    docs = load_table(spark, sf_dir, "documents").select("lang", "n_chars")
    cut = docs.groupBy("lang").agg(
        _quant4(F.expr("percentile(n_chars, 0.10)")).alias("p10_cutoff")
    )
    keep = F.when(F.col("n_chars") >= F.col("p10_cutoff"), 1).otherwise(0)
    return (
        docs.join(F.broadcast(cut), "lang")
        .groupBy("lang")
        .agg(
            F.min("p10_cutoff").alias("p10_cutoff"),
            F.count(F.lit(1)).alias("n_total"),
            F.sum(keep).cast("long").alias("n_kept"),
            (
                F.floor(
                    F.sum(keep).cast("double") / F.count(F.lit(1)) * 10000
                    + F.lit(0.5)
                )
                / F.lit(10000.0)
            ).alias("keep_rate"),
        )
    )


@query(
    "doc_bigram_logprob",
    r"""WITH toks AS (
  SELECT doc_id, string_split_regex(lower(text), '\s+') AS t FROM documents
),
docs2 AS (SELECT * FROM toks WHERE len(t) >= 2),
bistream AS (
  SELECT doc_id, t[i] AS w_a, t[i+1] AS w_b
  FROM docs2, unnest(generate_series(1, len(t) - 1)) AS u(i)
),
uni AS (
  SELECT word, count(*)::BIGINT AS c_w
  FROM (SELECT unnest(t) AS word FROM toks) GROUP BY word
),
n AS (SELECT sum(c_w)::BIGINT AS n_total FROM uni),
bi AS (SELECT w_a, w_b, count(*)::BIGINT AS c_ab FROM bistream GROUP BY w_a, w_b),
ctx AS (SELECT w_a, sum(c_ab)::BIGINT AS c_a FROM bi GROUP BY w_a),
scored AS (
  SELECT s.doc_id,
         floor(ln(0.75 * (b.c_ab::DOUBLE / c.c_a::DOUBLE)
                  + 0.25 * (u.c_w::DOUBLE / n.n_total::DOUBLE)) * 1000000 + 0.5)::BIGINT AS lp_micro
  FROM bistream s
  JOIN bi b USING (w_a, w_b)
  JOIN ctx c USING (w_a)
  JOIN uni u ON s.w_b = u.word
  CROSS JOIN n
)
SELECT doc_id, count(*)::BIGINT AS n_bigrams,
       floor(sum(lp_micro)::DOUBLE / count(*) / 100.0 + 0.5) / 10000.0 AS avg_logprob
FROM scored GROUP BY doc_id""",
)
def doc_bigram_logprob(spark, sf_dir):
    """Interpolated bigram-LM document scoring — one rung up the
    perplexity-filter ladder from ``doc_unigram_logprob``: each token
    transition scores ln(0.75·P(b|a) + 0.25·P(b)), the Jelinek-Mercer
    mix of the corpus's own bigram and unigram MLEs (the unigram
    fallback keeps unseen-context mass finite), and documents report
    their mean transition log-probability. Low scores = incoherent
    token order, not just rare tokens — the signal length-normalized
    unigram scores miss.

    Distributed shape: bigrams come from zipping each token array with
    its own tail (map-side, fused into the scan — no positional
    self-join); the LM tables are vocabulary-bounded hash aggregates
    (bigram counts, context totals = one further agg OVER the bigram
    table, unigrams), re-attached to the transition stream by broadcast
    at fixture scale — at 100 TB the bigram re-attach becomes a plain
    equi-join shuffled by (w_a, w_b), still bounded by vocabulary², and
    the scoring pass stays a narrow map + one doc-keyed aggregate.
    Per-transition log-probs are quantized to integer micro-units
    before summing (exact BIGINT arithmetic, summation-order-proof);
    the interpolation is computed with a pinned parenthesization so
    both engines evaluate identical IEEE trees."""
    docs = load_table(spark, sf_dir, "documents")
    t = F.split(F.lower(F.col("text")), r"\s+")
    uni = (
        docs.select(F.explode(t).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("c_w"))
    )
    n = uni.agg(F.sum("c_w").alias("n_total"))
    arr = docs.select("doc_id", t.alias("t")).filter(F.size("t") >= 2)
    bistream = arr.select(
        "doc_id",
        F.explode(
            F.arrays_zip(
                F.slice(F.col("t"), 1, F.size("t") - 1).alias("w_a"),
                F.slice(F.col("t"), 2, F.size("t") - 1).alias("w_b"),
            )
        ).alias("p"),
    ).select("doc_id", "p.w_a", "p.w_b")
    bi = bistream.groupBy("w_a", "w_b").agg(F.count(F.lit(1)).alias("c_ab"))
    ctx = bi.groupBy("w_a").agg(F.sum("c_ab").alias("c_a"))
    unib = uni.select(F.col("word").alias("w_b"), "c_w")
    p = F.lit(0.75) * (
        F.col("c_ab").cast("double") / F.col("c_a").cast("double")
    ) + F.lit(0.25) * (
        F.col("c_w").cast("double") / F.col("n_total").cast("double")
    )
    scored = (
        bistream.join(F.broadcast(bi), ["w_a", "w_b"])
        .join(F.broadcast(ctx), "w_a")
        .join(F.broadcast(unib), "w_b")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            F.floor(F.log(p) * 1000000 + F.lit(0.5)).cast("long").alias("lp_micro"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        (
            F.floor(
                F.sum("lp_micro").cast("double") / F.count(F.lit(1)) / F.lit(100.0)
                + F.lit(0.5)
            )
            / F.lit(10000.0)
        ).alias("avg_logprob"),
    )


@query("doc_simhash_pairs", _simhash_pairs_oracle())
def doc_simhash_pairs(spark, sf_dir):
    """SimHash near-duplicate PAIRS — the banded completion of
    ``doc_simhash``: 16-bit signatures split into four 4-bit bands; a
    pair is a candidate iff some band matches exactly, then candidates
    are kept when full Hamming distance <= 3. By pigeonhole, any pair
    within Hamming 3 of each other has at least one of the 4 bands
    intact, so the banded candidate set is COMPLETE for the radius-3
    ball — the same guarantee structure as MinHash LSH, with bit-level
    banding instead of signature rows.

    Distributed shape: signatures are one corpus-wide hash aggregate
    (``datapipe/dedup.py:167``); banding is a map-side explode into 4
    (band_id, nibble) keys per doc; candidates come from a band
    EQUI-join — O(band collisions), never O(N²) — and the Hamming
    filter is integer xor/bit_count on two 16-bit codes. At 100 TB the
    shuffle moves (band, doc_id, sig) triples ~24 B each, and skewed
    bands (common nibbles) are exactly the AQE skew-join case the
    session enables."""
    docs = load_table(spark, sf_dir, "documents")
    sig = simhash(docs)
    bands = sig.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        F.shiftright(F.col("simhash"), 4 * j)
                        .bitwiseAND(F.lit(15))
                        .alias("band"),
                    )
                    for j in range(4)
                ]
            )
        ).alias("p"),
    ).select("doc_id", "simhash", "p.j", "p.band")
    a = bands.select(
        F.col("doc_id").alias("id_a"), F.col("simhash").alias("sig_a"), "j", "band"
    )
    b = bands.select(
        F.col("doc_id").alias("id_b"), F.col("simhash").alias("sig_b"), "j", "band"
    )
    cand = (
        a.join(b, ["j", "band"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
            .cast("long")
            .alias("hamming"),
        )
        .distinct()
    )
    return cand.filter(F.col("hamming") <= 3)


@query("doc_pipeline_e2e", _pipeline_e2e_sql())
def doc_pipeline_e2e(spark, sf_dir):
    """The COMPLETE training-data pipeline as one composed query —
    quality gate → canonical near-dup removal → benchmark
    decontamination → per-source mixture — returning the final
    (doc_id, source, n_words) corpus manifest. Every stage is the
    already-oracle-proven operator (``quality_rules``,
    ``canonical_components``, ``contamination_check``, the md5 mix
    rule), and the composed oracle chains the same SQL stages, so the
    hash match verifies the INTERACTION of the stages (dedup re-rooted
    on the quality-kept subset; decontamination probing only canonical
    survivors), not just each in isolation.

    Scale shape is the sum of its parts — narrow quality filter, hash
    aggregates + band equi-join driven by distinct texts, broadcast
    eval shingles, zero-shuffle mix filter — with each stage shrinking
    the data the next one touches: gate before signing, collapse
    before banding, dedup before decontamination. That ordering is the
    100 TB cost model: every expensive stage runs on the smallest set
    that preserves its semantics."""
    from etl__project_spark.datapipe.dedup import (
        canonical_components,
        contamination_check,
    )
    from etl__project_spark.datapipe.sampling import hash_bucket
    from etl__project_spark.datapipe.text import quality_rules

    docs = load_table(spark, sf_dir, "documents")
    kept = quality_rules(docs).filter(F.col("keep")).select("doc_id", "n_words")
    q = docs.join(kept, "doc_id")
    comp = canonical_components(q, n_hashes=8, n_bands=2, rows_per_band=4)
    canon = q.join(
        comp.filter(F.col("id") == F.col("component")).select(
            F.col("id").alias("doc_id")
        ),
        "doc_id",
    )
    train = canon.filter(F.col("doc_id") % 50 != 0)
    eval_set = docs.filter(F.col("doc_id") % 50 == 0)
    # containment-fraction decontamination: the word-soup fixture has
    # ~31% background 13-gram collision at sf0.1, so any-overlap (the
    # standalone doc_decontaminate policy) would empty the corpus;
    # frac >= 0.8 catches near-copies of eval items only.
    cont = contamination_check(train, eval_set, k=13, threshold_frac=0.8)
    clean = train.join(
        cont.filter(~F.col("contaminated")).select("doc_id"), "doc_id"
    )
    rate = (
        F.when(F.col("source") == "src0", 50)
        .when(F.col("source").isin("src1", "src2", "src3"), 25)
        .otherwise(10)
    )
    return clean.filter(hash_bucket(F.col("doc_id"), 100, salt="mix") < rate).select(
        "doc_id", "source", F.col("n_words").cast("long").alias("n_words")
    )


@query(
    "doc_media_dedup",
    """WITH m AS (
  SELECT doc_id AS media_id, sha256(text) AS content_sha FROM documents
)
SELECT content_sha, min(media_id)::BIGINT AS keep_id, count(*)::BIGINT AS n_copies,
       round(('0x' || substr(content_sha, 1, 2))::INT / 255.0, 4) AS f0,
       round(('0x' || substr(content_sha, 15, 2))::INT / 255.0, 4) AS f7
FROM m GROUP BY content_sha""",
)
def doc_media_dedup(spark, sf_dir):
    """Media dedup by content hash — the first stage of every image/video
    dedup pipeline: group opaque payloads by sha256, keep the min-id
    copy, count the rest. The Spark side runs the REAL multimodal path
    (synth payloads → Arrow ``mapInPandas`` featurization,
    ``datapipe/multimodal.py``) and emits two feature components; the
    oracle derives the same values from sha256 arithmetic in pure SQL —
    so the hash match cross-verifies the Python/Arrow feature kernel
    against an independent implementation, not just the grouping.

    Scale shape: the shuffle key is the 32-byte sha, never the payload —
    group-by-hash moves KBs per million images; features ride Arrow
    batches with bounded memory (iterator-of-batches contract)."""
    from etl__project_spark.datapipe.multimodal import extract_features, synth_media

    docs = load_table(spark, sf_dir, "documents")
    feats = extract_features(synth_media(docs), fake=True)
    f0 = F.round(F.element_at("feature", 1).cast("double"), 4)
    f7 = F.round(F.element_at("feature", 8).cast("double"), 4)
    return feats.groupBy("content_sha").agg(
        F.min("media_id").alias("keep_id"),
        F.count(F.lit(1)).alias("n_copies"),
        F.min(f0).alias("f0"),
        F.min(f7).alias("f7"),
    )


@query("doc_containment_pairs", _containment_sql())
def doc_containment_pairs(spark, sf_dir):
    """Directed CONTAINMENT detection: for each LSH candidate pair, the
    fraction of each side's distinct 5-gram shingles shared —
    containment(A→B) = |A∩B| / |A|. Jaccard misses subset relations (a
    paragraph quoted inside a much longer doc scores near 0 Jaccard but
    ~1.0 containment), so this is the quote/partial-copy detector that
    complements the symmetric near-dup family; pairs kept when either
    direction ≥ 0.5.

    Scale shape: candidates come from the SAME band equi-join as
    ``doc_lsh_pairs`` (never all-pairs); the exact intersection is a
    shingle equi-join restricted to candidates — cost Σ shared
    shingles over candidate pairs; set sizes are one hash aggregate
    joined back. Everything shuffles on shingle/doc keys, never text.
    Note the asymmetric-recall caveat: MinHash bands sample the UNION,
    so a tiny-doc⊂huge-doc pair can miss banding (resemblance-biased);
    a production containment pass uses the prefix-filter join
    (``doc_jaccard_prefix``) or partitions by the small side's shingle
    postings when subset recall must be lossless."""
    from etl__project_spark.datapipe.dedup import (
        char_shingles,
        lsh_candidate_pairs,
        minhash_signature,
    )

    docs = load_table(spark, sf_dir, "documents")
    sh = char_shingles(docs, distinct=False)
    sig = minhash_signature(sh, n_hashes=8).persist()
    sig.count()
    cand = lsh_candidate_pairs(sig, n_bands=2, rows_per_band=4)
    shing = char_shingles(docs, distinct=True).select(
        "doc_id", F.col("shingle")
    )
    sizes = shing.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = shing.select(F.col("doc_id").alias("id_a"), "shingle")
    b = shing.select(F.col("doc_id").alias("id_b"), "shingle")
    inter = (
        cand.join(a, "id_a")
        .join(b, ["id_b", "shingle"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("id_b"), F.col("n_sh").alias("n_b"))
    r4 = lambda c: F.floor(c * 10000 + F.lit(0.5)) / F.lit(10000.0)  # noqa: E731
    c_ab = F.col("n_common").cast("double") / F.col("n_a")
    c_ba = F.col("n_common").cast("double") / F.col("n_b")
    return (
        inter.join(F.broadcast(sa), "id_a")
        .join(F.broadcast(sb), "id_b")
        .filter(F.greatest(c_ab, c_ba) >= 0.5)
        .select(
            "id_a", "id_b", r4(c_ab).alias("containment_ab"),
            r4(c_ba).alias("containment_ba"),
        )
    )


@query("doc_containment_reps", _containment_reps_sql())
def doc_containment_reps(spark, sf_dir):
    """Containment detection with exact-dup collapse FIRST — the coded
    scale path of ``doc_containment_pairs`` (same move that makes
    ``canonical_components`` scale: VERDICT r4 #4): one representative
    (min id) per distinct text is signed, banded, and verified, so the
    candidate space is driven by DISTINCT texts, not rows — on the
    sf10 word-soup fixture that is 130 k reps instead of 500 k rows,
    and the band-collision pathology that excludes the per-row variant
    from the 100× sweep disappears. Identical-text containments (all
    trivially 1.0) are represented by their cluster, recoverable
    through the content-hash map when per-row output is needed."""
    from etl__project_spark.datapipe.dedup import (
        char_shingles,
        lsh_candidate_pairs,
        minhash_signature,
    )

    docs = load_table(spark, sf_dir, "documents")
    reps = docs.groupBy("text").agg(F.min("doc_id").cast("long").alias("doc_id"))
    reps = reps.select("doc_id", "text")
    sh = char_shingles(reps, distinct=False)
    sig = minhash_signature(sh, n_hashes=8).persist()
    sig.count()
    cand = lsh_candidate_pairs(sig, n_bands=2, rows_per_band=4)
    shing = char_shingles(reps, distinct=True).select("doc_id", "shingle")
    sizes = shing.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = shing.select(F.col("doc_id").alias("id_a"), "shingle")
    b = shing.select(F.col("doc_id").alias("id_b"), "shingle")
    inter = (
        cand.join(a, "id_a")
        .join(b, ["id_b", "shingle"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("id_b"), F.col("n_sh").alias("n_b"))
    r4 = lambda c: F.floor(c * 10000 + F.lit(0.5)) / F.lit(10000.0)  # noqa: E731
    c_ab = F.col("n_common").cast("double") / F.col("n_a")
    c_ba = F.col("n_common").cast("double") / F.col("n_b")
    return (
        inter.join(F.broadcast(sa), "id_a")
        .join(F.broadcast(sb), "id_b")
        .filter(F.greatest(c_ab, c_ba) >= 0.5)
        .select(
            "id_a", "id_b", r4(c_ab).alias("containment_ab"),
            r4(c_ba).alias("containment_ba"),
        )
    )


@query(
    "doc_winnow_fingerprints",
    """WITH grams AS (
  SELECT doc_id, i - 1 AS pos,
         ('0x' || substr(md5(substr(text, i, 5)), 1, 7))::BIGINT AS h
  FROM documents, unnest(range(1, greatest(len(text) - 3, 1))) AS u(i)
),
keyed AS (
  SELECT doc_id, pos, h,
         count(*) OVER (PARTITION BY doc_id) AS n_grams,
         min(h * 1048576 + (1048575 - pos))
             OVER (PARTITION BY doc_id ORDER BY pos
                   ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wkey
  FROM grams
),
sel AS (
  SELECT DISTINCT doc_id, wkey // 1048576 AS fp_hash,
         1048575 - (wkey % 1048576) AS fp_pos
  FROM keyed
  WHERE pos <= n_grams - 4
)
SELECT doc_id, count(*)::BIGINT AS n_fps,
       min(fp_hash)::BIGINT AS fp_min, max(fp_hash)::BIGINT AS fp_max,
       sum(fp_hash)::BIGINT AS fp_sum
FROM sel GROUP BY doc_id""",
)
def doc_winnow_fingerprints(spark, sf_dir):
    """Winnowing fingerprints (Schleimer, Wilkerson & Aiken, SIGMOD
    2003 — the MOSS algorithm): hash every 5-gram, slide a window of
    w=4 consecutive hashes, and select each window's minimum (rightmost
    on ties); the distinct selected (hash, pos) set is the document's
    fingerprint, with the guarantee that any shared substring of
    length >= w+k-1 yields a shared fingerprint — position-robust
    plagiarism/overlap detection that the simple rolling-hash
    ``doc_fingerprint`` lacks.

    Engine-portable selection trick: the (hash, rightmost-pos) argmin
    is one integer ``min`` over h*2^20 + (2^20-1-pos) — no arg_min /
    struct comparison needed, so Spark and DuckDB agree bit-for-bit.
    Distributed shape: gram explode is map-side; the ONLY exchange is
    the per-doc window partitioning; window state is w rows. Output is
    the per-doc fingerprint summary (count/min/max/sum) — the full set
    joins like ``doc_lsh_pairs`` candidates when pair detection is
    needed."""
    docs = load_table(spark, sf_dir, "documents")
    grams = docs.select(
        "doc_id",
        F.posexplode(
            F.expr(
                "case when length(text) >= 5 then "
                "transform(sequence(1, length(text) - 4), "
                "i -> substring(text, i, 5)) "
                "else cast(array() as array<string>) end"
            )
        ).alias("pos", "gram"),
    ).select(
        "doc_id",
        "pos",
        F.conv(F.substring(F.md5("gram"), 1, 7), 16, 10).cast("long").alias("h"),
    )
    wspec = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(0, 3)
    keyed = grams.select(
        "doc_id",
        "pos",
        F.count(F.lit(1)).over(Window.partitionBy("doc_id")).alias("n_grams"),
        F.min(
            F.col("h") * F.lit(1048576) + (F.lit(1048575) - F.col("pos"))
        )
        .over(wspec)
        .alias("wkey"),
    )
    sel = (
        keyed.filter(F.col("pos") <= F.col("n_grams") - 4)
        .select(
            "doc_id",
            F.expr("wkey div 1048576").alias("fp_hash"),
            (F.lit(1048575) - F.pmod(F.col("wkey"), F.lit(1048576))).alias("fp_pos"),
        )
        .distinct()
    )
    return sel.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_fps"),
        F.min("fp_hash").alias("fp_min"),
        F.max("fp_hash").alias("fp_max"),
        F.sum("fp_hash").alias("fp_sum"),
    )


@query("doc_simhash_wide_pairs", _simhash_wide_pairs_oracle())
def doc_simhash_wide_pairs(spark, sf_dir):
    """SimHash near-dup pairs at WEB SCALE width (Manku, Jain & Das
    Sarma, WWW 2007): 60-bit signatures, four 15-bit bands, full-Hamming
    <= 3 verification. Same completeness pigeonhole as the 16-bit
    ``doc_simhash_pairs`` (radius 3, 4 bands → one band intact), but the
    band bucket space is 2^15 per band instead of 2^4 — so candidate
    volume is driven by genuine signature collisions, not by the
    pigeonholing of N docs into 16 buckets. Measured at the 10× fixture:
    the 16-bit variant's band join emits 57 M candidate pairs (154 s,
    now classified an audit path); this one stays output-driven. The
    signature aggregate is still ONE groupBy over tokens (60 conditional
    sums, map-side partial); banding is integer shift/mask."""
    docs = load_table(spark, sf_dir, "documents")
    sig = simhash(docs, n_bits=60)
    bands = sig.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        F.shiftright(F.col("simhash"), 15 * j)
                        .bitwiseAND(F.lit(32767))
                        .alias("band"),
                    )
                    for j in range(4)
                ]
            )
        ).alias("p"),
    ).select("doc_id", "simhash", "p.j", "p.band")
    a = bands.select(
        F.col("doc_id").alias("id_a"), F.col("simhash").alias("sig_a"), "j", "band"
    )
    b = bands.select(
        F.col("doc_id").alias("id_b"), F.col("simhash").alias("sig_b"), "j", "band"
    )
    return (
        a.join(b, ["j", "band"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
            .cast("long")
            .alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= 3)
    )


@query(
    "doc_ngram_novelty",
    """WITH grams AS (
  SELECT doc_id, unnest(list_distinct(
    [substr(text, i, 5) for i in range(1, greatest(len(text) - 3, 1))]
  )) AS gram
  FROM documents
),
firsts AS (SELECT gram, min(doc_id) AS first_doc FROM grams GROUP BY gram),
per AS (
  SELECT g.doc_id,
         count(*)::BIGINT AS n_grams,
         sum(CASE WHEN f.first_doc = g.doc_id THEN 1 ELSE 0 END)::BIGINT
             AS n_novel
  FROM grams g JOIN firsts f ON f.gram = g.gram
  GROUP BY g.doc_id
)
SELECT doc_id, n_grams, n_novel,
       floor(n_novel::DOUBLE / n_grams * 10000 + 0.5) / 10000.0 AS novelty
FROM per""",
)
def doc_ngram_novelty(spark, sf_dir):
    """Per-document n-gram NOVELTY: the fraction of a doc's distinct
    5-grams whose FIRST corpus occurrence (min doc_id) is this doc —
    each document's marginal contribution to corpus diversity in one
    number. Curation uses it two ways: near-zero novelty late in a
    crawl ordering marks redundant additions (a doc-granular
    complement to pair dedup), and the corpus novelty-decay curve is
    the classic diminishing-returns diagnostic for "do we need more of
    this source?".

    Distributed shape: ONE gram-keyed exchange computes first
    occurrences (min over a hash aggregate), and the join back to the
    per-doc gram stream rides the SAME gram partitioning (Catalyst
    reuses the exchange — the restructure lesson from
    ``doc_common_ngram_filter``); the per-doc reduction is a second
    bounded hash aggregate keyed on doc_id. Shuffled payloads are
    (gram-hash, doc_id) pairs, never text."""
    docs = load_table(spark, sf_dir, "documents")
    grams = char_shingles(docs, k=5, distinct=True).select(
        "doc_id", F.col("shingle").alias("gram")
    )
    w = Window.partitionBy("gram")
    return (
        grams.withColumn("first_doc", F.min("doc_id").over(w))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0))
            .cast("long")
            .alias("n_novel"),
        )
        .select(
            "doc_id",
            "n_grams",
            "n_novel",
            (
                F.floor(
                    F.col("n_novel").cast("double") / F.col("n_grams") * 10000
                    + F.lit(0.5)
                )
                / F.lit(10000.0)
            ).alias("novelty"),
        )
    )


@query(
    "doc_fuzzy_word_pairs",
    r"""WITH toks AS (
  SELECT unnest(string_split_regex(lower(text), '\s+')) AS w FROM documents
),
words AS (SELECT w, count(*)::BIGINT AS c FROM toks GROUP BY w)
SELECT a.w AS w_a, b.w AS w_b, levenshtein(a.w, b.w)::BIGINT AS dist,
       a.c AS c_a, b.c AS c_b
FROM words a JOIN words b
  ON a.w < b.w AND abs(length(a.w) - length(b.w)) <= 1
WHERE levenshtein(a.w, b.w) <= 2""",
)
def doc_fuzzy_word_pairs(spark, sf_dir):
    """Fuzzy (edit-distance) self-join over the corpus vocabulary — the
    typo-clustering / spelling-normalization primitive of text
    curation: every word pair within Levenshtein distance 2, with
    corpus frequencies attached so the high-frequency member of each
    pair is the correction candidate for the low-frequency one.

    Distributed shape — the blocked fuzzy-join pattern: candidates come
    from a LENGTH-BUCKET equi-join (each word emits buckets len and
    len+1, so |len_a − len_b| ≤ 1 pairs meet in exactly one bucket;
    dist ≤ 2 with length gap 2+ is impossible for dist ≤ 1 edits of
    length... the ≤1-gap block is sound for dist ≤ 2 only when paired
    with the verify step, which re-checks the true distance), then the
    exact ``levenshtein`` verifies each candidate — never an all-pairs
    cross join. The vocabulary input is already corpus-bounded (the
    ``doc_bpe_*`` trick: distinct words, not occurrences); at web scale
    the block key tightens to (length bucket, q-gram signature) — the
    standard positional q-gram filter — with the same join shape."""
    docs = load_table(spark, sf_dir, "documents")
    words = (
        docs.select(F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    buckets = words.select(
        "w", "c", F.explode(F.array(F.length("w"), F.length("w") + 1)).alias("b")
    )
    a = buckets.select(
        F.col("w").alias("w_a"), F.col("c").alias("c_a"), "b"
    )
    bb = buckets.select(
        F.col("w").alias("w_b"), F.col("c").alias("c_b"), "b"
    )
    dist = F.levenshtein("w_a", "w_b")
    return (
        a.join(bb, "b")
        .filter(F.col("w_a") < F.col("w_b"))
        .filter(F.abs(F.length("w_a") - F.length("w_b")) <= 1)
        .select("w_a", "w_b", "c_a", "c_b")
        .distinct()
        .filter(dist <= 2)
        .select(
            "w_a", "w_b", dist.cast("long").alias("dist"), "c_a", "c_b"
        )
    )


@query(
    "doc_weighted_sample",
    """WITH keyed AS (
  SELECT doc_id, source, n_chars,
         floor(ln((('0x' || substr(md5(doc_id::VARCHAR || 'wsamp'), 1, 15))::BIGINT
                   + 1)::DOUBLE / 1152921504606846976.0)
               / n_chars * 1000000000 + 0.5)::BIGINT AS neg_key_nano
  FROM documents
)
SELECT doc_id, source, n_chars, neg_key_nano
FROM keyed ORDER BY neg_key_nano DESC, doc_id LIMIT 20""",
)
def doc_weighted_sample(spark, sf_dir):
    """Weighted sampling without replacement (Efraimidis–Spirakis A-ES):
    each item draws u ~ U(0,1] and ranks by u^(1/w) — equivalently by
    ln(u)/w, monotone and numerically safer — so the inclusion
    probability is proportional to weight w (here n_chars: longer docs
    are likelier picks, the size-biased sampling used for
    token-budgeted subcorpus draws). Deterministic u from md5(doc_id)
    (the reproducible-sampling discipline of ``doc_hash_sample``), and
    the key is quantized to integer NANO-units before ranking so the
    top-k cut is bit-identical across engines (ln/÷ are one double op
    each, identical left-to-right on both, then one floor).

    The profound property (vs naive weighted picking): A-ES keys are
    independent per item, so top-k by key IS a without-replacement
    weighted sample — computable as a narrow scan + TakeOrdered, no
    sequential draws, trivially distributed and mergeable across
    partitions (each partition's local top-k suffices). That is what
    makes it the 100 TB weighted sampler."""
    docs = load_table(spark, sf_dir, "documents")
    u = (
        F.conv(
            F.substring(F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("wsamp"))), 1, 15),
            16,
            10,
        ).cast("long")
        + 1
    ).cast("double") / F.lit(1152921504606846976.0)
    neg_key_nano = F.floor(
        F.log(u) / F.col("n_chars") * 1000000000 + F.lit(0.5)
    ).cast("long")
    return (
        docs.select("doc_id", "source", "n_chars", neg_key_nano.alias("neg_key_nano"))
        .orderBy(F.desc("neg_key_nano"), F.asc("doc_id"))
        .limit(20)
    )


@query(
    "doc_tokenizer_fertility",
    "WITH enc AS (\n"
    + ORACLES["doc_bpe_encode"]
    + """
)
SELECT d.source,
       sum(enc.n_words)::BIGINT AS n_words,
       sum(enc.n_tokens)::BIGINT AS n_tokens,
       sum(d.n_chars)::BIGINT AS n_chars,
       floor(sum(enc.n_tokens)::DOUBLE / sum(enc.n_words) * 10000 + 0.5)
           / 10000.0 AS tokens_per_word,
       floor(sum(enc.n_tokens)::DOUBLE / sum(d.n_chars) * 100 * 10000 + 0.5)
           / 10000.0 AS tokens_per_100_chars
FROM enc JOIN documents d USING (doc_id)
GROUP BY d.source""",
)
def doc_tokenizer_fertility(spark, sf_dir):
    """Tokenizer FERTILITY per source — tokens-per-word and
    tokens-per-100-chars under the corpus's own 3-round BPE merge
    table: the standard tokenizer-efficiency audit of a training-data
    release (fertility differences across sources/languages predict
    compute cost per byte and flag sources the tokenizer serves badly).
    Composes ``bpe_encode`` (train + apply, ``doc_bpe_encode``) with a
    per-source rollup; the oracle nests the full encode query as a CTE,
    so the hash match covers the composition.

    Cost shape: everything the encode already paid (vocabulary-collapsed
    training, broadcast word→token-count mapping) plus ONE extra
    per-source hash aggregate over the per-doc counts — the audit is
    marginal-cost on top of the tokenizer run, the right property for a
    per-release metric."""
    from etl__project_spark.datapipe.text import bpe_encode

    docs = load_table(spark, sf_dir, "documents")
    enc = bpe_encode(docs, n_rounds=3)
    joined = enc.join(docs.select("doc_id", "source", "n_chars"), "doc_id")
    return joined.groupBy("source").agg(
        F.sum("n_words").cast("long").alias("n_words"),
        F.sum("n_tokens").cast("long").alias("n_tokens"),
        F.sum("n_chars").cast("long").alias("n_chars"),
        (
            F.floor(
                F.sum("n_tokens").cast("double") / F.sum("n_words") * 10000
                + F.lit(0.5)
            )
            / F.lit(10000.0)
        ).alias("tokens_per_word"),
        (
            F.floor(
                F.sum("n_tokens").cast("double") / F.sum("n_chars") * 100 * 10000
                + F.lit(0.5)
            )
            / F.lit(10000.0)
        ).alias("tokens_per_100_chars"),
    )


@query("doc_lsh_incremental", ORACLES["doc_lsh_pairs"])
def doc_lsh_incremental(spark, sf_dir):
    """Dedup AT INGEST: the corpus arrives in two batches (doc_id
    parity) and the MinHash-LSH index is maintained incrementally —
    each batch signs only ITS OWN documents, probes the accumulated
    band table for cross-batch candidates, self-joins within the batch,
    and appends its bands to the index
    (``datapipe/dedup.py:lsh_index_increment``). The oracle is the
    one-shot ``doc_lsh_pairs`` SQL over the full corpus: the hash match
    PROVES the incremental fold finds every pair the batch self-join
    finds (each pair materializes when its later member arrives) and
    invents none — the delta-vs-state discipline of ``operators/ivm.py``
    applied to the dedup index.

    Per-batch cost at 100 TB: sign the batch, probe a band-bucketed
    stored table (bucket-pruned), one within-batch band join — history
    is never re-signed or re-self-joined. This is the shape that makes
    continuous corpus ingestion with near-dup suppression affordable:
    the one-shot twin re-pays the whole corpus every refresh."""
    from etl__project_spark.datapipe.dedup import (
        char_shingles,
        lsh_index_increment,
        minhash_signature,
    )

    docs = load_table(spark, sf_dir, "documents")
    batches = [docs.filter(F.col("doc_id") % 2 == i) for i in range(2)]
    index = None
    all_pairs = None
    for batch in batches:
        sig = state_checkpoint(
            minhash_signature(char_shingles(batch, distinct=False), n_hashes=8),
            table_sized=False,
        )
        if index is None:
            index = spark.createDataFrame(
                [], "doc_id long, band_id int, band_hash string"
            )
        pairs, new_bands = lsh_index_increment(index, sig)
        pairs = state_checkpoint(pairs, table_sized=False)
        all_pairs = pairs if all_pairs is None else all_pairs.unionByName(pairs)
        index = state_checkpoint(index.unionByName(new_bands), table_sized=True)
    return all_pairs.distinct()


@query(
    "doc_dsir_weights",
    r"""WITH toks AS (
  SELECT doc_id, source IN ('src0', 'src1') AS is_t,
         unnest(string_split_regex(lower(text), '\s+')) AS word
  FROM documents
),
tk AS (
  SELECT doc_id, is_t,
         ('0x' || substr(md5(word), 1, 8))::BIGINT % 1024 AS b
  FROM toks
),
model AS (
  SELECT b, count(*)::BIGINT AS c_r,
         sum(CASE WHEN is_t THEN 1 ELSE 0 END)::BIGINT AS c_t
  FROM tk GROUP BY b
),
tot AS (SELECT sum(c_r)::BIGINT AS n_r, sum(c_t)::BIGINT AS n_t FROM model),
lam AS (
  SELECT b,
         floor((ln((c_t + 1)::DOUBLE / (n_t + 1024)::DOUBLE)
               - ln((c_r + 1)::DOUBLE / (n_r + 1024)::DOUBLE)) * 1000000
               + 0.5)::BIGINT AS lm
  FROM model CROSS JOIN tot
)
SELECT doc_id, count(*)::BIGINT AS n_tokens,
       floor(sum(lm)::DOUBLE / count(*) / 100.0 + 0.5) / 10000.0
           AS dsir_logratio
FROM tk JOIN lam USING (b)
GROUP BY doc_id""",
)
def doc_dsir_weights(spark, sf_dir):
    """DSIR importance weights (Xie et al. 2023) — targeted data
    selection, the published upgrade over the corpus-intrinsic quality
    scores (``doc_unigram_logprob`` scores fluency under the corpus's
    OWN distribution; DSIR scores similarity to a chosen TARGET
    distribution): hashed-unigram models for target (sources src0/src1
    standing in for the curated set) and raw (whole corpus), per-doc
    log-likelihood ratio, length-normalized. Compose with
    ``doc_weighted_sample`` (A-ES) for the resampling half. Both
    models come from ONE bounded hash aggregate (1024 feature buckets)
    broadcast back onto the token stream — two shuffles total, model
    size independent of corpus size. See
    ``datapipe/text.py:dsir_weights`` for the full scale story."""
    from etl__project_spark.datapipe.text import dsir_weights

    return dsir_weights(
        load_table(spark, sf_dir, "documents"), target_sources=["src0", "src1"]
    )


@query(
    "doc_dedup_keep_best",
    f"""WITH comp AS ({ORACLES["doc_dup_components"]}),
scored AS (
  SELECT c.component, d.doc_id, d.source, d.n_chars,
         row_number() OVER (
           PARTITION BY c.component
           ORDER BY CASE WHEN d.source IN ('src0', 'src1') THEN 0 ELSE 1 END,
                    d.n_chars DESC, d.doc_id
         ) AS rn
  FROM comp c JOIN documents d ON c.doc_id = d.doc_id
)
SELECT component, doc_id AS keep_id, source AS keep_source,
       n_chars AS keep_n_chars
FROM scored WHERE rn = 1""",
)
def doc_dedup_keep_best(spark, sf_dir):
    """Near-dup removal with a QUALITY-AWARE keeper policy — the
    production refinement of ``doc_dedup_canonical``'s min-id rule:
    within each near-dup component, keep the copy from a preferred
    source first (src0/src1 standing in for the curated tier), then
    the LONGEST copy, then min id as the final tiebreak — the policy
    C4/RefinedWeb-style pipelines apply so dedup removes the WORST
    copy of duplicated content, not an arbitrary one. Components come
    from the same collapse-first LSH composition
    (``canonical_components``); the keeper choice is one ranking
    window partitioned by component over the component map joined back
    to document metadata — a narrow (component, id) exchange, never
    the texts."""
    from pyspark.sql import Window

    comp = QUERIES["doc_dup_components"](spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    pri = F.when(F.col("source").isin("src0", "src1"), 0).otherwise(1)
    w = Window.partitionBy("component").orderBy(
        pri, F.desc("n_chars"), F.asc("doc_id")
    )
    return (
        comp.join(docs, "doc_id")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "component",
            F.col("doc_id").alias("keep_id"),
            F.col("source").alias("keep_source"),
            F.col("n_chars").alias("keep_n_chars"),
        )
    )


@query(
    "doc_dup_size_histogram",
    f"""WITH comp AS ({ORACLES["doc_dup_components"]}),
sizes AS (SELECT component, count(*)::BIGINT AS comp_size
          FROM comp GROUP BY component)
SELECT comp_size, count(*)::BIGINT AS n_components,
       (comp_size * count(*))::BIGINT AS n_docs
FROM sizes GROUP BY comp_size""",
)
def doc_dup_size_histogram(spark, sf_dir):
    """Dup-cluster SIZE distribution — the dedup-quality audit read
    before trusting a dedup pass: how many near-dup components of each
    size exist and how many documents they hold (size 1 = unique docs;
    a giant component is the classic over-merging smell — boilerplate
    or an LSH threshold set too loose chaining unrelated docs). Two
    bounded aggregates over the component map; the texts are never
    touched."""
    comp = QUERIES["doc_dup_components"](spark, sf_dir)
    sizes = comp.groupBy("component").agg(F.count(F.lit(1)).alias("comp_size"))
    return sizes.groupBy("comp_size").agg(
        F.count(F.lit(1)).alias("n_components"),
        (F.col("comp_size") * F.count(F.lit(1))).cast("long").alias("n_docs"),
    )


@query(
    "doc_weighted_sample_stratified",
    """WITH keyed AS (
  SELECT doc_id, source, n_chars,
         floor(ln((('0x' || substr(md5(doc_id::VARCHAR || 'wsamp'), 1, 15))::BIGINT
                   + 1)::DOUBLE / 1152921504606846976.0)
               / n_chars * 1000000000 + 0.5)::BIGINT AS neg_key_nano
  FROM documents
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY source
                               ORDER BY neg_key_nano DESC, doc_id) AS rn
  FROM keyed
)
SELECT source, doc_id, n_chars, neg_key_nano
FROM ranked WHERE rn <= 3""",
)
def doc_weighted_sample_stratified(spark, sf_dir):
    """STRATIFIED weighted sampling without replacement: the A-ES draw
    of ``doc_weighted_sample`` with the top-k cut taken PER SOURCE — a
    size-biased, reproducible sample of every stratum in one pass (the
    balanced-subcorpus draw: k docs from each source, longer docs
    likelier within each). Identical deterministic keys (same md5
    draw, same nano-quantization), so a doc's key agrees between the
    global and stratified samplers; the only change is the ranking
    window partitioned by source — parallel across strata, never a
    global sort. The A-ES independence property is what makes the
    per-stratum top-k a valid without-replacement weighted sample in
    each stratum simultaneously."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    u = (
        F.conv(
            F.substring(F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("wsamp"))), 1, 15),
            16,
            10,
        ).cast("long")
        + 1
    ).cast("double") / F.lit(1152921504606846976.0)
    neg_key = F.floor(
        F.log(u) / F.col("n_chars") * 1_000_000_000 + F.lit(0.5)
    ).cast("long")
    w = Window.partitionBy("source").orderBy(
        F.desc("neg_key_nano"), F.asc("doc_id")
    )
    return (
        docs.select("doc_id", "source", "n_chars", neg_key.alias("neg_key_nano"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("source", "doc_id", "n_chars", "neg_key_nano")
    )


@query(
    "doc_source_kl",
    r"""WITH toks AS (
  SELECT source, unnest(string_split_regex(lower(text), '\s+')) AS word
  FROM documents
),
sw AS (SELECT source, word, count(*)::BIGINT AS c_sw FROM toks GROUP BY source, word),
uni AS (SELECT word, sum(c_sw)::BIGINT AS c_w FROM sw GROUP BY word),
ts AS (SELECT source, sum(c_sw)::BIGINT AS t_s FROM sw GROUP BY source),
n AS (SELECT sum(c_w)::BIGINT AS t FROM uni),
terms AS (
  SELECT sw.source, sw.c_sw,
         floor(ln(sw.c_sw::DOUBLE * n.t::DOUBLE / (ts.t_s::DOUBLE * u.c_w::DOUBLE))
               * 1000000 + 0.5)::BIGINT AS lr_micro
  FROM sw JOIN uni u USING (word) JOIN ts USING (source) CROSS JOIN n
),
agg AS (
  SELECT source, sum(c_sw::HUGEINT * lr_micro)::HUGEINT AS s FROM terms GROUP BY source
)
SELECT a.source, ts.t_s AS n_tokens,
       floor(a.s::DOUBLE / ts.t_s::DOUBLE / 100.0 + 0.5) / 10000.0 AS kl_nats
FROM agg a JOIN ts USING (source)""",
)
def doc_source_kl(spark, sf_dir):
    """Per-source distribution drift: KL(P_source || P_corpus) over the
    token unigram distributions — the standard domain-mix diagnostic
    for training corpora (which slice's language diverges from the
    blend, and by how many nats). Pairs with ``doc_dsir_weights``
    (which reweights BY such divergences) and ``doc_dataset_card``.

    Distributed shape: one (source x word) hash aggregate builds the
    per-source LMs; the corpus LM, per-source totals, and grand total
    are vocabulary-/|sources|-bounded aggregates that re-attach by
    broadcast, so nothing corpus-sized ever shuffles twice. Per-token-
    TYPE terms are weighted by exact counts, not re-scanned per token.

    Determinism (``doc_unigram_logprob`` discipline): each type's ln
    ratio quantizes to integer micro-nats BEFORE the weighted sum, so
    the per-source sum is exact integer arithmetic immune to float
    summation order; the ln argument is the identical double expression
    c_sw*T / (t_s*c_w) on both engines; the final divide is
    floor-quantized to 4 dp."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "source", F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("word")
    )
    sw = (
        toks.groupBy("source", "word")
        .agg(F.count(F.lit(1)).alias("c_sw"))
        .localCheckpoint(eager=True)  # vocab x |sources|-bounded, consumed 3x
    )
    uni = sw.groupBy("word").agg(F.sum("c_sw").alias("c_w"))
    ts = sw.groupBy("source").agg(F.sum("c_sw").alias("t_s"))
    n = uni.agg(F.sum("c_w").alias("t"))
    lr_micro = F.floor(
        F.log(
            F.col("c_sw").cast("double") * F.col("t").cast("double")
            / (F.col("t_s").cast("double") * F.col("c_w").cast("double"))
        )
        * 1000000
        + F.lit(0.5)
    ).cast("long")
    agg = (
        sw.join(F.broadcast(uni), "word")
        .join(F.broadcast(ts), "source")
        .crossJoin(F.broadcast(n))
        .select(
            "source",
            (F.col("c_sw").cast("decimal(18,0)") * lr_micro.cast("decimal(18,0)")).alias("term"),
        )
        .groupBy("source")
        .agg(F.sum("term").alias("s"))
    )
    return agg.join(F.broadcast(ts), "source").select(
        "source",
        F.col("t_s").alias("n_tokens"),
        (
            F.floor(
                F.col("s").cast("double") / F.col("t_s").cast("double") / F.lit(100.0)
                + F.lit(0.5)
            )
            / 10000.0
        ).alias("kl_nats"),
    )


@query(
    "doc_dup_span_merge",
    r"""WITH toks AS (
  SELECT doc_id, string_split_regex(lower(text), '\s+') AS a FROM documents
),
grams AS (
  SELECT doc_id, i AS start, array_to_string(a[i:i+7], ' ') AS g
  FROM toks, unnest(range(1, greatest(len(a) - 6, 1))) AS t(i)
),
dup AS (SELECT g FROM grams GROUP BY g HAVING count(*) > 1),
spans AS (SELECT doc_id, start, start + 7 AS fin FROM grams JOIN dup USING (g)),
isl AS (
  SELECT doc_id, start, fin,
         CASE WHEN start > coalesce(max(fin) OVER (
                PARTITION BY doc_id ORDER BY start, fin
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1) + 1
              THEN 1 ELSE 0 END AS new_isl
  FROM spans
),
isl2 AS (
  SELECT doc_id, start, fin,
         sum(new_isl) OVER (PARTITION BY doc_id ORDER BY start, fin
                            ROWS UNBOUNDED PRECEDING) AS isl_id
  FROM isl
),
merged AS (
  SELECT doc_id, min(start) AS s, max(fin) AS f
  FROM isl2 GROUP BY doc_id, isl_id
),
per_doc AS (
  SELECT doc_id, count(*)::BIGINT AS n_dup_spans,
         sum(f - s + 1)::BIGINT AS n_dup_tokens
  FROM merged GROUP BY doc_id
)
SELECT p.doc_id, n_dup_spans, n_dup_tokens, len(t.a)::BIGINT AS n_tokens,
       floor(n_dup_tokens::DOUBLE / len(t.a)::DOUBLE * 10000 + 0.5) / 10000.0 AS dup_frac
FROM per_doc p JOIN toks t USING (doc_id)""",
)
def doc_dup_span_merge(spark, sf_dir):
    """Exact-substring duplicated-SPAN report: which token ranges of each
    document also occur elsewhere in the corpus, with overlapping hits
    merged into maximal spans — the per-position view behind suffix-
    array-style dedup (Lee et al., "Deduplicating Training Data Makes
    Language Models Better"), where the remediation REDACTS the
    duplicated span instead of dropping the whole document (the span
    analogue of ``doc_passage_scrub``'s passage granularity).

    Algorithm: token 8-gram windows at every position; an 8-gram whose
    corpus frequency exceeds 1 marks its [i, i+7] token span duplicated;
    per-document overlapping-or-adjacent spans merge via gaps-and-
    islands (running max of span ends decides island breaks). Output
    per affected doc: merged-span count, duplicated-token total, and
    the duplicated fraction (floor-quantized 4 dp — all other columns
    are exact integers).

    Distributed shape: the frequency pass is ONE corpus-sized hash
    aggregate on the 8-gram (the ``doc_shingle_count`` shuffle class;
    at 100 TB the group key would be xxhash64(gram) to keep shuffle
    rows 8 bytes wide — raw strings here keep the oracle engine-
    portable); the island merge runs entirely inside per-doc windows
    (partitioned by doc_id, parallel); nothing global, no sort wider
    than a document."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.split(F.lower(F.col("text")), r"\s+").alias("a")
    )
    grams = toks.select(
        "doc_id",
        F.explode(
            F.when(
                F.size("a") >= 8,
                F.expr(
                    "transform(sequence(1, size(a) - 7),"
                    " i -> struct(i AS start, concat_ws(' ', slice(a, i, 8)) AS g))"
                ),
            ).otherwise(F.expr("array()"))
        ).alias("w"),
    ).select("doc_id", F.col("w.start").cast("long").alias("start"), "w.g")
    dup = grams.groupBy("g").agg(F.count(F.lit(1)).alias("cf")).filter(
        F.col("cf") > 1
    )
    spans = grams.join(dup.select("g"), "g").select(
        "doc_id", "start", (F.col("start") + 7).alias("fin")
    )
    wp = Window.partitionBy("doc_id").orderBy("start", "fin")
    prev_max = F.max("fin").over(wp.rowsBetween(Window.unboundedPreceding, -1))
    isl = spans.select(
        "doc_id",
        "start",
        "fin",
        F.when(
            F.col("start") > F.coalesce(prev_max, F.lit(-1)) + 1, F.lit(1)
        ).otherwise(F.lit(0)).alias("new_isl"),
    )
    isl2 = isl.select(
        "doc_id",
        "start",
        "fin",
        F.sum("new_isl").over(wp.rowsBetween(Window.unboundedPreceding, 0)).alias(
            "isl_id"
        ),
    )
    merged = isl2.groupBy("doc_id", "isl_id").agg(
        F.min("start").alias("s"), F.max("fin").alias("f")
    )
    per_doc = merged.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_dup_spans"),
        F.sum(F.col("f") - F.col("s") + 1).alias("n_dup_tokens"),
    )
    return per_doc.join(
        toks.select("doc_id", F.size("a").cast("long").alias("n_tokens")),
        "doc_id",
    ).select(
        "doc_id",
        "n_dup_spans",
        "n_dup_tokens",
        "n_tokens",
        (
            F.floor(
                F.col("n_dup_tokens").cast("double")
                / F.col("n_tokens").cast("double")
                * 10000
                + F.lit(0.5)
            )
            / 10000.0
        ).alias("dup_frac"),
    )


@query(
    "doc_repetition_stats",
    r"""WITH toks AS (
  SELECT doc_id, string_split_regex(lower(text), '\s+') AS a FROM documents
),
uni AS (
  SELECT doc_id, w, count(*)::BIGINT AS c
  FROM (SELECT doc_id, unnest(a) AS w FROM toks) GROUP BY doc_id, w
),
u AS (
  SELECT doc_id, max(c)::BIGINT AS top1, sum(c)::BIGINT AS n
  FROM uni GROUP BY doc_id
),
bi AS (
  SELECT doc_id, g, count(*)::BIGINT AS c
  FROM (
    SELECT doc_id, a[i] || ' ' || a[i+1] AS g
    FROM toks, unnest(range(1, greatest(len(a), 1))) AS t(i)
  ) GROUP BY doc_id, g
),
b AS (SELECT doc_id, max(c)::BIGINT AS top2 FROM bi GROUP BY doc_id),
tri AS (
  SELECT doc_id, g, count(*)::BIGINT AS c
  FROM (
    SELECT doc_id, a[i] || ' ' || a[i+1] || ' ' || a[i+2] AS g
    FROM toks, unnest(range(1, greatest(len(a) - 1, 1))) AS t(i)
  ) GROUP BY doc_id, g
),
tr AS (
  SELECT doc_id,
         sum(CASE WHEN c > 1 THEN c ELSE 0 END)::BIGINT AS dup3,
         sum(c)::BIGINT AS tot3
  FROM tri GROUP BY doc_id
)
SELECT u.doc_id, u.n AS n_words,
       floor(u.top1::DOUBLE / u.n::DOUBLE * 10000 + 0.5) / 10000.0 AS top_word_frac,
       floor(coalesce(b.top2, 0)::DOUBLE * 2 / u.n::DOUBLE * 10000 + 0.5) / 10000.0 AS top_bigram_frac,
       floor(coalesce(tr.dup3, 0)::DOUBLE / greatest(tr.tot3, 1)::DOUBLE * 10000 + 0.5) / 10000.0 AS dup_trigram_frac,
       (floor(u.top1::DOUBLE / u.n::DOUBLE * 10000 + 0.5) <= 1000
        AND floor(coalesce(b.top2, 0)::DOUBLE * 2 / u.n::DOUBLE * 10000 + 0.5) <= 2000
        AND floor(coalesce(tr.dup3, 0)::DOUBLE / greatest(tr.tot3, 1)::DOUBLE * 10000 + 0.5) <= 3000) AS keep
FROM u LEFT JOIN b USING (doc_id) LEFT JOIN tr USING (doc_id)""",
)
def doc_repetition_stats(spark, sf_dir):
    """Repetition-based quality signals (the Gopher/MassiveText
    repetition filters — Rae et al. 2021 §A1.1 — at word granularity,
    matching this corpus's single-line texts): fraction of tokens that
    are the single most frequent word, fraction covered by the most
    frequent bigram, and the fraction of trigram occurrences whose
    trigram repeats within the document — plus the combined keep flag
    at the classic 0.10 / 0.20 / 0.30 thresholds. Complements
    ``doc_quality_gopher`` (length/stopword/numeric rules) with the
    repetition family it lacked; ``doc_dup_span_merge`` is the CROSS-
    document analogue.

    Distributed shape: three (doc_id, gram) hash aggregates — the same
    shuffle class as ``doc_shingle_count``, keyed by doc so every
    reduce is document-local — collapsed to per-doc maxima/sums and
    joined back on doc_id. No windows, nothing global. The keep flag
    compares the already-quantized integers, so the boolean can never
    straddle an ulp."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.split(F.lower(F.col("text")), r"\s+").alias("a")
    )

    def grams(n):
        if n == 1:
            return toks.select("doc_id", F.explode("a").alias("g"))
        return toks.select(
            "doc_id",
            F.explode(
                F.when(
                    F.size("a") >= n,
                    F.expr(
                        f"transform(sequence(1, size(a) - {n - 1}),"
                        f" i -> concat_ws(' ', slice(a, i, {n})))"
                    ),
                ).otherwise(F.expr("array()"))
            ).alias("g"),
        )

    u = (
        grams(1).groupBy("doc_id", "g").agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("top1"), F.sum("c").alias("n"))
    )
    b = (
        grams(2).groupBy("doc_id", "g").agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("top2"))
    )
    tr = (
        grams(3).groupBy("doc_id", "g").agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(
            F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(0)).alias("dup3"),
            F.sum("c").alias("tot3"),
        )
    )
    q = lambda col: F.floor(col * 10000 + F.lit(0.5))  # noqa: E731
    nd = F.col("n").cast("double")
    f1 = q(F.col("top1").cast("double") / nd)
    f2 = q(F.coalesce(F.col("top2"), F.lit(0)).cast("double") * 2 / nd)
    f3 = q(
        F.coalesce(F.col("dup3"), F.lit(0)).cast("double")
        / F.greatest(F.col("tot3"), F.lit(1)).cast("double")
    )
    return (
        u.join(b, "doc_id", "left")
        .join(tr, "doc_id", "left")
        .select(
            "doc_id",
            F.col("n").alias("n_words"),
            (f1 / 10000.0).alias("top_word_frac"),
            (f2 / 10000.0).alias("top_bigram_frac"),
            (f3 / 10000.0).alias("dup_trigram_frac"),
            ((f1 <= 1000) & (f2 <= 2000) & (f3 <= 3000)).alias("keep"),
        )
    )


@query(
    "doc_bm25_topk",
    r"""WITH q(term) AS (VALUES ('spark'), ('merge'), ('window')),
toks AS (
  SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS w
  FROM documents
),
dl AS (SELECT doc_id, count(*)::BIGINT AS len FROM toks GROUP BY doc_id),
stats AS (SELECT count(*)::BIGINT AS n_docs, sum(len)::BIGINT AS n_toks FROM dl),
df AS (
  SELECT w AS term, count(DISTINCT doc_id)::BIGINT AS df
  FROM toks JOIN q ON toks.w = q.term GROUP BY w
),
idf AS (
  SELECT term,
         floor(ln(1.0 + (s.n_docs::DOUBLE - df::DOUBLE + 0.5) / (df::DOUBLE + 0.5))
               * 1000000 + 0.5)::BIGINT AS idf_micro
  FROM df CROSS JOIN stats s
),
tf AS (
  SELECT doc_id, w AS term, count(*)::BIGINT AS tf
  FROM toks JOIN q ON toks.w = q.term GROUP BY doc_id, w
),
scored AS (
  SELECT tf.doc_id,
         floor(i.idf_micro::DOUBLE / 1000000.0
               * (tf.tf::DOUBLE * 2.2)
               / (tf.tf::DOUBLE + 1.2 * (0.25 + 0.75 * dl.len::DOUBLE
                                                 * s.n_docs::DOUBLE / s.n_toks::DOUBLE))
               * 1000000 + 0.5)::BIGINT AS term_micro
  FROM tf JOIN idf i USING (term) JOIN dl USING (doc_id) CROSS JOIN stats s
),
agg AS (SELECT doc_id, sum(term_micro)::BIGINT AS s_micro FROM scored GROUP BY doc_id)
SELECT doc_id, floor(s_micro::DOUBLE / 100.0 + 0.5) / 10000.0 AS bm25
FROM agg ORDER BY s_micro DESC, doc_id LIMIT 10""",
)
def doc_bm25_topk(spark, sf_dir):
    """Okapi BM25 retrieval: top-10 documents for the fixed query
    {spark, merge, window} with k1=1.2, b=0.75 — the lexical-search
    scoring that complements the embedding retrieval family
    (``emb_batch_topk``) on the text side, and the standard hard-
    negative miner for training-data curation.

    Distributed shape: document lengths and corpus totals are one
    doc-keyed aggregate + one scalar; per-term document frequencies and
    term frequencies touch only rows matching the 3-term broadcast
    query (Catalyst pushes the IN filter into the token stream); every
    small side (query, idf, stats) broadcasts, so the big side shuffles
    once on doc_id. Top-10 is TakeOrdered on (score, doc_id), never a
    global sort.

    Determinism: idf quantizes to integer micro-units; each term's
    score is ONE identically-shaped double expression floor-quantized
    to micro-units before the integer per-doc sum (``doc_source_kl``
    discipline); ranking compares exact integers with a doc_id
    tie-break."""
    docs = load_table(spark, sf_dir, "documents")
    scored = _bm25_micro(docs, ["spark", "merge", "window"])
    return (
        scored.orderBy(F.desc("s_micro"), F.asc("doc_id"))
        .limit(10)
        .select(
            "doc_id",
            (
                F.floor(F.col("s_micro").cast("double") / F.lit(100.0) + F.lit(0.5))
                / 10000.0
            ).alias("bm25"),
        )
    )


@query(
    "doc_lang_confusion",
    f"""WITH g AS ({ORACLES["doc_lang_id"]})
SELECT d.lang, g.lang_guess, count(*)::BIGINT AS n,
       floor(count(*)::DOUBLE
             / (sum(count(*)) OVER (PARTITION BY d.lang))::DOUBLE
             * 10000 + 0.5) / 10000.0 AS frac_of_lang
FROM g JOIN documents d USING (doc_id)
GROUP BY d.lang, g.lang_guess""",
)
def doc_lang_confusion(spark, sf_dir):
    """Confusion matrix of the declared `lang` column against the
    stopword-marker language-ID heuristic (``doc_lang_id``) — the
    accuracy audit that tells a corpus curator whether the cheap
    heuristic is trustworthy enough to gate ingestion on, per language
    (row-normalized fractions localize which languages it confuses).

    Distributed shape: the heuristic is a narrow in-row map; one
    |langs|x|guesses|-key aggregate, then the row normalization runs
    on that bounded matrix (window partitioned by lang — a handful of
    rows per partition). Counts exact, fraction floor-quantized 4 dp.

    Reuses the doc_lang_id single coded path on BOTH engines, so the
    confusion matrix can never drift from the classifier it audits."""
    docs = load_table(spark, sf_dir, "documents")
    g = lang_id_heuristic(docs).select("doc_id", "lang_guess")
    m = (
        g.join(docs.select("doc_id", "lang"), "doc_id")
        .groupBy("lang", "lang_guess")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wl = Window.partitionBy("lang")
    return m.select(
        "lang",
        "lang_guess",
        "n",
        (
            F.floor(
                F.col("n").cast("double")
                / F.sum("n").over(wl).cast("double")
                * 10000
                + F.lit(0.5)
            )
            / 10000.0
        ).alias("frac_of_lang"),
    )


@query(
    "doc_zipf_fit",
    r"""WITH freq AS (
  SELECT word, count(*)::BIGINT AS f
  FROM (SELECT unnest(string_split_regex(lower(text), '\s+')) AS word
        FROM documents)
  WHERE word <> ''
  GROUP BY word
),
vocab AS (SELECT count(*)::BIGINT AS n_vocab FROM freq),
top AS (
  SELECT f, row_number() OVER (ORDER BY f DESC, word) AS r
  FROM freq ORDER BY f DESC, word LIMIT 1000
),
q AS (
  SELECT floor(ln(r::DOUBLE) * 1000000 + 0.5)::BIGINT AS xq,
         floor(ln(f::DOUBLE) * 1000000 + 0.5)::BIGINT AS yq
  FROM top
),
s AS (
  SELECT count(*)::BIGINT AS n,
         sum(xq)::HUGEINT AS sx, sum(yq)::HUGEINT AS sy,
         sum(xq::HUGEINT * yq)::HUGEINT AS sxy,
         sum(xq::HUGEINT * xq)::HUGEINT AS sxx
  FROM q
)
SELECT v.n_vocab, s.n AS n_top,
       CASE WHEN s.n::DOUBLE * s.sxx::DOUBLE - s.sx::DOUBLE * s.sx::DOUBLE = 0
            THEN 0.0
            ELSE floor((s.n::DOUBLE * s.sxy::DOUBLE - s.sx::DOUBLE * s.sy::DOUBLE)
                       / (s.n::DOUBLE * s.sxx::DOUBLE - s.sx::DOUBLE * s.sx::DOUBLE)
                       * 10000 + 0.5) / 10000.0 END AS zipf_slope,
       CASE WHEN s.n::DOUBLE * s.sxx::DOUBLE - s.sx::DOUBLE * s.sx::DOUBLE = 0
            THEN floor(s.sy::DOUBLE / s.n::DOUBLE / 1000000.0 * 10000 + 0.5)
                 / 10000.0
            ELSE floor((s.sy::DOUBLE
                        - (s.n::DOUBLE * s.sxy::DOUBLE - s.sx::DOUBLE * s.sy::DOUBLE)
                          / (s.n::DOUBLE * s.sxx::DOUBLE - s.sx::DOUBLE * s.sx::DOUBLE)
                          * s.sx::DOUBLE)
                       / s.n::DOUBLE / 1000000.0 * 10000 + 0.5) / 10000.0 END
           AS log_intercept
FROM s CROSS JOIN vocab v""",
)
def doc_zipf_fit(spark, sf_dir):
    """Zipf's-law fit of the corpus vocabulary: least-squares slope of
    ln(frequency) on ln(rank) over the top-1000 words — the classic
    "is this natural language or something degenerate?" corpus
    diagnostic (natural text slopes near -1; templated/generated text
    and log spam bend the line), and a dataset-card statistic next to
    ``ev_gini_concentration``'s skew number and ``doc_entropy``'s
    per-doc score.

    Exactness: ln(rank) and ln(frequency) are micro-quantized BIGINTs
    BEFORE the regression sums (the ``doc_unigram_logprob``
    discipline), so n, Sx, Sy, Sxy, Sxx are exact wide integers on
    both engines (the quantization scale cancels in the slope ratio);
    slope and intercept each do their floating arithmetic once over
    those exact sums, floor-quantized 4 dp.

    Distributed shape: ONE vocabulary aggregate (word-keyed exchange —
    the ``doc_tfidf`` class); the top-1000 is TakeOrdered (never a
    global sort); ranking and the regression run on 1000 rows."""
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        F.explode(F.split(F.lower("text"), r"\s+")).alias("word")
    ).filter(F.col("word") != "")
    freq = words.groupBy("word").agg(F.count(F.lit(1)).alias("f"))
    freq = freq.localCheckpoint(eager=True)
    vocab = freq.agg(F.count(F.lit(1)).alias("n_vocab"))
    top = freq.orderBy(F.desc("f"), F.asc("word")).limit(1000)
    wr = Window.orderBy(F.desc("f"), F.asc("word"))
    ranked = top.select("f", F.row_number().over(wr).alias("r"))
    q = ranked.select(
        F.floor(F.log(F.col("r").cast("double")) * 1000000 + F.lit(0.5))
        .cast("long")
        .alias("xq"),
        F.floor(F.log(F.col("f").cast("double")) * 1000000 + F.lit(0.5))
        .cast("long")
        .alias("yq"),
    )

    def dec(c):
        return c.cast("decimal(18,0)")

    s = q.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("xq").cast("decimal(38,0)").alias("sx"),
        F.sum("yq").cast("decimal(38,0)").alias("sy"),
        F.sum(dec(F.col("xq")) * dec(F.col("yq")))
        .cast("decimal(38,0)")
        .alias("sxy"),
        F.sum(dec(F.col("xq")) * dec(F.col("xq")))
        .cast("decimal(38,0)")
        .alias("sxx"),
    )
    nd = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxy, sxx = F.col("sxy").cast("double"), F.col("sxx").cast("double")
    den = nd * sxx - sx * sx
    slope = (nd * sxy - sx * sy) / den
    # single-rank head (n_top = 1): zero-variance x, slope undefined ->
    # emit slope 0 and the mean log frequency as the intercept
    return s.crossJoin(F.broadcast(vocab)).select(
        "n_vocab",
        F.col("n").alias("n_top"),
        F.when(den == 0, F.lit(0.0))
        .otherwise(F.floor(slope * 10000 + F.lit(0.5)) / 10000.0)
        .alias("zipf_slope"),
        F.when(
            den == 0,
            F.floor(sy / nd / 1000000.0 * 10000 + F.lit(0.5)) / 10000.0,
        )
        .otherwise(
            F.floor(
                (sy - slope * sx) / nd / 1000000.0 * 10000 + F.lit(0.5)
            )
            / 10000.0
        )
        .alias("log_intercept"),
    )


@query(
    "doc_media_frame_sample",
    """SELECT media_id, ts AS frame_ts_ms,
       sha256(text || ':' || ts::VARCHAR) AS frame_sha
FROM (
  SELECT doc_id AS media_id, text,
         unnest(range(0, (n_chars * 40)::BIGINT, 5000)) AS ts
  FROM documents
)""",
)
def doc_media_frame_sample(spark, sf_dir):
    """Multimodal frame sampling: every video blob yields one row per
    sampled timestamp (stride 5 s over its duration) — the 1→N
    ``mapInPandas`` shape a video pipeline needs for
    frame-level dedup/captioning, which ``doc_media_features``'s 1→1
    featurize doesn't exercise. Decode is env-stubbed like the rest of
    the multimodal family (``multimodal.py:sample_frames_batch``
    raises without ffmpeg; the tested deterministic fake signs each
    frame as sha256(payload + ':' + ts)); the Arrow plumbing — blob
    batching, variable fan-out, frames never materializing as blob
    columns — is real. Duration is synthesized from the fixture
    (n_chars × 40 ms, ~25 chars/s of 'video'); the oracle unrolls the
    identical stride over the same synthetic duration, so the hash
    match covers the fan-out AND the per-frame signatures.

    Scale: output is (corpus duration / stride) rows of 80 B — frame
    SIGNATURES, not frames; the blob column is read once and streamed
    in bounded Arrow batches. The plan's only exchange is the fixture
    loader's round-robin (``sources/tables.py:90`` — single-file local
    parallelism, a no-op on real multi-split storage); the operator
    itself adds none."""
    from etl__project_spark.datapipe.multimodal import sample_frames

    docs = load_table(spark, sf_dir, "documents")
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        (F.col("n_chars") * 40).cast("long").alias("duration_ms"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
    )
    return sample_frames(media, stride_ms=5000, fake=True)


@query(
    "doc_textrank_keywords",
    "WITH "
    + _WORD_GRAPH_SQL
    + r""",
s0 AS (SELECT src AS word, 1000000::BIGINT AS s FROM deg),
"""
    + ",\n".join(_textrank_iter_sql(f"s{i}", f"s{i + 1}") for i in range(5))
    + """
SELECT s5.word, s5.s AS rank_micro, deg.d AS degree
FROM s5 JOIN deg ON s5.word = deg.src
ORDER BY rank_micro DESC, word
LIMIT 20""",
)
def doc_textrank_keywords(spark, sf_dir):
    """Corpus keyword extraction by graph centrality — TextRank
    (Mihalcea & Tarau, EMNLP 2004): build the undirected word
    co-occurrence graph (distinct adjacent-word pairs), then run 5
    PageRank power iterations with damping 0.85,
    ``PR(v) = 0.15 + 0.85 * sum_u PR(u)/deg(u)``, and emit the top-20
    words by final rank. The graph-centrality family member the
    catalog's connected-components operators don't cover: an ITERATED
    fixpoint over an explicit edge list, the same shape as PageRank
    over a web/citation/link graph.

    Cross-engine determinism for the iterated composition: scores live
    in BIGINT micro-units (start 1_000_000; base 150_000 = 0.15); each
    neighbor contribution is ``floor(s/deg)`` (exact — both engines
    divide sub-2^53 integers in double and floor), the damped update
    floors once per node per round, so round N+1's input is
    bit-identical on both engines. Ranking ties break on word.

    Distributed shape: the ONLY corpus-sized work is tokenize +
    distinct-bigram (one exchange, two-phase); everything after lives
    on the vocabulary-sized graph — edges/deg are localCheckpointed
    once and reused, scores (|vocab| rows) re-attach to edges by
    BROADCAST each round (a vocabulary fits an executor at any corpus
    scale, the ``doc_pmi_bigrams`` argument), and each round is one
    vocab-sized hash aggregate with per-round ``localCheckpoint``
    lineage truncation (the ``kmeans_iterate`` pattern). Top-20 is
    TakeOrderedAndProject — no global sort. At 100 TB the iteration
    cost is independent of corpus size; rounds scale with the graph,
    not the data.
    """
    docs = load_table(spark, sf_dir, "documents")
    edges = word_cooccur_edges(docs, checkpoint=False)
    return (
        textrank(edges, n_iter=5)
        .orderBy(F.desc("rank_micro"), "word")
        .limit(20)
    )


@query(
    "doc_cooccur_triangles",
    "WITH "
    + _WORD_GRAPH_SQL
    + r""",
oriented AS (
  SELECT e.src AS a, e.dst AS b
  FROM edges e
  JOIN deg da ON e.src = da.src
  JOIN deg db ON e.dst = db.src
  WHERE (da.d, e.src) < (db.d, e.dst)
),
tri AS (
  SELECT count(*)::BIGINT AS n_triangles
  FROM oriented e1
  JOIN oriented e2 ON e1.b = e2.a
  JOIN oriented e3 ON e3.a = e1.a AND e3.b = e2.b
),
wedge AS (
  SELECT sum(d * (d - 1) / 2)::BIGINT AS n_wedges FROM deg
)
SELECT n_triangles, n_wedges,
       (CASE WHEN n_wedges = 0 THEN 0
             ELSE floor(3.0 * n_triangles::DOUBLE / n_wedges::DOUBLE
                        * 1000000 + 0.5) END)::BIGINT
           AS global_clustering_micro
FROM tri CROSS JOIN wedge""",
)
def doc_cooccur_triangles(spark, sf_dir):
    """Triangle count + global clustering coefficient of the word
    co-occurrence graph — the third graph-family member next to
    connected components (``doc_dup_components``) and centrality
    (``doc_textrank_keywords``), and the classic distributed-graph
    benchmark shape: a multi-way SELF-join whose cost is tamed by
    DEGREE-ORDERED ORIENTATION (Cohen 2009; Suri & Vassilvitskii WWW'11
    use the same idea for MapReduce). Each undirected edge is oriented
    low→high by (degree, word), so every triangle is counted exactly
    once and the wedge join fans out by OUT-degree, which orientation
    bounds by O(sqrt(m)) for any graph — the difference between a
    feasible and an infeasible self-join at 100 TB.

    Distributed shape: corpus-sized work is the one distinct-bigram
    pass; the graph is vocabulary-sized. The wedge join (e1.b = e2.a)
    and the closing semi-check are equi-joins on word keys over the
    oriented edge list; degrees attach by broadcast. Output is one
    row: triangle count, wedge count (sum d·(d−1)/2 — a deg-table
    aggregate), and the global clustering coefficient
    3·triangles/wedges in exact micro-units.
    """
    docs = load_table(spark, sf_dir, "documents")
    return triangle_stats(word_cooccur_edges(docs, checkpoint=False))


@query(
    "doc_kcore_histogram",
    "WITH "
    + _WORD_GRAPH_SQL
    + r""",
v0 AS (SELECT src AS word, d AS c FROM deg),
"""
    + ",\n".join(_kcore_iter_sql(f"v{i}", f"v{i + 1}") for i in range(6))
    + """
SELECT c AS coreness_est, count(*)::BIGINT AS n_words
FROM v6
GROUP BY c
ORDER BY coreness_est""",
)
def doc_kcore_histogram(spark, sf_dir):
    """k-core decomposition estimate of the word co-occurrence graph —
    coreness by H-INDEX ITERATION (Lu, Chen, Zhou et al. 2016: start
    each node at its degree; repeatedly replace each node's value with
    the h-index of its neighbors' values; the sequence decreases
    monotonically to the exact core number). Six fixed rounds give a
    deterministic upper-bound estimate — the fixed-round discipline the
    catalog already uses for kmeans (2) and TextRank (5) — and the
    histogram (coreness -> node count) is the density profile a corpus
    curator reads: high-core words are the interconnected topical core,
    1-core words are peripheral one-off junk.

    The fourth graph-family member (components / centrality /
    triangles / coreness), all sharing ``datapipe/graph.py``'s
    vocabulary-sized edge list: corpus-sized work is the one
    distinct-bigram pass; each h-index round is one broadcast-values
    join + one row_number window + one max aggregate, ALL on the
    vocab-sized neighbor list, with per-round localCheckpoint lineage
    truncation. Output is bounded by the distinct coreness values
    (<= max degree). Exact integers end to end — no float drift.
    """
    from etl__project_spark.datapipe.graph import kcore_hindex

    docs = load_table(spark, sf_dir, "documents")
    vals = kcore_hindex(word_cooccur_edges(docs, checkpoint=False), n_iter=6)
    return (
        vals.groupBy(F.col("coreness_est"))
        .agg(F.count(F.lit(1)).alias("n_words"))
        .orderBy("coreness_est")
    )


@query(
    "doc_related_terms_ppr",
    "WITH "
    + _WORD_GRAPH_SQL
    + r""",
p0 AS (
  SELECT src AS word,
         (CASE WHEN src = 'join' THEN 1000000 ELSE 0 END)::BIGINT AS s
  FROM deg
),
"""
    + ",\n".join(_ppr_iter_sql(f"p{i}", f"p{i + 1}", "join") for i in range(5))
    + """
SELECT p5.word, p5.s AS ppr_micro, deg.d AS degree
FROM p5 JOIN deg ON p5.word = deg.src
WHERE p5.word <> 'join' AND p5.s > 0
ORDER BY ppr_micro DESC, word
LIMIT 20""",
)
def doc_related_terms_ppr(spark, sf_dir):
    """Related-term expansion by personalized PageRank — restart mass
    pinned to the seed word ('join'), 5 power iterations, top-20
    neighbors by stationary visit probability. The QUERY-TIME use of
    the co-occurrence graph: where ``doc_textrank_keywords`` ranks the
    corpus globally, this ranks the neighborhood of one topic seed —
    the curation primitive for harvesting topic-related vocabulary
    (seed 'chemistry', collect the topic cluster) that raw adjacency
    can't give you (PPR weights multi-hop paths by conductance).

    Same engine as TextRank (``datapipe/graph.py:personalized_pagerank``):
    BIGINT micro-unit scores, floor-quantized per round, so the DuckDB
    oracle's 5 unrolled CTE iterations are bit-identical; mass that
    never reaches a word leaves it absent (score 0) in BOTH engines'
    aggregation semantics. Corpus-sized work is the one distinct-bigram
    pass; each round is a broadcast-scores vocab-sized aggregate.
    """
    from etl__project_spark.datapipe.graph import personalized_pagerank

    docs = load_table(spark, sf_dir, "documents")
    ppr = personalized_pagerank(
        word_cooccur_edges(docs, checkpoint=False), "join", n_iter=5
    )
    return (
        ppr.filter((F.col("word") != "join") & (F.col("ppr_micro") > 0))
        .orderBy(F.desc("ppr_micro"), "word")
        .limit(20)
    )


@query(
    "doc_hybrid_rrf",
    r"""WITH qt(term) AS (VALUES ('spark'), ('merge'), ('window')),
toks AS (
  SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS w
  FROM documents
),
dl AS (SELECT doc_id, count(*)::BIGINT AS len FROM toks GROUP BY doc_id),
stats AS (SELECT count(*)::BIGINT AS n_docs, sum(len)::BIGINT AS n_toks FROM dl),
df AS (
  SELECT w AS term, count(DISTINCT doc_id)::BIGINT AS df
  FROM toks JOIN qt ON toks.w = qt.term GROUP BY w
),
idf AS (
  SELECT term,
         floor(ln(1.0 + (s.n_docs::DOUBLE - df::DOUBLE + 0.5) / (df::DOUBLE + 0.5))
               * 1000000 + 0.5)::BIGINT AS idf_micro
  FROM df CROSS JOIN stats s
),
tf AS (
  SELECT doc_id, w AS term, count(*)::BIGINT AS tf
  FROM toks JOIN qt ON toks.w = qt.term GROUP BY doc_id, w
),
scored AS (
  SELECT tf.doc_id,
         floor(i.idf_micro::DOUBLE / 1000000.0
               * (tf.tf::DOUBLE * 2.2)
               / (tf.tf::DOUBLE + 1.2 * (0.25 + 0.75 * dl.len::DOUBLE
                                                 * s.n_docs::DOUBLE / s.n_toks::DOUBLE))
               * 1000000 + 0.5)::BIGINT AS term_micro
  FROM tf JOIN idf i USING (term) JOIN dl USING (doc_id) CROSS JOIN stats s
),
agg AS (SELECT doc_id, sum(term_micro)::BIGINT AS s_micro FROM scored GROUP BY doc_id),
bmr AS (
  SELECT doc_id, row_number() OVER (ORDER BY s_micro DESC, doc_id) AS r
  FROM (SELECT doc_id, s_micro FROM agg ORDER BY s_micro DESC, doc_id LIMIT 50)
),
cq AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
ctop AS (
  SELECT vec_id, cosine FROM (
    SELECT e.vec_id,
           round(list_dot_product(e.embedding::DOUBLE[], q.qv) /
                 (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])) *
                  sqrt(list_dot_product(q.qv, q.qv))), 4) AS cosine
    FROM embeddings e, cq q
  ) ORDER BY cosine DESC, vec_id LIMIT 50
),
cr AS (
  SELECT vec_id AS doc_id,
         row_number() OVER (ORDER BY cosine DESC, vec_id) AS r
  FROM ctop
)
SELECT coalesce(b.doc_id, c.doc_id) AS doc_id,
       (coalesce(1000000000 // (60 + b.r), 0)
        + coalesce(1000000000 // (60 + c.r), 0))::BIGINT AS rrf_nano
FROM bmr b FULL OUTER JOIN cr c ON b.doc_id = c.doc_id
ORDER BY rrf_nano DESC, doc_id
LIMIT 10""",
)
def doc_hybrid_rrf(spark, sf_dir):
    """Hybrid retrieval by reciprocal-rank fusion (Cormack, Clarke &
    Buettcher, SIGIR 2009): fuse the LEXICAL ranking (Okapi BM25 for
    the fixed query {spark, merge, window} — shared ``_bm25_micro``
    scoring) with the SEMANTIC ranking (exact cosine against the
    vec_id-0 query embedding; the fixture convention vec_id = doc_id)
    via ``RRF(d) = sum_r 1/(60 + rank_r(d))`` over each ranker's
    top-50, emitting the fused top-10. The standard first-stage
    retriever shape for RAG/hard-negative mining: rankers disagree,
    RRF is the parameter-free consensus.

    Determinism: both ranks are row_numbers over exact keys (integer
    micro-unit BM25; 4 dp cosine) with id tie-breaks; each reciprocal
    is the exact integer ``floor(1e9/(60+rank))`` so the fused score
    is an exact BIGINT sum.

    Distributed shape: BM25's big side shuffles once on doc_id and the
    query-term filter is pushed to the token stream; cosine is a
    broadcast-query scan with TakeOrdered. The only single-partition
    work is ranking the two 50-row TOP-K LISTS (windows over
    limit-50 results — bounded by construction, enumerated in
    SINGLE_PARTITION_CENSUS); the fusion itself is a full outer join
    of two 50-row frames.
    """
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    bm = _bm25_micro(docs, ["spark", "merge", "window"])
    bm_top = bm.orderBy(F.desc("s_micro"), F.asc("doc_id")).limit(50)
    w_bm = Window.orderBy(F.desc("s_micro"), F.asc("doc_id"))
    bmr = bm_top.withColumn("r", F.row_number().over(w_bm)).select(
        F.col("doc_id"), F.col("r")
    )
    ctop = brute_force_topk(emb, emb.filter(F.col("vec_id") == 0), k=50)
    w_c = Window.orderBy(F.desc("cosine"), F.asc("vec_id"))
    cr = ctop.withColumn("r", F.row_number().over(w_c)).select(
        F.col("vec_id").alias("doc_id"), F.col("r")
    )

    def recip(c):
        return F.floor(F.lit(1000000000).cast("double") / (F.lit(60) + c)).cast(
            "long"
        )

    fused = (
        bmr.withColumnRenamed("r", "rb")
        .join(cr.withColumnRenamed("r", "rc"), "doc_id", "full_outer")
        .select(
            "doc_id",
            (
                F.coalesce(recip(F.col("rb")), F.lit(0).cast("long"))
                + F.coalesce(recip(F.col("rc")), F.lit(0).cast("long"))
            ).alias("rrf_nano"),
        )
    )
    return fused.orderBy(F.desc("rrf_nano"), F.asc("doc_id")).limit(10)


@query(
    "doc_split_leakage_audit",
    f"""WITH sh AS (
  SELECT doc_id, unnest({_SHINGLE_LIST}) AS shingle FROM documents
),
sig AS ({_LSH_SQL_SIG}),
bands AS (
  SELECT doc_id, 0 AS band_id,
         md5(h0::VARCHAR || h1::VARCHAR || h2::VARCHAR || h3::VARCHAR) AS band_hash FROM sig
  UNION ALL
  SELECT doc_id, 1 AS band_id,
         md5(h4::VARCHAR || h5::VARCHAR || h6::VARCHAR || h7::VARCHAR) AS band_hash FROM sig
),
pairs AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b
    ON a.band_id = b.band_id AND a.band_hash = b.band_hash
   AND a.doc_id < b.doc_id
),
split AS (
  SELECT doc_id,
         CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val'
              ELSE 'test' END AS split
  FROM (
    SELECT doc_id,
           ('0x' || substr(md5(doc_id::VARCHAR || 'split'), 1, 15))::BIGINT
               % 100 AS b
    FROM documents
  )
)
SELECT least(sa.split, sb.split) AS split_lo,
       greatest(sa.split, sb.split) AS split_hi,
       count(*)::BIGINT AS n_pairs,
       (least(sa.split, sb.split) <> greatest(sa.split, sb.split)) AS is_leak
FROM pairs p
JOIN split sa ON p.id_a = sa.doc_id
JOIN split sb ON p.id_b = sb.doc_id
GROUP BY 1, 2
ORDER BY split_lo, split_hi""",
)
def doc_split_leakage_audit(spark, sf_dir):
    """Train/val/test SPLIT LEAKAGE audit — the check every training
    pipeline must run before a split ships: assign each document to
    train (80%) / val (10%) / test (10%) by the deterministic
    ``hash_bucket`` (md5, engine-portable), then join the MinHash-LSH
    near-dup candidate pairs against the assignment and count pairs
    that STRADDLE splits. A near-duplicate of a training doc sitting
    in the eval split inflates every benchmark number; this is the
    composed guard the standalone pieces (``doc_hash_sample``,
    ``doc_lsh_pairs``, ``doc_decontaminate``) exist to enable. Output:
    one row per unordered split pair with the candidate count and the
    leak flag (within-split rows are the benign dedup backlog).

    Distributed shape: identical to ``doc_lsh_pairs`` (banded
    equi-join, never all-pairs) plus two broadcast-able hash-assign
    maps and one bounded (≤6-row) aggregate. At 100 TB the pair set is
    the LSH candidate space (collision-bounded) and the split map is a
    pure map-side column — no new shuffle beyond the pair join."""
    from etl__project_spark.datapipe.dedup import (
        char_shingles,
        lsh_candidate_pairs,
        minhash_signature,
    )
    from etl__project_spark.datapipe.sampling import hash_bucket

    docs = load_table(spark, sf_dir, "documents")
    b = hash_bucket(F.col("doc_id"), 100, salt="split")
    split = docs.select(
        "doc_id",
        F.when(b < 80, F.lit("train"))
        .when(b < 90, F.lit("val"))
        .otherwise(F.lit("test"))
        .alias("split"),
    )
    sig = minhash_signature(
        char_shingles(docs, distinct=False), n_hashes=8
    ).persist()
    sig.count()
    pairs = lsh_candidate_pairs(sig, n_bands=2, rows_per_band=4)
    sa = split.select(F.col("doc_id").alias("id_a"), F.col("split").alias("s_a"))
    sb = split.select(F.col("doc_id").alias("id_b"), F.col("split").alias("s_b"))
    return (
        pairs.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            F.least("s_a", "s_b").alias("split_lo"),
            F.greatest("s_a", "s_b").alias("split_hi"),
        )
        .groupBy("split_lo", "split_hi")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .select(
            "split_lo",
            "split_hi",
            "n_pairs",
            (F.col("split_lo") != F.col("split_hi")).alias("is_leak"),
        )
        .orderBy("split_lo", "split_hi")
    )


@query(
    "doc_snm_pairs",
    """WITH s AS (
  SELECT doc_id, substr(lower(text), 1, 24) AS k FROM documents
),
o AS (
  SELECT doc_id,
         lead(doc_id, 1) OVER w AS d1,
         lead(doc_id, 2) OVER w AS d2,
         lead(doc_id, 3) OVER w AS d3
  FROM s WINDOW w AS (ORDER BY k, doc_id)
),
p AS (SELECT doc_id, unnest([d1, d2, d3]) AS nb FROM o)
SELECT least(doc_id, nb)::BIGINT AS id_a,
       greatest(doc_id, nb)::BIGINT AS id_b
FROM p WHERE nb IS NOT NULL""",
)
def doc_snm_pairs(spark, sf_dir):
    """Sorted-neighborhood dedup blocking (Hernandez & Stolfo, SIGMOD
    1995): sort the corpus by a key (first 24 normalized chars), slide
    a window of size 4, emit every pair within it — the classic
    alternative to hash blocking (LSH bands, SimHash buckets) that
    catches near-dups those methods miss when edits fall inside the
    hashed region but the PREFIX survives.

    The 100 TB point is HOW: the oracle defines the semantics with one
    global-order window (single partition by definition — a
    scale-killer), and the engine produces the IDENTICAL pair set with
    no global sort. Keys are banded by their first character (prefix
    bands are contiguous key ranges, so global order == (band, key,
    id) exactly, ties inclusive); within-band neighbors come from
    per-band lead windows (parallel across bands); boundary-straddling
    neighbors come from each band's first/last 3 rows lifted into a
    tiny edge frame (<= 6 x |bands| rows) with exact global positions
    (band offsets from the |bands|-row prefix sum) and self-joined on
    position distance <= 3 — a band smaller than the window is all
    edge rows, so multi-band straddles are covered. The value-hash
    match against the one-window oracle PROVES the decomposition. At
    real scale the band key widens (2-3 prefix chars) to keep bands
    executor-sized; the algebra is unchanged.
    """
    docs = load_table(spark, sf_dir, "documents")
    s = docs.select(
        "doc_id",
        F.substring(F.lower(F.col("text")), 1, 24).alias("k"),
        F.substring(F.lower(F.col("text")), 1, 1).alias("b_raw"),
    )
    sizes = s.groupBy("b_raw").agg(F.count(F.lit(1)).alias("n"))
    wb = Window.orderBy("b_raw").rowsBetween(Window.unboundedPreceding, 0)
    offs = sizes.select(
        "b_raw", (F.sum("n").over(wb) - F.col("n")).alias("off"), "n"
    )
    wk = Window.partitionBy("b_raw").orderBy("k", "doc_id")
    r = s.withColumn("rn", F.row_number().over(wk)).localCheckpoint()
    within = (
        r.select(
            "doc_id",
            *[F.lead("doc_id", i).over(wk).alias(f"d{i}") for i in (1, 2, 3)],
        )
        .select("doc_id", F.explode(F.array("d1", "d2", "d3")).alias("nb"))
        .filter(F.col("nb").isNotNull())
    )
    edge = (
        r.join(F.broadcast(offs), "b_raw")
        .filter((F.col("rn") <= 3) | (F.col("rn") > F.col("n") - 3))
        .select("b_raw", "doc_id", (F.col("off") + F.col("rn")).alias("pos"))
        .localCheckpoint()
    )
    ea = edge.select(
        F.col("b_raw").alias("ba"), F.col("doc_id").alias("da"), F.col("pos").alias("pa")
    )
    eb = edge.select(
        F.col("b_raw").alias("bb"), F.col("doc_id").alias("db"), F.col("pos").alias("pb")
    )
    cross = (
        ea.join(
            F.broadcast(eb),
            (F.col("pb") > F.col("pa"))
            & (F.col("pb") - F.col("pa") <= 3)
            & (F.col("ba") != F.col("bb")),
        )
        .select(F.col("da").alias("doc_id"), F.col("db").alias("nb"))
    )
    return within.unionByName(cross).select(
        F.least("doc_id", "nb").alias("id_a"),
        F.greatest("doc_id", "nb").alias("id_b"),
    )


@query(
    "doc_bm25_cdc",
    r"""WITH post AS (
  SELECT doc_id,
         CASE WHEN doc_id % 10 = 3 THEN text || ' spark merge spark'
              ELSE text END AS text
  FROM documents WHERE doc_id % 10 <> 7
),
q(term) AS (VALUES ('spark'), ('merge'), ('window')),
toks AS (
  SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS w
  FROM post
),
dl AS (SELECT doc_id, count(*)::BIGINT AS len FROM toks GROUP BY doc_id),
stats AS (SELECT count(*)::BIGINT AS n_docs, sum(len)::BIGINT AS n_toks FROM dl),
df AS (
  SELECT w AS term, count(DISTINCT doc_id)::BIGINT AS df
  FROM toks JOIN q ON toks.w = q.term GROUP BY w
),
idf AS (
  SELECT term,
         floor(ln(1.0 + (s.n_docs::DOUBLE - df::DOUBLE + 0.5) / (df::DOUBLE + 0.5))
               * 1000000 + 0.5)::BIGINT AS idf_micro
  FROM df CROSS JOIN stats s
),
tf AS (
  SELECT doc_id, w AS term, count(*)::BIGINT AS tf
  FROM toks JOIN q ON toks.w = q.term GROUP BY doc_id, w
),
scored AS (
  SELECT tf.doc_id,
         floor(i.idf_micro::DOUBLE / 1000000.0
               * (tf.tf::DOUBLE * 2.2)
               / (tf.tf::DOUBLE + 1.2 * (0.25 + 0.75 * dl.len::DOUBLE
                                                 * s.n_docs::DOUBLE / s.n_toks::DOUBLE))
               * 1000000 + 0.5)::BIGINT AS term_micro
  FROM tf JOIN idf i USING (term) JOIN dl USING (doc_id) CROSS JOIN stats s
),
agg AS (SELECT doc_id, sum(term_micro)::BIGINT AS s_micro FROM scored GROUP BY doc_id)
SELECT doc_id, floor(s_micro::DOUBLE / 100.0 + 0.5) / 10000.0 AS bm25
FROM agg ORDER BY s_micro DESC, doc_id LIMIT 10""",
)
def doc_bm25_cdc(spark, sf_dir):
    """BM25 retrieval over an INCREMENTALLY MAINTAINED text index
    (datapipe/text_index.py) while the corpus churns — the CDC
    counterpart of ``doc_bm25_topk``, and the bridge between the IVM
    family and the LLM-datapipe family: postings and doc-lengths are
    distinct-grain signed states (a doc's churn = one doc-key probe +
    tokenizing ONLY the delta docs), df is a per-term signed running
    sum (postings are unique per (doc, term)), corpus totals are two
    running sums. Scoring is a read of the maintained state — the
    batch scorer's exact plan minus the corpus tokenization.

    CDC script: docs %%10==4 arrive late (batch-1 inserts), %%10==3
    get their text REWRITTEN (' spark merge spark' appended — shifts
    tf, dl, df, avgdl, and every other doc's score via the globals),
    batch 2 deletes %%10==7 (takedowns shrink df/n_docs). Oracle =
    one-shot BM25 top-10 for {spark, merge, window} over the replayed
    post-CDC corpus — the hash match proves the maintained index
    equals the from-scratch index, globals included."""
    from etl__project_spark.datapipe.text_index import (
        bm25_from_index,
        maintain_text_index_cdc,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    m10 = F.col("doc_id") % 10
    initial = docs.filter(m10 != 4)
    batch1 = (
        docs.filter(m10 == 4)
        .withColumn("op", F.lit("I"))
        .unionByName(
            docs.filter(m10 == 3)
            .withColumn("text", F.concat(F.col("text"), F.lit(" spark merge spark")))
            .withColumn("op", F.lit("U"))
        )
    )
    batch2 = docs.filter(m10 == 7).withColumn("op", F.lit("D"))
    index = maintain_text_index_cdc(initial, [batch1, batch2])
    scored = bm25_from_index(index, ["spark", "merge", "window"])
    return (
        scored.orderBy(F.desc("s_micro"), F.asc("doc_id"))
        .limit(10)
        .select(
            "doc_id",
            (
                F.floor(F.col("s_micro").cast("double") / F.lit(100.0) + F.lit(0.5))
                / 10000.0
            ).alias("bm25"),
        )
    )


@query(
    "doc_lsh_cdc",
    f"""WITH post AS (
  SELECT doc_id,
         CASE WHEN doc_id % 10 = 3 THEN text || ' spark merge spark'
              ELSE text END AS text
  FROM documents WHERE doc_id % 10 <> 7
),
sh AS (
  SELECT doc_id, unnest({_SHINGLE_LIST}) AS shingle FROM post
),
sig AS ({_LSH_SQL_SIG}),
bands AS (
  SELECT doc_id, 0 AS band_id,
         md5(h0::VARCHAR || h1::VARCHAR || h2::VARCHAR || h3::VARCHAR) AS band_hash FROM sig
  UNION ALL
  SELECT doc_id, 1 AS band_id,
         md5(h4::VARCHAR || h5::VARCHAR || h6::VARCHAR || h7::VARCHAR) AS band_hash FROM sig
)
SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
FROM bands a JOIN bands b
  ON a.band_id = b.band_id AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id""",
)
def doc_lsh_cdc(spark, sf_dir):
    """LSH near-dup candidate maintenance under corpus CHURN — the
    retraction story ``doc_lsh_incremental`` (ingest-only) lacks: a
    takedown or text rewrite must REMOVE the candidate pairs its old
    bands created. ``datapipe/dedup.py:maintain_lsh_pairs_cdc`` keeps
    (1) the band table as a distinct-grain signed state (churned docs
    re-shingle/re-hash; everyone else's bands are never recomputed)
    and (2) per-pair shared-bucket counts via the self-join delta
    Δ(B ⋈ B) = ΔB ⋈ B_old ∪ ΔB ⋈ ΔB with multiplying signs — a pair
    stays live while its count is positive, so a pair backed by two
    buckets survives a rewrite that dissolves one.

    CDC script: docs %%10==4 arrive late, %%10==3 get rewritten
    (shingle set shifts → old bands retract, new bands may land in
    different buckets), batch 2 deletes %%10==7. Oracle = the one-shot
    ``doc_lsh_pairs`` SQL over the replayed post-CDC corpus — the hash
    match proves pairs appear AND disappear exactly as a full rebuild
    would have them."""
    from etl__project_spark.datapipe.dedup import maintain_lsh_pairs_cdc

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    m10 = F.col("doc_id") % 10
    initial = docs.filter(m10 != 4)
    batch1 = (
        docs.filter(m10 == 4)
        .withColumn("op", F.lit("I"))
        .unionByName(
            docs.filter(m10 == 3)
            .withColumn("text", F.concat(F.col("text"), F.lit(" spark merge spark")))
            .withColumn("op", F.lit("U"))
        )
    )
    batch2 = docs.filter(m10 == 7).withColumn("op", F.lit("D"))
    return maintain_lsh_pairs_cdc(initial, [batch1, batch2])


@query("doc_components_cdc", ORACLES["doc_dup_components"])
def doc_components_cdc(spark, sf_dir):
    """Streaming corpus canonicalization — the INCREMENTAL composition
    of the two dedup maintenance pieces: documents arrive in three
    batches (doc_id %% 3); each batch signs ONLY its own docs, probes
    the accumulated LSH band index for cross-batch candidate pairs
    (``lsh_index_increment``), and the new pairs merge into maintained
    component labels via
    ``datapipe/dedup.py:merge_components_delta`` — insert-only arrivals
    are the monotone case where components only MERGE, so each batch
    reduces to connected-components over the tiny COMPONENT graph the
    batch touches, never a re-cluster of history. Oracle = the one-shot
    ``doc_dup_components`` recursive-CTE over the full corpus: the hash
    match proves the batch-folded labels equal clustering everything
    from scratch. (Deletions are documented out of scope — decremental
    connectivity needs spanning-forest state; the takedown path
    re-derives affected components from ``maintain_lsh_pairs_cdc``'s
    exact live pairs.)"""
    from etl__project_spark.datapipe.dedup import (
        maintain_components_incremental,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    m3 = F.col("doc_id") % 3
    labels = maintain_components_incremental(
        [docs.filter(m3 == 0), docs.filter(m3 == 1), docs.filter(m3 == 2)]
    )
    return labels.select(
        F.col("id").alias("doc_id"), _int(F.col("component")).alias("component")
    )


@query(
    "doc_quality_gate_cdc",
    """WITH post AS (
  SELECT doc_id, source,
         CASE WHEN doc_id % 10 = 3 THEN n_chars + 200
              ELSE n_chars END AS n_chars
  FROM documents WHERE doc_id % 10 <> 7
),
hist AS (
  SELECT (n_chars * 100) // 1000 AS bucket, count(*)::BIGINT AS n
  FROM post GROUP BY 1
),
cum AS (
  SELECT bucket, n,
         sum(n) OVER (ORDER BY bucket) AS cum,
         sum(n) OVER () AS n_total
  FROM hist
),
thr AS (
  SELECT min(CASE WHEN cum >= (n_total + 3) // 4 THEN bucket END) * 10.0
      AS cutoff
  FROM cum
)
SELECT source,
       count(*)::BIGINT AS n_docs,
       sum(CASE WHEN n_chars >= cutoff THEN 1 ELSE 0 END)::BIGINT AS n_pass
FROM post, thr GROUP BY source""",
)
def doc_quality_gate_cdc(spark, sf_dir):
    """Corpus-RELATIVE quality gate maintained under document CDC — the
    training-data filter whose cutoff is a percentile of the corpus
    itself ("drop the shortest quartile"), so the THRESHOLD is
    data-derived and moves as the corpus churns: inserting long docs
    raises the bar and can flip previously-passing docs to failing
    without touching them. Composition of two maintained states over
    one signed delta stream: the doc-grain base state (consolidate) and
    the retractable n_chars histogram (``partial_hist_signed`` — the
    ``ev_quantile_cdc`` sketch with global grain). The read derives the
    p25 cutoff from the O(buckets) histogram (no sort, no corpus scan),
    then gates the base state per source.

    CDC script: docs %10==4 arrive late (raise/lower the quartile
    edge), %10==3 grow +200 chars (cross the cutoff AND shift it),
    %10==7 deleted. Oracle = one-shot histogram-quantile cutoff + gate
    over the post-CDC corpus — the hash match proves both maintained
    states agree with the replay, including the moved threshold."""
    from etl__project_spark.operators import (
        hist_quantiles,
        merge_hist_signed,
        partial_hist_signed,
    )
    from etl__project_spark.operators.ivm import cdc_to_signed_delta, consolidate

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    m10 = F.col("doc_id") % 10
    initial = docs.filter(m10 != 4)
    batch1 = (
        docs.filter(m10 == 3)
        .withColumn("n_chars", F.col("n_chars") + F.lit(200))
        .withColumn("op", F.lit("U"))
        .unionByName(docs.filter(m10 == 4).withColumn("op", F.lit("I")))
    )
    batch2 = docs.filter(m10 == 7).withColumn("op", F.lit("D"))

    state = initial.select("*", F.lit(1).cast("long").alias("sign"))
    hist = partial_hist_signed(state, [], value_col="n_chars")
    for batch in (batch1, batch2):
        delta = cdc_to_signed_delta(state, batch, ["doc_id"])
        hist = merge_hist_signed(
            hist, partial_hist_signed(delta, [], value_col="n_chars"), []
        )
        state = consolidate(state.unionByName(delta))
    cutoff = hist_quantiles(hist, [], quantiles=[("p25_lo", 1, 4)]).select(
        "p25_lo"
    )
    return (
        state.crossJoin(F.broadcast(cutoff))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(
                F.when(F.col("n_chars") >= F.col("p25_lo"), 1).otherwise(0)
            ).cast("long").alias("n_pass"),
        )
    )


@query(
    "doc_dsir_cdc",
    r"""WITH post AS (
  SELECT doc_id,
         CASE WHEN doc_id % 10 = 3 THEN text || ' alpha beta alpha'
              ELSE text END AS text,
         source
  FROM documents WHERE doc_id % 10 <> 7
),
toks AS (
  SELECT doc_id, source IN ('src0', 'src1') AS is_t,
         unnest(string_split_regex(lower(text), '\s+')) AS word
  FROM post
),
tk AS (
  SELECT doc_id, is_t,
         ('0x' || substr(md5(word), 1, 8))::BIGINT % 1024 AS b
  FROM toks
),
model AS (
  SELECT b, count(*)::BIGINT AS c_r,
         sum(CASE WHEN is_t THEN 1 ELSE 0 END)::BIGINT AS c_t
  FROM tk GROUP BY b
),
tot AS (SELECT sum(c_r)::BIGINT AS n_r, sum(c_t)::BIGINT AS n_t FROM model),
lam AS (
  SELECT b,
         floor((ln((c_t + 1)::DOUBLE / (n_t + 1024)::DOUBLE)
               - ln((c_r + 1)::DOUBLE / (n_r + 1024)::DOUBLE)) * 1000000
               + 0.5)::BIGINT AS lm
  FROM model CROSS JOIN tot
)
SELECT doc_id, count(*)::BIGINT AS n_tokens,
       floor(sum(lm)::DOUBLE / count(*) / 100.0 + 0.5) / 10000.0
           AS dsir_logratio
FROM tk JOIN lam USING (b)
GROUP BY doc_id""",
)
def doc_dsir_cdc(spark, sf_dir):
    """DSIR importance weights maintained under corpus CDC — targeted
    data selection whose MODEL tracks the churning corpus: inserting
    target-like docs shifts the per-bucket log-ratios and re-scores
    every document, the same global-coupling shape as the
    corpus-relative quality gate. State is the doc-grain token-bucket
    POSTINGS (doc_id, is_t, bucket, tf) as signed counts — the
    ``doc_bm25_cdc`` discipline: only DELTA docs tokenize (old images
    retract via the doc base state, post-images assert), history is
    never re-split. Both hashed-unigram models and the per-doc scores
    DERIVE at read time from that already-tokenized state: the model is
    one bounded hash-agg to 1024 rows broadcast back onto the postings
    — the read rescans the index, never the corpus (the trade
    ``read_text_index`` documents). Integer micro-unit log-ratios keep
    per-doc sums exact BIGINT arithmetic, so the oracle (the
    ``doc_dsir_weights`` SQL over the post-CDC corpus) hash-matches.

    CDC script: docs %10==4 arrive late, %10==3 get ' alpha beta
    alpha' appended (injects mass into specific buckets on BOTH model
    sides when the doc is a target doc), %10==7 deleted."""
    from etl__project_spark.operators.ivm import cdc_to_signed_delta, consolidate

    n_buckets = 1024
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "source"
    )
    m10 = F.col("doc_id") % 10
    initial = docs.filter(m10 != 4)
    batch1 = (
        docs.filter(m10 == 3)
        .withColumn("text", F.concat("text", F.lit(" alpha beta alpha")))
        .withColumn("op", F.lit("U"))
        .unionByName(docs.filter(m10 == 4).withColumn("op", F.lit("I")))
    )
    batch2 = docs.filter(m10 == 7).withColumn("op", F.lit("D"))

    def tok_signed(rows):
        return (
            rows.select(
                "doc_id",
                F.col("source").isin("src0", "src1").alias("is_t"),
                F.col("sign"),
                F.explode(F.split(F.lower("text"), r"\s+")).alias("word"),
            )
            .select(
                "doc_id",
                "is_t",
                "sign",
                (
                    F.conv(F.substring(F.md5("word"), 1, 8), 16, 10)
                    .cast("long")
                    % n_buckets
                ).alias("b"),
            )
            .groupBy("doc_id", "is_t", "b")
            .agg(F.sum("sign").cast("long").alias("tf"))
        )

    state = initial.select("*", F.lit(1).cast("long").alias("sign"))
    postings = tok_signed(state)
    for batch in (batch1, batch2):
        delta = cdc_to_signed_delta(state, batch, ["doc_id"])
        postings = (
            postings.unionByName(tok_signed(delta))
            .groupBy("doc_id", "is_t", "b")
            .agg(F.sum("tf").cast("long").alias("tf"))
            .filter(F.col("tf") != 0)
        )
        state = consolidate(state.unionByName(delta))
    postings = state_checkpoint(postings, table_sized=True)
    model = postings.groupBy("b").agg(
        F.sum("tf").cast("long").alias("c_r"),
        F.sum(F.when(F.col("is_t"), F.col("tf")).otherwise(0))
        .cast("long")
        .alias("c_t"),
    )
    tot = model.agg(
        F.sum("c_r").alias("n_r"), F.sum("c_t").alias("n_t")
    )
    lm = F.floor(
        (
            F.log(
                (F.col("c_t") + 1).cast("double")
                / (F.col("n_t") + n_buckets).cast("double")
            )
            - F.log(
                (F.col("c_r") + 1).cast("double")
                / (F.col("n_r") + n_buckets).cast("double")
            )
        )
        * 1_000_000
        + F.lit(0.5)
    ).cast("long")
    lam = model.crossJoin(F.broadcast(tot)).select("b", lm.alias("lm"))
    return (
        postings.join(F.broadcast(lam), "b")
        .groupBy("doc_id")
        .agg(
            F.sum("tf").cast("long").alias("n_tokens"),
            (
                F.floor(
                    F.sum(F.col("tf") * F.col("lm")).cast("double")
                    / F.sum("tf")
                    / F.lit(100.0)
                    + F.lit(0.5)
                )
                / F.lit(10000.0)
            ).alias("dsir_logratio"),
        )
    )


@query(
    "doc_phrase_search",
    """WITH toks AS (
  SELECT doc_id,
         string_split(text, ' ')[i] AS tok,
         i AS ord
  FROM (SELECT doc_id, text,
               unnest(generate_series(1, len(string_split(text, ' ')))) AS i
        FROM documents)
)
SELECT a.doc_id, count(*)::BIGINT AS n_occ
FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND b.ord = a.ord + 1
WHERE a.tok = 'table' AND b.tok = 'value'
GROUP BY a.doc_id""",
)
def doc_phrase_search(spark, sf_dir):
    """Exact phrase search over POSITIONAL postings — the index grain
    BM25's (doc, term, tf) cannot answer: "table value" as adjacent
    tokens, with per-document occurrence counts
    (``datapipe/text_index.py:positional_postings`` / ``phrase_match``).
    The match is one adjacency equi-join per extra phrase term over
    term-FILTERED posting slices (pushdown reaches the scan), keyed on
    (doc_id, pos−offset) — with id-bucketed postings at 100 TB the whole
    query is co-located and touches only the phrase terms' slices,
    where the naive LIKE '%table value%' baseline scans every byte of
    the corpus. The oracle recomputes adjacency from scratch with
    1-based ordinals (offsets cancel), pinning both the matched doc set
    and the per-doc occurrence counts."""
    from etl__project_spark.datapipe.text_index import (
        phrase_match,
        positional_postings,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return phrase_match(positional_postings(docs), ["table", "value"])


@query(
    "doc_phrase_cdc",
    """WITH post AS (
  SELECT doc_id,
         CASE WHEN doc_id % 10 = 3 THEN text || ' table value' ELSE text END AS text
  FROM documents WHERE doc_id % 10 <> 7
),
toks AS (
  SELECT doc_id,
         string_split(text, ' ')[i] AS tok,
         i AS ord
  FROM (SELECT doc_id, text,
               unnest(generate_series(1, len(string_split(text, ' ')))) AS i
        FROM post)
)
SELECT a.doc_id, count(*)::BIGINT AS n_occ
FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND b.ord = a.ord + 1
WHERE a.tok = 'table' AND b.tok = 'value'
GROUP BY a.doc_id""",
)
def doc_phrase_cdc(spark, sf_dir):
    """Phrase search whose POSITIONAL index is MAINTAINED under document
    CDC (``datapipe/text_index.py:maintain_positional_postings_cdc``) —
    the BM25-index maintenance fold at the (doc, pos, term) grain
    adjacency needs: per batch one doc-key probe retracts touched docs'
    stored rows and only the |Δ| post-images re-tokenize, the corpus is
    never re-scanned. The CDC script makes phrase membership itself
    churn: updates APPEND the searched phrase to their docs (every
    updated doc must newly match, and its old positional rows must not
    ghost-match), deletes (doc_id % 10 = 7) remove previously-matching
    docs. Read = the same ``phrase_match`` adjacency join as
    ``doc_phrase_search``, over the maintained live postings; oracle =
    adjacency recompute over the replayed post-CDC corpus."""
    from etl__project_spark.datapipe.text_index import (
        maintain_positional_postings_cdc,
        phrase_match,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    m10 = F.col("doc_id") % 10
    batches = [
        docs.filter(m10 == 3).select(
            "doc_id",
            F.concat(F.col("text"), F.lit(" table value")).alias("text"),
            F.lit("U").alias("op"),
        ),
        docs.filter(m10 == 7).select(
            "doc_id", F.lit(None).cast("string").alias("text"), F.lit("D").alias("op")
        ),
    ]
    live = maintain_positional_postings_cdc(docs, batches)
    return phrase_match(live, ["table", "value"])


@query(
    "doc_decontaminate_cdc",
    f"""WITH ev AS (
  SELECT DISTINCT unnest({_SHINGLE13}) AS sh
  FROM documents WHERE doc_id % 50 = 1 OR doc_id % 100 = 50
),
tr AS (
  SELECT doc_id, unnest({_SHINGLE13}) AS sh
  FROM documents WHERE doc_id % 50 NOT IN (0, 1)
),
hits AS (
  SELECT doc_id, count(*)::BIGINT AS n FROM tr JOIN ev USING (sh) GROUP BY doc_id
)
SELECT d.doc_id, coalesce(h.n, 0)::BIGINT AS n_shared_shingles,
       coalesce(h.n, 0) > 0 AS contaminated
FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
WHERE d.doc_id % 50 NOT IN (0, 1)""",
)
def doc_decontaminate_cdc(spark, sf_dir):
    """Decontamination maintained while the EVAL side churns
    (``datapipe/dedup.py:maintain_decontamination_cdc``) — the
    production shape: benchmarks keep arriving long after the corpus is
    shingled, and a new benchmark must not cost a 100 TB re-shingle.
    The corpus postings shingle ONCE; per eval batch only the batch's
    shingles fold into the eval multiplicity table, only 0 ↔ >0
    LIVENESS transitions probe the postings (the triangle fold's
    two-level split applied to n-gram screening), and per-doc ± deltas
    merge into the maintained shared-counts. CDC script: the %50==1
    slice ARRIVES as a new benchmark, then the %100==0 half of the
    original eval set is RETRACTED — so the oracle (one-shot
    contamination against the post-CDC eval set) pins both that new
    benchmarks flag new docs and that retracted benchmarks UNFLAG docs
    whose only overlap was with them."""
    from etl__project_spark.datapipe.dedup import maintain_decontamination_cdc

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    m50 = F.col("doc_id") % 50
    train = docs.filter(~m50.isin(0, 1))
    eval0 = docs.filter(m50 == 0)
    batches = [
        docs.filter(m50 == 1).select("doc_id", "text", F.lit("I").alias("op")),
        docs.filter(F.col("doc_id") % 100 == 0).select(
            "doc_id", "text", F.lit("D").alias("op")
        ),
    ]
    return maintain_decontamination_cdc(train, eval0, batches, k=13)


@query(
    "doc_proximity_search",
    """WITH toks AS (
  SELECT doc_id,
         string_split(text, ' ')[i] AS tok,
         i AS ord
  FROM (SELECT doc_id, text,
               unnest(generate_series(1, len(string_split(text, ' ')))) AS i
        FROM documents)
)
SELECT a.doc_id, count(*)::BIGINT AS n_pairs
FROM toks a JOIN toks b
  ON a.doc_id = b.doc_id AND b.ord > a.ord AND b.ord - a.ord <= 3
WHERE a.tok = 'table' AND b.tok = 'value'
GROUP BY a.doc_id""",
)
def doc_proximity_search(spark, sf_dir):
    """Ordered proximity search ("value" within 3 tokens after "table")
    over the positional postings — Lucene slop semantics, the read
    between exact phrase (slop=1, ``doc_phrase_search``) and
    co-occurrence. Same co-located plan: two term-filtered posting
    slices join on doc_id with the position-range predicate applied
    post-join, so the corpus never shuffles and cost is bounded by the
    two terms' posting sizes."""
    from etl__project_spark.datapipe.text_index import (
        positional_postings,
        proximity_match,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return proximity_match(positional_postings(docs), "table", "value", slop=3)


@query(
    "doc_repetition_filter",
    r"""WITH toks AS (
  SELECT doc_id, string_split_regex(lower(text), '\s+') AS t FROM documents
),
wc AS (
  SELECT doc_id, word, count(*)::BIGINT AS c
  FROM (SELECT doc_id, unnest(t) AS word FROM toks) GROUP BY doc_id, word
),
uni AS (
  SELECT doc_id, max(c)::BIGINT AS top_word_n, sum(c)::BIGINT AS n_words
  FROM wc GROUP BY doc_id
),
bc AS (
  SELECT doc_id, t[i] || ' ' || t[i+1] AS bg, count(*)::BIGINT AS c
  FROM toks, unnest(generate_series(1, len(t) - 1)) AS u(i)
  GROUP BY doc_id, bg
),
bi AS (SELECT doc_id, max(c)::BIGINT AS top_bigram_n FROM bc GROUP BY doc_id)
SELECT u.doc_id, u.n_words, u.top_word_n,
       coalesce(b.top_bigram_n, 0)::BIGINT AS top_bigram_n,
       (u.top_word_n * 8 <= u.n_words
        AND coalesce(b.top_bigram_n, 0) * 20 <= u.n_words - 1) AS keep
FROM uni u LEFT JOIN bi b USING (doc_id)""",
)
def doc_repetition_filter(spark, sf_dir):
    """Intra-document repetition gate, BIGRAM grain — the Gopher-rules
    (Rae et al. 2021 §A1.1) n-gram repetition family:
    ``doc_repetition_ratio`` covers the unigram signals with per-row
    array expressions (an O(len²)-per-row shape, right for short docs);
    this query adds the most-frequent-BIGRAM rule and computes BOTH
    signals as doc-grain hash AGGREGATES — O(len) per doc — the shape
    that holds for 100 k-token documents. A doc whose top word exceeds
    1/8 of its tokens or whose top bigram exceeds 1/20 of its token
    transitions is template/boilerplate-shaped and gets keep=false.
    Degenerate-repetition docs survive every corpus-LEVEL dedup (they
    are not duplicates of anything) — this per-doc gate is the standard
    companion filter in a training-data pipeline.

    Distributed shape: both signals are doc-grain two-level hash
    aggregates — (doc, word) counts then per-doc max, (doc, bigram)
    counts then per-doc max — with bigrams zipped map-side from each
    token array's own tail (``arrays_zip`` of two slices, fused into
    the scan; no position self-join). The two per-doc profiles join
    doc-keyed. Nothing is corpus-global: state and shuffles stay at
    (doc x distinct-terms-in-doc) grain, embarrassingly scalable at
    100 TB. Thresholds are exact integer multiplies (no fractions), so
    the gate hashes bit-identically across engines."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = docs.select(
        "doc_id", F.split(F.lower(F.col("text")), r"\s+").alias("t")
    )
    uni = (
        toks.select("doc_id", F.explode("t").alias("word"))
        .groupBy("doc_id", "word")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(
            F.max("c").cast("long").alias("top_word_n"),
            F.sum("c").cast("long").alias("n_words"),
        )
    )
    bi = (
        toks.select(
            "doc_id",
            F.explode(
                F.arrays_zip(
                    F.slice(F.col("t"), 1, F.size("t") - 1).alias("w_a"),
                    F.slice(F.col("t"), 2, F.size("t") - 1).alias("w_b"),
                )
            ).alias("p"),
        )
        .select("doc_id", F.concat_ws(" ", "p.w_a", "p.w_b").alias("bg"))
        .groupBy("doc_id", "bg")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").cast("long").alias("top_bigram_n"))
    )
    out = uni.join(bi, "doc_id", "left").select(
        "doc_id",
        "n_words",
        "top_word_n",
        F.coalesce(F.col("top_bigram_n"), F.lit(0)).cast("long").alias(
            "top_bigram_n"
        ),
    )
    keep = (F.col("top_word_n") * 8 <= F.col("n_words")) & (
        F.col("top_bigram_n") * 20 <= F.col("n_words") - 1
    )
    return out.select("*", keep.alias("keep"))


@query(
    "doc_media_audio_windows",
    """SELECT media_id, s AS win_start_ms,
       least(s + 8000, dur) AS win_end_ms,
       (('0x' || substr(sha256(text || ':' || s::VARCHAR), 1, 8))::UBIGINT
        % 1000000)::BIGINT AS energy_micro
FROM (
  SELECT doc_id AS media_id, text, (n_chars * 40)::BIGINT AS dur,
         unnest(range(0, (n_chars * 40)::BIGINT, 5000)) AS s
  FROM documents
)""",
)
def doc_media_audio_windows(spark, sf_dir):
    """Multimodal audio windowing: every audio blob yields one row per
    OVERLAPPING analysis window (8 s window, 5 s hop) with a
    deterministic per-window energy — the third multimodal fan-out
    shape after 1→1 featurize (``doc_media_features``) and disjoint
    frame striding (``doc_media_frame_sample``): overlap means a
    timestamp can belong to two windows, the pattern VAD/loudness
    pipelines cut on. Decode is env-stubbed like the rest of the family
    (``multimodal.py:window_audio_batch`` raises without
    librosa/soundfile); the tested fake derives each window's
    energy_micro from sha256(payload + ':' + start) hex arithmetic the
    oracle reproduces exactly, so the hash match pins the overlap
    fan-out, the duration clipping, AND the per-window values. Duration
    synthesizes from the fixture as in the frame sampler (n_chars × 40
    ms). Scale: output is (corpus duration / hop) rows of scalars; the
    blob column streams once through bounded Arrow batches."""
    from etl__project_spark.datapipe.multimodal import window_audio

    docs = load_table(spark, sf_dir, "documents")
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        (F.col("n_chars") * 40).cast("long").alias("duration_ms"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
    )
    return window_audio(media, window_ms=8000, hop_ms=5000, fake=True)
