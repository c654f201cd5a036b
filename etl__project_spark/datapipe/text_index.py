"""Incremental full-text (BM25) index maintenance under document CDC.

The batch scorer (``doc_bm25_topk`` → ``_bm25_micro``) tokenizes the
whole corpus per run. A production retrieval index over a churning
100 TB corpus can't: the index — postings (doc, term, tf), document
lengths, per-term document frequencies, and the corpus totals — must
advance from the CDC deltas, tokenizing ONLY the churned documents.

The algebra is exactly the signed-delta family (operators/ivm.py):

- postings and doc-lengths are DISTINCT-GRAIN states keyed by
  (doc, term) / (doc,): a doc's churn retracts its old rows (one
  key-probe of the doc-bucketed state) and asserts freshly tokenized
  post-image rows — unchanged docs are never re-read;
- df[term] = Σ signs of (doc, term) posting deltas — a signed running
  sum per term, because postings are at most ONE row per (doc, term);
- (n_docs, n_toks) = signed running sums over the length deltas.

BM25 itself is then a READ of the maintained state: tf rows for the
query terms (term-bucket-pruned at scale), idf from the df table, one
broadcast of the 1-row stats — the same plan shape as the batch
scorer minus the corpus tokenization. Global terms (idf, avgdl) shift
with every batch, so per-doc SCORES are read-time by construction;
what's incremental is everything expensive.

Reference basis: the reference has no text/retrieval surface
(SURVEY.md §2 note on the LLM-datapipe extension); this is the CDC
counterpart of ``doc_bm25_topk``.
"""

from __future__ import annotations

from typing import NamedTuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl__project_spark.session import state_checkpoint

from etl__project_spark.operators.ivm import consolidate


class TextIndex(NamedTuple):
    """Maintained retrieval-index state (all signed, consolidated)."""

    postings: DataFrame  # (doc, term, tf, sign)
    lengths: DataFrame  # (doc, len, sign)
    df: DataFrame  # (term, df)
    stats: DataFrame  # 1 row: (n_docs, n_toks)


def _tokenize(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Whitespace tokens, lowercased — identical to ``_bm25_micro`` and
    the DuckDB oracle's ``string_split_regex(lower(text), '\\s+')``."""
    return docs.select(
        F.col(id_col),
        F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("term"),
    )


def _doc_parts(docs: DataFrame, id_col: str, text_col: str):
    """(postings, lengths) for one document set — the only code path
    that reads text, shared by init and per-batch assertion.

    ``lengths`` aggregates the POSTINGS (Σ tf per doc == token count),
    not the raw token stream: the two frames then share one canonical
    scan→explode→(id, term) aggregate subtree, so any action that
    materializes both (the fold's tagged-union checkpoint, a one-shot
    scorer plan) tokenizes each document ONCE — Spark's runtime
    exchange reuse dedups the shared shuffle (guide §2.2; the
    doc_tfidf_top_terms fix, applied at the operator layer)."""
    toks = _tokenize(docs, id_col, text_col)
    postings = toks.groupBy(id_col, "term").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )
    lengths = postings.groupBy(id_col).agg(
        F.sum("tf").cast("long").alias("len")
    )
    return postings, lengths


def build_text_index(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> TextIndex:
    """One-shot index build — the init path and the replay twin."""
    postings, lengths = _doc_parts(docs, id_col, text_col)
    sign1 = F.lit(1).cast("long").alias("sign")
    postings = postings.select("*", sign1)
    lengths = lengths.select("*", sign1)
    # sum over CASE WHEN tf >= 1 — identical (tf is a count >= 1, sign
    # is +1 on the build path) but the tf reference keeps column
    # pruning from specializing this branch's copy of the postings
    # aggregate, so it shares the tokenize shuffle with postings and
    # lengths instead of re-exploding the corpus a second time.
    df = postings.groupBy("term").agg(
        F.sum(F.when(F.col("tf") >= 1, F.col("sign"))).cast("long").alias("df")
    )
    stats = lengths.agg(
        F.sum("sign").cast("long").alias("n_docs"),
        F.sum(F.col("len") * F.col("sign")).cast("long").alias("n_toks"),
    )
    return TextIndex(postings, lengths, df, stats)


def text_index_delta(
    index: TextIndex,
    batch: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    op_col: str = "op",
    delete_op: str = "D",
) -> tuple[DataFrame, DataFrame]:
    """Signed (posting, length) deltas for one CDC batch against the
    PRE-batch index: retract every touched doc's stored rows (doc-key
    probe — the batch never re-tokenizes unchanged docs), assert the
    tokenization of the batch's post-images."""
    touched = batch.select(id_col).distinct()
    d_post = index.postings.join(touched, [id_col]).select(
        id_col, "term", "tf", (-F.col("sign")).alias("sign")
    )
    d_len = index.lengths.join(touched, [id_col]).select(
        id_col, "len", (-F.col("sign")).alias("sign")
    )
    post_imgs = batch.filter(F.col(op_col) != delete_op).select(
        id_col, text_col
    )
    new_post, new_len = _doc_parts(post_imgs, id_col, text_col)
    sign1 = F.lit(1).cast("long").alias("sign")
    return (
        d_post.unionByName(new_post.select("*", sign1)),
        d_len.unionByName(new_len.select("*", sign1)),
    )


def maintain_text_index_cdc(
    initial: DataFrame,
    cdc_batches: list[DataFrame],
    id_col: str = "doc_id",
    text_col: str = "text",
    op_col: str = "op",
    delete_op: str = "D",
    checkpoint: bool = True,
) -> TextIndex:
    """Advance the index through CDC batches (late doc arrivals, text
    rewrites, takedown deletes). Equal to :func:`build_text_index` of
    the replayed post-CDC corpus (pinned by the ``doc_bm25_cdc`` oracle
    and a replay property test).

    Per batch: one doc-key probe, tokenization of |Δ| docs, one
    term-keyed merge of df, one 1-row stats merge. ``checkpoint``
    materializes each state so batch N's plan is O(1) in N.

    Checkpoint shape (round 11, guide §1.2/§7 — the similarity fold's
    tagged-union lesson applied here): the four index frames
    materialize as ONE DISK_ONLY job per step (previously four), and
    the two per-batch deltas as one memory-level job (previously two).
    Each eager checkpoint is a full Spark job whose fixed overhead —
    not the data — dominates per-batch cost; the union also puts all
    four frames in one plan, so the shared tokenize shuffle
    (``_doc_parts``) computes once per step. Consumers read their
    frame back with a tag filter over the shared materialization."""

    def _ckpt_index(ix: TextIndex) -> TextIndex:
        id_type = ix.postings.schema[id_col].dataType
        nid = F.lit(None).cast(id_type)
        nlong = F.lit(None).cast("long")
        tagged = (
            ix.postings.select(
                F.lit(0).alias("_part"), F.col(id_col).alias("_id"),
                "term", F.col("tf").alias("_v1"), F.col("sign").alias("_v2"),
            )
            .unionByName(ix.lengths.select(
                F.lit(1).alias("_part"), F.col(id_col).alias("_id"),
                F.lit(None).cast("string").alias("term"),
                F.col("len").alias("_v1"), F.col("sign").alias("_v2"),
            ))
            .unionByName(ix.df.select(
                F.lit(2).alias("_part"), nid.alias("_id"), "term",
                F.col("df").alias("_v1"), nlong.alias("_v2"),
            ))
            .unionByName(ix.stats.select(
                F.lit(3).alias("_part"), nid.alias("_id"),
                F.lit(None).cast("string").alias("term"),
                F.col("n_docs").alias("_v1"), F.col("n_toks").alias("_v2"),
            ))
        )
        tagged = state_checkpoint(tagged, table_sized=True)
        return TextIndex(
            tagged.filter(F.col("_part") == 0).select(
                F.col("_id").alias(id_col), "term",
                F.col("_v1").alias("tf"), F.col("_v2").alias("sign"),
            ),
            tagged.filter(F.col("_part") == 1).select(
                F.col("_id").alias(id_col),
                F.col("_v1").alias("len"), F.col("_v2").alias("sign"),
            ),
            tagged.filter(F.col("_part") == 2).select(
                "term", F.col("_v1").alias("df")
            ),
            tagged.filter(F.col("_part") == 3).select(
                F.col("_v1").alias("n_docs"), F.col("_v2").alias("n_toks")
            ),
        )

    index = build_text_index(initial, id_col, text_col)
    if checkpoint:
        index = _ckpt_index(index)
    for batch in cdc_batches:
        d_post, d_len = text_index_delta(
            index, batch, id_col, text_col, op_col, delete_op
        )
        if checkpoint:
            id_type = index.postings.schema[id_col].dataType
            d_both = state_checkpoint(
                d_post.select(
                    F.lit(0).alias("_part"), F.col(id_col).alias("_id"),
                    "term", F.col("tf").alias("_v1"), "sign",
                ).unionByName(d_len.select(
                    F.lit(1).alias("_part"), F.col(id_col).alias("_id"),
                    F.lit(None).cast("string").alias("term"),
                    F.col("len").alias("_v1"), "sign",
                )),
                table_sized=False,
            )
            d_post = d_both.filter(F.col("_part") == 0).select(
                F.col("_id").alias(id_col), "term",
                F.col("_v1").alias("tf"), "sign",
            )
            d_len = d_both.filter(F.col("_part") == 1).select(
                F.col("_id").alias(id_col), F.col("_v1").alias("len"), "sign"
            )
        postings = consolidate(index.postings.unionByName(d_post))
        lengths = consolidate(index.lengths.unionByName(d_len))
        df = (
            index.df.unionByName(
                d_post.groupBy("term").agg(
                    F.sum("sign").cast("long").alias("df")
                )
            )
            .groupBy("term")
            .agg(F.sum("df").cast("long").alias("df"))
            .filter(F.col("df") > 0)
        )
        d_stats = d_len.agg(
            F.sum("sign").cast("long").alias("n_docs"),
            F.sum(F.col("len") * F.col("sign")).cast("long").alias("n_toks"),
        )
        stats = (
            index.stats.unionByName(d_stats)
            .agg(
                F.sum("n_docs").cast("long").alias("n_docs"),
                F.sum("n_toks").cast("long").alias("n_toks"),
            )
        )
        index = TextIndex(postings, lengths, df, stats)
        if checkpoint:
            index = _ckpt_index(index)
    return index


def bm25_from_index(
    index: TextIndex, terms: list[str], id_col: str = "doc_id"
) -> DataFrame:
    """Okapi BM25 (k1=1.2, b=0.75) per-document integer micro-unit
    scores for ``terms``, READ from the maintained index — returns
    (id, s_micro), the same contract (and the same floor-quantized
    expressions, term by term) as the batch scorer ``_bm25_micro``
    (plans/catalog.py) so both pin to one oracle."""
    tf = index.postings.filter(F.col("term").isin(*terms)).select(
        id_col, "term", "tf"
    )
    df = index.df.filter(F.col("term").isin(*terms))
    idf = df.crossJoin(F.broadcast(index.stats)).select(
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
    dl = index.lengths.select(id_col, "len")
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
        .join(dl, id_col)
        .crossJoin(F.broadcast(index.stats))
        .select(id_col, term_micro.alias("term_micro"))
        .groupBy(id_col)
        .agg(F.sum("term_micro").alias("s_micro"))
    )


def positional_postings(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, pos, term) positional postings — the index grain phrase and
    proximity queries need beyond the (doc, term, tf) BM25 grain. At
    100 TB this is written once as a table bucketed by id (so the
    adjacency self-joins below co-locate without a shuffle) and
    partition-pruned by term."""
    return docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), " ")).alias("pos", "term"),
    )


def phrase_match(
    postings: DataFrame, phrase: list[str], id_col: str = "doc_id"
) -> DataFrame:
    """(id, n_occ) for documents containing the exact token ``phrase`` —
    n−1 adjacency equi-joins over term-filtered posting slices.

    Plan shape: each phrase term's slice is filtered BEFORE joining
    (predicate pushdown reaches the postings scan), and every join keys
    on (id, pos−offset), so with id-bucketed postings the whole match is
    co-located — the index answers a phrase query touching only the
    phrase terms' slices, never the corpus. A LIKE '%...%' scan is the
    full-corpus baseline this replaces (see ``doc_phrase_search``).
    The co-location is a PINNED plan shape, not an aspiration: over a
    doc_id-bucketed postings table the adjacency self-join is a
    zero-shuffle SortMergeJoin (tests/test_connectors.py) — it needs
    ``spark.sql.requireAllClusterKeysForCoPartition=false`` (the engine
    session default) because the join keys are a superset of the bucket
    key."""
    assert len(phrase) >= 1
    cur = postings.filter(F.col("term") == phrase[0]).select(id_col, "pos")
    for i, t in enumerate(phrase[1:], start=1):
        nxt = postings.filter(F.col("term") == t).select(
            id_col, (F.col("pos") - i).alias("pos")
        )
        cur = cur.join(nxt, [id_col, "pos"])
    return cur.groupBy(id_col).agg(F.count(F.lit(1)).cast("long").alias("n_occ"))


def positional_index_delta(
    postings: DataFrame,
    batch: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    op_col: str = "op",
    delete_op: str = "D",
) -> DataFrame:
    """Signed positional-posting delta for one CDC batch against the
    PRE-batch index: retract every touched doc's stored (pos, term)
    rows (doc-key probe — unchanged docs are never re-tokenized),
    assert the tokenization of the batch's post-images."""
    touched = batch.select(id_col).distinct()
    d_old = postings.join(touched, [id_col]).select(
        id_col, "pos", "term", (-F.col("sign")).alias("sign")
    )
    d_new = positional_postings(
        batch.filter(F.col(op_col) != delete_op), id_col, text_col
    ).select(id_col, "pos", "term", F.lit(1).cast("long").alias("sign"))
    return d_old.unionByName(d_new)


def maintain_positional_postings_cdc(
    initial: DataFrame,
    cdc_batches: list[DataFrame],
    id_col: str = "doc_id",
    text_col: str = "text",
    op_col: str = "op",
    delete_op: str = "D",
    checkpoint: bool = True,
) -> DataFrame:
    """Advance the positional index through CDC batches (text rewrites,
    takedown deletes) — the phrase-query face of
    :func:`maintain_text_index_cdc`: same probe-and-retract fold, at
    the (id, pos, term) grain phrase adjacency needs. Returns the live
    postings (net multiplicity collapsed out — a position holds one
    term); equal to :func:`positional_postings` of the replayed
    post-CDC corpus (pinned by the ``doc_phrase_cdc`` oracle). Per
    batch: one doc-key probe + |Δ| docs tokenized; the corpus is never
    re-scanned. The index state is corpus-sized → DISK_ONLY."""
    from etl__project_spark.session import state_checkpoint

    post = positional_postings(initial, id_col, text_col).select(
        "*", F.lit(1).cast("long").alias("sign")
    )
    if checkpoint:
        post = state_checkpoint(post, table_sized=True)
    for batch in cdc_batches:
        delta = positional_index_delta(
            post, batch, id_col, text_col, op_col, delete_op
        )
        post = (
            post.unionByName(delta)
            .groupBy(id_col, "pos", "term")
            .agg(F.sum("sign").cast("long").alias("sign"))
            .filter(F.col("sign") != 0)
        )
        if checkpoint:
            post = state_checkpoint(post, table_sized=True)
    return post.select(id_col, "pos", "term")


def proximity_match(
    postings: DataFrame,
    term_a: str,
    term_b: str,
    slop: int = 3,
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, n_pairs) for documents where ``term_b`` follows ``term_a``
    within ``slop`` token positions (ordered proximity, Lucene slop
    semantics) — the positional-index read between exact phrase (slop=1)
    and bag-of-words co-occurrence (slop=∞). Same plan shape as
    :func:`phrase_match`: two term-filtered slices, one id-keyed join,
    the range predicate applied post-join on co-located rows."""
    a = postings.filter(F.col("term") == term_a).select(id_col, F.col("pos").alias("pa"))
    b = postings.filter(F.col("term") == term_b).select(id_col, F.col("pos").alias("pb"))
    return (
        a.join(b, id_col)
        .filter((F.col("pb") > F.col("pa")) & (F.col("pb") - F.col("pa") <= slop))
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))
    )
