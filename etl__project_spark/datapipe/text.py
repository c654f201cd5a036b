"""Text analysis operators for training-data pipelines (SURVEY.md §7
Phase E): token counting, quality scoring, language-ID heuristics,
document fingerprinting.

All pure column expressions — JVM-side, codegen'd, no Python in the hot
path — so they stream through 100 TB of documents at scan speed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from etl__project_spark.session import state_checkpoint

# Tiny per-language stopword marker sets for the n-gram/stopword heuristic.
# Deliberately small and SQL-portable (the oracle uses the same lists).
STOPWORDS = {
    "en": ["the", "and", "of"],
    "es": ["el", "la", "de"],
    "de": ["der", "die", "und"],
    "fr": ["le", "la", "et"],
}

_PUNCT_CLASS = r"[^.,!?;:]"


def _tokens(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.split(c, " ")


def text_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document quality metrics: char/token counts, distinct-token
    ratio, punctuation ratio, mean token length.

    Narrow transformation — no shuffle; at scale this is a pure map stage
    fused into the parquet scan.
    """
    toks = _tokens(text_col)
    n_chars = F.length(F.col(text_col))
    n_tokens = F.size(toks)
    n_punct = F.length(F.regexp_replace(F.col(text_col), _PUNCT_CLASS, ""))
    return df.select(
        F.col(id_col),
        n_chars.cast("long").alias("n_chars"),
        n_tokens.cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct_tokens"),
        F.round(F.size(F.array_distinct(toks)) / n_tokens, 4).alias("distinct_ratio"),
        n_punct.cast("long").alias("n_punct"),
        F.round(n_punct / n_chars, 4).alias("punct_ratio"),
        F.round((n_chars - (n_tokens - 1)) / n_tokens, 4).alias("mean_token_len"),
    )


def token_entropy(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document Shannon entropy of the token distribution (bits) —
    the cheap perplexity proxy used to filter degenerate training text:
    repetitive boilerplate scores low, natural prose sits near
    log2(n_distinct), and the normalized form (H / log2(n_tokens)) is
    length-comparable.

    Entirely in-row array expressions (no shuffle): per distinct token,
    count occurrences with a nested lambda filter — O(distinct x tokens)
    per row, fine for document-sized rows; a corpus of book-length rows
    would switch to the explode + count + window form instead.
    """
    toks = _tokens(text_col)
    n = F.size(toks)
    counts = F.expr(
        f"transform(array_distinct(split({text_col}, ' ')), "
        f"t -> size(filter(split({text_col}, ' '), x -> x = t)))"
    )
    h = -F.aggregate(
        counts,
        F.lit(0.0),
        lambda acc, c: acc + (c / n) * F.log2(c / n),
    )
    return df.select(
        F.col(id_col),
        n.cast("long").alias("n_tokens"),
        F.round(h, 4).alias("entropy_bits"),
        F.round(
            F.when(n > 1, h / F.log2(n)).otherwise(F.lit(0.0)), 4
        ).alias("entropy_norm"),
    )


def lang_id_heuristic(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Stopword-overlap language ID: count exact-token hits against each
    language's marker set; highest count wins (ties → 'und').

    A real deployment swaps in a character-n-gram model via mapInPandas;
    the marker-set variant is the zero-dependency, oracle-checkable core.
    """
    toks = _tokens(text_col)
    hit_cols = []
    for lang, words in STOPWORDS.items():
        arr = F.array(*[F.lit(w) for w in words])
        hits = F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))  # noqa: B023
        hit_cols.append(hits.cast("long").alias(f"hits_{lang}"))
    out = df.select(F.col(id_col), *hit_cols)
    langs = list(STOPWORDS)
    best = F.greatest(*[F.col(f"hits_{lang}") for lang in langs])
    guess = F.lit("und")
    for lang in reversed(langs):
        guess = F.when(
            (F.col(f"hits_{lang}") == best) & (best > 0), F.lit(lang)
        ).otherwise(guess)
    return out.withColumn("lang_guess", guess)


def doc_fingerprint(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Stable content fingerprint: md5 of the exact text plus a
    whitespace-normalized variant (catches trivial-whitespace dups)."""
    norm = F.regexp_replace(F.trim(F.col(text_col)), r"\s+", " ")
    return df.select(
        F.col(id_col),
        F.md5(F.col(text_col)).alias("fingerprint"),
        F.md5(norm).alias("fingerprint_norm"),
    )


# GPT-2-style pre-tokenizer shape, restricted to a regex dialect that
# Java (Spark) and RE2-ish engines (the DuckDB oracle) parse identically:
# runs of letters, runs of digits, or a single non-alphanumeric,
# non-whitespace symbol.
BPE_TOKEN_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def regex_token_counts(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Token counting two ways: naive whitespace split and a BPE-ish
    regex pre-tokenizer (the shape every BPE/WordPiece tokenizer applies
    before merges — counting its pieces approximates LLM token cost far
    better than whitespace words).

    Narrow map stage, pure column expressions (regexp_extract_all is
    JVM-side) — fuses into the scan at 100 TB, no shuffle.
    """
    pieces = F.regexp_extract_all(F.col(text_col), F.lit(BPE_TOKEN_PATTERN), 0)
    alpha = F.filter(pieces, lambda p: p.rlike("^[A-Za-z]+$"))
    num = F.filter(pieces, lambda p: p.rlike("^[0-9]+$"))
    return df.select(
        F.col(id_col),
        F.size(F.split(F.trim(F.col(text_col)), r"\s+")).cast("long").alias("n_ws_tokens"),
        F.size(pieces).cast("long").alias("n_bpe_tokens"),
        F.size(alpha).cast("long").alias("n_alpha_tokens"),
        F.size(num).cast("long").alias("n_num_tokens"),
        (F.size(pieces) - F.size(alpha) - F.size(num)).cast("long").alias("n_sym_tokens"),
    )


# Gopher-style quality-rule thresholds (Rae et al. 2021, "Scaling Language
# Models" §A1.1 repetition/quality filters, adapted to SQL-portable rules).
QUALITY_MIN_WORDS = 30
QUALITY_MAX_WORDS = 100_000
QUALITY_MEAN_WORD_LEN = (3.0, 10.0)
QUALITY_MIN_STOP_HITS = 2
QUALITY_MAX_NUM_RATIO = 0.2
QUALITY_STOP_SET = ["the", "and", "of", "a"]


def quality_rules(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Gopher-style document quality gate: word-count bounds, mean word
    length window, stopword evidence, numeric-token ratio cap. Emits one
    boolean per rule plus the combined ``keep`` flag so downstream
    pipelines can both filter and audit rejection reasons.

    Narrow map stage — pure column expressions, fuses into the scan.
    """
    toks = _tokens(text_col)
    n_words = F.size(toks)
    n_chars = F.length(F.col(text_col))
    mean_wl = (n_chars - (n_words - 1)) / n_words
    stop_arr = F.array(*[F.lit(w) for w in QUALITY_STOP_SET])
    stop_hits = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    num_toks = F.size(F.filter(toks, lambda t: t.rlike("^[0-9]+$")))
    r_words = n_words.between(QUALITY_MIN_WORDS, QUALITY_MAX_WORDS)
    lo, hi = QUALITY_MEAN_WORD_LEN
    r_mwl = (F.round(mean_wl, 4) >= lo) & (F.round(mean_wl, 4) <= hi)
    r_stop = stop_hits >= QUALITY_MIN_STOP_HITS
    r_num = F.round(num_toks / n_words, 4) <= QUALITY_MAX_NUM_RATIO
    return df.select(
        F.col(id_col),
        n_words.cast("long").alias("n_words"),
        r_words.alias("rule_word_count"),
        r_mwl.alias("rule_mean_word_len"),
        r_stop.alias("rule_stopwords"),
        r_num.alias("rule_numeric_ratio"),
        (r_words & r_mwl & r_stop & r_num).alias("keep"),
    )


# PII patterns restricted to a dialect Java regex and RE2 parse
# identically (no backrefs, no lookaround).
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE = r"[0-9]{3}-[0-9]{4}"


def pii_scrub(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """PII redaction: replace email addresses and phone-like numbers with
    typed placeholders, and count what was redacted (the audit trail a
    training-data pipeline must keep).

    Narrow map stage — regexp_replace/regexp_count are JVM-side; at 100 TB
    this runs at scan speed with zero shuffle.
    """
    txt = F.col(text_col)
    n_email = F.regexp_count(txt, F.lit(PII_EMAIL))
    scrubbed_email = F.regexp_replace(txt, PII_EMAIL, "[EMAIL]")
    n_phone = F.regexp_count(scrubbed_email, F.lit(PII_PHONE))
    scrubbed = F.regexp_replace(scrubbed_email, PII_PHONE, "[PHONE]")
    return df.select(
        F.col(id_col),
        n_email.cast("long").alias("n_emails"),
        n_phone.cast("long").alias("n_phones"),
        F.md5(scrubbed).alias("scrubbed_md5"),
    )


def bpe_pair_counts(
    df: DataFrame, text_col: str = "text", min_count: int = 1
) -> DataFrame:
    """Corpus-wide adjacent-symbol pair frequencies — the counting step
    of BPE tokenizer training (one merge round counts every adjacent
    pair across all word occurrences, then merges the most frequent).

    Spark shape: lowercase → whitespace-split → explode words → explode
    each word's adjacent char pairs (``transform`` over ``sequence`` —
    pure JVM array expressions, no Python) → hash-aggregate counts. The
    double explode multiplies rows by ~chars-per-doc, but it is a NARROW
    map stage fused into the scan; the shuffle that follows carries only
    the partial per-partition counts, whose key space is bounded by the
    symbol alphabet squared (tiny), not by corpus size. At 100 TB this
    is scan-bound, exactly like a production tokenizer-training count.

    Words shorter than 2 symbols are filtered BEFORE pair generation:
    Spark's ``sequence(1, 0)`` counts DOWN (yielding [1, 0]) rather than
    producing an empty list, so the guard is correctness, not just
    speed.
    """
    words = df.select(
        F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("word")
    ).filter(F.length("word") >= 2)
    pairs = words.select(
        F.explode(
            F.expr("transform(sequence(1, length(word)-1), i -> substring(word, i, 2))")
        ).alias("pair")
    )
    counts = pairs.groupBy("pair").agg(F.count(F.lit(1)).alias("n_occurrences"))
    if min_count > 1:
        counts = counts.filter(F.col("n_occurrences") >= min_count)
    return counts


def common_ngram_filter(
    df: DataFrame,
    n: int = 3,
    df_threshold: int = 5,
    max_common_frac: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Boilerplate filter (C4-style): flag documents whose word n-grams
    are mostly corpus-common — navigation chrome, license headers, and
    templated text repeat across many documents, so a document dominated
    by high-document-frequency n-grams carries little novel content.

    Single-shuffle Spark shape: per-doc DISTINCT word n-grams explode
    map-side, then ONE exchange hash-partitioned by the md5'd gram key
    serves both needs at once — a ``count(*) over (partition by gram)``
    window IS the document frequency, already attached to every
    (doc, gram) row, so no second scan and no join-back (a first cut
    used agg + self-join, which re-computed the explode and shuffled
    the gram rows twice; the window halves the heavy stage). The final
    per-doc fraction is an ordinary two-phase hash aggregate. The
    shuffle carries 16-byte hashes, not text; every stage is linear in
    total gram count; per-gram window state is bounded by that gram's
    document frequency.

    Documents with fewer than ``n`` words have no n-grams: they rejoin
    via the spine left-join with ``n_grams = 0``, ``common_frac = 0.0``,
    ``keep = true`` (no evidence of boilerplate; short-doc policy
    belongs to the length rules in ``quality_rules``). The spine join
    also keeps them out of the window stage entirely, so a corpus of
    mostly-tiny documents cannot skew one null-gram partition.
    """
    from pyspark.sql import Window

    grams = F.expr(
        f"case when size(split(lower({text_col}), '\\\\s+')) >= {n} then "
        f"array_distinct(transform("
        f"  sequence(1, size(split(lower({text_col}), '\\\\s+')) - {n - 1}),"
        f"  i -> concat_ws(' ', slice(split(lower({text_col}), '\\\\s+'), i, {n}))))"
        f"else cast(array() as array<string>) end"
    )
    doc_grams = df.select(F.col(id_col), F.explode(grams).alias("__gram")).select(
        F.col(id_col), F.md5(F.col("__gram")).alias("__gh")
    )
    with_df = doc_grams.withColumn(
        "__df", F.count(F.lit(1)).over(Window.partitionBy("__gh"))
    )
    per_doc = with_df.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_grams"),
        F.count(F.when(F.col("__df") >= df_threshold, 1)).alias("n_common"),
    )
    spine = df.select(F.col(id_col)).join(per_doc, id_col, "left")
    frac = F.when(
        F.coalesce(F.col("n_grams"), F.lit(0)) > 0,
        F.col("n_common") / F.col("n_grams"),
    ).otherwise(F.lit(0.0))
    q = F.floor(frac * 10000 + F.lit(0.5)) / F.lit(10000.0)
    return spine.select(
        id_col,
        F.coalesce(F.col("n_grams"), F.lit(0)).alias("n_grams"),
        q.alias("common_frac"),
        (q <= F.lit(max_common_frac)).alias("keep"),
    )


def bpe_merge_rounds(
    df: DataFrame, n_rounds: int = 3, text_col: str = "text"
) -> DataFrame:
    """Iterative BPE merge loop — the actual tokenizer-training step
    (Sennrich et al. 2016): count adjacent symbol pairs corpus-wide,
    merge the most frequent pair everywhere, recount; ``n_rounds``
    times. Returns the learned merge table
    ``(round, pair_left, pair_right, merged, n_occurrences)`` — the
    artifact a tokenizer ships.

    Distributed shape: the corpus first collapses to DISTINCT words
    with frequencies (the classic BPE working set — pair counts are
    frequency-weighted, so 100 TB of text becomes a vocabulary-sized
    table before any iteration starts). Each round is then:

    - pair counts: guarded ``transform(sequence(...))`` over the symbol
      arrays (map-side, fused) → hash aggregate keyed by the pair — the
      keyspace is bounded by (current vocab)², not corpus size;
    - argmax: ``orderBy(count desc, pair asc).limit(1)`` plans as
      TakeOrderedAndProject (per-partition top-1, driver merges one row
      per partition — no global sort, no single-partition window);
    - re-segment: the 1-row winner joins back via ``crossJoin(
      broadcast(best))`` — a one-build-row nested loop, NOT a driver
      ``collect`` — and a JVM ``aggregate`` fold rebuilds each symbol
      array left-to-right greedy non-overlapping (merging never
      cascades within a round: the merged token ``a||b`` is strictly
      longer than ``a``, so it can never equal the left symbol and
      re-trigger).

    Per-round ``localCheckpoint(eager=True)`` truncates the lineage so
    round N's plan is O(1), not O(N) nested folds — the same pattern as
    the connected-components loop in ``dedup.py``. The loop runs
    ``n_rounds`` Spark jobs by construction; that is inherent to BPE
    (each round's counts depend on the previous merge), not an
    artifact.

    Ties break deterministically (count desc, then pair lexicographic)
    so the merge table is reproducible across partitionings and
    engines.
    """
    from functools import reduce as _reduce

    rounds = []
    for r, best in enumerate(_bpe_train(df, n_rounds, text_col), start=1):
        rounds.append(
            best.select(
                F.lit(r).cast("long").alias("round"),
                F.col("best_a").alias("pair_left"),
                F.col("best_b").alias("pair_right"),
                F.concat("best_a", "best_b").alias("merged"),
                F.col("best_cnt").cast("long").alias("n_occurrences"),
            )
        )
    return _reduce(lambda x, y: x.unionAll(y), rounds)


def _bpe_step(acc, s):
    """One greedy left-to-right merge fold step: append ``s``, or fuse it
    with the array tail when (tail, s) == the broadcast (best_a, best_b)
    winner. Shared by training re-segmentation and encoding."""
    hit = (
        (F.size(acc) > 0)
        & (F.element_at(acc, -1) == F.col("best_a"))
        & (s == F.col("best_b"))
    )
    return F.when(
        hit,
        F.concat(
            F.slice(acc, 1, F.size(acc) - 1),
            F.array(F.concat("best_a", "best_b")),
        ),
    ).otherwise(F.concat(acc, F.array(s)))


def _apply_merge(frame: DataFrame, best: DataFrame) -> DataFrame:
    """Re-segment ``frame.syms`` by the 1-row ``best`` merge (broadcast
    nested-loop with one build row — never a driver collect), keeping
    every other column."""
    keep = [c for c in frame.columns if c != "syms"]
    return frame.crossJoin(F.broadcast(best)).select(
        F.aggregate(
            F.col("syms"), F.expr("cast(array() as array<string>)"), _bpe_step
        ).alias("syms"),
        *keep,
    )


def _bpe_train(df: DataFrame, n_rounds: int, text_col: str = "text"):
    """The shared BPE training loop: yields one 1-row frame
    (best_a, best_b, best_cnt) per merge round, maintaining the
    frequency-weighted distinct-word working set between rounds."""
    words = (
        df.select(F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("word"))
        .filter(F.length("word") >= 2)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .select(
            F.expr(
                "transform(sequence(1, length(word)), i -> substring(word, i, 1))"
            ).alias("syms"),
            "freq",
        )
    )
    words = state_checkpoint(words, table_sized=False)
    bests = []
    for _ in range(n_rounds):
        pairs = words.select(
            F.explode(
                F.expr(
                    "case when size(syms) >= 2 then transform("
                    "sequence(1, size(syms) - 1),"
                    " i -> struct(element_at(syms, i) as a,"
                    " element_at(syms, i + 1) as b))"
                    " else cast(array() as array<struct<a:string,b:string>>) end"
                )
            ).alias("p"),
            "freq",
        )
        counts = pairs.groupBy("p.a", "p.b").agg(F.sum("freq").alias("cnt"))
        best = state_checkpoint(
            counts.orderBy(F.col("cnt").desc(), F.col("a"), F.col("b"))
            .limit(1)
            .select(
                F.col("a").alias("best_a"),
                F.col("b").alias("best_b"),
                F.col("cnt").alias("best_cnt"),
            ),
            table_sized=False,
        )
        bests.append(best)
        words = state_checkpoint(_apply_merge(words, best), table_sized=False)
    return bests


def bpe_encode(
    df: DataFrame,
    n_rounds: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Apply a trained BPE merge table to ENCODE the corpus — the
    deploy-side twin of ``bpe_merge_rounds`` (train): every document's
    token count after ``n_rounds`` greedy merges, i.e. what the corpus
    costs in tokenizer units. Returns (id, n_words, n_tokens).

    Distributed shape: the merge table is learned on the
    frequency-weighted DISTINCT-word working set (``_bpe_train``), and
    encoding also runs per distinct word — each of the ``n_rounds``
    merges is a 1-row broadcast + JVM fold over the vocabulary-sized
    mapping, NOT over the corpus. Documents then join the finished
    (word → token-count) mapping by broadcast (a vocabulary fits an
    executor at any corpus scale) and reduce with one doc-keyed hash
    aggregate: the corpus is scanned once, shuffled never (the final
    agg shuffles (doc_id, int) pairs). Words the training set excluded
    (length < 2) pass through as single-symbol tokens, exactly like an
    out-of-vocabulary character in a real tokenizer.
    """
    bests = _bpe_train(df, n_rounds, text_col)
    doc_words = df.select(
        F.col(id_col),
        F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("word"),
    )
    mapping = doc_words.select("word").distinct().select(
        "word",
        F.expr(
            "transform(sequence(1, length(word)), i -> substring(word, i, 1))"
        ).alias("syms"),
    )
    for best in bests:
        mapping = _apply_merge(mapping, best)
    sizes = mapping.select("word", F.size("syms").alias("n_syms"))
    return (
        doc_words.join(F.broadcast(sizes), "word")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n_syms").cast("long").alias("n_tokens"),
        )
    )


def dsir_weights(
    df: DataFrame,
    target_sources: list[str],
    n_buckets: int = 1024,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """DSIR-style importance weights for data selection (Xie et al.
    2023, "Data Selection for Language Models via Importance
    Resampling"): score every document by the log-likelihood ratio
    log p_target(x) / log p_raw(x) under two hashed-unigram bag-of-
    words models — target = documents from ``target_sources`` (the
    curated distribution you want more of), raw = the whole corpus.
    High scores = documents that look like the target; feed the scores
    to ``weighted_sample_without_replacement`` (A-ES) for the
    resampling half of DSIR, or threshold for hard selection.

    Distributed shape: words hash into ``n_buckets`` feature buckets
    (md5-based, engine-portable), and BOTH models come from ONE hash
    aggregate over the token stream (c_raw = count, c_target =
    conditional count — the target is a subset of raw, so no second
    pass). The finished model is ``n_buckets`` rows — KBs at any
    corpus size — broadcast back onto the token stream, so scoring is
    a narrow map + one doc-keyed aggregate: two shuffles total, one on
    a fixed-size keyspace, exactly the ``doc_unigram_logprob`` shape.

    Cross-engine determinism: per-bucket log ratios (add-1 smoothed)
    are quantized to integer micro-units BEFORE the per-doc sum, so
    document scores are exact BIGINT arithmetic; the single final
    divide is half-up-rounded to 4 dp.
    """
    toks = df.select(
        F.col(id_col),
        F.col(source_col).isin(target_sources).alias("__is_t"),
        F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("word"),
    )
    tk = toks.select(
        id_col,
        "__is_t",
        (
            F.conv(F.substring(F.md5("word"), 1, 8), 16, 10).cast("long")
            % n_buckets
        ).alias("__b"),
    )
    model = tk.groupBy("__b").agg(
        F.count(F.lit(1)).alias("c_r"),
        F.sum(F.when(F.col("__is_t"), 1).otherwise(0)).cast("long").alias("c_t"),
    )
    tot = model.agg(
        F.sum("c_r").alias("n_r"), F.sum("c_t").alias("n_t")
    )
    lam = F.floor(
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
    scored = model.crossJoin(F.broadcast(tot)).select("__b", lam.alias("__lm"))
    return (
        tk.join(F.broadcast(scored), "__b")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            (
                F.floor(
                    F.sum("__lm").cast("double")
                    / F.count(F.lit(1))
                    / F.lit(100.0)
                    + F.lit(0.5)
                )
                / F.lit(10000.0)
            ).alias("dsir_logratio"),
        )
    )
