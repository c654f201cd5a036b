"""Property-based tests (hypothesis): the Spark operators against
independent pure-Python models of the reference semantics
(lambda_s3/lambda_function_s3.py:40-110), over randomized inputs far
beyond the fixture rows."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from etl__project_spark.operators import merge_insert_new, parse_raw, with_dense_ids

# -- pure-Python model of the reference transform ---------------------------

PLATFORM_SET = {"Android", "iPhone", "iPad", "Web"}


def model_platform(title: str) -> str:
    head = title.split("|")[0]
    if "Android" in head:
        return "Android"
    if "iPhone" in head:
        return "iPhone"
    if "iPad" in head:
        return "iPad"
    return "Desktop"


def model_site(title: str) -> str | None:
    head = title.split("|")[0]
    if set(head.split(" ")) & PLATFORM_SET:
        return None
    return head


def model_keep(title: str, events: str) -> bool:
    return "206" in events.split(",") and len(title.split("|")) > 1


# -- strategies -------------------------------------------------------------

_piece = st.text(
    alphabet=st.characters(
        codec="utf-8",
        exclude_characters="|,\x00\n\r",
        categories=("L", "N", "P", "S", "Zs"),
    ),
    min_size=1,
    max_size=12,
)
_title = st.lists(_piece, min_size=1, max_size=4).map("|".join)
_events = st.lists(
    st.sampled_from(["206", "1206", "2060", "100", "120", "157"]),
    min_size=1,
    max_size=6,
).map(",".join)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(st.tuples(_title, _events), min_size=1, max_size=24))
def test_parse_matches_python_model(spark, rows):
    df = spark.createDataFrame(
        [("2017-01-11T00:00:31.000Z", t, e) for t, e in rows],
        "DateTime string, VideoTitle string, events string",
    )
    got = [
        (r["platform"], r["site"], r["video"]) for r in parse_raw(df).collect()
    ]
    want = [
        (model_platform(t), model_site(t), t.split("|")[-1])
        for t, e in rows
        if model_keep(t, e)
    ]
    assert sorted(got, key=str) == sorted(want, key=str)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.sets(st.text(min_size=1, max_size=8), min_size=1, max_size=40))
def test_dense_ids_always_dense(spark, keys):
    df = spark.createDataFrame([(k,) for k in keys], "nk string")
    out = with_dense_ids(df, "nk", id_col="skey", num_partitions=3).collect()
    assert sorted(r["skey"] for r in out) == list(range(len(keys)))
    in_key_order = [r["skey"] for r in sorted(out, key=lambda r: r["nk"])]
    assert in_key_order == sorted(in_key_order)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(st.integers(0, 20), min_size=0, max_size=30),
    st.lists(st.integers(0, 20), min_size=0, max_size=30),
)
def test_merge_dedup_is_set_union(spark, a, b):
    dest = spark.createDataFrame([(x,) for x in set(a)], "id int")
    batch = spark.createDataFrame([(x,) for x in b], "id int") if b else dest.limit(0)
    out = merge_insert_new(dest, batch)
    assert sorted(r["id"] for r in out.collect()) == sorted(set(a) | set(b))


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["g1", "g2", "g3"]),                 # group key
            st.integers(min_value=-1000, max_value=1000),        # cents
            st.integers(min_value=0, max_value=3),               # batch tag
        ),
        min_size=1,
        max_size=30,
    )
)
def test_incremental_rollup_equals_one_shot(spark, rows):
    """Merge algebra invariant: partial-rollup per batch + pairwise merges
    == one-shot aggregation over everything, for ANY batch assignment —
    including empty batches — bit-exact (decimal-quantized sums)."""
    from etl__project_spark.operators import (
        finalize_rollup,
        merge_rollups,
        partial_rollup,
    )

    df = spark.createDataFrame(
        [(g, c / 100.0, t) for g, c, t in rows], "g string, value double, tag int"
    )
    keys = ["g"]
    rolled = partial_rollup(df.filter(F.col("tag") == 0), keys)
    for tag in (1, 2, 3):
        rolled = merge_rollups(
            rolled, partial_rollup(df.filter(F.col("tag") == tag), keys), keys
        )
    got = {
        r["g"]: (r["n_events"], r["total_value"], r["min_value"], r["max_value"])
        for r in finalize_rollup(rolled, keys).collect()
    }
    want = {
        r["g"]: (r["n_events"], r["total_value"], r["min_value"], r["max_value"])
        for r in finalize_rollup(partial_rollup(df, keys), keys).collect()
    }
    assert got == want


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["k1", "k2", "k3"]),      # natural key
            st.sampled_from(["a", "b", "c", "d"]),    # attr version
            st.integers(min_value=0, max_value=9),    # seq (order col)
        ),
        min_size=1,
        max_size=12,
    )
)
def test_scd2_exactly_one_current_per_key_property(spark, batch):
    """Invariant (SURVEY §7 hard part 4): whatever mix of keys and attr
    versions a single delta batch carries, the upserted dimension has
    EXACTLY one current_flag='Y' row per natural key, and it carries the
    max-seq (last-written) version."""
    import datetime as dt

    from etl__project_spark.operators import scd2_upsert

    dim = spark.createDataFrame(
        [(0, "k1", "z", "Y", dt.date(2020, 1, 1), dt.date(9999, 12, 31))],
        "skey long, nk string, attr string, current_flag string, "
        "start_date date, end_date date",
    )
    delta = spark.createDataFrame(batch, "nk string, attr string, seq int")
    out = scd2_upsert(
        dim, delta, "nk", ["attr"], "skey", load_date="2021-01-01", order_col="seq"
    ).collect()
    current = [r for r in out if r["current_flag"] == "Y"]
    keys = {r["nk"] for r in out}
    assert len(current) == len({r["nk"] for r in current})  # ≤1 'Y' per key
    assert {r["nk"] for r in current} == keys  # every key has a current row
    # the surviving version is the max-seq one (ties: max attr)
    want = {}
    for nk, attr, seq in batch:
        if nk not in want or (seq, attr) > want[nk][0]:
            want[nk] = ((seq, attr), attr)
    for r in current:
        if r["nk"] in want:
            assert r["attr"] == want[r["nk"]][1], r["nk"]
    # skeys stay unique across the whole dimension
    skeys = [r["skey"] for r in out]
    assert len(skeys) == len(set(skeys))


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.text(
            alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd"), max_codepoint=0x7F),
            min_size=0,
            max_size=12,
        ),
        min_size=1,
        max_size=15,
    )
)
def test_bpe_pair_counts_matches_python_model(spark, words):
    """Total pair mass must equal sum over word occurrences of
    max(len-1, 0), and per-pair counts must match a direct Python count
    — guards the sequence(1, len-1) descending-sequence edge case."""
    from collections import Counter

    from etl__project_spark.datapipe.text import bpe_pair_counts

    text = " ".join(words)
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    got = {
        r["pair"]: r["n_occurrences"] for r in bpe_pair_counts(df).collect()
    }
    want: Counter = Counter()
    for w in text.lower().split():
        if len(w) >= 2:
            for i in range(len(w) - 1):
                want[w[i : i + 2]] += 1
    assert got == dict(want)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.dictionaries(
        st.sampled_from(["a", "b", "c"]), st.integers(0, 100), max_size=3
    ),
    st.integers(0, 100),
)
def test_stratified_sample_is_union_of_per_stratum_samples(spark, rates, default_pct):
    """The stratified filter must select exactly the union of what
    per-stratum hash_sample calls would select (same salt) — i.e. it is
    pure routing, adding no cross-stratum interference."""
    from etl__project_spark.datapipe.sampling import (
        hash_sample,
        stratified_hash_sample,
    )

    rows = [(i, ["a", "b", "c"][i % 3]) for i in range(120)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    got = sorted(
        r["doc_id"]
        for r in stratified_hash_sample(
            df, rates, "source", "doc_id", default_pct=default_pct, salt="p"
        ).collect()
    )
    want = []
    for s in ("a", "b", "c"):
        stratum = df.filter(F.col("source") == s)
        want += [
            r["doc_id"]
            for r in hash_sample(
                stratum, rates.get(s, default_pct), "doc_id", salt="p"
            ).collect()
        ]
    assert got == sorted(want)


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.text(
            alphabet=st.characters(whitelist_categories=("Ll", "Nd"), max_codepoint=0x7F),
            min_size=0,
            max_size=8,
        ),
        min_size=1,
        max_size=12,
    )
)
def test_bpe_merge_rounds_matches_python_model(spark, words):
    """The learned merge table must equal a direct Python BPE trainer:
    frequency-weighted pair counts over the distinct-word vocabulary,
    argmax with (count desc, pair asc) tie-break, left-to-right greedy
    non-overlapping re-segmentation each round."""
    from collections import Counter

    from etl__project_spark.datapipe.text import bpe_merge_rounds

    text = " ".join(words)
    n_rounds = 3
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    got = [
        (r["round"], r["pair_left"], r["pair_right"], r["merged"], r["n_occurrences"])
        for r in bpe_merge_rounds(df, n_rounds).orderBy("round").collect()
    ]

    vocab = Counter(w for w in text.lower().split() if len(w) >= 2)
    segs = {w: list(w) for w in vocab}
    want = []
    for rnd in range(1, n_rounds + 1):
        counts: Counter = Counter()
        for w, freq in vocab.items():
            s = segs[w]
            for i in range(len(s) - 1):
                counts[(s[i], s[i + 1])] += freq
        if not counts:
            break
        (a, b), cnt = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        want.append((rnd, a, b, a + b, cnt))
        for w in segs:
            s, out = segs[w], []
            for tok in s:
                if out and out[-1] == a and tok == b:
                    out[-1] = a + b
                else:
                    out.append(tok)
            segs[w] = out
    assert got == want


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(st.integers(min_value=0, max_value=500), min_size=1, max_size=120),
    st.integers(min_value=1, max_value=5),
)
def test_hll_sketch_merge_associative(spark, ids, n_shards):
    """Register-wise max-merge must equal the single-shot sketch no
    matter how the input is sharded — the property that lets every
    executor sketch independently. Checked at the register level (the
    estimate is a pure function of the registers)."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(i, x) for i, x in enumerate(ids)], "i long, user_id long")
    h = (
        F.conv(
            F.substring(F.md5(F.concat(F.col("user_id").cast("string"), F.lit("hll"))), 1, 15),
            16,
            10,
        )
        .cast("long")
        .alias("h")
    )
    hashed = df.select(h, "i").select(
        F.pmod(F.col("h"), F.lit(64)).alias("reg"),
        F.expr("h div 64").alias("rem"),
        "i",
    )
    rho = F.when(F.col("rem") == 0, F.lit(55)).otherwise(
        F.lit(55) - F.length(F.expr("bin(rem)"))
    )

    def regs(d):
        return {
            r["reg"]: r["rho"]
            for r in d.select("reg", rho.alias("rho")).groupBy("reg").agg(F.max("rho").alias("rho")).collect()
        }

    single = regs(hashed)
    merged: dict = {}
    for s in range(n_shards):
        for k, v in regs(hashed.filter(F.col("i") % n_shards == s)).items():
            merged[k] = max(merged.get(k, 0), v)
    assert merged == single


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.floats(min_value=0.0, max_value=1030.0, allow_nan=False, allow_infinity=False),
        min_size=1,
        max_size=150,
    ),
    st.integers(min_value=1, max_value=4),
)
def test_quantile_histogram_merge_and_error_bound(spark, values, n_shards):
    """Cell-wise sum-merge of shard histograms must equal the
    single-shot histogram, and every estimated quantile must sit within
    one bin width above the exact rank-based quantile."""
    import math

    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(values)], "i long, value double"
    )
    binc = F.greatest(F.least(F.floor(F.col("value") * 4).cast("long"), F.lit(4095)), F.lit(0))

    def hist(d):
        return {
            r["bin"]: r["c"]
            for r in d.select(binc.alias("bin")).groupBy("bin").agg(F.count(F.lit(1)).alias("c")).collect()
        }

    single = hist(df)
    merged: dict = {}
    for s in range(n_shards):
        for k, v in hist(df.filter(F.col("i") % n_shards == s)).items():
            merged[k] = merged.get(k, 0) + v
    assert merged == single

    n = len(values)
    ordered = sorted(values)
    cum = 0
    cdf = []
    for b in sorted(single):
        cum += single[b]
        cdf.append((b, cum))
    for p in (0.25, 0.5, 0.75, 0.9):
        target = math.ceil(p * n)
        est_bin = next(b for b, c in cdf if c >= target)
        est = (est_bin + 1) * 0.25
        exact = ordered[target - 1]
        clamped = max(min(exact, 1024.0), 0.0)  # histogram clamps at bin 4095
        assert clamped <= est <= clamped + 0.25 + 1e-9, (p, est, exact)


# -- round-5 analytics: funnel vs a pure-Python model -----------------------

_ev = st.tuples(
    st.integers(min_value=1, max_value=4),  # user
    st.sampled_from(["signup", "view", "click", "purchase", "error"]),
    st.integers(min_value=0, max_value=50),  # minute offset
)


def _model_funnel(events):
    from collections import defaultdict

    stages = ["signup", "view", "click", "purchase"]
    by_user = defaultdict(list)
    for u, ty, t in events:
        by_user[u].append((ty, t))
    counts = dict.fromkeys(stages, 0)
    for evs in by_user.values():
        prev = None
        for i, stage in enumerate(stages):
            cand = [
                t
                for ty, t in evs
                if ty == stage and (True if i == 0 else t > prev)
            ]
            if not cand:
                break
            prev = min(cand)
            counts[stage] += 1
    return counts


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(_ev, min_size=1, max_size=40))
def test_funnel_steps_matches_python_model(spark, events):
    from datetime import datetime

    import etl__project_spark.plans.catalog as cat

    df = spark.createDataFrame(
        [
            (i, datetime(2024, 1, 1, t // 60, t % 60), u, ty, 0.0, "{}")
            for i, (u, ty, t) in enumerate(events)
        ],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    orig = cat.load_table
    cat.load_table = lambda s, d, t: df
    try:
        got = {
            r["stage_name"]: r["n_users"]
            for r in cat.QUERIES["ev_funnel_steps"](spark, "unused").collect()
        }
    finally:
        cat.load_table = orig
    want = _model_funnel(events)
    assert got == want
    # monotone: each stage can only lose users
    seq = [got[s] for s in ["signup", "view", "click", "purchase"]]
    assert all(a >= b for a, b in zip(seq, seq[1:]))


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    changes=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=6),      # key
            st.integers(min_value=0, max_value=40),     # seq
            st.sampled_from(["U", "U", "U", "D"]),      # op (deletes rarer)
        ),
        min_size=1,
        max_size=40,
        unique_by=lambda t: (t[0], t[1]),               # unique (key, seq)
    )
)
def test_cdc_apply_matches_python_fold(spark, changes):
    """cdc_apply == a pure-Python 'replay the log in sequence order'
    model, for random changelogs with interleaved deletes."""
    from etl__project_spark.operators import cdc_apply

    rows = [(k, s, op, float(k * 1000 + s)) for (k, s, op) in changes]
    df = spark.createDataFrame(rows, "id long, seq long, op string, v double")
    got = sorted(map(tuple, cdc_apply(df, ["id"], ["seq"]).collect()))

    # replay in sequence order; a key survives iff its LAST op isn't a delete
    state: dict[int, tuple] = {}
    for k, s, op, v in sorted(rows, key=lambda r: (r[0], r[1])):
        state[k] = (k, s, op, v)
    want = sorted(
        (k, s, op, v) for (k, s, op, v) in state.values() if op != "D"
    )
    assert got == want


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    events=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),      # user
            st.sampled_from(["a", "b", "c"]),           # type
        ),
        min_size=2,
        max_size=40,
    )
)
def test_transition_matrix_matches_python_model(spark, events, monkeypatch):
    """Counts equal a pure-Python per-user bigram model; probabilities
    sum to 1 within each from_type."""
    from collections import Counter, defaultdict
    from datetime import datetime

    import etl__project_spark.plans.catalog as cat

    rows = [
        (i, datetime(2024, 1, 1, 0, 0, i % 60, i), u, t, 1.0, "{}")
        for i, (u, t) in enumerate(events)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    monkeypatch.setattr(cat, "load_table", lambda s, d, t: df)
    got = {
        (r["from_type"], r["to_type"]): r["n"]
        for r in cat.QUERIES["ev_transition_matrix"](spark, "unused").collect()
    }

    by_user = defaultdict(list)
    for i, (u, t) in enumerate(events):
        by_user[u].append((rows[i][1], i, t))
    want: Counter = Counter()
    for seq in by_user.values():
        seq.sort()
        for (_, _, t1), (_, _, t2) in zip(seq, seq[1:]):
            want[(t1, t2)] += 1
    assert got == dict(want)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    events=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=5),      # user
            st.integers(min_value=0, max_value=3 * 1440 - 1),  # minute in 3 days
        ),
        min_size=1,
        max_size=60,
    )
)
def test_peak_concurrency_matches_python_sweep(spark, events):
    """ev_peak_concurrency's two-level prefix-sum decomposition == a
    pure-Python global sweep line, for random multi-day event sets
    (sessions splitting at the 30-min gap, crossing midnight, ties)."""
    from datetime import datetime, timedelta

    import etl__project_spark.plans.catalog as cat

    base = datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [
            (i, base + timedelta(minutes=m), u, "view", 0.0, "{}")
            for i, (u, m) in enumerate(events)
        ],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )

    # python model: sessions per user, then one global sweep
    by_user: dict[int, list[int]] = {}
    for u, m in events:
        by_user.setdefault(u, []).append(m)
    bounds = []
    for u, ms in by_user.items():
        ms = sorted(ms)
        start = prev = ms[0]
        for m in ms[1:]:
            if (m - prev) * 60 > 1800:
                bounds.append((start, prev))
                start = m
            prev = m
        bounds.append((start, prev))
    sweep = sorted(
        [(s, 1) for s, _ in bounds] + [(e, -1) for _, e in bounds],
        key=lambda t: (t[0], -t[1]),
    )
    want: dict[str, int] = {}
    running = 0
    for m, delta in sweep:
        day = str((base + timedelta(minutes=m)).date())
        before, running = running, running + delta
        cand = max(before, running)
        want[day] = max(want.get(day, cand), cand)

    orig = cat.load_table
    cat.load_table = lambda s, d, t: df
    try:
        got = {
            str(r["day"]): r["peak_concurrency"]
            for r in cat.QUERIES["ev_peak_concurrency"](spark, "unused").collect()
        }
    finally:
        cat.load_table = orig
    assert got == want


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    events=st.lists(
        st.tuples(
            st.sampled_from(["a", "b", "c"]),               # event type
            st.integers(min_value=1, max_value=4),          # day of month
        ),
        min_size=2,
        max_size=50,
    )
)
def test_chi2_matches_python_model(spark, events):
    """ev_chi2_independence == a pure-Python chi-square over the same
    contingency table (including EMPTY cells), with the identical
    micro-unit quantization."""
    import math
    from datetime import datetime

    import etl__project_spark.plans.catalog as cat

    df = spark.createDataFrame(
        [
            (i, datetime(2024, 1, d, 12, 0), 1, ty, 0.0, "{}")
            for i, (ty, d) in enumerate(events)
        ],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    # python model (dow of 2024-01-d mirrors Spark's dayofweek)
    cells: dict[tuple[str, int], int] = {}
    for ty, d in events:
        dow = (datetime(2024, 1, d).weekday() + 1) % 7 + 1  # Sunday=1
        cells[(ty, dow)] = cells.get((ty, dow), 0) + 1
    rows = sorted({t for t, _ in cells})
    colz = sorted({d for _, d in cells})
    n_i = {t: sum(v for (tt, _), v in cells.items() if tt == t) for t in rows}
    n_j = {d: sum(v for (_, dd), v in cells.items() if dd == d) for d in colz}
    n = sum(cells.values())
    t_sum = 0
    for t in rows:
        for d in colz:
            e = n_i[t] * n_j[d] / n
            o = cells.get((t, d), 0)
            t_sum += math.floor((o - e) * (o - e) / e * 1_000_000 + 0.5)
    want_chi2 = math.floor(t_sum / 100.0 + 0.5) / 10000.0

    orig = cat.load_table
    cat.load_table = lambda s, dd, tt: df
    try:
        r = cat.QUERIES["ev_chi2_independence"](spark, "unused").collect()[0]
    finally:
        cat.load_table = orig
    assert r["chi2"] == want_chi2
    assert r["dof"] == (len(rows) - 1) * (len(colz) - 1)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    events=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=4),      # user
            st.integers(min_value=0, max_value=200),    # minute
            st.sampled_from(["a", "b", "c"]),           # type
        ),
        min_size=1,
        max_size=40,
    )
)
def test_copurchase_matches_python_model(spark, events):
    """ev_session_copurchase == a pure-Python basket fold: sessions by
    30-min gap per user, distinct items per session, pair counts and
    the three exactly-quantized ratios."""
    from datetime import datetime, timedelta

    import etl__project_spark.plans.catalog as cat

    base = datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [
            (i, base + timedelta(minutes=m), u, ty, 0.0, "{}")
            for i, (u, m, ty) in enumerate(events)
        ],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    # model: sessions per user
    by_user: dict[int, list[tuple[int, str]]] = {}
    for u, m, ty in events:
        by_user.setdefault(u, []).append((m, ty))
    baskets = []
    for u, evs in by_user.items():
        evs.sort()
        cur = {evs[0][1]}
        prev = evs[0][0]
        for m, ty in evs[1:]:
            if (m - prev) * 60 > 1800:
                baskets.append(cur)
                cur = set()
            cur.add(ty)
            prev = m
        baskets.append(cur)
    n_sessions = len(baskets)
    singles: dict[str, int] = {}
    pairs: dict[tuple[str, str], int] = {}
    for b in baskets:
        for t in b:
            singles[t] = singles.get(t, 0) + 1
        bs = sorted(b)
        for i in range(len(bs)):
            for j in range(i + 1, len(bs)):
                pairs[(bs[i], bs[j])] = pairs.get((bs[i], bs[j]), 0) + 1

    orig = cat.load_table
    cat.load_table = lambda s, d, t: df
    try:
        got = {
            (r["type_a"], r["type_b"]): r
            for r in cat.QUERIES["ev_session_copurchase"](spark, "unused").collect()
        }
    finally:
        cat.load_table = orig
    assert set(got) == set(pairs)
    for (a, b), n_ab in pairs.items():
        r = got[(a, b)]
        assert r["n_ab"] == n_ab
        assert r["support"] == round(n_ab / n_sessions, 4)
        assert r["confidence_a_b"] == round(n_ab / singles[a], 4)
        assert r["lift"] == round(n_ab * n_sessions / (singles[a] * singles[b]), 4)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    events=st.lists(
        st.integers(min_value=1, max_value=8),  # user_id
        min_size=2,
        max_size=60,
    )
)
def test_gini_matches_python_rank_model(spark, events):
    """ev_gini_concentration's tie-block histogram decomposition == the
    textbook global-rank formula computed directly in Python, for
    random per-user count multisets (heavy ties, singletons, whales)."""
    import math

    import etl__project_spark.plans.catalog as cat

    df = spark.createDataFrame(
        [
            (i, "2024-01-01 09:00:00", u, "view", 0.0, "{}")
            for i, u in enumerate(events)
        ],
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))

    counts = sorted(
        sum(1 for e in events if e == u) for u in set(events)
    )
    n = len(counts)
    t = sum(counts)
    s1 = sum((i + 1) * x for i, x in enumerate(counts))
    want = math.floor((2 * s1 - (n + 1) * t) / (n * t) * 10000 + 0.5) / 10000.0

    orig = cat.load_table
    cat.load_table = lambda s, d, tbl: df
    try:
        row = cat.QUERIES["ev_gini_concentration"](spark, "unused").collect()[0]
    finally:
        cat.load_table = orig
    assert row["n_users"] == n and row["total_events"] == t
    assert row["gini"] == want


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    xs=st.lists(st.integers(min_value=1, max_value=10**6), min_size=2, max_size=45)
)
def test_ewma_flags_match_python_recursion(spark, xs):
    """operators/series.py:ewma_flags (30 exact power-of-two lag weights)
    == a pure-Python fold over the same observed-day series, including
    warm-up truncation and the quantized ±50% flag."""
    import math
    from datetime import date, timedelta

    from etl__project_spark.operators.series import ewma_flags

    days = [date(2024, 1, 1) + timedelta(days=i) for i in range(len(xs))]
    daily = spark.createDataFrame(
        list(zip(days, xs)), "day date, x long"
    )
    got = {
        str(r["day"]): (r["x"], r["ewma"], r["dev_ratio"], r["flag"])
        for r in ewma_flags(daily).collect()
    }

    want = {}
    for t in range(1, len(xs)):
        num = den = 0
        for k in range(1, 31):
            if t - k >= 0:
                num += xs[t - k] * 2 ** (30 - k)
                den += 2 ** (30 - k)
        ewma = math.floor(num / den * 10000 + 0.5) / 10000.0
        devq = math.floor((xs[t] * den - num) / num * 10000 + 0.5)
        want[str(days[t])] = (xs[t], ewma, devq / 10000.0, abs(devq) > 5000)
    assert got == want


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    docs=st.lists(
        st.lists(st.sampled_from(["aa", "bb"]), min_size=1, max_size=14),
        min_size=1,
        max_size=6,
    )
)
def test_dup_span_merge_matches_python_model(spark, docs):
    """doc_dup_span_merge == a brute-force Python model: 8-gram corpus
    frequencies, per-doc duplicated [i, i+7] spans, overlapping-or-
    adjacent interval merge — over tiny-vocab corpora where within-doc
    AND cross-doc repeats are both common."""
    import math
    from collections import Counter

    import etl__project_spark.plans.catalog as cat

    df = spark.createDataFrame(
        [(i, " ".join(words), "en", "src", 0) for i, words in enumerate(docs)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )

    grams: list[tuple[int, int, str]] = []
    for d, words in enumerate(docs):
        for i in range(len(words) - 7):
            grams.append((d, i + 1, " ".join(words[i : i + 8])))
    freq = Counter(g for _, _, g in grams)
    want = {}
    for d, words in enumerate(docs):
        spans = sorted(
            (s, s + 7) for dd, s, g in grams if dd == d and freq[g] > 1
        )
        if not spans:
            continue
        merged = [list(spans[0])]
        for s, e in spans[1:]:
            if s <= merged[-1][1] + 1:
                merged[-1][1] = max(merged[-1][1], e)
            else:
                merged.append([s, e])
        dup_tokens = sum(e - s + 1 for s, e in merged)
        n_tokens = len(words)
        want[d] = (
            len(merged),
            dup_tokens,
            n_tokens,
            math.floor(dup_tokens / n_tokens * 10000 + 0.5) / 10000.0,
        )

    orig = cat.load_table
    cat.load_table = lambda s, dd, tbl: df
    try:
        got = {
            r["doc_id"]: (
                r["n_dup_spans"],
                r["n_dup_tokens"],
                r["n_tokens"],
                r["dup_frac"],
            )
            for r in cat.QUERIES["doc_dup_span_merge"](spark, "unused").collect()
        }
    finally:
        cat.load_table = orig
    assert got == want


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    clicks=st.lists(
        st.integers(min_value=0, max_value=30), min_size=1, max_size=40
    ),
    purchases=st.lists(
        st.integers(min_value=0, max_value=30), min_size=1, max_size=40
    ),
)
def test_ks_test_matches_python_model(spark, clicks, purchases):
    """ev_ks_test's banded two-level prefix-sum D == the direct Python
    two-sample KS statistic on the same integer-valued samples
    (shared values, ties across samples, disjoint supports)."""
    import math

    import etl__project_spark.plans.catalog as cat

    rows = [
        (i, "2024-01-01 09:00:00", 1, "click", float(v), "{}")
        for i, v in enumerate(clicks)
    ] + [
        (10_000 + i, "2024-01-01 09:00:00", 1, "purchase", float(v), "{}")
        for i, v in enumerate(purchases)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))

    t1, t2 = len(clicks), len(purchases)
    d_num = 0
    c1 = c2 = 0
    for v in sorted(set(clicks) | set(purchases)):
        c1 += sum(1 for x in clicks if x == v)
        c2 += sum(1 for x in purchases if x == v)
        d_num = max(d_num, abs(c1 * t2 - c2 * t1))
    ks_scaled = math.floor(d_num / (t1 * t2) * 10000 + 0.5)
    crit_scaled = math.floor(
        1.3581 * math.sqrt((t1 + t2) / (t1 * t2)) * 10000 + 0.5
    )

    orig = cat.load_table
    cat.load_table = lambda s, d, tbl: df
    try:
        row = cat.QUERIES["ev_ks_test"](spark, "unused").collect()[0]
    finally:
        cat.load_table = orig
    assert (row["n_click"], row["n_purchase"]) == (t1, t2)
    assert row["ks_d"] == ks_scaled / 10000.0
    assert row["crit_05"] == crit_scaled / 10000.0
    assert row["reject_05"] == (ks_scaled > crit_scaled)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    samples=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=20),   # user_id -> hash arm
            st.integers(min_value=0, max_value=12),   # value (int grid: ties)
        ),
        min_size=4,
        max_size=60,
    ),
)
def test_mann_whitney_matches_python_rank_model(spark, samples):
    """ev_mann_whitney's banded doubled-rank-sum == a direct Python
    average-rank model (explicit sort, fractional average ranks, tie
    correction) on the same samples, with the arm assignment
    reproduced through the same md5 bucketing."""
    import hashlib
    import math

    from hypothesis import assume

    import etl__project_spark.plans.catalog as cat

    def arm_of(uid: int) -> int:
        return int(hashlib.md5(f"{uid}mw".encode()).hexdigest()[:15], 16) % 2

    arm0 = sorted(v for u, v in samples if arm_of(u) == 0)
    arm1 = sorted(v for u, v in samples if arm_of(u) == 1)
    assume(arm0 and arm1)
    pooled = sorted(arm0 + arm1)
    n1t, n2t = len(arm0), len(arm1)
    nn = n1t + n2t
    # fractional average ranks (1-based), per pooled value
    avgrank = {}
    i = 0
    while i < len(pooled):
        j = i
        while j < len(pooled) and pooled[j] == pooled[i]:
            j += 1
        avgrank[pooled[i]] = (i + 1 + j) / 2.0
        i = j
    r1 = sum(avgrank[v] for v in arm0)
    u0 = r1 - n1t * (n1t + 1) / 2.0
    ties = sum(
        (c := pooled.count(v)) ** 3 - c for v in sorted(set(pooled))
    )
    var_x4 = n1t * n2t / 3.0 * (
        (nn + 1) - ties / (nn * (nn - 1))
    )
    assume(var_x4 > 0)
    z_scaled = math.floor(
        2 * (u0 - n1t * n2t / 2.0) / math.sqrt(var_x4) * 10000 + 0.5
    )

    rows = [
        (i, "2024-01-01 09:00:00", u, "purchase", float(v), "{}")
        for i, (u, v) in enumerate(samples)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    orig = cat.load_table
    cat.load_table = lambda s, d, tbl: df
    try:
        row = cat.QUERIES["ev_mann_whitney"](spark, "unused").collect()[0]
    finally:
        cat.load_table = orig
    assert (row["n_0"], row["n_1"]) == (n1t, n2t)
    assert row["u_0"] == u0
    assert row["z_score"] == z_scaled / 10000.0
    assert row["reject_05"] == (abs(z_scaled) > 19600)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    users=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=27),  # first active day
            st.one_of(
                st.none(),  # never converts (low-value purchases only)
                st.integers(min_value=0, max_value=27),  # days to convert
            ),
        ),
        min_size=1,
        max_size=25,
    ),
)
def test_survival_km_matches_python_product_limit(spark, users):
    """ev_survival_km == a direct Python product-limit fold: per-day
    conversion/censor counts, risk sets by reverse accumulation,
    survival as the running product over micro-quantized log factors
    (exactly the query's quantization, so S matches to the emitted
    4 dp). Non-converting users carry a LOW-value purchase so the
    big-ticket threshold is exercised, and are censored at the global
    max event date."""
    import math

    import etl__project_spark.plans.catalog as cat

    spans = [
        (a, None if p is None else min(a + p, 29)) for a, p in users
    ]
    dmax = max(
        max(a, 29 if p is None else p) for a, p in spans
    )  # censored users emit a low-value purchase on day 29
    lifetimes = [
        (p - a, 1) if p is not None else (dmax - a, 0) for a, p in spans
    ]
    days = {}
    for t, evt in lifetimes:
        d, c = days.get(t, (0, 0))
        days[t] = (d + evt, c + (1 - evt))
    at_risk = len(lifetimes)
    want = []
    cq = zp = 0
    for t in sorted(days):
        d, c = days[t]
        r = at_risk
        at_risk -= d + c
        if d == 0:
            continue
        if d >= r:
            zp += 1
        else:
            cq += math.floor(math.log((r - d) / r) * 1000000 + 0.5)
        surv = 0.0 if zp > 0 else math.floor(
            math.exp(cq / 1000000.0) * 10000 + 0.5
        ) / 10000.0
        want.append((t, r, d, c, surv))

    rows = []
    eid = 0
    for u, (a, p) in enumerate(spans):
        rows.append(
            (eid, f"2024-01-{a + 1:02d} 12:00:00", u, "click", 1.0, "{}")
        )
        eid += 1
        if p is not None:
            rows.append(
                (eid, f"2024-01-{p + 1:02d} 12:00:00", u, "purchase", 250.0, "{}")
            )
        else:
            rows.append(
                (eid, "2024-01-30 12:00:00", u, "purchase", 50.0, "{}")
            )
        eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    orig = cat.load_table
    cat.load_table = lambda s, d, tbl: df
    try:
        got = [
            (
                r["t_day"],
                r["n_risk"],
                r["n_events"],
                r["n_censored"],
                r["survival"],
            )
            for r in cat.QUERIES["ev_survival_km"](spark, "unused")
            .orderBy("t_day")
            .collect()
        ]
    finally:
        cat.load_table = orig
    assert got == want


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    points=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=15),  # price grid (ties)
            st.integers(min_value=1, max_value=15),  # size grid (ties)
        ),
        min_size=1,
        max_size=40,
    ),
)
def test_part_skyline_matches_python_dominance_scan(spark, points):
    """tpch_part_skyline's banded prefix-max decomposition == the direct
    quadratic dominance scan (min price / max size, strict-dominance
    semantics: equal-on-both-dims ties all survive)."""
    import etl__project_spark.plans.catalog as cat

    want = {
        (k, float(pr), sz)
        for k, (pr, sz) in enumerate(points)
        if not any(
            qp <= pr and qs >= sz and (qp < pr or qs > sz)
            for qp, qs in points
        )
    }

    rows = [
        (k, f"part{k}", "b", "t", sz, float(pr))
        for k, (pr, sz) in enumerate(points)
    ]
    df = spark.createDataFrame(
        rows,
        "p_partkey long, p_name string, p_brand string, p_type string,"
        " p_size int, p_retailprice double",
    )
    orig = cat.load_table
    cat.load_table = lambda s, d, tbl: df
    try:
        got = {
            (r["p_partkey"], r["p_retailprice"], r["p_size"])
            for r in cat.QUERIES["tpch_part_skyline"](spark, "unused").collect()
        }
    finally:
        cat.load_table = orig
    assert got == want


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    samples=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=40),   # user_id -> hash block
            st.integers(min_value=0, max_value=5000),  # value in cents
        ),
        min_size=2,
        max_size=60,
    ),
)
def test_jackknife_ci_matches_python_model(spark, samples):
    """ev_jackknife_ci == a direct Python grouped-jackknife fold (md5
    block assignment, exact micro-unit block sums, quantized
    leave-one-out means, (G-1)/G variance), to the emitted 4 dp."""
    import hashlib
    import math

    from hypothesis import assume

    import etl__project_spark.plans.catalog as cat

    def block_of(uid: int) -> int:
        return int(hashlib.md5(f"{uid}jk".encode()).hexdigest()[:15], 16) % 32

    blocks = {}
    for u, cents in samples:
        g = block_of(u)
        s, n = blocks.get(g, (0, 0))
        blocks[g] = (s + cents * 100, n + 1)  # micro-units
    # every leave-one-out denominator must be nonzero
    s_tot = sum(s for s, _ in blocks.values())
    n_tot = sum(n for _, n in blocks.values())
    nb = len(blocks)
    assume(nb >= 2)
    assume(all(n_tot - n > 0 for _, n in blocks.values()))
    qls = [
        math.floor((s_tot - s) / (n_tot - n) * 100 + 0.5)
        for s, n in blocks.values()
    ]
    sq, sqq = sum(qls), sum(q * q for q in qls)
    se_ql = math.sqrt((nb - 1) / nb * (sqq - sq * sq / nb))
    theta_ql = s_tot / n_tot * 100.0

    def q4(x):
        return math.floor(x / 1000000.0 * 10000 + 0.5) / 10000.0

    want = (
        n_tot,
        nb,
        math.floor(s_tot / n_tot / 10000.0 * 10000 + 0.5) / 10000.0,
        q4(se_ql),
        q4(theta_ql - 1.96 * se_ql),
        q4(theta_ql + 1.96 * se_ql),
    )

    rows = [
        (i, "2024-01-01 09:00:00", u, "purchase", cents / 100.0, "{}")
        for i, (u, cents) in enumerate(samples)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    orig = cat.load_table
    cat.load_table = lambda s, d, tbl: df
    try:
        r = cat.QUERIES["ev_jackknife_ci"](spark, "unused").collect()[0]
    finally:
        cat.load_table = orig
    got = (
        r["n_purchases"],
        r["n_blocks"],
        r["mean_value"],
        r["se_value"],
        r["ci_lo"],
        r["ci_hi"],
    )
    assert got == want


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    counts=st.lists(
        st.integers(min_value=1, max_value=8),  # events per day (ties likely)
        min_size=3,
        max_size=20,
    ),
)
def test_mann_kendall_matches_python_pairwise_model(spark, counts):
    """ev_mann_kendall == the direct Python pairwise fold: S over all
    ordered day pairs, tie-corrected variance, continuity-corrected z,
    to the emitted 4 dp."""
    import math

    import etl__project_spark.plans.catalog as cat

    n = len(counts)
    s_stat = sum(
        (counts[j] > counts[i]) - (counts[j] < counts[i])
        for i in range(n)
        for j in range(i + 1, n)
    )
    tie_term = sum(
        t * (t - 1) * (2 * t + 5)
        for t in (counts.count(v) for v in set(counts))
        if t > 1
    )
    var18 = n * (n - 1) * (2 * n + 5) - tie_term
    s_cc = s_stat - 1 if s_stat > 0 else (s_stat + 1 if s_stat < 0 else 0)
    # all-tied series: variance 0, no trend decidable (query emits 0)
    z_scaled = (
        0
        if var18 == 0
        else math.floor(s_cc / math.sqrt(var18 / 18.0) * 10000 + 0.5)
    )

    rows = []
    eid = 0
    for day, k in enumerate(counts):
        for i in range(k):
            rows.append(
                (eid, f"2024-01-{day + 1:02d} 09:{i:02d}:00", 1, "click", 1.0, "{}")
            )
            eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    orig = cat.load_table
    cat.load_table = lambda s, d, tbl: df
    try:
        r = cat.QUERIES["ev_mann_kendall"](spark, "unused").collect()[0]
    finally:
        cat.load_table = orig
    assert (r["n_days"], r["s_stat"]) == (n, s_stat)
    assert r["z_score"] == z_scaled / 10000.0
    assert r["trend_05"] == (abs(z_scaled) > 19600)


# -- graph family vs pure-Python models --------------------------------------

_edge = st.tuples(st.integers(0, 7), st.integers(0, 7)).filter(
    lambda p: p[0] < p[1]
)


def _edges_df(spark, pairs):
    rows = [(f"n{a}", f"n{b}") for a, b in pairs] + [
        (f"n{b}", f"n{a}") for a, b in pairs
    ]
    return spark.createDataFrame(rows, "src string, dst string")


def _adj(pairs):
    adj: dict = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    return adj


def model_core_numbers(pairs):
    """Exact k-core by min-degree peeling (Batagelj-Zaversnik order)."""
    adj = _adj(pairs)
    deg = {v: len(ns) for v, ns in adj.items()}
    remaining = set(adj)
    core, cur = {}, 0
    while remaining:
        v = min(remaining, key=lambda x: (deg[x], x))
        cur = max(cur, deg[v])
        core[v] = cur
        remaining.remove(v)
        for u in adj[v]:
            if u in remaining:
                deg[u] -= 1
    return core


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.sets(_edge, min_size=1, max_size=14))
def test_kcore_hindex_converges_to_peeling(spark, pairs):
    """With enough rounds the h-index iteration must converge to the
    EXACT core numbers (Lu et al. 2016 convergence theorem), computed
    independently by min-degree peeling; and every estimate is bounded
    by the node's degree."""
    from etl__project_spark.datapipe.graph import kcore_hindex

    got = {
        r["word"]: (r["coreness_est"], r["degree"])
        for r in kcore_hindex(_edges_df(spark, pairs), n_iter=16).collect()
    }
    want = model_core_numbers(pairs)
    assert {w: c for w, (c, _) in got.items()} == {
        f"n{v}": c for v, c in want.items()
    }
    assert all(c <= d for c, d in got.values())


def model_triangles(pairs):
    adj = _adj(pairs)
    nodes = sorted(adj)
    tri = 0
    for i, a in enumerate(nodes):
        for b in (n for n in nodes[i + 1:] if n in adj[a]):
            tri += sum(1 for c in nodes if c > b and c in adj[a] and c in adj[b])
    wedges = sum(d * (d - 1) // 2 for d in (len(ns) for ns in adj.values()))
    return tri, wedges


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.sets(_edge, min_size=1, max_size=14))
def test_triangle_stats_matches_brute_force(spark, pairs):
    """Degree-ordered orientation must count exactly the brute-force
    triangle total (each once), and wedges must equal sum d(d-1)/2."""
    from etl__project_spark.datapipe.graph import triangle_stats

    [row] = triangle_stats(_edges_df(spark, pairs)).collect()
    tri, wedges = model_triangles(pairs)
    assert row["n_triangles"] == tri
    assert row["n_wedges"] == wedges


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.sets(_edge, min_size=1, max_size=14))
def test_textrank_mass_bounds(spark, pairs):
    """Floor-quantized PageRank only LOSES mass: every node keeps at
    least the restart base (150000) and the total never exceeds the
    initial mass (V * 1e6) — the invariant that makes the micro-unit
    iteration safe from overflow at any vocabulary size."""
    from etl__project_spark.datapipe.graph import textrank

    rows = textrank(_edges_df(spark, pairs), n_iter=5).collect()
    n = len(rows)
    total = sum(r["rank_micro"] for r in rows)
    assert all(r["rank_micro"] >= 150000 for r in rows)
    assert 150000 * n <= total <= 1000000 * n


# -- round-8 signed sketches vs pure-Python models ---------------------------

_churn_ops = st.lists(
    st.tuples(
        st.sampled_from(["I", "D", "U"]),
        st.sampled_from(["a", "b", "c"]),          # group
        st.integers(min_value=0, max_value=3999),  # value in cents/25
    ),
    min_size=1,
    max_size=25,
)


def _apply_churn(ops):
    """Pure-Python model: multiset per group under I/D/U churn; returns
    (initial_rows, delta_rows, post) with values in exact cents."""
    import random

    rng = random.Random(97)
    state: dict[str, list[int]] = {}
    initial, deltas = [], []
    for verb, g, q in ops:
        cents = q * 25  # exact quarter values, no float rounding noise
        vals = state.setdefault(g, [])
        if verb == "I":
            vals.append(cents)
            deltas.append((g, cents, 1))
        elif verb == "D" and vals:
            old = vals.pop(rng.randrange(len(vals)))
            deltas.append((g, old, -1))
        elif verb == "U" and vals:
            old = vals.pop(rng.randrange(len(vals)))
            vals.append(cents)
            deltas.append((g, old, -1))
            deltas.append((g, cents, 1))
    # seed every group with a couple of base rows so deletes can land
    return initial, deltas, state


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(_churn_ops)
def test_hist_quantiles_match_python_model(spark, ops):
    """Retractable histogram + quantile read vs a pure-Python model of
    the same bucket/rank arithmetic, under arbitrary I/D/U churn."""
    from etl__project_spark.operators import (
        hist_quantiles,
        merge_hist_signed,
        partial_hist_signed,
    )

    base_rows = [(g, v * 25) for g in ("a", "b") for v in (4, 80, 200, 350)]
    _, deltas, state = _apply_churn(ops)
    for g, cents in base_rows:
        state.setdefault(g, []).append(cents)
    df0 = spark.createDataFrame(
        [(g, c / 100.0) for g, c in base_rows], "k string, value double"
    )
    hist = partial_hist_signed(df0.withColumn("sign", F.lit(1)), ["k"])
    if deltas:
        ddf = spark.createDataFrame(
            [(g, c / 100.0, s) for g, c, s in deltas],
            "k string, value double, sign long",
        )
        hist = merge_hist_signed(hist, partial_hist_signed(ddf, ["k"]), ["k"])
    got = {
        r["k"]: (r["n_events"], r["p50_lo"], r["p90_lo"])
        for r in hist_quantiles(hist, ["k"]).collect()
    }
    want = {}
    for g, vals in state.items():
        if not vals:
            continue
        n = len(vals)
        buckets = sorted(c // 1000 for c in vals)

        def q_lo(num, den):
            rank = (num * n + den - 1) // den
            return buckets[rank - 1] * 10.0

        want[g] = (n, q_lo(1, 2), q_lo(9, 10))
    assert got == want


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(_churn_ops)
def test_cms_never_underestimates_under_churn(spark, ops):
    """Turnstile CMS invariant: after ANY churn leaving all net counts
    non-negative, every live key's estimate >= its exact count."""
    from etl__project_spark.datapipe.sketches import (
        cms_cells_signed,
        cms_estimate_keys,
        cms_merge_signed,
    )

    _, deltas, state = _apply_churn(ops)
    base = [(g, 100) for g in state for _ in range(2)]
    for g, c in base:
        state[g].append(c)
    keys_of = lambda rows: [(f"{g}:{c}",) for g, c, *_ in rows]  # noqa: E731
    cells = cms_cells_signed(
        spark.createDataFrame(keys_of(base), "k string").withColumn(
            "sign", F.lit(1)
        ),
        "k",
        width=16,  # tiny grid => collisions guaranteed; the bound must hold anyway
    )
    if deltas:
        cells = cms_merge_signed(
            cells,
            cms_cells_signed(
                spark.createDataFrame(
                    [(f"{g}:{c}", s) for g, c, s in deltas], "k string, sign long"
                ),
                "k",
                width=16,
            ),
        )
    exact: dict[str, int] = {}
    for g, c in base:
        exact[f"{g}:{c}"] = exact.get(f"{g}:{c}", 0) + 1
    for g, c, s in deltas:
        exact[f"{g}:{c}"] = exact.get(f"{g}:{c}", 0) + s
    live = {k: n for k, n in exact.items() if n > 0}
    est = {
        r["k"]: r["est_count"]
        for r in cms_estimate_keys(
            spark.createDataFrame([(k,) for k in live], "k string"),
            cells,
            "k",
            width=16,
        ).collect()
    }
    assert all(est[k] >= n for k, n in live.items())


def test_maintained_column_stats_match_recompute_under_random_churn(spark):
    """Property: maintain_column_stats_cdc equals column_stats of the
    replayed post state under randomized CDC scripts (seeded) — inserts,
    value updates, NULL-ing updates, and deletes in arbitrary per-batch
    mixes, including deletes of extremum rows and last-occurrence
    values."""
    import random

    from pyspark.sql import functions as F

    from etl__project_spark.operators.quality import (
        column_stats,
        maintain_column_stats_cdc,
    )

    rng = random.Random(20260816)
    cols = [("q", "double"), ("f", "string")]
    sign = lambda s: F.lit(s).cast("long").alias("sign")  # noqa: E731

    for trial in range(3):
        state = {
            i: (float(rng.randrange(1, 8)), rng.choice(["a", "b", "c"]))
            for i in range(12)
        }
        initial = spark.createDataFrame(
            [(q, f) for q, f in state.values()], "q double, f string"
        )
        deltas = []
        next_id = 12
        for _ in range(3):
            rows = []
            for _ in range(rng.randrange(2, 6)):
                op = rng.choice(["I", "U", "UN", "D"])
                if op == "I" or not state:
                    q, f = float(rng.randrange(1, 8)), rng.choice(["a", "b", "c"])
                    state[next_id] = (q, f)
                    rows.append((q, f, 1))
                    next_id += 1
                else:
                    key = rng.choice(list(state))
                    old_q, old_f = state[key]
                    rows.append((old_q, old_f, -1))
                    if op == "D":
                        del state[key]
                    else:
                        new = (
                            (float(rng.randrange(1, 8)), old_f)
                            if op == "U"
                            else (old_q, None)
                        )
                        state[key] = new
                        rows.append((new[0], new[1], 1))
            deltas.append(
                spark.createDataFrame(rows, "q double, f string, sign long")
            )
        got = maintain_column_stats_cdc(initial, deltas, "t", cols)
        post = spark.createDataFrame(
            [(q, f) for q, f in state.values()] or [(None, None)],
            "q double, f string",
        )
        if not state:
            post = post.filter(F.lit(False))
        want = column_stats(post, "t", ["q", "f"])
        assert sorted(map(tuple, got.collect())) == sorted(
            map(tuple, want.collect())
        ), f"trial {trial} diverged"


@settings(max_examples=30, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 255), st.integers(0, 255), st.integers(0, 255)
        ),
        min_size=1,
        max_size=40,
    ),
    n_dims=st.integers(2, 3),
    bits=st.sampled_from([4, 8]),
)
def test_zorder_interleave_agrees_across_three_engines(spark, rows, n_dims, bits):
    """zorder_key_n (Spark shift/mask exprs), zorder_key_n_sql (DuckDB
    div/mod twin), and a direct Python bit-interleave must agree
    bit-for-bit on random inputs — the property the layout's oracle
    parity and physical file assignment both rest on."""
    import duckdb

    from etl__project_spark.operators.layout import (
        _interleave_positions,
        zorder_key_n,
        zorder_key_n_sql,
    )

    cols = ["a", "b", "c"][:n_dims]
    vals = [r[:n_dims] for r in rows]
    mask = (1 << bits) - 1
    want = [
        sum(
            (((r[j] & mask) >> i) & 1) << out
            for j, i, out in _interleave_positions(n_dims, bits)
        )
        for r in vals
    ]

    df = spark.createDataFrame(vals, ", ".join(f"{c} long" for c in cols))
    got_spark = [
        r["z"]
        for r in df.select(
            zorder_key_n([F.col(c).bitwiseAND(F.lit(mask)) for c in cols], bits).alias("z")
        ).collect()
    ]
    assert sorted(got_spark) == sorted(want)

    con = duckdb.connect()
    expr = zorder_key_n_sql([f"({c} % {mask + 1})" for c in cols], bits)
    rows_sql = ", ".join(f"({', '.join(map(str, r))})" for r in vals)
    got_duck = [
        r[0]
        for r in con.execute(
            f"SELECT {expr} FROM (VALUES {rows_sql}) AS t({', '.join(cols)})"
        ).fetchall()
    ]
    assert sorted(got_duck) == sorted(want)
