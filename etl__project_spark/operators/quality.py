"""Data-quality constraint suite (dbt-test / Deequ-style declarative
checks), generalizing the reference's audit stage (record counts and
max-length probes, lambda_function_s3.py:105-110) into reusable
constraint primitives: not-null, uniqueness, accepted values, range
bounds, and referential integrity.

Scale design: every per-table check is an AGGREGATE EXPRESSION, and all
checks against one table fuse into a SINGLE aggregate pass — one
column-pruned scan per table regardless of how many constraints it
carries, the property that keeps a 50-check suite affordable on a
100 TB fact table. Referential integrity is the one check that cannot
fuse (it needs the parent keys); it runs as a key-only anti-join —
both sides shuffle ONLY the key column, and AQE picks broadcast when
the parent's distinct keys are small. Results come back as one tidy
(table_name, check_name, n_violations, passed) frame, ready to gate a
publish (compose with plans/star_load.check_manifest).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def violations_if(pred: Column) -> Column:
    """Aggregate violation count for a row-level predicate that flags a
    BAD row (e.g. ``F.col('x').isNull()``)."""
    return F.sum(F.when(pred, 1).otherwise(0)).cast("long")


def duplicate_violations(key: Column) -> Column:
    """Aggregate violation count for a uniqueness constraint: the number
    of surplus rows (count - distinct count) over the key."""
    return (F.count(key) - F.countDistinct(key)).cast("long")


def fused_checks(df: DataFrame, table_name: str, checks: dict[str, Column]) -> DataFrame:
    """Evaluate every check against ``df`` in ONE aggregate pass.

    ``checks`` maps check name → an aggregate Column producing that
    check's violation count (build with ``violations_if`` /
    ``duplicate_violations`` or any custom aggregate). Returns
    (table_name, check_name, n_violations, passed) with one row per
    check; the physical plan is a single two-phase hash aggregate over
    one column-pruned scan, however many checks are registered.
    """
    row = df.agg(*[expr.alias(name) for name, expr in checks.items()])
    stack_args = ", ".join(f"'{n}', {n}" for n in checks)
    return row.selectExpr(
        f"stack({len(checks)}, {stack_args}) AS (check_name, n_violations)"
    ).select(
        F.lit(table_name).alias("table_name"),
        "check_name",
        "n_violations",
        (F.col("n_violations") == 0).alias("passed"),
    )


def referential_orphans(
    child: DataFrame,
    parent: DataFrame,
    fk: str,
    pk: str,
    table_name: str,
    check_name: str,
) -> DataFrame:
    """Referential-integrity check: count child rows whose foreign key
    has no parent. Key-only anti-join — each side is pruned to its key
    column before the shuffle, so a 100 TB child shuffles just the fk."""
    orphans = child.select(F.col(fk)).join(
        parent.select(F.col(pk)).distinct(),
        child[fk] == parent[pk],
        "left_anti",
    )
    n = orphans.agg(F.count(F.lit(1)).alias("n_violations"))
    return n.select(
        F.lit(table_name).alias("table_name"),
        F.lit(check_name).alias("check_name"),
        F.col("n_violations"),
        (F.col("n_violations") == 0).alias("passed"),
    )


def column_stats(
    df: DataFrame,
    table_name: str,
    cols: list[str],
) -> DataFrame:
    """ANALYZE TABLE-style per-column statistics — the inputs a
    cost-based optimizer (and a data engineer sizing a query) actually
    uses: row count, null count, distinct count, min/max — one row per
    column, every column's stats fused into a SINGLE aggregate pass
    over one column-pruned scan (never a pass per column).

    Distinct counts here are EXACT (oracle-comparable); at 100 TB the
    drop-in is ``approx_count_distinct`` or the repo's mergeable HLL
    registers (``datapipe/sketches.py``) — same plan shape, bounded
    state, and the stats table is maintainable per partition + merge.
    min/max are emitted as strings so heterogeneous column types share
    one output schema (the same choice Spark's own DESCRIBE makes).
    """
    aggs = []
    for c in cols:
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
            .cast("long")
            .alias(f"__nulls_{c}"),
            F.countDistinct(c).alias(f"__ndv_{c}"),
            F.min(c).cast("string").alias(f"__min_{c}"),
            F.max(c).cast("string").alias(f"__max_{c}"),
        ]
    one = df.agg(F.count(F.lit(1)).alias("__n"), *aggs)
    picks = [
        F.struct(
            F.lit(c).alias("column_name"),
            F.col("__n").alias("n_rows"),
            F.col(f"__nulls_{c}").alias("n_nulls"),
            F.col(f"__ndv_{c}").alias("n_distinct"),
            F.col(f"__min_{c}").alias("min_value"),
            F.col(f"__max_{c}").alias("max_value"),
        )
        for c in cols
    ]
    return (
        one.select(F.explode(F.array(*picks)).alias("s"))
        .select(
            F.lit(table_name).alias("table_name"),
            "s.column_name",
            "s.n_rows",
            "s.n_nulls",
            "s.n_distinct",
            "s.min_value",
            "s.max_value",
        )
    )


def corr_matrix(
    df: DataFrame,
    table_name: str,
    cols: list[str],
    scale: int = 100,
) -> DataFrame:
    """Pearson correlation for every column pair, all pairs fused into
    ONE aggregate pass — the multivariate completion of
    :func:`column_stats` (per-column min/max/NDV tell the optimizer
    about single columns; pairwise correlation is what predicate
    correlation / multi-column selectivity estimation actually needs,
    and the first EDA question on an unfamiliar table).

    Cross-engine determinism (the ``emb_covariance`` discipline):
    values are quantized to ``scale`` micro-units, and all five
    sufficient statistics per pair (n, Σx, Σy, Σxy, Σx², Σy²) are
    EXACT wide-integer sums (decimal(38,0) here, HUGEINT in the DuckDB
    twin) — immune to float summation order. Only the final
    r = (nΣxy − ΣxΣy) / √(nΣx²−(Σx)²)·√(nΣy²−(Σy)²) converts the
    exact integers to double (identical IEEE rounding on both
    engines), with one half-even round to 4 dp.

    Distributed shape: one column-pruned scan, one two-phase hash
    aggregate whose exchange carries a single row of
    |cols|·(|cols|+3)/2 + 1 wide integers; the pair explode is a
    1-row driver-side-free select. O(1) state regardless of row count
    — the same plan at 100 TB.
    """
    from itertools import combinations

    m = {
        c: F.floor(F.col(c) * scale + F.lit(0.5)).cast("decimal(20,0)")
        for c in cols
    }
    aggs = [F.count(F.lit(1)).cast("decimal(38,0)").alias("__n")]
    for c in cols:
        aggs.append(F.sum(m[c]).cast("decimal(38,0)").alias(f"__s_{c}"))
        aggs.append(F.sum(m[c] * m[c]).cast("decimal(38,0)").alias(f"__ss_{c}"))
    pairs = list(combinations(cols, 2))
    for a, b in pairs:
        aggs.append(
            F.sum(m[a] * m[b]).cast("decimal(38,0)").alias(f"__sp_{a}_{b}")
        )
    one = df.agg(*aggs)

    def r_of(a: str, b: str):
        n = F.col("__n")
        num = (n * F.col(f"__sp_{a}_{b}") - F.col(f"__s_{a}") * F.col(f"__s_{b}")).cast(
            "double"
        )
        d1 = (n * F.col(f"__ss_{a}") - F.col(f"__s_{a}") * F.col(f"__s_{a}")).cast(
            "double"
        )
        d2 = (n * F.col(f"__ss_{b}") - F.col(f"__s_{b}") * F.col(f"__s_{b}")).cast(
            "double"
        )
        return F.round(num / (F.sqrt(d1) * F.sqrt(d2)), 4)

    picks = [
        F.struct(
            F.lit(a).alias("col_a"),
            F.lit(b).alias("col_b"),
            r_of(a, b).alias("corr"),
        )
        for a, b in pairs
    ]
    return one.select(F.explode(F.array(*picks)).alias("s")).select(
        F.lit(table_name).alias("table_name"), "s.col_a", "s.col_b", "s.corr"
    )


# --- privacy release gates (shared by the batch catalog and streaming) ------


def qi_band_counts(events: DataFrame) -> DataFrame:
    """Quasi-identifier × sensitive-band counts: one hash aggregate at
    (weekday, 6-hour band, event type, spend band) grain. This is the
    ONLY state both privacy gates need — counts are mergeable (sums),
    so the streaming path maintains exactly this table at ingest
    (``streaming/pipeline.py:stream_qi_counts``) and both gates serve
    from it; the batch queries ``ev_k_anonymity`` / ``ev_l_diversity``
    run the same functions over a one-shot aggregate."""
    return events.groupBy(
        F.dayofweek("ts").cast("long").alias("dow"),
        F.floor(F.hour("ts") / 6).cast("long").alias("hour_band"),
        "event_type",
        F.when(F.col("value").isNull(), F.lit(-1))
        .otherwise(F.floor(F.col("value") / 50))
        .cast("long")
        .alias("value_band"),
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))


def k_anonymity_gate(qi: DataFrame, k: int = 5) -> DataFrame:
    """Release-gate finalize over :func:`qi_band_counts` output: the
    k-anonymity readout (min group size, suppression fraction for a
    group-size >= k policy). All-BIGINT except one quantized divide."""
    below = F.sum(F.when(F.col("n") < k, F.col("n")).otherwise(0))
    return qi.agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.sum("n").cast("long").alias("n_rows"),
        F.min("n").alias("k_min"),
        below.cast("long").alias(f"rows_below_{k}"),
        (
            F.floor(
                below.cast("double") / F.sum("n").cast("double") * 10000
                + F.lit(0.5)
            )
            / 10000.0
        ).alias("suppress_frac"),
    )


def l_diversity_gate(qi: DataFrame, l_min: int = 2) -> DataFrame:
    """l-diversity finalize over :func:`qi_band_counts` output: the
    sensitive attribute is the spend band, so l per QI group is simply
    the count of band rows present at that group — no re-scan of the
    raw events, which is what makes the gate servable from the
    MAINTAINED band-count table."""
    per_qi = qi.groupBy("dow", "hour_band", "event_type").agg(
        F.count(F.lit(1)).cast("long").alias("l"),
        F.sum("n").cast("long").alias("n"),
    )
    risky = F.sum(F.when(F.col("l") < l_min, F.col("n")).otherwise(0))
    return per_qi.agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.min("l").alias("l_min"),
        F.sum(F.when(F.col("l") < l_min, 1).otherwise(0))
        .cast("long")
        .alias(f"groups_below_{l_min}"),
        risky.cast("long").alias(f"rows_below_{l_min}"),
        (
            F.floor(
                risky.cast("double") / F.sum("n").cast("double") * 10000
                + F.lit(0.5)
            )
            / 10000.0
        ).alias("risk_frac"),
    )


def t_closeness_gate(qi: DataFrame, t: float = 0.5) -> DataFrame:
    """t-closeness finalize over :func:`qi_band_counts` output — the
    third privacy gate (Li, Li & Venkatasubramanian, ICDE 2007) after
    k-anonymity and l-diversity: a group can be large AND diverse yet
    still leak if its sensitive-value DISTRIBUTION deviates from the
    global one (e.g. a QI group that is 90% top-spend-band when the
    corpus is 10%). Distance is total variation between the group's
    spend-band distribution and the global distribution, computed as
    the sum of POSITIVE deviations only — identical to TVD because
    both distributions sum to 1, and it makes bands ABSENT from a
    group contribute exactly nothing, so the gate runs entirely on
    the maintained band-count table (no re-scan, same serve path as
    the other two gates).

    Determinism: each band's positive deviation is floor-quantized to
    1e-8 units (BIGINT) before the per-group sum, so double summation
    order cannot perturb the group TVD; the readout quantizes to 4 dp.
    """
    keys = ["dow", "hour_band", "event_type"]
    band_tot = qi.groupBy("value_band").agg(F.sum("n").cast("long").alias("nb"))
    grand = qi.agg(F.sum("n").cast("long").alias("nt"))
    grp = qi.groupBy(*keys).agg(F.sum("n").cast("long").alias("n_g"))
    dev = F.greatest(
        F.col("n").cast("double") / F.col("n_g").cast("double")
        - F.col("nb").cast("double") / F.col("nt").cast("double"),
        F.lit(0.0),
    )
    per_group = (
        qi.join(F.broadcast(band_tot), "value_band")
        .join(F.broadcast(grp), keys)
        .crossJoin(F.broadcast(grand))
        .select(
            *keys,
            "n_g",
            F.floor(dev * 100000000.0 + F.lit(0.5)).cast("long").alias("dm"),
        )
        .groupBy(*keys)
        .agg(
            F.min("n_g").alias("n_g"),
            (
                F.floor(F.sum("dm").cast("double") / 10000.0 + F.lit(0.5))
                / 10000.0
            ).alias("tvd"),
        )
    )
    risky = F.sum(F.when(F.col("tvd") > t, F.col("n_g")).otherwise(0))
    return per_group.agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.max("tvd").alias("t_max"),
        F.sum(F.when(F.col("tvd") > t, 1).otherwise(0))
        .cast("long")
        .alias("groups_above_t"),
        risky.cast("long").alias("rows_above_t"),
        (
            F.floor(
                risky.cast("double") / F.sum("n_g").cast("double") * 10000
                + F.lit(0.5)
            )
            / 10000.0
        ).alias("risk_frac"),
    )


def bot_scorecard(usr: DataFrame, min_gaps: int = 19) -> DataFrame:
    """Behavioral bot scorecard finalize over per-user inter-arrival
    SUFFICIENT STATISTICS (user_id, n_gaps, span_us, d2 = sum of
    squared gaps): event rate over the active span and the coefficient
    of variation of gaps, floor-quantized to 4 dp, flag = too fast OR
    too metronomic. The stats are exact additive integers, so the
    batch screen (``ev_bot_detection``) and the streaming maintenance
    path (``stream_bot_screen`` folds per-batch partial sums plus
    boundary gaps from a last-event cursor) finalize through THIS one
    coded path and agree exactly."""
    usr = usr.filter(F.col("n_gaps") >= min_gaps)
    ng = F.col("n_gaps").cast("double")
    mean_d = F.col("span_us").cast("double") / ng
    var_d = F.greatest(
        F.col("d2").cast("double") / ng - mean_d * mean_d, F.lit(0.0)
    )
    rate = (F.col("n_gaps") + 1).cast("double") / (
        F.col("span_us").cast("double") / F.lit(60000000.0)
    )

    def q4(c):
        return F.floor(c * 10000 + F.lit(0.5)) / 10000.0

    # span_us = 0 (>= 20 events on ONE timestamp) is the most extreme
    # bot signature possible AND a divide-by-zero under ANSI: rate/cv
    # are NULL for such users and the flag is unconditionally true.
    has_span = F.col("span_us") > 0
    scored = usr.select(
        "user_id",
        (F.col("n_gaps") + 1).alias("n_events"),
        F.when(has_span, q4(rate)).alias("events_per_min"),
        F.when(has_span, q4(F.sqrt(var_d) / mean_d)).alias("iat_cv"),
        (~has_span).alias("zero_span"),
    )
    return scored.select(
        "user_id",
        "n_events",
        "events_per_min",
        "iat_cv",
        F.when(F.col("zero_span"), F.lit(True))
        .otherwise(
            (F.col("events_per_min") > 0.5) | (F.col("iat_cv") < 0.5)
        )
        .alias("bot_flag"),
    )
