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

from etl__project_spark.session import state_checkpoint


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


# --- incremental constraint monitoring under CDC -----------------------------
#
# The suite above re-scans its tables per run; a CONTINUOUS quality
# monitor over churning 100 TB tables cannot. Every constraint class
# reduces to signed-delta state:
#
# - row-local checks (not-null / accepted-values / range / bounds):
#   violation counts are sign-linear — one fused aggregate over the
#   BATCH, added to a running counter; the table is never re-read;
# - uniqueness: per-key multiplicities are the state; the violation
#   count (rows minus distinct keys = Σ max(mult−1, 0)) advances by the
#   TRANSITION at touched keys, max(new−1,0) − max(old−1,0);
# - referential integrity: per-key child and parent counts are the
#   state; the orphan count advances by child·[parent==0] transitions
#   at touched keys — the same null-extension transition algebra as the
#   outer-join IVM (operators/ivm.py:_ne_transition_keys), surfaced as
#   a data-quality gate.
#
# Per-batch cost: O(|Δ| + touched keys); nothing rescans history.


def _signed_count(delta: DataFrame, pred, sign_col: str = "sign"):
    """Aggregate Column: signed violation-count contribution of a delta."""
    return (
        F.sum(F.when(pred, F.col(sign_col)).otherwise(0))
        .cast("long")
    )


def _key_count_delta(
    delta: DataFrame, key: str, sign_col: str = "sign"
) -> DataFrame:
    return delta.groupBy(F.col(key).alias("__k")).agg(
        F.sum(sign_col).cast("long").alias("__d")
    )


def _transitions(
    state_counts: DataFrame, d_counts: DataFrame
) -> DataFrame:
    """(key, old, new) for every key the delta touches; ``state_counts``
    is (key __k, count __c) and is probed only at the delta's keys."""
    old = state_counts.join(d_counts.select("__k"), "__k", "left_semi")
    return (
        d_counts.join(old, "__k", "left")
        .select(
            "__k",
            F.coalesce(F.col("__c"), F.lit(0)).alias("__old"),
            (F.coalesce(F.col("__c"), F.lit(0)) + F.col("__d")).alias("__new"),
        )
    )


def _merge_key_counts(
    state_counts: DataFrame, d_counts: DataFrame
) -> DataFrame:
    return (
        state_counts.unionByName(d_counts.withColumnRenamed("__d", "__c"))
        .groupBy("__k")
        .agg(F.sum("__c").cast("long").alias("__c"))
        .filter(F.col("__c") != 0)
    )


def maintain_dq_suite_cdc(
    initial_child: DataFrame,
    initial_parent: DataFrame,
    cdc_batches_child: list[DataFrame | None],
    cdc_batches_parent: list[DataFrame | None],
    child_checks: dict[str, object],
    parent_checks: dict[str, object],
    fk: str,
    pk: str,
    key_cols_child: list[str],
    key_cols_parent: list[str],
    child_table: str = "child",
    parent_table: str = "parent",
    unique_check: str | None = None,
    ref_check: str | None = None,
    op_col: str = "op",
    delete_op: str = "D",
    checkpoint: bool = True,
) -> DataFrame:
    """Maintain the (table, check, n_violations, passed) suite while
    both tables take CDC. ``child_checks`` / ``parent_checks`` map
    check name → row-level violation predicate (Column); pass
    ``unique_check`` to monitor ``pk`` uniqueness on the parent and
    ``ref_check`` to monitor ``fk`` → ``pk`` referential integrity.
    Equal to re-running the batch suite over the replayed post-CDC
    tables (pinned by the ``dq_suite_cdc`` oracle and a replay test)."""
    from pyspark.storagelevel import StorageLevel

    from etl__project_spark.operators.ivm import cdc_to_signed_delta, consolidate

    disk = StorageLevel.DISK_ONLY
    sign1 = F.lit(1).cast("long").alias("sign")
    state_c = initial_child.select("*", sign1)
    state_p = initial_parent.select("*", sign1)

    def _scalar_rows(delta, checks, table):
        if not checks:
            return None
        row = delta.agg(
            *[_signed_count(delta, pred).alias(name) for name, pred in checks.items()]
        )
        picks = [
            F.struct(
                F.lit(table).alias("table_name"),
                F.lit(name).alias("check_name"),
                F.coalesce(F.col(name), F.lit(0)).alias("n"),
            )
            for name in checks
        ]
        return row.select(F.explode(F.array(*picks)).alias("s")).select(
            "s.table_name", "s.check_name", "s.n"
        )

    counters = _scalar_rows(state_c, child_checks, child_table)
    p_rows = _scalar_rows(state_p, parent_checks, parent_table)
    if p_rows is not None:
        counters = p_rows if counters is None else counters.unionByName(p_rows)

    pk_counts = state_p.groupBy(F.col(pk).alias("__k")).agg(
        F.sum("sign").cast("long").alias("__c")
    )
    fk_counts = state_c.groupBy(F.col(fk).alias("__k")).agg(
        F.sum("sign").cast("long").alias("__c")
    )
    if unique_check:
        dup0 = pk_counts.agg(
            F.coalesce(
                F.sum(F.greatest(F.col("__c") - 1, F.lit(0))), F.lit(0)
            ).cast("long").alias("n")
        ).select(
            F.lit(parent_table).alias("table_name"),
            F.lit(unique_check).alias("check_name"),
            "n",
        )
        counters = counters.unionByName(dup0)
    if ref_check:
        orph0 = (
            fk_counts.join(
                pk_counts.filter(F.col("__c") > 0).select("__k"),
                "__k",
                "left_anti",
            )
            .agg(F.coalesce(F.sum("__c"), F.lit(0)).cast("long").alias("n"))
            .select(
                F.lit(child_table).alias("table_name"),
                F.lit(ref_check).alias("check_name"),
                "n",
            )
        )
        counters = counters.unionByName(orph0)
    if checkpoint:
        state_c = state_checkpoint(state_c, table_sized=True)
        state_p = state_checkpoint(state_p, table_sized=True)
        pk_counts = state_checkpoint(pk_counts, table_sized=True)
        fk_counts = state_checkpoint(fk_counts, table_sized=True)
        counters = state_checkpoint(counters, table_sized=False)

    n_batches = max(len(cdc_batches_child), len(cdc_batches_parent))
    for i in range(n_batches):
        batch_c = cdc_batches_child[i] if i < len(cdc_batches_child) else None
        batch_p = cdc_batches_parent[i] if i < len(cdc_batches_parent) else None
        delta_c = (
            cdc_to_signed_delta(
                state_c, batch_c, key_cols_child, op_col=op_col, delete_op=delete_op
            )
            if batch_c is not None
            else None
        )
        delta_p = (
            cdc_to_signed_delta(
                state_p, batch_p, key_cols_parent, op_col=op_col, delete_op=delete_op
            )
            if batch_p is not None
            else None
        )
        if checkpoint:
            delta_c = (
                state_checkpoint(delta_c, table_sized=True)
                if delta_c is not None
                else None
            )
            delta_p = (
                state_checkpoint(delta_p, table_sized=True)
                if delta_p is not None
                else None
            )

        new_rows = []
        if delta_c is not None:
            r = _scalar_rows(delta_c, child_checks, child_table)
            if r is not None:
                new_rows.append(r)
        if delta_p is not None:
            r = _scalar_rows(delta_p, parent_checks, parent_table)
            if r is not None:
                new_rows.append(r)

        d_pk = (
            _key_count_delta(delta_p, pk) if delta_p is not None else None
        )
        d_fk = (
            _key_count_delta(delta_c, fk) if delta_c is not None else None
        )
        if unique_check and d_pk is not None:
            t = _transitions(pk_counts, d_pk)
            d_dup = t.agg(
                F.coalesce(
                    F.sum(
                        F.greatest(F.col("__new") - 1, F.lit(0))
                        - F.greatest(F.col("__old") - 1, F.lit(0))
                    ),
                    F.lit(0),
                ).cast("long").alias("n")
            ).select(
                F.lit(parent_table).alias("table_name"),
                F.lit(unique_check).alias("check_name"),
                "n",
            )
            new_rows.append(d_dup)
        if ref_check and (d_pk is not None or d_fk is not None):
            # orphan transitions at every touched key (either side):
            # Δ = child_new·[par_new==0] − child_old·[par_old==0]
            empty = d_pk if d_pk is not None else d_fk
            touched = (
                (d_pk.select("__k") if d_pk is not None else empty.select("__k").limit(0))
                .unionByName(
                    d_fk.select("__k") if d_fk is not None else empty.select("__k").limit(0)
                )
                .distinct()
            )
            tp = _transitions(
                pk_counts,
                touched.join(
                    d_pk if d_pk is not None else touched.select(
                        "__k", F.lit(0).cast("long").alias("__d")
                    ).limit(0),
                    "__k",
                    "left",
                ).select("__k", F.coalesce("__d", F.lit(0)).alias("__d")),
            )
            tc = _transitions(
                fk_counts,
                touched.join(
                    d_fk if d_fk is not None else touched.select(
                        "__k", F.lit(0).cast("long").alias("__d")
                    ).limit(0),
                    "__k",
                    "left",
                ).select("__k", F.coalesce("__d", F.lit(0)).alias("__d")),
            )
            both = tp.select(
                "__k",
                F.col("__old").alias("__p_old"),
                F.col("__new").alias("__p_new"),
            ).join(
                tc.select(
                    "__k",
                    F.col("__old").alias("__c_old"),
                    F.col("__new").alias("__c_new"),
                ),
                "__k",
            )
            d_orph = both.agg(
                F.coalesce(
                    F.sum(
                        F.when(F.col("__p_new") <= 0, F.col("__c_new")).otherwise(0)
                        - F.when(F.col("__p_old") <= 0, F.col("__c_old")).otherwise(0)
                    ),
                    F.lit(0),
                ).cast("long").alias("n")
            ).select(
                F.lit(child_table).alias("table_name"),
                F.lit(ref_check).alias("check_name"),
                "n",
            )
            new_rows.append(d_orph)

        for r in new_rows:
            counters = counters.unionByName(r)
        counters = (
            counters.groupBy("table_name", "check_name")
            .agg(F.sum("n").cast("long").alias("n"))
        )
        if d_pk is not None:
            pk_counts = _merge_key_counts(pk_counts, d_pk)
        if d_fk is not None:
            fk_counts = _merge_key_counts(fk_counts, d_fk)
        if delta_c is not None:
            state_c = consolidate(state_c.unionByName(delta_c))
        if delta_p is not None:
            state_p = consolidate(state_p.unionByName(delta_p))
        if checkpoint:
            state_c = state_checkpoint(state_c, table_sized=True)
            state_p = state_checkpoint(state_p, table_sized=True)
            pk_counts = state_checkpoint(pk_counts, table_sized=True)
            fk_counts = state_checkpoint(fk_counts, table_sized=True)
            counters = state_checkpoint(counters, table_sized=False)
    return counters.select(
        "table_name",
        "check_name",
        F.col("n").alias("n_violations"),
        (F.col("n") == 0).alias("passed"),
    )


# --- ANALYZE statistics maintained under CDC ---------------------------------
#
# :func:`column_stats` recomputes the CBO's per-column food from scratch;
# at 100 TB with churning tables that rescan is exactly what a stats
# refresh cannot afford. The maintained form keeps ONE finest-grain state
# per table: live (column, value) multiplicities — the signed-algebra
# twin of ev_rollup_cdc_distinct's per-value counts, widened to every
# tracked column. Every statistic column_stats emits derives from that
# state at read time (maintain-finest / derive-at-read, the grouping-sets
# discipline): n_rows = Σn, n_nulls = n at the NULL value row, n_distinct
# = live non-null rows, min/max = typed extrema over live values — so
# deletes that remove the current extremum or the last occurrence of a
# value are handled by construction, with no base-table consultation.
# State is table-sized in the worst case (a unique key column) →
# DISK_ONLY via state_checkpoint, like every table-sized fold state.


def column_value_partial(
    df: DataFrame, cols: list[str], sign_col: str = "sign"
) -> DataFrame:
    """One signed batch's (column_name, v, n) contributions: values are
    carried as strings so every column shares one state schema (NULLs
    ride as NULL rows — they are a counted statistic, not a skip); n =
    Σ sign. One explode-shaped pass, one hash aggregate."""
    stacks = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(c).alias("column_name"),
                    F.col(c).cast("string").alias("v"),
                )
                for c in cols
            ]
        )
    )
    return (
        df.select(stacks.alias("x"), F.col(sign_col).alias("s"))
        .select("x.column_name", "x.v", "s")
        .groupBy("column_name", "v")
        .agg(F.sum("s").cast("long").alias("n"))
    )


def merge_column_values(existing: DataFrame, delta: DataFrame) -> DataFrame:
    """Merge signed column-value states; values retracted to net zero
    vanish (count is liveness)."""
    return (
        existing.unionByName(delta.select(existing.columns))
        .groupBy("column_name", "v")
        .agg(F.sum("n").cast("long").alias("n"))
        .filter(F.col("n") != 0)
    )


def column_stats_from_state(
    state: DataFrame, table_name: str, col_types: list[tuple[str, str]]
) -> DataFrame:
    """:func:`column_stats`-shaped rows READ from the maintained
    (column_name, v, n) state — same output schema, same string min/max
    casts, so one oracle pins maintained ≡ recomputed. min/max re-cast
    each column's string values back to the declared type (string
    round-trips are exact for the supported types under the pinned-UTC
    session), take typed extrema, and stringify — all columns' stats
    fused into ONE aggregate pass over the state."""
    aggs = []
    for c, t in col_types:
        is_c = F.col("column_name") == c
        aggs += [
            F.coalesce(
                F.sum(F.when(is_c, F.col("n"))), F.lit(0)
            ).cast("long").alias(f"__n_{c}"),
            F.coalesce(
                F.sum(F.when(is_c & F.col("v").isNull(), F.col("n"))), F.lit(0)
            ).cast("long").alias(f"__nulls_{c}"),
            F.count(F.when(is_c & F.col("v").isNotNull(), F.lit(1)))
            .cast("long")
            .alias(f"__ndv_{c}"),
            F.min(F.when(is_c, F.col("v").cast(t)))
            .cast("string")
            .alias(f"__min_{c}"),
            F.max(F.when(is_c, F.col("v").cast(t)))
            .cast("string")
            .alias(f"__max_{c}"),
        ]
    one = state.agg(*aggs)
    picks = [
        F.struct(
            F.lit(c).alias("column_name"),
            F.col(f"__n_{c}").alias("n_rows"),
            F.col(f"__nulls_{c}").alias("n_nulls"),
            F.col(f"__ndv_{c}").alias("n_distinct"),
            F.col(f"__min_{c}").alias("min_value"),
            F.col(f"__max_{c}").alias("max_value"),
        )
        for c, _ in col_types
    ]
    return one.select(F.explode(F.array(*picks)).alias("s")).select(
        F.lit(table_name).alias("table_name"),
        "s.column_name",
        "s.n_rows",
        "s.n_nulls",
        "s.n_distinct",
        "s.min_value",
        "s.max_value",
    )


def maintain_column_stats_cdc(
    initial: DataFrame,
    signed_deltas: list[DataFrame],
    table_name: str,
    col_types: list[tuple[str, str]],
    checkpoint: bool = True,
) -> DataFrame:
    """Fold signed table deltas into the column-value state and read the
    stats. Per batch: one explode + hash-agg over the DELTA only (the
    base is never re-scanned), one state merge. Equal to
    :func:`column_stats` of the replayed post-CDC table (oracle-pinned
    by ``tpch_stats_analyze_cdc``)."""
    cols = [c for c, _ in col_types]
    state = column_value_partial(initial.select("*", F.lit(1).alias("sign")), cols)
    if checkpoint:
        state = state_checkpoint(state, table_sized=True)
    for delta in signed_deltas:
        state = merge_column_values(state, column_value_partial(delta, cols))
        if checkpoint:
            state = state_checkpoint(state, table_sized=True)
    return column_stats_from_state(state, table_name, col_types)
