"""Fact build — J2: multi-way broadcast star join (SURVEY.md §2.5).

Reference: staging LEFT JOIN 4 dims on natural keys, project the 4
surrogate keys, append to fact (lambda_function_redishift.py:152-162;
Snowflake twin populate_dimension_fact_tables.sql:85-91).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


BROADCAST_ROW_LIMIT = 10_000_000
SALT_BUCKETS = 8


def build_fact(
    staging: DataFrame,
    dims: dict[str, tuple[DataFrame, str, str]],
    fact_id_col: str | None = None,
    join_stats: dict[str, int] | None = None,
    broadcast_row_limit: int = BROADCAST_ROW_LIMIT,
    salt_buckets: int = SALT_BUCKETS,
) -> DataFrame:
    """Left-join ``staging`` against each dimension and project surrogate keys.

    ``dims`` maps output skey column → (dim_df, staging_natural_key_col,
    dim_natural_key_col). Dimensions in this workload are tiny (platform=4,
    sites ~dozens) so by default every lookup side is broadcast — the fact
    table never shuffles, which is the only plan that survives 100 TB of
    fact rows. NULL natural keys (e.g. site for platform-headed titles)
    left-join to NULL skeys, matching warehouse LEFT JOIN semantics.

    ``join_stats`` is the OPTIONAL maintained-statistics hook (VERDICT r8
    #8): {skey_col: estimated rows} — row-count or join-size upper bounds
    kept current by the turnstile CMS machinery (``datapipe/sketches.py:
    cms_join_size_bound``, the ``ev_join_size_cdc`` statistic; see
    ``plans/star_load.py:join_stats_from_cms``). A dim whose estimate
    exceeds ``broadcast_row_limit`` is NOT broadcast — the hardcoded
    broadcast of a dimension that quietly grew past executor memory is
    the classic 100 TB load-time OOM. Such a dim joins via a SALTED
    shuffle instead: the fact side gets a uniform salt in
    [0, salt_buckets), the dim side explodes to one replica per salt,
    and the join keys on (natural key, salt) — so even a single hot
    natural key spreads over ``salt_buckets`` reducers instead of one
    straggler. Any salt per fact row is semantically correct (every
    replica carries the same payload), so the salt needs no determinism
    across retries.
    """
    out = staging
    skeys = []
    stats = join_stats or {}
    for skey_col, (dim_df, st_key, dim_key) in dims.items():
        lookup = dim_df.select(
            F.col(dim_key).alias(f"__nk_{skey_col}"), F.col(skey_col)
        )
        est = stats.get(skey_col)
        if est is not None and est > broadcast_row_limit:
            salted = lookup.withColumn(
                "__salt",
                F.explode(F.array(*[F.lit(s) for s in range(salt_buckets)])),
            )
            out = (
                out.withColumn(
                    "__fsalt",
                    F.floor(F.rand(seed=13) * salt_buckets).cast("int"),
                )
                .join(
                    salted,
                    (out[st_key] == salted[f"__nk_{skey_col}"])
                    & (F.col("__fsalt") == salted["__salt"]),
                    "left",
                )
                .drop(f"__nk_{skey_col}", "__salt", "__fsalt")
            )
        else:
            out = out.join(
                F.broadcast(lookup),
                out[st_key] == lookup[f"__nk_{skey_col}"],
                "left",
            ).drop(f"__nk_{skey_col}")
        skeys.append(skey_col)
    return out.select(*skeys)


UNKNOWN_MEMBER = -1


def build_fact_unknown_member(
    staging: DataFrame,
    dims: dict[str, tuple[DataFrame, str, str]],
    keep_cols: list[str] | None = None,
    unknown: int = UNKNOWN_MEMBER,
) -> DataFrame:
    """Late-arriving-dimension fact build: like :func:`build_fact`, but a
    row whose natural key is PRESENT yet misses the dim lookup gets the
    UNKNOWN member surrogate (``unknown``, conventionally -1) instead of
    NULL — so the fact loads on schedule even when a dim feed lags, and
    the miss is distinguishable from a genuinely-NULL natural key (which
    still yields a NULL skey, warehouse LEFT JOIN semantics).

    ``keep_cols`` carries the named staging columns (the natural keys)
    into the output alongside the skeys — the repair pass
    (:func:`repair_unknown_facts`) needs them to re-resolve once the dim
    catches up; production stores them in the fact or a quarantine
    side-table keyed by fact row.

    Plan shape is unchanged from build_fact: every lookup is a broadcast
    left join, the fact never shuffles.
    """
    out = staging
    skeys = []
    for skey_col, (dim_df, st_key, dim_key) in dims.items():
        lookup = dim_df.select(
            F.col(dim_key).alias(f"__nk_{skey_col}"), F.col(skey_col)
        )
        out = (
            out.join(
                F.broadcast(lookup),
                out[st_key] == lookup[f"__nk_{skey_col}"],
                "left",
            )
            .withColumn(
                skey_col,
                F.when(
                    F.col(st_key).isNotNull() & F.col(skey_col).isNull(),
                    F.lit(unknown).cast("long"),
                ).otherwise(F.col(skey_col).cast("long")),
            )
            .drop(f"__nk_{skey_col}")
        )
        skeys.append(skey_col)
    return out.select(*skeys, *(keep_cols or []))


def repair_unknown_facts(
    fact: DataFrame,
    dim: DataFrame,
    st_key: str,
    dim_key: str,
    skey_col: str,
    unknown: int = UNKNOWN_MEMBER,
) -> DataFrame:
    """Re-resolve unknown-member fact rows after the late dim arrived:
    rows with ``skey_col == unknown`` re-probe the (now complete) dim by
    natural key; everything else passes through untouched. Still a miss
    → stays unknown (the dim is STILL late for that key).

    At 100 TB the unknown rows are a thin slice (filter pushdown on the
    skey column prunes them from parquet row groups), and the re-probe
    is the same broadcast join as the original build — repair cost is
    O(late rows), never a fact rewrite.
    """
    hits = fact.filter(F.col(skey_col) == unknown)
    # NULL skeys (NULL natural key, not a late dim) pass through rest —
    # a bare != would evaluate NULL and drop them
    rest = fact.filter(
        F.col(skey_col).isNull() | (F.col(skey_col) != unknown)
    )
    lookup = dim.select(
        F.col(dim_key).alias(f"__nk_{skey_col}"),
        F.col(skey_col).alias(f"__new_{skey_col}"),
    )
    repaired = (
        hits.join(
            F.broadcast(lookup),
            hits[st_key] == lookup[f"__nk_{skey_col}"],
            "left",
        )
        .withColumn(
            skey_col,
            F.coalesce(F.col(f"__new_{skey_col}"), F.col(skey_col)).cast("long"),
        )
        .drop(f"__nk_{skey_col}", f"__new_{skey_col}")
    )
    return rest.unionByName(repaired)
