"""Fact build — J2: multi-way broadcast star join (SURVEY.md §2.5).

Reference: staging LEFT JOIN 4 dims on natural keys, project the 4
surrogate keys, append to fact (lambda_function_redishift.py:152-162;
Snowflake twin populate_dimension_fact_tables.sql:85-91).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def build_fact(
    staging: DataFrame,
    dims: dict[str, tuple[DataFrame, str, str]],
    fact_id_col: str | None = None,
) -> DataFrame:
    """Left-join ``staging`` against each dimension and project surrogate keys.

    ``dims`` maps output skey column → (dim_df, staging_natural_key_col,
    dim_natural_key_col). Dimensions in this workload are tiny (platform=4,
    sites ~dozens) so every lookup side is broadcast — the fact table never
    shuffles, which is the only plan that survives 100 TB of fact rows.
    NULL natural keys (e.g. site for platform-headed titles) left-join to
    NULL skeys, matching warehouse LEFT JOIN semantics.
    """
    out = staging
    skeys = []
    for skey_col, (dim_df, st_key, dim_key) in dims.items():
        lookup = dim_df.select(
            F.col(dim_key).alias(f"__nk_{skey_col}"), F.col(skey_col)
        )
        out = out.join(
            F.broadcast(lookup), out[st_key] == lookup[f"__nk_{skey_col}"], "left"
        ).drop(f"__nk_{skey_col}")
        skeys.append(skey_col)
    return out.select(*skeys)
