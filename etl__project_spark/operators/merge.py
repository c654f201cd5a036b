"""Merge-dedup — J3/T5: insert-if-not-matched across re-delivered batches.

Reference: ``MERGE INTO CREDIT … WHEN NOT MATCHED THEN INSERT``
(snow pipe.sql:96-109). The reference's ON clause names columns that do not
exist on the destination (SURVEY.md §2.12 bug 5); re-derived intent =
full-row dedup of the incoming batch against rows already landed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def merge_insert_new(
    dest: DataFrame, batch: DataFrame, match_cols: list[str] | None = None
) -> DataFrame:
    """Return ``dest`` plus the batch rows not already present.

    ``match_cols`` defaults to all shared columns (full-row dedup). The
    within-batch dedup + left-anti against dest is the exactly-once
    protection the Snowflake MERGE provides on pipe re-delivery.
    """
    if match_cols is None:
        match_cols = [c for c in batch.columns if c in set(dest.columns)]
    fresh = batch.select(dest.columns).dropDuplicates(match_cols).join(
        dest, match_cols, "left_anti"
    )
    return dest.unionByName(fresh)
