"""Merge-dedup — J3/T5: insert-if-not-matched across re-delivered batches.

Reference: ``MERGE INTO CREDIT … WHEN NOT MATCHED THEN INSERT``
(snow pipe.sql:96-109). The reference's ON clause names columns that do not
exist on the destination (SURVEY.md §2.12 bug 5); re-derived intent =
full-row dedup of the incoming batch against rows already landed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


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


def cdc_apply(
    changes: DataFrame,
    key_cols: list[str],
    seq_cols: list[str],
    op_col: str = "op",
    delete_op: str = "D",
    drop_deletes: bool = True,
) -> DataFrame:
    """Apply a CDC change stream with latest-wins semantics, including
    deletes — the full ``MERGE INTO … WHEN MATCHED [DELETE]`` surface
    that ``merge_insert_new`` (insert-only, J3) doesn't cover.

    ``changes`` carries one row per change event; ``key_cols`` identify
    the target row, ``seq_cols`` order changes within a key (commit
    LSN / timestamp + change id), and ``op_col`` holds the operation
    code. The result is the post-image table: for each key, the payload
    of its highest-sequence change, with keys whose last change is a
    delete absent entirely.

    Distributed shape: ONE exchange keyed on ``key_cols`` feeding a
    ``row_number`` window ordered by ``seq_cols`` descending, then a
    narrow filter — no join against the change stream itself, and
    per-key state is O(1) (the rank cursor), not O(changes-per-key).
    At 100 TB of accumulated changelog the same plan applies per
    partition of the destination (changes are normally bucketed by key
    range, so the exchange is partial), and the identical window also
    runs incrementally inside ``foreachBatch``: apply latest-wins
    within the micro-batch first, then merge the survivors against the
    snapshot — associativity of "latest wins" is what makes the
    two-level plan correct.

    ``drop_deletes=False`` keeps the winning tombstone ROWS in the
    output instead of erasing their keys — the compacted-changelog form
    a persistent CDC state table needs: a tombstone must outlive its
    key so late-arriving lower-sequence updates can't resurrect it
    (Kafka compaction's tombstone-retention rule; the streaming face in
    ``streaming/pipeline.py:stream_cdc_apply`` stores this form and
    filters deletes only at read time).
    """
    w = Window.partitionBy(*key_cols).orderBy(
        *[F.col(c).desc() for c in seq_cols]
    )
    latest = (
        changes.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    if drop_deletes:
        latest = latest.filter(F.col(op_col) != delete_op)
    return latest
