"""Additional sources/sinks beyond CSV+parquet: JSON, ORC, JDBC, and
bucketed tables; Delta/Iceberg gated behind import-tries (their jars are
not in this environment).

Bucketing is the co-located-join scale tool: two tables bucketed on the
same key by the same bucket count join WITHOUT a shuffle
(``tests/test_connectors.py`` asserts the Exchange-free plan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


class ConnectorUnavailable(RuntimeError):
    """Raised when an optional table-format/connector jar is absent."""


def read_json(
    spark: SparkSession, path: str, schema: T.StructType | None = None
) -> DataFrame:
    """JSON-lines scan; pass an explicit schema in production (inference
    is a full extra pass over the data)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).orc(path)


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    num_partitions: int = 8,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    **options: str,
) -> DataFrame:
    """JDBC scan. Always provide partition_column+bounds for real tables —
    without them the whole table streams through ONE connection."""
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("numPartitions", str(num_partitions))
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
        )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], mode: str = "overwrite"
) -> None:
    """Hive-style partitioned parquet — the layout that makes partition
    pruning (WHERE on partition_cols never touches other directories)
    work at 100 TB."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def read_parquet_evolved(
    spark: SparkSession, path: str, schema: T.StructType | None = None
) -> DataFrame:
    """Read a parquet table whose files were written under EVOLVING
    schemas (columns added over time — the normal life of a 100 TB
    table).

    With ``schema``: the declared schema wins — files missing a column
    yield nulls for it, no footer scan. Without: ``mergeSchema`` unions
    the schemas from every file's footer (a metadata pass across files —
    costly on huge tables, so prefer the explicit schema in production;
    real table formats track this in their own metadata instead).
    """
    if schema is not None:
        return spark.read.schema(schema).parquet(path)
    return spark.read.option("mergeSchema", True).parquet(path)


def write_clustered(
    df: DataFrame,
    path: str,
    range_col: str,
    sort_cols: list[str] | None = None,
    num_files: int = 8,
    mode: str = "overwrite",
) -> None:
    """Range-clustered layout: ``repartitionByRange`` on ``range_col``
    then sort within each file — every output file covers a narrow,
    pairwise-disjoint slice of the column's range, so its parquet
    row-group min/max statistics become tight and a range predicate
    skips whole files at scan time (data skipping on top of — and
    orthogonal to — Hive partition pruning, and the single-column case
    of what Z-ordering does for several columns).

    Use for the columns queries actually range-filter on (timestamps,
    ids). At 100 TB this is the difference between a scan touching a
    few files and touching all of them; the write costs one range
    shuffle (sampling-based, skew-tolerant) plus per-partition sorts.
    """
    out = df.repartitionByRange(num_files, range_col).sortWithinPartitions(
        range_col, *(sort_cols or [])
    )
    out.write.mode(mode).parquet(path)


def zorder_key(c1, c2, bits: int = 16):
    """Bit-interleaved Z-order key over two columns already scaled to
    integers in ``[0, 2^bits)``. Range-partitioning + sorting by this ONE
    key gives file-level locality on BOTH columns at once (each file
    covers ~sqrt of the per-column range), where single-column
    clustering leaves the second column unclustered — the standard
    multi-dimensional data-skipping layout (Delta OPTIMIZE ZORDER does
    the same with interleaved bits).
    """
    z = F.lit(0).cast("long")
    for i in range(bits):
        bit1 = F.floor(c1.cast("long") / (2**i)) % 2
        bit2 = F.floor(c2.cast("long") / (2**i)) % 2
        z = z + bit1 * F.lit(2 ** (2 * i + 1)) + bit2 * F.lit(2 ** (2 * i))
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    col1: str,
    col2: str,
    bits: int = 16,
    num_files: int = 16,
    mode: str = "overwrite",
) -> None:
    """Z-order-clustered parquet write on two columns: scale each column
    to ``[0, 2^bits)`` by its min/max (one tiny metadata aggregate — the
    only driver-side scalar, same as what a table format stores), derive
    the interleaved key, then range-partition + sort by it. Row-group
    stats become tight on BOTH columns, so range predicates on either
    (or both) skip most files."""
    lo1, hi1, lo2, hi2 = df.agg(
        F.min(col1), F.max(col1), F.min(col2), F.max(col2)
    ).first()
    span = 2**bits - 1

    def scaled(c, lo, hi):
        rng = (hi - lo) or 1
        return ((F.col(c) - F.lit(lo)) / F.lit(rng) * span).cast("long")

    keyed = df.withColumn(
        "__z", zorder_key(scaled(col1, lo1, hi1), scaled(col2, lo2, hi2), bits)
    )
    (
        keyed.repartitionByRange(num_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode(mode)
        .parquet(path)
    )


def write_bucketed(
    df: DataFrame, table: str, bucket_col: str, n_buckets: int, mode: str = "overwrite"
) -> None:
    """Bucketed + sorted managed table: joins/aggregations on bucket_col
    between same-bucketed tables need no shuffle."""
    (
        df.write.mode(mode)
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .format("parquet")
        .saveAsTable(table)
    )


def read_delta(spark: SparkSession, path: str) -> DataFrame:
    """Delta Lake scan — requires delta-spark jars (not in this image)."""
    try:
        import delta  # noqa: F401
    except ImportError as exc:
        raise ConnectorUnavailable(
            "delta-spark is not installed; Delta tables unavailable. "
            "The SCD1/SCD2/merge operators accept any DataFrame source, so "
            "plain-parquet warehouses (plans/star_load.py) cover the same "
            "semantics without the transactional log."
        ) from exc
    return spark.read.format("delta").load(path)


def read_iceberg(spark: SparkSession, table: str) -> DataFrame:
    """Iceberg scan — requires iceberg-spark-runtime (not in this image)."""
    if not spark.conf.get("spark.sql.catalog.iceberg", None):
        raise ConnectorUnavailable(
            "no iceberg catalog configured; Iceberg tables unavailable"
        )
    return spark.read.table(table)
