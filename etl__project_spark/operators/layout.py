"""Multi-dimensional data layout: Z-order (Morton) clustering.

A table sorted on one column gives tight parquet min/max zone maps for
that column and useless ones for every other; range queries on a second
dimension then skip nothing. Writing the table ordered by the Z-VALUE of
the (quantized) dimensions bounds every file's rectangle in ALL
interleaved dimensions at once — the layout move Delta OPTIMIZE ZORDER
and Iceberg sort orders make, re-expressed here as plain integer
expressions so Spark can `repartitionByRange(zorder_key)` before a
write and an engine-independent oracle can verify the assignment
bit-for-bit.

The key is exact integer arithmetic end to end (shift/mask on the Spark
side, div/mod on the SQL side, same bits), so the oracle twin hash-match
covers the interleave itself, not a float approximation of it.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def zorder_key(a: Column, b: Column, bits: int = 8) -> Column:
    """Morton-interleave two already-quantized non-negative ints of
    ``bits`` bits each into a 2·bits-bit Z-value: a's bit i lands at
    output bit 2i+1, b's at 2i. Pure shift/mask column expression —
    whole-stage-codegen friendly, no UDF."""
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = (
            z
            + F.shiftleft(F.shiftright(a.cast("long"), i).bitwiseAND(F.lit(1)), 2 * i + 1)
            + F.shiftleft(F.shiftright(b.cast("long"), i).bitwiseAND(F.lit(1)), 2 * i)
        )
    return z


def zorder_key_sql(a: str, b: str, bits: int = 8) -> str:
    """The DuckDB/ANSI twin of :func:`zorder_key`, built from the same
    loop: div/mod in place of shift/mask, identical bit placement."""
    terms = []
    for i in range(bits):
        terms.append(f"(({a} // {1 << i}) % 2) * {1 << (2 * i + 1)}")
        terms.append(f"(({b} // {1 << i}) % 2) * {1 << (2 * i)}")
    return "(" + " + ".join(terms) + ")"
