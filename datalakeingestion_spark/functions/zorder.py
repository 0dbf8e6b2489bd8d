"""Z-order (Morton) clustering — multi-dimensional data layout.

Partition pruning handles ONE dimension (the partition column); queries
filtering on a second column still scan every file. Z-ordering interleaves
the bits of two key columns into one clustering value; range-partitioning
and sorting the write by that value gives every parquet file a TIGHT
min/max envelope on BOTH columns, so row-group/file skipping works for
filters on either (this is what Delta OPTIMIZE ZORDER BY does).

The z-value is a pure integer expression (codegen'd shifts/masks, exact
SQL twin for the oracle).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def z_value(a: Column | str, b: Column | str, bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of two non-negative ints:
    result bit 2i = bit i of a, bit 2i+1 = bit i of b."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    out = F.lit(0).cast("long")
    for i in range(bits):
        out = out + F.shiftleft(
            F.shiftright(ca, i).bitwiseAND(F.lit(1)), 2 * i
        ).cast("long")
        out = out + F.shiftleft(
            F.shiftright(cb, i).bitwiseAND(F.lit(1)), 2 * i + 1
        ).cast("long")
    return out


def z_value_sql(a: str, b: str, bits: int = 16) -> str:
    """DuckDB/ANSI twin of ``z_value`` (oracle use)."""
    terms = []
    for i in range(bits):
        terms.append(f"((({a} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({b} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " + ".join(terms) + ")"


def write_zordered(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    n_files: int = 8,
    bits: int = 16,
) -> None:
    """Write ``df`` clustered by z(col_a, col_b): range-partition on the
    z-value into ``n_files`` files, sorted within each — every file covers
    a compact rectangle in (col_a, col_b) space, enabling min/max skipping
    on either column."""
    out = df.withColumn("__z", z_value(col_a, col_b, bits))
    (
        out.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .option("compression", "snappy")
        .parquet(path)
    )
