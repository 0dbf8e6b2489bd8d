"""Merkle-style table reconciliation via block checksums.

Comparing two 100 TB tables row-by-row is a full shuffle of both; the
sync primitive every replication system uses instead is BLOCK CHECKSUMS:
hash every row, assign it to one of B blocks by hash range, aggregate an
order-independent checksum per block, and compare B tiny rows.  Blocks
that match are proven identical-in-multiset (up to hash collision);
only differing blocks need row-level work — the anti-entropy pattern of
Dynamo/Cassandra repair, DistCp -diff, and Delta DEEP CLONE validation,
expressed as two aggregates and a B-row join.

Determinism: the row hash is the portable 60-bit md5 prefix over a
canonical string encoding (decimals render with fixed scale, dates as
ISO), the per-block checksum is an exact decimal SUM of hashes (order-
independent, overflow-free), so the whole comparison has an exact SQL
oracle.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import portable_hash60


def row_signature(cols: Sequence[str]) -> "F.Column":
    """Portable per-row hash over a canonical '|'-joined string encoding.
    Callers must pre-cast floats to fixed-scale decimals — raw double→
    string rendering is not engine-portable."""
    return portable_hash60(
        F.concat_ws("|", *[F.col(c).cast("string") for c in cols])
    )


def block_checksums(
    df: DataFrame, cols: Sequence[str], n_blocks: int = 64
) -> DataFrame:
    """(block_id, n_rows, checksum) — one row per hash-range block.
    checksum = Σ row_hash as decimal(38,0): exact, order-independent,
    multiset-sensitive (a duplicated row changes the sum)."""
    if n_blocks <= 0:
        raise ValueError("n_blocks must be positive")
    h = row_signature(cols)
    return (
        df.select(
            (h % n_blocks).alias("block_id"),
            h.cast("decimal(38,0)").alias("_h"),
        )
        .groupBy("block_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum("_h").cast("decimal(38,0)").alias("checksum"),
        )
    )


def checksum_diff(
    left: DataFrame,
    right: DataFrame,
    cols: Sequence[str],
    n_blocks: int = 64,
) -> DataFrame:
    """Blocks where the two tables differ: full-outer join of the two
    B-row checksum frames, keeping blocks whose (count, checksum) pair
    disagrees.  Row volume touched: 2 scans + 2·B rows — the 100 TB
    diff plan BEFORE any row-level work."""
    lc = block_checksums(left, cols, n_blocks).withColumnsRenamed(
        {"n_rows": "n_left", "checksum": "sum_left"}
    )
    rc = block_checksums(right, cols, n_blocks).withColumnsRenamed(
        {"n_rows": "n_right", "checksum": "sum_right"}
    )
    j = lc.join(rc, "block_id", "full_outer").select(
        "block_id",
        F.coalesce("n_left", F.lit(0)).alias("n_left"),
        F.coalesce("n_right", F.lit(0)).alias("n_right"),
        F.coalesce("sum_left", F.lit(0).cast("decimal(38,0)")).alias(
            "sum_left"
        ),
        F.coalesce("sum_right", F.lit(0).cast("decimal(38,0)")).alias(
            "sum_right"
        ),
    )
    return j.filter(
        (F.col("n_left") != F.col("n_right"))
        | (F.col("sum_left") != F.col("sum_right"))
    )
