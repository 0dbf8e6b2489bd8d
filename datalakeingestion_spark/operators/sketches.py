"""Distinct-count sketching — KMV (k-minimum-values).

A sketch whose estimate is a pure function of the input SET (not of
partitioning, order, or RNG state): hash every distinct value with the
portable 60-bit md5-prefix hash, keep the k smallest hashes, estimate

    D̂ = (k - 1) / (h_(k) / 2^60)

Because the hash family is deterministic and cross-engine portable, even
this *approximate* operator has an exact DuckDB oracle — the estimate
itself is reproducible bit-for-bit (unlike HLL/percentile_approx whose
merge order varies with partitioning).

Scale shape: distinct → hash → global top-k of a single long column.
Spark executes the top-k as per-partition partial top-k + a tiny final
merge (TakeOrdered), so the full hash set never concentrates anywhere.
Standard error ≈ 1/√(k-2) (~6% at k=256; raise k for tighter bounds).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import portable_hash60

HASH_SPACE = float(1 << 60)


def kmv_distinct_estimate(
    df: DataFrame, col: str | Column, k: int = 256
) -> DataFrame:
    """One-row DataFrame: (k, kth_hash, est_distinct).

    If the input has fewer than k distinct values the estimate IS the
    exact distinct count (all hashes kept).
    """
    c = F.col(col) if isinstance(col, str) else col
    hashes = (
        df.select(c.cast("string").alias("__v"))
        .distinct()
        .select(portable_hash60(F.col("__v")).alias("h"))
    )
    kth = hashes.orderBy("h").limit(k)
    agg = kth.agg(
        F.count(F.lit(1)).alias("n_kept"), F.max("h").alias("kth_hash")
    )
    return agg.select(
        F.lit(k).alias("k"),
        "kth_hash",
        F.when(
            F.col("n_kept") < k, F.col("n_kept").cast("long")
        )
        .otherwise(
            F.round((k - 1) / (F.col("kth_hash") / F.lit(HASH_SPACE))).cast("long")
        )
        .alias("est_distinct"),
    )
