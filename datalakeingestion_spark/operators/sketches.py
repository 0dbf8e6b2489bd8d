"""Deterministic frequency / distinct-count sketching — KMV and Count-Min.

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

from collections.abc import Sequence

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
        # NULL values are excluded (a NULL hash would sort nulls-FIRST in
        # Spark but nulls-LAST in most SQL engines, silently skewing the
        # k-th hash); distinct-count semantics ignore NULL anyway.
        df.select(c.cast("string").alias("__v"))
        .where(F.col("__v").isNotNull())
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


def kmv_distinct_by_group(
    df: DataFrame, group_cols: Sequence[str], col: str | Column, k: int = 256
) -> DataFrame:
    """Grouped KMV: (group_cols…, est_distinct) — approximate distinct
    count PER GROUP from each group's k smallest hashes.

    NULL values are ignored; a group whose values are ALL NULL is absent
    from the output (SQL's grouped COUNT(DISTINCT) would emit a 0 row —
    left-join the group universe if that shape is needed).

    Scale shape: one shuffle on (group, value) for the distinct, then a
    per-group bottom-k via window rank — Spark's WindowGroupLimit pushes
    the rank-≤-k filter into the sort, so each partition keeps only k rows
    per group before any data concentrates (the same mechanism that makes
    w2-style per-key top-k scale). State per group is O(k) regardless of
    group cardinality — the grouped twin of approx_count_distinct, but
    deterministic and oracle-checkable thanks to the portable hash.
    """
    from pyspark.sql import Window

    group_cols = list(group_cols)
    c = F.col(col) if isinstance(col, str) else col
    hashes = (
        # NULL values excluded — see kmv_distinct_estimate.
        df.select(*group_cols, c.cast("string").alias("__v"))
        .where(F.col("__v").isNotNull())
        .distinct()
        .select(*group_cols, portable_hash60(F.col("__v")).alias("h"))
    )
    w = Window.partitionBy(*group_cols).orderBy("h")
    kept = hashes.withColumn("__rn", F.row_number().over(w)).filter(
        F.col("__rn") <= k
    )
    agg = kept.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_kept"), F.max("h").alias("kth_hash")
    )
    return agg.select(
        *group_cols,
        F.when(F.col("n_kept") < k, F.col("n_kept").cast("long"))
        .otherwise(
            F.round((k - 1) / (F.col("kth_hash") / F.lit(HASH_SPACE))).cast("long")
        )
        .alias("est_distinct"),
    )


# ---------------------------------------------------------------------------
# Count-Min sketch — point frequency estimation
# ---------------------------------------------------------------------------


def _cms_bucket(value: Column, d: int, width: int, portable: bool = True) -> Column:
    """Row ``d``'s bucket for ``value``: salted hash mod width.

    ``portable=True`` uses the md5-prefix family — bit-identical to the
    SQL twin ``('0x'||substr(md5(d||':'||x),1,15))::BIGINT % width`` so
    the sketch is oracle-checkable. ``portable=False`` is the production
    fast path: xxhash64 (one JVM intrinsic vs an md5 digest + hex parse,
    ~4× cheaper per cell) at the cost of cross-engine reproducibility —
    same CMS guarantees, different cell layout."""
    if portable:
        return portable_hash60(F.concat(F.lit(f"{d}:"), value)) % width
    return F.pmod(F.xxhash64(F.lit(d), value), F.lit(width))


def cms_sketch(
    df: DataFrame,
    col: str | Column,
    depth: int = 3,
    width: int = 1024,
    portable: bool = True,
) -> DataFrame:
    """Count-Min sketch of a column: DataFrame (d, bucket, cnt).

    One map-side pass: each value emits ``depth`` (row, bucket) cells via
    an inline array (plain expressions, no UDF), then a single partial-
    aggregated groupBy over at most depth×width cells — the shuffle is
    O(partitions × depth × width) regardless of input size, which is the
    whole point at 100 TB: a per-term exact count would shuffle the full
    term universe; the sketch's state is a fixed-size grid.

    Estimates overcount (never undercount) with error ≤ 2N/width at
    probability 1 - (1/2)^depth. Sketches over disjoint inputs merge by
    cell-wise addition (groupBy (d, bucket) + sum), so partial sketches
    from independent ingest batches compose.
    """
    c = (F.col(col) if isinstance(col, str) else col).cast("string")
    # NULLs would land in a NULL cell no probe can reach — drop them so
    # the sketch holds exactly the countable stream.
    df = df.where(c.isNotNull())
    cells = df.select(
        F.inline(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        _cms_bucket(c, d, width, portable).alias("bucket"),
                    )
                    for d in range(depth)
                ]
            )
        )
    )
    return cells.groupBy("d", "bucket").agg(F.count(F.lit(1)).alias("cnt"))


def countsketch_sketch(
    df: DataFrame, col: str | Column, depth: int = 5, width: int = 1024
) -> DataFrame:
    """Count-Sketch (AMS): like CMS but each occurrence adds a ±1 SIGN, and
    the estimate is the MEDIAN over rows of sign·cell — unbiased, so the
    systematic collision overcount that dominates CMS on low-skew streams
    cancels in expectation. Same fixed depth×width grid shuffle, same
    additive merge; ``depth`` should be odd so the median is an element.

    Cells: (d, bucket, cnt) where cnt sums the signs. Hash family: the
    bucket reuses ``_cms_bucket``'s salted md5; the sign is bit 0 of a
    differently-salted hash — both bit-identical to the SQL twins, so
    even this approximate estimator is oracle-checkable.
    """
    c = (F.col(col) if isinstance(col, str) else col).cast("string")
    df = df.where(c.isNotNull())
    cells = df.select(
        F.inline(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        _cms_bucket(c, d, width).alias("bucket"),
                        _cs_sign(c, d).alias("sign"),
                    )
                    for d in range(depth)
                ]
            )
        )
    )
    return cells.groupBy("d", "bucket").agg(F.sum("sign").alias("cnt"))


def _cs_sign(value: Column, d: int) -> Column:
    """±1 from bit 0 of a sign-salted portable hash (SQL twin:
    ``CASE WHEN h % 2 = 0 THEN 1 ELSE -1 END``)."""
    h = portable_hash60(F.concat(F.lit(f"s{d}:"), value))
    return F.when(h % 2 == 0, F.lit(1)).otherwise(F.lit(-1))


def countsketch_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    col: str,
    depth: int = 5,
    width: int = 1024,
) -> DataFrame:
    """(term, est_count) with est = median over rows of sign(term)·cell.

    The median of an odd number of integers is an element, so the result
    is exactly reproducible cross-engine (no interpolation). NULL probes
    are dropped."""
    pb = probes.select(F.col(col).cast("string").alias("term")).where(
        F.col("term").isNotNull()
    )
    cells = pb.select(
        "term",
        F.inline(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        _cms_bucket(F.col("term"), d, width).alias("bucket"),
                        _cs_sign(F.col("term"), d).alias("sign"),
                    )
                    for d in range(depth)
                ]
            )
        ),
    )
    joined = cells.join(F.broadcast(sketch), ["d", "bucket"], "left")
    signed = joined.withColumn(
        "est", F.col("sign") * F.coalesce(F.col("cnt"), F.lit(0))
    )
    # exact element median: depth is odd → percentile at 0.5 of integers
    return signed.groupBy("term").agg(
        F.percentile("est", F.lit(0.5)).cast("long").alias("est_count")
    )


def cms_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    col: str,
    depth: int = 3,
    width: int = 1024,
    portable: bool = True,
) -> DataFrame:
    """Point-frequency estimates for ``probes[col]`` from a ``cms_sketch``
    result: (term, est_count) with est = min over rows of the cell count.

    The sketch is at most depth×width rows, so the probe⋈sketch join
    broadcasts the sketch — no shuffle of anything large. NULL probes are
    dropped (the sketch holds no NULL cell to answer them from).
    """
    pb = probes.select(F.col(col).cast("string").alias("term")).where(
        F.col("term").isNotNull()
    )
    cells = pb.select(
        "term",
        F.inline(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        _cms_bucket(F.col("term"), d, width, portable).alias(
                            "bucket"
                        ),
                    )
                    for d in range(depth)
                ]
            )
        ),
    )
    joined = cells.join(F.broadcast(sketch), ["d", "bucket"], "left")
    return joined.groupBy("term").agg(
        F.min(F.coalesce(F.col("cnt"), F.lit(0))).cast("long").alias("est_count")
    )


def kmv_set_relation(
    df: DataFrame,
    value: str | Column,
    in_a: Column,
    in_b: Column,
    k: int = 128,
) -> DataFrame:
    """Theta-sketch-style set algebra from ONE pass: estimated distinct
    cardinality of A ∪ B and A ∩ B, where membership is given by the
    boolean columns ``in_a`` / ``in_b`` evaluated per row.

    Mechanism: collapse rows to distinct values carrying OR-ed membership
    flags, hash with the portable 60-bit hash, keep the k smallest
    hashes of the union.  θ = k-th hash; est_union = (k-1)/(θ/2^60);
    est_intersection = (both-members among the k) · (k-1)/k / (θ/2^60)
    — the standard theta intersection over the union sample.  Under k
    union values the sketch is the whole set and both estimates are
    exact.

    Deterministic: the hash family is portable and the top-k is a pure
    function of the value SET, so even the *estimates* have an exact SQL
    oracle (the property rand()/HLL sketches can't offer).  Exact twins
    ship beside the estimates for error audit.

    Scale shape: one (value)-keyed shuffle for the flag-OR distinct,
    then a global top-k (per-partition partial top-k + tiny merge).
    """
    v = F.col(value) if isinstance(value, str) else value
    flagged = (
        df.select(
            v.cast("string").alias("__v"),
            in_a.cast("boolean").alias("__a"),
            in_b.cast("boolean").alias("__b"),
        )
        .where(F.col("__v").isNotNull() & (F.col("__a") | F.col("__b")))
        .groupBy("__v")
        .agg(F.max("__a").alias("a"), F.max("__b").alias("b"))
        .select(
            portable_hash60(F.col("__v")).alias("h"), "a", "b"
        )
        .persist()
    )
    kth = flagged.orderBy("h").limit(k)
    agg = kth.agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.max("h").alias("kth_hash"),
        F.sum((F.col("a") & F.col("b")).cast("long")).alias("c_both"),
    )
    exact = flagged.agg(
        F.count(F.lit(1)).alias("exact_union"),
        F.sum((F.col("a") & F.col("b")).cast("long")).alias(
            "exact_intersection"
        ),
    )
    theta = F.col("kth_hash") / F.lit(HASH_SPACE)
    return agg.crossJoin(exact).select(
        F.lit(k).alias("k"),
        F.when(F.col("n_kept") < k, F.col("n_kept").cast("long"))
        .otherwise(F.round((k - 1) / theta).cast("long"))
        .alias("est_union"),
        F.when(F.col("n_kept") < k, F.col("c_both"))
        .otherwise(
            F.round(F.col("c_both") * (k - 1) / k / theta).cast("long")
        )
        .alias("est_intersection"),
        F.col("exact_union").cast("long").alias("exact_union"),
        F.col("exact_intersection").cast("long").alias("exact_intersection"),
    )


def bottomk_rows(
    df: DataFrame,
    key_cols: list[str],
    hash_col: Column,
    value_col: Column,
    k: int,
) -> DataFrame:
    """Per-key bottom-k rows by a deterministic hash — the mergeable
    uniform row sample behind the quantile sketches (see
    streaming/drift.py::reference_sample for the single-group form and
    the merge law). Returns one row per key with ``sample`` =
    array<struct<h,v>> of the k smallest (hash, value) pairs, sorted.

    Scale shape: TWO-LEVEL aggregation, never a per-key window (a
    window ``PARTITION BY key`` puts one whole key — data-sized when
    keys are few — into a single task). Level 1 reduces each (key,
    input-partition) cell to its local bottom-k (collect_list bounded
    by the partition's rows); level 2 merges ≤ #partitions × k structs
    per key. Both levels are ordinary shuffles on the key.
    """
    from pyspark.sql import functions as F

    lvl1 = (
        df.select(
            *key_cols,
            F.spark_partition_id().alias("_pid"),
            F.struct(hash_col.alias("h"), value_col.alias("v")).alias("_s"),
        )
        .groupBy(*key_cols, "_pid")
        .agg(
            F.slice(
                F.array_sort(F.collect_list("_s")), 1, int(k)
            ).alias("_part")
        )
    )
    return (
        lvl1.groupBy(*key_cols)
        .agg(
            F.slice(
                F.array_sort(F.flatten(F.collect_list("_part"))), 1, int(k)
            ).alias("sample")
        )
    )
