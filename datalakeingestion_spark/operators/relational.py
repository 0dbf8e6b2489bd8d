"""Relational operator vocabulary (SURVEY.md §2), Spark-first.

Each helper is a thin, idiomatic wrapper over DataFrame ops — declarative so
Catalyst keeps pushdown/pruning/codegen. Scale notes are given per operator:
these run unchanged on a 1000-executor cluster because they only express
logical plans (window over partitioned keys, hash aggregations with map-side
partials, broadcastable build sides).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def latest_rows(
    df: DataFrame,
    keys: Sequence[str],
    order_col: str | Column,
    tie_breaks: Sequence[str] = (),
) -> DataFrame:
    """Latest row per key — the reference's "latest data zone" view.

    Reference: start_ingestion.py:361-374 emits
    ``row_number() OVER (PARTITION BY pk ORDER BY delta DESC) ... row_num=1``
    as Athena SQL (which reportedly times out on big tables, README.md:34-35).
    In Spark this is one shuffle on ``keys`` + a per-partition sort; no
    size limit, no quarterly splitting. ``tie_breaks`` makes the winner
    deterministic when ``order_col`` ties (needed for oracle comparison and
    for reproducible dedup in production).
    """
    order_exprs = [F.desc(order_col)] + [F.desc(c) for c in tie_breaks]
    w = Window.partitionBy(*keys).orderBy(*order_exprs)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def scd2_history(
    df: DataFrame,
    keys: Sequence[str],
    version_col: str,
    tie_breaks: Sequence[str] = (),
) -> DataFrame:
    """Type-2 slowly-changing-dimension history from an append-only change
    log — the HISTORICAL sibling of ``latest_rows`` (the reference only
    materializes the latest-row view, start_ingestion.py:361-374; SCD2 is
    what a warehouse user builds next from the same log).

    Each key's rows, ordered by (``version_col``, ``tie_breaks``), become
    validity intervals: valid_from = the row's version value, valid_to =
    the NEXT row's (half-open, NULL while current), is_current on the
    last row. One shuffle on ``keys`` + a per-partition sort — the same
    cost as the latest view, so it scales identically (no self-join, no
    global window).
    """
    order_exprs = [F.asc(version_col)] + [F.asc(c) for c in tie_breaks]
    w = Window.partitionBy(*keys).orderBy(*order_exprs)
    valid_to = F.lead(version_col).over(w)
    return (
        df.withColumn("valid_from", F.col(version_col))
        .withColumn("valid_to", valid_to)
        .withColumn("is_current", valid_to.isNull())
    )


def topk_per_group(
    df: DataFrame,
    keys: Sequence[str],
    order_exprs: Sequence[Column],
    k: int,
    rank_col: str = "rn",
) -> DataFrame:
    """Top-k rows per group (generalization of `latest_rows`).

    One shuffle on ``keys``; AQE handles skewed groups. Pass fully
    deterministic ``order_exprs`` (include a tie-break column).
    """
    w = Window.partitionBy(*keys).orderBy(*order_exprs)
    return df.withColumn(rank_col, F.row_number().over(w)).filter(
        F.col(rank_col) <= k
    )


def coalesce_range_filter(
    df: DataFrame,
    cols: Sequence[str | Column],
    lo: Column,
    hi: Column,
) -> DataFrame:
    """Range filter on ``coalesce(*cols)`` with an index-friendly pre-filter.

    Reference: extractors/ingest_mysql_data.py:256-262 rewrites
    ``coalesce(a,b) BETWEEN x AND y`` into ``(a BETWEEN … OR b BETWEEN …)``
    so MySQL can use per-column indexes, then relies on the coalesce
    semantics implicitly. Here we apply BOTH: the OR-disjunction (a simple
    comparison per column → pushable into a parquet/JDBC scan by Catalyst,
    unlike a coalesce() expression) and the exact coalesce predicate on top,
    restoring exactness. At scale the OR prefilter is what reaches
    ``PushedFilters``; the exact filter is a cheap codegen'd residual.
    """
    cols = [F.col(c) if isinstance(c, str) else c for c in cols]
    prefilter = None
    for c in cols:
        clause = c.between(lo, hi)
        prefilter = clause if prefilter is None else (prefilter | clause)
    exact = F.coalesce(*cols).between(lo, hi)
    return df.filter(prefilter).filter(exact)


def count_reconciliation(
    source: DataFrame,
    target: DataFrame,
    keys: Sequence[str],
) -> DataFrame:
    """Source-vs-lake row-count validation, generalized to per-key groups.

    Reference: validators/base_validator.py:32-55 compares one global COUNT
    from MySQL against one from Athena. The Spark version reconciles per
    key with a full-outer join so missing keys on either side surface as
    0-counts with ``count_match = false``. Both sides aggregate before the
    join (partial aggregation map-side), so the join inputs are small.
    """
    keys = list(keys)
    s = source.groupBy(*keys).agg(F.count(F.lit(1)).alias("source_count"))
    t = target.groupBy(*keys).agg(F.count(F.lit(1)).alias("target_count"))
    joined = s.join(t, keys, "full_outer")
    return joined.select(
        *keys,
        F.coalesce(F.col("source_count"), F.lit(0)).alias("source_count"),
        F.coalesce(F.col("target_count"), F.lit(0)).alias("target_count"),
        (
            F.coalesce(F.col("source_count"), F.lit(0))
            == F.coalesce(F.col("target_count"), F.lit(0))
        ).alias("count_match"),
    )
