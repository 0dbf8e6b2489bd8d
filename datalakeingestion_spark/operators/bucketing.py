"""Bucketed (co-located) tables — shuffle-free fact joins.

At 100 TB the dominant cost of ``orders ⋈ lineitem`` is shuffling both
fact tables on the join key for every query. Writing them ONCE as
bucketed tables (`bucketBy(n, key)` + `sortBy`) makes every subsequent
equi-join and aggregation on that key shuffle-free: Spark reads matching
buckets pairwise and merges locally. tests/test_bucketing.py asserts the
joined plan contains no Exchange.

Bucket-count guidance: pick so each bucket is 100-500 MB at target scale
(e.g. 100 TB lineitem / 256 MB ≈ 400k buckets is too many files — use
buckets × date partitions instead: partitionBy(month) + bucketBy(1024)).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    n_buckets: int = 8,
    sort_cols: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed+sorted managed table (session warehouse).

    ``mode="append"`` with the SAME bucket spec adds new files per
    bucket and keeps the table's bucketing metadata valid — the
    per-batch maintenance path for persisted indexes (each bucket just
    accumulates files; joins still skip the shuffle)."""
    writer = (
        df.write.mode(mode)
        .bucketBy(n_buckets, bucket_col)
        .sortBy(*(sort_cols or [bucket_col]))
        .option("compression", "snappy")
    )
    writer.saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key — no Exchange."""
    return spark.table(left_table).join(spark.table(right_table), on)
