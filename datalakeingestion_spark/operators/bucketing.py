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


def _managed_location(spark: SparkSession, table_name: str) -> str:
    """Default managed-table location for ``table_name`` in the current
    (or qualified) database: ``{db location}/{table lowercase}``."""
    parts = table_name.split(".")
    db = parts[-2] if len(parts) > 1 else spark.catalog.currentDatabase()
    base = spark.catalog.getDatabase(db).locationUri.rstrip("/")
    return f"{base}/{parts[-1].lower()}"


def drop_table_and_location(spark: SparkSession, table_name: str) -> None:
    """Drop ``table_name`` AND clear its default managed location.

    ``DROP TABLE`` alone is not enough: if the warehouse directory
    survives a metastore loss (in-memory session catalog restarted,
    metastore rebuilt, crash between the two), the next
    ``saveAsTable`` fails with ``LOCATION_ALREADY_EXISTS`` and every
    index rebuild is bricked until someone hand-deletes the orphan.
    So after the catalog drop (which removes a *registered* managed
    table's files) we also delete the default location path itself,
    covering the orphaned-directory case."""
    spark.sql(f"DROP TABLE IF EXISTS {table_name}")
    jvm = spark._jvm
    path = jvm.org.apache.hadoop.fs.Path(_managed_location(spark, table_name))
    fs = path.getFileSystem(spark._jsc.hadoopConfiguration())
    if fs.exists(path):
        fs.delete(path, True)


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
    accumulates files; joins still skip the shuffle).

    ``mode="overwrite"`` is rebuild: it drops the existing table and
    clears the managed location first, so a rebuild succeeds even when
    the warehouse directory is an orphan the catalog no longer knows
    about (see :func:`drop_table_and_location`)."""
    if mode == "overwrite":
        drop_table_and_location(df.sparkSession, table_name)
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
