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
    """Drop ``table_name`` AND clear its default managed location —
    but ONLY when that location genuinely belongs to this table.

    ``DROP TABLE`` alone is not enough: if the warehouse directory
    survives a metastore loss (in-memory session catalog restarted,
    metastore rebuilt, crash between the two), the next
    ``saveAsTable`` fails with ``LOCATION_ALREADY_EXISTS`` and every
    index rebuild is bricked until someone hand-deletes the orphan.
    So after the catalog drop we also delete the default location path
    — restricted to the cases where it is safe:

    - no table registered → the directory is the orphan this exists for;
    - a MANAGED table was registered → DROP already removed its files,
      clearing any leftover at the default path is cleanup of our own
      data.

    If the registered table is EXTERNAL, its data is NOT ours to delete
    (and a directory at the default managed path would belong to
    someone else) — drop only the catalog entry and leave every file
    alone."""
    external = False
    if spark.catalog.tableExists(table_name):
        external = spark.catalog.getTable(table_name).tableType == "EXTERNAL"
    spark.sql(f"DROP TABLE IF EXISTS {table_name}")
    if external:
        return
    fs, path = _managed_fs_path(spark, table_name)
    if fs.exists(path):
        fs.delete(path, True)


def _managed_fs_path(spark: SparkSession, table_name: str):
    """(Hadoop FileSystem, Path) for the table's default managed
    location — the py4j plumbing shared by the orphan cleanup and the
    doomed-rebuild check."""
    path = spark._jvm.org.apache.hadoop.fs.Path(
        _managed_location(spark, table_name)
    )
    return path.getFileSystem(spark._jsc.hadoopConfiguration()), path


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str | Sequence[str],
    n_buckets: int = 8,
    sort_cols: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed+sorted managed table (session warehouse).

    ``bucket_col`` may be a single column or a sequence: a join avoids
    the bucketed side's shuffle only when the bucket columns cover ALL
    its equi-join keys (Spark 4 runs with
    ``spark.sql.requireAllClusterKeysForCoPartition=true``, and a
    subset-key bucketed scan is not even planned as bucketed) — so
    bucket by exactly the key set the consuming join uses.

    ``mode="append"`` with the SAME bucket spec adds new files per
    bucket and keeps the table's bucketing metadata valid — the
    per-batch maintenance path for persisted indexes (each bucket just
    accumulates files; joins still skip the shuffle).

    ``mode="overwrite"`` is rebuild, and it is STAGED: the new table is
    fully written under ``{table}__staging`` first, and only then is the
    old table dropped and the staging table renamed into place. A failed
    rebuild WRITE therefore leaves the OLD table intact (the old
    behavior — drop first, write second — left neither on a write
    failure); leftover staging junk is cleared by the next rebuild. The
    remaining exposure is a process crash inside the drop→rename window
    itself: the old table is then gone from the catalog but the new
    data sits complete under ``{table}__staging`` — recover by
    re-issuing ``ALTER TABLE {table}__staging RENAME TO {table}`` (or
    just rerunning the rebuild). The drop also clears an orphaned
    warehouse directory so a rebuild succeeds after a metastore loss,
    without touching EXTERNAL tables' data (see
    :func:`drop_table_and_location`); when the existing table is
    EXTERNAL *and* a foreign directory occupies the default managed
    location, the rebuild fails loudly BEFORE dropping anything (the
    rename into that location could not succeed and we refuse to
    delete data that is not ours)."""
    if mode == "overwrite":
        spark = df.sparkSession
        staging = f"{table_name}__staging"
        _check_rename_target_free(spark, table_name)
        drop_table_and_location(spark, staging)
        _bucketed_writer(df, "errorifexists", bucket_col, n_buckets, sort_cols
                         ).saveAsTable(staging)
        drop_table_and_location(spark, table_name)
        spark.sql(f"ALTER TABLE {staging} RENAME TO {table_name}")
        return
    _bucketed_writer(df, mode, bucket_col, n_buckets, sort_cols).saveAsTable(
        table_name
    )


def _check_rename_target_free(spark: SparkSession, table_name: str) -> None:
    """Refuse the rebuild up front when the final RENAME is doomed: the
    registered table is EXTERNAL (so dropping it clears nothing) and a
    directory already occupies the default managed location the renamed
    table must move into. Failing HERE keeps the old table registered;
    failing at the rename would have already dropped it."""
    if not spark.catalog.tableExists(table_name):
        return
    if spark.catalog.getTable(table_name).tableType != "EXTERNAL":
        return
    fs, path = _managed_fs_path(spark, table_name)
    if fs.exists(path):
        raise RuntimeError(
            f"cannot rebuild {table_name} as a managed bucketed table: it "
            f"is EXTERNAL and a foreign directory occupies the default "
            f"managed location {path} — move that directory (or drop the "
            "external table yourself) and rerun"
        )


def _bucketed_writer(df, mode, bucket_col, n_buckets, sort_cols):
    cols = [bucket_col] if isinstance(bucket_col, str) else list(bucket_col)
    return (
        df.write.mode(mode)
        .bucketBy(n_buckets, cols[0], *cols[1:])
        .sortBy(*(sort_cols or cols))
        .option("compression", "snappy")
    )


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key — no Exchange."""
    return spark.table(left_table).join(spark.table(right_table), on)
