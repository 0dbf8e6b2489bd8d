"""MERGE-style upsert for parquet lakes (SCD1 / latest-wins).

The reference handles updates by appending duplicate versions and
deduplicating at READ time with the latest-row view (T6,
start_ingestion.py:361-374); SURVEY.md flags ``MERGE INTO`` as the
improved path. Without Delta in this environment, the same semantic is an
atomic-ish rewrite:

    merged = updates ∪ (target ⟕anti updates on pk)   # latest wins
    write to staging dir → swap directories

On Delta/Iceberg this function becomes a genuine ``MERGE INTO`` with
file-level pruning; the anti-join+union form here is the dependency-free
fallback, and is itself the standard strategy for partition-level
rewrites (only partitions containing updated keys need rewriting when a
partition spec is provided).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config.partition_spec import PartitionSpec


def merge_upsert(
    spark: SparkSession,
    target_path: str,
    updates: DataFrame,
    primary_key: list[str],
    partition_spec: PartitionSpec | None = None,
) -> int:
    """Upsert ``updates`` into the parquet lake at ``target_path`` by
    primary key (updates win). Returns the merged row count.

    First call on an empty target is equivalent to a plain write.
    """
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    path = jvm.org.apache.hadoop.fs.Path(target_path)
    fs = path.getFileSystem(conf)

    if partition_spec is not None:
        updates = partition_spec.derive(updates)

    if fs.exists(path):
        target = spark.read.parquet(target_path)
        keep = target.join(updates, primary_key, "left_anti")
        merged = keep.unionByName(updates)
    else:
        merged = updates

    staging = target_path.rstrip("/") + ".__staging__"
    writer = merged.write.mode("overwrite").option("compression", "snappy")
    if partition_spec is not None:
        writer = writer.partitionBy(partition_spec.partition_column_name)
    writer.parquet(staging)
    n = spark.read.parquet(staging).count()

    # swap: best-effort atomicity on a single filesystem (rename is atomic
    # on HDFS/local; on S3 use Delta instead — see module docstring)
    backup = jvm.org.apache.hadoop.fs.Path(target_path.rstrip("/") + ".__old__")
    if fs.exists(backup):
        fs.delete(backup, True)
    if fs.exists(path):
        fs.rename(path, backup)
    fs.rename(jvm.org.apache.hadoop.fs.Path(staging), path)
    if fs.exists(backup):
        fs.delete(backup, True)
    return n
