"""Lake maintenance — small-file compaction.

Incremental ingestion appends a few files per run; after thousands of
runs a partition holds thousands of tiny parquet files and every scan
pays open/footer costs per file (the classic small-file problem — the
reference has no answer to it; its chunked writes make it WORSE, one file
per 400k-row chunk per run).

``compact`` rewrites a lake directory with a bounded number of files per
partition (1 by default at fixture scale; size-targeted at cluster scale)
via a staging-dir swap, preserving the Hive partition layout.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def _fs(spark: SparkSession, path: str):
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    return jvm, p.getFileSystem(conf), p


def count_data_files(spark: SparkSession, path: str) -> int:
    jvm, fs, p = _fs(spark, path)
    if not fs.exists(p):
        return 0
    n = 0
    it = fs.listFiles(p, True)
    while it.hasNext():
        f = it.next().getPath().getName()
        if not f.startswith("_") and not f.startswith("."):
            n += 1
    return n


def compact(
    spark: SparkSession,
    path: str,
    partition_col: str | None = None,
    files_per_partition: int = 1,
) -> int:
    """Rewrite the lake dir with ``files_per_partition`` files per Hive
    partition (or total, when unpartitioned). Returns the row count.

    At cluster scale pick ``files_per_partition`` so files land at
    ~128-512 MB; on Delta this is OPTIMIZE/auto-compaction.
    """
    from .merge import _publish_swap, _recover_swap

    # a compaction that crashed mid-swap left the lake in the .__old__
    # backup — restore it before reading (else the read fails outright)
    _recover_swap(spark, path)
    df = spark.read.parquet(path)
    n_before = df.count()

    if partition_col is not None:
        from pyspark.sql import functions as F

        # hash-partition on (partition value, salt): every Hive value's rows
        # land in ≤ files_per_partition tasks, and each task writes one file
        # per value it holds — bounded files per directory, parallel write
        salt = F.pmod(F.xxhash64(*df.columns), F.lit(files_per_partition))
        out = df.repartition(F.col(partition_col), salt)
        writer = (
            out.write.mode("overwrite")
            .option("compression", "snappy")
            .partitionBy(partition_col)
        )
    else:
        writer = (
            df.coalesce(files_per_partition)
            .write.mode("overwrite")
            .option("compression", "snappy")
        )

    staging = path.rstrip("/") + ".__compact__"
    writer.parquet(staging)
    assert spark.read.parquet(staging).count() == n_before

    _publish_swap(spark, staging, path)
    return n_before
