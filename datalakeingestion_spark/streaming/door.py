"""Streaming Bloom door — dedup-at-the-door for a document stream.

Composes ``operators/bloom.py`` into the ``foreachBatch`` ingest shape
(``streaming/incremental.py``): per micro-batch, probe the incoming
documents against the persisted filter, write only never-seen docs to
the lake (plus an audit row count of suppressed re-deliveries), then OR
the batch's own filter into the persisted one.

Why this works under replay (the crash-recovery question every
foreachBatch sink must answer): Bloom union is IDEMPOTENT — merging the
same batch's filter twice leaves the bitmap unchanged, and re-probing a
replayed batch against a filter that already includes it flags every
row as seen, so the lake write of a replayed epoch is empty. The one
at-most-once caveat: if a crash lands BETWEEN the lake append and the
filter persist, the replayed epoch re-probes against the OLD filter and
re-appends — the same per-batch semantics as the parquet ingest sink
(exactly-once arrives with a transactional sink, K4/T5 notes). State is
the ~m/63-row bitmap parquet — KBs, rewritten atomically per batch via
staging + rename-free overwrite (the bitmap is tiny; a full rewrite is
cheaper than any merge protocol).

FPR consequence at the door: a false positive DROPS a genuinely new
document (at the configured ``(1-e^(-kn/m))^k`` rate) — size ``m`` for
the lake's lifetime n, or route "maybe" rows to an exact check instead
of dropping (the operator returns the flags; the policy belongs to the
caller's ``write_suppressed`` choice).

Reference pendant: none — greenfield streaming curation operator
(SURVEY.md §2 beyond-reference set).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.bloom import bloom_build, bloom_merge, bloom_probe


def _read_filter(spark: SparkSession, path: str) -> DataFrame | None:
    try:
        df = spark.read.parquet(path)
        return df if df.columns == ["word", "bits"] else None
    except Exception:
        return None  # first batch: no filter yet


def bloom_door_stream(
    spark: SparkSession,
    stream: DataFrame,
    lake_dir: str,
    filter_dir: str,
    checkpoint: str,
    m_bits: int,
    k: int,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Start an availableNow stream that admits only never-seen docs.

    ``stream`` is a streaming DataFrame of documents; admitted rows
    append to ``lake_dir`` with a ``door_epoch`` column, the filter
    bitmap persists at ``filter_dir``. Returns the StreamingQuery.
    """

    def door_batch(batch_df: DataFrame, epoch_id: int) -> None:
        batch_df = batch_df.localCheckpoint()  # probe + build scan twice
        existing = _read_filter(spark, filter_dir)
        if existing is not None:
            flags = bloom_probe(
                batch_df, existing, m_bits, k, id_col, text_col
            )
            fresh = (
                batch_df.join(
                    flags.filter(F.col("maybe_dup")).select(id_col),
                    id_col,
                    "left_anti",
                )
            )
        else:
            fresh = batch_df
        fresh.withColumn("door_epoch", F.lit(epoch_id)).write.mode(
            "append"
        ).parquet(lake_dir)
        update = bloom_build(batch_df, m_bits, k, text_col)
        merged = (
            bloom_merge(existing, update) if existing is not None else update
        )
        # the bitmap is bounded by m/63 rows — collect+rewrite keeps the
        # persist atomic-enough (single small file) and avoids reading
        # and writing the same path in one job
        rows = merged.collect()
        spark.createDataFrame(rows, merged.schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(filter_dir)

    return (
        stream.writeStream.foreachBatch(door_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
