"""Streaming Bloom door — dedup-at-the-door for a document stream.

Composes ``operators/bloom.py`` into the epoch-idempotent
``foreachBatch`` shape this package's streaming dedup sink already uses
(``incremental.py``): per micro-batch, probe the incoming documents
against the accumulated filter, admit only never-seen docs to the lake,
and persist the batch's own filter delta.

Crash-safety design (every write is epoch-scoped overwrite, nothing is
ever destructively rewritten):

- The lake write goes to ``{lake_dir}/epoch={id}`` with overwrite — a
  replayed epoch rewrites its own partition, never duplicating rows.
- The filter is an APPEND-ONLY ledger of per-epoch deltas at
  ``{filter_dir}/epoch={id}`` (each ≤ m/63 rows); the accumulated
  filter is the bit_or over all deltas. Bloom union is idempotent and
  commutative, so a replayed epoch's delta overwrite is a no-op and a
  crash between the lake and filter writes costs at most one epoch's
  re-probe against a filter missing that epoch's delta — which the
  epoch-scoped lake overwrite then makes harmless. No code path can
  lose previously accumulated state (the failure a read-merge-OVERWRITE
  design has when a partial write or transient read error masquerades
  as "first batch").
- Ledger growth is (m/63 rows) × epochs — KBs per batch; compact by
  replacing the deltas with their bit_or under a NEW directory when the
  epoch count grows large (same maintenance pattern as the stored LSH
  index).

Intra-batch re-deliveries are deduped BEFORE admission (keep the
min-id row per fingerprint), so "never-seen" holds within a batch too,
not just across batches.

Operational contract (shared with every epoch-keyed sink in this
package): the checkpoint, ``lake_dir`` and ``filter_dir`` are ONE unit.
Resetting the checkpoint while keeping the directories re-numbers the
epochs against existing partitions and is operator error — recover by
restarting from the SAME checkpoint (replay is then exact), or reset
all three together.

FPR consequence at the door: a false positive DROPS a genuinely new
document at the configured ``(1-e^(-kn/m))^k`` rate — size ``m`` for
the lake's lifetime n, or probe with :func:`operators.bloom.bloom_probe`
directly and route "maybe" rows to an exact check when dropping is not
acceptable.

Reference pendant: none — greenfield streaming curation operator
(SURVEY.md §2 beyond-reference set).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException

from ..operators.bloom import bloom_build, bloom_probe


def read_door_filter(
    spark: SparkSession,
    filter_dir: str,
    exclude_epoch: int | None = None,
) -> DataFrame | None:
    """The accumulated filter: bit_or over every epoch delta, or None
    when no delta has ever been written. Only the path-missing /
    no-parquet-files cases mean "first batch" — anything else re-raises
    (a transient read error must NOT masquerade as an empty filter and
    let re-deliveries through).

    ``exclude_epoch`` drops that epoch's own delta: a replayed epoch
    must make the SAME admission decision it made the first time, so it
    probes the filter as it stood before it ran — otherwise a crash
    after the delta write but before the stream commit would replay the
    epoch against its own delta, suppress everything, and overwrite the
    epoch's lake partition with nothing."""
    try:
        deltas = spark.read.parquet(filter_dir)
    except AnalysisException as e:
        msg = str(e)
        if "PATH_NOT_FOUND" in msg or "UNABLE_TO_INFER_SCHEMA" in msg:
            return None
        raise
    if exclude_epoch is not None:
        deltas = deltas.filter(F.col("epoch") != exclude_epoch)
    return (
        deltas.select("word", "bits")
        .groupBy("word")
        .agg(F.expr("bit_or(bits)").alias("bits"))
    )


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

    Admitted rows land at ``{lake_dir}/epoch={id}`` (epoch-scoped
    overwrite — idempotent under replay); the filter delta ledger at
    ``{filter_dir}/epoch={id}``. Returns the StreamingQuery.
    """

    def door_batch(batch_df: DataFrame, epoch_id: int) -> None:
        # dedup re-deliveries WITHIN the batch (deterministic keeper)
        first = Window.partitionBy(
            F.md5(F.coalesce(F.col(text_col), F.lit("")))
        ).orderBy(F.col(id_col))
        batch_df = (
            batch_df.withColumn("__rn", F.row_number().over(first))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
            .localCheckpoint()  # probe + delta-build scan it twice
        )
        existing = read_door_filter(
            spark, filter_dir, exclude_epoch=epoch_id
        )
        if existing is not None:
            flags = bloom_probe(
                batch_df, existing, m_bits, k, id_col, text_col
            )
            fresh = batch_df.join(
                flags.filter(F.col("maybe_dup")).select(id_col),
                id_col,
                "left_anti",
            )
        else:
            fresh = batch_df
        fresh.write.mode("overwrite").parquet(f"{lake_dir}/epoch={epoch_id}")
        bloom_build(batch_df, m_bits, k, text_col).write.mode(
            "overwrite"
        ).parquet(f"{filter_dir}/epoch={epoch_id}")

    return (
        stream.writeStream.foreachBatch(door_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
