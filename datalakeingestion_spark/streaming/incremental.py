"""Structured-Streaming form of the incremental pipeline.

The reference's incremental pull loop is a hand-rolled micro-batch stream:
each run consumes ``(last_success_end, now]`` guided by a CSV state store
(SURVEY.md §2.10). Structured Streaming subsumes that design: the
checkpoint IS the watermark store (exactly-once file-source offsets), and
``Trigger.AvailableNow`` gives the same "drain everything new, then stop"
batch-incremental behavior — with late-data semantics (`withWatermark`)
the reference simply cannot express (T6: rows older than the watermark are
permanently missed there).

At cluster scale the same code runs continuously (drop the trigger) over
kafka/file sources; `foreachBatch` writes through the partitioned sink so
both modes share the lake layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..config.partition_spec import PartitionSpec


def stream_ingest_available_now(
    spark: SparkSession,
    source_dir: str,
    schema: T.StructType,
    target_location: str,
    checkpoint: str,
    partition_spec: PartitionSpec | None = None,
):
    """Drain all unprocessed files from ``source_dir`` into the partitioned
    lake, then stop. Re-running picks up only new files (checkpointed
    offsets replace the reference's execution-log watermark, T1/T4/T5 —
    and the commit is exactly-once per batch).

    Returns the StreamingQuery (caller awaits termination).
    """
    stream = spark.readStream.schema(schema).parquet(source_dir)

    def write_batch(batch_df: DataFrame, epoch_id: int) -> None:
        out = batch_df
        writer_partition = None
        if partition_spec is not None:
            out = partition_spec.derive(out)
            writer_partition = partition_spec.partition_column_name
        writer = out.write.mode("append").option("compression", "snappy")
        if writer_partition:
            writer = writer.partitionBy(writer_partition)
        writer.parquet(target_location)

    return (
        stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def streaming_dedup_exact(
    events: DataFrame,
    id_cols: tuple[str, ...] = ("event_id",),
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Exactly-once-by-key stream dedup: drop re-deliveries of the same id
    arriving within the watermark horizon.

    ``dropDuplicates`` on a watermarked stream keeps per-key state only
    until the watermark passes — bounded state, unlike the reference's
    design where duplicate versions accumulate in the lake and every
    reader pays the latest-row window (T6). Batch DataFrames pass through
    a plain dropDuplicates (same semantics, no state).
    """
    if events.isStreaming:
        return events.withWatermark(ts_col, watermark).dropDuplicates(
            [*id_cols]
        )
    return events.dropDuplicates([*id_cols])


def streaming_dedup_within_watermark(
    events: DataFrame,
    id_cols: tuple[str, ...] = ("event_id",),
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Stream dedup for re-deliveries whose EVENT TIME drifts between
    attempts (``dropDuplicatesWithinWatermark``).

    ``streaming_dedup_exact`` keys its state on the exact row, so an
    at-least-once source that re-stamps the timestamp on retry (a CDC
    extractor re-reading a row after a crash, the reference's re-pull
    after rollback — T5) slips duplicates through. This variant keeps a
    key's state for the watermark DELAY after its first sighting and
    drops any same-key arrival in that horizon regardless of its event
    time — the guarantee matching "the same logical row may be emitted
    again within N minutes, with a fresher timestamp". State is GC'd per
    key after the delay, so it stays bounded. First-sighting-wins: the
    emitted row is the earliest arrival, deterministic under availableNow
    replay because micro-batch order is the file-source log order.

    Batch frames fall back to earliest-``ts_col``-wins per key (max_by on
    negated order), the closest batch semantics.
    """
    if events.isStreaming:
        return events.withWatermark(
            ts_col, watermark
        ).dropDuplicatesWithinWatermark([*id_cols])
    others = [c for c in events.columns if c not in id_cols]
    return (
        events.groupBy(*id_cols)
        .agg(
            *[
                F.min_by(c, F.struct(F.col(ts_col), *[F.col(o) for o in others]))
                .alias(c)
                for c in others
            ]
        )
        .select(*events.columns)
    )


def windowed_event_counts(
    events: DataFrame,
    ts_col: str = "ts",
    window: str = "5 minutes",
    slide: str | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Tumbling/sliding windowed counts with late-data watermark — the
    streaming aggregation surface (works on both static and streaming
    DataFrames; on a stream, rows later than ``watermark`` are dropped and
    state is garbage-collected)."""
    src = events
    if events.isStreaming:
        src = events.withWatermark(ts_col, watermark)
    win = (
        F.window(ts_col, window, slide) if slide else F.window(ts_col, window)
    )
    return src.groupBy(win.alias("w"), "event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("value").alias("sum_value"),
    ).select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        "event_type",
        "n_events",
        "sum_value",
    )


def interval_join_events_orders(
    events: DataFrame,
    orders: DataFrame,
    event_ts: str = "ts",
    order_ts: str = "o_orderdate",
    user_key: str = "user_id",
    order_key: str = "o_custkey",
    event_id: str = "event_id",
    order_id: str = "o_orderkey",
    within: str = "24 hours",
    watermark: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream interval join: pair each event with the same user's
    orders placed within ``within`` AFTER the event (attribution-style
    correlation).

    On streams, BOTH sides carry a watermark and the join condition bounds
    the time skew — that bound is what lets Spark garbage-collect join
    state (an unbounded stream-stream equi-join would buffer both streams
    forever; SPARK-26154 semantics). On batch frames the same expression
    is an ordinary range-predicate join, which is exactly how the
    equivalence test validates the streaming output.

    ``how='left_outer'`` additionally emits unmatched events with null
    order columns — the conversion-funnel "no purchase followed" rows.
    Outer results are emitted only once the watermark passes the event's
    join horizon (event_ts + within + watermark): Spark must be sure no
    matching order can still arrive. A finite availableNow drain
    therefore needs a later batch (or no-data batch) to advance the
    watermark past the tail events, else their outer rows stay in state —
    that is correct streaming semantics, not data loss.

    Every column is a parameter; the two sides are alias-qualified so the
    join stays a cross-frame equi-join even when both sides use the SAME
    column names (e.g. user_key == order_key == 'user_id').
    """
    if how not in ("inner", "left_outer"):
        raise ValueError(f"unsupported join type {how!r}")
    ev, od = events, orders
    if events.isStreaming:
        ev = events.withWatermark(event_ts, watermark)
    if orders.isStreaming:
        od = orders.withWatermark(order_ts, watermark)
    ev, od = ev.alias("ev"), od.alias("od")
    cond = (
        (F.col(f"ev.{user_key}") == F.col(f"od.{order_key}"))
        & (F.col(f"od.{order_ts}") >= F.col(f"ev.{event_ts}"))
        & (
            F.col(f"od.{order_ts}")
            <= F.col(f"ev.{event_ts}") + F.expr(f"INTERVAL {within}")
        )
    )
    return ev.join(od, cond, how).select(
        F.col(f"ev.{user_key}").alias(user_key),
        F.col(f"ev.{event_id}").alias(event_id),
        F.col(f"ev.{event_ts}").alias("event_ts"),
        F.col(f"od.{order_id}").alias(order_id),
        F.col(f"od.{order_ts}").alias("order_ts"),
    )


def stream_upsert_available_now(
    spark: SparkSession,
    source_dir: str,
    schema: T.StructType,
    latest_path: str,
    checkpoint: str,
    primary_key: list[str],
    order_col: str,
    tie_breaks: list[str] | None = None,
):
    """Streaming CDC-style upsert: drain new files from ``source_dir`` and
    fold each micro-batch into the materialized latest-row zone
    (``merge_latest``), then stop.

    foreachBatch + the checkpoint give exactly-once PER BATCH: a replayed
    batch re-merges the same rows, and merge_latest is idempotent (a key's
    winner cannot regress), so retries are safe. This is the
    reference-design inversion: instead of appending duplicate versions
    and paying the latest-row window at EVERY read (T6), the stream pays
    one bounded merge per batch and reads are plain scans. On Delta this
    is ``foreachBatch + MERGE INTO``.

    Returns the StreamingQuery (caller awaits termination).
    """
    from ..ingest.merge import merge_latest

    stream = spark.readStream.schema(schema).parquet(source_dir)

    def upsert_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        merge_latest(
            spark,
            latest_path,
            batch_df,
            primary_key,
            order_col,
            tie_breaks or [],
        )

    return (
        stream.writeStream.foreachBatch(upsert_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def stream_derived_table_available_now(
    spark: SparkSession,
    lake_path: str,
    schema: T.StructType,
    target_location: str,
    checkpoint: str,
    transform=None,
):
    """Maintain a DERIVED table off the lake itself: treat the append-only
    lake directory as a file-source stream, apply ``transform`` to each
    micro-batch of newly committed files, and append the result to
    ``target_location``. Re-running drains only files added since the
    checkpoint — the streaming twin of ``ingest.timetravel.read_changes``
    (there the consumer tracks a commit version; here the checkpoint
    tracks file offsets, exactly-once per batch).

    This is the bronze→silver pattern: ingestion lands raw rows, and any
    number of downstream consumers each keep their own checkpoint and see
    every committed row exactly once, without coordination with the
    ingest job or each other.

    ``transform`` is batch-scoped (row-level maps/filters/projections).
    Cross-batch aggregation belongs to ``windowed_event_counts`` /
    ``streaming_latest_rows``, which manage watermarked state.

    Returns the StreamingQuery (caller awaits termination).
    """
    stream = spark.readStream.schema(schema).parquet(lake_path)
    if transform is not None:
        stream = transform(stream)

    def write_batch(batch_df: DataFrame, epoch_id: int) -> None:
        batch_df.write.mode("append").option(
            "compression", "snappy"
        ).parquet(target_location)

    return (
        stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def stream_dedup_lsh_available_now(
    spark: SparkSession,
    source_dir: str,
    schema: T.StructType,
    lake_path: str,
    index_path: str,
    checkpoint: str,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Streaming dedup-at-the-door: drain new document files, reject any
    doc that near-duplicates (MinHash-LSH + exact Jaccard verify) a doc
    already ACCEPTED into the lake, append survivors to ``lake_path`` and
    their band signatures to the persisted band index at ``index_path``
    — then stop. The streaming form of
    ``operators/dedup.py::dedup_against_index`` (its batch twin is the
    oracle-checked `dedup_incremental_vs_lake` query).

    Per micro-batch cost is O(batch): the batch's band signatures probe
    the PERSISTED index (hash equi-join, no lake re-signature), and the
    exact-verify stage reads only the lake docs that banded with the
    batch (a semi-join pushes the id filter into the lake scan). The
    lake corpus is never re-paired — this is what makes continuous
    dedup sustainable when the lake is 1000× every batch.

    Within a batch, earlier ids win (exact text-hash keep-min plus
    near-dup pair rejection of the larger id). Writes are IDEMPOTENT
    under batch replay: each epoch overwrites its own
    ``epoch=<id>`` subdirectory of the lake and index (the standard
    foreachBatch idempotent-sink pattern; on Delta both writes become
    MERGE INTO txn), and the index/lake PROBE excludes the current
    epoch's own partition — a replay after a partial write must not
    compare the batch against its previous attempt's output (a batch
    doc would self-match, or BOTH sides of a within-batch near-dup
    pair could reject: the smaller against the partial index, the
    larger within the batch — silent data loss).

    Returns the StreamingQuery (caller awaits termination).
    """
    from ..operators.dedup import (
        _jaccard_verify,
        _lsh_bands,
        _shingle_table,
        _signatures_from_shingles,
        exact_duplicates,
    )

    stream = spark.readStream.schema(schema).parquet(source_dir)

    def dedup_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        # 1. within-batch exact dedup (keep the min id per text hash)
        keep = exact_duplicates(batch_df, text_col, id_col).select(
            F.col("keep_doc_id").alias(id_col)
        )
        batch = batch_df.join(keep, id_col, "left_semi").persist()

        sh_new = _shingle_table(batch, text_col, id_col, 3).persist()
        bands_new = _lsh_bands(_signatures_from_shingles(sh_new)).persist()

        # 2. within-batch near-dup rejection: larger id of a verified pair
        a, b = bands_new.alias("a"), bands_new.alias("b")
        cand_in = (
            a.join(
                b,
                (F.col("a.band_id") == F.col("b.band_id"))
                & (F.col("a.band_sig") == F.col("b.band_sig"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .select(
                F.col("a.doc_id").alias("doc_id_a"),
                F.col("b.doc_id").alias("doc_id_b"),
            )
            .distinct()
        )
        reject_in = (
            _jaccard_verify(cand_in, sh_new, threshold)
            .select(F.col("doc_id_b").alias(id_col))
            .distinct()
        )

        # 3. probe the persisted lake index (absent on the first epoch).
        # Exclude THIS epoch's partition: on replay it holds the failed
        # attempt's partial output, and probing it loses data (see
        # docstring).
        try:
            index = spark.read.parquet(index_path).filter(
                F.col("epoch") != epoch_id
            )
            have_index = not index.isEmpty()
        except Exception:
            have_index = False
        if have_index:
            cand_lake = (
                bands_new.alias("n")
                .join(
                    index.alias("i"),
                    (F.col("n.band_id") == F.col("i.band_id"))
                    & (F.col("n.band_sig") == F.col("i.band_sig")),
                )
                .select(
                    F.col("n.doc_id").alias("doc_id_a"),
                    F.col("i.doc_id").alias("doc_id_b"),
                )
                .distinct()
            )
            lake_hits = spark.read.parquet(lake_path).filter(
                F.col("epoch") != epoch_id
            ).join(
                cand_lake.select(F.col("doc_id_b").alias(id_col)).distinct(),
                id_col,
                "left_semi",
            )
            sh_lake = _shingle_table(lake_hits, text_col, id_col, 3)
            reject_lake = (
                _jaccard_verify(
                    cand_lake, sh_new.unionByName(sh_lake), threshold
                )
                .select(F.col("doc_id_a").alias(id_col))
                .distinct()
            )
            rejects = reject_in.unionByName(reject_lake).distinct()
        else:
            rejects = reject_in
        accepted = batch.join(rejects, id_col, "left_anti").persist()

        # 4. idempotent epoch-scoped appends
        accepted.write.mode("overwrite").parquet(
            f"{lake_path}/epoch={epoch_id}"
        )
        bands_new.join(
            accepted.select(F.col(id_col).alias("doc_id")), "doc_id", "left_semi"
        ).write.mode("overwrite").parquet(f"{index_path}/epoch={epoch_id}")
        batch.unpersist()
        sh_new.unpersist()
        bands_new.unpersist()
        accepted.unpersist()

    return (
        stream.writeStream.foreachBatch(dedup_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def stream_mv_available_now(
    spark: SparkSession,
    lake_path: str,
    schema: T.StructType,
    keys: list,
    measures_fn,
    state_dir: str,
    checkpoint: str,
):
    """Maintain a MATERIALIZED AGGREGATE view off the append-only lake:
    each micro-batch of newly committed files folds into the view as a
    partial-aggregate STATE (``operators.mv.aggregate_state``) written
    to ``state_dir/epoch=<id>`` — the streaming half of the incremental
    view maintenance the batch side oracle-checks as
    ``mv_incremental_revenue``.

    Exactly-once under epoch replay WITHOUT transactions: a replayed
    epoch overwrites its own epoch directory with the identical state
    (idempotent), never double-folds.  The view itself is assembled by
    :func:`read_mv`, which merges all epoch states — each
    distinct-key-sized, so the fold-on-read stays metadata-scale; call
    sites can compact epochs through the same merge when E grows.

    ``measures_fn`` is a zero-arg callable returning the measures dict
    (columns can't be built before a session exists).  Returns the
    StreamingQuery (caller awaits termination).
    """
    from ..operators.mv import aggregate_state

    stream = spark.readStream.schema(schema).parquet(lake_path)

    def write_batch(batch_df: DataFrame, epoch_id: int) -> None:
        state = aggregate_state(batch_df, keys, measures_fn())
        state.write.mode("overwrite").parquet(
            f"{state_dir}/epoch={epoch_id}"
        )

    return (
        stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def read_mv(spark: SparkSession, state_dir: str, keys: list) -> DataFrame:
    """Assemble the current view from the persisted epoch states: one
    merge (union + per-key re-sum) over frames that are each
    distinct-key-sized."""
    from ..operators.mv import merge_states

    df = spark.read.parquet(state_dir)
    return merge_states([df.drop("epoch")], keys)


def compact_mv_states(
    spark: SparkSession, state_dir: str, keys: list, target_dir: str
) -> None:
    """Compact a streaming MV's epoch states: merge every epoch into one
    state and write it as ``target_dir/epoch=0``.  The caller repoints
    readers (or swaps directories) once the write completes — the source
    ``state_dir`` is never mutated, so a crash mid-compaction loses
    nothing and the stream keeps appending epochs meanwhile; epochs
    written after the cut simply re-merge on the next compaction."""
    merged = read_mv(spark, state_dir, keys)
    merged.write.mode("overwrite").parquet(f"{target_dir}/epoch=0")
