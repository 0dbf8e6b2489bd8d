"""Streaming training-shard delivery — the foreachBatch pendant of
``operators/shards.write_training_shards``.

A stream of documents becomes trainer-ready shards continuously: per
micro-batch, the batch's docs pack into token-budgeted sequences and
sequences into token-bounded shards (the same two prefix-sum operators
the batch writer uses), and the batch delivers

- data at   ``{delivery_dir}/data/epoch={id}/shard_id={n}/``
- manifest at ``{delivery_dir}/manifest/epoch={id}/``

Shard assignment is EPOCH-SCOPED (ids restart per batch; the manifest
key is (epoch, shard_id)) — re-packing the global corpus per batch
would be O(lake) per epoch, and a trainer consumes (epoch, shard)
units just as well. The batch writer's digest-diff contract is the
right tool when a whole corpus is re-delivered; the stream's contract
is the epoch ledger below.

Crash-safety (the package's epoch-idempotent sink shape, shared with
``streaming/door.py``): every write is an epoch-scoped OVERWRITE —
a replayed epoch deterministically recomputes the same packing (order
by ``id_col``) and rewrites exactly its own partitions, never
duplicating rows or touching other epochs' output; the manifest is an
append-only per-epoch delta ledger whose union is the full manifest.
The checkpoint, data dir and manifest dir are ONE unit — resetting the
checkpoint while keeping the directories re-numbers epochs against
existing partitions (operator error; restart from the same checkpoint
or reset all three together).

Reference pendant: none — greenfield streaming delivery operator
(SURVEY.md §2 beyond-reference set; reference K1 stops at a batch
parquet append, extractors/ingest_mysql_data.py:525-542).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException

from ..functions.text import n_tokens_of
from ..operators.shards import (
    _write_manifest_rows,
    pack_assign_with_payload,
    shard_manifest,
)


_RESERVED_COLS = ("n_tokens", "seq_id", "shard_id", "epoch")


def _read_manifest_raw(spark: SparkSession, delivery_dir: str):
    """The raw ledger frame, or None before the first delivery. Only
    the path-missing case means "nothing delivered"; anything else
    re-raises (a transient read error must not masquerade as empty)."""
    try:
        return spark.read.parquet(f"{delivery_dir}/manifest")
    except AnalysisException as e:
        msg = str(e)
        if "PATH_NOT_FOUND" in msg or "UNABLE_TO_INFER_SCHEMA" in msg:
            return None
        raise


def read_delivery_manifest(
    spark: SparkSession, delivery_dir: str, include_stale: bool = False
) -> DataFrame | None:
    """The accumulated manifest — union of every epoch's delta, keyed
    (epoch, shard_id) — or None before the first delivery.

    By default the view EXCLUDES stale entries (a superseded baseline
    and the epochs it already folded — the leftovers of a compaction
    that crashed before its deletes), so totals are always correct;
    ``include_stale=True`` exposes the raw ledger for inspection and
    for ``compact_delivery``'s recovery pass. The stale set comes from
    the single ledger reading in ``_ledger_state``."""
    man, effective, _covered, live_streamed, _stale = _ledger_state(
        spark, delivery_dir
    )
    if man is None:
        return None
    if include_stale:
        return man
    keep = ([effective] if effective is not None else []) + live_streamed
    return man.filter(F.col("epoch").isin(keep))


class DeliverySnapshotError(RuntimeError):
    """The requested delivery snapshot predates the compaction baseline."""


# Baseline epochs encode their own COVERAGE in the partition value:
# ``epoch = -(k + 2)`` means "this baseline folds every streamed epoch
# <= k". Coverage thereby commits ATOMICALLY with the baseline's own
# manifest delta (no separate meta file whose write order could desync
# from the data under a crash); newer baselines are MORE negative, so
# the effective baseline is always min(baseline epochs), and anything
# it covers that still exists on disk is recognizably stale. Streamed
# epochs count up from 0 and can never collide.


def _baseline_id(covers_through: int) -> int:
    return -(covers_through + 2)


def _baseline_coverage(baseline_id: int) -> int:
    return -baseline_id - 2


def _ledger_state(spark, delivery_dir: str):
    """(manifest | None, effective_baseline | None, covered_through,
    live_streamed, stale) — the one shared reading of the epoch ledger.

    ``stale`` = baselines superseded by a more-negative one plus
    streamed epochs the effective baseline already covers: exactly the
    leftovers of a compaction that crashed between its baseline write
    and its deletes. Every reader here EXCLUDES them (so a crash window
    never serves duplicated or wrong rows); ``compact_delivery``
    deletes them without re-reading (so recovery never re-folds rows
    the baseline already holds)."""
    man = _read_manifest_raw(spark, delivery_dir)
    if man is None:
        return None, None, -1, [], []
    epochs = sorted(
        r["epoch"] for r in man.select("epoch").distinct().collect()
    )
    baselines = [e for e in epochs if e < 0]
    if -1 in baselines:
        # -1 is unreachable under the coverage-encoded scheme
        # (_baseline_id(k) <= -2 for k >= 0): decoding it would claim
        # "covers nothing" and silently double-count whatever it folded.
        # Refuse loudly rather than guess.
        raise DeliverySnapshotError(
            f"{delivery_dir} contains a baseline at epoch=-1, which this "
            f"coverage-encoded scheme never writes — foreign or corrupt "
            f"ledger state; resolve it manually before reading"
        )
    streamed = [e for e in epochs if e >= 0]
    effective = min(baselines) if baselines else None
    covered = _baseline_coverage(effective) if effective is not None else -1
    stale = [b for b in baselines if b != effective] + [
        e for e in streamed if e <= covered
    ]
    live_streamed = [e for e in streamed if e > covered]
    return man, effective, covered, live_streamed, stale


def read_delivery_as_of(
    spark: SparkSession, delivery_dir: str, epoch: int
) -> tuple[DataFrame, DataFrame]:
    """(data, manifest) exactly as the delivery stood after ``epoch``
    committed — the manifest delta ledger IS a commit log, so delivery
    snapshots come free (the ingest/timetravel.py idea applied to the
    streaming delivery).

    Re-baseline semantics mirror the lake's: snapshots at or after the
    effective baseline's recorded coverage answer exactly (the baseline
    stands in for everything it folded); older snapshots cannot be
    reconstructed and raise ``DeliverySnapshotError`` — never wrong
    rows, including inside a crashed-compaction window (stale baselines
    and already-folded epochs are excluded by the ledger reading)."""
    man, effective, covered, live_streamed, _stale = _ledger_state(
        spark, delivery_dir
    )
    if man is None:
        raise DeliverySnapshotError(f"no delivery at {delivery_dir}")
    if epoch < covered:
        raise DeliverySnapshotError(
            f"epoch {epoch} predates the compaction baseline at "
            f"{delivery_dir} (oldest reconstructable snapshot: "
            f"{covered}); re-deliver or keep pre-compaction copies "
            f"if older snapshots must stay queryable"
        )
    keep = ([effective] if effective is not None else []) + [
        e for e in live_streamed if e <= epoch
    ]
    man_of = man.filter(F.col("epoch").isin(keep))
    data = (
        spark.read.option("basePath", f"{delivery_dir}/data")
        .parquet(f"{delivery_dir}/data")
        .filter(F.col("epoch").isin(keep))
    )
    return data, man_of


def compact_delivery(
    spark: SparkSession,
    delivery_dir: str,
    seq_token_budget: int = 512,
    shard_token_budget: int = 4096,
) -> dict:
    """Fold many small epochs' shards into budget-sized ones under a
    re-baselined manifest — the delivery-side pendant of the lake's
    compact + re-baseline (ingest/maintenance.py): a long-running
    stream accumulates one undersized tail shard per epoch, and a
    trainer wants few full shards, not thousands of slivers.

    Safety rules (why this never fights the stream or itself):

    - Run with the stream STOPPED. Structured streaming can only replay
      the LAST epoch (earlier ones are committed in the checkpoint), so
      that epoch is EXCLUDED from folding and kept verbatim — a restart
      that replays it overwrites its own partitions exactly as before,
      never the baseline.
    - Everything older folds into a NEW baseline whose epoch id encodes
      its coverage (see ``_baseline_id``); the previous baseline's rows
      are folded forward by reading, the new baseline is written to its
      own fresh ``epoch=`` directory (never overwriting the old one),
      and superseded directories are deleted LAST.
    - Crash recovery is therefore re-run-to-converge WITHOUT double
      counting: after a crash between the baseline write and the
      deletes, the ledger shows both baselines — every reader uses only
      the most-negative (new) one, and the re-run recognizes the old
      baseline and its folded epochs as stale FROM THE RECORDED
      COVERAGE (not by re-reading them) and just deletes them.

    Returns ``{"folded": [...], "kept": [...], "stale_removed": [...],
    "n_shards": int}``; a steady-state delivery (baseline + one
    replayable tail, nothing stale) is a true no-op.
    """
    from ..operators.shards import _hadoop_fs

    man, effective, covered, live_streamed, stale = _ledger_state(
        spark, delivery_dir
    )
    if man is None:
        return {"folded": [], "kept": [], "stale_removed": [],
                "n_shards": 0}
    keep_tail = live_streamed[-1:]  # the only replayable epoch
    new_folds = [e for e in live_streamed if e not in keep_tail]

    n_shards = 0
    new_id = effective
    if new_folds:
        fold_src = ([effective] if effective is not None else []) + new_folds
        data = spark.read.option(
            "basePath", f"{delivery_dir}/data"
        ).parquet(f"{delivery_dir}/data")
        # keep payload columns (doc text etc.) through the fold; only
        # the derived assignment columns are recomputed. The same doc
        # can legitimately appear in SEVERAL folded epochs (it was
        # re-delivered), so the unique pack/join key is doc#epoch —
        # joining payload back on doc_id alone would MULTIPLY the
        # duplicates (2 epochs -> 4 rows); pack order stays the natural
        # (doc_id, source epoch).
        folded = (
            data.filter(F.col("epoch").isin(fold_src))
            .drop("seq_id", "shard_id")
            .withColumnRenamed("epoch", "_src_epoch")
            .withColumn(
                "_uid",
                F.concat_ws("#", F.col("doc_id"), F.col("_src_epoch")),
            )
            .localCheckpoint()  # materialized before any write
        )
        sharded = (
            pack_assign_with_payload(
                folded,
                seq_token_budget,
                shard_token_budget,
                id_col="_uid",
                order_cols=["doc_id", "_src_epoch"],
            )
            .drop("_uid", "_src_epoch")
            .localCheckpoint()
        )
        new_id = _baseline_id(max(new_folds))
        (
            sharded.write.mode("overwrite")
            .partitionBy("shard_id")
            .parquet(f"{delivery_dir}/data/epoch={new_id}")
        )
        manifest = shard_manifest(sharded)
        # one collect serves the count AND the driver-side manifest
        # publish (manifest-scale; was a count job + a write job)
        man_rows = manifest.collect()
        n_shards = len(man_rows)
        _write_manifest_rows(
            spark, man_rows, manifest.schema,
            f"{delivery_dir}/manifest/epoch={new_id}",
        )
        stale = stale + (
            [effective] if effective is not None else []
        ) + new_folds
    if not stale:
        return {"folded": [], "kept": ([new_id] if new_id is not None
                                       else []) + keep_tail,
                "stale_removed": [], "n_shards": 0}
    for e in stale:
        for sub in ("data", "manifest"):
            fs, p = _hadoop_fs(spark, f"{delivery_dir}/{sub}/epoch={e}")
            if fs.exists(p):
                fs.delete(p, True)
    return {
        "folded": new_folds,
        "kept": ([new_id] if new_id is not None else []) + keep_tail,
        "stale_removed": sorted(stale),
        "n_shards": n_shards,
    }


def shard_delivery_stream(
    spark: SparkSession,
    stream: DataFrame,
    delivery_dir: str,
    checkpoint: str,
    seq_token_budget: int = 512,
    shard_token_budget: int = 4096,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Start an availableNow stream delivering trainer-ready shards.

    Returns the StreamingQuery. Each epoch's shards carry the FULL doc
    rows (every ``stream`` column, ``id_col`` normalized to ``doc_id``)
    plus (n_tokens, seq_id, shard_id), so a trainer consumes them
    directly with no join back to the corpus; the manifest delta carries
    (epoch, shard_id, n_docs, n_seqs, n_tokens, digest) with the same
    engine-portable digest as the batch writer. ``stream`` must not
    already carry the bookkeeping names (n_tokens/seq_id/shard_id/epoch,
    or doc_id unless it IS ``id_col``) — raises up front rather than
    silently clobbering or colliding at the payload join.
    """
    clash = [c for c in stream.columns if c in _RESERVED_COLS] + (
        ["doc_id"] if id_col != "doc_id" and "doc_id" in stream.columns
        else []
    )
    if clash:
        raise ValueError(
            f"stream columns {sorted(set(clash))} collide with delivery "
            f"bookkeeping columns; rename them upstream"
        )

    def deliver(batch_df: DataFrame, epoch_id: int) -> None:
        # the payload join-back requires a unique id per batch; a
        # duplicated id would silently MULTIPLY rows (n copies -> n^2),
        # so fail the stream loudly instead (one batch-scale aggregate;
        # cross-epoch re-delivery of the same doc remains fine — epochs
        # are independent and compaction keys on doc#epoch)
        dup = (
            batch_df.groupBy(F.col(id_col))
            .count()
            .filter(F.col("count") > 1)
            .limit(1)
            .count()
        )
        if dup:
            raise ValueError(
                f"batch for epoch {epoch_id} carries duplicate "
                f"{id_col} values; deduplicate upstream"
            )
        sized = batch_df.select(
            F.col(id_col).alias("doc_id"),
            n_tokens_of(F.col(text_col)).alias("n_tokens"),
            *[c for c in batch_df.columns if c != id_col],
        )
        sharded = pack_assign_with_payload(
            sized, seq_token_budget, shard_token_budget
        ).localCheckpoint()  # consumed by the data write AND the manifest
        (
            sharded.write.mode("overwrite")
            .partitionBy("shard_id")
            .parquet(f"{delivery_dir}/data/epoch={epoch_id}")
        )
        epoch_manifest = shard_manifest(sharded)
        _write_manifest_rows(
            batch_df.sparkSession, epoch_manifest.collect(),
            epoch_manifest.schema,
            f"{delivery_dir}/manifest/epoch={epoch_id}",
        )

    return (
        stream.writeStream.foreachBatch(deliver)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
