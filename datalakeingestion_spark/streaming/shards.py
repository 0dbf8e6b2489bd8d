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

from ..functions.text import tokens
from ..operators.packing import pack_sequences
from ..operators.shards import assign_shards, shard_manifest


def read_delivery_manifest(
    spark: SparkSession, delivery_dir: str
) -> DataFrame | None:
    """The accumulated manifest — union of every epoch's delta, keyed
    (epoch, shard_id) — or None before the first delivery. Only the
    path-missing case means "nothing delivered"; anything else
    re-raises (a transient read error must not masquerade as empty)."""
    try:
        return spark.read.parquet(f"{delivery_dir}/manifest")
    except AnalysisException as e:
        msg = str(e)
        if "PATH_NOT_FOUND" in msg or "UNABLE_TO_INFER_SCHEMA" in msg:
            return None
        raise


BASELINE_EPOCH = -1


class DeliverySnapshotError(RuntimeError):
    """The requested delivery snapshot predates the compaction baseline."""


def read_delivery_as_of(
    spark: SparkSession, delivery_dir: str, epoch: int
) -> tuple[DataFrame, DataFrame]:
    """(data, manifest) exactly as the delivery stood after ``epoch``
    committed — the manifest delta ledger IS a commit log, so delivery
    snapshots come free (the ingest/timetravel.py idea applied to the
    streaming delivery).

    Re-baseline semantics mirror the lake's: after ``compact_delivery``
    folds epochs into the ``epoch=-1`` baseline, snapshots that CONTAIN
    the whole baseline (every epoch >= the newest surviving streamed
    epoch below them... i.e. requests at or above the oldest surviving
    streamed epoch) still answer exactly; a snapshot BEFORE the
    baseline's coverage cannot be reconstructed and raises
    ``DeliverySnapshotError`` — never wrong rows.
    """
    man = read_delivery_manifest(spark, delivery_dir)
    if man is None:
        raise DeliverySnapshotError(f"no delivery at {delivery_dir}")
    epochs = sorted(
        r["epoch"] for r in man.select("epoch").distinct().collect()
    )
    streamed = [e for e in epochs if e != BASELINE_EPOCH]
    if BASELINE_EPOCH in epochs:
        # the baseline folds every epoch older than the surviving
        # streamed ones; a snapshot is answerable iff it includes the
        # whole baseline, i.e. sits at/after the last folded epoch —
        # conservatively: at/after (first surviving streamed epoch - 1)
        floor_ok = streamed[0] - 1 if streamed else BASELINE_EPOCH
        if epoch < floor_ok:
            raise DeliverySnapshotError(
                f"epoch {epoch} predates the compaction baseline at "
                f"{delivery_dir} (oldest reconstructable snapshot: "
                f"{floor_ok}); re-deliver or keep pre-compaction copies "
                f"if older snapshots must stay queryable"
            )
        keep = [BASELINE_EPOCH] + [e for e in streamed if e <= epoch]
    else:
        keep = [e for e in streamed if e <= epoch]
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

    Safety rules (why this never fights the stream):

    - Run with the stream STOPPED. Structured streaming can only replay
      the LAST epoch (earlier ones are committed in the checkpoint), so
      that epoch is EXCLUDED from folding and kept verbatim — a restart
      that replays it overwrites its own partitions exactly as before,
      never the baseline.
    - Everything older folds into the reserved ``epoch=-1`` baseline
      (stream epochs count up from 0, so no future epoch collides).
      The folded frame is materialized (eager localCheckpoint) BEFORE
      the baseline overwrite — the input may include the previous
      baseline's own files (at object-store scale, stage to a new
      prefix and swap instead).
    - Folded epoch directories (data + manifest deltas) are deleted
      last; a crash before the deletes leaves duplicates VISIBLY (both
      the baseline and the folded epochs in the manifest) rather than
      losing rows — re-run compaction to converge.

    Returns ``{"folded": [...], "kept": [...], "n_shards": int}``; a
    delivery with nothing to fold is a no-op.
    """
    from ..operators.shards import _hadoop_fs

    man = read_delivery_manifest(spark, delivery_dir)
    if man is None:
        return {"folded": [], "kept": [], "n_shards": 0}
    epochs = sorted(
        r["epoch"] for r in man.select("epoch").distinct().collect()
    )
    streamed = [e for e in epochs if e != BASELINE_EPOCH]
    keep = streamed[-1:]  # the only replayable epoch stays verbatim
    fold = [e for e in epochs if e not in keep]
    if len(fold) <= 1 and BASELINE_EPOCH not in fold:
        return {"folded": [], "kept": epochs, "n_shards": 0}

    data = spark.read.option("basePath", f"{delivery_dir}/data").parquet(
        f"{delivery_dir}/data"
    )
    folded = (
        data.filter(F.col("epoch").isin(fold))
        .select("doc_id", "n_tokens")
        .localCheckpoint()  # materialize BEFORE overwriting the baseline
    )
    packed = pack_sequences(folded, token_budget=seq_token_budget)
    sharded = assign_shards(
        packed, shard_token_budget=shard_token_budget
    ).localCheckpoint()
    (
        sharded.write.mode("overwrite")
        .partitionBy("shard_id")
        .parquet(f"{delivery_dir}/data/epoch={BASELINE_EPOCH}")
    )
    manifest = shard_manifest(sharded)
    n_shards = manifest.count()
    (
        manifest.coalesce(1)
        .write.mode("overwrite")
        .parquet(f"{delivery_dir}/manifest/epoch={BASELINE_EPOCH}")
    )
    for e in fold:
        if e == BASELINE_EPOCH:
            continue
        for sub in ("data", "manifest"):
            fs, p = _hadoop_fs(spark, f"{delivery_dir}/{sub}/epoch={e}")
            if fs.exists(p):
                fs.delete(p, True)
    return {
        "folded": fold,
        "kept": [BASELINE_EPOCH] + keep,
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

    Returns the StreamingQuery. Each epoch's shards carry the full doc
    rows plus (seq_id, n_tokens); the manifest delta carries
    (epoch, shard_id, n_docs, n_seqs, n_tokens, digest) with the same
    engine-portable digest as the batch writer.
    """

    def deliver(batch_df: DataFrame, epoch_id: int) -> None:
        sized = batch_df.select(
            F.col(id_col).alias("doc_id"),
            F.size(tokens(text_col)).alias("n_tokens"),
        )
        packed = pack_sequences(sized, token_budget=seq_token_budget)
        sharded = assign_shards(
            packed, shard_token_budget=shard_token_budget
        ).localCheckpoint()  # consumed by the data write AND the manifest
        (
            sharded.write.mode("overwrite")
            .partitionBy("shard_id")
            .parquet(f"{delivery_dir}/data/epoch={epoch_id}")
        )
        (
            shard_manifest(sharded)
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(f"{delivery_dir}/manifest/epoch={epoch_id}")
        )

    return (
        stream.writeStream.foreachBatch(deliver)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
