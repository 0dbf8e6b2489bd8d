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
