"""Sequence packing — assign documents to fixed token-budget training
sequences via a DISTRIBUTED PREFIX SUM.

LLM pre-training consumes documents concatenated into fixed-length
sequences. The deterministic streaming pack (documents in stable id
order; a document starts a new sequence when the running token count
crosses the budget) is a global running sum — the textbook "looks
serial" operation. A naive window ``SUM() OVER (ORDER BY id)`` plans as
a SINGLE-partition window: one task pulls the whole table (at 100 TB,
one executor and one shuffle of everything).

The scale shape is the classic two-pass parallel prefix sum:

1. range-partition by id (global order across partitions, rows sorted
   within) — ONE shuffle;
2. per-partition token subtotals — tiny (#partitions rows) collected to
   the driver and turned into exclusive per-partition offsets;
3. one Arrow-batched ``mapInPandas`` pass adds offset + local cumsum —
   no further shuffle, state flows batch-to-batch inside a partition.

Output values are independent of where the range boundaries land (the
global order is preserved regardless), so the result is deterministic
even though range partitioning samples its boundaries.

Reference pendant: none — greenfield training-pipeline operator
(SURVEY.md §2 beyond-reference set).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def pack_sequences(
    docs: DataFrame,
    token_budget: int = 512,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    num_partitions: int | None = None,
) -> DataFrame:
    """Assign each document a ``seq_id`` = floor(exclusive-prefix-sum of
    ``tokens_col`` in ``id_col`` order / ``token_budget``).

    Document boundaries are preserved: a document whose tail crosses the
    budget stays whole in its sequence (pack-with-overflow; split/truncate
    is a downstream choice). ``docs`` must carry ``id_col`` (unique,
    orderable) and ``tokens_col`` (non-negative int).
    """
    if token_budget <= 0:
        raise ValueError("token_budget must be positive")
    spark = docs.sparkSession
    n = int(
        num_partitions
        or spark.conf.get("spark.sql.shuffle.partitions", "32")
    )
    part = (
        docs.select(
            F.col(id_col), F.col(tokens_col).cast("long").alias(tokens_col)
        )
        .repartitionByRange(n, F.col(id_col))
        .sortWithinPartitions(id_col)
        .withColumn("_pid", F.spark_partition_id())
        .persist()
    )
    try:
        # pass 1: per-partition subtotals — #partitions rows, driver-safe
        totals = {
            r["_pid"]: r["t"]
            for r in part.groupBy("_pid")
            .agg(F.sum(tokens_col).alias("t"))
            .collect()
        }
        offsets: dict[int, int] = {}
        running = 0
        for pid in range(n):
            offsets[pid] = running
            running += int(totals.get(pid, 0) or 0)

        id_field = part.schema[id_col]
        out_schema = T.StructType(
            [
                T.StructField(id_col, id_field.dataType),
                T.StructField(tokens_col, T.LongType()),
                T.StructField("seq_id", T.LongType()),
            ]
        )

        def pack(batches):
            import numpy as np

            cum = None  # running global prefix, carried across batches
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                if cum is None:
                    cum = offsets[int(pdf["_pid"].iloc[0])]
                t = pdf[tokens_col].to_numpy()
                cum_before = cum + np.concatenate(
                    ([0], np.cumsum(t)[:-1])
                )
                cum += int(t.sum())
                out = pdf[[id_col, tokens_col]].copy()
                out["seq_id"] = cum_before // token_budget
                yield out

        result = part.mapInPandas(pack, schema=out_schema)
        # materialize before unpersist so consumers never recompute the
        # two-pass pipeline against a dropped cache
        result = result.localCheckpoint(eager=True)
    finally:
        part.unpersist()
    return result
