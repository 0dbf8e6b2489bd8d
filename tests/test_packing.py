"""Sequence packing — distributed prefix sum correctness."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datalakeingestion_spark.operators.packing import pack_sequences


def _local_pack(rows, budget):
    out, cum = {}, 0
    for doc_id, n in sorted(rows):
        out[doc_id] = cum // budget
        cum += n
    return out


def test_pack_matches_serial_reference_across_partitions(spark):
    # token counts chosen to straddle budget boundaries; 7 range
    # partitions force offsets to matter (any wrong offset shifts seq_ids)
    rows = [(i, (i * 37) % 190) for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    got = {
        r["doc_id"]: r["seq_id"]
        for r in pack_sequences(
            df, token_budget=512, num_partitions=7
        ).collect()
    }
    assert got == _local_pack(rows, 512)


def test_pack_single_doc_larger_than_budget_stays_whole(spark):
    rows = [(1, 10), (2, 5000), (3, 10)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    got = {
        r["doc_id"]: r["seq_id"]
        for r in pack_sequences(df, token_budget=512, num_partitions=2).collect()
    }
    # doc 2 overflows its sequence but is never split; doc 3 starts at
    # floor(5010/512) = 9
    assert got == {1: 0, 2: 0, 3: 9}


def test_pack_rejects_nonpositive_budget(spark):
    df = spark.createDataFrame([(1, 1)], "doc_id long, n_tokens long")
    with pytest.raises(ValueError):
        pack_sequences(df, token_budget=0)


def test_tokenize_to_ids_roundtrip_and_rank_order(spark):
    """Frequency-sorted ids: the most frequent token gets id 1; encoding
    preserves position order; empty docs yield no row."""
    from datalakeingestion_spark.operators.packing import tokenize_to_ids

    rows = [(1, "b a a"), (2, "a b c"), (3, "")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: r for r in tokenize_to_ids(df).collect()}
    assert 3 not in out
    # freqs: a=3, b=2, c=1 -> ids a=1, b=2, c=3
    assert list(out[1].token_ids) == [2, 1, 1]
    assert list(out[2].token_ids) == [1, 2, 3]
    assert out[1].n_tokens == 3
