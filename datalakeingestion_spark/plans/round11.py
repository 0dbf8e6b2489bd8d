"""Round-11 queries: training-data shard delivery and the persisted IVF
index — the two remaining "last mile" pieces of the LLM pipeline
(VERDICT r10 items #2/#3).

Portability notes as in plans/llm.py: tokenization twins share one
normalized-string recipe; digests are md5 over deterministically ordered
material; DuckDB window/group SUM(BIGINT) returns HUGEINT and is CAST
back to BIGINT everywhere it reaches a result column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.fixtures import load_table
from .llm import TOKS_SQL
from .registry import register

# ---------------------------------------------------------------------------
# Training-data shard delivery (manifest contract)
# ---------------------------------------------------------------------------

_SEQ_BUDGET = 512
_SHARD_BUDGET = 4096


@register(
    "training_shard_manifest",
    oracle=f"""
    WITH t AS (SELECT doc_id, CAST(len({TOKS_SQL}) AS BIGINT) AS n_tokens
               FROM documents),
    c AS (SELECT doc_id, n_tokens,
                 COALESCE(SUM(n_tokens) OVER (
                     ORDER BY doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                     AS cb
          FROM t),
    p AS (SELECT doc_id, n_tokens, CAST(cb // {_SEQ_BUDGET} AS BIGINT)
                     AS seq_id
          FROM c),
    s AS (SELECT seq_id, CAST(SUM(n_tokens) AS BIGINT) AS seq_tokens
          FROM p GROUP BY seq_id),
    sc AS (SELECT seq_id,
                  COALESCE(SUM(seq_tokens) OVER (
                      ORDER BY seq_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                      AS scb
           FROM s),
    sh AS (SELECT seq_id, CAST(scb // {_SHARD_BUDGET} AS BIGINT) AS shard_id
           FROM sc),
    j AS (SELECT sh.shard_id, p.seq_id, p.n_tokens,
                 md5(CAST(p.doc_id AS VARCHAR) || ':'
                     || CAST(p.n_tokens AS VARCHAR) || ':'
                     || CAST(p.seq_id AS VARCHAR)) AS fp
          FROM p JOIN sh ON sh.seq_id = p.seq_id)
    SELECT shard_id,
           COUNT(*)::BIGINT AS n_docs,
           COUNT(DISTINCT seq_id)::BIGINT AS n_seqs,
           CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
           md5(string_agg(fp, '' ORDER BY fp)) AS digest
    FROM j GROUP BY shard_id
    """,
    doc="Training-shard manifest (operators/shards.py): documents pack "
    f"into {_SEQ_BUDGET}-token sequences, sequences into "
    f"{_SHARD_BUDGET}-token output shards (both prefix-sum assignments "
    "are the distributed two-pass keyed_prefix_sum, never a global "
    "window), and each shard commits to its exact content via an "
    "engine-portable digest (md5 of sorted per-row md5 fingerprints — "
    "DuckDB twin: md5(string_agg(fp, '' ORDER BY fp))). This manifest "
    "is the contract write_training_shards diffs for idempotent "
    "incremental delivery: re-runs rewrite only shards whose digest "
    "changed (replay pytest in tests/test_shards.py). The K1 pendant "
    "for the LLM path — reference K1 stops at a parquet append "
    "(extractors/ingest_mysql_data.py:525-542).",
)
def training_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import tokens
    from ..operators.packing import pack_sequences
    from ..operators.shards import assign_shards, shard_manifest

    docs = load_table(spark, sf_dir, "documents")
    sized = docs.select("doc_id", F.size(tokens("text")).alias("n_tokens"))
    packed = pack_sequences(sized, token_budget=_SEQ_BUDGET)
    sharded = assign_shards(packed, shard_token_budget=_SHARD_BUDGET)
    return shard_manifest(sharded).select(
        "shard_id", "n_docs", "n_seqs", "n_tokens", "digest"
    )
