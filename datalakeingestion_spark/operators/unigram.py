"""Unigram-LM (SentencePiece-style) tokenizer trainer — Viterbi hard-EM.

The third tokenizer family beside BPE (``packing.bpe_train``) and
MaxMatch (``packing.maxmatch_encode_words``): start from ALL substrings
(length <= ``lmax``) of the corpus's distinct words as the seed vocab,
then iterate EM — E-step segments every word into its minimum-cost piece
sequence under the current piece costs (Viterbi), M-step re-counts
pieces from those segmentations and re-derives costs. Pieces that no
best segmentation uses are pruned; single characters are always kept
(with a floor count of 1) so every word stays coverable — the classic
SentencePiece coverage rule.

This is the HARD-EM (Viterbi) variant of the SentencePiece trainer:
the E-step uses the single best segmentation rather than full
forward-backward posteriors. That choice is what makes the trainer
EXACT and engine-portable — the published algorithm's lattice
posteriors are float-heavy with no stable cross-engine rounding, while
hard-EM needs only (a) integer Viterbi DP and (b) one ln() per piece
per iteration:

- piece costs are INTEGER micro-nats, ``round(1e6 * ln(total/cnt))``
  as BIGINT — the one transcendental evaluates once per piece and is
  rounded to an ABSOLUTE precision of 0.5 micro-nats, ~7 orders of
  magnitude above any libm ulp disagreement between engines (compare
  the repo's usual 6-dp rounding of raw ln values);
- the DP itself sums BIGINTs — exact on every engine;
- ties (equal-cost segmentations) break toward the SMALLEST split
  point, i.e. the longest last piece, then recursively the same rule —
  deterministic on both engines.

The DuckDB oracle unrolls both EM iterations and each iteration's DP
(positions 1..wmax) and backtrace (up to wmax steps) as MATERIALIZED
CTEs — the BPE/HITS/logistic-GD recipe; MATERIALIZED matters because
the dp_k chain references dp_{k-1} twice and naive inlining is
exponential.

Scale shape (the maxmatch/BPE pattern): the CORPUS pays one
distinct-word aggregate; everything after runs on vocab-sized frames —
the substring table is |words| × wmax × lmax rows, the per-iteration
collect is the piece table (bounded by that same substring table), and
the Viterbi pass is an Arrow batch UDF over distinct WORDS (not
documents) with the piece->cost dict in its closure (a few MB at a
100k-word vocab; the same broadcast-closure convention as the IVF
centroids). Words longer than ``wmax`` are excluded from TRAINING
(bounded-DP contract; raise wmax for long-token domains — cost is
linear in it).

Reference pendant: none — greenfield LLM-pipeline operator
(SURVEY.md §2 beyond-reference set).
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens


def _int_cost(total: int, cnt: int) -> int:
    """round(1e6 * ln(total/cnt)) with explicit HALF-UP (python round()
    is banker's; the engines round half away from zero)."""
    return math.floor(1e6 * math.log(total / cnt) + 0.5)


def _viterbi_udf(cost: dict[str, int], lmax: int):
    """Best segmentation of each word under integer piece costs.

    dp[i] = min over piece lengths l of dp[i-l] + cost(word[i-l:i]);
    backtrace prefers the smallest split point (longest piece). Pure
    integer arithmetic — bit-identical to the oracle's unrolled DP.
    """

    @F.pandas_udf("array<string>")
    def segment(words: pd.Series) -> pd.Series:
        out = []
        for w in words:
            n = len(w)
            inf = float("inf")
            dp = [0] + [inf] * n
            for i in range(1, n + 1):
                for l in range(1, min(lmax, i) + 1):
                    p = w[i - l : i]
                    c = cost.get(p)
                    if c is not None and dp[i - l] + c < dp[i]:
                        dp[i] = dp[i - l] + c
            path = []
            pos = n
            while pos > 0:
                for j in range(max(0, pos - lmax), pos):
                    p = w[j:pos]
                    c = cost.get(p)
                    if c is not None and dp[j] + c == dp[pos]:
                        path.append(p)
                        pos = j
                        break
                else:  # uncoverable (never happens: chars always kept)
                    path.append(w[:pos])
                    break
            out.append(path[::-1])
        return pd.Series(out)

    return segment


def _em_vocab(docs, text_col, lmax, wmax, iters):
    """The shared EM loop: returns (words frame, final vocab frame) —
    consumed by the trainer (emits the piece table) and the encoder
    (segments under the final costs)."""
    words = (
        docs.select(F.explode(tokens(text_col)).alias("word"))
        .filter(F.length("word") <= wmax)
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("f"))
    ).localCheckpoint(eager=False)  # consumed once per EM iteration

    # all (start, len<=lmax) substrings — pure JVM expressions
    sub = words.select(
        "word",
        "f",
        F.explode(
            F.expr(
                f"""flatten(transform(sequence(1, length(word)), s ->
                    transform(sequence(1, least({lmax}, length(word) - s + 1)),
                              l -> struct(substring(word, s, l) AS piece,
                                          l AS l))))"""
            )
        ).alias("e"),
    ).select("word", "f", "e.piece", "e.l")
    chars = sub.filter(F.col("l") == 1).select("piece").distinct()
    vocab = sub.groupBy("piece").agg(F.sum("f").cast("long").alias("cnt"))

    for _ in range(iters):
        cost = _cost_dict(vocab)
        used = (
            words.select(
                "f", F.explode(_viterbi_udf(cost, lmax)("word")).alias("piece")
            )
            .groupBy("piece")
            .agg(F.sum("f").cast("long").alias("cnt"))
        )
        vocab = used.unionByName(
            chars.join(used, "piece", "left_anti").withColumn(
                "cnt", F.lit(1).cast("long")
            )
        ).localCheckpoint(eager=False)  # cut the per-iteration lineage
    return words, vocab


def _cost_dict(vocab) -> dict[str, int]:
    rows = vocab.collect()  # bounded: vocab-sized (see module doc)
    total = sum(r["cnt"] for r in rows)
    return {r["piece"]: _int_cost(total, r["cnt"]) for r in rows}


def train_unigram(
    docs: DataFrame,
    text_col: str = "text",
    lmax: int = 4,
    wmax: int = 12,
    iters: int = 2,
    top: int | None = None,
) -> DataFrame:
    """Train the unigram piece table; returns (piece, n_uses,
    cost_micro_nats) sorted by (n_uses DESC, piece ASC), limited to
    ``top`` when given. ``n_uses`` is the hard-EM piece count with the
    single-character floor of 1 (kept-for-coverage chars that no best
    segmentation uses)."""
    spark = docs.sparkSession
    words, vocab = _em_vocab(docs, text_col, lmax, wmax, iters)

    total = vocab.agg(F.sum("cnt")).first()[0]  # bounded 1-row scalar
    if not total:
        # no training-eligible words (empty/NULL corpus, or every token
        # longer than wmax): degrade to an empty piece table, the same
        # contract as every other operator, instead of float(None)
        return spark.createDataFrame(
            [], "piece string, n_uses long, cost_micro_nats long"
        )
    out = vocab.select(
        "piece",
        F.col("cnt").alias("n_uses"),
        F.round(F.lit(1e6) * F.log(F.lit(float(total)) / F.col("cnt")), 0)
        .cast("long")
        .alias("cost_micro_nats"),
    ).orderBy(F.desc("n_uses"), F.asc("piece"))
    return out.limit(top) if top is not None else out


def unigram_encode(
    docs: DataFrame,
    text_col: str = "text",
    lmax: int = 4,
    wmax: int = 12,
    iters: int = 2,
) -> DataFrame:
    """Segment every distinct training-eligible word under the TRAINED
    unigram model (the inference half, pairing ``train_unigram`` the way
    ``bpe_encode`` pairs ``bpe_train``): one more Viterbi pass under the
    final vocabulary's costs, emitting ``(word, n_pieces, encoded)``
    with ``encoded`` the space-joined minimum-cost piece sequence.

    Same scale shape as training: the pass runs over the DISTINCT-word
    frame with the final cost dict in the UDF closure; applying the
    segmentation to full documents is then a broadcast word->encoded
    map join (or fold this frame into a regex the way maxmatch does).
    """
    words, vocab = _em_vocab(docs, text_col, lmax, wmax, iters)
    cost = _cost_dict(vocab)
    seg = _viterbi_udf(cost, lmax)("word").alias("pieces")
    return words.select("word", seg).select(
        "word",
        F.size("pieces").cast("long").alias("n_pieces"),
        F.array_join("pieces", " ").alias("encoded"),
    )
