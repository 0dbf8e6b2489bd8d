"""DSIR — Data Selection with Importance Resampling (hashed n-grams).

Xie et al., "Data Selection for Language Models via Importance
Resampling" (NeurIPS 2023, public arXiv:2302.03169): score every raw
document by how target-domain-like its hashed n-gram profile is —
``log p_target(x) - log p_raw(x)`` under two bag-of-hashed-ngram
models — then select by that importance weight. It is THE published
method for "give me web data that looks like Wikipedia/books" at
pretraining scale, and the missing cross-corpus counterpart to the
self-LM scores in ``operators/text_analysis.py`` (unigram/bigram/
trigram log-prob score the doc under the corpus's OWN distribution;
DSIR contrasts two corpora).

Spark-first shape, built for the 100 TB case:

1. one projection explodes each doc's unigram + bigram features and
   buckets them with the md5-portable 32-bit hash modulo ``n_buckets``
   (hashing IS the model's dimensionality bound — the parameter table
   can never exceed ``n_buckets`` rows no matter the corpus);
2. ONE groupBy over the feature stream builds both models at once
   (conditional sums on the target flag) — ``n_buckets`` rows out, so
   the smoothed log-ratio table broadcasts everywhere;
3. a broadcast join scores the same exploded stream and one groupBy
   per doc sums the per-feature log-ratios — rounded to 6 dp and
   summed as exact decimals, so the weight is partitioning-independent
   and byte-comparable against the ANSI oracle.

Two corpus passes over the token stream, zero all-pairs, zero
data-sized state on the driver. Selection comes in both flavors: the
deterministic top-k (:func:`dsir_select_topk`) and the paper's actual
Gumbel-top-k resampling (:func:`dsir_resample_gumbel`) with SEEDED
md5-portable noise — both ``TakeOrderedAndProject``-shaped.

Reference pendant: none — greenfield curation operator (SURVEY.md §2
beyond-reference set).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import portable_hash32
from ..functions.text import tokens, word_shingles


def dsir_logratio_weights(
    docs: DataFrame,
    is_target: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 4096,
) -> DataFrame:
    """Per-document DSIR importance weight: the sum over the doc's
    hashed unigram+bigram feature occurrences of
    ``ln p_target(bucket) - ln p_raw(bucket)``, both models add-1
    smoothed over ``n_buckets`` hash buckets. ``is_target`` is a
    boolean Column marking the target-domain rows INSIDE ``docs`` (the
    classic setup scores the raw pool against a curated slice of the
    same lake; pass a literal-joined flag to contrast two tables).

    Returns (doc_id, n_feats, weight) for EVERY input doc — a doc with
    no features (empty/symbol-only text) keeps a row with
    ``(0, 0.0)`` rather than silently vanishing. Positive weight =
    more target-like than raw-like. Per-feature log-ratios are rounded
    to 6 dp and summed as exact DECIMAL so the result is
    partitioning-independent (same discipline as the LM scores).
    """
    if n_buckets < 2:
        raise ValueError("n_buckets must be >= 2")
    toks = tokens(text_col)
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        is_target.alias("_tgt"),
        F.concat(toks, word_shingles(toks, 2)).alias("_feats"),
    )
    # explode_OUTER: a doc with no features keeps one NULL-bucket row,
    # so the final per-doc aggregate covers every input doc and no
    # corpus-sized join-back against `docs` is needed to restore the
    # (0, 0.0) rows
    feats = base.select(
        "doc_id",
        "_tgt",
        F.explode_outer("_feats").alias("_f"),
    ).select(
        "doc_id",
        "_tgt",
        F.pmod(portable_hash32(F.col("_f")), F.lit(n_buckets)).alias(
            "bucket"
        ),
    )
    # localCheckpoint (lazy, n_buckets rows): `cnt` feeds BOTH the
    # totals aggregate and the per-bucket ratios — without it each
    # reuse re-runs the corpus-sized model pass, turning two corpus
    # passes into three
    cnt = (
        feats.filter(F.col("bucket").isNotNull())
        .groupBy("bucket")
        .agg(
            F.sum(F.when(F.col("_tgt"), 1).otherwise(0)).alias("cp"),
            F.sum(F.when(F.col("_tgt"), 0).otherwise(1)).alias("cq"),
        )
        .localCheckpoint(eager=False)
    )
    tot = cnt.agg(
        F.sum("cp").cast("double").alias("tp"),
        F.sum("cq").cast("double").alias("tq"),
    )
    ratio = (
        cnt.crossJoin(F.broadcast(tot))
        .select(
            "bucket",
            F.round(
                F.log((F.col("cp") + 1) / (F.col("tp") + n_buckets))
                - F.log((F.col("cq") + 1) / (F.col("tq") + n_buckets)),
                6,
            )
            .cast("decimal(27,6)")
            .alias("lr"),
        )
    )
    # LEFT join: every non-NULL bucket has a ratio row by construction
    # (ratio covers exactly the buckets cnt saw), so left==inner for
    # real features — the left form only carries the NULL-bucket rows
    # of feature-less docs through to the aggregate
    return (
        feats.join(F.broadcast(ratio), "bucket", "left")
        .groupBy("doc_id")
        .agg(
            F.count("bucket").cast("long").alias("n_feats"),
            F.coalesce(F.sum("lr").cast("double"), F.lit(0.0)).alias(
                "weight"
            ),
        )
    )


def dsir_select_topk(
    docs: DataFrame,
    is_target: Column,
    k: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 4096,
) -> DataFrame:
    """The selection half: top-``k`` most target-like docs by DSIR
    weight, ties broken by doc_id — deterministic, and the global
    order-by-limit compiles to ``TakeOrderedAndProject`` (per-partition
    heaps + a k-row driver merge), never a single-partition sort. The
    paper's Gumbel-noise resampling is equivalent to a weighted
    sample; this deterministic top-k is the engine primitive both it
    and any seeded variant rank against."""
    if k < 1:
        raise ValueError("k must be >= 1")
    return (
        dsir_logratio_weights(
            docs, is_target, text_col, id_col, n_buckets
        )
        .orderBy(F.col("weight").desc(), "doc_id")
        .limit(k)
    )


#: Denominator mapping the 32-bit portable hash onto (0, 1): with
#: u = (h + 1) / 2^32+1 and h in [0, 2^32), u is strictly inside the
#: open interval, so -ln(-ln(u)) is always finite.
_GUMBEL_DEN = float(2**32 + 1)


def dsir_resample_gumbel(
    docs: DataFrame,
    is_target: Column,
    k: int,
    seed: str = "dsir",
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 4096,
) -> DataFrame:
    """The paper's actual selection rule: sample ``k`` docs WITHOUT
    replacement with probability proportional to ``exp(weight)`` via
    the Gumbel-top-k trick — ``key = weight + Gumbel(0,1)``, take the
    k largest keys. Unlike :func:`dsir_select_topk` this keeps a
    diversity tail (low-weight docs still win occasionally), which is
    why DSIR resamples instead of hard-thresholding.

    The Gumbel noise is SEEDED and engine-portable: ``u`` derives from
    the md5-portable hash of ``seed || ':' || doc_id`` mapped into the
    open unit interval, ``g = -ln(-ln(u))`` rounded to 6 dp — the same
    determinism discipline as every hash-threshold sampler in
    ``operators/sampling.py`` (reruns and engines agree row-for-row;
    vary ``seed`` for a fresh draw). Returns
    (doc_id, n_feats, weight, gumbel_key) for the k selected docs;
    global order-by-limit compiles to ``TakeOrderedAndProject``.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    if ":" in seed:
        # 'a:1' + doc 2 must never collide with 'a' + doc 12
        raise ValueError("seed must not contain ':'")
    w = dsir_logratio_weights(docs, is_target, text_col, id_col, n_buckets)
    u = (
        portable_hash32(
            F.concat(F.lit(seed + ":"), F.col("doc_id").cast("string"))
        )
        + 1
    ) / F.lit(_GUMBEL_DEN)
    g = F.round(-F.log(-F.log(u)), 6)
    return (
        w.withColumn("gumbel_key", F.round(F.col("weight") + g, 6))
        .orderBy(F.col("gumbel_key").desc(), "doc_id")
        .limit(k)
    )


def dsir_logratio_weights_vs(
    raw_docs: DataFrame,
    target_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 4096,
) -> DataFrame:
    """Two-corpus form of :func:`dsir_logratio_weights` — the paper's
    classic setup: score every ``raw_docs`` document against a SEPARATE
    curated ``target_docs`` corpus (Wikipedia/books vs the web pool),
    instead of flagging a slice inside one frame.

    Both models are still built in ONE pass over the tagged union
    (target rows contribute to p, raw rows to q), and only the raw
    side's scores are returned — target ids never collide with raw ids
    because the target rows are tagged out before the final aggregate,
    so the two frames may even share id values. Same return contract
    as the one-frame form: (doc_id, n_feats, weight) for every raw
    doc.
    """
    raw = raw_docs.select(
        F.col(id_col).alias(id_col),
        F.col(text_col).alias(text_col),
        F.lit(False).alias("_dsir_tgt"),
    )
    tgt = target_docs.select(
        F.col(id_col).alias(id_col),
        F.col(text_col).alias(text_col),
        F.lit(True).alias("_dsir_tgt"),
    )
    # the per-doc aggregate keys on the id — tag it with the side so a
    # target id that collides with a raw id cannot merge their rows
    both = raw.unionByName(tgt).withColumn(
        id_col, F.struct("_dsir_tgt", id_col)
    )
    w = dsir_logratio_weights(
        both, F.col("_dsir_tgt"), text_col, id_col, n_buckets
    )
    return (
        w.filter(~F.col("doc_id._dsir_tgt"))
        .select(
            F.col(f"doc_id.{id_col}").alias("doc_id"),
            "n_feats",
            "weight",
        )
    )


def dsir_select_topk_vs(
    raw_docs: DataFrame,
    target_docs: DataFrame,
    k: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 4096,
) -> DataFrame:
    """Selection over the two-corpus form: top-``k`` raw docs most like
    the separate ``target_docs`` corpus, ties by doc_id — the call a
    real mixing pipeline makes ("give me the k web docs closest to
    Wikipedia"). Same ``TakeOrderedAndProject`` shape as
    :func:`dsir_select_topk` (per-partition heaps + a k-row driver
    merge, never a single-partition global sort)."""
    if k < 1:
        raise ValueError("k must be >= 1")
    return (
        dsir_logratio_weights_vs(
            raw_docs, target_docs, text_col, id_col, n_buckets
        )
        .orderBy(F.col("weight").desc(), "doc_id")
        .limit(k)
    )
