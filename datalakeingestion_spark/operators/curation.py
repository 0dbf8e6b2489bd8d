"""Corpus curation pipeline — the end-to-end training-data flow.

Composes the LLM-data operators into the standard curation sequence a
100 TB text pipeline runs before training:

    1. exact dedup        — keep the min-id doc per md5(text) group
    2. near-dedup         — drop the higher-id side of every verified
                            MinHash-LSH near-duplicate pair
    3. quality filter     — minimum token count + type-token-ratio band
    4. language filter    — keep docs whose stopword heuristic matches
                            the requested languages (or 'unknown' if
                            allowed)

Every stage is a DataFrame transform over the previous stage's survivors;
nothing materializes to the driver. Stage costs at scale: one 16-byte-key
shuffle (exact), the LSH pipeline (bounded candidates), then two
shuffle-free codegen filters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens
from .dedup import exact_duplicates, minhash_near_duplicates
from .text_analysis import LANGS, STOPWORDS, _lang_pred_cascade


def _pin_once(col: F.Column) -> F.Column:
    """Value-preserving evaluate-once pin for an expensive expression
    (r12, guide §4.4 applied to built-ins): wraps ``col`` in a CASE
    WHEN on a nondeterministic no-op (``spark_partition_id() >= 0``,
    always true), so the value is untouched but the enclosing alias is
    nondeterministic — Catalyst's filter pushdown
    (PushPredicateThroughNonJoin) and CollapseProject both require
    every projected field to be deterministic, so neither may inline
    the alias into downstream predicates/projections. Without the pin
    a filter over derived columns re-expands the full expression tree
    at every reference and pushes it below the staging projection
    (measured on curate: the tokenize chain re-inlined ~40× per row).
    A plain extra nondeterministic column does NOT work: column
    pruning strips it before the pushdown check runs."""
    return F.when(F.spark_partition_id() >= 0, col)


def curate(
    docs: DataFrame,
    near_dup_threshold: float = 0.5,
    min_tokens: int = 10,
    min_ttr: float = 0.05,
    keep_langs: tuple[str, ...] = ("en", "unknown"),
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Returns the curated docs (original columns) + per-doc quality cols."""
    # 1. exact dedup: survivors are each hash group's min id
    keepers = exact_duplicates(docs, text_col, id_col).select(
        F.col("keep_doc_id").alias(id_col)
    )
    # each stage frontier feeds several consumers (minhash internals, the
    # anti-join, quality and language joins) — persist so the semi-join and
    # tokenization run once per stage, not once per consumer
    stage1 = docs.join(keepers, id_col, "left_semi").persist()

    # 2. near-dedup: drop the b-side of each verified near-dup pair.
    # prefilter=False: inside the pipeline the pair frame only feeds one
    # anti-join and the shingle table is already a shared hot cache —
    # the verify's semi-join slice measured SLOWER here while winning
    # 2.8× standalone (see minhash_near_duplicates' docstring)
    pairs = minhash_near_duplicates(
        stage1,
        threshold=near_dup_threshold,
        text_col=text_col,
        id_col=id_col,
        prefilter=False,
    )
    drop = pairs.select(F.col("doc_id_b").alias(id_col)).distinct()
    # persist the survivor frontier: the near-dup verification above it is
    # the pipeline's expensive stage, and downstream consumers (repeated
    # materializations, derived exports) re-read survivors, not candidates
    stage2 = stage1.join(drop, id_col, "left_anti").persist()

    # 3+4. quality + language filters evaluated INLINE — chained per-row
    # projections, so this tail adds ZERO shuffles/joins. r12: the
    # tokenize chain is staged ONCE as a pinned _toks column (see
    # _pin_once) — the previous shape materialized hit-count columns,
    # but filter pushdown substituted those aliases back into the
    # predicate and pushed the fully re-expanded tokenize chain (~40
    # copies per row) below the projections and into the stage2 cache
    # scan. With the pin the filter stays above the staging projection
    # and every predicate references the shared token array. Same
    # formulas over the same tokens: results identical (oracle-pinned).
    staged = stage2.select(
        "*", _pin_once(tokens(text_col)).alias("_toks")
    )
    t = F.col("_toks")
    n = F.size(t)
    nd = F.size(F.array_distinct(t))
    hit_cols = [f"__hits_{lang}" for lang in LANGS]

    def _contains(lst):
        # closure factory: a default-arg lambda would look like a 2-arg
        # (element, index) lambda to F.filter
        return lambda tok: F.array_contains(lst, tok)

    stage3 = staged.select(
        "*",
        n.alias("n_tokens"),
        F.round(nd / n, 6).alias("ttr"),
        F.round(
            (nd / n) * F.least(F.lit(1.0), n / F.lit(50.0)), 6
        ).alias("quality_score"),
        *[
            F.size(
                F.filter(
                    t,
                    _contains(
                        F.array(*[F.lit(w) for w in STOPWORDS[lang]])
                    ),
                )
            ).alias(c)
            for lang, c in zip(LANGS, hit_cols)
        ],
    )
    pred = _lang_pred_cascade(
        {lang: F.col(c) for lang, c in zip(LANGS, hit_cols)}
    )
    return (
        stage3.withColumn("predicted_lang", pred)
        .filter(
            (F.col("n_tokens") >= min_tokens)
            & (F.col("ttr") >= min_ttr)
            & F.col("predicted_lang").isin(*keep_langs)
        )
        .drop(*hit_cols, "_toks")
    )


def curate_v2(
    docs: DataFrame,
    containment_threshold: float = 0.8,
    cdc_max_shared: float = 0.5,
    lm_percentile: float = 0.1,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Second-generation curation flow — the structural-duplication and
    fluency sequence that complements :func:`curate`'s dedup/quality
    stages:

        1. containment rejection — drop the SMALLER doc of every
           verified containment pair (excerpts lose to their source);
        2. CDC boilerplate rejection — drop docs whose content-defined
           chunks are > ``cdc_max_shared`` shared verbatim with other
           survivors;
        3. bigram-LM fluency gate — keep docs scoring at or above the
           survivor corpus's own ``lm_percentile`` mean log-prob
           (docs with < 2 tokens have no score and drop);
        4. model-based quality gate — logistic classifier keep.

    Stage costs: the containment prefix-filter join, the CDC hash
    aggregate + join, one bigram model pass, then a zero-shuffle scored
    projection. Survivor frontiers are eagerly localCheckpoint'd between
    stages (each feeds the next stage's model AND its semi-join) — a
    plain persist kept the full logical lineage, and because every stage
    references the previous frontier 2-3 times the composed tree grew
    EXPONENTIALLY (measured: the assembled plan held ~4.5k Exchange
    references and fn()+first() took 36 s at sf0.001 with the data work
    itself under 2 s; checkpoint truncation makes planning linear in the
    stage count). The checkpoint also guarantees the percentile cut
    below and the delivered rows score the SAME materialized survivors,
    the same double-consumption argument as keyed_prefix_sum's.
    """
    from .dedup import cdc_shared_chunks, containment_join
    from .text_analysis import bigram_logprob, quality_logistic

    # scale-adaptive partition count for the checkpointed frontiers —
    # checkpoint captures the RDD before AQE's final coalescing, so a
    # bare 200-partition session otherwise materializes near-empty
    # blocks per stage (r13, the graph-sweep pattern)
    npart = docs.sparkSession.sparkContext.defaultParallelism
    pairs = containment_join(
        docs, threshold=containment_threshold, text_col=text_col, id_col=id_col
    )
    drop1 = pairs.select(F.col("doc_id_small").alias(id_col)).distinct()
    s1 = docs.join(drop1, id_col, "left_anti").coalesce(
        npart
    ).localCheckpoint(eager=True)

    cdc = cdc_shared_chunks(s1, avg_chunk=8, text_col=text_col, id_col=id_col)
    drop2 = cdc.filter(F.col("shared_frac") > cdc_max_shared).select(id_col)
    s2 = s1.join(drop2, id_col, "left_anti").coalesce(
        npart
    ).localCheckpoint(eager=True)

    lm = bigram_logprob(s2, text_col=text_col).coalesce(
        npart
    ).localCheckpoint(eager=True)
    p_lo = float(
        lm.agg(
            F.percentile("mean_logprob", F.lit(lm_percentile)).alias("p")
        ).first()["p"]
    )
    s3 = s2.join(
        lm.filter(F.col("mean_logprob") >= p_lo).select(
            id_col, "mean_logprob"
        ),
        id_col,
    )
    ql = quality_logistic(s3, text_col=text_col).filter(F.col("keep")).select(
        id_col, "quality_prob"
    )
    return s3.join(ql, id_col)
