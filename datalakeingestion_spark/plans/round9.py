"""Round-9 queries — weighted entity resolution and the BPE trainer.

- ``entity_resolution_weighted`` — the Fellegi-Sunter half that
  ``entity_resolution_customers`` (round 8) left out: MULTI-column
  blocking (nation × market segment) and a WEIGHTED multi-field score
  (name + address edit-gated agreement, phone-prefix exact agreement,
  integer log-odds-style weights summed per pair, NULL fields contribute
  0) instead of a single-field edit gate
  (``operators/linkage.py::weighted_linkage_pairs``). Integer weights
  keep the score exact across engines, so the oracle is the identical
  CASE sum. The hot-block salting bound (``max_block``) and planted-
  flood recall behavior are pinned in tests/test_dedup.py.
- ``bpe_train_merges_k3`` — the iterative BPE merge TRAINER
  (``operators/packing.py::bpe_train``): ``bpe_pair_stats_top50``
  computes only the FIRST merge's statistics; this runs the actual loop
  (count pairs weighted by word frequency, merge the argmax pair,
  re-count) for k=3 merges over the word-frequency table. The oracle
  unrolls the same three iterations as CTEs — the separator-join word
  encoding makes each merge application a ``replace`` with identical
  left-to-right greedy semantics in Spark and DuckDB.
- ``bpe_encode_k3`` — the ENCODE half
  (``operators/packing.py::bpe_encode``): the learned merges applied to
  every document as a fold of codegen ``replace``s over a
  separator-joined whole-document symbol string — one zero-shuffle
  projection over the corpus regardless of merge count.
- ``bpe_fertility_by_lang_k3`` — the tokenizer-quality AUDIT over the
  encoder (``operators/packing.py::bpe_fertility``): pieces per word
  by language under the trained merges.
- ``dsir_weights_en_target`` / ``dsir_select_en_top100`` /
  ``dsir_resample_gumbel_top100`` — DSIR importance weights (Xie et
  al. 2023, ``operators/dsir.py``): every doc scored by
  ``ln p_en - ln p_raw`` under two add-1-smoothed hashed-
  unigram+bigram models (4096 md5-portable buckets), the
  deterministic top-k selection over that weight, and the paper's
  seeded Gumbel-top-k resample (probability ∝ exp(weight)).

Reference pendant: none — greenfield curation/tokenizer-prep operators
(SURVEY.md §2 beyond-reference set).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.fixtures import load_table
from .llm import TOKS_SQL, _h32_sql
from .registry import register

# ---------------------------------------------------------------------------
# entity_resolution_weighted
# ---------------------------------------------------------------------------

_W_NAME_EDIT, _W_NAME_AGREE, _W_NAME_DIS = 2, 24, -6
_W_BAL_AGREE, _W_BAL_DIS = 8, -3
_W_TAIL_AGREE, _W_TAIL_DIS = 4, -2
_W_MIN_SCORE = 15

# derived comparison fields (computed identically on both engines):
# bal_bucket — the account balance's 1000-unit bucket (a numeric field
# agreeing "approximately" the way real linkage compares incomes/ages);
# name_tail — the name's last 3 characters (a weak field, the phone-
# suffix stand-in the fixture schema lacks).
_WEIGHTED_SCORE_SQL = f"""
      CASE WHEN a.c_name IS NULL OR b.c_name IS NULL THEN 0
           WHEN levenshtein(a.c_name, b.c_name) <= {_W_NAME_EDIT}
           THEN {_W_NAME_AGREE} ELSE {_W_NAME_DIS} END
    + CASE WHEN a.c_acctbal IS NULL OR b.c_acctbal IS NULL THEN 0
           WHEN CAST(floor(a.c_acctbal / 1000.0) AS BIGINT)
              = CAST(floor(b.c_acctbal / 1000.0) AS BIGINT)
           THEN {_W_BAL_AGREE} ELSE {_W_BAL_DIS} END
    + CASE WHEN a.c_name IS NULL OR b.c_name IS NULL THEN 0
           WHEN right(a.c_name, 3) = right(b.c_name, 3)
           THEN {_W_TAIL_AGREE} ELSE {_W_TAIL_DIS} END
"""


@register(
    "entity_resolution_weighted",
    oracle=f"""
    SELECT id_a, id_b, score, c_nationkey, c_mktsegment FROM (
      SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
             ({_WEIGHTED_SCORE_SQL}) AS score,
             a.c_nationkey AS c_nationkey,
             a.c_mktsegment AS c_mktsegment
      FROM customer a JOIN customer b
        ON a.c_nationkey = b.c_nationkey
       AND a.c_mktsegment = b.c_mktsegment
       AND a.c_custkey < b.c_custkey
    ) WHERE score >= {_W_MIN_SCORE}
    """,
    doc="Weighted (Fellegi-Sunter-style) record linkage "
    "(operators/linkage.py::weighted_linkage_pairs): candidate pairs "
    "only within MULTI-column blocks (nation x market segment — finer "
    "blocks, quadratically fewer pairs), scored by summing INTEGER "
    "per-field agreement/disagreement weights (name edit<=2: +24/-6, "
    "acctbal 1000-bucket exact: +8/-3, name 3-char tail exact: +4/-2; "
    "NULL fields contribute 0 — missing data is no evidence), kept at "
    "score >= 15. Integer weights make the score exact, so the oracle "
    "is the identical CASE sum. One shuffle on the block key; hot "
    "blocks are boundable via max_block salting (planted-flood test in "
    "tests/test_dedup.py).",
)
def entity_resolution_weighted(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    return _weighted_customer_pairs(spark, sf_dir)


def _customer_derived(df: DataFrame) -> DataFrame:
    """The derived comparison fields — the SINGLE Spark-side source of
    the 1000-unit bucket width and 3-char tail (mirrored in
    _WEIGHTED_SCORE_SQL); every linkage plan (self-join, clusters,
    golden, incremental) must derive through here or a width tweak
    silently desynchronizes them."""
    return df.withColumn(
        "bal_bucket",
        F.floor(F.col("c_acctbal") / F.lit(1000.0)).cast("bigint"),
    ).withColumn("name_tail", F.expr("right(c_name, 3)"))


def _customer_linkage_fields():
    """The shared FieldWeight list (same single-source rationale)."""
    from ..operators.linkage import FieldWeight

    return [
        FieldWeight("c_name", _W_NAME_EDIT, _W_NAME_AGREE, _W_NAME_DIS),
        FieldWeight("bal_bucket", 0, _W_BAL_AGREE, _W_BAL_DIS),
        FieldWeight("name_tail", 0, _W_TAIL_AGREE, _W_TAIL_DIS),
    ]


def _weighted_customer_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The shared weighted-linkage pair frame: both the pair query and
    the clusters capstone MUST score the identical graph (their oracles
    share _WEIGHTED_SCORE_SQL the same way) — a weight tweak applied to
    only one copy would silently desynchronize them."""
    from ..operators.linkage import weighted_linkage_pairs

    cust = _customer_derived(load_table(spark, sf_dir, "customer"))
    return weighted_linkage_pairs(
        cust,
        "c_custkey",
        ["c_nationkey", "c_mktsegment"],
        _customer_linkage_fields(),
        min_score=_W_MIN_SCORE,
    )


@register(
    "entity_resolution_clusters",
    oracle=f"""
    WITH RECURSIVE scored AS (
      SELECT a.c_custkey AS id_a, b.c_custkey AS id_b
      FROM customer a JOIN customer b
        ON a.c_nationkey = b.c_nationkey
       AND a.c_mktsegment = b.c_mktsegment
       AND a.c_custkey < b.c_custkey
      WHERE ({_WEIGHTED_SCORE_SQL}) >= {_W_MIN_SCORE}
    ),
    edges AS (SELECT id_a AS a, id_b AS b FROM scored
              UNION ALL
              SELECT id_b, id_a FROM scored),
    reach(a, b) AS (
        SELECT a, b FROM edges
        UNION
        SELECT r.a, e.b FROM reach r JOIN edges e ON e.a = r.b
    )
    SELECT a AS doc_id, LEAST(a, MIN(b)) AS cluster_id
    FROM reach GROUP BY a
    """,
    doc="Entity-resolution CAPSTONE: the weighted Fellegi-Sunter pair "
    "graph (entity_resolution_weighted's score >= 15 matches) resolved "
    "into ENTITIES via connected components — the step that turns "
    "pairwise match decisions into deduplicated customer identities "
    "(pairwise keep-one over-merges/over-deletes when A~B~C but A!~C). "
    "Spark: min-label propagation over the match edges "
    "(operators/dedup.py::connected_components); oracle: recursive "
    "transitive closure over the identical scored pair set.",
)
def entity_resolution_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import dedup as dd

    pairs = _weighted_customer_pairs(spark, sf_dir).select(
        F.col("id_a").alias("doc_id_a"), F.col("id_b").alias("doc_id_b")
    )
    return dd.connected_components(pairs)


# ---------------------------------------------------------------------------
# bpe_train_merges_k3
# ---------------------------------------------------------------------------


def _bpe_iter_sql(i: int) -> str:
    """One unrolled BPE merge iteration: adjacent symbol pairs of m{i-1}
    weighted by word frequency, argmax with (pc DESC, lhs, rhs) ties,
    greedy left-to-right replace — byte-identical to the Spark loop."""
    prev = f"m{i - 1}"
    return f"""
    p{i} AS (SELECT list_extract(s, j) AS lhs, list_extract(s, j + 1) AS rhs,
                    cnt
             FROM (SELECT s, cnt, unnest(range(1, len(s))) AS j
                   FROM (SELECT string_split(syms, chr(31)) AS s, cnt
                         FROM {prev}))),
    b{i} AS (SELECT lhs, rhs, SUM(cnt)::BIGINT AS pc FROM p{i}
             GROUP BY 1, 2 ORDER BY pc DESC, lhs, rhs LIMIT 1),
    m{i} AS (SELECT replace(syms, b.lhs || chr(31) || b.rhs,
                            b.lhs || b.rhs) AS syms, cnt
             FROM {prev}, b{i} b)"""


# the k=3 training CTEs (w..b3) — prefix of every oracle that needs
# the learned merges
_BPE_TRAIN_CTES = f"""
    WITH w AS (SELECT unnest({TOKS_SQL}) AS word FROM documents),
    wf AS (SELECT word, COUNT(*)::BIGINT AS cnt FROM w
           WHERE NOT contains(word, chr(31)) GROUP BY 1),
    m0 AS (SELECT array_to_string(list_transform(
               range(1, length(word) + 1), i -> substr(word, i, 1)),
               chr(31)) AS syms, cnt FROM wf),
    {_bpe_iter_sql(1)},
    {_bpe_iter_sql(2)},
    {_bpe_iter_sql(3)}
"""

_BPE_ORACLE = f"""
    {_BPE_TRAIN_CTES}
    SELECT CAST(1 AS INT) AS merge_rank, lhs, rhs, lhs || rhs AS merged,
           pc AS pair_count FROM b1
    UNION ALL SELECT CAST(2 AS INT), lhs, rhs, lhs || rhs, pc FROM b2
    UNION ALL SELECT CAST(3 AS INT), lhs, rhs, lhs || rhs, pc FROM b3
"""


# applying the learned merges to the corpus: words joined by chr(30),
# symbols by chr(31); each merge is one left-to-right replace in rank
# order (merge patterns cannot straddle the word separator), then the
# separators become spaces. Identical fold on both engines. Each dN
# LEFT JOINs its merge CTE (which holds 0 or 1 rows): when the corpus
# admits fewer than k merges the empty bN must pass syms through
# unchanged — a plain cross join would collapse the WHOLE result to
# zero rows while the Spark side still returns every document.
_BPE_ENCODE_TAIL = f"""
    d0 AS (SELECT doc_id,
                  COALESCE(array_to_string(list_transform(
                      list_filter({TOKS_SQL},
                          w -> NOT contains(w, chr(31))
                           AND NOT contains(w, chr(30))),
                      w -> array_to_string(list_transform(
                          range(1, length(w) + 1), i -> substr(w, i, 1)),
                          chr(31))),
                  chr(30)), '') AS syms
           FROM documents),
    -- COALESCE: DuckDB's array_to_string([]) is NULL where Spark's
    -- array_join([]) is '' — a token-free doc must encode to (0, ''),
    -- not (NULL, NULL)
    d1 AS (SELECT doc_id,
                  CASE WHEN b.lhs IS NULL THEN syms
                       ELSE replace(syms, b.lhs || chr(31) || b.rhs,
                                    b.lhs || b.rhs) END AS syms
           FROM d0 LEFT JOIN b1 b ON TRUE),
    d2 AS (SELECT doc_id,
                  CASE WHEN b.lhs IS NULL THEN syms
                       ELSE replace(syms, b.lhs || chr(31) || b.rhs,
                                    b.lhs || b.rhs) END AS syms
           FROM d1 LEFT JOIN b2 b ON TRUE),
    d3 AS (SELECT doc_id,
                  CASE WHEN b.lhs IS NULL THEN syms
                       ELSE replace(syms, b.lhs || chr(31) || b.rhs,
                                    b.lhs || b.rhs) END AS syms
           FROM d2 LEFT JOIN b3 b ON TRUE)
"""

# per-doc piece count off the folded symbol string — shared by the
# encode and fertility oracles
_BPE_N_PIECES_SQL = """
           CASE WHEN syms = '' THEN 0
                ELSE CAST(len(regexp_split_to_array(
                    syms, chr(30) || '|' || chr(31))) AS BIGINT) END
"""

_BPE_ENCODE_ORACLE = f"""
    {_BPE_TRAIN_CTES},
    {_BPE_ENCODE_TAIL}
    SELECT doc_id,
           {_BPE_N_PIECES_SQL} AS n_pieces,
           translate(syms, chr(31) || chr(30), '  ') AS encoded
    FROM d3
"""


@register(
    "bpe_encode_k3",
    oracle=_BPE_ENCODE_ORACLE,
    doc="BPE ENCODE — apply the k=3 merges bpe_train learned to every "
    "document (operators/packing.py::bpe_encode): the whole doc is "
    "rewritten once as a separator-joined symbol string and each merge "
    "is ONE codegen replace folded in rank order (merge patterns cannot "
    "straddle the chr(30) word boundary), so encoding is a single "
    "zero-shuffle projection over the corpus regardless of merge count. "
    "Returns per-doc piece count + the space-joined piece sequence; the "
    "oracle re-derives the same merges (unrolled CTEs) and applies the "
    "identical replace fold.",
)
def bpe_encode_k3(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.packing import bpe_encode, bpe_train

    docs = load_table(spark, sf_dir, "documents")
    merges = [
        (r["merge_rank"], r["lhs"], r["rhs"])
        for r in bpe_train(docs, k=3).collect()
    ]
    return bpe_encode(docs, merges)


@register(
    "bpe_train_merges_k3",
    oracle=_BPE_ORACLE,
    doc="Iterative BPE merge trainer, k=3 merges "
    "(operators/packing.py::bpe_train): the actual BPE loop — count "
    "adjacent symbol pairs weighted by word frequency, merge the argmax "
    "pair (ties by lhs, rhs), re-count — over the word-frequency table "
    "(vocab-sized: corpus work happens ONCE). Each merge application is "
    "a single codegen replace on the separator-joined symbol encoding "
    "(left-to-right greedy, identical in Spark and DuckDB); per "
    "iteration one vocab-sized pair groupBy + TakeOrdered(1) argmax + "
    "eager localCheckpoint (the HITS bounded-iteration pattern). The "
    "oracle unrolls the same three iterations as CTEs.",
)
def bpe_train_merges_k3(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.packing import bpe_train

    docs = load_table(spark, sf_dir, "documents")
    return bpe_train(docs, k=3)


# ---------------------------------------------------------------------------
# DSIR — data selection with importance resampling (hashed n-grams)
# ---------------------------------------------------------------------------

_DSIR_B = 4096

# weights for every doc: target = English docs, raw = the rest. The
# bucket model, smoothing, 6-dp rounding and exact-decimal summation
# mirror operators/dsir.py line for line; _h32_sql is the shared
# DuckDB twin of portable_hash32 (one place to change the convention).
_DSIR_GUMBEL_H = _h32_sql("'dsir:' || doc_id::VARCHAR")

_DSIR_WEIGHTS_SQL = f"""
    WITH d AS (SELECT doc_id, lang = 'en' AS tgt, {TOKS_SQL} AS toks
               FROM documents),
    u AS (SELECT doc_id, tgt, unnest(toks) AS f FROM d),
    bg AS (SELECT doc_id, tgt,
                  unnest(list_transform(range(1, len(toks)),
                                        i -> toks[i] || ' ' || toks[i + 1]))
                      AS f
           FROM d),
    feats AS (SELECT doc_id, tgt,
                     {_h32_sql('f')} % {_DSIR_B} AS bucket
              FROM (SELECT * FROM u UNION ALL SELECT * FROM bg)),
    cnt AS (SELECT bucket,
                   SUM(CASE WHEN tgt THEN 1 ELSE 0 END)::BIGINT AS cp,
                   SUM(CASE WHEN tgt THEN 0 ELSE 1 END)::BIGINT AS cq
            FROM feats GROUP BY 1),
    tot AS (SELECT SUM(cp)::DOUBLE AS tp, SUM(cq)::DOUBLE AS tq FROM cnt),
    ratio AS (SELECT bucket,
                     CAST(round(ln((cp + 1) / (tp + {_DSIR_B}))
                                - ln((cq + 1) / (tq + {_DSIR_B})), 6)
                          AS DECIMAL(27,6)) AS lr
              FROM cnt CROSS JOIN tot),
    w AS (SELECT doc_id, COUNT(*)::BIGINT AS n_feats, SUM(lr) AS ws
          FROM feats JOIN ratio USING (bucket) GROUP BY 1)
    SELECT documents.doc_id,
           COALESCE(w.n_feats, 0)::BIGINT AS n_feats,
           COALESCE(CAST(w.ws AS DOUBLE), 0.0) AS weight
    FROM documents LEFT JOIN w USING (doc_id)
"""


def _dsir_docs(spark: SparkSession, sf_dir: str):
    return load_table(spark, sf_dir, "documents")


@register(
    "dsir_weights_en_target",
    oracle=_DSIR_WEIGHTS_SQL,
    doc="DSIR importance weight per document (Xie et al. 2023, "
    "arXiv:2302.03169; operators/dsir.py::dsir_logratio_weights): "
    "ln p_target - ln p_raw under two add-1-smoothed bag-of-hashed-"
    "ngram models (unigrams + bigrams, 4096 md5-portable buckets; "
    "target = lang='en' docs, raw = the rest) — the published "
    "cross-corpus data-selection score the self-LM quality scores "
    "can't express. ONE groupBy builds both models (conditional sums), "
    "the 4096-row log-ratio table broadcasts, one per-doc groupBy sums "
    "6-dp-rounded ratios as exact decimals (partitioning-independent). "
    "Docs with no features keep a (0, 0.0) row.",
)
def dsir_weights_en_target(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dsir import dsir_logratio_weights

    docs = _dsir_docs(spark, sf_dir)
    return dsir_logratio_weights(
        docs, F.col("lang") == "en", n_buckets=_DSIR_B
    )


@register(
    "dsir_select_en_top100",
    oracle=f"""
    SELECT * FROM ({_DSIR_WEIGHTS_SQL})
    ORDER BY weight DESC, doc_id LIMIT 100
    """,
    doc="The selection half of DSIR (operators/dsir.py::"
    "dsir_select_topk): top-100 most-English-like docs by the "
    "importance weight, ties by doc_id — compiles to "
    "TakeOrderedAndProject (per-partition heaps + 100-row driver "
    "merge), never a single-partition global sort. The paper's "
    "Gumbel-noise resampling is a seeded weighted sample over the "
    "same weights; the deterministic top-k is the engine primitive.",
)
def dsir_select_en_top100(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dsir import dsir_select_topk

    docs = _dsir_docs(spark, sf_dir)
    return dsir_select_topk(
        docs, F.col("lang") == "en", k=100, n_buckets=_DSIR_B
    )


@register(
    "dsir_resample_gumbel_top100",
    oracle=f"""
    SELECT doc_id, n_feats, weight, gumbel_key FROM (
      SELECT *,
             round(weight + round(-ln(-ln(
                 ({_DSIR_GUMBEL_H} + 1) / 4294967297.0)), 6), 6)
                 AS gumbel_key
      FROM ({_DSIR_WEIGHTS_SQL})
    ) ORDER BY gumbel_key DESC, doc_id LIMIT 100
    """,
    doc="DSIR's actual selection rule (operators/dsir.py::"
    "dsir_resample_gumbel): Gumbel-top-k — sample 100 docs without "
    "replacement with probability proportional to exp(weight) by "
    "ranking weight + Gumbel(0,1) noise. The noise is SEEDED and "
    "engine-portable (u from the md5-portable hash of seed:doc_id "
    "mapped into the open unit interval, g = -ln(-ln(u)) rounded to "
    "6 dp), so the draw is reproducible row-for-row across engines "
    "and reruns — vary the seed for a fresh draw. Keeps the diversity "
    "tail hard-thresholding loses; plans as TakeOrderedAndProject "
    "like the deterministic top-k.",
)
def dsir_resample_gumbel_top100(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.dsir import dsir_resample_gumbel

    docs = _dsir_docs(spark, sf_dir)
    return dsir_resample_gumbel(
        docs, F.col("lang") == "en", k=100, seed="dsir", n_buckets=_DSIR_B
    )


@register(
    "bpe_fertility_by_lang_k3",
    oracle=f"""
    {_BPE_TRAIN_CTES},
    {_BPE_ENCODE_TAIL},
    enc AS (SELECT doc_id, {_BPE_N_PIECES_SQL} AS n_pieces FROM d3),
    wd AS (SELECT doc_id, lang,
                  CAST(len(list_filter({TOKS_SQL},
                      w -> NOT contains(w, chr(31))
                       AND NOT contains(w, chr(30)))) AS BIGINT) AS n_words
           FROM documents)
    SELECT lang, COUNT(*)::BIGINT AS n_docs,
           SUM(n_words)::BIGINT AS n_words,
           SUM(n_pieces)::BIGINT AS n_pieces,
           CASE WHEN SUM(n_words) = 0 THEN NULL
                ELSE round(SUM(n_pieces)::DOUBLE / SUM(n_words), 6) END
               AS fertility
    FROM wd JOIN enc USING (doc_id)
    GROUP BY lang
    """,
    doc="Tokenizer FERTILITY by language under the k=3 trained merges "
    "(operators/packing.py::bpe_fertility): pieces per word per lang — "
    "the standard tokenizer-quality audit (a tokenizer trained on the "
    "pooled corpus fragments under-represented languages into more "
    "pieces per word; fertility quantifies that tax before committing "
    "a corpus to the tokenizer). One zero-shuffle projection computes "
    "per-doc word and piece counts, one tiny groupBy(lang) sums exact "
    "integers; the ratio of two exact sums is partitioning-independent "
    "and rounded to 6 dp on both engines.",
)
def bpe_fertility_by_lang_k3(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.packing import bpe_fertility, bpe_train

    docs = load_table(spark, sf_dir, "documents")
    merges = [
        (r["merge_rank"], r["lhs"], r["rhs"])
        for r in bpe_train(docs, k=3).collect()
    ]
    return bpe_fertility(docs, merges, by_col="lang")
