"""Round-2 continuation queries: corpus-LM scoring, TF-IDF keywords,
auto-threshold repetition filtering, dedup representative selection,
the exact kNN graph, and an event-funnel rollup.

Same contract as plans/llm.py: each Spark query has an ANSI-SQL DuckDB
twin generated from the SAME constants, aggregates are aliased
identically on both sides, and anything summed in floating point is
either rounded to 6 dp per-element and summed as exact decimals or
rounded after an order-independent reduction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import dedup as dd
from ..operators import similarity as sim
from ..operators import text_analysis as ta
from ..sources.fixtures import load_table
from .llm import TOKS_SQL, _minhash_pairs_ctes, _shingles_all_sql
from .registry import register

# ---------------------------------------------------------------------------
# Corpus-model text scoring
# ---------------------------------------------------------------------------


@register(
    "unigram_logprob_score",
    oracle=f"""
    WITH t AS (SELECT doc_id, unnest({TOKS_SQL}) AS tok FROM documents),
    tf AS (SELECT tok, COUNT(*) AS tf FROM t GROUP BY 1),
    tot AS (SELECT SUM(tf)::DOUBLE AS total FROM tf),
    j AS (SELECT doc_id,
                 CAST(round(ln(tf / total), 6) AS DECIMAL(27,6)) AS lp
          FROM t JOIN tf USING (tok) CROSS JOIN tot)
    SELECT doc_id, COUNT(*)::BIGINT AS n_tokens,
           round(CAST(SUM(lp) AS DOUBLE) / COUNT(*), 6) AS mean_logprob
    FROM j GROUP BY doc_id
    """,
    doc="Perplexity-proxy quality score: per-doc mean log-prob under the "
    "corpus's own unigram LM (CCNet-style). Vocabulary pass + broadcast "
    "scoring pass; per-token log-probs rounded to 6 dp and summed as "
    "exact decimals so the mean is partitioning-independent.",
)
def unigram_logprob_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return ta.unigram_logprob(docs)


@register(
    "tfidf_top_terms",
    oracle=f"""
    WITH t AS (SELECT doc_id, unnest({TOKS_SQL}) AS tok FROM documents),
    per AS (SELECT doc_id, tok, COUNT(*) AS tf FROM t GROUP BY 1, 2),
    dfreq AS (SELECT tok, COUNT(*) AS df FROM per GROUP BY 1),
    nd AS (SELECT COUNT(*)::DOUBLE AS n FROM documents),
    s AS (SELECT doc_id, tok AS token,
                 round(tf * round(ln(n / df), 6), 6) AS tfidf
          FROM per JOIN dfreq USING (tok) CROSS JOIN nd),
    r AS (SELECT doc_id, token, tfidf,
                 row_number() OVER (PARTITION BY doc_id
                                    ORDER BY tfidf DESC, token) AS term_rank
          FROM s)
    SELECT doc_id, token, tfidf, term_rank FROM r WHERE term_rank <= 3
    """,
    doc="Top-3 characteristic terms per doc by TF-IDF. One explicit "
    "repartition(tok) feeds the term-frequency aggregate, the doc-"
    "frequency aggregate, AND their join (hash(tok) clusters (tok, doc) "
    "too) — the exploded token stream shuffles once; only the final "
    "per-doc top-k window re-shuffles on doc_id.",
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return ta.tfidf_top_terms(docs, k=3)


@register(
    "text_repetition_filter_auto",
    oracle=f"""
    WITH base AS (SELECT doc_id, {_shingles_all_sql(3)} AS s3,
                         {_shingles_all_sql(2)} AS s2
                  FROM documents),
    u AS (SELECT doc_id, unnest(s2) AS g FROM base),
    cnt AS (SELECT doc_id, g, COUNT(*) AS c FROM u GROUP BY 1, 2),
    top AS (SELECT doc_id, MAX(c) AS mx, SUM(c) AS tot FROM cnt GROUP BY 1),
    m AS (SELECT b.doc_id,
            CASE WHEN len(s3) > 0
                 THEN (len(s3) - len(list_distinct(s3)))::DOUBLE / len(s3)
                 ELSE 0.0 END AS dup_3gram_frac,
            CASE WHEN COALESCE(tot, 0) > 0 AND mx > 1 THEN mx::DOUBLE / tot
                 ELSE 0.0 END AS top_2gram_frac
          FROM base b LEFT JOIN top t ON t.doc_id = b.doc_id),
    hb AS (SELECT round(quantile_cont(dup_3gram_frac, 0.9), 6) AS d3_hi,
                  round(quantile_cont(top_2gram_frac, 0.9), 6) AS t2_hi
           FROM m)
    SELECT doc_id, dup_3gram_frac, top_2gram_frac,
           (dup_3gram_frac <= d3_hi AND top_2gram_frac <= t2_hi) AS keep
    FROM m, hb
    """,
    doc="Repetition filter with corpus-calibrated thresholds: keep docs "
    "at/below the p90 of BOTH repetition signals instead of the fixed "
    "0.05 cutoffs (which rot as the corpus mix changes). Metrics stay "
    "zero-shuffle per-doc arithmetic; the percentile pass is one scalar "
    "aggregate (approx_percentile at 100 TB, same shape).",
)
def text_repetition_filter_auto(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return ta.repetition_metrics_auto(docs, q=0.9)


# ---------------------------------------------------------------------------
# Dedup decision + kNN graph
# ---------------------------------------------------------------------------


@register(
    "dedup_keep_best",
    oracle=f"""
    WITH RECURSIVE {_minhash_pairs_ctes(0.5)},
    edges AS (SELECT doc_id_a AS a, doc_id_b AS b FROM pairs
              UNION ALL
              SELECT doc_id_b, doc_id_a FROM pairs),
    reach(a, b) AS (
        SELECT a, b FROM edges
        UNION
        SELECT r.a, e.b FROM reach r JOIN edges e ON e.a = r.b
    ),
    labels AS (SELECT a AS doc_id, LEAST(a, MIN(b)) AS cluster_id
               FROM reach GROUP BY a),
    alldocs AS (SELECT d.doc_id,
                       COALESCE(l.cluster_id, d.doc_id) AS cluster_id,
                       d.n_chars
                FROM documents d LEFT JOIN labels l ON l.doc_id = d.doc_id),
    r AS (SELECT doc_id, cluster_id,
                 row_number() OVER (PARTITION BY cluster_id
                                    ORDER BY n_chars DESC, doc_id) AS rn
          FROM alldocs)
    SELECT doc_id, cluster_id, (rn = 1) AS keep FROM r
    """,
    doc="The dedup DECISION: LSH pairs -> connected components -> keep the "
    "highest-quality (n_chars, tie: min id) member per cluster; docs in "
    "no pair are singletons and kept. One corpus-vs-labels left join + "
    "one per-cluster window (clusters are near-dup neighborhoods, so "
    "partitions stay tiny at any corpus size).",
)
def dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    pairs = dd.minhash_near_duplicates(docs, threshold=0.5)
    labels = dd.connected_components(pairs)
    return dd.keep_best_per_cluster(docs, labels, quality_col="n_chars")


@register(
    "knn_graph_topk",
    oracle="""
    WITH e AS (SELECT vec_id, embedding FROM embeddings),
    norms AS (SELECT vec_id, sqrt(s) AS nrm FROM
                (SELECT vec_id, SUM(x * x) AS s FROM
                   (SELECT vec_id, unnest(embedding)::DOUBLE AS x FROM e)
                 GROUP BY vec_id)),
    dots AS (SELECT q_id, c_id, SUM(qx * cx) AS dot FROM
               (SELECT q.vec_id AS q_id, c.vec_id AS c_id,
                       unnest(q.embedding)::DOUBLE AS qx,
                       unnest(c.embedding)::DOUBLE AS cx
                FROM e q JOIN e c ON q.vec_id <> c.vec_id)
             GROUP BY q_id, c_id),
    scored AS (SELECT q_id AS query_id, c_id AS neighbor_id,
                      round(dot / (nq.nrm * nc.nrm), 6) AS cosine
               FROM dots JOIN norms nq ON nq.vec_id = q_id
                         JOIN norms nc ON nc.vec_id = c_id)
    SELECT query_id, neighbor_id, cosine FROM
      (SELECT query_id, neighbor_id, cosine,
              row_number() OVER (PARTITION BY query_id
                                 ORDER BY cosine DESC, neighbor_id) AS rn
       FROM scored)
    WHERE rn <= 5
    """,
    doc="EXACT cosine 5-NN graph over the whole embedding corpus (every "
    "vector a query) — the SemDeDup/diversity-sampling substrate. Block "
    "matmul (one BLAS X@Yᵀ per block pair, vectors ship O(n²/B)); each "
    "task emits local top-k, a final window takes the global top-k. The "
    "oracle is the all-pairs ground truth.",
)
def knn_graph_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return sim.knn_graph(emb, k=5, block_size=128)


# ---------------------------------------------------------------------------
# Event funnel
# ---------------------------------------------------------------------------


@register(
    "funnel_conversion_1h",
    oracle="""
    WITH v AS (SELECT user_id, MIN(ts) AS first_view
               FROM events WHERE event_type = 'view' GROUP BY 1),
    p AS (SELECT e.user_id, MIN(e.ts) AS first_purchase
          FROM events e JOIN v ON v.user_id = e.user_id
          WHERE e.event_type = 'purchase' AND e.ts >= v.first_view
          GROUP BY 1)
    SELECT v.user_id, v.first_view, p.first_purchase,
           COALESCE(p.first_purchase <= v.first_view + INTERVAL 1 HOUR,
                    FALSE) AS converted_1h
    FROM v LEFT JOIN p ON p.user_id = v.user_id
    """,
    doc="Two-step funnel (view -> purchase within 1 h), the product-"
    "analytics staple, as ONE LINEAR PIPELINE: a per-user window "
    "computes the first view, then one conditional aggregate takes the "
    "earliest qualifying purchase — the event stream shuffles exactly "
    "once on user_id (the aggregate reuses the window's exchange). The "
    "equivalent two-aggregates-plus-joins form scans and shuffles the "
    "events three times and broadcasts a per-user frame that grows with "
    "the user base — measured before rewriting.",
)
def funnel_conversion_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts"
    )
    w = Window.partitionBy("user_id")
    first_view = F.min(
        F.when(F.col("event_type") == "view", F.col("ts"))
    ).over(w)
    return (
        ev.withColumn("first_view", first_view)
        .filter(F.col("first_view").isNotNull())
        .groupBy("user_id")
        .agg(
            F.min("first_view").alias("first_view"),
            F.min(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("ts") >= F.col("first_view")),
                    F.col("ts"),
                )
            ).alias("first_purchase"),
        )
        .select(
            "user_id",
            "first_view",
            "first_purchase",
            F.coalesce(
                F.col("first_purchase")
                <= F.col("first_view") + F.expr("INTERVAL 1 HOUR"),
                F.lit(False),
            ).alias("converted_1h"),
        )
    )
