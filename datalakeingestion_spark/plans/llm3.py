"""Round-2 continuation queries, part 3: keyword retrieval (BM25).

Same contract as plans/llm.py / llm2.py: the DuckDB oracle is generated
from the SAME constants as the Spark plan, aggregates are aliased
identically on both sides, and every floating-point quantity that feeds a
comparison or a sum is rounded to 6 dp at the same point in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import dedup as dd
from ..operators import similarity as sim
from ..operators import text_analysis as ta
from ..sources.fixtures import load_table
from .llm import TOKS_SQL, _shingles_sql
from .registry import register

BM25_TERMS = ("spark", "join", "stream")
BM25_K = 20
BM25_K1 = 1.2
BM25_B = 0.75


def _bm25_oracle(terms: tuple[str, ...], k: int, k1: float, b: float) -> str:
    """DuckDB twin of text_analysis.bm25_rank, arithmetic mirrored
    operation-for-operation (ln rounded to 6 dp, per-term contribution
    rounded to 6 dp, total rounded to 6 dp; ties break on doc_id)."""
    tf_cols = ",\n           ".join(
        f"len(list_filter(toks, t -> t = '{w}')) AS tf{i}"
        for i, w in enumerate(terms)
    )
    df_cols = ",\n           ".join(
        f"SUM((tf{i} > 0)::BIGINT) AS df{i}" for i in range(len(terms))
    )
    contribs = " + ".join(
        f"round(round(ln((n - df{i} + 0.5) / (df{i} + 0.5) + 1.0), 6)"
        f" * (tf{i} * {k1 + 1.0}) / "
        f"(tf{i} + {k1} * ({1.0 - b} + {b} * dl / (sdl::DOUBLE / n))), 6)"
        for i in range(len(terms))
    )
    return f"""
    WITH base AS (SELECT doc_id, {TOKS_SQL} AS toks FROM documents),
    stats AS (SELECT doc_id, len(toks) AS dl,
           {tf_cols}
        FROM base),
    corpus AS (SELECT COUNT(*)::BIGINT AS n, SUM(dl)::BIGINT AS sdl,
           {df_cols}
        FROM stats),
    scored AS (SELECT doc_id, round({contribs}, 6) AS score
               FROM stats CROSS JOIN corpus),
    r AS (SELECT doc_id, score,
                 row_number() OVER (ORDER BY score DESC, doc_id) AS rn
          FROM scored)
    SELECT doc_id, score, rn AS "rank" FROM r WHERE rn <= {k}
    """


@register(
    "bm25_rank",
    oracle=_bm25_oracle(BM25_TERMS, BM25_K, BM25_K1, BM25_B),
    doc="Okapi BM25 top-k for a fixed query-term set — keyword retrieval "
    "over the corpus (contamination audits, relevance seeding). Zero "
    "shuffles before the final top-k: per-doc tf/dl are column arithmetic "
    "(no explode; the query set is a literal list), corpus stats are one "
    "scalar aggregate broadcast back, and the top-k is a TakeOrdered.",
)
def bm25_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return ta.bm25_rank(docs, BM25_TERMS, k=BM25_K, k1=BM25_K1, b=BM25_B)


@register(
    "dedup_semantic_clusters",
    oracle="""
    WITH RECURSIVE emb AS (SELECT vec_id, embedding FROM embeddings),
    norms AS (SELECT vec_id, sqrt(s) AS nrm FROM
                (SELECT vec_id, SUM(x * x) AS s FROM
                   (SELECT vec_id, unnest(embedding)::DOUBLE AS x FROM emb)
                 GROUP BY vec_id)),
    dots AS (SELECT a_id, b_id, SUM(ax * bx) AS dot FROM
               (SELECT a.vec_id AS a_id, b.vec_id AS b_id,
                       unnest(a.embedding)::DOUBLE AS ax,
                       unnest(b.embedding)::DOUBLE AS bx
                FROM emb a JOIN emb b ON a.vec_id < b.vec_id)
             GROUP BY a_id, b_id),
    pairs AS (SELECT a_id, b_id
              FROM dots JOIN norms na ON na.vec_id = a_id
                        JOIN norms nb ON nb.vec_id = b_id
              WHERE round(dot / (na.nrm * nb.nrm), 6) >= 0.42),
    edges AS (SELECT a_id AS a, b_id AS b FROM pairs
              UNION ALL
              SELECT b_id, a_id FROM pairs),
    reach(a, b) AS (
        SELECT a, b FROM edges
        UNION
        SELECT r.a, g.b FROM reach r JOIN edges g ON g.a = r.b
    ),
    labels AS (SELECT a AS vec_id, LEAST(a, MIN(b)) AS cluster_id
               FROM reach GROUP BY a)
    SELECT v.vec_id,
           COALESCE(l.cluster_id, v.vec_id) AS cluster_id,
           (COALESCE(l.cluster_id, v.vec_id) = v.vec_id) AS keep
    FROM embeddings v LEFT JOIN labels l ON l.vec_id = v.vec_id
    """,
    doc="SemDeDup-style semantic dedup END-TO-END over the embedding "
    "corpus: exact cosine pairs at >= 0.42 (fixture-calibrated — see "
    "dedup_embedding_cosine; block matmul, one BLAS "
    "X @ Yᵀ per block pair, the scale path), connected components "
    "(checkpointed min-label propagation with pointer jumping), then "
    "keep the min-id representative per semantic cluster; vectors in no "
    "pair are singletons and kept. Oracle: all-pairs ground truth + "
    "recursive transitive closure.",
)
def dedup_semantic_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    pairs = sim.embedding_near_duplicates_blocked(emb, threshold=0.42)
    labels = dd.connected_components(
        pairs, id_a="vec_id_a", id_b="vec_id_b"
    ).select(F.col("doc_id").alias("vec_id"), "cluster_id")
    assigned = emb.select("vec_id").join(labels, "vec_id", "left")
    cluster = F.coalesce("cluster_id", "vec_id")
    return assigned.select(
        "vec_id",
        cluster.alias("cluster_id"),
        (cluster == F.col("vec_id")).alias("keep"),
    )


@register(
    "w6_rolling_1h_range",
    oracle="""
    SELECT event_id, user_id, ts,
           round(CAST(SUM(CAST(round(value, 6) AS DECIMAL(18,6))) OVER w
                      AS DOUBLE), 6) AS roll_sum_1h,
           CAST(COUNT(*) OVER w AS BIGINT) AS roll_n_1h
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                 RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
    """,
    doc="Per-user rolling 1-hour aggregate via a RANGE (time-interval) "
    "window frame — the feature-engineering staple Spark evaluates with "
    "a single per-user sort, no self-join. The frame is anchored on "
    "epoch MICROseconds on both engines (casting ts to seconds would "
    "shift frame boundaries for sub-second timestamps); the windowed sum "
    "runs over 6-dp decimals so frame evaluation order cannot change the "
    "hash. One shuffle on user_id total.",
)
def w6_rolling_1h_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "value"
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3_600_000_000, 0)
    )
    dec = F.round("value", 6).cast("decimal(18,6)")
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.round(F.sum(dec).over(w).cast("double"), 6).alias("roll_sum_1h"),
        F.count(F.lit(1)).over(w).cast("long").alias("roll_n_1h"),
    )


@register(
    "decontaminate_embedding_cosine",
    oracle="""
    WITH e AS (SELECT vec_id, embedding FROM embeddings),
    norms AS (SELECT vec_id, sqrt(s) AS nrm FROM
                (SELECT vec_id, SUM(x * x) AS s FROM
                   (SELECT vec_id, unnest(embedding)::DOUBLE AS x FROM e)
                 GROUP BY vec_id)),
    dots AS (SELECT t.vec_id AS tid, b.vec_id AS bid, SUM(tx * bx) AS dot
             FROM (SELECT vec_id, unnest(embedding)::DOUBLE AS tx,
                          generate_subscripts(embedding, 1) AS i
                   FROM e WHERE vec_id % 10 <> 0) t
             JOIN (SELECT vec_id, unnest(embedding)::DOUBLE AS bx,
                          generate_subscripts(embedding, 1) AS i
                   FROM e WHERE vec_id % 10 = 0) b
             ON t.i = b.i GROUP BY 1, 2),
    s AS (SELECT tid, bid, round(dot / (nt.nrm * nb.nrm), 6) AS c
          FROM dots JOIN norms nt ON nt.vec_id = tid
                    JOIN norms nb ON nb.vec_id = bid),
    best AS (SELECT tid, bid, c,
                    row_number() OVER (PARTITION BY tid
                                       ORDER BY c DESC, bid) AS rn
             FROM s)
    SELECT tid AS vec_id, bid AS bench_vec_id, c AS cosine
    FROM best WHERE rn = 1 AND c >= 0.42
    """,
    doc="Embedding-level decontamination: flag training vectors (vec_id "
    "% 10 != 0 here) whose cosine to ANY benchmark vector (% 10 == 0) "
    "reaches 0.42 (fixture-calibrated; production 0.9+) — catches the "
    "paraphrase leakage n-gram overlap misses. The benchmark matrix is "
    "a broadcast variable; the corpus side is ONE zero-shuffle Arrow "
    "scan with a BLAS matmul per batch. Ties on max cosine break to the "
    "smallest bench id on both engines.",
)
def decontaminate_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    train = emb.filter(F.col("vec_id") % 10 != 0)
    bench = emb.filter(F.col("vec_id") % 10 == 0)
    return sim.embedding_decontaminate(train, bench, threshold=0.42)


@register(
    "salted_join_segment_counts",
    oracle="""
    SELECT c.c_mktsegment AS mktsegment,
           COUNT(*)::BIGINT AS n_orders,
           COUNT(DISTINCT o.o_custkey)::BIGINT AS n_customers
    FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    GROUP BY 1
    """,
    doc="Skew-safe join demonstration (operators/skew.py::salted_join): "
    "the big side is scattered across salt_n sub-keys and the small side "
    "replicated salt_n times, turning one pathological hot-key partition "
    "into salt_n even ones. The salt is dropped before aggregation, so "
    "the result — and the oracle — is exactly the plain join's. AQE "
    "skew-split handles moderate skew; explicit salting is for the "
    "power-law/null-key case where one key overwhelms a single task.",
)
def salted_join_segment_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.skew import salted_join

    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("custkey")
    )
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("custkey"), "c_mktsegment"
    )
    joined = salted_join(orders, cust, "custkey", salt_n=8)
    return joined.groupBy(
        F.col("c_mktsegment").alias("mktsegment")
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.countDistinct("custkey").alias("n_customers"),
    )


@register(
    "boilerplate_span_flag",
    oracle=f"""
    WITH spans AS (SELECT doc_id, unnest({_shingles_sql(3)}) AS span
                   FROM documents),
    boiler AS (SELECT span FROM spans GROUP BY span HAVING COUNT(*) > 3),
    per_doc AS (SELECT doc_id,
                       CAST(len({_shingles_sql(3)}) AS BIGINT) AS n_spans
                FROM documents),
    hits AS (SELECT s.doc_id, COUNT(*) AS n_boiler
             FROM spans s JOIN boiler b ON s.span = b.span
             GROUP BY s.doc_id)
    SELECT p.doc_id, p.n_spans,
           CASE WHEN p.n_spans > 0
                THEN round(COALESCE(h.n_boiler, 0) / p.n_spans, 6)
                ELSE 0.0 END AS boilerplate_frac,
           (CASE WHEN p.n_spans > 0
                 THEN round(COALESCE(h.n_boiler, 0) / p.n_spans, 6)
                 ELSE 0.0 END) <= 0.2 AS keep
    FROM per_doc p LEFT JOIN hits h ON h.doc_id = p.doc_id
    """,
    doc="Cross-document boilerplate flagging (C4/RefinedWeb-style "
    "repeated-span removal, operators/text_analysis.py::"
    "boilerplate_span_stats): a 3-gram span occurring in >3 documents is "
    "boilerplate; documents whose distinct spans are >20% boilerplate are "
    "dropped. One map-side-combinable shuffle builds the span document "
    "frequencies; the df table is FILTERED to just the boilerplate spans "
    "before the semi-join back, so the build side stays broadcastable at "
    "any corpus size.",
)
def boilerplate_span_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    out = ta.boilerplate_span_stats(docs, n=3, df_threshold=3,
                                    frac_threshold=0.2)
    return out.withColumn("n_spans", F.col("n_spans").cast("long"))
