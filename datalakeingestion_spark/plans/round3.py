"""Round-3 additions: SCD2 history, streaming-dedup batch twin.

Same contract as the other plan modules: oracle SQL is generated from the
same constants as the Spark plan, every aggregate/computed column aliased
identically on both sides, floats rounded at the same points.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.fixtures import load_table
from .llm import TOKS_SQL, _shingles_sql
from .registry import REGISTRY as _REGISTRY
from .registry import register


@register(
    "scd2_user_history",
    oracle="""
    SELECT event_id, user_id, event_type, ts AS valid_from,
           lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS valid_to,
           lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               IS NULL AS is_current
    FROM events
    """,
    doc="Type-2 SCD validity intervals from the append-only event log "
    "(operators/relational.py::scd2_history) — the historical sibling of "
    "the reference's latest-row view (start_ingestion.py:361-374): each "
    "user's rows become half-open [valid_from, valid_to) intervals with "
    "is_current on the last. One shuffle on the key + per-partition sort, "
    "identical cost to the latest view (no self-join).",
)
def scd2_user_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.relational import scd2_history

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "ts"
    )
    return scd2_history(ev, ["user_id"], "ts", ["event_id"]).select(
        "event_id", "user_id", "event_type", "valid_from", "valid_to",
        "is_current",
    )


@register(
    "t9_stream_dedup",
    oracle="""
    SELECT user_id, event_type,
           MIN(event_id) AS first_event_id,
           MIN(ts) AS first_ts
    FROM events GROUP BY user_id, event_type
    """,
    doc="Deterministic batch twin of keyed streaming dedup "
    "(streaming/incremental.py::streaming_dedup_exact / "
    "_within_watermark): first event per (user_id, event_type). The "
    "stream keeps one state row per live key and GCs it past the "
    "watermark; the batch analog is a single map-side-combinable MIN "
    "aggregate (dropDuplicates itself is arrival-order-dependent, so the "
    "oracle pins the order-free min form). Streaming behavior is "
    "covered in tests/test_streaming.py.",
)
def t9_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("user_id", "event_type").agg(
        F.min("event_id").alias("first_event_id"),
        F.min("ts").alias("first_ts"),
    )


@register(
    "source_js_divergence",
    oracle=f"""
    WITH tok AS (SELECT source AS grp, unnest({TOKS_SQL}) AS tok
                 FROM documents),
    sc AS (SELECT grp, tok, COUNT(*) AS c_st FROM tok GROUP BY grp, tok),
    vocab AS (SELECT tok, SUM(c_st) AS c_t FROM sc GROUP BY tok),
    totals AS (SELECT grp, SUM(c_st) AS n_s FROM sc GROUP BY grp),
    n AS (SELECT SUM(c_t)::DOUBLE AS n_total FROM vocab),
    grid AS (SELECT t.grp, v.tok, t.n_s, v.c_t,
                    COALESCE(s.c_st, 0) AS c_st
             FROM totals t CROSS JOIN vocab v
             LEFT JOIN sc s ON s.grp = t.grp AND s.tok = v.tok)
    SELECT grp AS source,
           CAST(MAX(n_s) AS BIGINT) AS n_tokens,
           round(SUM(
             CASE WHEN c_st > 0
                  THEN 0.5 * (c_st / n_s)
                       * ln((c_st / n_s)
                            / ((c_st / n_s + c_t / n_total) / 2))
                  ELSE 0.0 END
             + 0.5 * (c_t / n_total)
               * ln((c_t / n_total)
                    / ((c_st / n_s + c_t / n_total) / 2))
           ), 6) AS js_divergence
    FROM grid CROSS JOIN n
    GROUP BY grp
    """,
    doc="Per-source Jensen-Shannon divergence from the corpus unigram "
    "distribution (operators/text_analysis.py::source_js_divergence) — "
    "the mixture-QA / domain-shift signal for data-mixing pipelines. One "
    "token shuffle builds (source, token) counts; the |V|·S grid join is "
    "driven from the aggregated vocabulary, never the raw stream; the "
    "ln-sum rounds to 6 dp after aggregation.",
)
def source_js_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text_analysis import source_js_divergence as jsd

    docs = load_table(spark, sf_dir, "documents")
    return jsd(docs, group_col="source")


@register(
    "fuzzy_match_customer_names",
    oracle="""
    WITH keys AS (SELECT c_custkey, substr(c_name, len(c_name) - 5, 6) AS k
                  FROM customer),
    pairs AS (SELECT a.c_custkey AS left_id, b.c_custkey AS right_id,
                     a.k AS ka, b.k AS kb
              FROM keys a JOIN keys b
                ON a.c_custkey < b.c_custkey AND len(a.k) = len(b.k)),
    scored AS (SELECT left_id, right_id,
                      CAST(list_sum(list_transform(range(1, len(ka) + 1),
                           i -> (substr(ka, i, 1) <> substr(kb, i, 1))::INT))
                           AS BIGINT) AS hamming
               FROM pairs)
    SELECT left_id, right_id, COALESCE(hamming, 0) AS hamming
    FROM scored WHERE COALESCE(hamming, 0) <= 1
    """,
    doc="Segment-blocked fuzzy self-join (operators/fuzzyjoin.py::"
    "fuzzy_join_hamming): customers whose name SUFFIXES (the variable "
    "digit region — the caller passes the discriminative expression, the "
    "shared-prefix trap documented in the operator) differ in at most one "
    "position. Pigeonhole blocking on k+1 aligned segments gives "
    "guaranteed recall with a plain equi join on (length, segment id, "
    "segment text) — never all-pairs; the oracle IS the all-pairs ground "
    "truth.",
)
def fuzzy_match_customer_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.fuzzyjoin import fuzzy_join_hamming

    cust = load_table(spark, sf_dir, "customer")
    key = F.col("c_name").substr(-6, 6)
    out = fuzzy_join_hamming(
        cust, cust, "c_custkey", "c_custkey", key, key, k=1
    )
    return out.filter(F.col("left_id") < F.col("right_id"))


@register(
    "profile_price_histogram",
    oracle="""
    WITH counts AS (
      SELECT CASE WHEN o_totalprice < 0.0 THEN 0
                  WHEN o_totalprice >= 600000.0 THEN 11
                  ELSE CAST(floor((o_totalprice - 0.0) / (600000.0 - 0.0)
                                  * 10) AS INT) + 1
             END AS bin,
             COUNT(*) AS n
      FROM orders WHERE o_totalprice IS NOT NULL GROUP BY 1),
    grid AS (SELECT unnest(range(0, 12)) AS bin)
    SELECT CAST(g.bin AS BIGINT) AS bin,
           round(0.0 + (g.bin - 1) * 60000.0, 6) AS bin_lo,
           round(0.0 + g.bin * 60000.0, 6) AS bin_hi,
           CAST(COALESCE(c.n, 0) AS BIGINT) AS n
    FROM grid g LEFT JOIN counts c ON c.bin = g.bin
    """,
    doc="Equal-width histogram of order totals "
    "(operators/profiling.py::numeric_histogram): width_bucket binning "
    "with Postgres under/overflow gutters, empty bins emitted. One "
    "map-side-combinable groupBy shuffling at most n_bins rows — the "
    "distribution half of profiling (skew checks, drift between "
    "snapshots). Fixed literal bounds keep the grid deterministic.",
)
def profile_price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.profiling import numeric_histogram

    orders = load_table(spark, sf_dir, "orders")
    return numeric_histogram(orders, "o_totalprice", n_bins=10,
                             lo=0.0, hi=600000.0)


@register(
    "quality_rank_normalize",
    oracle="""
    WITH q AS (SELECT doc_id, n_chars FROM documents)
    SELECT doc_id, n_chars,
           round(percent_rank() OVER (ORDER BY n_chars), 6) AS rank_norm
    FROM q
    """,
    doc="Rank-normalization of a quality signal to [0,1] "
    "(operators/sampling.py::rank_normalize): percent_rank semantics "
    "computed WITHOUT the single-partition global window — ranks derive "
    "from the distinct-value table (bounded by score resolution), the "
    "prefix window orders only distinct values, and rows join their rank "
    "by value. The pre-step before mixing incomparable quality signals.",
)
def quality_rank_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sampling import rank_normalize

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    return rank_normalize(docs, "n_chars").select(
        "doc_id", "n_chars", "rank_norm"
    )


@register(
    "dedup_cluster_assign_star",
    # identical output contract -> identical transitive-closure oracle
    # (importing .llm above already registered dedup_cluster_assign)
    oracle=_REGISTRY["dedup_cluster_assign"].oracle,
    doc="Same contract as dedup_cluster_assign (minhash pair graph -> "
    "component-min labels, identical oracle) computed by the OTHER "
    "algorithm: large-star/small-star edge contraction (Kiveris et al. "
    "SoCC'14, operators/dedup.py::connected_components_star). Registered "
    "as a first-class twin because at 100 TB the two have different "
    "frontiers -- label propagation shuffles every NODE each round, star "
    "contraction shuffles the EDGE list, which it actively shrinks; on "
    "deep-chain graphs (web-domain dedup) the contraction wins.",
)
def dedup_cluster_assign_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import dedup as dd

    docs = load_table(spark, sf_dir, "documents")
    pairs = dd.minhash_near_duplicates(docs, threshold=0.5)
    return dd.connected_components_star(pairs)


@register(
    "dedup_jaccard_prefix_join",
    # exact-twin contract: identical output to dedup_ngram_jaccard
    # (same shingles, same threshold), so the oracle is shared verbatim —
    # which doubles as a losslessness proof for the prefix filter.
    oracle=_REGISTRY["dedup_ngram_jaccard"].oracle,
    doc="Exact 3-gram Jaccard pairs via PREFIX FILTERING (AllPairs, "
    "Bayardo et al. WWW'07; operators/dedup.py::jaccard_prefix_join): "
    "shingles ordered by ascending global df, only each doc's "
    "(sz - ceil(t*sz) + 1)-prefix enters the candidate self-join, with a "
    "length filter in the join condition; exact verify after. Lossless "
    "(first-common-token pigeonhole), so the oracle is the brute-force "
    "all-pairs SQL shared with dedup_ngram_jaccard. The scale story: the "
    "naive shingle join is O(bucket^2) on COMMON shingles — exactly the "
    "buckets the df-ordering excludes from prefixes — while LSH trades "
    "recall; this keeps exactness at sub-quadratic candidate cost.",
)
def dedup_jaccard_prefix_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import dedup as dd

    docs = load_table(spark, sf_dir, "documents")
    return dd.jaccard_prefix_join(docs, threshold=0.5, n=3)


@register(
    "bigram_logprob_score",
    oracle=f"""
    WITH t AS (SELECT doc_id, {TOKS_SQL} AS toks FROM documents),
    v AS (SELECT COUNT(DISTINCT tok)::DOUBLE AS vsz
          FROM (SELECT unnest(toks) AS tok FROM t)),
    bg AS (SELECT doc_id,
                  unnest(list_transform(range(1, len(toks)),
                                        i -> toks[i] || ' ' || toks[i + 1]))
                      AS bg
           FROM t),
    c2 AS (SELECT bg, COUNT(*) AS c2 FROM bg GROUP BY 1),
    heads AS (SELECT string_split(bg, ' ')[1] AS w1, SUM(c2) AS c1
              FROM c2 GROUP BY 1),
    model AS (SELECT bg,
                     CAST(round(ln((c2 + 0.5) / (c1 + 0.5 * vsz)), 6)
                          AS DECIMAL(27,6)) AS lp
              FROM c2 JOIN heads ON string_split(c2.bg, ' ')[1] = heads.w1
              CROSS JOIN v)
    SELECT doc_id, COUNT(*)::BIGINT AS n_bigrams,
           CAST(SUM(lp) AS DOUBLE) / COUNT(*) AS mean_logprob
    FROM bg JOIN model USING (bg)
    GROUP BY doc_id
    """,
    doc="Per-doc mean log-prob under the corpus's own add-0.5-smoothed "
    "BIGRAM LM (operators/text_analysis.py::bigram_logprob) — catches "
    "scrambled-word-order spam the unigram score can't. Bigram stream "
    "shuffles once into the model; head counts derive from the "
    "distinct-bigram frame and broadcast; log-probs rounded to 6 dp and "
    "summed as exact decimals (partitioning-independent mean).",
)
def bigram_logprob_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import text_analysis as ta

    docs = load_table(spark, sf_dir, "documents")
    return ta.bigram_logprob(docs)


@register(
    "pmi_collocations_top50",
    oracle=f"""
    WITH t AS (SELECT {TOKS_SQL} AS toks FROM documents),
    c1 AS (SELECT tok, COUNT(*) AS c1
           FROM (SELECT unnest(toks) AS tok FROM t) GROUP BY 1),
    nu AS (SELECT SUM(c1)::DOUBLE AS nu FROM c1),
    bgs AS (SELECT unnest(list_transform(range(1, len(toks)),
                                         i -> toks[i] || ' ' || toks[i + 1]))
                AS bg
            FROM t),
    c2 AS (SELECT bg, COUNT(*) AS c2 FROM bgs GROUP BY 1),
    nb AS (SELECT SUM(c2)::DOUBLE AS nb FROM c2),
    s AS (SELECT c2.bg AS bigram, c2.c2::BIGINT AS pair_count,
                 round(ln((c2.c2 / nb.nb)
                          / ((ca.c1 / nu.nu) * (cb.c1 / nu.nu))), 6) AS pmi
          FROM c2
          JOIN c1 ca ON ca.tok = string_split(c2.bg, ' ')[1]
          JOIN c1 cb ON cb.tok = string_split(c2.bg, ' ')[2]
          CROSS JOIN nb CROSS JOIN nu
          WHERE c2.c2 >= 5),
    r AS (SELECT bigram, pair_count, pmi,
                 row_number() OVER (ORDER BY pmi DESC, bigram) AS rnk
          FROM s)
    SELECT bigram, pair_count, pmi, rnk AS "rank" FROM r WHERE rnk <= 50
    """,
    doc="Top-50 collocations by pointwise mutual information with "
    "min-count 5 (operators/text_analysis.py::pmi_collocations) — the "
    "word2vec-style phrase-mining signal. One bigram shuffle + one token "
    "shuffle; the vocab-sized unigram frame broadcasts into the pair "
    "frame twice; totals are scalar aggregates; final top-k is a "
    "TakeOrdered with 6-dp rounding and bigram tie-break.",
)
def pmi_collocations_top50(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import text_analysis as ta

    docs = load_table(spark, sf_dir, "documents")
    return ta.pmi_collocations(docs, k=50, min_count=5)


@register(
    "kmeans_cluster_profile",
    # contract oracle (ann-style): n_vectors is exact; the bound booleans
    # are deterministic engine-side guarantees (hash-seeded init,
    # decimal-exact centroid means). Measured coherence lift 0.22 at both
    # parity scales; bound 0.1.
    oracle="""
    SELECT COUNT(*)::BIGINT AS n_vectors,
           CAST(8 AS BIGINT) AS n_clusters_used,
           TRUE AS clusters_ok, TRUE AS coherence_ok
    FROM embeddings
    """,
    doc="Deterministic spherical k-means (k=8) over the embedding corpus "
    "with a single-row quality contract "
    "(operators/ivf.py::kmeans_profile): exact vector count, non-empty "
    "cell count, and a coherence bound — mean cosine-to-own-centroid "
    "must beat the k=1 global-centroid baseline by >= 0.1. The topic-"
    "bucketing/SemDeDup-support primitive, checkable by the driver "
    "despite being unsupervised.",
)
def kmeans_cluster_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.ivf import kmeans_profile

    emb = load_table(spark, sf_dir, "embeddings")
    return kmeans_profile(emb, k=8, iters=5, min_coherence_lift=0.1)


def _src_overlap_oracle(n: int) -> str:
    from .llm import _shingles_sql

    return f"""
    WITH sh AS (SELECT DISTINCT src, s FROM
                  (SELECT source AS src, unnest({_shingles_sql(n)}) AS s
                   FROM documents)),
    sizes AS (SELECT src, COUNT(*) AS sz FROM sh GROUP BY 1),
    inter AS (SELECT a.src AS source_a, b.src AS source_b,
                     COUNT(*) AS n_shared
              FROM sh a JOIN sh b ON a.s = b.s AND a.src < b.src
              GROUP BY 1, 2)
    SELECT source_a, source_b, n_shared::BIGINT AS n_shared,
           round(n_shared / least(sa.sz, sb.sz), 6) AS overlap_coeff
    FROM inter
    JOIN sizes sa ON sa.src = inter.source_a
    JOIN sizes sb ON sb.src = inter.source_b
    """


@register(
    "source_ngram_overlap_matrix",
    oracle=_src_overlap_oracle(3),
    doc="Pairwise 3-gram overlap between SOURCES (corpus governance: "
    "which feeds republish each other; "
    "operators/dedup.py::source_ngram_overlap): shared distinct-shingle "
    "count + overlap coefficient per unordered source pair. The shingle "
    "self-join has bucket size <= n_sources per shingle, so output is "
    "S(S-1)/2 rows and join work is bounded by S^2 per shingle "
    "regardless of corpus size.",
)
def source_ngram_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import dedup as dd

    docs = load_table(spark, sf_dir, "documents")
    return dd.source_ngram_overlap(docs, n=3)


def _asym_minhash_oracle(threshold: float, split_id: int) -> str:
    from ..operators import dedup as dd
    from .llm import _h32_sql, _shingles_sql

    mins = ",\n           ".join(
        f"MIN(({a} * h + {b}) % {dd.MERSENNE_P}) AS mh{i}"
        for i, (a, b) in enumerate(zip(dd.MINHASH_A, dd.MINHASH_B))
    )

    def bands(sig: str) -> str:
        rows = []
        for j in range(dd.LSH_BANDS):
            cols = [f"mh{j * dd.LSH_ROWS + r}" for r in range(dd.LSH_ROWS)]
            sig_expr = " || ',' || ".join(cols)
            rows.append(
                f"SELECT doc_id, {j} AS band_id, {sig_expr} AS band_sig "
                f"FROM {sig}"
            )
        return "\n         UNION ALL ".join(rows)

    return f"""
    WITH shn AS (SELECT doc_id, unnest({_shingles_sql(3)}) AS s
                 FROM documents WHERE doc_id >= {split_id}),
    sho AS (SELECT doc_id, unnest({_shingles_sql(3)}) AS s
            FROM documents WHERE doc_id < {split_id}),
    thn AS (SELECT doc_id, {_h32_sql('s')} AS h FROM shn),
    tho AS (SELECT doc_id, {_h32_sql('s')} AS h FROM sho),
    sgn AS (SELECT doc_id, {mins} FROM thn GROUP BY doc_id),
    sgo AS (SELECT doc_id, {mins} FROM tho GROUP BY doc_id),
    bn AS ({bands('sgn')}),
    bo AS ({bands('sgo')}),
    cand AS (SELECT DISTINCT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b
             FROM bn a JOIN bo b
               ON a.band_id = b.band_id AND a.band_sig = b.band_sig),
    allsh AS (SELECT * FROM shn UNION ALL SELECT * FROM sho),
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM allsh GROUP BY doc_id),
    inter AS (SELECT c.doc_id_a, c.doc_id_b, COUNT(*) AS i
              FROM cand c
              JOIN allsh t1 ON t1.doc_id = c.doc_id_a
              JOIN allsh t2 ON t2.doc_id = c.doc_id_b AND t2.s = t1.s
              GROUP BY 1, 2)
    SELECT inter.doc_id_a, inter.doc_id_b,
           round(i / (sa.sz + sb.sz - i), 6) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = inter.doc_id_a
    JOIN sizes sb ON sb.doc_id = inter.doc_id_b
    WHERE round(i / (sa.sz + sb.sz - i), 6) >= {threshold}
    """


@register(
    "dedup_incremental_vs_lake",
    oracle=_asym_minhash_oracle(0.5, 400),
    doc="Dedup-at-the-door: near-dup pairs between an incoming batch "
    "(doc_id >= 400) and the already-ingested lake (doc_id < 400) via an "
    "ASYMMETRIC MinHash-LSH band join "
    "(operators/dedup.py::dedup_against_index) — new-batch bands probe "
    "the lake's persisted band index, so per-batch cost is O(batch) "
    "probes, never O(lake^2) re-pairing and never all-pairs. The "
    "production shape of dedup inside an ingestion pipeline; exact "
    "Jaccard verify over the union shingle table.",
)
def dedup_incremental_vs_lake(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import dedup as dd

    docs = load_table(spark, sf_dir, "documents")
    return dd.dedup_against_index(
        docs.filter(F.col("doc_id") >= 400),
        docs.filter(F.col("doc_id") < 400),
        threshold=0.5,
    )


def _cdc_oracle(avg_chunk: int) -> str:
    from .llm import _h32_sql

    return f"""
    WITH t AS (SELECT doc_id, {TOKS_SQL} AS toks FROM documents),
    m AS (SELECT doc_id,
                 array_to_string(list_transform(toks,
                     t -> CASE WHEN ({_h32_sql('t')}) % {avg_chunk} = 0
                          THEN '#' || t ELSE t END), ' ') AS marked
          FROM t),
    ch AS (SELECT doc_id,
                  md5(unnest(list_filter(
                      list_transform(string_split(marked, '#'),
                                     x -> trim(x)),
                      x -> x <> ''))) AS chunk_hash
           FROM m),
    freq AS (SELECT chunk_hash, COUNT(DISTINCT doc_id) AS n_docs
             FROM ch GROUP BY 1),
    g AS (SELECT doc_id, COUNT(*) AS n_chunks,
                 SUM((n_docs >= 2)::BIGINT) AS n_shared_chunks
          FROM ch JOIN freq USING (chunk_hash) GROUP BY doc_id)
    SELECT doc_id, n_chunks::BIGINT AS n_chunks,
           n_shared_chunks::BIGINT AS n_shared_chunks,
           round(n_shared_chunks / n_chunks, 6) AS shared_frac
    FROM g
    """


@register(
    "cdc_shared_chunk_fraction",
    oracle=_cdc_oracle(8),
    doc="Content-defined chunking dedup signal "
    "(operators/dedup.py::cdc_shared_chunks): variable-size chunks cut "
    "at hash-selected boundary tokens (rsync/LBFS-style — boundaries "
    "re-sync after insertions, so partial copies still match where "
    "fixed windows would shift), md5 per chunk, per-doc fraction of "
    "chunks shared verbatim with other docs. Chunking is zero-shuffle "
    "sentinel-split column algebra; only the hash-frequency aggregate "
    "and its join shuffle, both on the 16-byte hash.",
)
def cdc_shared_chunk_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import dedup as dd

    docs = load_table(spark, sf_dir, "documents")
    return dd.cdc_shared_chunks(docs, avg_chunk=8)


@register(
    "pca_embedding_contract",
    # contract oracle (ann-style): n_vectors/dim/k exact; bounds are
    # engine-side guarantees. Measured var ratio 0.203 at BOTH parity
    # scales (nearly-isotropic fixture; the k/d=8/64 isotropic floor is
    # 0.125); bound 0.15 keeps margin both ways. Re-measure on fixture
    # regeneration.
    oracle="""
    SELECT COUNT(*)::BIGINT AS n_vectors,
           CAST(64 AS BIGINT) AS dim, CAST(8 AS BIGINT) AS k,
           TRUE AS var_ratio_ok, TRUE AS orthonormal_ok
    FROM embeddings
    """,
    doc="Distributed one-pass PCA (operators/pca.py): per-partition "
    "(count, sum, Gram) partials via mapInPandas — driver state is "
    "O(d^2) regardless of corpus size — eigendecomposition on the "
    "driver, k=8 of 64 dims. Contract row: exact counts + orthonormality "
    "+ variance-captured >= 0.15. pca_project appends the 6-dp-rounded "
    "projection column for index-size reduction ahead of ANN/SemDeDup.",
)
def pca_embedding_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.pca import pca_contract

    emb = load_table(spark, sf_dir, "embeddings")
    return pca_contract(emb, k=8, min_var_ratio=0.15)


@register(
    "ann_pca_rerank_topk",
    # recall-contract oracle (same design as ann_lsh/ann_ivf): measured
    # per-query recall@10 >= 0.8 at both parity scales with kdim=32,
    # C=50 on the near-isotropic fixtures (PCA's worst case); bound 0.7.
    oracle="""
    SELECT vec_id AS query_id, CAST(10 AS BIGINT) AS n_true,
           TRUE AS recall_ok
    FROM embeddings WHERE vec_id < 5
    """,
    doc="Two-stage ANN: PCA-32 candidate generation (index 1/2 the "
    "full width) + exact full-space rerank of 50 candidates/query "
    "(operators/pca.py::pca_rerank_topk) — the compressed-index "
    "pattern; recall equals candidate recall because the rerank is "
    "exact. Emits the per-query recall contract vs the brute-force "
    "twin (bound 0.7, measured >= 0.8).",
)
def ann_pca_rerank_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.pca import pca_rerank_topk
    from ..operators import similarity as sim
    from .llm import _recall_contract

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    approx = pca_rerank_topk(emb, queries, k=10, kdim=32, candidates=50)
    return _recall_contract(
        sim.cosine_topk(emb, queries, k=10), approx, 0.7
    )


@register(
    "zipf_alpha_fit",
    oracle=f"""
    WITH t AS (SELECT unnest({TOKS_SQL}) AS tok FROM documents),
    tf AS (SELECT tok, COUNT(*) AS freq FROM t GROUP BY 1
           ORDER BY freq DESC, tok LIMIT 500),
    pts AS (SELECT
              round(ln(CAST(row_number() OVER (ORDER BY freq DESC, tok)
                            AS DOUBLE)), 6) AS x,
              round(ln(CAST(freq AS DOUBLE)), 6) AS y
            FROM tf),
    s AS (SELECT COUNT(*)::DOUBLE AS n,
                 CAST(SUM(CAST(x AS DECIMAL(27,6))) AS DOUBLE) AS sx,
                 CAST(SUM(CAST(y AS DECIMAL(27,6))) AS DOUBLE) AS sy,
                 CAST(SUM(CAST(round(x * y, 6) AS DECIMAL(27,6)))
                      AS DOUBLE) AS sxy,
                 CAST(SUM(CAST(round(x * x, 6) AS DECIMAL(27,6)))
                      AS DOUBLE) AS sxx
          FROM pts)
    SELECT n::BIGINT AS n_terms,
           round(-((n * sxy - sx * sy) / (n * sxx - sx * sx)), 6)
               AS zipf_alpha
    FROM s
    """,
    doc="Zipf exponent of the corpus token distribution "
    "(operators/text_analysis.py::zipf_fit): least-squares ln-ln slope "
    "over the top-500 terms. One token shuffle + a TakeOrdered top-K; "
    "the rank window sees only K rows. ln values 6-dp rounded and "
    "decimal-summed so the slope is partitioning-independent.",
)
def zipf_alpha_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import text_analysis as ta

    docs = load_table(spark, sf_dir, "documents")
    return ta.zipf_fit(docs, top_terms=500)


@register(
    "embedding_centroid_outliers",
    oracle="""
    WITH e AS (SELECT vec_id, generate_subscripts(embedding, 1) AS dim,
                      CAST(unnest(embedding) AS DOUBLE) AS x
               FROM embeddings),
    mu AS (SELECT dim,
                  CAST(SUM(CAST(round(x, 6) AS DECIMAL(27,6))) AS DOUBLE)
                      / COUNT(*) AS mu
           FROM e GROUP BY dim),
    terms AS (SELECT vec_id,
                     CAST(SUM(CAST(round(x * mu, 6) AS DECIMAL(27,6)))
                          AS DOUBLE) AS dot,
                     CAST(SUM(CAST(round(x * x, 6) AS DECIMAL(27,6)))
                          AS DOUBLE) AS nv2
              FROM e JOIN mu USING (dim) GROUP BY vec_id),
    nm AS (SELECT CAST(SUM(CAST(round(mu * mu, 6) AS DECIMAL(27,6)))
                       AS DOUBLE) AS nm2 FROM mu),
    s AS (SELECT vec_id, round(dot / (sqrt(nv2) * sqrt(nm2)), 6)
                     AS cos_centroid
          FROM terms CROSS JOIN nm)
    SELECT vec_id, cos_centroid,
           row_number() OVER (ORDER BY cos_centroid, vec_id) <= 25
               AS is_outlier
    FROM s
    """,
    doc="Bottom-25 vectors by cosine to the EXACT corpus centroid "
    "(operators/similarity.py::embedding_centroid_outliers) — the cheap "
    "embedding-space health check. Fully exact oracle: per-dim decimal "
    "sums for the centroid, every dot/norm term 6-dp rounded before its "
    "decimal sum — no float summation order anywhere; d-bounded "
    "aggregate + 64-row broadcast + TakeOrdered-shape bottom-k.",
)
def embedding_centroid_outliers_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import embedding_centroid_outliers

    emb = load_table(spark, sf_dir, "embeddings")
    return embedding_centroid_outliers(emb, k_outliers=25)


@register(
    "containment_quote_pairs",
    oracle=f"""
    WITH s AS (SELECT doc_id, unnest({_shingles_sql(3)}) AS s FROM documents),
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM s GROUP BY 1),
    inter AS (SELECT a.doc_id AS ida, b.doc_id AS idb, COUNT(*) AS i
              FROM s a JOIN s b ON a.s = b.s AND a.doc_id <> b.doc_id
              GROUP BY 1, 2)
    SELECT ida AS doc_id_small, idb AS doc_id_large,
           round(i / sa.sz, 6) AS containment
    FROM inter
    JOIN sizes sa ON sa.doc_id = ida
    JOIN sizes sb ON sb.doc_id = idb
    WHERE (sa.sz < sb.sz OR (sa.sz = sb.sz AND ida < idb))
      AND round(i / sa.sz, 6) >= 0.8
    """,
    doc="Exact quote/excerpt detection: smaller doc's shingle set >= 80% "
    "contained in the larger's (operators/dedup.py::containment_join) — "
    "the case symmetric Jaccard structurally misses (a quoted tweet in "
    "an article has containment ~1, Jaccard ~0). One-sided prefix "
    "filter: only the probe side prefixes (rare shingles), the index "
    "side is full — high-df shingles never appear on both sides of the "
    "candidate join. Brute-force oracle proves losslessness.",
)
def containment_quote_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import dedup as dd

    docs = load_table(spark, sf_dir, "documents")
    return dd.containment_join(docs, threshold=0.8, n=3)


@register(
    "quality_logistic_score",
    oracle=f"""
    WITH t AS (SELECT doc_id, {TOKS_SQL} AS toks,
                      trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ',
                                          'g')) AS norm
               FROM documents),
    f AS (SELECT doc_id,
                 len(toks) AS n,
                 round(len(list_distinct(toks)) / len(toks), 6) AS ttr,
                 round(len(list_filter(toks, x -> x IN
                     ('the','of','and','a','to','in','is','it','that',
                      'for'))) / len(toks), 6) AS stop,
                 round(least(CAST(len(toks) AS DOUBLE), 200.0) / 200.0, 6)
                     AS len_sat,
                 round(abs(round(length(replace(norm, ' ', ''))
                                 / len(toks), 6) - 5.0) / 5.0, 6)
                     AS avg_dev
          FROM t WHERE len(toks) > 0),
    s AS (SELECT doc_id,
                 CAST(CAST(-1.0 AS DECIMAL(3,1))
                      + CAST(ttr AS DECIMAL(12,6)) * CAST(2.0 AS DECIMAL(3,1))
                      + CAST(stop AS DECIMAL(12,6)) * CAST(1.5 AS DECIMAL(3,1))
                      + CAST(len_sat AS DECIMAL(12,6)) * CAST(1.0 AS DECIMAL(3,1))
                      + CAST(avg_dev AS DECIMAL(12,6)) * CAST(-0.5 AS DECIMAL(3,1))
                      AS DOUBLE) AS quality_logit
          FROM f)
    SELECT doc_id, quality_logit,
           round(1.0 / (1.0 + exp(-quality_logit)), 6) AS quality_prob,
           round(1.0 / (1.0 + exp(-quality_logit)), 6) >= 0.5 AS keep
    FROM s
    """,
    doc="Model-based quality filter plumbing "
    "(operators/text_analysis.py::quality_logistic): logistic over "
    "interpretable 6-dp-rounded features with fixed documented weights — "
    "swap in learned weights and the zero-shuffle plan is unchanged. "
    "The classifier-based stage (DCLM/fastText-style) of a curation "
    "pipeline, deterministic and fully oracle-checked.",
)
def quality_logistic_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import text_analysis as ta

    docs = load_table(spark, sf_dir, "documents")
    return ta.quality_logistic(docs)


def _curation_v2_oracle() -> str:
    """Composed oracle for curate_v2, stage for stage: containment
    rejection → CDC boilerplate rejection → bigram-LM p10 fluency gate →
    logistic quality gate. Each fragment is the already-proven oracle of
    the standalone query, re-rooted at the previous stage's survivors."""
    return f"""
    WITH {_curation_v2_ctes()}
    SELECT s3.doc_id, s3.text, s3.lang, s3.source, s3.n_chars,
           s3.mean_logprob, ql.quality_prob
    FROM s3 JOIN ql USING (doc_id)
    """


def _curation_v2_ctes() -> str:
    """The curate_v2 CTE chain WITHOUT the wrapping WITH/final select, so
    downstream composed oracles (round11's curated shard manifest) can
    extend the chain instead of string-editing the finished query. The
    survivors are ``s3 JOIN ql USING (doc_id)``."""
    from .llm import _h32_sql

    sh = _shingles_sql(3)
    return f"""
    sh0 AS (SELECT doc_id, unnest({sh}) AS s FROM documents),
    sizes0 AS (SELECT doc_id, COUNT(*) AS sz FROM sh0 GROUP BY 1),
    inter0 AS (SELECT a.doc_id AS ida, b.doc_id AS idb, COUNT(*) AS i
               FROM sh0 a JOIN sh0 b ON a.s = b.s AND a.doc_id <> b.doc_id
               GROUP BY 1, 2),
    cont_drop AS (SELECT DISTINCT ida AS doc_id
                  FROM inter0
                  JOIN sizes0 sa ON sa.doc_id = ida
                  JOIN sizes0 sb ON sb.doc_id = idb
                  WHERE (sa.sz < sb.sz OR (sa.sz = sb.sz AND ida < idb))
                    AND round(i / sa.sz, 6) >= 0.8),
    s1 AS (SELECT * FROM documents
           WHERE doc_id NOT IN (SELECT doc_id FROM cont_drop)),
    t1 AS (SELECT doc_id, {TOKS_SQL} AS toks FROM s1),
    m1 AS (SELECT doc_id,
                  array_to_string(list_transform(toks,
                      t -> CASE WHEN ({_h32_sql('t')}) % 8 = 0
                           THEN '#' || t ELSE t END), ' ') AS marked
           FROM t1),
    ch1 AS (SELECT doc_id,
                   md5(unnest(list_filter(
                       list_transform(string_split(marked, '#'),
                                      x -> trim(x)),
                       x -> x <> ''))) AS chunk_hash
            FROM m1),
    freq1 AS (SELECT chunk_hash, COUNT(DISTINCT doc_id) AS n_docs
              FROM ch1 GROUP BY 1),
    g1 AS (SELECT doc_id, COUNT(*) AS n_chunks,
                  SUM((n_docs >= 2)::BIGINT) AS n_shared
           FROM ch1 JOIN freq1 USING (chunk_hash) GROUP BY doc_id),
    cdc_drop AS (SELECT doc_id FROM g1
                 WHERE round(n_shared / n_chunks, 6) > 0.5),
    s2 AS (SELECT * FROM s1
           WHERE doc_id NOT IN (SELECT doc_id FROM cdc_drop)),
    t2 AS (SELECT doc_id, {TOKS_SQL} AS toks FROM s2),
    v2 AS (SELECT COUNT(DISTINCT tok)::DOUBLE AS vsz
           FROM (SELECT unnest(toks) AS tok FROM t2)),
    bg2 AS (SELECT doc_id,
                   unnest(list_transform(range(1, len(toks)),
                                         i -> toks[i] || ' ' || toks[i + 1]))
                       AS bg
            FROM t2),
    c22 AS (SELECT bg, COUNT(*) AS c2 FROM bg2 GROUP BY 1),
    heads2 AS (SELECT string_split(bg, ' ')[1] AS w1, SUM(c2) AS c1
               FROM c22 GROUP BY 1),
    model2 AS (SELECT bg,
                      CAST(round(ln((c2 + 0.5) / (c1 + 0.5 * vsz)), 6)
                           AS DECIMAL(27,6)) AS lp
               FROM c22 JOIN heads2 ON string_split(c22.bg, ' ')[1] = heads2.w1
               CROSS JOIN v2),
    lm AS (SELECT doc_id,
                  CAST(SUM(lp) AS DOUBLE) / COUNT(*) AS mean_logprob
           FROM bg2 JOIN model2 USING (bg) GROUP BY doc_id),
    p10 AS (SELECT quantile_cont(mean_logprob, 0.1) AS p FROM lm),
    s3 AS (SELECT s2.*, lm.mean_logprob
           FROM s2 JOIN lm USING (doc_id) CROSS JOIN p10
           WHERE lm.mean_logprob >= p10.p),
    t3 AS (SELECT doc_id, {TOKS_SQL} AS toks,
                  trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ',
                                      'g')) AS norm
           FROM s3),
    f3 AS (SELECT doc_id,
                  round(len(list_distinct(toks)) / len(toks), 6) AS ttr,
                  round(len(list_filter(toks, x -> x IN
                      ('the','of','and','a','to','in','is','it','that',
                       'for'))) / len(toks), 6) AS stop,
                  round(least(CAST(len(toks) AS DOUBLE), 200.0) / 200.0, 6)
                      AS len_sat,
                  round(abs(round(length(replace(norm, ' ', ''))
                                  / len(toks), 6) - 5.0) / 5.0, 6)
                      AS avg_dev
           FROM t3 WHERE len(toks) > 0),
    sc3 AS (SELECT doc_id,
                   CAST(CAST(-1.0 AS DECIMAL(3,1))
                        + CAST(ttr AS DECIMAL(12,6))
                          * CAST(2.0 AS DECIMAL(3,1))
                        + CAST(stop AS DECIMAL(12,6))
                          * CAST(1.5 AS DECIMAL(3,1))
                        + CAST(len_sat AS DECIMAL(12,6))
                          * CAST(1.0 AS DECIMAL(3,1))
                        + CAST(avg_dev AS DECIMAL(12,6))
                          * CAST(-0.5 AS DECIMAL(3,1))
                        AS DOUBLE) AS logit
            FROM f3),
    ql AS (SELECT doc_id,
                  round(1.0 / (1.0 + exp(-logit)), 6) AS quality_prob
           FROM sc3
           WHERE round(1.0 / (1.0 + exp(-logit)), 6) >= 0.5)
    """


@register(
    "curation_pipeline_v2",
    oracle=_curation_v2_oracle(),
    doc="Capstone #2: the structural-duplication + fluency curation flow "
    "(operators/curation.py::curate_v2) — containment rejection (drop "
    "excerpts in favor of their source), CDC boilerplate rejection, "
    "bigram-LM p10 fluency gate, logistic quality gate — composed as one "
    "DataFrame pipeline and oracle-checked stage for stage; complements "
    "curation_pipeline's dedup/heuristic stages.",
)
def curation_pipeline_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.curation import curate_v2

    docs = load_table(spark, sf_dir, "documents")
    return curate_v2(docs)


@register(
    "tokenize_to_ids",
    oracle=f"""
    WITH t AS (SELECT doc_id, {TOKS_SQL} AS toks FROM documents),
    pos AS (SELECT doc_id, generate_subscripts(toks, 1) AS pos,
                   unnest(toks) AS tok
            FROM t),
    vocab AS (SELECT tok,
                     CAST(dense_rank() OVER (ORDER BY COUNT(*) DESC, tok)
                          AS INT) AS token_id
              FROM pos GROUP BY tok)
    SELECT doc_id, COUNT(*)::BIGINT AS n_tokens,
           array_to_string(list(token_id ORDER BY pos), ',') AS ids_csv
    FROM pos JOIN vocab USING (tok)
    GROUP BY doc_id
    """,
    doc="Tokenizer-prep encoding (operators/packing.py::tokenize_to_ids): "
    "frequency-sorted dense-rank vocabulary + per-doc token-id sequence "
    "— the step between raw text and sequence assembly/packing. One "
    "token shuffle for the vocab (window over the vocab frame, not the "
    "corpus; cappable to top-K + OOV at scale), broadcast-join encode, "
    "one per-doc regroup with struct-sort ordering.",
)
def tokenize_to_ids_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.packing import tokenize_to_ids

    docs = load_table(spark, sf_dir, "documents")
    # the id sequence ships as a CSV STRING, not array<int>: an array
    # column's pandas rendering depends on the Arrow conf (numpy array
    # under arrow.pyspark.enabled, Python list bare) — the bare
    # driver-style session would hash differently from the oracle's
    # numpy formatting. Strings hash identically everywhere.
    return tokenize_to_ids(docs).select(
        "doc_id", "n_tokens", F.array_join("token_ids", ",").alias("ids_csv")
    )


@register(
    "quality_by_source_rollup",
    oracle=f"""
    WITH t AS (SELECT doc_id, source, {TOKS_SQL} AS toks,
                      trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ',
                                          'g')) AS norm
               FROM documents),
    f AS (SELECT doc_id, source,
                 len(toks) AS n,
                 round(len(list_distinct(toks)) / len(toks), 6) AS ttr,
                 round(len(list_filter(toks, x -> x IN
                     ('the','of','and','a','to','in','is','it','that',
                      'for'))) / len(toks), 6) AS stop,
                 round(least(CAST(len(toks) AS DOUBLE), 200.0) / 200.0, 6)
                     AS len_sat,
                 round(abs(round(length(replace(norm, ' ', ''))
                                 / len(toks), 6) - 5.0) / 5.0, 6)
                     AS avg_dev
          FROM t WHERE len(toks) > 0),
    s AS (SELECT doc_id, source,
                 CAST(CAST(-1.0 AS DECIMAL(3,1))
                      + CAST(ttr AS DECIMAL(12,6)) * CAST(2.0 AS DECIMAL(3,1))
                      + CAST(stop AS DECIMAL(12,6)) * CAST(1.5 AS DECIMAL(3,1))
                      + CAST(len_sat AS DECIMAL(12,6))
                        * CAST(1.0 AS DECIMAL(3,1))
                      + CAST(avg_dev AS DECIMAL(12,6))
                        * CAST(-0.5 AS DECIMAL(3,1))
                      AS DOUBLE) AS logit
          FROM f),
    q AS (SELECT source,
                 CAST(round(1.0 / (1.0 + exp(-logit)), 6)
                      AS DECIMAL(27,6)) AS prob
          FROM s)
    SELECT source, COUNT(*)::BIGINT AS n_docs,
           CAST(SUM((prob >= 0.5)::BIGINT) AS DOUBLE) / COUNT(*)
               AS keep_rate,
           CAST(SUM(prob) AS DOUBLE) / COUNT(*) AS avg_prob
    FROM q GROUP BY ROLLUP (source)
    """,
    doc="Per-source quality report with grand total (GROUP BY ROLLUP): "
    "doc counts, classifier keep-rate, mean quality probability — the "
    "monitoring view a curation pipeline publishes per ingest batch. "
    "Composes quality_logistic inline; probs are 6-dp decimals so the "
    "means are partitioning-independent raw doubles (no final round — "
    "see the half-boundary note in NOTES_r4).",
)
def quality_by_source_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import text_analysis as ta

    docs = load_table(spark, sf_dir, "documents")
    scored = ta.quality_logistic(docs).join(
        docs.select("doc_id", "source"), "doc_id"
    )
    prob_dec = F.col("quality_prob").cast("decimal(27,6)")
    return (
        scored.rollup("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            (
                F.sum(F.col("keep").cast("long")).cast("double")
                / F.count(F.lit(1))
            ).alias("keep_rate"),
            (F.sum(prob_dec).cast("double") / F.count(F.lit(1))).alias(
                "avg_prob"
            ),
        )
    )


@register(
    "sample_negatives_contrastive",
    oracle=f"""
    WITH e AS (SELECT vec_id, embedding FROM embeddings),
    norms AS (SELECT vec_id, sqrt(s) AS nrm FROM
                (SELECT vec_id, SUM(x * x) AS s FROM
                   (SELECT vec_id, unnest(embedding)::DOUBLE AS x FROM e)
                 GROUP BY vec_id)),
    dots AS (SELECT q_id, c_id, SUM(qx * cx) AS dot FROM
               (SELECT q.vec_id AS q_id, c.vec_id AS c_id,
                       unnest(q.embedding)::DOUBLE AS qx,
                       unnest(c.embedding)::DOUBLE AS cx
                FROM e q JOIN e c ON q.vec_id <> c.vec_id
                WHERE q.vec_id < 5)
             GROUP BY q_id, c_id),
    truth AS (SELECT query_id, neighbor_id FROM
                (SELECT q_id AS query_id, c_id AS neighbor_id,
                        row_number() OVER (PARTITION BY q_id
                            ORDER BY round(dot / (nq.nrm * nc.nrm), 6) DESC,
                                     c_id) AS rn
                 FROM dots JOIN norms nq ON nq.vec_id = q_id
                           JOIN norms nc ON nc.vec_id = c_id)
              WHERE rn <= 10),
    cand AS (SELECT q.vec_id AS query_id, c.vec_id AS neg_id,
                    ('0x' || substr(md5(CAST(q.vec_id AS VARCHAR) || ':' ||
                                        CAST(c.vec_id AS VARCHAR)), 1, 8))
                        ::BIGINT AS h
             FROM e q CROSS JOIN e c
             WHERE q.vec_id < 5 AND c.vec_id <> q.vec_id
               AND NOT EXISTS (SELECT 1 FROM truth t
                               WHERE t.query_id = q.vec_id
                                 AND t.neighbor_id = c.vec_id))
    SELECT query_id, neg_id, CAST(rnk AS INT) AS "rank" FROM
      (SELECT query_id, neg_id,
              row_number() OVER (PARTITION BY query_id
                                 ORDER BY h, neg_id) AS rnk
       FROM cand)
    WHERE rnk <= 20
    """,
    doc="Deterministic negative sampling for contrastive training "
    "(operators/similarity.py::sample_negatives): per query, 20 corpus "
    "items that are neither the query nor its exact top-10 neighbors, "
    "selected by portable-hash order (reproducible, rand()-free, "
    "hard-negative-free at the exclusion depth). Queries broadcast; "
    "per-query hash rank is a TakeOrdered.",
)
def sample_negatives_contrastive(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import similarity as sim

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    return sim.sample_negatives(emb, queries, k_neg=20, exclude_topk=10)


@register(
    "label_centroid_similarity",
    oracle="""
    WITH e AS (SELECT label AS lbl, generate_subscripts(embedding, 1) AS dim,
                      CAST(unnest(embedding) AS DOUBLE) AS x
               FROM embeddings),
    mu AS (SELECT lbl, dim,
                  CAST(SUM(CAST(round(x, 6) AS DECIMAL(27,6))) AS DOUBLE)
                      / COUNT(*) AS mu
           FROM e GROUP BY lbl, dim),
    norms AS (SELECT lbl,
                     sqrt(CAST(SUM(CAST(round(mu * mu, 6) AS DECIMAL(27,6)))
                               AS DOUBLE)) AS nrm
              FROM mu GROUP BY lbl),
    dots AS (SELECT a.lbl AS label_a, b.lbl AS label_b,
                    CAST(SUM(CAST(round(a.mu * b.mu, 6) AS DECIMAL(27,6)))
                         AS DOUBLE) AS dot
             FROM mu a JOIN mu b ON a.dim = b.dim AND a.lbl < b.lbl
             GROUP BY 1, 2)
    SELECT label_a, label_b,
           round(dot / (na.nrm * nb.nrm), 6) AS cosine
    FROM dots
    JOIN norms na ON na.lbl = dots.label_a
    JOIN norms nb ON nb.lbl = dots.label_b
    """,
    doc="Pairwise cosine between per-label centroid vectors "
    "(operators/similarity.py::label_centroid_similarity) — the domain-"
    "similarity map for mixture planning. Fully exact: decimal-summed "
    "centroids, 6-dp-rounded dot/norm terms; corpus size only touches "
    "the first |labels|*d aggregate.",
)
def label_centroid_similarity_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import label_centroid_similarity

    emb = load_table(spark, sf_dir, "embeddings")
    return label_centroid_similarity(emb)


def _winnow_oracle(k: int, w: int, min_shared: int) -> str:
    from .llm import _h32_sql

    sh = (
        f"list_transform(range(1, len({TOKS_SQL}) - {k - 2}), "
        f"i -> array_to_string(list_slice({TOKS_SQL}, i, i + {k - 1}), ' '))"
    )
    return f"""
    WITH h AS (SELECT doc_id,
                      list_transform({sh}, s -> {_h32_sql('s')}) AS hs
               FROM documents),
    fp AS (SELECT DISTINCT doc_id, fp FROM
             (SELECT doc_id,
                     unnest(list_transform(range(1, len(hs) - {w - 2}),
                         i -> list_min(list_slice(hs, i, i + {w - 1}))))
                         AS fp
              FROM h)),
    pairs AS (SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
                     COUNT(*)::BIGINT AS n_shared_fp
              FROM fp a JOIN fp b
                ON a.fp = b.fp AND a.doc_id < b.doc_id
              GROUP BY 1, 2)
    SELECT doc_id_a, doc_id_b, n_shared_fp
    FROM pairs WHERE n_shared_fp >= {min_shared}
    """


@register(
    "winnowing_fingerprint_pairs",
    oracle=_winnow_oracle(4, 4, 2),
    doc="MOSS-style winnowing (operators/dedup.py::"
    "winnowing_fingerprint_pairs): per-window minimum k-gram hashes "
    "subsample the shingle table ~1/w (measured ~3x here) with the hard "
    "guarantee that any verbatim match of >= w+k-1 tokens is found — "
    "the overlapping-window sibling of CDC chunking. Fingerprinting is "
    "zero-shuffle zip-shift algebra; only the hash equi-join and pair "
    "count shuffle.",
)
def winnowing_fingerprint_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import dedup as dd

    docs = load_table(spark, sf_dir, "documents")
    return dd.winnowing_fingerprint_pairs(docs, k=4, w=4, min_shared=2)


@register(
    "bpe_pair_stats_top50",
    oracle=f"""
    WITH w AS (SELECT unnest({TOKS_SQL}) AS w FROM documents),
    p AS (SELECT unnest(list_transform(range(1, len(w)),
                                       i -> substr(w, i, 2))) AS pair
          FROM w),
    c AS (SELECT pair, COUNT(*)::BIGINT AS pair_count FROM p GROUP BY 1),
    r AS (SELECT pair, pair_count,
                 row_number() OVER (ORDER BY pair_count DESC, pair) AS rnk
          FROM c)
    SELECT pair, pair_count, CAST(rnk AS INT) AS "rank"
    FROM r WHERE rnk <= 50
    """,
    doc="BPE merge-step-0 statistics: the top-50 adjacent CHARACTER "
    "pairs inside corpus tokens — exactly the frequency table byte-pair "
    "encoding consults for its first merge, and the other half of "
    "tokenizer prep beside vocab_topk/tokenize_to_ids. One char-pair "
    "shuffle with map-side partials; TakeOrdered top-k.",
)
def bpe_pair_stats_top50(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..functions.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    # filter 1-char words BEFORE sequence(): Spark's sequence(1, 0)
    # DESCENDS ([1, 0]) instead of returning empty like DuckDB range(1,1)
    w = docs.select(F.explode(tokens("text")).alias("w")).filter(
        F.length("w") >= 2
    )
    pairs = w.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("w") - 1),
                lambda i: F.col("w").substr(i, F.lit(2)),
            )
        ).alias("pair")
    )
    c = pairs.groupBy("pair").agg(
        F.count(F.lit(1)).cast("long").alias("pair_count")
    )
    top = c.orderBy(F.desc("pair_count"), "pair").limit(50)
    win = Window.orderBy(F.desc("pair_count"), "pair")
    return top.select(
        "pair", "pair_count", F.row_number().over(win).cast("int").alias("rank")
    )


@register(
    "psi_price_drift",
    oracle="""
    WITH old AS (SELECT o_totalprice AS v FROM orders
                 WHERE o_orderkey % 2 = 0 AND o_totalprice IS NOT NULL),
    newer AS (SELECT o_totalprice AS v FROM orders
              WHERE o_orderkey % 2 = 1 AND o_totalprice IS NOT NULL),
    grid AS (SELECT unnest(range(0, 12)) AS bin),
    co AS (SELECT CASE WHEN v < 0.0 THEN 0
                       WHEN v >= 600000.0 THEN 11
                       ELSE CAST(floor((v - 0.0) / 600000.0 * 10) AS INT) + 1
                  END AS bin, COUNT(*) AS n_old
           FROM old GROUP BY 1),
    cn AS (SELECT CASE WHEN v < 0.0 THEN 0
                       WHEN v >= 600000.0 THEN 11
                       ELSE CAST(floor((v - 0.0) / 600000.0 * 10) AS INT) + 1
                  END AS bin, COUNT(*) AS n_new
           FROM newer GROUP BY 1),
    counts AS (SELECT g.bin,
                      COALESCE(co.n_old, 0)::BIGINT AS n_old,
                      COALESCE(cn.n_new, 0)::BIGINT AS n_new
               FROM grid g
               LEFT JOIN co ON co.bin = g.bin
               LEFT JOIN cn ON cn.bin = g.bin),
    tot AS (SELECT SUM(n_old) AS t_old, SUM(n_new) AS t_new FROM counts)
    SELECT bin, n_old, n_new,
           round(((n_old + 0.5) / (t_old + 0.5 * 12.0)
                  - (n_new + 0.5) / (t_new + 0.5 * 12.0))
                 * ln(((n_old + 0.5) / (t_old + 0.5 * 12.0))
                      / ((n_new + 0.5) / (t_new + 0.5 * 12.0))), 6)
               AS psi_contrib
    FROM counts CROSS JOIN tot
    """,
    doc="Population Stability Index between order snapshots (even vs odd "
    "orderkeys) over the fixed price grid "
    "(operators/profiling.py::psi_between) — the drift alarm risk/data "
    "teams publish per ingest batch (<0.1 stable, >0.25 shifted). Two "
    "map-side-combinable bin aggregates shuffling <= n_bins+2 rows each; "
    "add-0.5 smoothing keeps ln defined; per-bin contributions are "
    "exact-count arithmetic, so no float summation order exists.",
)
def psi_price_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.profiling import psi_between

    orders = load_table(spark, sf_dir, "orders")
    old = orders.filter(F.col("o_orderkey") % 2 == 0).select("o_totalprice")
    new = orders.filter(F.col("o_orderkey") % 2 == 1).select("o_totalprice")
    return psi_between(old, new, "o_totalprice", lo=0.0, hi=600000.0)


def _dedup_ratio_oracle() -> str:
    from .llm import _minhash_pairs_ctes

    return f"""
    WITH {_minhash_pairs_ctes(0.5)},
    keep AS (SELECT MIN(doc_id) AS keeper FROM documents GROUP BY md5(text)),
    exact_dup AS (SELECT doc_id FROM documents
                  WHERE doc_id NOT IN (SELECT keeper FROM keep)),
    near_dup AS (SELECT DISTINCT doc_id_b AS doc_id FROM pairs)
    SELECT d.source,
           COUNT(*)::BIGINT AS n_docs,
           CAST(SUM((d.doc_id IN (SELECT doc_id FROM exact_dup))::BIGINT)
                AS BIGINT) AS n_exact_dups,
           CAST(SUM((d.doc_id IN (SELECT doc_id FROM near_dup))::BIGINT)
                AS BIGINT) AS n_near_dups,
           CAST(SUM((d.doc_id IN (SELECT doc_id FROM near_dup))::BIGINT)
                AS DOUBLE) / COUNT(*) AS near_dup_rate
    FROM documents d GROUP BY d.source
    """


@register(
    "dedup_ratio_by_source",
    oracle=_dedup_ratio_oracle(),
    doc="Per-source duplication report: doc counts, exact-duplicate "
    "count (non-keepers per text hash) and near-duplicate count "
    "(minhash pair b-sides) with the near-dup rate — the governance "
    "rollup that tells you WHICH feed is polluting the corpus, built "
    "from the same verified pair machinery as the dedup operators. "
    "Rates are exact-long divisions (no float summation), so the value "
    "is partitioning-independent unrounded.",
)
def dedup_ratio_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import dedup as dd

    docs = load_table(spark, sf_dir, "documents")
    keep = dd.exact_duplicates(docs).select(
        F.col("keep_doc_id").alias("doc_id"), F.lit(1).alias("__k")
    )
    near = (
        dd.minhash_near_duplicates(docs, threshold=0.5)
        .select(F.col("doc_id_b").alias("doc_id"))
        .distinct()
        .withColumn("__n", F.lit(1))
    )
    j = (
        docs.select("doc_id", "source")
        .join(keep, "doc_id", "left")
        .join(near, "doc_id", "left")
    )
    return j.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.when(F.col("__k").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_exact_dups"),
        F.sum(F.when(F.col("__n").isNotNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_near_dups"),
        (
            F.sum(F.when(F.col("__n").isNotNull(), 1).otherwise(0)).cast(
                "double"
            )
            / F.count(F.lit(1))
        ).alias("near_dup_rate"),
    )


@register(
    "audio_pcm_clip_stats",
    # text is pure ASCII in the fixtures, so ord(char) == byte value and
    # the int16-LE decode is replicable in SQL: sample_i =
    # ord(c[2i+1]) + 256*ord(c[2i+2]), signed.
    oracle="""
    WITH s AS (SELECT doc_id AS media_id,
                      unnest(range(0, len(text) // 2)) AS i, text
               FROM documents),
    v AS (SELECT media_id,
                 CASE WHEN u >= 32768 THEN u - 65536 ELSE u END AS v
          FROM (SELECT media_id,
                       ord(substr(text, CAST(i * 2 + 1 AS INT), 1))
                       + 256 * ord(substr(text, CAST(i * 2 + 2 AS INT), 1))
                           AS u
                FROM s))
    SELECT media_id, COUNT(*)::BIGINT AS n_samples,
           round(sqrt(CAST(SUM(v * v) AS DOUBLE) / COUNT(*)), 6) AS rms,
           CAST(MAX(abs(v)) AS BIGINT) AS peak
    FROM v GROUP BY media_id
    """,
    doc="Raw-PCM16 audio clip statistics (operators/multimodal.py::"
    "audio_pcm_stats) — the loudness/clipping screen of an audio "
    "pipeline, and the one media decode that needs NO codec (int16 byte "
    "pairs), so unlike the stubbed image path this kernel is REAL and "
    "still exactly oracle-checked (ASCII text bytes as PCM; int16 "
    "squares sum exactly in float64/BIGINT). Arrow-batched mapInPandas, "
    "no shuffle.",
)
def audio_pcm_clip_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import audio_pcm_stats

    docs = load_table(spark, sf_dir, "documents")
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "UTF-8").alias("content"),
    )
    return audio_pcm_stats(media)


@register(
    "dedup_sorted_neighborhood",
    oracle=f"""
    WITH nrm AS (SELECT doc_id,
                        substr(trim(regexp_replace(lower(text),
                                                   '[^a-z0-9]+', ' ', 'g')),
                               1, 16) AS k
                 FROM documents),
    r AS (SELECT doc_id,
                 row_number() OVER (ORDER BY k, doc_id) - 1 AS pos
          FROM nrm),
    cand AS (SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b
             FROM r a JOIN r b ON b.pos - a.pos BETWEEN 1 AND 2),
    sh AS (SELECT doc_id, unnest({_shingles_sql(3)}) AS s FROM documents),
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY 1),
    inter AS (SELECT c.doc_id_a, c.doc_id_b, COUNT(*) AS i
              FROM cand c
              JOIN sh t1 ON t1.doc_id = c.doc_id_a
              JOIN sh t2 ON t2.doc_id = c.doc_id_b AND t2.s = t1.s
              GROUP BY 1, 2)
    SELECT inter.doc_id_a, inter.doc_id_b,
           round(i / (sa.sz + sb.sz - i), 6) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = inter.doc_id_a
    JOIN sizes sb ON sb.doc_id = inter.doc_id_b
    WHERE round(i / (sa.sz + sb.sz - i), 6) >= 0.5
    """,
    doc="Sorted-neighborhood dedup (Hernández/Stolfo; "
    "operators/dedup.py::sorted_neighborhood_pairs): sort by a compact "
    "normalized-text prefix key, compare each doc with its next 2 "
    "neighbors, exact-verify — candidate volume is exactly "
    "(window-1)·n, the predictability blocking/LSH can't promise on hot "
    "buckets; recall is key-dependent (multi-pass with different keys "
    "is the standard fix). The global rank is the distributed prefix "
    "sum, never a single-partition window.",
)
def dedup_sorted_neighborhood(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import dedup as dd

    docs = load_table(spark, sf_dir, "documents")
    return dd.sorted_neighborhood_pairs(docs, window=3, threshold=0.5)
