"""LLM-data-pipeline queries (dedup / similarity / text analysis) with
DuckDB oracles.

These are the greenfield scale operators (SURVEY.md §7 M5 — no reference
pendant). The oracle SQL strings are generated from the SAME constants as
the Spark implementations (MinHash permutation coefficients, SimHash bit
width, LSH banding), so the probabilistic stages are replicated exactly —
the comparison is deterministic even where the algorithm is approximate.

DuckDB-vs-Spark portability notes baked into the fragments below:
- tokenization twins: Spark `split`/`filter` ≡ DuckDB
  `string_split`/`list_filter` over the identically-normalized string;
- portable hashes: Spark `conv(substr(md5(x),1,N),16,10)` ≡ DuckDB
  `('0x'||substr(md5(x),1,N))::BIGINT`;
- cosine values rounded to 6 dp before ranking on both sides so float
  summation order cannot flip the comparison.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import dedup as dd
from ..operators import similarity as sim
from ..operators import text_analysis as ta
from ..sources.fixtures import load_table
from .registry import REGISTRY, register

# --- DuckDB SQL fragments (twins of functions/text.py) ---------------------

NORM_SQL = "trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))"
TOKS_SQL = f"list_filter(string_split({NORM_SQL}, ' '), t -> t <> '')"


def _shingles_sql(n: int = 3) -> str:
    """Distinct n-word shingles of the token list (DuckDB twin of
    functions/text.py::distinct_shingles)."""
    return (
        f"list_distinct(list_transform(range(1, len({TOKS_SQL}) - {n - 2}), "
        f"i -> array_to_string(list_slice({TOKS_SQL}, i, i + {n - 1}), ' ')))"
    )


def _h32_sql(expr: str) -> str:
    return f"('0x' || substr(md5({expr}), 1, 8))::BIGINT"


def _h60_sql(expr: str) -> str:
    return f"('0x' || substr(md5({expr}), 1, 15))::BIGINT"


def _recall_contract(
    truth: DataFrame, approx: DataFrame, bound: float
) -> DataFrame:
    """Per-query recall contract for approximate-ANN queries.

    ``truth``/``approx`` carry (query_id, neighbor_id[, ...]); output is
    (query_id, n_true, recall_ok) where recall_ok ⇔ |approx ∩ truth| /
    |truth| ≥ ``bound``. Both inputs are deterministic (md5-seeded
    bucketing, fixed data), so recall_ok is a stable value an oracle can
    assert — the driver check fails iff the approximate index loses more
    of the true neighbors than the bound allows."""
    t = truth.select("query_id", "neighbor_id")
    hits = t.join(approx.select("query_id", "neighbor_id"),
                  ["query_id", "neighbor_id"], "left_semi")
    n_true = t.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_true"))
    n_hit = hits.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_hit"))
    return n_true.join(n_hit, "query_id", "left").select(
        "query_id",
        "n_true",
        (
            (F.coalesce(F.col("n_hit"), F.lit(0)) / F.col("n_true"))
            >= F.lit(bound)
        ).alias("recall_ok"),
    )


# ---------------------------------------------------------------------------
# Deduplication
# ---------------------------------------------------------------------------


@register(
    "dedup_exact",
    oracle="""
    SELECT md5(text) AS text_hash, MIN(doc_id) AS keep_doc_id,
           COUNT(*) AS dup_count
    FROM documents GROUP BY 1
    """,
    doc="Exact dedup: hash-groupBy on md5(text); one shuffle on a 16-byte "
    "key at any scale.",
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return dd.exact_duplicates(docs)


def _sig_bands_ctes(source: str = "documents") -> str:
    """CTE fragment ``sh → th → sig → bands`` — the shared MinHash
    signature + LSH banding replica (same constants as the Spark
    implementation), reused by every minhash-family oracle (here and
    plans/round8.py's salvaged variant)."""
    mins = ",\n           ".join(
        f"MIN(({a} * h + {b}) % {dd.MERSENNE_P}) AS mh{i}"
        for i, (a, b) in enumerate(zip(dd.MINHASH_A, dd.MINHASH_B))
    )
    band_rows = []
    for j in range(dd.LSH_BANDS):
        cols = [f"mh{j * dd.LSH_ROWS + r}" for r in range(dd.LSH_ROWS)]
        sig = " || ',' || ".join(cols)
        band_rows.append(
            f"SELECT doc_id, {j} AS band_id, {sig} AS band_sig FROM sig"
        )
    bands = "\n         UNION ALL ".join(band_rows)
    return f"""sh AS (SELECT doc_id, unnest({_shingles_sql(3)}) AS s FROM {source}),
    th AS (SELECT doc_id, {_h32_sql('s')} AS h FROM sh),
    sig AS (SELECT doc_id, {mins}
            FROM th GROUP BY doc_id),
    bands AS ({bands})"""


def _minhash_pairs_ctes(threshold: float, source: str = "documents") -> str:
    """CTE chain ending in ``pairs(doc_id_a, doc_id_b, jaccard)`` — shared
    by the pair query and the connected-components oracle."""
    return f"""{_sig_bands_ctes(source)},
    cand AS (SELECT DISTINCT b1.doc_id AS doc_id_a, b2.doc_id AS doc_id_b
             FROM bands b1 JOIN bands b2
               ON b1.band_id = b2.band_id AND b1.band_sig = b2.band_sig
              AND b1.doc_id < b2.doc_id),
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
    inter AS (SELECT c.doc_id_a, c.doc_id_b, COUNT(*) AS i
              FROM cand c
              JOIN sh t1 ON t1.doc_id = c.doc_id_a
              JOIN sh t2 ON t2.doc_id = c.doc_id_b AND t2.s = t1.s
              GROUP BY c.doc_id_a, c.doc_id_b),
    pairs AS (SELECT inter.doc_id_a, inter.doc_id_b,
                     round(i / (sa.sz + sb.sz - i), 6) AS jaccard
              FROM inter
              JOIN sizes sa ON sa.doc_id = inter.doc_id_a
              JOIN sizes sb ON sb.doc_id = inter.doc_id_b
              WHERE round(i / (sa.sz + sb.sz - i), 6) >= {threshold})"""


def _minhash_oracle(threshold: float, source: str = "documents") -> str:
    return f"""
    WITH {_minhash_pairs_ctes(threshold, source)}
    SELECT doc_id_a, doc_id_b, jaccard FROM pairs
    """


@register(
    "dedup_minhash_lsh",
    oracle=_minhash_oracle(0.5),
    bench=True,
    doc="MinHash(16)+LSH(4×4) near-dup pairs verified by exact shingle "
    "Jaccard. The oracle replicates the banding, so the probabilistic "
    "candidate stage compares deterministically.",
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return dd.minhash_near_duplicates(docs, threshold=0.5)


@register(
    "dedup_cluster_assign",
    oracle=f"""
    WITH RECURSIVE {_minhash_pairs_ctes(0.5)},
    edges AS (SELECT doc_id_a AS a, doc_id_b AS b FROM pairs
              UNION ALL
              SELECT doc_id_b, doc_id_a FROM pairs),
    reach(a, b) AS (
        SELECT a, b FROM edges
        UNION
        SELECT r.a, e.b FROM reach r JOIN edges e ON e.a = r.b
    )
    SELECT a AS doc_id, LEAST(a, MIN(b)) AS cluster_id
    FROM reach GROUP BY a
    """,
    doc="Near-dup CLUSTER resolution over the MinHash-LSH pair graph: each "
    "doc labeled with the min doc_id in its connected component (keeping "
    "one doc per PAIR over-deletes when A~B~C but A≁C). Spark: iterative "
    "min-label propagation, one shuffle-join per round, label-sum "
    "convergence test; oracle: recursive transitive closure. See "
    "operators/dedup.py::connected_components for the 100 TB notes "
    "(large-star/small-star escalation path).",
)
def dedup_cluster_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    pairs = dd.minhash_near_duplicates(docs, threshold=0.5)
    return dd.connected_components(pairs)


@register(
    "decontaminate_ngram_overlap",
    oracle=f"""
    WITH t AS (SELECT doc_id, unnest({_shingles_sql(3)}) AS s
               FROM documents WHERE doc_id % 97 <> 0),
    b AS (SELECT doc_id AS bench_doc_id, unnest({_shingles_sql(3)}) AS s
          FROM documents WHERE doc_id % 97 = 0)
    SELECT t.doc_id, bench_doc_id, COUNT(*) AS n_shared
    FROM t JOIN b ON t.s = b.s
    GROUP BY 1, 2 HAVING COUNT(*) >= 3
    """,
    doc="Decontamination (pre-training hygiene): flag training docs "
    "sharing >= 3 distinct 3-gram shingles with any benchmark doc "
    "(benchmark = the deterministic doc_id %% 97 == 0 slice here). The "
    "small benchmark shingle set BROADCASTS, so the training corpus is "
    "touched once by a broadcast hash join — no self-join at any scale.",
)
def decontaminate_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    train = docs.filter(F.col("doc_id") % 97 != 0)
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    return dd.ngram_contamination(train, bench, min_overlap=3)


@register(
    "dedup_ngram_jaccard",
    oracle=f"""
    WITH sh AS (SELECT doc_id, unnest({_shingles_sql(3)}) AS s FROM documents),
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
    cand AS (SELECT DISTINCT s1.doc_id AS doc_id_a, s2.doc_id AS doc_id_b
             FROM sh s1 JOIN sh s2 ON s1.s = s2.s AND s1.doc_id < s2.doc_id),
    inter AS (SELECT c.doc_id_a, c.doc_id_b, COUNT(*) AS i
              FROM cand c
              JOIN sh t1 ON t1.doc_id = c.doc_id_a
              JOIN sh t2 ON t2.doc_id = c.doc_id_b AND t2.s = t1.s
              GROUP BY c.doc_id_a, c.doc_id_b)
    SELECT inter.doc_id_a, inter.doc_id_b,
           round(i / (sa.sz + sb.sz - i), 6) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = inter.doc_id_a
    JOIN sizes sb ON sb.doc_id = inter.doc_id_b
    WHERE round(i / (sa.sz + sb.sz - i), 6) >= 0.5
    """,
    doc="All-pairs 3-gram Jaccard via shingle equi-join (exact; the "
    "ground-truth twin of the LSH variant).",
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return dd.ngram_jaccard_pairs(docs, threshold=0.5)


def _simhash_oracle(max_hamming: int) -> str:
    bit_sums = ",\n           ".join(
        f"SUM(CASE WHEN (h >> {j}) & 1 = 1 THEN 1 ELSE -1 END) AS b{j}"
        for j in range(dd.SIMHASH_BITS)
    )
    fp_terms = " + ".join(
        f"(CASE WHEN b{j} >= 0 THEN {1 << j} ELSE 0 END)"
        for j in range(dd.SIMHASH_BITS)
    )
    return f"""
    WITH sh AS (SELECT doc_id, unnest({_shingles_sql(3)}) AS s FROM documents),
    th AS (SELECT doc_id, {_h60_sql('s')} AS h FROM sh),
    sums AS (SELECT doc_id, {bit_sums}
             FROM th GROUP BY doc_id),
    fp AS (SELECT doc_id, CAST({fp_terms} AS BIGINT) AS simhash FROM sums)
    SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
    FROM fp a JOIN fp b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= {max_hamming}
    """


@register(
    "dedup_simhash",
    oracle=_simhash_oracle(dd.SIMHASH_MAX_HAMMING),
    doc="60-bit SimHash near-dup pairs (hamming <= 3). Spark side generates "
    "candidates by 4×15-bit banding (lossless for hamming <= 3 by "
    "pigeonhole); the oracle scans all pairs — same output, different cost.",
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return dd.simhash_near_duplicates(docs)


@register(
    "dedup_embedding_cosine",
    oracle="""
    WITH e AS (SELECT vec_id, embedding FROM embeddings),
    norms AS (SELECT vec_id, sqrt(s) AS nrm FROM
                (SELECT vec_id, SUM(x * x) AS s FROM
                   (SELECT vec_id, unnest(embedding)::DOUBLE AS x FROM e)
                 GROUP BY vec_id)),
    dots AS (SELECT a_id, b_id, SUM(ax * bx) AS dot FROM
               (SELECT a.vec_id AS a_id, b.vec_id AS b_id,
                       unnest(a.embedding)::DOUBLE AS ax,
                       unnest(b.embedding)::DOUBLE AS bx
                FROM e a JOIN e b ON a.vec_id < b.vec_id)
             GROUP BY a_id, b_id)
    SELECT a_id AS vec_id_a, b_id AS vec_id_b,
           round(dot / (na.nrm * nb.nrm), 6) AS cosine
    FROM dots JOIN norms na ON na.vec_id = a_id
              JOIN norms nb ON nb.vec_id = b_id
    WHERE round(dot / (na.nrm * nb.nrm), 6) >= 0.42
    """,
    doc="Embedding-cosine near-dup pairs (exact all-pairs; ground truth for "
    "the LSH-bucketed scale path). Threshold 0.42 is fixture-calibrated: "
    "the synthetic embeddings' cosine mass tops out near 0.5, so a "
    "production-style 0.9+ cutoff selects ZERO rows at every SF and the "
    "oracle check would pass vacuously; production corpora use 0.9+.",
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return sim.embedding_near_duplicates(emb, threshold=0.42)


# ---------------------------------------------------------------------------
# Similarity search
# ---------------------------------------------------------------------------


@register(
    "ann_cosine_topk",
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
                FROM e q JOIN e c ON q.vec_id <> c.vec_id
                WHERE q.vec_id < 5)
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
    WHERE rn <= 10
    """,
    bench=True,
    doc="Brute-force cosine top-10 for query vectors (vec_id < 5): the exact "
    "ANN baseline. Queries broadcast; corpus stays partitioned; dot product "
    "folds JVM-side (zip_with + aggregate).",
)
def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    return sim.cosine_topk(emb, queries, k=10)


@register(
    "ann_lsh_bucketed",
    # The bucketing is engine-specific, but its per-query RECALL against
    # the exact brute-force top-k is a deterministic number (md5-derived
    # hyperplanes, fixed data) — so the checkable contract is the recall
    # bound, computed in-query against cosine_topk and asserted by a
    # trivially-expressible oracle. A broken bucketing (wrong planes, lost
    # candidates, bad dedup) collapses recall to ~0 and flips recall_ok.
    # Measured per-query recall@10: ≥0.6 at sf0.01, ≥0.7 at sf0.001.
    oracle="""
    SELECT vec_id AS query_id, CAST(10 AS BIGINT) AS n_true,
           TRUE AS recall_ok
    FROM embeddings WHERE vec_id < 5
    """,
    doc="LSH-bucketed approximate cosine top-10 (8 deterministic "
    "hyperplane tables): the 100-TB scale path — candidates shrink ~2^8 vs "
    "brute force. Emits the per-query recall contract vs the exact "
    "brute-force twin (bound 0.5; measured ≥0.6); raw neighbor pairs via "
    "operators/similarity.py::lsh_bucketed_topk, recall also pinned in "
    "tests/test_similarity.py.",
)
def ann_lsh_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    lsh = sim.lsh_bucketed_topk(emb, queries, k=10).select(
        "query_id", "neighbor_id"
    )
    return _recall_contract(sim.cosine_topk(emb, queries, k=10), lsh, 0.5)


# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------


@register(
    "text_quality_score",
    oracle=f"""
    SELECT doc_id,
           len({TOKS_SQL}) AS n_tokens,
           len(list_distinct({TOKS_SQL})) AS n_distinct_tokens,
           round(len(list_distinct({TOKS_SQL})) / len({TOKS_SQL}), 6) AS ttr,
           round(length(replace({NORM_SQL}, ' ', '')) / len({TOKS_SQL}), 6)
               AS avg_token_len,
           round(len(list_filter({TOKS_SQL},
                     t -> list_contains(['the','of','and','a','to','in','is','it','that','for'], t)))
                 / len({TOKS_SQL}), 6) AS stopword_ratio,
           round((len(list_distinct({TOKS_SQL})) / len({TOKS_SQL}))
                 * least(1.0, len({TOKS_SQL}) / 50.0), 6) AS quality_score
    FROM documents
    """,
    bench=True,
    doc="Per-doc quality features (length, diversity, stopword ratio) + "
    "composite score — all codegen'd column expressions.",
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return ta.quality_metrics(docs)


def _langid_oracle() -> str:
    hits = []
    for lang in ta.LANGS:
        lst = ", ".join(f"'{w}'" for w in ta.STOPWORDS[lang])
        hits.append(
            f"len(list_filter({TOKS_SQL}, t -> list_contains([{lst}], t))) AS hits_{lang}"
        )
    # cascade: first lang (in LANGS order) with max hits and > 0 wins
    cases = []
    for i, lang in enumerate(ta.LANGS):
        conds = [f"hits_{lang} > 0"]
        for j, other in enumerate(ta.LANGS):
            if j < i:
                conds.append(f"hits_{lang} > hits_{other}")
            elif j > i:
                conds.append(f"hits_{lang} >= hits_{other}")
        cases.append(f"WHEN {' AND '.join(conds)} THEN '{lang}'")
    case_sql = "CASE " + " ".join(cases) + " ELSE 'unknown' END"
    return f"""
    SELECT doc_id, lang, hits_en, hits_de, hits_fr, hits_es,
           {case_sql} AS predicted_lang
    FROM (SELECT doc_id, lang, {', '.join(hits)} FROM documents)
    """


@register(
    "lang_id_heuristic",
    oracle=_langid_oracle(),
    doc="Stopword-hit language heuristic with deterministic argmax cascade.",
)
def lang_id_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return ta.language_id(docs)


@register(
    "token_count",
    oracle=f"""
    SELECT doc_id,
           len({TOKS_SQL}) AS n_ws_tokens,
           len(regexp_extract_all(lower(text), '[a-z0-9]+|[^a-z0-9\\s]')) AS n_bpe_tokens,
           len(list_distinct({TOKS_SQL})) AS n_distinct_tokens
    FROM documents
    """,
    doc="Whitespace + BPE-ish regex token counting.",
)
def token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return ta.token_stats(docs)


def _shingles_all_sql(n: int) -> str:
    """ALL n-word shingles (with duplicates — repetition metrics need the
    multiset, unlike the dedup shingles which are distinct)."""
    return (
        f"list_transform(range(1, len({TOKS_SQL}) - {n - 2}), "
        f"i -> array_to_string(list_slice({TOKS_SQL}, i, i + {n - 1}), ' '))"
    )


@register(
    "text_repetition_filter",
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
          FROM base b LEFT JOIN top t ON t.doc_id = b.doc_id)
    SELECT doc_id, dup_3gram_frac, top_2gram_frac,
           (dup_3gram_frac <= 0.05 AND top_2gram_frac <= 0.05) AS keep
    FROM m
    """,
    doc="Gopher/RefinedWeb repetition signals: duplicate-3-gram fraction + "
    "top-2-gram share, thresholded to a keep flag. Spark side is pure "
    "per-doc column arithmetic (sorted-run aggregate for the top count) — "
    "zero shuffles at any corpus size; the oracle counts via unnest+group.",
)
def text_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return ta.repetition_metrics(docs)


@register(
    "text_redact_pii",
    oracle=f"""
    WITH aug AS (SELECT doc_id,
                        text || ' contact doc' || doc_id
                             || '@example.com or https://example.org/d/'
                             || doc_id || ' ref 55501'
                             || lpad(doc_id::VARCHAR, 5, '0') AS t
                 FROM documents),
    s1 AS (SELECT doc_id,
                  len(regexp_extract_all(t, '{ta.EMAIL_RE}')) AS n_emails,
                  regexp_replace(t, '{ta.EMAIL_RE}', '<EMAIL>', 'g') AS t1
           FROM aug),
    s2 AS (SELECT doc_id, n_emails,
                  len(regexp_extract_all(t1, '{ta.URL_RE}')) AS n_urls,
                  regexp_replace(t1, '{ta.URL_RE}', '<URL>', 'g') AS t2
           FROM s1),
    s3 AS (SELECT doc_id, n_emails, n_urls,
                  len(regexp_extract_all(t2, '{ta.LONG_NUMBER_RE}')) AS n_numbers,
                  regexp_replace(t2, '{ta.LONG_NUMBER_RE}', '<NUMBER>', 'g') AS t3
           FROM s2)
    SELECT doc_id, n_emails::BIGINT AS n_emails, n_urls::BIGINT AS n_urls,
           n_numbers::BIGINT AS n_numbers, md5(t3) AS clean_hash
    FROM s3
    """,
    doc="PII scrub before training: emails -> <EMAIL>, URLs -> <URL>, "
    "7+-digit runs -> <NUMBER>, applied in that order on staged text so "
    "counts never double-book. The fixture corpus carries no PII, so the "
    "query plants a deterministic contact line per doc and both engines "
    "redact the same augmented text (patterns live in the Java-regex ∩ "
    "RE2 subset). clean_hash = md5 of the redacted text.",
)
def text_redact_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    ident = F.col("doc_id").cast("string")
    aug = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact doc"),
            ident,
            F.lit("@example.com or https://example.org/d/"),
            ident,
            F.lit(" ref 55501"),
            F.lpad(ident, 5, "0"),
        ).alias("text"),
    )
    red = ta.redact_pii(aug)
    return red.select(
        "doc_id", "n_emails", "n_urls", "n_numbers",
        F.md5("clean_text").alias("clean_hash"),
    )


@register(
    "vocab_topk",
    oracle=f"""
    WITH t AS (SELECT doc_id, unnest({TOKS_SQL}) AS token FROM documents),
    per AS (SELECT token, doc_id, COUNT(*) AS tf FROM t GROUP BY 1, 2)
    SELECT token, SUM(tf)::BIGINT AS term_freq, COUNT(*)::BIGINT AS doc_freq
    FROM per GROUP BY token
    ORDER BY term_freq DESC, token
    LIMIT 100
    """,
    doc="Corpus vocabulary statistics (tokenizer-training prep): term and "
    "document frequency per token, top-100 by frequency with total "
    "tie-break. Distinct-free two-level aggregate — groupBy(token, doc) "
    "then groupBy(token) — so no countDistinct Expand ever touches the "
    "exploded token stream; both levels partial-aggregate map-side.",
)
def vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    t = docs.select("doc_id", F.explode(tokens("text")).alias("token"))
    per = t.groupBy("token", "doc_id").agg(F.count(F.lit(1)).alias("tf"))
    return (
        per.groupBy("token")
        .agg(
            F.sum("tf").cast("long").alias("term_freq"),
            F.count(F.lit(1)).cast("long").alias("doc_freq"),
        )
        .orderBy(F.desc("term_freq"), "token")
        .limit(100)
    )


@register(
    "text_length_filter_percentile",
    oracle=f"""
    WITH n AS (SELECT doc_id, len({TOKS_SQL}) AS n_tokens FROM documents),
    b AS (SELECT round(quantile_cont(n_tokens, 0.05), 6) AS lo,
                 round(quantile_cont(n_tokens, 0.95), 6) AS hi
          FROM n)
    SELECT doc_id, n_tokens,
           (n_tokens >= lo AND n_tokens <= hi) AS keep
    FROM n, b
    """,
    doc="Data-driven length filter: keep docs inside the corpus's own "
    "[p05, p95] token-count band instead of hand-picked cutoffs "
    "(fixed thresholds rot as the corpus mix changes). Two passes: an "
    "exact interpolated percentile pair (Spark percentile ≡ DuckDB "
    "quantile_cont, 6-dp rounded), then a scan with the scalar bounds — "
    "at 100 TB swap pass one to approx_percentile and keep the shape.",
)
def text_length_filter_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    n = docs.select("doc_id", F.size(tokens("text")).alias("n_tokens"))
    row = n.agg(
        F.round(F.percentile("n_tokens", F.lit(0.05)), 6).alias("lo"),
        F.round(F.percentile("n_tokens", F.lit(0.95)), 6).alias("hi"),
    ).first()
    lo, hi = float(row["lo"]), float(row["hi"])
    return n.select(
        "doc_id",
        "n_tokens",
        ((F.col("n_tokens") >= lo) & (F.col("n_tokens") <= hi)).alias("keep"),
    )


@register(
    "doc_fingerprint",
    oracle=f"""
    SELECT doc_id, {_h60_sql(NORM_SQL)} AS fingerprint FROM documents
    """,
    doc="60-bit normalized-text fingerprint (whitespace-insensitive dedup key).",
)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return ta.fingerprints(docs)


@register(
    "multimodal_feature_extract",
    oracle="""
    SELECT doc_id AS media_id, gs.i AS dim_idx,
           ('0x' || substr(md5(text), gs.i * 4 + 1, 4))::BIGINT / 65536.0 AS feat
    FROM documents, (SELECT unnest(range(0, 8)) AS i) gs
    """,
    doc="Multimodal plumbing end-to-end: text bytes as a binary media "
    "column -> Arrow-batched mapInPandas feature kernel "
    "(operators/multimodal.py). The deterministic fake decoder is md5-"
    "based, so even this pandas-UDF path has an exact SQL oracle "
    "(features are n/65536 -> exact in float32 and double).",
)
def multimodal_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import extract_features

    docs = load_table(spark, sf_dir, "documents")
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "UTF-8").alias("content"),
    )
    feats = extract_features(media, decoder="fake")
    return feats.select(
        "media_id", F.posexplode("feature").alias("dim_idx", "feat")
    ).withColumn("feat", F.col("feat").cast("double"))


def _curation_oracle() -> str:
    """Composed oracle for the full curation pipeline: exact dedup →
    minhash-LSH near-dedup (banding replicated) → quality + language
    filters, mirroring operators/curation.py stage by stage."""
    mins = ",\n           ".join(
        f"MIN(({a} * h + {b}) % {dd.MERSENNE_P}) AS mh{i}"
        for i, (a, b) in enumerate(zip(dd.MINHASH_A, dd.MINHASH_B))
    )
    band_rows = []
    for j in range(dd.LSH_BANDS):
        cols = [f"mh{j * dd.LSH_ROWS + r}" for r in range(dd.LSH_ROWS)]
        sig = " || ',' || ".join(cols)
        band_rows.append(f"SELECT doc_id, {j} AS band_id, {sig} AS band_sig FROM sig")
    bands = "\n         UNION ALL ".join(band_rows)
    hits_en = (
        f"len(list_filter({TOKS_SQL}, t -> list_contains("
        "['the','of','and','a','to','in','is','it','that','for'], t)))"
    )
    langid = _langid_oracle().replace("FROM documents", "FROM s2")
    return f"""
    WITH s1 AS (SELECT * FROM documents
                WHERE doc_id IN (SELECT MIN(doc_id) FROM documents GROUP BY md5(text))),
    sh AS (SELECT doc_id, unnest({_shingles_sql(3)}) AS s FROM s1),
    th AS (SELECT doc_id, {_h32_sql('s')} AS h FROM sh),
    sig AS (SELECT doc_id, {mins}
            FROM th GROUP BY doc_id),
    bands AS ({bands}),
    cand AS (SELECT DISTINCT b1.doc_id AS doc_id_a, b2.doc_id AS doc_id_b
             FROM bands b1 JOIN bands b2
               ON b1.band_id = b2.band_id AND b1.band_sig = b2.band_sig
              AND b1.doc_id < b2.doc_id),
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
    inter AS (SELECT c.doc_id_a, c.doc_id_b, COUNT(*) AS i
              FROM cand c
              JOIN sh t1 ON t1.doc_id = c.doc_id_a
              JOIN sh t2 ON t2.doc_id = c.doc_id_b AND t2.s = t1.s
              GROUP BY c.doc_id_a, c.doc_id_b),
    dups AS (SELECT DISTINCT inter.doc_id_b AS doc_id
             FROM inter JOIN sizes sa ON sa.doc_id = inter.doc_id_a
                        JOIN sizes sb ON sb.doc_id = inter.doc_id_b
             WHERE round(i / (sa.sz + sb.sz - i), 6) >= 0.5),
    s2 AS (SELECT * FROM s1 WHERE doc_id NOT IN (SELECT doc_id FROM dups)),
    q AS (SELECT doc_id,
                 len({TOKS_SQL}) AS n_tokens,
                 round(len(list_distinct({TOKS_SQL})) / len({TOKS_SQL}), 6) AS ttr,
                 round((len(list_distinct({TOKS_SQL})) / len({TOKS_SQL}))
                       * least(1.0, len({TOKS_SQL}) / 50.0), 6) AS quality_score
          FROM s2),
    l AS (SELECT doc_id, predicted_lang FROM ({langid}))
    SELECT s2.doc_id, s2.text, s2.lang, s2.source, s2.n_chars,
           q.n_tokens, q.ttr, q.quality_score, l.predicted_lang
    FROM s2 JOIN q USING (doc_id) JOIN l USING (doc_id)
    WHERE q.n_tokens >= 10 AND q.ttr >= 0.05
      AND l.predicted_lang IN ('en', 'unknown')
    """


@register(
    "curation_pipeline",
    bench=True,
    oracle=_curation_oracle(),
    doc="Capstone: the full training-data curation flow (exact dedup → "
    "MinHash-LSH near-dedup → quality + language filters) as one composed "
    "DataFrame pipeline (operators/curation.py), oracle-checked stage-for-"
    "stage.",
)
def curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.curation import curate

    docs = load_table(spark, sf_dir, "documents")
    return curate(docs)


@register(
    "ann_ivf_topk",
    # Same recall-contract design as ann_lsh_bucketed: IVF is
    # deterministic end-to-end (hash-seeded init, decimal-exact centroid
    # means), so recall vs brute force is a fixed number per dataset.
    # Measured per-query recall@10 ≥0.8 at sf0.001 and sf0.01; bound 0.7.
    oracle="""
    SELECT vec_id AS query_id, CAST(10 AS BIGINT) AS n_true,
           TRUE AS recall_ok
    FROM embeddings WHERE vec_id < 5
    """,
    doc="IVF approximate top-10 (spherical k-means cells, nprobe probing): "
    "the density-adaptive ANN scale path beside the LSH variant "
    "(operators/ivf.py). Emits the per-query recall contract vs the exact "
    "brute-force twin (bound 0.7; measured ≥0.8); recall also pinned in "
    "tests/test_ivf_maintenance.py.",
)
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.ivf import ivf_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    ivf = ivf_topk(emb, queries, k=10, n_centroids=16, nprobe=6).select(
        "query_id", "neighbor_id"
    )
    return _recall_contract(sim.cosine_topk(emb, queries, k=10), ivf, 0.7)


@register(
    "dedup_embedding_cosine_blocked",
    oracle=REGISTRY["dedup_embedding_cosine"].oracle,
    doc="Exact all-pairs embedding dedup via BLOCK MATRIX MULTIPLY "
    "(operators/similarity.py::embedding_near_duplicates_blocked): same "
    "semantics and oracle as dedup_embedding_cosine, but one BLAS matmul "
    "per block pair — each vector ships once per block pair instead of "
    "once per row pair. The scale path when exactness is required.",
)
def dedup_embedding_cosine_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return sim.embedding_near_duplicates_blocked(emb, threshold=0.42)


@register(
    "text_token_entropy",
    oracle=f"""
    WITH tok AS (SELECT doc_id, unnest({TOKS_SQL}) AS tok FROM documents),
    counts AS (SELECT doc_id, tok, COUNT(*) AS c FROM tok GROUP BY doc_id, tok)
    SELECT doc_id,
           CAST(SUM(c) AS BIGINT) AS n_tokens,
           round(ln(SUM(c)) - SUM(c * ln(c)) / SUM(c), 6) AS entropy
    FROM counts GROUP BY doc_id
    """,
    doc="Shannon token entropy per doc (repetitiveness/boilerplate "
    "signal): H = ln n - (sum c ln c)/n over token counts; 6dp rounding "
    "absorbs libm/summation-order ulps.",
)
def text_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return ta.token_entropy(docs)


@register(
    "sample_documents_deterministic",
    oracle="""
    SELECT doc_id, lang, source FROM documents
    WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
          < 858993459
    """,
    doc="Deterministic ~20% sample via portable-hash thresholding "
    "(operators/sampling.py): the same docs are kept on every run and "
    "every cluster — rand()-free reproducible subsetting; the filter is "
    "a pushable expression.",
)
def sample_documents_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sampling import deterministic_sample

    docs = load_table(spark, sf_dir, "documents")
    return deterministic_sample(docs, 0.2, "doc_id").select(
        "doc_id", "lang", "source"
    )


@register(
    "stratified_sample_exact",
    oracle="""
    SELECT doc_id, lang FROM (
        SELECT doc_id, lang,
               row_number() OVER (
                   PARTITION BY lang
                   ORDER BY ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT,
                            doc_id) AS rn
        FROM documents)
    WHERE rn <= 30
    """,
    doc="Exactly-n-per-stratum deterministic sampling (balanced eval sets, "
    "class-balanced fine-tuning mixes): portable-hash rank within each "
    "stratum with id tie-break, top 30 per language kept — rate-based "
    "hash sampling would draw binomial-sized strata instead. One shuffle "
    "on the stratum key; WindowGroupLimit prunes to top-n pre-exchange.",
)
def stratified_sample_exact_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sampling import stratified_sample_exact

    docs = load_table(spark, sf_dir, "documents")
    return stratified_sample_exact(docs, "lang", 30).select("doc_id", "lang")


@register(
    "split_train_val",
    oracle="""
    SELECT CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#split'), 1, 8))::BIGINT
                     < 4080218931
                THEN 'train' ELSE 'val' END AS split,
           COUNT(*) AS n_docs
    FROM documents GROUP BY 1
    """,
    doc="Deterministic 95/5 train-val split (hash ranges, disjoint and "
    "stable across runs); grouped counts for the check.",
)
def split_train_val(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sampling import hash_split

    docs = load_table(spark, sf_dir, "documents")
    return (
        hash_split(docs, "doc_id")
        .groupBy("split")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


@register(
    "mix_corpora_weighted",
    oracle="""
    SELECT mix_source, COUNT(*) AS n_docs FROM (
      SELECT 'en_docs' AS mix_source, doc_id FROM documents
      WHERE lang = 'en'
        AND ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#mix:en_docs'), 1, 8))::BIGINT
            < 4294967296
      UNION ALL
      SELECT 'other_docs', doc_id FROM documents
      WHERE lang <> 'en'
        AND ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#mix:other_docs'), 1, 8))::BIGINT
            < 1288490188
    ) GROUP BY mix_source
    """,
    doc="Weighted corpus mixture (the pre-training data-mix step): keep "
    "all English docs, 30% of the rest, with provenance labels — "
    "per-source deterministic rates, reproducible run to run.",
)
def mix_corpora_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sampling import mix_corpora

    docs = load_table(spark, sf_dir, "documents")
    mixed = mix_corpora(
        [
            (docs.filter(F.col("lang") == "en"), 1.0, "en_docs"),
            (docs.filter(F.col("lang") != "en"), 0.3, "other_docs"),
        ],
        key="doc_id",
    )
    return mixed.groupBy("mix_source").agg(F.count(F.lit(1)).alias("n_docs"))


@register(
    "pack_sequences_512",
    oracle=f"""
    WITH t AS (SELECT doc_id, CAST(len({TOKS_SQL}) AS BIGINT) AS n_tokens
               FROM documents),
    c AS (SELECT doc_id, n_tokens,
                 COALESCE(SUM(n_tokens) OVER (
                     ORDER BY doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                     AS cum_before
          FROM t)
    SELECT doc_id, n_tokens, CAST(cum_before // 512 AS BIGINT) AS seq_id
    FROM c
    """,
    doc="Token-budget sequence packing (pre-training sample assembly): "
    "documents in stable id order are packed into 512-token sequences "
    "(pack-with-overflow, boundaries preserved). The oracle's global "
    "running sum would plan as a SINGLE-partition window in Spark; the "
    "implementation is the two-pass distributed prefix sum in "
    "operators/packing.py — range partition + tiny per-partition offsets "
    "+ one Arrow mapInPandas pass, so it holds at 100 TB.",
)
def pack_sequences_512(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import tokens
    from ..operators.packing import pack_sequences

    docs = load_table(spark, sf_dir, "documents")
    sized = docs.select("doc_id", F.size(tokens("text")).alias("n_tokens"))
    return pack_sequences(sized, token_budget=512)


@register(
    "chunk_documents_128",
    oracle=f"""
    WITH t AS (SELECT doc_id, {TOKS_SQL} AS toks FROM documents),
    s AS (SELECT doc_id, toks, unnest(range(0, len(toks), 96)) AS start
          FROM t WHERE len(toks) > 0)
    SELECT doc_id, CAST(start // 96 AS BIGINT) AS chunk_id,
           array_to_string(list_slice(toks, start + 1, start + 128), ' ')
               AS chunk_text,
           CAST(len(list_slice(toks, start + 1, start + 128)) AS BIGINT)
               AS n_chunk_tokens
    FROM s
    """,
    doc="Context-window chunking for retrieval/embedding pipelines: "
    "128-token windows, 32-token overlap (stride 96), natural tail. "
    "Pure per-doc expressions (sequence + posexplode + slice) — zero "
    "shuffles, scales with cores.",
)
def chunk_documents_128(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return ta.chunk_documents(docs, chunk_tokens=128, overlap=32)


@register(
    "shuffle_rank_deterministic",
    oracle="""
    SELECT doc_id,
           CAST(row_number() OVER (
               ORDER BY ('0x' || substr(md5('shuf:' || CAST(doc_id AS VARCHAR)),
                                        1, 8))::BIGINT,
                        doc_id) - 1 AS BIGINT) AS global_pos
    FROM documents
    """,
    doc="Deterministic training-order shuffle: global 0-based rank in "
    "seeded-portable-hash order. The oracle's bare row_number() window "
    "is the SINGLE-TASK plan at scale; the implementation is "
    "operators/packing.py::global_positions — distributed prefix sum "
    "(range shuffle + offsets + Arrow pass), same answer, no serial "
    "bottleneck. Reproducible across engines and runs by construction.",
)
def shuffle_rank_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.hashing import portable_hash32
    from ..operators.packing import global_positions

    docs = load_table(spark, sf_dir, "documents")
    keyed = docs.select(
        "doc_id",
        portable_hash32(
            F.concat(F.lit("shuf:"), F.col("doc_id").cast("string"))
        ).alias("_h"),
    )
    return global_positions(keyed, order_cols=["_h", "doc_id"])


@register(
    "embedding_quantize_int8",
    oracle="""
    WITH m AS (SELECT vec_id, embedding,
                      CAST(list_max(list_transform(embedding, x -> abs(x)))
                           AS DOUBLE) AS mx
               FROM embeddings)
    SELECT vec_id, mx / 127.0 AS scale,
           array_to_string(
               CASE WHEN mx > 0
                    THEN list_transform(embedding,
                         x -> CAST(round(CAST(x AS DOUBLE) / (mx / 127.0))
                                   AS INTEGER))
                    ELSE list_transform(embedding, x -> 0) END, ',') AS qvec
    FROM m
    """,
    doc="Symmetric per-vector int8 quantization (4x smaller ANN candidate "
    "store; dequantize = q*scale). JVM-side transform/array_max only; "
    "float32 inputs widen to double exactly, so both engines produce "
    "identical codes. The query serializes qvec to CSV text for the "
    "value-hash; the operator returns the real array<int>.",
)
def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    vectors = load_table(spark, sf_dir, "embeddings")
    q = sim.quantize_embeddings(vectors)
    return q.select(
        "vec_id",
        "scale",
        F.array_join(F.transform("qvec", lambda x: x.cast("string")), ",").alias(
            "qvec"
        ),
    )
