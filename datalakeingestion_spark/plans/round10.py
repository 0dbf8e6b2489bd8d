"""Round-10 queries.

- ``dsir_weights_vs_tables`` / ``dsir_select_vs_top100`` — DSIR in the
  paper's classic two-TABLE setup (``operators/dsir.py::
  dsir_logratio_weights_vs``): score every document of a raw pool
  against a SEPARATE curated target corpus (here: the deterministic
  ``lang='en' AND doc_id % 7 = 0`` slice of ``documents`` standing in
  for the Wikipedia/books table), instead of a flag column inside one
  frame. Both hashed-ngram models are still built in ONE pass over the
  tagged union; only raw-side scores return. This is the API shape a
  real mixing pipeline calls — the raw pool and the quality corpus are
  different tables.
- ``entity_resolution_merge`` — the golden-record UPSERT between round
  9's match and survivorship halves (``operators/linkage.py::
  resolve_increment``): crosswalk replay guard (idempotent), weighted
  survivorship fold, deterministic entity minting. Reference pendant:
  the latest-zone MERGE semantics of ``start_ingestion.py:361-374``
  generalized to entities.
- ``ivf_trained_recall_delta`` — the contract that Lloyd-training the
  IVF centroids keeps paying for itself: mean recall@10 >= 0.85 AND
  >= hash-seeded + 0.03 (``operators/ivf.py::train_centroids``).
- ``url_canonical_parts`` / ``domain_quality_rollup`` /
  ``url_dedup_groups`` — web-corpus URL curation
  (``functions/urls.py``, ``operators/web.py``): parsing, public-
  suffix-lite registrable domain, canonicalization, the per-domain
  decision table, and URL-level keep-min dedup groups.
- ``bloom_dedup_at_door`` — the space-bounded door check
  (``operators/bloom.py``): engine-identical m-bit Bloom bitmap over
  lake fingerprints; no false negatives, FPR contract in tests.
- ``maxmatch_encode_words`` — the WordPiece inference loop
  (``operators/packing.py::maxmatch_encode_words``): greedy longest-
  match-first subword encode as one portable regex alternation.

Reference pendant: none except where noted — greenfield curation
operators (SURVEY.md §2 beyond-reference set).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.fixtures import load_table
from .llm import TOKS_SQL, _h32_sql
from .registry import register

# ---------------------------------------------------------------------------
# DSIR, two-corpus (separate target TABLE) form
# ---------------------------------------------------------------------------

_DSIR_B = 4096

# raw pool = ALL documents; target corpus = the deterministic curated
# slice. The models/smoothing/rounding mirror operators/dsir.py (and the
# one-frame oracle in round9.py) line for line; the only structural
# difference is the tagged union — raw rows feed q, target rows feed p,
# and the per-doc aggregate keys on (tgt, doc_id) so a target id that
# collides with a raw id never merges rows.
_DSIR_VS_WEIGHTS_SQL = f"""
    WITH rawd AS (SELECT doc_id, FALSE AS tgt, {TOKS_SQL} AS toks
                  FROM documents),
    tgtd AS (SELECT doc_id, TRUE AS tgt, {TOKS_SQL} AS toks
             FROM documents WHERE lang = 'en' AND doc_id % 7 = 0),
    d AS (SELECT * FROM rawd UNION ALL SELECT * FROM tgtd),
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
          FROM feats JOIN ratio USING (bucket)
          WHERE NOT tgt GROUP BY 1)
    SELECT documents.doc_id,
           COALESCE(w.n_feats, 0)::BIGINT AS n_feats,
           COALESCE(CAST(w.ws AS DOUBLE), 0.0) AS weight
    FROM documents LEFT JOIN w USING (doc_id)
"""


def _dsir_vs_frames(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    docs = load_table(spark, sf_dir, "documents")
    raw = docs.select("doc_id", "text")
    target = docs.filter(
        (F.col("lang") == "en") & (F.col("doc_id") % 7 == 0)
    ).select("doc_id", "text")
    return raw, target


@register(
    "dsir_weights_vs_tables",
    oracle=_DSIR_VS_WEIGHTS_SQL,
    doc="DSIR importance weights in the paper's TWO-CORPUS setup "
    "(operators/dsir.py::dsir_logratio_weights_vs): the raw pool and "
    "the curated target are SEPARATE tables (the call a real mixing "
    "pipeline makes), not a flag column. Both add-1-smoothed hashed-"
    "ngram models are built in one pass over the tagged union (target "
    "rows feed p, raw rows feed q); the per-doc aggregate keys on "
    "(side, id) so colliding ids never merge; only raw-side scores "
    "return, with feature-less docs kept as (0, 0.0).",
)
def dsir_weights_vs_tables(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dsir import dsir_logratio_weights_vs

    raw, target = _dsir_vs_frames(spark, sf_dir)
    return dsir_logratio_weights_vs(raw, target, n_buckets=_DSIR_B)


@register(
    "dsir_select_vs_top100",
    oracle=f"""
    SELECT * FROM ({_DSIR_VS_WEIGHTS_SQL})
    ORDER BY weight DESC, doc_id LIMIT 100
    """,
    doc="Two-corpus DSIR selection (operators/dsir.py::"
    "dsir_select_topk_vs): the top-100 raw-pool docs most like the "
    "separate target corpus, ties by doc_id — compiles to "
    "TakeOrderedAndProject (per-partition heaps + a 100-row driver "
    "merge), never a single-partition global sort.",
)
def dsir_select_vs_top100(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dsir import dsir_select_topk_vs

    raw, target = _dsir_vs_frames(spark, sf_dir)
    return dsir_select_topk_vs(raw, target, k=100, n_buckets=_DSIR_B)


# ---------------------------------------------------------------------------
# entity resolution: the MERGE step (golden-record upsert)
# ---------------------------------------------------------------------------


def _register_er_merge() -> None:
    from .round9 import _W_MIN_SCORE, _WEIGHTED_SCORE_SQL

    @register(
        "entity_resolution_merge",
        oracle=f"""
        WITH RECURSIVE lake AS (
          SELECT c_custkey, c_name, c_nationkey, c_mktsegment, c_acctbal
          FROM customer WHERE c_custkey % 11 <> 0
        ),
        batch AS (
          SELECT c_custkey, c_name, c_nationkey, c_mktsegment, c_acctbal
          FROM customer WHERE c_custkey % 11 = 0
        ),
        scored AS (
          SELECT a.c_custkey AS id_a, b.c_custkey AS id_b
          FROM lake a JOIN lake b
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
        ),
        labels AS (SELECT a AS doc_id, LEAST(a, MIN(b)) AS cluster_id
                   FROM reach GROUP BY a),
        members AS (SELECT c.*, COALESCE(l.cluster_id, c.c_custkey) AS entity_id
                    FROM lake c LEFT JOIN labels l ON c.c_custkey = l.doc_id),
        agg AS (SELECT entity_id, CAST(COUNT(*) AS BIGINT) AS n_members,
                       MAX(length(c_name)) AS max_len,
                       MAX(c_acctbal) AS c_acctbal,
                       MIN(c_nationkey) AS c_nationkey,
                       MIN(c_mktsegment) AS c_mktsegment
                FROM members GROUP BY entity_id),
        gold AS (SELECT m.entity_id, MIN(m.c_name) AS c_name
                 FROM members m JOIN agg ON m.entity_id = agg.entity_id
                 WHERE length(m.c_name) = agg.max_len
                 GROUP BY m.entity_id),
        golden AS (SELECT agg.entity_id AS c_custkey, gold.c_name,
                          agg.c_acctbal, agg.c_nationkey, agg.c_mktsegment,
                          agg.n_members
                   FROM agg JOIN gold ON agg.entity_id = gold.entity_id),
        fresh AS (SELECT b.* FROM batch b
                  LEFT JOIN (SELECT DISTINCT c_custkey FROM members) cw
                    ON cw.c_custkey = b.c_custkey
                  WHERE cw.c_custkey IS NULL),
        cand AS (
          SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
                 ({_WEIGHTED_SCORE_SQL}) AS score
          FROM fresh a JOIN golden b
            ON a.c_nationkey = b.c_nationkey
           AND a.c_mktsegment = b.c_mktsegment
        ),
        best AS (SELECT id_a, id_b FROM (
                   SELECT id_a, id_b, row_number() OVER (
                     PARTITION BY id_a ORDER BY score DESC, id_b) AS rn
                   FROM cand WHERE score >= {_W_MIN_SCORE})
                 WHERE rn = 1),
        unmatched AS (SELECT f.c_custkey FROM fresh f
                      LEFT JOIN best ON best.id_a = f.c_custkey
                      WHERE best.id_a IS NULL),
        base AS (SELECT COALESCE(MAX(c_custkey), 0) AS m FROM golden),
        minted AS (SELECT u.c_custkey AS id_a,
                          base.m + DENSE_RANK() OVER (ORDER BY u.c_custkey)
                              AS ent
                   FROM unmatched u, base),
        asg AS (SELECT id_a, id_b AS ent FROM best
                UNION ALL SELECT id_a, ent FROM minted),
        newmem AS (SELECT asg.ent AS entity_id, f.c_name, f.c_acctbal,
                          f.c_nationkey, f.c_mktsegment,
                          CAST(1 AS BIGINT) AS w
                   FROM asg JOIN fresh f ON f.c_custkey = asg.id_a),
        oldmem AS (SELECT g.c_custkey AS entity_id, g.c_name, g.c_acctbal,
                          g.c_nationkey, g.c_mktsegment, g.n_members AS w
                   FROM golden g),
        mem AS (SELECT * FROM oldmem UNION ALL SELECT * FROM newmem),
        magg AS (SELECT entity_id, CAST(SUM(w) AS BIGINT) AS n_members,
                        MAX(length(c_name)) AS max_len,
                        MAX(c_acctbal) AS c_acctbal,
                        MIN(c_nationkey) AS c_nationkey,
                        MIN(c_mktsegment) AS c_mktsegment
                 FROM mem GROUP BY entity_id),
        mgold AS (SELECT m.entity_id, MIN(m.c_name) AS golden_c_name
                  FROM mem m JOIN magg ON m.entity_id = magg.entity_id
                  WHERE length(m.c_name) = magg.max_len
                  GROUP BY m.entity_id)
        SELECT magg.entity_id, magg.n_members, magg.c_acctbal,
               magg.c_nationkey, magg.c_mktsegment, mgold.golden_c_name
        FROM magg LEFT JOIN mgold ON magg.entity_id = mgold.entity_id
        """,
        doc="Entity-resolution MERGE — the golden-record UPSERT between "
        "round 9's two halves (operators/linkage.py::resolve_increment; "
        "reference pendant: start_ingestion.py:361-374's latest-zone "
        "MERGE generalized to entities): the batch's already-folded "
        "records drop out via the crosswalk anti-join (idempotent "
        "replay), fresh records take their best golden match (score "
        "desc, entity asc, shared Fellegi-Sunter weights) and FOLD in — "
        "survivorship re-applied over the existing golden record "
        "(weighted by its n_members) plus the new rows — while "
        "unmatched records mint deterministic new entity ids "
        "(max existing id + dense_rank). Output is the NEW golden "
        "table; untouched entities pass through the same aggregate "
        "unchanged. Anti-join + block-keyed match are batch x entity "
        "sized; the mint window sorts only the unmatched slice.",
    )
    def entity_resolution_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
        from ..operators.linkage import resolve_increment
        from .round9 import _customer_derived, _customer_linkage_fields
        from .round9b import _er_lake_frames

        _, batch, golden, crosswalk = _er_lake_frames(spark, sf_dir)
        golden2, _ = resolve_increment(
            _customer_derived(batch),
            _customer_derived(
                golden.withColumnRenamed("c_custkey", "entity_id")
            ),
            crosswalk,
            record_id="c_custkey",
            entity_col="entity_id",
            block_cols=["c_nationkey", "c_mktsegment"],
            fields=_customer_linkage_fields(),
            min_score=_W_MIN_SCORE,
            name_col="c_name",
            max_cols=("c_acctbal",),
            min_cols=("c_nationkey", "c_mktsegment"),
        )
        return golden2.select(
            "entity_id",
            "n_members",
            "c_acctbal",
            "c_nationkey",
            "c_mktsegment",
            F.col("golden_c_name"),
        )


_register_er_merge()


# ---------------------------------------------------------------------------
# trained-IVF recall-delta contract
# ---------------------------------------------------------------------------


@register(
    "ivf_trained_recall_delta",
    # Contract oracle (ann-style, see ann_ivf_topk): n_queries/k are
    # exact; the booleans are deterministic engine-side guarantees
    # (hash-seeded init, decimal-exact Lloyd means, fixed fixtures).
    # Measured mean recall@10 at (16 cells, nprobe 6, assign_n 2):
    # trained(iters=5) 0.875 / 0.895, hash-seeded(iters=0) 0.81 / 0.80
    # at sf0.001 / sf0.01 — bounds 0.85 and +0.03 leave margin.
    oracle="""
    SELECT COUNT(*)::BIGINT AS n_queries, CAST(10 AS BIGINT) AS k,
           TRUE AS trained_recall_ok, TRUE AS trained_beats_seeded
    FROM embeddings WHERE vec_id < 20
    """,
    doc="The VALUE of training the IVF index, pinned as a contract "
    "(operators/ivf.py::train_centroids vs its iters=0 hash-seeded "
    "init): mean recall@10 vs the exact brute-force twin must be "
    ">= 0.85 with 5 Lloyd iterations AND beat the seeded index by "
    ">= 0.03 (measured ~0.88 vs ~0.80) at (16 cells, nprobe 6, "
    "assign_n 2). Everything is deterministic (md5-seeded init, "
    "decimal-exact centroid means), so the booleans are stable per "
    "dataset — the driver check fails iff Lloyd training stops "
    "paying for itself.",
)
def ivf_trained_recall_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import similarity as sim
    from ..operators.ivf import ivf_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 20)
    # the exact brute-force frame is the expensive side — collect its
    # n_queries*k pairs ONCE (bounded, 200 rows) instead of re-executing
    # it inside two semi-join counts per variant
    truth = {
        (r["query_id"], r["neighbor_id"])
        for r in sim.cosine_topk(emb, queries, k=10)
        .select("query_id", "neighbor_id")
        .collect()
    }

    def mean_recall(approx: DataFrame) -> float:
        got = {
            (r["query_id"], r["neighbor_id"])
            for r in approx.select("query_id", "neighbor_id").collect()
        }  # bounded: n_queries x k rows
        return len(got & truth) / len(truth)

    kwargs = dict(k=10, n_centroids=16, nprobe=6, assign_n=2)
    r_trained = mean_recall(ivf_topk(emb, queries, iters=5, **kwargs))
    r_seeded = mean_recall(ivf_topk(emb, queries, iters=0, **kwargs))
    return queries.agg(
        F.count(F.lit(1)).alias("n_queries"),
        F.lit(10).cast("long").alias("k"),
        F.lit(bool(r_trained >= 0.85)).alias("trained_recall_ok"),
        F.lit(bool(r_trained >= r_seeded + 0.03)).alias(
            "trained_beats_seeded"
        ),
    )


# ---------------------------------------------------------------------------
# URL / domain operators (web-corpus curation)
# ---------------------------------------------------------------------------

# deterministic per-doc URL derived from fixture columns — engine-portable
# SQL (CASE/||/CAST run identically in Spark and DuckDB), shared VERBATIM
# by the Spark plan (F.expr) and the oracle so the two sides can never
# parse different URLs. The shape exercises every canonicalization rule:
# upper-case scheme+www, a compound co.uk suffix, the https default port,
# trailing slashes, tracking params, unsorted params and a fragment.
_URL_EXPR = """
    'HTTPS://' ||
    CASE WHEN doc_id % 3 = 0 THEN 'WWW.' ELSE '' END ||
    source || '-' || CAST(doc_id % 5 AS STRING) ||
    CASE WHEN doc_id % 4 = 0 THEN '.co.uk' ELSE '.com' END ||
    CASE WHEN doc_id % 5 = 0 THEN ':443' ELSE '' END ||
    '/articles/' || CAST(doc_id AS STRING) ||
    CASE WHEN doc_id % 2 = 0 THEN '/' ELSE '' END ||
    '?utm_source=feed&id=' || CAST(doc_id AS STRING) ||
    CASE WHEN doc_id % 3 = 1 THEN '&ref=tw&b=2&a=1' ELSE '' END ||
    '#frag'
"""

# DuckDB twins of functions/urls.py (kept adjacent per repo convention)
_SQL_AUTH = (
    "regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1)"
)
_SQL_SCHEME = (
    "lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))"
)
_SQL_HOST = f"lower(regexp_replace({_SQL_AUTH}, ':[0-9]+$', ''))"
_SQL_HOSTW = f"regexp_replace({_SQL_HOST}, '^www\\.', '')"
_SQL_PORT = f"regexp_extract({_SQL_AUTH}, ':([0-9]+)$', 1)"
_SQL_PATH = (
    "regexp_extract(url,"
    " '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1)"
)
# fragment stripped FIRST (matches functions/urls.py::url_query): a '?'
# inside the fragment must not be promoted into the query string
_SQL_QUERY = (
    "regexp_extract(regexp_replace(url, '#.*$', ''), '\\?(.*)$', 1)"
)

_SQL_URL_PARTS = f"""
    parts AS (
      SELECT doc_id, url, n_chars,
             {_SQL_SCHEME} AS scheme,
             {_SQL_HOSTW} AS host,
             {_SQL_PORT} AS port,
             regexp_replace({_SQL_PATH}, '/$', '') AS cpath,
             list_sort(list_filter(string_split({_SQL_QUERY}, '&'),
                 p -> p <> '' AND NOT regexp_matches(p,
                     '^(utm_[a-z]+|fbclid|gclid|msclkid|ref)='))) AS params,
             string_split({_SQL_HOSTW}, '.') AS labels
      FROM raw),
    ext AS (
      SELECT doc_id, url, n_chars, scheme, host,
             CASE WHEN len(labels) <= 1 THEN host
                  WHEN len(labels) >= 3
                       AND labels[len(labels) - 1] IN
                           ('ac','co','com','edu','gov','net','org')
                       AND length(labels[len(labels)]) = 2
                  THEN array_to_string(
                      labels[len(labels) - 2 : len(labels)], '.')
                  ELSE array_to_string(
                      labels[len(labels) - 1 : len(labels)], '.')
             END AS domain,
             scheme || '://' || host ||
             CASE WHEN port = ''
                       OR (scheme = 'http' AND port = '80')
                       OR (scheme = 'https' AND port = '443')
                  THEN '' ELSE ':' || port END ||
             cpath ||
             CASE WHEN len(params) = 0 THEN ''
                  ELSE '?' || array_to_string(params, '&') END
                 AS canonical_url
      FROM parts)
"""


@register(
    "url_canonical_parts",
    oracle=f"""
    WITH raw AS (SELECT doc_id, n_chars, {_URL_EXPR} AS url
                 FROM documents),
    {_SQL_URL_PARTS}
    SELECT doc_id, url, scheme, host, domain, canonical_url FROM ext
    """,
    doc="URL parsing + canonicalization (functions/urls.py): scheme/"
    "host extraction, public-suffix-lite registrable domain (last two "
    "labels, or three under a compound co.uk-style suffix), and the "
    "canonical form — lower-cased, www- and default-port-stripped, "
    "fragment dropped, trailing slash removed, tracking params "
    "(utm_*/fbclid/gclid/msclkid/ref) dropped and the survivors "
    "sorted. Pure JVM regex/array column expressions: ONE zero-shuffle "
    "projection over the corpus regardless of rule count. The per-doc "
    "URL derives from fixture columns via an engine-portable SQL "
    "fragment shared verbatim by both sides.",
)
def url_canonical_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions import urls as U

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.expr(_URL_EXPR).alias("url")
    )
    return docs.select(
        "doc_id",
        "url",
        U.url_scheme("url").alias("scheme"),
        F.regexp_replace(U.url_host("url"), r"^www\.", "").alias("host"),
        U.registrable_domain("url").alias("domain"),
        U.canonical_url("url").alias("canonical_url"),
    )


_BLOCKED_DOMAINS = ("src3-1.com", "src7-0.co.uk")


@register(
    "domain_quality_rollup",
    oracle=f"""
    WITH raw AS (SELECT doc_id, n_chars, {_URL_EXPR} AS url
                 FROM documents),
    {_SQL_URL_PARTS},
    tot AS (SELECT COUNT(*)::DOUBLE AS total FROM raw)
    SELECT domain,
           COUNT(*)::BIGINT AS n_docs,
           COUNT(DISTINCT canonical_url)::BIGINT AS n_urls,
           round(CAST(SUM(CAST(round(n_chars, 9) AS DECIMAL(28,9)))
                      / COUNT(*) AS DOUBLE), 6) AS avg_quality,
           round(COUNT(*) / tot.total, 6) AS share,
           domain IN ('src3-1.com', 'src7-0.co.uk') AS blocked
    FROM ext CROSS JOIN tot
    GROUP BY domain, tot.total
    """,
    doc="Per-domain corpus decision table (operators/web.py::"
    "domain_rollup): each registrable domain's doc count, DISTINCT "
    "canonical-URL count (tracking-param noise doesn't inflate pages), "
    "decimal-exact mean quality (n_chars as the fixture's quality "
    "proxy), corpus share and blocklist flag — the table a web-curation "
    "pass reads before sampling (RefinedWeb/C4 practice). One "
    "projection + one domain-keyed groupBy; the corpus total is a "
    "1-row broadcast; the blocklist an isin literal.",
)
def domain_quality_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.web import domain_rollup

    docs = load_table(spark, sf_dir, "documents").select(
        F.expr(_URL_EXPR).alias("url"), "n_chars"
    )
    return domain_rollup(
        docs,
        "url",
        quality_col="n_chars",
        blocked_domains=_BLOCKED_DOMAINS,
    ).select("domain", "n_docs", "n_urls", "avg_quality", "share", "blocked")


# ---------------------------------------------------------------------------
# Bloom-filter dedup-at-the-door
# ---------------------------------------------------------------------------

_BLOOM_M = 4032  # 64 words x 63 usable bits
_BLOOM_K = 5


def _register_bloom_door() -> None:
    mask = "(1::BIGINT << (p % 63)::INT)"
    hpos = _h32_sql("fp || '#b' || CAST(j AS STRING)")

    @register(
        "bloom_dedup_at_door",
        # bench=True: r11 adds the first r9-r10-family (ER/web/Bloom)
        # query to the headline set so its perf can regress visibly
        # (VERDICT r10 item #5). Warm median at sf0.1 when added:
        # 0.72 s; 16-query total 4.36 s, 17-query total recorded in
        # NOTES_r12.md so ratios stay comparable.
        bench=True,
        oracle=f"""
        WITH lakefp AS (SELECT md5(COALESCE(text, '')) AS fp FROM documents),
        lpos AS (SELECT {hpos} % {_BLOOM_M} AS p
                 FROM lakefp CROSS JOIN range({_BLOOM_K}) t(j)),
        bloom AS (SELECT p // 63 AS word, bit_or({mask}) AS bits
                  FROM lpos GROUP BY 1),
        probes AS (
          SELECT doc_id AS probe_id, text FROM documents
          WHERE doc_id % 7 = 0
          UNION ALL
          SELECT doc_id, text || ' ##fresh' FROM documents
          WHERE doc_id % 7 = 3
        ),
        truth AS (SELECT p.probe_id,
                         COALESCE(p.text, '') IN
                             (SELECT COALESCE(text, '') FROM documents)
                             AS is_member,
                         md5(COALESCE(p.text, '')) AS fp
                  FROM probes p),
        ppos AS (SELECT probe_id, {hpos} % {_BLOOM_M} AS p
                 FROM truth CROSS JOIN range({_BLOOM_K}) t(j)),
        hits AS (SELECT pp.probe_id,
                        bool_and(COALESCE(
                            (b.bits & {mask}) = {mask}, FALSE)) AS maybe_dup
                 FROM ppos pp LEFT JOIN bloom b ON b.word = pp.p // 63
                 GROUP BY pp.probe_id)
        SELECT t.probe_id, t.is_member, h.maybe_dup
        FROM truth t JOIN hits h ON h.probe_id = t.probe_id
        """,
        doc="Bloom-filter dedup-at-the-door (operators/bloom.py): the "
        "SPACE-BOUNDED door check beside the stored exact/gram indexes — "
        f"a {_BLOOM_M}-bit, k={_BLOOM_K} filter built once over the "
        "lake's md5 fingerprints answers re-delivery probes in a fixed "
        "footprint (64 BIGINT words, always broadcastable). Probes: the "
        "doc_id%7=0 slice re-delivered verbatim (every one MUST flag — "
        "no false negatives, the Bloom guarantee) and the doc_id%7=3 "
        "slice perturbed into fresh content (flags only on a k-way "
        "collision; FPR contract in tests/test_bloom.py). md5-portable "
        "salted positions make the bitmap bit-identical across engines; "
        "build is one projection + one bounded groupBy, probe is a "
        "broadcast join + per-doc bool_and.",
    )
    def bloom_dedup_at_door(spark: SparkSession, sf_dir: str) -> DataFrame:
        from ..operators.bloom import bloom_build, bloom_probe

        docs = load_table(spark, sf_dir, "documents")
        bloom = bloom_build(docs, _BLOOM_M, _BLOOM_K)
        probes = (
            docs.filter(F.col("doc_id") % 7 == 0)
            .select(F.col("doc_id").alias("probe_id"), "text")
            .unionByName(
                docs.filter(F.col("doc_id") % 7 == 3).select(
                    F.col("doc_id").alias("probe_id"),
                    F.concat(F.col("text"), F.lit(" ##fresh")).alias("text"),
                )
            )
        )
        flags = bloom_probe(
            probes, bloom, _BLOOM_M, _BLOOM_K, id_col="probe_id"
        )
        # NULL-safe membership: key on coalesce(text, '') on BOTH sides,
        # mirroring the fingerprint's md5(coalesce(text, '')) discipline —
        # a NULL-text probe must compare equal to a NULL-text lake row,
        # not drop out of the equi-join (IN yields NULL, not FALSE, for
        # NULL probes in SQL, so the oracle coalesces too).
        membership = probes.withColumn(
            "__t", F.coalesce(F.col("text"), F.lit(""))
        ).join(
            docs.select(
                F.coalesce(F.col("text"), F.lit("")).alias("__t")
            ).distinct().withColumn("__m", F.lit(True)),
            "__t",
            "left",
        ).select(
            "probe_id",
            F.coalesce(F.col("__m"), F.lit(False)).alias("is_member"),
        )
        return membership.join(flags, "probe_id").select(
            "probe_id", "is_member", "maybe_dup"
        )


_register_bloom_door()


# ---------------------------------------------------------------------------
# MaxMatch (WordPiece-style greedy longest-match) tokenizer audit
# ---------------------------------------------------------------------------

# fixed audit vocab: common English chunks + every single letter (so any
# alphabetic word is coverable and [UNK] words are exactly the ones with
# digits — the UNK path stays exercised on the fixtures). Single-sourced:
# the Spark call and the oracle both derive from this tuple.
_MAXMATCH_VOCAB = (
    "the", "ing", "ion", "ent", "er", "on", "an", "re", "en", "ti",
    "te", "at", "st", "ar", "in", "ed", "es", "or", "th", "nd",
    "a", "b", "c", "d", "e", "f", "g", "h", "i", "j", "k", "l", "m",
    "n", "o", "p", "q", "r", "s", "t", "u", "v", "w", "x", "y", "z",
)
_MAXMATCH_PATTERN = (
    "(" + "|".join(sorted(_MAXMATCH_VOCAB, key=lambda p: (-len(p), p))) + ")"
)

# Single-source oracle fragments for the MaxMatch encode rules (covered
# test, greedy piece split, the ELSE-1 [UNK] count). Both registered
# MaxMatch oracles (this one and round12's tokenizer-true sizing) build
# from these, so a change to the UNK rule or the pattern edits ONE place.
_MAXMATCH_COVERED_SQL = (
    f"regexp_replace(word, '{_MAXMATCH_PATTERN}', '', 'g') = ''"
)
_MAXMATCH_RAW_SQL = (
    f"trim(regexp_replace(word, '{_MAXMATCH_PATTERN}', '\\1 ', 'g'))"
)
_MAXMATCH_NPIECES_SQL = f"""CASE WHEN {_MAXMATCH_COVERED_SQL}
         THEN CAST(len(string_split({_MAXMATCH_RAW_SQL}, ' ')) AS BIGINT)
         ELSE 1 END"""


@register(
    "maxmatch_encode_words",
    oracle=f"""
    WITH w AS (SELECT unnest({TOKS_SQL}) AS word FROM documents),
    freq AS (SELECT word, COUNT(*)::BIGINT AS freq FROM w GROUP BY 1)
    SELECT word, freq,
           CASE WHEN {_MAXMATCH_COVERED_SQL}
                THEN {_MAXMATCH_RAW_SQL} ELSE '[UNK]' END AS pieces,
           {_MAXMATCH_NPIECES_SQL} AS n_pieces,
           NOT ({_MAXMATCH_COVERED_SQL}) AS is_unk
    FROM freq
    """,
    doc="MaxMatch tokenization audit — the WordPiece INFERENCE loop "
    "beside the BPE trainer/encoder (operators/packing.py::"
    "maxmatch_encode_words): every distinct corpus word greedily "
    "tokenized longest-match-first against a fixed vocab; a word with "
    "an uncoverable position becomes [UNK] whole (digit-bearing words "
    "here). The engine trick: the vocab sorted (length desc, lex) as "
    "ONE regex alternation — Java regex and RE2 share leftmost-FIRST "
    "alternation preference, so a single regexp_replace IS the greedy "
    "scan on both engines. Corpus work is one distinct-word aggregate "
    "(vocab-sized, the bpe_train discipline); the encode is a "
    "zero-shuffle regex projection.",
)
def maxmatch_encode_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.packing import maxmatch_encode_words as mm

    docs = load_table(spark, sf_dir, "documents")
    return mm(docs, _MAXMATCH_VOCAB)


@register(
    "url_dedup_groups",
    oracle=f"""
    WITH raw AS (SELECT doc_id, n_chars, {_URL_EXPR} AS url
                 FROM documents),
    {_SQL_URL_PARTS}
    SELECT canonical_url, MIN(doc_id) AS keep_doc_id,
           COUNT(*)::BIGINT AS dup_count
    FROM ext GROUP BY canonical_url
    """,
    doc="URL-level dedup groups — the FIRST dedup stage of every "
    "web-corpus pipeline, upstream of text hashing (functions/urls.py::"
    "canonical_url + the dedup_exact keep-min convention): crawls of "
    "the same page differing only in tracking params / fragment / "
    "www / port / trailing slash collapse to one canonical key, keeper "
    "= min doc_id. One projection + one canonical-key groupBy — "
    "massively cheaper than text dedup because the key is bytes, not "
    "content, which is exactly why it runs first at 100 TB.",
)
def url_dedup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.urls import canonical_url

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.expr(_URL_EXPR).alias("url")
    )
    return (
        docs.select("doc_id", canonical_url("url").alias("canonical_url"))
        .groupBy("canonical_url")
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count(F.lit(1)).cast("long").alias("dup_count"),
        )
    )


# ---------------------------------------------------------------------------
# categorical column association (profiling)
# ---------------------------------------------------------------------------


@register(
    "column_association_source_lang",
    oracle="""
    WITH cells AS (SELECT source AS a, lang AS b, COUNT(*)::BIGINT AS c_ab
                   FROM documents GROUP BY 1, 2),
    tot AS (SELECT SUM(c_ab)::BIGINT AS n,
                   -- COUNT(DISTINCT) drops NULL: add the NULL category
                   (COUNT(DISTINCT a)
                    + MAX(CASE WHEN a IS NULL THEN 1 ELSE 0 END))::BIGINT
                       AS k_a,
                   (COUNT(DISTINCT b)
                    + MAX(CASE WHEN b IS NULL THEN 1 ELSE 0 END))::BIGINT
                       AS k_b
            FROM cells),
    ma AS (SELECT a, SUM(c_ab)::BIGINT AS c_a FROM cells GROUP BY 1),
    mb AS (SELECT b, SUM(c_ab)::BIGINT AS c_b FROM cells GROUP BY 1),
    terms AS (
      SELECT n, k_a, k_b,
             CAST(round((c_ab::DOUBLE / n)
                  * ln(c_ab::DOUBLE * n / (c_a::DOUBLE * c_b)), 9)
                  AS DECIMAL(28,9)) AS mi_t,
             CAST(round(POWER(c_ab - c_a::DOUBLE * c_b / n, 2)
                  / (c_a::DOUBLE * c_b / n), 9)
                  AS DECIMAL(28,9)) AS chi_t,
             -- unobserved cells contribute (0-e)^2/e = e; their total
             -- is n - sum_observed(e) (expected counts sum to n)
             CAST(round(c_a::DOUBLE * c_b / n, 9)
                  AS DECIMAL(28,9)) AS e_t
      FROM cells
      JOIN ma ON cells.a IS NOT DISTINCT FROM ma.a
      JOIN mb ON cells.b IS NOT DISTINCT FROM mb.b
      CROSS JOIN tot)
    SELECT n, k_a, k_b,
           round(CAST(SUM(mi_t) AS DOUBLE), 6) AS mi,
           round(CAST(SUM(chi_t) AS DOUBLE) + n
                 - CAST(SUM(e_t) AS DOUBLE), 6) AS chi2,
           CASE WHEN least(k_a, k_b) > 1
                THEN round(sqrt((CAST(SUM(chi_t) AS DOUBLE) + n
                     - CAST(SUM(e_t) AS DOUBLE))
                     / (n * (least(k_a, k_b) - 1))), 6)
                END AS cramers_v
    FROM terms GROUP BY n, k_a, k_b
    """,
    doc="Categorical association between source and lang "
    "(operators/profiling.py::column_association): mutual information "
    "(nats), chi-square and Cramér's V from the exact contingency "
    "table — the is-my-grouping-confounded check a curation pass runs "
    "before trusting a per-source mixture (a high V means sampling by "
    "source silently skews languages; the same primitive detects a "
    "feature leaking the label). ONE corpus shuffle builds the cells; "
    "all statistics run on the cardinality_a x cardinality_b frame. "
    "Per-cell terms round to 9 dp and sum as exact decimals "
    "(order-independent, engine-portable — the entropy/PMI convention).",
)
def column_association_source_lang(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.profiling import column_association

    docs = load_table(spark, sf_dir, "documents")
    return column_association(docs, "source", "lang")
