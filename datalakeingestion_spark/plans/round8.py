"""Round-8 plans: five curation-surface operators.

- ``dedup_lsh_salvaged`` — hot-band LSH SALVAGE: the flood cap
  (``max_bucket``) bounds a hot band bucket's cost by DROPPING it,
  losing the flood's recall; the salvage path
  (``operators/dedup.py::lsh_candidate_pairs_salvaged``) splits the hot
  bucket into deterministic md5-salt groups of ~``salt_target`` docs,
  pairs within groups, and chains the groups through their min-doc
  representatives — linear in bucket size, every pair still
  exact-Jaccard verified, and a true near-identical flood stays ONE
  connected component. The oracle replicates the salting byte-for-byte
  (md5-prefix hash, integer-ceil group count, window LAG chain); the
  fixture's size-3 buckets exceed ``max_bucket=2``, exercising the hot
  path end to end. Adversarial flood behavior pinned in
  tests/test_dedup.py.
- ``dedup_substring_spans`` — Lee-et-al-2022 exact substring (span)
  duplication audit at token 8-gram granularity.
- ``dedup_substring_vs_lake`` — the same screen at the ingestion door:
  incoming docs against the lake's gram set, asymmetric per-batch cost.
- ``hits_trade_graph_2iter`` — exact integer HITS (hubs & authorities)
  over the directed customer→supplier graph, unrolled-CTE oracle.
- ``entity_resolution_customers`` — record linkage with blocking
  (structured-entity dedup; codegen Levenshtein gate).

Reference pendant: none — greenfield scale operators (SURVEY.md §2
beyond-reference set).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import dedup as dd
from ..sources.fixtures import load_table
from .llm import TOKS_SQL, _h60_sql, _sig_bands_ctes
from .registry import register

_MAX_BUCKET = 2
_SALT_TARGET = 2
_THRESHOLD = 0.5


def _salvaged_oracle() -> str:
    mb, st = _MAX_BUCKET, _SALT_TARGET
    return f"""
    WITH {_sig_bands_ctes()},
    bsz AS (SELECT band_id, band_sig, COUNT(*) AS bs
            FROM bands GROUP BY 1, 2),
    bb AS (SELECT b.doc_id, b.band_id, b.band_sig, z.bs
           FROM bands b JOIN bsz z USING (band_id, band_sig)),
    cold AS (SELECT doc_id, band_id, band_sig FROM bb WHERE bs <= {mb}),
    coldp AS (SELECT b1.doc_id AS doc_id_a, b2.doc_id AS doc_id_b
              FROM cold b1 JOIN cold b2
                ON b1.band_id = b2.band_id AND b1.band_sig = b2.band_sig
               AND b1.doc_id < b2.doc_id),
    hot AS (SELECT doc_id, band_id, band_sig,
                   {_h60_sql('CAST(doc_id AS VARCHAR)')}
                     % ((bs + {st} - 1) // {st}) AS salt
            FROM bb WHERE bs > {mb}),
    withinp AS (SELECT b1.doc_id AS doc_id_a, b2.doc_id AS doc_id_b
                FROM hot b1 JOIN hot b2
                  ON b1.band_id = b2.band_id AND b1.band_sig = b2.band_sig
                 AND b1.salt = b2.salt AND b1.doc_id < b2.doc_id),
    reps AS (SELECT band_id, band_sig, salt, MIN(doc_id) AS rep
             FROM hot GROUP BY 1, 2, 3),
    lagged AS (SELECT rep, LAG(rep) OVER (
                   PARTITION BY band_id, band_sig ORDER BY salt) AS prev
               FROM reps),
    chain AS (SELECT LEAST(prev, rep) AS doc_id_a,
                     GREATEST(prev, rep) AS doc_id_b
              FROM lagged WHERE prev IS NOT NULL),
    cand AS (SELECT DISTINCT doc_id_a, doc_id_b FROM
             (SELECT * FROM coldp UNION ALL
              SELECT * FROM withinp UNION ALL
              SELECT * FROM chain)),
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
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
    WHERE round(i / (sa.sz + sb.sz - i), 6) >= {_THRESHOLD}
    """


@register(
    "dedup_lsh_salvaged",
    oracle=_salvaged_oracle(),
    doc="MinHash-LSH near-dup pairs with hot-band SALVAGE instead of the "
    "flood cap's drop: over-full band buckets split into md5-salt groups "
    "(pairs within groups + a min-doc representative chain), bounding a "
    "hot bucket's cost LINEARLY in its size while keeping every true "
    "flood one connected component for cluster resolution. The oracle "
    "replicates the salting exactly (md5 hash, integer-ceil group count, "
    "LAG chain), so the comparison is deterministic.",
)
def dedup_lsh_salvaged(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return dd.minhash_near_duplicates_salvaged(
        docs,
        threshold=_THRESHOLD,
        max_bucket=_MAX_BUCKET,
        salt_target=_SALT_TARGET,
    )


_SUBSTR_N = 8

# DuckDB twin of operators/dedup.py::substring_dup_stats — positional
# n-grams via unnest(range(...)), "≥2 distinct docs" as min!=max, and
# the same per-doc gaps-and-islands interval union.
_SUBSTR_ORACLE = f"""
    WITH t AS (SELECT doc_id, {TOKS_SQL} AS tk
               FROM documents),
    sizes AS (SELECT doc_id, len(tk) AS n_tokens FROM t),
    sp AS (SELECT doc_id, u.i AS pos,
                  array_to_string(list_slice(tk, u.i, u.i + {_SUBSTR_N - 1}),
                                  ' ') AS g
           FROM t, unnest(range(1, len(tk) - {_SUBSTR_N - 2})) u(i)),
    dup AS (SELECT g FROM sp GROUP BY g
            HAVING MIN(doc_id) <> MAX(doc_id)),
    hits AS (SELECT sp.doc_id, sp.pos, sp.pos + {_SUBSTR_N - 1} AS e
             FROM sp JOIN dup USING (g)),
    isl AS (SELECT doc_id, pos, e,
                   GREATEST(0, e - GREATEST(pos - 1, COALESCE(MAX(e) OVER (
                       PARTITION BY doc_id ORDER BY pos
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ), 0))) AS c
            FROM hits),
    per_doc AS (SELECT doc_id, COUNT(*) AS dup_spans,
                       SUM(c) AS covered_tokens
                FROM isl GROUP BY doc_id)
    SELECT s.doc_id,
           s.n_tokens::BIGINT AS n_tokens,
           COALESCE(p.dup_spans, 0)::BIGINT AS dup_spans,
           COALESCE(p.covered_tokens, 0)::BIGINT AS covered_tokens,
           CASE WHEN s.n_tokens > 0 THEN
               round(COALESCE(p.covered_tokens, 0) / s.n_tokens::DOUBLE, 6)
           END AS dup_fraction
    FROM sizes s LEFT JOIN per_doc p USING (doc_id)
"""


@register(
    "dedup_substring_spans",
    oracle=_SUBSTR_ORACLE,
    doc="Exact cross-doc substring duplication audit (Lee et al. 2022 "
    "span dedup, token 8-gram granularity): per doc, the duplicated "
    "span starts and the interval-union fraction of tokens inside a "
    "span appearing verbatim in another doc. One shuffle on the gram "
    "text (min!=max doc test — no distinct aggregate), one semi-join "
    "back, per-DOC gaps-and-islands window (bounded by doc length).",
)
def dedup_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return dd.substring_dup_stats(docs, n=_SUBSTR_N)


_LAKE_SPLIT = 400  # same batch/lake fixture split as dedup_incremental_vs_lake

_SUBSTR_LAKE_ORACLE = f"""
    WITH t AS (SELECT doc_id, {TOKS_SQL} AS tk FROM documents),
    bt AS (SELECT * FROM t WHERE doc_id >= {_LAKE_SPLIT}),
    sizes AS (SELECT doc_id, len(tk) AS n_tokens FROM bt),
    sp AS (SELECT doc_id, u.i AS pos,
                  array_to_string(list_slice(tk, u.i, u.i + {_SUBSTR_N - 1}),
                                  ' ') AS g
           FROM t, unnest(range(1, len(tk) - {_SUBSTR_N - 2})) u(i)),
    sp_b AS (SELECT * FROM sp WHERE doc_id >= {_LAKE_SPLIT}),
    lake_g AS (SELECT DISTINCT g FROM sp WHERE doc_id < {_LAKE_SPLIT}),
    within AS (SELECT g FROM sp_b GROUP BY g
               HAVING MIN(doc_id) <> MAX(doc_id)),
    dup AS (SELECT g FROM lake_g UNION SELECT g FROM within),
    hits AS (SELECT sp_b.doc_id, sp_b.pos, sp_b.pos + {_SUBSTR_N - 1} AS e
             FROM sp_b JOIN dup USING (g)),
    isl AS (SELECT doc_id, pos, e,
                   GREATEST(0, e - GREATEST(pos - 1, COALESCE(MAX(e) OVER (
                       PARTITION BY doc_id ORDER BY pos
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ), 0))) AS c
            FROM hits),
    per_doc AS (SELECT doc_id, COUNT(*) AS dup_spans,
                       SUM(c) AS covered_tokens
                FROM isl GROUP BY doc_id)
    SELECT s.doc_id,
           s.n_tokens::BIGINT AS n_tokens,
           COALESCE(p.dup_spans, 0)::BIGINT AS dup_spans,
           COALESCE(p.covered_tokens, 0)::BIGINT AS covered_tokens,
           CASE WHEN s.n_tokens > 0 THEN
               round(COALESCE(p.covered_tokens, 0) / s.n_tokens::DOUBLE, 6)
           END AS dup_fraction
    FROM sizes s LEFT JOIN per_doc p USING (doc_id)
"""


@register(
    "dedup_substring_vs_lake",
    oracle=_SUBSTR_LAKE_ORACLE,
    doc="Substring dedup AT THE DOOR: for each incoming doc (doc_id >= "
    "400), the interval-union fraction of its tokens covered by token "
    "8-grams already present in the lake (doc_id < 400) or verbatim in "
    "another batch doc. Asymmetric like dedup_incremental_vs_lake: only "
    "batch grams carry positions, the lake contributes a distinct gram "
    "set — per-batch cost O(batch grams) + one join; at scale the lake "
    "gram table persists bucketed (build_dedup_index pattern) so the "
    "lake side never re-shuffles.",
)
def dedup_substring_vs_lake(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return dd.substring_dup_vs_lake(
        docs.filter(F.col("doc_id") >= _LAKE_SPLIT),
        docs.filter(F.col("doc_id") < _LAKE_SPLIT),
        n=_SUBSTR_N,
    )


_HITS_SCALE = 10**9


def _hits_sweep_sql(i: int, prev_hub: str) -> str:
    s = _HITS_SCALE
    return f"""ar{i} AS (SELECT e.dst, SUM(h.hub) AS araw
            FROM e JOIN {prev_hub} h ON h.node = e.src GROUP BY e.dst),
    at{i} AS (SELECT SUM(araw)::BIGINT AS atot FROM ar{i}),
    a{i} AS (SELECT nd.node,
                  CAST(CAST(COALESCE(ar.araw, 0) AS HUGEINT) * {s}
                       // t.atot AS BIGINT) AS auth
           FROM nodes nd CROSS JOIN at{i} t
           LEFT JOIN ar{i} ar ON ar.dst = nd.node),
    hr{i} AS (SELECT e.src, SUM(a.auth) AS hraw
            FROM e JOIN a{i} a ON a.node = e.dst GROUP BY e.src),
    ht{i} AS (SELECT SUM(hraw)::BIGINT AS htot FROM hr{i}),
    h{i} AS (SELECT nd.node,
                  CAST(CAST(COALESCE(hr.hraw, 0) AS HUGEINT) * {s}
                       // t.htot AS BIGINT) AS hub
           FROM nodes nd CROSS JOIN ht{i} t
           LEFT JOIN hr{i} hr ON hr.src = nd.node)"""


_HITS_ORACLE = f"""
    WITH e AS (SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS src,
                      's' || CAST(l_suppkey AS VARCHAR) AS dst
               FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
    nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
    h0 AS (SELECT node, {_HITS_SCALE}::BIGINT AS hub FROM nodes),
    {_hits_sweep_sql(1, "h0")},
    {_hits_sweep_sql(2, "h1")},
    ranked AS (SELECT h2.node, h2.hub, a2.auth,
                      row_number() OVER (ORDER BY a2.auth DESC, h2.hub DESC,
                                         h2.node) AS rnk
               FROM h2 JOIN a2 ON a2.node = h2.node)
    SELECT node, hub, auth, rnk FROM ranked WHERE rnk <= 20
"""


@register(
    "entity_resolution_customers",
    oracle="""
    SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
           levenshtein(a.c_name, b.c_name) AS edit_dist,
           a.c_nationkey AS c_nationkey
    FROM customer a JOIN customer b
      ON a.c_nationkey = b.c_nationkey AND a.c_custkey < b.c_custkey
    WHERE levenshtein(a.c_name, b.c_name) <= 2
    """,
    doc="Record linkage / entity resolution with BLOCKING "
    "(operators/linkage.py::blocked_similarity_pairs): candidate pairs "
    "only WITHIN nation blocks (never all-pairs — Fellegi-Sunter "
    "blocking practice), then a codegen Levenshtein gate (Spark "
    "F.levenshtein == DuckDB levenshtein, unit-cost edit distance, so "
    "the oracle is exact). One shuffle on the block key; a skewed block "
    "is the LSH hot-bucket problem — cap or salt it the same way.",
)
def entity_resolution_customers(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.linkage import blocked_similarity_pairs

    cust = load_table(spark, sf_dir, "customer")
    return blocked_similarity_pairs(
        cust, "c_custkey", ["c_nationkey"], "c_name", max_edit=2
    )


@register(
    "hits_trade_graph_2iter",
    oracle=_HITS_ORACLE,
    doc="Exact fixed-point HITS (Kleinberg hubs & authorities), 2 "
    "synchronous sweeps over the DIRECTED customer→supplier trade graph "
    "(operators/graph.py::hits_fixed_point) — the crawl-frontier "
    "quality score beside PageRank. L1-normalized integer arithmetic "
    "with the raw·scale product in DECIMAL(38,0) (Spark decimal div == "
    "DuckDB HUGEINT //, verified), so the unrolled-CTE oracle is "
    "bit-exact. Per sweep: two edge-key hash joins + two map-side-"
    "combinable SUMs; scores localCheckpoint per sweep (node-sized, "
    "lineage-truncating — lazy chaining re-expands 4^iters) and the "
    "normalization totals are control-plane scalars.",
)
def hits_trade_graph_2iter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from ..operators.graph import hits_fixed_point

    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    edges = (
        orders.select("o_orderkey", "o_custkey")
        .join(
            li.select("l_orderkey", "l_suppkey"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .select(
            F.concat(F.lit("c"), F.col("o_custkey")).alias("src"),
            F.concat(F.lit("s"), F.col("l_suppkey")).alias("dst"),
        )
        .distinct()
    )
    scored = hits_fixed_point(edges, iters=2, scale=_HITS_SCALE)
    w = Window.orderBy(
        F.col("auth").desc(), F.col("hub").desc(), F.col("node")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 20)
        .select("node", "hub", "auth", "rnk")
    )
