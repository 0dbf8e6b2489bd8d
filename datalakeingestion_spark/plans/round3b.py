"""Round-3 continuation plans: incremental view maintenance, graph
ranking, storage layout, LM scoring, and corpus mixing.

Same contract as every other plan module: the oracle SQL is generated
from the same constants as the Spark plan; every computed column is
aliased identically on both sides; float-bearing results go through
exact-decimal or bit-identical single-op double math (see NOTES_r3/r4
determinism playbook).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.fixtures import load_table
from .registry import register

# Split date for the incremental-maintenance demos: rows strictly before
# are the "already ingested" base; the rest are the new batch.
_MV_SPLIT = "1997-01-01"

_DEC = "DECIMAL(18,4)"

_MV_ORACLE_BODY = f"""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS {_DEC})) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS {_DEC})
                    * (1 - CAST(l_discount AS {_DEC}))) AS DOUBLE)
               AS sum_revenue,
           COUNT(*) AS n_rows,
           CAST(SUM(CAST(l_quantity AS {_DEC})) AS DOUBLE) / COUNT(*)
               AS avg_qty
    FROM lineitem
"""


def _mv_measures():
    return {
        "sum_qty": F.col("l_quantity").cast(_DEC),
        "sum_revenue": (
            F.col("l_extendedprice").cast(_DEC)
            * (F.lit(1).cast(_DEC) - F.col("l_discount").cast(_DEC))
        ),
    }


def _mv_keys():
    return ["l_returnflag", "l_linestatus"]


@register(
    "mv_incremental_revenue",
    oracle=_MV_ORACLE_BODY + " GROUP BY l_returnflag, l_linestatus",
    doc="Incrementally-maintained revenue view (operators/mv.py): the "
    "lake's already-ingested base and the new batch each produce a "
    "per-key partial-aggregate STATE (exact-decimal sums + row count); "
    "the view is the merge of the two states — never a rescan of the "
    "base. The oracle is the from-scratch aggregate over everything, "
    "pinning the algebraic-merge identity the incremental path relies "
    "on. At 100 TB each state is distinct-key-sized and the merge "
    "shuffles states only; the reference recomputes its Athena views "
    "from scratch every run (README.md:30-36) — this is the scale-path "
    "replacement.",
)
def mv_incremental_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.mv import aggregate_state, finalize_state, merge_states

    li = load_table(spark, sf_dir, "lineitem")
    base = li.filter(F.col("l_shipdate") < F.lit(_MV_SPLIT))
    batch = li.filter(F.col("l_shipdate") >= F.lit(_MV_SPLIT))
    keys, meas = _mv_keys(), _mv_measures()
    state = merge_states(
        [aggregate_state(base, keys, meas), aggregate_state(batch, keys, meas)],
        keys,
    )
    return finalize_state(state, keys, avg_of={"avg_qty": "sum_qty"})


@register(
    "mv_retraction_consistency",
    oracle=_MV_ORACLE_BODY
    + f" WHERE l_shipdate < DATE '{_MV_SPLIT}'"
    + " GROUP BY l_returnflag, l_linestatus",
    doc="CDC-delete path of the incremental view (operators/mv.py): the "
    "full-corpus state merged with a sign=-1 RETRACTION state of the "
    "post-split rows must equal the from-scratch aggregate of the "
    "surviving rows (the oracle). Pins that deletes fold through the "
    "same merge as inserts — the view never needs the base table to "
    "process a delete batch.",
)
def mv_retraction_consistency(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.mv import aggregate_state, finalize_state, merge_states

    li = load_table(spark, sf_dir, "lineitem")
    deleted = li.filter(F.col("l_shipdate") >= F.lit(_MV_SPLIT))
    keys, meas = _mv_keys(), _mv_measures()
    state = merge_states(
        [
            aggregate_state(li, keys, meas),
            aggregate_state(deleted, keys, meas, sign=-1),
        ],
        keys,
    )
    return finalize_state(state, keys, avg_of={"avg_qty": "sum_qty"})


_PR_SCALE = 10**12
_PR_DAMP = 85


@register(
    "pagerank_trade_graph_3iter",
    oracle=f"""
    WITH pairs AS (
      SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS c,
                      's' || CAST(l_suppkey AS VARCHAR) AS s
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
    e AS (SELECT c AS src, s AS dst FROM pairs
          UNION ALL SELECT s AS src, c AS dst FROM pairs),
    deg AS (SELECT src, COUNT(*) AS outdeg FROM e GROUP BY src),
    nodes AS (SELECT src AS node FROM e UNION SELECT dst AS node FROM e),
    p AS (SELECT COUNT(*)::BIGINT AS n,
                 ({_PR_SCALE} * {100 - _PR_DAMP}) // (100 * COUNT(*)::BIGINT)
                     AS base
          FROM nodes),
    r0 AS (SELECT node, {_PR_SCALE} // n AS rank FROM nodes CROSS JOIN p),
    it1 AS (SELECT nd.node, CAST(p.base + ({_PR_DAMP} * COALESCE(rv.recv, 0)) // 100 AS BIGINT) AS rank
            FROM nodes nd CROSS JOIN p
            LEFT JOIN (SELECT e.dst, SUM(r.rank // d.outdeg) AS recv
                       FROM e JOIN deg d ON e.src = d.src
                       JOIN r0 r ON r.node = e.src
                       GROUP BY e.dst) rv ON rv.dst = nd.node),
    it2 AS (SELECT nd.node, CAST(p.base + ({_PR_DAMP} * COALESCE(rv.recv, 0)) // 100 AS BIGINT) AS rank
            FROM nodes nd CROSS JOIN p
            LEFT JOIN (SELECT e.dst, SUM(r.rank // d.outdeg) AS recv
                       FROM e JOIN deg d ON e.src = d.src
                       JOIN it1 r ON r.node = e.src
                       GROUP BY e.dst) rv ON rv.dst = nd.node),
    it3 AS (SELECT nd.node, CAST(p.base + ({_PR_DAMP} * COALESCE(rv.recv, 0)) // 100 AS BIGINT) AS rank
            FROM nodes nd CROSS JOIN p
            LEFT JOIN (SELECT e.dst, SUM(r.rank // d.outdeg) AS recv
                       FROM e JOIN deg d ON e.src = d.src
                       JOIN it2 r ON r.node = e.src
                       GROUP BY e.dst) rv ON rv.dst = nd.node),
    ranked AS (SELECT node, rank,
                      row_number() OVER (ORDER BY rank DESC, node) AS rnk
               FROM it3)
    SELECT node, rank, rnk FROM ranked WHERE rnk <= 20
    """,
    doc="Exact fixed-point PageRank, 3 synchronous sweeps over the "
    "symmetric customer-supplier trade graph "
    "(operators/graph.py::pagerank_fixed_point) — the iterative-"
    "algorithm pattern (crawl-authority / link-spam scoring in a "
    "training-data pipeline). Ranks are bigint fixed-point (10^12 = "
    "1.0), every step bigint multiply/floor-div/sum, so the unrolled-CTE "
    "oracle reproduces it bit-for-bit — impossible with float PageRank "
    "(summation-order drift). Per sweep: one hash join on src + one "
    "map-side-combinable SUM on dst; the rank frame is node-sized.",
)
def pagerank_trade_graph_3iter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from ..operators.graph import customer_supplier_edges, pagerank_fixed_point

    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    edges = customer_supplier_edges(orders, li)
    rank = pagerank_fixed_point(
        edges, iters=3, damping_pct=_PR_DAMP, scale=_PR_SCALE
    )
    # limit-first (TakeOrderedAndProject), then window only the 20 rows
    top = rank.orderBy(F.col("rank").desc(), F.col("node")).limit(20)
    w = Window.orderBy(F.col("rank").desc(), F.col("node"))
    return top.withColumn("rnk", F.row_number().over(w)).select(
        "node", "rank", "rnk"
    )


_ZO_BITS = 6
_ZO_ROWS_PER_FILE = 500
# box predicate: a price band crossed with a date band inside the
# data mass (x spans 0-63 median 52, y spans 27-63 median 58 at sf0.01)
# and selective on both dims, so layout quality shows.
_ZO_BOX = {"x": (40, 45), "y": (40, 45)}


from ..operators.layout import morton_code_sql as _morton_sql  # noqa: E402

_ZO_PREP_SQL = f"""
    WITH r AS (
      SELECT l_orderkey * 100 + l_linenumber AS uid,
             GREATEST(0, LEAST(63,
                 CAST(floor(l_extendedprice / 1000.0) AS BIGINT))) AS x,
             GREATEST(0, LEAST(63,
                 datediff('day', DATE '1992-01-01', l_shipdate) // 40)) AS y
      FROM lineitem),
    u AS (SELECT uid, MIN(x) AS x, MIN(y) AS y FROM r GROUP BY uid),
    zc AS (SELECT uid, x, y, {_morton_sql('x', 'y', _ZO_BITS)} AS z FROM u),
    lin AS (SELECT x, y,
                   (row_number() OVER (ORDER BY y, uid) - 1)
                       // {_ZO_ROWS_PER_FILE} AS file_id
            FROM zc),
    zf AS (SELECT x, y,
                  (row_number() OVER (ORDER BY z, uid) - 1)
                      // {_ZO_ROWS_PER_FILE} AS file_id
           FROM zc),
    linstats AS (SELECT file_id, COUNT(*) AS n_rows,
                        MIN(x) AS min_x, MAX(x) AS max_x,
                        MIN(y) AS min_y, MAX(y) AS max_y
                 FROM lin GROUP BY file_id),
    zstats AS (SELECT file_id, COUNT(*) AS n_rows,
                      MIN(x) AS min_x, MAX(x) AS max_x,
                      MIN(y) AS min_y, MAX(y) AS max_y
               FROM zf GROUP BY file_id)
"""

_ZO_BOX_SQL = (
    "min_x <= {xhi} AND max_x >= {xlo} AND min_y <= {yhi} AND max_y >= {ylo}"
).format(
    xlo=_ZO_BOX["x"][0], xhi=_ZO_BOX["x"][1],
    ylo=_ZO_BOX["y"][0], yhi=_ZO_BOX["y"][1],
)


@register(
    "zorder_skipping_report",
    oracle=_ZO_PREP_SQL + f"""
    SELECT 'linear' AS layout,
           COUNT(*) AS n_files,
           CAST(SUM(CASE WHEN {_ZO_BOX_SQL} THEN 1 ELSE 0 END) AS BIGINT)
               AS files_scanned,
           CAST(SUM(CASE WHEN {_ZO_BOX_SQL} THEN n_rows ELSE 0 END)
                AS BIGINT) AS rows_in_scanned
    FROM linstats
    UNION ALL
    SELECT 'zorder' AS layout,
           COUNT(*) AS n_files,
           CAST(SUM(CASE WHEN {_ZO_BOX_SQL} THEN 1 ELSE 0 END) AS BIGINT)
               AS files_scanned,
           CAST(SUM(CASE WHEN {_ZO_BOX_SQL} THEN n_rows ELSE 0 END)
                AS BIGINT) AS rows_in_scanned
    FROM zstats
    """,
    doc="Data-skipping effectiveness of a Z-order layout vs the natural "
    "date-ordered layout (operators/layout.py): rows are assigned to "
    "fixed-size files by rank in each order (rank via the distributed "
    "prefix sum, never a global window on the Spark side), per-file "
    "min/max stats computed, and a 2-D box predicate counts the files a "
    "min-max pruner must scan. The Morton key is exact bigint bit "
    "interleaving, so the oracle reproduces the whole report. This is "
    "the decision artifact for a Delta OPTIMIZE ZORDER BY rewrite — at "
    "100 TB the scan you skip is the fastest scan.",
)
def zorder_skipping_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.layout import (
        file_minmax_stats,
        morton_code,
        pruning_stats,
    )

    li = load_table(spark, sf_dir, "lineitem")
    rows = li.select(
        (F.col("l_orderkey") * 100 + F.col("l_linenumber")).alias("uid"),
        F.greatest(
            F.lit(0),
            F.least(
                F.lit(63),
                F.floor(F.col("l_extendedprice") / F.lit(1000.0)),
            ),
        ).alias("x"),
        F.greatest(
            F.lit(0),
            F.least(
                F.lit(63),
                F.expr(
                    "datediff(l_shipdate, DATE '1992-01-01') div 40"
                ),
            ),
        ).alias("y"),
    )
    # the synthetic fixtures are NOT unique on (orderkey, linenumber) —
    # collapse duplicates deterministically so uid keys the rank join
    rows = rows.groupBy("uid").agg(
        F.min("x").alias("x"), F.min("y").alias("y")
    )
    rows = rows.withColumn(
        "z", morton_code(F.col("x"), F.col("y"), _ZO_BITS)
    ).persist()
    lin = file_minmax_stats(
        rows, "uid", ["y", "uid"], ["x", "y"], _ZO_ROWS_PER_FILE
    )
    zf = file_minmax_stats(
        rows, "uid", ["z", "uid"], ["x", "y"], _ZO_ROWS_PER_FILE
    )
    return pruning_stats(lin, _ZO_BOX, "linear").unionByName(
        pruning_stats(zf, _ZO_BOX, "zorder")
    )


from .llm import TOKS_SQL as _TOKS  # noqa: E402

_TRI_SQL = (
    "list_transform(range(1, len(toks) - 1), "
    "i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2])"
)
_BI_SQL = (
    "list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i + 1])"
)


@register(
    "trigram_backoff_score",
    oracle=f"""
    WITH tm AS (SELECT doc_id, {_TOKS} AS toks FROM documents
                WHERE doc_id % 2 = 0),
    ts AS (SELECT doc_id, {_TOKS} AS toks FROM documents
           WHERE doc_id % 2 = 1),
    u AS (SELECT unnest(toks) AS tok FROM tm),
    c1 AS (SELECT tok, COUNT(*) AS c1 FROM u GROUP BY tok),
    p AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n,
                 CAST(COUNT(DISTINCT tok) AS DOUBLE) AS v
          FROM u),
    bm AS (SELECT unnest({_BI_SQL}) AS bg FROM tm),
    c23 AS (SELECT bg, COUNT(*) AS c23 FROM bm GROUP BY bg),
    c2 AS (SELECT string_split(bg, ' ')[1] AS w2,
                  CAST(SUM(c23) AS BIGINT) AS c2
           FROM c23 GROUP BY 1),
    trm AS (SELECT unnest({_TRI_SQL}) AS tg FROM tm),
    c3 AS (SELECT tg, COUNT(*) AS c3 FROM trm GROUP BY tg),
    c12 AS (SELECT string_split(tg, ' ')[1] || ' ' || string_split(tg, ' ')[2]
                       AS k12,
                   CAST(SUM(c3) AS BIGINT) AS c12
            FROM c3 GROUP BY 1),
    st AS (SELECT doc_id, unnest({_TRI_SQL}) AS tg FROM ts),
    sp AS (SELECT doc_id, tg,
                  string_split(tg, ' ')[1] || ' ' || string_split(tg, ' ')[2]
                      AS k12,
                  string_split(tg, ' ')[2] || ' ' || string_split(tg, ' ')[3]
                      AS k23,
                  string_split(tg, ' ')[2] AS w2,
                  string_split(tg, ' ')[3] AS w3
           FROM st),
    j AS (SELECT sp.doc_id,
                 CAST(round(
                   CASE WHEN c3.c3 IS NOT NULL THEN ln(c3.c3 / c12.c12)
                        WHEN c23.c23 IS NOT NULL
                            THEN ln(CAST(0.4 AS DOUBLE) * c23.c23 / c2.c2)
                        ELSE ln((CAST(0.4 AS DOUBLE) * CAST(0.4 AS DOUBLE))
                                * (COALESCE(c1.c1, 0) + 0.5)
                                / (p.n + 0.5 * p.v))
                   END, 6) AS DECIMAL(27,6)) AS lp,
                 CASE WHEN c3.c3 IS NULL THEN 1 ELSE 0 END AS bo,
                 CASE WHEN c3.c3 IS NULL AND c23.c23 IS NULL THEN 1 ELSE 0
                     END AS bo2
          FROM sp CROSS JOIN p
          LEFT JOIN c3 ON c3.tg = sp.tg
          LEFT JOIN c12 ON c12.k12 = sp.k12
          LEFT JOIN c23 ON c23.bg = sp.k23
          LEFT JOIN c2 ON c2.w2 = sp.w2
          LEFT JOIN c1 ON c1.tok = sp.w3)
    SELECT doc_id,
           COUNT(*)::BIGINT AS n_trigrams,
           CAST(SUM(bo) - SUM(bo2) AS BIGINT) AS n_backoff_bigram,
           CAST(SUM(bo2) AS BIGINT) AS n_backoff_unigram,
           CAST(SUM(lp) AS DOUBLE) / COUNT(*) AS mean_logprob
    FROM j GROUP BY doc_id
    """,
    doc="Per-doc mean log-score under a TRIGRAM stupid-backoff LM "
    "(operators/text_analysis.py::trigram_backoff_logprob) trained on "
    "the even-doc_id half of the corpus and scored on the odd half — "
    "the holdout split is what makes the backoff branches live (a "
    "corpus scored under its own trigram counts never backs off). "
    "Backoff-path counts ship as columns so the oracle pins that the "
    "cascade actually fires. Scoring is a chain of hash equi-joins on "
    "shingle keys; context counts derive from the aggregated count "
    "frames, never the raw token stream.",
)
def trigram_backoff_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text_analysis import trigram_backoff_logprob

    docs = load_table(spark, sf_dir, "documents")
    model = docs.filter(F.col("doc_id") % 2 == 0)
    score = docs.filter(F.col("doc_id") % 2 == 1)
    return trigram_backoff_logprob(model, score)


@register(
    "mix_corpora_temperature_half",
    oracle="""
    WITH c AS (SELECT source, COUNT(*) AS n_s FROM documents GROUP BY source),
    m AS (SELECT MIN(n_s) AS n_min FROM c),
    r AS (SELECT source,
                 CAST(floor(sqrt(CAST(n_min AS DOUBLE) / CAST(n_s AS DOUBLE))
                            * CAST(4294967296 AS DOUBLE)) AS BIGINT)
                     AS mix_rate_threshold
          FROM c CROSS JOIN m),
    k AS (SELECT d.source, r.mix_rate_threshold
          FROM documents d JOIN r USING (source)
          WHERE ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)
                                    || '#temp:' || d.source), 1, 8))::BIGINT
                < r.mix_rate_threshold)
    SELECT source, COUNT(*)::BIGINT AS n_kept, mix_rate_threshold
    FROM k GROUP BY source, mix_rate_threshold
    """,
    doc="Temperature-balanced corpus mix at alpha=0.5 "
    "(operators/sampling.py::mix_corpora_temperature) — the XLM-R-style "
    "rebalancing: each source keeps a deterministic hash-sample at rate "
    "sqrt(n_min/n_s), damping big sources toward the smallest. Every "
    "step is one correctly-rounded IEEE op, so the bigint thresholds "
    "(shipped for audit) are bit-identical across engines; the keep "
    "decision is a pushable per-row hash filter — no rand(), no "
    "shuffle beyond the |S|-row source-count aggregate.",
)
def mix_corpora_temperature_half(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sampling import mix_corpora_temperature

    docs = load_table(spark, sf_dir, "documents")
    mixed = mix_corpora_temperature(docs, "source", "doc_id")
    return mixed.groupBy("source", "mix_rate_threshold").agg(
        F.count(F.lit(1)).cast("long").alias("n_kept")
    )


_KMV_K = 128
_KMV_SPACE = "CAST(1152921504606846976 AS DOUBLE)"  # 2^60
_KMV_SPLIT = "1997-01-01"


@register(
    "sketch_kmv_union_intersect",
    oracle=f"""
    WITH f AS (
      SELECT CAST(l_partkey AS VARCHAR) AS v,
             MAX(l_shipdate < DATE '{_KMV_SPLIT}') AS a,
             MAX(l_shipdate >= DATE '{_KMV_SPLIT}') AS b
      FROM lineitem GROUP BY v),
    h AS (SELECT ('0x' || substr(md5(v), 1, 15))::BIGINT AS h, a, b FROM f),
    topk AS (SELECT * FROM h ORDER BY h LIMIT {_KMV_K}),
    agg AS (SELECT COUNT(*) AS n_kept, MAX(h) AS kth,
                   CAST(SUM(CASE WHEN a AND b THEN 1 ELSE 0 END) AS BIGINT)
                       AS c_both
            FROM topk),
    ex AS (SELECT COUNT(*)::BIGINT AS exact_union,
                  CAST(SUM(CASE WHEN a AND b THEN 1 ELSE 0 END) AS BIGINT)
                      AS exact_intersection
           FROM h)
    SELECT {_KMV_K} AS k,
           CASE WHEN n_kept < {_KMV_K} THEN n_kept
                ELSE CAST(round({_KMV_K - 1} / (kth / {_KMV_SPACE}))
                          AS BIGINT) END AS est_union,
           CASE WHEN n_kept < {_KMV_K} THEN c_both
                ELSE CAST(round(((c_both * {_KMV_K - 1}) / {_KMV_K})
                                / (kth / {_KMV_SPACE})) AS BIGINT)
                END AS est_intersection,
           exact_union, exact_intersection
    FROM agg CROSS JOIN ex
    """,
    doc="Theta-sketch-style set algebra over KMV sketches "
    "(operators/sketches.py::kmv_set_relation): estimated |A ∪ B| and "
    "|A ∩ B| for the part sets shipped before/after the split date, "
    "from ONE pass (flag-OR distinct → portable hash → global top-k). "
    "The hash family is deterministic and cross-engine, so even the "
    "ESTIMATES have an exact SQL oracle; exact twins ship beside them "
    "for error audit. At 100 TB the sketch state is O(k) and the "
    "top-k is per-partition partial + tiny merge — the pattern for "
    "audience-overlap / cross-corpus-contamination questions that "
    "would otherwise need a full distinct join.",
)
def sketch_kmv_union_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sketches import kmv_set_relation

    li = load_table(spark, sf_dir, "lineitem")
    return kmv_set_relation(
        li,
        "l_partkey",
        in_a=F.col("l_shipdate") < F.lit(_KMV_SPLIT),
        in_b=F.col("l_shipdate") >= F.lit(_KMV_SPLIT),
        k=_KMV_K,
    )


@register(
    "sample_weighted_aes_top50",
    oracle="""
    WITH s AS (
      SELECT doc_id, n_chars,
             ln((('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#aes'),
                   1, 8))::BIGINT + 1) / CAST(4294967296 AS DOUBLE))
                 / CAST(n_chars AS DOUBLE) AS aes_key
      FROM documents WHERE n_chars > 0),
    r AS (SELECT doc_id, n_chars, aes_key,
                 row_number() OVER (ORDER BY aes_key DESC, doc_id) AS rnk
          FROM s)
    SELECT doc_id, n_chars, round(aes_key, 6) + 0.0 AS aes_key, rnk
    FROM r WHERE rnk <= 50
    """,
    doc="Weighted sampling WITHOUT replacement, 50 docs weighted by "
    "length (operators/sampling.py::weighted_sample_aes) — the "
    "Efraimidis-Spirakis A-ES scheme with the randomness replaced by "
    "the portable hash: sort key ln(u)/w, u = (hash+1)/2^32, largest k "
    "win. Inclusion probability scales with weight, yet the draw is "
    "reproducible on any engine/partitioning — so the SQL oracle "
    "replicates the exact sample. Per-row expression + global top-k "
    "(partial top-k per partition, tiny merge); no shuffle of the data.",
)
def sample_weighted_aes_top50(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from ..operators.sampling import weighted_sample_aes

    docs = load_table(spark, sf_dir, "documents")
    picked = weighted_sample_aes(docs, F.col("n_chars"), "doc_id", 50)
    w = Window.orderBy(F.col("aes_key").desc(), F.col("doc_id"))
    # `+ 0.0` maps IEEE -0.0 to +0.0 on both engines: Spark's
    # BigDecimal-based round() yields +0.0 while DuckDB's keeps the
    # sign, and the external driver hashes the FORMATTED value, so the
    # two zeros would hash-mismatch despite comparing == equal.
    return picked.withColumn("rnk", F.row_number().over(w)).select(
        "doc_id",
        "n_chars",
        (F.round("aes_key", 6) + F.lit(0.0)).alias("aes_key"),
        "rnk",
    )


_COMPACT_TARGET = 100_000
_ROW_BYTES = 120  # est. encoded bytes per lineitem row (planning proxy)


@register(
    "compaction_plan_daily",
    oracle=f"""
    WITH f AS (SELECT l_shipdate AS d, COUNT(*) * {_ROW_BYTES} AS est_bytes
               FROM lineitem GROUP BY l_shipdate),
    c AS (SELECT d, est_bytes,
                 COALESCE(SUM(est_bytes) OVER (
                     ORDER BY d
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                     AS cb
          FROM f),
    g AS (SELECT d, est_bytes,
                 CAST(cb // {_COMPACT_TARGET} AS BIGINT) AS merge_group
          FROM c)
    SELECT merge_group,
           COUNT(*)::BIGINT AS n_files,
           CAST(SUM(est_bytes) AS BIGINT) AS total_bytes,
           CAST(MIN(d) AS VARCHAR) AS d_min,
           CAST(MAX(d) AS VARCHAR) AS d_max
    FROM g GROUP BY merge_group
    """,
    doc="Small-file compaction planning (operators/layout.py::"
    "compaction_plan): one simulated file per ship-date (the classic "
    "daily-ingest small-file problem), packed into ~100 KB merge groups "
    "in date order via the distributed exclusive-prefix-sum — merged "
    "files stay range-clustered so date pruning survives compaction. "
    "Planning runs on the file-stats frame only (metadata-sized, not "
    "data-sized): the 100 TB lake is never read to decide what to "
    "rewrite. Mirrors Delta OPTIMIZE / bin-packing maintenance.",
)
def compaction_plan_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.layout import compaction_plan

    li = load_table(spark, sf_dir, "lineitem")
    files = li.groupBy("l_shipdate").agg(
        (F.count(F.lit(1)) * _ROW_BYTES).cast("long").alias("est_bytes")
    )
    plan = compaction_plan(
        files,
        order_cols=["l_shipdate"],
        bytes_col="est_bytes",
        target_bytes=_COMPACT_TARGET,
        id_col="l_shipdate",
    )
    return plan.groupBy("merge_group").agg(
        F.count(F.lit(1)).cast("long").alias("n_files"),
        F.sum("est_bytes").cast("long").alias("total_bytes"),
        F.min("l_shipdate").cast("string").alias("d_min"),
        F.max("l_shipdate").cast("string").alias("d_max"),
    )
