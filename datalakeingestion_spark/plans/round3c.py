"""Round-3 continuation plans, batch 2: behavioral analytics (cohorts,
transitions, recency decay) and sufficient-statistics regression.

Same determinism contract as every plan module: integer/epoch math where
possible, exact-decimal sums for float aggregates, identical expression
dags on both sides for pure-double derivations.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.buckets import epoch_bucket, floor_div
from ..sources.fixtures import load_table
from .registry import register

_DAY = 86400


@register(
    "retention_cohorts",
    oracle=f"""
    WITH d AS (SELECT user_id, event_type,
                      CAST(floor(epoch(ts)) AS BIGINT) // {_DAY} AS day
               FROM events),
    cohort AS (SELECT user_id, MIN(day) // 7 AS cohort_wk
               FROM d WHERE event_type = 'signup' GROUP BY user_id),
    activity AS (SELECT DISTINCT user_id, day // 7 AS wk FROM d),
    j AS (SELECT c.cohort_wk, a.wk - c.cohort_wk AS week_offset, c.user_id
          FROM cohort c JOIN activity a USING (user_id)
          WHERE a.wk >= c.cohort_wk)
    SELECT cohort_wk, week_offset,
           COUNT(DISTINCT user_id)::BIGINT AS n_users
    FROM j GROUP BY cohort_wk, week_offset
    """,
    doc="Classic retention-cohort matrix from the event log: users "
    "bucketed by signup week, counted in each subsequent active week. "
    "All integer epoch math (timestamp → epoch seconds → day → week), "
    "so the matrix is exact and timezone-independent — no to_date() "
    "that would shift with the session zone. Two keyed aggregates + "
    "one hash join on user_id; the cohort frame is user-sized.",
)
def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    d = ev.select(
        "user_id",
        "event_type",
        epoch_bucket("ts", _DAY).alias("day"),
    )
    cohort = (
        d.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(floor_div(F.min("day"), 7).alias("cohort_wk"))
    )
    activity = d.select(
        "user_id", floor_div("day", 7).alias("wk")
    ).distinct()
    j = activity.join(cohort, "user_id").filter(
        F.col("wk") >= F.col("cohort_wk")
    )
    return (
        j.select(
            "cohort_wk",
            (F.col("wk") - F.col("cohort_wk")).alias("week_offset"),
            "user_id",
        )
        .groupBy("cohort_wk", "week_offset")
        .agg(F.count_distinct("user_id").alias("n_users"))
    )


@register(
    "event_transition_matrix",
    oracle="""
    WITH s AS (SELECT user_id, event_type,
                      lead(event_type) OVER (
                          PARTITION BY user_id ORDER BY ts, event_id)
                          AS next_type
               FROM events)
    SELECT event_type AS from_type, next_type AS to_type,
           COUNT(*)::BIGINT AS n_transitions
    FROM s WHERE next_type IS NOT NULL
    GROUP BY from_type, to_type
    """,
    doc="First-order Markov transition counts between consecutive event "
    "types per user (ordered by ts with event_id tie-break, so the "
    "sequence is a total order and the matrix is exact). One shuffle on "
    "user_id feeding a keyed window lead() — per-key state, scales like "
    "any sessionization; the output is |types|² rows. The "
    "behavioral-sequence sibling of w3_sessionize.",
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = ev.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    )
    return (
        s.filter(F.col("next_type").isNotNull())
        .groupBy(
            F.col("event_type").alias("from_type"),
            F.col("next_type").alias("to_type"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_transitions"))
    )


# half-life 30 days; single precomputed coefficient so both engines
# evaluate exp(coef * age_days) with the identical double constant
_DECAY_COEF = repr(math.log(0.5) / 30.0)


@register(
    "decayed_event_score",
    oracle=f"""
    WITH m AS (SELECT MAX(CAST(floor(epoch(ts)) AS BIGINT)) AS ref
               FROM events),
    w AS (SELECT user_id,
                 CAST(round(exp({_DECAY_COEF}
                               * ((m.ref - CAST(floor(epoch(ts)) AS BIGINT))
                                  / 86400.0)), 6) AS DECIMAL(27,6)) AS w
          FROM events CROSS JOIN m)
    SELECT user_id, COUNT(*)::BIGINT AS n_events,
           CAST(SUM(w) AS DOUBLE) AS decay_score
    FROM w GROUP BY user_id
    """,
    doc="Recency-weighted activity score: each event contributes "
    "exp(-ln2·age/30d) relative to the corpus's newest event — the "
    "freshness prior for training-data recency weighting / user "
    "activity ranking. Age is integer epoch math; the decay weight "
    "rounds to 6 dp and sums as exact decimal, so the score is "
    "partitioning-independent. Zero shuffles beyond the per-user "
    "aggregate; the reference timestamp is a one-row broadcast.",
)
def decayed_event_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    m = ev.agg(F.expr("max(cast(ts as long))").alias("ref"))
    w = ev.crossJoin(F.broadcast(m)).select(
        "user_id",
        F.round(
            F.exp(
                F.lit(float(_DECAY_COEF))
                * (
                    (F.col("ref") - F.expr("cast(ts as long)"))
                    / F.lit(86400.0)
                )
            ),
            6,
        )
        .cast("decimal(27,6)")
        .alias("w"),
    )
    return w.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum("w").cast("double").alias("decay_score"),
    )


_OLS_DEC = "DECIMAL(15,4)"
# DuckDB multiplies decimals in the operand's physical type, so product
# operands must be >= DECIMAL(19,·) to force int128 storage; the values
# are identical at any width (all inputs fit (15,4) exactly)
_OLS_DECM = "DECIMAL(19,4)"
_OLS_PROD = "DECIMAL(38,8)"


@register(
    "ols_price_quantity_by_flag",
    oracle=f"""
    WITH a AS (
      SELECT l_returnflag,
             CAST(COUNT(*) AS DOUBLE) AS n_,
             CAST(SUM(CAST(l_quantity AS {_OLS_DEC})) AS DOUBLE) AS sx,
             CAST(SUM(CAST(l_extendedprice AS {_OLS_DEC})) AS DOUBLE) AS sy,
             CAST(SUM(CAST(CAST(l_quantity AS {_OLS_DECM})
                           * CAST(l_extendedprice AS {_OLS_DECM})
                           AS {_OLS_PROD})) AS DOUBLE) AS sxy,
             CAST(SUM(CAST(CAST(l_quantity AS {_OLS_DECM})
                           * CAST(l_quantity AS {_OLS_DECM})
                           AS {_OLS_PROD})) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(CAST(l_extendedprice AS {_OLS_DECM})
                           * CAST(l_extendedprice AS {_OLS_DECM})
                           AS {_OLS_PROD})) AS DOUBLE) AS syy
      FROM lineitem GROUP BY l_returnflag)
    SELECT l_returnflag,
           CAST(n_ AS BIGINT) AS n,
           round(CASE WHEN (n_ * sxx - sx * sx) <> 0
                THEN (n_ * sxy - sx * sy) / (n_ * sxx - sx * sx) END, 6)
               AS slope,
           round(CASE WHEN (n_ * sxx - sx * sx) <> 0
                THEN (sy - (n_ * sxy - sx * sy) / (n_ * sxx - sx * sx) * sx)
                     / n_ END, 6) AS intercept,
           round(CASE WHEN (n_ * sxx - sx * sx) <> 0
                       AND (n_ * syy - sy * sy) <> 0
                THEN (n_ * sxy - sx * sy) * (n_ * sxy - sx * sy)
                     / ((n_ * sxx - sx * sx) * (n_ * syy - sy * sy)) END, 6)
               AS r2
    FROM a
    """,
    doc="Per-group simple linear regression price ~ quantity "
    "(operators/profiling.py::groupwise_ols) from the five sufficient "
    "statistics — ONE map-side-combinable aggregation pass regardless "
    "of group count or data size, the shape every distributed "
    "regression uses. Sufficient statistics are exact decimal sums "
    "(partitioning-independent); slope/intercept/R² derive from them "
    "in doubles and take a 6-dp presentation rounding (FMA contraction "
    "in the multi-op dag perturbs the last ulp between engines).",
)
def ols_price_quantity_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.profiling import groupwise_ols

    li = load_table(spark, sf_dir, "lineitem")
    # 6-dp presentation rounding on both sides: the derived stats are a
    # multi-op double dag and DuckDB may fuse multiply-adds (FMA), which
    # perturbs the last ulp — observed on r2
    fit = groupwise_ols(
        li, ["l_returnflag"], x="l_quantity", y="l_extendedprice"
    )
    return fit.select(
        "l_returnflag",
        "n",
        F.round("slope", 6).alias("slope"),
        F.round("intercept", 6).alias("intercept"),
        F.round("r2", 6).alias("r2"),
    )


@register(
    "mad_outliers_by_flag",
    oracle="""
    WITH b AS (SELECT l_returnflag AS g,
                      CAST(l_extendedprice AS DECIMAL(15,2)) AS v
               FROM lineitem),
    r AS (SELECT g, v, row_number() OVER (PARTITION BY g ORDER BY v) AS rn,
                 COUNT(*) OVER (PARTITION BY g) AS n
          FROM b),
    med AS (SELECT g, v AS median, n FROM r WHERE rn = (n + 1) // 2),
    dev AS (SELECT b.g, abs(b.v - m.median) AS d, m.median, m.n
            FROM b JOIN med m ON b.g = m.g),
    rd AS (SELECT g, d, n,
                  row_number() OVER (PARTITION BY g ORDER BY d) AS rn
           FROM dev),
    mad AS (SELECT g, d AS mad FROM rd WHERE rn = (n + 1) // 2)
    SELECT dev.g AS l_returnflag,
           CAST(MAX(dev.n) AS BIGINT) AS n,
           CAST(MAX(dev.median) AS DOUBLE) AS median,
           CAST(MAX(mad.mad) AS DOUBLE) AS mad,
           CAST(SUM(CASE WHEN dev.d > 3 * mad.mad THEN 1 ELSE 0 END)
                AS BIGINT) AS n_outliers
    FROM dev JOIN mad ON dev.g = mad.g
    GROUP BY dev.g
    """,
    doc="Robust per-group outlier screen via Median Absolute Deviation "
    "(operators/profiling.py::mad_outliers) — the data-quality fence "
    "that the outliers themselves can't drag, unlike mean/stddev. "
    "Entirely decimal/integer exact: lower median (a data value, no "
    "interpolation), decimal deviations, decimal 3·MAD fence — no "
    "floats anywhere. One hash exchange on the key feeds both ranking "
    "windows; the median/MAD frames are group-count-sized broadcasts.",
)
def mad_outliers_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.profiling import mad_outliers

    li = load_table(spark, sf_dir, "lineitem")
    out = mad_outliers(li, ["l_returnflag"], "l_extendedprice")
    # presentation cast: 2-dp decimals convert losslessly to double
    return out.select(
        "l_returnflag",
        "n",
        F.col("median").cast("double").alias("median"),
        F.col("mad").cast("double").alias("mad"),
        "n_outliers",
    )


_CK_BLOCKS = 64
_CK_SIG = (
    "concat_ws('|', CAST(l_orderkey AS VARCHAR), "
    "CAST(l_linenumber AS VARCHAR), CAST(l_partkey AS VARCHAR), "
    "CAST(l_suppkey AS VARCHAR), "
    "CAST(CAST(l_quantity AS DECIMAL(15,2)) AS VARCHAR), "
    "CAST(CAST(l_extendedprice AS DECIMAL(15,2)) AS VARCHAR), "
    "l_returnflag, CAST(l_shipdate AS VARCHAR))"
)
_CK_H = f"('0x' || substr(md5({_CK_SIG}), 1, 15))::BIGINT"
_CK_DROP = "l_orderkey % 1000 = 7"


@register(
    "table_checksum_diff_blocks",
    oracle=f"""
    WITH l AS (SELECT {_CK_H} % {_CK_BLOCKS} AS block_id,
                      CAST({_CK_H} AS DECIMAL(38,0)) AS h
               FROM lineitem),
    r AS (SELECT {_CK_H} % {_CK_BLOCKS} AS block_id,
                 CAST({_CK_H} AS DECIMAL(38,0)) AS h
          FROM lineitem WHERE NOT ({_CK_DROP})),
    lc AS (SELECT block_id, COUNT(*)::BIGINT AS n_left,
                  CAST(SUM(h) AS DECIMAL(38,0)) AS sum_left
           FROM l GROUP BY block_id),
    rc AS (SELECT block_id, COUNT(*)::BIGINT AS n_right,
                  CAST(SUM(h) AS DECIMAL(38,0)) AS sum_right
           FROM r GROUP BY block_id),
    j AS (SELECT COALESCE(lc.block_id, rc.block_id) AS block_id,
                 COALESCE(n_left, 0) AS n_left,
                 COALESCE(n_right, 0) AS n_right,
                 COALESCE(sum_left, CAST(0 AS DECIMAL(38,0))) AS sum_left,
                 COALESCE(sum_right, CAST(0 AS DECIMAL(38,0))) AS sum_right
          FROM lc FULL OUTER JOIN rc ON lc.block_id = rc.block_id)
    SELECT block_id, n_left, n_right,
           CAST(sum_left % 1152921504606846976 AS BIGINT) AS ck_left,
           CAST(sum_right % 1152921504606846976 AS BIGINT) AS ck_right
    FROM j WHERE n_left <> n_right OR sum_left <> sum_right
    """,
    doc="Merkle-style anti-entropy between two table versions "
    "(operators/reconcile.py::checksum_diff): hash every row over a "
    "canonical fixed-scale string encoding, aggregate exact-decimal "
    "checksums per hash-range block, and full-outer-join the two B-row "
    "frames — blocks that agree are proven identical-in-multiset, so "
    "only differing blocks (here: the ones holding the dropped "
    "l_orderkey%1000=7 rows) need row-level work. The 100 TB diff plan "
    "costs two scans plus 2·B rows; the sibling of timetravel's "
    "version_diff for when both sides are full tables, not commits.",
)
def table_checksum_diff_blocks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.reconcile import checksum_diff

    li = load_table(spark, sf_dir, "lineitem")
    canon = li.select(
        "l_orderkey",
        "l_linenumber",
        "l_partkey",
        "l_suppkey",
        F.col("l_quantity").cast("decimal(15,2)").alias("q"),
        F.col("l_extendedprice").cast("decimal(15,2)").alias("p"),
        "l_returnflag",
        "l_shipdate",
    )
    cols = [
        "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
        "q", "p", "l_returnflag", "l_shipdate",
    ]
    right = canon.filter(~F.expr(_CK_DROP))
    diff = checksum_diff(canon, right, cols, n_blocks=_CK_BLOCKS)
    # ship mod-2^60 residues: the exact decimal sums exceed int64 and
    # would downgrade to lossy floats in the comparison layer
    mod = F.lit(1 << 60).cast("decimal(38,0)")
    return diff.select(
        "block_id",
        "n_left",
        "n_right",
        (F.col("sum_left") % mod).cast("long").alias("ck_left"),
        (F.col("sum_right") % mod).cast("long").alias("ck_right"),
    )


from .llm import TOKS_SQL as _TOKS2  # noqa: E402


@register(
    "oov_rate_by_source",
    oracle=f"""
    WITH vocab AS (SELECT DISTINCT unnest({_TOKS2}) AS tok
                   FROM documents WHERE doc_id % 2 = 0),
    s AS (SELECT source, unnest({_TOKS2}) AS tok
          FROM documents WHERE doc_id % 2 = 1),
    f AS (SELECT s.source, s.tok,
                 CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END AS oov
          FROM s LEFT JOIN vocab v ON s.tok = v.tok)
    SELECT source,
           COUNT(*)::BIGINT AS n_tokens,
           CAST(SUM(oov) AS BIGINT) AS n_oov,
           round(CAST(SUM(oov) AS DOUBLE) / COUNT(*), 6) AS oov_rate
    FROM f GROUP BY source
    """,
    doc="Tokenizer-vocabulary coverage per source: the vocab is built "
    "from the even-doc_id half and the odd half measures its "
    "out-of-vocabulary token rate by source — the go/no-go check before "
    "freezing a tokenizer on a new data mix (a source with high OOV "
    "wastes its token budget on fallback bytes). One token shuffle into "
    "a hash left-join against the distinct-vocab frame (broadcast at "
    "this SF; plain equi-join at 100 TB), then a per-source aggregate.",
)
def oov_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    vocab = (
        docs.filter(F.col("doc_id") % 2 == 0)
        .select(F.explode(tokens("text")).alias("tok"))
        .distinct()
        .withColumn("_known", F.lit(1))
    )
    s = docs.filter(F.col("doc_id") % 2 == 1).select(
        "source", F.explode(tokens("text")).alias("tok")
    )
    f = s.join(vocab, "tok", "left").select(
        "source", F.isnull("_known").cast("long").alias("oov")
    )
    return f.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.sum("oov").cast("long").alias("n_oov"),
        F.round(
            F.sum("oov").cast("double") / F.count(F.lit(1)), 6
        ).alias("oov_rate"),
    )


_BLOCKLIST = {
    "latency": ("slow", "lag", "wait"),
    "failure": ("error", "crash", "fail"),
    "storage": ("disk", "spill", "merge"),
}


@register(
    "blocklist_filter_stats",
    oracle=f"""
    WITH t AS (SELECT doc_id, source, {_TOKS2} AS toks FROM documents)
    SELECT source,
           COUNT(*)::BIGINT AS n_docs,
           {", ".join(
               "CAST(SUM(CASE WHEN "
               + " OR ".join(f"list_contains(toks, '{w}')" for w in ws)
               + " THEN 1 ELSE 0 END) AS BIGINT) AS flagged_" + cat
               for cat, ws in sorted(_BLOCKLIST.items())
           )}
    FROM t GROUP BY source
    """,
    doc="Category blocklist screening — the wordlist-filter stage every "
    "curation pipeline runs (C4's badwords list is the canonical "
    "example; categories here are synthetic to fit the fixture "
    "vocabulary). Per-source doc counts flagged by each category as "
    "pure array-membership column expressions: zero shuffles before "
    "the per-source aggregate, and the plan is one scan regardless of "
    "category count.",
)
def blocklist_filter_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    t = docs.select("source", tokens("text").alias("toks"))
    aggs = [F.count(F.lit(1)).cast("long").alias("n_docs")]
    for cat, ws in sorted(_BLOCKLIST.items()):
        hit = F.arrays_overlap(
            F.col("toks"), F.array(*[F.lit(w) for w in ws])
        )
        aggs.append(F.sum(hit.cast("long")).alias(f"flagged_{cat}"))
    return t.groupBy("source").agg(*aggs)


# the exact-kNN oracle is registered by plans/llm2.py — import it
# explicitly so this module also works when imported directly, then
# compose its oracle rather than duplicate it
from . import llm2 as _llm2  # noqa: E402, F401
from .registry import REGISTRY as _REG  # noqa: E402

_KNN_ORACLE = _REG["knn_graph_topk"].oracle


@register(
    "label_prop_knn_majority",
    oracle=f"""
    WITH g AS ({_KNN_ORACLE}),
    unl AS (SELECT vec_id, label AS true_label FROM embeddings
            WHERE vec_id % 3 = 0),
    lab AS (SELECT vec_id, label AS nb_label FROM embeddings
            WHERE vec_id % 3 <> 0),
    votes AS (SELECT g.query_id, u.true_label, l.nb_label
              FROM g JOIN unl u ON u.vec_id = g.query_id
              JOIN lab l ON l.vec_id = g.neighbor_id),
    counts AS (SELECT query_id, true_label, nb_label, COUNT(*) AS c
               FROM votes GROUP BY query_id, true_label, nb_label),
    tot AS (SELECT query_id, CAST(SUM(c) AS BIGINT) AS n_labeled_neighbors
            FROM counts GROUP BY query_id),
    r AS (SELECT query_id, true_label, nb_label,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY c DESC, nb_label) AS rn
          FROM counts)
    SELECT r.query_id AS vec_id, r.true_label,
           r.nb_label AS predicted_label,
           tot.n_labeled_neighbors,
           (r.nb_label = r.true_label) AS correct
    FROM r JOIN tot USING (query_id) WHERE rn = 1
    """,
    doc="One round of semi-supervised label propagation "
    "(operators/graph.py::knn_label_propagation): every third vector is "
    "masked unlabeled and takes the majority label among the labeled "
    "subset of its 5 nearest neighbors on the exact cosine kNN graph "
    "(min-label "
    "tie-break) — the classic transductive pseudo-labeling baseline. "
    "The oracle composes the registered knn_graph_topk oracle verbatim, "
    "so graph and vote are both value-checked. Cost = the kNN graph + "
    "one vote aggregate over the k·|unlabeled| edge subset.",
)
def label_prop_knn_majority(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import knn_label_propagation

    emb = load_table(spark, sf_dir, "embeddings")
    return knn_label_propagation(
        emb, unlabeled=F.col("vec_id") % 3 == 0, k=5, block_size=128
    )


@register(
    "frequent_part_pairs_top50",
    oracle="""
    WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    pairs AS (SELECT a.l_partkey AS part_a, b.l_partkey AS part_b
              FROM items a JOIN items b
                ON a.l_orderkey = b.l_orderkey
               AND a.l_partkey < b.l_partkey),
    c AS (SELECT part_a, part_b, COUNT(*) AS support
          FROM pairs GROUP BY part_a, part_b),
    r AS (SELECT part_a, part_b, CAST(support AS BIGINT) AS support,
                 row_number() OVER (ORDER BY support DESC, part_a, part_b)
                     AS rnk
          FROM c)
    SELECT part_a, part_b, support, rnk FROM r WHERE rnk <= 50
    """,
    doc="Frequent 2-itemsets (market-basket co-occurrence): part pairs "
    "bought in the same order, top-50 by support — the A-priori first "
    "rung, and the same shape as co-occurrence mining for related-doc "
    "suggestions. The pair generation is a self equi-join on the order "
    "key, so its fan-out is bounded by per-order line count (≤7 in "
    "TPC-H), never all-pairs over parts; one shuffle builds the distinct "
    "item set, one counts pairs.",
)
def frequent_part_pairs_top50(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    li = load_table(spark, sf_dir, "lineitem")
    items = li.select("l_orderkey", "l_partkey").distinct()
    a = items.select(
        "l_orderkey", F.col("l_partkey").alias("part_a")
    )
    b = items.select(
        "l_orderkey", F.col("l_partkey").alias("part_b")
    )
    pairs = a.join(b, "l_orderkey").filter(
        F.col("part_a") < F.col("part_b")
    )
    c = pairs.groupBy("part_a", "part_b").agg(
        F.count(F.lit(1)).cast("long").alias("support")
    )
    # limit-first: the full pair-count frame is data-sized, so take the
    # top-50 via TakeOrderedAndProject and only then window the 50 rows
    top = c.orderBy(
        F.col("support").desc(), F.col("part_a"), F.col("part_b")
    ).limit(50)
    w = Window.orderBy(
        F.col("support").desc(), F.col("part_a"), F.col("part_b")
    )
    return top.withColumn("rnk", F.row_number().over(w)).select(
        "part_a", "part_b", "support", "rnk"
    )


_RFM_REF = "1998-12-31"


@register(
    "rfm_segments",
    oracle=f"""
    WITH base AS (
      SELECT o_custkey,
             MAX(o_orderdate) AS last_order,
             COUNT(*) AS frequency,
             SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS monetary
      FROM orders GROUP BY o_custkey),
    scored AS (
      SELECT o_custkey,
             datediff('day', last_order, DATE '{_RFM_REF}') AS recency_days,
             frequency, monetary,
             ntile(4) OVER (ORDER BY datediff('day', last_order,
                                              DATE '{_RFM_REF}') DESC,
                            o_custkey) AS r_q,
             ntile(4) OVER (ORDER BY frequency, o_custkey) AS f_q,
             ntile(4) OVER (ORDER BY monetary, o_custkey) AS m_q
      FROM base)
    SELECT r_q, f_q, m_q,
           COUNT(*)::BIGINT AS n_customers,
           CAST(SUM(CAST(frequency AS BIGINT)) AS BIGINT) AS total_orders,
           CAST(SUM(monetary) AS DOUBLE) AS total_monetary
    FROM scored GROUP BY r_q, f_q, m_q
    """,
    doc="RFM customer segmentation: per-customer recency / frequency / "
    "monetary quartiles (deterministic ntile with customer-key "
    "tie-break) rolled up to segment counts — the classic audience-"
    "building query, and the same shape as bucketing data sources by "
    "activity for mixture planning. The ntile windows run over the "
    "CUSTOMER frame (one row per customer, aggregate-sized), not the "
    "order rows; monetary sums are exact decimals.",
)
def rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    orders = load_table(spark, sf_dir, "orders")
    base = orders.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(F.col("o_totalprice").cast("decimal(18,4)")).alias("monetary"),
    )
    rec = F.datediff(F.lit(_RFM_REF), F.col("last_order"))
    scored = base.select(
        "o_custkey",
        "frequency",
        "monetary",
        F.ntile(4)
        .over(Window.orderBy(rec.desc(), F.col("o_custkey")))
        .alias("r_q"),
        F.ntile(4)
        .over(Window.orderBy(F.col("frequency"), F.col("o_custkey")))
        .alias("f_q"),
        F.ntile(4)
        .over(Window.orderBy(F.col("monetary"), F.col("o_custkey")))
        .alias("m_q"),
    )
    return scored.groupBy("r_q", "f_q", "m_q").agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"),
        F.sum("frequency").cast("long").alias("total_orders"),
        F.sum("monetary").cast("double").alias("total_monetary"),
    )


@register(
    "exact_quantiles_price_by_flag",
    oracle="""
    WITH h AS (SELECT l_returnflag AS g,
                      CAST(l_extendedprice AS DECIMAL(15,2)) AS v,
                      COUNT(*) AS c
               FROM lineitem GROUP BY g, v),
    cum AS (SELECT g, v, c,
                   SUM(c) OVER (PARTITION BY g ORDER BY v
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS cm,
                   SUM(c) OVER (PARTITION BY g) AS n
            FROM h)
    SELECT g AS l_returnflag,
           CAST(MAX(n) AS BIGINT) AS n,
           CAST(MIN(CASE WHEN cm >= (1 * n + 3) // 4 THEN v END)
                AS DOUBLE) AS p25,
           CAST(MIN(CASE WHEN cm >= (1 * n + 1) // 2 THEN v END)
                AS DOUBLE) AS p50,
           CAST(MIN(CASE WHEN cm >= (9 * n + 9) // 10 THEN v END)
                AS DOUBLE) AS p90,
           CAST(MIN(CASE WHEN cm >= (99 * n + 99) // 100 THEN v END)
                AS DOUBLE) AS p99
    FROM cum GROUP BY g
    """,
    doc="EXACT per-group p25/p50/p90/p99 without sorting the data "
    "(operators/profiling.py::exact_quantiles) — the generalization of "
    "the MAD histogram-median trick: fixed-precision values have a "
    "bounded domain, so one combinable value-histogram aggregate plus a "
    "cumulative sum over its ≤|domain| rows answers any quantile set "
    "exactly. Pure-integer rank arithmetic ((num·n+den−1) div den) "
    "keeps both engines identical; what approx_percentile estimates, "
    "this computes exactly at the same shuffle count.",
)
def exact_quantiles_price_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.profiling import exact_quantiles

    li = load_table(spark, sf_dir, "lineitem")
    out = exact_quantiles(
        li,
        ["l_returnflag"],
        "l_extendedprice",
        [("p25", 1, 4), ("p50", 1, 2), ("p90", 9, 10), ("p99", 99, 100)],
    )
    return out.select(
        "l_returnflag",
        "n",
        *[F.col(c).cast("double").alias(c) for c in ("p25", "p50", "p90", "p99")],
    )


_BAL_N = 10  # docs kept per length decile


@register(
    "sample_balanced_length_deciles",
    oracle=f"""
    WITH h AS (SELECT n_chars AS v, COUNT(*) AS c FROM documents
               GROUP BY v),
    cum AS (SELECT v, c,
                   SUM(c) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
                                PRECEDING AND CURRENT ROW) AS cm,
                   SUM(c) OVER () AS n
            FROM h),
    b AS (SELECT
            {", ".join(
                f"MIN(CASE WHEN cm >= ({k} * n + 9) // 10 THEN v END) AS b{k}"
                for k in range(1, 10)
            )}
          FROM cum),
    d AS (SELECT doc_id, n_chars,
                 ({" + ".join(
                     f"CASE WHEN n_chars > b{k} THEN 1 ELSE 0 END"
                     for k in range(1, 10)
                 )}) AS decile
          FROM documents CROSS JOIN b),
    r AS (SELECT doc_id, n_chars, decile,
                 row_number() OVER (
                     PARTITION BY decile
                     ORDER BY ('0x' || substr(md5(CAST(doc_id AS VARCHAR)
                                                  || '#bal'), 1, 8))::BIGINT,
                              doc_id) AS rn
          FROM d)
    SELECT decile, doc_id, n_chars FROM r WHERE rn <= {_BAL_N}
    """,
    doc="Length-balanced sampling by composition: EXACT decile "
    "boundaries from the histogram-quantile operator "
    "(operators/profiling.py::exact_quantiles — no data-sized sort), "
    "decile assignment as a broadcast comparison against the 9 boundary "
    "values, then exactly-n-per-decile deterministic selection "
    "(operators/sampling.py::stratified_sample_exact, WindowGroupLimit "
    "pushes the top-n below the exchange). The anti-length-bias eval-"
    "set constructor; every stage is a reused, individually-verified "
    "operator.",
)
def sample_balanced_length_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.profiling import exact_quantiles
    from ..operators.sampling import stratified_sample_exact

    docs = load_table(spark, sf_dir, "documents")
    bounds = exact_quantiles(
        docs,
        [],
        "n_chars",
        [(f"b{k}", k, 10) for k in range(1, 10)],
        scale="bigint",
    ).drop("n")
    decile = None
    for k in range(1, 10):
        term = (F.col("n_chars") > F.col(f"b{k}")).cast("int")
        decile = term if decile is None else decile + term
    d = (
        docs.select("doc_id", "n_chars")
        .crossJoin(F.broadcast(bounds))
        .withColumn("decile", decile)
    )
    return stratified_sample_exact(
        d.select("doc_id", "n_chars", "decile"),
        "decile",
        _BAL_N,
        salt="bal",
    ).select("decile", "doc_id", "n_chars")


@register(
    "join_size_profile_orders_lineitem",
    oracle="""
    WITH ca AS (SELECT o_orderkey AS k, COUNT(*) AS ca FROM orders
                GROUP BY o_orderkey),
    cb AS (SELECT l_orderkey AS k, COUNT(*) AS cb FROM lineitem
           GROUP BY l_orderkey),
    pk AS (SELECT ca.ca * cb.cb AS r FROM ca JOIN cb USING (k))
    SELECT CAST(SUM(r) AS BIGINT) AS join_rows,
           COUNT(*)::BIGINT AS n_join_keys,
           CAST(MAX(r) AS BIGINT) AS max_key_rows,
           CAST((1000 * MAX(r)) // (CAST(SUM(r) AS BIGINT) // COUNT(*))
                AS BIGINT) AS skew_factor_x1000
    FROM pk
    """,
    doc="Join-size and skew prediction WITHOUT executing the join "
    "(operators/skew.py::join_size_profile): |orders ⋈ lineitem| and "
    "its heaviest key from the two distinct-key-sized count frames — "
    "two combinable aggregates plus a key-frame join, the planning "
    "primitive behind 'should this join be salted?' at 100 TB. All "
    "integer math; skew_factor_x1000 = 1000·max/avg per-key output.",
)
def join_size_profile_orders_lineitem(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.skew import join_size_profile

    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("k")
    )
    return join_size_profile(orders, li, "k")


@register(
    "quantile_map_nchars_by_source",
    oracle="""
    WITH h AS (SELECT source, n_chars AS v, COUNT(*) AS c FROM documents
               GROUP BY source, n_chars),
    pg AS (SELECT source, v, c,
                  SUM(c) OVER (PARTITION BY source ORDER BY v
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) AS cum,
                  SUM(c) OVER (PARTITION BY source) AS n
           FROM h),
    gt AS (SELECT COUNT(*) AS nt FROM documents),
    gh AS (SELECT n_chars AS gv, COUNT(*) AS gc FROM documents
           GROUP BY n_chars),
    gc AS (SELECT gv, SUM(gc) OVER (ORDER BY gv
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND CURRENT ROW) AS gcum
           FROM gh),
    t AS (SELECT source, v, n, (cum * nt + n - 1) // n AS r
          FROM pg CROSS JOIN gt)
    SELECT t.source, t.v AS n_chars,
           CAST(t.n AS BIGINT) AS n_in_group,
           MIN(gc.gv) AS mapped
    FROM t JOIN gc ON gc.gcum >= t.r
    GROUP BY t.source, t.v, t.n
    """,
    doc="Quantile normalization of per-source document lengths onto the "
    "global distribution (operators/profiling.py::quantile_map_to_global) "
    "— the distribution-alignment step that makes per-source scores "
    "comparable before mixing (histogram-exact QuantileTransformer). "
    "Pure-integer rational rank arithmetic; both histograms are "
    "domain-bounded so the global frame broadcasts and the rank lookup "
    "is a broadcast range join over histogram rows, never data-sized.",
)
def quantile_map_nchars_by_source(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.profiling import quantile_map_to_global

    docs = load_table(spark, sf_dir, "documents")
    return quantile_map_to_global(docs, "source", "n_chars")


@register(
    "anomalous_event_days",
    oracle=f"""
    WITH d AS (SELECT event_type,
                      CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
                      COUNT(*) AS n_events
               FROM events GROUP BY event_type, day),
    r AS (SELECT event_type, day, n_events,
                 row_number() OVER (PARTITION BY event_type
                                    ORDER BY n_events, day) AS rn,
                 COUNT(*) OVER (PARTITION BY event_type) AS nd
          FROM d),
    med AS (SELECT event_type, n_events AS med FROM r
            WHERE rn = (nd + 1) // 2),
    dev AS (SELECT d.event_type, d.day, d.n_events,
                   abs(d.n_events - m.med) AS dv, m.med
            FROM d JOIN med m ON d.event_type = m.event_type),
    rd AS (SELECT event_type, day, n_events, dv, med,
                  row_number() OVER (PARTITION BY event_type
                                     ORDER BY dv, day) AS rn,
                  COUNT(*) OVER (PARTITION BY event_type) AS nd
           FROM dev),
    mad AS (SELECT event_type, dv AS mad FROM rd WHERE rn = (nd + 1) // 2)
    SELECT dev.event_type, dev.day, CAST(dev.n_events AS BIGINT) AS n_events,
           CAST(dev.med AS BIGINT) AS median_events,
           CAST(mad.mad AS BIGINT) AS mad
    FROM dev JOIN mad ON dev.event_type = mad.event_type
    WHERE dev.dv > 3 * mad.mad
    """,
    doc="Time-series anomaly screen: days whose per-type event count "
    "sits beyond 3·MAD of that type's daily median — the robust "
    "volume-monitoring alarm (a traffic spike can't inflate the fence "
    "that is supposed to catch it, unlike mean/stddev alerting). The "
    "day-count frame is calendar-bounded (|types|·|days| rows), so the "
    "ranking windows are trivially small however large the raw event "
    "log; day arithmetic is timezone-free integer epoch math. "
    "Tie-break on day makes the lower median deterministic.",
)
def anomalous_event_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    d = (
        ev.select(
            "event_type",
            epoch_bucket("ts", 86400).alias("day"),
        )
        .groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )

    def lower_median(frame, order_col, out):
        w = Window.partitionBy("event_type").orderBy(order_col, "day")
        n = Window.partitionBy("event_type")
        return (
            frame.withColumn("_rn", F.row_number().over(w))
            .withColumn("_nd", F.count(F.lit(1)).over(n))
            .filter(F.col("_rn") == F.expr("(_nd + 1) div 2"))
            .select("event_type", F.col(order_col).alias(out))
        )

    med = lower_median(d, "n_events", "med")
    dev = d.join(F.broadcast(med), "event_type").withColumn(
        "dv", F.abs(F.col("n_events") - F.col("med"))
    )
    mad = lower_median(dev, "dv", "mad")
    return (
        dev.join(F.broadcast(mad), "event_type")
        .filter(F.col("dv") > 3 * F.col("mad"))
        .select(
            "event_type",
            "day",
            F.col("n_events").cast("long").alias("n_events"),
            F.col("med").cast("long").alias("median_events"),
            F.col("mad").cast("long").alias("mad"),
        )
    )


# Wilson 95% z, shipped as one double literal so both engines use the
# identical constant
_WILSON_Z = "1.96"
_LATE_DAYS = 60  # shipped more than this after the order date = late


@register(
    "supplier_reliability_wilson",
    oracle=f"""
    WITH s AS (SELECT l_suppkey,
                      COUNT(*) AS n,
                      SUM(CASE WHEN l_shipdate > o_orderdate
                                    + INTERVAL {_LATE_DAYS} DAY
                               THEN 1 ELSE 0 END) AS late
               FROM lineitem JOIN orders ON l_orderkey = o_orderkey
               GROUP BY l_suppkey),
    w AS (SELECT l_suppkey, CAST(n AS BIGINT) AS n,
                 CAST(late AS BIGINT) AS late,
                 round((late / CAST(n AS DOUBLE) + {_WILSON_Z} * {_WILSON_Z}
                            / (2 * CAST(n AS DOUBLE))
                        - {_WILSON_Z} * sqrt(
                            (late / CAST(n AS DOUBLE))
                            * (1 - late / CAST(n AS DOUBLE))
                            / CAST(n AS DOUBLE)
                            + {_WILSON_Z} * {_WILSON_Z}
                              / (4 * CAST(n AS DOUBLE)
                                   * CAST(n AS DOUBLE))))
                       / (1 + {_WILSON_Z} * {_WILSON_Z}
                              / CAST(n AS DOUBLE)), 6) AS late_rate_lcb
          FROM s WHERE n >= 10),
    r AS (SELECT *, row_number() OVER (ORDER BY late_rate_lcb DESC,
                                       l_suppkey) AS rnk
          FROM w)
    SELECT l_suppkey, n, late, late_rate_lcb, rnk FROM r WHERE rnk <= 20
    """,
    doc="Supplier lateness ranked by the WILSON LOWER CONFIDENCE BOUND "
    "of the late-shipment rate (late = shipped > 60 days after the "
    "order date) — the proper way to rank rates with unequal sample "
    "sizes: a 2/2 supplier no longer outranks a 95/100 one, the "
    "low-n uncertainty is priced in (the Reddit-comment-ranking "
    "estimator applied to vendor scoring / data-source QA). One "
    "fact join + one combinable aggregate; the Wilson dag is identical "
    "double ops on both sides, 6-dp rounded before ranking.",
)
def supplier_reliability_wilson(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    z = float(_WILSON_Z)
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    s = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_suppkey")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(
                (
                    F.col("l_shipdate")
                    > F.date_add(F.col("o_orderdate"), _LATE_DAYS)
                ).cast("int")
            )
            .cast("long")
            .alias("late"),
        )
        .filter(F.col("n") >= 10)
    )
    nd = F.col("n").cast("double")
    p = F.col("late") / nd
    lcb = F.round(
        (
            p
            + F.lit(z) * F.lit(z) / (2 * nd)
            - F.lit(z)
            * F.sqrt(
                p * (1 - p) / nd
                + F.lit(z) * F.lit(z) / (4 * nd * nd)
            )
        )
        / (1 + F.lit(z) * F.lit(z) / nd),
        6,
    )
    w = s.withColumn("late_rate_lcb", lcb)
    top = w.orderBy(
        F.col("late_rate_lcb").desc(), F.col("l_suppkey")
    ).limit(20)
    win = Window.orderBy(F.col("late_rate_lcb").desc(), F.col("l_suppkey"))
    return top.withColumn("rnk", F.row_number().over(win)).select(
        "l_suppkey", "n", "late", "late_rate_lcb", "rnk"
    )


@register(
    "event_hourly_seasonality",
    oracle="""
    WITH h AS (SELECT event_type,
                      (CAST(floor(epoch(ts)) AS BIGINT) // 3600) % 24
                          AS hour_utc,
                      COUNT(*) AS n_events
               FROM events GROUP BY event_type, hour_utc),
    t AS (SELECT event_type, CAST(SUM(n_events) AS BIGINT) AS total
          FROM h GROUP BY event_type)
    SELECT h.event_type, h.hour_utc,
           CAST(h.n_events AS BIGINT) AS n_events,
           round(h.n_events / CAST(t.total AS DOUBLE), 6) AS share
    FROM h JOIN t ON h.event_type = t.event_type
    """,
    doc="Hour-of-day seasonality profile per event type (timezone-free "
    "integer epoch math; share = hour/total, 6-dp) — the traffic-shape "
    "baseline that anomaly alerting and capacity planning read. One "
    "combinable aggregate into a |types|·24 frame; the totals join is "
    "a broadcast of a |types|-row frame.",
)
def event_hourly_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    h = (
        ev.select(
            "event_type",
            F.expr("(cast(ts as long) div 3600) % 24").alias("hour_utc"),
        )
        .groupBy("event_type", "hour_utc")
        .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
    )
    t = h.groupBy("event_type").agg(
        F.sum("n_events").cast("long").alias("total")
    )
    return h.join(F.broadcast(t), "event_type").select(
        "event_type",
        "hour_utc",
        "n_events",
        F.round(
            F.col("n_events") / F.col("total").cast("double"), 6
        ).alias("share"),
    )


@register(
    "heatmap_price_qty_deciles",
    oracle="""
    WITH hp AS (SELECT CAST(l_extendedprice AS DECIMAL(15,2)) AS v,
                       COUNT(*) AS c
                FROM lineitem GROUP BY v),
    cp AS (SELECT v, SUM(c) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
                                  PRECEDING AND CURRENT ROW) AS cm,
                  SUM(c) OVER () AS n
           FROM hp),
    bp AS (SELECT
             MIN(CASE WHEN cm >= (1*n+9)//10 THEN v END) AS p1,
             MIN(CASE WHEN cm >= (2*n+9)//10 THEN v END) AS p2,
             MIN(CASE WHEN cm >= (3*n+9)//10 THEN v END) AS p3,
             MIN(CASE WHEN cm >= (4*n+9)//10 THEN v END) AS p4,
             MIN(CASE WHEN cm >= (5*n+9)//10 THEN v END) AS p5,
             MIN(CASE WHEN cm >= (6*n+9)//10 THEN v END) AS p6,
             MIN(CASE WHEN cm >= (7*n+9)//10 THEN v END) AS p7,
             MIN(CASE WHEN cm >= (8*n+9)//10 THEN v END) AS p8,
             MIN(CASE WHEN cm >= (9*n+9)//10 THEN v END) AS p9
           FROM cp),
    hq AS (SELECT CAST(l_quantity AS DECIMAL(15,2)) AS v, COUNT(*) AS c
           FROM lineitem GROUP BY v),
    cq AS (SELECT v, SUM(c) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
                                  PRECEDING AND CURRENT ROW) AS cm,
                  SUM(c) OVER () AS n
           FROM hq),
    bq AS (SELECT
             MIN(CASE WHEN cm >= (1*n+9)//10 THEN v END) AS q1,
             MIN(CASE WHEN cm >= (2*n+9)//10 THEN v END) AS q2,
             MIN(CASE WHEN cm >= (3*n+9)//10 THEN v END) AS q3,
             MIN(CASE WHEN cm >= (4*n+9)//10 THEN v END) AS q4,
             MIN(CASE WHEN cm >= (5*n+9)//10 THEN v END) AS q5,
             MIN(CASE WHEN cm >= (6*n+9)//10 THEN v END) AS q6,
             MIN(CASE WHEN cm >= (7*n+9)//10 THEN v END) AS q7,
             MIN(CASE WHEN cm >= (8*n+9)//10 THEN v END) AS q8,
             MIN(CASE WHEN cm >= (9*n+9)//10 THEN v END) AS q9
           FROM cq)
    SELECT
      (CASE WHEN CAST(l_extendedprice AS DECIMAL(15,2)) > p1 THEN 1 ELSE 0 END
       + CASE WHEN CAST(l_extendedprice AS DECIMAL(15,2)) > p2 THEN 1 ELSE 0 END
       + CASE WHEN CAST(l_extendedprice AS DECIMAL(15,2)) > p3 THEN 1 ELSE 0 END
       + CASE WHEN CAST(l_extendedprice AS DECIMAL(15,2)) > p4 THEN 1 ELSE 0 END
       + CASE WHEN CAST(l_extendedprice AS DECIMAL(15,2)) > p5 THEN 1 ELSE 0 END
       + CASE WHEN CAST(l_extendedprice AS DECIMAL(15,2)) > p6 THEN 1 ELSE 0 END
       + CASE WHEN CAST(l_extendedprice AS DECIMAL(15,2)) > p7 THEN 1 ELSE 0 END
       + CASE WHEN CAST(l_extendedprice AS DECIMAL(15,2)) > p8 THEN 1 ELSE 0 END
       + CASE WHEN CAST(l_extendedprice AS DECIMAL(15,2)) > p9 THEN 1 ELSE 0 END)
          AS price_decile,
      (CASE WHEN CAST(l_quantity AS DECIMAL(15,2)) > q1 THEN 1 ELSE 0 END
       + CASE WHEN CAST(l_quantity AS DECIMAL(15,2)) > q2 THEN 1 ELSE 0 END
       + CASE WHEN CAST(l_quantity AS DECIMAL(15,2)) > q3 THEN 1 ELSE 0 END
       + CASE WHEN CAST(l_quantity AS DECIMAL(15,2)) > q4 THEN 1 ELSE 0 END
       + CASE WHEN CAST(l_quantity AS DECIMAL(15,2)) > q5 THEN 1 ELSE 0 END
       + CASE WHEN CAST(l_quantity AS DECIMAL(15,2)) > q6 THEN 1 ELSE 0 END
       + CASE WHEN CAST(l_quantity AS DECIMAL(15,2)) > q7 THEN 1 ELSE 0 END
       + CASE WHEN CAST(l_quantity AS DECIMAL(15,2)) > q8 THEN 1 ELSE 0 END
       + CASE WHEN CAST(l_quantity AS DECIMAL(15,2)) > q9 THEN 1 ELSE 0 END)
          AS qty_decile,
      COUNT(*)::BIGINT AS n_rows
    FROM lineitem CROSS JOIN bp CROSS JOIN bq
    GROUP BY price_decile, qty_decile
    """,
    doc="2-D equi-depth heatmap: line items bucketed by EXACT price and "
    "quantity deciles (operators/profiling.py::exact_quantiles twice, "
    "boundaries broadcast as two 1-row frames) — the dependence profile "
    "between two measures that an equal-WIDTH histogram hides when "
    "distributions are skewed. If price and quantity were independent "
    "every cell would hold ~1% of rows; the exact-decile grid makes "
    "deviations directly readable. One scan + one aggregate.",
)
def heatmap_price_qty_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.profiling import exact_quantiles

    li = load_table(spark, sf_dir, "lineitem")
    qs = [(f"b{k}", k, 10) for k in range(1, 10)]
    bp = exact_quantiles(li, [], "l_extendedprice", qs).drop("n")
    bq = exact_quantiles(li, [], "l_quantity", qs).drop("n")
    bp = bp.select(*[F.col(f"b{k}").alias(f"p{k}") for k in range(1, 10)])
    bq = bq.select(*[F.col(f"b{k}").alias(f"q{k}") for k in range(1, 10)])

    def decile(col, prefix):
        v = F.col(col).cast("decimal(15,2)")
        out = None
        for k in range(1, 10):
            term = (v > F.col(f"{prefix}{k}")).cast("int")
            out = term if out is None else out + term
        return out

    d = (
        li.select("l_extendedprice", "l_quantity")
        .crossJoin(F.broadcast(bp))
        .crossJoin(F.broadcast(bq))
        .select(
            decile("l_extendedprice", "p").alias("price_decile"),
            decile("l_quantity", "q").alias("qty_decile"),
        )
    )
    return d.groupBy("price_decile", "qty_decile").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows")
    )
