"""Round-4 plans: graph triangles, first-touch cumulative distinct,
leakage-free grouped splits, the stream-stream join's batch twin,
matryoshka (prefix-truncated) ANN, and YoY growth windows.

Same determinism contract as every plan module: integer/epoch math where
possible, exact-decimal sums for float aggregates, identical expression
dags on both sides for pure-double derivations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.buckets import epoch_bucket, floor_div
from ..sources.fixtures import load_table
from .registry import register

_DAY = 86400


def _coorder_edges(li: DataFrame) -> DataFrame:
    """Support>=2 part co-order graph: undirected (src, dst) edges for
    parts appearing together in at least two orders — shared by the
    triangle and clustering-coefficient plans so the two can never
    diverge on the graph definition."""
    op = li.select(
        F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
    ).distinct()
    a, b = op.alias("a"), op.alias("b")
    return (
        a.join(b, (F.col("a.o") == F.col("b.o"))
               & (F.col("a.p") < F.col("b.p")))
        .groupBy(F.col("a.p").alias("src"), F.col("b.p").alias("dst"))
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= 2)
        .select("src", "dst")
    )


@register(
    "triangle_count_coorder_parts",
    oracle="""
    WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
                FROM lineitem),
    e AS (SELECT a.p AS a, b.p AS b
          FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
          GROUP BY 1, 2 HAVING COUNT(*) >= 2),
    tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
            FROM e e1
            JOIN e e2 ON e2.a = e1.b
            JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
    corners AS (SELECT x AS node FROM tri
                UNION ALL SELECT y FROM tri
                UNION ALL SELECT z FROM tri)
    SELECT node, COUNT(*)::BIGINT AS n_triangles
    FROM corners GROUP BY node
    """,
    doc="Per-part triangle counts over the co-order graph (parts that "
    "appear together in >= 2 orders are connected) — the community/"
    "clustering-coefficient primitive for product-affinity and link-spam "
    "analysis. Spark side (operators/graph.py::triangle_counts) uses "
    "degree-ordered edge orientation, the shuffle-bounded distributed "
    "form: each triangle is enumerated exactly once at its lowest-"
    "(degree, id) corner and wedge fan-out is capped at O(sqrt(E)) per "
    "node, so a hub of degree d never generates d^2 wedges. The oracle "
    "enumerates a<b<c corners directly — same triangle set by "
    "construction. Edge building is one distinct + one keyed self-join "
    "with a support filter (same shape as frequent_part_pairs).",
)
def triangle_count_coorder_parts(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.graph import _canonical_triangle_counts

    li = load_table(spark, sf_dir, "lineitem")
    # _coorder_edges is canonical by construction (GROUP BY over
    # a.p < b.p pairs: distinct, ordered, no self-loops), so the core
    # skips triangle_counts' re-canonicalizing distinct exchange (r13)
    e = _coorder_edges(li).select(
        F.col("src").alias("a"), F.col("dst").alias("b")
    ).persist()
    counts, _deg = _canonical_triangle_counts(e)
    return counts


@register(
    "cumulative_distinct_users_daily",
    oracle=f"""
    WITH d AS (SELECT user_id,
                      CAST(floor(epoch(ts)) AS BIGINT) // {_DAY} AS day
               FROM events),
    ft AS (SELECT user_id, MIN(day) AS day FROM d GROUP BY user_id),
    nu AS (SELECT day, COUNT(*) AS new_users FROM ft GROUP BY day),
    days AS (SELECT DISTINCT day FROM d)
    SELECT day,
           COALESCE(new_users, 0)::BIGINT AS new_users,
           CAST(SUM(COALESCE(new_users, 0)) OVER (
               ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS cum_users
    FROM days LEFT JOIN nu USING (day)
    """,
    doc="Users-to-date per day via the FIRST-TOUCH transform: cumulative "
    "COUNT(DISTINCT) is rewritten as min-day-per-user (one map-side-"
    "combinable aggregate over the raw stream) + per-day new-user counts "
    "+ a prefix sum over the DAY DOMAIN. The naive form — distinct-count "
    "over an unbounded window — reshuffles the full user x day history "
    "per day; this form touches the raw data once and the only window "
    "runs over |days| rows (~3.7k rows for a decade), driver-trivial at "
    "any corpus size. All integer epoch math, timezone-free.",
)
def cumulative_distinct_users_daily(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    d = ev.select(
        "user_id", epoch_bucket("ts", _DAY).alias("day")
    )
    ft = d.groupBy("user_id").agg(F.min("day").alias("day"))
    nu = ft.groupBy("day").agg(F.count(F.lit(1)).alias("new_users"))
    days = d.select("day").distinct()
    j = days.join(nu, "day", "left").select(
        "day", F.coalesce("new_users", F.lit(0)).alias("new_users")
    )
    # |days|-sized frame: the single-partition window is over the day
    # domain, never the event stream
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return j.select(
        "day",
        F.col("new_users").cast("long").alias("new_users"),
        F.sum("new_users").over(w).cast("long").alias("cum_users"),
    )


_GSPLIT_THRESHOLD = int(0.8 * 2**32)  # 3435973836


@register(
    "split_group_holdout",
    oracle=f"""
    SELECT CASE WHEN ('0x' || substr(md5(CAST(user_id AS VARCHAR)
                                         || '#gsplit'), 1, 8))::BIGINT
                     < {_GSPLIT_THRESHOLD}
                THEN 'train' ELSE 'holdout' END AS split,
           COUNT(DISTINCT user_id)::BIGINT AS n_users,
           COUNT(*)::BIGINT AS n_events
    FROM events GROUP BY 1
    """,
    doc="Leakage-free 80/20 holdout split at the GROUP level: the split "
    "hash is computed on user_id, so every event of a user lands on the "
    "same side by construction — no join, no shuffle, no per-group "
    "assignment table to broadcast; the row-level hash of the group key "
    "IS the group assignment. This is the split discipline that "
    "prevents train/eval contamination through entity overlap (the "
    "document-level split_train_val would leak a user's history across "
    "the boundary). Deterministic md5 math, identical in the oracle.",
)
def split_group_holdout(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.hashing import portable_hash32

    ev = load_table(spark, sf_dir, "events")
    h = portable_hash32(
        F.concat(F.col("user_id").cast("string"), F.lit("#gsplit"))
    )
    return (
        ev.withColumn(
            "split",
            F.when(h < F.lit(_GSPLIT_THRESHOLD), F.lit("train")).otherwise(
                F.lit("holdout")
            ),
        )
        .groupBy("split")
        .agg(
            F.count_distinct("user_id").alias("n_users"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


@register(
    "t10_stream_stream_join",
    oracle="""
    SELECT e.user_id, e.event_id, e.ts AS event_ts,
           p.event_id AS purchase_id, p.ts AS purchase_ts
    FROM events e JOIN events p
      ON p.user_id = e.user_id
     AND e.event_type = 'click' AND p.event_type = 'purchase'
     AND p.ts >= e.ts AND p.ts <= e.ts + INTERVAL 1 HOUR
    """,
    doc="Batch twin of the stream-stream interval join "
    "(streaming/incremental.py::interval_join_events_orders): every "
    "click paired with the same user's purchases within the following "
    "hour — the attribution join. On streams both sides carry "
    "watermarks and the interval bound is what lets Spark GC join state "
    "(SPARK-26154 semantics); on batch the identical expression is a "
    "range-predicate equi-join on user_id. Streaming equivalence to "
    "this batch form is pinned in tests/test_streaming.py.",
)
def t10_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.incremental import interval_join_events_orders

    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("pts"),
    )
    return interval_join_events_orders(
        clicks,
        purchases,
        event_ts="ts",
        order_ts="pts",
        user_key="user_id",
        order_key="user_id",
        event_id="event_id",
        order_id="purchase_id",
        within="1 hour",
    ).select(
        "user_id",
        "event_id",
        "event_ts",
        "purchase_id",
        F.col("order_ts").alias("purchase_ts"),
    )


@register(
    "matryoshka_rerank_topk",
    # recall-contract oracle (same design as ann_pca_rerank_topk):
    # measured per-query recall@10 >= 0.9 at BOTH parity scales with the
    # 32-of-64 prefix index and C=150 candidates; bound 0.8 keeps
    # margin. Near-isotropic fixtures are the worst case — no MRL
    # front-loading, the prefix carries only half the energy — which is
    # why the candidate budget is the knob (C=50 measured as low as 0.5
    # per-query on the 100-vector fixture).
    oracle="""
    SELECT vec_id AS query_id, CAST(10 AS BIGINT) AS n_true,
           TRUE AS recall_ok
    FROM embeddings WHERE vec_id < 5
    """,
    doc="Matryoshka-style two-stage ANN "
    "(operators/similarity.py::truncate_rerank_topk): candidate "
    "generation on the leading 32 of 64 embedding dims (the index is a "
    "prefix SLICE — half the footprint, zero training, no projection "
    "matrix to ship, unlike the PCA sibling) + exact full-width rerank "
    "of 150 candidates/query. Recall equals candidate recall because "
    "the rerank is exact. Emits the per-query recall contract vs the "
    "brute-force twin (bound 0.8, measured >= 0.9 per query).",
)
def matryoshka_rerank_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import similarity as sim
    from .llm import _recall_contract

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    approx = sim.truncate_rerank_topk(
        emb, queries, k=10, prefix_dims=32, candidates=150
    )
    return _recall_contract(
        sim.cosine_topk(emb, queries, k=10), approx, 0.8
    )


@register(
    "brand_revenue_yoy",
    oracle="""
    WITH r AS (
      SELECT p_brand, CAST(year(l_shipdate) AS BIGINT) AS yr,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                      * (CAST(1 AS DECIMAL(18,4))
                         - CAST(l_discount AS DECIMAL(18,4))))
                  AS DOUBLE) AS revenue
      FROM lineitem JOIN part ON l_partkey = p_partkey
      GROUP BY p_brand, yr)
    SELECT p_brand, yr, revenue,
           round((revenue - lag(revenue) OVER w)
                 / lag(revenue) OVER w, 6) AS yoy_growth
    FROM r WINDOW w AS (PARTITION BY p_brand ORDER BY yr)
    """,
    doc="Year-over-year revenue growth per brand: broadcast dim join "
    "(part is the small side), one keyed aggregate with exact decimal "
    "sums, then a lag window PARTITIONED BY brand — the window state is "
    "per-brand year-count-sized, so the op scales with the group "
    "domain, not the fact table. The growth ratio divides two "
    "bit-identical doubles (cast from identical decimal sums) and is "
    "6-dp rounded on both sides; the first year is NULL by definition.",
)
def brand_revenue_yoy(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    one = F.lit(1).cast("decimal(18,4)")
    dec = lambda c: F.col(c).cast("decimal(18,4)")  # noqa: E731
    r = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy(
            "p_brand", F.year("l_shipdate").cast("long").alias("yr")
        )
        .agg(
            F.sum(dec("l_extendedprice") * (one - dec("l_discount")))
            .cast("double")
            .alias("revenue")
        )
    )
    w = Window.partitionBy("p_brand").orderBy("yr")
    prev = F.lag("revenue").over(w)
    return r.select(
        "p_brand",
        "yr",
        "revenue",
        F.round((F.col("revenue") - prev) / prev, 6).alias("yoy_growth"),
    )


@register(
    "token_gini_by_source",
    oracle="""
    WITH v AS (SELECT source, len(list_filter(string_split(
                   trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')),
                   ' '), t -> t <> ''))::BIGINT AS val
               FROM documents),
    h AS (SELECT source, val, COUNT(*) AS c FROM v GROUP BY 1, 2),
    r AS (SELECT source, val, c,
                 COALESCE(SUM(c) OVER (PARTITION BY source ORDER BY val
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                     0) AS cumb
          FROM h),
    a AS (SELECT source, SUM(c)::BIGINT AS n,
                 SUM(val * c)::BIGINT AS total,
                 SUM(val * (2 * c * cumb + c * (c + 1)))::BIGINT AS num
          FROM r GROUP BY source)
    SELECT source, n, total,
           CASE WHEN n > 1 AND total > 0
                THEN round(num / (n::DOUBLE * total::DOUBLE)
                           - (n + 1) / n::DOUBLE, 6)
                ELSE 0.0 END AS gini
    FROM a
    """,
    doc="Token-count concentration (exact Gini) per source "
    "(operators/profiling.py::gini_from_values) — the data-balance "
    "diagnostic: a source whose token mass concentrates in a few huge "
    "documents behaves very differently in a training mix than its doc "
    "count suggests. Computed from the VALUE HISTOGRAM, never a global "
    "sort: ranks are recovered from per-value cumulative counts, all "
    "bigint math until the final division, and the only window runs "
    "over distinct values per group.",
)
def token_gini_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import tokens
    from ..operators.profiling import gini_from_values

    docs = load_table(spark, sf_dir, "documents")
    v = docs.select(
        "source", F.size(tokens(F.col("text"))).alias("val")
    )
    return gini_from_values(v, "val", ["source"])


@register(
    "lexical_diversity_by_source",
    oracle="""
    WITH tok AS (SELECT source AS grp,
                        unnest(list_filter(string_split(
                            trim(regexp_replace(lower(text),
                                 '[^a-z0-9]+', ' ', 'g')), ' '),
                            t -> t <> '')) AS tok
                 FROM documents),
    c AS (SELECT grp, tok, COUNT(*) AS c FROM tok GROUP BY 1, 2)
    SELECT grp AS source,
           SUM(c)::BIGINT AS n_tokens,
           COUNT(*)::BIGINT AS n_types,
           round(COUNT(*) / SUM(c)::DOUBLE, 6) AS type_token_ratio,
           round(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END)
                 / COUNT(*)::DOUBLE, 6) AS hapax_ratio
    FROM c GROUP BY grp
    """,
    doc="Per-source lexical diversity "
    "(operators/text_analysis.py::lexical_diversity): type-token ratio "
    "and hapax share — template-spam collapses TTR, OCR noise balloons "
    "hapax share. One token shuffle to (source, token) counts; the "
    "rest runs on the vocabulary-sized frame; exact bigint ratios "
    "6-dp rounded.",
)
def lexical_diversity_by_source(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.text_analysis import lexical_diversity

    docs = load_table(spark, sf_dir, "documents")
    return lexical_diversity(docs, group_col="source")


@register(
    "silhouette_by_label",
    oracle="""
    WITH e AS (SELECT vec_id, label,
                      generate_subscripts(embedding, 1) AS dim,
                      CAST(unnest(embedding) AS DOUBLE) AS x
               FROM embeddings),
    mu AS (SELECT label AS l, dim,
                  CAST(SUM(CAST(round(x, 6) AS DECIMAL(27,6))) AS DOUBLE)
                      / COUNT(*) AS mu
           FROM e GROUP BY label, dim),
    nm AS (SELECT l, CAST(SUM(CAST(round(mu * mu, 6) AS DECIMAL(27,6)))
                          AS DOUBLE) AS nm2
           FROM mu GROUP BY l),
    nv AS (SELECT vec_id, CAST(SUM(CAST(round(x * x, 6) AS DECIMAL(27,6)))
                               AS DOUBLE) AS nv2
           FROM e GROUP BY vec_id),
    dots AS (SELECT e.vec_id, e.label, m.l,
                    CAST(SUM(CAST(round(e.x * m.mu, 6) AS DECIMAL(27,6)))
                         AS DOUBLE) AS dot
             FROM e JOIN mu m USING (dim)
             GROUP BY e.vec_id, e.label, m.l),
    d AS (SELECT dots.vec_id, dots.label, dots.l,
                 sqrt(greatest(nv.nv2 - 2 * dots.dot + nm.nm2, 0)) AS d
          FROM dots JOIN nm USING (l) JOIN nv USING (vec_id)),
    pv AS (SELECT vec_id, label,
                  MIN(CASE WHEN l = label THEN d END) AS a,
                  MIN(CASE WHEN l <> label THEN d END) AS b
           FROM d GROUP BY vec_id, label),
    s AS (SELECT label,
                 CASE WHEN greatest(a, b) > 0
                      THEN round((b - a) / greatest(a, b), 6)
                      ELSE 0.0 END AS s
          FROM pv)
    SELECT label, COUNT(*)::BIGINT AS n_vectors,
           round(CAST(SUM(CAST(round(s, 6) AS DECIMAL(27,6))) AS DOUBLE)
                 / COUNT(*), 6) AS mean_silhouette
    FROM s GROUP BY label
    """,
    doc="Per-label mean simplified silhouette "
    "(operators/similarity.py::silhouette_by_label) — embedding-space "
    "QA for a labeled corpus. Centroid form, not the O(n^2) pairwise "
    "form: one explode pass + a broadcast join against the label x dim "
    "centroid frame; distances reconstructed from exact decimal sums "
    "(||x||^2 - 2x.mu + ||mu||^2), fully exact oracle.",
)
def silhouette_by_label_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import silhouette_by_label

    emb = load_table(spark, sf_dir, "embeddings")
    return silhouette_by_label(emb)


@register(
    "conversion_attribution_last_touch",
    oracle="""
    WITH j AS (
      SELECT e.user_id, e.event_id AS click_id, e.ts AS click_ts,
             p.event_id AS purchase_id, p.ts AS purchase_ts
      FROM events e JOIN events p
        ON p.user_id = e.user_id
       AND e.event_type = 'click' AND p.event_type = 'purchase'
       AND p.ts >= e.ts AND p.ts <= e.ts + INTERVAL 1 HOUR),
    r AS (SELECT *, row_number() OVER (
              PARTITION BY purchase_id
              ORDER BY click_ts DESC, click_id DESC) AS rn
          FROM j)
    SELECT user_id, purchase_id, purchase_ts, click_id, click_ts
    FROM r WHERE rn = 1
    """,
    doc="Last-touch attribution: each purchase credited to the LAST "
    "click of the same user in the preceding hour. Composition of the "
    "stream-stream interval join's batch twin + a per-purchase "
    "WindowGroupLimit (rn=1 prunes pre-exchange); ties broken "
    "(click_ts, click_id) DESC so the credit is deterministic. The "
    "window partitions by purchase — state is per-purchase candidate-"
    "click-sized, never user-history-sized.",
)
def conversion_attribution_last_touch(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..streaming.incremental import interval_join_events_orders

    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("pts"),
    )
    j = interval_join_events_orders(
        clicks,
        purchases,
        event_ts="ts",
        order_ts="pts",
        user_key="user_id",
        order_key="user_id",
        event_id="event_id",
        order_id="purchase_id",
        within="1 hour",
    )
    w = Window.partitionBy("purchase_id").orderBy(
        F.desc("event_ts"), F.desc("event_id")
    )
    return (
        j.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "purchase_id",
            F.col("order_ts").alias("purchase_ts"),
            F.col("event_id").alias("click_id"),
            F.col("event_ts").alias("click_ts"),
        )
    )


@register(
    "ks_drift_by_source",
    oracle="""
    WITH h AS (SELECT source, n_chars AS v, COUNT(*) AS c
               FROM documents GROUP BY 1, 2),
    scum AS (SELECT source, v, c,
                    SUM(c) OVER (PARTITION BY source ORDER BY v
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                    ) AS scum
             FROM h),
    gh AS (SELECT v, SUM(c) AS gc FROM h GROUP BY v),
    gcum AS (SELECT v, gc, SUM(gc) OVER (ORDER BY v
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS gcum
             FROM gh),
    ns AS (SELECT source, SUM(c) AS n_s FROM h GROUP BY source),
    n AS (SELECT SUM(c)::DOUBLE AS n_tot FROM h)
    SELECT s.source,
           MAX(ns.n_s)::BIGINT AS n_docs,
           MAX(round(GREATEST(
               abs(s.scum / ns.n_s::DOUBLE - g.gcum / n.n_tot),
               abs((s.scum - s.c) / ns.n_s::DOUBLE
                   - (g.gcum - g.gc) / n.n_tot)
           ), 6)) AS ks_distance
    FROM scum s
    JOIN gcum g USING (v)
    JOIN ns USING (source)
    CROSS JOIN n
    GROUP BY s.source
    """,
    doc="EXACT two-sample Kolmogorov-Smirnov distance of each source's "
    "doc-length distribution vs the whole corpus — the distribution-"
    "drift screen that PSI's fixed binning smooths over. Every "
    "source's points are a SUBSET of the corpus's, so the sup is "
    "attained at the source's own observed values, checked at each "
    "jump (inclusive CDFs) and just before it (exclusive CDFs) — the "
    "same subset trick as ks_drift_time_sliced. O(n) rows end to end: "
    "two keyed prefix sums + one equi-join on value, NO |sources| x "
    "|domain| grid (the r4 form's cross join was data-sized on a "
    "continuous domain). Both cumsums run through keyed_prefix_sum, "
    "never a per-source window (one source = one task at scale). CDF "
    "ratios divide exact bigints; the sup takes MAX of 6-dp-rounded "
    "identical doubles.",
)
def ks_drift_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.packing import keyed_prefix_sum

    docs = load_table(spark, sf_dir, "documents")
    h = docs.groupBy(
        "source", F.col("n_chars").alias("v")
    ).agg(F.count(F.lit(1)).alias("c"))
    # Intentional session-lifetime persist (lazy result; LRU-evictable)
    # — see dedup.lsh_candidate_report for the policy. h feeds both
    # prefix sums and both size frames.
    h = h.persist()
    scum = keyed_prefix_sum(h, ["source"], ["v"], "c", out_col="scum")
    gh = h.groupBy("v").agg(F.sum("c").alias("gc"))
    # corpus-wide cumsum: constant key → range-bucketed two-pass form,
    # never a single-task global window
    gcum = keyed_prefix_sum(
        gh.withColumn("g", F.lit(0)), ["g"], ["v"], "gc", out_col="gcum"
    ).drop("g")
    ns = h.groupBy("source").agg(F.sum("c").alias("n_s"))
    n_tot = h.agg(F.sum("c").cast("double").alias("n_tot"))
    j = (
        scum.join(gcum.select("v", "gc", "gcum"), "v")
        .join(F.broadcast(ns), "source")
        .crossJoin(F.broadcast(n_tot))
    )
    d = F.round(
        F.greatest(
            F.abs(
                F.col("scum") / F.col("n_s").cast("double")
                - F.col("gcum") / F.col("n_tot")
            ),
            F.abs(
                (F.col("scum") - F.col("c")) / F.col("n_s").cast("double")
                - (F.col("gcum") - F.col("gc")) / F.col("n_tot")
            ),
        ),
        6,
    )
    return j.groupBy("source").agg(
        F.max("n_s").cast("long").alias("n_docs"),
        F.max(d).alias("ks_distance"),
    )


@register(
    "funnel_signup_click_purchase",
    oracle="""
    WITH s AS (SELECT user_id, MIN(ts) AS fs
               FROM events WHERE event_type = 'signup' GROUP BY 1),
    c AS (SELECT e.user_id, MIN(e.ts) AS fc
          FROM events e JOIN s ON s.user_id = e.user_id
          WHERE e.event_type = 'click' AND e.ts >= s.fs GROUP BY 1),
    p AS (SELECT e.user_id, MIN(e.ts) AS fp
          FROM events e JOIN c ON c.user_id = e.user_id
          WHERE e.event_type = 'purchase' AND e.ts >= c.fc GROUP BY 1)
    SELECT COUNT(*)::BIGINT AS n_signup,
           COUNT(c.fc)::BIGINT AS n_click_after,
           COUNT(p.fp)::BIGINT AS n_purchase_after,
           round(COUNT(c.fc) / COUNT(*)::DOUBLE, 6) AS click_rate,
           round(COUNT(p.fp) / COUNT(*)::DOUBLE, 6) AS purchase_rate
    FROM s LEFT JOIN c ON c.user_id = s.user_id
           LEFT JOIN p ON p.user_id = s.user_id
    """,
    doc="Three-step STRICT-ORDER funnel (signup -> first click after "
    "it -> first purchase after that): the sequential-chaining pattern "
    "funnel_conversion_1h's two-step form can't express. Spark side "
    "chains two per-user windows + one aggregate ALL on the user_id "
    "partitioning, so the event stream shuffles exactly once and the "
    "second window + groupBy reuse the first window's exchange (plan-"
    "pinned); the oracle's three-aggregate join form is the reference "
    "semantics, not the execution shape.",
)
def funnel_signup_click_purchase(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts"
    )
    w = Window.partitionBy("user_id")
    e1 = ev.withColumn(
        "fs",
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).over(w),
    ).filter(F.col("fs").isNotNull())
    e2 = e1.withColumn(
        "fc",
        F.min(
            F.when(
                (F.col("event_type") == "click")
                & (F.col("ts") >= F.col("fs")),
                F.col("ts"),
            )
        ).over(w),
    )
    per_user = e2.groupBy("user_id").agg(
        F.min("fs").alias("fs"),
        F.min("fc").alias("fc"),
        F.min(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("ts") >= F.col("fc")),
                F.col("ts"),
            )
        ).alias("fp"),
    )
    return per_user.agg(
        F.count(F.lit(1)).alias("n_signup"),
        F.count("fc").alias("n_click_after"),
        F.count("fp").alias("n_purchase_after"),
        F.round(
            F.count("fc") / F.count(F.lit(1)).cast("double"), 6
        ).alias("click_rate"),
        F.round(
            F.count("fp") / F.count(F.lit(1)).cast("double"), 6
        ).alias("purchase_rate"),
    )


@register(
    "active_users_trailing_7d",
    oracle=f"""
    WITH d AS (SELECT DISTINCT user_id,
                      CAST(floor(epoch(ts)) AS BIGINT) // {_DAY} AS day
               FROM events),
    days AS (SELECT DISTINCT day FROM d)
    SELECT days.day, COUNT(DISTINCT d.user_id)::BIGINT AS active_7d
    FROM days JOIN d ON d.day BETWEEN days.day - 6 AND days.day
    GROUP BY days.day
    """,
    doc="Trailing-7-day active users per day (the WAU curve) via "
    "PRESENCE EXPANSION: the per-(user, day) presence frame — already "
    "orders of magnitude smaller than the event stream — explodes each "
    "presence day to the <=7 future days it covers, then one distinct-"
    "count per day. The naive form is a range join of days x presence "
    "(or a 7-day window re-scanning history per day); this form's "
    "expansion factor is exactly the window length and joins "
    "equi-style. The oracle uses the range-join form — same set by "
    "definition of 'active within [d-6, d]'.",
)
def active_users_trailing_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    ud = ev.select(
        "user_id", epoch_bucket("ts", _DAY).alias("day")
    ).distinct()
    days = ud.select(F.col("day").alias("obs_day")).distinct()
    # no distinct on the exploded frame: a user active on consecutive
    # days covers the same (user, day) more than once, but the final
    # count_distinct dedups anyway — an explicit distinct here is a
    # second full shuffle of the x7 frame for nothing (measured 79 s ->
    # 11 s on the 20M-event probe).
    cover = ud.select(
        "user_id",
        F.explode(
            F.sequence(F.col("day"), F.col("day") + F.lit(6))
        ).alias("cday"),
    )
    return (
        cover.join(days, cover.cday == days.obs_day)
        .groupBy(F.col("obs_day").alias("day"))
        .agg(F.count_distinct("user_id").alias("active_7d"))
    )


_LSH_PRECISION_THRESHOLD = 0.5


def _register_lsh_precision() -> None:
    # import here: llm.py defines the shared minhash CTE chain (and is
    # always loaded by the registry loader before this module)
    from .llm import _minhash_pairs_ctes

    @register(
        "lsh_candidate_precision",
        oracle=f"""
        WITH {_minhash_pairs_ctes(_LSH_PRECISION_THRESHOLD)}
        SELECT (SELECT COUNT(*) FROM cand)::BIGINT AS n_candidates,
               (SELECT COUNT(*) FROM pairs)::BIGINT AS n_true,
               CASE WHEN (SELECT COUNT(*) FROM cand) > 0
                    THEN round((SELECT COUNT(*) FROM pairs)
                               / (SELECT COUNT(*) FROM cand)::DOUBLE, 6)
                    ELSE 0.0 END AS lsh_precision
        """,
        doc="MinHash-LSH index calibration "
        "(operators/dedup.py::lsh_candidate_report): candidate-pair "
        "count from the banding, survivors of exact Jaccard "
        "verification, and the precision — the go/no-go number for a "
        "(bands, rows) configuration before committing a corpus-wide "
        "dedup run. Shares the shingle/signature tables with the dedup "
        "pass (persisted once); the oracle composes the exact same "
        "banding CTEs as dedup_minhash_lsh.",
    )
    def lsh_candidate_precision(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        from ..operators.dedup import lsh_candidate_report

        docs = load_table(spark, sf_dir, "documents")
        return lsh_candidate_report(
            docs, threshold=_LSH_PRECISION_THRESHOLD
        )


_register_lsh_precision()


@register(
    "referential_integrity_audit",
    oracle="""
    SELECT 'lineitem.l_orderkey -> orders' AS fk,
           (SELECT COUNT(*) FROM lineitem l
            WHERE NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_orderkey = l.l_orderkey))::BIGINT
               AS n_orphans,
           (SELECT COUNT(*) FROM lineitem)::BIGINT AS n_rows
    UNION ALL
    SELECT 'orders.o_custkey -> customer',
           (SELECT COUNT(*) FROM orders o
            WHERE NOT EXISTS (SELECT 1 FROM customer c
                              WHERE c.c_custkey = o.o_custkey))::BIGINT,
           (SELECT COUNT(*) FROM orders)::BIGINT
    UNION ALL
    SELECT 'customer.c_nationkey -> nation',
           (SELECT COUNT(*) FROM customer c
            WHERE NOT EXISTS (SELECT 1 FROM nation n
                              WHERE n.n_nationkey = c.c_nationkey))::BIGINT,
           (SELECT COUNT(*) FROM customer)::BIGINT
    UNION ALL
    SELECT 'lineitem.l_partkey -> part',
           (SELECT COUNT(*) FROM lineitem l
            WHERE NOT EXISTS (SELECT 1 FROM part p
                              WHERE p.p_partkey = l.l_partkey))::BIGINT,
           (SELECT COUNT(*) FROM lineitem)::BIGINT
    """,
    doc="Cross-table referential-integrity audit — orphan counts for "
    "the four FK relationships in one result. Each check is a LEFT "
    "ANTI join (the dim side broadcasts; nation/customer/part are all "
    "dim-sized), so a full-lake audit costs one fact-scan per FK with "
    "zero fact-side shuffles. The post-ingest data-quality gate that "
    "catches a partial upstream load before consumers join through the "
    "dangling keys.",
)
def referential_integrity_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    part = load_table(spark, sf_dir, "part")

    def audit(fk: str, fact: DataFrame, key, dim: DataFrame, dkey):
        orphans = fact.join(
            F.broadcast(dim), fact[key] == dim[dkey], "left_anti"
        ).agg(F.count(F.lit(1)).alias("n_orphans"))
        total = fact.agg(F.count(F.lit(1)).alias("n_rows"))
        return (
            orphans.crossJoin(total)
            .select(
                F.lit(fk).alias("fk"),
                F.col("n_orphans").cast("long"),
                F.col("n_rows").cast("long"),
            )
        )

    out = audit(
        "lineitem.l_orderkey -> orders", li, "l_orderkey", orders,
        "o_orderkey",
    )
    for args in (
        ("orders.o_custkey -> customer", orders, "o_custkey", cust,
         "c_custkey"),
        ("customer.c_nationkey -> nation", cust, "c_nationkey", nation,
         "n_nationkey"),
        ("lineitem.l_partkey -> part", li, "l_partkey", part, "p_partkey"),
    ):
        out = out.unionByName(audit(*args))
    return out


@register(
    "effective_tokens_by_source",
    oracle="""
    WITH t AS (SELECT source, md5(text) AS h,
                      len(list_filter(string_split(
                          trim(regexp_replace(lower(text),
                               '[^a-z0-9]+', ' ', 'g')), ' '),
                          x -> x <> ''))::BIGINT AS n_tok
               FROM documents),
    u AS (SELECT source, h, MIN(n_tok) AS n_tok, COUNT(*) AS copies
          FROM t GROUP BY source, h)
    SELECT source,
           SUM(n_tok * copies)::BIGINT AS raw_tokens,
           SUM(n_tok)::BIGINT AS effective_tokens,
           round(SUM(n_tok) / SUM(n_tok * copies)::DOUBLE, 6)
               AS effective_ratio
    FROM u GROUP BY source
    """,
    doc="Token budget a source ACTUALLY contributes after exact dedup: "
    "raw tokens vs tokens of distinct texts (per-source md5 grouping — "
    "copies of a doc add no new training signal). The mixing-weight "
    "input that doc counts and raw token counts both get wrong for "
    "template-heavy sources. One hash-groupBy on (source, md5) with "
    "map-side partials; ratios divide exact bigints.",
)
def effective_tokens_by_source(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..functions.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "source",
        F.md5("text").alias("h"),
        F.size(tokens(F.col("text"))).cast("long").alias("n_tok"),
    )
    u = t.groupBy("source", "h").agg(
        F.min("n_tok").alias("n_tok"),
        F.count(F.lit(1)).alias("copies"),
    )
    return u.groupBy("source").agg(
        F.sum(F.col("n_tok") * F.col("copies")).cast("long").alias(
            "raw_tokens"
        ),
        F.sum("n_tok").cast("long").alias("effective_tokens"),
        F.round(
            F.sum("n_tok")
            / F.sum(F.col("n_tok") * F.col("copies")).cast("double"),
            6,
        ).alias("effective_ratio"),
    )


@register(
    "embedding_drift_halves",
    oracle="""
    WITH e AS (SELECT vec_id, generate_subscripts(embedding, 1) AS dim,
                      CAST(unnest(embedding) AS DOUBLE) AS x,
                      vec_id % 2 AS half
               FROM embeddings),
    mu AS (SELECT half, dim,
                  CAST(SUM(CAST(round(x, 6) AS DECIMAL(27,6))) AS DOUBLE)
                      / COUNT(*) AS mu
           FROM e GROUP BY half, dim),
    w AS (SELECT m0.dim, m0.mu AS mu0, m1.mu AS mu1
          FROM mu m0 JOIN mu m1 ON m1.dim = m0.dim
          WHERE m0.half = 0 AND m1.half = 1),
    s AS (SELECT
            CAST(SUM(CAST(round(mu0 * mu1, 6) AS DECIMAL(27,6)))
                 AS DOUBLE) AS dot,
            CAST(SUM(CAST(round(mu0 * mu0, 6) AS DECIMAL(27,6)))
                 AS DOUBLE) AS n0,
            CAST(SUM(CAST(round(mu1 * mu1, 6) AS DECIMAL(27,6)))
                 AS DOUBLE) AS n1,
            CAST(SUM(CAST(round((mu0 - mu1) * (mu0 - mu1), 6)
                          AS DECIMAL(27,6))) AS DOUBLE) AS d2
          FROM w)
    SELECT round(dot / (sqrt(n0) * sqrt(n1)), 6) AS centroid_cosine,
           round(sqrt(d2), 6) AS centroid_shift_l2,
           (SELECT COUNT(*) FROM embeddings WHERE vec_id % 2 = 0)::BIGINT
               AS n_half0,
           (SELECT COUNT(*) FROM embeddings WHERE vec_id % 2 = 1)::BIGINT
               AS n_half1
    FROM s
    """,
    doc="Embedding-version drift check: split the corpus into two "
    "deterministic halves (vec_id parity — stand-in for old/new model "
    "versions or time slices) and compare their EXACT centroids: "
    "cosine and L2 shift. The cheap canary that catches a re-embedding "
    "run with a changed model/normalization before an index rebuild "
    "mixes incompatible vectors. One explode pass + a dim-sized "
    "centroid frame; all decimal-summed, fully exact oracle.",
)
def embedding_drift_halves(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    e = emb.select(
        (F.col("vec_id") % 2).alias("half"),
        F.posexplode("embedding").alias("dim", "xf"),
    ).withColumn("x", F.col("xf").cast("double"))

    def dsum(col):
        return F.sum(F.round(col, 6).cast("decimal(27,6)")).cast("double")

    mu = e.groupBy("half", "dim").agg(
        (dsum(F.col("x")) / F.count(F.lit(1))).alias("mu")
    )
    m0 = mu.filter("half = 0").select("dim", F.col("mu").alias("mu0"))
    m1 = mu.filter("half = 1").select("dim", F.col("mu").alias("mu1"))
    w = m0.join(m1, "dim")
    s = w.agg(
        dsum(F.col("mu0") * F.col("mu1")).alias("dot"),
        dsum(F.col("mu0") * F.col("mu0")).alias("n0"),
        dsum(F.col("mu1") * F.col("mu1")).alias("n1"),
        dsum((F.col("mu0") - F.col("mu1")) * (F.col("mu0") - F.col("mu1")))
        .alias("d2"),
    )
    counts = emb.agg(
        F.sum(F.when(F.col("vec_id") % 2 == 0, 1).otherwise(0))
        .cast("long")
        .alias("n_half0"),
        F.sum(F.when(F.col("vec_id") % 2 == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_half1"),
    )
    return s.crossJoin(counts).select(
        F.round(
            F.col("dot") / (F.sqrt("n0") * F.sqrt("n1")), 6
        ).alias("centroid_cosine"),
        F.round(F.sqrt("d2"), 6).alias("centroid_shift_l2"),
        "n_half0",
        "n_half1",
    )


@register(
    "forward_fill_values",
    oracle="""
    WITH v AS (SELECT event_id, user_id, ts,
                      CASE WHEN event_type = 'error' THEN NULL
                           ELSE round(value, 6) END AS v
               FROM events)
    SELECT event_id, user_id,
           last_value(v IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS filled_value
    FROM v
    """,
    doc="Per-entity forward fill (LOCF imputation): error events carry "
    "no valid measurement, so each row takes the user's last non-null "
    "value in (ts, event_id) order. One window PARTITIONED BY user — "
    "state per partition is a single scalar, the canonical gap-filling "
    "op for sensor/telemetry lakes. Values 6-dp rounded on both sides "
    "(pure passthrough, no summation).",
)
def forward_fill_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    v = ev.select(
        "event_id",
        "user_id",
        "ts",
        F.when(F.col("event_type") == "error", F.lit(None)).otherwise(
            F.round("value", 6)
        ).alias("v"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return v.select(
        "event_id",
        "user_id",
        F.last("v", ignorenulls=True).over(w).alias("filled_value"),
    )


@register(
    "clustering_coefficient_parts",
    oracle="""
    WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
                FROM lineitem),
    e AS (SELECT a.p AS a, b.p AS b
          FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
          GROUP BY 1, 2 HAVING COUNT(*) >= 2),
    tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
            FROM e e1
            JOIN e e2 ON e2.a = e1.b
            JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
    corners AS (SELECT x AS node FROM tri
                UNION ALL SELECT y FROM tri
                UNION ALL SELECT z FROM tri),
    tcount AS (SELECT node, COUNT(*) AS t FROM corners GROUP BY node),
    deg AS (SELECT node, COUNT(*) AS d FROM (
                SELECT a AS node FROM e UNION ALL SELECT b FROM e
            ) GROUP BY node)
    SELECT deg.node, deg.d::BIGINT AS degree,
           COALESCE(t, 0)::BIGINT AS n_triangles,
           CASE WHEN deg.d >= 2
                THEN round(2.0 * COALESCE(t, 0) / (deg.d * (deg.d - 1)), 6)
                ELSE 0.0 END AS clustering_coeff
    FROM deg LEFT JOIN tcount USING (node)
    """,
    doc="Local clustering coefficient per part over the same support>=2 "
    "co-order graph as triangle_count_coorder_parts: cc(v) = 2T(v) / "
    "(d(v)(d(v)-1)) — the 'is this node in a community or a hub-spoke' "
    "signal. Composes the orientation-bounded triangle operator with "
    "one degree aggregate; pure integer operands into the final "
    "division, so both engines compute the identical double.",
)
def clustering_coefficient_parts(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.graph import _canonical_triangle_counts

    li = load_table(spark, sf_dir, "lineitem")
    # canonical by construction (see triangle_count_coorder_parts); the
    # core SHARES its degree aggregate, so the former caller-side
    # second degree pass and the operator's re-canonicalizing distinct
    # are both gone (r13: 2 exchanges + 1 persist fill fewer)
    edges = _coorder_edges(li).select(
        F.col("src").alias("a"), F.col("dst").alias("b")
    ).persist()
    tri, deg_frame = _canonical_triangle_counts(edges)
    deg = deg_frame.select("node", F.col("deg").alias("degree"))
    j = deg.join(tri, "node", "left").select(
        "node",
        F.col("degree").cast("long").alias("degree"),
        F.coalesce("n_triangles", F.lit(0)).cast("long").alias(
            "n_triangles"
        ),
        F.when(
            F.col("degree") >= 2,
            F.round(
                2.0
                * F.coalesce("n_triangles", F.lit(0))
                / (F.col("degree") * (F.col("degree") - 1)),
                6,
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("clustering_coeff"),
    )
    return j


@register(
    "expectations_orders_contract",
    oracle="""
    SELECT 'totalprice_positive' AS expectation,
           (SELECT COUNT(*) FROM orders
            WHERE NOT COALESCE(o_totalprice > 0, FALSE))::BIGINT
               AS n_violations,
           (SELECT COUNT(*) FROM orders)::BIGINT AS n_rows
    UNION ALL
    SELECT 'status_in_domain',
           (SELECT COUNT(*) FROM orders
            WHERE NOT COALESCE(o_orderstatus IN ('O','F','P'), FALSE))::BIGINT,
           (SELECT COUNT(*) FROM orders)::BIGINT
    UNION ALL
    SELECT 'orderdate_not_null',
           (SELECT COUNT(*) FROM orders
            WHERE o_orderdate IS NULL)::BIGINT,
           (SELECT COUNT(*) FROM orders)::BIGINT
    UNION ALL
    SELECT 'orderkey_unique',
           ((SELECT COUNT(*) FROM orders)
            - (SELECT COUNT(DISTINCT o_orderkey) FROM orders))::BIGINT,
           (SELECT COUNT(*) FROM orders)::BIGINT
    """,
    doc="Declarative data contract over orders "
    "(operators/expectations.py::evaluate_expectations): range, domain, "
    "non-null, and key-uniqueness checks. All row-level checks compile "
    "into ONE aggregation scan (conditional sums, map-side partials) no "
    "matter how many the contract carries; the uniqueness check adds "
    "one keyed aggregate. Predicate semantics are null-hostile: a NULL "
    "price VIOLATES price>0 instead of escaping through three-valued "
    "logic — pinned in tests/test_expectations.py.",
)
def expectations_orders_contract(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.expectations import evaluate_expectations

    orders = load_table(spark, sf_dir, "orders")
    return evaluate_expectations(
        orders,
        row_checks=[
            ("totalprice_positive", F.col("o_totalprice") > 0),
            (
                "status_in_domain",
                F.col("o_orderstatus").isin("O", "F", "P"),
            ),
            ("orderdate_not_null", F.col("o_orderdate").isNotNull()),
        ],
        unique_keys=[("orderkey_unique", ["o_orderkey"])],
    )


@register(
    "revenue_pareto_deciles",
    oracle="""
    WITH spend AS (
      SELECT o_custkey,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
                 AS spend
      FROM orders GROUP BY o_custkey),
    ranked AS (
      SELECT spend,
             ntile(10) OVER (ORDER BY spend DESC, o_custkey) AS decile
      FROM spend),
    d AS (SELECT decile, COUNT(*)::BIGINT AS n_customers,
                 CAST(SUM(CAST(round(spend, 4) AS DECIMAL(27,4)))
                      AS DOUBLE) AS decile_revenue
          FROM ranked GROUP BY decile),
    tot AS (SELECT CAST(SUM(CAST(round(spend, 4) AS DECIMAL(27,4)))
                        AS DOUBLE) AS total FROM ranked)
    SELECT decile, n_customers, decile_revenue,
           round(decile_revenue / total, 6) AS revenue_share,
           round(CAST(SUM(decile_revenue) OVER (
                     ORDER BY decile
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                 ) AS DOUBLE) / total, 6) AS cum_share
    FROM d CROSS JOIN tot
    """,
    doc="Revenue Pareto/Lorenz curve: customers ranked by total spend "
    "into deciles (ties broken by custkey for determinism), revenue "
    "share and cumulative share per decile — 'the top 10% of customers "
    "carry X% of revenue'. The ranking window runs over the CUSTOMER-"
    "aggregated frame (customer-sized, not fact-sized); spends are "
    "exact decimal sums, shares divide identical doubles, the "
    "cumulative window sees 10 rows. Complements token_gini_by_source: "
    "gini summarizes the curve, this emits it.",
)
def revenue_pareto_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    spend = orders.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
        .cast("double")
        .alias("spend")
    )
    wr = Window.orderBy(F.desc("spend"), F.asc("o_custkey"))
    ranked = spend.select(
        "spend", F.ntile(10).over(wr).alias("decile")
    )

    def dsum4(col):
        return F.sum(F.round(col, 4).cast("decimal(27,4)")).cast("double")

    d = ranked.groupBy("decile").agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"),
        dsum4(F.col("spend")).alias("decile_revenue"),
    )
    tot = ranked.agg(dsum4(F.col("spend")).alias("total"))
    wc = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return d.crossJoin(tot).select(
        "decile",
        "n_customers",
        "decile_revenue",
        F.round(F.col("decile_revenue") / F.col("total"), 6).alias(
            "revenue_share"
        ),
        F.round(
            F.sum("decile_revenue").over(wc).cast("double")
            / F.col("total"),
            6,
        ).alias("cum_share"),
    )


@register(
    "lang_consistency_by_source",
    oracle="""
    WITH c AS (SELECT source, lang, COUNT(*) AS n
               FROM documents GROUP BY source, lang),
    maj AS (SELECT source, lang AS majority_lang
            FROM (SELECT source, lang, n,
                         row_number() OVER (
                             PARTITION BY source
                             ORDER BY n DESC, lang) AS rn
                  FROM c)
            WHERE rn = 1)
    SELECT c.source, maj.majority_lang,
           SUM(c.n)::BIGINT AS n_docs,
           SUM(CASE WHEN c.lang <> maj.majority_lang THEN c.n
                    ELSE 0 END)::BIGINT AS n_off_majority,
           round(SUM(CASE WHEN c.lang <> maj.majority_lang THEN c.n
                          ELSE 0 END) / SUM(c.n)::DOUBLE, 6)
               AS off_majority_ratio
    FROM c JOIN maj ON maj.source = c.source
    GROUP BY c.source, maj.majority_lang
    """,
    doc="Language-consistency screen per source: the majority language "
    "(deterministic tie-break) and the fraction of documents tagged "
    "otherwise — a high off-majority ratio flags either a mislabeled "
    "source feed or a broken language-ID stage upstream. Runs entirely "
    "on the (source, lang) count frame: one aggregate over the corpus, "
    "then source-sized windows and joins.",
)
def lang_consistency_by_source(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    c = docs.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy("source").orderBy(F.desc("n"), F.asc("lang"))
    maj = (
        c.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .select("source", F.col("lang").alias("majority_lang"))
    )
    return (
        c.join(maj, "source")
        .groupBy("source", "majority_lang")
        .agg(
            F.sum("n").cast("long").alias("n_docs"),
            F.sum(
                F.when(F.col("lang") != F.col("majority_lang"), F.col("n"))
                .otherwise(F.lit(0))
            )
            .cast("long")
            .alias("n_off_majority"),
            F.round(
                F.sum(
                    F.when(
                        F.col("lang") != F.col("majority_lang"), F.col("n")
                    ).otherwise(F.lit(0))
                )
                / F.sum("n").cast("double"),
                6,
            ).alias("off_majority_ratio"),
        )
    )


@register(
    "sql_api_revenue_by_status",
    oracle="""
    SELECT o_orderstatus,
           COUNT(*)::BIGINT AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
               AS revenue
    FROM orders GROUP BY o_orderstatus
    """,
    doc="The SQL-surface path (SURVEY S8: the engine IS the query "
    "layer): this query goes through api.open_session's registered "
    "temp views and spark.sql(...) VERBATIM rather than the DataFrame "
    "builder — proving the declarative SQL front door produces "
    "oracle-identical results under the same determinism contract "
    "(decimal sums cast back to double).",
)
def sql_api_revenue_by_status(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..api import open_session

    open_session(sf_dir=sf_dir, spark=spark, tables=("orders",))
    return spark.sql(
        """
        SELECT o_orderstatus,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
                   AS revenue
        FROM orders GROUP BY o_orderstatus
        """
    )


_PPR_SCALE = 10**12
_PPR_DAMP = 85


def _ppr_iter_sql(prev: str, name: str) -> str:
    return f"""{name} AS (
      SELECT nd.node,
             CAST(CASE WHEN nd.node LIKE 's%' THEN p.base ELSE 0 END
                  + ({_PPR_DAMP} * COALESCE(rv.recv, 0)) // 100
                  AS BIGINT) AS rank
      FROM nodes nd CROSS JOIN p
      LEFT JOIN (SELECT e.dst, SUM(r.rank // d.outdeg) AS recv
                 FROM e JOIN deg d ON e.src = d.src
                 JOIN {prev} r ON r.node = e.src
                 GROUP BY e.dst) rv ON rv.dst = nd.node)"""


@register(
    "pagerank_personalized_suppliers",
    oracle=f"""
    WITH pairs AS (
      SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS c,
                      's' || CAST(l_suppkey AS VARCHAR) AS s
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
    e AS (SELECT c AS src, s AS dst FROM pairs
          UNION ALL SELECT s AS src, c AS dst FROM pairs),
    deg AS (SELECT src, COUNT(*) AS outdeg FROM e GROUP BY src),
    nodes AS (SELECT src AS node FROM e UNION SELECT dst AS node FROM e),
    p AS (SELECT ns,
                 ({_PPR_SCALE} * {100 - _PPR_DAMP}) // (100 * ns) AS base
          FROM (SELECT COUNT(*)::BIGINT AS ns FROM nodes
                WHERE node LIKE 's%')),
    r0 AS (SELECT nd.node,
                  CASE WHEN nd.node LIKE 's%'
                       THEN {_PPR_SCALE} // p.ns ELSE 0 END AS rank
           FROM nodes nd CROSS JOIN p),
    {_ppr_iter_sql('r0', 'it1')},
    {_ppr_iter_sql('it1', 'it2')},
    {_ppr_iter_sql('it2', 'it3')},
    ranked AS (SELECT node, rank,
                      row_number() OVER (ORDER BY rank DESC, node) AS rnk
               FROM it3)
    SELECT node, rank, rnk FROM ranked WHERE rnk <= 20
    """,
    doc="PERSONALIZED PageRank over the trade graph "
    "(operators/graph.py::personalized_pagerank_fixed_point): teleport "
    "mass returns only to the SUPPLIER seed set, ranking authority "
    "relative to trusted seeds — the crawl-frontier / related-entity "
    "form of the global pagerank_trade_graph_3iter beside it. Same "
    "exact bigint fixed-point recurrence (bit-reproducible, unrolled-"
    "CTE oracle); one hash join + one combinable SUM per sweep, rank "
    "frame node-sized.",
)
def pagerank_personalized_suppliers(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.graph import (
        customer_supplier_edges,
        personalized_pagerank_fixed_point,
    )

    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    edges = customer_supplier_edges(orders, li)
    rank = personalized_pagerank_fixed_point(
        edges,
        seed=F.col("node").startswith("s"),
        iters=3,
        damping_pct=_PPR_DAMP,
        scale=_PPR_SCALE,
    )
    top = rank.orderBy(F.col("rank").desc(), F.col("node")).limit(20)
    w = Window.orderBy(F.col("rank").desc(), F.col("node"))
    return top.withColumn("rnk", F.row_number().over(w)).select(
        "node", "rank", "rnk"
    )


@register(
    "skipgram_pairs_top50",
    oracle="""
    WITH t AS (SELECT doc_id,
                      list_filter(string_split(
                          trim(regexp_replace(lower(text),
                               '[^a-z0-9]+', ' ', 'g')), ' '),
                          x -> x <> '') AS toks
               FROM documents),
    pos AS (SELECT doc_id, generate_subscripts(toks, 1) AS i,
                   unnest(toks) AS w
            FROM t),
    pairs AS (SELECT a.w AS w1, b.w AS w2
              FROM pos a JOIN pos b
                ON b.doc_id = a.doc_id
               AND b.i > a.i AND b.i <= a.i + 2)
    SELECT w1, w2, COUNT(*)::BIGINT AS n_cooc
    FROM pairs GROUP BY w1, w2
    ORDER BY n_cooc DESC, w1, w2
    LIMIT 50
    """,
    doc="Skip-gram co-occurrence statistics (word2vec-style window-2 "
    "pairs, ordered): the count matrix an embedding trainer or PMI "
    "pipeline consumes. Fan-out is exactly the window size per token — "
    "a position self-join bounded at 2 rows per left token, joined on "
    "doc_id (never all positions x all positions); one count shuffle "
    "then TakeOrdered top-50. Extends pmi_collocations_top50's "
    "adjacent-bigram stats to the windowed form.",
)
def skipgram_pairs_top50(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    pos = docs.select(
        "doc_id", F.posexplode(tokens(F.col("text"))).alias("i", "w")
    )
    a = pos.alias("a")
    b = pos.alias("b")
    pairs = a.join(
        b,
        (F.col("b.doc_id") == F.col("a.doc_id"))
        & (F.col("b.i") > F.col("a.i"))
        & (F.col("b.i") <= F.col("a.i") + 2),
    ).select(F.col("a.w").alias("w1"), F.col("b.w").alias("w2"))
    return (
        pairs.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("n_cooc"))
        .orderBy(F.desc("n_cooc"), F.asc("w1"), F.asc("w2"))
        .limit(50)
    )


@register(
    "retention_cohort_revenue",
    oracle=f"""
    WITH d AS (SELECT user_id, event_type, value,
                      CAST(floor(epoch(ts)) AS BIGINT) // {_DAY} AS day
               FROM events),
    cohort AS (SELECT user_id, MIN(day) // 7 AS cohort_wk
               FROM d WHERE event_type = 'signup' GROUP BY user_id),
    pur AS (SELECT user_id, day // 7 AS wk, value FROM d
            WHERE event_type = 'purchase'),
    j AS (SELECT c.cohort_wk, p.wk - c.cohort_wk AS week_offset,
                 p.user_id, p.value
          FROM cohort c JOIN pur p USING (user_id)
          WHERE p.wk >= c.cohort_wk)
    SELECT cohort_wk, week_offset,
           COUNT(DISTINCT user_id)::BIGINT AS n_buyers,
           CAST(SUM(CAST(round(value, 6) AS DECIMAL(27,6))) AS DOUBLE)
               AS revenue
    FROM j GROUP BY cohort_wk, week_offset
    """,
    doc="REVENUE-weighted retention cohorts: purchase value per "
    "(signup-week cohort, week offset) — the LTV curve behind "
    "retention_cohorts' user counts; the two diverge exactly when "
    "retained users spend differently over their lifetime. Same "
    "integer-epoch cohort math + one hash join on user_id; purchase "
    "values are 6-dp-rounded decimal sums so the matrix is exact.",
)
def retention_cohort_revenue(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    d = ev.select(
        "user_id",
        "event_type",
        "value",
        epoch_bucket("ts", _DAY).alias("day"),
    )
    cohort = (
        d.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(floor_div(F.min("day"), 7).alias("cohort_wk"))
    )
    pur = d.filter(F.col("event_type") == "purchase").select(
        "user_id", floor_div("day", 7).alias("wk"), "value"
    )
    j = pur.join(cohort, "user_id").filter(
        F.col("wk") >= F.col("cohort_wk")
    )
    return (
        j.select(
            "cohort_wk",
            (F.col("wk") - F.col("cohort_wk")).alias("week_offset"),
            "user_id",
            "value",
        )
        .groupBy("cohort_wk", "week_offset")
        .agg(
            F.count_distinct("user_id").alias("n_buyers"),
            F.sum(F.round("value", 6).cast("decimal(27,6)"))
            .cast("double")
            .alias("revenue"),
        )
    )


@register(
    "multi_touch_attribution_linear",
    oracle="""
    WITH j AS (
      SELECT e.event_id AS click_id, p.event_id AS purchase_id,
             round(p.value, 6) AS value
      FROM events e JOIN events p
        ON p.user_id = e.user_id
       AND e.event_type = 'click' AND p.event_type = 'purchase'
       AND p.ts >= e.ts AND p.ts <= e.ts + INTERVAL 1 HOUR),
    w AS (SELECT click_id, purchase_id, value,
                 COUNT(*) OVER (PARTITION BY purchase_id) AS n_touches
          FROM j)
    SELECT click_id,
           COUNT(*)::BIGINT AS n_purchases_touched,
           round(CAST(SUM(CAST(round(1.0 / n_touches, 6)
                              AS DECIMAL(27,6))) AS DOUBLE), 6) AS credit,
           CAST(SUM(CAST(round(round(value, 6) / n_touches, 6)
                         AS DECIMAL(27,6))) AS DOUBLE)
               AS attributed_revenue
    FROM w GROUP BY click_id
    """,
    doc="LINEAR multi-touch attribution: each purchase's credit (and "
    "revenue) split equally across ALL clicks in the preceding hour — "
    "the sibling of conversion_attribution_last_touch for marketing-"
    "mix analysis. Interval-join candidates + a per-purchase COUNT "
    "window (candidate-click-sized state) + one keyed aggregate per "
    "click. Each share is 6-dp rounded BEFORE summation and BOTH the "
    "credit and revenue shares are decimal(27,6)-summed, so results "
    "are order-independent on both engines.",
)
def multi_touch_attribution_linear(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..streaming.incremental import interval_join_events_orders

    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("pts"),
        F.round("value", 6).alias("pvalue"),
    )
    j = interval_join_events_orders(
        clicks,
        purchases.drop("pvalue"),
        event_ts="ts",
        order_ts="pts",
        user_key="user_id",
        order_key="user_id",
        event_id="event_id",
        order_id="purchase_id",
        within="1 hour",
    ).join(
        purchases.select("purchase_id", "pvalue"), "purchase_id"
    )
    w = Window.partitionBy("purchase_id")
    shares = j.withColumn("n_touches", F.count(F.lit(1)).over(w))
    return (
        shares.groupBy(F.col("event_id").alias("click_id"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_purchases_touched"),
            F.round(
                F.sum(
                    F.round(1.0 / F.col("n_touches"), 6).cast(
                        "decimal(27,6)"
                    )
                ).cast("double"),
                6,
            ).alias("credit"),
            F.sum(
                F.round(F.col("pvalue") / F.col("n_touches"), 6).cast(
                    "decimal(27,6)"
                )
            )
            .cast("double")
            .alias("attributed_revenue"),
        )
    )
