"""Round-5 plans: REAL image decode over synthesized PPM media.

The fixtures ship no image files, so the media column is synthesized
IN-PLAN from the documents table: each doc's ASCII text bytes become the
raster of a binary PPM (P6) — header ``P6\\n4 {h}\\n255\\n`` plus the
first ``12·h`` text bytes as 4-wide RGB rows. Because text is pure ASCII
in the fixtures (``ord(char) == byte``), the whole decode → pixel-stats
path is replicable in ANSI SQL, making the REAL image codec
(operators/multimodal.py::decode_image) exactly oracle-checked the same
way the PCM16 audio path is.

Same determinism contract as every plan module: exact integer channel
sums, one division, 6-dp round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.fixtures import load_table
from .registry import register


_SWEEP_CONFIGS = ((2, 8), (4, 4), (8, 2))  # (bands, rows): b*r = 16 perms


def _sweep_oracle() -> str:
    """DuckDB twin of the one-pass (b x r) LSH calibration sweep."""
    from ..operators import dedup as dd
    from .llm import _h32_sql, _shingles_sql

    mins = ",\n           ".join(
        f"MIN(({a} * h + {b}) % {dd.MERSENNE_P}) AS mh{i}"
        for i, (a, b) in enumerate(zip(dd.MINHASH_A, dd.MINHASH_B))
    )
    band_rows = []
    for b, r in _SWEEP_CONFIGS:
        for j in range(b):
            cols = [f"mh{j * r + k}" for k in range(r)]
            sig = " || ',' || ".join(cols)
            band_rows.append(
                f"SELECT '{b}x{r}' AS config, doc_id, {j} AS band_id, "
                f"{sig} AS band_sig FROM sig"
            )
    bands = "\n         UNION ALL ".join(band_rows)
    return f"""
    WITH sh AS (SELECT doc_id, unnest({_shingles_sql(3)}) AS s
                FROM documents),
    th AS (SELECT doc_id, {_h32_sql('s')} AS h FROM sh),
    sig AS (SELECT doc_id, {mins} FROM th GROUP BY doc_id),
    bands AS ({bands}),
    cand AS (SELECT DISTINCT b1.config AS config, b1.doc_id AS doc_id_a,
                    b2.doc_id AS doc_id_b
             FROM bands b1 JOIN bands b2
               ON b1.config = b2.config AND b1.band_id = b2.band_id
              AND b1.band_sig = b2.band_sig AND b1.doc_id < b2.doc_id),
    up AS (SELECT DISTINCT doc_id_a, doc_id_b FROM cand),
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
    inter AS (SELECT u.doc_id_a, u.doc_id_b, COUNT(*) AS i
              FROM up u
              JOIN sh t1 ON t1.doc_id = u.doc_id_a
              JOIN sh t2 ON t2.doc_id = u.doc_id_b AND t2.s = t1.s
              GROUP BY u.doc_id_a, u.doc_id_b),
    ver AS (SELECT inter.doc_id_a, inter.doc_id_b
            FROM inter
            JOIN sizes sa ON sa.doc_id = inter.doc_id_a
            JOIN sizes sb ON sb.doc_id = inter.doc_id_b
            WHERE round(i / (sa.sz + sb.sz - i), 6) >= 0.5)
    SELECT c.config,
           COUNT(*)::BIGINT AS n_candidates,
           SUM(CASE WHEN v.doc_id_a IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
               AS n_true,
           round(SUM(CASE WHEN v.doc_id_a IS NOT NULL THEN 1 ELSE 0 END)
                 / CAST(COUNT(*) AS DOUBLE), 6) AS lsh_precision
    FROM cand c
    LEFT JOIN ver v
      ON v.doc_id_a = c.doc_id_a AND v.doc_id_b = c.doc_id_b
    GROUP BY c.config
    """


@register(
    "lsh_threshold_sweep",
    oracle=_sweep_oracle(),
    doc="One-pass (bands x rows) LSH calibration sweep — the grid "
    "companion of lsh_candidate_precision: candidate volume, verified "
    "true positives and precision for (2x8, 4x4, 8x2) over the SAME 16 "
    "minhash perms, so choosing a banding config costs ONE corpus scan "
    "+ one shared Jaccard verify instead of three dedup dry-runs. "
    "Spark: one signature groupBy, per-config band frames unioned "
    "before a single (config, band) equi-join; exact verification runs "
    "once on the DISTINCT union of candidate pairs across configs and "
    "joins back per config.",
)
def lsh_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import dedup as dd

    docs = load_table(spark, sf_dir, "documents")
    # intentional session-lifetime persists (lazy result; LRU-evictable)
    # — see dedup.lsh_candidate_report for the policy
    sh = dd._shingle_table(docs, "text", "doc_id", 3).persist()
    sig = dd._signatures_from_shingles(sh).persist()

    # r13 (guide §2.4, VERDICT r12 item 1): the three configs share the
    # SAME 16 minhash perms, and every (b×r) band [j·r, (j+1)·r) is a
    # union of consecutive 2-row bands of the FINEST config (8×2) —
    # r ∈ {8,4,2} are aligned multiples of 2. Equality on all r rows of
    # any band therefore implies equality on each contained 2-row band,
    # so cand(2x8) ⊆ cand(4x4) ⊆ cand(8x2): ONE self-join on the 8×2
    # banding generates the candidate superset, and each pair's
    # membership in the coarser configs is a pure signature-equality
    # predicate (band_sig string equality ⟺ element-wise mh equality:
    # comma-separated integers are an injective encoding, and minhash
    # values are never NULL — a MIN over a non-empty shingle group).
    # The former shape unioned 28 branches (2+4+8 bands × both join
    # sides) and re-joined per config: 130 Exchange plan refs, 14.5 s
    # at sf0.01 with 83 candidate rows — pure plan/stage overhead.
    n_bands, n_rows = 8, 2
    band_structs = [
        F.struct(
            F.lit(j).alias("band_id"),
            F.concat_ws(
                ",",
                *[F.col(f"mh{j * n_rows + k}") for k in range(n_rows)],
            ).alias("band_sig"),
        )
        for j in range(n_bands)
    ]
    bands = sig.select(
        "doc_id", F.explode(F.array(*band_structs)).alias("b")
    ).select("doc_id", "b.band_id", "b.band_sig")
    b1, b2 = bands.alias("b1"), bands.alias("b2")
    pairs = (
        b1.join(
            b2,
            (F.col("b1.band_id") == F.col("b2.band_id"))
            & (F.col("b1.band_sig") == F.col("b2.band_sig"))
            & (F.col("b1.doc_id") < F.col("b2.doc_id")),
        )
        .select(
            F.col("b1.doc_id").alias("doc_id_a"),
            F.col("b2.doc_id").alias("doc_id_b"),
        )
        .distinct()
        .persist()  # consumed by the verify AND the membership flags
    )

    # per-config membership from the signatures themselves (broadcast
    # join-back on the persisted doc-level sig frame)
    sa = sig.select(
        F.col("doc_id").alias("doc_id_a"),
        *[F.col(f"mh{i}").alias(f"a{i}") for i in range(16)],
    )
    sb = sig.select(
        F.col("doc_id").alias("doc_id_b"),
        *[F.col(f"mh{i}").alias(f"b{i}") for i in range(16)],
    )

    def _in_cfg(b: int, r: int) -> F.Column:
        cond = F.lit(False)
        for j in range(b):
            band_eq = F.lit(True)
            for k in range(r):
                i = j * r + k
                band_eq = band_eq & (F.col(f"a{i}") == F.col(f"b{i}"))
            cond = cond | band_eq
        return cond

    flagged = (
        pairs.join(F.broadcast(sa), "doc_id_a")
        .join(F.broadcast(sb), "doc_id_b")
        .select(
            "doc_id_a",
            "doc_id_b",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(f"{b}x{r}").alias("config"),
                            (
                                F.lit(True)
                                if (b, r) == (n_bands, n_rows)
                                else _in_cfg(b, r)
                            ).alias("m"),
                        )
                        for b, r in _SWEEP_CONFIGS
                    ]
                )
            ).alias("c"),
        )
        .filter(F.col("c.m"))
        .select("c.config", "doc_id_a", "doc_id_b")
    )

    # NO verify prefilter here: a calibration sweep's candidate union
    # covers most of the corpus (every config's collisions), so the
    # semi-join slice saves nothing and its extra plan layers cost —
    # measured 37.3 s with vs 14.5 s without at sf0.01 (r12 A/B; the
    # prefilter only pays when candidates ≪ corpus, see
    # minhash_near_duplicates). `pairs` is already the distinct union
    # of candidates across configs (the 8×2 superset).
    ver = dd._jaccard_verify(pairs, sh, 0.5).select(
        "doc_id_a", "doc_id_b", F.lit(1).alias("_true")
    )
    return (
        flagged.join(ver, ["doc_id_a", "doc_id_b"], "left")
        .groupBy("config")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_candidates"),
            F.sum(F.coalesce(F.col("_true"), F.lit(0)))
            .cast("long")
            .alias("n_true"),
            F.round(
                F.sum(F.coalesce(F.col("_true"), F.lit(0)))
                / F.count(F.lit(1)).cast("double"),
                6,
            ).alias("lsh_precision"),
        )
    )


@register(
    "image_ppm_pixel_stats",
    # body byte i (1-based, i <= 12*h) is text byte i; channel = (i-1)%3
    # (0=R,1=G,2=B). Exact integer sums per channel / (4*h) pixels.
    oracle="""
    WITH m AS (SELECT doc_id AS media_id,
                      CAST(len(text) // 12 AS BIGINT) AS h, text
               FROM documents WHERE len(text) >= 12),
    b AS (SELECT media_id, h,
                 unnest(range(1, CAST(12 * h + 1 AS BIGINT))) AS i, text
          FROM m),
    v AS (SELECT media_id, h, CAST((i - 1) % 3 AS INT) AS ch,
                 ord(substr(text, CAST(i AS INT), 1)) AS val
          FROM b)
    SELECT media_id,
           'ppm' AS format,
           4 AS width,
           CAST(h AS INT) AS height,
           CAST(4 * h AS BIGINT) AS n_pixels,
           -- exact integer HALF-UP at 6 dp, mirroring the kernel's
           -- (s*2e6 + n) // (2n) / 1e6 — double round() can land on the
           -- other side of a tie when s/n is not representable
           CAST((SUM(CASE WHEN ch = 0 THEN val END) * 2000000 + 4 * h)
                // (8 * h) AS DOUBLE) / 1000000.0 AS mean_r,
           CAST((SUM(CASE WHEN ch = 1 THEN val END) * 2000000 + 4 * h)
                // (8 * h) AS DOUBLE) / 1000000.0 AS mean_g,
           CAST((SUM(CASE WHEN ch = 2 THEN val END) * 2000000 + 4 * h)
                // (8 * h) AS DOUBLE) / 1000000.0 AS mean_b
    FROM v GROUP BY media_id, h
    """,
    doc="REAL image decode, exactly oracle-checked: documents' ASCII "
    "bytes are packaged as binary PPM (P6) blobs in-plan, decoded by "
    "the pure-numpy codec (operators/multimodal.py::decode_image — the "
    "same parser that handles on-disk PPM/PGM/BMP24), and reduced to "
    "per-image resolution + exact per-channel means "
    "(multimodal.py::image_stats). Arrow-batched mapInPandas, no "
    "shuffle; the curation screen an image pipeline runs before any "
    "model sees a pixel.",
)
def image_ppm_pixel_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import image_stats

    docs = load_table(spark, sf_dir, "documents")
    h = F.expr("length(text) div 12")
    media = docs.filter(F.length("text") >= 12).select(
        F.col("doc_id").alias("media_id"),
        F.concat(
            F.encode(
                F.concat(
                    F.lit("P6\n4 "), h.cast("string"), F.lit("\n255\n")
                ),
                "UTF-8",
            ),
            F.encode(
                F.expr(
                    "substring(text, 1, 12 * (length(text) div 12))"
                ),
                "UTF-8",
            ),
        ).alias("content"),
    )
    return image_stats(media).select(
        "media_id",
        "format",
        "width",
        "height",
        "n_pixels",
        "mean_r",
        "mean_g",
        "mean_b",
    )


@register(
    "session_funnel_stages",
    oracle="""
    WITH g AS (
      SELECT user_id, event_id, event_type, epoch_us(ts) AS us,
             CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER
                    (PARTITION BY user_id ORDER BY ts, event_id)
                  > 1800000000 THEN 1 ELSE 0 END AS brk
      FROM events),
    s AS (SELECT user_id, event_id, event_type, us,
                 SUM(brk) OVER
                   (PARTITION BY user_id ORDER BY us, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS sess
          FROM g),
    p1 AS (SELECT *,
                  MIN(CASE WHEN event_type = 'signup' THEN us END) OVER
                    (PARTITION BY user_id, sess ORDER BY us, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS min_signup
           FROM s),
    p2 AS (SELECT *,
                  MIN(CASE WHEN event_type = 'click'
                            AND min_signup IS NOT NULL
                            AND min_signup < us THEN us END) OVER
                    (PARTITION BY user_id, sess ORDER BY us, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS min_qclick
           FROM p1)
    SELECT user_id,
           MIN(us) AS session_start_us,
           MAX(us) AS session_end_us,
           COUNT(*) AS n_events,
           CAST(MAX(CASE
             WHEN event_type = 'purchase' AND min_qclick IS NOT NULL
                  AND min_qclick < us THEN 3
             WHEN event_type = 'click' AND min_signup IS NOT NULL
                  AND min_signup < us THEN 2
             WHEN event_type = 'signup' THEN 1
             ELSE 0 END) AS INT) AS max_stage
    FROM p2
    GROUP BY user_id, sess
    """,
    doc="Per-session ordered funnel progression — the batch twin of "
    "streaming/stateful.py::streaming_session_funnel (same strict-"
    "order semantics: each stage counts only strictly LATER than the "
    "previous stage's first qualifying event, sessions split on 30-min "
    "gaps). Two stacked window passes compute running first-signup and "
    "first-qualified-click, so stage assignment is one pass over the "
    "sessionized stream — no per-stage self-joins; all gap arithmetic "
    "in integral epoch-micros on both engines. Plan: ONE "
    "hash(user_id) exchange feeds every window pass AND the final "
    "(user, session) aggregate (hash(user_id) satisfies the "
    "(user_id, sess) clustered distribution), so the whole funnel is "
    "a single shuffle at any scale.",
)
def session_funnel_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    wu = Window.partitionBy("user_id").orderBy("ts", "event_id")
    brk = F.when(us - F.lag(us).over(wu) > 1_800_000_000, 1).otherwise(0)
    run = Window.partitionBy("user_id").orderBy(
        "us", "event_id"
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    s = (
        ev.select("user_id", "event_id", "event_type", us.alias("us"),
                  brk.alias("brk"))
        .withColumn("sess", F.sum("brk").over(run))
    )
    ws = Window.partitionBy("user_id", "sess").orderBy(
        "us", "event_id"
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    p1 = s.withColumn(
        "min_signup",
        F.min(
            F.when(F.col("event_type") == "signup", F.col("us"))
        ).over(ws),
    )
    p2 = p1.withColumn(
        "min_qclick",
        F.min(
            F.when(
                (F.col("event_type") == "click")
                & F.col("min_signup").isNotNull()
                & (F.col("min_signup") < F.col("us")),
                F.col("us"),
            )
        ).over(ws),
    )
    stage = (
        F.when(
            (F.col("event_type") == "purchase")
            & F.col("min_qclick").isNotNull()
            & (F.col("min_qclick") < F.col("us")),
            3,
        )
        .when(
            (F.col("event_type") == "click")
            & F.col("min_signup").isNotNull()
            & (F.col("min_signup") < F.col("us")),
            2,
        )
        .when(F.col("event_type") == "signup", 1)
        .otherwise(0)
    )
    return (
        p2.withColumn("stg", stage)
        .groupBy("user_id", "sess")
        .agg(
            F.min("us").alias("session_start_us"),
            F.max("us").alias("session_end_us"),
            F.count(F.lit(1)).alias("n_events"),
            F.max("stg").cast("int").alias("max_stage"),
        )
        .select(
            "user_id", "session_start_us", "session_end_us",
            "n_events", "max_stage",
        )
    )


@register(
    "multi_touch_attribution_decay",
    oracle="""
    WITH j AS (
      SELECT e.event_id AS click_id, p.event_id AS purchase_id,
             round(p.value, 6) AS value,
             CAST((epoch_us(p.ts) - epoch_us(e.ts)) // 600000000
                  AS INT) AS k
      FROM events e JOIN events p
        ON p.user_id = e.user_id
       AND e.event_type = 'click' AND p.event_type = 'purchase'
       AND p.ts >= e.ts AND p.ts <= e.ts + INTERVAL 1 HOUR),
    w AS (SELECT click_id, purchase_id, value,
                 1.0 / CAST(1 << k AS DOUBLE) AS wt
          FROM j),
    s AS (SELECT click_id, value, wt,
                 SUM(wt) OVER (PARTITION BY purchase_id) AS sw
          FROM w)
    SELECT click_id,
           COUNT(*)::BIGINT AS n_purchases_touched,
           round(CAST(SUM(CAST(round(wt / sw, 6) AS DECIMAL(27,6)))
                      AS DOUBLE), 6) AS credit,
           CAST(SUM(CAST(round(value * (wt / sw), 6) AS DECIMAL(27,6)))
                AS DOUBLE) AS attributed_revenue
    FROM s GROUP BY click_id
    """,
    doc="TIME-DECAY multi-touch attribution: each purchase's credit and "
    "revenue split across its preceding-hour clicks with a 10-minute "
    "half-life — recent touches weigh more (the recency sibling of "
    "multi_touch_attribution_linear). Cross-engine exactness by "
    "CONSTRUCTION, not luck: decay buckets are integral (age div 10 "
    "min, k in 0..6), weights are exact binary fractions 2^-k via a "
    "bit shift (no pow/exp2 — transcendental libraries differ in the "
    "last ulp across engines), the per-purchase weight sum is exact in "
    "a double (tiny mantissa span), so every share is one correctly-"
    "rounded division of identical operands on both engines; shares "
    "are then 6-dp rounded and decimal(27,6)-summed, order-"
    "independent. Same interval-join + per-purchase window shape as "
    "the linear form.",
)
def multi_touch_attribution_decay(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql.window import Window

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
    ).join(purchases.select("purchase_id", "pvalue"), "purchase_id")
    # the interval join exposes the two sides as event_ts / order_ts
    k = F.floor(
        (F.unix_micros(F.col("order_ts")) - F.unix_micros(F.col("event_ts")))
        / F.lit(600_000_000)
    ).cast("int")
    w = Window.partitionBy("purchase_id")
    shares = (
        j.withColumn("k", k)
        # shiftleft needs a column shift amount -> expr form; the weight
        # stays an exact binary fraction 2^-k (no pow/exp2)
        .withColumn(
            "wt", F.lit(1.0) / F.expr("shiftleft(1, k)").cast("double")
        )
        .withColumn("sw", F.sum("wt").over(w))
        .withColumn("share", F.col("wt") / F.col("sw"))
    )
    return (
        shares.groupBy(F.col("event_id").alias("click_id"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_purchases_touched"),
            F.round(
                F.sum(
                    F.round(F.col("share"), 6).cast("decimal(27,6)")
                ).cast("double"),
                6,
            ).alias("credit"),
            F.sum(
                F.round(F.col("pvalue") * F.col("share"), 6).cast(
                    "decimal(27,6)"
                )
            )
            .cast("double")
            .alias("attributed_revenue"),
        )
    )
