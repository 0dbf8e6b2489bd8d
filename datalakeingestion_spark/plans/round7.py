"""Round-7 queries: quantile-SKETCH drift monitoring.

`ks_drift_windowed_grid` bounds its error by the reference's largest
bin mass — a GRID choice made at deployment time. The bottom-k sample
sketch (streaming/drift.py::reference_sample / windowed_ks_sample)
bounds error by SKETCH SIZE instead: a deterministic, mergeable uniform
row sample (k smallest md5-prefix hashes of the row id) whose empirical
CDF carries the DKW guarantee ~sqrt(ln(2/δ)/2k). Bottom-k is chosen
over GK/KLL deliberately: those sketches' outputs depend on merge
order, which no cross-engine value-hash oracle can pin; bottom-k is
exactly reproducible in ANSI SQL (md5 + ROW_NUMBER) at the cost of
k = O(1/ε²) instead of O(1/ε).

The batch query here IS the streaming monitor's code path (same
function, one stateful aggregation + stateless array tail), so the
oracle-checked rows double as the stream/batch agreement contract
(tests/test_streaming.py pins the streaming half).

Reference pendant: none — greenfield training-pipeline operator
(SURVEY.md §2 beyond-reference set).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.buckets import epoch_bucket
from ..sources.fixtures import load_table
from .registry import register

_K = 64
_CAP = 1 << 58  # ~25% of the 2^60 hash space survives into window state

_KS_SAMPLED_ORACLE = f"""
    WITH pts AS (
      SELECT ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15))::BIGINT
               AS h,
             CAST(value AS DOUBLE) AS v,
             CAST(floor(epoch(ts)) AS BIGINT) // 604800 AS wk
      FROM events WHERE value IS NOT NULL),
    wc AS (SELECT wk, COUNT(*) AS n_events FROM pts GROUP BY 1),
    surv AS (SELECT wk, v,
                    ROW_NUMBER() OVER (PARTITION BY wk ORDER BY h, v) AS rn
             FROM pts WHERE h < {_CAP}),
    ws AS (SELECT wk, v FROM surv WHERE rn <= {_K}),
    m AS (SELECT wk, COUNT(*) AS m FROM ws GROUP BY 1),
    w0 AS (SELECT MIN(wk) AS w0 FROM pts),
    rs AS (SELECT v FROM (
             SELECT v, ROW_NUMBER() OVER (ORDER BY h, v) AS rn
             FROM pts, w0 WHERE wk < w0.w0 + 2) WHERE rn <= {_K}),
    rcnt AS (SELECT COUNT(*) AS r FROM rs),
    up AS (
      SELECT wk, v, 1 AS is_s, 0 AS is_r FROM ws
      UNION ALL
      SELECT wc.wk, rs.v, 0, 1 FROM wc CROSS JOIN rs),
    cum AS (SELECT wk, v,
              SUM(is_s) OVER (PARTITION BY wk ORDER BY v
                RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cs,
              SUM(is_r) OVER (PARTITION BY wk ORDER BY v
                RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cr
            FROM up),
    ks AS (SELECT cum.wk,
                  MAX(round(abs(cum.cs / CAST(m.m AS DOUBLE)
                              - cum.cr / CAST(rcnt.r AS DOUBLE)), 6))
                    AS ks_sample
           FROM cum JOIN m ON m.wk = cum.wk CROSS JOIN rcnt
           GROUP BY 1)
    SELECT (wc.wk * 604800)::BIGINT AS window_start_s,
           wc.n_events::BIGINT AS n_events,
           COALESCE(m.m, 0)::BIGINT AS n_sample,
           ks.ks_sample AS ks_sample
    FROM wc
    LEFT JOIN m ON m.wk = wc.wk
    LEFT JOIN ks ON ks.wk = wc.wk
"""


@register(
    "ks_drift_sampled",
    oracle=_KS_SAMPLED_ORACLE,
    doc="Per-epoch-week two-sample KS distance of the event value "
    "distribution vs a first-two-weeks reference, both as bottom-k "
    "hash samples (k=64, cap 2^58) — the quantile-sketch monitor whose "
    "error is bounded by sketch size (DKW), not by a histogram grid. "
    "One stateful aggregation + stateless array tail, so the identical "
    "code runs on a stream (agreement pinned in tests/test_streaming).",
)
def ks_drift_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.drift import reference_sample, windowed_ks_sample

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull()
    )
    wk = epoch_bucket("ts", 604800)
    w0 = ev.agg(F.min(wk).alias("w")).first()["w"]
    ref = reference_sample(
        ev.filter(wk < F.lit((w0 or 0) + 2)), "value", "event_id", k=_K
    )
    return windowed_ks_sample(
        ev, ref, "value", "ts", "event_id", k=_K, hash_cap=_CAP
    )


_QUANTILES_ORACLE = """
    WITH pts AS (
      SELECT l_returnflag AS returnflag,
             CAST(l_extendedprice AS DOUBLE) AS v,
             ('0x' || substr(md5(CAST(l_orderkey AS VARCHAR) || '_' ||
                 CAST(l_linenumber AS VARCHAR)), 1, 15))::BIGINT AS h
      FROM lineitem WHERE l_extendedprice IS NOT NULL),
    n AS (SELECT returnflag, COUNT(*) AS n FROM pts GROUP BY 1),
    ts AS (SELECT t FROM range(1, 10) AS r(t)),
    srt AS (SELECT returnflag, v,
                   ROW_NUMBER() OVER (PARTITION BY returnflag ORDER BY v)
                     AS rs
            FROM pts),
    exact AS (SELECT s.returnflag, ts.t, MIN(s.v) AS exact_price
              FROM srt s JOIN n USING (returnflag) CROSS JOIN ts
              WHERE s.rs = (ts.t * n.n + 9) // 10
              GROUP BY 1, 2),
    samp AS (SELECT returnflag, v,
                    ROW_NUMBER() OVER (PARTITION BY returnflag
                                       ORDER BY h, v) AS rn
             FROM pts),
    ws AS (SELECT returnflag, v FROM samp WHERE rn <= 256),
    m AS (SELECT returnflag, COUNT(*) AS m FROM ws GROUP BY 1),
    ssrt AS (SELECT returnflag, v,
                    ROW_NUMBER() OVER (PARTITION BY returnflag ORDER BY v)
                      AS rs
             FROM ws),
    est AS (SELECT s.returnflag, ts.t, MIN(s.v) AS est_price
            FROM ssrt s JOIN m USING (returnflag) CROSS JOIN ts
            WHERE s.rs = GREATEST(1, (ts.t * m.m + 9) // 10)
            GROUP BY 1, 2)
    SELECT e.returnflag AS returnflag,
           e.t / 10.0 AS q,
           est.est_price AS est_price,
           e.exact_price AS exact_price,
           round(abs(est.est_price - e.exact_price), 6) AS abs_err
    FROM exact e
    JOIN est ON est.returnflag = e.returnflag AND est.t = e.t
"""


@register(
    "price_quantiles_sketched",
    oracle=_QUANTILES_ORACLE,
    doc="Per-return-flag decile order statistics of l_extendedprice, "
    "EXACT (rank-selection over the distinct-value histogram through "
    "keyed_prefix_sum — no per-key window task) beside the bottom-k "
    "sketch estimate (k=256, DKW rank error), with the measured "
    "absolute error in the same row. Integer rank arithmetic "
    "((t*n+9) div 10) on both engines — float ceil(q*n) disagrees "
    "at exact multiples.",
)
def price_quantiles_sketched(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.hashing import portable_hash60
    from ..operators.quantiles import (
        exact_quantiles_by_key,
        sampled_quantiles_by_key,
    )

    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("returnflag"),
        F.col("l_extendedprice").alias("price"),
        "l_orderkey",
        "l_linenumber",
    )
    h = portable_hash60(
        F.concat_ws(
            "_",
            F.col("l_orderkey").cast("string"),
            F.col("l_linenumber").cast("string"),
        )
    )
    exact = exact_quantiles_by_key(li, ["returnflag"], "price")
    est = sampled_quantiles_by_key(li, ["returnflag"], h, "price", k=256)
    return est.join(exact, ["returnflag", "q"]).select(
        "returnflag",
        "q",
        F.col("est").alias("est_price"),
        F.col("value").alias("exact_price"),
        F.round(F.abs(F.col("est") - F.col("value")), 6).alias("abs_err"),
    )


_WQ_ORACLE = f"""
    WITH pts AS (
      SELECT ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15))::BIGINT
               AS h,
             CAST(value AS DOUBLE) AS v,
             CAST(floor(epoch(ts)) AS BIGINT) // 604800 AS wk
      FROM events WHERE value IS NOT NULL),
    wc AS (SELECT wk, COUNT(*) AS n_events FROM pts GROUP BY 1),
    surv AS (SELECT wk, v,
                    ROW_NUMBER() OVER (PARTITION BY wk ORDER BY h, v) AS rn
             FROM pts WHERE h < {_CAP}),
    ws AS (SELECT wk, v FROM surv WHERE rn <= {_K}),
    m AS (SELECT wk, COUNT(*) AS m FROM ws GROUP BY 1),
    ssrt AS (SELECT wk, v,
                    ROW_NUMBER() OVER (PARTITION BY wk ORDER BY v) AS rs
             FROM ws),
    ts AS (SELECT t FROM range(1, 10) AS r(t)),
    est AS (SELECT s.wk, ts.t, MIN(s.v) AS est
            FROM ssrt s JOIN m ON m.wk = s.wk CROSS JOIN ts
            WHERE s.rs = GREATEST(1, (ts.t * m.m + 9) // 10)
            GROUP BY 1, 2)
    SELECT (wc.wk * 604800)::BIGINT AS window_start_s,
           wc.n_events::BIGINT AS n_events,
           COALESCE(m.m, 0)::BIGINT AS n_sample,
           ts.t / 10.0 AS q,
           est.est AS est
    FROM wc
    CROSS JOIN ts
    LEFT JOIN m ON m.wk = wc.wk
    LEFT JOIN est ON est.wk = wc.wk AND est.t = ts.t
"""


@register(
    "event_value_quantiles_windowed",
    oracle=_WQ_ORACLE,
    doc="Per-epoch-week decile ESTIMATES of the event value from the "
    "bottom-k sample sketch — the streaming 'track p10..p90 of a live "
    "metric' monitor (streaming/drift.py::windowed_quantile_sample). "
    "Same one-stateful-aggregation + array-tail shape as "
    "ks_drift_sampled, so the identical code runs on a watermarked "
    "stream; integer rank arithmetic matches "
    "operators/quantiles.sampled_quantiles_by_key exactly.",
)
def event_value_quantiles_windowed(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..streaming.drift import windowed_quantile_sample

    ev = load_table(spark, sf_dir, "events")
    return windowed_quantile_sample(
        ev, "value", "ts", "event_id", k=_K, hash_cap=_CAP
    )


_WAU_ORACLE = f"""
    WITH pts AS (
      SELECT ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT
               AS h,
             CAST(floor(epoch(ts)) AS BIGINT) // 604800 AS wk
      FROM events WHERE user_id IS NOT NULL),
    wc AS (SELECT wk, COUNT(*) AS n_events FROM pts GROUP BY 1),
    surv AS (SELECT wk, COUNT(DISTINCT h) AS c
             FROM pts WHERE h < {_CAP} GROUP BY 1)
    SELECT (wc.wk * 604800)::BIGINT AS window_start_s,
           wc.n_events::BIGINT AS n_events,
           COALESCE(surv.c, 0)::BIGINT AS n_under_cap,
           round(COALESCE(surv.c, 0) * {float((1 << 60) / _CAP)}, 4)
             AS est_distinct
    FROM wc LEFT JOIN surv ON surv.wk = wc.wk
"""


@register(
    "weekly_active_users_sampled",
    oracle=_WAU_ORACLE,
    doc="Per-epoch-week distinct-user ESTIMATE with bounded streaming "
    "state (streaming/drift.py::windowed_distinct_sample): keep only "
    "the distinct user-id hashes under a fixed threshold (Gibbons "
    "distinct sampling / fixed-theta KMV), estimate D = survivors x "
    "2^60/cap — relative error ~1/sqrt(survivors), state bounded by "
    "the cap knob where exact windowed count-distinct is unbounded. "
    "Same one-stateful-aggregation shape as the sample monitors; "
    "identical code runs on a watermarked stream.",
)
def weekly_active_users_sampled(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..streaming.drift import windowed_distinct_sample

    ev = load_table(spark, sf_dir, "events")
    return windowed_distinct_sample(
        ev, "user_id", "ts", hash_cap=_CAP
    )
