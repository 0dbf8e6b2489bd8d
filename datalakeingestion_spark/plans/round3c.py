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
        F.expr(f"cast(ts as long) div {_DAY}").alias("day"),
    )
    cohort = (
        d.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.expr("min(day) div 7").alias("cohort_wk"))
    )
    activity = d.select(
        "user_id", F.expr("day div 7").alias("wk")
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
