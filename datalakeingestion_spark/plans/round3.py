"""Round-3 additions: SCD2 history, streaming-dedup batch twin.

Same contract as the other plan modules: oracle SQL is generated from the
same constants as the Spark plan, every aggregate/computed column aliased
identically on both sides, floats rounded at the same points.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.fixtures import load_table
from .llm import TOKS_SQL
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
