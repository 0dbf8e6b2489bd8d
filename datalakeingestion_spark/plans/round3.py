"""Round-3 additions: SCD2 history, streaming-dedup batch twin.

Same contract as the other plan modules: oracle SQL is generated from the
same constants as the Spark plan, every aggregate/computed column aliased
identically on both sides, floats rounded at the same points.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.fixtures import load_table
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
