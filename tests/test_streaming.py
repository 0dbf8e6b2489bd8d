from __future__ import annotations

import pytest

import glob
import os

from pyspark.sql import functions as F

from datalakeingestion_spark.config.partition_spec import PartitionSpec
from datalakeingestion_spark.sources.fixtures import load_table
from datalakeingestion_spark.streaming.incremental import (
    stream_ingest_available_now,
    windowed_event_counts,
)

from .conftest import SF_SMALL


@pytest.mark.smoke
def test_available_now_ingest_and_restart(spark, tmp_path):
    events = load_table(spark, SF_SMALL, "events")
    src = str(tmp_path / "landing")
    target = str(tmp_path / "lake")
    ckpt = str(tmp_path / "ckpt")

    first = events.filter(F.col("ts") < "2024-01-15")
    first.write.parquet(src)
    schema = first.schema

    q = stream_ingest_available_now(
        spark, src, schema, target, ckpt,
        PartitionSpec("ts", "time-based", "YYYYMMDD"),
    )
    q.awaitTermination(120)
    lake = spark.read.parquet(target)
    assert lake.count() == first.count()
    assert any("ts_part=202401" in f for f in glob.glob(target + "/*"))

    # second batch of files → only the new ones are processed (checkpointed
    # offsets = the watermark store)
    second = events.filter(F.col("ts") >= "2024-01-15")
    second.write.mode("append").parquet(src)
    q2 = stream_ingest_available_now(
        spark, src, schema, target, ckpt,
        PartitionSpec("ts", "time-based", "YYYYMMDD"),
    )
    q2.awaitTermination(120)
    lake = spark.read.parquet(target)
    assert lake.count() == events.count()
    assert lake.select("event_id").distinct().count() == events.count()


def test_windowed_counts_streaming_matches_batch(spark, tmp_path):
    events = load_table(spark, SF_SMALL, "events")
    src = str(tmp_path / "stream_src")
    events.write.parquet(src)

    batch = windowed_event_counts(events, window="1 hour").orderBy(
        "window_start", "event_type"
    )
    stream = spark.readStream.schema(events.schema).parquet(src)
    agg = windowed_event_counts(stream, window="1 hour", watermark="2 hours")
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("win_counts")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["window_start"], r["event_type"]): r["n_events"]
        for r in spark.sql("SELECT * FROM win_counts").collect()
    }
    want = {
        (r["window_start"], r["event_type"]): r["n_events"]
        for r in batch.collect()
    }
    assert got == want and len(want) > 0


def test_stateful_latest_rows_across_batches(spark, tmp_path):
    """Streaming latest-row dedup must converge to the batch latest_rows
    result, with state carrying across micro-batches (second batch only
    updates keys whose winner changed)."""
    from datalakeingestion_spark.operators.relational import latest_rows
    from datalakeingestion_spark.streaming.stateful import streaming_latest_rows

    events = load_table(spark, SF_SMALL, "events")
    src = str(tmp_path / "stream_in")
    # two files → two micro-batches within one availableNow run
    events.filter(F.col("ts") < "2024-01-15").write.parquet(src)
    events.filter(F.col("ts") >= "2024-01-15").write.mode("append").parquet(src)

    reader = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    out = streaming_latest_rows(reader)
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("latest_state")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got_df = spark.sql("SELECT * FROM latest_state")
    # memory sink in update mode appends each emission; the LAST emission
    # per key is the final winner
    import pandas as pd

    emitted = got_df.toPandas()
    final = emitted.groupby("user_id").tail(1)
    got = {int(r.user_id): int(r.event_id) for r in final.itertuples()}
    want = {
        r["user_id"]: r["event_id"]
        for r in latest_rows(events, ["user_id"], "ts", ["event_id"]).collect()
    }
    assert got == want
    # state actually carried across batches: total emissions are bounded by
    # (keys × batches) but at least one key emitted twice (winner changed)
    assert len(emitted) > len(want)


def test_streaming_dedup_exact_drops_redeliveries(spark, tmp_path):
    from datalakeingestion_spark.streaming.incremental import streaming_dedup_exact

    events = load_table(spark, SF_SMALL, "events").limit(200)
    src = str(tmp_path / "dup_src")
    # deliver the same 200 events twice (two files → two micro-batches)
    events.write.parquet(src)
    events.write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    out = streaming_dedup_exact(stream, watermark="365 days")
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = spark.sql("SELECT count(*) n, count(DISTINCT event_id) d FROM dedup_out").first()
    assert got["n"] == got["d"] == 200  # re-deliveries dropped across batches


def test_session_window_streaming_matches_batch(spark, tmp_path):
    """session_window on a stream (with watermark) converges to the batch
    sessionization for fully-arrived data."""
    from datalakeingestion_spark.plans.registry import REGISTRY, _ensure_loaded

    _ensure_loaded()
    events = load_table(spark, SF_SMALL, "events")
    src = str(tmp_path / "sess_src")
    events.write.parquet(src)

    batch = REGISTRY["t8_session_window_counts"].fn(spark, SF_SMALL)
    want = {
        (r["user_id"], r["session_start"]): r["n_events"] for r in batch.collect()
    }

    stream = spark.readStream.schema(events.schema).parquet(src)
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            "n_events",
        )
    )
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("sess_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r["user_id"], r["session_start"]): r["n_events"]
        for r in spark.sql("SELECT * FROM sess_out").collect()
    }
    assert got == want and len(want) > 100


def test_interval_join_streaming_matches_batch(spark, tmp_path):
    """Stream-stream interval join (both sides watermarked, time-bounded
    condition → GC-able join state) must equal the batch range join."""
    from datalakeingestion_spark.streaming.incremental import (
        interval_join_events_orders,
    )

    events = load_table(spark, SF_SMALL, "events").select(
        "user_id", "event_id", "ts"
    )
    # deterministic synthetic orders stream derived from events: each user
    # places an order 30 minutes after every 3rd event
    orders = (
        events.filter(F.col("event_id") % 3 == 0)
        .select(
            F.col("user_id").alias("o_custkey"),
            (F.col("event_id") + 1_000_000).alias("o_orderkey"),
            (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("o_orderdate"),
        )
    )
    ev_src, od_src = str(tmp_path / "ev"), str(tmp_path / "od")
    events.write.parquet(ev_src)
    orders.write.parquet(od_src)

    batch = interval_join_events_orders(events, orders, within="2 hours")
    want = {
        (r["event_id"], r["o_orderkey"]) for r in batch.collect()
    }
    assert len(want) > 0

    ev_s = spark.readStream.schema(events.schema).parquet(ev_src)
    od_s = spark.readStream.schema(orders.schema).parquet(od_src)
    joined = interval_join_events_orders(
        ev_s, od_s, within="2 hours", watermark="4 hours"
    )
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName("ij")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["event_id"], r["o_orderkey"])
        for r in spark.sql("SELECT * FROM ij").collect()
    }
    assert got == want


def test_interval_join_left_outer_streaming_matches_batch(spark, tmp_path):
    """Stream-stream LEFT OUTER interval join: unmatched events must be
    emitted (with null order columns) once the watermark passes their join
    horizon — equal to the batch left join over the same data."""
    import time as _time

    from datalakeingestion_spark.streaming.incremental import (
        interval_join_events_orders,
    )

    events = load_table(spark, SF_SMALL, "events").select(
        "user_id", "event_id", "ts"
    )
    orders = (
        events.filter(F.col("event_id") % 3 == 0)
        .select(
            F.col("user_id").alias("o_custkey"),
            (F.col("event_id") + 1_000_000).alias("o_orderkey"),
            (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("o_orderdate"),
        )
    )
    batch = interval_join_events_orders(
        events, orders, within="2 hours", how="left_outer"
    )
    want = {(r["event_id"], r["o_orderkey"]) for r in batch.collect()}
    unmatched = {e for e, o in want if o is None}
    assert unmatched, "fixture must produce some unmatched events"

    ev_src, od_src = str(tmp_path / "ev"), str(tmp_path / "od")
    events.write.parquet(ev_src)
    orders.write.parquet(od_src)
    # two sentinel events far past every real row, written with strictly
    # later mtimes: with maxFilesPerTrigger=1 each lands in its own later
    # micro-batch. Sentinel 1 advances the watermark past all real events'
    # join horizon; the batch processing sentinel 2 applies that watermark
    # and flushes the buffered outer rows (watermark_N is computed from
    # batch N-1's data — without a following batch nothing is evicted).
    max_ts = events.agg(F.max("ts")).collect()[0][0]
    for bump in (1, 2):
        _time.sleep(1.2)
        spark.createDataFrame(
            [(-bump, -bump, max_ts)], "user_id long, event_id long, ts timestamp"
        ).withColumn("ts", F.col("ts") + F.expr(f"INTERVAL {30 + bump} DAYS")
        ).coalesce(1).write.mode("append").parquet(ev_src)
    # eviction is gated on the GLOBAL watermark = min over both inputs, so
    # the ORDERS stream needs a far-future row too — otherwise its
    # watermark pins the state horizon ~4h behind the last real order and
    # the tail events' outer rows are never flushed
    spark.createDataFrame(
        [(-1, -1, max_ts)], "o_custkey long, o_orderkey long, o_orderdate timestamp"
    ).withColumn(
        "o_orderdate", F.col("o_orderdate") + F.expr("INTERVAL 40 DAYS")
    ).coalesce(1).write.mode("append").parquet(od_src)

    ev_s = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(ev_src)
    )
    od_s = spark.readStream.schema(orders.schema).parquet(od_src)
    joined = interval_join_events_orders(
        ev_s, od_s, within="2 hours", watermark="4 hours", how="left_outer"
    )
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName("ij_outer")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r["event_id"], r["o_orderkey"])
        for r in spark.sql("SELECT * FROM ij_outer").collect()
        if r["event_id"] >= 0  # drop watermark sentinels
    }
    assert got == want


def test_stream_upsert_maintains_latest_zone(spark, tmp_path):
    """Streaming CDC upsert: two file drops drained by availableNow runs
    must leave the latest zone equal to the batch latest-row view over
    ALL data; re-draining with the same checkpoint changes nothing."""
    from datalakeingestion_spark.operators.relational import latest_rows
    from datalakeingestion_spark.streaming.incremental import (
        stream_upsert_available_now,
    )

    events = load_table(spark, SF_SMALL, "events").select(
        "user_id", "event_id", "ts"
    )
    src = str(tmp_path / "src")
    latest = str(tmp_path / "latest")
    ckpt = str(tmp_path / "ckpt")
    b1 = events.filter(F.col("ts") < "2024-01-15")
    b2 = events.filter(F.col("ts") >= "2024-01-15")
    b1.write.parquet(src)

    def drain():
        q = stream_upsert_available_now(
            spark, src, events.schema, latest, ckpt,
            ["user_id"], "ts", ["event_id"],
        )
        q.awaitTermination(120)

    drain()
    n1 = spark.read.parquet(latest).count()
    assert n1 == b1.select("user_id").distinct().count()

    b2.coalesce(2).write.mode("append").parquet(src)
    drain()
    got = {
        r["user_id"]: r["event_id"]
        for r in spark.read.parquet(latest).collect()
    }
    want = {
        r["user_id"]: r["event_id"]
        for r in latest_rows(events, ["user_id"], "ts", ["event_id"]).collect()
    }
    assert got == want

    drain()  # nothing new: idempotent
    got2 = {
        r["user_id"]: r["event_id"]
        for r in spark.read.parquet(latest).collect()
    }
    assert got2 == want


def test_derived_table_streams_lake_appends_exactly_once(spark, tmp_path):
    """bronze→silver: a derived table maintained by streaming the lake dir
    sees each ingested batch exactly once; re-running with the same
    checkpoint after a new ingest commit drains ONLY the new rows."""
    from datalakeingestion_spark.config.partition_spec import PartitionSpec  # noqa: F401
    from datalakeingestion_spark.ingest.pipeline import IncrementalIngestJob
    from datalakeingestion_spark.ingest.watermark import ExecutionLog
    from datalakeingestion_spark.streaming.incremental import (
        stream_derived_table_available_now,
    )

    events = load_table(spark, SF_SMALL, "events")
    lake = str(tmp_path / "lake")
    silver = str(tmp_path / "silver")
    ckpt = str(tmp_path / "ckpt")
    log = ExecutionLog(spark, str(tmp_path / "log"))

    def ingest(**kw):
        return IncrementalIngestJob(
            spark=spark, ingestion_id=1, source=events, delta_field="ts",
            target_location=lake, log=log, **kw,
        ).run()

    r1 = ingest(end_value_cap="2024-01-15 00:00:00")
    schema = spark.read.parquet(lake).schema

    def transform(df):
        return df.filter(F.col("event_type") == "view").select(
            "event_id", "user_id", "ts"
        )

    def drain():
        q = stream_derived_table_available_now(
            spark, lake, schema, silver, ckpt, transform
        )
        q.awaitTermination(120)

    drain()
    lake_df = spark.read.parquet(lake)
    expect1 = lake_df.filter(F.col("event_type") == "view").count()
    assert spark.read.parquet(silver).count() == expect1
    assert r1.source_count > 0

    # second commit: re-drain picks up ONLY the new files
    ingest()
    drain()
    expect2 = (
        spark.read.parquet(lake)
        .filter(F.col("event_type") == "view")
        .count()
    )
    got = spark.read.parquet(silver)
    assert got.count() == expect2
    # exactly-once: no duplicated event_ids across the two drains
    assert got.select("event_id").distinct().count() == expect2


def test_streaming_dedup_within_watermark_catches_restamped_retries(spark, tmp_path):
    """An at-least-once source that re-stamps event time on retry defeats
    exact dedup (different ts ⇒ different row) — the within-watermark
    variant drops the re-delivery anyway and GC's key state after the
    delay."""
    from datalakeingestion_spark.streaming.incremental import (
        streaming_dedup_within_watermark,
    )

    events = load_table(spark, SF_SMALL, "events").limit(100)
    src = str(tmp_path / "drift_src")
    events.write.parquet(src)
    # retry delivery: same event_ids, event time re-stamped +30 s
    events.withColumn("ts", F.col("ts") + F.expr("INTERVAL 30 SECONDS")).write.mode(
        "append"
    ).parquet(src)

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    out = streaming_dedup_within_watermark(stream, watermark="10 minutes")
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_wm_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = spark.sql(
        "SELECT count(*) n, count(DISTINCT event_id) d FROM dedup_wm_out"
    ).first()
    assert got["n"] == got["d"] == 100

    # batch fallback: earliest-arrival-wins per key
    doubled = events.unionByName(
        events.withColumn("ts", F.col("ts") + F.expr("INTERVAL 30 SECONDS"))
    )
    batch = streaming_dedup_within_watermark(doubled)
    assert batch.count() == 100
    # every surviving row carries the ORIGINAL (earliest) timestamp
    orig = {(r["event_id"], r["ts"]) for r in events.select("event_id", "ts").collect()}
    kept = {(r["event_id"], r["ts"]) for r in batch.select("event_id", "ts").collect()}
    assert kept == orig


def test_stream_dedup_lsh_rejects_lake_and_batch_dups(spark, tmp_path):
    """Streaming dedup-at-the-door: batch 2 docs that near/exact-duplicate
    already-accepted lake docs (or each other) are rejected; only novel
    docs land, and the persisted band index grows with them."""
    from datalakeingestion_spark.streaming.incremental import (
        stream_dedup_lsh_available_now,
    )

    def text(seed: str) -> str:
        return " ".join(f"{seed}tok{j}" for j in range(40))

    src = str(tmp_path / "src")
    lake = str(tmp_path / "lake")
    idx = str(tmp_path / "idx")
    ckpt = str(tmp_path / "ckpt")
    schema = "doc_id LONG, text STRING"

    b1 = spark.createDataFrame(
        [(i, text(f"d{i}")) for i in range(1, 11)], schema
    )
    b1.write.parquet(src)

    def drain():
        q = stream_dedup_lsh_available_now(
            spark, src, b1.schema, lake, idx, ckpt, threshold=0.5
        )
        q.awaitTermination(180)

    drain()
    assert {r.doc_id for r in spark.read.parquet(lake).collect()} == set(
        range(1, 11)
    )

    near1 = text("d1").rsplit(" ", 2)[0] + " changed tokens"  # ~0.9 jaccard
    near13 = text("d13").rsplit(" ", 2)[0] + " other tail"
    b2 = spark.createDataFrame(
        [
            (11, near1),          # near-dup of lake doc 1 -> reject
            (12, text("d2")),     # exact dup of lake doc 2 -> reject
            (13, text("d13")),    # novel -> accept
            (14, text("d13")),    # exact dup within batch -> reject
            (15, near13),         # near-dup of batch doc 13 -> reject
        ],
        schema,
    )
    b2.coalesce(1).write.mode("append").parquet(src)
    drain()

    got = {r.doc_id for r in spark.read.parquet(lake).collect()}
    assert got == set(range(1, 11)) | {13}
    # index covers exactly the accepted docs (4 bands each)
    idx_rows = spark.read.parquet(idx).collect()
    assert {r.doc_id for r in idx_rows} == got
    assert len(idx_rows) == len(got) * 4


def test_stream_dedup_lsh_epoch_replay_is_lossless(spark, tmp_path):
    """Checkpoint loss forces the first epoch to be reprocessed while the
    lake/index already contain that epoch's output — the replay must NOT
    probe its own previous attempt (a batch doc would self-match and the
    epoch would rewrite empty). Final lake must equal the first drain."""
    import shutil

    from datalakeingestion_spark.streaming.incremental import (
        stream_dedup_lsh_available_now,
    )

    def text(seed: str) -> str:
        return " ".join(f"{seed}tok{j}" for j in range(40))

    src = str(tmp_path / "src")
    lake = str(tmp_path / "lake")
    idx = str(tmp_path / "idx")
    ckpt = str(tmp_path / "ckpt")
    b1 = spark.createDataFrame(
        [(i, text(f"d{i}")) for i in range(1, 6)]
        + [(6, text("d1"))],  # within-batch exact dup of doc 1
        "doc_id LONG, text STRING",
    )
    b1.write.parquet(src)

    def drain():
        q = stream_dedup_lsh_available_now(
            spark, src, b1.schema, lake, idx, ckpt, threshold=0.5
        )
        q.awaitTermination(180)

    drain()
    first = {r.doc_id for r in spark.read.parquet(lake).collect()}
    assert first == {1, 2, 3, 4, 5}

    shutil.rmtree(ckpt)  # lose the checkpoint -> epoch 0 replays
    drain()
    again = {r.doc_id for r in spark.read.parquet(lake).collect()}
    assert again == first


def test_streaming_heavy_hitters_exact_counts(spark, tmp_path):
    """Two drained file batches: tokens whose CUMULATIVE count crosses
    the threshold emit with the exact running count; the final emission
    per token equals the batch groupBy count; cold tokens never emit."""
    from datalakeingestion_spark.streaming.stateful import (
        streaming_heavy_hitters,
    )

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    rows1 = [("hot",)] * 6 + [("warm",)] * 3 + [("cold",)] * 1
    rows2 = [("hot",)] * 4 + [("warm",)] * 2
    spark.createDataFrame(rows1, ["tok"]).write.parquet(src)

    out = str(tmp_path / "out")

    def drain():
        stream = spark.readStream.schema("tok string").parquet(src)

        def sink(batch_df, epoch_id):
            batch_df.write.mode("append").parquet(out)

        q = (
            streaming_heavy_hitters(stream, threshold=5)
            .writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = {}
        for r in spark.read.parquet(out).collect():
            got[r.token] = max(got.get(r.token, 0), r.running_count)
        return got

    got = drain()
    assert got == {"hot": 6}
    spark.createDataFrame(rows2, ["tok"]).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    got = drain()
    assert got == {"hot": 10, "warm": 5}


def test_stream_mv_folds_batches_and_replay_is_idempotent(spark, tmp_path):
    import pyspark.sql.functions as F
    import pyspark.sql.types as T

    from datalakeingestion_spark.operators.mv import aggregate_state
    from datalakeingestion_spark.streaming.incremental import (
        read_mv,
        stream_mv_available_now,
    )

    lake = str(tmp_path / "lake")
    state = str(tmp_path / "mv_state")
    ckpt = str(tmp_path / "ckpt")
    schema = T.StructType(
        [
            T.StructField("k", T.StringType()),
            T.StructField("v", T.DoubleType()),
        ]
    )

    def measures():
        return {"sum_v": F.col("v")}

    def run():
        q = stream_mv_available_now(
            spark, lake, schema, ["k"], measures, state, ckpt
        )
        q.awaitTermination(120)

    b1 = [("a", 1.0), ("a", 2.5), ("b", 10.0)]
    spark.createDataFrame(b1, schema).write.mode("append").parquet(lake)
    run()
    got = {
        r["k"]: (float(r["sum_v"]), r["n_rows"])
        for r in read_mv(spark, state, ["k"]).collect()
    }
    assert got == {"a": (3.5, 2), "b": (10.0, 1)}

    # second batch folds in WITHOUT rescanning the first
    b2 = [("a", 4.0), ("c", 7.0)]
    spark.createDataFrame(b2, schema).write.mode("append").parquet(lake)
    run()
    got = {
        r["k"]: (float(r["sum_v"]), r["n_rows"])
        for r in read_mv(spark, state, ["k"]).collect()
    }
    assert got == {"a": (7.5, 3), "b": (10.0, 1), "c": (7.0, 1)}

    # replayed epoch: rewriting the same epoch dir with the same state
    # must leave the view unchanged (idempotent overwrite, no double fold)
    df1 = spark.createDataFrame(b1, schema)
    aggregate_state(df1, ["k"], measures()).write.mode("overwrite").parquet(
        f"{state}/epoch=0"
    )
    again = {
        r["k"]: (float(r["sum_v"]), r["n_rows"])
        for r in read_mv(spark, state, ["k"]).collect()
    }
    assert again == got

    # no new files -> draining again adds nothing
    run()
    final = {
        r["k"]: (float(r["sum_v"]), r["n_rows"])
        for r in read_mv(spark, state, ["k"]).collect()
    }
    assert final == got


def test_compact_mv_states_preserves_view(spark, tmp_path):
    import pyspark.sql.functions as F

    from datalakeingestion_spark.operators.mv import aggregate_state
    from datalakeingestion_spark.streaming.incremental import (
        compact_mv_states,
        read_mv,
    )

    state = str(tmp_path / "state")
    target = str(tmp_path / "compacted")
    for epoch, rows in enumerate(
        [[("a", 1.0), ("b", 2.0)], [("a", 3.0)], [("b", -2.0), ("c", 9.0)]]
    ):
        df = spark.createDataFrame(rows, "k string, v double")
        aggregate_state(df, ["k"], {"s": F.col("v")}).write.parquet(
            f"{state}/epoch={epoch}"
        )
    before = {
        r["k"]: (float(r["s"]), r["n_rows"])
        for r in read_mv(spark, state, ["k"]).collect()
    }
    compact_mv_states(spark, state, ["k"], target)
    after = {
        r["k"]: (float(r["s"]), r["n_rows"])
        for r in read_mv(spark, target, ["k"]).collect()
    }
    assert after == before == {"a": (4.0, 2), "b": (0.0, 2), "c": (9.0, 1)}


def test_streaming_session_funnel_matches_batch_twin(spark, tmp_path):
    """streaming_session_funnel (applyInPandasWithState, EventTimeTimeout)
    must agree with the batch twin session_funnel_stages on every session
    it emits: sessions closed by a later same-user event emit during the
    data batch; each user's final session emits only once the event-time
    watermark passes last_activity + gap."""
    from datalakeingestion_spark.plans.registry import REGISTRY, _ensure_loaded
    from datalakeingestion_spark.streaming.stateful import (
        streaming_session_funnel,
    )

    _ensure_loaded()
    events = load_table(spark, SF_SMALL, "events")
    src = str(tmp_path / "funnel_src")
    events.coalesce(1).write.parquet(src)

    batch = {
        (r["user_id"], r["session_start_us"]): (
            r["session_end_us"], r["n_events"], r["max_stage"]
        )
        for r in REGISTRY["session_funnel_stages"].fn(spark, SF_SMALL).collect()
    }
    assert len(batch) > 50

    wm_delay_us = 30 * 60 * 1_000_000
    gap_us = 30 * 60 * 1_000_000
    max_us = events.agg(
        F.max(F.unix_micros("ts")).alias("m")
    ).first()["m"]
    wm_ms = (max_us - wm_delay_us) // 1000

    # a user's final session emits only via timeout; earlier sessions
    # emit when the next event closes them inside the data batch
    last_of_user = {}
    for (uid, start), (end, _, _) in batch.items():
        if uid not in last_of_user or start > last_of_user[uid][0]:
            last_of_user[uid] = (start, end)
    expected = {}
    for (uid, start), (end, n, stage) in batch.items():
        is_last = last_of_user[uid][0] == start
        if is_last and not ((end + gap_us) // 1000 + 1 < wm_ms):
            continue  # still open when the stream ran dry
        expected[(uid, start)] = (end, n, stage)
    assert expected and len(expected) < len(batch)

    stream = spark.readStream.schema(events.schema).parquet(src)
    out = streaming_session_funnel(
        stream.withWatermark("ts", "30 minutes"),
        steps=("signup", "click", "purchase"),
        gap_seconds=1800,
    )
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("funnel_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r["user_id"], r["session_start_us"]): (
            r["session_end_us"], r["n_events"], r["max_stage"]
        )
        for r in spark.sql("SELECT * FROM funnel_out").collect()
    }
    assert got == expected
    # funnel semantics sanity: some sessions progress past stage 1 and
    # completion implies all three stages in order
    stages = [v[2] for v in got.values()]
    assert any(s >= 2 for s in stages)


def test_streaming_session_funnel_orders_across_arrow_chunks(spark, tmp_path):
    """The funnel is order-sensitive: a key's micro-batch must be sorted
    GLOBALLY, not per Arrow chunk. With maxRecordsPerBatch=1 every row is
    its own chunk, and the fixture rows are written in reverse time
    order — per-chunk sorting would replay purchase→click→signup and
    stall the funnel at stage 1."""
    from datalakeingestion_spark.streaming.stateful import (
        streaming_session_funnel,
    )

    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "1")
    try:
        rows = [
            # user 1, reverse time order in file order
            (1, "2024-01-01 00:20:00", "purchase", 3),
            (1, "2024-01-01 00:10:00", "click", 2),
            (1, "2024-01-01 00:00:00", "signup", 1),
            # sentinel far in the future: advances the watermark so user
            # 1's session closes via EventTimeTimeout
            (2, "2024-03-01 00:00:00", "view", 4),
        ]
        src = str(tmp_path / "chunk_src")
        spark.createDataFrame(
            rows, "user_id long, ts_s string, event_type string, event_id long"
        ).withColumn("ts", F.col("ts_s").cast("timestamp")).drop(
            "ts_s"
        ).coalesce(1).write.parquet(src)

        stream = spark.readStream.schema(
            "user_id long, event_type string, event_id long, ts timestamp"
        ).parquet(src)
        out = streaming_session_funnel(
            stream.withWatermark("ts", "30 minutes"),
            steps=("signup", "click", "purchase"),
            gap_seconds=1800,
        )
        q = (
            out.writeStream.outputMode("append")
            .format("memory")
            .queryName("funnel_chunks")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = {
            r["user_id"]: r
            for r in spark.sql("SELECT * FROM funnel_chunks").collect()
        }
        assert got[1]["max_stage"] == 3 and got[1]["completed"]
        assert got[1]["n_events"] == 3
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)


def test_streaming_session_funnel_state_survives_restart(spark, tmp_path):
    """Kill the funnel stream mid-data and restart from the checkpoint:
    applyInPandasWithState state (open sessions) must be restored, so a
    session whose events straddle the two runs still closes as ONE
    session with the right n_events/max_stage — and the restarted run's
    output unions with the first run's to exactly the single-run result."""
    import shutil

    from datalakeingestion_spark.plans.registry import (
        REGISTRY,
        _ensure_loaded,
    )
    from datalakeingestion_spark.streaming.stateful import (
        streaming_session_funnel,
    )

    _ensure_loaded()
    events = load_table(spark, SF_SMALL, "events")

    batch = {
        (r["user_id"], r["session_start_us"]): (
            r["session_end_us"], r["n_events"], r["max_stage"]
        )
        for r in REGISTRY["session_funnel_stages"].fn(spark, SF_SMALL).collect()
    }
    # split the stream INSIDE some multi-event session so its state must
    # cross the restart
    spanning = [
        (uid, s, e)
        for (uid, s), (e, n, _) in batch.items()
        if n >= 2 and e > s
    ]
    assert spanning
    uid0, s0, e0 = spanning[0]
    t_us = (s0 + e0) // 2

    src = str(tmp_path / "src")
    os.makedirs(src)
    first = events.filter(F.unix_micros("ts") <= t_us)
    second = events.filter(F.unix_micros("ts") > t_us)
    assert first.count() and second.count()
    half1 = str(tmp_path / "half1")
    first.coalesce(1).write.parquet(half1)
    for f in os.listdir(half1):
        if f.endswith(".parquet"):
            shutil.copy(os.path.join(half1, f), os.path.join(src, "a.parquet"))

    ckpt = str(tmp_path / "ckpt")
    sink = str(tmp_path / "sink")

    def run_once():
        stream = spark.readStream.schema(events.schema).parquet(src)
        out = streaming_session_funnel(
            stream.withWatermark("ts", "30 minutes"),
            steps=("signup", "click", "purchase"),
            gap_seconds=1800,
        )
        q = (
            out.writeStream.outputMode("append")
            .format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    run_once()  # run 1: first half only, then the query stops (the
    # "crash": state lives only in the checkpoint now)

    half2 = str(tmp_path / "half2")
    second.coalesce(1).write.parquet(half2)
    for f in os.listdir(half2):
        if f.endswith(".parquet"):
            shutil.copy(os.path.join(half2, f), os.path.join(src, "b.parquet"))

    run_once()  # run 2: fresh query object, same checkpoint

    got = {
        (r["user_id"], r["session_start_us"]): (
            r["session_end_us"], r["n_events"], r["max_stage"]
        )
        for r in spark.read.parquet(sink).collect()
    }

    # same expected-set derivation as the single-run twin test
    wm_delay_us = 30 * 60 * 1_000_000
    gap_us = 30 * 60 * 1_000_000
    max_us = events.agg(F.max(F.unix_micros("ts")).alias("m")).first()["m"]
    wm_ms = (max_us - wm_delay_us) // 1000
    last_of_user = {}
    for (uid, start), (end, _, _) in batch.items():
        if uid not in last_of_user or start > last_of_user[uid][0]:
            last_of_user[uid] = (start, end)
    expected = {}
    for (uid, start), (end, n, stage) in batch.items():
        is_last = last_of_user[uid][0] == start
        if is_last and not ((end + gap_us) // 1000 + 1 < wm_ms):
            continue
        expected[(uid, start)] = (end, n, stage)

    assert got == expected
    # the spanning session closed as ONE session across the restart
    if (uid0, s0) in expected:
        assert got[(uid0, s0)] == batch[(uid0, s0)]
    # and no session was double-emitted (parquet sink + checkpoint is
    # exactly-once across the restart)
    rows = spark.read.parquet(sink).groupBy(
        "user_id", "session_start_us"
    ).count().filter(F.col("count") > 1)
    assert rows.isEmpty()


def test_windowed_psi_drift_streaming_matches_batch(spark, tmp_path):
    """windowed_psi_drift runs the SAME code streaming and batch: the
    streaming run (watermark + availableNow) must emit, for every window
    the final watermark closed, exactly the batch twin's rows — counts
    and 6-dp PSI contributions identical."""
    from datalakeingestion_spark.streaming.drift import (
        reference_histogram,
        windowed_psi_drift,
    )

    events = load_table(spark, SF_SMALL, "events").filter(
        F.col("value").isNotNull()
    )
    src = str(tmp_path / "psi_src")
    events.coalesce(1).write.parquet(src)

    wk = F.expr("cast(ts as long) div 604800")
    w0 = events.agg(F.min(wk).alias("w")).first()["w"]
    ref = reference_histogram(
        events.filter(wk < F.lit(w0 + 2)), "value", lo=0.0, hi=500.0
    )

    batch = {
        (r["window_start_s"], r["bin"]): (r["n_ref"], r["n_win"],
                                          r["psi_contrib"])
        for r in windowed_psi_drift(
            events, ref, "value", lo=0.0, hi=500.0, window="7 days"
        ).collect()
    }
    assert len(batch) >= 3 * 12

    max_s = events.agg(F.max(F.col("ts").cast("long")).alias("m")).first()["m"]
    wm_s = max_s - 3600  # 1 hour watermark delay
    expected = {
        k: v
        for k, v in batch.items()
        if k[0] + 7 * 86400 < wm_s  # window closed by the final watermark
    }
    assert expected and len(expected) < len(batch)

    stream = spark.readStream.schema(events.schema).parquet(src)
    out = windowed_psi_drift(
        stream.withWatermark("ts", "1 hour"),
        ref,
        "value",
        lo=0.0,
        hi=500.0,
        window="7 days",
    )
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("psi_drift_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r["window_start_s"], r["bin"]): (r["n_ref"], r["n_win"],
                                          r["psi_contrib"])
        for r in spark.sql("SELECT * FROM psi_drift_out").collect()
    }
    # every closed window agrees exactly; the still-open tail window is
    # the only permitted difference
    assert expected.items() <= got.items()
    for k in set(got) - set(expected):
        assert k[0] + 7 * 86400 >= wm_s, k


def test_windowed_ks_grid_streaming_matches_batch(spark, tmp_path):
    """windowed_ks_grid's tail is array arithmetic precisely so the SAME
    code runs on a stream: the streaming run must emit, for every
    watermark-closed window, exactly the batch rows."""
    from datalakeingestion_spark.streaming.drift import (
        reference_histogram,
        windowed_ks_grid,
    )

    events = load_table(spark, SF_SMALL, "events").filter(
        F.col("value").isNotNull()
    )
    src = str(tmp_path / "ks_src")
    events.coalesce(1).write.parquet(src)

    wk = F.expr("cast(ts as long) div 604800")
    w0 = events.agg(F.min(wk).alias("w")).first()["w"]
    ref = reference_histogram(
        events.filter(wk < F.lit(w0 + 2)), "value", lo=0.0, hi=500.0
    )
    batch = {
        r["window_start_s"]: (r["n_events"], r["ks_grid"])
        for r in windowed_ks_grid(
            events, ref, "value", lo=0.0, hi=500.0, window="7 days"
        ).collect()
    }
    assert len(batch) >= 3
    # drift sanity: the reference weeks score low, later weeks exist
    assert min(batch.values(), key=lambda v: v[1])[1] < 0.2

    max_s = events.agg(F.max(F.col("ts").cast("long")).alias("m")).first()["m"]
    wm_s = max_s - 3600
    expected = {
        k: v for k, v in batch.items() if k + 7 * 86400 < wm_s
    }
    assert expected and len(expected) < len(batch)

    stream = spark.readStream.schema(events.schema).parquet(src)
    out = windowed_ks_grid(
        stream.withWatermark("ts", "1 hour"),
        ref,
        "value",
        lo=0.0,
        hi=500.0,
        window="7 days",
    )
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("ks_grid_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        r["window_start_s"]: (r["n_events"], r["ks_grid"])
        for r in spark.sql("SELECT * FROM ks_grid_out").collect()
    }
    assert expected.items() <= got.items()
    for k in set(got) - set(expected):
        assert k + 7 * 86400 >= wm_s, k


def test_windowed_ks_sample_streaming_matches_batch(spark, tmp_path):
    """The quantile-sketch monitor is one stateful aggregation + a
    stateless array tail precisely so the SAME code runs on a stream:
    every watermark-closed window must emit exactly the batch rows."""
    from datalakeingestion_spark.streaming.drift import (
        reference_sample,
        windowed_ks_sample,
    )

    events = load_table(spark, SF_SMALL, "events").filter(
        F.col("value").isNotNull()
    )
    src = str(tmp_path / "ks_samp_src")
    events.coalesce(1).write.parquet(src)

    from datalakeingestion_spark.functions.buckets import epoch_bucket

    wk = epoch_bucket("ts", 604800)
    w0 = events.agg(F.min(wk).alias("w")).first()["w"]
    ref = reference_sample(
        events.filter(wk < F.lit(w0 + 2)), "value", "event_id", k=64
    )
    batch = {
        r["window_start_s"]: (r["n_events"], r["n_sample"], r["ks_sample"])
        for r in windowed_ks_sample(
            events, ref, "value", "ts", "event_id", k=64, hash_cap=1 << 58
        ).collect()
    }
    assert len(batch) >= 3
    # the reference weeks themselves must score low
    assert min(v[2] for v in batch.values()) < 0.25

    max_s = events.agg(F.max(F.col("ts").cast("long")).alias("m")).first()[
        "m"
    ]
    wm_s = max_s - 3600
    expected = {k: v for k, v in batch.items() if k + 7 * 86400 < wm_s}
    assert expected and len(expected) < len(batch)

    stream = spark.readStream.schema(events.schema).parquet(src)
    out = windowed_ks_sample(
        stream.withWatermark("ts", "1 hour"),
        ref,
        "value",
        "ts",
        "event_id",
        k=64,
        hash_cap=1 << 58,
    )
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("ks_sample_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        r["window_start_s"]: (r["n_events"], r["n_sample"], r["ks_sample"])
        for r in spark.sql("SELECT * FROM ks_sample_out").collect()
    }
    assert expected.items() <= got.items()
    for k in set(got) - set(expected):
        assert k + 7 * 86400 >= wm_s, k


def test_windowed_quantile_sample_streaming_matches_batch(spark, tmp_path):
    """The windowed decile monitor shares the sample-sketch aggregation
    with windowed_ks_sample; every watermark-closed window's 9 decile
    rows must match the batch run exactly, and a window where no row
    survives the cap emits NULL estimates (not an error)."""
    from datalakeingestion_spark.streaming.drift import (
        windowed_quantile_sample,
    )

    events = load_table(spark, SF_SMALL, "events").filter(
        F.col("value").isNotNull()
    )
    src = str(tmp_path / "wq_src")
    events.coalesce(1).write.parquet(src)

    batch = {
        (r["window_start_s"], r["q"]): (
            r["n_events"],
            r["n_sample"],
            r["est"],
        )
        for r in windowed_quantile_sample(
            events, "value", "ts", "event_id", k=64, hash_cap=1 << 58
        ).collect()
    }
    assert len(batch) >= 27  # >= 3 windows x 9 deciles
    # deciles are monotone within a window
    by_w = {}
    for (w, q), (_, _, est) in batch.items():
        by_w.setdefault(w, []).append((q, est))
    for w, qs in by_w.items():
        ests = [e for _, e in sorted(qs)]
        assert ests == sorted(ests), (w, ests)

    max_s = events.agg(F.max(F.col("ts").cast("long")).alias("m")).first()[
        "m"
    ]
    wm_s = max_s - 3600
    expected = {
        kq: v for kq, v in batch.items() if kq[0] + 7 * 86400 < wm_s
    }
    assert expected and len(expected) < len(batch)

    stream = spark.readStream.schema(events.schema).parquet(src)
    out = windowed_quantile_sample(
        stream.withWatermark("ts", "1 hour"),
        "value",
        "ts",
        "event_id",
        k=64,
        hash_cap=1 << 58,
    )
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("wq_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r["window_start_s"], r["q"]): (
            r["n_events"],
            r["n_sample"],
            r["est"],
        )
        for r in spark.sql("SELECT * FROM wq_out").collect()
    }
    assert expected.items() <= got.items()
    for kq in set(got) - set(expected):
        assert kq[0] + 7 * 86400 >= wm_s, kq

    # m = 0: everything over the cap -> NULL estimates, n_events intact
    zero = windowed_quantile_sample(
        events, "value", "ts", "event_id", k=64, hash_cap=1
    ).collect()
    assert all(r["est"] is None and r["n_sample"] == 0 for r in zero)
    assert all(r["n_events"] > 0 for r in zero)


def test_windowed_distinct_sample_streaming_matches_batch(spark, tmp_path):
    """Distinct-sampling monitor: watermark-closed windows agree exactly
    with the batch run; the estimate sits within the ~1/sqrt(survivors)
    band of the true windowed distinct count; state is the survivor set
    (bounded by the cap), never the full distinct set."""
    from datalakeingestion_spark.streaming.drift import (
        windowed_distinct_sample,
    )

    events = load_table(spark, SF_SMALL, "events").filter(
        F.col("user_id").isNotNull()
    )
    src = str(tmp_path / "wds_src")
    events.coalesce(1).write.parquet(src)

    cap = 1 << 58
    batch = {
        r["window_start_s"]: (
            r["n_events"],
            r["n_under_cap"],
            r["est_distinct"],
        )
        for r in windowed_distinct_sample(
            events, "user_id", "ts", hash_cap=cap
        ).collect()
    }
    assert len(batch) >= 3

    # estimator accuracy vs the exact truth: within 4 sigma of the
    # binomial band (deterministic fixture — no flake)
    from datalakeingestion_spark.functions.buckets import epoch_bucket

    exact = {
        r["w"] * 604800: r["d"]
        for r in events.groupBy(
            epoch_bucket("ts", 604800).alias("w")
        )
        .agg(F.countDistinct("user_id").alias("d"))
        .collect()
    }
    for w, (_, c, est) in batch.items():
        assert c > 0, "cap too low for the fixture"
        rel_sigma = 1.0 / (c ** 0.5)
        assert abs(est - exact[w]) / exact[w] < 4 * rel_sigma, (
            w,
            est,
            exact[w],
        )

    max_s = events.agg(F.max(F.col("ts").cast("long")).alias("m")).first()[
        "m"
    ]
    wm_s = max_s - 3600
    expected = {w: v for w, v in batch.items() if w + 7 * 86400 < wm_s}
    assert expected and len(expected) < len(batch)

    stream = spark.readStream.schema(events.schema).parquet(src)
    out = windowed_distinct_sample(
        stream.withWatermark("ts", "1 hour"),
        "user_id",
        "ts",
        hash_cap=cap,
    )
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("wds_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        r["window_start_s"]: (
            r["n_events"],
            r["n_under_cap"],
            r["est_distinct"],
        )
        for r in spark.sql("SELECT * FROM wds_out").collect()
    }
    assert expected.items() <= got.items()
    for w in set(got) - set(expected):
        assert w + 7 * 86400 >= wm_s, w

    # invalid cap rejected
    import pytest as _pytest

    with _pytest.raises(ValueError, match="hash_cap"):
        windowed_distinct_sample(events, "user_id", hash_cap=0)


# ---------------------------------------------------------------------------
# State size in BYTES (r8): the monitors' streaming state must be bounded
# by their knob (fixed grid / theta cap / bottom-k hash_cap), not by input
# volume. numRowsTotal counts window rows, but one ks_sample window row can
# hold ~1k structs — only memoryUsedBytes sees that, so pin bytes directly.
# ---------------------------------------------------------------------------


def _mk_stream_events(spark, n, weeks=8, n_keys=None):
    """Deterministic synthetic stream: n rows spread uniformly over
    `weeks` weekly windows; `n_keys` distinct keys (default: all ids)."""
    base = 1704067200  # 2024-01-01 UTC
    span = weeks * 604800
    return spark.range(n).select(
        F.col("id").alias("event_id"),
        F.timestamp_seconds(
            F.lit(base) + (F.col("id") * span / n).cast("long")
        ).alias("ts"),
        F.pmod(F.col("id"), F.lit(n_keys or n)).cast("string").alias("key"),
        F.pmod(F.col("id") * 37, F.lit(1000)).cast("double").alias("value"),
    )


def _state_metrics(spark, tmp_path, tag, df, build):
    """Run `build(watermarked stream)` to completion (availableNow) and
    return the max (memoryUsedBytes, numRowsTotal) across progresses."""
    src = str(tmp_path / f"src_{tag}")
    df.coalesce(2).write.parquet(src)
    stream = spark.readStream.schema(df.schema).parquet(src)
    out = build(stream.withWatermark("ts", "1 hour"))
    q = (
        out.writeStream.outputMode("append")
        .format("noop")
        .option("checkpointLocation", str(tmp_path / f"ckpt_{tag}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    ops = [so for p in q.recentProgress for so in p["stateOperators"]]
    assert ops, "no stateOperators progress recorded"
    return (
        max(so["memoryUsedBytes"] for so in ops),
        max(so["numRowsTotal"] for so in ops),
    )


def test_monitor_state_bytes_bounded_by_knob_not_rows(spark, tmp_path):
    """4x the input rows into the SAME windows: state BYTES must stay
    ~flat for each bounded-state mechanism — fixed grid (ks_grid),
    theta cap (distinct_sample), bottom-k hash_cap (quantile/ks sample,
    cap scaled 1/4 per the tuning law E[survivors] = n*cap/2^60). A
    deliberately UNBOUNDED exact-distinct twin on the same 4x data must
    grow, proving the probe can see growth (negative control)."""
    from datalakeingestion_spark.streaming.drift import (
        reference_histogram,
        windowed_distinct_sample,
        windowed_quantile_sample,
    )
    from datalakeingestion_spark.streaming.drift import windowed_ks_grid

    WEEKS = 8
    small = _mk_stream_events(spark, 20_000, WEEKS, n_keys=5_000)
    big = _mk_stream_events(spark, 80_000, WEEKS, n_keys=20_000)
    ref = reference_histogram(small, "value", lo=0.0, hi=1000.0)

    # window count is the same at both scales (state ROWS == windows)
    def _win_rows(metrics):
        return metrics[1]

    # 1) fixed grid
    grid = lambda s, d: windowed_ks_grid(  # noqa: E731
        d, ref, "value", lo=0.0, hi=1000.0, window="7 days"
    )
    b_small = _state_metrics(spark, tmp_path, "grid_s", small,
                             lambda s: grid(s, s))
    b_big = _state_metrics(spark, tmp_path, "grid_b", big,
                           lambda s: grid(s, s))
    assert _win_rows(b_small) == _win_rows(b_big) <= WEEKS + 1
    assert b_big[0] <= 1.5 * b_small[0] + 4096, (b_small, b_big)

    # 2) theta cap (distinct sampling): same cap, 4x rows AND 4x keys
    cap = (1 << 60) // 16
    d_small = _state_metrics(
        spark, tmp_path, "dist_s", small,
        lambda s: windowed_distinct_sample(s, "key", "ts", hash_cap=cap),
    )
    d_big = _state_metrics(
        spark, tmp_path, "dist_b", big,
        lambda s: windowed_distinct_sample(s, "key", "ts", hash_cap=cap),
    )
    # survivors grow with DISTINCTS under a fixed theta (5k->20k keys:
    # ~4x of a small number); the point is bytes track survivors, not
    # the 4x event volume — and retuning theta restores the budget
    d_tuned = _state_metrics(
        spark, tmp_path, "dist_t", big,
        lambda s: windowed_distinct_sample(s, "key", "ts", hash_cap=cap // 4),
    )
    assert d_tuned[0] <= 1.5 * d_small[0] + 4096, (d_small, d_tuned, d_big)

    # 3) bottom-k hash_cap: 4x rows with cap/4 -> same expected survivors
    cap_bk = (1 << 60) // 8
    q_small = _state_metrics(
        spark, tmp_path, "bk_s", small,
        lambda s: windowed_quantile_sample(
            s, "value", "ts", "event_id", k=64, hash_cap=cap_bk
        ),
    )
    q_big = _state_metrics(
        spark, tmp_path, "bk_b", big,
        lambda s: windowed_quantile_sample(
            s, "value", "ts", "event_id", k=64, hash_cap=cap_bk // 4
        ),
    )
    assert q_big[0] <= 1.5 * q_small[0] + 4096, (q_small, q_big)

    # negative control: exact windowed count-distinct (no cap) holds
    # every distinct key in state — the SAME 4x data must grow bytes,
    # proving memoryUsedBytes is sensitive to what we claim to bound
    exact = lambda s: (  # noqa: E731
        s.groupBy(F.window("ts", "7 days").alias("_w"))
        .agg(F.collect_set("key").alias("_ks"))
        .select(
            F.col("_w.start").cast("long").alias("window_start_s"),
            F.size("_ks").alias("n_distinct"),
        )
    )
    e_small = _state_metrics(spark, tmp_path, "ex_s", small, exact)
    e_big = _state_metrics(spark, tmp_path, "ex_b", big, exact)
    assert e_big[0] > 2.0 * e_small[0], (e_small, e_big)


def test_bloom_door_stream_admits_only_never_seen(spark, tmp_path):
    from datalakeingestion_spark.streaming.door import (
        bloom_door_stream,
        read_door_filter,
    )

    src = str(tmp_path / "landing")
    lake = str(tmp_path / "lake")
    fdir = str(tmp_path / "bloomfilter")
    ckpt = str(tmp_path / "ckpt")
    m, k = 6300, 5

    # batch 1 includes an INTRA-batch re-delivery (ids 0 and 900 share
    # a text) — only the min-id copy may be admitted
    batch1 = spark.createDataFrame(
        [(i, f"doc body {i}") for i in range(40)] + [(900, "doc body 0")],
        "doc_id long, text string",
    )
    batch1.write.parquet(src)
    schema = batch1.schema

    def run(ck):
        stream = spark.readStream.schema(schema).parquet(src)
        q = bloom_door_stream(spark, stream, lake, fdir, ck, m, k)
        q.awaitTermination(120)

    run(ckpt)
    admitted = spark.read.parquet(lake)
    assert admitted.count() == 40
    assert admitted.filter("doc_id = 900").count() == 0
    assert read_door_filter(spark, fdir).count() <= m // 63

    # second delivery: 30 re-delivered docs (suppressed by the door) +
    # 10 genuinely new ones (admitted)
    batch2 = spark.createDataFrame(
        [(i, f"doc body {i}") for i in range(10, 40)]
        + [(100 + i, f"new body {i}") for i in range(10)],
        "doc_id long, text string",
    )
    batch2.write.mode("append").parquet(src)
    run(ckpt)
    admitted = spark.read.parquet(lake)
    assert admitted.count() == 50
    # every re-delivered doc was suppressed (no duplicate texts in lake)
    assert admitted.select("text").distinct().count() == 50

    # a replayed epoch must reach the same admission decision it made
    # the first time: its own delta is EXCLUDED from the probe filter
    # (a crash after the delta write would otherwise suppress the whole
    # epoch on replay and overwrite its lake partition with nothing).
    # Check the exclusion semantics directly on the written ledger:
    full = {
        r["word"]: r["bits"] for r in read_door_filter(spark, fdir).collect()
    }
    wo_last = {
        r["word"]: r["bits"]
        for r in read_door_filter(spark, fdir, exclude_epoch=1).collect()
    }
    # epoch 1 added bits for the 10 new docs — excluding it must give a
    # strictly smaller (or equal per-word) bitmap, never a larger one
    assert any(full[w] != wo_last.get(w, 0) for w in full)
    assert all((wo_last.get(w, 0) & ~full[w]) == 0 for w in full)
    # and excluding a never-written epoch changes nothing
    assert {
        r["word"]: r["bits"]
        for r in read_door_filter(spark, fdir, exclude_epoch=99).collect()
    } == full


def test_read_door_filter_missing_dir_is_first_batch(spark, tmp_path):
    from datalakeingestion_spark.streaming.door import read_door_filter

    assert read_door_filter(spark, str(tmp_path / "nope")) is None


def test_shard_delivery_stream_epochs_and_replay(spark, tmp_path):
    """Streaming shard delivery: each micro-batch packs into epoch-scoped
    shards + a manifest delta; totals conserve tokens; a re-run of the
    same availableNow stream from the same checkpoint delivers nothing
    new (epoch-scoped overwrite = replay-idempotent)."""
    from datalakeingestion_spark.streaming.shards import (
        read_delivery_manifest,
        shard_delivery_stream,
    )

    src = str(tmp_path / "landing")
    out = str(tmp_path / "delivery")
    ckpt = str(tmp_path / "ckpt")
    docs = spark.createDataFrame(
        [(i, " ".join(f"w{(i * 7 + j) % 50}" for j in range(5 + i % 9)))
         for i in range(300)],
        "doc_id long, text string",
    )
    docs.write.parquet(src)

    def run():
        stream = spark.readStream.schema(docs.schema).parquet(src)
        q = shard_delivery_stream(
            spark, stream, out, ckpt,
            seq_token_budget=64, shard_token_budget=256,
        )
        q.awaitTermination(120)

    run()
    man = read_delivery_manifest(spark, out)
    assert man is not None
    total = man.agg(F.sum("n_tokens").alias("t"), F.sum("n_docs").alias("d")).first()
    n_tokens_src = docs.select(
        F.sum(F.size(F.split(F.col("text"), " ")))
    ).first()[0]
    assert total["d"] == 300
    assert total["t"] == n_tokens_src
    # data tree matches the manifest per (epoch, shard)
    data = spark.read.option("basePath", f"{out}/data").parquet(f"{out}/data")
    counts = {
        (r["epoch"], r["shard_id"]): r["n"]
        for r in data.groupBy("epoch", "shard_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert counts == {
        (r["epoch"], r["shard_id"]): r["n_docs"] for r in man.collect()
    }

    # replay: same checkpoint, no new source files -> nothing changes
    before = {tuple(r) for r in man.collect()}
    run()
    after = {
        tuple(r)
        for r in read_delivery_manifest(spark, out).collect()
    }
    assert after == before
    assert spark.read.parquet(f"{out}/data").count() == 300

    # second delivery appends a new epoch, previous epochs untouched
    spark.createDataFrame(
        [(1000 + i, f"fresh text number {i}") for i in range(20)],
        "doc_id long, text string",
    ).write.mode("append").parquet(src)
    run()
    man2 = read_delivery_manifest(spark, out)
    assert man2.agg(F.sum("n_docs")).first()[0] == 320
    assert before <= {tuple(r) for r in man2.collect()}


def test_compact_delivery_folds_epochs_keeps_replayable_tail(spark, tmp_path):
    from datalakeingestion_spark.streaming.shards import (
        compact_delivery,
        read_delivery_manifest,
        shard_delivery_stream,
    )

    src = str(tmp_path / "landing")
    out = str(tmp_path / "delivery")
    ckpt = str(tmp_path / "ckpt")
    schema = "doc_id long, text string"

    def run():
        stream = spark.readStream.schema(
            spark.createDataFrame([], schema).schema
        ).parquet(src)
        q = shard_delivery_stream(
            spark, stream, out, ckpt,
            seq_token_budget=64, shard_token_budget=256,
        )
        q.awaitTermination(120)

    # three epochs of 100 docs each
    for b in range(3):
        spark.createDataFrame(
            [(b * 1000 + i, " ".join(f"w{(i + j) % 40}" for j in range(7)))
             for i in range(100)],
            schema,
        ).write.mode("append").parquet(src)
        run()

    # snapshot BEFORE compaction deletes the folded epochs' files — the
    # lazy frame would re-read deleted paths afterwards
    rows_before = read_delivery_manifest(spark, out).collect()
    epochs_before = {r["epoch"] for r in rows_before}
    assert len(epochs_before) == 3
    totals_before = (
        sum(r["n_docs"] for r in rows_before),
        sum(r["n_tokens"] for r in rows_before),
    )

    res = compact_delivery(
        spark, out, seq_token_budget=64, shard_token_budget=256
    )
    assert res["folded"] == [0, 1]
    assert res["stale_removed"] == [0, 1]
    man = read_delivery_manifest(spark, out)
    epochs = {r["epoch"] for r in man.select("epoch").distinct().collect()}
    # the baseline's epoch id ENCODES its coverage: -(1+2) covers <= 1
    assert epochs == {-3, max(epochs_before)}
    totals = man.agg(
        F.sum("n_docs").alias("d"), F.sum("n_tokens").alias("t")
    ).first()
    assert (totals["d"], totals["t"]) == totals_before
    # data intact and doc ids unique
    data = spark.read.option("basePath", f"{out}/data").parquet(f"{out}/data")
    assert data.count() == 300
    assert data.select("doc_id").distinct().count() == 300
    # fewer, fuller shards than before in the folded range
    assert res["n_shards"] <= sum(
        1 for r in rows_before if r["epoch"] in res["folded"]
    )

    # steady state (baseline + replayable tail): a TRUE no-op — no
    # re-read, no rewrite, nothing stale
    again = compact_delivery(
        spark, out, seq_token_budget=64, shard_token_budget=256
    )
    assert again == {
        "folded": [], "kept": [-3, max(epochs_before)],
        "stale_removed": [], "n_shards": 0,
    }
    assert read_delivery_manifest(spark, out).agg(
        F.sum("n_docs")
    ).first()[0] == 300


def test_read_delivery_as_of_snapshots_and_baseline_floor(spark, tmp_path):
    from datalakeingestion_spark.streaming.shards import (
        DeliverySnapshotError,
        compact_delivery,
        read_delivery_as_of,
        shard_delivery_stream,
    )

    src = str(tmp_path / "landing")
    out = str(tmp_path / "delivery")
    ckpt = str(tmp_path / "ckpt")
    schema = "doc_id long, text string"

    def run():
        stream = spark.readStream.schema(
            spark.createDataFrame([], schema).schema
        ).parquet(src)
        q = shard_delivery_stream(
            spark, stream, out, ckpt,
            seq_token_budget=64, shard_token_budget=256,
        )
        q.awaitTermination(120)

    for b in range(3):
        spark.createDataFrame(
            [(b * 1000 + i, " ".join(f"w{(i + j) % 40}" for j in range(6)))
             for i in range(50)],
            schema,
        ).write.mode("append").parquet(src)
        run()

    # snapshots grow monotonically with the epoch
    d0, m0 = read_delivery_as_of(spark, out, 0)
    d1, m1 = read_delivery_as_of(spark, out, 1)
    d2, m2 = read_delivery_as_of(spark, out, 2)
    assert (d0.count(), d1.count(), d2.count()) == (50, 100, 150)
    assert m1.agg(F.sum("n_docs")).first()[0] == 100
    ids0 = {r["doc_id"] for r in d0.select("doc_id").collect()}
    assert ids0 == set(range(50))  # epoch-0 snapshot = epoch-0 docs only

    # compaction folds epochs 0,1 into the baseline; the epoch-2 and
    # later snapshots still answer exactly, older ones raise LOUDLY
    compact_delivery(spark, out, seq_token_budget=64,
                     shard_token_budget=256)
    d2b, m2b = read_delivery_as_of(spark, out, 2)
    assert d2b.count() == 150
    assert m2b.agg(F.sum("n_docs")).first()[0] == 150
    with pytest.raises(DeliverySnapshotError, match="predates"):
        read_delivery_as_of(spark, out, 0)


def test_compact_delivery_crash_recovery_never_double_counts(spark, tmp_path):
    """A compaction that crashed between its baseline write and its
    deletes leaves a superseded baseline + already-folded epochs on
    disk. Every reader must EXCLUDE them (no duplicated or wrong rows
    served), and the re-run must recognize them as stale from the
    RECORDED coverage and delete them without re-folding — the exact
    failure a coverage-less design double-counts."""
    from datalakeingestion_spark.operators.packing import pack_sequences
    from datalakeingestion_spark.operators.shards import (
        assign_shards,
        shard_manifest,
    )
    from datalakeingestion_spark.streaming.shards import (
        DeliverySnapshotError,
        compact_delivery,
        read_delivery_as_of,
        read_delivery_manifest,
        shard_delivery_stream,
    )

    src = str(tmp_path / "landing")
    out = str(tmp_path / "delivery")
    ckpt = str(tmp_path / "ckpt")
    schema = "doc_id long, text string"

    def run():
        stream = spark.readStream.schema(
            spark.createDataFrame([], schema).schema
        ).parquet(src)
        q = shard_delivery_stream(
            spark, stream, out, ckpt,
            seq_token_budget=64, shard_token_budget=256,
        )
        q.awaitTermination(120)

    def deliver_batch(b):
        spark.createDataFrame(
            [(b * 1000 + i, " ".join(f"w{(i + j) % 40}" for j in range(6)))
             for i in range(50)],
            schema,
        ).write.mode("append").parquet(src)
        run()

    for b in range(3):  # epochs 0..2, 50 docs each
        deliver_batch(b)
    compact_delivery(spark, out, seq_token_budget=64,
                     shard_token_budget=256)
    deliver_batch(3)
    # state now: baseline -3 (covers 0-1), epochs 2, 3

    # SIMULATE a second compaction that wrote its new baseline (-4,
    # covers <= 2: the old baseline + epoch 2) and crashed before the
    # deletes — baseline -3 and epoch 2 remain on disk
    data = spark.read.option("basePath", f"{out}/data").parquet(f"{out}/data")
    folded = (
        data.filter(F.col("epoch").isin([-3, 2]))
        .select("doc_id", "n_tokens")
        .localCheckpoint()
    )
    sharded = assign_shards(
        pack_sequences(folded, token_budget=64), shard_token_budget=256
    ).localCheckpoint()
    sharded.write.mode("overwrite").partitionBy("shard_id").parquet(
        f"{out}/data/epoch=-4"
    )
    shard_manifest(sharded).coalesce(1).write.mode("overwrite").parquet(
        f"{out}/manifest/epoch=-4"
    )

    # inside the crash window: the default manifest view and snapshots
    # never double-count
    man = read_delivery_manifest(spark, out)
    assert man.agg(F.sum("n_docs")).first()[0] == 200
    assert {r["epoch"] for r in man.select("epoch").distinct().collect()} \
        == {-4, 3}
    d2, m2 = read_delivery_as_of(spark, out, 2)
    assert d2.count() == 150  # epochs 0-2 exactly, not duplicated
    d3, _ = read_delivery_as_of(spark, out, 3)
    assert d3.count() == 200
    with pytest.raises(DeliverySnapshotError, match="predates"):
        read_delivery_as_of(spark, out, 1)  # folded deeper than -3's floor
    # the raw ledger still shows the leftovers for inspection
    raw = read_delivery_manifest(spark, out, include_stale=True)
    assert raw.agg(F.sum("n_docs")).first()[0] > 200

    # recovery: the re-run deletes the stale leftovers WITHOUT
    # re-folding (folded == [], so nothing was re-read into a baseline)
    res = compact_delivery(spark, out, seq_token_budget=64,
                           shard_token_budget=256)
    assert res["folded"] == []
    assert res["stale_removed"] == [-3, 2]
    raw2 = read_delivery_manifest(spark, out, include_stale=True)
    assert raw2.agg(F.sum("n_docs")).first()[0] == 200
    assert spark.read.option("basePath", f"{out}/data").parquet(
        f"{out}/data"
    ).select("doc_id").distinct().count() == 200


def test_delivery_rejects_legacy_minus_one_baseline(spark, tmp_path):
    """epoch=-1 is unreachable under the coverage-encoded scheme
    (baseline ids are <= -2); decoding it would claim 'covers nothing'
    and silently double-count whatever it folded — readers must refuse
    loudly instead."""
    from datalakeingestion_spark.streaming.shards import (
        DeliverySnapshotError,
        read_delivery_manifest,
    )

    out = str(tmp_path / "delivery")
    spark.createDataFrame(
        [(0, 10, 2, 100, "d" * 32)],
        "shard_id long, n_docs long, n_seqs long, n_tokens long, digest string",
    ).write.parquet(f"{out}/manifest/epoch=-1")
    with pytest.raises(DeliverySnapshotError, match="epoch=-1"):
        read_delivery_manifest(spark, out)


def test_shard_delivery_carries_full_doc_payload(spark, tmp_path):
    """Delivered shards carry the FULL doc rows (text and any other
    source columns), both on streaming delivery and after compaction —
    a trainer consumes them with no join back to the corpus."""
    from datalakeingestion_spark.streaming.shards import (
        compact_delivery,
        read_delivery_manifest,
        shard_delivery_stream,
    )

    src = str(tmp_path / "landing")
    out = str(tmp_path / "delivery")
    ckpt = str(tmp_path / "ckpt")
    docs = spark.createDataFrame(
        [(i, " ".join(f"w{(i + j) % 30}" for j in range(4 + i % 5)), f"src{i % 3}")
         for i in range(120)],
        "doc_id long, text string, source string",
    )
    docs.write.parquet(src)

    def run():
        stream = spark.readStream.schema(docs.schema).parquet(src)
        q = shard_delivery_stream(
            spark, stream, out, ckpt,
            seq_token_budget=32, shard_token_budget=128,
        )
        q.awaitTermination(120)

    run()
    data = spark.read.option("basePath", f"{out}/data").parquet(f"{out}/data")
    for col in ("text", "source", "n_tokens", "seq_id", "shard_id"):
        assert col in data.columns
    # payload values are the source rows, not nulls
    joined = data.join(
        docs.select("doc_id", F.col("text").alias("want")), "doc_id"
    )
    assert joined.filter(F.col("text") != F.col("want")).count() == 0
    assert data.count() == 120

    # second epoch, then compaction: payload survives the fold
    spark.createDataFrame(
        [(1000 + i, f"fresh doc {i}", "srcX") for i in range(15)],
        "doc_id long, text string, source string",
    ).write.mode("append").parquet(src)
    run()
    compact_delivery(spark, out, seq_token_budget=32,
                     shard_token_budget=128)
    after = spark.read.option("basePath", f"{out}/data").parquet(f"{out}/data")
    assert {"text", "source"} <= set(after.columns)
    assert after.count() == 135
    assert after.filter(F.col("text").isNull()).count() == 0
    man = read_delivery_manifest(spark, out)
    assert man.agg(F.sum("n_docs")).first()[0] == 135

    # reserved-name collision fails loudly up front
    bad = spark.readStream.schema(
        "doc_id long, text string, shard_id long"
    ).parquet(src)
    with pytest.raises(ValueError, match="shard_id"):
        shard_delivery_stream(spark, bad, out, ckpt)


def test_compact_fold_preserves_cross_epoch_duplicates(spark, tmp_path):
    """A doc re-delivered in two epochs appears TWICE in the compacted
    baseline (delivery history is preserved) — never four times (the
    payload join-back keys on doc#epoch, so duplicates cannot multiply)
    — and a batch with duplicate ids fails the stream loudly."""
    from datalakeingestion_spark.streaming.shards import (
        compact_delivery,
        read_delivery_manifest,
        shard_delivery_stream,
    )

    src = str(tmp_path / "landing")
    out = str(tmp_path / "delivery")
    ckpt = str(tmp_path / "ckpt")
    schema = "doc_id long, text string"
    spark.createDataFrame(
        [(i, f"alpha beta gamma {i}") for i in range(40)], schema
    ).write.parquet(src)

    def run():
        stream = spark.readStream.schema(schema).parquet(src)
        q = shard_delivery_stream(
            spark, stream, out, ckpt,
            seq_token_budget=16, shard_token_budget=64,
        )
        q.awaitTermination(120)

    run()
    # epoch 1 re-delivers docs 0..9 (changed text) plus fresh docs
    spark.createDataFrame(
        [(i, f"redelivered {i}") for i in range(10)]
        + [(100 + i, f"fresh {i}") for i in range(5)],
        schema,
    ).write.mode("append").parquet(src)
    run()
    # epoch 2: one more batch so compaction has a tail to keep verbatim
    spark.createDataFrame([(200, "tail doc")], schema).write.mode(
        "append"
    ).parquet(src)
    run()

    res = compact_delivery(spark, out, seq_token_budget=16,
                           shard_token_budget=64)
    assert res["folded"] == [0, 1]
    data = spark.read.option("basePath", f"{out}/data").parquet(f"{out}/data")
    dup = data.filter(F.col("doc_id") < 10)
    assert dup.count() == 20  # twice each, never four times
    per = {r["doc_id"]: r["n"] for r in dup.groupBy("doc_id")
           .agg(F.count(F.lit(1)).alias("n")).collect()}
    assert set(per.values()) == {2}
    # both text versions survive the fold
    texts = {r["text"] for r in dup.filter(F.col("doc_id") == 3).collect()}
    assert texts == {"alpha beta gamma 3", "redelivered 3"}
    assert data.count() == 40 + 15 + 1
    man = read_delivery_manifest(spark, out)
    assert man.agg(F.sum("n_docs")).first()[0] == 56

    # duplicate ids WITHIN one batch fail the stream loudly
    src2 = str(tmp_path / "landing2")
    spark.createDataFrame(
        [(7, "one"), (7, "two")], schema
    ).write.parquet(src2)
    stream = spark.readStream.schema(schema).parquet(src2)
    q = shard_delivery_stream(
        spark, stream, str(tmp_path / "d2"), str(tmp_path / "c2"),
        seq_token_budget=16, shard_token_budget=64,
    )
    with pytest.raises(Exception, match="duplicate"):
        q.awaitTermination(120)
        q.processAllAvailable()
