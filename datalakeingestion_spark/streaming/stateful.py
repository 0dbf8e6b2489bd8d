"""Custom stateful streaming operators.

``streaming_latest_rows`` is the streaming twin of the engine's flagship
batch semantic (latest-row-per-key dedup, operators/relational.latest_rows
— reference start_ingestion.py:361-374): as micro-batches arrive, each key
keeps only its maximum (order_col, tie_break) row in checkpointed state
and emits the new winner whenever it changes. This is what the reference
fundamentally cannot express — its "latest data zone" is recomputed at
read time over the whole table; here updates stream incrementally with
O(|keys|) state.

Built on ``applyInPandasWithState`` (Arrow-batched per-group kernels +
GroupState). Output mode is "update": downstream sinks see one row per
key per batch in which that key's winner changed.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def streaming_latest_rows(
    events: DataFrame,
    key_col: str = "user_id",
    order_col: str = "ts",
    tie_break: str = "event_id",
    payload_cols: tuple[str, ...] = ("event_type", "value"),
) -> DataFrame:
    """Latest row per key, maintained incrementally across micro-batches.

    Returns a streaming DataFrame with schema
    (key, order_col, tie_break, *payload_cols).
    """
    out_fields = [key_col, order_col, tie_break, *payload_cols]
    src = events.select(*out_fields)
    out_schema = src.schema
    # state = the winner row, stored as a tuple in the same field order
    state_schema = src.schema

    def update(
        key: tuple,
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        best = state.get if state.exists else None  # tuple in field order
        for pdf in batches:
            if pdf.empty:
                continue
            idx = pdf.sort_values(
                [order_col, tie_break], ascending=[False, False]
            ).index[0]
            cand = tuple(pdf.loc[idx, f] for f in out_fields)
            if best is None or (cand[1], cand[2]) > (best[1], best[2]):
                best = cand
        if best is not None:
            changed = (not state.exists) or tuple(state.get) != tuple(best)
            state.update(tuple(best))
            if changed:
                yield pd.DataFrame([best], columns=out_fields)

    return src.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_heavy_hitters(
    tokens: DataFrame,
    token_col: str = "tok",
    threshold: int = 100,
) -> DataFrame:
    """Exact streaming heavy hitters: per-token running counts in
    GroupState; a token emits (token, running_count) in every micro-batch
    where its cumulative count is at or above ``threshold`` AND changed —
    downstream sees the current exact count of every hot token as soon as
    it becomes hot (trend surfacing, hot-key detection feeding
    `salted_join`, vocab-cap monitoring).

    Versus the batch Count-Min sketch (`operators/sketches.py`): this is
    EXACT and incremental but carries O(distinct tracked tokens) state —
    the right trade when the stream's key space is vocabulary-sized;
    for unbounded key spaces, bound state with a CMS-in-state variant or
    key TTLs (GroupStateTimeout).

    Output schema: (token string, running_count long), update mode.
    """
    import pyspark.sql.functions as F

    src = tokens.select(F.col(token_col).cast("string").alias("token"))
    out_schema = "token string, running_count long"
    state_schema = "cnt long"

    def update(
        key: tuple,
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        cnt = state.get[0] if state.exists else 0
        new = sum(len(pdf) for pdf in batches)
        if new:
            cnt += new
            state.update((cnt,))
            if cnt >= threshold:
                yield pd.DataFrame(
                    {"token": [key[0]], "running_count": [cnt]}
                )

    return src.groupBy("token").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_session_funnel(
    events: DataFrame,
    steps: tuple[str, ...] = ("signup", "click", "purchase"),
    gap_seconds: int = 1800,
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tie_break: str = "event_id",
) -> DataFrame:
    """Stateful per-user SESSION FUNNEL: sessions close after
    ``gap_seconds`` of inactivity (event-time, via the input watermark),
    and within each session the funnel stage advances only on the next
    step type STRICTLY LATER than the previous stage's event — the
    conversion-path measurement (how far did each session get) that a
    batch pipeline recomputes from scratch and this operator maintains
    incrementally with one state row per live user.

    State: the OPEN session (start, last-activity, per-stage timestamps,
    event count) as epoch-micros longs. A session row is EMITTED when
    the session closes — either a same-user event arrives past the gap,
    or the event-time watermark passes last_activity + gap
    (EventTimeTimeout; the input stream must carry ``withWatermark`` on
    ``ts_col``). Output schema (all epoch-micros to stay
    timezone-proof):

        (user_id, session_start_us, session_end_us, n_events,
         max_stage, completed)

    max_stage = number of funnel steps reached in order (0..len(steps));
    completed = max_stage == len(steps). Ordering caveat (standard for
    per-key stateful funnels): a key's rows are materialized and sorted
    once per micro-batch (across Arrow chunks), so per-key delivery must
    be in order ACROSS micro-batches up to the watermark — the same
    assumption session_window makes.

    Batch twin: plans/round5.py::session_funnel_stages (identical
    strict-order semantics, DuckDB-oracle-checked).
    """
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    n_steps = len(steps)
    if n_steps == 0:
        raise ValueError("steps must be non-empty")
    gap_us = gap_seconds * 1_000_000

    out_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("session_start_us", T.LongType()),
            T.StructField("session_end_us", T.LongType()),
            T.StructField("n_events", T.LongType()),
            T.StructField("max_stage", T.IntegerType()),
            T.StructField("completed", T.BooleanType()),
        ]
    )
    # state: session_start, last_us, n_events, stage, stage_ts
    state_schema = T.StructType(
        [
            T.StructField("session_start_us", T.LongType()),
            T.StructField("last_us", T.LongType()),
            T.StructField("n_events", T.LongType()),
            T.StructField("stage", T.IntegerType()),
            T.StructField("stage_us", T.LongType()),
        ]
    )

    # the caller applies withWatermark(ts_col, ...) upstream; the
    # watermarked TIMESTAMP column itself must survive the projection
    # (a derived unix_micros column does not carry the watermark), so
    # it rides along as event_ts even though the kernel only reads us
    src = events.select(
        F.col(key_col).cast("long").alias("user_id"),
        F.unix_micros(F.col(ts_col)).alias("us"),
        F.col(type_col).alias("etype"),
        F.col(tie_break).alias("tb"),
        F.col(ts_col).alias("event_ts"),
    )

    def close_row(key: int, st: tuple) -> tuple:
        start, last, n, stage, _ = st
        return (key, start, last, n, stage, stage == n_steps)

    def update(
        key: tuple,
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        uid = key[0]
        closed: list[tuple] = []
        st = tuple(state.get) if state.exists else None
        if state.hasTimedOut:
            if st is not None:
                closed.append(close_row(uid, st))
                state.remove()
            if closed:
                yield pd.DataFrame(closed, columns=[f.name for f in out_schema])
            return
        # Materialize the whole key's micro-batch before sorting: Arrow
        # hands the group over in ~10k-row chunks, and sorting each chunk
        # independently would let a late-chunk event that precedes an
        # earlier-chunk event corrupt session splits (the funnel is
        # order-sensitive, unlike the commutative heavy-hitters state).
        # Per-key micro-batch volume is bounded, so the concat is small.
        chunks = [pdf for pdf in batches if not pdf.empty]
        whole = (
            pd.concat(chunks, ignore_index=True) if chunks else pd.DataFrame()
        )
        if not whole.empty:
            whole = whole.sort_values(["us", "tb"])
            for us, etype in zip(whole["us"], whole["etype"]):
                us = int(us)
                if st is not None and us - st[1] > gap_us:
                    closed.append(close_row(uid, st))
                    st = None
                if st is None:
                    st = (us, us, 0, 0, 0)
                start, _, n, stage, stage_us = st
                if stage < n_steps and etype == steps[stage] and (
                    stage == 0 or us > stage_us
                ):
                    stage, stage_us = stage + 1, us
                st = (start, us, n + 1, stage, stage_us)
        if st is not None:
            state.update(st)
            # close the open session once the watermark passes the gap
            state.setTimeoutTimestamp((st[1] + gap_us) // 1000 + 1)
        if closed:
            yield pd.DataFrame(closed, columns=[f.name for f in out_schema])

    return (
        src.groupBy("user_id").applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
