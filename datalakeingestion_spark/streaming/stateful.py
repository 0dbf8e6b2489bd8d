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
