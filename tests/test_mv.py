"""Incremental materialized-view maintenance (operators/mv.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datalakeingestion_spark.operators.mv import (
    aggregate_state,
    finalize_state,
    merge_states,
)


def _mk(spark, rows):
    return spark.createDataFrame(rows, "k string, v double")


def _meas():
    return {"sum_v": F.col("v")}


@pytest.mark.smoke
def test_insert_then_delete_cancels_key(spark):
    a = _mk(spark, [("x", 1.0), ("x", 2.0), ("y", 5.0)])
    dead = _mk(spark, [("x", 1.0), ("x", 2.0)])
    merged = merge_states(
        [
            aggregate_state(a, ["k"], _meas()),
            aggregate_state(dead, ["k"], _meas(), sign=-1),
        ],
        ["k"],
    )
    rows = {r["k"]: (float(r["sum_v"]), r["n_rows"]) for r in merged.collect()}
    # x cancelled to zero rows -> dropped entirely, y untouched
    assert rows == {"y": (5.0, 1)}


def test_merge_is_fold_order_independent(spark):
    batches = [
        _mk(spark, [("a", 1.5), ("b", 2.0)]),
        _mk(spark, [("a", 0.25)]),
        _mk(spark, [("b", -1.0), ("c", 7.0)]),
    ]
    states = [aggregate_state(b, ["k"], _meas()) for b in batches]
    all_at_once = merge_states(states, ["k"])
    pairwise = merge_states(
        [merge_states(states[:2], ["k"]), states[2]], ["k"]
    )
    direct = aggregate_state(
        batches[0].unionByName(batches[1]).unionByName(batches[2]),
        ["k"],
        _meas(),
    )
    want = sorted(
        (r["k"], float(r["sum_v"]), r["n_rows"]) for r in direct.collect()
    )
    for got_df in (all_at_once, pairwise):
        got = sorted(
            (r["k"], float(r["sum_v"]), r["n_rows"])
            for r in got_df.collect()
        )
        assert got == want


def test_finalize_derives_avg(spark):
    st = aggregate_state(
        _mk(spark, [("a", 2.0), ("a", 4.0)]), ["k"], _meas()
    )
    out = finalize_state(st, ["k"], avg_of={"avg_v": "sum_v"}).collect()[0]
    assert out["sum_v"] == 6.0
    assert out["n_rows"] == 2
    assert out["avg_v"] == 3.0
    assert dict(finalize_state(st, ["k"]).dtypes)["sum_v"] == "double"


def test_bad_sign_rejected(spark):
    with pytest.raises(ValueError):
        aggregate_state(_mk(spark, [("a", 1.0)]), ["k"], _meas(), sign=0)
    with pytest.raises(ValueError):
        merge_states([], ["k"])


def test_empty_batch_state_merges_as_noop(spark):
    empty = spark.createDataFrame([], "k string, v double")
    full = _mk(spark, [("a", 2.0)])
    merged = merge_states(
        [
            aggregate_state(full, ["k"], _meas()),
            aggregate_state(empty, ["k"], _meas()),
        ],
        ["k"],
    )
    rows = {r["k"]: (float(r["sum_v"]), r["n_rows"]) for r in merged.collect()}
    assert rows == {"a": (2.0, 1)}
