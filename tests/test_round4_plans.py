"""Behavioral tests for round-4 plan compositions that the fixture data
doesn't exercise (tie-breaks, empty edges) — parity vs DuckDB is covered
for every registered query in tests/test_parity.py.
"""

from __future__ import annotations

import pytest

import datetime as dt

from pyspark.sql import functions as F


def _write_events(spark, tmp_path, rows):
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    return str(tmp_path)


@pytest.mark.smoke
def test_last_touch_tie_breaks_deterministically(spark, tmp_path):
    """Two clicks at the IDENTICAL timestamp before one purchase: the
    higher event_id must take the credit, on both engines (the fixture
    has no ts collisions, so parity alone never exercises this)."""
    from datalakeingestion_spark.plans.registry import REGISTRY, _ensure_loaded

    _ensure_loaded()
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (1, t0, 7, "click", 0.0, "{}"),
        (2, t0, 7, "click", 0.0, "{}"),          # same ts, higher id
        (3, t0 + dt.timedelta(minutes=30), 7, "purchase", 9.9, "{}"),
        # a click outside the 1h window must not attribute
        (4, t0 - dt.timedelta(hours=2), 7, "click", 0.0, "{}"),
        # purchase with no prior click in window -> unattributed (absent)
        (5, dt.datetime(2024, 2, 1), 8, "purchase", 1.0, "{}"),
    ]
    sf_dir = _write_events(spark, tmp_path, rows)
    out = REGISTRY["conversion_attribution_last_touch"].fn(
        spark, sf_dir
    ).collect()
    assert len(out) == 1
    [r] = out
    assert r["purchase_id"] == 3
    assert r["click_id"] == 2  # id tie-break, not arrival order


def test_stream_stream_twin_window_edges(spark, tmp_path):
    """Interval bounds are closed on both ends: a purchase exactly 1h
    after the click matches; 1h + 1s does not."""
    from datalakeingestion_spark.plans.registry import REGISTRY, _ensure_loaded

    _ensure_loaded()
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (1, t0, 1, "click", 0.0, "{}"),
        (2, t0 + dt.timedelta(hours=1), 1, "purchase", 1.0, "{}"),
        (3, t0, 2, "click", 0.0, "{}"),
        (4, t0 + dt.timedelta(hours=1, seconds=1), 2, "purchase", 1.0, "{}"),
    ]
    sf_dir = _write_events(spark, tmp_path, rows)
    out = REGISTRY["t10_stream_stream_join"].fn(spark, sf_dir).collect()
    assert [(r["event_id"], r["purchase_id"]) for r in out] == [(1, 2)]


def test_cumulative_distinct_counts_each_user_once(spark, tmp_path):
    from datalakeingestion_spark.plans.registry import REGISTRY, _ensure_loaded

    _ensure_loaded()
    d0 = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    # user 1 active on days 0,1,2; user 2 on day 1; user 3 on day 2
    for uid, day in [(1, 0), (1, 1), (1, 2), (2, 1), (3, 2)]:
        eid += 1
        rows.append(
            (eid, d0 + dt.timedelta(days=day), uid, "view", 0.0, "{}")
        )
    sf_dir = _write_events(spark, tmp_path, rows)
    out = {
        r["day"]: (r["new_users"], r["cum_users"])
        for r in REGISTRY["cumulative_distinct_users_daily"]
        .fn(spark, sf_dir)
        .collect()
    }
    days = sorted(out)
    assert [out[d] for d in days] == [(1, 1), (1, 2), (1, 3)]


def test_group_holdout_has_no_user_overlap(spark):
    """The split must be a partition of users: hashing the group key per
    row can never put one user on both sides."""
    from datalakeingestion_spark.functions.hashing import portable_hash32
    from datalakeingestion_spark.sources.fixtures import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    h = portable_hash32(
        F.concat(F.col("user_id").cast("string"), F.lit("#gsplit"))
    )
    tagged = ev.withColumn(
        "split", F.when(h < 3435973836, "train").otherwise("holdout")
    )
    both = (
        tagged.groupBy("user_id")
        .agg(F.count_distinct("split").alias("k"))
        .filter("k > 1")
        .count()
    )
    assert both == 0


def test_funnel_strict_order_and_single_shuffle(spark, tmp_path):
    """The fixture converts 100%, so pin the strict-order semantics on
    synthetic data: a purchase BEFORE the first post-signup click must
    not count, and a click before signup doesn't open the funnel."""
    import re

    from datalakeingestion_spark.plans.registry import (
        REGISTRY,
        _ensure_loaded,
    )

    _ensure_loaded()
    t0 = dt.datetime(2024, 1, 1)

    def ev(eid, minutes, uid, typ):
        return (eid, t0 + dt.timedelta(minutes=minutes), uid, typ, 0.0, "{}")

    rows = [
        # u1: full ordered funnel
        ev(1, 0, 1, "signup"), ev(2, 10, 1, "click"), ev(3, 20, 1, "purchase"),
        # u2: purchase BEFORE the post-signup click -> stalls at click
        ev(4, 0, 2, "signup"), ev(5, 10, 2, "purchase"), ev(6, 20, 2, "click"),
        # u3: click only before signup -> stalls at signup
        ev(7, 10, 3, "signup"), ev(8, 0, 3, "click"),
        # u4: never signs up -> not in the funnel at all
        ev(9, 0, 4, "click"), ev(10, 5, 4, "purchase"),
    ]
    sf_dir = _write_events(spark, tmp_path, rows)
    qd = REGISTRY["funnel_signup_click_purchase"]
    [r] = qd.fn(spark, sf_dir).collect()
    assert (r["n_signup"], r["n_click_after"], r["n_purchase_after"]) == (
        3, 2, 1,
    )
    plan = (
        qd.fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    )
    # both windows + the groupBy share the user_id partitioning: exactly
    # one data shuffle
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1, plan


def test_trailing_7d_window_edges(spark, tmp_path):
    """A user active only on day 0 counts as active through day 6 and
    not on day 7; each (day) row counts distinct users once."""
    from datalakeingestion_spark.plans.registry import (
        REGISTRY,
        _ensure_loaded,
    )

    _ensure_loaded()
    d0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, d0, 1, "view", 0.0, "{}"),                       # u1 day 0
        (2, d0 + dt.timedelta(days=6), 2, "view", 0.0, "{}"),  # u2 day 6
        (3, d0 + dt.timedelta(days=7), 3, "view", 0.0, "{}"),  # u3 day 7
        (4, d0 + dt.timedelta(days=7), 3, "click", 0.0, "{}"),  # dup presence
    ]
    sf_dir = _write_events(spark, tmp_path, rows)
    out = {
        r["day"]: r["active_7d"]
        for r in REGISTRY["active_users_trailing_7d"].fn(
            spark, sf_dir
        ).collect()
    }
    base = min(out)
    # day 6: u1 still in window + u2 -> 2; day 7: u1 aged out -> u2+u3
    assert out[base] == 1
    assert out[base + 6] == 2
    assert out[base + 7] == 2
