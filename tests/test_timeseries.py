"""Time-series gap-fill tests (operators/timeseries.py)."""

from __future__ import annotations

import datetime as dt

import pytest

from datalakeingestion_spark.operators.timeseries import daily_gapfill_ffill


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, ts timestamp, value double"
    )


@pytest.mark.smoke
def test_gaps_filled_with_last_observation(spark):
    t = dt.datetime
    ev = _events(
        spark,
        [
            # user 1: days 1 and 4 observed (two events on day 1 -> summed)
            (1, t(2024, 1, 1, 8), 10.0),
            (1, t(2024, 1, 1, 9), 2.5),
            (1, t(2024, 1, 4, 12), 7.0),
            # user 2: a single day -> single-row grid, no fill needed
            (2, t(2024, 2, 10, 1), 3.0),
        ],
    )
    out = {
        (r["user_id"], str(r["day"])): (r["value_ffill"], r["observed"])
        for r in daily_gapfill_ffill(ev).collect()
    }
    assert out == {
        (1, "2024-01-01"): (12.5, True),
        (1, "2024-01-02"): (12.5, False),
        (1, "2024-01-03"): (12.5, False),
        (1, "2024-01-04"): (7.0, True),
        (2, "2024-02-10"): (3.0, True),
    }


def test_day_buckets_are_session_timezone_independent(spark):
    # an event at 01:00 UTC must land on the UTC calendar day even when
    # the session zone would call it the previous day (the driver runs a
    # bare session in the host zone — to_date() here was a latent bug)
    ev = _events(spark, [(1, dt.datetime(2024, 1, 2, 1, 0), 5.0)])
    tz = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        rows = daily_gapfill_ffill(ev).collect()
    finally:
        spark.conf.set("spark.sql.session.timeZone", tz)
    assert [str(r["day"]) for r in rows] == ["2024-01-02"]


def test_randomized_batch_matches_python_reference(spark):
    # seeded random batch, ONE Spark job, full-output comparison against
    # a pure-Python gap-fill (repo convention for randomized checks:
    # vectorized batch, not per-example Spark jobs). Integer-valued
    # doubles keep both engines' sums exact.
    import random

    rng = random.Random(20240816)
    rows = []
    for i in range(300):
        u = rng.randrange(20)
        day = rng.randrange(60)
        rows.append(
            (u, dt.datetime(2024, 1, 1) + dt.timedelta(days=day,
             hours=rng.randrange(24)), float(rng.randrange(1, 100)))
        )
    # python reference
    daily: dict[tuple[int, dt.date], float] = {}
    for u, ts, v in rows:
        daily[(u, ts.date())] = daily.get((u, ts.date()), 0.0) + v
    expected = {}
    for u in {k[0] for k in daily}:
        days = sorted(d for (uu, d) in daily if uu == u)
        cur = None
        d = days[0]
        while d <= days[-1]:
            if (u, d) in daily:
                cur = daily[(u, d)]
                expected[(u, d)] = (cur, True)
            else:
                expected[(u, d)] = (cur, False)
            d += dt.timedelta(days=1)

    got = {
        (r["user_id"], r["day"]): (r["value_ffill"], r["observed"])
        for r in daily_gapfill_ffill(_events(spark, rows)).collect()
    }
    assert got == expected


def test_grid_is_per_key_span_not_global(spark):
    # user 2's span must NOT be widened to user 1's calendar
    t = dt.datetime
    ev = _events(
        spark,
        [
            (1, t(2024, 1, 1), 1.0),
            (1, t(2024, 1, 31), 1.0),
            (2, t(2024, 1, 15), 1.0),
        ],
    )
    df = daily_gapfill_ffill(ev)
    per_user = {r["user_id"]: r["n"] for r in
                df.groupBy("user_id").count().withColumnRenamed("count", "n").collect()}
    assert per_user == {1: 31, 2: 1}
    # schema contract: typed date + double fill + boolean flag
    assert dict(df.dtypes) == {
        "user_id": "bigint",
        "day": "date",
        "value_ffill": "double",
        "observed": "boolean",
    }


def test_rolling_mad_flags_planted_spike(spark):
    from datalakeingestion_spark.operators.timeseries import rolling_mad_flags

    # constant series with one spike: the spike flags via the MAD-zero
    # fallback (its window is majority-constant), neighbors don't
    rows = [(1, dt.date(2024, 1, d), 10.0) for d in range(1, 8)]
    rows[4] = (1, dt.date(2024, 1, 5), 1000.0)
    df = spark.createDataFrame(rows, "user_id int, day date, day_total double")
    out = {str(r["day"]): (r["med"], r["mad"], r["is_anomaly"])
           for r in rolling_mad_flags(df, window=7).collect()}
    assert out["2024-01-05"][2] is True
    assert out["2024-01-04"] == (10.0, 0.0, False)
    # after the spike the window contains it, but the median stays 10
    # and the constant current value is not anomalous
    assert out["2024-01-06"][0] == 10.0
    assert out["2024-01-06"][2] is False


def test_rolling_mad_lower_median_even_window(spark):
    from datalakeingestion_spark.operators.timeseries import rolling_mad_flags

    # 2-row window: lower median = smaller element ((2+1)//2 = index 1)
    rows = [(1, dt.date(2024, 1, 1), 10.0), (1, dt.date(2024, 1, 2), 20.0)]
    df = spark.createDataFrame(rows, "user_id int, day date, day_total double")
    out = {str(r["day"]): r["med"] for r in rolling_mad_flags(df, window=7).collect()}
    assert out["2024-01-02"] == 10.0
