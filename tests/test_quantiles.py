"""Distributed exact quantile selection + bottom-k sketch estimation."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from datalakeingestion_spark.operators.quantiles import (
    exact_quantiles_by_key,
    sampled_quantiles_by_key,
)


def _order_stat(vals, t):
    """r-th smallest with r = ceil(t*n/10) in integer arithmetic."""
    s = sorted(vals)
    r = (t * len(s) + 9) // 10
    return s[r - 1]


@pytest.mark.smoke
def test_exact_quantiles_match_bruteforce_with_ties(spark):
    """Rank selection over the distinct-value histogram must equal the
    r-th order statistic from a full sort — including heavy ties (the
    case where 'min value with cum >= r' and naive interpolation
    diverge), several keys, and NULL exclusion."""
    import random

    rng = random.Random(3)
    rows = []
    for key in ("a", "b"):
        for i in range(501 if key == "a" else 137):
            v = float(rng.randrange(0, 20))  # ties everywhere
            rows.append((key, v))
    rows.append(("a", None))
    df = spark.createDataFrame(rows, "k string, v double")

    got = {
        (r["k"], r["q"]): r["value"]
        for r in exact_quantiles_by_key(df, ["k"], "v").collect()
    }
    for key in ("a", "b"):
        vals = [v for kk, v in rows if kk == key and v is not None]
        for t in range(1, 10):
            assert got[(key, t / 10.0)] == _order_stat(vals, t), (key, t)


def test_exact_quantiles_integer_rank_no_float_ceil_bug(spark):
    """ceil(0.3 * 10) in floating point is 4; the integer form
    (t*n+9) div 10 gives 3. With values 1..10 the two pick different
    order statistics — pin the integer answer."""
    df = spark.createDataFrame(
        [("x", float(i)) for i in range(1, 11)], "k string, v double"
    )
    got = {
        r["q"]: r["value"]
        for r in exact_quantiles_by_key(df, ["k"], "v", tenths=[3]).collect()
    }
    assert got == {0.3: 3.0}


def test_sampled_quantiles_match_python_replica_and_dkw(spark):
    """The sketch estimate must equal a Python replica of the SAME
    bottom-k sample (md5-prefix hash, (h, v) order, integer ranks), and
    its rank error must sit inside the DKW band for k=256."""

    def h60(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    n = 4000
    rows = [("g", i, float((i * 37) % 1000)) for i in range(n)]
    df = spark.createDataFrame(rows, "k string, rid long, v double")
    h = F.conv(
        F.substring(F.md5(F.concat_ws("_", F.col("rid").cast("string"))), 1, 15),
        16,
        10,
    ).cast("long")

    got = {
        r["q"]: (r["est"], r["n_sample"])
        for r in sampled_quantiles_by_key(df, ["k"], h, "v", k=256).collect()
    }
    sample = sorted(
        (h60(f"{rid}"), v) for _, rid, v in rows
    )[:256]
    svals = sorted(v for _, v in sample)
    m = len(svals)
    all_sorted = sorted(v for _, _, v in rows)
    for t in range(1, 10):
        est, got_m = got[t / 10.0]
        assert got_m == m == 256
        assert est == svals[max(1, (t * m + 9) // 10) - 1], t
        # DKW sanity: the estimate's true rank is within ~3*sqrt(1/2k)
        # of q (3 sigma; deterministic fixture, no flake)
        import bisect

        true_rank = bisect.bisect_right(all_sorted, est) / n
        assert abs(true_rank - t / 10) < 3 * (1 / (2 * 256)) ** 0.5, (
            t,
            true_rank,
        )


def test_quantiles_rejects_bad_tenths(spark):
    df = spark.createDataFrame([("a", 1.0)], "k string, v double")
    with pytest.raises(ValueError):
        exact_quantiles_by_key(df, ["k"], "v", tenths=[0])
    with pytest.raises(ValueError):
        exact_quantiles_by_key(df, ["k"], "v", tenths=[])


def test_quantiles_reject_reserved_key_columns(spark):
    """A key column named like an internal/output column must raise up
    front (same contract as keyed_prefix_sum/pack_sequences), not turn
    into an ambiguous reference deep in the plan."""
    df = spark.createDataFrame([("a", 1.0)], "t string, v double")
    with pytest.raises(ValueError, match="reserved"):
        exact_quantiles_by_key(df, ["t"], "v")
    with pytest.raises(ValueError, match="reserved"):
        sampled_quantiles_by_key(df, ["t"], F.lit(1), "v")
