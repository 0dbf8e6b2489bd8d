"""Groupwise OLS from sufficient statistics (operators/profiling.py)."""

from __future__ import annotations

import numpy as np
import pytest

from datalakeingestion_spark.operators.profiling import groupwise_ols


@pytest.mark.smoke
def test_ols_matches_numpy_per_group(spark):
    rng = np.random.default_rng(7)
    rows = []
    for g, (a, b) in {"g1": (2.5, 10.0), "g2": (-1.25, 3.0)}.items():
        x = rng.uniform(0, 100, 400).round(2)
        y = (a * x + b + rng.normal(0, 5, 400)).round(2)
        rows += [(g, float(xi), float(yi)) for xi, yi in zip(x, y)]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    got = {r["g"]: r for r in groupwise_ols(df, ["g"], "x", "y").collect()}
    for g in ("g1", "g2"):
        xs = np.array([x for gg, x, _ in rows if gg == g])
        ys = np.array([y for gg, _, y in rows if gg == g])
        slope, intercept = np.polyfit(xs, ys, 1)
        r = got[g]
        assert r["n"] == 400
        assert abs(r["slope"] - slope) < 1e-6
        assert abs(r["intercept"] - intercept) < 1e-5
        corr = np.corrcoef(xs, ys)[0, 1]
        assert abs(r["r2"] - corr**2) < 1e-9


def test_ols_degenerate_group_yields_nulls(spark):
    df = spark.createDataFrame(
        [("g", 5.0, 1.0), ("g", 5.0, 2.0), ("g", 5.0, 3.0)],
        "g string, x double, y double",
    )
    r = groupwise_ols(df, ["g"], "x", "y").collect()[0]
    assert r["slope"] is None and r["intercept"] is None and r["r2"] is None
    assert r["n"] == 3


def test_mad_matches_python_reference(spark):
    from datalakeingestion_spark.operators.profiling import mad_outliers

    vals = {
        "g1": [10.0, 12.0, 11.0, 13.0, 100.0, 11.5, 12.5],
        "g2": [5.0, 5.0, 5.0, 5.0],
    }
    rows = [(g, v) for g, vs in vals.items() for v in vs]
    df = spark.createDataFrame(rows, "g string, v double")
    got = {r["g"]: r for r in mad_outliers(df, ["g"], "v").collect()}

    for g, vs in vals.items():
        s = sorted(vs)
        n = len(s)
        med = s[(n + 1) // 2 - 1]  # lower median, 1-based (n+1) div 2
        devs = sorted(abs(v - med) for v in vs)
        mad = devs[(n + 1) // 2 - 1]
        outliers = sum(1 for v in vs if abs(v - med) > 3 * mad)
        r = got[g]
        assert r["n"] == n
        assert float(r["median"]) == med
        assert float(r["mad"]) == mad
        assert r["n_outliers"] == outliers
    # g1's planted 100.0 must be flagged
    assert got["g1"]["n_outliers"] == 1
    # constant group: mad 0, nothing beyond the fence
    assert float(got["g2"]["mad"]) == 0.0 and got["g2"]["n_outliers"] == 0


def test_ols_overflow_never_corrupts_silently(spark):
    # a value too wide for the decimal cast must never yield a WRONG fit:
    # under ANSI (Spark 4 default) the cast raises; under non-ANSI it
    # becomes NULL, vanishing from the sums while still counted in n —
    # the _nx/_ny guard then nulls the fit instead
    import pyspark.errors

    df = spark.createDataFrame(
        [("g", 1.0, 1.0), ("g", 2.0, 2.0), ("g", 1e15, 1e15)],
        "g string, x double, y double",
    )
    ansi = spark.conf.get("spark.sql.ansi.enabled", "true") == "true"
    if ansi:
        with pytest.raises(pyspark.errors.exceptions.base.PySparkException):
            groupwise_ols(df, ["g"], "x", "y").collect()
        spark.conf.set("spark.sql.ansi.enabled", "false")
    try:
        r = groupwise_ols(df, ["g"], "x", "y").collect()[0]
        assert r["n"] == 3
        assert (
            r["slope"] is None
            and r["intercept"] is None
            and r["r2"] is None
        )
    finally:
        if ansi:
            spark.conf.set("spark.sql.ansi.enabled", "true")


def test_exact_quantiles_match_python(spark):
    import math as _math
    import random as _random
    from decimal import Decimal

    from datalakeingestion_spark.operators.profiling import exact_quantiles

    rng = _random.Random(9)
    rows = [("g", rng.randint(0, 999) / 100.0) for _ in range(777)]
    df = spark.createDataFrame(rows, "g string, v double")
    qs = [("p10", 1, 10), ("p50", 1, 2), ("p95", 19, 20), ("max", 1, 1)]
    r = exact_quantiles(df, ["g"], "v", qs).collect()[0]
    s = sorted(Decimal(f"{v:.2f}") for _, v in rows)
    n = len(s)
    for alias, num, den in qs:
        rank = (num * n + den - 1) // den
        assert Decimal(r[alias]) == s[rank - 1], alias
    assert r["n"] == n


def test_exact_quantiles_validates_input(spark):
    from datalakeingestion_spark.operators.profiling import exact_quantiles

    df = spark.createDataFrame([("g", 1.0)], "g string, v double")
    with pytest.raises(ValueError):
        exact_quantiles(df, ["g"], "v", [])
    with pytest.raises(ValueError):
        exact_quantiles(df, ["g"], "v", [("bad", 3, 2)])


def test_quantile_map_identity_and_shift(spark):
    from datalakeingestion_spark.operators.profiling import (
        quantile_map_to_global,
    )

    # group "a" == the global distribution (only group) -> identity map
    rows = [("a", v) for v in [1, 1, 2, 3, 5, 8, 8, 9]]
    df = spark.createDataFrame(rows, "g string, v long")
    out = {
        (r["g"], r["v"]): r["mapped"]
        for r in quantile_map_to_global(df, "g", "v").collect()
    }
    for _, v in rows:
        assert out[("a", v)] == v

    # a shifted group maps onto the pooled distribution monotonically
    rows2 = [("lo", v) for v in [1, 2, 3, 4]] + [
        ("hi", v) for v in [101, 102, 103, 104]
    ]
    df2 = spark.createDataFrame(rows2, "g string, v long")
    out2 = {
        (r["g"], r["v"]): r["mapped"]
        for r in quantile_map_to_global(df2, "g", "v").collect()
    }
    # each group spans the FULL pooled range after mapping
    assert out2[("lo", 4)] == 104 and out2[("hi", 104)] == 104
    assert out2[("lo", 1)] < out2[("lo", 4)]
    assert out2[("hi", 101)] < out2[("hi", 104)]
    # mapping is monotone within each group
    for g, vals in (("lo", [1, 2, 3, 4]), ("hi", [101, 102, 103, 104])):
        mapped = [out2[(g, v)] for v in vals]
        assert mapped == sorted(mapped)


# ---------------------------------------------------------------------------
# gini_from_values (exact histogram Gini)
# ---------------------------------------------------------------------------


def _py_gini(values):
    xs = sorted(values)
    n = len(xs)
    s = sum(xs)
    if n <= 1 or s == 0:
        return 0.0
    num = 2 * sum((i + 1) * x for i, x in enumerate(xs))
    return round(num / (n * s) - (n + 1) / n, 6)


def test_gini_known_and_bruteforce(spark):
    from datalakeingestion_spark.operators.profiling import gini_from_values

    groups = {
        "uniform": [5, 5, 5, 5],          # perfect equality -> 0
        "extreme": [0, 0, 0, 10],         # one holder -> 0.75
        "mixed": [1, 2, 3, 4, 5, 30],
        "single": [7],                    # convention: 0
        "zeros": [0, 0, 0],               # total 0 -> convention 0
    }
    rows = [(g, v) for g, vs in groups.items() for v in vs]
    df = spark.createDataFrame(rows, "grp string, val long")
    got = {
        r["grp"]: (r["n"], r["total"], r["gini"])
        for r in gini_from_values(df, "val", ["grp"]).collect()
    }
    for g, vs in groups.items():
        assert got[g][0] == len(vs)
        assert got[g][1] == sum(vs)
        assert got[g][2] == _py_gini(vs), g
    assert got["uniform"][2] == 0.0
    assert got["extreme"][2] == 0.75


def test_gini_nulls_excluded(spark):
    """NULL values are dropped BEFORE the histogram: n/total/gini all see
    only non-null rows (previously a null row inflated n while vanishing
    from total/_num, skewing the coefficient)."""
    from datalakeingestion_spark.operators.profiling import gini_from_values

    vals = [1, 2, 3, 4, 5, 30]
    rows = [("g", v) for v in vals] + [("g", None), ("g", None)]
    df = spark.createDataFrame(rows, "grp string, val long")
    [row] = gini_from_values(df, "val", ["grp"]).collect()
    assert (row["n"], row["total"], row["gini"]) == (
        len(vals), sum(vals), _py_gini(vals),
    )
    # an all-null group produces NO output row (no non-null values)
    df2 = spark.createDataFrame(
        [("a", 1), ("b", None)], "grp string, val long"
    )
    out = {r["grp"] for r in gini_from_values(df2, "val", ["grp"]).collect()}
    assert out == {"a"}


def test_gini_ungrouped_matches_grouped(spark):
    from datalakeingestion_spark.operators.profiling import gini_from_values

    vals = [3, 1, 4, 1, 5, 9, 2, 6]
    df = spark.createDataFrame([(v,) for v in vals], "val long")
    [row] = gini_from_values(df, "val").collect()
    assert (row["n"], row["total"], row["gini"]) == (
        len(vals), sum(vals), _py_gini(vals),
    )


def test_column_association_known_cases(spark):
    import math

    from datalakeingestion_spark.operators.profiling import (
        column_association,
    )

    # perfect association: b is a function of a (2x2, balanced)
    perfect = spark.createDataFrame(
        [("x", "p")] * 5 + [("y", "q")] * 5, "a string, b string"
    )
    r = column_association(perfect, "a", "b").collect()[0]
    assert (r["n"], r["k_a"], r["k_b"]) == (10, 2, 2)
    assert r["cramers_v"] == 1.0
    assert r["mi"] == round(math.log(2), 6)  # H(b) = ln 2, fully shared

    # independence: every (a, b) cell equal -> MI 0, chi2 0, V 0
    indep = spark.createDataFrame(
        [(a, b) for a in "xy" for b in "pq" for _ in range(5)],
        "a string, b string",
    )
    r = column_association(indep, "a", "b").collect()[0]
    assert r["mi"] == 0.0 and r["chi2"] == 0.0 and r["cramers_v"] == 0.0

    # constant column: V undefined -> NULL, MI 0
    const = spark.createDataFrame(
        [("x", "p"), ("y", "p")], "a string, b string"
    )
    r = column_association(const, "a", "b").collect()[0]
    assert r["cramers_v"] is None and r["mi"] == 0.0

    # NULL categories count as a group on both engines
    withnull = spark.createDataFrame(
        [("x", None)] * 3 + [("y", "p")] * 3, "a string, b string"
    )
    r = column_association(withnull, "a", "b").collect()[0]
    assert (r["k_a"], r["k_b"], r["cramers_v"]) == (2, 2, 1.0)
