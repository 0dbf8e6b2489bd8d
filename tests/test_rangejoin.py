"""Unit + property tests for the bucketed interval join and the Count-Min
sketch (edge semantics the parity queries don't isolate: bucket-boundary
points, bucket-aligned interval ends, span guard, CMS overcount-only)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException

from datalakeingestion_spark.operators.rangejoin import interval_join
from datalakeingestion_spark.operators.sketches import cms_estimate, cms_sketch


def _pairs(spark, points, intervals, width, keys=()):
    l = spark.createDataFrame([(i, p) for i, p in points], ["lid", "pt"])
    r = spark.createDataFrame(
        [(j, s, e) for j, s, e in intervals], ["rid", "s", "e"]
    )
    out = interval_join(
        l,
        r,
        left_point=F.col("pt"),
        right_start=F.col("s"),
        right_end=F.col("e"),
        bucket_width_us=width,
        keys=keys,
    )
    return sorted((row["lid"], row["rid"]) for row in out.collect())


@pytest.mark.smoke
def test_interval_join_boundary_semantics(spark):
    # half-open [s, e): start inclusive, end exclusive; matches that cross
    # a bucket boundary are found; bucket-aligned ends don't over-explode.
    points = [(1, 100), (2, 199), (3, 200), (4, 249), (5, 99), (6, 250)]
    intervals = [
        (10, 100, 200),  # bucket-aligned [100, 200) with width 100
        (11, 150, 250),  # crosses the 200 boundary
    ]
    got = _pairs(spark, points, intervals, width=100)
    # 100 ∈ [100,200) (start inclusive); 200 ∉ [100,200) but ∈ [150,250);
    # 249 is the last point of [150,250); 250 ∉ [150,250) (end exclusive)
    assert got == [(1, 10), (2, 10), (2, 11), (3, 11), (4, 11)]


def test_interval_join_exact_vs_naive_random(spark):
    import random

    rng = random.Random(7)
    points = [(i, rng.randrange(0, 10_000)) for i in range(300)]
    intervals = []
    for j in range(120):
        s = rng.randrange(0, 10_000)
        intervals.append((j + 1000, s, s + rng.randrange(1, 500)))
    got = _pairs(spark, points, intervals, width=500)
    expected = sorted(
        (i, j)
        for i, p in points
        for j, s, e in intervals
        if s <= p < e
    )
    assert got == expected


def test_interval_join_span_guard_raises(spark):
    l = spark.createDataFrame([(1, 5)], ["lid", "pt"])
    r = spark.createDataFrame([(2, 0, 1000)], ["rid", "s", "e"])
    out = interval_join(
        l, r, F.col("pt"), F.col("s"), F.col("e"), bucket_width_us=100
    )
    with pytest.raises(Exception, match="exceeds bucket width"):
        out.collect()


def test_interval_join_rejects_reserved_columns(spark):
    # scratch columns would silently shadow caller columns of the same
    # name (withColumn replaces) — the guard fails loudly instead
    l = spark.createDataFrame([(1, 5, 9)], ["lid", "pt", "__pt"])
    r = spark.createDataFrame([(2, 0, 100)], ["rid", "s", "e"])
    with pytest.raises(ValueError, match="reserved scratch"):
        interval_join(l, r, F.col("pt"), F.col("s"), F.col("e"), 100)
    l2 = spark.createDataFrame([(1, 5)], ["lid", "pt"])
    r2 = spark.createDataFrame([(2, 0, 100, 7)], ["rid", "s", "e", "__iv_s"])
    with pytest.raises(ValueError, match="reserved scratch"):
        interval_join(l2, r2, F.col("pt"), F.col("s"), F.col("e"), 100)


def test_cap_tokens_rejects_running_column(spark):
    from datalakeingestion_spark.operators.sampling import cap_tokens_per_group

    df = spark.createDataFrame([("a", 1, 5)], ["g", "_running", "toks"])
    with pytest.raises(ValueError, match="_running"):
        cap_tokens_per_group(df, "g", "toks", 10, ["g"])


def test_interval_join_keyed_restricts_pairs(spark):
    l = spark.createDataFrame([(1, "a", 50), (2, "b", 50)], ["lid", "k", "pt"])
    r = spark.createDataFrame([(9, "a", 0, 100)], ["rid", "rk", "s", "e"])
    out = interval_join(
        l,
        r,
        F.col("pt"),
        F.col("s"),
        F.col("e"),
        bucket_width_us=100,
        keys=[("k", "rk")],
    )
    assert [(row["lid"], row["rid"]) for row in out.collect()] == [(1, 9)]


def test_cms_overcounts_never_undercounts(spark):
    # 5k values over a 257-value universe into a deliberately small grid:
    # estimates must be >= true counts (CMS guarantee), and with depth 4
    # most probes should be exact or near-exact.
    vals = [(f"v{i % 257}",) for i in range(5000)]
    df = spark.createDataFrame(vals, ["x"])
    sketch = cms_sketch(df, "x", depth=4, width=512)
    probes = spark.createDataFrame([(f"v{i}",) for i in range(0, 257, 16)], ["t"])
    est = {
        r["term"]: r["est_count"]
        for r in cms_estimate(sketch, probes, "t", depth=4, width=512).collect()
    }
    true = {}
    for (v,) in vals:
        true[v] = true.get(v, 0) + 1
    for term, e in est.items():
        assert e >= true[term], term
        assert e <= true[term] + 5000 * 2 // 512, term  # CMS error bound


def test_cms_sketch_merges_additively(spark):
    # sketches over disjoint halves, merged cell-wise == sketch of the whole
    vals = [(f"v{i % 50}",) for i in range(2000)]
    whole = spark.createDataFrame(vals, ["x"])
    h1 = spark.createDataFrame(vals[:1000], ["x"])
    h2 = spark.createDataFrame(vals[1000:], ["x"])
    s_whole = cms_sketch(whole, "x")
    merged = (
        cms_sketch(h1, "x")
        .unionByName(cms_sketch(h2, "x"))
        .groupBy("d", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    a = {(r["d"], r["bucket"]): r["cnt"] for r in s_whole.collect()}
    b = {(r["d"], r["bucket"]): r["cnt"] for r in merged.collect()}
    assert a == b


def test_sketches_ignore_nulls(spark):
    # NULL values must not perturb KMV (nulls-first vs nulls-last engine
    # divergence) or occupy unreachable CMS cells.
    from datalakeingestion_spark.operators.sketches import (
        kmv_distinct_by_group,
        kmv_distinct_estimate,
    )

    df = spark.createDataFrame(
        [("a", "x"), ("a", None), ("a", "y"), ("b", None)], ["g", "v"]
    )
    est = kmv_distinct_estimate(df, "v", k=8).collect()[0]
    assert est["est_distinct"] == 2
    by_g = {
        r["g"]: r["est_distinct"]
        for r in kmv_distinct_by_group(df, ["g"], "v", k=8).collect()
    }
    # groups whose values are ALL NULL disappear (documented divergence
    # from SQL's COUNT(DISTINCT), which would emit a 0 row)
    assert by_g == {"a": 2}

    sk = cms_sketch(spark.createDataFrame([("x",), (None,)], ["v"]), "v")
    assert sk.agg(F.sum("cnt")).collect()[0][0] == 3  # depth cells for 'x' only


def test_approx_percentiles_close_to_exact(spark):
    # g7 now EMITS its error-bound contract (exact quantiles +
    # within_1pct verdict) so the driver oracle can assert it; this test
    # independently recomputes the raw approx error at a TIGHTER budget
    # and cross-checks the emitted exact values against g3.
    from pyspark.sql import functions as F2
    from datalakeingestion_spark.plans.registry import REGISTRY, _ensure_loaded
    from datalakeingestion_spark.sources.fixtures import load_table

    _ensure_loaded()
    sf = "/root/testdata/sf0.001"
    g3 = {
        r["o_orderstatus"]: (r["p50"], r["p90"])
        for r in REGISTRY["g3_percentiles"].fn(spark, sf).collect()
    }
    g7 = {
        r["o_orderstatus"]: (r["p50_exact"], r["p90_exact"], r["within_1pct"])
        for r in REGISTRY["g7_approx_percentiles"].fn(spark, sf).collect()
    }
    assert set(g3) == set(g7)
    for k, (p50, p90) in g3.items():
        assert g7[k][0] == p50 and g7[k][1] == p90  # exact twin agrees
        assert g7[k][2] is True  # in-query error verdict holds

    # independent raw-error pin (tighter than the emitted 1% bound)
    orders = load_table(spark, sf, "orders")
    rows = orders.groupBy("o_orderstatus").agg(
        F2.approx_percentile("o_totalprice", F2.lit(0.5), F2.lit(10000)).alias("a50"),
        F2.approx_percentile("o_totalprice", F2.lit(0.9), F2.lit(10000)).alias("a90"),
    ).collect()
    for r in rows:
        e50, e90 = g3[r["o_orderstatus"]]
        assert abs(r["a50"] - e50) / max(abs(e50), 1e-9) < 0.02
        assert abs(r["a90"] - e90) / max(abs(e90), 1e-9) < 0.02


def test_countsketch_unbiased_vs_cms_overcount(spark):
    # same deliberately-small grid as the CMS test: CMS systematically
    # overcounts the uniform stream (collision mass stacks), Count-Sketch
    # stays near the truth (signs cancel) — and never violates its own
    # error envelope.
    from datalakeingestion_spark.operators.sketches import (
        countsketch_estimate,
        countsketch_sketch,
    )

    vals = [(f"v{i % 257}",) for i in range(5000)]
    df = spark.createDataFrame(vals, ["x"])
    probes = spark.createDataFrame([(f"v{i}",) for i in range(0, 257, 16)], ["t"])
    true = {}
    for (v,) in vals:
        true[v] = true.get(v, 0) + 1

    cs = countsketch_sketch(df, "x", depth=5, width=512)
    est = {
        r["term"]: r["est_count"]
        for r in countsketch_estimate(cs, probes, "t", depth=5, width=512).collect()
    }
    errs = [abs(est[t] - true[t]) for t in est]
    # ~19.5 per value; CMS's expected overcount here is ≈ +19 per cell
    # collision (see test_cms_overcounts_never_undercounts's bound);
    # Count-Sketch's median error stays well inside it
    assert sum(errs) / len(errs) < 10, errs
    assert max(errs) < 40, errs


def test_interval_join_multires_exact_vs_naive_mixed_spans(spark):
    import random

    from datalakeingestion_spark.operators.rangejoin import interval_join_multires

    rng = random.Random(11)
    points = [(i, rng.randrange(0, 50_000)) for i in range(400)]
    intervals = []
    for j in range(150):
        s = rng.randrange(0, 50_000)
        # spans spread over ~100×: 10 .. 8000 against base width 100
        span = rng.choice([10, 60, 150, 900, 3000, 8000])
        intervals.append((j + 1000, s, s + span))
    l = spark.createDataFrame(points, ["lid", "pt"])
    r = spark.createDataFrame(intervals, ["rid", "s", "e"])
    out = interval_join_multires(
        l, r, F.col("pt"), F.col("s"), F.col("e"),
        base_width_us=100, max_span_us=8000,
    )
    got = sorted((row["lid"], row["rid"]) for row in out.collect())
    expected = sorted(
        (i, j) for i, p in points for j, s, e in intervals if s <= p < e
    )
    assert got == expected and len(expected) > 100


def test_interval_join_multires_span_guard(spark):
    from datalakeingestion_spark.operators.rangejoin import interval_join_multires

    l = spark.createDataFrame([(1, 5)], ["lid", "pt"])
    r = spark.createDataFrame([(2, 0, 10_000)], ["rid", "s", "e"])
    out = interval_join_multires(
        l, r, F.col("pt"), F.col("s"), F.col("e"),
        base_width_us=100, max_span_us=1000,
    )
    with pytest.raises(Exception, match="exceeds max_span_us"):
        out.collect()


def test_interval_join_drops_empty_and_inverted_intervals(spark):
    points = [(1, 100)]
    intervals = [(10, 100, 100), (11, 200, 150), (12, 100, 101)]
    got = _pairs(spark, points, intervals, width=100)
    assert got == [(1, 12)]  # only the genuine [100,101) matches


def test_estimators_drop_null_probes(spark):
    from datalakeingestion_spark.operators.sketches import (
        countsketch_estimate,
        countsketch_sketch,
    )

    df = spark.createDataFrame([("x",)] * 5, ["v"])
    probes = spark.createDataFrame([("x",), (None,)], ["t"])
    cms = cms_estimate(cms_sketch(df, "v"), probes, "t").collect()
    cs = countsketch_estimate(countsketch_sketch(df, "v"), probes, "t").collect()
    assert {r["term"] for r in cms} == {"x"} and cms[0]["est_count"] == 5
    assert {r["term"] for r in cs} == {"x"} and cs[0]["est_count"] == 5


def test_salted_join_rejects_outer_shapes(spark):
    # right/full outer would duplicate unmatched small rows per salt
    import pytest as _pytest

    from datalakeingestion_spark.operators.skew import salted_join

    big = spark.createDataFrame([(1, "a")], ["k", "v"])
    small = spark.createDataFrame([(1, "x"), (2, "y")], ["k", "w"])
    with _pytest.raises(ValueError, match="duplicated per salt"):
        salted_join(big, small, "k", how="right_outer")
    # anchored shapes still work and stay exact
    assert salted_join(big, small, "k", how="left_semi").count() == 1
    assert salted_join(big, small, "k", how="left_anti").count() == 0


def test_approx_distinct_tracks_exact(spark):
    # a8 now EMITS (exact count, within_5pct verdict) for the driver
    # oracle; independently recompute the raw HLL estimate and pin its
    # error, and cross-check the emitted exact counts.
    from datalakeingestion_spark.plans.registry import REGISTRY, _ensure_loaded
    from datalakeingestion_spark.sources.fixtures import load_table

    _ensure_loaded()
    sf = "/root/testdata/sf0.001"
    emitted = {
        r["l_returnflag"]: (r["exact_parts"], r["within_5pct"])
        for r in REGISTRY["a8_approx_distinct_parts"].fn(spark, sf).collect()
    }
    li = load_table(spark, sf, "lineitem")
    both = {
        r["l_returnflag"]: (r["n"], r["a"])
        for r in li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("n"),
            F.approx_count_distinct("l_partkey", rsd=0.02).alias("a"),
        )
        .collect()
    }
    assert set(emitted) == set(both)
    for k, (n, a) in both.items():
        assert emitted[k][0] == n  # exact twin agrees
        assert emitted[k][1] is True  # in-query error verdict holds
        assert abs(a - n) / n < 0.05, (k, a, n)
