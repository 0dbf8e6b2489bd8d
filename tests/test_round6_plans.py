"""Formula-level tests for the round-6 plans.

The parity gate proves Spark and DuckDB agree — but they both implement
the SAME subset-trick formula, so a shared derivation error would pass
it. These tests validate the formula against a brute-force numpy
reference: the textbook two-sample KS sup evaluated over the full union
grid of observed values.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from .conftest import SF_SMALL


def _brute_ks(slice_vals: np.ndarray, ref_vals: np.ndarray) -> float:
    """sup_x |ECDF_slice(x) - ECDF_ref(x)| over the union of points,
    right-continuous ECDFs evaluated at every observed point."""
    grid = np.unique(np.concatenate([slice_vals, ref_vals]))
    fs = np.searchsorted(np.sort(slice_vals), grid, side="right") / len(
        slice_vals
    )
    fr = np.searchsorted(np.sort(ref_vals), grid, side="right") / len(
        ref_vals
    )
    return float(np.max(np.abs(fs - fr)))


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_ks_time_sliced_matches_brute_force(spark, seed):
    """The slice-points-only evaluation (at and just before each slice
    jump) must equal the full union-grid sup — including with heavy
    ties, which stress the inclusive/exclusive CDF split."""
    from datalakeingestion_spark.operators.packing import keyed_prefix_sum

    rng = np.random.default_rng(seed)
    n = 400
    types = rng.choice(["a", "b"], size=n)
    weeks = rng.integers(0, 4, size=n)
    # low-cardinality values -> many ties (the hard case); a continuous
    # draw mixed in covers the no-ties case
    vals = np.where(
        rng.random(n) < 0.5,
        rng.integers(0, 8, size=n).astype("float64"),
        np.round(rng.normal(size=n), 3),
    )
    rows = [
        (str(t), int(w), float(v)) for t, w, v in zip(types, weeks, vals)
    ]
    df = spark.createDataFrame(rows, "event_type string, wk long, v double")

    # replicate the plan's computation on the synthetic frame
    sh = df.groupBy("event_type", "wk", "v").agg(
        F.count(F.lit(1)).alias("c")
    )
    rh = sh.groupBy("event_type", "v").agg(F.sum("c").alias("rc"))
    rcum = keyed_prefix_sum(rh, ["event_type"], ["v"], "rc", out_col="rcum")
    scum = keyed_prefix_sum(
        sh, ["event_type", "wk"], ["v"], "c", out_col="scum"
    )
    nr = rh.groupBy("event_type").agg(F.sum("rc").cast("double").alias("n_r"))
    ns = sh.groupBy("event_type", "wk").agg(
        F.sum("c").cast("double").alias("n_s")
    )
    d = F.greatest(
        F.abs(F.col("scum") / F.col("n_s") - F.col("rcum") / F.col("n_r")),
        F.abs(
            (F.col("scum") - F.col("c")) / F.col("n_s")
            - (F.col("rcum") - F.col("rc")) / F.col("n_r")
        ),
    )
    got = {
        (r["event_type"], r["wk"]): r["ks"]
        for r in (
            scum.join(rcum.select("event_type", "v", "rc", "rcum"),
                      ["event_type", "v"])
            .join(ns, ["event_type", "wk"])
            .join(nr, ["event_type"])
            .groupBy("event_type", "wk")
            .agg(F.max(d).alias("ks"))
            .collect()
        )
    }

    for t in ("a", "b"):
        ref = vals[types == t]
        for w in range(4):
            sl = vals[(types == t) & (weeks == w)]
            if len(sl) == 0:
                assert (t, w) not in got
                continue
            assert got[(t, w)] == pytest.approx(
                _brute_ks(sl, ref), abs=1e-12
            ), (t, w)


@pytest.mark.smoke
def test_ks_time_sliced_plan_has_no_per_type_window(spark):
    """ks_drift_time_sliced's scale contract: every window in its plan
    is keyed_prefix_sum's per-(range-bucket, key) form (_pid in the
    spec) — never PARTITION BY event_type alone, which would put a
    whole type in one task — and the size frames join as broadcasts."""
    from datalakeingestion_spark.plans.registry import (
        REGISTRY,
        _ensure_loaded,
    )

    _ensure_loaded()
    df = REGISTRY["ks_drift_time_sliced"].fn(spark, SF_SMALL)
    plan = df._jdf.queryExecution().executedPlan().toString()
    specs = [
        ln for ln in plan.splitlines() if "windowspecdefinition" in ln
    ]
    assert specs, plan
    assert all("_pid" in ln for ln in specs), specs
    assert "BroadcastHashJoin" in plan, plan


def test_ks_sample_matches_numpy_two_sample_ks(spark):
    """The array-tail sup formula (evaluate |F_S - F_R| at every union
    point, inclusive) must equal an independent numpy two-sample KS on
    the SAME sample sets — the oracle alone can't catch a shared
    derivation error in the sup. Heavy ties included."""
    import numpy as np

    from datalakeingestion_spark.streaming.drift import (
        reference_sample,
        windowed_ks_sample,
    )

    rng = np.random.default_rng(23)
    rows = []
    eid = 0
    # three weeks with different distributions, coarse-quantized values
    # so ties are common (the hard case for CDF sup formulas)
    for w, (mu, sd) in enumerate([(50, 10), (50, 10), (80, 25)]):
        for _ in range(400):
            v = float(np.round(rng.normal(mu, sd) / 5) * 5)
            rows.append((eid, w * 604800 + int(rng.integers(0, 604800)), v))
            eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, es long, value double"
    ).select(
        "event_id",
        F.col("es").cast("timestamp").alias("ts"),
        "value",
    )
    ref = reference_sample(
        df.filter(F.col("es") < 2 * 604800), "value", "event_id", k=64
    )
    ref_vals = np.sort([r["v"] for r in ref.collect()])
    out = {
        r["window_start_s"]: r
        for r in windowed_ks_sample(
            df, ref, "value", "ts", "event_id", k=64, hash_cap=1 << 58
        ).collect()
    }
    assert len(out) == 3

    # reproduce each window's bottom-k sample independently and take the
    # numpy sup over a dense union grid
    import hashlib

    def h60(x):
        return int(hashlib.md5(str(x).encode()).hexdigest()[:15], 16)

    for w in (0, 1, 2):
        in_w = [
            (h60(e), v)
            for (e, es, v) in rows
            if w * 604800 <= es < (w + 1) * 604800 and h60(e) < (1 << 58)
        ]
        samp = np.sort([v for _, v in sorted(in_w)[:64]])
        grid = np.union1d(samp, ref_vals)
        fs = np.searchsorted(samp, grid, side="right") / len(samp)
        fr = np.searchsorted(ref_vals, grid, side="right") / len(ref_vals)
        want = np.max(np.round(np.abs(fs - fr), 6))
        got = out[w * 604800]
        assert got["n_sample"] == len(samp)
        assert abs(got["ks_sample"] - want) < 1e-9, (w, got, want)
    # drift sanity: week 2's shifted distribution scores highest
    ks = {w: out[w * 604800]["ks_sample"] for w in (0, 1, 2)}
    assert ks[2] == max(ks.values()) and ks[2] > 0.2


def test_ks_sample_cap_edge_cases(spark):
    """m = 0 (every row hashes over the cap) must emit NULL ks — never
    an ANSI divide-by-zero — and a cap admitting ≥ k rows must produce
    EXACTLY the uncapped bottom-k result (the k smallest hashes all lie
    under any cap that admits k rows)."""
    import pytest as _pytest

    from datalakeingestion_spark.streaming.drift import (
        reference_sample,
        windowed_ks_sample,
    )

    df = (
        spark.range(500)
        .select(
            F.col("id").alias("event_id"),
            (F.col("id") * 600 + 10).cast("timestamp").alias("ts"),
            (F.col("id") % 97).cast("double").alias("value"),
        )
    )
    ref = reference_sample(df, "value", "event_id", k=32)

    capped = windowed_ks_sample(
        df, ref, "value", "ts", "event_id", k=32, hash_cap=1 << 58
    ).collect()
    uncapped = windowed_ks_sample(
        df, ref, "value", "ts", "event_id", k=32, hash_cap=None
    ).collect()
    as_map = lambda rows: {
        r["window_start_s"]: (r["n_events"], r["n_sample"], r["ks_sample"])
        for r in rows
    }
    assert as_map(capped) == as_map(uncapped)
    assert all(r["n_sample"] == 32 for r in capped)

    zero = windowed_ks_sample(
        df, ref, "value", "ts", "event_id", k=32, hash_cap=1
    ).collect()
    assert all(r["ks_sample"] is None and r["n_sample"] == 0 for r in zero)
    assert all(r["n_events"] > 0 for r in zero)

    with _pytest.raises(ValueError, match="nonempty reference"):
        windowed_ks_sample(df.limit(0), ref.limit(0), "value")
