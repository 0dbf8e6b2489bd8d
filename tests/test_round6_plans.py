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
