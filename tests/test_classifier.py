"""Trainable hard-sigmoid logistic classifier tests
(operators/classifier.py).

The training math is pinned against a pure-Python replica (same
left-associated double arithmetic, same per-row 9-dp HALF_UP rounding,
same exact-decimal gradient sums — the DSIR-twin pattern), plus
order-independence under repartitioning, learning-direction on planted
separable data, and the empty-frame contract.
"""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

import pytest

from datalakeingestion_spark.operators.classifier import (
    hard_sigmoid,
    logistic_train_hard_sigmoid,
    score,
)


def _py_train(rows, steps=3, lr=8.0):
    """Exact replica of logistic_train_hard_sigmoid over (y, [x..]) rows."""
    d = len(rows[0][1])
    w = [0.0] * (d + 1)
    n = len(rows)
    for _ in range(steps):
        sums = [Decimal(0)] * (d + 1)
        for y, xs in rows:
            z = w[0]
            for wj, x in zip(w[1:], xs):
                z = z + wj * x
            p = max(0.0, min(1.0, 0.25 * z + 0.5))
            if -2.0 < z < 2.0:
                err = p - y
                terms = [(err * 0.25) * 1.0] + [(err * 0.25) * x for x in xs]
            else:
                terms = [0.0] * (d + 1)
            for j, t in enumerate(terms):
                sums[j] += Decimal(repr(t)).quantize(
                    Decimal("1e-9"), ROUND_HALF_UP
                )
        w = [wj - lr * (float(s) / n) for wj, s in zip(w, sums)]
    return w


# planted, linearly separable on x1: y = 1 iff x1 > 0.5 (x2 is noise)
_ROWS = [
    (1.0, [0.9, 0.2]),
    (1.0, [0.8, 0.7]),
    (1.0, [0.7, 0.1]),
    (1.0, [0.95, 0.55]),
    (0.0, [0.1, 0.6]),
    (0.0, [0.2, 0.15]),
    (0.0, [0.3, 0.8]),
    (0.0, [0.05, 0.4]),
]


def _feats_df(spark, rows=_ROWS):
    return spark.createDataFrame(
        [(y, x[0], x[1]) for y, x in rows], "y double, x1 double, x2 double"
    )


@pytest.mark.smoke
def test_train_matches_pure_python_twin_exactly(spark):
    w = logistic_train_hard_sigmoid(
        _feats_df(spark), ["x1", "x2"], steps=3, lr=8.0
    )
    assert w == _py_train(_ROWS, steps=3, lr=8.0)


def test_weights_are_partitioning_independent(spark):
    df = _feats_df(spark)
    w1 = logistic_train_hard_sigmoid(df.coalesce(1), ["x1", "x2"])
    w7 = logistic_train_hard_sigmoid(df.repartition(7), ["x1", "x2"])
    assert w1 == w7


def test_learns_the_separating_feature(spark):
    df = _feats_df(spark)
    w = logistic_train_hard_sigmoid(df, ["x1", "x2"], steps=12, lr=8.0)
    # x1 separates the classes — its weight must dominate the noise
    # feature's, and thresholded scores must classify the planted rows
    assert w[1] > 0.5
    assert abs(w[1]) > abs(w[2])
    scored = df.withColumn("s", score(w, ["x1", "x2"])).collect()
    acc = sum((r["s"] >= 0.5) == (r["y"] == 1.0) for r in scored)
    assert acc == len(_ROWS)


def test_flat_region_contributes_zero_gradient(spark):
    # all-positive frame driven by a huge prior weight: z far outside
    # (-2, 2) means the hard sigmoid is flat -> gradients are exactly 0
    df = spark.createDataFrame([(1.0, 100.0)] * 4, "y double, x1 double")
    from datalakeingestion_spark.operators import classifier as C

    w0 = [0.0, 1.0]  # z = 100 for every row
    z = C._z_expr(w0, ["x1"])
    import pyspark.sql.functions as F

    p = hard_sigmoid(z)
    row = df.agg(
        F.sum(F.when((z > -2.0) & (z < 2.0), (p - F.col("y")) * 0.25)
              .otherwise(0.0)).alias("g")
    ).collect()[0]
    assert row["g"] == 0.0


def test_empty_frame_raises(spark):
    empty = spark.createDataFrame([], "y double, x1 double")
    with pytest.raises(ValueError, match="empty"):
        logistic_train_hard_sigmoid(empty, ["x1"])
