"""Distributed trainable quality classifier: hard-sigmoid logistic GD.

The trainable half of the quality-scoring surface
(``text_analysis.quality_logistic`` applies FIXED weights): batch
gradient descent for a logistic-style classifier, the fastText-shaped
"train a cheap classifier on weak labels" step of CC-Net / RefinedWeb
style curation pipelines.

Exactness design (the same order-independence discipline as the decimal
centroid means in ``ivf.train_centroids``): the link is the HARD sigmoid
``clamp(0.25·z + 0.5, 0, 1)`` — a standard fast logistic approximation —
so every per-row quantity is built from +,·,/,clamp over doubles (no
transcendentals → both engines compute bit-identical row values from
identical inputs), and the only order-sensitive step, the gradient SUM,
is rounded per-row and accumulated in exact decimal. Weights are
therefore deterministic regardless of partitioning, and a SQL oracle can
reproduce training exactly by unrolling the iterations as CTEs.

Gradient (squared loss through the hard sigmoid): dL/dw_j over rows =
mean( (p - y) · 0.25 · x_j ) where the 0.25 slope is active only for
z ∈ (-2, 2) (outside, the hard sigmoid is flat → zero gradient).

Scale shape (100 TB corpus): each step is ONE full scan with a
partial-aggregatable (d+1)-column sum — map-side combine does almost all
the work; the driver holds only the (d+1) weight scalars between steps
(control-plane sized collect, the HITS/BPE iterative-operator pattern).
No shuffle beyond the aggregate's single exchange; no per-row Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hard_sigmoid(z: Column) -> Column:
    """clamp(0.25·z + 0.5, 0, 1) — the piecewise-linear logistic link."""
    return F.greatest(
        F.lit(0.0), F.least(F.lit(1.0), F.lit(0.25) * z + F.lit(0.5))
    )


def _z_expr(weights: list[float], feature_cols: list[str]) -> Column:
    """w0 + w1·x1 + … left-associated — the oracle writes the identical
    association order, so the doubles match bit-for-bit."""
    if len(weights) != len(feature_cols) + 1:
        raise ValueError(
            f"expected {len(feature_cols) + 1} weights (bias + one per "
            f"feature), got {len(weights)}"
        )
    z = F.lit(float(weights[0]))
    for wj, c in zip(weights[1:], feature_cols):
        z = z + F.lit(float(wj)) * F.col(c)
    return z


def logistic_train_hard_sigmoid(
    feats: DataFrame,
    feature_cols: list[str],
    label_col: str = "y",
    steps: int = 3,
    lr: float = 8.0,
    round_dp: int = 9,
) -> list[float]:
    """Train ``steps`` full-batch GD iterations from w=0; returns
    ``[bias, w_1, …, w_d]`` as plain floats.

    ``feats``'s feature/label columns must be DOUBLE. ``lr`` should be a
    binary-exact float (8.0, 4.0, 0.5, …) so the weight update is the
    same double operation on every engine. Per-row gradient terms are
    rounded to ``round_dp`` then summed in DECIMAL(28,9) — keep
    |sum| < ~2^53/10^9 ≈ 9e6 (any corpus whose per-row terms are O(1)
    and row count < ~10^6 per unit magnitude is safe; terms here are
    ≤ 0.25·max|x|).
    """
    w = [0.0] * (len(feature_cols) + 1)
    for _ in range(steps):
        z = _z_expr(w, feature_cols)
        p = hard_sigmoid(z)
        active = (z > F.lit(-2.0)) & (z < F.lit(2.0))
        err = p - F.col(label_col)
        xs: list[Column] = [F.lit(1.0)] + [F.col(c) for c in feature_cols]
        aggs = [F.count(F.lit(1)).alias("n")]
        for j, x in enumerate(xs):
            term = F.when(active, (err * F.lit(0.25)) * x).otherwise(F.lit(0.0))
            aggs.append(
                F.sum(F.round(term, round_dp).cast("decimal(28,9)")).alias(f"s{j}")
            )
        row = feats.agg(*aggs).collect()[0]
        n = row["n"]
        if n == 0:
            raise ValueError("cannot train on an empty frame")
        # float(Decimal) is correctly rounded; with |unscaled| < 2^53 it
        # matches DuckDB's CAST(sum AS DOUBLE) exactly (see module doc)
        w = [wj - lr * (float(row[f"s{j}"]) / n) for j, wj in enumerate(w)]
    return w


def score(weights: list[float], feature_cols: list[str]) -> Column:
    """Hard-sigmoid score under trained weights (a plain codegen
    expression — apply with ``df.withColumn('score', score(w, cols))``)."""
    return hard_sigmoid(_z_expr(weights, feature_cols))
