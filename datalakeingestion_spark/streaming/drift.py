"""Windowed distribution-drift monitoring — the streaming face of the
drift screens (`operators/profiling.py::psi_between`,
`plans/round6.py::ks_drift_time_sliced`).

Production shape: a fixed REFERENCE histogram (the training-period
distribution, persisted once) and a live stream whose per-window value
histogram is compared against it — the per-ingest-batch drift alarm.

Streaming constraint that shapes the plan: append-mode output needs ONE
stateful aggregation. A naive per-(window, bin) groupBy would need a
SECOND stateful aggregate for the window totals, so instead one
``groupBy(window)`` computes ALL bin counts as conditional-sum columns
(bin cardinality is fixed and tiny); the total and the per-bin PSI
contributions are then a stateless projection + broadcast join against
the reference. The same function runs unchanged on a batch frame — the
oracle-checked twin (`plans/round6.py::psi_drift_windowed`) and the
stream/batch agreement test both pin it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _windowed_histogram(
    df: DataFrame,
    value_col: str,
    ts_col: str,
    lo: float,
    hi: float,
    n_bins: int,
    window: str,
) -> DataFrame:
    """The ONE stateful aggregation both monitors share: per time window,
    every grid bin's count as a conditional-sum column (append-mode
    streaming allows exactly one stateful aggregate, so the histogram
    must come out of a single groupBy)."""
    from ..operators.profiling import histogram_bin

    nb = n_bins + 2
    v = F.col(value_col)
    return (
        df.filter(v.isNotNull())
        .withColumn("_bin", histogram_bin(v, lo, hi, n_bins))
        .groupBy(F.window(ts_col, window).alias("_w"))
        .agg(
            *[
                F.sum((F.col("_bin") == i).cast("long")).alias(f"_b{i}")
                for i in range(nb)
            ]
        )
    )


def windowed_psi_drift(
    df: DataFrame,
    reference: DataFrame,
    value_col: str,
    ts_col: str = "ts",
    lo: float = 0.0,
    hi: float = 1.0,
    n_bins: int = 10,
    window: str = "7 days",
) -> DataFrame:
    """Per-time-window PSI of ``value_col`` against a STATIC reference.

    ``reference`` must hold (bin, n_ref) exact counts over the same
    fixed grid (n_bins interior bins on [lo, hi) plus under/overflow
    gutters 0 and n_bins+1 — build it with :func:`reference_histogram`).
    Works on a streaming frame (``df`` must carry a watermark on
    ``ts_col``; windows emit when the watermark closes them) and on a
    batch frame identically.

    Output: one row per (window_start_s, bin) with both counts and the
    bin's PSI contribution (p - q)·ln(p/q), add-0.5 smoothed, 6-dp
    rounded — sum over a window's bins for its total PSI. Same
    determinism contract as psi_between: exact long counts in, fixed
    bin cardinality, no cross-partition float summation.
    """
    nb = n_bins + 2
    wincounts = _windowed_histogram(
        df, value_col, ts_col, lo, hi, n_bins, window
    )
    t_win = sum(F.col(f"_b{i}") for i in range(nb))
    exploded = wincounts.select(
        F.col("_w.start").cast("long").alias("window_start_s"),
        t_win.alias("_t_win"),
        F.posexplode(
            F.array(*[F.col(f"_b{i}") for i in range(nb)])
        ).alias("bin", "n_win"),
    )
    tot = reference.agg(F.sum("n_ref").alias("_t_ref"))
    ref = (
        reference.sparkSession.range(nb)
        .select(F.col("id").alias("bin"))
        .join(reference, "bin", "left")
        .select(
            "bin", F.coalesce("n_ref", F.lit(0)).cast("long").alias("n_ref")
        )
        .crossJoin(F.broadcast(tot))
    )
    k = F.lit(0.5)
    nbl = F.lit(float(nb))
    p = (F.col("n_ref") + k) / (F.col("_t_ref") + k * nbl)
    q = (F.col("n_win") + k) / (F.col("_t_win") + k * nbl)
    return exploded.join(F.broadcast(ref), "bin").select(
        "window_start_s",
        "bin",
        F.col("n_ref").cast("long").alias("n_ref"),
        F.col("n_win").cast("long").alias("n_win"),
        F.round((p - q) * F.log(p / q), 6).alias("psi_contrib"),
    )


def reference_histogram(
    df: DataFrame,
    value_col: str,
    lo: float,
    hi: float,
    n_bins: int = 10,
) -> DataFrame:
    """Exact (bin, n_ref) counts of ``value_col`` over the fixed grid —
    the one-time training-period histogram ``windowed_psi_drift``
    compares live windows against. Gutter bins included; absent bins
    are simply missing (the monitor coalesces them to 0)."""
    from ..operators.profiling import histogram_bin

    v = F.col(value_col)
    return (
        df.filter(v.isNotNull())
        .groupBy(
            histogram_bin(v, lo, hi, n_bins).cast("long").alias("bin")
        )
        .agg(F.count(F.lit(1)).alias("n_ref"))
    )


def windowed_ks_grid(
    df: DataFrame,
    reference: DataFrame,
    value_col: str,
    ts_col: str = "ts",
    lo: float = 0.0,
    hi: float = 1.0,
    n_bins: int = 10,
    window: str = "7 days",
) -> DataFrame:
    """Per-time-window KS distance against a STATIC reference, restricted
    to the fixed bin grid — the bounded-state streaming companion of the
    exact batch `ks_drift_time_sliced`.

    Exact KS needs the window's full value multiset (unbounded state);
    evaluating |F_win - F_ref| only at the grid's bin edges LOWER-BOUNDS
    the true KS, with error at most the reference's largest bin mass —
    choose ``n_bins`` so reference bins are thin where its CDF is steep.

    Same one-stateful-aggregation shape as :func:`windowed_psi_drift`;
    the tail is array arithmetic (``transform``/``zip_with``/
    ``array_max``), deliberately NOT window functions, which streaming
    frames reject even post-aggregation. Output: one row per window
    (window_start_s, n_events, ks_grid), 6-dp rounded per edge before
    the max (the cross-engine determinism contract).
    """
    if reference.limit(1).isEmpty():
        # the lower-bound contract needs a nonempty reference; with
        # t_ref = 0 every edge divides by zero and the alarm would
        # silently emit NULL forever instead of failing here
        raise ValueError("windowed_ks_grid needs a nonempty reference")
    nb = n_bins + 2
    wincounts = (
        _windowed_histogram(df, value_col, ts_col, lo, hi, n_bins, window)
        .select(
            F.col("_w.start").cast("long").alias("window_start_s"),
            F.array(*[F.col(f"_b{i}") for i in range(nb)]).alias("_arr"),
        )
    )
    # cumulative counts BEFORE each internal edge k = sum of bins 0..k-1
    cums = F.expr(
        f"transform(sequence(1, {nb - 1}), "
        "k -> aggregate(slice(_arr, 1, k), 0L, (a, x) -> a + x))"
    )
    total = F.expr("aggregate(_arr, 0L, (a, x) -> a + x)")

    ref_row = (
        reference.sparkSession.range(nb)
        .select(F.col("id").alias("bin"))
        .join(reference, "bin", "left")
        .select(
            "bin", F.coalesce("n_ref", F.lit(0)).cast("long").alias("n_ref")
        )
        .groupBy()
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(bin, n_ref))), "
                "s -> s.n_ref)"
            ).alias("_arr")
        )
        .select(F.col("_arr").alias("_ref_bins"))
        .select(
            F.expr(
                f"transform(sequence(1, {nb - 1}), "
                "k -> aggregate(slice(_ref_bins, 1, k), 0L, "
                "(a, x) -> a + x))"
            ).alias("_ref_cums"),
            F.expr(
                "aggregate(_ref_bins, 0L, (a, x) -> a + x)"
            ).alias("_t_ref"),
        )
    )
    joined = wincounts.withColumn("_t_win", total).withColumn(
        "_cums", cums
    ).crossJoin(F.broadcast(ref_row))
    diffs = F.expr(
        "zip_with(_cums, _ref_cums, (a, b) -> "
        "round(abs(a / cast(_t_win as double) "
        "- b / cast(_t_ref as double)), 6))"
    )
    return joined.select(
        "window_start_s",
        F.col("_t_win").alias("n_events"),
        F.array_max(diffs).alias("ks_grid"),
    )
