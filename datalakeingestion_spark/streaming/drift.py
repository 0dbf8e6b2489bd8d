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


def reference_sample(
    df: DataFrame,
    value_col: str,
    id_col: str = "event_id",
    k: int = 64,
) -> DataFrame:
    """Bottom-k uniform row sample of ``value_col`` — the quantile-sketch
    reference :func:`windowed_ks_sample` compares live windows against.

    The sketch is the k rows with the SMALLEST ``portable_hash60(id)``:
    a deterministic, MERGEABLE uniform sample (the bottom-k of a union
    is the bottom-k of the parts' bottom-k's — the same merge law as
    KMV, applied to row identity instead of value identity, so
    duplicates of a value are sampled at their true multiplicity). Its
    empirical CDF approximates the true CDF within the DKW bound
    ~sqrt(ln(2/δ)/(2k)) — error set by SKETCH SIZE, not by any grid
    choice (the bound `windowed_ks_grid` cannot escape). Deterministic
    and identically computable in ANSI SQL (md5-prefix hash +
    ROW_NUMBER), unlike GK/KLL sketches whose output depends on merge
    order — cross-engine hash-checkability is why bottom-k is the
    right sketch HERE, at the cost of k = O(1/ε²) vs KLL's O(1/ε).

    Plan shape: global sort-limit = TakeOrderedAndProject (per-partition
    top-k, then k·#partitions rows to one reducer) — no full sort, no
    full shuffle, at any scale. Output: (h, v) rows, h ascending.
    """
    from ..functions.hashing import portable_hash60

    return (
        df.filter(F.col(value_col).isNotNull())
        .select(
            portable_hash60(F.col(id_col).cast("string")).alias("h"),
            F.col(value_col).cast("double").alias("v"),
        )
        .orderBy("h", "v")
        .limit(k)
    )


def windowed_ks_sample(
    df: DataFrame,
    ref: DataFrame,
    value_col: str,
    ts_col: str = "ts",
    id_col: str = "event_id",
    k: int = 64,
    hash_cap: int | None = 1 << 58,
    window: str = "7 days",
) -> DataFrame:
    """Per-time-window two-sample KS distance against a STATIC reference
    SAMPLE (from :func:`reference_sample`) — the quantile-sketch drift
    monitor. Where `windowed_ks_grid`'s error is bounded by the
    reference's largest bin mass (a grid choice), this one's error is
    the two samples' DKW bound ~sqrt(ln(2/δ)/2)·(1/√k + 1/√m) — bounded
    by SKETCH SIZE, tunable per deployment without re-binning.

    Same one-stateful-aggregation shape as the other monitors, so the
    SAME code runs streaming and batch: rows under ``hash_cap`` carry a
    (hash, value) struct into ONE ``collect_list`` per window (nulls —
    rows over the cap — are skipped by collect_list, so per-window
    state is ~n_win·hash_cap/2^60 structs, the knob that bounds
    streaming state); the stateless tail array-sorts the candidates,
    keeps the k smallest = EXACTLY the window's bottom-k whenever ≥ k
    survive (the k smallest hashes all lie under any cap that admits k
    rows), and evaluates the exact two-sample KS sup at every union
    point (both CDFs are right-continuous steps, so the sup over union
    points inclusively is the true sup). O((k+m)²) per window of
    higher-order-function arithmetic — JVM, no window functions, legal
    post-aggregation on a stream.

    Output: (window_start_s, n_events, n_sample, ks_sample), ks 6-dp
    rounded per edge before the max. A window whose every row hashes
    over the cap emits NULL ks (m = 0 — raise the cap); an empty
    reference raises up front like `windowed_ks_grid`.
    """
    if ref.limit(1).isEmpty():
        raise ValueError("windowed_ks_sample needs a nonempty reference")
    base = _windowed_bottomk_sample(
        df, value_col, ts_col, id_col, k, hash_cap, window
    )
    ref_row = ref.groupBy().agg(
        F.sort_array(F.collect_list(F.col("v").cast("double"))).alias("_rv")
    )
    joined = base.crossJoin(F.broadcast(ref_row))
    ks = F.expr(
        "array_max(transform(concat(_sv, _rv), u -> "
        "round(abs(size(filter(_sv, x -> x <= u)) / cast(_m as double) "
        "- size(filter(_rv, y -> y <= u)) / cast(size(_rv) as double)"
        "), 6)))"
    )
    return joined.select(
        F.col("_w.start").cast("long").alias("window_start_s"),
        F.col("n_events").cast("long").alias("n_events"),
        F.col("_m").cast("long").alias("n_sample"),
        # the when() guards the ANSI divide-by-zero when no row survived
        # the cap (m = 0 → NULL ks, never an exception mid-stream)
        F.when(F.col("_m") > 0, ks).alias("ks_sample"),
    )


def _windowed_bottomk_sample(
    df: DataFrame,
    value_col: str,
    ts_col: str,
    id_col: str,
    k: int,
    hash_cap: int | None,
    window: str,
) -> DataFrame:
    """The ONE stateful aggregation the sample-sketch monitors share:
    per time window, total row count plus the bottom-k (hash, value)
    candidates. Rows under ``hash_cap`` carry a struct into a single
    ``collect_list`` (nulls — rows over the cap — are skipped, so
    per-window state is ~n_win·hash_cap/2^60 structs, the streaming
    state knob); the stateless tail keeps the k smallest, which is
    EXACTLY the window's bottom-k whenever ≥ k rows survive (the k
    smallest hashes all lie under any cap that admits k rows). Returns
    (_w window, n_events, _sv sorted sample values asc, _m = |sample|).
    """
    from ..functions.hashing import portable_hash60

    h = portable_hash60(F.col(id_col).cast("string"))
    v = F.col(value_col).cast("double")
    struct = F.struct(h.alias("h"), v.alias("v"))
    cand = (
        struct
        if hash_cap is None
        else F.when(h < F.lit(int(hash_cap)), struct)
    )
    return (
        df.filter(v.isNotNull())
        .withColumn("_c", cand)
        .groupBy(F.window(ts_col, window).alias("_w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.collect_list("_c").alias("_cand"),
        )
        .withColumn(
            "_sv",
            F.expr(
                f"array_sort(transform(slice(array_sort(_cand), 1, "
                f"{int(k)}), s -> s.v))"
            ),
        )
        .withColumn("_m", F.size("_sv"))
        .drop("_cand")
    )


def windowed_quantile_sample(
    df: DataFrame,
    value_col: str,
    ts_col: str = "ts",
    id_col: str = "event_id",
    k: int = 64,
    hash_cap: int | None = 1 << 58,
    tenths: list[int] | None = None,
    window: str = "7 days",
) -> DataFrame:
    """Per-time-window decile ESTIMATES from the bottom-k sample — the
    streaming "track p10..p90 of a live metric" monitor. Same sketch,
    same DKW rank-error bound (~sqrt(ln(2/δ)/2k)), same
    one-stateful-aggregation + stateless-array-tail shape as
    :func:`windowed_ks_sample`, so the identical code runs on a batch
    frame (the oracle-checked twin) and on a watermarked stream.

    estimate(t) = sorted_sample[(t·m + 9) div 10] (1-based, INTEGER
    rank arithmetic — float ceil(q·m) picks the wrong order statistic
    at exact multiples), matching
    ``operators/quantiles.sampled_quantiles_by_key`` exactly. The
    per-window decile explode happens AFTER the aggregation, which
    append-mode streaming allows.

    Output: one row per (window, t): (window_start_s, n_events,
    n_sample, q double, est). Windows where no row survived the cap
    emit NULL est (never an ANSI divide error).
    """
    tenths = list(range(1, 10)) if tenths is None else list(tenths)
    if not tenths or any(not 1 <= t <= 9 for t in tenths):
        raise ValueError("tenths must be decile indices in 1..9")
    base = _windowed_bottomk_sample(
        df, value_col, ts_col, id_col, k, hash_cap, window
    )
    ts_arr = F.array(*[F.lit(int(t)) for t in tenths])
    return (
        base.select(
            F.col("_w.start").cast("long").alias("window_start_s"),
            F.col("n_events").cast("long").alias("n_events"),
            F.col("_m").cast("long").alias("n_sample"),
            "_sv",
            "_m",
            F.explode(ts_arr).alias("t"),
        )
        .select(
            "window_start_s",
            "n_events",
            "n_sample",
            (F.col("t") / 10.0).alias("q"),
            F.when(
                F.col("_m") > 0,
                F.expr(
                    "element_at(_sv, cast(greatest(1L, "
                    "(t * _m + 9) div 10) as int))"
                ),
            ).alias("est"),
        )
    )


def windowed_distinct_sample(
    df: DataFrame,
    key_col: str,
    ts_col: str = "ts",
    hash_cap: int = 1 << 55,
    window: str = "7 days",
) -> DataFrame:
    """Per-time-window DISTINCT-COUNT estimate with BOUNDED streaming
    state — the live daily/weekly-active-users monitor. Exact windowed
    count-distinct needs per-window state proportional to the distinct
    count (unbounded on a 100 TB stream); this keeps only the distinct
    key hashes UNDER a fixed threshold (Gibbons' distinct sampling /
    fixed-θ KMV): E[survivors] = D·cap/2^60, so the estimator
    D̂ = |survivors| · 2^60/cap is unbiased with relative error
    ~1/sqrt(survivors) — the cap is the state/accuracy knob, exactly
    like the sample monitors' ``hash_cap``.

    Same streaming-legal shape as the other monitors: ONE
    ``groupBy(window)`` whose ``collect_set`` dedups the surviving
    hashes (set size is the bounded state), a stateless arithmetic
    tail, identical code batch and stream. Deterministic and
    ANSI-reproducible (md5-prefix hash), so the batch twin is
    hash-checkable against DuckDB.

    Output: (window_start_s, n_events, n_under_cap, est_distinct) with
    est_distinct = n_under_cap · 2^60/cap, 4-dp rounded. Exact-twin
    error is pinned in pytest (the oracle replicates the ESTIMATOR;
    the test replicates the TRUTH).
    """
    from ..functions.hashing import portable_hash60

    if not 0 < int(hash_cap) <= 1 << 60:
        raise ValueError("hash_cap must be in (0, 2^60]")
    h = portable_hash60(F.col(key_col).cast("string"))
    base = (
        df.filter(F.col(key_col).isNotNull())
        .withColumn("_h", F.when(h < F.lit(int(hash_cap)), h))
        .groupBy(F.window(ts_col, window).alias("_w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.collect_set("_h").alias("_hs"),
        )
    )
    scale = float((1 << 60) / int(hash_cap))
    return base.select(
        F.col("_w.start").cast("long").alias("window_start_s"),
        F.col("n_events").cast("long").alias("n_events"),
        F.size("_hs").cast("long").alias("n_under_cap"),
        F.round(F.size("_hs") * F.lit(scale), 4).alias("est_distinct"),
    )
