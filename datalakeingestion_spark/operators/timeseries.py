"""Regular-grid time-series repair: gap-filling and forward-fill.

Beyond-reference (SURVEY.md §2 greenfield): the reference lands
irregular event streams; downstream consumers (dashboards, feature
stores, drift monitors) want a dense per-key daily grid. This operator
densifies each key's observed span and forward-fills the metric — the
standard "last observation carried forward" repair.

Scale shape (100 TB events): one grouped decimal-exact daily aggregate,
one per-key min/max span (user-dim sized), a ``sequence``+``explode``
grid generation that is linear in OUTPUT rows (no cross join against a
calendar table), one left join keyed (key, day), and one per-key ordered
window for the fill. Nothing driver-side; no global sort. Keys with long
dormant spans inflate only their own partition (grid rows ≈ span days),
and the window is rows-unbounded-preceding — a single running state per
key, no re-scan per row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def daily_gapfill_ffill(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    dec_type: str = "decimal(18,6)",
) -> DataFrame:
    """Dense per-key daily grid over each key's observed [min-day, max-day]
    span, with the daily value total forward-filled across gap days.

    The daily total is summed in exact decimal (order-independent across
    partitionings) and cast back to double. The first grid day per key is
    always observed (the span starts at an observation), so the fill never
    sees a leading NULL.

    Returns (key, day, value_ffill, observed).
    """
    # UTC-calendar day via integer epoch math — NOT to_date(), which
    # buckets in spark.sql.session.timeZone and would shift days on a
    # bare (driver-style) session in a non-UTC zone (repo invariant:
    # oracle-checked results are tz-independent; see plans/round3c.py)
    day = F.date_from_unix_date(
        F.floor(F.unix_micros(F.col(ts_col)) / F.lit(86_400_000_000)).cast(
            "int"
        )
    )
    daily = (
        events.select(
            key_col,
            day.alias("day"),
            F.col(value_col).cast(dec_type).alias("v"),
        )
        .groupBy(key_col, "day")
        .agg(F.sum("v").alias("day_total"))
    )
    span = daily.groupBy(key_col).agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    grid = span.select(
        key_col,
        F.explode(F.expr("sequence(d0, d1, interval 1 day)")).alias("day"),
    )
    joined = grid.join(daily, [key_col, "day"], "left")
    w = (
        Window.partitionBy(key_col)
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        key_col,
        "day",
        F.last("day_total", ignorenulls=True)
        .over(w)
        .cast("double")
        .alias("value_ffill"),
        F.col("day_total").isNotNull().alias("observed"),
    )


def rolling_mad_flags(
    daily: DataFrame,
    key_col: str = "user_id",
    day_col: str = "day",
    value_col: str = "day_total",
    window: int = 7,
    k: float = 3.0,
) -> DataFrame:
    """Per-key rolling robust anomaly flags: each point compared to the
    trailing-``window`` median via the median absolute deviation —
    the point-anomaly monitor beside the distribution-level drift
    monitors (PSI/KS). A point is anomalous when |x - median| > k·MAD,
    with the standard MAD-zero fallback: when more than half the window
    is identical (MAD = 0), any nonzero deviation flags — otherwise a
    100x spike over a constant series would never flag.

    Exactness: median = the LOWER median (sorted-array element
    (n+1)//2), computed by identical sort/extract expressions on both
    engines — no interpolation, so even-length windows cannot diverge.
    ``k`` should be a binary-exact float.

    Scale shape: one window per key ordered by day with a ROWS frame of
    ``window`` values — state per row is a bounded array (the trailing
    window), never the key's history; no second pass, the deviation
    median reuses the collected array.

    Returns (key, day, v, med, mad, is_anomaly) with v/med/mad rounded
    to 6 dp.
    """
    w = (
        Window.partitionBy(key_col)
        .orderBy(day_col)
        .rowsBetween(-(window - 1), Window.currentRow)
    )
    idx = lambda arr: F.floor((F.size(arr) + 1) / 2).cast("int")  # noqa: E731
    out = daily.select(
        key_col,
        day_col,
        F.col(value_col).cast("double").alias("v"),
    )
    out = out.withColumn("__arr", F.collect_list("v").over(w))
    med = F.element_at(F.sort_array(F.col("__arr")), idx(F.col("__arr")))
    out = out.withColumn("__med", med)
    devs = F.transform(F.col("__arr"), lambda a: F.abs(a - F.col("__med")))
    mad = F.element_at(F.sort_array(devs), idx(devs))
    out = out.withColumn("__mad", mad)
    return out.select(
        key_col,
        day_col,
        F.round("v", 6).alias("v"),
        F.round("__med", 6).alias("med"),
        F.round("__mad", 6).alias("mad"),
        (
            (
                (F.col("__mad") > F.lit(0.0))
                & (
                    F.abs(F.col("v") - F.col("__med"))
                    > F.lit(float(k)) * F.col("__mad")
                )
            )
            | (
                (F.col("__mad") == F.lit(0.0))
                & (F.abs(F.col("v") - F.col("__med")) > F.lit(0.0))
            )
        ).alias("is_anomaly"),
    )
