"""Partition-derivation scalar functions.

The reference derives write-side partition columns from either a datetime
column (``strftime`` buckets, extractors/ingest_mysql_data.py:459-468) or an
auto-increment id (1M-wide integer buckets via a per-row ``df.apply`` —
extractors/ingest_mysql_data.py:452-454,471-477). Both are pure column
expressions here: JVM-side, codegen'd, no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Reference partition_format values → Spark date_format patterns
# (update_config.py:215-218 / extractors/ingest_mysql_data.py:459-468).
DATE_FORMATS = {
    "YYYY": "yyyy",
    "YYYYMM": "yyyyMM",
    "YYYYMMDD": "yyyyMMdd",
}


def date_bucket(col: Column | str, fmt: str) -> Column:
    """Time-based partition value: 'YYYY' | 'YYYYMM' | 'YYYYMMDD'."""
    if fmt not in DATE_FORMATS:
        raise ValueError(f"unsupported partition_format {fmt!r}")
    return F.date_format(col, DATE_FORMATS[fmt])


def int_bucket(col: Column | str, width: int = 1_000_000) -> Column:
    """Non-time partition value: floor(id / width).

    Reference formula ``int(row[c] / 1_000_000)`` (ingest_mysql_data.py:453)
    as a vectorized expression — the reference's row-at-a-time
    ``df.apply(axis=1)`` becomes whole-stage-codegen arithmetic.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.floor(c / F.lit(width)).cast("long")


def floor_div(col: Column | str, divisor: int) -> Column:
    """EXACT integer floor division (toward −∞) — the epoch-bucket
    primitive. Spark's ``div`` truncates toward zero, so plain
    ``cast(ts as long) div 86400`` puts pre-1970 timestamps (negative
    epoch seconds) one day late, diverging from ANSI/DuckDB ``//``
    floor semantics. ``x - pmod(x, d)`` is the largest multiple of
    ``d`` ≤ x, so the division is an exact integer — IEEE double
    division of exactly-representable operands with an integer result
    is exact, and every Spark-representable epoch quantity (|seconds|
    ≤ 9.2e12 for the full ±292k-year micros range) is far below the
    2^53 double-exactness bound. Inputs PAST that bound (60-bit
    hashes, snowflake ids) raise at runtime instead of returning a
    silently-off-by-one bucket — use ``div``-based math there, where
    truncation semantics are usually what those ids want anyway."""
    if int(divisor) < 1:
        # pmod's x - pmod(x,d) identity and the 2^53 bound both assume
        # d >= 1; d=0 would otherwise surface as an ANSI divide-by-zero
        # deep in execution and d<0 would silently return wrong buckets
        raise ValueError(f"floor_div: divisor must be >= 1, got {divisor}")
    c = F.col(col) if isinstance(col, str) else col
    d = F.lit(int(divisor))
    exact = ((c - F.pmod(c, d)) / d).cast("long")
    bound = (1 << 53) - int(divisor)
    return F.when(F.abs(c) <= F.lit(bound), exact).otherwise(
        F.raise_error(
            F.lit(
                f"floor_div: |value| exceeds {bound} (2^53 - divisor); "
                "double-exact division no longer holds — this helper is "
                "for epoch-sized quantities"
            )
        )
    )


def epoch_bucket(col: Column | str, seconds: int) -> Column:
    """Floor-division epoch bucket of a timestamp column: week buckets
    are ``epoch_bucket(ts, 604800)``, days ``epoch_bucket(ts, 86400)``
    — timezone-independent integer math, timestamp-range-safe (see
    :func:`floor_div`)."""
    c = F.col(col) if isinstance(col, str) else col
    return floor_div(c.cast("long"), seconds)


def clamp_timestamp(
    col: Column | str,
    lo: str = "1900-01-01 00:00:00",
    hi: str = "2262-04-11 00:00:00",
) -> Column:
    """Pandas-compat timestamp clamp — OPTIONAL in the Spark engine.

    The reference clamps every datetime column into pandas' datetime64[ns]
    range inside generated MySQL SQL (ingest_mysql_data.py:183-189).
    Spark timestamps don't have that limitation, so this is a compatibility
    flag, not a default (SURVEY.md §1.2).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.greatest(F.least(c, F.lit(hi).cast("timestamp")), F.lit(lo).cast("timestamp"))
