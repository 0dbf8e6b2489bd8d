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
