"""Partition-spec parsing, validation, and column derivation.

The reference stores the partition spec as a Python tuple-of-dicts literal
in an Excel cell, parsed with ``eval()`` (reference: start_ingestion.py:270,
shape at update_config.py:215-218) and validates it at
extractors/ingest_mysql_data.py:418-450. Here it is a typed dataclass,
parsed with ``ast.literal_eval`` (never ``eval``), with the same
validation semantics:

- exactly one partition column per spec (multi-column specs rejected —
  reference :447-449 takes only seq_no 1);
- time-based specs need a format in {YYYY, YYYYMM, YYYYMMDD};
- non-time specs use fixed-width integer buckets ('1M' → 1,000,000);
- TIME-typed (interval) columns are banned as partition columns
  (reference :439-440).
"""

from __future__ import annotations

import ast
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.buckets import DATE_FORMATS, date_bucket, int_bucket

BUCKET_WIDTHS = {"1M": 1_000_000, "100K": 100_000, "1K": 1_000}

# Spark types acceptable for time-based partition derivation.
_TIME_TYPES = (T.TimestampType, T.DateType, T.TimestampNTZType)


@dataclass(frozen=True)
class PartitionSpec:
    column: str
    kind: str  # 'time-based' | 'non-time-based'
    fmt: str  # YYYY | YYYYMM | YYYYMMDD (time) / 1M | 100K | 1K (non-time)

    @property
    def partition_column_name(self) -> str:
        return f"{self.column}_part"

    def derive(self, df: DataFrame) -> DataFrame:
        """Append the derived partition column."""
        self.validate_against(df.schema)
        return df.withColumn(self.partition_column_name, self.expr())

    def expr(self) -> Column:
        if self.kind == "time-based":
            return date_bucket(F.col(self.column), self.fmt)
        return int_bucket(F.col(self.column), BUCKET_WIDTHS[self.fmt])

    def validate_against(self, schema: T.StructType) -> None:
        if self.column not in schema.fieldNames():
            raise ValueError(f"partition column {self.column!r} not in schema")
        dtype = schema[self.column].dataType
        if isinstance(dtype, T.DayTimeIntervalType):
            # reference bans MySQL TIME columns (ingest_mysql_data.py:439-440)
            raise ValueError("interval (TIME) columns cannot be partition columns")
        if self.kind == "time-based" and not isinstance(dtype, _TIME_TYPES):
            raise ValueError(
                f"time-based partition column {self.column!r} has non-time "
                f"type {dtype.simpleString()}"
            )
        if self.kind == "non-time-based" and not isinstance(
            dtype, (T.LongType, T.IntegerType, T.ShortType, T.ByteType)
        ):
            raise ValueError(
                f"non-time partition column {self.column!r} must be integral, "
                f"got {dtype.simpleString()}"
            )


def parse_partition_config(raw: str | None) -> PartitionSpec | None:
    """Parse the reference's tuple-of-dicts literal into a PartitionSpec.

    '()' / '' / None → no partitioning. Only the seq_no-1 entry is honored
    (single-column specs, like the reference). Raises ValueError on
    malformed specs instead of silently skipping.
    """
    if raw is None or raw.strip() in ("", "()"):
        return None
    try:
        parsed = ast.literal_eval(raw)
    except (ValueError, SyntaxError) as exc:
        raise ValueError(f"malformed partition_config: {raw!r}") from exc
    if isinstance(parsed, dict):
        parsed = (parsed,)
    if not isinstance(parsed, (tuple, list)) or not parsed:
        raise ValueError(f"partition_config must be a tuple of dicts: {raw!r}")
    entries = [e for e in parsed if isinstance(e, dict)]
    if len(entries) != len(parsed):
        raise ValueError(f"partition_config entries must be dicts: {raw!r}")
    first = min(entries, key=lambda e: e.get("partition_seq_no", 1))
    kind = first.get("partition_column_type")
    column = first.get("partition_column")
    fmt = first.get("partition_format")
    if kind not in ("time-based", "non-time-based"):
        raise ValueError(f"unknown partition_column_type {kind!r}")
    if not column:
        raise ValueError("partition_column missing")
    if kind == "time-based" and fmt not in DATE_FORMATS:
        raise ValueError(f"time-based spec needs format in {sorted(DATE_FORMATS)}")
    if kind == "non-time-based" and fmt not in BUCKET_WIDTHS:
        raise ValueError(f"non-time spec needs format in {sorted(BUCKET_WIDTHS)}")
    return PartitionSpec(column=column, kind=kind, fmt=fmt)
