"""Fixture-table access (the harness's parquet star schema).

Replaces the reference's per-source readers for testing purposes: every
operator in the engine is demonstrated over these tables (see TESTDATA.md).
Plain ``spark.read.parquet`` — Catalyst handles column pruning and filter
pushdown into the scan, which is the behavior the reference hand-codes in
its SQL generation (reference: extractors/ingest_mysql_data.py:164-200,
250-267).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


# Columns stored as parquet TIMESTAMP(NANOS), which Spark 4 cannot read as
# TimestampType. We read them as raw nanosecond longs
# (spark.sql.legacy.parquet.nanosAsLong) and truncate to microseconds —
# exactly what DuckDB's reader does, so oracle comparisons agree.
_NANOS_TS_COLUMNS = {"events": ("ts",)}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise ValueError(f"unknown fixture table {name!r}; expected one of {TABLES}")
    if name in _NANOS_TS_COLUMNS:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    for col in _NANOS_TS_COLUMNS.get(name, ()):
        if dict(df.dtypes).get(col) == "bigint":
            df = df.withColumn(col, F.expr(f"timestamp_micros({col} div 1000)"))
    return df
