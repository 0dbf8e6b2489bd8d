"""User-facing session API — the engine as a query layer.

The reference's consumers query the lake through Athena (S8); here the
engine itself is the query layer: ``open_session`` registers every fixture
table (plus any latest-row views) in the Spark catalog so users run plain
``spark.sql`` — including against the same table names the DuckDB oracle
uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .sources.fixtures import DEFAULT_SF_DIR, TABLES, load_table


def open_session(
    sf_dir: str = DEFAULT_SF_DIR,
    spark: SparkSession | None = None,
    tables: tuple[str, ...] = TABLES,
) -> SparkSession:
    """SparkSession with all fixture tables registered as temp views."""
    if spark is None:
        from .session import get_spark

        spark = get_spark(app_name="dli-sql")
    for t in tables:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark


def sql(query: str, sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    """One-shot: run SQL against the fixture tables."""
    return open_session(sf_dir).sql(query)
