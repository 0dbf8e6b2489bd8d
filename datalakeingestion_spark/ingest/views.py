"""Latest-row ("latest data zone") view registration.

The reference emits ``CREATE OR REPLACE VIEW ... row_number() OVER
(PARTITION BY pk ORDER BY delta DESC) ... WHERE row_num = 1`` to Athena
(start_ingestion.py:333-384) — which reportedly times out on large tables
(README.md:34-35). Here the same semantic registers in the Spark session
catalog and executes as one shuffle at any scale.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession

from ..operators.relational import latest_rows


def register_latest_view(
    spark: SparkSession,
    view_name: str,
    lake_path: str,
    primary_key: Sequence[str],
    delta_field: str,
    tie_breaks: Sequence[str] = (),
) -> DataFrame:
    """Register `view_name` as the latest-row-per-key projection of the
    lake table; returns the view's DataFrame. Reads with schema merge
    (pipeline.read_lake) so a contract-evolved lake's late-added columns
    appear in the view instead of silently vanishing behind whichever
    footer wins."""
    from .pipeline import read_lake

    df = read_lake(spark, lake_path)
    latest = latest_rows(df, list(primary_key), delta_field, tie_breaks)
    latest.createOrReplaceTempView(view_name)
    return latest


def latest_view_sql(
    view_name: str,
    table_ref: str,
    primary_key: Sequence[str],
    delta_field: str,
) -> str:
    """The DDL string form (for external catalogs that want SQL — parity
    with the reference's generated Athena DDL, start_ingestion.py:361-374)."""
    pk = ", ".join(primary_key)
    return (
        f"CREATE OR REPLACE VIEW {view_name} AS "
        f"SELECT * FROM (SELECT *, row_number() OVER (PARTITION BY {pk} "
        f"ORDER BY {delta_field} DESC) AS row_num FROM {table_ref}) "
        f"WHERE row_num = 1"
    )
