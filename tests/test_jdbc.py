"""JDBC codegen tests — pure string/option construction, no live database
(the reference's SQL generation semantics from ingest_mysql_data.py:
245-318, SURVEY.md §4)."""

from __future__ import annotations

import pytest

from datalakeingestion_spark.sources.jdbc import (
    JdbcIncrementalSource,
    or_rewrite_between,
)


def _src(**kw):
    defaults = dict(
        url="jdbc:mysql://host:3306/lendingstream",
        table="lendingstream.application",
        delta_field="created_datetime",
        columns=("id", "created_datetime", "status"),
    )
    defaults.update(kw)
    return JdbcIncrementalSource(**defaults)


def test_open_ended_delta_query():
    q = _src().delta_query("2024-01-01 00:00:00")
    assert q == (
        "SELECT id, created_datetime, status FROM lendingstream.application "
        "WHERE created_datetime >= '2024-01-01 00:00:00'"
    )


def test_windowed_between_query():
    q = _src().delta_query("2024-01-01 00:00:00", "2024-01-01 23:59:59")
    assert "BETWEEN '2024-01-01 00:00:00' AND '2024-01-01 23:59:59'" in q


def test_coalesce_or_rewrite():
    # coalesce(modified,created) BETWEEN → OR of per-column BETWEENs so the
    # source DB can use per-column indexes (ingest_mysql_data.py:256-262)
    q = _src(
        delta_expr_cols=("modified_datetime", "created_datetime")
    ).delta_query("2024-01-01 00:00:00", "2024-01-02 00:00:00")
    assert (
        "(modified_datetime BETWEEN '2024-01-01 00:00:00' AND "
        "'2024-01-02 00:00:00' OR created_datetime BETWEEN "
        "'2024-01-01 00:00:00' AND '2024-01-02 00:00:00')" in q
    )


def test_or_rewrite_shape():
    assert or_rewrite_between(("a", "b"), "1", "2") == (
        "(a BETWEEN '1' AND '2' OR b BETWEEN '1' AND '2')"
    )


def test_empty_projection_falls_back_to_star():
    assert _src(columns=()).delta_query("1").startswith("SELECT * FROM")


def test_partitioned_read_options():
    src = _src(
        partition_column="id",
        lower_bound="1",
        upper_bound="1000000",
        num_partitions=16,
    )
    opts = src.reader_options("2024-01-01 00:00:00")
    # query+partitionColumn is illegal in Spark → derived-table dbtable form
    assert "query" not in opts
    assert opts["dbtable"].startswith("(SELECT ") and opts["dbtable"].endswith(") AS t")
    assert opts["numPartitions"] == "16"
    assert opts["fetchsize"] == "10000"


def test_partitioned_read_requires_bounds():
    with pytest.raises(ValueError, match="requires"):
        _src(partition_column="id").reader_options("1")
