"""UDx surface (operators/udx.py): GROUPED_AGG UDAF and Python UDTF —
each checked against its algebraic / expression-based scale twin."""

from __future__ import annotations

import pytest

import math

from pyspark.sql import functions as F

from datalakeingestion_spark.operators.text_analysis import chunk_documents
from datalakeingestion_spark.operators.udx import (
    geometric_mean_udaf,
    register_chunk_text_udtf,
)
from datalakeingestion_spark.sources.fixtures import load_table

from .conftest import SF_SMALL


@pytest.mark.smoke
def test_geometric_mean_udaf_matches_algebraic_form(spark):
    orders = load_table(spark, SF_SMALL, "orders")
    geomean = geometric_mean_udaf()
    got = {
        r["o_orderstatus"]: r["gm"]
        for r in orders.groupBy("o_orderstatus")
        .agg(geomean("o_totalprice").alias("gm"))
        .collect()
    }
    # the partial-aggregating production form
    expected = {
        r["o_orderstatus"]: r["gm"]
        for r in orders.groupBy("o_orderstatus")
        .agg(F.exp(F.avg(F.log("o_totalprice"))).alias("gm"))
        .collect()
    }
    assert set(got) == set(expected)
    for k in got:
        assert math.isclose(got[k], expected[k], rel_tol=1e-9), k


def test_geometric_mean_udaf_edge_values(spark):
    geomean = geometric_mean_udaf()
    df = spark.createDataFrame(
        [("a", 2.0), ("a", 8.0), ("b", -1.0), ("b", None)], ["g", "v"]
    )
    got = {
        r["g"]: r["gm"]
        for r in df.groupBy("g").agg(geomean("v").alias("gm")).collect()
    }
    assert math.isclose(got["a"], 4.0)
    assert got["b"] is None  # no positive values → SQL NULL


def test_chunk_text_udtf_matches_expression_chunker(spark):
    from datalakeingestion_spark.functions.text import normalized_text

    register_chunk_text_udtf(spark, "chunk_text_t")
    docs = load_table(spark, SF_SMALL, "documents").limit(50)
    docs.select("doc_id", normalized_text("text").alias("norm")).createOrReplaceTempView(
        "udtf_docs"
    )
    via_udtf = spark.sql(
        """
        SELECT d.doc_id, c.chunk_idx AS chunk_id, c.chunk_text
        FROM udtf_docs d, LATERAL chunk_text_t(d.norm, 16, 4) c
        """
    )
    via_expr = chunk_documents(docs, chunk_tokens=16, overlap=4).select(
        "doc_id", "chunk_id", "chunk_text"
    )
    a = {tuple(r) for r in via_udtf.collect()}
    b = {tuple(r) for r in via_expr.collect()}
    assert a == b and len(a) > 50


def test_arrow_udtf_matches_plain_udtf(spark):
    from datalakeingestion_spark.functions.text import normalized_text
    from datalakeingestion_spark.operators.udx import register_chunk_text_udtf_arrow

    register_chunk_text_udtf(spark, "ct_plain")
    register_chunk_text_udtf_arrow(spark, "ct_arrow")
    docs = load_table(spark, SF_SMALL, "documents").limit(30)
    docs.select("doc_id", normalized_text("text").alias("norm")).createOrReplaceTempView(
        "udtf_docs2"
    )
    q = """
        SELECT d.doc_id, c.chunk_idx, c.chunk_text
        FROM udtf_docs2 d, LATERAL {fn}(d.norm, 16, 4) c
    """
    a = {tuple(r) for r in spark.sql(q.format(fn="ct_plain")).collect()}
    b = {tuple(r) for r in spark.sql(q.format(fn="ct_arrow")).collect()}
    assert a == b and len(a) > 30
