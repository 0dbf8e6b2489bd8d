"""Semantics + plan pins for the round-2-continuation operators
(corpus-LM scoring, TF-IDF, auto-threshold repetition, keep-best dedup,
kNN graph, funnel). Oracle parity runs in test_parity.py; these tests pin
the properties parity can't see: plan shapes that must survive scale-up,
and block-size / threshold invariances of the kernels.
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from datalakeingestion_spark.operators import dedup as dd
from datalakeingestion_spark.operators import similarity as sim
from datalakeingestion_spark.operators import text_analysis as ta
from datalakeingestion_spark.sources.fixtures import load_table

from .conftest import SF_SMALL
from .test_plans import formatted_plan, run


@pytest.mark.smoke
def test_tfidf_two_exchanges_one_scan(spark):
    plan = formatted_plan(run(spark, "tfidf_top_terms"))
    # linear pipeline: hash(tok) exchange feeds BOTH the tf aggregate and
    # the doc-frequency window; only the per-doc top-k re-shuffles. A
    # groupBy-join-back form re-scans the corpus and broadcasts the
    # vocabulary — catching that regression is the point of this pin.
    assert len(re.findall(r"\(\d+\) Exchange\b", plan)) == 2, plan
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1, plan
    assert "BroadcastExchange" not in plan, plan
    # top-k limit pushed map-side before the doc_id shuffle
    assert len(re.findall(r"\(\d+\) WindowGroupLimit", plan)) == 2, plan


def test_funnel_single_exchange_one_scan(spark):
    plan = formatted_plan(run(spark, "funnel_conversion_1h"))
    # window + conditional aggregate share one hash(user_id) exchange and
    # one events scan; the join-based form scans events three times
    assert len(re.findall(r"\(\d+\) Exchange\b", plan)) == 1, plan
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1, plan
    assert "Join" not in plan, plan


def test_unigram_logprob_scores_are_sane(spark):
    docs = load_table(spark, SF_SMALL, "documents")
    out = ta.unigram_logprob(docs).toPandas()
    n_docs = docs.filter(F.size(F.split(F.col("text"), " ")) > 0).count()
    assert len(out) == docs.count() == n_docs  # fixture docs are non-empty
    # log-probs of a proper distribution are strictly negative
    assert (out["mean_logprob"] < 0).all()
    assert (out["n_tokens"] > 0).all()


def test_repetition_auto_keeps_expected_band(spark):
    docs = load_table(spark, SF_SMALL, "documents")
    out = ta.repetition_metrics_auto(docs, q=0.9).toPandas()
    n = len(out)
    kept = int(out["keep"].sum())
    # each p90 filter keeps >= 90%; the intersection keeps >= 80%, and the
    # thresholds are data-driven so SOMETHING must be cut on the fixture
    assert kept >= 0.8 * n
    assert kept < n


def test_keep_best_one_keeper_per_cluster(spark):
    docs = load_table(spark, SF_SMALL, "documents")
    pairs = dd.minhash_near_duplicates(docs, threshold=0.5)
    labels = dd.connected_components(pairs)
    out = dd.keep_best_per_cluster(docs, labels, quality_col="n_chars")
    pdf = out.toPandas()
    assert len(pdf) == docs.count()  # every doc gets a verdict
    per_cluster = pdf.groupby("cluster_id")["keep"].sum()
    assert (per_cluster == 1).all()  # exactly one survivor per cluster
    # the survivor is the max-n_chars member (ties: min doc_id)
    quality = docs.select("doc_id", "n_chars").toPandas().set_index("doc_id")
    merged = pdf.join(quality, on="doc_id")
    for _, grp in merged.groupby("cluster_id"):
        best = grp.sort_values(
            ["n_chars", "doc_id"], ascending=[False, True]
        ).iloc[0]
        keeper = grp[grp["keep"]].iloc[0]
        assert keeper["doc_id"] == best["doc_id"]


def test_knn_graph_block_size_invariant(spark):
    emb = load_table(spark, SF_SMALL, "embeddings")
    small = (
        sim.knn_graph(emb, k=5, block_size=16)
        .toPandas()
        .sort_values(["query_id", "neighbor_id"])
        .reset_index(drop=True)
    )
    big = (
        sim.knn_graph(emb, k=5, block_size=10_000)
        .toPandas()
        .sort_values(["query_id", "neighbor_id"])
        .reset_index(drop=True)
    )
    # blocking is a pure cost-model choice — results must be identical
    assert small.equals(big)


def test_knn_graph_k_rows_per_query(spark):
    emb = load_table(spark, SF_SMALL, "embeddings")
    n = emb.count()
    out = sim.knn_graph(emb, k=5, block_size=32)
    counts = out.groupBy("query_id").count().toPandas()
    assert len(counts) == n
    assert (counts["count"] == 5).all()
    # no self-edges
    assert out.filter(F.col("query_id") == F.col("neighbor_id")).count() == 0


def test_curate_v2_funnel_drops_planted_structural_dups(spark):
    """curate_v2 staged semantics: an excerpt contained in a longer doc
    drops at stage 1; a doc assembled from other docs' chunks drops at
    stage 2; fluent unique docs survive to the scored output."""
    import pyspark.sql.functions as F

    from datalakeingestion_spark.operators.curation import curate_v2

    base = [
        (i, " ".join(f"d{i}w{j}" for j in range(60)) +
            " the cat sat on the mat and it is a fine day for work")
        for i in range(1, 9)
    ]
    excerpt = (21, base[0][1].split(" the cat")[0])          # subset of doc 1
    franken = (22, base[1][1] + " " + base[2][1])            # chunks of 2+3
    rows = base + [excerpt, franken]
    docs = spark.createDataFrame(rows, ["doc_id", "text"]).withColumn(
        "lang", F.lit("en")).withColumn("source", F.lit("s")).withColumn(
        "n_chars", F.length("text"))
    out = curate_v2(docs)
    got = {r.doc_id for r in out.collect()}
    assert 21 not in got          # containment rejection
    assert 22 not in got          # CDC shared-chunk rejection
    assert got, "fluent unique docs must survive"
    assert got <= set(range(1, 9))
