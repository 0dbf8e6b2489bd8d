"""Quickstart: the three ways to use the engine.

Run from the repo root: python examples/quickstart.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from datalakeingestion_spark.api import open_session
from datalakeingestion_spark.operators import curate, latest_rows, minhash_near_duplicates

SF = "/root/testdata/sf0.001"

# 1. SQL over the registered tables (the engine as a query layer)
spark = open_session(SF)
spark.sql(
    """
    SELECT l_returnflag, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem GROUP BY l_returnflag ORDER BY revenue DESC
    """
).show()

# 2. Operator library (latest-row dedup — the reference's signature view)
events = spark.table("events")
latest_rows(events, ["user_id"], "ts", ["event_id"]).show(5)

# 3. LLM-data pipeline (near-dedup + curation over documents)
docs = spark.table("documents")
minhash_near_duplicates(docs, threshold=0.9).show(5)
print("curated docs:", curate(docs).count(), "/", docs.count())

# 4. Training-data assembly: chunk → count tokens → pack into sequences
from datalakeingestion_spark.functions.text import tokens  # noqa: E402
from datalakeingestion_spark.operators.packing import (  # noqa: E402
    global_positions,
    pack_sequences,
)
from datalakeingestion_spark.operators.text_analysis import (  # noqa: E402
    chunk_documents,
)

chunks = chunk_documents(docs, chunk_tokens=128, overlap=32)
print("chunks:", chunks.count())
sized = docs.select("doc_id", F.size(tokens("text")).alias("n_tokens"))
packed = pack_sequences(sized, token_budget=512)
print("sequences:", packed.select("seq_id").distinct().count())
order = global_positions(sized, order_cols=["doc_id"])
print("training order assigned:", order.count(), "docs")

# 5. Lakehouse ops: ingest commits, then time travel + change feed
import tempfile  # noqa: E402

from datalakeingestion_spark.ingest.pipeline import IncrementalIngestJob  # noqa: E402
from datalakeingestion_spark.ingest.timetravel import (  # noqa: E402
    history,
    read_changes,
    read_version,
)
from datalakeingestion_spark.ingest.watermark import ExecutionLog  # noqa: E402

tmp = tempfile.mkdtemp()
lake, log = f"{tmp}/lake", ExecutionLog(spark, f"{tmp}/log")


def ingest(**kw):
    return IncrementalIngestJob(
        spark=spark, ingestion_id=1, source=events, delta_field="ts",
        target_location=lake, log=log, **kw,
    ).run()


ingest(end_value_cap="2024-01-15 00:00:00")  # commit 0
ingest()                                     # commit 1
history(log, 1).show()
print("as of commit 0:", read_version(spark, log, 1, 0, lake).count())
print(
    "change feed since commit 0:",
    read_changes(spark, log, 1, lake, since_version=0).count(),
)

# 6. Time-correlation joins and sketches over the event stream
from datalakeingestion_spark.operators.rangejoin import interval_join  # noqa: E402
from datalakeingestion_spark.operators.sketches import (  # noqa: E402
    cms_estimate,
    cms_sketch,
)

pts = events.select("event_id", F.unix_micros("ts").alias("pt"))
anchors = events.filter(F.col("event_type") == "error").select(
    F.col("event_id").alias("anchor_id"), F.unix_micros("ts").alias("at")
)
ctx = interval_join(
    pts, anchors,
    left_point=F.col("pt"),
    right_start=F.col("at") - 300_000_000,
    right_end=F.col("at"),
    bucket_width_us=300_000_000,
)
print("events within 5 min before an error:", ctx.count())

toks = docs.select(F.explode(tokens("text")).alias("t"))
sketch = cms_sketch(toks, "t", depth=3, width=1024)
probes = spark.createDataFrame([("table",), ("spark",)], ["term"])
cms_estimate(sketch, probes, "term").show()

# 7. Round-3 additions: SCD2 history, fuzzy linkage, mixture QA, histogram
from datalakeingestion_spark.operators.fuzzyjoin import fuzzy_join_hamming  # noqa: E402
from datalakeingestion_spark.operators.profiling import numeric_histogram  # noqa: E402
from datalakeingestion_spark.operators.relational import scd2_history  # noqa: E402
from datalakeingestion_spark.operators.text_analysis import (  # noqa: E402
    source_js_divergence,
)

history = scd2_history(events, ["user_id"], "ts", ["event_id"])
print("SCD2 current rows:", history.filter("is_current").count())

cust = spark.table("customer")
suffix = F.col("c_name").substr(-6, 6)
links = fuzzy_join_hamming(
    cust, cust, "c_custkey", "c_custkey", suffix, suffix, k=1
).filter(F.col("left_id") < F.col("right_id"))
print("near-identical customer name suffixes:", links.count())

source_js_divergence(docs).show()
numeric_histogram(spark.table("orders"), "o_totalprice", n_bins=10).show()

# 8. Continuation operators: structural dedup, embeddings, tokenizer prep
from datalakeingestion_spark.operators.curation import curate_v2  # noqa: E402
from datalakeingestion_spark.operators.dedup import (  # noqa: E402
    cdc_shared_chunks,
    containment_join,
    dedup_against_index,
    jaccard_prefix_join,
)
from datalakeingestion_spark.operators.packing import tokenize_to_ids  # noqa: E402
from datalakeingestion_spark.operators.pca import pca_project  # noqa: E402
from datalakeingestion_spark.operators.text_analysis import (  # noqa: E402
    bigram_logprob,
    pmi_collocations,
    quality_logistic,
    zipf_fit,
)

print("exact jaccard pairs (prefix filter):",
      jaccard_prefix_join(docs, threshold=0.5, n=3).count())
print("quote/excerpt containment pairs:",
      containment_join(docs, threshold=0.8).count())
cdc_shared_chunks(docs).orderBy(F.desc("shared_frac")).show(3)
new_batch = docs.filter("doc_id >= 400")
lake = docs.filter("doc_id < 400")
print("incoming batch docs already in the lake:",
      dedup_against_index(new_batch, lake, threshold=0.5).count())

emb = spark.table("embeddings")
pca_project(emb, k=8).select("vec_id", "pca").show(3, truncate=60)
pmi_collocations(docs, k=5, min_count=5).show()
zipf_fit(docs).show()
bigram_logprob(docs).orderBy("mean_logprob").show(3)
quality_logistic(docs).filter("NOT keep").show(3)
tokenize_to_ids(docs).select("doc_id", "n_tokens").show(3)
print("curate_v2 survivors:", curate_v2(docs).count())

# 9. Fingerprints, negatives, reporting
from datalakeingestion_spark.operators.dedup import (  # noqa: E402
    winnowing_fingerprint_pairs,
)
from datalakeingestion_spark.operators.similarity import (  # noqa: E402
    embedding_centroid_outliers,
    label_centroid_similarity,
    sample_negatives,
)

print("winnowing fingerprint pairs:",
      winnowing_fingerprint_pairs(docs, min_shared=2).count())
embedding_centroid_outliers(emb, k_outliers=5).filter("is_outlier").show()
label_centroid_similarity(emb).orderBy(F.desc("cosine")).show(3)
sample_negatives(emb, emb.filter("vec_id < 2"), k_neg=5).show()

# 10. Continuation operators: views, graphs, layout, reconciliation
from pyspark.sql import functions as F  # noqa: E402

from datalakeingestion_spark.operators.graph import (  # noqa: E402
    customer_supplier_edges,
    pagerank_fixed_point,
)
from datalakeingestion_spark.operators.layout import (  # noqa: E402
    compaction_plan,
)
from datalakeingestion_spark.operators.mv import (  # noqa: E402
    aggregate_state,
    finalize_state,
    merge_states,
)
from datalakeingestion_spark.operators.profiling import (  # noqa: E402
    groupwise_ols,
    mad_outliers,
)
from datalakeingestion_spark.operators.reconcile import (  # noqa: E402
    checksum_diff,
)
from datalakeingestion_spark.operators.sampling import (  # noqa: E402
    mix_corpora_temperature,
    weighted_sample_aes,
)

li = spark.table("lineitem")
orders = spark.table("orders")

# incremental view: fold a new batch into the old state, never rescan
keys, meas = ["l_returnflag"], {"rev": F.col("l_extendedprice").cast("decimal(18,4)")}
old = aggregate_state(li.filter("l_shipdate < '1997-01-01'"), keys, meas)
new = aggregate_state(li.filter("l_shipdate >= '1997-01-01'"), keys, meas)
finalize_state(merge_states([old, new], keys), keys).show()

pagerank_fixed_point(customer_supplier_edges(orders, li), iters=3) \
    .orderBy(F.desc("rank")).show(5)

files = li.groupBy("l_shipdate").agg(
    (F.count(F.lit(1)) * 120).cast("long").alias("bytes"))
compaction_plan(files, ["l_shipdate"], "bytes", 100_000, "l_shipdate") \
    .groupBy("merge_group").count().orderBy("merge_group").show(5)

mad_outliers(li, ["l_returnflag"], "l_extendedprice").show()
groupwise_ols(li, ["l_returnflag"], "l_quantity", "l_extendedprice").show()

canon = li.select("l_orderkey", "l_linenumber",
                  F.col("l_extendedprice").cast("decimal(15,2)").alias("p"))
print("diff blocks after dropping one order family:",
      checksum_diff(canon, canon.filter("l_orderkey % 1000 != 7"),
                    ["l_orderkey", "l_linenumber", "p"]).count())

mix_corpora_temperature(docs, "source", "doc_id") \
    .groupBy("source").count().show(5)
weighted_sample_aes(docs, F.col("n_chars"), "doc_id", 5) \
    .select("doc_id", "n_chars").show()

# 9. Drift monitoring: PSI + grid-KS of live windows vs a training
# reference (same code runs on a watermarked stream)
from datalakeingestion_spark.streaming.drift import (  # noqa: E402
    reference_histogram,
    windowed_ks_grid,
    windowed_psi_drift,
)

ev = spark.table("events").filter(F.col("value").isNotNull())
ref = reference_histogram(
    ev.filter("ts < '2024-01-15'"), "value", lo=0.0, hi=500.0
)
windowed_psi_drift(ev, ref, "value", lo=0.0, hi=500.0) \
    .groupBy("window_start_s") \
    .agg(F.round(F.sum("psi_contrib"), 6).alias("psi")) \
    .orderBy("window_start_s").show()
windowed_ks_grid(ev, ref, "value", lo=0.0, hi=500.0) \
    .orderBy("window_start_s").show()

# 10. Dedup-at-the-door against a PERSISTED bucketed index
from datalakeingestion_spark.operators.dedup import (  # noqa: E402
    build_dedup_index,
    dedup_against_stored_index,
)

lake_docs = docs.filter("doc_id % 2 = 0")
batch_docs = docs.filter("doc_id % 2 = 1").select(
    (F.col("doc_id") + 1_000_000).alias("doc_id"),
    F.concat("text", F.lit(" v2")).alias("text"),
)
build_dedup_index(lake_docs, "qs_index", n_buckets=4)
dedup_against_stored_index(batch_docs, "qs_index", threshold=0.5).show(5)
for t in ("qs_index_bands", "qs_index_shingles"):
    spark.sql(f"DROP TABLE IF EXISTS {t}")
