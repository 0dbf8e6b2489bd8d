from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from datalakeingestion_spark.config.partition_spec import PartitionSpec
from datalakeingestion_spark.ingest.maintenance import compact, count_data_files
from datalakeingestion_spark.operators import similarity as sim
from datalakeingestion_spark.operators.ivf import ivf_topk, train_centroids
from datalakeingestion_spark.sources.fixtures import load_table

from .conftest import SF_SMALL


@pytest.mark.smoke
def test_ivf_centroids_deterministic(spark):
    emb = load_table(spark, SF_SMALL, "embeddings")
    c1 = train_centroids(emb, k=8, iters=2)
    c2 = train_centroids(emb, k=8, iters=2)
    assert c1.shape == (8, 64)
    assert (c1 == c2).all()  # decimal-exact means → bit-identical runs


def test_ivf_recall_against_brute_force(spark):
    emb = load_table(spark, SF_SMALL, "embeddings").cache()
    q = emb.filter(F.col("vec_id") < 5)
    bf = {(r.query_id, r.neighbor_id) for r in sim.cosine_topk(emb, q, 10).collect()}
    ivf = {
        (r.query_id, r.neighbor_id)
        for r in ivf_topk(emb, q, k=10, n_centroids=16, nprobe=6).collect()
    }
    recall = len(bf & ivf) / len(bf)
    # deterministic pipeline → stable measured value (0.90 at 6/16 cells
    # with assign_n=2 multi-assignment on these weakly-clustered synthetic
    # vectors; was 0.70 single-assign); pinned with margin
    assert recall >= 0.85, recall
    assert all(a != b for a, b in ivf)


def test_compact_partitioned_lake(spark, tmp_path):
    events = load_table(spark, SF_SMALL, "events")
    target = str(tmp_path / "lake" / "ev")
    spec = PartitionSpec("ts", "time-based", "YYYYMMDD")
    # simulate many small incremental appends → many files
    derived = spec.derive(events)
    for i in range(4):
        derived.filter(F.col("event_id") % 4 == i).write.mode("append").partitionBy(
            "ts_part"
        ).parquet(target)
    before = count_data_files(spark, target)
    n = compact(spark, target, partition_col="ts_part", files_per_partition=1)
    after = count_data_files(spark, target)
    n_partitions = derived.select("ts_part").distinct().count()
    assert n == events.count()
    assert after <= n_partitions < before
    # data identical post-compaction
    back = spark.read.parquet(target)
    assert back.count() == events.count()
    assert back.select(F.sum("event_id")).first()[0] == events.select(
        F.sum("event_id")
    ).first()[0]
    # layout preserved
    assert "ts_part" in back.columns
    import glob

    assert not glob.glob(target + ".__*")


def test_compact_unpartitioned(spark, tmp_path):
    target = str(tmp_path / "flat")
    for i in range(5):
        spark.range(i * 10, (i + 1) * 10).write.mode("append").parquet(target)
    assert count_data_files(spark, target) >= 5
    n = compact(spark, target)
    assert n == 50
    assert count_data_files(spark, target) == 1
    assert spark.read.parquet(target).count() == 50


def test_zorder_write_roundtrip_and_locality(spark, tmp_path):
    from datalakeingestion_spark.functions.zorder import write_zordered, z_value

    li = load_table(spark, SF_SMALL, "lineitem")
    target = str(tmp_path / "zli")
    write_zordered(li, target, "l_orderkey", "l_partkey", n_files=4)
    back = spark.read.parquet(target)
    assert back.count() == li.count()
    assert back.select(F.sum("l_orderkey")).first()[0] == li.select(
        F.sum("l_orderkey")
    ).first()[0]

    # python-reference check of the interleave
    rows = li.limit(20).select(
        "l_orderkey", "l_partkey",
        z_value(F.col("l_orderkey") % 65536, F.col("l_partkey") % 65536).alias("z"),
    ).collect()

    def interleave(a, b):
        z = 0
        for i in range(16):
            z |= ((a >> i) & 1) << (2 * i)
            z |= ((b >> i) & 1) << (2 * i + 1)
        return z

    for r in rows:
        assert r["z"] == interleave(r["l_orderkey"] % 65536, r["l_partkey"] % 65536)

    # locality: per-file envelopes on BOTH columns are tight vs global span
    import pyarrow.parquet as pq
    import glob as g

    spans_a = []
    for f in g.glob(target + "/*.parquet"):
        md = pq.read_metadata(f)
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            col = md.row_group(rg).column(0)  # l_orderkey
            mins.append(col.statistics.min)
            maxs.append(col.statistics.max)
        spans_a.append(max(maxs) - min(mins))
    global_span = li.agg(
        F.max("l_orderkey") - F.min("l_orderkey")
    ).first()[0]
    # each z-range file covers a fraction of the orderkey domain
    assert sum(spans_a) / len(spans_a) < global_span


def test_kmeans_profile_contract(spark):
    """All contract booleans hold on the fixture corpus, and the lift
    bound is doing real work: an absurd bound must fail coherence."""
    from datalakeingestion_spark.operators.ivf import kmeans_profile
    from datalakeingestion_spark.sources.fixtures import load_table

    from .conftest import SF_SMALL

    emb = load_table(spark, SF_SMALL, "embeddings")
    row = kmeans_profile(emb, k=8, iters=5, min_coherence_lift=0.1).first()
    assert row.n_vectors == 500
    assert 2 <= row.n_clusters_used <= 8
    assert row.clusters_ok and row.coherence_ok
    strict = kmeans_profile(emb, k=8, iters=5, min_coherence_lift=0.99).first()
    assert not strict.coherence_ok
