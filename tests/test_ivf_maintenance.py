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


def test_train_centroids_local_matches_distributed(spark, monkeypatch):
    """r13 size-adaptive Lloyd: the driver-side trainer must be
    BIT-IDENTICAL to the distributed loop (same hash-seeded init, same
    assignment kernel, and the decimal(28,12) mean arithmetic collected
    from Spark's own cast) across configs, including iters=0 and a
    non-divisible k."""
    from datalakeingestion_spark.operators import ivf as ivf_mod

    emb = load_table(spark, SF_SMALL, "embeddings")
    for k, iters in [(8, 2), (16, 5), (5, 3), (8, 0)]:
        local = train_centroids(emb, k=k, iters=iters)
        monkeypatch.setattr(ivf_mod, "MAX_LOCAL_TRAIN_VECTORS", -1)
        dist = train_centroids(emb, k=k, iters=iters)
        monkeypatch.undo()
        assert local.shape == dist.shape == (k, 64)
        assert (local == dist).all(), (k, iters)


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


@pytest.mark.smoke
def test_stored_ivf_index_probe_matches_inline(spark, tmp_path):
    """Persistence is a pure plan optimization: the stored-index probe
    returns the EXACT (query, neighbor, cosine) set of inline ivf_topk
    at the same config (deterministic trainer + shared kernel)."""
    from datalakeingestion_spark.operators.ivf import (
        build_ivf_index,
        ivf_topk_stored,
    )

    emb = load_table(spark, SF_SMALL, "embeddings").cache()
    q = emb.filter(F.col("vec_id") < 5)
    cfg = dict(n_centroids=16, iters=2, assign_n=2)
    path = str(tmp_path / "ivf")
    build_ivf_index(emb, path, **cfg)
    stored = ivf_topk_stored(spark, q, path, k=10, nprobe=6)
    inline = ivf_topk(emb, q, k=10, nprobe=6, **cfg)
    assert {tuple(r) for r in stored.collect()} == {
        tuple(r) for r in inline.collect()
    }


def test_stored_ivf_probe_prunes_to_probed_cells(spark, tmp_path):
    """The scale story: a probe READS only its nprobe cells' inverted
    lists (partition pruning at file listing) and the corpus side joins
    broadcast — no Exchange between the cells scan and the join."""
    from datalakeingestion_spark.operators.ivf import (
        build_ivf_index,
        ivf_topk_stored,
        read_ivf_index,
        _topcells_udf,
    )

    emb = load_table(spark, SF_SMALL, "embeddings").cache()
    q = emb.filter(F.col("vec_id") < 3)
    path = str(tmp_path / "ivf")
    build_ivf_index(emb, path, n_centroids=16, iters=1, assign_n=1)
    centroids, _ = read_ivf_index(spark, path)
    probed = {
        c
        for r in q.select(
            F.explode(_topcells_udf(centroids, 2)(F.col("embedding")))
        ).collect()
        for c in [r[0]]
    }
    result = ivf_topk_stored(spark, q, path, k=5, nprobe=2)
    plan = result._jdf.queryExecution().executedPlan().toString()
    # the cells FileScan carries a static partition filter with EXACTLY
    # the probed cell ids — file listing skips every other cell dir
    # (DataFrame.inputFiles() can't pin this: it lists the FileIndex
    # before pruning)
    import re

    m = re.search(r"PartitionFilters: \[cell#\d+ IN \(([\d,]+)\)", plan)
    assert m, plan
    pruned_to = {int(x) for x in m.group(1).split(",")}
    assert pruned_to == probed  # nothing outside the probed cells is read
    assert len(pruned_to) < 16  # pruning really skipped cells
    assert "BroadcastHashJoin" in plan  # corpus side never shuffles


def test_append_ivf_index_frozen_quantizer(spark, tmp_path):
    """Append assigns against the STORED centroids (no retraining) and
    the probe sees old+new rows immediately."""
    import numpy as np

    from datalakeingestion_spark.operators.ivf import (
        append_ivf_index,
        build_ivf_index,
        ivf_topk_stored,
        read_ivf_index,
    )

    emb = load_table(spark, SF_SMALL, "embeddings").cache()
    path = str(tmp_path / "ivf")
    c0 = build_ivf_index(
        emb.filter(F.col("vec_id") % 2 == 0), path, n_centroids=8, iters=1
    )
    before = spark.read.parquet(f"{path}/cells").count()
    append_ivf_index(emb.filter(F.col("vec_id") % 2 == 1), path)
    c1, meta = read_ivf_index(spark, path)
    assert (np.asarray(c0) == c1).all()  # quantizer frozen by append
    after = spark.read.parquet(f"{path}/cells").count()
    assert after > before
    got = ivf_topk_stored(spark, emb.filter(F.col("vec_id") < 3), path, k=10,
                          nprobe=4)
    ids = {r["neighbor_id"] for r in got.collect()}
    assert any(i % 2 == 1 for i in ids)  # appended half is probe-visible


def test_append_ivf_index_replay_and_duplicate_safety(spark, tmp_path):
    """Keyed appends are replay-idempotent (epoch ledger no-op); unkeyed
    duplicate appends cost probe work but never corrupt the top-k (the
    stored probe dedups scored pairs before ranking)."""
    from datalakeingestion_spark.operators.ivf import (
        append_ivf_index,
        build_ivf_index,
        ivf_topk_stored,
    )

    emb = load_table(spark, SF_SMALL, "embeddings").cache()
    path = str(tmp_path / "ivf")
    build_ivf_index(
        emb.filter(F.col("vec_id") % 2 == 0), path, n_centroids=8, iters=1,
        assign_n=1,
    )
    batch = emb.filter(F.col("vec_id") % 2 == 1)
    assert append_ivf_index(batch, path, batch_id="b1") is True
    n1 = spark.read.parquet(f"{path}/cells").count()
    # replayed delivery: exact no-op
    assert append_ivf_index(batch, path, batch_id="b1") is False
    assert spark.read.parquet(f"{path}/cells").count() == n1

    # unkeyed retry duplicates rows, but the probe output stays clean:
    # no duplicate (query, neighbor) pair, k slots all distinct
    append_ivf_index(batch, path)
    assert spark.read.parquet(f"{path}/cells").count() > n1
    got = ivf_topk_stored(
        spark, emb.filter(F.col("vec_id") < 3), path, k=10, nprobe=4
    ).collect()
    pairs = [(r["query_id"], r["neighbor_id"]) for r in got]
    assert len(pairs) == len(set(pairs))


def test_epoch_ledger_read_errors_propagate(spark, tmp_path):
    """The replay guard's narrow catch: a MISSING ledger means 'first
    append' (False); a ledger that exists but cannot be read must RAISE,
    never silently report 'not seen' (which would downgrade a keyed
    append to at-least-once and duplicate index rows)."""
    from datalakeingestion_spark.operators.ivf import _epoch_seen

    idx = tmp_path / "ivf"
    idx.mkdir()
    assert _epoch_seen(spark, str(idx), "b1") is False  # no ledger yet

    # a corrupt ledger (non-parquet bytes where the ledger dir should
    # be) is a read FAILURE, not an empty ledger
    (idx / "epochs").write_bytes(b"not a parquet file at all")
    with pytest.raises(Exception, match="(?i)parquet|footer|corrupt"):
        _epoch_seen(spark, str(idx), "b1")


def test_split_hot_cells_targeted_rewrite_and_conservation(spark, tmp_path):
    """split_hot_cells: the repair rewrites ONLY the split cell's
    directory (plus the new cell it creates) — every other inverted
    list's files are untouched; the index row set is conserved exactly;
    the binary partition is faithful (each row sits with its nearer
    sub-centroid); geometry (centroids + meta) commits to k+1; and a
    degenerate cell (identical vectors) is skipped, not corrupted."""
    import os

    import numpy as np

    from datalakeingestion_spark.operators.ivf import (
        build_ivf_index,
        ivf_topk_stored,
        read_ivf_index,
        split_hot_cells,
    )

    emb = load_table(spark, SF_SMALL, "embeddings").cache()
    ix = str(tmp_path / "ix")
    build_ivf_index(emb, ix, n_centroids=8, iters=2, assign_n=2)

    def dir_files(cell):
        d = f"{ix}/cells/cell={cell}"
        return sorted(
            (f, os.path.getmtime(os.path.join(d, f)))
            for f in os.listdir(d)
            if f.endswith(".parquet")
        )

    sizes = {
        r["cell"]: r["n"]
        for r in spark.read.parquet(f"{ix}/cells")
        .groupBy("cell").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    hot = max(sizes, key=lambda c: (sizes[c], -c))
    others_before = {c: dir_files(c) for c in sizes if c != hot}
    total_before = sum(sizes.values())

    rep = split_hot_cells(spark, ix, cells=[hot])
    assert rep["split"] == [(hot, 8)]
    # untouched inverted lists: same files, same mtimes
    assert {c: dir_files(c) for c in others_before} == others_before
    sa = rep["sizes_after"]
    assert sum(sa.values()) == total_before
    assert sa[hot] + sa[8] == sizes[hot]
    assert sa[hot] > 0 and sa[8] > 0

    # binary-partition faithfulness: every row sits with its nearer half
    cent, meta = read_ivf_index(spark, ix)
    assert len(cent) == 9 and meta["n_centroids"] == 9

    def unit(v):
        n = np.linalg.norm(v)
        return v / (n if n else 1.0)

    a, b = unit(cent[hot]), unit(cent[8])
    rows = (
        spark.read.option("basePath", f"{ix}/cells")
        .parquet(f"{ix}/cells")
        .filter(F.col("cell").isin([hot, 8]))
        .collect()
    )
    for r in rows:
        v = unit(np.array(list(r["c_vec"]), dtype=np.float64))
        ca, cb = float(v @ a), float(v @ b)
        if r["cell"] == hot:
            assert ca >= cb  # ties keep the surviving cell
        else:
            assert cb > ca

    # probe still serves every query with k valid neighbors
    got = ivf_topk_stored(
        spark, emb.filter(F.col("vec_id") < 3), ix, k=5, nprobe=3
    ).collect()
    assert len(got) == 3 * 5

    # degenerate cell: identical vectors cannot split -> skipped
    ix2 = str(tmp_path / "ix2")
    same = spark.createDataFrame(
        [(i, [1.0, 0.0, 0.0, 0.0]) for i in range(40)],
        "vec_id long, embedding array<double>",
    )
    build_ivf_index(same, ix2, n_centroids=2, iters=1, assign_n=1)
    sizes2 = {
        r["cell"]: r["n"]
        for r in spark.read.parquet(f"{ix2}/cells")
        .groupBy("cell").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    target = max(sizes2, key=sizes2.get)
    rep2 = split_hot_cells(spark, ix2, cells=[target])
    assert rep2["split"] == [] and rep2["skipped"] == [target]
    cent2, meta2 = read_ivf_index(spark, ix2)
    assert meta2["n_centroids"] == 2  # geometry untouched on skip


def test_split_hot_cells_crash_recovery_converges(spark, tmp_path):
    """Every split crash window converges on the next call without loss
    or double-splitting: (a) move-write done but intent never logged ->
    orphan directory deleted; (b) logged but geometry never committed ->
    rolled back; (c) geometry committed but swap unfinished -> finished
    from durable state (no second new cell, rows conserved exactly)."""
    import numpy as np

    from datalakeingestion_spark.operators.ivf import (
        _topcells_udf,
        build_ivf_index,
        read_ivf_index,
        split_hot_cells,
    )

    emb = load_table(spark, SF_SMALL, "embeddings").cache()

    def fresh(name):
        ix = str(tmp_path / name)
        build_ivf_index(emb, ix, n_centroids=4, iters=1, assign_n=1)
        total = spark.read.parquet(f"{ix}/cells").count()
        return ix, total

    def cells_of(ix):
        return {
            r["cell"]: r["n"]
            for r in spark.read.parquet(f"{ix}/cells")
            .groupBy("cell").agg(F.count(F.lit(1)).alias("n")).collect()
        }

    # (a) orphan move-write, no log: recovery deletes it, then the call
    # proceeds to a normal (fully logged) split of the target
    ix, total = fresh("a")
    victim = spark.read.option("basePath", f"{ix}/cells").parquet(
        f"{ix}/cells").filter(F.col("cell") == 0).drop("cell").limit(5)
    victim.write.parquet(f"{ix}/cells/cell=99")
    rep = split_hot_cells(spark, ix, cells=[1])
    assert 99 not in rep["sizes_after"]
    assert sum(rep["sizes_after"].values()) == total
    assert rep["split"] == [(1, 4)]

    # (b) logged split whose geometry never committed: rolled back
    ix, total = fresh("b")
    victim = spark.read.option("basePath", f"{ix}/cells").parquet(
        f"{ix}/cells").filter(F.col("cell") == 0).drop("cell").limit(5)
    victim.write.parquet(f"{ix}/cells/cell=4")
    spark.createDataFrame([(0, 4)], "src int, new int").coalesce(1) \
        .write.mode("overwrite").parquet(f"{ix}/_split_log")
    rep = split_hot_cells(spark, ix, max_skew=100.0)  # nothing hot
    assert rep["split"] == [] and rep["recovered"] == []
    assert sum(cells_of(ix).values()) == total  # rollback: no dup rows
    cent, meta = read_ivf_index(spark, ix)
    assert meta["n_centroids"] == 4

    # (c) geometry committed, swap unfinished: recovery finishes it
    ix, total = fresh("c")
    sizes0 = cells_of(ix)
    hot = max(sizes0, key=lambda c: (sizes0[c], -c))
    rep1 = split_hot_cells(spark, ix, cells=[hot])
    assert rep1["split"] == [(hot, 4)]
    clean = cells_of(ix)
    # reconstruct the mid-crash state: moved rows back in the split
    # cell (duplicates), log re-written as if the swap never ran
    cent, _ = read_ivf_index(spark, ix)
    moved = spark.read.option("basePath", f"{ix}/cells").parquet(
        f"{ix}/cells").filter(F.col("cell") == 4).drop("cell")
    moved.write.mode("append").parquet(f"{ix}/cells/cell={hot}")
    spark.createDataFrame([(int(hot), 4)], "src int, new int").coalesce(1) \
        .write.mode("overwrite").parquet(f"{ix}/_split_log")
    assert cells_of(ix)[hot] == clean[hot] + clean[4]  # dup window
    rep2 = split_hot_cells(spark, ix, max_skew=100.0)
    assert rep2["recovered"] == [(hot, 4)]
    assert rep2["split"] == []  # never double-splits into cell 5
    after = cells_of(ix)
    assert after == clean  # exact convergence
    _, meta = read_ivf_index(spark, ix)
    assert meta["n_centroids"] == 5


def test_split_hot_cells_sampled_training_path(spark, tmp_path):
    """The hash-sampled 2-means training branch (cells above
    train_sample_cap): assignment still covers EVERY row, rows are
    conserved exactly, and the split remains deterministic across two
    identical runs."""
    from datalakeingestion_spark.operators.ivf import (
        build_ivf_index,
        split_hot_cells,
    )

    emb = load_table(spark, SF_SMALL, "embeddings").cache()

    def run(name):
        ix = str(tmp_path / name)
        build_ivf_index(emb, ix, n_centroids=4, iters=1, assign_n=1)
        sizes = {
            r["cell"]: r["n"]
            for r in spark.read.parquet(f"{ix}/cells")
            .groupBy("cell").agg(F.count(F.lit(1)).alias("n")).collect()
        }
        hot = max(sizes, key=lambda c: (sizes[c], -c))
        # cap far below the cell size -> the sampled branch runs
        rep = split_hot_cells(
            spark, ix, cells=[hot], train_sample_cap=20
        )
        assert rep["split"] == [(hot, 4)]
        after = rep["sizes_after"]
        assert sum(after.values()) == sum(sizes.values())
        assert after[hot] + after[4] == sizes[hot]
        return after

    assert run("s1") == run("s2")  # hash-sample -> deterministic
