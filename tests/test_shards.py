from __future__ import annotations

from pathlib import Path

import pytest

from pyspark.sql import functions as F


def _sharded(spark, n_docs, budget=64, shard_budget=256, tok=None):
    from datalakeingestion_spark.operators.packing import pack_sequences
    from datalakeingestion_spark.operators.shards import assign_shards

    tok = tok or (lambda i: 7 + (i * 13) % 50)
    sized = spark.createDataFrame(
        [(i, tok(i)) for i in range(n_docs)], "doc_id long, n_tokens long"
    )
    packed = pack_sequences(sized, token_budget=budget)
    return assign_shards(packed, shard_token_budget=shard_budget)


@pytest.mark.smoke
def test_shard_write_is_idempotent_and_incremental(spark, tmp_path):
    """The delivery contract: a re-run over identical input rewrites
    NOTHING; an append rewrites only the tail shards whose content
    changed (packing is prefix-sum deterministic, so appended doc_ids
    never disturb earlier shards)."""
    from datalakeingestion_spark.operators.shards import (
        read_shard_manifest,
        write_training_shards,
    )

    path = str(tmp_path / "shards")
    first = write_training_shards(_sharded(spark, 120), path)
    assert first["written"] and not first["skipped"] and not first["vacuumed"]
    m1 = {
        r["shard_id"]: r for r in read_shard_manifest(spark, path).collect()
    }

    # replay: byte-identical input -> no shard rewritten, manifest equal
    again = write_training_shards(_sharded(spark, 120), path)
    assert again["written"] == []
    assert again["skipped"] == sorted(m1)
    assert again["vacuumed"] == []
    m2 = {
        r["shard_id"]: r for r in read_shard_manifest(spark, path).collect()
    }
    assert m1 == m2

    # append 40 docs: earlier shards untouched, only tail + new rewritten
    grown = write_training_shards(_sharded(spark, 160), path)
    assert grown["written"]
    assert grown["vacuumed"] == []
    untouched = set(grown["skipped"])
    assert untouched  # some prefix survived
    assert max(untouched) < min(grown["written"])  # strictly tail-only
    m3 = read_shard_manifest(spark, path)
    for s in untouched:
        assert m1[s] == [r for r in m3.collect() if r["shard_id"] == s][0]

    # directory tree == manifest: every shard dir exists, data matches
    data = spark.read.parquet(f"{path}/data")
    counts = {
        r["shard_id"]: r["n"]
        for r in data.groupBy("shard_id").agg(F.count("*").alias("n")).collect()
    }
    assert counts == {
        r["shard_id"]: r["n_docs"] for r in m3.collect()
    }
    assert data.count() == 160


def test_shard_shrink_vacuums_stale_directories(spark, tmp_path):
    from datalakeingestion_spark.operators.shards import (
        read_shard_manifest,
        write_training_shards,
    )

    path = str(tmp_path / "shards")
    write_training_shards(_sharded(spark, 160), path)
    shrunk = write_training_shards(_sharded(spark, 60), path)
    assert shrunk["vacuumed"]
    live = {
        r["shard_id"] for r in read_shard_manifest(spark, path).collect()
    }
    on_disk = {
        int(p.name.split("=")[1])
        for p in (Path(path) / "data").iterdir()
        if p.name.startswith("shard_id=")
    }
    assert on_disk == live
    assert spark.read.parquet(f"{path}/data").count() == 60


def test_shard_assignment_conserves_tokens_and_validates(spark):
    from datalakeingestion_spark.operators.shards import (
        assign_shards,
        shard_manifest,
    )

    sharded = _sharded(spark, 120)
    man = shard_manifest(sharded)
    total = man.agg(
        F.sum("n_tokens").alias("t"), F.sum("n_docs").alias("d")
    ).collect()[0]
    assert total["t"] == sum(7 + (i * 13) % 50 for i in range(120))
    assert total["d"] == 120
    # sequences never straddle shards
    straddle = (
        sharded.groupBy("seq_id")
        .agg(F.countDistinct("shard_id").alias("k"))
        .filter(F.col("k") > 1)
        .count()
    )
    assert straddle == 0
    with pytest.raises(ValueError, match="positive"):
        assign_shards(sharded, 0)


def test_read_training_shards_verifies_digests(spark, tmp_path):
    """The read half of the delivery contract: the manifest decides what
    exists, and verification fails LOUDLY on any shard whose content no
    longer matches the committed digest."""
    import glob
    import os

    from datalakeingestion_spark.operators.shards import (
        ShardIntegrityError,
        read_training_shards,
        write_training_shards,
    )

    path = str(tmp_path / "shards")
    write_training_shards(_sharded(spark, 120), path)

    back = read_training_shards(spark, path)
    assert back.count() == 120

    # restricted read: only the requested shards' rows come back
    some = [r["shard_id"] for r in back.select("shard_id").distinct()
            .orderBy("shard_id").limit(2).collect()]
    part = read_training_shards(spark, path, shards=some)
    assert {r["shard_id"] for r in part.select("shard_id").distinct()
            .collect()} == set(some)

    # unknown shard id -> loud failure
    with pytest.raises(ShardIntegrityError, match="not in the manifest"):
        read_training_shards(spark, path, shards=[some[0], 99999])

    # corrupt one shard behind the writer's back -> digest mismatch
    victim_dir = sorted(glob.glob(f"{path}/data/shard_id=*"))[0]
    victim_id = int(victim_dir.split("=")[1])
    for f in glob.glob(f"{victim_dir}/*.parquet"):
        os.remove(f)
    with pytest.raises(ShardIntegrityError, match=str(victim_id)):
        read_training_shards(spark, path)
    # unverified read still serves (the caller opted out)
    assert read_training_shards(spark, path, verify=False).count() < 120
    # and a verified read restricted to INTACT shards still passes
    intact = read_training_shards(
        spark, path, shards=[s for s in some if s != victim_id]
    )
    assert intact.count() > 0


def test_custom_shard_col_round_trip_and_orphan_detection(spark, tmp_path):
    """(a) a non-default shard_col works end to end (writer digest-diff
    + verifying reader); (b) an unrestricted verify=True read digests
    the WHOLE tree, so an uncommitted (orphan) shard directory fails
    loudly, while verify=False still never serves it."""
    from datalakeingestion_spark.operators.shards import (
        ShardIntegrityError,
        read_training_shards,
        write_training_shards,
    )

    path = str(tmp_path / "shards")
    sharded = _sharded(spark, 80).withColumnRenamed("shard_id", "part")
    first = write_training_shards(sharded, path, shard_col="part")
    assert first["written"]
    replay = write_training_shards(sharded, path, shard_col="part")
    assert replay["written"] == []  # digest-diff honors the custom column
    back = read_training_shards(spark, path, shard_col="part")
    assert back.count() == 80

    # plant an orphan shard directory the manifest never committed
    orphan = sharded.filter(F.col("part") == first["written"][0]).withColumn(
        "part", F.lit(424242)
    )
    orphan.write.mode("append").partitionBy("part").parquet(f"{path}/data")
    with pytest.raises(ShardIntegrityError, match="424242"):
        read_training_shards(spark, path, shard_col="part")
    # unverified read is manifest-restricted: the orphan stays invisible
    unv = read_training_shards(spark, path, shard_col="part", verify=False)
    assert unv.count() == 80
    assert unv.filter(F.col("part") == 424242).count() == 0
    # a restricted verified read of intact shards still passes
    ok = read_training_shards(
        spark, path, shards=first["written"][:1], shard_col="part"
    )
    assert ok.count() > 0


def test_null_token_docs_survive_pack_assign_and_manifest(spark):
    """A NULL token count (NULL text upstream) counts as 0 and the doc
    STAYS in the delivery — before the fix, F.size(tokens(NULL)) -> NULL
    n_tokens -> NULL seq_id -> the packed/shard equi-joins silently
    dropped the row from data AND manifest while the DuckDB oracle
    (NULL-skipping window SUM) kept it."""
    from datalakeingestion_spark.operators.packing import pack_sequences
    from datalakeingestion_spark.operators.shards import (
        assign_shards,
        shard_manifest,
    )

    rows = [(i, 7 + (i * 13) % 50) for i in range(60)]
    rows[5] = (5, None)
    rows[31] = (31, None)
    sized = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    packed = pack_sequences(sized, token_budget=64)
    sharded = assign_shards(packed, shard_token_budget=256)
    got = {r["doc_id"]: r for r in sharded.collect()}
    assert set(got) == set(range(60))  # nothing dropped
    assert got[5]["n_tokens"] == 0 and got[31]["n_tokens"] == 0
    assert got[5]["seq_id"] is not None and got[5]["shard_id"] is not None

    # serial reference with NULL->0: identical seq assignment
    cum, ref = 0, {}
    for i in range(60):
        tok = 0 if i in (5, 31) else 7 + (i * 13) % 50
        ref[i] = cum // 64
        cum += tok
    assert {i: r["seq_id"] for i, r in got.items()} == ref

    man = shard_manifest(sharded)
    tot = man.agg(F.sum("n_docs").alias("d"), F.sum("n_tokens").alias("t")).first()
    assert tot["d"] == 60
    assert tot["t"] == cum


def test_quota_enforced_delivery_contract_and_replay(spark, tmp_path):
    """write_training_shards_with_quota: per-source token quotas are
    never exceeded, under only by less than one doc when material is
    ample, unlisted sources are excluded, zero quotas deliver nothing,
    payload rides through, and a replay over identical input+quotas
    rewrites nothing."""
    from datalakeingestion_spark.operators.shards import (
        read_training_shards,
        select_to_quota,
        write_training_shards_with_quota,
    )

    rows = [
        (i, 10 + (i * 7) % 20, f"s{i % 4}", f"text-{i}") for i in range(200)
    ]
    sized = spark.createDataFrame(
        rows, "doc_id long, n_tokens long, source string, text string"
    )
    quotas = {"s0": 300, "s1": 150, "s2": 10_000_000, "s3": 0}
    path = str(tmp_path / "quota_delivery")
    report = write_training_shards_with_quota(
        sized, quotas, path, seq_token_budget=64, shard_token_budget=256
    )
    sel = report["selected"]
    # never over; under only by < one doc when material is ample
    per_src_max = {s: max(r[1] for r in rows if r[2] == s) for s in quotas}
    s2_total = sum(r[1] for r in rows if r[2] == "s2")
    assert sel["s0"]["n_tokens"] <= 300
    assert sel["s0"]["n_tokens"] > 300 - per_src_max["s0"]
    assert sel["s1"]["n_tokens"] <= 150
    assert sel["s1"]["n_tokens"] > 150 - per_src_max["s1"]
    assert sel["s2"]["n_tokens"] == s2_total  # slack quota: all of it
    assert "s3" not in sel or sel.get("s3", {"n_docs": 0})["n_docs"] == 0

    back = read_training_shards(spark, path)
    assert {"source", "text"} <= set(back.columns)  # payload delivered
    assert back.filter(F.col("source") == "s3").count() == 0
    mix = {
        r["source"]: r["t"]
        for r in back.groupBy("source").agg(F.sum("n_tokens").alias("t")).collect()
    }
    assert mix == {s: v["n_tokens"] for s, v in sel.items()}

    replay = write_training_shards_with_quota(
        sized, quotas, path, seq_token_budget=64, shard_token_budget=256
    )
    assert replay["written"] == [] and replay["vacuumed"] == []

    # selection is an md5 permutation, not the ingest-order head
    kept = {
        r["doc_id"]
        for r in select_to_quota(sized, {"s1": 150}).collect()
    }
    s1_head = [i for i in range(200) if i % 4 == 1][: len(kept)]
    assert kept != set(s1_head)

    with pytest.raises(ValueError, match="negative"):
        write_training_shards_with_quota(sized, {"s0": -1}, path)


def test_quota_writer_custom_column_names(spark, tmp_path):
    """Non-default id/tokens column names flow through selection, pack,
    assign, payload join and the writer (regression: tokens_col was not
    forwarded to assign_shards)."""
    from datalakeingestion_spark.operators.shards import (
        read_training_shards,
        write_training_shards_with_quota,
    )

    sized = spark.createDataFrame(
        [(i, 10 + i % 5, f"s{i % 2}", f"payload-{i}") for i in range(60)],
        "item long, tok long, source string, blob string",
    )
    path = str(tmp_path / "d")
    report = write_training_shards_with_quota(
        sized, {"s0": 200, "s1": 120}, path,
        id_col="item", tokens_col="tok",
        seq_token_budget=32, shard_token_budget=128,
    )
    assert report["selected"]["s0"]["n_tokens"] <= 200
    assert report["selected"]["s1"]["n_tokens"] <= 120
    back = read_training_shards(spark, path, id_col="item",
                                tokens_col="tok")
    assert {"item", "tok", "blob", "source"} <= set(back.columns)
    assert back.count() == sum(
        v["n_docs"] for v in report["selected"].values()
    )


def test_resume_table_batch_and_streaming_orders(spark):
    """resume_table works over any manifest: exact accounting in
    shard_id order (batch) and in (epoch, shard_id) order (streaming
    snapshot shape); reserved output columns raise on collision."""
    from datalakeingestion_spark.operators.shards import resume_table

    # streaming-shaped manifest: two epochs, shards restart per epoch
    man = spark.createDataFrame(
        [
            (0, 0, 3, 100, "d00"),
            (0, 1, 2, 60, "d01"),
            (1, 0, 4, 40, "d10"),
        ],
        "epoch long, shard_id long, n_docs long, n_tokens long, "
        "digest string",
    )
    rows = {
        (r["epoch"], r["shard_id"]): r
        for r in resume_table(
            man, order_cols=["epoch", "shard_id"]
        ).collect()
    }
    assert rows[(0, 0)]["tokens_before"] == 0
    assert rows[(0, 1)]["tokens_before"] == 100
    assert rows[(1, 0)]["tokens_before"] == 160
    assert rows[(1, 0)]["tokens_remaining"] == 0
    assert rows[(0, 1)]["tokens_remaining"] == 40
    # exact integer ppm of a 200-token delivery
    assert rows[(0, 1)]["progress_ppm"] == 100 * 1_000_000 // 200

    with pytest.raises(ValueError, match="reserved"):
        resume_table(man.withColumnRenamed("digest", "tokens_before"))


def test_assign_shards_aligned_equals_general(spark):
    """r12: the aligned fast path (shard_id = seq_id div ratio) must
    equal the general two-level prefix sum EXACTLY — same rows, same
    column order, same dtypes — across budget ratios, pack orders,
    zero-token docs and docs far larger than the sequence budget, and
    must add ZERO Exchange/join nodes beyond the pack itself."""
    from datalakeingestion_spark.operators.packing import pack_sequences
    from datalakeingestion_spark.operators.shards import (
        assign_shards,
        assign_shards_aligned,
    )

    def tok(i):
        # zero-token docs, small docs, and docs spanning many sequences
        return [0, 3, 700, 64, 1, 0, 130, 65][i % 8] + (i * 7) % 9

    sized = spark.createDataFrame(
        [(i * 3 + 1, tok(i)) for i in range(200)],
        "doc_id long, n_tokens long",
    )
    for seq_b, shard_b in [(64, 512), (100, 300), (7, 21), (1, 8)]:
        packed = pack_sequences(sized, token_budget=seq_b)
        gen = assign_shards(packed, shard_token_budget=shard_b)
        fast = assign_shards_aligned(packed, shard_b, seq_b)
        assert fast.columns == gen.columns, (seq_b, shard_b)
        assert fast.schema == gen.schema, (seq_b, shard_b)
        assert sorted(map(tuple, fast.collect())) == sorted(
            map(tuple, gen.collect())
        ), (seq_b, shard_b)

    # curriculum-style pack order: the identity only uses the shared
    # global order, so any order_cols must agree too
    packed = pack_sequences(
        sized, token_budget=64, order_cols=["n_tokens", "doc_id"]
    )
    assert sorted(
        map(tuple, assign_shards_aligned(packed, 512, 64).collect())
    ) == sorted(map(tuple, assign_shards(packed, 512).collect()))

    # non-divisible budgets fall back to the general operator
    packed = pack_sequences(sized, token_budget=100)
    assert sorted(
        map(tuple, assign_shards_aligned(packed, 250, 100).collect())
    ) == sorted(map(tuple, assign_shards(packed, 250).collect()))

    # plan shape: the aligned path adds no Exchange and no join beyond
    # what the pack itself needs
    packed = pack_sequences(sized, token_budget=64)
    base = packed._jdf.queryExecution().executedPlan().toString()
    fastp = (
        assign_shards_aligned(packed, 512, 64)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert fastp.count("Exchange") == base.count("Exchange")
    # pack's own offsets broadcast join is the ONLY join either way
    assert fastp.count("Join") == base.count("Join")
    assert "SortMergeJoin" not in fastp

    with pytest.raises(ValueError, match="positive"):
        assign_shards_aligned(packed, 0, 64)
    with pytest.raises(ValueError, match="positive"):
        assign_shards_aligned(packed, 512, 0)
