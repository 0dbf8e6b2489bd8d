"""Temperature-based corpus mixing (operators/sampling.py)."""

from __future__ import annotations

import pytest

import math

from pyspark.sql import functions as F

from datalakeingestion_spark.operators.sampling import mix_corpora_temperature


@pytest.mark.smoke
def test_temperature_mix_rates_and_determinism(spark):
    rows = [
        (i, "big" if i < 900 else ("mid" if i < 990 else "small"))
        for i in range(1000)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    kept = mix_corpora_temperature(df, "source", "doc_id")
    counts = {
        r["source"]: r["n"]
        for r in kept.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    # smallest source keeps everything (threshold = 2^32)
    assert counts.get("small", 0) == 10
    # expected keep rates: sqrt(n_min/n_s), within sampling noise
    for src, n_s in (("big", 900), ("mid", 90)):
        q = math.sqrt(10 / n_s)
        assert abs(counts.get(src, 0) / n_s - q) < 0.15
    # deterministic: rerun yields identical kept keys
    a = sorted(r["doc_id"] for r in kept.collect())
    b = sorted(
        r["doc_id"]
        for r in mix_corpora_temperature(df, "source", "doc_id").collect()
    )
    assert a == b


def test_threshold_column_is_exact_ieee_math(spark):
    df = spark.createDataFrame(
        [(i, "a" if i < 64 else "b") for i in range(80)],
        "doc_id long, source string",
    )
    thr = {
        r["source"]: r["mix_rate_threshold"]
        for r in mix_corpora_temperature(df, "source", "doc_id")
        .select("source", "mix_rate_threshold")
        .distinct()
        .collect()
    }
    assert thr["b"] == 1 << 32  # smallest source: q = 1.0
    assert thr["a"] == math.floor(math.sqrt(16 / 64) * float(1 << 32))


def test_aes_weighting_biases_toward_heavy_rows(spark):
    from datalakeingestion_spark.operators.sampling import weighted_sample_aes

    # 100 heavy rows (w=50) vs 900 light rows (w=1): heavy rows carry
    # ~85% of total weight and should dominate a 100-draw sample
    rows = [(i, 50.0 if i < 100 else 1.0) for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    got = weighted_sample_aes(df, F.col("w"), "doc_id", 100).collect()
    heavy = sum(1 for r in got if r["w"] == 50.0)
    assert len(got) == 100
    assert heavy > 60
    # deterministic across reruns
    again = weighted_sample_aes(df, F.col("w"), "doc_id", 100).collect()
    assert sorted(r["doc_id"] for r in got) == sorted(
        r["doc_id"] for r in again
    )


def test_aes_excludes_nonpositive_weights(spark):
    import pytest as _pytest

    from datalakeingestion_spark.operators.sampling import weighted_sample_aes

    df = spark.createDataFrame(
        [(1, 0.0), (2, -3.0), (3, 1.0)], "doc_id long, w double"
    )
    got = weighted_sample_aes(df, F.col("w"), "doc_id", 10).collect()
    assert [r["doc_id"] for r in got] == [3]
    with _pytest.raises(ValueError):
        weighted_sample_aes(df, F.col("w"), "doc_id", 0)


# ---------------------------------------------------------------------------
# match_target_rates (target-distribution mixing)
# ---------------------------------------------------------------------------


def test_match_target_rates_binding_group_and_drops(spark):
    import pytest
    from pyspark.sql import functions as F

    from datalakeingestion_spark.operators.sampling import match_target_rates

    # a: 100 docs, b: 300, junk: 10 (not in targets -> dropped)
    df = spark.range(410).select(
        F.when(F.col("id") < 100, "a")
        .when(F.col("id") < 400, "b")
        .otherwise("junk")
        .alias("g")
    )
    rates = {
        r["g"]: (r["n_docs"], r["rate"])
        for r in match_target_rates(df, "g", {"a": 0.5, "b": 0.5}).collect()
    }
    # a is binding (100/0.5 = 200 < 300/0.5): keeps all; b keeps 100/300
    assert rates["a"] == (100, 1.0)
    assert rates["b"] == (300, round(100 / 300, 6))
    assert rates["junk"] == (10, 0.0)

    with pytest.raises(ValueError, match="non-empty"):
        match_target_rates(df, "g", {})
    with pytest.raises(ValueError, match="positive"):
        match_target_rates(df, "g", {"a": 0.0})


def test_match_target_rates_rejects_absent_target_group(spark):
    import pytest
    from pyspark.sql import functions as F

    from datalakeingestion_spark.operators.sampling import match_target_rates

    df = spark.range(10).select(F.lit("a").alias("g"))
    with pytest.raises(ValueError, match="absent from the corpus"):
        match_target_rates(df, "g", {"a": 0.5, "b": 0.5})


def test_match_target_rates_missing_group_still_raises_with_bounded_collect(
    spark,
):
    # the presence check collects only rows for the TARGET groups (driver
    # traffic bounded by len(targets)); a target absent from the corpus
    # must still fail loudly
    import pytest

    from datalakeingestion_spark.operators.sampling import match_target_rates

    df = spark.createDataFrame(
        [(i, "a" if i % 2 else "b") for i in range(20)], "id int, g string"
    )
    with pytest.raises(ValueError, match="absent"):
        match_target_rates(df, "g", {"a": 0.5, "zz": 0.5})


def test_match_target_rates_rejects_null_target_key(spark):
    import pytest

    from datalakeingestion_spark.operators.sampling import match_target_rates

    df = spark.createDataFrame(
        [(1, None), (2, "a")], "id int, g string"
    )
    with pytest.raises(ValueError, match="None is not a valid"):
        match_target_rates(df, "g", {None: 0.5, "a": 0.5})


def test_cap_tokens_per_quota_per_group_budgets(spark):
    """Per-group budgets bind independently; unlisted groups are
    EXCLUDED (a mixture spec is exhaustive); NULL tokens count 0;
    reserved columns and negative quotas raise."""
    import pytest
    from datalakeingestion_spark.operators.sampling import (
        cap_tokens_per_quota,
    )

    rows = [(i, "a" if i < 10 else "b", 10 if i != 3 else None)
            for i in range(20)]
    df = spark.createDataFrame(rows, "id long, g string, tok long")
    out = cap_tokens_per_quota(df, "g", "tok", {"a": 45, "c": 100}, ["id"])
    got = sorted(r["id"] for r in out.collect())
    # group a in id order: tokens 10,10,10,NULL->0,10 ... running hits 45
    # after ids 0,1,2,3(0),4 -> running 40; id 5 -> 50 > 45 cut
    assert got == [0, 1, 2, 3, 4]
    assert out.filter("g = 'b'").count() == 0  # unlisted: excluded

    with pytest.raises(ValueError, match="negative"):
        cap_tokens_per_quota(df, "g", "tok", {"a": -5}, ["id"])
    with pytest.raises(ValueError, match="_running"):
        cap_tokens_per_quota(
            df.withColumn("_running", df.id), "g", "tok", {"a": 1}, ["id"]
        )


def test_upsample_by_factor_repeats_and_defaults(spark):
    """Integer epoch upsampling: listed groups repeat exactly factor
    times with 0-based repeat_idx, unlisted groups get the default,
    zero factors drop the group, negatives raise."""
    import pytest
    from datalakeingestion_spark.operators.sampling import (
        upsample_by_factor,
    )

    df = spark.createDataFrame(
        [(i, f"s{i % 3}") for i in range(30)], "id long, source string"
    )
    up = upsample_by_factor(df, {"s0": 3, "s1": 0})
    per = {
        r["source"]: r["n"]
        for r in up.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert per == {"s0": 30, "s2": 10}  # s1 dropped, s2 default 1x
    idxs = sorted(
        r["repeat_idx"]
        for r in up.filter("source = 's0' and id = 0").collect()
    )
    assert idxs == [0, 1, 2]
    assert up.filter("repeat_idx >= 3").count() == 0
    # (id, repeat_idx) unique
    assert (
        up.groupBy("id", "repeat_idx").count().filter("count > 1").count()
        == 0
    )
    with pytest.raises(ValueError, match="negative"):
        upsample_by_factor(df, {"s0": -1})
    with pytest.raises(ValueError, match="repeat_idx"):
        upsample_by_factor(up, {"s0": 2})
