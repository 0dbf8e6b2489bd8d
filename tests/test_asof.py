from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from datalakeingestion_spark.operators.asof import asof_join


def _ts(spark, rows, cols):
    df = spark.createDataFrame(rows, cols)
    for c in cols:
        if c.endswith("_s"):
            df = df.withColumn(c[:-2], F.to_timestamp(c)).drop(c)
    return df


@pytest.mark.smoke
def test_asof_edges(spark):
    left = _ts(
        spark,
        [
            (1, "k1", "2024-01-05 00:00:00"),  # between r1 and r2
            (2, "k1", "2024-01-01 00:00:00"),  # exactly at r1 → matches r1
            (3, "k1", "2023-12-31 00:00:00"),  # before any right row → nulls
            (4, "k2", "2024-06-01 00:00:00"),  # key with no right rows → nulls
            (5, "k1", "2024-02-01 00:00:00"),  # after all → latest, tie-broken
        ],
        ["event_id", "k", "t_s"],
    )
    right = _ts(
        spark,
        [
            (10, "k1", "2024-01-01 00:00:00", 1.0),
            (11, "k1", "2024-01-10 00:00:00", 2.0),
            # two right rows at the SAME timestamp → max tie_break (13) wins
            (12, "k1", "2024-01-20 00:00:00", 3.0),
            (13, "k1", "2024-01-20 00:00:00", 4.0),
        ],
        ["rid", "k", "t_s", "val"],
    )
    out = asof_join(
        left, right,
        left_key="k", right_key="k",
        left_ts="t", right_ts="t",
        value_cols=["rid", "val"], tie_break="rid",
    )
    got = {r["event_id"]: (r["rid"], r["val"]) for r in out.collect()}
    assert got[1] == (10, 1.0)
    assert got[2] == (10, 1.0)  # equal timestamps match (right sorts first)
    assert got[3] == (None, None)
    assert got[4] == (None, None)
    assert got[5] == (13, 4.0)  # same-ts winner = max tie_break
    assert len(got) == 5  # every left row survives exactly once


def test_scd2_intervals_partition_timeline(spark):
    """SCD2 invariants per key: intervals chain (next.valid_from ==
    prev.valid_to), exactly one open (is_current) row per key, and
    valid_from < valid_to on every closed row."""
    from pyspark.sql import functions as F

    from datalakeingestion_spark.operators.relational import scd2_history
    from datalakeingestion_spark.sources.fixtures import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events").select(
        "event_id", "user_id", "ts"
    )
    h = scd2_history(ev, ["user_id"], "ts", ["event_id"])

    # exactly one current row per key
    cur = h.filter("is_current").groupBy("user_id").count()
    assert cur.filter("count != 1").count() == 0
    assert cur.count() == ev.select("user_id").distinct().count()

    # closed rows: valid_from <= valid_to (ties possible on equal ts;
    # the tie-break column orders them deterministically)
    assert h.filter(
        (~F.col("is_current")) & (F.col("valid_from") > F.col("valid_to"))
    ).count() == 0

    # chain: sorted by (ts, event_id), each row's valid_to equals the
    # next row's valid_from
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    chained = h.withColumn("nxt_from", F.lead("valid_from").over(w))
    assert chained.filter(
        F.col("nxt_from").isNotNull() & (F.col("valid_to") != F.col("nxt_from"))
    ).count() == 0


def test_fuzzy_join_hamming_matches_brute_force(spark):
    """Exactness of segment blocking: results equal the all-pairs ground
    truth on random equal-length strings, for several k and segment
    counts (any s >= k+1 must preserve recall)."""
    import itertools
    import random

    from pyspark.sql import functions as F

    from datalakeingestion_spark.operators.fuzzyjoin import fuzzy_join_hamming

    rng = random.Random(11)
    rows = [
        (i, "".join(rng.choice("ab") for _ in range(8))) for i in range(120)
    ]
    df = spark.createDataFrame(rows, ["rid", "key"])

    def brute(k):
        out = set()
        for (i, a), (j, b) in itertools.combinations(rows, 2):
            d = sum(x != y for x, y in zip(a, b))
            if d <= k:
                out.add((i, j, d))
        return out

    for k, s in [(1, None), (1, 4), (2, None), (2, 5)]:
        got = {
            (r["left_id"], r["right_id"], r["hamming"])
            for r in fuzzy_join_hamming(
                df, df, "rid", "rid", F.col("key"), F.col("key"), k,
                n_segments=s,
            )
            .filter(F.col("left_id") < F.col("right_id"))
            .collect()
        }
        assert got == brute(k), (k, s, len(got), len(brute(k)))


def test_fuzzy_join_hamming_length_mismatch_excluded(spark):
    from pyspark.sql import functions as F

    from datalakeingestion_spark.operators.fuzzyjoin import fuzzy_join_hamming

    df = spark.createDataFrame(
        [(1, "abcd"), (2, "abce"), (3, "abc")], ["rid", "key"]
    )
    got = {
        (r["left_id"], r["right_id"])
        for r in fuzzy_join_hamming(
            df, df, "rid", "rid", F.col("key"), F.col("key"), k=1
        )
        .filter(F.col("left_id") < F.col("right_id"))
        .collect()
    }
    assert got == {(1, 2)}  # the 3-char key never pairs with 4-char keys


def test_numeric_histogram_gutters_and_empty_bins(spark):
    from datalakeingestion_spark.operators.profiling import numeric_histogram

    df = spark.createDataFrame(
        [(-5.0,), (0.0,), (5.0,), (9.9,), (10.0,), (25.0,), (None,)],
        "v double",
    )
    out = {r["bin"]: (r["bin_lo"], r["bin_hi"], r["n"])
           for r in numeric_histogram(df, "v", n_bins=2, lo=0.0, hi=10.0).collect()}
    # full grid emitted: under(0), bins 1..2, over(3)
    assert set(out) == {0, 1, 2, 3}
    assert out[0][2] == 1          # -5 → underflow gutter
    assert out[1][2] == 1          # 0.0 (lo edge is inclusive in bin 1)
    assert out[2][2] == 2          # 5.0 (edge lands upward) and 9.9
    assert out[3][2] == 2          # 10.0 (== hi) and 25.0 → overflow
    assert sum(n for _, _, n in out.values()) == 6  # NULL dropped

    # auto bounds on a constant column: everything in one bin, no crash
    const = spark.createDataFrame([(3.0,), (3.0,)], "v double")
    got = numeric_histogram(const, "v", n_bins=4)
    assert got.agg({"n": "sum"}).first()[0] == 2


def test_rank_normalize_equals_percent_rank(spark):
    """The distinct-value formulation must equal Spark's own
    percent_rank (which would funnel the corpus through one partition)
    including tie handling and the n=1/NULL edges."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from datalakeingestion_spark.operators.sampling import rank_normalize

    rows = [(i, v) for i, v in enumerate([5.0, 1.0, 3.0, 3.0, 1.0, 9.0, None])]
    df = spark.createDataFrame(rows, ["rid", "score"])
    got = {
        r["rid"]: r["rank_norm"]
        for r in rank_normalize(df, "score").collect()
    }
    ref = {
        r["rid"]: round(r["pr"], 6)
        for r in df.filter("score IS NOT NULL")
        .withColumn("pr", F.percent_rank().over(Window.orderBy("score")))
        .collect()
    }
    for rid, pr in ref.items():
        assert got[rid] == pr, (rid, got[rid], pr)
    assert got[6] is None  # NULL score → NULL rank

    one = spark.createDataFrame([(1, 2.0)], ["rid", "score"])
    assert rank_normalize(one, "score").first()["rank_norm"] == 0.0
