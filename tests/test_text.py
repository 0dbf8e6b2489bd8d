from __future__ import annotations

import pytest

from datalakeingestion_spark.operators import text_analysis as ta


@pytest.fixture()
def docs(spark):
    rows = [
        (1, "the cat and the dog sat", "en"),
        (2, "der Hund ist nicht mit der Katze", "de"),
        (3, "le chat est dans la maison pour le chien", "fr"),
        (4, "qqq zzz xxx", "xx"),  # no stopword hits → unknown
        (5, "Hello,   world!  Hello?", "en"),
    ]
    return _df(rows)


@pytest.fixture(scope="module", autouse=True)
def _spark(spark):
    global _SPARK
    _SPARK = spark


def _df(rows):
    return _SPARK.createDataFrame(rows, ["doc_id", "text", "lang"])


@pytest.mark.smoke
def test_quality_metrics_known_values(docs):
    out = {r.doc_id: r for r in ta.quality_metrics(docs).collect()}
    r1 = out[1]  # "the cat and the dog sat" → 6 tokens, 5 distinct
    assert r1.n_tokens == 6 and r1.n_distinct_tokens == 5
    assert r1.ttr == round(5 / 6, 6)
    # alnum chars: thecatandthedogsat = 18 → avg 3.0
    assert r1.avg_token_len == 3.0
    # stopwords: the, and, the → 3/6
    assert r1.stopword_ratio == 0.5
    assert r1.quality_score == round((5 / 6) * (6 / 50), 6)
    # punctuation/casing normalized away
    r5 = out[5]
    assert r5.n_tokens == 3 and r5.n_distinct_tokens == 2


def test_language_id_cascade(docs):
    out = {r.doc_id: r.predicted_lang for r in ta.language_id(docs).collect()}
    assert out[1] == "en"
    assert out[2] == "de"
    assert out[3] == "fr"
    assert out[4] == "unknown"


def test_language_id_tie_prefers_langs_order():
    # equal hit counts ("the" en + "der" de) → tie broken by LANGS order
    out = ta.language_id(_df([(1, "the der", "x")])).collect()[0]
    assert out.hits_en == out.hits_de == 1
    assert out.predicted_lang == "en"


def test_token_stats_bpe_vs_ws():
    out = ta.token_stats(_df([(1, "Hello, world! its-fine", "en")])).collect()[0]
    assert out.n_ws_tokens == 4  # hello world its fine
    # bpe-ish: hello , world ! its - fine → 7
    assert out.n_bpe_tokens == 7
    assert out.n_distinct_tokens == 4


def test_fingerprint_normalization_invariance():
    df = _df(
        [
            (1, "The   cat; sat!", "en"),
            (2, "the cat sat", "en"),
            (3, "the cat stood", "en"),
        ]
    )
    out = {r.doc_id: r.fingerprint for r in ta.fingerprints(df).collect()}
    assert out[1] == out[2]  # whitespace/punct/case-insensitive
    assert out[1] != out[3]


def test_sampling_determinism_and_disjointness():
    from datalakeingestion_spark.operators.sampling import (
        deterministic_sample,
        hash_split,
        mix_corpora,
    )
    import pytest as _pytest
    from pyspark.sql import functions as F

    df = _SPARK.range(10_000).select(F.col("id").alias("doc_id"))
    s1 = {r.doc_id for r in deterministic_sample(df, 0.1, "doc_id").collect()}
    s2 = {r.doc_id for r in deterministic_sample(df, 0.1, "doc_id").collect()}
    assert s1 == s2  # reproducible
    assert 800 <= len(s1) <= 1200  # ~10%
    # rate monotonicity: a bigger rate is a superset (same hash, higher bar)
    s_big = {r.doc_id for r in deterministic_sample(df, 0.2, "doc_id").collect()}
    assert s1 <= s_big
    # salts decorrelate
    s_salt = {r.doc_id for r in deterministic_sample(df, 0.1, "doc_id", salt="x").collect()}
    assert s_salt != s1

    split = hash_split(df, "doc_id", (0.8, 0.1, 0.1), ("train", "val", "test"))
    counts = {r["split"]: r["n"] for r in split.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert sum(counts.values()) == 10_000  # disjoint + exhaustive
    assert counts["train"] > counts["val"] and counts["train"] > counts["test"]

    with _pytest.raises(ValueError):
        deterministic_sample(df, 1.5, "doc_id")
    with _pytest.raises(ValueError):
        hash_split(df, "doc_id", (0.5, 0.4))  # doesn't sum to 1

    mixed = mix_corpora(
        [(df, 1.0, "all"), (df, 0.5, "half")], key="doc_id"
    )
    by_src = {r["mix_source"]: r["n"] for r in mixed.groupBy("mix_source").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert by_src["all"] == 10_000 and 4_000 <= by_src["half"] <= 6_000


def test_repetition_metrics_flags_loops(spark):
    from datalakeingestion_spark.operators.text_analysis import repetition_metrics

    docs = spark.createDataFrame(
        [
            (1, "spark reads parquet files and writes delta tables with "
                "catalyst planning the physical execution stages"),
            (2, "buy now buy now buy now buy now buy now buy now buy now"),
        ],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r.asDict() for r in repetition_metrics(docs).collect()}
    assert got[1]["keep"] is True
    assert got[2]["keep"] is False
    assert got[2]["top_2gram_frac"] > 0.5  # "now buy" dominates
    assert got[2]["dup_3gram_frac"] > 0.5


def test_redact_pii_counts_and_placeholders(spark):
    from datalakeingestion_spark.operators.text_analysis import redact_pii

    docs = spark.createDataFrame(
        [(1, "mail bob.smith@corp.example.com or visit "
             "https://e.org/x?id=99 call 5551234567 ok")],
        ["doc_id", "text"],
    )
    row = redact_pii(docs).first()
    assert (row["n_emails"], row["n_urls"], row["n_numbers"]) == (1, 1, 1)
    assert row["clean_text"] == "mail <EMAIL> or visit <URL> call <NUMBER> ok"


def test_chunk_documents_windows(spark):
    from datalakeingestion_spark.operators.text_analysis import chunk_documents

    docs = spark.createDataFrame(
        [
            (1, " ".join(f"w{i}" for i in range(10))),  # 10 tokens
            (2, "solo"),
            (3, ""),  # empty -> no chunks
        ],
        "doc_id long, text string",
    )
    out = {
        (r["doc_id"], r["chunk_id"]): (r["n_chunk_tokens"], r["chunk_text"])
        for r in chunk_documents(docs, chunk_tokens=8, overlap=4).collect()
    }
    # doc 1: stride 4 -> starts 0,4,8 -> lengths 8, 6, 2
    assert out[(1, 0)][0] == 8 and out[(1, 0)][1].startswith("w0 w1")
    assert out[(1, 1)][0] == 6 and out[(1, 1)][1].startswith("w4")
    assert out[(1, 2)] == (2, "w8 w9")
    assert out[(2, 0)] == (1, "solo")
    assert not any(d == 3 for d, _ in out)

    import pytest as _pytest

    with _pytest.raises(ValueError):
        chunk_documents(docs, chunk_tokens=8, overlap=8)


def test_bm25_rank_orders_by_relevance(spark):
    from datalakeingestion_spark.operators.text_analysis import bm25_rank

    docs = spark.createDataFrame(
        [
            (1, "spark join stream spark join"),  # all terms, high tf
            (2, "spark filler filler filler filler filler filler"),  # one hit, long
            (3, "join stream other words here"),  # two terms
            (4, "nothing relevant at all"),  # zero hits
            (5, "spark"),  # one hit, shortest doc
        ],
        "doc_id long, text string",
    )
    rows = bm25_rank(docs, ("spark", "join", "stream"), k=3).collect()
    assert [r["rank"] for r in rows] == [1, 2, 3]
    assert rows[0]["doc_id"] == 1  # covers every term, highest tf
    got = [r["doc_id"] for r in rows]
    assert 4 not in got  # zero-hit doc scores 0 and a 3-doc top-k excludes it
    # scores strictly ordered and deterministic
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_source_js_divergence_bounds(spark):
    import math

    # identical sources → divergence ~0; disjoint vocabularies → ln 2
    same = spark.createDataFrame(
        [(1, "a b c d", "s1"), (2, "a b c d", "s2")],
        ["doc_id", "text", "source"],
    )
    out = {r["source"]: r["js_divergence"]
           for r in ta.source_js_divergence(same).collect()}
    assert all(abs(v) < 1e-9 for v in out.values()), out

    disjoint = spark.createDataFrame(
        [(1, "a a b b", "s1"), (2, "x x y y", "s2")],
        ["doc_id", "text", "source"],
    )
    out = {r["source"]: r["js_divergence"]
           for r in ta.source_js_divergence(disjoint).collect()}
    # each source holds half the corpus mass. Direct computation:
    # own tokens: p_s=1/2, p=1/4, m=3/8 → ½·KL(Pₛ‖M)=½·ln(4/3);
    #            ½·KL(P‖M) share = ½·(½·ln(2/3))
    # other's tokens: p_s=0, p=1/4, m=1/8 → ½·(½·ln 2)
    expected = (
        0.5 * math.log(4 / 3)
        + 0.25 * math.log(2 / 3)
        + 0.25 * math.log(2.0)
    )
    for v in out.values():
        assert abs(v - round(expected, 6)) < 1e-6, (v, expected)


def test_boilerplate_span_stats_flags_injected_chrome(spark):
    from pyspark.sql import functions as F

    rows = [(i, f"u{i} v{i} w{i} x{i} y{i} z{i}") for i in range(20)]
    # inject the same 6-token chrome into docs 0-9
    chrome = "all rights reserved site map terms"
    docs = spark.createDataFrame(rows, ["doc_id", "body"]).select(
        "doc_id",
        F.when(F.col("doc_id") < 10,
               F.concat(F.lit(chrome + " "), F.col("body")))
        .otherwise(F.col("body")).alias("text"),
    )
    out = ta.boilerplate_span_stats(docs, n=3, df_threshold=5,
                                    frac_threshold=0.3)
    flagged = {r["doc_id"] for r in out.filter(~F.col("keep")).collect()}
    assert flagged == set(range(10))
    kept = out.filter(F.col("keep")).count()
    assert kept == 10


def test_bigram_logprob_orders_fluency(spark):
    """Self-trained bigram LM: a doc built from the corpus's common
    bigrams scores higher than the same words in scrambled order; docs
    with < 2 tokens yield no row."""
    rows = [(i, "a b c") for i in range(1, 6)] + [(6, "c b a"), (7, "x")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: r for r in ta.bigram_logprob(df).collect()}
    assert 7 not in out
    assert out[1].n_bigrams == 2 and out[6].n_bigrams == 2
    assert out[1].mean_logprob > out[6].mean_logprob
    # all five identical docs share the exact same decimal-summed score
    assert len({out[i].mean_logprob for i in range(1, 6)}) == 1


def test_psi_detects_planted_shift(spark):
    """PSI must read ~0 for identical distributions and large for a
    shifted one."""
    import pyspark.sql.functions as F

    from datalakeingestion_spark.operators.profiling import psi_between

    base = spark.range(10_000).select(
        (F.pmod(F.xxhash64("id"), F.lit(1000)).cast("double")).alias("v")
    )
    same = spark.range(10_000, 20_000).select(
        (F.pmod(F.xxhash64("id"), F.lit(1000)).cast("double")).alias("v")
    )
    shifted = same.select((F.col("v") + 500.0).alias("v"))
    stable = psi_between(base, same, "v", 0.0, 1000.0).agg(
        F.sum("psi_contrib")
    ).first()[0]
    drifted = psi_between(base, shifted, "v", 0.0, 1000.0).agg(
        F.sum("psi_contrib")
    ).first()[0]
    assert stable < 0.01
    assert drifted > 0.25


def test_n_tokens_of_null_and_conf_independent(spark):
    """n_tokens_of: NULL text counts 0 via an explicit NULL branch —
    NOT coalesce(size(...), 0), which is a silent -1 under
    spark.sql.legacy.sizeOfNull (the 3.5 default)."""
    from datalakeingestion_spark.functions.text import n_tokens_of

    df = spark.createDataFrame(
        [(1, "a b  c"), (2, None), (3, ""), (4, "  ")],
        "id long, text string",
    )
    got = {
        r["id"]: r["n"]
        for r in df.select("id", n_tokens_of("text").alias("n")).collect()
    }
    assert got == {1: 3, 2: 0, 3: 0, 4: 0}
    # under the legacy conf, size(NULL) is -1; the explicit branch
    # must still say 0
    spark.conf.set("spark.sql.legacy.sizeOfNull", "true")
    try:
        got2 = {
            r["id"]: r["n"]
            for r in df.select(
                "id", n_tokens_of("text").alias("n")
            ).collect()
        }
        assert got2 == got
    finally:
        spark.conf.unset("spark.sql.legacy.sizeOfNull")
