import pytest


@pytest.mark.smoke
def test_trigram_backoff_matches_python_reference(spark):
    import math
    from decimal import Decimal, ROUND_HALF_UP

    from datalakeingestion_spark.operators.text_analysis import (
        trigram_backoff_logprob,
    )

    model_rows = [
        (0, "the cat sat on the mat"),
        (2, "the cat ran fast today"),
        (4, "a dog sat on a log"),
    ]
    score_rows = [
        (1, "the cat sat on a log"),   # mixes seen trigrams + backoffs
        (3, "zebra cat sat quickly"),  # unseen words -> unigram floor
        (5, "hi there"),               # < 3 tokens -> no row
    ]
    model = spark.createDataFrame(model_rows, "doc_id long, text string")
    score = spark.createDataFrame(score_rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r
        for r in trigram_backoff_logprob(model, score).collect()
    }

    # python twin
    def toks(t):
        return t.split()

    c1, c23, c3 = {}, {}, {}
    n = 0
    vocab = set()
    for _, t in model_rows:
        ts = toks(t)
        n += len(ts)
        vocab.update(ts)
        for w in ts:
            c1[w] = c1.get(w, 0) + 1
        for i in range(len(ts) - 1):
            bg = " ".join(ts[i : i + 2])
            c23[bg] = c23.get(bg, 0) + 1
        for i in range(len(ts) - 2):
            tg = " ".join(ts[i : i + 3])
            c3[tg] = c3.get(tg, 0) + 1
    c12 = {}
    for tg, c in c3.items():
        k12 = " ".join(tg.split()[:2])
        c12[k12] = c12.get(k12, 0) + c
    c2 = {}
    for bg, c in c23.items():
        c2[bg.split()[0]] = c2.get(bg.split()[0], 0) + c

    want = {}
    for did, t in score_rows:
        ts = toks(t)
        if len(ts) < 3:
            continue
        lps, bo1, bo2 = [], 0, 0
        for i in range(len(ts) - 2):
            w1, w2, w3 = ts[i : i + 3]
            tg = f"{w1} {w2} {w3}"
            if tg in c3:
                lp = math.log(c3[tg] / c12[f"{w1} {w2}"])
            elif f"{w2} {w3}" in c23:
                bo1 += 1
                lp = math.log(0.4 * c23[f"{w2} {w3}"] / c2[w2])
            else:
                bo2 += 1
                lp = math.log(
                    (0.4 * 0.4)
                    * (c1.get(w3, 0) + 0.5)
                    / (float(n) + 0.5 * len(vocab))
                )
            lps.append(
                Decimal(repr(round(lp, 6))).quantize(
                    Decimal("0.000001"), rounding=ROUND_HALF_UP
                )
            )
        want[did] = (len(lps), bo1, bo2, float(sum(lps)) / len(lps))

    assert set(got) == set(want)
    for did, (ntri, bo1, bo2, mean) in want.items():
        r = got[did]
        assert r["n_trigrams"] == ntri
        assert r["n_backoff_bigram"] == bo1
        assert r["n_backoff_unigram"] == bo2
        assert abs(r["mean_logprob"] - mean) < 1e-9


def test_lexical_diversity_exact_counts(spark):
    from datalakeingestion_spark.operators.text_analysis import (
        lexical_diversity,
    )

    docs = spark.createDataFrame(
        [
            (1, "a a a b", "s1"),     # tokens: a×3 b×1
            (2, "b c", "s1"),         # s1: 6 tokens, types {a,b,c}
            (3, "x x", "s2"),         # s2: 2 tokens, 1 type, 0 hapax
        ],
        "doc_id long, text string, source string",
    )
    got = {
        r["source"]: r.asDict()
        for r in lexical_diversity(docs).collect()
    }
    assert got["s1"]["n_tokens"] == 6
    assert got["s1"]["n_types"] == 3
    assert got["s1"]["type_token_ratio"] == 0.5
    # hapax in s1: only c (a appears 3x, b twice across docs)
    assert got["s1"]["hapax_ratio"] == round(1 / 3, 6)
    assert got["s2"]["n_tokens"] == 2
    assert got["s2"]["hapax_ratio"] == 0.0
