from __future__ import annotations

import math

import pytest

from pyspark.sql import functions as F


def _twin(word_freq: dict[str, int], lmax=4, wmax=12, iters=2):
    """Textbook Viterbi hard-EM unigram trainer — the independent
    reference implementation pinning operators/unigram.py's math."""
    words = {w: f for w, f in word_freq.items() if len(w) <= wmax}
    vocab: dict[str, int] = {}
    chars: set[str] = set()
    for w, f in words.items():
        for s in range(len(w)):
            for l in range(1, min(lmax, len(w) - s) + 1):
                vocab[w[s : s + l]] = vocab.get(w[s : s + l], 0) + f
                if l == 1:
                    chars.add(w[s])
    for _ in range(iters):
        total = sum(vocab.values())
        cost = {
            p: math.floor(1e6 * math.log(total / c) + 0.5)
            for p, c in vocab.items()
        }
        used: dict[str, int] = {}
        for w, f in words.items():
            n = len(w)
            dp = [0] + [float("inf")] * n
            for i in range(1, n + 1):
                for l in range(1, min(lmax, i) + 1):
                    c = cost.get(w[i - l : i])
                    if c is not None and dp[i - l] + c < dp[i]:
                        dp[i] = dp[i - l] + c
            pos = n
            while pos > 0:
                for j in range(max(0, pos - lmax), pos):
                    c = cost.get(w[j:pos])
                    if c is not None and dp[j] + c == dp[pos]:
                        used[w[j:pos]] = used.get(w[j:pos], 0) + f
                        pos = j
                        break
        vocab = dict(used)
        for ch in chars:
            vocab.setdefault(ch, 1)
    total = sum(vocab.values())
    return sorted(
        (
            (p, c, math.floor(1e6 * math.log(total / c) + 0.5))
            for p, c in vocab.items()
        ),
        key=lambda r: (-r[1], r[0]),
    )


@pytest.mark.smoke
def test_unigram_trainer_matches_python_twin(spark):
    from datalakeingestion_spark.operators.unigram import train_unigram

    corpus = (
        ["the unhappiness of the union"] * 3
        + ["repartition the union stream"] * 2
        + ["unhappy repartition"]
    )
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus)], "doc_id long, text string"
    )
    wf: dict[str, int] = {}
    for t in corpus:
        for w in t.split():
            wf[w] = wf.get(w, 0) + 1
    got = [tuple(r) for r in train_unigram(docs).collect()]
    assert got == _twin(wf)
    # pruning happened: the surviving vocab is smaller than the seed
    seed = {
        w[s : s + l]
        for w in wf
        for s in range(len(w))
        for l in range(1, min(4, len(w) - s) + 1)
    }
    assert len(got) < len(seed)
    # coverage rule: every character of every training word survives
    assert {c for w in wf for c in w} <= {p for p, _, _ in got}


def test_unigram_costs_order_consistent(spark):
    """cost is a strictly decreasing function of count: more-used pieces
    are never more expensive (sanity of the integer micro-nat mapping)."""
    from datalakeingestion_spark.operators.unigram import train_unigram

    docs = spark.createDataFrame(
        [(i, "abab abc bc") for i in range(4)], "doc_id long, text string"
    )
    rows = train_unigram(docs).collect()
    by_cnt = sorted(rows, key=lambda r: -r["n_uses"])
    for a, b in zip(by_cnt, by_cnt[1:]):
        if a["n_uses"] > b["n_uses"]:
            assert a["cost_micro_nats"] < b["cost_micro_nats"]
        elif a["n_uses"] == b["n_uses"]:
            assert a["cost_micro_nats"] == b["cost_micro_nats"]


def test_unigram_long_words_excluded_from_training(spark):
    from datalakeingestion_spark.operators.unigram import train_unigram

    docs = spark.createDataFrame(
        [(1, "short extraordinarilylongword short")],
        "doc_id long, text string",
    )
    pieces = {r["piece"] for r in train_unigram(docs, wmax=8).collect()}
    # nothing from the 25-char word leaked into the vocab: every piece
    # is a substring of the one training-eligible word
    assert pieces and all(p in "short" for p in pieces)


def test_unigram_empty_training_set_degrades_to_empty_frame(spark):
    from datalakeingestion_spark.operators.unigram import train_unigram

    docs = spark.createDataFrame(
        [(1, None), (2, "extraordinarilylongword")],
        "doc_id long, text string",
    )
    out = train_unigram(docs, wmax=8)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == [
        "piece", "n_uses", "cost_micro_nats",
    ]


def test_unigram_encode_reconstructs_words_with_trained_pieces(spark):
    from datalakeingestion_spark.operators.unigram import (
        train_unigram,
        unigram_encode,
    )

    corpus = ["the unhappiness of the union"] * 3 + ["unhappy union the"]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus)], "doc_id long, text string"
    )
    enc = {r["word"]: r for r in unigram_encode(docs).collect()}
    vocab = {r["piece"] for r in train_unigram(docs).collect()}
    words = {w for t in corpus for w in t.split()}
    assert set(enc) == words
    for w, r in enc.items():
        pieces = r["encoded"].split(" ")
        assert "".join(pieces) == w        # lossless segmentation
        assert r["n_pieces"] == len(pieces)
        assert set(pieces) <= vocab        # only trained pieces used


def _soft_twin(word_freq: dict[str, int], lmax=4, wmax=12, iters=2):
    """Independent quantized soft-EM reference (forward-backward edge
    posteriors in integer micro-nats) pinning train_unigram_soft."""

    def r(x):
        return math.floor(x + 0.5)

    def softmin(xs):
        m = min(xs)
        s = sum(r(1e6 * math.exp(-(x - m) / 1e6)) for x in xs)
        return m - r(1e6 * math.log(s / 1e6))

    words = {w: f for w, f in word_freq.items() if len(w) <= wmax}
    vocab: dict[str, int] = {}
    chars: set[str] = set()
    for w, f in words.items():
        for s in range(len(w)):
            for l in range(1, min(lmax, len(w) - s) + 1):
                vocab[w[s : s + l]] = vocab.get(w[s : s + l], 0) + f
                if l == 1:
                    chars.add(w[s])
    for _ in range(iters):
        total = sum(vocab.values())
        cost = {
            p: r(1e6 * math.log(total / c)) for p, c in vocab.items()
        }
        mcnt: dict[str, int] = {}
        for w, f in words.items():
            n = len(w)
            fa = [None] * (n + 1)
            fa[0] = 0
            for i in range(1, n + 1):
                ts = [fa[j] + cost[w[j:i]]
                      for j in range(max(0, i - lmax), i)
                      if fa[j] is not None and w[j:i] in cost]
                fa[i] = softmin(ts) if ts else None
            bb = [None] * (n + 1)
            bb[n] = 0
            for j in range(n - 1, -1, -1):
                ts = [cost[w[j:i]] + bb[i]
                      for i in range(j + 1, min(n, j + lmax) + 1)
                      if bb[i] is not None and w[j:i] in cost]
                bb[j] = softmin(ts) if ts else None
            z = fa[n]
            if z is None:
                continue
            for j in range(n):
                for i in range(j + 1, min(n, j + lmax) + 1):
                    p = w[j:i]
                    if p in cost and fa[j] is not None and bb[i] is not None:
                        d = max(fa[j] + cost[p] + bb[i] - z, 0)
                        wt = r(1e6 * math.exp(-d / 1e6))
                        if wt:
                            mcnt[p] = mcnt.get(p, 0) + f * wt
        vocab = {p: c for p, c in mcnt.items() if len(p) > 1 and c > 0}
        for ch in chars:
            vocab[ch] = max(mcnt.get(ch, 0), 1_000_000)
    total = sum(vocab.values())
    return {
        p: (c, math.floor(1e6 * math.log(total / c) + 0.5))
        for p, c in vocab.items()
    }


def test_unigram_soft_trainer_matches_python_twin(spark):
    """train_unigram_soft == the independent quantized forward-backward
    reference, piece for piece (micro-counts AND costs) — the soft-EM
    exactness claim (VERDICT r11 item #7) pinned outside SQL."""
    from datalakeingestion_spark.operators.unigram import (
        train_unigram_soft,
    )

    rows = [
        ("banana bandana nab", 3),
        ("analog anagram banal", 2),
        ("nab an na banana", 4),
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, (t, k) in enumerate(rows) for _ in range(k)],
        "doc_id long, text string",
    )
    freq: dict[str, int] = {}
    for t, k in rows:
        for w in t.split():
            freq[w] = freq.get(w, 0) + k
    want = _soft_twin(freq)
    got = {
        r["piece"]: (r["n_uses_micro"], r["cost_micro_nats"])
        for r in train_unigram_soft(docs).collect()
    }
    assert got == want
    # the best path's posterior is ~1e6 micro: top piece mass must
    # exceed any single char floor
    assert max(c for c, _ in got.values()) > 1_000_000


def test_unigram_soft_mass_exceeds_hard_usage_support(spark):
    """Soft posteriors spread mass over ALL segmentations: every piece
    the hard-EM trainer uses appears in the soft vocab too (soft mass
    covers the Viterbi path), and the soft vocab is a superset."""
    from datalakeingestion_spark.operators.unigram import (
        train_unigram,
        train_unigram_soft,
    )

    docs = spark.createDataFrame(
        [(i, "banana bandana anagram") for i in range(3)],
        "doc_id long, text string",
    )
    hard = {r["piece"] for r in train_unigram(docs).collect()}
    soft = {r["piece"] for r in train_unigram_soft(docs).collect()}
    assert hard <= soft
