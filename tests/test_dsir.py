"""DSIR importance-weight tests (operators/dsir.py).

The weight is ln p_target - ln p_raw summed over hashed unigram+bigram
feature occurrences — pinned against a pure-Python replica (same md5
bucketing, same add-1 smoothing, same 6-dp HALF_UP per-feature
rounding), plus direction, empty-doc, validation and plan-shape pins.
"""

from __future__ import annotations

import hashlib
import math
import re
from decimal import ROUND_HALF_UP, Decimal

import pytest
from pyspark.sql import functions as F

from datalakeingestion_spark.operators.dsir import (
    dsir_logratio_weights,
    dsir_resample_gumbel,
    dsir_select_topk,
)

B = 64  # small bucket count so collisions actually occur in the test


def _py_weights(rows, n_buckets):
    """(doc_id -> (n_feats, weight)) exactly as the operator defines it."""

    def feats(text):
        toks = [t for t in re.sub(r"[^a-z0-9]+", " ", text.lower()).split()
                if t]
        fs = list(toks)
        fs += [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        return [
            int(hashlib.md5(f.encode()).hexdigest()[:8], 16) % n_buckets
            for f in fs
        ]

    per_doc = {doc_id: feats(text) for doc_id, text, _ in rows}
    cp, cq = [0] * n_buckets, [0] * n_buckets
    for doc_id, _, tgt in rows:
        for b in per_doc[doc_id]:
            (cp if tgt else cq)[b] += 1
    tp, tq = float(sum(cp)), float(sum(cq))
    lr = [
        Decimal(
            repr(
                math.log((cp[b] + 1) / (tp + n_buckets))
                - math.log((cq[b] + 1) / (tq + n_buckets))
            )
        ).quantize(Decimal("0.000001"), ROUND_HALF_UP)
        for b in range(n_buckets)
    ]
    return {
        doc_id: (
            len(per_doc[doc_id]),
            float(sum((lr[b] for b in per_doc[doc_id]), Decimal(0))),
        )
        for doc_id, _, _ in rows
    }


ROWS = [
    (1, "the quick brown fox jumps over the lazy dog", True),
    (2, "the dog sleeps while the fox runs", True),
    (3, "der schnelle braune fuchs springt hoch", False),
    (4, "le renard brun saute par dessus le chien", False),
    (5, "the brown fox and the lazy dog again", False),  # en-like raw doc
    (6, "", False),  # no features at all
]


@pytest.mark.smoke
def test_dsir_weights_match_pure_python(spark):
    docs = spark.createDataFrame(
        [(i, t) for i, t, _ in ROWS], "doc_id long, text string"
    )
    tgt = F.col("doc_id").isin([i for i, _, f in ROWS if f])
    got = {
        r["doc_id"]: (r["n_feats"], r["weight"])
        for r in dsir_logratio_weights(docs, tgt, n_buckets=B).collect()
    }
    want = _py_weights(ROWS, B)
    assert set(got) == set(want)
    for doc_id in want:
        assert got[doc_id][0] == want[doc_id][0], doc_id
        assert got[doc_id][1] == pytest.approx(
            want[doc_id][1], abs=1e-9
        ), doc_id
    # direction: the en-vocabulary raw doc must outscore the de/fr ones,
    # and the empty doc keeps its row with zero evidence
    assert got[5][1] > got[3][1] and got[5][1] > got[4][1]
    assert got[6] == (0, 0.0)


def test_dsir_topk_selection_and_validation(spark):
    docs = spark.createDataFrame(
        [(i, t) for i, t, _ in ROWS], "doc_id long, text string"
    )
    tgt = F.col("doc_id").isin([i for i, _, f in ROWS if f])
    top = dsir_select_topk(docs, tgt, k=3, n_buckets=B)
    ids = [r["doc_id"] for r in top.collect()]
    allw = {
        r["doc_id"]: r["weight"]
        for r in dsir_logratio_weights(docs, tgt, n_buckets=B).collect()
    }
    want = sorted(allw, key=lambda d: (-allw[d], d))[:3]
    assert ids == want

    # the global order-by-limit must be TakeOrderedAndProject (per-
    # partition heaps), never a range-partitioned full sort; the 4096-
    # row ratio table must reach its join as a broadcast
    plan = top._sc._jvm.PythonSQLUtils.explainString(
        top._jdf.queryExecution(), "formatted"
    )
    assert "TakeOrderedAndProject" in plan, plan
    assert "rangepartitioning" not in plan.lower(), plan
    assert "BroadcastHashJoin" in plan, plan

    with pytest.raises(ValueError, match="n_buckets"):
        dsir_logratio_weights(docs, tgt, n_buckets=1)
    with pytest.raises(ValueError, match="k must be"):
        dsir_select_topk(docs, tgt, k=0)


def test_dsir_gumbel_resample_seeded_and_portable(spark):
    """Gumbel-top-k: key = weight + g(seed, doc_id) with g replicated
    exactly in pure Python (md5 -> open unit interval -> -ln(-ln(u)),
    6-dp HALF_UP); same seed = same draw, different seed = a different
    draw over the same weights; ':' in the seed is rejected."""
    docs = spark.createDataFrame(
        [(i, t) for i, t, _ in ROWS], "doc_id long, text string"
    )
    tgt = F.col("doc_id").isin([i for i, _, f in ROWS if f])
    allw = {
        r["doc_id"]: r["weight"]
        for r in dsir_logratio_weights(docs, tgt, n_buckets=B).collect()
    }

    def key(doc_id, seed):
        h = int(
            hashlib.md5(f"{seed}:{doc_id}".encode()).hexdigest()[:8], 16
        )
        u = (h + 1) / 4294967297.0
        g = float(
            Decimal(repr(-math.log(-math.log(u)))).quantize(
                Decimal("0.000001"), ROUND_HALF_UP
            )
        )
        return float(
            Decimal(repr(allw[doc_id] + g)).quantize(
                Decimal("0.000001"), ROUND_HALF_UP
            )
        )

    got = [
        (r["doc_id"], r["gumbel_key"])
        for r in dsir_resample_gumbel(
            docs, tgt, k=4, seed="s1", n_buckets=B
        ).collect()
    ]
    want = sorted(
        ((d, key(d, "s1")) for d in allw), key=lambda x: (-x[1], x[0])
    )[:4]
    assert [(d, pytest.approx(k_, abs=1e-9)) for d, k_ in want] == got

    again = [
        r["doc_id"]
        for r in dsir_resample_gumbel(
            docs, tgt, k=4, seed="s1", n_buckets=B
        ).collect()
    ]
    assert again == [d for d, _ in got]  # same seed, same draw
    other = [
        r["doc_id"]
        for r in dsir_resample_gumbel(
            docs, tgt, k=4, seed="s2", n_buckets=B
        ).collect()
    ]
    assert set(other) <= set(allw)
    with pytest.raises(ValueError, match="seed"):
        dsir_resample_gumbel(docs, tgt, k=4, seed="a:b")


def test_dsir_two_corpus_form_equals_flag_form(spark):
    """dsir_logratio_weights_vs(raw, target) must equal the one-frame
    flag form on the union — including when a target id COLLIDES with
    a raw id (the tagged struct key keeps the rows separate) — and
    return rows only for the raw side."""
    from datalakeingestion_spark.operators.dsir import (
        dsir_logratio_weights_vs,
    )

    raw_rows = [(i, t) for i, t, f in ROWS if not f]
    tgt_rows = [(i, t) for i, t, f in ROWS if f]
    # plant an id collision: target doc reuses raw id 5
    tgt_rows.append((5, "the quick dog naps"))
    raw = spark.createDataFrame(raw_rows, "doc_id long, text string")
    tgt = spark.createDataFrame(tgt_rows, "doc_id long, text string")

    got = {
        r["doc_id"]: (r["n_feats"], r["weight"])
        for r in dsir_logratio_weights_vs(raw, tgt, n_buckets=B).collect()
    }
    rows = [(i, t, False) for i, t in raw_rows] + [
        (1000 + j, t, True) for j, (_, t) in enumerate(tgt_rows)
    ]
    want = {
        i: w for i, w in _py_weights(rows, B).items() if i < 1000
    }
    assert set(got) == set(want) == {i for i, _ in raw_rows}
    for doc_id in want:
        assert got[doc_id][0] == want[doc_id][0]
        assert got[doc_id][1] == pytest.approx(want[doc_id][1], abs=1e-9)


def test_dsir_select_topk_vs_matches_sorted_weights(spark):
    from datalakeingestion_spark.operators.dsir import (
        dsir_logratio_weights_vs,
        dsir_select_topk_vs,
    )

    raw_rows = [(i, t) for i, t, f in ROWS if not f]
    tgt_rows = [(100 + j, t) for j, (_, t, f) in enumerate(ROWS) if f]
    raw = spark.createDataFrame(raw_rows, "doc_id long, text string")
    tgt = spark.createDataFrame(tgt_rows, "doc_id long, text string")

    allw = sorted(
        (
            (-r["weight"], r["doc_id"])
            for r in dsir_logratio_weights_vs(raw, tgt, n_buckets=B).collect()
        )
    )
    got = [
        r["doc_id"]
        for r in dsir_select_topk_vs(raw, tgt, k=2, n_buckets=B).collect()
    ]
    assert got == [i for _, i in allw[:2]]
    with pytest.raises(ValueError, match="k must be"):
        dsir_select_topk_vs(raw, tgt, k=0)
