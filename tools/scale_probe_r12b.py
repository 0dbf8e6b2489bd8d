"""Round-12b scale probe: tokenizer-true sizing at 10M docs
(results recorded in SCALE.md).

Measures the claim review pass 3 encoded in the plan pin: sizing a 10M-doc
corpus (~145M token occurrences, ~5k distinct words — Zipf-shaped
amortization) by REAL MaxMatch piece counts is cheap BECAUSE the regex
encode runs once per DISTINCT word (text-only pruned scan + map-side
distinct, then a broadcast join onto the occurrence explode), not once
per occurrence. The per-occurrence twin applies the identical piece-count
expression to every exploded token — same result, no vocab discipline.

Vocab: the round10 audit vocab + digits, so the synthetic words
(w0..w4999) are fully coverable and the alternation does real work
(62 pieces -> a ~190-char alternation evaluated with backtracking).

Run on an otherwise idle box:  python tools/scale_probe_r12b.py
"""

from __future__ import annotations

import os
import shutil
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

WORK = "/tmp/scale_probe_r12b"
N_DOCS = 10_000_000

_TEXT = (
    "concat_ws(' ', transform(sequence(0, 4 + cast(pmod(hash(id), 20) "
    "AS INT)), i -> concat('w', pmod(hash(id * 13 + i), 5000))))"
)


def main() -> None:
    from datalakeingestion_spark.operators.packing import (
        maxmatch_alternation,
        maxmatch_piece_counts,
    )
    from datalakeingestion_spark.plans.round10 import _MAXMATCH_VOCAB
    from datalakeingestion_spark.session import get_spark

    shutil.rmtree(WORK, ignore_errors=True)
    spark = get_spark(app_name="scale-probe-r12b", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")

    # two vocab scales: the 72-piece audit vocab, and a 1368-piece one
    # (all 2-char [a-z0-9] combos) approximating a real tokenizer's
    # alternation cost — the distinct-word discipline's win should be a
    # function of regex cost, i.e. vocab size
    audit_vocab = tuple(_MAXMATCH_VOCAB) + tuple(str(d) for d in range(10))
    chars = "abcdefghijklmnopqrstuvwxyz0123456789"
    big_vocab = tuple(
        sorted(set(audit_vocab) | {a + b for a in chars for b in chars})
    )

    # materialize the corpus BEFORE timing (r11 probe trap)
    spark.range(N_DOCS).select(
        F.col("id").alias("doc_id"), F.expr(_TEXT).alias("text")
    ).write.mode("overwrite").parquet(f"{WORK}/docs")
    docs = spark.read.parquet(f"{WORK}/docs")

    from datalakeingestion_spark.functions.text import tokens

    def distinct_path(vocab):
        words = docs.select(
            "doc_id", F.explode(tokens("text")).alias("word")
        )
        n_pieces = maxmatch_piece_counts(words, vocab)
        per_doc = (
            words.join(n_pieces, "word")
            .groupBy("doc_id")
            .agg(F.sum("n_pieces").cast("long").alias("n_tokens"))
        )
        return per_doc.agg(
            F.sum("n_tokens").cast("long"), F.count(F.lit(1))
        ).collect()[0]

    def occurrence_path(vocab):
        pattern = maxmatch_alternation(vocab)
        words = docs.select(
            "doc_id", F.explode(tokens("text")).alias("word")
        )
        covered = F.regexp_replace(F.col("word"), pattern, "") == ""
        raw = F.trim(F.regexp_replace(F.col("word"), pattern, "$1 "))
        np_ = F.when(
            covered, F.size(F.split(raw, " ")).cast("long")
        ).otherwise(F.lit(1).cast("long"))
        per_doc = (
            words.select("doc_id", np_.alias("n_pieces"))
            .groupBy("doc_id")
            .agg(F.sum("n_pieces").cast("long").alias("n_tokens"))
        )
        return per_doc.agg(
            F.sum("n_tokens").cast("long"), F.count(F.lit(1))
        ).collect()[0]

    for vname, vocab in (("audit72", audit_vocab), ("big1368", big_vocab)):
        results = {}
        for name, fn in (("distinct_word", distinct_path),
                         ("per_occurrence", occurrence_path)):
            fn(vocab)  # warm (codegen + file listing)
            walls, out = [], None
            for _ in range(3):
                t0 = time.time()
                out = fn(vocab)
                walls.append(time.time() - t0)
            results[name] = {
                "wall_median_s": round(statistics.median(walls), 2),
                "walls": [round(w, 2) for w in walls],
                "total_piece_tokens": out[0],
                "n_docs": out[1],
            }
            print(vname, name, results[name], flush=True)

        assert (
            results["distinct_word"]["total_piece_tokens"]
            == results["per_occurrence"]["total_piece_tokens"]
        ), "paths disagree"
        ratio = (
            results["per_occurrence"]["wall_median_s"]
            / max(results["distinct_word"]["wall_median_s"], 1e-9)
        )
        print(
            f"{vname}: RATIO per_occurrence/distinct_word = {ratio:.2f}x",
            flush=True,
        )
    spark.stop()
    shutil.rmtree(WORK, ignore_errors=True)


if __name__ == "__main__":
    main()
