"""Text analysis operators — quality scoring, language-ID, token counting,
fingerprinting.

Greenfield LLM-pipeline operators over the ``documents`` table. All pure
column expressions (whole-stage codegen; zero Python UDFs); each has an
exact ANSI-SQL twin in plans/llm.py for the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import portable_hash60
from ..functions.text import distinct_tokens, normalized_text, tokens

# Tiny deterministic stopword lists for the n-gram language heuristic.
# Order of LANGS is the tie-break precedence of the argmax cascade.
STOPWORDS = {
    "en": ["the", "of", "and", "a", "to", "in", "is", "it", "that", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein", "eine", "zu"],
    "fr": ["le", "la", "les", "et", "un", "une", "est", "pour", "que", "dans"],
    "es": ["el", "los", "las", "y", "es", "por", "con", "para", "como", "su"],
}
LANGS = ["en", "de", "fr", "es"]


def quality_metrics(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-doc quality features + a composite score.

    - n_tokens / n_distinct_tokens — length features
    - ttr — type-token ratio (lexical diversity)
    - avg_token_len — alphanumeric chars per token
    - stopword_ratio — fraction of tokens in the EN stoplist
    - quality_score — ttr * min(1, n_tokens/50), a monotone blend of
      diversity and minimum-length (deterministic double arithmetic)
    """
    toks = tokens(text_col)
    en = F.array(*[F.lit(w) for w in STOPWORDS["en"]])
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
        F.round(F.size(F.array_distinct(toks)) / F.size(toks), 6).alias("ttr"),
        F.round(
            F.length(F.regexp_replace(normalized_text(text_col), " ", ""))
            / F.size(toks),
            6,
        ).alias("avg_token_len"),
        F.round(
            F.size(F.filter(toks, lambda t: F.array_contains(en, t))) / F.size(toks),
            6,
        ).alias("stopword_ratio"),
        F.round(
            (F.size(F.array_distinct(toks)) / F.size(toks))
            * F.least(F.lit(1.0), F.size(toks) / F.lit(50.0)),
            6,
        ).alias("quality_score"),
    )


def language_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-hit language heuristic: per-language token hit counts and a
    deterministic argmax (precedence = LANGS order; all-zero → 'unknown')."""
    toks = tokens(text_col)

    def _contains(lst):
        # closure factory: a default-arg lambda would look like a 2-arg
        # (element, index) lambda to F.filter
        return lambda t: F.array_contains(lst, t)

    hit_cols = {}
    for lang in LANGS:
        lst = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
        hit_cols[lang] = F.size(F.filter(toks, _contains(lst)))
    df = docs.select(
        "doc_id",
        "lang",
        *[hit_cols[lang].alias(f"hits_{lang}") for lang in LANGS],
    )
    pred = F.lit("unknown")
    # Build the cascade back-to-front so earlier langs win ties.
    for lang in reversed(LANGS):
        cond = F.col(f"hits_{lang}") > 0
        for other in LANGS:
            if LANGS.index(other) < LANGS.index(lang):
                cond = cond & (F.col(f"hits_{lang}") > F.col(f"hits_{other}"))
            elif LANGS.index(other) > LANGS.index(lang):
                cond = cond & (F.col(f"hits_{lang}") >= F.col(f"hits_{other}"))
        pred = F.when(cond, F.lit(lang)).otherwise(pred)
    return df.withColumn("predicted_lang", pred)


def token_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Token counting: whitespace tokens and a BPE-ish regex tokenization
    (alnum runs + individual non-alnum-non-space chars)."""
    return docs.select(
        "doc_id",
        F.size(tokens(text_col)).alias("n_ws_tokens"),
        F.size(
            F.regexp_extract_all(
                F.lower(F.col(text_col)), F.lit(r"[a-z0-9]+|[^a-z0-9\s]"), 0
            )
        ).alias("n_bpe_tokens"),
        F.size(distinct_tokens(text_col)).alias("n_distinct_tokens"),
    )


def token_entropy(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Shannon entropy of the token distribution per doc (nats).

    H = ln(n) − (Σ c·ln c)/n over per-token counts c — a language-model-
    free proxy for repetitiveness (low entropy → boilerplate/spam).
    Computed via explode + two-level aggregation (map-side partials);
    rounded to 6 dp so float summation order can't leak into comparisons.
    """
    toks = docs.select("doc_id", F.explode(tokens(text_col)).alias("tok"))
    counts = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("c"))
    return (
        counts.groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_tokens"),
            F.sum(F.col("c") * F.log(F.col("c"))).alias("clogc"),
        )
        .select(
            "doc_id",
            "n_tokens",
            F.round(
                F.log(F.col("n_tokens")) - F.col("clogc") / F.col("n_tokens"), 6
            ).alias("entropy"),
        )
    )


def fingerprints(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Document fingerprint: 60-bit portable hash of the normalized text
    (whitespace/punctuation-insensitive exact dedup key)."""
    return docs.select(
        "doc_id",
        portable_hash60(normalized_text(text_col)).alias("fingerprint"),
    )
