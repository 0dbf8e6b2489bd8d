from .asof import asof_join
from .curation import curate
from .dedup import (
    exact_duplicates,
    minhash_near_duplicates,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash_fingerprints,
    simhash_near_duplicates,
)
from .relational import (
    coalesce_range_filter,
    count_reconciliation,
    latest_rows,
    topk_per_group,
)
from .similarity import (
    cosine_topk,
    embedding_near_duplicates,
    embedding_near_duplicates_blocked,
    lsh_bucketed_topk,
)
from .sketches import kmv_distinct_estimate
from .skew import salted_join
from .text_analysis import (
    fingerprints,
    language_id,
    quality_metrics,
    token_entropy,
    token_stats,
)

__all__ = [
    "asof_join",
    "coalesce_range_filter",
    "cosine_topk",
    "count_reconciliation",
    "curate",
    "embedding_near_duplicates",
    "embedding_near_duplicates_blocked",
    "exact_duplicates",
    "fingerprints",
    "kmv_distinct_estimate",
    "language_id",
    "latest_rows",
    "lsh_bucketed_topk",
    "minhash_near_duplicates",
    "minhash_signatures",
    "ngram_jaccard_pairs",
    "quality_metrics",
    "salted_join",
    "simhash_fingerprints",
    "simhash_near_duplicates",
    "token_entropy",
    "token_stats",
    "topk_per_group",
]
