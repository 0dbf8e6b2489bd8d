from .relational import (
    coalesce_range_filter,
    count_reconciliation,
    latest_rows,
    topk_per_group,
)

__all__ = [
    "coalesce_range_filter",
    "count_reconciliation",
    "latest_rows",
    "topk_per_group",
]
