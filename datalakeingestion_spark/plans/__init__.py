from .registry import REGISTRY, QueryDef, all_queries, oracle_map

__all__ = ["REGISTRY", "QueryDef", "all_queries", "oracle_map"]
