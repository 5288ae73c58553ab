from .registry import REGISTRY, QuerySpec, oracle_sql_map, query_map

__all__ = ["REGISTRY", "QuerySpec", "query_map", "oracle_sql_map"]
