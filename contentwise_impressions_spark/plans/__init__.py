from .registry import QuerySpec, all_queries, all_oracle_sql

__all__ = ["QuerySpec", "all_queries", "all_oracle_sql"]
