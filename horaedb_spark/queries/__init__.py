from horaedb_spark.queries.registry import QUERIES, Query, oracle_sql_map, queries_map, register

__all__ = ["QUERIES", "Query", "register", "queries_map", "oracle_sql_map"]
