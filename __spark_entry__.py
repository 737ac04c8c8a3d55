"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` is the smoke check; ``queries()``/``oracle_sql()`` expose the
full operator inventory from SURVEY.md §2 (storage engine, metric layer,
PromQL functions, relational surface, LLM-pipeline operators, streaming) —
each query is a (spark, sf_dir) -> DataFrame callable, each oracle the
equivalent DuckDB SQL over the same parquet tables. Implementation lives in
``horaedb_spark/``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from horaedb_spark.queries.registry import oracle_sql_map, queries_map  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the TPC-H Q1 pricing summary
    (scan + filter + 8-agg groupBy), the canonical OLAP slice."""
    from horaedb_spark.queries.analytics import tpch_q1

    return tpch_q1(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return queries_map()


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL for every registered query — including the
    mapInPandas feature-extraction stage, whose deterministic stub extractor
    is replayed in SQL."""
    return oracle_sql_map()
