"""Differential testing of every registered query against DuckDB — the
in-repo replica of the driver's t2 correctness gate (SURVEY.md §5)."""

import pytest

from horaedb_spark.queries.oracle import compare_query, duckdb_connection
from horaedb_spark.queries.registry import QUERIES, queries_map

queries_map()  # trigger registration


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb_connection(sf_dir)
    yield c
    c.close()


ORACLE_QUERIES = sorted(n for n, q in QUERIES.items() if q.oracle is not None)
ROWS_ONLY_QUERIES = sorted(n for n, q in QUERIES.items() if q.oracle is None)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(spark, sf_dir, con, name):
    q = QUERIES[name]
    result = compare_query(q.fn(spark, sf_dir), q.oracle, con, name)
    assert result.ok, result.detail


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_query_runs(spark, sf_dir, name):
    q = QUERIES[name]
    df = q.fn(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.columns) > 0
