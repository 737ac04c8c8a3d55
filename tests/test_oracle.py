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


def test_every_query_has_an_oracle():
    """Regression guard: every registered query carries a DuckDB oracle —
    the weaker rows-only driver check must never silently re-appear. A
    genuinely non-SQL-expressible query would need a deliberate allowlist
    here, not a None oracle."""
    assert sorted(n for n, q in QUERIES.items() if q.oracle is None) == []


def test_run_first_names_all_registered():
    """Regression guard on the driver-sample priority list: queries_map()
    silently skips _RUN_FIRST names that don't resolve, so a typo (or a
    rename that misses the list) would quietly demote a query out of the
    driver's next correctness sample — the exact signal-wasting failure
    the r9→r10 rotation exists to prevent."""
    from horaedb_spark.queries.registry import _RUN_FIRST

    missing = [n for n in _RUN_FIRST if n not in QUERIES]
    assert missing == [], missing
    assert len(set(_RUN_FIRST)) == len(_RUN_FIRST)  # no duplicates either


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(spark, sf_dir, con, name):
    q = QUERIES[name]
    result = compare_query(q.fn(spark, sf_dir), q.oracle, con, name)
    assert result.ok, result.detail
