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


def test_priority_names_all_registered():
    """Regression guard on the driver-sample priority list: _ordered()
    ranks unconfirmed queries by _PRIORITY but silently ignores unknown
    names, so a typo (or a rename that misses the list) would quietly
    demote a query's draw priority — the signal-wasting failure the
    r9->r10 rotation existed to prevent."""
    from horaedb_spark.queries.registry import _PRIORITY

    missing = [n for n in _PRIORITY if n not in QUERIES]
    assert missing == [], missing
    assert len(set(_PRIORITY)) == len(_PRIORITY)  # no duplicates either


def test_driver_order_puts_unconfirmed_first():
    """VERDICT r10 task 7, made structural: the driver's time-capped sample
    walks queries() in map order, so every registry name WITHOUT a green
    row in any committed CORRECTNESS_r*.json must precede every name WITH
    one. The ordering is computed from those files at import time; this
    asserts the computation against an independent re-read, so a stale
    hand-rotated sample can never ship again."""
    from horaedb_spark.queries.registry import _ordered, driver_confirmed

    confirmed = driver_confirmed()
    order = list(_ordered())
    assert set(order) == set(QUERIES)
    seen_confirmed = False
    for name in order:
        if name in confirmed:
            seen_confirmed = True
        else:
            assert not seen_confirmed, (
                f"unconfirmed query {name!r} ordered after a driver-confirmed one"
            )


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(spark, sf_dir, con, name):
    q = QUERIES[name]
    result = compare_query(q.fn(spark, sf_dir), q.oracle, con, name)
    assert result.ok, result.detail
