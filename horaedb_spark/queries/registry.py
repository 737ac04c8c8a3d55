"""Query registry — the judge-facing inventory.

Every implemented operator from SURVEY.md §2 registers here as a
``(spark, sf_dir) -> DataFrame`` callable plus (where SQL-expressible) a
DuckDB oracle SQL string over the same parquet tables. ``__spark_entry__``
re-exports the two maps verbatim.

Conventions that make the driver's hash comparison deterministic:
- every computed column is aliased identically in the Spark plan and the SQL;
- double aggregates are rounded (2 digits for monetary sums, 6 for ratios)
  on BOTH sides — partial/final aggregation order in Spark vs sequential
  DuckDB can differ in the last ulp;
- timestamps in outputs are rendered as epoch-ms longs or formatted strings,
  never raw timestamp values.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class Query:
    name: str
    fn: QueryFn
    oracle: str | None
    doc: str


QUERIES: dict[str, Query] = {}


def register(name: str, oracle: str | None = None):
    """Decorator: register a query (and its DuckDB oracle) in the inventory."""

    def wrap(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = Query(name=name, fn=fn, oracle=oracle, doc=fn.__doc__ or "")
        return fn

    return wrap


# Registration order == the driver's correctness-run order. Round 1's run
# covered only the first 50 registered queries, so the modules whose queries
# had no hard signal yet (dedup/ANN/text/multimodal/streaming + the PromQL
# tail of metric_queries) register FIRST this round; the round-1-green
# relational head registers last (VERDICT r01 "Next round" #1).
_QUERY_MODULES = (
    "search_queries",
    "pipeline_queries",
    "dedup_queries",
    "similarity_queries",
    "text_queries",
    "multimodal_queries",
    "events_queries",
    "analytics4",
    "streaming_queries",
    "metric_queries",
    "storage_queries",
    "sources_queries",
    "setops_queries",
    "analytics",
    "analytics2",
    "analytics3",
)


def _load_modules() -> None:
    # Import for registration side effects. Modules not yet written are
    # skipped; anything else (syntax/runtime error) propagates loudly.
    import importlib

    for mod in _QUERY_MODULES:
        name = f"horaedb_spark.queries.{mod}"
        try:
            importlib.import_module(name)
        except ModuleNotFoundError as e:
            if e.name != name:
                raise


def queries_map() -> dict[str, QueryFn]:
    _load_modules()
    return {name: q.fn for name, q in QUERIES.items()}


def oracle_sql_map() -> dict[str, str]:
    _load_modules()
    return {name: q.oracle for name, q in QUERIES.items() if q.oracle is not None}
