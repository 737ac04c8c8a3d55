"""Order-independent aggregation helpers for oracle-exact results.

Summing doubles is order-dependent: Spark's partial/final aggregation and
DuckDB's sequential scan can differ in the last ulp, and when the true value
sits on a rounding boundary (e.g. ...0.795 rounded to 2 places) the rounded
outputs diverge — a real failure observed on nation_pair_volume at sf0.001.

Fix: route the sum through DECIMAL(30,10). Each per-row double converts to
the same decimal in any engine (a double's decimal expansion never
terminates exactly at the 10th place for non-trivial values, so conversion
rounding can't straddle engines), decimal addition is exact and associative,
and the final cast back to double is deterministic. The SQL mirror is
``round(CAST(sum(CAST(x AS DECIMAL(30,10))) AS DOUBLE), s)``.

At scale this costs one extra conversion per row inside the partial
aggregate — negligible next to the shuffle it feeds, and it buys
*reproducible* aggregates across partitionings (a property worth having in
production, not just for the oracle)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(30,10)"


def dsum(col: Column | str, scale: int = 2) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.round(F.sum(c.cast(DEC)).cast("double"), scale)


def davg(col: Column | str, scale: int = 6) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.round((F.sum(c.cast(DEC)).cast("double") / F.count(c)), scale)


def sql_dsum(expr: str, scale: int = 2) -> str:
    return f"round(CAST(sum(CAST({expr} AS DECIMAL(30,10))) AS DOUBLE), {scale})"


def sql_davg(expr: str, scale: int = 6) -> str:
    return (
        f"round(CAST(sum(CAST({expr} AS DECIMAL(30,10))) AS DOUBLE)"
        f" / count({expr}), {scale})"
    )
