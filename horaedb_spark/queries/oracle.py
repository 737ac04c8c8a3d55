"""Local DuckDB-oracle comparator — replicates the driver's correctness gate
(row count + column set + order-insensitive value comparison) so every
registered query is validated in-repo before the driver ever sees it."""

from __future__ import annotations

import math
from dataclasses import dataclass
from decimal import Decimal as _Decimal

import duckdb

from horaedb_spark.queries.tables import TABLES


@dataclass
class CompareResult:
    name: str
    ok: bool
    detail: str


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con


def _norm_cell(v):
    if type(v).__module__ == "numpy":  # unwrap numpy scalars from pandas rows
        v = v.item()
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            # pandas renders SQL NULL in a numeric column as NaN; the Spark
            # side of the driver goes through pandas too, so fold them
            return "NULL"
        # 12 significant digits: strict enough to catch real bugs, immune to
        # the last-ulp noise that different summation orders produce. The
        # "f:" prefix makes the comparison TYPE-strict: the driver's hash
        # renders pandas float64 as "17820.0" vs int64 "17820", so an
        # int-on-one-side / float-on-the-other (e.g. DuckDB HUGEINT sums)
        # must fail locally too, not be masked by %g formatting.
        return f"f:{v:.12g}"
    if isinstance(v, _Decimal):
        # pandas renders DuckDB decimals as float64 — same class as float
        return f"f:{float(v):.12g}"
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    return str(v)


def _normalize(columns, rows):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(_norm_cell(row[i]) for i in order) for row in rows]
    return sorted(columns), sorted(out)


def compare_query(spark_df, oracle_sql: str, con, name: str = "query") -> CompareResult:
    sp_rows = [tuple(r) for r in spark_df.collect()]
    sp_cols = spark_df.columns
    # Fetch the oracle result THROUGH pandas, exactly as the driver does:
    # DuckDB HUGEINT (bare sum()/list_sum() results) converts to float64
    # there, so an uncast oracle sum must mismatch locally too.
    pdf = con.execute(oracle_sql).df()
    du_cols = list(pdf.columns)
    du_rows = [tuple(r) for r in pdf.itertuples(index=False, name=None)]

    if sorted(sp_cols) != sorted(du_cols):
        return CompareResult(name, False, f"schema mismatch: spark={sorted(sp_cols)} duckdb={sorted(du_cols)}")
    if len(sp_rows) != len(du_rows):
        return CompareResult(name, False, f"row count mismatch: spark={len(sp_rows)} duckdb={len(du_rows)}")
    _, sp_norm = _normalize(sp_cols, sp_rows)
    _, du_norm = _normalize(du_cols, du_rows)
    if sp_norm != du_norm:
        diffs = [(a, b) for a, b in zip(sp_norm, du_norm) if a != b][:3]
        return CompareResult(name, False, f"value mismatch, first diffs: {diffs}")
    return CompareResult(name, True, f"{len(sp_rows)} rows match")
