"""Local DuckDB-oracle comparator — replicates the driver's correctness gate
(row count + column set + order-insensitive value comparison) so every
registered query is validated in-repo before the driver ever sees it."""

from __future__ import annotations

import math
from dataclasses import dataclass

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
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # 12 significant digits: strict enough to catch real bugs, immune to
        # the last-ulp noise that different summation orders produce
        return f"{v:.12g}"
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def _normalize(columns, rows):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(_norm_cell(row[i]) for i in order) for row in rows]
    return sorted(columns), sorted(out)


def compare_query(spark_df, oracle_sql: str, con, name: str = "query") -> CompareResult:
    sp_rows = [tuple(r) for r in spark_df.collect()]
    sp_cols = spark_df.columns
    res = con.execute(oracle_sql)
    du_cols = [d[0] for d in res.description]
    du_rows = res.fetchall()

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
