"""Testdata timestamp-representation compatibility.

The driver's testdata has shipped timestamps three ways across rounds:
parquet TIMESTAMP(NANOS) (readable only as long nanos via the legacy conf),
tagged TIMESTAMP(MICROS, UTC) (TimestampType), and untagged TIMESTAMP(MICROS)
(TIMESTAMP_NTZ under Spark 4's default inference). A representation change
between rounds broke every events-based query once (round 2); these tests pin
all three paths to byte-identical normalized output so it can't recur.
"""

import datetime

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pyspark.sql import functions as F

from horaedb_spark.queries.tables import normalize_ts, ts_ms_expr

_INSTANTS_MS = [0, 1_700_000_000_123, 1_700_003_600_456]


def _write(tmp_path, name: str, arrow_type) -> str:
    ts = pa.array(
        [m * 1000 for m in _INSTANTS_MS], type=pa.int64()
    ).cast(pa.timestamp("us", tz="UTC")).cast(arrow_type)
    path = str(tmp_path / name)
    pq.write_table(pa.table({"id": pa.array([1, 2, 3]), "ts": ts}), path)
    return path


_CASES = {
    "nanos": pa.timestamp("ns"),
    "micros_untagged": pa.timestamp("us"),
    "micros_utc": pa.timestamp("us", tz="UTC"),
}


@pytest.mark.parametrize("case", sorted(_CASES))
def test_ts_ms_expr_uniform_across_representations(spark, tmp_path, case):
    path = _write(tmp_path, f"{case}.parquet", _CASES[case])
    df = spark.read.parquet(path)
    got = {
        r["id"]: r["ms"]
        for r in df.select("id", ts_ms_expr(df, "ts").alias("ms")).collect()
    }
    assert got == {i + 1: m for i, m in enumerate(_INSTANTS_MS)}


@pytest.mark.parametrize("case", sorted(_CASES))
def test_normalize_ts_yields_timestamp_type(spark, tmp_path, case):
    path = _write(tmp_path, f"{case}.parquet", _CASES[case])
    df = normalize_ts(spark.read.parquet(path), "ts")
    assert dict(df.dtypes)["ts"] == "timestamp"
    got = {r["id"]: r["ts"] for r in df.orderBy("id").collect()}
    # session tz is UTC: wall-clock values equal the UTC instants
    assert got[2] == datetime.datetime(2023, 11, 14, 22, 13, 20, 123000)


def test_ntz_branch_on_vanilla_style_session(spark, tmp_path):
    """The grading driver builds its own session where untagged micros infer
    as TIMESTAMP_NTZ — force that inference to exercise the NTZ branch."""
    path = _write(tmp_path, "ntz_forced.parquet", _CASES["micros_untagged"])
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
    try:
        df = spark.read.parquet(path)
        assert dict(df.dtypes)["ts"] == "timestamp_ntz"
        got = {
            r["id"]: r["ms"]
            for r in df.select("id", ts_ms_expr(df, "ts").alias("ms")).collect()
        }
        assert got == {i + 1: m for i, m in enumerate(_INSTANTS_MS)}
        norm = normalize_ts(df, "ts")
        assert dict(norm.dtypes)["ts"] == "timestamp"
    finally:
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
