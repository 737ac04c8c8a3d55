"""Testdata table loader.

The driver testdata (/root/testdata/sf*/) stores timestamps as parquet
TIMESTAMP(NANOS), which Spark's vectorized reader rejects outright; with
``spark.sql.legacy.parquet.nanosAsLong=true`` (set in core.session.get_spark)
they surface as long nanoseconds. This loader converts them to proper
TimestampType (microsecond truncation — the same conversion DuckDB applies
when it reads TIMESTAMP_NS into its microsecond TIMESTAMP), so Spark results
hash-match the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# timestamp-typed columns per table (everything else reads natively)
TS_COLUMNS: dict[str, list[str]] = {
    "orders": ["o_orderdate"],
    "lineitem": ["l_shipdate"],
    "events": ["ts"],
}

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def ensure_session_conf(spark: SparkSession) -> None:
    """Make an externally-created session safe for this engine: testdata
    timestamps are TIMESTAMP(NANOS) (unreadable without nanosAsLong) and the
    oracle comparison is timezone-sensitive. Both are runtime-settable."""
    for k, v in (
        ("spark.sql.legacy.parquet.nanosAsLong", "true"),
        ("spark.sql.session.timeZone", "UTC"),
        ("spark.sql.parquet.filterPushdown", "true"),
    ):
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # already set or not supported — proceed with the session's value


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    ensure_session_conf(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for col in TS_COLUMNS.get(name, []):
        if dict(df.dtypes).get(col) == "bigint":  # nanos surfaced as long
            # integer `div`, not `/`: double division of ~1e18 ns loses ulps
            # and can flip a microsecond at the truncation boundary
            df = df.withColumn(col, F.timestamp_micros(F.expr(f"`{col}` div 1000")))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def events_ms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events with an epoch-millisecond long column ``ts_ms`` (the engine's
    native time representation) alongside the timestamp."""
    ensure_session_conf(spark)
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    if dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts_ms", F.expr("ts div 1000000")).withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000"))
        )
    else:
        df = df.withColumn("ts_ms", F.expr("unix_micros(ts) div 1000"))
    return df
