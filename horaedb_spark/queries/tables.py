"""Testdata table loader.

The driver testdata (/root/testdata/sf*/) has shipped timestamps two ways
across rounds: parquet TIMESTAMP(NANOS) (Spark's vectorized reader rejects it
without ``spark.sql.legacy.parquet.nanosAsLong=true``, after which it surfaces
as long nanoseconds) and plain TIMESTAMP(MICROS) with isAdjustedToUTC=false
(which Spark 4 infers as TIMESTAMP_NTZ by default). This loader normalises
BOTH to proper TimestampType in a UTC session — the same wall-clock values
DuckDB produces reading the identical files into its naive microsecond
TIMESTAMP — so Spark results hash-match the DuckDB oracle regardless of how
the files were written.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
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
    timestamps may be TIMESTAMP(NANOS) (unreadable without nanosAsLong) or
    untagged micros (NTZ-inferred unless disabled), and the oracle comparison
    is timezone-sensitive. All are runtime-settable SQL confs."""
    for k, v in (
        ("spark.sql.legacy.parquet.nanosAsLong", "true"),
        # untagged parquet micros should read as TimestampType in the UTC
        # session (== DuckDB's naive reading), not TIMESTAMP_NTZ
        ("spark.sql.parquet.inferTimestampNTZ.enabled", "false"),
        ("spark.sql.session.timeZone", "UTC"),
        ("spark.sql.parquet.filterPushdown", "true"),
    ):
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # already set or not supported — proceed with the session's value


def normalize_ts(df: DataFrame, col: str) -> DataFrame:
    """Normalise a testdata timestamp column to TimestampType (UTC session),
    whatever physical type the reader produced."""
    dtype = dict(df.dtypes).get(col)
    if dtype == "bigint":  # nanos surfaced as long via nanosAsLong
        # integer `div`, not `/`: double division of ~1e18 ns loses ulps
        # and can flip a microsecond at the truncation boundary
        df = df.withColumn(col, F.timestamp_micros(F.expr(f"`{col}` div 1000")))
    elif dtype == "timestamp_ntz":
        # session tz is UTC, so this cast is a pure re-tag: identical
        # wall-clock micros, now usable by unix_micros & friends
        df = df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def ts_ms_expr(df: DataFrame, col: str = "ts") -> Column:
    """Epoch-millisecond long from a testdata timestamp column, robust to the
    reader's physical type (bigint nanos / timestamp / timestamp_ntz).
    Streaming-safe: pure column expressions, no data access."""
    dtype = dict(df.dtypes).get(col)
    if dtype == "bigint":
        return F.expr(f"`{col}` div 1000000")
    if dtype == "timestamp_ntz":
        return F.expr(f"unix_micros(cast(`{col}` as timestamp)) div 1000")
    return F.expr(f"unix_micros(`{col}`) div 1000")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    ensure_session_conf(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for col in TS_COLUMNS.get(name, []):
        df = normalize_ts(df, col)
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def events_ms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events with an epoch-millisecond long column ``ts_ms`` (the engine's
    native time representation) alongside the timestamp."""
    ensure_session_conf(spark)
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    df = df.withColumn("ts_ms", ts_ms_expr(df, "ts"))
    return normalize_ts(df, "ts")


def events_to_samples(ev: DataFrame, name: Column | None = None) -> DataFrame:
    """The canonical events -> metric-samples projection the metric-layer
    queries share: name = event_type, labels = {user: user_id,
    cohort: user_id % 10}, ts_ms, value, seq = event_id. The DuckDB
    oracles hard-code this label scheme (the ``user_label`` / ``cohort``
    CTE columns) — change it HERE and in ``_DEDUP_CTE`` together.

    ``name`` overrides the metric-name expression (e.g. family suffixing
    for multi-field stores); ``ev`` needs event_type, user_id, ts_ms,
    value, event_id."""
    return ev.select(
        (name if name is not None else F.col("event_type")).alias("name"),
        F.create_map(
            F.lit("user"),
            F.col("user_id").cast("string"),
            F.lit("cohort"),
            (F.col("user_id") % 10).cast("string"),
        ).alias("labels"),
        "ts_ms",
        "value",
        F.col("event_id").alias("seq"),
    )
