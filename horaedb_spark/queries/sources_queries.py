"""Source/sink format coverage: the engine's tables are parquet, but the
query surface reads/writes every Spark-native format. Each query round-trips
testdata through another format (explicit schema — no inference in prod) and
must produce results identical to the parquet-sourced oracle."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from horaedb_spark.queries.precision import dsum, sql_dsum
from horaedb_spark.queries.registry import register
from horaedb_spark.queries.tables import events_ms, load_table

_DIRS: dict[str, str] = {}


def _json_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    key = f"json:{sf_dir}"
    if key not in _DIRS:
        out = tempfile.mkdtemp(prefix="horaedb_json_")
        # epoch-ms long for ts: JSON has no timestamp type worth trusting
        events_ms(spark, sf_dir).select(
            "event_id", "ts_ms", "user_id", "event_type", "value"
        ).write.mode("overwrite").json(out)
        _DIRS[key] = out
    schema = "event_id long, ts_ms long, user_id long, event_type string, value double"
    return spark.read.schema(schema).json(_DIRS[key])


@register(
    "source_json_roundtrip",
    oracle="""
    SELECT event_type, count(*) AS n,
           round(CAST(sum(CAST(value AS DECIMAL(30,10))) AS DOUBLE), 6) AS sum_value,
           min(epoch_ms(ts)) AS min_ts_ms, max(epoch_ms(ts)) AS max_ts_ms
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def source_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON source with explicit schema: events written to JSON lines, read
    back, aggregated — must equal the parquet-sourced answer exactly
    (doubles survive the JSON round-trip via shortest-repr serialization)."""
    ev = _json_events(spark, sf_dir)
    return (
        ev.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(
                F.sum(F.col("value").cast("decimal(30,10)")).cast("double"), 6
            ).alias("sum_value"),
            F.min("ts_ms").alias("min_ts_ms"),
            F.max("ts_ms").alias("max_ts_ms"),
        )
        .orderBy("event_type")
    )


@register(
    "sink_orc_roundtrip",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_dsum('l_extendedprice')} AS sum_price, count(*) AS n
    FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def sink_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC sink + source: lineitem written to ORC (preserving types), read
    back, aggregated — exercises the columnar alternative format end-to-end."""
    key = f"orc:{sf_dir}"
    if key not in _DIRS:
        out = tempfile.mkdtemp(prefix="horaedb_orc_")
        load_table(spark, sf_dir, "lineitem").write.mode("overwrite").orc(out)
        _DIRS[key] = out
    li = spark.read.orc(_DIRS[key])
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(dsum("l_extendedprice").alias("sum_price"), F.count("*").alias("n"))
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "sink_partitioned_parquet",
    oracle="""
    SELECT strftime(ts, '%Y-%m-%d') AS day, count(*) AS n
    FROM events GROUP BY 1 ORDER BY 1
    """,
)
def sink_partitioned_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-partitioned parquet sink (partitionBy day) + partition-discovery
    read: row counts per partition must match the source — and a filtered
    read of one day touches only that directory (partition pruning)."""
    key = f"part:{sf_dir}"
    if key not in _DIRS:
        out = tempfile.mkdtemp(prefix="horaedb_part_")
        ev = load_table(spark, sf_dir, "events")
        ev.withColumn("day", F.date_format("ts", "yyyy-MM-dd")).write.mode(
            "overwrite"
        ).partitionBy("day").parquet(out)
        _DIRS[key] = out
    back = spark.read.parquet(_DIRS[key])
    return back.groupBy("day").agg(F.count("*").alias("n")).orderBy("day")


@register(
    "source_csv_roundtrip",
    oracle="""
    SELECT event_type, count(*) AS n,
           round(CAST(sum(CAST(value AS DECIMAL(30,10))) AS DOUBLE), 6) AS sum_value,
           min(epoch_ms(ts)) AS min_ts_ms, max(epoch_ms(ts)) AS max_ts_ms
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def source_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV source with explicit schema: events written to headered CSV, read
    back, aggregated — must equal the parquet-sourced answer exactly (Java's
    shortest-round-trip double formatting survives the text round-trip)."""
    key = f"csv:{sf_dir}"
    if key not in _DIRS:
        out = tempfile.mkdtemp(prefix="horaedb_csv_")
        events_ms(spark, sf_dir).select(
            "event_id", "ts_ms", "user_id", "event_type", "value"
        ).write.mode("overwrite").option("header", True).csv(out)
        _DIRS[key] = out
    schema = "event_id long, ts_ms long, user_id long, event_type string, value double"
    ev = spark.read.schema(schema).option("header", True).csv(_DIRS[key])
    return (
        ev.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(
                F.sum(F.col("value").cast("decimal(30,10)")).cast("double"), 6
            ).alias("sum_value"),
            F.min("ts_ms").alias("min_ts_ms"),
            F.max("ts_ms").alias("max_ts_ms"),
        )
        .orderBy("event_type")
    )
