"""SparkSession factory tuned for this engine.

Local-mode testing uses ``local[N]``; the config choices are the ones that
matter at cluster scale too: AQE on (runtime re-plan, skew-join splitting,
partition coalescing), shuffle partitions sized to the parallelism instead of
the 200 default, UTC session timezone (duckdb-oracle comparisons are
TZ-sensitive), and Arrow enabled for the Pandas-UDF slow path.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "horaedb_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or max(cpus, 8)
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # The driver testdata stores timestamps as parquet TIMESTAMP(NANOS),
        # which vanilla Spark refuses (PARQUET_TYPE_ILLEGAL). Read them as
        # long nanos; horaedb_spark.queries.tables converts to TimestampType.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Newer testdata writes untagged TIMESTAMP(MICROS); read as
        # TimestampType in the UTC session (matches DuckDB), not NTZ.
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
