"""Streaming unit tests: watermark + append-mode late-data handling, and
idempotent replay of the foreachBatch sink."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from horaedb_spark.core.timeutil import TimeRange
from horaedb_spark.storage.table import ColumnarTable, ScanRequest
from horaedb_spark.streaming.sink import write_batch_segmented
from tests.test_storage import kv_schema


def test_watermark_append_window(spark, tmp_path):
    """Two micro-batches; watermark 10s; 10s tumbling windows. After batch 2
    (max ts 60s), windows closed below 60-10=50s are emitted in append mode;
    the late row (ts=12s, arriving in batch 2) still lands in its window
    because it beats the watermark at processing time."""
    src = tmp_path / "src"
    schema = "ts string, v long"
    b1 = spark.createDataFrame(
        [("2024-01-01 00:00:01", 1), ("2024-01-01 00:00:11", 2)], schema
    ).select(F.col("ts").cast("timestamp").alias("ts"), "v")
    b2 = spark.createDataFrame(
        [("2024-01-01 00:00:12", 10), ("2024-01-01 00:01:00", 3)], schema
    ).select(F.col("ts").cast("timestamp").alias("ts"), "v")
    b1.write.parquet(str(src / "f1"))
    b2.write.parquet(str(src / "f2"))

    stream = (
        spark.readStream.schema(b1.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    agg = (
        stream.withWatermark("ts", "10 seconds")
        .groupBy(F.window("ts", "10 seconds").alias("w"))
        .agg(F.sum("v").alias("s"))
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("wm_test")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    rows = {
        r["w"]["start"].second: r["s"]
        for r in spark.table("wm_test").collect()
    }
    # window [0,10): v=1; window [10,20): 2 + late 10 = 12. [60,70) stays open.
    assert rows == {0: 1, 10: 12}


def test_foreachbatch_segment_split_and_replay(spark, tmp_path):
    table = ColumnarTable(spark, str(tmp_path / "t"), kv_schema(), 1000)
    batch = spark.createDataFrame(
        [(1, 1, 10, 500), (1, 1, 11, 1500), (2, 2, 20, 2500)],
        "pk1 long, pk2 long, value long, ts long",
    )
    n = write_batch_segmented(table, batch.select("pk1", "pk2", "value", "ts"), "ts")
    assert n == 3  # three segments -> three SSTs
    assert len(table.manifest.all_ssts()) == 3
    # replay the same batch (simulated foreachBatch retry): merge-on-read
    # keeps results identical for overwrite tables
    before = [tuple(r) for r in table.scan(ScanRequest(projections=["pk1", "pk2", "value"])).collect()]
    write_batch_segmented(table, batch.select("pk1", "pk2", "value", "ts"), "ts")
    after = [tuple(r) for r in table.scan(ScanRequest(projections=["pk1", "pk2", "value"])).collect()]
    assert before == after
