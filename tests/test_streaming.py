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
    # exactly ONE data file per logical batch: with more part files,
    # maxFilesPerTrigger=1 splits a batch and the watermark can advance past
    # the late row before it arrives (the source of an in-suite flake)
    b1.coalesce(1).write.parquet(str(src / "f1"))
    b2.coalesce(1).write.parquet(str(src / "f2"))
    # pin distinct mtimes so the file source always sees f1 strictly first
    # (equal mtimes can batch both files into one trigger under load)
    import os as _os

    for i, d in enumerate(("f1", "f2")):
        for f in (src / d).iterdir():
            _os.utime(f, (1_700_000_000 + i * 10, 1_700_000_000 + i * 10))

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


def test_stateful_increase_carries_state_across_batches(spark, tmp_path):
    """applyInPandasWithState operator: three micro-batches (maxFilesPerTrigger
    =1); per-series state (last value, count, increase) must carry across
    batches, with counter-reset handling. Series (1,'a') sees 1.0 -> 3.5 ->
    2.0 (reset) -> 4.0 => increase = 2.5 + 2.0 + 2.0 = 6.5 (6500 milli)."""
    import os
    import pandas as pd

    from horaedb_spark.streaming.stateful import stateful_increase

    src = tmp_path / "src"
    src.mkdir()
    batches = [
        [(1, "a", 1, 1, 1.0), (2, "b", 1, 2, 10.0)],
        [(1, "a", 2, 3, 3.5), (2, "b", 2, 4, 10.25)],
        [(1, "a", 3, 5, 2.0), (1, "a", 4, 6, 4.0)],
    ]
    for i, rows in enumerate(batches):
        p = str(src / f"b{i}.parquet")
        pd.DataFrame(
            rows, columns=["user_id", "event_type", "ts_ms", "event_id", "value"]
        ).to_parquet(p)
        os.utime(p, (1_700_000_000 + i * 10, 1_700_000_000 + i * 10))

    schema = (
        "user_id long, event_type string, ts_ms long, event_id long, value double"
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = (
        stateful_increase(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("stateful_inc_test")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    emitted = spark.table("stateful_inc_test").collect()
    per_key = {}
    for r in emitted:
        per_key.setdefault((r["user_id"], r["event_type"]), []).append(
            (r["n"], r["increase_milli"])
        )
    # series (1,a) was touched in all three batches -> three emissions with
    # monotone n: state really crossed micro-batch boundaries
    assert sorted(per_key[(1, "a")]) == [(1, 0), (2, 2500), (4, 6500)]
    assert sorted(per_key[(2, "b")]) == [(1, 0), (2, 250)]


def test_rate_source_synthetic_ingest(spark, tmp_path):
    """B4 analogue: the reference's synthetic write loop (1000-row batches on
    an interval, server/src/main.rs:187-233) maps to Spark's `rate` source
    driving the foreachBatch sink. A short bounded run must land rows in the
    table with correct segment assignment and scannable merge-on-read state."""
    from horaedb_spark.core.schema import StorageSchema, UpdateMode
    from horaedb_spark.storage.table import ColumnarTable
    from horaedb_spark.streaming.sink import ingest_stream
    from pyspark.sql import types as T

    schema = StorageSchema(
        T.StructType(
            [
                T.StructField("k", T.LongType()),
                T.StructField("ts", T.LongType()),
                T.StructField("v", T.LongType()),
            ]
        ),
        num_primary_keys=1,
        update_mode=UpdateMode.OVERWRITE,
    )
    table = ColumnarTable(spark, str(tmp_path / "t"), schema, 1000)
    stream = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", 500)
        .load()
        .select(
            F.col("value").alias("k"),
            (F.col("value") * 7 % 3000).alias("ts"),
            (F.col("value") * 2).alias("v"),
        )
    )
    q = ingest_stream(stream, table, "ts", str(tmp_path / "ckpt"))
    import time

    deadline = time.time() + 20
    while time.time() < deadline and not table.manifest.all_ssts():
        time.sleep(0.5)
    q.stop()
    ssts = table.manifest.all_ssts()
    assert ssts, "rate source produced no SSTs within the deadline"
    # every SST honors the one-segment invariant
    for s in ssts:
        assert s.time_range.end - s.time_range.start <= 1000
    out = table.scan()
    assert out.count() > 0
    assert out.select("k").distinct().count() == out.count()  # PK-deduped


def test_stateful_increase_idle_eviction(spark, tmp_path):
    """With idle_timeout_ms set, a series untouched across later batches is
    evicted: its final snapshot arrives with evicted=true, its state is
    removed, and a re-appearing key restarts from scratch. NOTE: with
    pending processing-time timeouts the engine keeps scheduling no-data
    batches, so processAllAvailable() never settles — drive by polling."""
    import os
    import time as _time

    import pandas as pd

    from horaedb_spark.streaming.stateful import stateful_increase

    src = tmp_path / "src"
    src.mkdir()
    batches = [
        [(1, "a", 1, 1, 5.0), (2, "b", 1, 2, 10.0)],  # both live
        [(1, "a", 2, 3, 6.0)],  # b idle -> times out
        [(1, "a", 3, 5, 7.0), (2, "b", 4, 6, 100.0)],  # b returns, fresh
    ]
    cols = ["user_id", "event_type", "ts_ms", "event_id", "value"]
    for i, rows in enumerate(batches):
        p = str(src / f"b{i}.parquet")
        pd.DataFrame(rows, columns=cols).to_parquet(p)
        os.utime(p, (1_700_000_000 + i * 10, 1_700_000_000 + i * 10))

    schema = (
        "user_id long, event_type string, ts_ms long, event_id long, value double"
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = (
        stateful_increase(stream, idle_timeout_ms=1)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("stateful_evict_test")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    deadline = _time.time() + 90
    converged = False
    while _time.time() < deadline:
        _time.sleep(2)
        rows = spark.table("stateful_evict_test").collect()
        evicted_b = [r for r in rows if r["user_id"] == 2 and r["evicted"]]
        fresh_b = [r for r in rows if r["user_id"] == 2 and not r["evicted"]]
        if evicted_b and len(fresh_b) >= 2:
            converged = True
            break
    q.stop()
    assert converged, "eviction + fresh restart not observed within deadline"
    rows = spark.table("stateful_evict_test").collect()
    uniq = {tuple(r) for r in rows}
    # b: evicted snapshot carries its pre-eviction state (n=1, inc=0)...
    assert (2, "b", 1, 0, True) in uniq, sorted(uniq)
    # ...and the post-return incarnation restarted fresh (n=1, no carry),
    # rather than continuing at n=2
    assert (2, "b", 2, None, False) not in uniq
    assert not any(r[:2] == (2, "b") and r[2] > 1 for r in uniq), sorted(uniq)
    # a progressed monotonically to (3, 2000) while it stayed live
    assert (1, "a", 3, 2000, False) in uniq, sorted(uniq)


def test_streaming_multi_field_ingest(spark, tmp_path):
    """Streaming micro-batches of family-suffixed samples land in the
    multi-field MetricStore (RFC:106-113): per micro-batch foreachBatch
    runs group_metric_families + store.ingest (itself ONE bulk_ingest job
    per batch); after the stream drains, the engine serves both fields of
    the family independently and the catalog holds one row per field.
    Replayed batches stay idempotent (same seq -> overwrite merge)."""
    import os

    import pandas as pd

    from horaedb_spark.metric.ingest import group_metric_families
    from horaedb_spark.metric.store import MetricStore

    src = tmp_path / "mf_src"
    src.mkdir()
    batches = [
        [("req_sum", "a", 1_000, 10.0, 1), ("req_count", "a", 1_000, 2.0, 2)],
        [("req_sum", "a", 2_000, 30.0, 3), ("req_count", "b", 2_000, 4.0, 4)],
    ]
    for i, rows in enumerate(batches):
        p = str(src / f"b{i}.parquet")
        pd.DataFrame(
            rows, columns=["name", "host", "ts_ms", "value", "seq"]
        ).to_parquet(p)
        os.utime(p, (1_700_000_000 + i * 10, 1_700_000_000 + i * 10))

    store = MetricStore(spark, str(tmp_path / "mfstore"), 3_600_000)
    stream = (
        spark.readStream.schema(
            "name string, host string, ts_ms long, value double, seq long"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )

    def sink(batch_df, epoch_id):
        from pyspark.sql import functions as F

        samples = batch_df.select(
            "name",
            F.create_map(F.lit("host"), F.col("host")).alias("labels"),
            "ts_ms",
            "value",
            "seq",
        )
        store.ingest(group_metric_families(samples))

    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "mf_ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()

    eng = store.engine()
    cat = {(r["metric_name"], r["field_name"]) for r in eng.metrics.collect()}
    assert cat == {("req", "sum"), ("req", "count")}
    sums = sorted(
        (r.ts_ms, r.value)
        for r in eng.select_series("req", field="sum",
                                   with_labels=False).collect()
    )
    assert sums == [(1_000, 10.0), (2_000, 30.0)]
    counts = sorted(
        (r.ts_ms, r.value)
        for r in eng.select_series("req", field="count",
                                   with_labels=False).collect()
    )
    assert counts == [(1_000, 2.0), (2_000, 4.0)]
