"""MetricStore: the metric layer persisted on ColumnarTables (RFC:102-138 —
each metric table is an instance of the generic columnar storage)."""

from pyspark.sql import functions as F

from horaedb_spark.core.timeutil import TimeRange
from horaedb_spark.metric.engine import Matcher
from horaedb_spark.metric.store import MetricStore

HOUR = 3600 * 1000


def _samples(spark, rows):
    # rows: (name, {labels}, ts_ms, value, seq)
    return spark.createDataFrame(
        rows, "name string, labels map<string,string>, ts_ms long, value double, seq long"
    )


def test_ingest_and_query_round_trip(spark, tmp_path):
    store = MetricStore(spark, str(tmp_path / "ms"), HOUR)
    store.ingest(
        _samples(
            spark,
            [
                ("cpu", {"host": "a"}, 1000, 1.0, 1),
                ("cpu", {"host": "b"}, 1000, 2.0, 1),
                ("mem", {"host": "a"}, 2000, 3.0, 1),
            ],
        )
    )
    eng = store.engine()
    assert {r.tag_value for r in eng.label_values("cpu", "host").collect()} == {"a", "b"}
    out = eng.select_series("cpu", [Matcher("host", "=", "a")])
    assert [(r.ts_ms, r.value) for r in out.collect()] == [(1000, 1.0)]


def test_reingest_is_idempotent_and_d10_dedup(spark, tmp_path):
    store = MetricStore(spark, str(tmp_path / "ms2"), HOUR)
    batch = [("cpu", {"host": "a"}, 1000, 1.0, 1)]
    store.ingest(_samples(spark, batch))
    # second batch: same series, same ts, new value -> max seq (later file) wins
    store.ingest(_samples(spark, [("cpu", {"host": "a"}, 1000, 9.0, 2)]))
    eng = store.engine()
    rows = eng.select_series("cpu", with_labels=False).collect()
    assert [(r.ts_ms, r.value) for r in rows] == [(1000, 9.0)]
    # catalogs did not duplicate
    assert eng.series.count() == 1
    assert eng.index.count() == 1
    assert eng.metrics.count() == 1


def test_time_partitioned_data_prunes(spark, tmp_path):
    store = MetricStore(spark, str(tmp_path / "ms3"), HOUR)
    store.ingest(
        _samples(
            spark,
            [
                ("cpu", {"h": "a"}, 1000, 1.0, 1),          # segment 0
                ("cpu", {"h": "a"}, HOUR + 1000, 2.0, 1),   # segment 1
            ],
        )
    )
    assert len(store.data.manifest.all_ssts()) == 2
    eng = store.engine(TimeRange(0, HOUR))
    rows = eng.select_series("cpu", with_labels=False).collect()
    assert [(r.ts_ms, r.value) for r in rows] == [(1000, 1.0)]
    # pruning happened at the manifest
    assert len(store.data.manifest.find_ssts(TimeRange(0, HOUR))) == 1


def test_store_recovery(spark, tmp_path):
    root = str(tmp_path / "ms4")
    store = MetricStore(spark, root, HOUR)
    store.ingest(_samples(spark, [("cpu", {"h": "a"}, 1000, 1.0, 1)]))
    # reopen from disk: manifests replay, data intact
    store2 = MetricStore(spark, root, HOUR)
    eng = store2.engine()
    assert eng.data.count() == 1
    assert eng.label_values("cpu", "h").count() == 1
