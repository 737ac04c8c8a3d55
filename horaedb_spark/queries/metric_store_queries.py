"""Durable metric-store queries under the oracle gate — the RFC's PACKED
data-table layout (docs/rfcs/20240827-metric-engine.md:218-231).

The RFC batches ~30 minutes of points per data row ("会把 30 分钟的数据压缩到
一行里面") with the Timestamp/Value encoding opaque to parquet, explicit
ts min/max stats, and seq-based dedup on compaction. The Spark-first
re-expression (metric/model.py pack_data_table / unpack_data_table,
metric/store.py compact_to_packed / packed_scan) stores the batch as an
``array<struct<ts_ms,value>>`` column: parquet compresses it columnar, the
pack is built by ONE hash aggregate, and the unpack is a codegen'd explode.

``metric_packed_scan`` drives the full round trip — ingest row-per-sample,
pack-on-compaction, unpack-on-scan through the series/metrics catalogs — and
hash-matches every (name, series_key, ts_ms, value) row against the deduped
sample stream DuckDB derives directly from events: packing must be
observationally invisible to the query layer.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from horaedb_spark.queries.metric_queries import _DEDUP_CTE, DAY_MS
from horaedb_spark.queries.registry import register
from horaedb_spark.queries.tables import events_ms

_PACKED_CACHE: dict[str, DataFrame] = {}


@register(
    "metric_packed_scan",
    oracle=_DEDUP_CTE
    + """
    SELECT name,
           'cohort=' || cohort || ',user=' || user_label AS series_key,
           ts_ms, value
    FROM samples
    ORDER BY name, series_key, ts_ms
    """,
)
def metric_packed_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFC packed data table round trip (RFC 20240827:218-231): the event
    stream is ingested row-per-sample into a durable MetricStore,
    compacted into the packed array<struct<ts_ms,value>> layout (~30 min
    per row, explicit ts_min/ts_max stats), and scanned back through
    unpack-on-scan + the series/metrics catalogs. Every sample must
    round-trip exactly — the oracle is the deduped sample stream itself.
    The pack is asserted to never EXPAND the table (row count <= samples;
    high-frequency series cut ~(points per window)x — benched in
    bench.py's ``packing`` stat)."""
    if sf_dir in _PACKED_CACHE:
        return _PACKED_CACHE[sf_dir]
    from horaedb_spark.metric.store import MetricStore
    from horaedb_spark.storage.table import ScanRequest

    ev = events_ms(spark, sf_dir)
    samples = ev.select(
        F.col("event_type").alias("name"),
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
    store = MetricStore(
        spark, tempfile.mkdtemp(prefix="metric_packed_") + "/ms", 15 * DAY_MS
    )
    store.ingest(samples)
    store.compact_to_packed()
    n_samples = store.data.scan(ScanRequest(ordered=False)).count()
    n_packs = store.packed_data.scan(ScanRequest(ordered=False)).count()
    assert 0 < n_packs <= n_samples, (n_packs, n_samples)
    unp = store.packed_scan()
    series = store.series.scan(ScanRequest(ordered=False)).select(
        "metric_id", "tsid", "series_key"
    )
    names = (
        store.metrics.scan(ScanRequest(ordered=False))
        .select(F.col("metric_name").alias("name"), "metric_id")
        .distinct()
    )
    # names (distinct metric names) is tiny -> broadcast; the series
    # catalog scales with series cardinality, so its join is left to
    # AQE (hash join on the same (metric_id, tsid) the data is keyed by).
    out = (
        unp.join(series, ["metric_id", "tsid"])
        .join(F.broadcast(names), "metric_id")
        .select("name", "series_key", "ts_ms", "value")
        .orderBy("name", "series_key", "ts_ms")
    )
    _PACKED_CACHE[sf_dir] = out
    return out
