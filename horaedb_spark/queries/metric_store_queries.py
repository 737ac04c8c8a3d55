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
observationally invisible to the query layer. ``metric_packed_promql`` runs
a full PromQL string through the packed engine for the same guarantee at
the query-language surface.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from horaedb_spark.queries.metric_queries import _DEDUP_CTE, _MF_DEDUP_CTE, DAY_MS
from horaedb_spark.queries.registry import register
from horaedb_spark.queries.tables import events_ms, events_to_samples

_PACKED_CACHE: dict[str, DataFrame] = {}
_STORES: dict[str, object] = {}


def _packed_store(spark: SparkSession, sf_dir: str):
    """One ingested + packed MetricStore per sf_dir (the fixture both
    packed queries share)."""
    if sf_dir in _STORES:
        return _STORES[sf_dir]
    from horaedb_spark.metric.store import MetricStore

    samples = events_to_samples(events_ms(spark, sf_dir))
    store = MetricStore(
        spark, tempfile.mkdtemp(prefix="metric_packed_") + "/ms", 15 * DAY_MS
    )
    store.ingest(samples)
    store.compact_to_packed()
    _STORES[sf_dir] = store
    return store


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
    from horaedb_spark.storage.table import ScanRequest

    store = _packed_store(spark, sf_dir)
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


@register(
    "metric_packed_promql",
    oracle=_DEDUP_CTE
    + f"""
    , r AS (
      SELECT cohort, ts_ms - ts_ms % {DAY_MS} AS bucket_ms,
             arg_max(value, ts_ms) AS v_last, arg_min(value, ts_ms) AS v_first,
             max(ts_ms) AS t_last, min(ts_ms) AS t_first, count(*) AS n
      FROM samples WHERE name = 'click'
      GROUP BY cohort, user_label, 2
    )
    SELECT 'cohort=' || cohort AS series_key, bucket_ms AS ts_ms,
           floor(CAST(sum(CAST((v_last - v_first)
                               / ((t_last - t_first) / 1000.0)
                               AS DECIMAL(30,10))) AS DOUBLE)
                 * 1000000 + 0.5) / 1000000 AS value
    FROM r WHERE n >= 2 AND t_last > t_first
    GROUP BY 1, 2 ORDER BY series_key, ts_ms
    """,
)
def metric_packed_promql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL over the PACKED layout: the same
    ``sum by (cohort) (rate(click[1d]))`` string every dashboard speaks,
    parsed and compiled against a MetricEngine whose data path is
    unpack-on-scan over the packed table — the RFC's batched storage must
    be observationally invisible to the full query surface, not just raw
    scans. Hash-gated against the row-per-sample DuckDB replica."""
    from horaedb_spark.metric.promql import promql_eval

    eng = _packed_store(spark, sf_dir).packed_engine()
    out = promql_eval(eng, "sum by (cohort) (rate(click[1d]))", DAY_MS)
    return out.select(
        "series_key",
        "ts_ms",
        (F.floor(F.col("value") * 1_000_000 + 0.5) / 1_000_000).alias("value"),
    ).orderBy("series_key", "ts_ms")


_MIRROR_STORES: dict[str, object] = {}


def _mirror_store(spark: SparkSession, sf_dir: str):
    """A durable MetricStore whose DATA table opted into the tsid-bucketed
    read-optimized mirror (``data_buckets``): ``engine()`` then serves the
    data path from the mirror — merge-on-read is PRE-PAID at refresh time,
    and per-series work runs exchange-free. The Spark-first analogue of the
    reference serving reads from compacted SSTs rather than re-merging per
    query (analytic-engine read path; compaction/executor parity in
    storage/compaction.py)."""
    if sf_dir in _MIRROR_STORES:
        return _MIRROR_STORES[sf_dir]
    from horaedb_spark.metric.store import MetricStore

    samples = events_to_samples(events_ms(spark, sf_dir))
    store = MetricStore(
        spark,
        tempfile.mkdtemp(prefix="metric_mirror_") + "/ms",
        15 * DAY_MS,
        data_buckets=8,
    )
    store.ingest(samples)
    _MIRROR_STORES[sf_dir] = store
    return store


@register(
    "metric_mirror_select",
    oracle=_DEDUP_CTE
    + """
    SELECT cohort, count(*) AS n_samples,
           round(sum(value), 2) + 0 AS sum_value, max(ts_ms) AS last_ts
    FROM samples WHERE name = 'click'
    GROUP BY cohort ORDER BY cohort
    """,
)
def metric_mirror_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """select_series through the MIRROR-served engine (``data_buckets``,
    metric/store.py): the data path reads the tsid-bucketed catalog mirror
    holding the already-MERGED state, so the per-query dedup window
    disappears (pre-paid at refresh — asserted on the plan here) while the
    answer must stay identical to the merge-on-read scan. Hash-gated
    against the deduped sample stream DuckDB derives from events."""
    from pyspark.sql import functions as SF

    from horaedb_spark.queries.metric_queries import _series_with_labels

    key = f"mirror_sel:{sf_dir}"
    if key in _PACKED_CACHE:
        return _PACKED_CACHE[key]
    eng = _mirror_store(spark, sf_dir).engine()
    # merge is pre-paid at mirror refresh: the served data plan carries no
    # per-query dedup window (the plan property that makes this layout pay
    # at 100 TB — documented eager action: one plan render per sf_dir)
    plan = eng.data._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, plan[:1500]
    sel = _series_with_labels(eng.select_series("click", with_labels=True))
    out = (
        sel.groupBy("cohort")
        .agg(
            SF.count(SF.lit(1)).alias("n_samples"),
            (SF.round(SF.sum("value"), 2) + 0).alias("sum_value"),
            SF.max("ts_ms").alias("last_ts"),
        )
        .orderBy("cohort")
    )
    _PACKED_CACHE[key] = out
    return out


@register(
    "metric_mirror_promql",
    oracle=_DEDUP_CTE
    + f"""
    , r AS (
      SELECT cohort, ts_ms - ts_ms % {DAY_MS} AS bucket_ms,
             arg_max(value, ts_ms) AS v_last, arg_min(value, ts_ms) AS v_first,
             max(ts_ms) AS t_last, min(ts_ms) AS t_first, count(*) AS n
      FROM samples WHERE name = 'view'
      GROUP BY cohort, user_label, 2
    )
    SELECT 'cohort=' || cohort AS series_key, bucket_ms AS ts_ms,
           floor(CAST(sum(CAST((v_last - v_first)
                               / ((t_last - t_first) / 1000.0)
                               AS DECIMAL(30,10))) AS DOUBLE)
                 * 1000000 + 0.5) / 1000000 AS value
    FROM r WHERE n >= 2 AND t_last > t_first
    GROUP BY 1, 2 ORDER BY series_key, ts_ms
    """,
)
def metric_mirror_promql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A full PromQL string over the MIRROR-served engine:
    ``sum by (cohort) (rate(view[1d]))`` compiled against an engine whose
    data path is the tsid-bucketed mirror — the read-optimized layout must
    be observationally invisible to the whole query language, exactly as
    the packed layout must be (metric_packed_promql). Hash-gated against
    the row-per-sample DuckDB replica."""
    from horaedb_spark.metric.promql import promql_eval

    key = f"mirror_pq:{sf_dir}"
    if key in _PACKED_CACHE:
        return _PACKED_CACHE[key]
    eng = _mirror_store(spark, sf_dir).engine()
    out = promql_eval(eng, "sum by (cohort) (rate(view[1d]))", DAY_MS)
    out = out.select(
        "series_key",
        "ts_ms",
        (F.floor(F.col("value") * 1_000_000 + 0.5) / 1_000_000).alias("value"),
    ).orderBy("series_key", "ts_ms")
    _PACKED_CACHE[key] = out
    return out


_MF_STORES: dict[str, object] = {}


def _build_mf_store(
    spark: SparkSession, sf_dir: str, prefix: str, data_buckets: int | None = None
):
    """THE multi-field fixture: event names suffixed into a Prometheus
    family (``click_sum``/``click_count``), folded to one metric with two
    fields (``group_metric_families``), ingested row-per-sample into a
    fresh durable store. Shared by the packed and mirror multi-field
    queries so they test the SAME fixture, layout differences aside."""
    from horaedb_spark.metric.ingest import group_metric_families
    from horaedb_spark.metric.store import MetricStore

    suffix = F.when(F.col("event_id") % 2 == 0, F.lit("sum")).otherwise(
        F.lit("count")
    )
    raw = events_to_samples(
        events_ms(spark, sf_dir),
        name=F.concat(F.col("event_type"), F.lit("_"), suffix),
    )
    store = MetricStore(
        spark,
        tempfile.mkdtemp(prefix=prefix) + "/ms",
        15 * DAY_MS,
        data_buckets=data_buckets,
    )
    store.ingest(group_metric_families(raw))
    return store


def _packed_mf_store(spark: SparkSession, sf_dir: str):
    """The multi-field fixture compacted into the packed layout — the RFC's
    packing (RFC:218-231) composed with its multi-field catalog
    (RFC:106-113)."""
    if sf_dir in _MF_STORES:
        return _MF_STORES[sf_dir]
    store = _build_mf_store(spark, sf_dir, "metric_packed_mf_")
    store.compact_to_packed()
    _MF_STORES[sf_dir] = store
    return store


@register(
    "metric_packed_multi_field",
    oracle=_MF_DEDUP_CTE
    + """
    SELECT field, cohort, count(*) AS n_samples,
           round(sum(value), 2) + 0 AS sum_value
    FROM samples WHERE name = 'click'
    GROUP BY field, cohort
    ORDER BY field, cohort
    """,
)
def metric_packed_multi_field(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MULTI-field data through the PACKED path — the RFC's packing
    (RFC 20240827:218-231) composed with its multi-field catalog
    (RFC:106-113): family-grouped samples (metric ``click``, fields
    ``sum``/``count``) ingest into a durable store whose packed layout
    keys on (metric_id, tsid, FIELD_ID, pack window) — two fields of one
    series pack into separate rows, unpack-on-scan keeps field_id, and
    ``select_series(field=…)`` aggregates each field independently. The
    pack must stay observationally invisible per FIELD, not just per
    series; dedup (D10) is per (field, series, ts). Hash-gated against
    the per-field deduped sample stream DuckDB derives from events.

    The packed table's field_id is part of its PK (a sanity assert here,
    documented eager action: two metadata-sized scans at first call per
    sf_dir, cached afterwards)."""
    from pyspark.sql import functions as SF

    from horaedb_spark.queries.metric_queries import _series_with_labels
    from horaedb_spark.storage.table import ScanRequest

    key = f"pmf:{sf_dir}"
    if key in _PACKED_CACHE:
        return _PACKED_CACHE[key]
    store = _packed_mf_store(spark, sf_dir)
    assert "field_id" in store.packed_data.schema.primary_keys
    n_samples = store.data.scan(ScanRequest(ordered=False)).count()
    n_packs = store.packed_data.scan(ScanRequest(ordered=False)).count()
    assert 0 < n_packs <= n_samples, (n_packs, n_samples)
    eng = store.packed_engine()
    parts = []
    for fld in ("sum", "count"):
        sel = _series_with_labels(
            eng.select_series("click", field=fld, with_labels=True)
        )
        parts.append(
            sel.groupBy("cohort").agg(
                SF.count(SF.lit(1)).alias("n_samples"),
                SF.round(SF.sum("value"), 2).alias("sum_value"),
            ).select(
                SF.lit(fld).alias("field"), "cohort", "n_samples", "sum_value"
            )
        )
    out = parts[0].unionByName(parts[1]).orderBy("field", "cohort")
    _PACKED_CACHE[key] = out
    return out


@register(
    "metric_mirror_multi_field",
    oracle=_MF_DEDUP_CTE
    + """
    SELECT field, cohort, count(*) AS n_samples,
           round(sum(value), 2) + 0 AS sum_value
    FROM samples WHERE name = 'view'
    GROUP BY field, cohort
    ORDER BY field, cohort
    """,
)
def metric_mirror_multi_field(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MULTI-field data through the MIRROR-served engine — the tsid-
    bucketed read-optimized layout (data_buckets) composed with the RFC's
    multi-field catalog (RFC:106-113): family-grouped samples ingest into
    a durable store whose mirror keys buckets on tsid but sorts files in
    full PK order (metric_id, tsid, FIELD_ID, ts), so a per-field
    selection keeps its parquet row-group pruning inside every bucket,
    the per-query dedup window stays pre-paid PER (field, series, ts)
    (D10), and ``select_series(field=…)`` aggregates each field
    independently off the merged serving copy. Hash-gated against the
    per-field deduped sample stream DuckDB derives from events."""
    from pyspark.sql import functions as SF

    from horaedb_spark.queries.metric_queries import _series_with_labels

    key = f"mirror_mf:{sf_dir}"
    if key in _PACKED_CACHE:
        return _PACKED_CACHE[key]
    store = _build_mf_store(
        spark, sf_dir, "metric_mirror_mf_", data_buckets=8
    )
    eng = store.engine()  # mirror-served (data_buckets)
    parts = []
    for fld in ("sum", "count"):
        sel = _series_with_labels(
            eng.select_series("view", field=fld, with_labels=True)
        )
        parts.append(
            sel.groupBy("cohort")
            .agg(
                SF.count(SF.lit(1)).alias("n_samples"),
                (SF.round(SF.sum("value"), 2) + 0).alias("sum_value"),
            )
            .select(
                SF.lit(fld).alias("field"), "cohort", "n_samples", "sum_value"
            )
        )
    out = parts[0].unionByName(parts[1]).orderBy("field", "cohort")
    _PACKED_CACHE[key] = out
    return out


@register(
    "metric_mirror_time_range",
    oracle=_DEDUP_CTE
    + """
    SELECT cohort, count(*) AS n_samples,
           round(sum(value), 2) + 0 AS sum_value
    FROM samples
    WHERE name = 'purchase'
      AND ts_ms >= 1704844800000 AND ts_ms < 1705708800000
    GROUP BY cohort ORDER BY cohort
    """,
)
def metric_mirror_time_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-ranged selection through the MIRROR-served engine: the
    store-level range prunes catalog PARTITIONS on ``__segment__`` (the
    mirror analogue of manifest SST pruning — an engine docstring
    contract, pinned on the plan in tests/test_metric_store.py) and the
    engine-level range row-filters to the exact [start, end) bounds (D5)
    — the two prunings compose, and the answer must equal the
    merge-on-read path's. A mid-month 10-day window, so the range is NOT
    segment-aligned (15-day segments): partition pruning alone would
    over-return, row filtering alone would over-scan."""
    from pyspark.sql import functions as SF

    from horaedb_spark.queries.metric_queries import _series_with_labels

    key = f"mirror_tr:{sf_dir}"
    if key in _PACKED_CACHE:
        return _PACKED_CACHE[key]
    from horaedb_spark.core.timeutil import TimeRange

    tr = TimeRange(1704844800000, 1705708800000)
    eng = _mirror_store(spark, sf_dir).engine(tr)
    sel = _series_with_labels(
        eng.select_series("purchase", time_range=tr, with_labels=True)
    )
    out = (
        sel.groupBy("cohort")
        .agg(
            SF.count(SF.lit(1)).alias("n_samples"),
            (SF.round(SF.sum("value"), 2) + 0).alias("sum_value"),
        )
        .orderBy("cohort")
    )
    _PACKED_CACHE[key] = out
    return out


@register(
    "metric_mirror_retention",
    oracle=_DEDUP_CTE
    + f"""
    , cutoff AS (
      SELECT max(ts_ms) - max(ts_ms) % {15 * DAY_MS} AS seg FROM samples
    )
    SELECT ts_ms - ts_ms % {DAY_MS} AS day_ms,
           CASE WHEN ts_ms - ts_ms % {DAY_MS} < (SELECT seg FROM cutoff)
                THEN 'rollup' ELSE 'live' END AS src,
           count(*) AS n, round(sum(value), 2) + 0 AS sum_value
    FROM samples WHERE name = 'click'
    GROUP BY 1, 2 ORDER BY day_ms
    """,
)
def metric_mirror_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mirror serving composed with TTL retention (VERDICT r10 task 6):
    raw samples roll up daily (storage/rollup.py ContinuousRollup), then a
    TTL compaction pass (picker.rs:55-59 expiry + executor swap-
    before-delete) EXPIRES every data segment before the last one — and
    the compaction-driven mirror refresh must DROP the expired catalog
    partitions (storage/bucketed.py), not merely stop finding their SSTs.
    The query unions pre-cutoff days from the rollup with post-cutoff days
    from the MIRROR-served engine, deliberately NOT time-filtering the
    live branch: if an expired partition kept serving, its days would
    surface twice (once per src) and the hash gate would fail. The oracle
    re-derives both branches from the original events, which the raw
    table no longer holds past the cutoff."""
    key = f"mirror_ret:{sf_dir}"
    if key in _PACKED_CACHE:
        return _PACKED_CACHE[key]
    from pyspark.sql import types as T

    from horaedb_spark.core.schema import StorageSchema, UpdateMode
    from horaedb_spark.metric.store import MetricStore
    from horaedb_spark.storage.compaction import Compactor, SchedulerConfig
    from horaedb_spark.storage.rollup import ContinuousRollup
    from horaedb_spark.storage.table import ColumnarTable

    SEG = 15 * DAY_MS
    store = MetricStore(
        spark,
        tempfile.mkdtemp(prefix="metric_ret_") + "/ms",
        SEG,
        data_buckets=8,
    )
    store.ingest(events_to_samples(events_ms(spark, sf_dir)))
    roll = ColumnarTable(
        spark,
        tempfile.mkdtemp(prefix="metric_ret_roll_") + "/t",
        StorageSchema(
            T.StructType(
                [
                    T.StructField("metric_id", T.LongType()),
                    T.StructField("day_ms", T.LongType()),
                    T.StructField("n", T.LongType()),
                    T.StructField("sum_value", T.DoubleType()),
                ]
            ),
            num_primary_keys=2,
            update_mode=UpdateMode.OVERWRITE,
        ),
        SEG,
    )

    def daily(df: DataFrame) -> DataFrame:
        # decimal-exact sum (deterministic under any partial-agg order),
        # stored UNROUNDED: the final round(2) then equals a single
        # rounding of the true sum on both branches and in the oracle
        return df.groupBy(
            "metric_id",
            (F.col("ts_ms") - F.pmod("ts_ms", F.lit(DAY_MS))).alias("day_ms"),
        ).agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(30,10)"))
            .cast("double")
            .alias("sum_value"),
        )

    rollup = ContinuousRollup(store.data, roll, "ts_ms", "day_ms", DAY_MS, daily)
    rollup.refresh()
    # TTL pass: retention = everything before the LAST segment. Expiry
    # watermark now-ttl lands 1ms past the cutoff so boundary SSTs
    # (time_range.end == cutoff, exclusive) expire too.
    hi = store.data.scan().agg(F.max("ts_ms")).first()[0]
    cutoff = hi - hi % SEG
    comp = Compactor(store.data, SchedulerConfig(input_sst_min_num=999, ttl_ms=1))
    for _ in range(64):
        if all(s.time_range.end >= cutoff + 1 for s in store.data.manifest.all_ssts()):
            break
        comp.run_once(now_ms=cutoff + 2)
    live_segs = {s.time_range.start - s.time_range.start % SEG
                 for s in store.data.manifest.all_ssts()}
    assert live_segs == {cutoff}, f"expiry incomplete: {live_segs} vs {cutoff}"
    # the compaction-driven refresh dropped the expired partitions: the
    # mirror is already fresh (no serve-time rebuild pending) and its
    # served plan carries no per-query dedup window
    assert store.data.bucketed.is_fresh()
    eng = store.engine()
    plan = eng.data._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, plan[:1500]

    click_id = F.xxhash64(F.lit("click"))
    old = (
        roll.scan()
        .filter((F.col("metric_id") == click_id) & (F.col("day_ms") < cutoff))
        .select(
            "day_ms",
            F.lit("rollup").alias("src"),
            "n",
            (F.round("sum_value", 2) + 0).alias("sum_value"),
        )
    )
    live = (
        eng.select_series("click", with_labels=False)
        .groupBy((F.col("ts_ms") - F.pmod("ts_ms", F.lit(DAY_MS))).alias("day_ms"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            (
                F.round(
                    F.sum(F.col("value").cast("decimal(30,10)")).cast("double"), 2
                )
                + 0
            ).alias("sum_value"),
        )
        .select("day_ms", F.lit("live").alias("src"), "n", "sum_value")
    )
    out = old.unionByName(live).orderBy("day_ms")
    _PACKED_CACHE[key] = out
    return out
