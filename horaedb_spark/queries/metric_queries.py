"""Metric-layer + PromQL queries (SURVEY.md §2 D1-D8) under the oracle gate.

The events table doubles as a metric workload: ``name = event_type``,
labels = {user: str(user_id), cohort: str(user_id % 10)}, sample =
(ts_ms, value). The MetricEngine derives ids via xxhash64 internally; oracle
SQL never needs the hashes because query *outputs* expose labels/values, not
ids — the ids are engine-internal routing exactly as in the reference.

Sample stream dedup (D10): duplicate (series, ts) keeps the max event_id —
applied identically in the engine (seq = event_id) and the oracle CTE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from horaedb_spark.core.timeutil import TimeRange
from horaedb_spark.functions import promql
from horaedb_spark.metric.engine import Matcher, MetricEngine
from horaedb_spark.queries.registry import register
from horaedb_spark.queries.tables import events_ms, events_to_samples

_ENGINES: dict[str, MetricEngine] = {}

HOUR_MS = 3_600_000
DAY_MS = 86_400_000

# Oracle CTE shared by every metric query: the deduped sample stream.
_DEDUP_CTE = """
    WITH samples AS (
      SELECT event_type AS name,
             CAST(user_id AS VARCHAR) AS user_label,
             CAST(user_id % 10 AS VARCHAR) AS cohort,
             ts_ms, value
      FROM (
        SELECT *, epoch_ms(ts) AS ts_ms,
               row_number() OVER (PARTITION BY event_type, user_id, epoch_ms(ts)
                                  ORDER BY event_id DESC) AS rn
        FROM events
      ) WHERE rn = 1
    )
"""


def _engine(spark: SparkSession, sf_dir: str) -> MetricEngine:
    if sf_dir not in _ENGINES:
        samples = events_to_samples(events_ms(spark, sf_dir))
        # NOT cache()d, deliberately: A/B at sf0.1 measured the cached
        # engine SLOWER for the suite queries (10.2/6.7 s vs 7.8/4.7 s
        # cold/warm) — the in-memory columnar deser of _flat costs more
        # than re-running the cheap vectorized parquet scan + dedup, and
        # ReuseExchange already dedups the shared base inside each union
        # job. cache() stays the right call for long-lived HTTP serving
        # (many small SEPARATE jobs over one store), not for suite unions.
        _ENGINES[sf_dir] = MetricEngine(samples)
    return _ENGINES[sf_dir]


def _series_with_labels(df: DataFrame) -> DataFrame:
    """series_key 'cohort=c,user=u' -> label columns for oracle-comparable
    output."""
    parts = F.split("series_key", ",")
    return df.withColumn(
        "cohort", F.split(F.element_at(parts, 1), "=")[1]
    ).withColumn("user_label", F.split(F.element_at(parts, 2), "=")[1])


# ---------------------------------------------------------------------- D4
@register(
    "metric_label_values",
    oracle=_DEDUP_CTE
    + """
    SELECT DISTINCT cohort AS tag_value FROM samples WHERE name = 'click'
    ORDER BY tag_value
    """,
)
def metric_label_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """label_values('click', 'cohort') served from the inverted index."""
    return _engine(spark, sf_dir).label_values("click", "cohort").orderBy("tag_value")


# ---------------------------------------------------------------------- D3+D5
@register(
    "metric_series_select",
    oracle=_DEDUP_CTE
    + """
    SELECT user_label, cohort, ts_ms, value
    FROM samples
    WHERE name = 'purchase' AND cohort = '3' AND regexp_matches(user_label, '^1')
      AND ts_ms >= 1704067200000 AND ts_ms < 1705276800000
    ORDER BY user_label, ts_ms
    """,
)
def metric_series_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-matcher selection {cohort="3", user=~"1.*"} on metric 'purchase'
    within a two-week range: index semi-join -> TSID set -> data join (the
    RFC's two-step query, 20240827:120-126). Matcher regexes are fully
    anchored (PromQL semantics), so "1.*" == users starting with 1."""
    eng = _engine(spark, sf_dir)
    out = eng.select_series(
        "purchase",
        [Matcher("cohort", "=", "3"), Matcher("user", "=~", "1.*")],
        TimeRange(1704067200000, 1705276800000),
    )
    return (
        _series_with_labels(out)
        .select("user_label", "cohort", "ts_ms", "value")
        .orderBy("user_label", "ts_ms")
    )


# ---------------------------------------------------------------------- D3 negative matchers
@register(
    "metric_series_negative_match",
    oracle=_DEDUP_CTE
    + """
    SELECT cohort, count(*) AS n_samples,
           round(CAST(sum(CAST(value AS DECIMAL(30,10))) AS DOUBLE), 6) AS sum_value
    FROM samples
    WHERE name = 'error' AND cohort != '0' AND NOT regexp_matches(user_label, '9$')
    GROUP BY cohort ORDER BY cohort
    """,
)
def metric_series_negative_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Negative matchers {cohort!="0", user!~".*9"} — anti-joins on the index
    (anchored regex semantics: ".*9" == users ending in 9)."""
    eng = _engine(spark, sf_dir)
    out = eng.select_series(
        "error", [Matcher("cohort", "!=", "0"), Matcher("user", "!~", ".*9")]
    )
    return (
        _series_with_labels(out)
        .groupBy("cohort")
        .agg(
            F.count("*").alias("n_samples"),
            F.round(F.sum(F.col("value").cast("decimal(30,10)")).cast("double"), 6).alias(
                "sum_value"
            ),
        )
        .orderBy("cohort")
    )


# ---------------------------------------------------------------------- D2
@register(
    "metric_index_summary",
    oracle=_DEDUP_CTE
    + """
    SELECT name AS metric_name, 'cohort' AS tag_key,
           count(DISTINCT cohort) AS n_values,
           count(DISTINCT user_label) AS n_series
    FROM samples GROUP BY name
    UNION ALL
    SELECT name, 'user', count(DISTINCT user_label), count(DISTINCT user_label)
    FROM samples GROUP BY name
    ORDER BY metric_name, tag_key
    """,
)
def metric_index_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index build (D2): per (metric, tag_key), distinct posting
    values and series counts — joined back to names via the metrics catalog."""
    eng = _engine(spark, sf_dir)
    summary = eng.index.groupBy("metric_id", "tag_key").agg(
        F.countDistinct("tag_value").alias("n_values"),
        F.countDistinct("tsid").alias("n_series"),
    )
    return (
        summary.join(
            F.broadcast(eng.metrics.select("metric_id", "metric_name").distinct()), "metric_id"
        )
        .select("metric_name", "tag_key", "n_values", "n_series")
        .orderBy("metric_name", "tag_key")
    )


# ---------------------------------------------------------------------- D6
@register(
    "metric_agg_by_label",
    oracle=_DEDUP_CTE
    + f"""
    SELECT cohort, ts_ms - ts_ms % {HOUR_MS} AS bucket_ms,
           round(CAST(sum(CAST(value AS DECIMAL(30,10))) AS DOUBLE), 6) AS sum_value,
           round(CAST(sum(CAST(value AS DECIMAL(30,10))) AS DOUBLE) / count(value), 6)
             AS avg_value,
           count(*) AS n
    FROM samples WHERE name = 'view'
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def metric_agg_by_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sum/avg/count by (cohort) over 1h aligned buckets — the RFC pushdown
    shape (20220702:84-99)."""
    eng = _engine(spark, sf_dir)
    sel = _series_with_labels(eng.select_series("view"))
    out = promql.aggregate_by(
        sel, ["cohort"], HOUR_MS, {"sum_value": "sum", "avg_value": "avg", "n": "count"}
    )
    return out.select(
        "cohort",
        "bucket_ms",
        F.round("sum_value", 6).alias("sum_value"),
        F.round("avg_value", 6).alias("avg_value"),
        "n",
    ).orderBy("cohort", "bucket_ms")


# ---------------------------------------------------------------------- D7 rate
@register(
    "promql_rate",
    oracle=_DEDUP_CTE
    + f"""
    SELECT user_label, cohort, bucket_ms,
           round((v_last - v_first) / ((t_last - t_first) / 1000.0), 6) + 0 AS rate_per_s
    FROM (
      SELECT user_label, cohort, ts_ms - ts_ms % {DAY_MS} AS bucket_ms,
             arg_max(value, ts_ms) AS v_last, arg_min(value, ts_ms) AS v_first,
             max(ts_ms) AS t_last, min(ts_ms) AS t_first, count(*) AS n
      FROM samples WHERE name = 'click'
      GROUP BY 1, 2, 3
    ) WHERE n >= 2 AND t_last > t_first
    ORDER BY user_label, bucket_ms
    """,
)
def promql_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rate() per series over 1-day buckets (D7): (last-first)/(Δt seconds),
    buckets needing ≥2 samples — one hash aggregate via max_by/min_by."""
    eng = _engine(spark, sf_dir)
    sel = _series_with_labels(eng.select_series("click"))
    out = promql.rate(sel, ["user_label", "cohort"], DAY_MS)
    return out.select(
        "user_label", "cohort", "bucket_ms", F.round("rate_per_s", 6).alias("rate_per_s")
    ).orderBy("user_label", "bucket_ms")


# ---------------------------------------------------------------------- D7 increase w/ resets
@register(
    "promql_increase_counter_resets",
    oracle=_DEDUP_CTE
    + f"""
    , counters AS (
      SELECT user_label, cohort, ts_ms,
             sum(value) OVER (PARTITION BY user_label, cohort ORDER BY ts_ms
                              ROWS UNBOUNDED PRECEDING) % 1000 AS cval
      FROM samples WHERE name = 'signup'
    ), diffed AS (
      SELECT user_label, cohort, ts_ms - ts_ms % {DAY_MS} AS bucket_ms,
             CASE WHEN prev IS NULL THEN NULL
                  WHEN cval >= prev THEN cval - prev
                  ELSE cval END AS step_inc
      FROM (
        SELECT *, lag(cval) OVER (PARTITION BY user_label, cohort,
                                  ts_ms - ts_ms % {DAY_MS} ORDER BY ts_ms) AS prev
        FROM counters
      )
    )
    SELECT user_label, cohort, bucket_ms,
           round(CAST(sum(CAST(step_inc AS DECIMAL(30,10))) AS DOUBLE), 6) AS increase
    FROM diffed GROUP BY 1, 2, 3 HAVING count(*) >= 2
    ORDER BY user_label, bucket_ms
    """,
)
def promql_increase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """increase() with counter-reset handling (D7): a synthetic wrapping
    counter (running sum mod 1000) exercises the reset rule — a negative diff
    contributes the post-reset value itself."""
    from pyspark.sql.window import Window

    eng = _engine(spark, sf_dir)
    sel = _series_with_labels(eng.select_series("signup"))
    wcum = (
        Window.partitionBy("user_label", "cohort")
        .orderBy("ts_ms")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    counters = sel.withColumn("value", F.sum("value").over(wcum) % 1000)
    out = promql.increase(counters, ["user_label", "cohort"], DAY_MS)
    return out.select(
        "user_label", "cohort", "bucket_ms", F.round("increase", 6).alias("increase")
    ).orderBy("user_label", "bucket_ms")


# ---------------------------------------------------------------------- D7 irate
@register(
    "promql_irate",
    oracle=_DEDUP_CTE
    + f"""
    SELECT user_label, cohort, bucket_ms,
           round((v1 - v2) / ((t1 - t2) / 1000.0), 6) AS irate_per_s
    FROM (
      SELECT user_label, cohort, ts_ms - ts_ms % {DAY_MS} AS bucket_ms,
             max(CASE WHEN rn = 1 THEN value END) AS v1,
             max(CASE WHEN rn = 2 THEN value END) AS v2,
             max(CASE WHEN rn = 1 THEN ts_ms END) AS t1,
             max(CASE WHEN rn = 2 THEN ts_ms END) AS t2
      FROM (
        SELECT *, row_number() OVER (PARTITION BY user_label, cohort,
                                     ts_ms - ts_ms % {DAY_MS}
                                     ORDER BY ts_ms DESC) AS rn
        FROM samples WHERE name = 'error'
      ) WHERE rn <= 2
      GROUP BY 1, 2, 3
    ) WHERE v2 IS NOT NULL AND t1 > t2
    ORDER BY user_label, bucket_ms
    """,
)
def promql_irate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """irate(): instant rate from the last two samples per 1-day bucket."""
    eng = _engine(spark, sf_dir)
    sel = _series_with_labels(eng.select_series("error"))
    out = promql.irate(sel, ["user_label", "cohort"], DAY_MS)
    return out.select(
        "user_label", "cohort", "bucket_ms", F.round("irate_per_s", 6).alias("irate_per_s")
    ).orderBy("user_label", "bucket_ms")


# ---------------------------------------------------------------------- D7 delta/idelta
@register(
    "promql_delta_idelta",
    oracle=_DEDUP_CTE
    + f"""
    , b AS (
      SELECT user_label, cohort, ts_ms - ts_ms % {DAY_MS} AS bucket_ms, value,
             row_number() OVER (PARTITION BY user_label, cohort,
                                ts_ms - ts_ms % {DAY_MS}
                                ORDER BY ts_ms DESC) AS rn,
             count(*) OVER (PARTITION BY user_label, cohort,
                            ts_ms - ts_ms % {DAY_MS}) AS n,
             arg_max(value, ts_ms) OVER (PARTITION BY user_label, cohort,
                                         ts_ms - ts_ms % {DAY_MS}) AS v_last,
             arg_min(value, ts_ms) OVER (PARTITION BY user_label, cohort,
                                         ts_ms - ts_ms % {DAY_MS}) AS v_first
      FROM samples WHERE name = 'view'
    )
    SELECT user_label, cohort, bucket_ms,
           round(any_value(v_last) - any_value(v_first), 6) AS delta,
           round(max(CASE WHEN rn = 1 THEN value END)
                 - max(CASE WHEN rn = 2 THEN value END), 6) AS idelta
    FROM b WHERE n >= 2
    GROUP BY user_label, cohort, bucket_ms
    ORDER BY user_label, bucket_ms
    """,
)
def promql_delta_idelta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """delta() and idelta() per series over 1-day buckets (D7): full-bucket
    and last-two-sample gauges."""
    eng = _engine(spark, sf_dir)
    sel = _series_with_labels(eng.select_series("view"))
    d = promql.delta(sel, ["user_label", "cohort"], DAY_MS)
    i = promql.idelta(sel, ["user_label", "cohort"], DAY_MS)
    out = d.join(i, ["user_label", "cohort", "bucket_ms"], "inner")
    return out.select(
        "user_label",
        "cohort",
        "bucket_ms",
        F.round("delta", 6).alias("delta"),
        F.round("idelta", 6).alias("idelta"),
    ).orderBy("user_label", "bucket_ms")


# ---------------------------------------------------------------------- B1 e2e
@register(
    "remote_write_ingest",
    oracle=_DEDUP_CTE
    + """
    SELECT name AS metric_name, count(*) AS n_samples,
           round(CAST(sum(CAST(value AS DECIMAL(30,10))) AS DOUBLE), 6) AS sum_value,
           count(DISTINCT user_label) AS n_series
    FROM samples GROUP BY name ORDER BY metric_name
    """,
)
def remote_write_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B1 end-to-end: events re-encoded as Prometheus remote-write protobuf
    payloads (one WriteRequest per user partition, encoded INSIDE the
    executors via applyInPandas — no driver collect anywhere in the path),
    decoded distributed via the wire codec (mapInPandas), run through id
    population + D10 dedup, and aggregated — the full ingest pipeline of
    SURVEY.md §3.4 with the batch table as oracle."""
    from horaedb_spark.metric.ingest import decode_payloads, encode_write_request

    key = f"rw:{sf_dir}"
    if key not in _ENGINES:
        import pandas as pd

        ev = events_ms(spark, sf_dir)

        def _encode_part(pdf):
            pdf = pdf.sort_values("event_id")
            series = [
                {
                    "name": et,
                    "labels": {
                        "user": str(uid),
                        "cohort": str(uid % 10),
                        "eid": str(eid),
                    },
                    "samples": [(val, int(ts))],
                }
                for uid, et, ts, val, eid in zip(
                    pdf["user_id"], pdf["event_type"], pdf["ts_ms"],
                    pdf["value"], pdf["event_id"],
                )
            ]
            return pd.DataFrame(
                {"payload": [encode_write_request(series)],
                 "seq": [int(pdf["part"].iloc[0])]}
            )

        pdf = (
            ev.select("user_id", "event_type", "ts_ms", "value", "event_id")
            .withColumn("part", F.col("user_id") % 8)
            .groupBy("part")
            .applyInPandas(_encode_part, "payload binary, seq long")
        )
        decoded = decode_payloads(pdf)
        # eid rides as a label only to carry the D10 sequence; lift it out
        samples = decoded.select(
            "name",
            F.map_filter("labels", lambda k, _v: k != "eid").alias("labels"),
            "ts_ms",
            "value",
            F.element_at("labels", "eid").cast("long").alias("seq"),
        )
        _ENGINES[key] = MetricEngine(samples)
    eng = _ENGINES[key]
    data_with_labels = _series_with_labels(
        eng.data.join(F.broadcast(eng.series.select("tsid", "series_key")), "tsid")
    )
    named = data_with_labels.join(
        F.broadcast(eng.metrics.select("metric_id", "metric_name").distinct()), "metric_id"
    )
    return (
        named.groupBy("metric_name")
        .agg(
            F.count("*").alias("n_samples"),
            F.round(
                F.sum(F.col("value").cast("decimal(30,10)")).cast("double"), 6
            ).alias("sum_value"),
            F.countDistinct("user_label").alias("n_series"),
        )
        .orderBy("metric_name")
    )


# ---------------------------------------------------------------------- D7 *_over_time family
@register(
    "promql_over_time",
    oracle=_DEDUP_CTE
    + f"""
    SELECT user_label, cohort, bucket_ms,
           round(CAST(sum(CAST(value AS DECIMAL(30,10))) AS DOUBLE)
                 / count(value), 6) AS avg_over_time,
           round(min(value), 6) AS min_over_time,
           round(max(value), 6) AS max_over_time,
           round(CAST(sum(CAST(value AS DECIMAL(30,10))) AS DOUBLE), 6)
               AS sum_over_time,
           count(value) AS count_over_time
    FROM (SELECT user_label, cohort, ts_ms - ts_ms % {7 * DAY_MS} AS bucket_ms,
                 value
          FROM samples WHERE name = 'view')
    GROUP BY 1, 2, 3
    ORDER BY user_label, cohort, bucket_ms
    """,
)
def promql_over_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """avg/min/max/sum/count_over_time per series over 7-day steps (D7): the
    whole range-function family in one decimal-routed hash aggregate."""
    eng = _engine(spark, sf_dir)
    sel = _series_with_labels(eng.select_series("view"))
    out = promql.over_time(sel, ["user_label", "cohort"], 7 * DAY_MS)
    return out.select(
        "user_label",
        "cohort",
        "bucket_ms",
        F.round("avg_over_time", 6).alias("avg_over_time"),
        F.round("min_over_time", 6).alias("min_over_time"),
        F.round("max_over_time", 6).alias("max_over_time"),
        F.round("sum_over_time", 6).alias("sum_over_time"),
        "count_over_time",
    ).orderBy("user_label", "cohort", "bucket_ms")


# ---------------------------------------------------------------------- D6 topk
@register(
    "promql_topk",
    oracle=_DEDUP_CTE
    + f"""
    SELECT cohort, bucket_ms, user_label, series_sum, topk_rank FROM (
      SELECT cohort, bucket_ms, user_label, series_sum,
             row_number() OVER (PARTITION BY cohort, bucket_ms
                                ORDER BY series_sum DESC, user_label) AS topk_rank
      FROM (
        SELECT cohort, ts_ms - ts_ms % {30 * DAY_MS} AS bucket_ms, user_label,
               round(CAST(sum(CAST(value AS DECIMAL(30,10))) AS DOUBLE), 6)
                   AS series_sum
        FROM samples WHERE name = 'purchase'
        GROUP BY 1, 2, 3
      )
    ) WHERE topk_rank <= 3
    ORDER BY cohort, bucket_ms, topk_rank
    """,
)
def promql_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL topk(3, sum by (user) (purchase)) per cohort per 30-day step:
    decimal-exact series sums ranked inside each label group. Rounding happens
    BEFORE ranking on both sides so the sort keys are identical doubles."""
    eng = _engine(spark, sf_dir)
    sel = _series_with_labels(eng.select_series("purchase"))
    b = sel.withColumn("bucket_ms", promql.time_bucket(F.col("ts_ms"), 30 * DAY_MS))
    summed = b.groupBy("cohort", "bucket_ms", "user_label").agg(
        F.round(
            F.sum(F.col("value").cast("decimal(30,10)")).cast("double"), 6
        ).alias("series_sum")
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("cohort", "bucket_ms").orderBy(
        F.desc("series_sum"), F.asc("user_label")
    )
    return (
        summed.withColumn("topk_rank", F.row_number().over(w))
        .filter(F.col("topk_rank") <= 3)
        .select("cohort", "bucket_ms", "user_label", "series_sum", "topk_rank")
        .orderBy("cohort", "bucket_ms", "topk_rank")
    )


# ------------------------------------------------------------------ D6 bottomk
@register(
    "promql_bottomk",
    oracle=_DEDUP_CTE
    + f"""
    SELECT cohort, bucket_ms, user_label, series_sum, bottomk_rank FROM (
      SELECT cohort, bucket_ms, user_label, series_sum,
             row_number() OVER (PARTITION BY cohort, bucket_ms
                                ORDER BY series_sum ASC, user_label) AS bottomk_rank
      FROM (
        SELECT cohort, ts_ms - ts_ms % {30 * DAY_MS} AS bucket_ms, user_label,
               round(CAST(sum(CAST(value AS DECIMAL(30,10))) AS DOUBLE), 6)
                   AS series_sum
        FROM samples WHERE name = 'purchase'
        GROUP BY 1, 2, 3
      )
    ) WHERE bottomk_rank <= 3
    ORDER BY cohort, bucket_ms, bottomk_rank
    """,
)
def promql_bottomk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL bottomk(3, sum by (user) (purchase)) per cohort per 30-day
    step — the ascending mirror of promql_topk (functions/promql.py
    topk_series(largest=False)). Rounding happens BEFORE ranking on both
    sides so the sort keys are identical doubles."""
    eng = _engine(spark, sf_dir)
    sel = _series_with_labels(eng.select_series("purchase"))
    b = sel.withColumn("bucket_ms", promql.time_bucket(F.col("ts_ms"), 30 * DAY_MS))
    summed = b.groupBy("cohort", "bucket_ms", "user_label").agg(
        F.round(
            F.sum(F.col("value").cast("decimal(30,10)")).cast("double"), 6
        ).alias("series_sum")
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("cohort", "bucket_ms").orderBy(
        F.asc("series_sum"), F.asc("user_label")
    )
    return (
        summed.withColumn("bottomk_rank", F.row_number().over(w))
        .filter(F.col("bottomk_rank") <= 3)
        .select("cohort", "bucket_ms", "user_label", "series_sum", "bottomk_rank")
        .orderBy("cohort", "bucket_ms", "bottomk_rank")
    )


# ---------------------------------------------------------------------- D7 histogram_quantile
_HQ_BOUNDS = (10.0, 50.0, 100.0, 250.0)


@register(
    "promql_histogram_quantile",
    oracle=_DEDUP_CTE
    + f"""
    , buckets AS (
      SELECT name, 10.0 AS le, count(*) FILTER (WHERE value <= 10) AS bucket_count
      FROM samples GROUP BY name
      UNION ALL
      SELECT name, 50.0, count(*) FILTER (WHERE value <= 50) FROM samples GROUP BY name
      UNION ALL
      SELECT name, 100.0, count(*) FILTER (WHERE value <= 100) FROM samples GROUP BY name
      UNION ALL
      SELECT name, 250.0, count(*) FILTER (WHERE value <= 250) FROM samples GROUP BY name
      UNION ALL
      SELECT name, CAST('inf' AS DOUBLE), count(*) FROM samples GROUP BY name
    ), en AS (
      SELECT name, le, bucket_count,
             coalesce(lag(bucket_count) OVER w, 0) AS prev_count,
             coalesce(lag(le) OVER w, 0.0) AS prev_le,
             max(bucket_count) OVER (PARTITION BY name) AS total,
             max(CASE WHEN le != CAST('inf' AS DOUBLE) THEN le END)
                 OVER (PARTITION BY name) AS max_finite_le
      FROM buckets WINDOW w AS (PARTITION BY name ORDER BY le)
    ), hit AS (
      SELECT *, CAST(0.9 AS DOUBLE) * total AS rank_target,
             row_number() OVER (PARTITION BY name ORDER BY le) AS rn
      FROM en WHERE bucket_count >= CAST(0.9 AS DOUBLE) * total AND total > 0
    )
    SELECT name,
           floor((CASE WHEN le = CAST('inf' AS DOUBLE) THEN max_finite_le
                       WHEN bucket_count = prev_count THEN le
                       ELSE prev_le + (le - prev_le) * (rank_target - prev_count)
                            / (bucket_count - prev_count) END) * 1000000 + 0.5)
               / 1000000 AS quantile_value
    FROM hit WHERE rn = 1 ORDER BY name
    """,
)
def promql_histogram_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """histogram_quantile(0.9) over engine-built cumulative buckets per metric
    name — the RFC's own flagship query shape (le-bucketed aggregation,
    20220702:84-99). Bucket build is one conditional-count aggregate; the
    quantile interpolation is the PromQL rule."""
    eng = _engine(spark, sf_dir)
    sel = eng.select_all_series()
    buckets = promql.histogram_buckets(sel, ["name"], "value", list(_HQ_BOUNDS))
    out = promql.histogram_quantile(buckets, ["name"], 0.9)
    # floor(x*1e6+0.5)/1e6, not round(): round() implementations disagree
    # between engines when the value sits exactly on a half boundary
    return out.select(
        "name",
        (F.floor(F.col("quantile_value") * 1000000 + 0.5) / 1000000).alias(
            "quantile_value"
        ),
    ).orderBy("name")


# ---------------------------------------------------------------------- D8 instant-vector steps
@register(
    "promql_instant_vector",
    oracle=_DEDUP_CTE
    + f"""
    , clicks AS (
      SELECT user_label, cohort, ts_ms, value FROM samples WHERE name = 'click'
    ), bounds AS (
      SELECT ((min(ts_ms) + {7 * DAY_MS - 1}) // {7 * DAY_MS}) * {7 * DAY_MS} AS lo,
             (max(ts_ms) // {7 * DAY_MS}) * {7 * DAY_MS} AS hi
      FROM clicks
    ), steps AS (
      SELECT unnest(generate_series(lo, hi, {7 * DAY_MS})) AS step_ms FROM bounds
    ), anchors AS (
      SELECT user_label, cohort, step_ms
      FROM (SELECT DISTINCT user_label, cohort FROM clicks) CROSS JOIN steps
    )
    SELECT user_label, cohort, step_ms, value FROM (
      SELECT a.user_label, a.cohort, a.step_ms, s.value,
             row_number() OVER (PARTITION BY a.user_label, a.cohort, a.step_ms
                                ORDER BY s.ts_ms DESC) AS rn
      FROM anchors a
      JOIN clicks s
        ON a.user_label = s.user_label AND a.cohort = s.cohort
       AND s.ts_ms <= a.step_ms AND s.ts_ms > a.step_ms - {3 * DAY_MS}
    ) WHERE rn = 1
    ORDER BY user_label, cohort, step_ms
    """,
)
def promql_instant_vector(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Instant-vector step evaluation with staleness (D8): at each 7-day
    aligned step, each 'click' series reports its latest sample within a
    3-day lookback — PromQL's evaluation model. Union+window as-of (one
    shuffle on the series key); the oracle is DuckDB's ASOF JOIN."""
    eng = _engine(spark, sf_dir)
    sel = _series_with_labels(eng.select_series("click"))
    out = promql.instant_vector(
        sel.select("user_label", "cohort", "ts_ms", "value"),
        ["user_label", "cohort"],
        7 * DAY_MS,
        3 * DAY_MS,
    )
    return out.orderBy("user_label", "cohort", "step_ms")


# ---------------------------------------------------------------------- D7 resets/changes
@register(
    "promql_resets_changes",
    oracle=_DEDUP_CTE
    + f"""
    SELECT user_label, cohort, bucket_ms, resets, changes FROM (
      SELECT user_label, cohort, bucket_ms,
             count(*) FILTER (WHERE value < prev) AS resets,
             count(*) FILTER (WHERE value != prev) AS changes,
             count(*) AS n
      FROM (
        SELECT user_label, cohort, ts_ms - ts_ms % {DAY_MS} AS bucket_ms, value,
               lag(value) OVER (PARTITION BY user_label, cohort,
                                ts_ms - ts_ms % {DAY_MS} ORDER BY ts_ms) AS prev
        FROM samples WHERE name = 'click'
      ) GROUP BY 1, 2, 3
    ) WHERE n >= 2
    ORDER BY user_label, cohort, bucket_ms
    """,
)
def promql_resets_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """resets() and changes() per series over 1-day buckets (D7): counter
    drops and value transitions between consecutive samples, one window + one
    hash aggregate."""
    eng = _engine(spark, sf_dir)
    sel = _series_with_labels(eng.select_series("click"))
    out = promql.transition_counts(sel, ["user_label", "cohort"], DAY_MS)
    return out.orderBy("user_label", "cohort", "bucket_ms")


# ---------------------------------------------------------------------- D7 quantile/stddev over time
@register(
    "promql_quantile_stddev",
    oracle=_DEDUP_CTE
    + f"""
    , qz AS (
      SELECT user_label, cohort, ts_ms - ts_ms % {7 * DAY_MS} AS bucket_ms, value,
             CAST(floor(value * 1000 + 0.5) AS BIGINT) AS q
      FROM samples WHERE name = 'error'
    ), s AS (
      SELECT user_label, cohort, bucket_ms,
             quantile_cont(value, 0.9) AS p90,
             sum(q) AS sq, sum(q * q) AS sq2, count(*) AS n
      FROM qz GROUP BY 1, 2, 3
    )
    SELECT user_label, cohort, bucket_ms,
           floor(p90 * 1000000 + 0.5) / 1000000 AS p90,
           floor((CAST(n * sq2 - sq * sq AS DOUBLE) / (n * n) / 1000000.0)
                 * 1000000 + 0.5) / 1000000 AS stdvar,
           floor(sqrt(CAST(n * sq2 - sq * sq AS DOUBLE) / (n * n) / 1000000.0)
                 * 1000000 + 0.5) / 1000000 AS stddev
    FROM s
    ORDER BY user_label, cohort, bucket_ms
    """,
)
def promql_quantile_stddev(spark: SparkSession, sf_dir: str) -> DataFrame:
    """quantile_over_time(0.9) + stddev/stdvar_over_time per series over
    7-day buckets (D7): exact interpolated percentile (Spark percentile ==
    DuckDB quantile_cont) and quantized-integer population variance —
    order-independent on both engines."""
    eng = _engine(spark, sf_dir)
    sel = _series_with_labels(eng.select_series("error"))
    keys = ["user_label", "cohort"]
    qt = promql.quantile_over_time(sel, keys, 7 * DAY_MS, 0.9)
    sd = promql.stddev_over_time(sel, keys, 7 * DAY_MS)
    out = qt.join(sd, [*keys, "bucket_ms"], "inner")
    r6 = lambda c: (F.floor(F.col(c) * 1000000 + 0.5) / 1000000)
    return out.select(
        *keys,
        "bucket_ms",
        r6("quantile_over_time").alias("p90"),
        r6("stdvar_over_time").alias("stdvar"),
        r6("stddev_over_time").alias("stddev"),
    ).orderBy("user_label", "cohort", "bucket_ms")


# ---------------------------------------------------------------------- D7 label_replace/label_join
@register(
    "metric_label_replace_join",
    oracle=_DEDUP_CTE
    + """
    SELECT CASE WHEN regexp_matches(cohort, '^(?:[0-4])$')
                THEN 'low-' || cohort ELSE 'other' END AS tier,
           count(*) AS n_samples,
           count(DISTINCT user_label || '-' || cohort) AS n_series,
           round(CAST(sum(CAST(value AS DECIMAL(30,10))) AS DOUBLE), 6) AS sum_value
    FROM samples WHERE name = 'view'
    GROUP BY 1 ORDER BY tier
    """,
)
def metric_label_replace_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """label_replace() + label_join() relabeling: cohorts 0-4 gain a
    tier='low-$1' label (capture-group expansion), every series gains
    uc=user-cohort, and the stream re-aggregates by the new label — all
    row-local map expressions, no extra shuffle beyond the final aggregate."""
    eng = _engine(spark, sf_dir)
    sel = _series_with_labels(eng.select_series("view")).withColumn(
        "labels",
        F.create_map(
            F.lit("cohort"), F.col("cohort"), F.lit("user"), F.col("user_label")
        ),
    )
    relabeled = promql.label_replace(sel, "tier", "low-$1", "cohort", "([0-4])")
    relabeled = promql.label_join(relabeled, "uc", "-", ["user", "cohort"])
    return (
        relabeled.withColumn(
            "tier", F.coalesce(F.element_at("labels", F.lit("tier")), F.lit("other"))
        )
        .groupBy("tier")
        .agg(
            F.count("*").alias("n_samples"),
            F.countDistinct(F.element_at("labels", F.lit("uc"))).alias("n_series"),
            F.round(
                F.sum(F.col("value").cast("decimal(30,10)")).cast("double"), 6
            ).alias("sum_value"),
        )
        .orderBy("tier")
    )


# ---------------------------------------------------------------------- D6 vector binop
@register(
    "promql_vector_ratio",
    oracle=_DEDUP_CTE
    + f"""
    , e AS (
      SELECT cohort, ts_ms - ts_ms % {7 * DAY_MS} AS bucket_ms,
             CAST(sum(CAST(value AS DECIMAL(30,10))) AS DOUBLE) AS ev
      FROM samples WHERE name = 'error' GROUP BY 1, 2
    ), c AS (
      SELECT cohort, ts_ms - ts_ms % {7 * DAY_MS} AS bucket_ms,
             CAST(sum(CAST(value AS DECIMAL(30,10))) AS DOUBLE) AS cv
      FROM samples WHERE name = 'click' GROUP BY 1, 2
    )
    SELECT e.cohort, e.bucket_ms,
           floor((ev / cv) * 1000000 + 0.5) / 1000000 AS error_ratio,
           CASE WHEN ev > CAST(0.5 AS DOUBLE) * cv
                THEN CAST(1.0 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END AS breach
    FROM e JOIN c ON e.cohort = c.cohort AND e.bucket_ms = c.bucket_ms
    ORDER BY e.cohort, e.bucket_ms
    """,
)
def promql_vector_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary operation between two vectors with label matching — PromQL's
    ``sum by (cohort) (error) / on (cohort) sum by (cohort) (click)`` error
    ratio per 7-day bucket, plus an ``error > bool 0.5 * click`` breach flag
    (scalar-scaled vector compared in bool mode). Two hash aggregates + two
    equi-joins on the matching labels."""
    eng = _engine(spark, sf_dir)
    keys = ["cohort", "bucket_ms"]
    vecs = {}
    for metric in ("error", "click"):
        sel = _series_with_labels(eng.select_series(metric))
        vecs[metric] = promql.aggregate_by(sel, ["cohort"], 7 * DAY_MS, {"value": "sum"})
    ratio = promql.vector_binop(vecs["error"], vecs["click"], "/", keys)
    threshold = vecs["click"].withColumn("value", F.lit(0.5) * F.col("value"))
    breach = promql.vector_binop(
        vecs["error"], threshold, ">", keys, bool_mode=True, out_col="breach"
    )
    out = ratio.join(breach, keys, "inner")
    return out.select(
        "cohort",
        "bucket_ms",
        (F.floor(F.col("value") * 1000000 + 0.5) / 1000000).alias("error_ratio"),
        "breach",
    ).orderBy("cohort", "bucket_ms")
@register(
    "metric_label_names",
    oracle=_DEDUP_CTE
    + """
    SELECT name AS metric_name, tag_key FROM (
      SELECT DISTINCT name, 'cohort' AS tag_key FROM samples
      UNION
      SELECT DISTINCT name, 'user' FROM samples
    ) ORDER BY metric_name, tag_key
    """,
)
def metric_label_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """label_names() metadata query (Prometheus /api/v1/labels): distinct
    tag keys per metric, answered from the inverted index without touching
    the data table."""
    eng = _engine(spark, sf_dir)
    return (
        eng.index.select("metric_id", "tag_key")
        .distinct()
        .join(F.broadcast(eng.metrics.select("metric_id", "metric_name").distinct()), "metric_id")
        .select("metric_name", "tag_key")
        .orderBy("metric_name", "tag_key")
    )


# ---------------------------------------------------------------------- D3 series listing
@register(
    "metric_series_list",
    oracle=_DEDUP_CTE
    + """
    SELECT DISTINCT name AS metric_name,
           'cohort=' || cohort || ',user=' || user_label AS series_key
    FROM samples WHERE name = 'error' AND cohort = '7'
    ORDER BY series_key
    """,
)
def metric_series_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    """series() metadata query (Prometheus /api/v1/series): the label sets of
    all series matching {cohort="7"} on metric 'error' — matcher resolution
    against the index joined to the series table, no data scan."""
    eng = _engine(spark, sf_dir)
    tsids = eng.resolve_tsids("error", [Matcher("cohort", "=", "7")])
    mid = F.xxhash64(F.lit("error"))
    return (
        eng.series.filter(F.col("metric_id") == mid)
        .join(F.broadcast(tsids), "tsid", "left_semi")
        .join(F.broadcast(eng.metrics.select("metric_id", "metric_name").distinct()), "metric_id")
        .select("metric_name", "series_key")
        .distinct()
        .orderBy("series_key")
    )


# ---------------------------------------------------------------------- D8 linear gap-fill
@register(
    "promql_gap_fill",
    oracle=_DEDUP_CTE
    + f"""
    , sig AS (
      SELECT user_label, cohort, ts_ms, value FROM samples WHERE name = 'signup'
    ), bounds AS (
      SELECT ((min(ts_ms) + {7 * DAY_MS - 1}) // {7 * DAY_MS}) * {7 * DAY_MS} AS lo,
             (max(ts_ms) // {7 * DAY_MS}) * {7 * DAY_MS} AS hi
      FROM sig
    ), steps AS (
      SELECT unnest(generate_series(lo, hi, {7 * DAY_MS})) AS step_ms FROM bounds
    ), u AS (
      SELECT user_label, cohort, ts_ms, value, 0 AS is_anchor,
             CAST(NULL AS BIGINT) AS step_ms
      FROM sig
      UNION ALL
      SELECT s.user_label, s.cohort, st.step_ms, CAST(NULL AS DOUBLE), 1, st.step_ms
      FROM (SELECT DISTINCT user_label, cohort FROM sig) s CROSS JOIN steps st
    ), w AS (
      SELECT *,
        last_value(value IGNORE NULLS) OVER bk AS prev_val,
        last_value(CASE WHEN is_anchor = 0 THEN ts_ms END IGNORE NULLS)
            OVER bk AS prev_ts,
        first_value(value IGNORE NULLS) OVER fw AS next_val,
        first_value(CASE WHEN is_anchor = 0 THEN ts_ms END IGNORE NULLS)
            OVER fw AS next_ts
      FROM u
      WINDOW
        bk AS (PARTITION BY user_label, cohort ORDER BY ts_ms, is_anchor
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        fw AS (PARTITION BY user_label, cohort ORDER BY ts_ms, is_anchor
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT user_label, cohort, step_ms,
           floor((prev_val + (next_val - prev_val)
                  * ((step_ms - prev_ts) / (next_ts - prev_ts))) * 1000000 + 0.5)
               / 1000000 AS value
    FROM w
    WHERE is_anchor = 1 AND prev_ts IS NOT NULL AND next_ts IS NOT NULL
      AND next_ts != prev_ts
    ORDER BY user_label, cohort, step_ms
    """,
)
def promql_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear gap-fill at 7-day steps over sparse 'signup' series (the
    Timescale `interpolate` / Influx `fill(linear)` operator): each interior
    step interpolates between its neighboring samples. Union+window form —
    one shuffle, no range join."""
    eng = _engine(spark, sf_dir)
    sel = _series_with_labels(eng.select_series("signup"))
    out = promql.fill_linear(
        sel.select("user_label", "cohort", "ts_ms", "value"),
        ["user_label", "cohort"],
        7 * DAY_MS,
    )
    return out.select(
        "user_label",
        "cohort",
        "step_ms",
        (F.floor(F.col("value") * 1000000 + 0.5) / 1000000).alias("value"),
    ).orderBy("user_label", "cohort", "step_ms")


# ---------------------------------------------------------------------- D7 deriv / predict_linear
@register(
    "promql_deriv_predict",
    oracle=_DEDUP_CTE
    + f"""
    , quant AS (
      SELECT user_label, cohort,
             ts_ms - ts_ms % {DAY_MS} AS bucket_ms,
             (xm - ((xm % 1000) + 1000) % 1000) // 1000 AS x,
             CAST(round(value * 1000) AS BIGINT) AS y
      FROM (
        SELECT *, ts_ms - (ts_ms - ts_ms % {DAY_MS} + {DAY_MS}) AS xm
        FROM samples WHERE name = 'click'
      )
    ), fit AS (
      SELECT user_label, cohort, bucket_ms, count(*) AS n,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * y) AS BIGINT) AS sxy,
             CAST(sum(x * x) AS BIGINT) AS sxx
      FROM quant GROUP BY 1, 2, 3
    )
    SELECT user_label, cohort, bucket_ms,
           round(CAST(n * sxy - sx * sy AS DOUBLE)
                 / CAST(n * sxx - sx * sx AS DOUBLE) / 1000.0, 6) + 0 AS deriv,
           round((sy - CAST(n * sxy - sx * sy AS DOUBLE)
                       / CAST(n * sxx - sx * sx AS DOUBLE) * sx) / n / 1000.0
                 + CAST(n * sxy - sx * sy AS DOUBLE)
                   / CAST(n * sxx - sx * sx AS DOUBLE) / 1000.0 * 3600.0, 6) + 0
               AS predicted
    FROM fit WHERE n >= 2 AND n * sxx - sx * sx <> 0
    ORDER BY user_label, cohort, bucket_ms
    """,
)
def promql_deriv_predict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """deriv() + predict_linear(1h) per series over 1-day buckets (D7):
    least-squares slope and 1-hour extrapolation from the same linear_fit
    kernel. Exact int64 regression sums (second-quantized x, milli-quantized
    y, every sum < 2^53) make the closed-form slope a fixed IEEE op sequence
    — bit-identical across engines and partitionings, unlike library
    regr_slope whose accumulation order varies."""
    eng = _engine(spark, sf_dir)
    sel = _series_with_labels(eng.select_series("click"))
    fit = promql.linear_fit(
        sel.select("user_label", "cohort", "ts_ms", "value"),
        ["user_label", "cohort"],
        DAY_MS,
    )
    return fit.select(
        "user_label",
        "cohort",
        "bucket_ms",
        F.round("slope_per_s", 6).alias("deriv"),
        F.round(
            F.col("intercept") + F.col("slope_per_s") * F.lit(3600.0), 6
        ).alias("predicted"),
    ).orderBy("user_label", "cohort", "bucket_ms")


# ---------------------------------------------------------------------- D7 clamp
@register(
    "promql_clamp",
    oracle=_DEDUP_CTE
    + """
    SELECT user_label, cohort, ts_ms,
           round(greatest(least(value, CAST(300 AS DOUBLE)),
                          CAST(50 AS DOUBLE)), 6) AS clamped,
           round(greatest(value, CAST(50 AS DOUBLE)), 6) AS clamped_min,
           round(least(value, CAST(300 AS DOUBLE)), 6) AS clamped_max
    FROM samples
    WHERE name = 'click' AND ts_ms < 1704672000000
    ORDER BY user_label, cohort, ts_ms
    """,
)
def promql_clamp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """clamp / clamp_min / clamp_max over one week of 'click' samples —
    pure row-local expressions on the selected vector (funcClamp*,
    prometheus/promql/functions.go)."""
    eng = _engine(spark, sf_dir)
    sel = _series_with_labels(
        eng.select_series("click", time_range=TimeRange(0, 1704672000000))
    )
    return sel.select(
        "user_label",
        "cohort",
        "ts_ms",
        F.round(promql.clamp("value", 50, 300), 6).alias("clamped"),
        F.round(promql.clamp("value", mn=50), 6).alias("clamped_min"),
        F.round(promql.clamp("value", mx=300), 6).alias("clamped_max"),
    ).orderBy("user_label", "cohort", "ts_ms")


# ---------------------------------------------------------------------- D6 count_values
@register(
    "promql_count_values",
    oracle=_DEDUP_CTE
    + f"""
    SELECT bucket_ms, value_bucket, count(*) AS n_samples
    FROM (SELECT ts_ms - ts_ms % {DAY_MS} AS bucket_ms,
                 CAST(floor(value / 50) * 50 AS BIGINT) AS value_bucket
          FROM samples WHERE name = 'click')
    GROUP BY 1, 2
    ORDER BY bucket_ms, value_bucket
    """,
)
def promql_count_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """count_values() per day bucket over 'click', values quantized to
    50-unit bins (PromQL stringifies exact values; doubles get binned the
    way integer-valued gauges group exactly). One map-side-combined hash
    aggregate."""
    eng = _engine(spark, sf_dir)
    sel = eng.select_series("click")
    vb = (F.floor(F.col("value") / F.lit(50)) * 50).cast("long")
    return (
        promql.count_values(sel, vb, DAY_MS)
        .orderBy("bucket_ms", "value_bucket")
    )


# ---------------------------------------------------------------------- D7 absent
@register(
    "promql_absent",
    oracle=_DEDUP_CTE
    + """
    , spine AS (
      SELECT unnest(generate_series(1704067200000, 1706659199999, 21600000))
        AS bucket_ms
    )
    SELECT s.bucket_ms, 1 AS absent
    FROM spine s
    WHERE NOT EXISTS (
      SELECT 1 FROM samples p
      WHERE p.name = 'purchase' AND p.user_label = '17'
        AND p.ts_ms - p.ts_ms % 21600000 = s.bucket_ms)
    ORDER BY s.bucket_ms
    """,
)
def promql_absent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """absent({name='purchase', user='17'}) over the month at 6 h steps:
    the sequence()-generated step spine anti-joined against present buckets
    — spine cost is O(steps), selection cost is the scan, at any scale."""
    eng = _engine(spark, sf_dir)
    sel = eng.select_series("purchase", [Matcher("user", "=", "17")])
    return promql.absent(
        sel, 1704067200000, 1706659200000, 21600000
    ).orderBy("bucket_ms")


# ---------------------------------------------------------------------- D7 holt_winters
@register(
    "promql_holt_winters",
    oracle="""
    WITH RECURSIVE samples AS (
      SELECT event_type AS name,
             CAST(user_id AS VARCHAR) AS user_label,
             CAST(user_id % 10 AS VARCHAR) AS cohort,
             ts_ms, value
      FROM (
        SELECT *, epoch_ms(ts) AS ts_ms,
               row_number() OVER (PARTITION BY event_type, user_id, epoch_ms(ts)
                                  ORDER BY event_id DESC) AS rn
        FROM events
      ) WHERE rn = 1
    ), arr AS (
      SELECT user_label, cohort, list(value ORDER BY ts_ms) AS vs
      FROM samples WHERE name = 'view' GROUP BY 1, 2
    ), rec AS (
      SELECT user_label, cohort, vs, len(vs) AS n, 1 AS i,
             CAST(0 AS DOUBLE) AS s0,
             CAST(vs[1] AS DOUBLE) AS s1,
             CAST(vs[2] - vs[1] AS DOUBLE) AS b
      FROM arr WHERE len(vs) >= 2
      UNION ALL
      SELECT user_label, cohort, vs, n, i + 1,
             s1 AS s0,
             CAST(0.5 AS DOUBLE) * vs[i + 1]
               + CAST(0.5 AS DOUBLE)
                 * (s1 + CASE WHEN i >= 2
                              THEN CAST(0.1 AS DOUBLE) * (s1 - s0)
                                   + CAST(0.9 AS DOUBLE) * b
                              ELSE b END) AS s1,
             CASE WHEN i >= 2
                  THEN CAST(0.1 AS DOUBLE) * (s1 - s0)
                       + CAST(0.9 AS DOUBLE) * b
                  ELSE b END AS b
      FROM rec WHERE i < n
    )
    SELECT user_label, cohort,
           floor(s1 * 1e6 + 0.5) / 1e6 AS smoothed
    FROM rec WHERE i = n
    ORDER BY user_label, cohort
    """,
)
def promql_holt_winters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """holt_winters(view[month], sf=0.5, tf=0.1) per series: the
    order-dependent double-exponential-smoothing fold runs JVM-side via
    array_sort(collect_list) + F.aggregate (no UDF). Identical fold order
    on both engines makes the IEEE double sequence bit-identical; the
    oracle replays it as a recursive CTE."""
    eng = _engine(spark, sf_dir)
    sel = _series_with_labels(eng.select_series("view"))
    out = promql.holt_winters(sel, ["user_label", "cohort"], sf=0.5, tf=0.1)
    return out.select(
        "user_label",
        "cohort",
        (F.floor(F.col("smoothed") * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6))
        .alias("smoothed"),
    ).orderBy("user_label", "cohort")


# ---------------------------------------------------------------------- D7 math fns
@register(
    "promql_math_functions",
    oracle=_DEDUP_CTE
    + """
    SELECT user_label, cohort, ts_ms,
           abs(value) AS abs_v,
           CAST(ceil(value) AS BIGINT) AS ceil_v,
           CAST(floor(value) AS BIGINT) AS floor_v,
           CAST(sign(value) AS BIGINT) AS sgn_v,
           floor(sqrt(abs(value)) * 1e6 + 0.5) / 1e6 AS sqrt_v,
           floor(ln(abs(value) + 1) * 1e6 + 0.5) / 1e6 AS ln_v,
           floor(log2(abs(value) + 1) * 1e6 + 0.5) / 1e6 AS log2_v,
           floor(value / 10 + 0.5) * 10 AS round_10
    FROM samples
    WHERE name = 'error' AND cohort = '1' AND ts_ms < 1704672000000
    ORDER BY user_label, ts_ms
    """,
)
def promql_math_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PromQL scalar math family (abs/ceil/floor/sgn/sqrt/ln/log2 +
    round-to-nearest-10) over one week of 'error' samples — all row-local
    JVM expressions (no UDF, no exchange beyond the selection itself).
    Float-valued functions use the engine-portable floor(x*1e6+0.5)/1e6
    rounding; integer-valued ones compare exactly."""
    eng = _engine(spark, sf_dir)
    sel = _series_with_labels(
        eng.select_series("error", [Matcher("cohort", "=", "1")],
                          TimeRange(0, 1704672000000))
    )

    def round6(c: F.Column) -> F.Column:
        return F.floor(c * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)

    v = F.col("value")
    return sel.select(
        "user_label",
        "cohort",
        "ts_ms",
        promql.math_fn(v, "abs").alias("abs_v"),
        promql.math_fn(v, "ceil").cast("long").alias("ceil_v"),
        promql.math_fn(v, "floor").cast("long").alias("floor_v"),
        promql.math_fn(v, "sgn").cast("long").alias("sgn_v"),
        round6(promql.math_fn(F.abs(v), "sqrt")).alias("sqrt_v"),
        round6(promql.math_fn(F.abs(v) + 1, "ln")).alias("ln_v"),
        round6(promql.math_fn(F.abs(v) + 1, "log2")).alias("log2_v"),
        promql.round_to(v, 10).alias("round_10"),
    ).orderBy("user_label", "ts_ms")


# ---------------------------------------------------------------------- D8 time fns
@register(
    "promql_time_functions",
    oracle=_DEDUP_CTE
    + """
    SELECT DISTINCT ts_ms,
           (ts_ms % 3600000) // 60000 AS minute,
           (ts_ms % 86400000) // 3600000 AS hour,
           ((ts_ms // 86400000) + 4) % 7 AS day_of_week,
           CAST(day(make_timestamp(ts_ms * 1000)) AS BIGINT) AS day_of_month,
           CAST(day(last_day(make_timestamp(ts_ms * 1000))) AS BIGINT)
             AS days_in_month,
           CAST(month(make_timestamp(ts_ms * 1000)) AS BIGINT) AS month,
           CAST(year(make_timestamp(ts_ms * 1000)) AS BIGINT) AS year
    FROM samples
    WHERE name = 'purchase' AND cohort = '2'
    ORDER BY ts_ms
    """,
)
def promql_time_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL time functions (minute/hour/day_of_week/day_of_month/
    days_in_month/month/year) over the distinct sample timestamps of one
    cohort — minute/hour/dow are pure epoch-ms integer arithmetic
    (Sunday=0 via the epoch-Thursday +4 shift), the calendar trio uses UTC
    date parts, matching Prometheus's UTC-only contract."""
    eng = _engine(spark, sf_dir)
    sel = eng.select_series("purchase", [Matcher("cohort", "=", "2")])
    tc = promql.time_components("ts_ms")
    return (
        sel.select("ts_ms").distinct()
        .select(
            "ts_ms",
            tc["minute"].alias("minute"),
            tc["hour"].alias("hour"),
            tc["day_of_week"].alias("day_of_week"),
            tc["day_of_month"].alias("day_of_month"),
            tc["days_in_month"].alias("days_in_month"),
            tc["month"].alias("month"),
            tc["year"].alias("year"),
        )
        .orderBy("ts_ms")
    )


# ---------------------------------------------------------------------- D7 offset
@register(
    "promql_offset_dod",
    oracle=_DEDUP_CTE
    + f"""
    , daily AS (
      SELECT cohort, ts_ms - ts_ms % {DAY_MS} AS bucket_ms,
             CAST(sum(CAST(value AS DECIMAL(30,10))) AS DOUBLE) AS sum_value
      FROM samples WHERE name = 'click' GROUP BY 1, 2
    )
    SELECT c.cohort, c.bucket_ms,
           floor(c.sum_value / p.sum_value * 1e6 + 0.5) / 1e6 AS dod_ratio
    FROM daily c JOIN daily p
      ON c.cohort = p.cohort AND p.bucket_ms = c.bucket_ms - {DAY_MS}
    ORDER BY c.cohort, c.bucket_ms
    """,
)
def promql_offset_dod(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PromQL ``offset`` modifier: day-over-day ratio
    ``sum by (cohort) (x) / sum by (cohort) (x offset 1d)`` — the offset
    vector's timestamps shift forward so a plain bucket equi-join pairs
    each day with its predecessor (no range join, one shuffle per side,
    decimal-routed sums)."""
    eng = _engine(spark, sf_dir)
    sel = _series_with_labels(eng.select_series("click"))
    daily = promql.aggregate_by(sel, ["cohort"], DAY_MS)
    ratio = promql.vector_binop(
        daily,
        promql.offset_by(daily, DAY_MS),
        "/",
        ["cohort", "bucket_ms"],
        l_value="sum_value",
        r_value="sum_value",
        out_col="ratio",
    )
    return ratio.select(
        "cohort",
        "bucket_ms",
        (F.floor(F.col("ratio") * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)).alias(
            "dod_ratio"
        ),
    ).orderBy("cohort", "bucket_ms")


# ---------------------------------------------------------------------- D7 subquery
@register(
    "promql_subquery_max_rate",
    oracle=_DEDUP_CTE
    + f"""
    , r AS (
      SELECT user_label, cohort, bucket_ms,
             round((v_last - v_first) / ((t_last - t_first) / 1000.0), 6) + 0
               AS rate_per_s
      FROM (
        SELECT user_label, cohort, ts_ms - ts_ms % {6 * HOUR_MS} AS bucket_ms,
               arg_max(value, ts_ms) AS v_last, arg_min(value, ts_ms) AS v_first,
               max(ts_ms) AS t_last, min(ts_ms) AS t_first, count(*) AS n
        FROM samples WHERE name = 'click'
        GROUP BY 1, 2, 3
      ) WHERE n >= 2 AND t_last > t_first
    )
    SELECT user_label, cohort, bucket_ms - bucket_ms % {DAY_MS} AS day_ms,
           max(rate_per_s) AS max_rate, count(*) AS n_windows
    FROM r GROUP BY 1, 2, 3
    ORDER BY user_label, cohort, day_ms
    """,
)
def promql_subquery_max_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL subquery composition ``max_over_time(rate(click[6h])[1d:6h])``:
    the inner range function materializes per-6h-bucket rates, the outer
    range function aggregates those results per day — function-over-function
    with NO re-scan of the raw samples (the inner vector feeds the outer
    aggregate directly, two hash aggregates total)."""
    eng = _engine(spark, sf_dir)
    sel = _series_with_labels(eng.select_series("click"))
    inner = promql.rate(sel, ["user_label", "cohort"], 6 * HOUR_MS)
    rounded = inner.select(
        "user_label",
        "cohort",
        "bucket_ms",
        F.round("rate_per_s", 6).alias("rate_per_s"),
    )
    return (
        rounded.groupBy(
            "user_label",
            "cohort",
            (F.col("bucket_ms") - F.pmod(F.col("bucket_ms"), F.lit(DAY_MS))).alias(
                "day_ms"
            ),
        )
        .agg(
            F.max("rate_per_s").alias("max_rate"),
            F.count(F.lit(1)).alias("n_windows"),
        )
        .orderBy("user_label", "cohort", "day_ms")
    )


# ------------------------------------------------------------- D6 stddev/quantile by
@register(
    "metric_agg_stddev_quantile",
    oracle=_DEDUP_CTE
    + f"""
    , q AS (
      SELECT cohort, ts_ms - ts_ms % {DAY_MS} AS bucket_ms, value,
             CAST(floor(value * 1000 + 0.5) AS BIGINT) AS qv
      FROM samples WHERE name = 'click'
    )
    SELECT cohort, bucket_ms,
           CAST((count(*) * sum(qv * qv) - sum(qv) * sum(qv)) AS DOUBLE)
             / (count(*) * count(*)) / 1e6 AS stdvar_v,
           sqrt(CAST((count(*) * sum(qv * qv) - sum(qv) * sum(qv)) AS DOUBLE)
                / (count(*) * count(*)) / 1e6) AS stddev_v,
           floor(quantile_cont(value, CAST(0.9 AS DOUBLE)) * 1e6 + 0.5) / 1e6
             AS p90
    FROM q GROUP BY 1, 2 ORDER BY cohort, bucket_ms
    """,
)
def metric_agg_stddev_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL's remaining by-label aggregators: ``stdvar/stddev/quantile(0.9)
    by (cohort)`` per day over 'click'. Variance runs on exact quantized-int
    sums (order-independent, engine-exact — same scheme as stddev_over_time);
    the quantile is Spark's exact percentile == DuckDB quantile_cont."""
    eng = _engine(spark, sf_dir)
    sel = _series_with_labels(eng.select_series("click"))
    agg = promql.aggregate_by(
        sel,
        ["cohort"],
        DAY_MS,
        {"stdvar_v": "stdvar", "stddev_v": "stddev", "p90": "quantile@0.9"},
    )
    return agg.select(
        "cohort",
        "bucket_ms",
        "stdvar_v",
        "stddev_v",
        (F.floor(F.col("p90") * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)).alias("p90"),
    ).orderBy("cohort", "bucket_ms")


# ---------------------------------------------------------------------- limitk / limit_ratio
@register(
    "promql_limitk_ratio",
    oracle=_DEDUP_CTE
    + f"""
    , summed AS (
      SELECT user_label, cohort, ts_ms - ts_ms % {DAY_MS} AS bucket_ms,
             CAST(sum(CAST(value AS DECIMAL(30,10))) AS DOUBLE) AS series_sum
      FROM samples WHERE name = 'click' GROUP BY 1, 2, 3
    ), ranked AS (
      SELECT *, row_number() OVER (
               PARTITION BY cohort, bucket_ms
               ORDER BY md5(user_label || cohort)) AS rk
      FROM summed
    )
    SELECT user_label, cohort, bucket_ms,
           round(series_sum, 6) AS series_sum, 'limitk' AS op
    FROM ranked WHERE rk <= 3
    UNION ALL
    SELECT user_label, cohort, bucket_ms,
           round(series_sum, 6) AS series_sum, 'limit_ratio' AS op
    FROM summed
    WHERE substr(md5(user_label || cohort), 1, 8) < '66666666'
    ORDER BY op, cohort, bucket_ms, user_label
    """,
)
def promql_limitk_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL 3.x sampling aggregators: ``limitk(3, ...)`` (md5-ordered
    deterministic pick, map-side WindowGroupLimit) and ``limit_ratio(0.4,
    ...)`` (md5-threshold — row-local, NO ranking shuffle at all) per
    cohort per day over 'click'. Both engine-portable because the
    arbitrary-but-stable order is md5, not internal hash order."""
    eng = _engine(spark, sf_dir)
    sel = _series_with_labels(eng.select_series("click"))
    series, by = ["user_label", "cohort"], ["cohort"]
    lk = promql.limitk_series(sel, series, by, DAY_MS, 3).withColumn(
        "op", F.lit("limitk")
    )
    lr = promql.limit_ratio_series(sel, series, by, DAY_MS, 0.4).withColumn(
        "op", F.lit("limit_ratio")
    )
    return (
        lk.unionByName(lr)
        .select(
            "user_label",
            "cohort",
            "bucket_ms",
            F.round("series_sum", 6).alias("series_sum"),
            "op",
        )
        .orderBy("op", "cohort", "bucket_ms", "user_label")
    )


# ---------------------------------------------------------------------- moving avg
@register(
    "promql_moving_avg",
    oracle=_DEDUP_CTE
    + f"""
    , pb AS (
      SELECT user_label, cohort, ts_ms - ts_ms % {DAY_MS} AS bucket_ms,
             sum(CAST(value AS DECIMAL(30,10))) AS s, count(*) AS n
      FROM samples WHERE name = 'purchase' GROUP BY 1, 2, 3
    )
    SELECT user_label, cohort, bucket_ms,
           round(CAST(sum(s) OVER w AS DOUBLE) / sum(n) OVER w, 6)
             AS moving_avg
    FROM pb
    WINDOW w AS (PARTITION BY user_label, cohort ORDER BY bucket_ms
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
    ORDER BY user_label, cohort, bucket_ms
    """,
)
def promql_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-bucket per-series moving average over daily buckets of 'purchase'
    (the smoothed dashboard line): bucket aggregate + a rows-bounded window
    per series — O(k) state per series, decimal-routed sums so the answer
    is partitioning-independent."""
    eng = _engine(spark, sf_dir)
    sel = _series_with_labels(eng.select_series("purchase"))
    ma = promql.moving_avg(sel, ["user_label", "cohort"], DAY_MS, 3)
    return ma.select(
        "user_label",
        "cohort",
        "bucket_ms",
        F.round("moving_avg", 6).alias("moving_avg"),
    ).orderBy("user_label", "cohort", "bucket_ms")


# ---------------------------------------------------------------------- anomaly
@register(
    "promql_zscore_anomalies",
    oracle=_DEDUP_CTE
    + """
    , q AS (
      SELECT user_label, cohort, ts_ms, value,
             CAST(floor(value * 1000 + 0.5) AS BIGINT) AS qv
      FROM samples WHERE name = 'error'
    ), stats AS (
      SELECT user_label, cohort, count(*) AS n, sum(qv) AS sq,
             sum(qv * qv) AS sq2
      FROM q GROUP BY 1, 2
    ), scored AS (
      SELECT q.user_label, q.cohort,
             (q.qv / 1000.0 - CAST(s.sq AS DOUBLE) / (s.n * 1000.0))
             / sqrt(CAST((s.n * s.sq2 - s.sq * s.sq) AS DOUBLE)
                    / (s.n * s.n) / 1e6) AS z
      FROM q JOIN stats s
        ON q.user_label = s.user_label AND q.cohort = s.cohort
      WHERE s.n >= 2
    )
    SELECT user_label, cohort, count(*) AS n_samples,
           CAST(count(*) FILTER (abs(z) > 2.0) AS BIGINT) AS n_anomalies
    FROM scored GROUP BY 1, 2 ORDER BY user_label, cohort
    """,
)
def promql_zscore_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-series z-score anomaly detection over 'error' samples: series
    mean/stddev from exact quantized-int sums (the DIVERGENCES #17 scheme,
    so z is a fixed IEEE expression over identical operands in any engine),
    flag |z| > 2. One aggregate for the per-series stats, one co-partitioned
    join back (AQE reuses the shuffle), one counting aggregate — the
    monitoring backend's outlier sweep."""
    eng = _engine(spark, sf_dir)
    sel = _series_with_labels(eng.select_series("error"))
    series = ["user_label", "cohort"]
    q = sel.withColumn(
        "qv", F.floor(F.col("value") * 1000 + F.lit(0.5)).cast("long")
    )
    stats = q.groupBy(*series).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("qv").alias("sq"),
        F.sum(F.col("qv") * F.col("qv")).alias("sq2"),
    )
    joined = q.join(stats, series).filter(F.col("n") >= 2)
    mean = F.col("sq").cast("double") / (F.col("n") * F.lit(1000.0))
    var = (
        (F.col("n") * F.col("sq2") - F.col("sq") * F.col("sq")).cast("double")
        / (F.col("n") * F.col("n"))
        / F.lit(1e6)
    )
    z = (F.col("qv") / F.lit(1000.0) - mean) / F.sqrt(var)
    return (
        joined.withColumn("z", z)
        .groupBy(*series)
        .agg(
            F.count(F.lit(1)).alias("n_samples"),
            F.count(F.when(F.abs(F.col("z")) > 2.0, 1)).alias("n_anomalies"),
        )
        .orderBy("user_label", "cohort")
    )


@register(
    "promql_edge_over_time",
    oracle=_DEDUP_CTE
    + f"""
    SELECT user_label, cohort, bucket_ms,
           round(arg_max(value, ts_ms), 6) AS last_over_time,
           round(arg_min(value, ts_ms), 6) AS first_over_time,
           1 AS present_over_time,
           max(ts_ms) AS last_ts_ms
    FROM (SELECT user_label, cohort, ts_ms - ts_ms % {7 * DAY_MS} AS bucket_ms,
                 ts_ms, value
          FROM samples WHERE name = 'signup')
    GROUP BY 1, 2, 3
    ORDER BY user_label, cohort, bucket_ms
    """,
)
def promql_edge_over_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """last/first/present_over_time per series over 7-day steps: the
    bucket-edge range functions as one max_by/min_by hash aggregate —
    no window, no sort, map-side partials at any scale."""
    eng = _engine(spark, sf_dir)
    sel = _series_with_labels(eng.select_series("signup"))
    out = promql.edge_over_time(sel, ["user_label", "cohort"], 7 * DAY_MS)
    return out.select(
        "user_label",
        "cohort",
        "bucket_ms",
        F.round("last_over_time", 6).alias("last_over_time"),
        F.round("first_over_time", 6).alias("first_over_time"),
        "present_over_time",
        "last_ts_ms",
    ).orderBy("user_label", "cohort", "bucket_ms")


@register(
    "promql_sliding_rate",
    oracle=_DEDUP_CTE
    + f"""
    , ex AS (
      SELECT user_label, cohort, ts_ms, value,
             ts_ms + ({DAY_MS} - ts_ms % {DAY_MS}) % {DAY_MS} + k * {DAY_MS}
               AS eval_ms
      FROM samples
      CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS k)
      WHERE name = 'click'
    )
    SELECT user_label, cohort, eval_ms,
           -- + 0 collapses IEEE -0.0 (DuckDB round keeps the sign bit;
           -- Spark's BigDecimal round does not — a tiny negative rate
           -- would otherwise hash as "-0.0" vs "0.0")
           round((arg_max(value, ts_ms) - arg_min(value, ts_ms))
                 / ((max(ts_ms) - min(ts_ms)) / 1000.0), 6) + 0 AS rate_per_s,
           count(*) AS n_samples
    FROM ex GROUP BY 1, 2, 3
    HAVING count(*) >= 2 AND max(ts_ms) > min(ts_ms)
    ORDER BY user_label, cohort, eval_ms
    """,
)
def promql_sliding_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rate(click[4d]) evaluated on a 1-day step grid — TRUE sliding
    range-vector semantics (overlapping windows), not the bucket-aligned
    special case. Each sample fans out to its <= 4 window memberships, then
    one hash aggregate per (series, T); no self-joins. Removes the
    range==step restriction documented in DIVERGENCES #11."""
    eng = _engine(spark, sf_dir)
    sel = _series_with_labels(eng.select_series("click"))
    out = promql.sliding_rate(
        sel, ["user_label", "cohort"], step_ms=DAY_MS, range_ms=4 * DAY_MS
    )
    return out.select(
        "user_label",
        "cohort",
        "eval_ms",
        F.round("rate_per_s", 6).alias("rate_per_s"),
        "n_samples",
    ).orderBy("user_label", "cohort", "eval_ms")


@register(
    "promql_sliding_increase",
    oracle=_DEDUP_CTE
    + f"""
    , ex AS (
      SELECT user_label, cohort, ts_ms,
             CAST(floor(value * 1000 + 0.5) AS BIGINT) AS vq,
             ts_ms + ({DAY_MS} - ts_ms % {DAY_MS}) % {DAY_MS} + k * {DAY_MS}
               AS eval_ms
      FROM samples
      CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS k)
      WHERE name = 'error'
    ), stepped AS (
      SELECT user_label, cohort, eval_ms, vq,
             lag(vq) OVER (PARTITION BY user_label, cohort, eval_ms
                           ORDER BY ts_ms) AS prev
      FROM ex
    )
    SELECT user_label, cohort, eval_ms,
           CAST(sum(CASE WHEN prev IS NULL THEN 0
                         WHEN vq >= prev THEN vq - prev
                         ELSE vq END) AS BIGINT) AS increase_milli,
           count(*) AS n_samples
    FROM stepped GROUP BY 1, 2, 3 HAVING count(*) >= 2
    ORDER BY user_label, cohort, eval_ms
    """,
)
def promql_sliding_increase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """increase(error[4d]) on a 1-day step grid: sliding-window
    counter-reset-aware increase with exact milli-unit arithmetic —
    overlapping windows each fold their own clamped-diff sum."""
    eng = _engine(spark, sf_dir)
    sel = _series_with_labels(eng.select_series("error"))
    out = promql.sliding_increase(
        sel, ["user_label", "cohort"], step_ms=DAY_MS, range_ms=4 * DAY_MS
    )
    return out.select(
        "user_label", "cohort", "eval_ms", "increase_milli", "n_samples"
    ).orderBy("user_label", "cohort", "eval_ms")


@register(
    "promql_sliding_over_time",
    oracle=_DEDUP_CTE
    + f"""
    , ex AS (
      SELECT user_label, cohort, ts_ms, value,
             ts_ms + ({DAY_MS} - ts_ms % {DAY_MS}) % {DAY_MS} + k * {DAY_MS}
               AS eval_ms
      FROM samples
      CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS k)
      WHERE name = 'view'
    )
    SELECT user_label, cohort, eval_ms,
           round(CAST(sum(CAST(value AS DECIMAL(30,10))) AS DOUBLE)
                 / count(value), 6) AS avg_over_time,
           round(min(value), 6) AS min_over_time,
           round(max(value), 6) AS max_over_time,
           round(CAST(sum(CAST(value AS DECIMAL(30,10))) AS DOUBLE), 6)
               AS sum_over_time,
           count(value) AS count_over_time
    FROM ex GROUP BY 1, 2, 3
    ORDER BY user_label, cohort, eval_ms
    """,
)
def promql_sliding_over_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """avg/min/max/sum/count_over_time(view[4d]) on a 1-day step grid:
    the whole sliding range-function family in one decimal-routed hash
    aggregate over the bounded window fan-out."""
    eng = _engine(spark, sf_dir)
    sel = _series_with_labels(eng.select_series("view"))
    out = promql.sliding_over_time(
        sel, ["user_label", "cohort"], step_ms=DAY_MS, range_ms=4 * DAY_MS
    )
    return out.select(
        "user_label",
        "cohort",
        "eval_ms",
        F.round("avg_over_time", 6).alias("avg_over_time"),
        F.round("min_over_time", 6).alias("min_over_time"),
        F.round("max_over_time", 6).alias("max_over_time"),
        F.round("sum_over_time", 6).alias("sum_over_time"),
        "count_over_time",
    ).orderBy("user_label", "cohort", "eval_ms")


@register(
    "promql_sliding_histogram_quantile",
    oracle=_DEDUP_CTE
    + f"""
    , ex AS (
      SELECT name, ts_ms, value,
             ts_ms + ({DAY_MS} - ts_ms % {DAY_MS}) % {DAY_MS} + k * {DAY_MS}
               AS eval_ms
      FROM samples
      CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS k)
    ), buckets AS (
      SELECT name, eval_ms, 10.0 AS le,
             count(*) FILTER (WHERE value <= 10) AS bucket_count
      FROM ex GROUP BY 1, 2
      UNION ALL
      SELECT name, eval_ms, 50.0, count(*) FILTER (WHERE value <= 50)
      FROM ex GROUP BY 1, 2
      UNION ALL
      SELECT name, eval_ms, 100.0, count(*) FILTER (WHERE value <= 100)
      FROM ex GROUP BY 1, 2
      UNION ALL
      SELECT name, eval_ms, 250.0, count(*) FILTER (WHERE value <= 250)
      FROM ex GROUP BY 1, 2
      UNION ALL
      SELECT name, eval_ms, CAST('inf' AS DOUBLE), count(*)
      FROM ex GROUP BY 1, 2
    ), en AS (
      SELECT name, eval_ms, le, bucket_count,
             coalesce(lag(bucket_count) OVER w, 0) AS prev_count,
             coalesce(lag(le) OVER w, 0.0) AS prev_le,
             max(bucket_count) OVER (PARTITION BY name, eval_ms) AS total,
             max(CASE WHEN le != CAST('inf' AS DOUBLE) THEN le END)
                 OVER (PARTITION BY name, eval_ms) AS max_finite_le
      FROM buckets WINDOW w AS (PARTITION BY name, eval_ms ORDER BY le)
    ), hit AS (
      SELECT *, CAST(0.9 AS DOUBLE) * total AS rank_target,
             row_number() OVER (PARTITION BY name, eval_ms ORDER BY le) AS rn
      FROM en WHERE bucket_count >= CAST(0.9 AS DOUBLE) * total AND total > 0
    )
    SELECT name, eval_ms,
           floor((CASE WHEN le = CAST('inf' AS DOUBLE) THEN max_finite_le
                       WHEN bucket_count = prev_count THEN le
                       ELSE prev_le + (le - prev_le) * (rank_target - prev_count)
                            / (bucket_count - prev_count) END) * 1000000 + 0.5)
               / 1000000 AS quantile_value
    FROM hit WHERE rn = 1 ORDER BY name, eval_ms
    """,
)
def promql_sliding_histogram_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """histogram_quantile(0.9, metric[4d]) on a 1-day step grid — THE
    canonical Prometheus latency query (p90 over a sliding window) with
    true overlapping range-vectors: bounded window fan-out -> one
    conditional-count bucket aggregate per (metric, T) -> the PromQL
    interpolation rule. Integer bucket counts make the quantile
    deterministic on any engine."""
    eng = _engine(spark, sf_dir)
    sel = eng.select_all_series()
    k = 4
    first_t = (
        F.col("ts_ms")
        + F.pmod(F.lit(DAY_MS) - F.pmod("ts_ms", F.lit(DAY_MS)), F.lit(DAY_MS))
    )
    ex = sel.withColumn(
        "eval_ms",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(k - 1)),
                lambda i: first_t + i * F.lit(DAY_MS),
            )
        ),
    )
    buckets = promql.histogram_buckets(
        ex, ["name", "eval_ms"], "value", list(_HQ_BOUNDS)
    )
    out = promql.histogram_quantile(buckets, ["name", "eval_ms"], 0.9)
    r6 = lambda c: (F.floor(F.col(c) * 1000000 + 0.5) / 1000000)
    return out.select(
        "name", "eval_ms", r6("quantile_value").alias("quantile_value")
    ).orderBy("name", "eval_ms")


# --------------------------------------------------------------- SRE burn rate
@register(
    "promql_slo_burn_rate",
    oracle=_DEDUP_CTE
    + f"""
    , agg AS (
      SELECT cohort,
             ts_ms - ts_ms % {6 * HOUR_MS} AS b6,
             ts_ms - ts_ms % {DAY_MS} AS b24,
             CASE WHEN name = 'error' THEN 1 ELSE 0 END AS is_err
      FROM samples
    ), short AS (
      SELECT cohort, b6, CAST(sum(is_err) AS DOUBLE) / count(*) AS r6
      FROM agg GROUP BY 1, 2
    ), long AS (
      SELECT cohort, b24, CAST(sum(is_err) AS DOUBLE) / count(*) AS r24
      FROM agg GROUP BY 1, 2
    )
    SELECT s.cohort, s.b6 AS bucket_ms,
           round(s.r6 / 0.2, 6) AS burn_short,
           round(l.r24 / 0.2, 6) AS burn_long,
           CAST(CASE WHEN s.r6 / 0.2 > 1 AND l.r24 / 0.2 > 1
                THEN 1 ELSE 0 END AS BIGINT) AS alert
    FROM short s
    JOIN long l ON l.cohort = s.cohort AND l.b24 = s.b6 - s.b6 % {DAY_MS}
    ORDER BY s.cohort, bucket_ms
    """,
)
def promql_slo_burn_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiwindow multi-burn-rate SLO alert (the canonical SRE error-budget
    query): per cohort, the 6h and 24h error-event ratios against a 20%
    error budget; alert fires only when BOTH windows burn above 1x — the
    short window gives responsiveness, the long window suppresses blips.
    Two bucketed counting aggregates over the deduped cross-metric scan and
    one short-to-containing-long-bucket equi-join; the alert comparison runs
    on the unrounded ratios (identical IEEE division in any engine)."""
    eng = _engine(spark, sf_dir)
    sel = _series_with_labels(
        eng.select_all_series().join(
            F.broadcast(eng.series.select("tsid", "series_key")), "tsid"
        )
    )
    b6 = F.col("ts_ms") - F.col("ts_ms") % (6 * HOUR_MS)
    b24 = F.col("ts_ms") - F.col("ts_ms") % DAY_MS
    agg = sel.select(
        "cohort",
        b6.alias("b6"),
        b24.alias("b24"),
        F.when(F.col("name") == "error", 1).otherwise(0).alias("is_err"),
    )
    short = agg.groupBy("cohort", "b6").agg(
        (F.sum("is_err").cast("double") / F.count("*")).alias("r6")
    )
    long_ = agg.groupBy("cohort", "b24").agg(
        (F.sum("is_err").cast("double") / F.count("*")).alias("r24")
    )
    joined = short.join(
        long_,
        (long_["cohort"] == short["cohort"])
        & (long_["b24"] == short["b6"] - short["b6"] % DAY_MS),
    )
    return joined.select(
        short["cohort"],
        short["b6"].alias("bucket_ms"),
        F.round(F.col("r6") / 0.2, 6).alias("burn_short"),
        F.round(F.col("r24") / 0.2, 6).alias("burn_long"),
        F.when((F.col("r6") / 0.2 > 1) & (F.col("r24") / 0.2 > 1), 1)
        .otherwise(0)
        .cast("long")
        .alias("alert"),
    ).orderBy("cohort", "bucket_ms")


# ---------------------------------------------------------------------- D7 histogram_fraction
@register(
    "promql_histogram_fraction",
    oracle=_DEDUP_CTE
    + """
    , buckets AS (
      SELECT name, 10.0 AS le, count(*) FILTER (WHERE value <= 10) AS bucket_count
      FROM samples GROUP BY name
      UNION ALL
      SELECT name, 50.0, count(*) FILTER (WHERE value <= 50) FROM samples GROUP BY name
      UNION ALL
      SELECT name, 100.0, count(*) FILTER (WHERE value <= 100) FROM samples GROUP BY name
      UNION ALL
      SELECT name, 250.0, count(*) FILTER (WHERE value <= 250) FROM samples GROUP BY name
      UNION ALL
      SELECT name, CAST('inf' AS DOUBLE), count(*) FROM samples GROUP BY name
    ), en AS (
      SELECT name, le, bucket_count,
             coalesce(lag(bucket_count) OVER w, 0) AS prev_count,
             coalesce(lag(le) OVER w, 0.0) AS prev_le,
             max(bucket_count) OVER (PARTITION BY name) AS total
      FROM buckets WINDOW w AS (PARTITION BY name ORDER BY le)
    ), ranks AS (
      SELECT name, max(total) AS total,
             max(CASE WHEN 25.0 > prev_le AND 25.0 <= le THEN
                   prev_count + (bucket_count - prev_count)
                     * (25.0 - prev_le) / (le - prev_le) END) AS rlo,
             max(CASE WHEN 150.0 > prev_le AND 150.0 <= le THEN
                   prev_count + (bucket_count - prev_count)
                     * (150.0 - prev_le) / (le - prev_le) END) AS rhi
      FROM en GROUP BY name
    )
    SELECT name,
           floor((coalesce(rhi, CAST(total AS DOUBLE)) - coalesce(rlo, 0.0))
                 / total * 1000000 + 0.5) / 1000000 AS fraction
    FROM ranks ORDER BY name
    """,
)
def promql_histogram_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """histogram_fraction(25, 150) per metric name over the same engine-built
    cumulative buckets as histogram_quantile — interpolated cumulative rank
    at both endpoints, one bucket-frame window pass + one aggregate
    (promql/quantile.go histogramFraction for classic histograms)."""
    eng = _engine(spark, sf_dir)
    sel = eng.select_all_series()
    buckets = promql.histogram_buckets(sel, ["name"], "value", list(_HQ_BOUNDS))
    out = promql.histogram_fraction(buckets, ["name"], 25.0, 150.0)
    return out.select(
        "name",
        (F.floor(F.col("fraction") * 1000000 + 0.5) / 1000000).alias("fraction"),
    ).orderBy("name")


# ---------------------------------------------------------------------- D7 absent_over_time
@register(
    "promql_absent_over_time",
    oracle=_DEDUP_CTE
    + f"""
    , present AS (
      SELECT DISTINCT ts_ms - ts_ms % {6 * HOUR_MS} AS b
      FROM samples WHERE name = 'purchase' AND user_label = '17'
    ), covered AS (
      SELECT DISTINCT b + i * {6 * HOUR_MS} AS eval_ms
      FROM present, (SELECT unnest(generate_series(1, 4)) AS i)
    ), spine AS (
      SELECT unnest(generate_series(1704067200000, 1706659199999, {6 * HOUR_MS}))
        AS eval_ms
    )
    SELECT s.eval_ms, 1 AS absent FROM spine s
    WHERE s.eval_ms NOT IN (SELECT eval_ms FROM covered)
    ORDER BY s.eval_ms
    """,
)
def promql_absent_over_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """absent_over_time({name='purchase', user='17'}[24h]) at 6 h steps over
    the month: presence buckets explode into the ≤4 eval steps covering them
    (bounded fan-out), the O(steps) spine anti-equi-joins — no nested-loop
    range join at any scale."""
    eng = _engine(spark, sf_dir)
    sel = eng.select_series("purchase", [Matcher("user", "=", "17")])
    return promql.absent_over_time(
        sel, 1704067200000, 1706659200000, 6 * HOUR_MS, DAY_MS
    ).orderBy("eval_ms")


# ---------------------------------------------------------------------- D7 mad_over_time
@register(
    "promql_mad_over_time",
    oracle=_DEDUP_CTE
    + f"""
    , views AS (
      SELECT user_label, cohort, ts_ms - ts_ms % {DAY_MS} AS bucket_ms, value
      FROM samples WHERE name = 'view'
    ), med AS (
      SELECT user_label, cohort, bucket_ms,
             quantile_cont(value, 0.5) AS m
      FROM views GROUP BY 1, 2, 3
    )
    SELECT v.user_label, v.cohort, v.bucket_ms,
           floor(quantile_cont(abs(v.value - med.m), 0.5) * 1000000 + 0.5)
               / 1000000 AS mad
    FROM views v
    JOIN med USING (user_label, cohort, bucket_ms)
    GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
    """,
)
def promql_mad_over_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mad_over_time(view[1d]) per series — exact interpolated medians
    (Spark percentile == DuckDB quantile_cont, identical IEEE midpoints),
    median table joined back co-partitioned: one shuffle of the samples."""
    eng = _engine(spark, sf_dir)
    sel = _series_with_labels(eng.select_series("view"))
    out = promql.mad_over_time(sel, ["user_label", "cohort"], DAY_MS)
    return out.select(
        "user_label",
        "cohort",
        "bucket_ms",
        (F.floor(F.col("mad_over_time") * 1000000 + 0.5) / 1000000).alias("mad"),
    ).orderBy("user_label", "cohort", "bucket_ms")


# ---------------------------------------------------------------------- D6 group / without
@register(
    "promql_group_without",
    oracle=_DEDUP_CTE
    + f"""
    SELECT cohort, ts_ms - ts_ms % {DAY_MS} AS bucket_ms,
           1 AS present, count(*) AS n_samples
    FROM samples WHERE name = 'click'
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def promql_group_without(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``group without(user) (click)`` per day bucket: the PromQL `group`
    aggregator (constant 1 per populated label group — the presence
    matrix), with `without` resolved to the complement label set (all
    labels minus user ⇒ cohort). One map-side-combined aggregate."""
    eng = _engine(spark, sf_dir)
    sel = _series_with_labels(eng.select_series("click"))
    out = promql.aggregate_by(
        sel, ["cohort"], DAY_MS, aggs={"present": "group", "n_samples": "count"}
    )
    return out.select("cohort", "bucket_ms", "present", "n_samples").orderBy(
        "cohort", "bucket_ms"
    )


# ---------------------------------------------------------------------- B-ext line protocol
@register(
    "ingest_line_protocol",
    oracle=_DEDUP_CTE
    + f"""
    SELECT name AS measurement, cohort,
           count(*) AS n_samples,
           round(CAST(sum(CAST(value AS DECIMAL(30,10))) AS DOUBLE), 6)
             AS sum_value,
           CAST(sum(ts_ms) AS BIGINT) AS ts_checksum
    FROM samples GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def ingest_line_protocol(spark: SparkSession, sf_dir: str) -> DataFrame:
    """InfluxDB line-protocol ingest (the second wire format TSDB clients
    speak, next to remote-write protobuf): events render to
    ``measurement,user=..,cohort=.. value=<v> <ts_ns>`` lines, then the
    parser recovers measurement/tags/field/timestamp with row-local
    regexp/cast expressions — whole-stage-codegen JVM ops, no Python in
    the pipeline. The oracle aggregates the ORIGINAL rows, so the
    encode→parse round trip must be lossless (Spark's shortest-roundtrip
    double rendering makes the value exact; nanosecond timestamps divide
    back to engine-native ms). D10 dedup applies after parsing, exactly as
    for the protobuf path."""
    ev = events_ms(spark, sf_dir)
    lines = ev.select(
        F.concat(
            F.col("event_type"),
            F.lit(",user="),
            F.col("user_id").cast("string"),
            F.lit(",cohort="),
            (F.col("user_id") % 10).cast("string"),
            F.lit(" value="),
            F.col("value").cast("string"),
            F.lit(" "),
            (F.col("ts_ms") * 1_000_000).cast("string"),
        ).alias("line"),
        F.col("event_id").alias("seq"),
    )
    parsed = lines.select(
        F.regexp_extract("line", r"^([^,]+),", 1).alias("measurement"),
        F.regexp_extract("line", r"user=([0-9]+)", 1).alias("user_label"),
        F.regexp_extract("line", r"cohort=([0-9]+)", 1).alias("cohort"),
        F.regexp_extract("line", r"value=([^ ]+)", 1).cast("double").alias("value"),
        # integer `div`, not `/`: double division of ~1e18 ns loses ulps
        # (same rule as the nanos loader in queries/tables.py)
        F.expr(
            "cast(regexp_extract(line, ' ([0-9]+)$', 1) AS BIGINT) div 1000000"
        ).alias("ts_ms"),
        "seq",
    )
    deduped = promql.dedup_samples(
        parsed, ["measurement", "user_label", "cohort"], "seq"
    )
    return (
        deduped.groupBy("measurement", "cohort")
        .agg(
            F.count(F.lit(1)).alias("n_samples"),
            F.round(
                F.sum(F.col("value").cast("decimal(30,10)")).cast("double"), 6
            ).alias("sum_value"),
            F.sum("ts_ms").cast("long").alias("ts_checksum"),
        )
        .orderBy("measurement", "cohort")
    )


# ------------------------------------------------------------------- B1 exemplars
@register(
    "remote_write_exemplars",
    oracle="""
    SELECT event_type AS metric_name,
           CAST(user_id % 10 AS VARCHAR) AS cohort,
           count(*) AS n_exemplars,
           count(DISTINCT 'tr-' || CAST(event_id AS VARCHAR)) AS n_traces,
           round(CAST(sum(CAST(value AS DECIMAL(30,10))) AS DOUBLE), 6)
             AS sum_value
    FROM events WHERE event_id % 5 = 0
    GROUP BY 1, 2 ORDER BY metric_name, cohort
    """,
)
def remote_write_exemplars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B1 exemplar path end-to-end, distributed on both sides: every fifth
    event carries an exemplar (trace back-reference) in its remote-write
    payload — encoded inside the executors via applyInPandas, decoded
    distributed via decode_exemplar_payloads (mapInPandas; the reference
    parses exemplars on the same pb_reader path as samples,
    pb_reader.rs:227-262) — then aggregated per metric and cohort. The
    exemplar stream is sparse by construction, exactly how Prometheus
    attaches trace ids to a sampled subset of observations."""
    import pandas as pd

    from horaedb_spark.metric.ingest import (
        decode_exemplar_payloads,
        encode_write_request,
    )

    ev = events_ms(spark, sf_dir)

    def _encode_part(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("event_id")
        series = [
            {
                "name": et,
                "labels": {"user": str(uid), "cohort": str(uid % 10)},
                "samples": [(val, int(ts))],
                "exemplars": (
                    [
                        {
                            "labels": {"trace_id": f"tr-{eid}"},
                            "value": val,
                            "ts_ms": int(ts),
                        }
                    ]
                    if eid % 5 == 0
                    else []
                ),
            }
            for uid, et, ts, val, eid in zip(
                pdf["user_id"], pdf["event_type"], pdf["ts_ms"],
                pdf["value"], pdf["event_id"],
            )
        ]
        return pd.DataFrame({"payload": [encode_write_request(series)]})

    payloads = (
        ev.select("user_id", "event_type", "ts_ms", "value", "event_id")
        .withColumn("part", F.col("user_id") % 8)
        .groupBy("part")
        .applyInPandas(_encode_part, "payload binary")
    )
    exemplars = decode_exemplar_payloads(payloads)
    return (
        exemplars.groupBy(
            F.col("name").alias("metric_name"),
            F.element_at("series_labels", "cohort").alias("cohort"),
        )
        .agg(
            F.count("*").alias("n_exemplars"),
            F.countDistinct(F.element_at("labels", "trace_id")).alias(
                "n_traces"
            ),
            F.round(
                F.sum(F.col("value").cast("decimal(30,10)")).cast("double"), 6
            ).alias("sum_value"),
        )
        .orderBy("metric_name", "cohort")
    )


# ------------------------------------------------------- multi-field metrics
_MF_ENGINES: dict[str, MetricEngine] = {}

# Field-split dedup CTE: the samples stream carries a FIELD dimension
# (RFC 20240827:106-113 metrics table; data-table FieldId at RFC:222-229) —
# D10 dedup keys on (metric, field, series, ts), so the same series can hold
# one row PER FIELD at one timestamp.
_MF_DEDUP_CTE = """
    WITH samples AS (
      SELECT event_type AS name,
             CASE WHEN event_id % 2 = 0 THEN 'sum' ELSE 'count' END AS field,
             CAST(user_id AS VARCHAR) AS user_label,
             CAST(user_id % 10 AS VARCHAR) AS cohort,
             ts_ms, value
      FROM (
        SELECT *, epoch_ms(ts) AS ts_ms,
               row_number() OVER (
                 PARTITION BY event_type,
                              CASE WHEN event_id % 2 = 0 THEN 'sum' ELSE 'count' END,
                              user_id, epoch_ms(ts)
                 ORDER BY event_id DESC) AS rn
        FROM events
      ) WHERE rn = 1
    )
"""


def _mf_engine(spark: SparkSession, sf_dir: str) -> MetricEngine:
    """Engine over a MULTI-FIELD samples stream: event names are suffixed
    into a Prometheus-style family (``click_sum`` / ``click_count``) and
    folded back into ONE metric with two fields by
    ``ingest.group_metric_families`` — the RFC metrics-table shape where a
    second field of a metric does not need a second metric name."""
    if sf_dir not in _MF_ENGINES:
        from horaedb_spark.metric.ingest import group_metric_families

        suffix = F.when(F.col("event_id") % 2 == 0, F.lit("sum")).otherwise(
            F.lit("count")
        )
        raw = events_to_samples(
            events_ms(spark, sf_dir),
            name=F.concat(F.col("event_type"), F.lit("_"), suffix),
        )
        _MF_ENGINES[sf_dir] = MetricEngine(group_metric_families(raw))
    return _MF_ENGINES[sf_dir]


@register(
    "metric_multi_field_select",
    oracle=_MF_DEDUP_CTE
    + """
    SELECT field, cohort, count(*) AS n_samples,
           round(sum(value), 2) + 0 AS sum_value
    FROM samples WHERE name = 'click'
    GROUP BY field, cohort
    ORDER BY field, cohort
    """,
)
def metric_multi_field_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two fields of ONE metric, independently selected and aggregated —
    the RFC multi-field metrics catalog end-to-end
    (docs/rfcs/20240827-metric-engine.md:106-113): family grouping at
    ingest (``click_sum``/``click_count`` -> metric ``click``, fields
    ``sum``/``count``), stable-hash FieldId on the data table
    (RFC:222-229), and a per-field literal field_id selection in
    ``select_series`` (no catalog join). The same series (user/cohort
    labels) holds both fields; dedup (D10) is per (field, series, ts)."""
    eng = _mf_engine(spark, sf_dir)
    parts = []
    for fld in ("sum", "count"):
        sel = _series_with_labels(
            eng.select_series("click", field=fld)
        )
        parts.append(
            sel.groupBy("cohort").agg(
                F.count(F.lit(1)).alias("n_samples"),
                F.round(F.sum("value"), 2).alias("sum_value"),
            ).select(F.lit(fld).alias("field"), "cohort", "n_samples", "sum_value")
        )
    return parts[0].unionByName(parts[1]).orderBy("field", "cohort")


@register(
    "metric_field_catalog",
    oracle="""
    SELECT DISTINCT event_type AS metric_name,
           CASE WHEN event_id % 2 = 0 THEN 'sum' ELSE 'count' END AS field_name,
           'f64' AS field_type
    FROM events
    ORDER BY metric_name, field_name
    """,
)
def metric_field_catalog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The metrics catalog itself (RFC:106-113): one row per
    (metric, field) with the field type derived from the value column —
    the catalog no longer hard-codes a single 'value' field row. Ids are
    engine-internal hashes (like metric_id/tsid everywhere else) so the
    oracle compares the portable columns."""
    return (
        _mf_engine(spark, sf_dir)
        .metrics.select("metric_name", "field_name", "field_type")
        .orderBy("metric_name", "field_name")
    )


@register(
    "remote_write_multi_field",
    oracle=_MF_DEDUP_CTE
    + """
    SELECT field, cohort, count(*) AS n_samples,
           round(sum(value), 2) + 0 AS sum_value
    FROM samples WHERE name = 'view'
    GROUP BY field, cohort
    ORDER BY field, cohort
    """,
)
def remote_write_multi_field(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B1 ingest -> RFC multi-field catalog, end to end over the WIRE:
    events re-encoded as remote-write payloads under family-suffixed names
    (``view_sum``/``view_count``) WITH MetricMetadata records carrying
    ``family_name`` (remote_write.proto MetricMetadata;
    docs/rfcs/20240827-metric-engine.md:106-113), decoded distributed,
    families resolved FROM THE DECODED METADATA (``decode_metadata``, one
    metadata-sized collect), folded into one metric with two fields
    (``group_metric_families``), and each field independently aggregated.
    The wire path, the metadata path and the catalog shape are all under
    the hash gate."""
    from horaedb_spark.metric.ingest import (
        decode_metadata,
        decode_payloads,
        encode_write_request,
        group_metric_families,
    )

    key = f"rwmf:{sf_dir}"
    if key not in _ENGINES:
        import pandas as pd

        ev = events_ms(spark, sf_dir)

        def _encode_part(pdf):
            pdf = pdf.sort_values("event_id")
            series = []
            fams = set()
            for uid, et, ts, val, eid in zip(
                pdf["user_id"], pdf["event_type"], pdf["ts_ms"],
                pdf["value"], pdf["event_id"],
            ):
                suffix = "sum" if eid % 2 == 0 else "count"
                fams.add((f"{et}_{suffix}", et))
                series.append(
                    {
                        "name": f"{et}_{suffix}",
                        "labels": {
                            "user": str(uid),
                            "cohort": str(uid % 10),
                            "eid": str(eid),
                        },
                        "samples": [(val, int(ts))],
                    }
                )
            # metadata is keyed by FAMILY (Prometheus semantics: one
            # MetricMetadata per family; members are derived by suffix)
            metadata = [
                {"type": "COUNTER", "family_name": fam, "help": "", "unit": ""}
                for fam in sorted({fam for _name, fam in fams})
            ]
            return pd.DataFrame(
                {"payload": [encode_write_request(series, metadata)],
                 "seq": [int(pdf["part"].iloc[0])]}
            )

        payloads = (
            ev.select("user_id", "event_type", "ts_ms", "value", "event_id")
            .withColumn("part", F.col("user_id") % 8)
            .groupBy("part")
            .applyInPandas(_encode_part, "payload binary, seq long")
        )
        decoded = decode_payloads(payloads)
        # resolve name -> family: decode the METADATA records distributed
        # (payloads never collect — only the metadata-sized family set and
        # the distinct name set reach the driver), then match each sample
        # name against the advertised families by the suffix convention
        import pandas as pd  # noqa: F811

        def _meta_iter(batches):
            for mb in batches:
                rows = [
                    (m["family_name"],)
                    for p in mb["payload"]
                    for m in decode_metadata(bytes(p))
                ]
                yield pd.DataFrame(rows, columns=["family"])

        fams = [
            r["family"]
            for r in payloads.select("payload")
            .mapInPandas(_meta_iter, "family string")
            .distinct()
            .collect()
        ]
        names = [r["name"] for r in decoded.select("name").distinct().collect()]
        # longest matching family wins: with prefix-overlapping families
        # ('http' and 'http_req'), 'http_req_sum' must resolve to
        # ('http_req', field 'sum') deterministically, not whichever
        # family collect() happened to list last
        families = {
            n: max(matches, key=len)
            for n in names
            if (matches := [f for f in fams if n.startswith(f + "_")])
        }
        samples = decoded.select(
            "name",
            F.map_filter("labels", lambda k, _v: k != "eid").alias("labels"),
            "ts_ms",
            "value",
            F.element_at("labels", "eid").cast("long").alias("seq"),
        )
        _ENGINES[key] = MetricEngine(group_metric_families(samples, families))
    eng = _ENGINES[key]
    parts = []
    for fld in ("sum", "count"):
        sel = _series_with_labels(eng.select_series("view", field=fld))
        parts.append(
            sel.groupBy("cohort").agg(
                F.count(F.lit(1)).alias("n_samples"),
                F.round(F.sum("value"), 2).alias("sum_value"),
            ).select(F.lit(fld).alias("field"), "cohort", "n_samples",
                     "sum_value")
        )
    return parts[0].unionByName(parts[1]).orderBy("field", "cohort")


@register(
    "promql_field_matcher",
    oracle=_MF_DEDUP_CTE
    + f"""
    SELECT 'cohort=' || cohort AS series_key,
           bucket_ms AS ts_ms,
           floor(CAST(sum(CAST(value AS DECIMAL(30,10))) AS DOUBLE)
                 * 1000000 + 0.5) / 1000000 AS value
    FROM (SELECT cohort, ts_ms - ts_ms % {DAY_MS} AS bucket_ms, value
          FROM samples WHERE name = 'click' AND field = 'sum')
    GROUP BY 1, 2
    ORDER BY series_key, ts_ms
    """,
)
def promql_field_matcher(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reserved ``__field__`` matcher through the WHOLE string path —
    parser -> compiler -> field-routed select_series (RFC multi-field
    catalog, 20240827:106-113): one field of a grouped family selected and
    day-bucket summed by cohort. The oracle replicates the field-split
    dedup and the floor-rounding convention."""
    eng = _mf_engine(spark, sf_dir)
    out = eng.promql(
        'sum by (cohort) (sum_over_time(click{__field__="sum"}[1d]))',
        step_ms=DAY_MS,
    )
    return out.select(
        "series_key",
        "ts_ms",
        (F.floor(F.col("value") * 1_000_000 + 0.5) / 1_000_000).alias("value"),
    ).orderBy("series_key", "ts_ms")


@register(
    "promql_histogram_family",
    oracle=_MF_DEDUP_CTE
    + f"""
    , clicks AS (
      SELECT field, user_label, cohort, ts_ms, value
      FROM samples WHERE name = 'click'
    ), bounds AS (
      -- the compiler derives the step grid from the ENGINE's full data
      -- range (all metrics, all fields), not the selected series
      SELECT ((min(ts_ms) + {7 * DAY_MS - 1}) // {7 * DAY_MS}) * {7 * DAY_MS} AS lo,
             (max(ts_ms) // {7 * DAY_MS}) * {7 * DAY_MS} AS hi
      FROM samples
    ), steps AS (
      SELECT unnest(generate_series(lo, hi, {7 * DAY_MS})) AS step_ms FROM bounds
    ), anchors AS (
      SELECT field, user_label, cohort, step_ms
      FROM (SELECT DISTINCT field, user_label, cohort FROM clicks)
           CROSS JOIN steps
    ), latest AS (
      SELECT field, user_label, cohort, step_ms, value FROM (
        SELECT a.field, a.user_label, a.cohort, a.step_ms, s.value,
               row_number() OVER (
                 PARTITION BY a.field, a.user_label, a.cohort, a.step_ms
                 ORDER BY s.ts_ms DESC) AS rn
        FROM anchors a
        JOIN clicks s
          ON a.field = s.field AND a.user_label = s.user_label
         AND a.cohort = s.cohort
         AND s.ts_ms <= a.step_ms AND s.ts_ms > a.step_ms - {3 * DAY_MS}
      ) WHERE rn = 1
    )
    SELECT series_key, ts_ms, value FROM (
      SELECT 'cohort=' || s.cohort || ',user=' || s.user_label AS series_key,
             s.step_ms AS ts_ms,
             floor(s.value / c.value * 1000000 + 0.5) / 1000000 AS value
      FROM (SELECT * FROM latest WHERE field = 'sum') s
      JOIN (SELECT * FROM latest WHERE field = 'count') c
        ON s.user_label = c.user_label AND s.cohort = c.cohort
       AND s.step_ms = c.step_ms
      WHERE c.value != 0
    ) ORDER BY series_key, ts_ms
    """,
)
def promql_histogram_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``histogram_avg`` through the string path — the histogram-family
    functions (histogram_avg / histogram_count / histogram_sum) routed to
    the RFC multi-field catalog: Prometheus defines them over native
    histograms, and this engine's classic equivalent is the family's
    ``sum`` / ``count`` FIELDS (20240827:106-113), so the functions
    rewrite the selector with ``__field__`` and histogram_avg is the
    series-matched sum/count ratio. Evaluated at 7-day steps with a 3-day
    staleness lookback; the oracle replays the per-field as-of grid and
    the join. Non-finite ratios (a zero count sample) are excluded on
    both sides."""
    eng = _mf_engine(spark, sf_dir)
    out = eng.promql(
        "histogram_avg(click)", step_ms=7 * DAY_MS, lookback_ms=3 * DAY_MS
    )
    return (
        out.filter(~F.isnan("value") & (F.abs("value") != float("inf")))
        .select(
            "series_key",
            "ts_ms",
            (F.floor(F.col("value") * 1_000_000 + 0.5) / 1_000_000).alias(
                "value"
            ),
        )
        .orderBy("series_key", "ts_ms")
    )
