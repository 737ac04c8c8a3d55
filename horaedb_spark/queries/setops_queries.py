"""Set operations, cube, approximate sketches, and region partitioning —
rounding out the declared relational surface (SURVEY.md §2 "explicit
absences" covered Spark-natively, plus D11)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from horaedb_spark.queries.precision import dsum, sql_dsum
from horaedb_spark.queries.registry import register
from horaedb_spark.queries.tables import events_ms, load_table


@register(
    "setop_intersect_except",
    oracle="""
    WITH buyers AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'),
         clickers AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'click'),
         errorers AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'error')
    SELECT 'click_and_buy' AS cohort, count(*) AS n FROM
      (SELECT user_id FROM buyers INTERSECT SELECT user_id FROM clickers)
    UNION ALL
    SELECT 'buy_no_error', count(*) FROM
      (SELECT user_id FROM buyers EXCEPT SELECT user_id FROM errorers)
    ORDER BY cohort
    """,
)
def setop_intersect_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT over user cohorts."""
    ev = load_table(spark, sf_dir, "events")
    pick = lambda t: ev.filter(F.col("event_type") == t).select("user_id").distinct()
    both = pick("purchase").intersect(pick("click")).agg(F.count("*").alias("n")).select(
        F.lit("click_and_buy").alias("cohort"), "n"
    )
    clean = pick("purchase").exceptAll(pick("error")).agg(F.count("*").alias("n")).select(
        F.lit("buy_no_error").alias("cohort"), "n"
    )
    return both.unionByName(clean).orderBy("cohort")


@register(
    "cube_order_stats",
    oracle=f"""
    SELECT coalesce(o_orderstatus, 'ALL') AS status,
           coalesce(o_orderpriority, 'ALL') AS priority,
           count(*) AS n, {sql_dsum('o_totalprice')} AS total
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    ORDER BY status, priority
    """,
)
def cube_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over two dimensions (all 4 grouping sets)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n"), dsum("o_totalprice").alias("total"))
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n",
            "total",
        )
        .orderBy("status", "priority")
    )


@register(
    "approx_sketches",
    oracle="""
    SELECT l_returnflag,
           count(DISTINCT l_partkey) AS exact_parts,
           TRUE AS approx_parts_within_tol,
           TRUE AS approx_median_within_tol
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def approx_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate sketch operators (approx_count_distinct HLL,
    percentile_approx KLL-ish). Sketch internals are engine-specific, so the
    raw estimates can't hash-match DuckDB — instead the query VERIFIES them:
    each group's estimate must land within the sketch's error band of the
    exact value (HLL default rsd 5% → 15% band; approx median → 15% relative
    band vs the exact median). The oracle asserts the bands hold (TRUE), so a
    sketch regression is a hard hash failure, not an unverifiable no_oracle."""
    li = load_table(spark, sf_dir, "lineitem")
    exact_median = F.expr("percentile(l_quantity, 0.5)")
    agg = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("exact_parts"),
        F.approx_count_distinct("l_partkey").alias("__ap__"),
        F.percentile_approx("l_quantity", 0.5).alias("__am__"),
        exact_median.alias("__em__"),
    )
    return agg.select(
        "l_returnflag",
        "exact_parts",
        (
            F.abs(F.col("__ap__") - F.col("exact_parts"))
            <= 0.15 * F.col("exact_parts")
        ).alias("approx_parts_within_tol"),
        (
            F.abs(F.col("__am__") - F.col("__em__")) <= 0.15 * F.abs(F.col("__em__"))
        ).alias("approx_median_within_tol"),
    ).orderBy("l_returnflag")


@register(
    "region_partitioning",
    oracle="""
    SELECT shard, count(*) AS n_series FROM (
      SELECT ascii(substr(md5(event_type || '|' || CAST(user_id AS VARCHAR)), 1, 1)) % 8
             AS shard
      FROM (SELECT DISTINCT event_type, user_id FROM events)
    ) GROUP BY shard ORDER BY shard
    """,
)
def region_partitioning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D11 region/shard partitioning: series range-assigned by
    hash(metric + sorted tags) (RFC 20240827:31-35). In production this is
    ``pmod(xxhash64(series_key), n_shards)`` — pure shuffle partitioning, no
    meta-server (SURVEY.md §2 D11). For cross-engine verification the query
    uses an md5-derived shard (identical bytes in any engine); the routing
    law (every series -> exactly one shard, histogram sums to series count)
    is what's being checked."""
    ev = load_table(spark, sf_dir, "events")
    series = ev.select("event_type", "user_id").distinct()
    key = F.concat_ws("|", "event_type", F.col("user_id").cast("string"))
    sharded = series.select(
        (F.ascii(F.substring(F.md5(key), 1, 1)) % 8).alias("shard")
    )
    return sharded.groupBy("shard").agg(F.count("*").alias("n_series")).orderBy("shard")


CM_HEAVY_HITTERS_SQL = """
    WITH items AS (
      SELECT CAST(user_id AS VARCHAR) AS item FROM events
    ), hashed AS (
      SELECT item, j,
             (strpos('0123456789abcdef', substr(md5(j || ':' || item), 1, 1)) - 1) * 16
           + (strpos('0123456789abcdef', substr(md5(j || ':' || item), 2, 1)) - 1)
               AS bucket
      FROM items, (SELECT unnest([0, 1, 2, 3]) AS j)
    ), sketch AS (
      SELECT j, bucket, count(*) AS c FROM hashed GROUP BY j, bucket
    ), cand AS (
      SELECT DISTINCT item, j,
             (strpos('0123456789abcdef', substr(md5(j || ':' || item), 1, 1)) - 1) * 16
           + (strpos('0123456789abcdef', substr(md5(j || ':' || item), 2, 1)) - 1)
               AS bucket
      FROM items, (SELECT unnest([0, 1, 2, 3]) AS j)
    ), est AS (
      SELECT c.item, min(s.c) AS est
      FROM cand c JOIN sketch s ON s.j = c.j AND s.bucket = c.bucket
      GROUP BY c.item
    ), truth AS (
      SELECT item, count(*) AS true_cnt FROM items GROUP BY item
    )
    SELECT e.item, CAST(e.est AS BIGINT) AS est,
           CAST(t.true_cnt AS BIGINT) AS true_cnt,
           CAST(e.est - t.true_cnt AS BIGINT) AS overcount
    FROM est e JOIN truth t USING (item)
    ORDER BY est DESC, item LIMIT 10
    """


@register("sketch_heavy_hitters", oracle=CM_HEAVY_HITTERS_SQL)
def sketch_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min heavy hitters over the event stream's user ids: build the
    deterministic d=4 x w=256 md5 sketch (one hash aggregate; map-side
    combine IS the sketch merge), broadcast it, and point-estimate every
    candidate as min over its bucket counters. The oracle replays the
    sketch bit-for-bit — estimates AND their overcounts hash-match, which
    no tolerance-band check can claim. True counts ride along to exhibit
    the ~N/w overcount bias."""
    from horaedb_spark.functions.sketch import cm_build, cm_estimate

    ev = events_ms(spark, sf_dir).select(
        F.col("user_id").cast("string").alias("item")
    )
    sketch = cm_build(ev, F.col("item"))
    cands = ev.distinct()
    est = cm_estimate(cands, sketch, "item")
    truth = ev.groupBy("item").agg(F.count("*").alias("true_cnt"))
    return (
        est.join(truth, "item")
        .select(
            "item",
            F.col("est").cast("long").alias("est"),
            F.col("true_cnt").cast("long").alias("true_cnt"),
            (F.col("est") - F.col("true_cnt")).cast("long").alias("overcount"),
        )
        .orderBy(F.desc("est"), "item")
        .limit(10)
    )
