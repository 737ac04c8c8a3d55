"""Set operations, cube, approximate sketches, and region partitioning —
rounding out the declared relational surface (SURVEY.md §2 "explicit
absences" covered Spark-natively, plus D11)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from horaedb_spark.queries.precision import dsum, sql_dsum
from horaedb_spark.queries.registry import register
from horaedb_spark.queries.tables import load_table


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


@register("approx_sketches", oracle=None)  # HLL/KLL sketches are engine-specific
def approx_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate sketch operators (approx_count_distinct HLL,
    percentile_approx KLL-ish): deterministic within Spark but not
    cross-engine, so this entry takes the rows-only check. The exact
    counterparts are oracle-gated in distinct_users_daily /
    event_value_percentiles."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey").alias("approx_parts"),
        F.percentile_approx("l_quantity", 0.5).alias("approx_median_qty"),
        F.countDistinct("l_partkey").alias("exact_parts"),
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
