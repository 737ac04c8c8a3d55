"""Analytics query suite over the driver testdata.

These cover the relational surface SURVEY.md §2 assigns to Spark SQL built-ins
(the reference's `main` branch delegates all of this to DataFusion / left it on
the legacy branch — SURVEY.md §2 "Explicit absences"): aggregation, joins
(broadcast + shuffle), windows, top-k per group, rollup, pivot, set ops,
sessionization, as-of join, exact percentiles.

Scale notes (100 TB stance):
- dimension tables (region/nation/customer/supplier/part) are broadcast —
  no shuffle on the fact side for those joins;
- every aggregation is expressed declaratively so Catalyst runs partial
  (map-side) aggregation before the exchange;
- the as-of join is the union+window form (single shuffle by key) rather than
  a range join that explodes into a nested-loop;
- top-k per group uses a window + filter, which AQE executes with partial
  ranking pushed ahead of the exchange in Spark 4.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from horaedb_spark.queries.precision import davg, dsum, sql_davg, sql_dsum
from horaedb_spark.queries.registry import register
from horaedb_spark.queries.tables import events_ms, load_table


# --------------------------------------------------------------------------
# Q1-style pricing summary: the canonical groupBy + many-aggs scan.
@register(
    "tpch_q1_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_dsum('l_quantity')} AS sum_qty,
           {sql_dsum('l_extendedprice')} AS sum_base_price,
           {sql_dsum('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
           {sql_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
           {sql_davg('l_quantity')} AS avg_qty,
           {sql_davg('l_extendedprice')} AS avg_price,
           {sql_davg('l_discount')} AS avg_disc,
           count(*)                                                    AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape (groupBy 2 cols + 8 aggs). Map-side partial aggregation
    makes this a single small shuffle regardless of input size."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum(disc_price).alias("sum_disc_price"),
            dsum(disc_price * (1 + F.col("l_tax"))).alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount").alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# --------------------------------------------------------------------------
@register(
    "top_customers_by_revenue",
    oracle=f"""
    SELECT c.c_custkey, c.c_name, c.c_mktsegment,
           {sql_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
           count(DISTINCT o.o_orderkey) AS n_orders
    FROM customer c
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY c.c_custkey, c.c_name, c.c_mktsegment
    ORDER BY revenue DESC, c_custkey
    LIMIT 10
    """,
)
def top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3-flavored: fact-fact join on orderkey + broadcast customer dim,
    top-10 by revenue with a deterministic tiebreak.

    Lineitem pre-aggregates revenue per order BEFORE the join — a partial-
    aggregation pushdown Catalyst doesn't apply across joins on its own; it
    shrinks the join's probe side ~4x and turns countDistinct(o_orderkey)
    into a plain count. Equivalent because orderkey is unique post-agg and
    the inner join drops the same lineitem-less orders either way."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    rev_per_order = li.groupBy("l_orderkey").agg(
        F.sum(
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(30,10)")
        ).alias("order_rev")
    )
    return (
        rev_per_order.join(o, F.col("l_orderkey") == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "c_name", "c_mktsegment")
        .agg(
            F.round(F.sum("order_rev").cast("double"), 2).alias("revenue"),
            F.count("o_orderkey").alias("n_orders"),
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(10)
    )


# --------------------------------------------------------------------------
@register(
    "regional_supplier_volume",
    oracle=f"""
    SELECT r.r_name AS region, n.n_name AS nation,
           {sql_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
    FROM lineitem l
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    JOIN region r   ON r.r_regionkey = n.n_regionkey
    GROUP BY r.r_name, n.n_name
    ORDER BY region, nation
    """,
)
def regional_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5-flavored snowflake: three broadcast dim joins chained off the fact
    table — zero fact-side shuffles before the final aggregation."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .orderBy("region", "nation")
    )


# --------------------------------------------------------------------------
@register(
    "order_priority_monthly",
    oracle=f"""
    SELECT strftime(o_orderdate, '%Y-%m') AS order_month, o_orderpriority,
           count(*) AS order_count,
           {sql_dsum('o_totalprice')} AS total_price
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def order_priority_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4-flavored with month bucketing (time-partition-prunable predicate)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .groupBy(
            F.date_format("o_orderdate", "yyyy-MM").alias("order_month"), "o_orderpriority"
        )
        .agg(
            F.count("*").alias("order_count"),
            dsum("o_totalprice").alias("total_price"),
        )
        .orderBy("order_month", "o_orderpriority")
    )


# --------------------------------------------------------------------------
@register(
    "promo_revenue_share",
    oracle="""
    SELECT round(100.0 * CAST(sum(CAST(CASE WHEN p.p_type LIKE 'PROMO%'
                                  THEN l.l_extendedprice * (1 - l.l_discount)
                                  ELSE 0 END AS DECIMAL(30,10))) AS DOUBLE)
                 / CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                                 AS DECIMAL(30,10))) AS DOUBLE), 6) AS promo_revenue_pct
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    """,
)
def promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14 shape: conditional aggregation over a broadcast part join."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type").startswith("PROMO"), rev).otherwise(F.lit(0.0))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            F.round(
                100.0
                * F.sum(promo.cast("decimal(30,10)")).cast("double")
                / F.sum(rev.cast("decimal(30,10)")).cast("double"),
                6,
            ).alias("promo_revenue_pct")
        )
    )


# --------------------------------------------------------------------------
@register(
    "returnflag_rollup",
    oracle=f"""
    SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
           coalesce(l_linestatus, 'ALL') AS linestatus,
           {sql_dsum('l_quantity')} AS sum_qty, count(*) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    ORDER BY returnflag, linestatus
    """,
)
def returnflag_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouping-sets/rollup (absent from the reference, declared Spark-native
    in SURVEY.md §2)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(dsum("l_quantity").alias("sum_qty"), F.count("*").alias("n"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "sum_qty",
            "n",
        )
        .orderBy("returnflag", "linestatus")
    )


# --------------------------------------------------------------------------
@register(
    "top_parts_per_brand",
    oracle="""
    SELECT p_brand, p_partkey, total_qty FROM (
      SELECT p.p_brand, p.p_partkey,
             round(sum(l.l_quantity), 2) AS total_qty,
             row_number() OVER (PARTITION BY p.p_brand
                                ORDER BY sum(l.l_quantity) DESC, p.p_partkey) AS rn
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      GROUP BY p.p_brand, p.p_partkey
    ) WHERE rn <= 3
    ORDER BY p_brand, total_qty DESC, p_partkey
    """,
)
def top_parts_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K per group: window ranking over an aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    agg = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_partkey")
        .agg(F.sum("l_quantity").alias("raw_qty"))
    )
    w = Window.partitionBy("p_brand").orderBy(F.desc("raw_qty"), F.asc("p_partkey"))
    return (
        agg.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("p_brand", "p_partkey", F.round("raw_qty", 2).alias("total_qty"))
        .orderBy("p_brand", F.desc("total_qty"), "p_partkey")
    )


# --------------------------------------------------------------------------
@register(
    "distinct_users_daily",
    oracle="""
    SELECT strftime(ts, '%Y-%m-%d') AS day, event_type,
           count(DISTINCT user_id) AS distinct_users,
           count(*) AS n_events
    FROM events
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def distinct_users_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct aggregation with time bucketing (expand + two-phase agg)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day"), "event_type")
        .agg(
            F.countDistinct("user_id").alias("distinct_users"),
            F.count("*").alias("n_events"),
        )
        .orderBy("day", "event_type")
    )


# --------------------------------------------------------------------------
@register(
    "event_value_percentiles",
    oracle="""
    SELECT event_type,
           round(quantile_cont(value, 0.5), 6)  AS p50,
           round(quantile_cont(value, 0.95), 6) AS p95,
           round(min(value), 6) AS min_v, round(max(value), 6) AS max_v
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def event_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact continuous percentiles (Spark `percentile` == DuckDB
    `quantile_cont`; interpolation arithmetic verified identical)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
            F.round(F.expr("percentile(value, 0.95)"), 6).alias("p95"),
            F.round(F.min("value"), 6).alias("min_v"),
            F.round(F.max("value"), 6).alias("max_v"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
@register(
    "event_type_pivot",
    oracle="""
    SELECT user_id,
           count(*) FILTER (event_type = 'click')    AS click,
           count(*) FILTER (event_type = 'error')    AS error,
           count(*) FILTER (event_type = 'purchase') AS purchase,
           count(*) FILTER (event_type = 'signup')   AS signup,
           count(*) FILTER (event_type = 'view')     AS view
    FROM events GROUP BY user_id ORDER BY user_id
    """,
)
def event_type_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot with an explicit value list (deterministic column set)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .pivot("event_type", ["click", "error", "purchase", "signup", "view"])
        .count()
        .na.fill(0)
        .orderBy("user_id")
    )


# --------------------------------------------------------------------------
@register(
    "sessionization",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts,
             CASE WHEN ts - lag(ts) OVER w > INTERVAL 30 MINUTE OR
                       lag(ts) OVER w IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sessions AS (
      SELECT user_id,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM flagged
    )
    SELECT user_id, count(DISTINCT session_id) AS n_sessions,
           count(*) AS n_events
    FROM sessions GROUP BY user_id ORDER BY user_id
    """,
)
def sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: lag + cumulative-sum session ids, one shuffle by user.
    (Streaming variant: `session_window` — see streaming_queries.)"""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
    flagged = ev.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > 30 * 60), F.lit(1)).otherwise(F.lit(0)),
    )
    ws = Window.partitionBy("user_id").orderBy("ts").rowsBetween(Window.unboundedPreceding, 0)
    sessions = flagged.withColumn("session_id", F.sum("new_session").over(ws))
    return (
        sessions.groupBy("user_id")
        .agg(F.countDistinct("session_id").alias("n_sessions"), F.count("*").alias("n_events"))
        .orderBy("user_id")
    )


# --------------------------------------------------------------------------
@register(
    "asof_join_purchase_click",
    oracle="""
    WITH clicks AS (
      SELECT user_id, ts, max(event_id) AS click_id
      FROM events WHERE event_type = 'click' GROUP BY user_id, ts
    ), purchases AS (
      SELECT event_id AS purchase_id, user_id, ts, value
      FROM events WHERE event_type = 'purchase'
    )
    SELECT p.purchase_id, p.user_id, round(p.value, 6) AS purchase_value,
           epoch_ms(c.ts) AS click_ts_ms, c.click_id
    FROM purchases p
    ASOF JOIN clicks c ON p.user_id = c.user_id AND c.ts <= p.ts
    ORDER BY p.purchase_id
    """,
)
def asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (Spark has no native one — SURVEY.md §2 extension): for each
    purchase, the latest click by the same user at-or-before it.

    Implemented scale-first as union + window (single shuffle on user_id,
    sort by ts, `last(..., ignorenulls)`), not a range join (which Spark
    would execute as a nested loop)."""
    ev = events_ms(spark, sf_dir)
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts", "ts_ms")
        .agg(F.max("event_id").alias("click_id"))
        .select(
            "user_id",
            "ts",
            F.col("ts_ms").alias("click_ts_ms"),
            "click_id",
            F.lit(None).cast("long").alias("purchase_id"),
            F.lit(None).cast("double").alias("value"),
            F.lit(0).alias("is_purchase"),
        )
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.lit(None).cast("long").alias("click_ts_ms"),
        F.lit(None).cast("long").alias("click_id"),
        F.col("event_id").alias("purchase_id"),
        "value",
        F.lit(1).alias("is_purchase"),
    )
    # clicks sort before purchases at the same timestamp => `<=` semantics
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_purchase")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    joined = (
        clicks.unionByName(purchases)
        .withColumn("last_click_ts_ms", F.last("click_ts_ms", ignorenulls=True).over(w))
        .withColumn("last_click_id", F.last("click_id", ignorenulls=True).over(w))
        .filter((F.col("is_purchase") == 1) & F.col("last_click_ts_ms").isNotNull())
    )
    return joined.select(
        "purchase_id",
        "user_id",
        F.round("value", 6).alias("purchase_value"),
        F.col("last_click_ts_ms").alias("click_ts_ms"),
        F.col("last_click_id").alias("click_id"),
    ).orderBy("purchase_id")


# --------------------------------------------------------------------------
@register(
    "mktsegment_stats",
    oracle=f"""
    SELECT c.c_mktsegment,
           count(DISTINCT c.c_custkey) AS n_customers,
           count(o.o_orderkey) AS n_orders,
           {sql_dsum('o.o_totalprice')} AS total_revenue,
           {sql_davg('c.c_acctbal')} AS avg_acctbal
    FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment
    """,
)
def mktsegment_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Outer join + mixed aggregates."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_mktsegment")
        .agg(
            F.countDistinct("c_custkey").alias("n_customers"),
            F.count("o_orderkey").alias("n_orders"),
            dsum("o_totalprice").alias("total_revenue"),
            davg("c_acctbal").alias("avg_acctbal"),
        )
        .orderBy("c_mktsegment")
    )


# --------------------------------------------------------------------------
@register(
    "customers_without_orders",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
    ORDER BY c_custkey
    """,
)
def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti join (NOT EXISTS)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


# --------------------------------------------------------------------------
@register(
    "high_value_order_lines",
    oracle="""
    SELECT l_orderkey, l_linenumber, round(l_extendedprice, 6) AS price
    FROM lineitem
    WHERE l_orderkey IN (
      SELECT o_orderkey FROM orders WHERE o_totalprice > 400000
    )
    ORDER BY l_orderkey, l_linenumber
    """,
)
def high_value_order_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi join (EXISTS / IN-subquery)."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey, "left_semi")
        .select("l_orderkey", "l_linenumber", F.round("l_extendedprice", 6).alias("price"))
        .orderBy("l_orderkey", "l_linenumber")
    )
