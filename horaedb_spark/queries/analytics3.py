"""Analytics batch 3: the remaining canonical TPC-H query shapes the
relational surface declares (SURVEY.md §2 "absences" — provided Spark-native):
EXISTS semi-join (Q4), two-way conditional aggregation over a join (Q12),
NOT-IN anti-join + count-distinct (Q16), and a scalar-subquery HAVING
threshold (Q11). Adapted to the driver testdata schema (no partsupp /
commitdate columns — the lineitem part-supplier pairs stand in).

Scale notes: every join here is either a broadcast (supplier/part/nation
dims) or a key-partitioned shuffle join on the fact's join key; aggregates
are partial+final hash aggregates; sums route through DECIMAL for
order-independent results (queries/precision.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from horaedb_spark.queries.precision import dsum, sql_dsum
from horaedb_spark.queries.registry import register
from horaedb_spark.queries.tables import load_table


@register(
    "order_priority_exists_q4",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-10-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def order_priority_exists_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: priority count of orders having at least one returned
    line — the EXISTS correlated subquery as a LEFT SEMI join on the order
    key (no dedup pass, no row multiplication; Catalyst plans a semi SMJ or
    broadcast depending on side sizes)."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    window = o.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    returned = li.filter(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("o_orderkey")
    )
    return (
        window.join(returned, "o_orderkey", "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


@register(
    "shipmode_priority_q12",
    oracle="""
    SELECT l_linestatus,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l_linestatus ORDER BY l_linestatus
    """,
)
def shipmode_priority_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: two-way conditional aggregation (urgent vs other
    priority line counts) over the lineitem-orders join, one year of
    shipments — the ship-date filter pushes to the fact scan; the CASE sums
    fold into a single partial+final hash aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    year = li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        year.join(
            o.select(F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"),
            "l_orderkey",
        )
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


@register(
    "supplier_part_counts_q16",
    oracle="""
    SELECT p_brand, p_type, count(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_size < 20
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                            WHERE s_name LIKE '%7')
    GROUP BY p_brand, p_type
    ORDER BY supplier_cnt DESC, p_brand, p_type
    """,
)
def supplier_part_counts_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct supplier counts per part attribute with a
    NOT IN supplier exclusion — the exclusion list is a broadcast anti-join
    (s_suppkey is never null here, so NOT IN == anti semantics); part is a
    broadcast dim; the count-distinct expands to a two-phase aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_size") < 20)
    excl = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_name").like("%7"))
        .select(F.col("s_suppkey").alias("l_suppkey"))
    )
    return (
        li.join(F.broadcast(excl), "l_suppkey", "left_anti")
        .join(
            F.broadcast(p.select(F.col("p_partkey").alias("l_partkey"), "p_brand", "p_type")),
            "l_partkey",
        )
        .groupBy("p_brand", "p_type")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type")
    )


@register(
    "nation_revenue_share_q11",
    oracle=f"""
    WITH nation_rev AS (
      SELECT n_name, {sql_dsum('l_extendedprice')} AS rev
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      GROUP BY n_name
    )
    SELECT n_name, rev FROM nation_rev
    WHERE rev > (SELECT CAST(sum(CAST(rev AS DECIMAL(30,10))) AS DOUBLE)
                        * CAST(0.04 AS DOUBLE)
                 FROM nation_rev)
    ORDER BY rev DESC, n_name
    """,
)
def nation_revenue_share_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: per-nation supplier revenue kept only above a
    fraction of the global total — the scalar subquery threshold becomes a
    broadcast cross-join of a 1-row aggregate (no driver collect; the
    threshold rides the plan). Both levels of summation are decimal-routed."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("l_suppkey"), "s_nationkey"
    )
    n = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nationkey"), "n_name"
    )
    nation_rev = (
        li.join(F.broadcast(s), "l_suppkey")
        .join(F.broadcast(n), "s_nationkey")
        .groupBy("n_name")
        .agg(dsum("l_extendedprice").alias("rev"))
    )
    threshold = nation_rev.agg(
        (
            F.sum(F.col("rev").cast("decimal(30,10)")).cast("double")
            * F.lit(0.04)
        ).alias("__thr__")
    )
    return (
        nation_rev.crossJoin(F.broadcast(threshold))
        .filter(F.col("rev") > F.col("__thr__"))
        .select("n_name", "rev")
        .orderBy(F.desc("rev"), "n_name")
    )
