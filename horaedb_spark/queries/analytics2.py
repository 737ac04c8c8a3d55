"""Second analytics batch: correlated subqueries, HAVING, nation-pair joins,
JSON extraction, the scalar function library, and the UDF registration
surface — finishing the declared relational coverage."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from horaedb_spark.queries.precision import dsum, sql_dsum
from horaedb_spark.queries.registry import register
from horaedb_spark.queries.tables import load_table


@register(
    "small_quantity_orders",
    oracle=f"""
    SELECT l.l_partkey, count(*) AS n_small,
           {sql_dsum('l.l_extendedprice')} AS small_revenue
    FROM lineitem l
    WHERE l.l_quantity < (
      SELECT 0.5 * avg(l2.l_quantity) FROM lineitem l2
      WHERE l2.l_partkey = l.l_partkey
    )
    GROUP BY l.l_partkey
    ORDER BY l.l_partkey
    """,
)
def small_quantity_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17-style correlated scalar subquery (quantity below half the
    per-part average) — decorrelated by Catalyst into an aggregate+join;
    expressed as the explicit join so the plan is scale-shaped by
    construction."""
    li = load_table(spark, sf_dir, "lineitem")
    avg_per_part = li.groupBy(F.col("l_partkey").alias("p_key")).agg(
        (F.avg("l_quantity") * 0.5).alias("half_avg")
    )
    return (
        li.join(avg_per_part, li.l_partkey == avg_per_part.p_key)
        .filter(F.col("l_quantity") < F.col("half_avg"))
        .groupBy("l_partkey")
        .agg(
            F.count("*").alias("n_small"),
            dsum("l_extendedprice").alias("small_revenue"),
        )
        .orderBy("l_partkey")
    )


@register(
    "large_orders_having",
    oracle="""
    SELECT o.o_orderkey, o.o_totalprice, sum(l.l_quantity) AS total_qty
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderkey, o.o_totalprice
    HAVING sum(l.l_quantity) > 150
    ORDER BY o.o_orderkey
    """,
)
def large_orders_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18-style HAVING over a join aggregate."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderkey", "o_totalprice")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 150)
        .orderBy("o_orderkey")
    )


@register(
    "nation_pair_volume",
    oracle=f"""
    SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
           {sql_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS volume
    FROM lineitem l
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation cn  ON cn.n_nationkey = c.c_nationkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation sn  ON sn.n_nationkey = s.s_nationkey
    WHERE cn.n_name != sn.n_name
    GROUP BY cn.n_name, sn.n_name
    ORDER BY cust_nation, supp_nation
    """,
)
def nation_pair_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7-style cross-nation trade volume: five joins, four of them broadcast
    (customer/nation/supplier/nation), one fact-fact shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    cn = n.select(F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation"))
    sn = n.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(cn), c.c_nationkey == F.col("cn_key"))
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(sn), s.s_nationkey == F.col("sn_key"))
        .filter(F.col("cust_nation") != F.col("supp_nation"))
        .groupBy("cust_nation", "supp_nation")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume"))
        .orderBy("cust_nation", "supp_nation")
    )


@register(
    "json_props_extract",
    oracle="""
    SELECT event_type,
           round(avg(CAST(props->>'k' AS INT)), 6) AS avg_k,
           max(CAST(props->>'k' AS INT)) AS max_k,
           count(*) FILTER (CAST(props->>'k' AS INT) > 50) AS n_high
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def json_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured JSON column extraction (`props` is a JSON string):
    get_json_object pushdown-friendly scalar extraction + aggregation."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        ev.groupBy("event_type")
        .agg(
            F.round(F.avg(k), 6).alias("avg_k"),
            F.max(k).alias("max_k"),
            F.sum(F.when(k > 50, 1).otherwise(0)).alias("n_high"),
        )
        .orderBy("event_type")
    )


@register(
    "scalar_function_library",
    oracle="""
    SELECT c_custkey,
           upper(c_name) AS name_upper,
           substr(c_name, 1, 8) AS name_prefix,
           length(c_name) AS name_len,
           lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS padded_key,
           round(abs(c_acctbal), 2) AS abs_bal,
           round(sqrt(abs(c_acctbal)), 6) AS sqrt_bal,
           CAST(floor(c_acctbal / 100) AS BIGINT) AS bal_bucket,
           concat(c_mktsegment, '#', CAST(c_nationkey AS VARCHAR)) AS seg_nation
    FROM customer ORDER BY c_custkey
    """,
)
def scalar_function_library(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar string/math function surface (absent from the reference's
    `main`, declared Spark-native in SURVEY.md §2): upper/substr/length/
    lpad/abs/sqrt/floor/concat — all codegen'd built-ins."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.length("c_name").alias("name_len"),
        F.lpad(F.col("c_custkey").cast("string"), 8, "0").alias("padded_key"),
        F.round(F.abs("c_acctbal"), 2).alias("abs_bal"),
        F.round(F.sqrt(F.abs("c_acctbal")), 6).alias("sqrt_bal"),
        F.floor(F.col("c_acctbal") / 100).alias("bal_bucket"),
        F.concat_ws("#", "c_mktsegment", F.col("c_nationkey").cast("string")).alias(
            "seg_nation"
        ),
    ).orderBy("c_custkey")


@register(
    "udf_registration_surface",
    oracle=f"""
    SELECT l_returnflag,
           {sql_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS charged
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def udf_registration_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UDF/UDAF registration surface: an Arrow-vectorized pandas_udf
    registered into the SQL function registry and invoked from SQL. The UDF
    computes the charge formula so the oracle can verify it — demonstrating
    the registration path while keeping the result checkable. (Production
    guidance stands: built-ins beat UDFs; this is the escape hatch.)"""
    from pyspark.sql.functions import pandas_udf

    # NB: annotations must resolve at registration time — with PEP 563
    # (`from __future__ import annotations`) they are strings, so `pd` has to
    # be importable from module globals, not a function-local import.
    @pandas_udf("double")
    def charge(price: pd.Series, disc: pd.Series, tax: pd.Series) -> pd.Series:
        return price * (1 - disc) * (1 + tax)

    spark.udf.register("charge_udf", charge)
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_v")
    return spark.sql(
        """
        SELECT l_returnflag,
               round(CAST(sum(CAST(charge_udf(l_extendedprice, l_discount, l_tax)
                                   AS DECIMAL(30,10))) AS DOUBLE), 2) AS charged
        FROM lineitem_v GROUP BY l_returnflag ORDER BY l_returnflag
        """
    )


@register(
    "tpch_q6_forecast_revenue",
    oracle=f"""
    SELECT {sql_dsum('l_extendedprice * l_discount')} AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
)
def tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure filter+aggregate — the pushdown showcase (all four
    predicates reach the parquet scan; no shuffle beyond the final
    single-row reduce)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"))
    )


@register(
    "customer_order_distribution",
    oracle="""
    SELECT n_orders, count(*) AS n_customers FROM (
      SELECT c.c_custkey, count(o.o_orderkey) AS n_orders
      FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY c.c_custkey
    ) GROUP BY n_orders ORDER BY n_orders
    """,
)
def customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13-style two-level aggregation: orders-per-customer histogram
    (outer join so zero-order customers count)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return (
        per_cust.groupBy("n_orders")
        .agg(F.count("*").alias("n_customers"))
        .orderBy("n_orders")
    )


@register(
    "shipping_priority_q3",
    oracle=f"""
    SELECT l.l_orderkey,
           {sql_dsum("l.l_extendedprice * (1 - l.l_discount)")} AS revenue,
           strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
           o.o_orderpriority
    FROM customer c
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
      AND l.l_shipdate  > TIMESTAMP '1995-03-15 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def shipping_priority_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: two-sided date predicates (both pushed to their scans),
    broadcast customer dim filtered before the join, fact-fact join on
    orderkey, top-10 by decimal-exact revenue with a deterministic tiebreak."""
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1995-03-15").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15").cast("timestamp")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


@register(
    "bracket_revenue_q19",
    oracle=f"""
    SELECT p.p_brand, count(*) AS n_lines,
           {sql_dsum("l.l_extendedprice * (1 - l.l_discount)")} AS revenue
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND l.l_quantity BETWEEN 1 AND 11
           AND p.p_size BETWEEN 1 AND 5)
       OR (p.p_brand = 'Brand#23' AND l.l_quantity BETWEEN 10 AND 20
           AND p.p_size BETWEEN 1 AND 10)
       OR (p.p_brand = 'Brand#34' AND l.l_quantity BETWEEN 20 AND 30
           AND p.p_size BETWEEN 1 AND 15)
    GROUP BY p.p_brand ORDER BY p.p_brand
    """,
)
def bracket_revenue_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-AND bracket predicates spanning both join
    sides — Catalyst pushes the per-side conjuncts below the join (brand/size
    to the part scan, quantity to lineitem) and broadcasts the filtered
    part dim."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    joined = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    cond = (
        ((F.col("p_brand") == "Brand#12") & F.col("l_quantity").between(1, 11) & F.col("p_size").between(1, 5))
        | ((F.col("p_brand") == "Brand#23") & F.col("l_quantity").between(10, 20) & F.col("p_size").between(1, 10))
        | ((F.col("p_brand") == "Brand#34") & F.col("l_quantity").between(20, 30) & F.col("p_size").between(1, 15))
    )
    return (
        joined.filter(cond)
        .groupBy("p_brand")
        .agg(
            F.count("*").alias("n_lines"),
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
        )
        .orderBy("p_brand")
    )
