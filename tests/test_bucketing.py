"""Bucketed-table support: pre-partitioned co-located joins without a
shuffle — SURVEY.md §4's deferred optimization, demonstrated and asserted.

At 100 TB, bucketing the fact tables on their join key replaces the
per-query exchange of the biggest table with a one-time layout cost."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def warehouse(spark, tmp_path_factory, sf_dir):
    from horaedb_spark.queries.tables import load_table

    # saveAsTable writes into the session warehouse dir configured at startup
    import shutil

    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS o_bucketed")
    # DROP only removes catalog metadata for tables created by a previous
    # session; clear the stale warehouse dirs too
    warehouse_dir = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for name in ("li_bucketed", "o_bucketed"):
        shutil.rmtree(f"{warehouse_dir}/{name}", ignore_errors=True)
    (
        li.write.bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .mode("overwrite")
        .saveAsTable("li_bucketed")
    )
    (
        o.write.bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .mode("overwrite")
        .saveAsTable("o_bucketed")
    )
    return True


def test_bucketed_join_has_no_shuffle(spark, warehouse):
    li = spark.table("li_bucketed")
    o = spark.table("o_bucketed")
    # disable auto-broadcast: at test scale AQE would broadcast the small
    # side, hiding the co-location property we're demonstrating (at 100 TB
    # neither fact side broadcasts — bucketing is what removes the shuffle)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = (
            li.join(o, li.l_orderkey == o.o_orderkey).groupBy("o_orderstatus").count()
        )
        joined.collect()  # materialize so AQE finalizes the plan
        plan = joined._jdf.queryExecution().executedPlan().toString()
        plan = plan.split("== Initial Plan ==")[0]  # keep only the final plan
        assert "SortMergeJoin" in plan, plan[:2000]
        # co-located: no exchange below the join (the only exchange allowed
        # is the one feeding the final aggregation)
        join_subtree = plan.split("SortMergeJoin", 1)[1]
        assert "Exchange" not in join_subtree, join_subtree[:1500]
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_join_matches_unbucketed(spark, warehouse, sf_dir):
    from horaedb_spark.queries.tables import load_table

    li = spark.table("li_bucketed")
    o = spark.table("o_bucketed")
    got = {
        (r[0], r[1])
        for r in li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderstatus")
        .count()
        .collect()
    }
    li2 = load_table(spark, sf_dir, "lineitem")
    o2 = load_table(spark, sf_dir, "orders")
    expect = {
        (r[0], r[1])
        for r in li2.join(o2, li2.l_orderkey == o2.o_orderkey)
        .groupBy("o_orderstatus")
        .count()
        .collect()
    }
    assert got == expect
