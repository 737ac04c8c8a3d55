from pyspark.sql import functions as F

from horaedb_spark.functions.skew import salted_agg, salted_sum


def test_salted_sum_matches_plain(spark):
    # 90% of rows share one hot key
    df = spark.range(0, 10_000).select(
        F.when(F.col("id") % 10 < 9, F.lit("hot")).otherwise(F.lit("cold")).alias("k"),
        (F.col("id") % 7).cast("double").alias("v"),
    ).repartition(8)
    got = {r.k: r.s for r in salted_sum(df, ["k"], "v", out="s").collect()}
    expect = {
        r.k: float(r.s)
        for r in df.groupBy("k").agg(F.sum("v").alias("s")).collect()
    }
    assert got == expect


def test_salted_agg_count_min_max(spark):
    df = spark.range(0, 1_000).select(
        (F.col("id") % 3).alias("k"), F.col("id").alias("v")
    ).repartition(4)
    out = salted_agg(
        df,
        ["k"],
        {"n": F.count("*"), "mx": F.max("v"), "mn": F.min("v")},
        lambda name: {"n": F.sum, "mx": F.max, "mn": F.min}[name](name),
        num_salts=4,
    )
    got = {r.k: (r.n, r.mx, r.mn) for r in out.collect()}
    expect = {
        r.k: (r.n, r.mx, r.mn)
        for r in df.groupBy("k")
        .agg(F.count("*").alias("n"), F.max("v").alias("mx"), F.min("v").alias("mn"))
        .collect()
    }
    assert got == expect
