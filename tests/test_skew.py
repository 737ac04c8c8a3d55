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


def test_ngram_jaccard_oversized_block_subshards(spark):
    """VERDICT r01 #8: blocks over max_block_rows refine by min-shingle
    sub-key (1-hash MinHash LSH) instead of going quadratic; blocks under
    the cap keep exact all-pairs semantics."""
    from horaedb_spark.functions.dedup import ngram_jaccard_pairs

    rows = [
        # "big" block: 4 rows > cap -> sub-sharded by min-shingle
        (1, "aa bb cc dd", "big"),
        (2, "aa bb cc dd", "big"),
        (3, "xx yy zz ww", "big"),
        (4, "xx yy zz ww", "big"),
        # "small" block: under the cap -> exact semantics, even for
        # dissimilar docs (compared, then thresholded)
        (5, "pp qq rr ss", "small"),
        (6, "tt uu vv wz", "small"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    pairs = ngram_jaccard_pairs(
        df, "text", "doc_id", "source", threshold=0.0, max_block_rows=3
    )
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    # identical docs pair within their sub-shard; cross-sub-shard pairs are
    # pruned (their min shingles differ), so the quadratic blowup is gone
    assert (1, 2) in got and (3, 4) in got
    assert (1, 3) not in got and (2, 4) not in got
    # the small block is exact: the dissimilar pair is still compared
    assert (5, 6) in got
