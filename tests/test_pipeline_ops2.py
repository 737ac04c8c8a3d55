"""Unit tests for the round-2 additions: repetition features, cross-set
contamination, and the PromQL clamp/absent/holt_winters family — each
checked on tiny hand-computable fixtures (the oracle gate covers them at
corpus scale; these pin the semantics)."""

import pyspark.sql.functions as F

from horaedb_spark.functions import promql
from horaedb_spark.functions.dedup import cross_set_contamination
from horaedb_spark.functions.text import repetition_features


def test_repetition_features_hand_computed(spark):
    # "a b a b a" -> words=5, distinct=2, dup=0.6; bigrams: ab,ba,ab,ba ->
    # top bigram 2/4 = 0.5
    df = spark.createDataFrame([(1, "a b a b a")], ["id", "text"])
    feats = repetition_features("text", k=2)
    row = df.select(
        feats["n_words"].alias("n"),
        feats["dup_word_frac"].alias("d"),
        feats["top_gram_frac"].alias("t"),
    ).collect()[0]
    assert (row.n, row.d, row.t) == (5, 0.6, 0.5)


def test_repetition_single_word_doc(spark):
    # one word: no bigrams -> fallback single gram, top_frac 1.0, dup 0.0
    df = spark.createDataFrame([(1, "hello")], ["id", "text"])
    feats = repetition_features("text", k=2)
    row = df.select(
        feats["dup_word_frac"].alias("d"), feats["top_gram_frac"].alias("t")
    ).collect()[0]
    assert (row.d, row.t) == (0.0, 1.0)


def test_cross_set_contamination_finds_shared_trigram(spark):
    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps", "train"),
            (2, "lazy dogs sleep all day", "train"),
            (3, "a quick brown fox runs", "test"),
        ],
        ["id", "text", "split"],
    )
    out = cross_set_contamination(df, "id", "text", "split", "test", k=3).collect()
    # only doc 1 shares a trigram ("quick brown fox") with the test doc
    assert len(out) == 1
    assert (out[0].id, out[0].n_shared_shingles, out[0].n_probe_docs) == (1, 1, 1)


def test_clamp_family(spark):
    df = spark.createDataFrame([(1, 5.0), (2, 150.0), (3, 900.0)], ["id", "v"])
    rows = df.select(
        "id",
        promql.clamp("v", 10, 300).alias("c"),
        promql.clamp("v", mn=10).alias("cmin"),
        promql.clamp("v", mx=300).alias("cmax"),
    ).orderBy("id").collect()
    assert [(r.c, r.cmin, r.cmax) for r in rows] == [
        (10.0, 10.0, 5.0),
        (150.0, 150.0, 150.0),
        (300.0, 900.0, 300.0),
    ]


def test_absent_emits_only_empty_buckets(spark):
    df = spark.createDataFrame([(100, 1.0), (250, 2.0)], ["ts_ms", "value"])
    out = promql.absent(df, 0, 400, 100).orderBy("bucket_ms").collect()
    assert [r.bucket_ms for r in out] == [0, 300]
    assert all(r.absent == 1 for r in out)


def _hw_reference(vs, sf, tf):
    """Prometheus funcHoltWinters transcribed (promql/functions.go)."""
    s0, s1, b = 0.0, vs[0], vs[1] - vs[0]
    for i in range(1, len(vs)):
        if i - 1 >= 1:
            b = tf * (s1 - s0) + (1 - tf) * b
        y = (1 - sf) * (s1 + b)
        s0, s1 = s1, sf * vs[i] + y
    return s1


def test_holt_winters_matches_python_reference(spark):
    vs = [3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0]
    df = spark.createDataFrame(
        [("s1", i * 1000, v) for i, v in enumerate(vs)],
        ["series", "ts_ms", "value"],
    )
    out = promql.holt_winters(df, ["series"], sf=0.5, tf=0.1).collect()
    assert len(out) == 1
    assert abs(out[0].smoothed - _hw_reference(vs, 0.5, 0.1)) < 1e-12


def test_holt_winters_drops_single_sample_series(spark):
    df = spark.createDataFrame(
        [("a", 0, 1.0), ("b", 0, 1.0), ("b", 1000, 2.0)],
        ["series", "ts_ms", "value"],
    )
    out = promql.holt_winters(df, ["series"], sf=0.5, tf=0.1).collect()
    assert [r.series for r in out] == ["b"]
