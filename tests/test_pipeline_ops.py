"""Unit tests for the training-pipeline operators added in round 2:
connected components, BM25 retrieval, and deterministic split/sample."""

import pyspark.sql.functions as F

from horaedb_spark.functions.dedup import connected_components
from horaedb_spark.functions.sampling import stratified_sample, train_test_split
from horaedb_spark.functions.search import bm25_topk


def test_connected_components_chain(spark):
    """A 4-node chain needs label propagation past one hop: 3-4 only learns
    of node 1 transitively. Also an isolated pair and correct labeling."""
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], ["id_a", "id_b"]
    )
    got = {
        (r.id, r.component)
        for r in connected_components(pairs).collect()
    }
    assert got == {(1, 1), (2, 1), (3, 1), (4, 1), (10, 10), (11, 10)}


def test_connected_components_converges_on_star(spark):
    """Star graphs (the planted-dup shape) converge in one round."""
    pairs = spark.createDataFrame(
        [(5, 6), (5, 7), (5, 8)], ["id_a", "id_b"]
    )
    got = dict(
        (r.id, r.component) for r in connected_components(pairs, max_iter=2).collect()
    )
    assert got == {5: 5, 6: 5, 7: 5, 8: 5}


def test_bm25_ranks_full_match_first(spark):
    docs = spark.createDataFrame(
        [
            (1, "spark merge window spark merge window"),
            (2, "spark spark spark spark spark spark"),
            (3, "apples and oranges only here"),
            (4, "merge window"),
        ],
        ["doc_id", "text"],
    )
    rows = bm25_topk(docs, ["merge", "window", "spark"], top_k=3).collect()
    assert [r.doc_id for r in rows][0] in (1, 4)  # multi-term docs beat one-term
    assert all(r.doc_id != 3 for r in rows)  # no-hit doc never ranked
    assert rows[0].rank == 1 and rows[0].score >= rows[-1].score


def test_train_test_split_deterministic_and_sized(spark):
    df = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    a = train_test_split(df, "doc_id")
    b = train_test_split(df, "doc_id")
    assert a.exceptAll(b).count() == 0  # bit-stable across invocations
    n_test = a.filter(F.col("split") == "test").count()
    assert 120 < n_test < 300  # ~10.2% of 2000, generous band


def test_stratified_sample_rates_and_determinism(spark):
    df = spark.range(0, 3000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 3 == 0, "en")
        .when(F.col("id") % 3 == 1, "de")
        .otherwise("xx")
        .alias("lang"),
    )
    kept = stratified_sample(df, "doc_id", "lang", {"en": 128, "de": 64})
    counts = {r.lang: r.n for r in kept.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert "xx" not in counts  # unlisted strata dropped
    assert 380 < counts["en"] < 620  # ~50% of 1000
    assert 170 < counts["de"] < 330  # ~25% of 1000
    again = stratified_sample(df, "doc_id", "lang", {"en": 128, "de": 64})
    assert kept.exceptAll(again).count() == 0


def test_minhash_band_bucket_cap_bounds_viral_cluster(spark):
    """A planted 10k-doc near-dup cluster (site boilerplate with small
    per-doc mutations) must NOT produce ~m^2/2 = 50M candidate pairs: over
    the cap, buckets sub-key by the next band's signature, degrading to
    two-band-match (high recall for J~1, sub-quadratic pair count)."""
    from horaedb_spark.functions.dedup import minhash_lsh_pairs

    words = [f"w{i}" for i in range(40)]
    rows = []
    for d in range(10_000):
        toks = list(words)
        # mutate 3 of 40 positions deterministically -> pairwise J stays
        # high but minhash signatures vary across the cluster
        for j in range(3):
            toks[(d * 7 + j * 11) % 40] = f"m{d}_{j}"
        rows.append((d, " ".join(toks)))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = minhash_lsh_pairs(
        docs, "text", "doc_id", num_hashes=16, bands=4, max_bucket_rows=500
    )
    n = pairs.count()
    # uncapped, every band bucket holding the cluster emits ~50M pairs;
    # capped, the count must stay around (bucket_count * subbucket^2)-ish.
    assert 0 < n < 5_000_000, n


def test_minhash_cap_is_inert_below_threshold(spark):
    """Buckets under the cap keep exact one-band-match semantics even when
    the refinement branch EXECUTES. The cap (5) is chosen so the near-dup
    groups' band buckets exceed it (asserted below) — both runs taking the
    zero-big-buckets short-circuit would make the test vacuous. The
    per-bucket contract is then checked directly from the signature table:
    (a) capping only ever REMOVES candidate pairs, and (b) every pair
    co-bucketed by at least one UNDER-cap bucket appears in the capped
    result — i.e. refinement touches only over-cap buckets."""
    from collections import Counter, defaultdict

    from horaedb_spark.functions.dedup import (
        minhash_band_signatures,
        minhash_lsh_pairs,
    )

    rows = [(i, f"alpha beta gamma delta epsilon {i % 7} zeta eta theta")
            for i in range(60)]
    rows += [(100 + i, f"totally different text number {i} with unrelated words")
             for i in range(20)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    cap = 5
    sigs = minhash_band_signatures(docs, "text", "doc_id", 16, 4).collect()
    sizes = Counter((r["band"], r["sig"]) for r in sigs)
    assert max(sizes.values()) > cap  # falsifier: refinement branch must run
    buckets = defaultdict(list)
    for r in sigs:
        buckets[(r["band"], r["sig"])].append(r["doc_id"])
    small_pairs = {
        (a, b)
        for key, ids in buckets.items()
        if sizes[key] <= cap
        for a in ids
        for b in ids
        if a < b
    }
    assert small_pairs  # the under-cap side must be non-empty too
    capped = set(map(tuple, minhash_lsh_pairs(
        docs, "text", "doc_id", max_bucket_rows=cap).collect()))
    uncapped = set(map(tuple, minhash_lsh_pairs(
        docs, "text", "doc_id", max_bucket_rows=10**9).collect()))
    assert capped <= uncapped          # (a) cap never invents pairs
    assert small_pairs <= capped       # (b) under-cap buckets unchanged
