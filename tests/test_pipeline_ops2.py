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


def test_chunk_windows_layout(spark):
    from horaedb_spark.functions.text import chunk_windows

    # 10 words, window 4, stride 3 -> chunks at 0,3,6 cover through word 10:
    # n_chunks = 1 + ceil((10-4)/3) = 3; last chunk has 4 tokens (words 7-10)
    text = " ".join(f"w{i}" for i in range(10))
    df = spark.createDataFrame([(1, text)], ["id", "text"])
    rows = df.select(
        F.explode(chunk_windows("text", window=4, stride=3)).alias("c")
    ).select("c.*").collect()
    assert [(r.chunk_idx, r.start, r.n_tokens) for r in rows] == [
        (0, 1, 4), (1, 4, 4), (2, 7, 4)
    ]
    assert rows[1].chunk == "w3 w4 w5 w6"
    # short doc: one chunk, all tokens
    short = spark.createDataFrame([(1, "a b")], ["id", "text"]).select(
        F.explode(chunk_windows("text", window=4, stride=3)).alias("c")
    ).select("c.*").collect()
    assert [(r.chunk_idx, r.n_tokens, r.chunk) for r in short] == [(0, 2, "a b")]


def test_temperature_resample_keeps_smallest_domain(spark):
    from horaedb_spark.functions.sampling import temperature_resample

    # domain 'small' has 4 rows (rate 1.0 -> all kept); 'big' has 64 rows
    # (rate sqrt(4/64)=0.25 -> ~16 kept, exact membership md5-determined)
    rows = [(i, "small") for i in range(4)] + [(100 + i, "big") for i in range(64)]
    df = spark.createDataFrame(rows, ["id", "dom"])
    kept = temperature_resample(df, "id", "dom", alpha=0.5).collect()
    small = [r.id for r in kept if r.dom == "small"]
    big = [r.id for r in kept if r.dom == "big"]
    assert sorted(small) == [0, 1, 2, 3]
    assert 0 < len(big) < 64
    # deterministic: same result on re-run
    again = temperature_resample(df, "id", "dom", alpha=0.5).collect()
    assert sorted(r.id for r in again) == sorted(r.id for r in kept)


def test_domain_cap_orders_and_breaks_ties(spark):
    from horaedb_spark.functions.sampling import domain_cap

    df = spark.createDataFrame(
        [(1, "a", 10), (2, "a", 30), (3, "a", 30), (4, "a", 5), (5, "b", 1)],
        ["id", "dom", "quality"],
    )
    kept = domain_cap(df, "dom", "id", cap=2, order_col="quality").collect()
    by_dom = {}
    for r in kept:
        by_dom.setdefault(r.dom, []).append(r.id)
    # quality 30,30 win; tie broken by lower id first (both kept at cap=2)
    assert sorted(by_dom["a"]) == [2, 3]
    assert by_dom["b"] == [5]


def test_promql_round_to_and_math(spark):
    df = spark.createDataFrame([(1, -7.5), (2, 12.4), (3, 0.0)], ["id", "v"])
    out = df.select(
        "id",
        promql.round_to("v", 5).alias("r5"),
        promql.math_fn("v", "sgn").alias("sgn"),
        promql.math_fn("v", "abs").alias("abs"),
    ).orderBy("id").collect()
    # PromQL round: floor(v/to + 0.5)*to -> -7.5/5+0.5 = -1.0 -> -5.0
    assert [r.r5 for r in out] == [-5.0, 10.0, 0.0]
    assert [r.sgn for r in out] == [-1.0, 1.0, 0.0]
    assert [r.abs for r in out] == [7.5, 12.4, 0.0]


def test_promql_time_components_known_instant(spark):
    # 2024-03-15 13:45:00 UTC = 1710510300000 ms, a Friday (dow 5)
    df = spark.createDataFrame([(1710510300000,)], ["ts_ms"])
    tc = promql.time_components("ts_ms")
    r = df.select(
        tc["minute"].alias("mi"), tc["hour"].alias("h"),
        tc["day_of_week"].alias("dw"), tc["day_of_month"].alias("dm"),
        tc["day_of_year"].alias("dy"),
        tc["days_in_month"].alias("dim"), tc["month"].alias("mo"),
        tc["year"].alias("y"),
    ).collect()[0]
    assert (r.mi, r.h, r.dw, r.dm, r.dim, r.mo, r.y) == (45, 13, 5, 15, 31, 3, 2024)
    assert r.dy == 75  # 2024 is a leap year: Mar 15 = 31 + 29 + 15


def test_packed_bins_matches_naive_cumsum(spark):
    from horaedb_spark.functions.sampling import packed_bins

    # ids 0..9 with varying token counts; block_size=3 forces multi-block
    # offsets; budget 10 splits bins mid-document
    rows = [(i, (i * 7) % 5 + 3) for i in range(10)]
    df = spark.createDataFrame(rows, ["id", "toks"])
    out = {
        r.id: (r.cum_tokens, r.first_bin, r.last_bin)
        for r in packed_bins(df, "id", "toks", budget=10, block_size=3).collect()
    }
    cum = 0
    for i, t in rows:
        cum += t
        assert out[i] == (cum, (cum - t) // 10, (cum - 1) // 10), (i, out[i])


def test_boilerplate_planted_gram(spark):
    from horaedb_spark.functions.text import boilerplate_ngram_stats

    # "x y z" appears in 3 docs -> boilerplate at min_docs=3; doc 4 is clean
    docs = spark.createDataFrame(
        [
            (1, "x y z a b c"),
            (2, "x y z d e f"),
            (3, "p q x y z r"),
            (4, "u v w u v w"),
        ],
        ["doc_id", "text"],
    )
    out = {
        r.doc_id: (r.n_grams, r.n_boilerplate)
        for r in boilerplate_ngram_stats(
            docs, "doc_id", "text", k=3, min_docs=3
        ).collect()
    }
    assert out[1][1] == 1 and out[2][1] == 1 and out[3][1] == 1
    assert out[4] == (3, 0)  # 3 distinct trigrams (uvw, vwu, wuv), none shared


def test_offset_by_shifts_forward(spark):
    df = spark.createDataFrame([(1000, 1.0)], ["bucket_ms", "value"])
    assert promql.offset_by(df, 500).collect()[0].bucket_ms == 1500


def test_funnel_stages_strict_ordering(spark):
    from horaedb_spark.queries.events_queries import funnel_stages

    rows = [
        # u1: full funnel in order
        (1, "signup", 100), (1, "click", 200), (1, "purchase", 300),
        # u2: click BEFORE signup doesn't count; no click after -> stage 1
        (2, "click", 50), (2, "signup", 100), (2, "purchase", 200),
        # u3: purchase at SAME ts as click is rejected (strict >)
        (3, "signup", 10), (3, "click", 20), (3, "purchase", 20),
        # u4: never signs up -> stage 0
        (4, "click", 10), (4, "purchase", 20),
    ]
    df = spark.createDataFrame(rows, ["user_id", "event_type", "ts_ms"])
    out = {r.user_id: r.stage_reached for r in funnel_stages(df).collect()}
    assert out == {1: 3, 2: 1, 3: 2, 4: 0}


def test_bpe_learn_and_apply_golden(spark):
    """Corpus 'aaab aaab ab': merges learned in order (a,a) then (aa,b)...
    hand-checked: pairs of 'aaab'x2 + 'ab' -> (a,a):4, (a,b):3 =>
    merge1 = 'a a'->'aa'; then 'aa a b' pairs (aa,a):2,(a,b):2,(aa,b):1 =>
    merge2 = (a,b) [tie broken lexicographically: 'a|b' < 'aa|a'].
    'aaab' -> 'aa ab' (2 tokens), 'ab' -> 'ab' (1 token)."""
    from horaedb_spark.functions.text import bpe_learn_and_apply

    docs = spark.createDataFrame(
        [(1, "aaab aaab"), (2, "ab")], "doc_id long, text string"
    )
    out = {r["doc_id"]: (r["chars_before"], r["tokens_after"])
           for r in bpe_learn_and_apply(docs, "doc_id", "text", n_merges=2).collect()}
    assert out == {1: (8, 4), 2: (2, 1)}


def test_duplicated_span_stats_golden(spark):
    """Two 40-token docs sharing their first 30 tokens: doc 1 windows
    (stride 10, width 20) at offsets 0/10/20; offsets 0 and 10 lie inside
    the shared prefix (tokens 1-30) for both docs -> 2 of 3 windows dup.
    Doc 3 is disjoint -> 0 dup."""
    from horaedb_spark.functions.dedup import duplicated_span_stats

    shared = " ".join(f"w{i}" for i in range(30))
    a = shared + " " + " ".join(f"a{i}" for i in range(10))
    b = shared + " " + " ".join(f"b{i}" for i in range(10))
    c = " ".join(f"c{i}" for i in range(40))
    docs = spark.createDataFrame(
        [(1, a), (2, b), (3, c)], "doc_id long, text string"
    )
    out = {r["doc_id"]: (r["n_windows"], r["n_dup_windows"])
           for r in duplicated_span_stats(docs, "doc_id", "text").collect()}
    assert out == {1: (3, 2), 2: (3, 2), 3: (3, 0)}


def test_pq_ann_topk_validates_codebook_shape(spark):
    """ADVICE r11: a precomputed codebook whose size disagrees with
    num_codes, or a vector dim not divisible by num_subspaces, used to be
    silently accepted (truncating trailing dims in both encode and ADC)."""
    import pytest

    from horaedb_spark.functions.similarity import pq_ann_topk

    corpus = spark.createDataFrame(
        [(i, [i, i + 1, i + 2, i + 3]) for i in range(4)], ["id", "vec"]
    )
    cents = [(1, [0, 0, 0, 0]), (2, [9, 9, 9, 9])]
    with pytest.raises(ValueError, match="num_codes"):
        pq_ann_topk(corpus, corpus, "vec", "id", k=1, num_codes=16,
                    num_subspaces=2, centroids=cents)
    with pytest.raises(ValueError, match="divisible"):
        pq_ann_topk(corpus, corpus, "vec", "id", k=1, num_codes=2,
                    num_subspaces=3, centroids=cents)


def test_exact_substr_tokenizer_never_inlined_into_generate(spark):
    """The round-12 perf regression, pinned structurally: CollapseProject
    merged the shingle-transform Project with the tokenizer projection,
    inlining split() into the per-position lambda — codegen then
    re-tokenized the document for EVERY position (5-7× wall at sf0.1,
    hash-identical results, clean plan shape, invisible to plan_audit).
    The fix keeps the transform inside a Generate node (posexplode in the
    same select), which never collapses into its child Project. Guard: in
    the OPTIMIZED plan of both operators, split() must never appear INSIDE
    a lambda body — i.e. after the first `lambdafunction(` on a plan line.
    (The tokenizer's own filter-lambda is fine: there split precedes its
    lambda. Verified against the regressed shape: it produces exactly such
    a line; the fixed shape produces none.)"""
    from horaedb_spark.functions.dedup import (
        exact_substr_prune_stats,
        exact_substr_spans,
    )

    docs = spark.createDataFrame(
        [(i, " ".join(f"w{j}" for j in range(i, i + 30))) for i in range(6)],
        "doc_id long, text string",
    )
    for df in (
        # reuse_filtered=False (explicit, though it is the default): the
        # fully-declarative plan end to end — the opt-in localCheckpoint
        # mode hides the shingle subtree behind a LogicalRDD this
        # inspection could not see into
        exact_substr_spans(
            docs, "doc_id", "text", min_span=10, reuse_filtered=False
        ),
        exact_substr_prune_stats(docs, "doc_id", "text", min_span=10),
    ):
        plan = df._jdf.queryExecution().optimizedPlan().toString()
        assert "Generate " in plan, plan
        for ln in plan.splitlines():
            i = ln.find("lambdafunction(")
            assert i < 0 or "split(" not in ln[i:], ln


def test_exact_substr_spans_reuse_modes_row_equal(spark):
    """The declarative default and the opt-in reuse_filtered=True
    (localCheckpoint-reused filtered shingle stream) must be row-identical
    — the materialization is an execution strategy, never a semantics
    change."""
    from horaedb_spark.functions.dedup import exact_substr_spans

    docs = spark.createDataFrame(
        [
            (i, " ".join(f"w{j % 7}" for j in range(i, i + 40)))
            for i in range(8)
        ],
        "doc_id long, text string",
    )
    kw = dict(min_span=5, max_docs_per_shingle=50)
    a = exact_substr_spans(
        docs, "doc_id", "text", reuse_filtered=True, **kw
    ).collect()
    b = exact_substr_spans(docs, "doc_id", "text", **kw).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b)) and a


def test_exact_substr_spans_hand_computed(spark):
    """Token-exact semantics on a hand-built corpus: a 6-token span shared
    at different offsets (diagonal extension), a doc shorter than min_span
    (emits nothing), and two separate shared spans in one pair."""
    from horaedb_spark.functions.dedup import exact_substr_spans

    shared = "alpha beta gamma delta epsilon zeta"  # 6 tokens
    other = "one two three four five six seven"  # 7 tokens, second span
    docs = spark.createDataFrame(
        [
            (1, f"x y z {shared} p q r {other}"),
            (2, f"{shared} a b c d e f g h i j {other} k"),
            (3, "tiny doc"),  # < min_span tokens: no shingles at all
        ],
        ["doc_id", "text"],
    )
    out = exact_substr_spans(docs, "doc_id", "text", min_span=4).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.id_a, r.id_b) == (1, 2)
    # two maximal spans: 6 tokens and 7 tokens; longest = 7, total = 13
    assert r.longest_shared_span == 7
    assert r.n_shared_spans == 2
    assert r.shared_span_tokens == 13


def test_exact_substr_shingle_cap_blocks_boilerplate(spark):
    """A shingle shared by more docs than max_docs_per_shingle carries no
    pair signal (the blocking cap that keeps the anchor join from going
    O(docs²) on boilerplate)."""
    from horaedb_spark.functions.dedup import exact_substr_spans

    boiler = "this license text appears in every single document verbatim"
    docs = spark.createDataFrame(
        [(i, f"doc {i} says {boiler}") for i in range(5)], ["doc_id", "text"]
    )
    capped = exact_substr_spans(
        docs, "doc_id", "text", min_span=4, max_docs_per_shingle=3
    )
    assert capped.count() == 0
    uncapped = exact_substr_spans(
        docs, "doc_id", "text", min_span=4, max_docs_per_shingle=50
    )
    assert uncapped.count() == 10  # all C(5,2) pairs share the span


def test_exact_substr_prune_keep_first_and_interval_merge(spark):
    """Pruning semantics pinned by hand: the EARLIER occurrence (by
    (doc_id, pos)) keeps its tokens, the later one loses them; two
    overlapping marked shingles merge into ONE removal interval; a doc
    with no duplicated shingles (or shorter than min_span) is untouched."""
    from horaedb_spark.functions.dedup import exact_substr_prune_stats

    shared = "alpha beta gamma delta epsilon"  # 5 tokens, min_span=4
    docs = spark.createDataFrame(
        [
            (1, f"{shared} unique tail here"),      # first occurrence: kept
            (2, f"prefix words {shared} suffix"),   # later: loses the 5 tokens
            (3, "tiny"),                            # < min_span: unpruned
        ],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in
           exact_substr_prune_stats(docs, "doc_id", "text", min_span=4).collect()}
    assert out[1].removed_tokens == 0 and out[1].kept_tokens == out[1].n_tokens
    # doc 2: shingles (alpha..delta) and (beta..epsilon) both duplicated,
    # overlapping -> ONE merged span of 5 tokens
    assert (out[2].removed_tokens, out[2].n_removed_spans,
            out[2].longest_removed_span) == (5, 1, 5)
    assert out[2].kept_tokens == out[2].n_tokens - 5
    assert out[3].removed_tokens == 0 and out[3].n_removed_spans == 0
    # self-repetition prunes too: the second copy inside ONE doc
    rep = spark.createDataFrame(
        [(9, f"{shared} bridge {shared}")], ["doc_id", "text"]
    )
    r9 = exact_substr_prune_stats(rep, "doc_id", "text", min_span=4).collect()[0]
    assert r9.removed_tokens == 5 and r9.n_removed_spans == 1


def test_half_copy_corpus_agrees_with_oracle_on_punctuated_text(spark):
    """Review r12: the oracle used to slice the UNFILTERED DuckDB split
    (leading/trailing punctuation yields empty tokens that shift the
    half), while Spark slices the filtered token array — latent only
    because the generator's testdata has no such docs. Both sides now
    slice the filtered list; pin it with punctuation-bounded fixtures."""
    import duckdb
    import pandas as pd

    from horaedb_spark.queries.dedup_queries import (
        _HALF_COPY_CORPUS,
        _with_half_copies,
    )

    docs = pd.DataFrame(
        {
            "doc_id": [0, 5, 10],
            "text": [
                "...leading punct one two three four five six!",
                "ends with period one two three four.",
                "no punctuation at all here one two",
            ],
        }
    )
    con = duckdb.connect()
    con.register("documents", docs)
    oracle_rows = con.sql(
        _HALF_COPY_CORPUS + " SELECT doc_id, text FROM corpus ORDER BY doc_id"
    ).fetchall()
    sdf = _with_half_copies(
        spark.createDataFrame(docs[["doc_id", "text"]])
    )
    spark_rows = sorted((r.doc_id, r.text) for r in sdf.collect())
    assert spark_rows == sorted(oracle_rows), (spark_rows, oracle_rows)
