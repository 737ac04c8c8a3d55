"""Property-based differential test of the ExactSubstr family: for random
small corpora over a tiny alphabet (maximizing shingle collisions, repeats,
and overlapping spans), both operators must equal a brute-force sequential
Python reference computed directly from the Lee-et-al. semantics —
per-diagonal maximal common runs for the pair operator, global
keep-first-occurrence interval union for the prune operator. The Spark
implementations route through sorted-shingle joins, window islands, and a
min-struct first-occurrence aggregate; none of that machinery may leak into
the answer. Caps are set above any generated corpus so the capped-boilerplate
path (unit-tested separately) never engages here."""

import hypothesis.strategies as st
from hypothesis import HealthCheck, given, settings

from horaedb_spark.functions.dedup import (
    exact_substr_prune_stats,
    exact_substr_spans,
)

K = 3  # min_span: small so 5-12-token docs can share spans

# documents as token lists over a 3-letter alphabet: collisions everywhere
corpus = st.lists(
    st.lists(
        st.sampled_from(["aa", "bb", "cc"]), min_size=0, max_size=12
    ),
    min_size=2,
    max_size=6,
)


def _ref_spans(docs):
    """Per unordered pair (i<j): maximal common token runs per diagonal with
    run length >= K; span_len = run length. Returns
    {(i, j): (longest, n_spans, total)}."""
    out = {}
    for i in range(len(docs)):
        for j in range(i + 1, len(docs)):
            a, b = docs[i], docs[j]
            spans = []
            # diagonal d = pos_a - pos_b, walk common positions in order
            for d in range(-(len(b) - 1), len(a)):
                run = 0
                for pb in range(len(b)):
                    pa = pb + d
                    if 0 <= pa < len(a) and a[pa] == b[pb]:
                        run += 1
                    else:
                        if run >= K:
                            spans.append(run)
                        run = 0
                if run >= K:
                    spans.append(run)
            if spans:
                out[(i, j)] = (max(spans), len(spans), sum(spans))
    return out


def _ref_prune(docs):
    """Global keep-first-occurrence over stride-1 K-shingles ordered by
    (doc_id, pos); later occurrences mark [pos, pos+K-1]; per-doc interval
    union. Returns {doc_id: (n_tokens, removed, kept, n_spans, longest)}."""
    first = {}
    marks = {i: [] for i in range(len(docs))}
    for i, toks in enumerate(docs):
        for p in range(len(toks) - K + 1):
            sh = tuple(toks[p : p + K])
            if sh not in first:
                first[sh] = (i, p)
            else:
                marks[i].append((p, p + K - 1))
    out = {}
    for i, toks in enumerate(docs):
        ivs = sorted(marks[i])
        merged = []
        for s, e in ivs:
            if merged and s <= merged[-1][1]:
                merged[-1][1] = max(merged[-1][1], e)
            else:
                merged.append([s, e])
        removed = sum(e - s + 1 for s, e in merged)
        longest = max((e - s + 1 for s, e in merged), default=0)
        out[i] = (len(toks), removed, len(toks) - removed, len(merged), longest)
    return out


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=corpus)
def test_exact_substr_spans_matches_bruteforce(spark, docs):
    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(docs)],
        "doc_id long, text string",
    )
    got = {
        (r["id_a"], r["id_b"]): (
            r["longest_shared_span"],
            r["n_shared_spans"],
            r["shared_span_tokens"],
        )
        for r in exact_substr_spans(
            df, "doc_id", "text", min_span=K, max_docs_per_shingle=1000
        ).collect()
    }
    assert got == _ref_spans(docs)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=corpus)
def test_exact_substr_prune_matches_bruteforce(spark, docs):
    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(docs)],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (
            r["n_tokens"],
            r["removed_tokens"],
            r["kept_tokens"],
            r["n_removed_spans"],
            r["longest_removed_span"],
        )
        for r in exact_substr_prune_stats(
            df, "doc_id", "text", min_span=K
        ).collect()
    }
    assert got == _ref_prune(docs)
