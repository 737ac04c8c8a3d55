"""Property-based differential test of the distributed ordered prefix sum:
for random rows, random (possibly skewed) priorities, and random partition
counts, the two-phase scan (range shuffle + per-partition offsets + Arrow
carry) must produce the exact cumulative sums of a sequential Python fold
over the same total order. Partition boundaries — whatever the range
sampler picks — must never leak into the answer."""

import pytest

import hypothesis.strategies as st
from hypothesis import HealthCheck, given, settings

from pyspark.sql import functions as F

from horaedb_spark.functions.prefix import ordered_prefix_sum

rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=10),     # priority (heavily tied)
        st.integers(min_value=0, max_value=1000),   # value
    ),
    min_size=1,
    max_size=80,
)
parts = st.integers(min_value=1, max_value=7)



# second-tier property soak (pytest.ini round-15 tiering): the
# hypothesis-driven model differential is minutes-scale; run with -m slow
pytestmark = pytest.mark.slow

@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=rows, n=parts)
def test_prefix_sum_matches_sequential_fold(spark, rows, n):
    data = [(i, pri, v) for i, (pri, v) in enumerate(rows)]
    df = spark.createDataFrame(data, "id long, pri long, v long")
    out = ordered_prefix_sum(
        df, [F.col("pri").desc(), F.col("id").asc()], "v",
        out_col="cum", num_partitions=n,
    )
    got = {r["id"]: r["cum"] for r in out.collect()}

    acc = 0
    expect = {}
    for i, pri, v in sorted(data, key=lambda t: (-t[1], t[0])):
        acc += v
        expect[i] = acc
    assert got == expect


def test_weighted_systematic_sample_draw_invariants(spark):
    """sum(n_draws) == n_picks exactly, and the Spark selection equals the
    sequential model for several (weights, n) shapes."""
    import random

    from pyspark.sql import functions as F

    from horaedb_spark.functions.sampling import weighted_systematic_sample

    rng = random.Random(11)
    for trial in range(3):
        rows = [(i, rng.randint(1, 9)) for i in range(rng.randint(5, 60))]
        n = rng.randint(1, 25)
        df = spark.createDataFrame(rows, "doc_id long, wt long")
        out = weighted_systematic_sample(df, "doc_id", "wt", n_picks=n)
        got = {r.doc_id: r.n_draws for r in out.collect()}
        assert sum(got.values()) == n
        # sequential model
        W = sum(w for _, w in rows)
        ts = [((2 * i + 1) * W) // (2 * n) for i in range(n)]
        c = 0
        want = {}
        for doc_id, w in rows:
            prev, c = c, c + w
            k = sum(1 for t in ts if prev <= t < c)
            if k:
                want[doc_id] = k
        assert got == want, (rows, n)
