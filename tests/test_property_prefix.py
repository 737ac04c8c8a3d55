"""Property-based differential test of the distributed ordered prefix sum:
for random rows, random (possibly skewed) priorities, and random partition
counts, the two-phase scan (range shuffle + per-partition offsets + Arrow
carry) must produce the exact cumulative sums of a sequential Python fold
over the same total order. Partition boundaries — whatever the range
sampler picks — must never leak into the answer."""

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
