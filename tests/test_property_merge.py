"""Property-based differential test: the storage engine's write/scan
lifecycle against a pure-Python model of the reference semantics (overwrite
merge per (segment, PK), max __seq__ wins, segment-ordered output).

Hypothesis drives random write workloads; one Spark round-trip per example
is expensive, so examples are bounded but the *shape* space (duplicate PKs
within and across writes, multiple segments, interleaved ranges) is fully
explored."""

import hypothesis.strategies as st
import pytest
from hypothesis import HealthCheck, given, settings

from horaedb_spark.core.timeutil import TimeRange, truncate_by
from horaedb_spark.storage.table import ColumnarTable, ScanRequest, WriteRequest
from tests.test_storage import kv_schema

SEG = 100  # small segment duration so examples span segments

row = st.tuples(
    st.integers(min_value=0, max_value=3),   # pk1 — tight range forces collisions
    st.integers(min_value=0, max_value=2),   # pk2
    st.integers(min_value=-1000, max_value=1000),  # value
)
write = st.tuples(
    st.integers(min_value=0, max_value=3),   # segment index
    st.lists(row, min_size=1, max_size=5, unique_by=lambda r: (r[0], r[1])),
)
workload = st.lists(write, min_size=1, max_size=5)


def model_scan(writes):
    """Pure-Python reference: per (segment, pk), the row from the latest
    write wins; output ordered by (segment, pk)."""
    state = {}
    for seq, (seg_idx, rows) in enumerate(writes):
        seg = seg_idx * SEG
        for pk1, pk2, v in rows:
            state[(seg, pk1, pk2)] = (seq, v)
    return [
        (pk1, pk2, v)
        for (seg, pk1, pk2), (_seq, v) in sorted(
            state.items(), key=lambda kv: (kv[0][0], kv[0][1], kv[0][2])
        )
    ]


@pytest.mark.slow
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(writes=workload)
def test_scan_matches_model(spark, tmp_path_factory, writes):
    tmp = tmp_path_factory.mktemp("prop")
    t = ColumnarTable(spark, str(tmp), kv_schema(), SEG)
    for seg_idx, rows in writes:
        seg = seg_idx * SEG
        df = spark.createDataFrame(
            [(int(a), int(b), int(c)) for a, b, c in rows],
            "pk1 long, pk2 long, value long",
        )
        t.write(WriteRequest(df, TimeRange(seg, seg + SEG)))
    got = [tuple(r) for r in t.scan().collect()]
    assert got == model_scan(writes)


def test_truncate_by_properties():
    from hypothesis import find

    @given(
        ts=st.integers(min_value=-(2**40), max_value=2**40),
        dur=st.integers(min_value=1, max_value=10**9),
    )
    @settings(max_examples=300, deadline=None)
    def check(ts, dur):
        seg = truncate_by(ts, dur)
        assert seg % dur == 0 or seg // dur * dur == seg
        assert seg <= ts < seg + dur  # floor property, negatives included

    check()
