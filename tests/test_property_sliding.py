"""Property-based differential test of the sliding range-vector family:
random sample streams vs a pure-Python window model. The window-membership
algebra (first_t fan-out, (T-range, T] boundaries, <2-sample dropout) is
where off-by-one bugs live; hypothesis explores boundary-aligned and
duplicate-timestamp shapes a golden can miss."""

import hypothesis.strategies as st
import pytest
from hypothesis import HealthCheck, given, settings

from horaedb_spark.functions import promql

STEP = 100
RANGE = 300  # k = 3

samples = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=999),    # ts (includes step-aligned)
        st.integers(min_value=-50, max_value=50),   # value (ints: exact doubles)
    ),
    min_size=1,
    max_size=25,
    unique_by=lambda r: r[0],  # one sample per ts per series (post-dedup shape)
)


def _model(rows):
    """windows (T-RANGE, T] on the STEP grid; rate needs 2+ samples."""
    out = {}
    ts_sorted = sorted(rows)
    lo = min(t for t, _ in rows)
    hi = max(t for t, _ in rows)
    t0 = (lo // STEP) * STEP  # earliest candidate T is above lo
    for T in range(t0, hi + RANGE + STEP, STEP):
        win = [(t, v) for t, v in ts_sorted if T - RANGE < t <= T]
        if len(win) >= 2 and win[-1][0] > win[0][0]:
            rate = (win[-1][1] - win[0][1]) / ((win[-1][0] - win[0][0]) / 1000.0)
            out[T] = (round(rate, 6), len(win))
    return out


@pytest.mark.slow
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=samples)
def test_sliding_rate_matches_window_model(spark, rows):
    df = spark.createDataFrame(
        [("s", t, float(v)) for t, v in rows], "series string, ts_ms long, value double"
    )
    out = promql.sliding_rate(df, ["series"], step_ms=STEP, range_ms=RANGE)
    got = {
        r["eval_ms"]: (round(r["rate_per_s"], 6), r["n_samples"])
        for r in out.collect()
    }
    assert got == _model(rows)
